package graft

import org.apache.spark.sql.functions._

import graft.ops.rel

class RelSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a planted-skew fixture") {
    // one hot key (0) carries 80% of the left side
    val left = ((0 until 400).map(i => (0L, i.toLong)) ++
      (0 until 100).map(i => (1L + i % 7, 1000L + i)))
      .toDF("k", "row_id")
    val right = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "payload")

    val salted = rel.saltedJoin(left, right, "k", saltBy = "row_id", salts = 8)
      .select("k", "row_id", "payload")
    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin keeps rows whose saltBy column is NULL") {
    // h32(NULL) is NULL; without the coalesce the (key, _salt) equi-join
    // would silently drop these rows — the plain join keeps them.
    val left = Seq((0L, Some(1L)), (0L, None), (1L, None), (2L, Some(9L)))
      .toDF("k", "row_id")
    val right = (0L to 2L).map(k => (k, s"dim$k")).toDF("k", "payload")
    val salted = rel.saltedJoin(left, right, "k", saltBy = "row_id", salts = 4)
      .select("k", "row_id", "payload")
    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
    assert(salted.count() == 4)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads the hot key across all salt values") {
    val left = (0 until 512).map(i => (0L, i.toLong)).toDF("k", "row_id")
    val salts = left.withColumn("_salt",
        pmod(graft.functions.hashing.h32(col("row_id").cast("string")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts == 8, "hot key's rows must hit every salt bucket")
  }

  test("pivotAgg produces one column per declared value, null where absent") {
    val df = Seq(
      ("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 10.0),
      ("b", "y", 5.0)).toDF("g", "p", "v")
    val out = rel.pivotAgg(df, "g", "p", Seq("x", "y", "z"), "v")
      .orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 10.0)
    assert(out(0).isNullAt(3), "undeclared-but-absent value column is null")
    assert(out(1).isNullAt(1) && out(1).getDouble(2) == 5.0)
  }

  test("pivotAgg ignores rows outside the declared value domain") {
    val df = Seq(("a", "x", 1.0), ("a", "other", 99.0)).toDF("g", "p", "v")
    val out = rel.pivotAgg(df, "g", "p", Seq("x"), "v").collect()
    assert(out.length == 1 && out(0).getDouble(1) == 1.0)
  }

  test("rollupAgg emits every prefix level plus the grand total") {
    val df = Seq(
      ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)).toDF("g1", "g2", "v")
    val out = rel.rollupAgg(df, Seq("g1", "g2"), "v")
      .orderBy("g1", "g2")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("ALL", "ALL", 3L, 7.0),          // grand total
      ("a", "ALL", 2L, 3.0),            // subtotal per g1
      ("a", "x", 1L, 1.0),
      ("a", "y", 1L, 2.0),
      ("b", "ALL", 1L, 4.0),
      ("b", "x", 1L, 4.0)))
  }

  test("writeBucketed: matching bucket layouts join with NO exchange on either side") {
    val base = java.nio.file.Files.createTempDirectory("graft-bkt-spec-").toString
    val l = (1L to 200L).map(i => (i, i * 2)).toDF("k", "x")
    val r = (1L to 200L).filter(_ % 2 == 0).map(i => (i, s"p$i")).toDF("k2", "p")
    rel.writeBucketed(l, "graft_spec_bkt_l", s"$base/l", "k", buckets = 4)
    rel.writeBucketed(r, "graft_spec_bkt_r", s"$base/r", "k2", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      val j = spark.table("graft_spec_bkt_l")
        .join(spark.table("graft_spec_bkt_r"), col("k") === col("k2"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(600))
      assert(!p.contains("Exchange"),
        s"bucketed join must read co-partitioned files, not shuffle:\n${p.take(600)}")
      assert(j.count() == 100)
      // one file per bucket: repartition-by-bucket-column aligned tasks
      val files = new java.io.File(s"$base/l").listFiles
        .count(f => f.getName.endsWith(".parquet"))
      assert(files == 4, s"expected one file per bucket, got $files")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("corrExact: perfect correlation, anticorrelation, and degenerate groups") {
    val df = Seq(
      ("pos", 1.0, 2.0), ("pos", 2.0, 4.0), ("pos", 3.0, 6.0),   // y = 2x
      ("neg", 1.0, 3.0), ("neg", 2.0, 2.0), ("neg", 3.0, 1.0),   // y = 4-x
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0),                    // zero y-variance
      ("one", 1.0, 1.0)                                          // n = 1
    ).toDF("g", "x", "y")
    val out = rel.corrExact(df, "x", "y", Seq("g"), xScale = 1.0, yScale = 1.0)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("pos").contains(1.0))
    assert(out("neg").contains(-1.0))
    assert(out("flat").isEmpty, "zero variance has no defined correlation")
    assert(out("one").isEmpty, "single point has no defined correlation")
  }

  test("corrExact: a null coordinate drops the whole row — n and moments agree") {
    val clean = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
    val noisy = clean ++ Seq(
      ("g", null.asInstanceOf[Any], 9.0), ("g", 7.0, null.asInstanceOf[Any]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(noisy.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.DoubleType))))
    val got = rel.corrExact(df, "x", "y", Seq("g"), xScale = 1.0, yScale = 1.0).collect()(0)
    val want = rel.corrExact(clean.toDF("g", "x", "y"), "x", "y", Seq("g"),
      xScale = 1.0, yScale = 1.0).collect()(0)
    assert(got.getLong(1) == 3L, "null-coordinate rows must not count in n")
    assert(got.getDouble(2) == want.getDouble(2))
  }

  test("profileColumns: one row per column with exact nulls/distincts; one scan") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("b"))
    ).toDF("k", "s")
    val got = rel.profileColumns(df, Seq("k", "s")).orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
    // single aggregation job: the table is scanned once, not per column
    val scans = "LocalTableScan|Scan ".r
      .findAllIn(rel.profileColumns(df, Seq("k", "s"))
        .queryExecution.executedPlan.toString).length
    assert(scans == 1, s"profile must not scan per column, got $scans scans")
  }

  test("corrExact is exactly order- and partition-independent") {
    val rows = (0 until 200).map(i => ("g", i.toDouble, (i * 37 % 101).toDouble))
    val a = rel.corrExact(rows.toDF("g", "x", "y").repartition(7), "x", "y", Seq("g"))
      .collect()(0).getDouble(2)
    val b = rel.corrExact(scala.util.Random.shuffle(rows).toDF("g", "x", "y")
        .repartition(2), "x", "y", Seq("g"))
      .collect()(0).getDouble(2)
    assert(a == b, "fixed-point moments must not depend on merge order")
  }

  test("cubeAgg emits every facet subset: rollup levels PLUS the column marginals") {
    val df = Seq(
      ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)).toDF("g1", "g2", "v")
    val cube = rel.cubeAgg(df, Seq("g1", "g2"), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val rollup = rel.rollupAgg(df, Seq("g1", "g2"), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    rollup.foreach { case (k, v) => assert(cube(k) == v, s"cube must contain rollup row $k") }
    // the g2 marginals are what cube adds over rollup
    assert(cube(("ALL", "x")) == 5.0 && cube(("ALL", "y")) == 2.0)
    assert(cube.size == rollup.size + 2)
  }

  test("rollupAgg honors a custom sentinel") {
    val df = Seq(("ALL", 1.0)).toDF("g1", "v") // data legitimately contains "ALL"
    val out = rel.rollupAgg(df, Seq("g1"), "v", sentinel = "<total>")
      .orderBy("g1").collect().map(_.getString(0))
    assert(out.toSeq == Seq("<total>", "ALL"))
  }

  test("groupingSetsAgg: exactly the requested sets, one Expand pass") {
    val df = Seq(
      ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)).toDF("g1", "g2", "v")
    val out = rel.groupingSetsAgg(df,
      Seq(Seq("g1"), Seq("g2"), Seq.empty), Seq("g1", "g2"), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // the two marginals and the grand total — and NOTHING else (no
    // (g1,g2) cross cells, unlike cube)
    assert(out == Map(
      ("a", "ALL") -> ((2L, 3.0)), ("b", "ALL") -> ((1L, 4.0)),
      ("ALL", "x") -> ((2L, 5.0)), ("ALL", "y") -> ((1L, 2.0)),
      ("ALL", "ALL") -> ((3L, 7.0))))
    // cube == groupingSets over ALL subsets (the law tying the family)
    val asCube = rel.groupingSetsAgg(df,
      Seq(Seq("g1", "g2"), Seq("g1"), Seq("g2"), Seq.empty), Seq("g1", "g2"), "v")
    val cube = rel.cubeAgg(df, Seq("g1", "g2"), "v")
    assert(asCube.exceptAll(cube).count() == 0 && cube.exceptAll(asCube).count() == 0)
    // one scan: a single Expand feeds the aggregate, never a union of jobs
    val plan = rel.groupingSetsAgg(df,
      Seq(Seq("g1"), Seq.empty), Seq("g1", "g2"), "v")
      .queryExecution.executedPlan.toString()
    assert(plan.linesIterator.count(_.trim.startsWith("Expand")) == 1
      || plan.contains("Expand"), s"expected Expand in:\n$plan")
    // unknown column in a set is a caller error, not a silent drop
    val err = intercept[IllegalArgumentException] {
      rel.groupingSetsAgg(df, Seq(Seq("nope")), Seq("g1"), "v")
    }
    assert(err.getMessage.contains("nope"))
  }

  test("snapshotDiff labels added/removed/changed/unchanged; null content is content") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, null.asInstanceOf[String]), (5L, "new"))
      .toDF("id", "text")
    val got = rel.snapshotDiff(a, b, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
    // identical versions: everything unchanged
    assert(rel.snapshotDiff(a, a, "id", "text")
      .where(col("status") =!= "unchanged").count() === 0)
  }

  test("checkRules: null predicate counts as violation; rates exact") {
    val df = Seq(
      (Some(1L), "ok"), (Some(-2L), "ok"), (None, "bad"), (Some(5L), "ok"))
      .toDF("v", "tag")
    val got = rel.checkRules(df, Seq(
        "r1_positive" -> (col("v") > 0L), // -2 violates, null violates
        "r2_nonnull" -> col("v").isNotNull,
        "r3_tag_ok" -> (col("tag") === "ok")))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("r1_positive", 4L, 2L, 0.5),
      ("r2_nonnull", 4L, 1L, 0.25),
      ("r3_tag_ok", 4L, 1L, 0.25)))
  }

  test("checkRules runs ALL rules in one aggregation job") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "tag")
    val out = rel.checkRules(df, Seq(
      "a" -> (col("v") > 0L), "b" -> col("tag").isNotNull))
    val nAggs = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("HashAggregate"))
    // one partial + one final aggregate — NOT one pair per rule
    assert(nAggs <= 2, s"expected a single aggregation, saw $nAggs HashAggregates")
  }

  test("checkRules rejects empty and duplicate rule names") {
    val df = Seq((1L, "a")).toDF("v", "tag")
    intercept[IllegalArgumentException] { rel.checkRules(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      rel.checkRules(df, Seq("x" -> lit(true), "x" -> lit(false)))
    }
  }

  test("skewProbe surfaces the hot key with its share, skew, and salt count") {
    // key "hot" owns 80 of 100 rows across 3 keys: mean = 100/3,
    // skew(hot) = 80·3/100 = 2.4, rec_salts = ceil(2.4) = 3
    val df = ((0 until 80).map(_ => "hot") ++ (0 until 15).map(_ => "warm") ++
      (0 until 5).map(_ => "cold")).toDF("k")
    val got = rel.skewProbe(df, "k", topN = 2)
      .as[(String, Long, Double, Double, Int)].collect().toSeq
    assert(got == Seq(
      ("hot", 80L, 80.0, 2.4, 3),
      ("warm", 15L, 15.0, 0.45, 1)))
  }

  test("skewProbe counts the null key as a real group named NULL") {
    val df = Seq(Some("a"), None, None, None, Some("b")).toDF("k")
    val got = rel.skewProbe(df, "k", topN = 1)
      .as[(String, Long, Double, Double, Int)].collect().toSeq
    assert(got.head._1 == "NULL" && got.head._2 == 3L)
  }

  test("zipIndex equals the naive global row_number, with the range exchange reused") {
    // shuffled insert order + non-contiguous keys: idx must follow key
    // order, not insertion order
    val keys = scala.util.Random.shuffle((0 until 500).map(i => i * 7L + 3).toList)
    val df = keys.toDF("k")
    val out = rel.zipIndex(df, "k", parts = 8)
    out.collect() // materialize so AQE finalizes the stage graph
    val got = out.orderBy("k").as[(Long, Long)].collect()
    val want = keys.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    assert(got.toSeq == want)
    // load-bearing: the rank branch and the count branch must read ONE
    // materialized range partitioning. Exchange reuse used to be the
    // mechanism, but reuse is best-effort (column pruning can make the
    // two subplans differ) and when it failed each branch sampled its
    // own range bounds — duplicate/gapped indices at sf0.1 (round 10).
    // The lineage cut makes it structural: both branches scan the
    // checkpointed RDD, and the range exchange appears in NEITHER.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"ranged subtree must be a materialized lineage cut:\n${plan.take(1500)}")
    assert(!plan.contains("rangepartitioning"),
      s"no branch may re-execute its own range exchange:\n${plan.take(1500)}")
  }

  test("zipIndex: empty input and single row behave") {
    assert(rel.zipIndex(Seq.empty[Long].toDF("k"), "k", parts = 4).count() == 0)
    val one = rel.zipIndex(Seq(42L).toDF("k"), "k", parts = 4)
      .as[(Long, Long)].collect().toSeq
    assert(one == Seq((42L, 0L)))
  }

  test("cdcApply: latest change wins; deletes remove; new keys insert; untouched pass") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", 1, "upsert"),  // plain update
      (3L, "c", 1, "delete"),   // delete
      (4L, "dX", 1, "delete"),  // deleted at ts=1...
      (4L, "d2", 2, "upsert"),  // ...then re-upserted later: upsert wins
      (5L, "e", 1, "upsert"),   // brand-new key
      (6L, "never", 1, "delete") // delete of a key not in the snapshot
    ).toDF("id", "v", "ts", "op")
    val got = rel.cdcApply(snap, changes, "id")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 4L -> "d2", 5L -> "e"))
  }

  test("cdcApply rejects changes missing snapshot columns") {
    val snap = Seq((1L, "a")).toDF("id", "v")
    val bad = Seq((1L, 1, "upsert")).toDF("id", "ts", "op")
    intercept[IllegalArgumentException] { rel.cdcApply(snap, bad, "id") }
  }

  test("incrementalAgg: maintained rollup equals the from-scratch aggregate") {
    val fact = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L), ("c", 1L))
      .toDF("g", "v")
    val agg0 = fact.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    val log = Seq(
      ("a", 20L, "delete"),  // drop one of a's rows
      ("c", 1L, "delete"),   // c's LAST row → group disappears
      ("b", 3L, "insert"),   // grow b
      ("d", 9L, "insert"),   // brand-new group
      ("d", 2L, "insert")).toDF("g", "v", "op")
    val got = rel.incrementalAgg(agg0, log, Seq("g"), "v")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    // from-scratch twin over the applied fact table
    val applied = fact.exceptAll(Seq(("a", 20L), ("c", 1L)).toDF("g", "v"))
      .unionAll(Seq(("b", 3L), ("d", 9L), ("d", 2L)).toDF("g", "v"))
    val want = applied.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got == Seq(("a", 1L, 10L), ("b", 3L, 15L), ("d", 2L, 11L)))
    // chaining: output shape feeds straight back in
    val again = rel.incrementalAgg(
        rel.incrementalAgg(agg0, log, Seq("g"), "v"),
        Seq(("d", 2L, "delete")).toDF("g", "v", "op"), Seq("g"), "v")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(again == Seq(("a", 1L, 10L), ("b", 3L, 15L), ("d", 1L, 9L)))
    // guard: aggregate missing the sum column
    intercept[IllegalArgumentException] {
      rel.incrementalAgg(agg0.drop("sum_v"), log, Seq("g"), "v")
    }
  }

  test("scd2Intervals collapses no-op versions and closes validity with lead") {
    val ch = Seq(
      (1L, "a", 1), (1L, "a", 2), (1L, "b", 3), (1L, "b", 4), (1L, "a", 5),
      (2L, "z", 1), (2L, "z", 2)).toDF("id", "v", "ts")
    val got = rel.scd2Intervals(ch, "id", "ts", Seq("v"))
      .orderBy("id", "valid_from")
      .as[(Long, String, Int, Option[Int], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 1, Some(3), false),
      (1L, "b", 3, Some(5), false),
      (1L, "a", 5, None, true),
      (2L, "z", 1, None, true)))
  }

  test("bloomJoin equals the plain join (false positives die in the join)") {
    val large = (0 until 2000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "row_id")
    val small = Seq((3L, "a"), (250L, "b"), (499L, "c"), (9999L, "never")).toDF("k", "tag")
    val got = rel.bloomJoin(large, small, "k", mBits = 1024)
      .select("k", "row_id", "tag")
    val want = large.join(small, Seq("k")).select("k", "row_id", "tag")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.count() == 12) // 3 matching keys × 4 rows each
  }

  test("bloomJoin prefilter actually drops non-candidate rows before the join") {
    val large = (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "row_id")
    val small = Seq((7L, "x")).toDF("k", "tag")
    // with one key in the bloom, the survivor count after the prefilter
    // is 1 + false positives — far below 1000 at mBits=1024
    val words = graft.ops.sketch.bloom(small, col("k"), mBits = 1024, k = 3)
      .orderBy("word").collect().map(_.getLong(1)).toIndexedSeq
    val survivors = large
      .where(graft.ops.sketch.bloomMightContain(words, col("k"), mBits = 1024, k = 3))
      .count()
    assert(survivors >= 1 && survivors < 100,
      s"bloom prefilter not selective: $survivors of 1000 rows passed")
  }

  test("merge: clause precedence, null conditions, null keys, target-only") {
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("k", "v", "n")
    // key 1: matched, delete cond true AND update cond true → DELETE wins
    // key 2: matched, delete cond NULL (three-valued) → update applies
    // key 3: matched, no clause satisfied → target row unchanged
    // key 5: source-only, insert cond true → inserted
    // key 6: source-only, insert cond false → dropped
    // null key: never matches → not-matched, insert cond true → inserted
    val source = Seq(
      (Option(1L), "del", 0L), (Option(2L), "upd", 99L), (Option(3L), "no", 0L),
      (Option(5L), "ins", 50L), (Option(6L), "skip", 60L),
      (Option.empty[Long], "nullkey", 70L)).toDF("k", "v", "n")
    val got = rel.merge(target, source, Seq("k"),
        whenMatchedUpdate = Some(col("s.n") === 99L),
        whenMatchedDelete = Some(when(col("s.v") === "del", lit(true))
          .when(col("s.v") === "upd", lit(null).cast("boolean"))
          .otherwise(lit(false))),
        whenNotMatchedInsert = Some(col("s.v") =!= "skip"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (Some(2L), "upd", 99L),   // updated (null delete cond not satisfied)
      (Some(3L), "c", 30L),     // matched, no clause → unchanged
      (Some(4L), "d", 40L),     // target-only survives
      (Some(5L), "ins", 50L),   // inserted
      (None, "nullkey", 70L)),  // null key never matches → inserted
      got.toString)
  }

  test("pitJoin: version at fact time, pre-history null, open current interval") {
    val dim = Seq(
      (1L, "v1", 10, Option(20), false),
      (1L, "v2", 20, Option(30), false),
      (1L, "v3", 30, Option.empty[Int], true),
      (2L, "w1", 15, Option.empty[Int], true))
      .toDF("k", "tag", "valid_from", "valid_to", "is_current")
    val facts = Seq((1L, 5), (1L, 10), (1L, 29), (1L, 30), (1L, 99),
      (2L, 14), (3L, 50)).toDF("k", "fact_ts")
    val got = rel.pitJoin(facts, dim, "k", "fact_ts")
      .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 5, None),          // predates history → null, row kept
      (1L, 10, Some("v1")),   // inclusive valid_from
      (1L, 29, Some("v2")),
      (1L, 30, Some("v3")),   // exclusive valid_to boundary
      (1L, 99, Some("v3")),   // open current interval
      (2L, 14, None),         // before key 2's first version
      (3L, 50, None)),        // unknown key survives with null
      got.toString)
  }

  test("pitJoin refuses fact/dim column collisions beyond the key") {
    val dim = Seq((1L, "a", 1, Option.empty[Int]))
      .toDF("k", "tag", "valid_from", "valid_to")
    val facts = Seq((1L, 5, "x")).toDF("k", "fact_ts", "tag")
    intercept[IllegalArgumentException] {
      rel.pitJoin(facts, dim, "k", "fact_ts")
    }
  }

  test("fkOrphans: null child keys are orphans; parent dups collapse") {
    val child = Seq(
      (Option(1L), "ok"), (Option(2L), "orphan"),
      (Option.empty[Long], "nullkey")).toDF("fk", "tag")
    val parent = Seq(1L, 1L, 3L).toDF("pk") // dup parent keys collapse
    val got = rel.fkOrphans(child, parent, Seq("fk"), Seq("pk"))
      .select("tag").as[String].collect().toSet
    assert(got == Set("orphan", "nullkey"), got.toString)
  }

  test("merge: no clauses at all is refused") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      rel.merge(df, df, Seq("k"))
    }
  }

  test("zipIndex: indices dense and unique, identical across partition counts") {
    // Regression (round 10, caught by the sf0.1 sweep): the range
    // exchange samples bounds per physical execution, and zipIndex's
    // two consumers of the ranged subtree could each execute their own
    // exchange — offsets from one partitioning + ranks from another =
    // duplicate/gapped indices. The lineage cut pins ONE partitioning;
    // this asserts the observable contract.
    val df = (0 until 3000).map(i => (i.toLong, s"k${(i * 2654435761L) % 3000}%05d"))
      .toDF("id", "key")
    def run(parts: Int): Map[Long, Long] =
      rel.zipIndex(df, "key", parts).select(col("id"), col("idx"))
        .as[(Long, Long)].collect().toMap
    val a = run(3)
    assert(a.values.toSeq.sorted == (0L until 3000L), "indices must be dense 0..n-1")
    assert(run(11) == a, "idx must not depend on the partition count")
  }

  test("majorityLabel: winner, counts, agreement; lex-min tie-break; null abstains") {
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),          // clear majority
      (2L, "b"), (2L, "a"),                            // tie -> lex min "a"
      (3L, "x"), (3L, null.asInstanceOf[String]),      // null abstains
      (4L, "solo")
    ).toDF("item", "vote")
    val got = rel.majorityLabel(votes, "item", "vote")
      .orderBy("item")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "cat", 2L, 3L, 0.6667),
      (2L, "a", 1L, 2L, 0.5),
      (3L, "x", 1L, 1L, 1.0),
      (4L, "solo", 1L, 1L, 1.0)), got.toString)
  }

  test("kAnonymity: class sizes, sensitive diversity, and the k flag") {
    val rows = Seq(
      ("20s", "94110", 100), ("20s", "94110", 100), ("20s", "94110", 200),
      ("30s", "94110", 300),                        // singleton: at risk
      ("30s", "10001", 400), ("30s", "10001", 400)) // l_div = 1: no diversity
      .toDF("age_band", "zip", "salary")
    val got = rel.kAnonymity(rows, Seq("age_band", "zip"), "salary", k = 2)
      .orderBy("age_band", "zip")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("20s", "94110", 3L, 2L, 0L),
      ("30s", "10001", 2L, 1L, 0L),
      ("30s", "94110", 1L, 1L, 1L)), got.toString)
  }

  test("fleissKappa: textbook two-item case; single-rating items excluded") {
    // item 1: unanimous (a, a); item 2: split (a, b); item 3: one rating
    // P1 = 1, P2 = 0 -> pbar = .5; marginals over kept: a=3/4, b=1/4 ->
    // pe = .625; kappa = (.5 - .625)/(1 - .625) = -1/3
    val votes = Seq(
      (1L, 10L, "a"), (1L, 11L, "a"),
      (2L, 10L, "a"), (2L, 11L, "b"),
      (3L, 10L, "c"))
      .toDF("item", "rater", "label")
    val got = rel.fleissKappa(votes, "item", "rater", "label")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((2L, 4L, 500000L, 625000L, -125000L, 375000L)),
      got.toString)
  }

  test("mutualInfo: determined columns give MI = H and NMI = 1; independent give 0") {
    // b mirrors a exactly: every cell term equals the matching marginal
    // entropy term INCLUDING the floor quantization, so mi == h_a
    // exactly and nmi is exactly 1
    val det = Seq((0L, "x"), (0L, "x"), (1L, "y"), (1L, "y")).toDF("a", "b")
    val r = rel.mutualInfo(det, col("a"), col("b")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 2L)))
    assert(r.getDouble(5) == r.getDouble(3), "MI == H(a) when b determines a")
    assert(r.getDouble(3) == 0.693147, "H = ln 2 at 6dp")
    assert(r.getDouble(6) == 1.0)
    // uniform independent 2x2: every cell ratio is exactly 1, ln = 0
    val ind = Seq((0L, "x"), (0L, "y"), (1L, "x"), (1L, "y")).toDF("a", "b")
    val ri = rel.mutualInfo(ind, col("a"), col("b")).head()
    assert(ri.getDouble(5) == 0.0 && ri.getDouble(6) == 0.0)
    // one constant column: H(b) = 0, MI = 0, nmi = 0 (max-normalized);
    // BOTH constant is the only genuine 0/0 -> NULL
    val const = Seq((0L, "x"), (1L, "x")).toDF("a", "b")
    val rc = rel.mutualInfo(const, col("a"), col("b")).head()
    assert(rc.getDouble(4) == 0.0 && rc.getDouble(5) == 0.0
      && rc.getDouble(6) == 0.0)
    val both = Seq((0L, "x"), (0L, "x")).toDF("a", "b")
    val rb = rel.mutualInfo(both, col("a"), col("b")).head()
    assert(rb.getDouble(5) == 0.0 && rb.isNullAt(6))
  }

  test("tCloseness: hand TVD ppm, entropy l-diversity, at_risk flag") {
    // class A = {x,x,x,y}, B = {x,y,y,z}; global = {x:4, y:3, z:1}, N=8
    // tvd(A) = (|3/4-1/2| + |1/4-3/8| + |0-1/8|) / 2 = 1/4 -> 250000 ppm
    // (the z term is the closed-form absent-value mass)
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
        ("B", "x"), ("B", "y"), ("B", "y"), ("B", "z")).toDF("q", "v")
    val r = rel.tCloseness(df, Seq("q"), "v", tPpm = 240000L)
      .orderBy("q").collect()
    assert(r(0).getLong(1) == 4L && r(0).getLong(2) == 2L)
    assert(r(1).getLong(2) == 3L)
    assert(r(0).getLong(4) == 250000L && r(1).getLong(4) == 250000L)
    assert(r(0).getLong(5) == 1L && r(1).getLong(5) == 1L)
    // entropy via the op's own fixed-point cell discipline
    def ent(ps: Seq[Long], n: Long): Double = {
      val cells = ps.map(nv => math.floor(
        nv.toDouble * math.log(nv.toDouble / n.toDouble) * 1e6).toLong).sum
      math.floor(-cells.toDouble / 1e6 / n.toDouble * 1e4 + 0.5) / 1e4
    }
    assert(r(0).getDouble(3) == ent(Seq(3L, 1L), 4L))
    assert(r(1).getDouble(3) == ent(Seq(1L, 2L, 1L), 4L))
    // classes distributed exactly like the table -> tvd 0, not at risk
    val u = Seq(("C", "x"), ("C", "y"), ("D", "x"), ("D", "y")).toDF("q", "v")
    assert(rel.tCloseness(u, Seq("q"), "v").collect()
      .forall(x => x.getLong(4) == 0L && x.getLong(5) == 0L))
    intercept[IllegalArgumentException] {
      rel.tCloseness(df, Seq.empty, "v")
    }
  }

  test("chiSquare: perfect association, independence, textbook 2x2") {
    import spark.implicits._
    // perfect association: chi2 = N, V = 1
    val perfect = ((1 to 10).map(_ => ("x", "1")) ++
      (1 to 10).map(_ => ("y", "2"))).toDF("a", "b")
    val p = rel.chiSquare(perfect, col("a"), col("b")).head()
    assert(p.getLong(0) == 20L && p.getLong(3) == 1L)
    assert(p.getLong(4) == 20000000L && p.getDouble(5) == 1.0)
    // exact independence: chi2 = 0, V = 0
    val indep = (for { a <- Seq("x", "y"); b <- Seq("1", "2");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    val i = rel.chiSquare(indep, col("a"), col("b")).head()
    assert(i.getLong(4) == 0L && i.getDouble(5) == 0.0)
    // cells [[10,20],[20,10]]: chi2 = 60/9 = 6.666666 (q6 truncated
    // per-cell), V = sqrt(chi2/60) -> 0.3333
    val mixed = (
      (1 to 10).map(_ => ("x", "1")) ++ (1 to 20).map(_ => ("x", "2")) ++
      (1 to 20).map(_ => ("y", "1")) ++ (1 to 10).map(_ => ("y", "2"))
    ).toDF("a", "b")
    val m = rel.chiSquare(mixed, col("a"), col("b")).head()
    assert(m.getLong(4) == 6666666L, s"chi2_q6 = ${m.getLong(4)}")
    assert(m.getDouble(5) == 0.3333)
    // single-category column: dof 0, V null
    val one = (1 to 4).map(_ => ("x", "1")).toDF("a", "b")
    val o = rel.chiSquare(one, col("a"), col("b")).head()
    assert(o.getLong(3) == 0L && o.isNullAt(5))
    // truncation clamp: a 3x3 all-ones grid computes each cell quotient
    // as floor(1e12/9), summing a hair BELOW 1e12 — chi2 must clamp to
    // 0, not go negative (and V to 0.0)
    val nine = (for { a <- Seq("x", "y", "z"); bb <- Seq("1", "2", "3") }
      yield (a, bb)).toDF("a", "b")
    val n9 = rel.chiSquare(nine, col("a"), col("b")).head()
    assert(n9.getLong(4) == 0L, s"chi2_q6 = ${n9.getLong(4)}")
    assert(n9.getDouble(5) == 0.0)
  }
}
