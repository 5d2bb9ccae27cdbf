package graft

import org.apache.spark.sql.functions._

import graft.ops.sample

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministicSample: stable across runs, ~pct of rows, subset-monotone") {
    val s20a = sample.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val s20b = sample.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val s50 = sample.deterministicSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s20a == s20b)                    // no RNG state
    assert(s20a.subsetOf(s50))              // pct bands nest
    assert(s20a.size > 50 && s20a.size < 150) // ~20% of 500
  }

  test("stratifiedSample: per-stratum rates applied; nests in the flat sample") {
    val st = sample.stratifiedSample(docs, "doc_id", "lang",
      pcts = Map("en" -> 10, "zh" -> 60), defaultPct = 30, salt = "s")
    val counts = st.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // en kept at ~10%, zh at ~60%, others at ~30% (generous bounds at n~80-190)
    assert(counts("en").toDouble / totals("en") < 0.25)
    assert(counts("zh").toDouble / totals("zh") > 0.40)
    // a stratum's pct band nests inside the same-salt flat sample at 100%
    val flat60 = sample.deterministicSample(docs, "doc_id", 60, salt = "s")
      .select("doc_id").as[Long].collect().toSet
    val zhIds = st.where($"lang" === "zh").select("doc_id").as[Long].collect().toSet
    assert(zhIds.subsetOf(flat60))
  }

  test("weightedSample: clamps, edges, and monotonicity in the weight") {
    assert(sample.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(sample.weightedSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    assert(sample.weightedSample(docs, "doc_id", lit(5.0)).count() == docs.count())
    val half = sample.weightedSample(docs, "doc_id", lit(0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(half.size > 200 && half.size < 300) // ~50% of 500
    val fifth = sample.weightedSample(docs, "doc_id", lit(0.2))
      .select("doc_id").as[Long].collect().toSet
    assert(fifth.subsetOf(half)) // monotone: raising weight only adds rows
  }

  test("groupSplit: every group lands in exactly one split") {
    val g = sample.groupSplit(docs, "source", trainPct = 80, valPct = 10)
    val perGroup = g.groupBy("source")
      .agg(countDistinct($"split").as("n"))
      .as[(String, Long)].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 == 1L))
    assert(g.count() == docs.count())
  }

  test("split: disjoint, exhaustive, roughly proportioned") {
    val r = sample.split(docs, "doc_id", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(r.keySet == Set("train", "val", "test"))
    assert(r.values.sum == docs.count())
    assert(r("train") > r("val") && r("train") > r("test"))
  }

  test("packSequences: shard-local packs respect the budget; no row lost") {
    val packed = sample.packSequences(docs, "doc_id",
      graft.ops.text.tokenCount(col("text")).cast("long"), budget = 512, shards = 4)
    assert(packed.count() == docs.count())
    val packs = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    // a pack only exceeds budget by (at most) its final document
    val maxDoc = packed.agg(max("n_tokens")).head().getLong(0)
    assert(packs.forall { case (_, tok, _) => tok < 512 + maxDoc })
    // within each shard: pack ids are monotone in doc order, start at
    // local pack 0, and encode the shard in the high 32 bits
    val byShard = packed.select("pack_shard", "doc_id", "pack_id")
      .as[(Int, Long, Long)].collect().groupBy(_._1)
    assert(byShard.keySet.forall(s => s >= 0 && s < 4))
    byShard.foreach { case (sh, rows) =>
      val inOrder = rows.sortBy(_._2).map(_._3)
      assert(inOrder.head == sh.toLong * 4294967296L, s"shard $sh first pack")
      inOrder.toSeq.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0) <= w(1), s"shard $sh pack ids must not decrease")
      }
    }
  }

  test("perGroupSample: exactly n per group (or the whole group), stable, bounded plan") {
    val r = sample.perGroupSample(docs, "lang", "doc_id", n = 3)
    val per = r.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, tot) =>
      assert(per(lang) == math.min(3L, tot), s"lang $lang")
    }
    // ranks are 1..n and the selection is deterministic across runs
    assert(r.agg(max("sample_rank")).head().getInt(0) <= 3)
    val a = r.select("doc_id").as[Long].collect().toSet
    val b = sample.perGroupSample(docs, "lang", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // the rank filter compiles to a bounded per-group heap, not a sort
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("temperatureMix: rarest stratum keeps all, dominant downsampled, nested in alpha") {
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val rarest = totals.minBy { case (l, n) => (n, l) }._1
    val m5 = sample.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
    val k5 = m5.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(k5(rarest) == totals(rarest))            // rate 1.0 for n_min
    val dominant = totals.maxBy(_._2)._1
    assert(k5(dominant) < totals(dominant))          // downsampled
    // alpha = 1 keeps everything
    assert(sample.temperatureMix(docs, "doc_id", "lang", alpha = 1.0).count()
      == docs.count())
    // same salt: lower alpha's keep-set nests inside higher alpha's
    val ids3 = sample.temperatureMix(docs, "doc_id", "lang", alpha = 0.3)
      .select("doc_id").as[Long].collect().toSet
    val ids7 = sample.temperatureMix(docs, "doc_id", "lang", alpha = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(ids3.subsetOf(ids7))
  }

  test("toMixture: hits the target proportions; binding stratum kept whole; unnamed dropped") {
    val targets = Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0)
    val out = sample.toMixture(docs, "doc_id", "lang", targets).persist()
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // only targeted strata survive
    assert(kept.keySet == targets.keySet)
    // achieved proportions within hash-Bernoulli tolerance of the target
    val total = kept.values.sum.toDouble
    val wSum = targets.values.sum
    targets.foreach { case (g, w) =>
      val want = w / wSum
      val got = kept(g) / total
      assert(math.abs(got - want) < 0.05, s"$g: want $want got $got")
    }
    // the binding stratum (smallest n_g/w_g) keeps ~all of its rows
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val binding = targets.keys.minBy(g => totals(g) / (targets(g) / wSum))
    assert(kept(binding).toDouble / totals(binding) > 0.99,
      s"binding stratum $binding lost rows: ${kept(binding)}/${totals(binding)}")
    // deterministic: same inputs, same keep-set
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = sample.toMixture(docs, "doc_id", "lang", targets)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    out.unpersist()
    // a target naming an absent stratum is an error, not a silent empty
    val e = intercept[IllegalArgumentException] {
      sample.toMixture(docs, "doc_id", "lang", Map("xx" -> 1.0)).count()
    }
    assert(e.getMessage.contains("no rows"))
  }

  test("quantileBins: exact rank quartiles; ties share a bin; degenerate data collapses to bin 0") {
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val bins = sample.quantileBins(df, col("v"), nbins = 4, scale = 1.0)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))

    val tied = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 9.0)).toDF("id", "v")
    val tb = sample.quantileBins(tied, col("v"), nbins = 4, scale = 1.0)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(tb(1L) == tb(2L) && tb(2L) == tb(3L),
      "equal grid values must land in the same bin")
    assert(tb(1L) == 0L && tb(4L) == 3L)

    val const = Seq((1L, 2.0), (2L, 2.0)).toDF("id", "v")
    val cb = sample.quantileBins(const, col("v"), 4).select("bin")
      .as[Long].collect().toSet
    assert(cb == Set(0L), "all-equal data is all rank 0")
  }

  test("topFracByScore: smallest threshold-superset; ties kept whole; frac=1 keeps all") {
    // scores (4dp): 0.9 x1, 0.5 x3, 0.1 x2 -> N=6
    val df = Seq((1L, 0.9), (2L, 0.5), (3L, 0.5), (4L, 0.5), (5L, 0.1), (6L, 0.1))
      .toDF("id", "s")
    def kept(frac: Double) = graft.ops.sample.topFracByScore(df, col("s"), frac)
      .select("id").as[Long].collect().toSet
    // quota ceil(0.25·6)=2 -> thr drops to 0.5 (at-or-above 4): ties whole
    assert(kept(0.25) == Set(1L, 2L, 3L, 4L))
    // quota 1 -> thr 0.9, exactly the top row
    assert(kept(0.16) == Set(1L))
    assert(kept(1.0) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // null scores are excluded, not kept
    val withNull = Seq((1L, Some(0.9)), (2L, None)).toDF("id", "s")
    assert(graft.ops.sample.topFracByScore(withNull, col("s"), 1.0)
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("interleave: strict total order cycling through strata; small strata exhaust") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "g")
    val out = graft.ops.sample.interleave(df, "g", "id")
      .select("id", "order_idx").as[(Long, Long)].collect().toMap
    // K=2, a=idx 0 (ranks 0,1,2 -> 0,2,4), b=idx 1 (ranks 0,1 -> 1,3)
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 1L, 5L -> 3L))
    // strict total order: no index collisions
    assert(out.values.toSet.size == out.size)
    // sorted by order_idx, the strata alternate until b exhausts
    val order = out.toSeq.sortBy(_._2).map(_._1)
    assert(order == Seq(1L, 4L, 2L, 5L, 3L))
  }

  test("percentileRankBy matches percent_rank semantics per group") {
    val df = Seq((1L, "en", 10.0), (2L, "en", 20.0), (3L, "en", 20.0),
      (4L, "en", 30.0), (5L, "de", 7.0), (6L, "de", 9.0), (7L, "fr", 5.0))
      .toDF("id", "lang", "score")
    val got = graft.ops.sample.percentileRankBy(df, "lang", col("score"))
      .select("id", "pct_rank").as[(Long, Double)].collect().toMap
    // en (n=4): 10 -> 0/3, ties 20 -> 1/3 each, 30 -> 3/3
    assert(got(1L) === 0.0)
    assert(got(2L) === 1.0 / 3 && got(3L) === 1.0 / 3)
    assert(got(4L) === 1.0)
    // de (n=2): 0 and 1; fr single row = 0 (not NaN)
    assert(got(5L) === 0.0 && got(6L) === 1.0 && got(7L) === 0.0)
    // agrees with Spark's own percent_rank on the same data
    import org.apache.spark.sql.expressions.Window
    val ref = df.withColumn("pr", percent_rank().over(
        Window.partitionBy(col("lang")).orderBy(col("score"))))
      .select("id", "pr").as[(Long, Double)].collect().toMap
    assert(got === ref)
    // null scores, NaN scores, and null GROUP KEYS are all excluded
    // explicitly (a NaN would otherwise rank as score 0; a null group
    // would silently fall out of the grid join)
    val extra = Seq((8L, "en", Double.NaN)).toDF("id", "lang", "score")
      .select(col("id"), col("lang"), lit(null).cast("double").as("score"))
      .union(Seq((9L, "en", Double.NaN)).toDF("id", "lang", "score"))
      .union(Seq((10L, "xx", 5.0)).toDF("id", "lang", "score")
        .select(col("id"), lit(null).cast("string").as("lang"), col("score")))
    val ranked = graft.ops.sample.percentileRankBy(df.union(extra), "lang", col("score"))
    assert(ranked.where(col("id").isin(8L, 9L, 10L)).count() === 0)
    // and the valid rows' ranks are unaffected by the excluded ones
    assert(ranked.where(col("id") === 4L).head().getAs[Double]("pct_rank") === 1.0)
  }

  test("percentileRankBy: corpus is never sorted — rank rides a grid broadcast") {
    val plan = graft.ops.sample.percentileRankBy(docs, "lang", col("n_chars"),
      scale = 1.0).queryExecution.executedPlan.toString
    // the only window runs over the aggregated grid (post-HashAggregate),
    // and rows rejoin through a broadcast, not a shuffle join
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("weightedReservoir: exact k, deterministic, weight-dominant row always wins") {
    val df = Seq.tabulate(50) { i =>
      (i.toLong, if (i == 7) 1.0e9 else 1.0)
    }.toDF("id", "w")
    val pick = graft.ops.sample.weightedReservoir(df, "id", col("w"), k = 5)
    val ids = pick.select("id").as[Long].collect().toSet
    assert(ids.size === 5)
    // a weight 9 orders of magnitude above the rest keys ~0 (ln(u)/w -> 0,
    // the maximum of an all-negative key space): always selected
    assert(ids.contains(7L))
    // deterministic: same (id, salt) -> same sample
    val again = graft.ops.sample.weightedReservoir(df, "id", col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(again === ids)
    // a different salt draws a different sample (of the uniform rows)
    val other = graft.ops.sample.weightedReservoir(df, "id", col("w"), k = 5,
      salt = "other").select("id").as[Long].collect().toSet
    assert(other !== ids)
    // null / non-positive weights are excluded, not ranked
    val bad = Seq((100L, -1.0), (101L, 0.0)).toDF("id", "w")
      .union(Seq((102L, 1.0)).toDF("id", "w")
        .select(col("id"), lit(null).cast("double").as("w")))
    assert(graft.ops.sample.weightedReservoir(df.union(bad), "id", col("w"), 50)
      .where(col("id") >= 100L).count() === 0)
    // bounded heap, not a global sort
    val p = pick.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("packSequences: single-partition window never appears in the plan") {
    val packed = sample.packSequences(docs, "doc_id",
      graft.ops.text.tokenCount(col("text")).cast("long"), budget = 512)
    val plan = packed.queryExecution.executedPlan.toString
    // the window must be partitioned by the shard column (an empty
    // partitionBy would print "Window [...], [doc_id ASC..." with no
    // partition spec and warn at runtime)
    assert(plan.contains("pack_shard"), s"window not sharded:\n$plan")
  }

  test("epochShuffle is a deterministic permutation; seeds reorder it") {
    val df = (0L until 300L).toDF("id")
    val a1 = sample.epochShuffle(df, "id", seed = 1, parts = 4)
      .select("id", "epoch_pos").as[(Long, Long)].collect().toMap
    // dense 0-based permutation
    assert(a1.values.toSeq.sorted == (0L until 300L))
    // reproducible: same seed → identical positions
    val a2 = sample.epochShuffle(df, "id", seed = 1, parts = 4)
      .select("id", "epoch_pos").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
    // a different seed produces a genuinely different order
    val b = sample.epochShuffle(df, "id", seed = 2, parts = 4)
      .select("id", "epoch_pos").as[(Long, Long)].collect().toMap
    assert(a1 != b)
    // and the order is shuffled, not id order
    assert(a1.toSeq.sortBy(_._2).map(_._1) != (0L until 300L).toSeq)
  }

  test("balancedShards: serpentine deal, deterministic, near-equal token totals") {
    // heavy-tailed sizes: powers-ish + a giant
    val df = ((1L to 64L).map(i => (i, i * i)) :+ (99L, 50000L)).toDF("id", "toks")
    val out = sample.balancedShards(df, "id", col("toks"), shards = 4, parts = 4)
    val sums = out.groupBy("shard").agg(sum("toks").as("s"))
      .orderBy("shard").as[(Int, Long)].collect().toSeq
    assert(sums.map(_._1) == Seq(0, 1, 2, 3), "every shard must be used")
    // serpentine rank-0 item (the giant) goes to shard 0; ranks 1-3 fill
    // 1..3; ranks 4-7 come BACK 3..0 — check the two biggest non-giant
    val assign = out.select("id", "shard").as[(Long, Int)].collect().toMap
    assert(assign(99L) == 0)     // rank 0
    assert(assign(64L) == 1)     // rank 1
    assert(assign(61L) == 3)     // rank 4 (second pass, reversed) → shard 3
    // balance: without the giant, totals within ~one largest doc
    val nonGiant = sums.filter(_._1 != 0).map(_._2)
    assert(nonGiant.max - nonGiant.min <= 64L * 64L,
      s"shards unbalanced: $sums")
    // deterministic across runs
    val again = sample.balancedShards(df, "id", col("toks"), shards = 4, parts = 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(again == assign)
  }

  test("balancedShards: null size ranks as zero work, not first") {
    val df = Seq((1L, Some(100L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "toks")
    val assign = sample.balancedShards(df, "id", col("toks"), shards = 2, parts = 2)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    // ranks: 100 → 0, 50 → 1, null(0) → last (serpentine back to 1)
    assert(assign == Map(1L -> 0, 3L -> 1, 2L -> 1), assign.toString)
  }

  test("orderDiversity: interleave reads ~0, blocked order reads ~1, gaps drop pairs") {
    val docs = (0L until 30L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
    // blocked order (all of s0, then s1, then s2): 27/29 adjacent same
    val blocked = docs.withColumn("pos",
      (col("src").substr(2, 1).cast("long") * 10L) + col("id") / 3L)
    val rb = sample.orderDiversity(blocked, "pos", "src")
      .as[(Long, Long, Double)].head()
    assert(rb == ((29L, 27L, 0.931)), rb.toString)
    // round-robin interleave: zero adjacent-same
    val inter = sample.interleave(docs, "src", "id")
    val ri = sample.orderDiversity(inter, "order_idx", "src")
      .as[(Long, Long, Double)].head()
    assert(ri._2 == 0L && ri._3 == 0.0, ri.toString)
    // gapped positions contribute no pair
    val gap = Seq((0L, "a"), (5L, "a")).toDF("pos2", "src")
    val rg = sample.orderDiversity(gap, "pos2", "src")
      .as[(Long, Long, Double)].head()
    assert(rg == ((0L, 0L, 0.0)))
  }

  test("preferencePairs: extrema + margin; tie-breaks; degenerate groups dropped") {
    val resp = Seq(
      (10L, 1L, 0.9), (10L, 2L, 0.1), (10L, 3L, 0.5),   // clear best/worst
      (20L, 4L, 0.7), (20L, 5L, 0.7),                    // all tied -> dropped
      (30L, 6L, 0.3),                                    // singleton -> dropped
      (40L, 7L, 0.8), (40L, 8L, 0.8), (40L, 9L, 0.2), (40L, 10L, 0.2)
    ).toDF("grp", "rid", "score")
    val got = sample.preferencePairs(resp, "grp", "rid", "score")
      .orderBy("grp")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // grp 40: chosen = smallest id at top score (7), rejected = largest
    // id at bottom score (10); margins are raw IEEE subtraction
    // (0.8 - 0.2 = 0.6000000000000001), identical bits in any engine
    assert(got == Seq(
      (10L, 1L, 2L, 0.9, 0.1, 0.8),
      (40L, 7L, 10L, 0.8, 0.2, 0.8 - 0.2)), got.toString)
    // null scores are abstentions, not extrema
    val withNull = resp.union(Seq((10L, 99L, Option.empty[Double]))
      .toDF("grp", "rid", "score"))
    val g2 = sample.preferencePairs(withNull, "grp", "rid", "score")
      .where(col("grp") === 10L)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(g2 == ((10L, 1L, 2L, 0.9, 0.1, 0.8)), g2.toString)
  }

  test("domainReweight: integer mixture plan with epoch cap and realized shares") {
    // corpus: web 8000 tokens, code 1500, books 500 (total 10000)
    val df = Seq(("web", 8000L), ("code", 1500L), ("books", 500L))
      .toDF("domain", "toks")
    val got = sample.domainReweight(df, "domain", col("toks"),
        Map("web" -> 5000L, "code" -> 3000L, "books" -> 2000L), capBp = 30000L)
      .select("domain", "n_tokens", "share_bp", "target_bp", "epochs_bp",
        "eff_tokens", "realized_bp")
      .orderBy("domain")
      .as[(String, Long, Long, Long, Option[Long], Long, Long)].collect().toSeq
    // epochs_bp: web 5000*10000/8000 = 6250; code 3000*10000/1500 = 20000;
    // books 2000*10000/500 = 40000 -> CAPPED at 30000
    // eff: web 8000*6250/10000 = 5000; code 1500*2 = 3000; books 500*3 = 1500
    // eff total 9500 -> realized: 5263 / 3157 / 1578
    assert(got == Seq(
      ("books", 500L, 500L, 2000L, Some(30000L), 1500L, 1578L),
      ("code", 1500L, 1500L, 3000L, Some(20000L), 3000L, 3157L),
      ("web", 8000L, 8000L, 5000L, Some(6250L), 5000L, 5263L)), got.toString)
    // a targeted domain with no corpus rows surfaces as a zero row (full join)
    val missing = sample.domainReweight(df, "domain", col("toks"),
        Map("web" -> 5000L, "wiki" -> 5000L))
      .select("domain", "n_tokens", "share_bp", "target_bp", "epochs_bp",
        "eff_tokens", "realized_bp")
      .where(col("domain") === "wiki")
      .as[(String, Long, Long, Long, Option[Long], Long, Long)].head()
    assert(missing == (("wiki", 0L, 0L, 5000L, None, 0L, 0L)), missing.toString)
    // an un-targeted corpus domain gets target_bp 0, epochs 0, eff 0
    val untargeted = sample.domainReweight(df, "domain", col("toks"),
        Map("web" -> 10000L))
      .select("domain", "n_tokens", "share_bp", "target_bp", "epochs_bp",
        "eff_tokens", "realized_bp")
      .where(col("domain") === "code")
      .as[(String, Long, Long, Long, Option[Long], Long, Long)].head()
    assert(untargeted._4 == 0L && untargeted._5 == Some(0L) && untargeted._6 == 0L)
  }

  test("freshnessTopK: half-life shifts are exact; future rows excluded; top-k per group") {
    val rows = Seq(
      // (group, id, ts, weight)
      ("a", 1L, "2026-08-01 10:00:00", 1000L), // age 13d, 0 halvings (hl=30)
      ("a", 2L, "2026-06-01 10:00:00", 1000L), // age 74d, 2 halvings -> 250
      ("a", 3L, "2025-08-10 10:00:00", 9000L), // age 369d, 12 halvings -> 2
      ("a", 4L, "2026-09-01 10:00:00", 5000L), // future: excluded
      ("b", 5L, "2026-08-14 00:00:00", 7L))    // age 0 -> 7
      .toDF("grp", "id", "ts_s", "w")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = sample.freshnessTopK(rows, "grp", "id", "ts", col("w"),
        asOf = "2026-08-14", halfLifeDays = 30, k = 2)
      .orderBy("grp", "rnk")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 13L, 1000L, 1),
      ("a", 2L, 74L, 250L, 2),
      ("b", 5L, 0L, 7L, 1)), got.toString)
    // deep age saturates the shift at 62 instead of overflowing
    val ancient = Seq(("c", 9L, "1970-01-01 00:00:00", Long.MaxValue))
      .toDF("grp", "id", "ts_s", "w")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val s = sample.freshnessTopK(ancient, "grp", "id", "ts", col("w"),
        asOf = "2026-08-14", halfLifeDays = 1, k = 1)
      .select("score").as[Long].head()
    assert(s == (Long.MaxValue >> 62), s.toString)
  }

  test("splitLeakage: pair counts per unordered split combination, crosses flagged") {
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val assign = Seq(
      (1L, "train"), (2L, "train"), (3L, "test"),
      (4L, "test"), (5L, "train"), (6L, "val"), (7L, "val"))
      .toDF("doc_id", "split")
    val got = sample.splitLeakage(pairs, assign, "doc_id")
      .orderBy("split_a", "split_b")
      .as[(String, String, Long, Long)].collect().toSeq
    // (4,5) lands in the same unordered (test, train) cell as (1,3)
    assert(got == Seq(
      ("test", "train", 2L, 1L),
      ("train", "train", 1L, 0L),
      ("val", "val", 1L, 0L)), got.toString)
  }

  test("emd1d: identical distributions score 0; a one-bin shift scores binWidth") {
    val a = Seq(50L, 50L, 150L).toDF("f")
    assert(sample.emd1d(a, col("f"), a, col("f"), binWidth = 100L)
      .head().getDouble(3) == 0.0)
    val lo = Seq(50L, 60L).toDF("f")
    val hi = Seq(150L, 160L).toDF("f")
    val r = sample.emd1d(lo, col("f"), hi, col("f"), binWidth = 100L).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(3) == 100.0, "all mass moves exactly one bin")
    // asymmetric masses: emd is symmetric in its arguments
    val fwd = sample.emd1d(lo, col("f"), hi, col("f"), 100L).head().getDouble(3)
    val bwd = sample.emd1d(hi, col("f"), lo, col("f"), 100L).head().getDouble(3)
    assert(fwd == bwd)
  }

  test("ksStat: 0 on identical, 1 on disjoint, exact 1/3 on unit shift") {
    val a = Seq(1L, 2L, 3L).toDF("f")
    val b = Seq(2L, 3L, 4L).toDF("f")
    assert(sample.ksStat(a, col("f"), a, col("f")).head().getDouble(3) == 0.0)
    val r = sample.ksStat(a, col("f"), b, col("f")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 3L, "max |ca*tb - cb*ta| = 3 on the unit shift")
    assert(r.getDouble(3) == 0.333333, "quantized D = 1/3")
    val dis = sample.ksStat(Seq(1L, 2L).toDF("f"), col("f"),
      Seq(30L, 40L).toDF("f"), col("f")).head()
    assert(dis.getDouble(3) == 1.0, "disjoint supports separate fully")
    // symmetry: D(a,b) == D(b,a)
    assert(sample.ksStat(b, col("f"), a, col("f")).head().getDouble(3)
      == 0.333333)
  }

  test("histGrid snapshots merge by addition (the streaming sink law)") {
    val full = Seq(5L, 15L, 25L, 35L, 45L, 55L).toDF("f")
    val p1 = Seq(5L, 15L, 25L).toDF("f")
    val p2 = Seq(35L, 45L, 55L).toDF("f")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long)].collect().toMap
    val whole = key(sample.histGrid(full, col("f"), Seq.empty, 20L))
    val merged = key(
      sample.histGrid(p1, col("f"), Seq.empty, 20L)
        .unionByName(sample.histGrid(p2, col("f"), Seq.empty, 20L))
        .groupBy(col("bin")).agg(sum(col("n")).as("n")))
    assert(whole == merged && whole.values.sum == 6L)
  }

  test("psiFrom: 0 on matching grids, positive on a shifted day, union domain") {
    val ref = sample.histGrid(Seq(5L, 5L, 25L, 25L).toDF("f"),
      col("f"), Seq.empty, 10L)
    // day d1 matches ref exactly; day d2 piles everything into one bin
    val cur = sample.histGrid(
      Seq(("d1", 5L), ("d1", 5L), ("d1", 25L), ("d1", 25L),
        ("d2", 5L), ("d2", 5L), ("d2", 5L), ("d2", 5L)).toDF("day", "x"),
      col("x"), Seq(col("day")), 10L)
    val got = sample.psiFrom(ref, cur, Seq("day"))
      .orderBy(col("day")).collect()
    assert(got.length == 2)
    val d1 = got(0); val d2 = got(1)
    assert(d1.getString(0) == "d1" && d1.getLong(1) == 4L
      && d1.getLong(2) == 2L && d1.getDouble(3) == 0.0,
      s"identical day scores exactly 0: $d1")
    assert(d2.getString(0) == "d2" && d2.getLong(1) == 4L
      && d2.getLong(2) == 2L && d2.getDouble(3) > 0.5,
      s"collapsed day scores a major shift: $d2")
  }

  test("matchDistribution: rates follow target/source, absent bins drop") {
    // source: bins 0 and 1 each 100 rows; target: 3:1 toward bin 0;
    // source bin 2 has no target mass -> keep_ppm 0.
    val src = ((0 until 100).map(i => (i.toLong, 5L)) ++
      (0 until 100).map(i => (1000L + i, 15L)) ++
      Seq((5000L, 25L))).toDF("id", "f")
    val tgt = ((0 until 75).map(i => (i.toLong, 5L)) ++
      (0 until 25).map(i => (i.toLong, 15L))).toDF("id", "f")
    val got = sample.matchDistribution(src, col("f"), tgt, col("f"), "id",
        binWidth = 10L)
      .select("bin", "keep_ppm").distinct()
      .as[(Long, Long)].collect().toMap
    // ratios: bin0 (75/100)/(100/201), bin1 (25/100)/(100/201),
    // bin2 0 -> normalized by max (bin0): 1e6, 333333, 0
    assert(got(0L) == 1000000L && got(2L) == 0L)
    assert(got(1L) == 333333L, got.toString)
    // kept rows: every bin-2 row dropped; bin-0 keeps everything
    val kept = sample.matchDistribution(src, col("f"), tgt, col("f"), "id",
        binWidth = 10L)
      .groupBy("bin").agg(sum("kept").as("k"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(kept(0L) == ((100L, 100L)), "max-ratio bin keeps all")
    assert(kept(2L)._1 == 0L)
    assert(kept(1L)._1 > 15L && kept(1L)._1 < 55L, s"~1/3 kept: ${kept(1L)}")
  }

  test("bootstrapCI: deterministic, Poisson-mean-1 mass, constant corpus") {
    val df = (0 until 500).map(i => (i.toLong, 2.5)).toDF("id", "v")
    val a = sample.bootstrapCI(df, "v", "id", reps = 20).orderBy("rep")
      .collect().toSeq
    val b = sample.bootstrapCI(df, "v", "id", reps = 20).orderBy("rep")
      .collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "hash-seeded: reruns identical")
    // E[n_eff] = n per rep; across 20 reps of 500 rows the total weight
    // concentrates hard around 10000
    val total = a.map(_.getLong(1)).sum
    assert(total > 9000 && total < 11000, s"Poisson(1) mass, got $total")
    // constant metric -> every resample mean is exactly the value
    a.filter(_.getLong(1) > 0).foreach(r => assert(r.getDouble(3) == 250.0))
  }

  test("bootstrapCI: resample means bracket the true mean") {
    val df = (0 until 400).map(i => (i.toLong, (i % 10).toDouble))
      .toDF("id", "v")
    val means = sample.bootstrapCI(df, "v", "id", reps = 40)
      .where(col("n_eff") > 0).select("mean_q4").as[Double].collect()
    // true mean = 4.5 (=450 cents); spread should straddle it
    assert(means.min < 450.0 && means.max > 450.0,
      s"CI straddles the mean: [${means.min}, ${means.max}]")
  }

  test("packLayout: hand-computed concat-and-chunk layout; zero-token docs excluded") {
    val df = Seq(
      (0L, "a b c"), (1L, "d e"), (2L, "f g h i j"),
      (3L, ""), (4L, "k"), (5L, "l m n")
    ).toDF("doc_id", "text")
    val got = sample.packLayout(df, "text", "doc_id", seqLen = 4L, shards = 2)
      .orderBy("doc_id")
      .select("doc_id", "shard", "n_tokens", "start", "bin_first", "bin_last",
        "split")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // shard 0 stream: doc0 (3 toks @0), doc2 (5 @3), doc4 (1 @8)
    // shard 1 stream: doc1 (2 @0), doc5 (3 @2); doc3 empty -> excluded
    assert(got == Seq(
      (0L, 0L, 3L, 0L, 0L, 0L, 0L),
      (1L, 1L, 2L, 0L, 0L, 0L, 0L),
      (2L, 0L, 5L, 3L, 0L, 1L, 1L),
      (4L, 0L, 1L, 8L, 2L, 2L, 0L),
      (5L, 1L, 3L, 2L, 0L, 1L, 1L)))
    val st = sample.packStats(df, "text", "doc_id", seqLen = 4L, shards = 2)
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(st == Seq(
      (0L, 3L, 9L, 3L, 3L, 1L),
      (1L, 2L, 5L, 2L, 3L, 1L)))
  }
}
