package graft

import org.apache.spark.sql.functions._

import graft.ops.rel

/** Known-answer tests for the relational mining ops added round 10:
  * association rules, out-of-fold target encoding, grid-quantile RFM. */
class RelMinersSpec extends SparkSpec {
  import spark.implicits._

  test("assocRules: supports, confidence, and lift on a hand basket set") {
    // 4 baskets: {a,b}, {a,b}, {a,c}, {b}. With minSupport=2:
    // items a=3, b=3 (c=1 pruned); pair (a,b)=2.
    val df = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (2L, "a") // dup row: presence only
    ).toDF("basket", "item")
    val rows = rel.assocRules(df, "basket", "item", minSupport = 2L)
      .orderBy("ante").collect()
    assert(rows.length == 2)
    val ab = rows(0)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b")
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 3L && ab.getLong(4) == 3L)
    assert(ab.getLong(5) == 4L, "4 baskets")
    assert(ab.getLong(6) == 666666L, "conf = 2/3")
    assert(ab.getLong(7) == 888888L, "lift = 2*4/(3*3)")
    val ba = rows(1)
    assert(ba.getString(0) == "b" && ba.getLong(6) == 666666L)
  }

  test("assocRules: minConfPpm filters low-confidence directions") {
    // a in 4 baskets, b in 2, pair in 2: conf a->b = 1/2, b->a = 1.
    val df = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (4L, "a")
    ).toDF("basket", "item")
    val rows = rel.assocRules(df, "basket", "item", minSupport = 2L,
      minConfPpm = 900000L).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "b" && rows(0).getString(1) == "a")
  }

  test("targetEncode: each fold's encode excludes exactly its own rows") {
    // one category, ids 0..9, target = id dollars. Whatever the fold
    // assignment, oof_cents + own cents = total, oof_n + n_fold = 10.
    val df = (0 until 10).map(i => (i.toLong, "x", i.toDouble))
      .toDF("id", "cat", "y")
    val rows = rel.targetEncode(df, "cat", "y", "id", k = 3).collect()
    val totalCents = (0 until 10).map(_ * 100L).sum
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == 10L, "n_fold + oof_n = n")
    }
    assert(rows.map(_.getLong(2)).sum == 10L, "folds partition the rows")
    val anyFold = rows.head
    // reconstruct own-fold cents from the complement and check the mean
    val own = totalCents - anyFold.getLong(4)
    assert(own >= 0 && own <= totalCents)
    val q4 = anyFold.getDouble(5)
    assert(q4 == math.floor(anyFold.getLong(4).toDouble /
      anyFold.getLong(3).toDouble * 10000.0) / 10000.0)
  }

  test("prefixSum: exclusive cumulative equals the naive window") {
    val df = Seq((1L, 10L), (3L, 20L), (5L, 5L), (9L, 7L), (12L, 1L))
      .toDF("k", "v")
    val got = rel.prefixSum(df, "k", col("v"), parts = 3)
      .orderBy("k").select("k", "cum_before")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (3L, 10L), (5L, 30L), (9L, 35L), (12L, 42L)))
  }

  test("gini: uniform is 0, total concentration approaches 1") {
    val uniform = Seq.fill(10)(100L).toDF("v")
    val u = rel.gini(uniform, col("v")).head()
    assert(u.getLong(0) == 10L && u.getDouble(2) == 0.0)
    // one holder of everything: G = (n-1)/n = 0.9
    val conc = (Seq.fill(9)(0L) :+ 1000L).toDF("v")
    assert(rel.gini(conc, col("v")).head().getDouble(2) == 0.9)
    // hand case: values 1,2,3 -> G = 2/9 = 0.2222 floor-4dp
    val hand = Seq(1L, 2L, 3L).toDF("v")
    assert(rel.gini(hand, col("v")).head().getDouble(2) == 0.2222)
  }

  test("benford: a perfectly Benford corpus scores ~0; uniform digits high") {
    // build counts proportional to Benford: digit d appears round(p_d*1e4)
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(math.log10(1.0 + 1.0 / d) * 10000).toInt
      Seq.fill(n)(d.toLong * 1000L)
    }
    val b = rel.benford(rows.toDF("v"), col("v"))
    val chi = b.select("chi2_q4").head().getDouble(0)
    assert(chi < 1.0, s"near-Benford chi2 should be tiny, got $chi")
    assert(b.count() == 9L, "all nine digits surface")
    // uniform first digits: strongly non-Benford
    val u = (1 to 9).flatMap(d => Seq.fill(100)(d.toLong * 10L)).toDF("v")
    val chiU = rel.benford(u, col("v")).select("chi2_q4").head().getDouble(0)
    assert(chiU > 15.51, s"uniform digits must reject, got $chiU")
  }

  test("schemaDiff: added, removed, and retyped columns; no data read") {
    val before = Seq((1L, "a", 1.0)).toDF("id", "keep", "retype")
    val after = Seq((1L, "a", 1, "new")).toDF("id", "keep", "retype", "extra")
    val got = rel.schemaDiff(before, after)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("extra", "added"), ("retype", "retyped")))
    val r = rel.schemaDiff(before, after)
      .where(col("column") === "retype").head()
    assert(r.getString(2) == "double" && r.getString(3) == "int")
    assert(rel.schemaDiff(before, before).count() == 0L)
  }

  test("rfm: grid scores are monotone and ties share a score") {
    // 5 customers, one order each on distinct days with distinct value;
    // plus two customers tied on every metric.
    val df = Seq(
      (1L, "2024-01-01", 100.0), (2L, "2024-01-02", 200.0),
      (3L, "2024-01-03", 300.0), (4L, "2024-01-04", 400.0),
      (5L, "2024-01-05", 500.0),
      (6L, "2024-01-05", 500.0), (7L, "2024-01-05", 500.0)
    ).toDF("cust", "d", "amt")
      .withColumn("d", col("d").cast("timestamp"))
    val rows = rel.rfm(df, "cust", "d", "amt", buckets = 5,
      binCents = 10000L).orderBy("cust").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // customer 1 is oldest and cheapest: lowest r and m scores
    assert(byId(1L).getLong(4) == 1L && byId(1L).getLong(6) == 1L)
    // 5, 6, 7 are identical -> identical scores (ntile would split them)
    val s567 = Seq(5L, 6L, 7L).map(i => (byId(i).getLong(4),
      byId(i).getLong(5), byId(i).getLong(6)))
    assert(s567.distinct.length == 1, "ties share scores")
    // monotone: later day -> higher r score
    val rScores = Seq(1L, 2L, 3L, 4L, 5L).map(byId(_).getLong(4))
    assert(rScores == rScores.sorted)
    // frequency identical for everyone -> all f scores equal
    assert(rows.map(_.getLong(5)).distinct.length == 1)
  }

  test("rfm: NULL date/amount customers drop silently, not NPE") {
    // customer 9 has a NULL order date (NULL recency grid key) and
    // customer 10 a NULL amount (NULL monetary key): both must be
    // dropped by the score-map join — the lazy-join contract — rather
    // than crash localize's getLong at construction time.
    val df = Seq(
      (1L, Some("2024-01-01"), Some(100.0)),
      (2L, Some("2024-01-02"), Some(200.0)),
      (9L, None: Option[String], Some(300.0)),
      (10L, Some("2024-01-03"), None: Option[Double])
    ).toDF("cust", "d", "amt")
      .withColumn("d", col("d").cast("timestamp"))
    val rows = rel.rfm(df, "cust", "d", "amt", buckets = 2,
      binCents = 10000L).orderBy("cust").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
