package graft

import org.apache.spark.sql.functions._

import graft.ops.sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, bounded relative error above k") {
    // group "small": 40 distinct values (< k=64) -> exact count
    // group "big": 5000 distinct values -> estimated
    val rows = (0 until 40).map(v => ("small", v.toLong)) ++
      (0 until 5000).map(v => ("big", 100000L + v)) ++
      (0 until 40).map(v => ("small", v.toLong)) // duplicates collapse
    val df = rows.toDF("g", "v")
    val r = sketch.kmvDistinct(df, col("v"), Seq(col("g")), k = 64)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r("small") == ((40L, 40.0)))
    val (nMin, est) = r("big")
    assert(nMin == 64L)
    // KMV stderr ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"estimate $est too far from 5000")
  }

  test("histogram: equal-width bins, clamped edges, empty bins emitted") {
    import graft.ops.sketch
    val df = (0 until 10).map(_.toDouble).toDF("v") // 0..9 → 5 bins of 2
    val out = sketch.histogram(df, col("v"), lo = 0.0, hi = 10.0, nbins = 5)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L, 2L, 2L, 2L))
    assert(out(0).getDouble(1) == 0.0 && out(0).getDouble(2) == 2.0)
    assert(out(4).getDouble(1) == 8.0 && out(4).getDouble(2) == 10.0)

    val sparse = Seq(-5.0, 0.5, 100.0).toDF("v") // clamp below + above
    val s = sketch.histogram(sparse, col("v"), 0.0, 10.0, 5)
      .orderBy("bin").collect().map(_.getLong(3)).toSeq
    assert(s == Seq(2L, 0L, 0L, 0L, 1L),
      "outliers clamp into edge bins; middle bins emit 0")
  }

  test("countMin: exact at generous width, never undercounts, zero for absent") {
    import graft.ops.sketch
    val words = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = words.toDF("w")
    val sk = sketch.countMin(df, col("w"), depth = 4, width = 4096)
    val est = sketch.cmEstimate(sk, Seq("alpha", "beta", "gamma", "absent"),
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") == 7L && est("beta") == 3L && est("gamma") == 1L)
    assert(est("absent") == 0L)
    // tiny width forces collisions: estimates may only go UP
    val tight = sketch.cmEstimate(
        sketch.countMin(df, col("w"), depth = 4, width = 2),
        Seq("alpha", "beta", "gamma"), depth = 4, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight("alpha") >= 7L && tight("beta") >= 3L && tight("gamma") >= 1L)
  }

  test("countMin: null values are no observation — no null-bucket cells") {
    import graft.ops.sketch
    val df = Seq(Some("x"), None, Some("x"), None).toDF("w")
    val sk = sketch.countMin(df, col("w"), depth = 4, width = 64)
    assert(sk.where(col("bucket").isNull).count() == 0,
      "h32(null) cells must not pollute the depth x width cell set")
    // the sketch equals the null-free input's sketch cell-for-cell
    val clean = sketch.countMin(Seq("x", "x").toDF("w"), col("w"), depth = 4, width = 64)
    assert(sk.exceptAll(clean).count() == 0 && clean.exceptAll(sk).count() == 0)
  }

  test("countMin sketches are mergeable: union sketch = cell-wise sum") {
    import graft.ops.sketch
    val a = Seq("x", "x", "y").toDF("w")
    val b = Seq("y", "z").toDF("w")
    val merged = sketch.cmMerge(
      sketch.countMin(a, col("w"), 4, 64),
      sketch.countMin(b, col("w"), 4, 64))
    val direct = sketch.countMin(a.union(b), col("w"), 4, 64)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("countMin dimension stamp: narrow-build-wide-declare is caught") {
    import graft.ops.sketch
    val df = Seq("x", "y", "z").toDF("w")
    // built at 64, declared 4096: every cell is positionally in range,
    // so only the stamp can catch this (the round-9 advisor case)
    val narrow = sketch.countMin(df, col("w"), depth = 4, width = 64)
    val ex = intercept[Exception] {
      sketch.cmEstimate(narrow, Seq("x"), depth = 4, width = 4096).collect()
    }
    assert(ex.getMessage.contains("built at depth"), ex.getMessage)
    // cmJoinSize with declared width: same stamp check, both sides
    val wide = sketch.countMin(df, col("w"), depth = 4, width = 4096)
    val ex2 = intercept[Exception] {
      sketch.cmJoinSize(narrow, wide, depth = 4, width = 4096).collect()
    }
    assert(ex2.getMessage.contains("built at depth"), ex2.getMessage)
    // ...and with width = 0 the sides are checked against EACH OTHER on
    // every PAIRED cell — use enough keys that the mismatched builds
    // actually collide in the shared bucket range (3 values may produce
    // disjoint cells, the documented best-effort edge of this form)
    val big = (0 until 300).map(i => s"k$i").toDF("w")
    val ex3 = intercept[Exception] {
      sketch.cmJoinSize(
        sketch.countMin(big, col("w"), depth = 4, width = 64),
        sketch.countMin(big, col("w"), depth = 4, width = 4096),
        depth = 4).collect()
    }
    assert(ex3.getMessage.contains("different dimensions"), ex3.getMessage)
    // matching builds sail through both forms
    assert(sketch.cmJoinSize(narrow,
      sketch.countMin(df, col("w"), 4, 64), depth = 4).count() == 1)
  }

  test("kmvDistinct is deterministic across runs and partitionings") {
    val df = (0 until 3000).map(v => ("g", v.toLong)).toDF("g", "v")
    def run(parts: Int): Double =
      sketch.kmvDistinct(df.repartition(parts), col("v"), Seq(col("g")), k = 32)
        .select("distinct_est").as[Double].head()
    assert(run(2) == run(7))
  }

  test("hll: full register spine, duplicate-insensitive, bounded error") {
    val rows = (0 until 5000).map(v => ("big", v.toLong)) ++
      (0 until 5000).map(v => ("big", v.toLong)) ++ // dups change nothing
      (0 until 30).map(v => ("small", v.toLong))
    val regs = sketch.hll(rows.toDF("g", "v"), col("v"), Seq("g"), p = 6)
    // exactly m = 64 registers per group, zeros included
    assert(regs.groupBy("g").count().as[(String, Long)].collect().toMap
      == Map("big" -> 64L, "small" -> 64L))
    val dedupped = sketch.hll(rows.distinct.toDF("g", "v"), col("v"), Seq("g"), 6)
    assert(regs.exceptAll(dedupped).count() == 0 &&
      dedupped.exceptAll(regs).count() == 0,
      "hll state is a function of the SET, not the multiset")
    val est = sketch.hllEstimate(regs, Seq("g"), p = 6)
      .select(col("g"), col("hll_est")).as[(String, Double)].collect().toMap
    // stderr ~ 1.04/sqrt(64) = 13%; allow 4 sigma on the raw estimator
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.52,
      s"hll_est ${est("big")} too far from 5000")
    // small group: n_zero surfaced for linear counting
    val nz = sketch.hllEstimate(regs, Seq("g"), 6)
      .where(col("g") === "small").select("n_zero").as[Long].head()
    assert(nz > 0 && nz < 64)
  }

  test("hll merge law: merge(hll(A), hll(B)) == hll(A union B) exactly") {
    val a = (0 until 800).map(v => ("g", "a" + v)).toDF("g", "v")
    val b = (400 until 1200).map(v => ("g", "a" + v)).toDF("g", "v") // overlap
    val merged = sketch.hllMerge(
      sketch.hll(a, col("v"), Seq("g"), 6),
      sketch.hll(b, col("v"), Seq("g"), 6), Seq("g"))
    val direct = sketch.hll(a.union(b), col("v"), Seq("g"), 6)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("histogram merge law: cell-wise sum == histogram of the union") {
    val a = (0 until 10).map(_.toDouble).toDF("v")
    val b = Seq(3.0, 7.0, 50.0, -2.0).toDF("v") // incl. clamped outliers
    val merged = sketch.histogramMerge(
      sketch.histogram(a, col("v"), 0.0, 10.0, 5),
      sketch.histogram(b, col("v"), 0.0, 10.0, 5))
    val direct = sketch.histogram(a.union(b), col("v"), 0.0, 10.0, 5)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("histogramQuantile: hand-computed interpolation, edges, empty-bin skip") {
    // 0..9 over [0,10) x5 bins -> 2 per bin; cum 2,4,6,8,10
    val hist = sketch.histogram((0 until 10).map(_.toDouble).toDF("v"),
      col("v"), 0.0, 10.0, 5)
    val r = sketch.histogramQuantile(hist, Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("q").as[(Double, Double)].collect().toSeq
    assert(r == Seq((0.0, 0.0), (0.25, 2.5), (0.5, 5.0), (1.0, 10.0)))
    // empty middle bins are skipped: values only in bins 0 and 4
    val sparse = sketch.histogram(Seq(1.0, 1.0, 9.0, 9.0).toDF("v"),
      col("v"), 0.0, 10.0, 5)
    val s = sketch.histogramQuantile(sparse, Seq(0.75))
      .as[(Double, Double)].head()
    // r=3: bin4 (cum 4, below 2), frac 0.5 -> 9.0
    assert(s == ((0.75, 9.0)))
  }

  test("histogramBy: per-group full spine; merge law holds with group keys") {
    val a = ((0 until 10).map(v => ("en", v.toDouble)) ++
      (0 until 4).map(v => ("de", v.toDouble))).toDF("g", "v")
    val b = Seq(("en", 3.0), ("de", 9.0)).toDF("g", "v")
    val ha = sketch.histogramBy(a, col("v"), Seq("g"), 0.0, 10.0, 5)
    // full 5-bin spine per observed group
    assert(ha.groupBy("g").count().as[(String, Long)].collect().toMap
      == Map("en" -> 5L, "de" -> 5L))
    val merged = sketch.histogramMerge(ha,
      sketch.histogramBy(b, col("v"), Seq("g"), 0.0, 10.0, 5))
    val direct = sketch.histogramBy(a.union(b), col("v"), Seq("g"), 0.0, 10.0, 5)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("histogramQuantileBy: per-group medians match the global op per slice") {
    val df = ((0 until 10).map(v => ("en", v.toDouble)) ++
      (0 until 20).map(v => ("de", v.toDouble / 2))).toDF("g", "v")
    val byLang = sketch.histogramQuantileBy(
      sketch.histogramBy(df, col("v"), Seq("g"), 0.0, 10.0, 5),
      Seq("g"), Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    for (g <- Seq("en", "de"); q <- Seq(0.5, 0.9)) {
      val global = sketch.histogramQuantile(
        sketch.histogram(df.where(col("g") === g), col("v"), 0.0, 10.0, 5),
        Seq(q)).as[(Double, Double)].head()._2
      assert(byLang((g, q)) == global, s"($g, $q)")
    }
  }

  test("kmv merge law: kmvMerge(kmv(A), kmv(B)) == kmv(A union B) exactly") {
    val a = (0 until 900).map(v => ("g", "u" + v)).toDF("g", "v")
    val b = (500 until 1400).map(v => ("g", "u" + v)).toDF("g", "v")
    val merged = sketch.kmvMerge(
      sketch.kmv(a, col("v"), Seq("g"), k = 64),
      sketch.kmv(b, col("v"), Seq("g"), k = 64), Seq("g"), k = 64)
    val direct = sketch.kmv(a.union(b), col("v"), Seq("g"), k = 64)
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }

  test("kmvOverlap: EXACT counts and Jaccard when both sets are below k") {
    // A = {0..29}, B = {20..49}: |A∪B| = 50, |A∩B| = 10, J = 0.2
    val a = (0 until 30).map(v => ("g", v.toLong)).toDF("g", "v")
    val b = (20 until 50).map(v => ("g", v.toLong)).toDF("g", "v")
    val r = sketch.kmvOverlap(
      sketch.kmv(a, col("v"), Seq("g"), k = 64),
      sketch.kmv(b, col("v"), Seq("g"), k = 64), Seq("g"), k = 64)
      .select("n_min", "k_cap", "union_est", "jaccard", "intersect_est")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((50L, 10L, 50.0, 0.2, 10.0)))
  }

  test("kmvOverlap: bounded error in the estimate regime; disjoint sets -> 0") {
    // |A| = 4000, |B| = 3000, overlap 2000: union 5000, jaccard 0.4
    val a = (0 until 4000).map(v => ("g", "x" + v)).toDF("g", "v")
    val b = (2000 until 5000).map(v => ("g", "x" + v)).toDF("g", "v")
    val r = sketch.kmvOverlap(
      sketch.kmv(a, col("v"), Seq("g"), k = 256),
      sketch.kmv(b, col("v"), Seq("g"), k = 256), Seq("g"), k = 256)
      .select("union_est", "jaccard", "intersect_est")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 5000.0) / 5000.0 < 0.3, s"union ${r._1}")
    assert(math.abs(r._2 - 0.4) < 0.15, s"jaccard ${r._2}")
    assert(math.abs(r._3 - 2000.0) / 2000.0 < 0.45, s"intersect ${r._3}")
    val disj = sketch.kmvOverlap(
      sketch.kmv(a, col("v"), Seq("g"), k = 64),
      sketch.kmv(a.select(col("g"), concat(lit("zz"), col("v")).as("v")),
        col("v"), Seq("g"), k = 64), Seq("g"), k = 64)
      .select("k_cap", "jaccard", "intersect_est")
      .as[(Long, Double, Double)].head()
    assert(disj == ((0L, 0.0, 0.0)))
  }

  test("hll is deterministic across partitionings; nulls are no observation") {
    val df = (0 until 2000).map(v => ("g", v.toString)).toDF("g", "v")
    def run(parts: Int) =
      sketch.hll(df.repartition(parts), col("v"), Seq("g"), 8)
        .orderBy("register").collect().toSeq
    assert(run(2) == run(7))
    val withNulls = Seq(("g", Some("x")), ("g", None), ("g", Some("y")))
      .toDF("g", "v")
    val clean = Seq(("g", "x"), ("g", "y")).toDF("g", "v")
    val s1 = sketch.hll(withNulls, col("v"), Seq("g"), 6)
    val s2 = sketch.hll(clean, col("v"), Seq("g"), 6)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("bloom: full spine, merge law, no false negatives, 63-bit masks") {
    val a = (0 until 50).map(i => s"a$i").toDF("v")
    val b = (0 until 50).map(i => s"b$i").toDF("v")
    val both = a.unionByName(b)
    val (m, k) = (1953, 3) // 31 words of 63 bits exactly

    val bl = sketch.bloom(both, col("v"), m, k).orderBy("word")
      .as[(Long, Long)].collect().toSeq
    // fixed-shape artifact: the full word spine, in order
    assert(bl.map(_._1) == (0L until 31L))
    // no mask ever reaches bit 63: every word is non-negative
    assert(bl.forall(_._2 >= 0L))

    // merge law: word-wise OR of the halves == bloom of the union
    val merged = sketch.bloomMerge(
      sketch.bloom(a, col("v"), m, k), sketch.bloom(b, col("v"), m, k))
      .orderBy("word").as[(Long, Long)].collect().toSeq
    assert(merged == bl)

    // nulls are no observation
    val withNull = both.unionByName(Seq(Option.empty[String]).toDF("v"))
    assert(sketch.bloom(withNull, col("v"), m, k).orderBy("word")
      .as[(Long, Long)].collect().toSeq == bl)

    // no false negatives: every inserted value tests true in-row
    val words = bl.map(_._2)
    val misses = both
      .where(!sketch.bloomMightContain(words, col("v"), m, k)).count()
    assert(misses == 0L)
    // and the filter rejects the bulk of a disjoint probe set (FP rate
    // at n=100, m=1953, k=3 is ~0.2% — 500 probes, allow a handful)
    val probes = (0 until 500).map(i => s"z$i").toDF("v")
    val fps = probes
      .where(sketch.bloomMightContain(words, col("v"), m, k)).count()
    assert(fps <= 10L, s"implausible bloom FP count $fps/500")
  }

  test("cmJoinSize never undercounts and is exact at collision-free width") {
    // a: key k appears k times (k=1..20); b: each key once → true join
    // size = Σk = 210
    val a = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1L to 20L).toDF("k")
    val trueSize = a.join(b, Seq("k")).count()
    assert(trueSize == 210L)
    val est = sketch.cmJoinSize(
      sketch.countMin(a, col("k"), depth = 4, width = 4096),
      sketch.countMin(b, col("k"), depth = 4, width = 4096), depth = 4)
      .head().getLong(0)
    // 20 keys in 4096 buckets: collisions essentially impossible → exact
    assert(est == 210L, s"expected exact estimate, got $est")
    // narrow width: collisions only ever ADD mass
    val estNarrow = sketch.cmJoinSize(
      sketch.countMin(a, col("k"), depth = 4, width = 4),
      sketch.countMin(b, col("k"), depth = 4, width = 4), depth = 4)
      .head().getLong(0)
    assert(estNarrow >= 210L, s"CM join estimate undercounted: $estNarrow")
  }

  test("cmJoinSize is 0 for disjoint key sets at generous width") {
    val a = (1L to 50L).toDF("k")
    val b = (1000L to 1050L).toDF("k")
    val est = sketch.cmJoinSize(
      sketch.countMin(a, col("k"), depth = 4, width = 8192),
      sketch.countMin(b, col("k"), depth = 4, width = 8192), depth = 4)
      .head().getLong(0)
    assert(est == 0L, s"disjoint keys should estimate 0 at width 8192, got $est")
  }

  test("cmJoinSize width guard rejects sketches built with a different width") {
    val a = (1L to 50L).toDF("k")
    // left built at width 4096, right at 64: positionally meaningless —
    // the guard must fail the job instead of returning a number
    val wide = sketch.countMin(a, col("k"), depth = 4, width = 4096)
    val narrow = sketch.countMin(a, col("k"), depth = 4, width = 64)
    val e = intercept[Exception] {
      sketch.cmJoinSize(wide, narrow, depth = 4, width = 64).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("cmJoinSize")), e.getMessage)
    // matching widths with the guard on still work
    val ok = sketch.cmJoinSize(wide,
      sketch.countMin(a, col("k"), depth = 4, width = 4096),
      depth = 4, width = 4096).head().getLong(0)
    assert(ok == 50L)
  }

  // Zipf-ish stream: item i appears 2^(9-i) times for i in 0..9, plus
  // 200 singleton "noise" items — heavy head, long tail.
  private def mgStream: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"hot_$i")) ++
      (0 until 200).map(i => f"noise_$i%03d")

  test("heavyHitters: exact regime equals exact group counts, any partitioning") {
    val data = mgStream
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("item").repartition(parts)
      val got = sketch.heavyHitters(df, col("item"), capacity = 512, topN = 10)
        .as[(String, Long)].collect().toSeq
      assert(got == top, s"parts=$parts: $got")
    }
  }

  test("heavyHitters: overflow regime — underestimates, N/(k+1) bound, " +
      "hot head retained across partitionings") {
    val data = mgStream
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 16
    for (parts <- Seq(1, 7)) {
      val got = sketch.heavyHitters(data.toDF("item").repartition(parts),
          col("item"), capacity = cap, topN = cap)
        .as[(String, Long)].collect().toMap
      got.foreach { case (k, est) =>
        assert(est <= exact(k), s"MG overcounted $k: $est > ${exact(k)}")
        assert(exact(k) - est <= n / (cap + 1),
          s"undercount bound broken for $k: ${exact(k) - est} > ${n / (cap + 1)}")
      }
      // any item with true count > N/(cap+1) must be present
      exact.filter(_._2 > n / (cap + 1)).keys.foreach(k =>
        assert(got.contains(k), s"parts=$parts: frequent item $k evicted"))
    }
  }

  test("heavyHittersWeighted: exact regime equals exact sums; w<=0/null no-op") {
    val df = (Seq(("a", Option(100L)), ("b", Option(50L)), ("a", Option(1L)),
      ("c", Option(0L)), ("b", Option(-7L)), ("d", Option.empty[Long])))
      .toDF("item", "w")
    val got = sketch.heavyHittersWeighted(df, col("item"), col("w"),
        capacity = 8, topN = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 101L), ("b", 50L)), got.toString)
  }

  test("heavyHittersWeighted: overflow regime — W/(k+1) bound, heavy item kept") {
    // one heavy item (weight 1000 spread over 100 rows) + 40 singleton
    // items of weight 10 each; capacity 4 → W = 1400, bound = 280
    val rows = Seq.fill(100)(("heavy", 10L)) ++
      (0 until 40).map(i => (f"n$i%02d", 10L))
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = rows.map(_._2).sum
    for (parts <- Seq(1, 5)) {
      val got = sketch.heavyHittersWeighted(
          rows.toDF("item", "w").repartition(parts), col("item"), col("w"),
          capacity = 4, topN = 4)
        .as[(String, Long)].collect().toMap
      got.foreach { case (k, est) =>
        assert(est <= exact(k) && exact(k) - est <= w / 5,
          s"parts=$parts item=$k est=$est exact=${exact(k)}")
      }
      assert(got.contains("heavy"), s"parts=$parts: heavy item evicted")
    }
  }

  test("bottom-k sample merge law: merge(sample(A), sample(B)) == sample(A++B)") {
    val a = (0 until 300).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    val b = (300 until 700).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("_h", "v").as[(Long, Double)].collect().toSet
    val merged = sketch.sampleMerge(
      sketch.bottomKSample(a, col("v"), col("id"), 64),
      sketch.bottomKSample(b, col("v"), col("id"), 64), 64)
    val direct = sketch.bottomKSample(a.unionByName(b), col("v"), col("id"), 64)
    assert(key(merged) == key(direct))
    // quantiles off either path agree — the sample IS the state
    assert(key(merged).size == 64)
  }

  test("heavyHittersBy: per-group summaries independent; nulls skipped") {
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(9)(("b", "z")) ++ Seq(("b", null.asInstanceOf[String]))
    val got = sketch.heavyHittersBy(rows.toDF("g", "item"), Seq("g"),
        col("item"), capacity = 8, topN = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "x", 30L), ("a", "y", 20L), ("b", "z", 9L)))
  }

  test("moments: exact power sums; symmetric data has skew 0") {
    val df = Seq(1.0, 2.0, 3.0).map(("g", _)).toDF("g", "v")
    val r = sketch.moments(df, "v", Seq("g")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((3L, 6L, 14L, 36L)))
    assert(r.getDouble(5) == 0.0, "1,2,3 is symmetric")
  }

  test("moments: merge law — sums of halves equal sums of the whole") {
    val all = (1 to 40).map(i => ("g", (i * i % 17).toDouble))
    val whole = sketch.moments(all.toDF("g", "v"), "v", Seq("g")).head()
    val (h1, h2) = all.splitAt(17)
    val p1 = sketch.moments(h1.toDF("g", "v"), "v", Seq("g")).head()
    val p2 = sketch.moments(h2.toDF("g", "v"), "v", Seq("g")).head()
    (1 to 4).foreach { i =>
      assert(p1.getLong(i) + p2.getLong(i) == whole.getLong(i),
        s"moment column $i merges by addition")
    }
  }

  test("moments: right-skewed data scores positive, left-skewed negative") {
    val right = Seq(1.0, 1.0, 1.0, 1.0, 10.0).map(("g", _)).toDF("g", "v")
    val left = Seq(10.0, 10.0, 10.0, 10.0, 1.0).map(("g", _)).toDF("g", "v")
    assert(sketch.moments(right, "v", Seq("g")).head().getDouble(5) > 1.0)
    assert(sketch.moments(left, "v", Seq("g")).head().getDouble(5) < -1.0)
  }
}
