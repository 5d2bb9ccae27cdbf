package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.hashing

/** Deterministic cardinality sketches.
  *
  * The reference engine has no sketches (SURVEY.md §2.8); this is a
  * north-star extension for the 100 TB regime, where an exact
  * `count_distinct` shuffles every distinct value. Unlike HLL (whose
  * register layout is engine-specific), KMV is chosen because its output
  * is a pure deterministic function of the input set and a public hash —
  * so an independent engine reproduces the estimate BIT-FOR-BIT, and the
  * driver's DuckDB oracle can hash-match it like any exact query.
  */
object sketch {

  /** KMV (k-minimum-values) distinct-count estimate per group:
    * hash every value with the portable 63-bit [[hashing.h63]], keep the
    * `k` smallest DISTINCT hashes per group, and estimate
    * `(k-1) · 2⁶³ / (h_k + 1)` from the kth smallest hash (the +1 dodges
    * the measure-zero h=0 case); groups with fewer than `k` distinct
    * values report the EXACT count (the sketch degrades to exact on small
    * groups). Standard error ≈ 1/√(k-2).
    *
    * 63 bits, not 32: the kth order statistic of n uniform hashes sits
    * near k·2ᵇ/n, so hash COLLISIONS distort the estimate once n
    * approaches 2ᵇ/√k-ish territory — at b=32 a billion-distinct group
    * (exactly the 100 TB regime this sketch exists for) is ~25% of the
    * hash space and reads structurally low. At b=63 the space is 9.2·10¹⁸:
    * collisions stay negligible past 10¹² distinct values. The hash stays
    * exact in a signed Long and portable ([[hashing.sqlH63]]), so the
    * estimate is still reproducible bit-for-bit by an independent engine.
    *
    * Plan shape at scale: one distinct on (group, 63-bit hash) — map-side
    * combine collapses duplicates before the exchange, and the shuffle
    * carries hashes, never the values — then the rank-filter idiom, which
    * Spark plans as a WindowGroupLimit: each map task keeps a bounded
    * k-heap per group, so the second exchange moves ≤ k rows per group
    * per partition. Returns `(groupCols*, n_min, distinct_est)`. */
  def kmvDistinct(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[Column],
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvDistinct needs k >= 2, got $k")
    val hashed = df
      .select((groupCols :+ hashing.h63(valueCol.cast("string")).as("_h")): _*)
      .distinct()
    val ranked = rel.topKPerGroup(hashed, groupCols, Seq(col("_h").asc), k,
      rankCol = "_rk")
    val scale = (k - 1).toDouble * 9223372036854775808.0 // (k-1)·2⁶³
    ranked.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_min"), max(col("_h")).as("_kth"))
      .withColumn("distinct_est",
        when(col("n_min") < k, col("n_min").cast("double"))
          .otherwise(lit(scale) / (col("_kth").cast("double") + 1.0)))
      .drop("_kth")
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) of a value column:
    * `depth` hash rows × `width` buckets of exact counts — a frequency
    * summary whose SIZE is `depth·width` regardless of data volume, and
    * whose content is a pure deterministic function of the input multiset
    * (portable md5-derived base hash + the affine family), so an
    * independent engine reproduces every cell bit-for-bit.
    *
    * Plan shape: one explode to `depth` thin (row, bucket) cells per
    * input value — no strings survive the shuffle — then one groupBy
    * with map-side combine; the result is tiny and MERGEABLE (sketches
    * of two corpora add cell-wise: union frequency summaries without
    * re-reading either corpus — the reason to carry a sketch at 100 TB
    * instead of a vocabulary table; use [[cmMerge]], which preserves
    * the dimension stamp). Returns `(row, bucket, cnt, cm_depth,
    * cm_width)` — the build dimensions ride the sketch as constant
    * columns so consumers ([[cmJoinSize]], [[cmEstimate]]) can ENFORCE
    * dimensional compatibility instead of trusting the caller: a
    * sketch built narrower than declared has every cell inside the
    * declared bounds, so positional range checks alone cannot catch
    * the mismatch. */
  def countMin(
      df: DataFrame,
      valueCol: Column,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"countMin needs depth, width >= 1, got $depth, $width")
    // h32(null) is null → a null value would emit depth (row, NULL)
    // cells, polluting the depth×width cell set anyone merging or
    // hashing the sketch relies on; a null is no observation at all.
    // The h32 base (NOT h63: the affine family's no-overflow bound is
    // (2·depth+1)·h < 2⁶³, which holds for 32-bit bases only) is
    // materialized in its own projection BEFORE the explode — generator
    // expressions get no common-subexpression elimination, so inlining
    // it would run the md5 digest `depth` times per row ([[bloom]]
    // hashes before its explode for the same reason)
    df.where(valueCol.isNotNull)
      .select(hashing.h32(valueCol.cast("string")).as("_h"))
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"),
          pmod(hashing.affine(col("_h"), i), lit(width.toLong)).as("bucket"))): _*))
        .as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("row"), col("bucket"), col("cnt"),
        lit(depth).as("cm_depth"), lit(width).as("cm_width"))
  }

  /** Cell-wise sum of two [[countMin]] sketches — the mergeability that
    * makes a sketch worth carrying at 100 TB (combine per-corpus
    * frequency summaries without re-reading either corpus). Dimension
    * stamps participate in the grouping key, so mismatched builds never
    * silently combine: their cells stay distinct and the next
    * [[cmEstimate]]/[[cmJoinSize]] guard raises on the foreign stamp. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"), col("cm_depth"), col("cm_width"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("row"), col("bucket"), col("cnt"),
        col("cm_depth"), col("cm_width"))

  /** In-plan dimension guard for a [[countMin]]-derived frame: raises
    * (codegen'd, no extra pass) on the first cell whose stamp differs
    * from the declared `depth`×`width`. Frames WITHOUT the stamp
    * columns (external sketches) fall back to the positional
    * best-effort bound — that check can prove a sketch too WIDE but
    * never too narrow. */
  private def dimGuard(df: DataFrame, what: String, depth: Int,
      width: Int): DataFrame =
    if (df.columns.contains("cm_width") && df.columns.contains("cm_depth")) {
      df.select(
        when(col("cm_depth") =!= depth || col("cm_width") =!= width,
          raise_error(concat(
            lit(s"graft: $what sketch built at depth="), col("cm_depth"),
            lit(" x width="), col("cm_width"),
            lit(s" but declared depth=$depth x width=$width"))))
          .otherwise(col("row")).as("row"),
        col("bucket"), col("cnt"))
    } else {
      df.select(
        when(col("bucket") >= width || col("row") >= depth,
          raise_error(concat(
            lit(s"graft: $what sketch cell (row="), col("row"),
            lit(", bucket="), col("bucket"),
            lit(s") outside depth=$depth x width=$width — built with " +
              "different dimensions"))))
          .otherwise(col("row")).as("row"),
        col("bucket"), col("cnt"))
    }

  /** Join-cardinality estimate from two [[countMin]] sketches over the
    * two sides' join keys (AMS/Count-Min inner product, Alon-Matias-
    * Szegedy '96 §5 / Cormode-Muthukrishnan '05 §4.2): for each hash
    * row, Σ_bucket cntA·cntB overestimates `|A ⋈ B|` by the collision
    * mass; the MIN over rows is the estimate. This is the planner
    * meter to run BEFORE a 100 TB fact-to-fact join — two sketch
    * passes (each a thin `depth×width`-cell aggregate) answer "is this
    * join 10⁹ or 10¹⁴ rows" without executing it, the difference
    * between choosing a strategy and discovering a mistake.
    *
    * The estimate never undercounts. Accuracy: overestimate ≤
    * `||A||₁·||B||₁ / width` per row w.h.p. — size `width` to the key
    * cardinality, not the row count. Cost: the sketch join touches
    * `depth·width` cells, driver-independent of either table.
    *
    * CONTRACT: both sketches must come from [[countMin]] builds with the
    * SAME `width` and `depth` — the inner product pairs cells
    * positionally, so mismatched widths silently join unrelated buckets
    * and return a meaningless number. ENFORCED, not trusted: sketches
    * carrying [[countMin]]'s `cm_depth`/`cm_width` stamp are checked
    * in-plan (a codegen'd `raise_error` per cell, no extra pass) —
    * against the declared `width` when one is passed, and against EACH
    * OTHER on every paired cell when `width = 0`. Stamp-less external
    * frames get the positional best-effort bound only, which can prove
    * a sketch too wide but never too narrow (a width-64 build declared
    * 4096 places every cell in range) — stamp such sketches at build
    * time to get the real guarantee. */
  def cmJoinSize(a: DataFrame, b: DataFrame, depth: Int = 4,
      width: Int = 0): DataFrame = {
    require(depth >= 1, s"cmJoinSize needs depth >= 1, got $depth")
    def stamped(df: DataFrame): Boolean =
      df.columns.contains("cm_width") && df.columns.contains("cm_depth")
    def side(df: DataFrame, name: String, cntAs: String): DataFrame = {
      val g = if (width > 0) dimGuard(df, s"cmJoinSize $name", depth, width)
        else df
      val cols = Seq(col("row"), col("bucket"), col("cnt").as(cntAs)) ++
        (if (width <= 0 && stamped(g))
           Seq(col("cm_depth").as(s"_d_$name"), col("cm_width").as(s"_w_$name"))
         else Nil)
      g.select(cols: _*)
    }
    val la = side(a, "left", "_ca")
    val lb = side(b, "right", "_cb")
    val crossChecked = la.join(lb, Seq("row", "bucket"))
    val prod =
      if (crossChecked.columns.contains("_d_left") &&
          crossChecked.columns.contains("_d_right"))
        // cross-side stamp equality, raised on the first PAIRED cell
        // whose builds disagree (mismatched builds of non-trivial data
        // always pair in the shared bucket range)
        when(col("_d_left") =!= col("_d_right") ||
            col("_w_left") =!= col("_w_right"),
          raise_error(concat(
            lit("graft: cmJoinSize sides built at different dimensions — left "),
            col("_d_left"), lit("x"), col("_w_left"), lit(", right "),
            col("_d_right"), lit("x"), col("_w_right"))))
          .otherwise(col("_ca") * col("_cb"))
      else col("_ca") * col("_cb")
    val joined = crossChecked
      .groupBy(col("row")).agg(sum(prod).as("_ip"))
    // spine join: a hash row with NO shared cells has inner product 0 —
    // dropping it would make min() ignore the best (sparsest) row
    a.sparkSession.range(depth).toDF("row")
      .join(joined, Seq("row"), "left")
      .agg(min(coalesce(col("_ip"), lit(0L))).as("join_size_est"))
  }

  /** Point-frequency estimates from a [[countMin]] sketch for a small
    * literal set of `values`: the classic `min` over each value's
    * `depth` cells — an overestimate by at most the collision mass,
    * never an underestimate. The probe values' cells are computed
    * DRIVER-side (same hash arithmetic) and looked up with one tiny
    * filtered aggregate over the `depth·width`-row sketch. */
  def cmEstimate(
      sketch: DataFrame,
      values: Seq[String],
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(values.nonEmpty, "cmEstimate needs at least one probe value")
    val probes = values.flatMap { v =>
      val base = hashing.h32Of(v)
      (0 until depth).map(i =>
        (v, i, math.floorMod(hashing.affineOf(base, i), width.toLong)))
    }
    val pdf = sketch.sparkSession
      .createDataFrame(probes).toDF("value", "row", "bucket")
    // the probe arithmetic bakes in depth×width — a sketch built at
    // other dimensions would answer nonsense, so the stamp is enforced
    pdf.join(dimGuard(sketch, "cmEstimate", depth, width),
        Seq("row", "bucket"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Fixed-width histogram of a numeric column over `[lo, hi)`: `nbins`
    * equal bins, out-of-range values CLAMPED into the edge bins (a
    * histogram that silently drops outliers lies about the distribution).
    * Emits every bin — including empty ones — as
    * `(bin, bin_lo, bin_hi, n)`: the bin spine is `spark.range(nbins)`
    * (nbins driver-known rows) broadcast-joined onto the counts, so the
    * table side stays one scan + one groups×1 shuffle of bin cells.
    * Binning arithmetic is `floor((v - lo) / width)` in doubles — the
    * identical IEEE expression any other engine evaluates, so edge
    * placement reproduces exactly. */
  def histogram(
      df: DataFrame,
      valueCol: Column,
      lo: Double,
      hi: Double,
      nbins: Int): DataFrame = {
    require(nbins >= 1, s"histogram needs nbins >= 1, got $nbins")
    require(lo < hi, s"histogram needs lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nbins
    val bin = greatest(lit(0L), least(lit(nbins - 1L),
      floor((valueCol - lo) / width).cast("long")))
    // nulls excluded explicitly (a null bin would vanish in the spine
    // join silently; clamping is for out-of-RANGE, not missing)
    val counts = df.where(valueCol.isNotNull)
      .select(bin.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("n"))
    df.sparkSession.range(nbins).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1L) * width).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-GROUP fixed-width histogram — [[histogram]] with group columns:
    * every observed group emits the full `nbins` spine (empty bins
    * included), so per-group sketches have a fixed shape and merge
    * cell-wise ([[histogramMerge]] works unchanged with the group
    * columns in its key — they ride the same groupBy). One scan → one
    * (group, bin) aggregate with map-side combine; the spine joins onto
    * the bounded groups×nbins grid, never onto data. Returns
    * `(groupCols*, bin, bin_lo, bin_hi, n)`. */
  def histogramBy(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      lo: Double,
      hi: Double,
      nbins: Int): DataFrame = {
    require(nbins >= 1, s"histogramBy needs nbins >= 1, got $nbins")
    require(lo < hi, s"histogramBy needs lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nbins
    val bin = greatest(lit(0L), least(lit(nbins - 1L),
      floor((valueCol - lo) / width).cast("long")))
    val counts = df.where(valueCol.isNotNull)
      .select(groupCols.map(col) :+ bin.as("bin"): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"))
    df.where(valueCol.isNotNull)
      .select(groupCols.map(col): _*).distinct()
      .crossJoin(broadcast(df.sparkSession.range(nbins).toDF("bin")))
      .join(counts, groupCols :+ "bin", "left")
      .select(groupCols.map(col) ++ Seq(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1L) * width).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n")): _*)
  }

  /** Per-group quantiles from a [[histogramBy]] sketch — the
    * [[histogramQuantile]] rank-interpolation partitioned by the group
    * columns. All window work runs over groups×nbins sketch rows, never
    * data. Returns `(groupCols*, q, v_est)`. */
  def histogramQuantileBy(
      hist: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"histogramQuantileBy needs quantiles in [0, 1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val wCum = Window.partitionBy(gc: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(gc: _*)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wTot))
    val qdf = hist.sparkSession.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    val r = col("q") * col("total").cast("double")
    cum.join(broadcast(qdf), col("cum").cast("double") >= r && col("n") > 0)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(gc :+ col("q"): _*).orderBy(col("bin"))))
      .where(col("_rk") === 1)
      .select(gc ++ Seq(col("q"),
        (floor((col("bin_lo") +
          (r - (col("cum") - col("n")).cast("double")) / col("n").cast("double")
            * (col("bin_hi") - col("bin_lo")))
          * 10000.0 + 0.5) / 10000.0).as("v_est")): _*)
  }

  /** Cell-wise union of two [[histogram]]s over the SAME `[lo, hi)` /
    * `nbins` grid: counts add. `histogramMerge(hist(A), hist(B)) ≡
    * hist(A ++ B)` exactly — the distribution summary rolls up across
    * days / sources / corpora without re-reading any of them (the same
    * mergeable-state contract as [[hllMerge]] and [[kmvMerge]], and the
    * substrate [[histogramQuantile]] turns into mergeable QUANTILES). */
  def histogramMerge(a: DataFrame, b: DataFrame): DataFrame = {
    // key on every non-count column, so [[histogramBy]] sketches merge
    // with their group columns riding the same groupBy
    val keys = a.columns.filter(_ != "n").toSeq
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Quantile estimates from a [[histogram]]: for each requested `q`,
    * the first bin whose cumulative count reaches rank `q·N` (empty bins
    * skipped), linearly interpolated within the bin —
    * `bin_lo + (q·N − below) / n_bin · (bin_hi − bin_lo)`. Because the
    * histogram is mergeable, this is the 100 TB quantile path: sketch
    * each shard / day once, merge counts, derive any quantile later —
    * no full-data sort, no per-query rescan; error is bounded by bin
    * width. Every rank comparison is long-vs-exact-double and the
    * interpolation is the same IEEE expression on any engine; estimates
    * floor-quantized to 4 dp. All window work runs over `nbins`
    * driver-bounded rows, never over data. Returns `(q, v_est)`. */
  def histogramQuantile(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"histogramQuantile needs quantiles in [0, 1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        windows.boundedGlobal("nbins", col("bin")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(hist.agg(sum(col("n")).as("total"))))
    val qdf = hist.sparkSession.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    val r = col("q") * col("total").cast("double")
    cum.join(broadcast(qdf), col("cum").cast("double") >= r && col("n") > 0)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("bin"))))
      .where(col("_rk") === 1)
      .select(col("q"),
        (floor((col("bin_lo") +
          (r - (col("cum") - col("n")).cast("double")) / col("n").cast("double")
            * (col("bin_hi") - col("bin_lo")))
          * 10000.0 + 0.5) / 10000.0).as("v_est"))
  }

  /** The `k` smallest distinct [[hashing.h63]] hashes of a value column
    * per group — the KMV sketch STATE ([[kmvDistinct]] collapses straight
    * to the estimate; this form is what you PERSIST at 100 TB: sketch each
    * corpus / day / source once, then union and intersect sketches forever
    * without re-reading anything). Mergeable ([[kmvMerge]]) and — unlike
    * HLL registers — INTERSECTABLE ([[kmvOverlap]]): the k smallest
    * hashes of a set are a uniform coordinated sample of its distinct
    * values, so two sketches share exactly the hashes their sets share
    * (Beyer et al. 2007, distinct-value synopses under multiset ops).
    *
    * Plan shape: identical to [[kmvDistinct]] — one (group, hash)
    * distinct with map-side combine, then the WindowGroupLimit rank
    * filter (bounded k-heap per map task). Returns `(groupCols*, h)`. */
  def kmv(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val hashed = df.where(valueCol.isNotNull)
      .select(groupCols.map(col) :+ hashing.h63(valueCol.cast("string")).as("h"): _*)
      .distinct()
    rel.topKPerGroup(hashed, groupCols.map(col), Seq(col("h").asc), k, "_rk")
      .drop("_rk")
  }

  /** Union of two [[kmv]] sketches (same `k`, same group columns): the
    * k smallest of the combined hash sets. Satisfies the merge law
    * `kmvMerge(kmv(A), kmv(B)) ≡ kmv(A ∪ B)` exactly — the k smallest
    * of a union are a subset of the union of each side's k smallest. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int = 256): DataFrame =
    rel.topKPerGroup(a.unionByName(b).distinct(), groupCols.map(col),
      Seq(col("h").asc), k, "_rk").drop("_rk")

  /** Distinct-set OVERLAP from two [[kmv]] sketches: per group, the
    * union-size estimate, the Jaccard similarity of the two distinct-value
    * sets, and the intersection-size estimate `J · |A∪B|` — "how many
    * users did BOTH X and Y" answered from two constant-size sketches
    * with neither corpus re-read (THE set operation HLL registers cannot
    * do). Method: take the k smallest hashes of the combined sketches
    * (a KMV sketch of A∪B, by the merge law); the fraction of those also
    * present in both input sketches is an unbiased Jaccard estimate
    * because the k union minima are a coordinated uniform sample of
    * A∪B's distinct values. Standard error ≈ J·(1-J)/√k on top of the
    * union estimate's 1/√(k-2).
    *
    * Degrades to EXACT when both sets hold < k distinct values (the
    * sketches then ARE the sets): `n_min < k` ⇒ union/intersection
    * counts are exact and `jaccard` is the exact ratio.
    *
    * Estimates are floor-quantized to 4 dp ([[graft.functions.vectors]]
    * discipline) so an independent engine reproduces them bit-for-bit.
    * Returns `(groupCols*, n_min, k_cap, union_est, jaccard,
    * intersect_est)` where `k_cap` is the shared-hash count among the
    * union minima. */
  def kmvOverlap(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvOverlap needs k >= 2, got $k")
    val gc = groupCols.map(col)
    val tagged = a.select(gc :+ col("h") :+ lit(1).as("in_a") :+ lit(0).as("in_b"): _*)
      .unionByName(
        b.select(gc :+ col("h") :+ lit(0).as("in_a") :+ lit(1).as("in_b"): _*))
      .groupBy(gc :+ col("h"): _*)
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val ranked = rel.topKPerGroup(tagged, gc, Seq(col("h").asc), k, "_rk")
    val scale = (k - 1).toDouble * 9223372036854775808.0 // (k-1)·2⁶³
    val q4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    val unionEst = when(col("n_min") < k, col("n_min").cast("double"))
      .otherwise(lit(scale) / (col("_kth").cast("double") + 1.0))
    val jac = col("k_cap").cast("double") / col("n_min").cast("double")
    ranked.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_min"), max(col("h")).as("_kth"),
        sum(col("in_a") * col("in_b")).cast("long").as("k_cap"))
      .select(gc ++ Seq(col("n_min"), col("k_cap"),
        q4(unionEst).as("union_est"),
        q4(jac).as("jaccard"),
        q4(when(col("n_min") < k, col("k_cap").cast("double"))
          .otherwise(jac * unionEst)).as("intersect_est")): _*)
  }

  /** Bits per Bloom word: 63, not 64 — the highest bit index is 62, so
    * the mask `1 << bit` stays strictly positive in a signed int64.
    * Engines disagree at the 64th bit (DuckDB raises on
    * `1::BIGINT << 63`; Java wraps to Long.MinValue), and a sketch
    * whose bytes must reproduce bit-for-bit on any engine cannot sit on
    * that edge. 63-bit words cost ~1.6% extra words and remove the
    * entire signed-overflow class. */
  val BloomWordBits = 63

  /** Number of 63-bit words a [[bloom]] of `mBits` bits occupies. */
  def bloomWordCount(mBits: Int): Int =
    (mBits + BloomWordBits - 1) / BloomWordBits

  /** Bloom filter of a value column as a (word, bits) table:
    * `k` [[hashing.affine]] positions per distinct value over `mBits`
    * bits, packed into [[BloomWordBits]]-bit words — the CONSTANT-SIZE
    * set-membership state for the 100 TB regime. The classic use is
    * decontamination at fleet scale: a benchmark's n-gram set can be
    * millions of strings (too big to broadcast as text), but its bloom
    * is `mBits/63` longs — ship the sketch, screen any corpus against
    * it with zero false NEGATIVES ([[graft.ops.decontam.bloomScreenHits]]).
    *
    * Like every sketch here the content is a pure deterministic
    * function of the input SET and a public hash family — false
    * positives included — so an independent engine reproduces every
    * word bit-for-bit and the driver's oracle hash-matches it.
    *
    * Positions are Kirsch-Mitzenmacher double hashing
    * (`pos_j = (h1 + j·h2) mod m` over the digest's two independent
    * 32-bit words), NOT the [[hashing.affine]] family [[countMin]]
    * uses: an affine family reduced mod the SAME m is structurally
    * broken for Blooms — two base hashes congruent mod m satisfy
    * `(2j+1)·Δ ≡ 0 (mod m)` for EVERY member j, so such a pair
    * collides on all k positions at once and the effective
    * false-positive rate degrades from fillᵏ to ~n/m, k buying
    * nothing. (Observed, not hypothetical: on the sf0.01 corpus two
    * grams with Δ = 575·m collided on all three members.) Double
    * hashing needs BOTH words congruent (~1/m² for a full-k
    * collision), restoring the textbook rate; Count-Min keeps the
    * affine family because a full-depth collision there only
    * overestimates one pair's count — the min-estimate semantics
    * tolerate it.
    *
    * Plan shape: one distinct on the two 32-bit hash words (cells
    * derive from the words alone, so the shuffle carries 16-byte rows,
    * never values) → explode to `k` thin (word, mask) cells → one
    * `bit_or` aggregate with map-side combine; emitted on the FULL
    * word spine (absent word = 0) so the artifact has a fixed shape
    * and merges / indexes positionally. MERGEABLE: [[bloomMerge]] is
    * word-wise OR — `merge(bloom(A), bloom(B)) ≡ bloom(A ∪ B)`
    * exactly. */
  def bloom(
      df: DataFrame,
      valueCol: Column,
      mBits: Int = 4032,
      k: Int = 3): DataFrame = {
    require(mBits >= BloomWordBits,
      s"bloom needs mBits >= $BloomWordBits, got $mBits")
    require(k >= 1 && k <= 16, s"bloom needs 1 <= k <= 16, got $k")
    val cells = df.where(valueCol.isNotNull)
      .select(hashing.h32(valueCol.cast("string")).as("_h1"),
        hashing.h32b(valueCol.cast("string")).as("_h2"))
      .distinct()
      .select(explode(array((0 until k).map(j =>
        pmod(col("_h1") + lit(j.toLong) * col("_h2"), lit(mBits.toLong))): _*)).as("_pos"))
      .select(floor(col("_pos") / lit(63.0)).cast("long").as("word"),
        call_function("shiftleft", lit(1L),
          (col("_pos") % 63L).cast("int")).as("_mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(_mask)").as("bits"))
    // broadcast the cells onto the spine: both sides are ≤ mBits/63 rows,
    // and the hint spares the tiny left-join a sort-merge shuffle pair
    // (one fewer stage every time a bloom is built)
    df.sparkSession.range(bloomWordCount(mBits)).toDF("word")
      .join(broadcast(cells), Seq("word"), "left")
      .select(col("word"), coalesce(col("bits"), lit(0L)).as("bits"))
  }

  /** Word-wise union of two [[bloom]]s (same `mBits`/`k`):
    * `bloomMerge(bloom(A), bloom(B)) ≡ bloom(A ∪ B)` exactly (OR is
    * associative, commutative, idempotent) — per-day / per-source
    * membership state rolls up without re-reading any corpus. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))

  /** In-row membership test against a DRIVER-held [[bloom]] word array
    * (`words(i)` = word `i` of the spine — `mBits/63` longs, bounded by
    * construction like the PQ codebooks and Count-Min probe cells):
    * true iff ALL `k` positions of `c` are set. False positives at the
    * standard `(1-e^{-kn/m})^k` rate — and because the hash family is
    * public and deterministic, the SAME false positives on every
    * engine; false negatives never. The predicate is pure scan work —
    * the probed corpus is never shuffled, the sketch rides the plan as
    * a literal array. */
  def bloomMightContain(
      words: Seq[Long],
      c: Column,
      mBits: Int = 4032,
      k: Int = 3): Column = {
    require(words.length == bloomWordCount(mBits),
      s"bloomMightContain needs ${bloomWordCount(mBits)} words for mBits=$mBits, " +
        s"got ${words.length}")
    require(k >= 1 && k <= 16, s"bloomMightContain needs 1 <= k <= 16, got $k")
    // ONE Literal node (unsafe array data), not CreateArray with
    // words.length children — a 16k-word bloom would otherwise blow the
    // codegen method budget and fall back to interpreted evaluation
    val wcol = lit(words.toArray)
    val h1 = hashing.h32(c.cast("string"))
    val h2 = hashing.h32b(c.cast("string"))
    (0 until k).map { j =>
      val pos = pmod(h1 + lit(j.toLong) * h2, lit(mBits.toLong))
      val word = element_at(wcol, floor(pos / lit(63.0)).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (pos % 63L).cast("int"))
      word.bitwiseAND(mask) === mask
    }.reduce(_ && _)
  }

  /** Register values are capped at this rho so the harmonic sum stays an
    * EXACT int64: `Σ_j 2^(40-rho_j) ≤ m·2⁴⁰` fits for any `p ≤ 16`. A
    * register only exceeds 40 with probability 2⁻⁴⁰ per distinct value —
    * beyond 10¹¹ distinct values per register (≫ any group at 100 TB),
    * and even then the cap costs < 0.1% of one register's weight. */
  val HllRhoCap = 40

  /** `alpha_m · m² · 2⁴⁰` — the exact double the estimate divides by the
    * integer harmonic sum. Public so the oracle SQL embeds the SAME
    * literal (a double's shortest decimal repr round-trips identically
    * through Spark's and DuckDB's parsers). */
  def hllEstimateNumerator(p: Int): Double = {
    val m = 1L << p
    hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, HllRhoCap)
  }

  private def hllAlpha(m: Long): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** HyperLogLog register sketch (Flajolet et al. 2007) per group:
    * `m = 2^p` max-rank registers over the portable 63-bit hash — the
    * CONSTANT-SIZE, MERGEABLE distinct-count state for the 100 TB regime.
    * [[kmvDistinct]] keeps k order statistics (exact small counts, simple
    * union); HLL keeps `m` one-byte ranks — the sketch you SHIP (per-day /
    * per-source cardinality rollups merged register-wise without
    * re-reading any corpus).
    *
    * Unlike engine-native HLLs (whose register layout is private — the
    * reason [[kmvDistinct]]'s doc rules them out), every bit here is a
    * pure deterministic function of the input set and a public hash:
    * register `j = h >> (63-p)` (top `p` bits), and
    * `rho = leading-zeros-of-the-remaining-(63-p)-bits + 1` computed via
    * the engine-portable bit-length identity `len(bin(w))` — so an
    * independent engine reproduces every register bit-for-bit and the
    * driver's DuckDB oracle hash-matches the sketch like an exact query.
    *
    * Plan shape at scale: one select (hash + two bit ops, all inside
    * whole-stage codegen) → one groupBy(group, register) max — map-side
    * combine collapses each partition to ≤ m rows per group BEFORE the
    * exchange, so the shuffle carries ≤ m·partitions tiny rows no matter
    * the corpus size; the value column never survives the projection.
    * Emits the FULL m-register spine per observed group (absent register
    * = rho 0) — zero registers carry the linear-counting signal, and a
    * fixed-shape artifact is what register-wise merge arithmetic needs.
    * Returns `(groupCols*, register, rho)`. */
  /** OBSERVED HLL registers only (no empty-register spine): the part of
    * [[hll]] that is one stateless projection + one `max` aggregation —
    * exactly the shape Structured Streaming supports in update mode, so
    * this same code maintains a LIVE cardinality sketch over a stream
    * (see [[graft.streaming.EventStream.hllStream]]) with bounded state
    * (≤ m rows per group, forever). Batch [[hll]] = this + the spine. */
  def hllRegisters(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"hllRegisters needs 4 <= p <= 16, got $p")
    val vbits = 63 - p
    val h = hashing.h63(valueCol.cast("string"))
    val w = h.bitwiseAND(lit((1L << vbits) - 1L))
    // w == 0 ⇒ all vbits value bits are zero ⇒ rho = vbits + 1 (the
    // conventional all-zeros rank); otherwise vbits - bitlen(w) leading
    // zeros. bin() is the minimal base-2 string in Spark AND DuckDB, so
    // bitlen = length(bin(w)) is exact & portable — no log2 rounding trap.
    val rho = when(w === 0L, lit(vbits + 1))
      .otherwise(lit(vbits + 1) - length(bin(w)))
    df.where(valueCol.isNotNull)
      .select(groupCols.map(col) ++ Seq(
        shiftright(h, vbits).as("register"),
        least(rho, lit(HllRhoCap)).cast("int").as("_rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("_rho")).as("rho"))
  }

  def hll(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"hll needs 4 <= p <= 16, got $p")
    val m = 1L << p
    val observed = hllRegisters(df, valueCol, groupCols, p)
    // full spine: observed groups × m registers (register side broadcast)
    val spine = df.sparkSession.range(m).toDF("register")
    df.where(valueCol.isNotNull).select(groupCols.map(col): _*).distinct()
      .crossJoin(broadcast(spine))
      .join(observed, groupCols :+ "register", "left")
      .select(groupCols.map(col) ++ Seq(col("register"),
        coalesce(col("rho"), lit(0)).as("rho")): _*)
  }

  /** Register-wise union of two [[hll]] sketches (same `p`, same group
    * columns): max per (group, register). THE point of carrying HLL state
    * at 100 TB — sketches of two corpora / days / sources union without
    * re-reading either; `merge(hll(A), hll(B)) ≡ hll(A ∪ B)` exactly
    * (max is associative, commutative, idempotent), which is also the
    * oracle law the driver checks. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Cardinality estimate from an [[hll]] register sketch:
    * `alpha_m · m² / Σ_j 2^(-rho_j)`, with the harmonic sum carried as
    * the EXACT integer `Σ 2^(40-rho_j)` (see [[HllRhoCap]]) so the
    * estimate is one deterministic IEEE division from an exact int64 —
    * bit-reproducible on any engine, no float-aggregation-order
    * dependence. Returns `(groupCols*, n_zero, harmonic_fixed, hll_est)`
    * with the estimate floor-quantized to 4 dp; `n_zero` (empty
    * registers) is surfaced so callers can apply linear counting
    * (`m·ln(m/n_zero)`) in the small-cardinality regime — ln is kept OUT
    * of the oracle-checked columns because libm rounding is not portable
    * across engines. Standard error ≈ 1.04/√m. */
  def hllEstimate(
      registers: DataFrame,
      groupCols: Seq[String],
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"hllEstimate needs 4 <= p <= 16, got $p")
    // alpha·m²·2⁴⁰ as ONE Scala double literal, embedded identically in
    // the SQL oracle — both engines then do a single exactly-rounded
    // division by the exact integer harmonic sum
    val num = hllEstimateNumerator(p)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(when(col("rho") === 0, 1)).as("n_zero"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - rho)"))
          .as("harmonic_fixed"))
      .withColumn("hll_est",
        floor(lit(num) / col("harmonic_fixed").cast("double") * 10000.0 + 0.5)
          / 10000.0)
  }

  /** Quantiles from a DETERMINISTIC uniform sample: keep the `k` rows
    * with the smallest portable id-hashes (a bottom-k sample — uniform
    * because the hash is, mergeable because bottom-k of a union is the
    * bottom-k of the parts' bottom-ks, deterministic because no RNG),
    * then read nearest-rank quantiles off the sorted sample values.
    * Unlike [[histogramQuantile]] this needs NO [lo, hi) domain knob,
    * and unlike engine `approx_percentile` sketches the result is
    * reproducible bit-for-bit by an independent engine — the oracle
    * checks the exact sample. Standard error ~ 1/√k per quantile.
    *
    * Plan shape: one TakeOrderedAndProject of k thin (hash, value) rows
    * — per-partition bounded heaps, no full shuffle — then quantile
    * arithmetic over the k-row result. Returns `(q, v)` with v exact
    * from the sampled row (nearest-rank, index `floor(q·(k−1))` of the
    * value-sorted sample — no interpolation, so no float arithmetic to
    * match across engines). */
  /** The deterministic bottom-k-hash sample itself, as `(_h, v)` rows —
    * the mergeable state under [[sampleQuantiles]]. Persist per
    * day/source and fold with [[sampleMerge]]; the law
    * `sampleMerge(bottomKSample(A), bottomKSample(B), k) ≡
    * bottomKSample(A ∪ B, k)` is exact (bottom-k of a union is the
    * bottom-k of the parts' bottom-ks) and pinned in SketchSpec. */
  def bottomKSample(
      df: DataFrame,
      valueCol: Column,
      idCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"graft: bottomKSample needs k >= 1, got $k")
    df.where(valueCol.isNotNull)
      .select(hashing.h63(idCol.cast("string")).as("_h"),
        valueCol.cast("double").as("v"))
      .orderBy(col("_h"))
      .limit(k)
  }

  /** Fold two [[bottomKSample]]s (ids must be globally unique across
    * inputs, as everywhere in this family). */
  def sampleMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"graft: sampleMerge needs k >= 1, got $k")
    a.unionByName(b).orderBy(col("_h")).limit(k)
  }

  def sampleQuantiles(
      df: DataFrame,
      valueCol: Column,
      idCol: Column,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    require(k >= 2, s"graft: sampleQuantiles needs k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"graft: quantiles must be in [0, 1], got $qs")
    val spark = df.sparkSession
    val sample = bottomKSample(df, valueCol, idCol, k)
    // Global windows run over the ALREADY-BOUNDED k-row sample (the same
    // domain-bounded-window argument as the histogram grid ranks). The
    // actual sample size is derived with a second bounded window — NOT a
    // driver-side count(), which would both recompute the uncached
    // sample and make this builder eagerly execute (as sampleQuantilesBy
    // already does with _sz).
    val ranked = sample
      .withColumn("_rk", row_number().over(
        windows.boundedGlobal("k-sample", col("_h")).orderBy(col("v"), col("_h"))))
      .withColumn("_sz",
        count(lit(1)).over(windows.boundedGlobal("k-sample", col("_h"))))
    val qdf = spark.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    // nearest-rank index over the ACTUAL sample size
    ranked.join(broadcast(qdf),
        col("_rk") === (floor(col("q") * (col("_sz") - 1L)) + 1L).cast("int"))
      .select(col("q"), col("v"))
      .orderBy(col("q"))
  }

  /** Per-group [[sampleQuantiles]]: an independent bottom-k-hash sample
    * per group (the rank filter plans as WindowGroupLimit — bounded
    * per-group heaps before the exchange), then nearest-rank quantiles
    * within each group's sample. Groups with fewer than k rows sample
    * everything, so their quantiles are exact. */
  def sampleQuantilesBy(
      df: DataFrame,
      valueCol: Column,
      idCol: Column,
      groupCols: Seq[String],
      k: Int,
      qs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "graft: sampleQuantilesBy needs group columns")
    require(k >= 2, s"graft: sampleQuantilesBy needs k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"graft: quantiles must be in [0, 1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val sample = df.where(valueCol.isNotNull)
      .select(gc :+ hashing.h63(idCol.cast("string")).as("_h") :+
        valueCol.cast("double").as("v"): _*)
      .withColumn("_sr", row_number().over(
        Window.partitionBy(gc: _*).orderBy(col("_h"))))
      .where(col("_sr") <= k)
    val sized = sample.withColumn("_sz",
      count(lit(1)).over(Window.partitionBy(gc: _*)))
    val ranked = sized.withColumn("_rk", row_number().over(
      Window.partitionBy(gc: _*).orderBy(col("v"), col("_h"))))
    val qdf = df.sparkSession.createDataFrame(qs.map(Tuple1.apply)).toDF("q")
    ranked.join(broadcast(qdf),
        col("_rk") === (floor(col("q") * (col("_sz") - 1L)) + 1L).cast("int"))
      .select(gc ++ Seq(col("q"), col("v")): _*)
      .orderBy(gc :+ col("q"): _*)
  }

  /** Heavy hitters (frequent items) via the native Misra–Gries aggregate
    * ([[graft.functions.MisraGriesAgg]]): top-`topN` items by estimated
    * count, `(item, est_count)` ordered count desc, item asc.
    *
    * This is the 100 TB twin of an exact
    * `groupBy(item).count().orderBy(...).limit(n)`: the exact form
    * shuffles the full item universe (web-scale token/URL/user universes
    * are billions of keys), while MG state is a constant
    * `capacity`-entry map per partial buffer — the exchange carries one
    * small map per map task, and the merge tree preserves the
    * `true − est ≤ N/(capacity+1)` undercount bound (Agarwal et al.,
    * PODS 2012). With `capacity` ≥ the distinct-item count nothing ever
    * evicts and the result is exact — the regime the DuckDB oracle
    * pins; SketchSpec asserts the error bound beyond it. */
  def heavyHitters(
      df: DataFrame,
      itemCol: Column,
      capacity: Int,
      topN: Int): DataFrame = {
    require(topN >= 1, s"graft: heavyHitters needs topN >= 1, got $topN")
    require(capacity >= topN,
      s"graft: capacity ($capacity) must be >= topN ($topN) — the summary " +
        "cannot surface more items than it retains")
    df.select(graft.functions.aggregates
        .heavyHittersAgg(itemCol, capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
      .orderBy(col("est_count").desc, col("item").asc)
      .limit(topN)
  }

  /** WEIGHTED heavy hitters: top-`topN` items by total long weight
    * (token counts, bytes, spend micros — quantize floats upstream).
    * Same constant-state/mergeability story as [[heavyHitters]] with the
    * bound on total weight W: `true − est ≤ W/(capacity+1)`; exact when
    * distinct items ≤ capacity. Null/non-positive weights are no
    * observation. */
  def heavyHittersWeighted(
      df: DataFrame,
      itemCol: Column,
      weightCol: Column,
      capacity: Int,
      topN: Int): DataFrame = {
    require(topN >= 1 && capacity >= topN,
      s"graft: need 1 <= topN <= capacity, got topN=$topN capacity=$capacity")
    df.select(graft.functions.aggregates
        .heavyHittersWeightedAgg(itemCol, weightCol, capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_weight"))
      .orderBy(col("est_weight").desc, col("item").asc)
      .limit(topN)
  }

  /** Per-group heavy hitters: one MG summary per group key, then each
    * group's top-`topN` items. Same state bound per group; the shuffle
    * carries one capacity-bounded map per (map task, group) — for
    * high-cardinality groups this is exactly the partial-aggregation
    * shape `groupBy(group, item)` cannot have. */
  def heavyHittersBy(
      df: DataFrame,
      groupCols: Seq[String],
      itemCol: Column,
      capacity: Int,
      topN: Int): DataFrame = {
    require(groupCols.nonEmpty, "graft: heavyHittersBy needs group columns")
    require(topN >= 1 && capacity >= topN,
      s"graft: need 1 <= topN <= capacity, got topN=$topN capacity=$capacity")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.aggregates
        .heavyHittersAgg(itemCol, capacity).as("hh"))
      // the summary is already count-desc/item-asc sorted; slicing it is
      // row-local — no second shuffle for the per-group top-N
      .withColumn("e", explode(slice(col("hh"), 1, topN)))
      .select(groupCols.map(col) ++ Seq(
        col("e.item").as("item"), col("e.est_count").as("est_count")): _*)
  }

  /** Moments sketch: per group the EXACT fixed-point power sums
    * `(n, s1, s2, s3)` of `floor(value·q)` — the 4-long mergeable
    * summary behind mean / variance / skewness at any rollup level
    * (moments of a union are element-wise sums, so partial aggregation,
    * re-grouping, and cross-day merges are all exact — the property
    * sketches buy and samples don't). Skewness is surfaced as the one
    * documented float expression over the exact sums
    * (`m3c / (m2c·√m2c)`, 4-dp floor-quantized; q cancels, so the knob
    * never biases the shape read) — the
    * is-this-metric-distribution-lopsided screen that mean/stddev
    * profiles miss.
    *
    * Headroom dial: `s3 ≤ n·(q·max|v|)³` must fit int64 — at q = 1 and
    * values ≤ 10³ that is ~10⁹ rows per group; drop q (coarser
    * quantization) for bigger groups, the same trade every fixed-point
    * op here documents. One hash aggregate, no window, no second pass.
    * Returns `(groupCols..., n, s1, s2, s3, skew_q4)` — skew null when
    * the variance is 0. */
  def moments(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      q: Double = 1.0): DataFrame = {
    require(q > 0.0, s"graft: moments needs q > 0, got $q")
    val base = df.where(col(valueCol).isNotNull)
      .withColumn("_v", floor(col(valueCol) * q).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("s1"),
        sum(col("_v") * col("_v")).as("s2"),
        sum(col("_v") * col("_v") * col("_v")).as("s3"))
    // One float expression over exact sums, identical on every engine:
    // mean = s1/n, m2c = s2/n - mean^2,
    // m3c = s3/n - 3 mean (s2/n) + 2 mean^3, skew = m3c/(m2c*sqrt(m2c)).
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val m2c = col("s2").cast("double") / nd - mean * mean
    val m3c = col("s3").cast("double") / nd -
      lit(3.0) * mean * (col("s2").cast("double") / nd) +
      lit(2.0) * mean * mean * mean
    base.withColumn("skew_q4",
      when(col("n") > 0L && m2c > 0.0,
        graft.functions.vectors.quantize(m3c / (m2c * sqrt(m2c)), 4)))
  }
}
