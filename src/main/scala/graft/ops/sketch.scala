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
    * instead of a vocabulary table). Returns `(row, bucket, cnt)`. */
  def countMin(
      df: DataFrame,
      valueCol: Column,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"countMin needs depth, width >= 1, got $depth, $width")
    // h32 base, NOT h63: the affine family's no-overflow bound is
    // (2·depth+1)·h < 2⁶³, which holds for 32-bit bases only
    val base = hashing.h32(valueCol.cast("string"))
    // h32(null) is null → a null value would emit depth (row, NULL)
    // cells, polluting the depth×width cell set anyone merging or
    // hashing the sketch relies on; a null is no observation at all
    df.where(valueCol.isNotNull)
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"),
          pmod(hashing.affine(base, i), lit(width.toLong)).as("bucket"))): _*))
        .as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
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
    pdf.join(sketch, Seq("row", "bucket"), "left")
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
}
