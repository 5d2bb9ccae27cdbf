package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Int8 scalar quantization — on the reference's roadmap
  * (README.md:204-215), not shipped there. The 100 TB rationale: an f32
  * embedding store scanned for brute-force scoring is bandwidth-bound;
  * symmetric per-vector int8 cuts bytes-per-vector 4× (parquet bit-packs
  * further), so the first-pass scan reads a quarter of the data. Serving
  * pattern: score quantized, then exact-rerank the top candidates from
  * the f32 column — same shape as the LSH/IVF two-phase plans in
  * [[ann]].
  *
  * Scheme: per-vector symmetric scale `s = max|x| / 127`;
  * `q[i] = clamp(floor(x[i]/s + 0.5), -127, 127)` (zero vectors → all
  * zeros). Dequantized dot: `dot(qa, qb) · sa · sb`. Every step is
  * deterministic IEEE arithmetic, so results reproduce exactly in an
  * independent engine (the floor-form rounds half-up like the oracle's).
  */
object quant {

  /** Per-vector symmetric scale: `max(|x|) / 127` (0.0 for zero/empty
    * vectors). */
  def scaleOf(v: Column): Column =
    coalesce(array_max(transform(vectors.asDoubleArray(v), x => abs(x))), lit(0.0)) / 127.0

  /** Quantized vector as `array<tinyint>` given its scale. */
  def quantize(v: Column, scale: Column): Column =
    when(scale > 0,
      transform(vectors.asDoubleArray(v),
        x => least(greatest(floor(x / scale + 0.5), lit(-127.0)), lit(127.0)).cast("byte")))
      .otherwise(transform(vectors.asDoubleArray(v), _ => lit(0).cast("byte")))

  /** Add `q_vec` (int8) + `q_scale` columns — run at index build, persist
    * both, and the f32 column becomes rerank-only. */
  def quantized(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("q_scale", scaleOf(col(vecCol)))
      .withColumn("q_vec", quantize(col(vecCol), col("q_scale")))

  /** Approximate dot product from two quantized vectors and their
    * scales (native int kernel × two scalar multiplies). */
  def dequantizedDot(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    vectors.dotProduct(qa, qb) * sa * sb

  /** Driver-side quantization of a literal query — same formula, same
    * IEEE ops, so plan literals match engine results exactly. */
  def quantizeQuery(q: Seq[Double]): (Seq[Int], Double) = {
    val s = if (q.isEmpty) 0.0 else q.map(math.abs).max / 127.0
    if (s == 0.0) (q.map(_ => 0), 0.0)
    else (q.map(x => math.min(math.max(math.floor(x / s + 0.5), -127.0), 127.0).toInt), s)
  }
}
