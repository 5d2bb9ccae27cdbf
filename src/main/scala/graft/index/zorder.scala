package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values — on the reference's roadmap
  * (README.md:204-215). Sorting a layout by one column makes its
  * zonemaps tight and every other column's useless; sorting by the
  * interleaved bits of TWO columns keeps row-group min/max ranges narrow
  * in BOTH dimensions, so pushed filters on either column prune row
  * groups (SURVEY.md §4 #4 machinery, now multi-column).
  *
  * `zValue` interleaves the low `bits` of two non-negative integer
  * columns (a in even positions, b in odd): a pure shift/mask/add
  * expression — codegen'd in Spark, reproducible in any engine with
  * integer bit ops.
  */
object zorder {

  /** Morton value of two non-negative int columns over their low `bits`
    * bits (caller buckets/offsets values into that range first). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      (shiftright(al, i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(bl, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** DuckDB SQL fragment computing the same Morton value. */
  def sqlZValue(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Write `df` as a Z-ORDER-CLUSTERED parquet layout: range-partition
    * and sort by the Morton value of `(a, b)`, drop the helper column,
    * and land small row groups — after this, pushed min/max filters on
    * EITHER column prune row groups (the multi-dimensional version of
    * `VecIndex`'s sortBy zonemaps; Delta/Iceberg OPTIMIZE ZORDER does
    * exactly this dance). The curve only helps columns whose low `bits`
    * carry the signal — bucket/offset wide-range columns first. */
  def writeClustered(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      a: String,
      b: String,
      bits: Int = 16,
      files: Int = 8,
      rowGroupBytes: Long = 64 * 1024): Unit = {
    require(files >= 1 && rowGroupBytes >= 16 * 1024,
      s"graft: need files >= 1 and rowGroupBytes >= 16KiB, got $files, $rowGroupBytes")
    df.withColumn("_z", zValue(col(a), col(b), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }
}
