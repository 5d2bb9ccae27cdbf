package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time AS-OF join: attach to each left row the LATEST right row
  * with the same key and `right.ts <= left.ts` (inclusive) — the
  * point-in-time lookup every feature/training pipeline needs ("state of
  * X when Y happened") and a roadmap-class operator the reference engine
  * lacks (SURVEY.md §2.8).
  *
  * Spark has no ASOF JOIN operator; the naive encoding
  * (`l JOIN r ON key AND r.ts <= l.ts` + max-window or groupBy) produces
  * an O(|l|·|r|) range join per key. This implementation uses the
  * union + running-`last` formulation instead:
  *
  *   1. union left and right rows into one keyed stream with a side tag
  *      (right = 0, left = 1, so equal timestamps match inclusively) and
  *      the right payload packed into ONE struct (so all payload fields
  *      always come from the SAME right row, even with null fields),
  *   2. one window `partitionBy(key).orderBy(ts, side, payload)` with
  *      `last(payload, ignoreNulls)` over unbounded-preceding..current —
  *      each left row inherits the most recent right payload,
  *   3. keep the left side and unpack the struct.
  *
  * Cost at scale: ONE hash shuffle of |l|+|r| thin rows on the join key +
  * a per-key sort — identical to a regular keyed join, with no range
  * explosion. Per-key event streams are bounded in practice; a
  * pathological hot key serializes its own partition only (same failure
  * mode and same mitigation — key salting — as any keyed window).
  *
  * Determinism: multiple right rows sharing (key, ts) resolve to the
  * greatest payload struct (the struct is the window order's final key),
  * so results are stable across retries and partitionings. Payload
  * columns must therefore be orderable types.
  */
object asof {

  /** Left as-of join. `right` must contain `keyCol`, `tsCol`, and
    * `payloadCols`; payload names must not collide with `left` columns
    * (alias them on the way in). Left rows with no matching right row
    * keep null payloads. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one right payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}")

    val lCols = left.columns.toSeq
    val payType = right.select(struct(payloadCols.map(col): _*).as("__pay"))
      .schema("__pay").dataType
    val lSide = left.select(
      lCols.map(col) :+ lit(1).as("__side") :+ lit(null).cast(payType).as("__pay"): _*)
    val rSide = right.select(
      lCols.map { c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ lit(0).as("__side") :+ struct(payloadCols.map(col): _*).as("__pay"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .select(lCols.map(col) :+ col("__side") :+
        last(col("__pay"), ignoreNulls = true).over(w).as("__pay"): _*)
      .where(col("__side") === 1)
      .select(lCols.map(col) ++ payloadCols.map(p => col("__pay").getField(p).as(p)): _*)
  }

  /** Time-RANGE inner join: every (left, right) pair with the same key and
    * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs]` (inclusive,
    * micros). The naive encoding (`l JOIN r ON key AND r.ts BETWEEN …`)
    * leaves Spark a nested-loop per key; this one buckets BOTH sides by
    * `w = upperUs − lowerUs` micros — each left interval covers at most 2
    * buckets (≤ 2× row duplication), each right row exactly 1 — so the
    * join is a plain equi-join on (key…, bucket) with uniform keys and one
    * shuffle, followed by the exact range filter. Each qualifying pair
    * matches in exactly one bucket: no post-join dedup.
    *
    * Bucket ids are the bucket START micros (`ts − pmod(ts, w)` — floor to
    * a multiple of w) rather than a divided index: pure long arithmetic,
    * exact at epoch-micros magnitudes where a double division would
    * corrupt low bits (see the events nanos note in SparkEntry). */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      lowerUs: Long,
      upperUs: Long,
      payloadCols: Seq[String]): DataFrame = {
    val w = upperUs - lowerUs
    require(w > 0, s"upperUs ($upperUs) must exceed lowerUs ($lowerUs)")
    require(payloadCols.nonEmpty, "rangeJoin needs at least one right payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}")

    def bstart(x: Column): Column = x - pmod(x, lit(w))
    val lCols = left.columns.toSeq
    val lb = left
      .withColumn("__lo", unix_micros(col(tsCol)) + lowerUs)
      .withColumn("__hi", unix_micros(col(tsCol)) + upperUs)
      .withColumn("__b",
        explode(sequence(bstart(col("__lo")), bstart(col("__hi")), lit(w))))
    val rb = right
      .withColumn("__rts", unix_micros(col(tsCol)))
      .withColumn("__b", bstart(col("__rts")))
      .select((keyCols.map(col) :+ col("__b") :+ col("__rts")) ++ payloadCols.map(col): _*)
    lb.join(rb, keyCols :+ "__b")
      .where(col("__rts").between(col("__lo"), col("__hi")))
      .select(lCols.map(col) ++ payloadCols.map(col): _*)
  }
}
