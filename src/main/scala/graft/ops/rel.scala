package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational utilities that round out the pipeline surface. */
object rel {

  /** Top-`k` rows per group in rank order. Declared as the rank-filter
    * idiom (`row_number` over the group window, then `rnk <= k`) — Spark's
    * `InferWindowGroupLimit` rule rewrites exactly this shape into a
    * `WindowGroupLimit` physical node: each map task keeps a bounded
    * per-group heap BEFORE the shuffle, so only ~k rows per group per
    * partition ever cross the wire, and no group is fully sorted. At 100 TB
    * this is the difference between shuffling k·groups rows and shuffling
    * the corpus (asserted in PlanQualitySpec).
    *
    * `orderCols` must define a total order within each group (append a
    * unique tiebreak column) or ranks are nondeterministic. */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    df.withColumn(rankCol,
        row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .where(col(rankCol) <= k)
  }
}
