package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** datetime-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object DatetimeRegistry extends Registry {

    // §2.1 datetime ingestion: format round-trip + try-parse fallback
    // chain (ref col.rs:506-545 auto-parse).
  b.q(
    "datetime_parse" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(date_format(col("l_shipdate"), "yyyy/MM/dd").as("s"))
        .distinct()
        .withColumn("parsed", coalesce(
          try_to_timestamp(col("s"), lit("yyyy-MM-dd")),
          try_to_timestamp(col("s"), lit("yyyy/MM/dd"))))
        .select(col("s"), date_format(col("parsed"), "yyyy-MM-dd").as("d"))
        .orderBy(col("s")))
  )
  b.o(
    "datetime_parse" ->
      """WITH s AS (SELECT DISTINCT strftime(l_shipdate, '%Y/%m/%d') AS s FROM lineitem)
        |SELECT s, strftime(coalesce(try_strptime(s, '%Y-%m-%d'), try_strptime(s, '%Y/%m/%d')),
        |  '%Y-%m-%d') AS d
        |FROM s ORDER BY s""".stripMargin
  )
}
