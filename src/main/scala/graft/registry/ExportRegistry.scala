package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** export-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object ExportRegistry extends Registry {

    // north-star: deterministic training-shard export — write, then
    // verify by READING BACK the landed parquet (shard membership is the
    // portable id hash, so the oracle recomputes it from the raw table).
  b.q(
    "export_shards" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-shards-")
        .toString + "/docs"
      graft.sources.ingest.writeShards(table(s, dir, "documents"), out,
        "doc_id", shards = 8)
      s.read.parquet(out)
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .orderBy(col("shard"))
    })
  )
    // Shard membership recomputed from the raw table with the same
    // portable hash — proves the written shards partition the corpus.
  b.o(
    "export_shards" ->
      s"""SELECT (${hashing.sqlH32("(doc_id::VARCHAR || '/shard')")} % 8)::INT AS shard,
         |  count(*) AS n_rows, sum(doc_id)::BIGINT AS sum_ids
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin
  )
}
