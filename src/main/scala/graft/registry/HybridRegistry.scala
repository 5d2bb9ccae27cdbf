package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** hybrid-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object HybridRegistry extends Registry {

    // north-star: hybrid retrieval — cosine ANN ranks fused with BM25
    // ranks by reciprocal rank (exact rational arithmetic).
  b.q(
    "hybrid_rrf_topk" -> ((s, dir) =>
      retrieval.hybridSearch(embStore(s, dir), table(s, dir, "documents"),
        "text", "doc_id", Q1, Seq("spark", "query", "window"), k = 10))
  )
  b.o(
    "hybrid_rrf_topk" ->
      s"""WITH ${SqlBm25Ctes},
         |b100 AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 100),
         |br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_b FROM b100),
         |es AS (SELECT vec_id, ${"floor((" + sqlCosine(Q1) + ") * 1000000.0 + 0.5) / 1000000.0"} AS vscore FROM embeddings),
         |v100 AS (SELECT vec_id, vscore FROM es ORDER BY vscore DESC, vec_id LIMIT 100),
         |vr AS (SELECT vec_id, row_number() OVER (ORDER BY vscore DESC, vec_id) AS rank_a FROM v100),
         |f AS (SELECT coalesce(vr.vec_id, br.doc_id) AS doc_id,
         |  coalesce(1.0 / (60.0 + rank_a), 0.0) + coalesce(1.0 / (60.0 + rank_b), 0.0) AS rrf
         |  FROM vr FULL OUTER JOIN br ON vr.vec_id = br.doc_id)
         |SELECT doc_id, floor(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  )

    // north-star: standalone reciprocal-rank fusion over two bounded
    // deterministic rank lists (longest-docs vs hash-ordered) — exact
    // rational arithmetic from integer ranks.
  b.q(
    "hybrid_rrf_fuse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents")
      // k-bounded single-partition rank windows (see retrieval.scala)
      val one = Window.partitionBy(pmod(col("doc_id"), lit(1)))
      val a = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(50)
        .withColumn("rank",
          row_number().over(one.orderBy(col("n_chars").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val b = docs
        .withColumn("h", hashing.h32(concat(col("doc_id").cast("string"), lit("/rrf"))))
        .orderBy(col("h"), col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(one.orderBy(col("h"), col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      retrieval.rrfFuse(a, b, "doc_id")
        .select(col("doc_id"),
          (floor(col("rrf") * 1000000.0 + 0.5) / 1000000.0).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    })
  )
  b.o(
    "hybrid_rrf_fuse" ->
      s"""WITH a AS (SELECT doc_id, rank_a FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_a
         |    FROM documents) WHERE rank_a <= 50),
         |b AS (SELECT doc_id, rank_b FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) AS rank_b
         |    FROM (SELECT doc_id, ${hashing.sqlH32("(doc_id::VARCHAR || '/rrf')")} AS h
         |          FROM documents)) WHERE rank_b <= 50)
         |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |  floor((coalesce(1.0 / (60.0 + rank_a), 0.0)
         |       + coalesce(1.0 / (60.0 + rank_b), 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS rrf
         |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |ORDER BY rrf DESC, doc_id""".stripMargin
  )
}
