package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** retrieval-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object RetrievalRegistry extends Registry {

    // north-star: MMR diversification re-rank — distributed cosine pool
    // (TakeOrderedAndProject), then the inherently-sequential greedy pick
    // driver-side over the BOUNDED pool (same class as the IVF probe list).
  b.q(
    "retrieval_mmr_topk" -> ((s, dir) =>
      retrieval.mmr(table(s, dir, "embeddings"), Q1, k = 10,
          lambda = 0.7, poolCap = 50)
        .orderBy(col("mmr_rank")))
  )
    // Recursive-CTE mirror of the driver-side greedy: base case = highest
    // relevance; each step's LATERAL argmax scores the not-yet-selected
    // pool by lambda·rel − (1−lambda)·max-sim-to-selected. The lambda
    // constants are interpolated from the SAME Scala doubles the driver
    // uses (1−0.7 is NOT the double 0.3 — interpolation keeps both
    // engines on identical bits).
  b.o(
    "retrieval_mmr_topk" -> {
      val lam = 0.7
      s"""WITH RECURSIVE pool AS (
         |  SELECT vec_id, e, list_dot_product(e, ${sqlVec(Q1)}) * inv * ${vectors.invNormOf(Q1)} AS rel, inv
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    (CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
         |      THEN 1.0/sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
         |      ELSE 0.0 END) AS inv FROM embeddings)
         |  ORDER BY rel DESC, vec_id LIMIT 50),
         |sel(step, sel_ids, pick_id, pick_score) AS (
         |  SELECT 1, [p.vec_id], p.vec_id, p.rel
         |  FROM (SELECT * FROM pool ORDER BY rel DESC, vec_id LIMIT 1) p
         |  UNION ALL
         |  SELECT s.step + 1, list_append(s.sel_ids, c.vec_id), c.vec_id, c.mmr
         |  FROM sel s, LATERAL (
         |    SELECT p.vec_id, $lam * p.rel - ${1.0 - lam} * (
         |        SELECT max(list_dot_product(p.e, p2.e) * p.inv * p2.inv)
         |        FROM pool p2 WHERE list_contains(s.sel_ids, p2.vec_id)) AS mmr
         |    FROM pool p WHERE NOT list_contains(s.sel_ids, p.vec_id)
         |    ORDER BY mmr DESC, p.vec_id LIMIT 1) c
         |  WHERE s.step < 10)
         |SELECT step AS mmr_rank, pick_id AS vec_id, round(pick_score, 4) + 0.0 AS mmr_score
         |FROM sel ORDER BY mmr_rank""".stripMargin
    }
  )

    // north-star: late-interaction (ColBERT MaxSim) top-k — documents as
    // bags of 4×16-dim token vectors (contiguous slices), score =
    // Σ_q max_t dot(q, t); both loops unrolled driver-side into one
    // codegen scan expression, zero shuffles.
  b.q(
    "retrieval_maxsim_topk" -> ((s, dir) =>
      retrieval.maxSimTopK(table(s, dir, "embeddings"), "embedding", "vec_id",
          QTok, tokDim = 16, docDim = 64, k = 10)
        .orderBy(col("maxsim").desc, col("vec_id")))
  )
  b.o(
    "retrieval_maxsim_topk" -> SqlMaxSimTopK
  )

    // north-star: long-form MaxSim over a token TABLE (variable-length
    // multi-vector docs) — result-identical to the unrolled fast path
    // on the sliced layout, which is exactly what this fixture checks
    // end-to-end against the same oracle.
  b.q(
    "retrieval_maxsim_long" -> ((s, dir) => {
      val toks = table(s, dir, "embeddings").select(col("vec_id"),
        explode(array((0 until 4).map(i =>
          slice(vectors.asDoubleArray(col("embedding")), i * 16 + 1, 16)): _*))
          .as("tok"))
      retrieval.maxSimLong(toks, "vec_id", "tok", QTok, k = 10)
        .orderBy(col("maxsim").desc, col("vec_id"))
    })
  )
    // the long-form token-table path must produce the IDENTICAL result
  b.o(
    "retrieval_maxsim_long" -> SqlMaxSimTopK
  )

    // north-star: batched MaxSim serving — two multi-token queries in
    // ONE corpus scan, per-query top-k via WindowGroupLimit heaps.
  b.q(
    "retrieval_maxsim_batch" -> ((s, dir) =>
      retrieval.maxSimBatch(table(s, dir, "embeddings"), "embedding", "vec_id",
          Seq(0L -> QTok, 1L -> QTok2), tokDim = 16, docDim = 64, k = 5)
        .orderBy(col("query_id"), col("rnk")))
  )
  b.o(
    "retrieval_maxsim_batch" -> {
      def side(qid: Long, toks: Seq[Seq[Double]]): String =
        s"""(SELECT query_id, vec_id, maxsim,
           |  row_number() OVER (ORDER BY maxsim DESC, vec_id) AS rnk
           | FROM (SELECT ${qid}::BIGINT AS query_id, vec_id,
           |   ${r4(sqlMaxSimScore(toks))} AS maxsim FROM embeddings))""".stripMargin
      s"""SELECT query_id, vec_id, maxsim, rnk FROM (
         |  SELECT * FROM ${side(0L, QTok)} WHERE rnk <= 5
         |  UNION ALL
         |  SELECT * FROM ${side(1L, QTok2)} WHERE rnk <= 5)
         |ORDER BY query_id, rnk""".stripMargin
    }
  )
}
