package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** docs-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object DocsRegistry extends Registry {

    // north-star: per-group mergeable quantiles — length distribution
    // per language from fixed-shape histogram state.
  b.q(
    "docs_len_quantiles_lang" -> ((s, dir) =>
      sketch.histogramQuantileBy(
        sketch.histogramBy(table(s, dir, "documents"),
          col("n_chars").cast("double"), Seq("lang"), lo = 0.0, hi = 640.0,
          nbins = 32),
        Seq("lang"), Seq(0.5, 0.95))
        .orderBy(col("lang"), col("q")))
  )
  b.o(
    "docs_len_quantiles_lang" ->
      """WITH b AS (SELECT lang, greatest(0, least(31, floor((n_chars::DOUBLE - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM documents),
        |c AS (SELECT lang, bin, count(*) AS n FROM b GROUP BY 1, 2),
        |h AS (SELECT g.lang, r.bin, 0.0 + r.bin * 20.0 AS bin_lo,
        |  0.0 + (r.bin + 1) * 20.0 AS bin_hi, coalesce(c.n, 0) AS n
        |  FROM (SELECT DISTINCT lang FROM b) g
        |  CROSS JOIN (SELECT unnest(range(0, 32)) AS bin) r
        |  LEFT JOIN c ON c.lang = g.lang AND c.bin = r.bin),
        |cc AS (SELECT lang, bin, bin_lo, bin_hi, n,
        |  sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |  sum(n) OVER (PARTITION BY lang) AS total FROM h),
        |qq AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q),
        |cand AS (SELECT lang, q, bin_lo, bin_hi, n, cum, total,
        |  row_number() OVER (PARTITION BY lang, q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0)
        |SELECT lang, q, floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |    * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v_est
        |FROM cand WHERE rk = 1 ORDER BY lang, q""".stripMargin
  )
}
