package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** group-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object GroupRegistry extends Registry {

    // per-group top-k via the rank-filter idiom — planned as
    // WindowGroupLimit (bounded per-group heap before the shuffle;
    // asserted in PlanQualitySpec): top-3 docs per predicted language by
    // quality score.
  b.q(
    "group_topk" -> ((s, dir) =>
      rel.topKPerGroup(
        table(s, dir, "documents").select(col("doc_id"),
          text.langId(col("text")).as("lang"),
          (floor(text.qualityScore(col("text")) * 10000.0 + 0.5) / 10000.0)
            .as("quality")),
        Seq(col("lang")), Seq(col("quality").desc, col("doc_id")), k = 3)
        .orderBy(col("lang"), col("rnk")))
  )
  b.o(
    "group_topk" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  least(len(toks)::DOUBLE / 50.0, 1.0) AS content,
         |  1.0 - least((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 4.0, 1.0) AS clean,
         |  least((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 4.0, 1.0) AS prose,
         |  ${sqlStopHits("toks", text.EnStop)} AS en_hits,
         |  ${sqlStopHits("toks", text.DeStop)} AS de_hits,
         |  ${sqlStopHits("toks", text.EsStop)} AS es_hits,
         |  ${sqlStopHits("toks", text.FrStop)} AS fr_hits
         |FROM t),
         |v AS (SELECT doc_id,
         |  floor((content * 0.4 + clean * 0.3 + prose * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) < 1 THEN 'und'
         |       WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
         |       ELSE 'fr' END AS lang
         |FROM q),
         |r AS (SELECT doc_id, lang, quality,
         |  row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rnk FROM v)
         |SELECT doc_id, lang, quality, rnk FROM r WHERE rnk <= 3
         |ORDER BY lang, rnk""".stripMargin
  )
}
