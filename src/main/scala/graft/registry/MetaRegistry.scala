package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** meta-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object MetaRegistry extends Registry {

    // roadmap string ops (README.md:204-215): starts_with / contains /
    // ends_with metadata predicates — free as pushed Spark filters.
  b.q(
    "meta_string_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(col("source").startsWith("src1") &&
          col("text").contains("spark") && !col("lang").endsWith("h"))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "meta_string_filter" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE starts_with(source, 'src1') AND contains(text, 'spark')
        |  AND NOT ends_with(lang, 'h')
        |ORDER BY doc_id""".stripMargin
  )

    // roadmap "fuzzy matching" on string metadata (README.md:210): an
    // edit-distance predicate as an ordinary row-level filter —
    // `levenshtein` is a codegen'd Catalyst builtin, so the typo-tolerant
    // match ("scr1" finds src1/src11, "eng" finds en) rides the same
    // pushed-scan + WSCG path as the exact string filters above. Not a
    // join: each row is compared against LITERAL probe strings only.
  b.q(
    "meta_fuzzy_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(levenshtein(col("source"), lit("scr1")) <= 2 &&
          levenshtein(col("lang"), lit("eng")) <= 1)
        .select(col("doc_id"), col("source"), col("lang"),
          levenshtein(col("source"), lit("scr1")).cast("long").as("dist"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "meta_fuzzy_filter" ->
      """SELECT doc_id, source, lang, levenshtein(source, 'scr1') AS dist
        |FROM documents
        |WHERE levenshtein(source, 'scr1') <= 2 AND levenshtein(lang, 'eng') <= 1
        |ORDER BY doc_id""".stripMargin
  )

    // §2.2: typed predicate surface (int/double/string/timestamp, AND/OR)
  b.q(
    "meta_filter_pred" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 &&
          (col("l_returnflag") === "A" || col("l_returnflag") === "R") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column for a total deterministic order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"),
          col("l_quantity"), col("l_returnflag")))
  )
  b.o(
    "meta_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_quantity > 30 AND (l_returnflag = 'A' OR l_returnflag = 'R')
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_date, l_quantity, l_returnflag""".stripMargin
  )
}
