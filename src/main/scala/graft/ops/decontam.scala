package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that
  * share word n-gram shingles with a held-out evaluation set — the
  * GPT-3/PaLM-style n-gram collision check, as an engine primitive.
  *
  * The reference engine has no corpus ops (SURVEY.md §2.8) — north-star
  * extension alongside the dedup family.
  *
  * Scale discipline (100 TB train, small bench): the benchmark side is
  * reduced to its DISTINCT n-gram set and BROADCAST, so the training
  * corpus is never shuffled — each scan task probes the in-memory gram
  * table (a hash-join bloom check, same effect as a bloom pushdown) and
  * only MATCHING (id, gram) rows enter the one aggregation shuffle, whose
  * volume is bounded by the contamination rate, not the corpus size. If
  * the bench gram set ever outgrows the broadcast threshold, pre-hash
  * grams to 64-bit ([[graft.functions.hashing.h32]]) to shrink it ~6×
  * before sharding the check.
  */
object decontam {

  /** Per-train-doc contamination hit counts: the number of DISTINCT word
    * `n`-gram shingles the doc shares with ANY benchmark doc. Only docs
    * with ≥ 1 hit are returned. */
  def contaminationHits(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(dedup.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol), explode(dedup.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
  }

  /** Drop training docs with ≥ `minHits` shared n-grams (anti-join on the
    * contaminated id list — thin, never the text payload). */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val bad = contaminationHits(train, bench, textCol, idCol, n)
      .where(col("hits") >= minHits)
      .select(col(idCol))
    train.join(broadcast(bad), Seq(idCol), "left_anti")
  }
}
