package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExprs

/** WordPiece vocabulary training — the likelihood-ratio sibling of
  * [[bpe.train]] (Schuster & Nakajima, "Japanese and Korean Voice
  * Search", ICASSP 2012; the BERT tokenizer's trainer). Where BPE fuses
  * the most FREQUENT adjacent symbol pair, WordPiece fuses the pair that
  * most increases a unigram LM's corpus likelihood:
  * `score = count(l,r) / (count(l) · count(r))` — a pointwise-mutual-
  * information argmax, so a rare-but-always-together pair beats a
  * frequent-but-independent one. Completes the trainer triad
  * (merge-frequency [[bpe]], EM [[unigram]], likelihood-ratio here);
  * the reference engine has no tokenizer at all (SURVEY.md §2.8 —
  * text-statistics only), but token budgets and packing are denominated
  * in the model's own vocabulary.
  *
  * Exactness: the score is the integer quotient
  * `score_q12 = pc·10¹² DIV (sl·sr)` in DECIMAL(38,0) — `pc ≤ 9e18`
  * keeps the numerator below 9e30 and `sl·sr ≤ 8.1e37` fits the 38-digit
  * product, so the quantized score is a pure function of exact corpus
  * counts at any scale (no float argmax; ties break on
  * `(score desc, pc desc, l, r)`).
  *
  * Scale shape (100 TB): identical to [[bpe.train]] — the corpus is read
  * ONCE into a word-count aggregate; every round then runs over the word
  * VOCABULARY (orders of magnitude smaller, never collected): one
  * symbol-count aggregate, one pair-count aggregate, two vocab-sized
  * broadcast-joinable lookups, and a `TakeOrderedAndProject` that brings
  * exactly ONE winning row to the driver. Symbol arrays re-checkpoint
  * each round via [[ckpt.cutLazy]] to truncate lineage (lazily — each round already ends in a collect that materializes it).
  */
object wordpiece {

  /** Train `merges` WordPiece rules on the whitespace tokens of
    * `textCol`. Stops early when the best remaining pair (by score)
    * occurs fewer than `minPairCount` times. Returns
    * `(step, left, right, pair_count, score_q12)` in training order.
    *
    * Encoding note: replaying the learned rules in order with
    * [[bpe.encodeTokens]] reproduces the TRAINER's segmentation;
    * BERT-style inference instead greedy-longest-matches against the
    * final piece set — both are standard, the merge-replay form is the
    * one whose trainer/encoder agreement is testable here. */
  def train(
      df: DataFrame,
      textCol: String,
      merges: Int = 32,
      minPairCount: Long = 2): DataFrame = {
    require(merges >= 0, s"merges must be >= 0, got $merges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var vocab = ckpt.cutLazy(words.select(col("cnt"),
      transform(sequence(lit(1), length(col("w"))), i =>
        col("w").substr(i, lit(1))).as("syms")))
    val rules =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var step = 0
    var done = merges == 0
    while (!done) {
      // symbol totals under the CURRENT segmentation — the unigram
      // denominators of this round's likelihood ratio
      val symCounts = vocab
        .select(col("cnt"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("sc"))
      val top = vocab.where(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1), j =>
            struct(element_at(col("syms"), j).as("l"),
              element_at(col("syms"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .where(col("pc") >= minPairCount)
        .join(symCounts.select(col("sym").as("l"), col("sc").as("sl")), Seq("l"))
        .join(symCounts.select(col("sym").as("r"), col("sc").as("sr")), Seq("r"))
        .withColumn("score_q12",
          expr("""CAST((CAST(pc AS DECIMAL(38,0)) * 1000000000000)
                 DIV (CAST(sl AS DECIMAL(38,0)) * CAST(sr AS DECIMAL(38,0)))
                 AS LONG)"""))
        .orderBy(col("score_q12").desc, col("pc").desc, col("l").asc,
          col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val l = top(0).getAs[String]("l")
        val r = top(0).getAs[String]("r")
        rules += ((step, l, r, top(0).getAs[Long]("pc"),
          top(0).getAs[Long]("score_q12")))
        vocab = ckpt.cutLazy(vocab
          .withColumn("syms", NativeExprs.bpeMergePair(col("syms"), l, r)))
        step += 1
        if (step >= merges) done = true
      }
    }
    rules.toSeq.toDF("step", "left", "right", "pair_count", "score_q12")
  }
}
