package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExprs

/** Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training — the
  * [[bpe]] companion: where BPE greedily FUSES the hottest pair, the
  * unigram trainer starts from a large seed vocabulary of frequent
  * substrings and PRUNES it under an EM loop, keeping the pieces the
  * corpus actually uses in its best segmentations. This is the hard-EM
  * (Viterbi) variant: the E-step segments every word with the current
  * piece scores via [[graft.functions.NativeExprs.unigramSegment]]'s
  * exact DP, the M-step re-estimates each piece's frequency as its
  * usage mass and drops pieces below `minUsage`.
  *
  * Reference scope note: the reference engine has no tokenizer surface
  * (SURVEY.md §2.8) — north-star extension, same rationale as [[bpe]]:
  * token budgets, packing, and dedup thresholds are denominated in the
  * model's own vocabulary.
  *
  * Scale shape (100 TB, the bpe.train shape): the corpus is read ONCE —
  * token explode into a word-count aggregate (map-side combine; the
  * shuffle carries distinct words only, Heaps-sublinear). Every EM
  * round then runs over the WORD VOCABULARY (distributed, never
  * collected); the only driver state is the PIECE table, bounded by
  * `seedSize` ≤ [[unigram.MaxSeedSize]] (ENFORCED — the
  * kmeans/codebook bounded-driver-literal discipline), so each round is
  * one vocab-keyed aggregate collected to ≤ seedSize rows.
  *
  * Determinism: piece scores are integer q6 log-probs
  * `floor(ln(freq)·10⁶) − floor(ln(total)·10⁶)` (ln of an exact
  * integer-valued double — the [[graft.ops.rel.mutualInfo]] ln
  * precedent), the DP is exact integer addition with ties preferring
  * the longer piece, and every aggregate is an exact long sum — the
  * learned vocabulary is a pure function of the corpus, re-derivable
  * round-by-round by the DuckDB oracle (unrolled like text_bpe_merges).
  */
object unigram {

  /** Driver-literal ceiling for the piece table (seed and all later
    * rounds are ≤ this): the scores ride into [[NativeExprs
    * .unigramSegment]] as expression literals, the kmeans-centroid
    * discipline. */
  val MaxSeedSize: Int = 10000

  /** UNK penalty (q6 log-prob) for a code point covered by no piece —
    * harsh enough (~e⁻³⁰) that any in-vocab path wins, finite so every
    * token stays segmentable. */
  val UnkScoreQ6: Long = -30000000L

  /** q6 piece scores from a (piece, freq) table: `floor(ln(freq)·10⁶)
    * − floor(ln(Σfreq)·10⁶)`. Driver-side; the oracle recomputes the
    * same longs from the same integers. */
  private def scoresOf(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val totalQ6 = math.floor(math.log(vocab.map(_._2).sum.toDouble) * 1e6).toLong
    vocab.map { case (p, f) =>
      (p, math.floor(math.log(f.toDouble) * 1e6).toLong - totalQ6)
    }
  }

  /** Train a unigram-LM vocabulary on the whitespace tokens of
    * `textCol`: seed with the `seedSize` most frequent substrings of
    * length ≤ `maxPieceLen` (occurrence-weighted by word count, ties on
    * the piece string), then `rounds` hard-EM rounds — Viterbi-segment
    * every word under the current scores, re-estimate piece frequency
    * as usage mass, prune below `minUsage` (pieces the best
    * segmentations stopped using vanish; unknown single characters
    * surface through the UNK fallback and are never counted).
    *
    * Returns the final vocabulary `(piece, freq, score_q6)` ordered by
    * (freq desc, piece), limited to `keepTop`. */
  def train(
      df: DataFrame,
      textCol: String,
      seedSize: Int = 1000,
      maxPieceLen: Int = 4,
      rounds: Int = 2,
      minUsage: Long = 2L,
      keepTop: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = trainVocab(df, textCol, seedSize, maxPieceLen, rounds,
      minUsage)
    val finalTotalQ6 =
      if (vocab.isEmpty) 0L
      else math.floor(math.log(vocab.map(_._2).sum.toDouble) * 1e6).toLong
    vocab.sortBy { case (p, f) => (-f, p) }.take(keepTop)
      .map { case (p, f) =>
        (p, f, math.floor(math.log(f.toDouble) * 1e6).toLong - finalTotalQ6)
      }
      .toDF("piece", "freq", "score_q6")
  }

  /** The EM loop itself — the trained `(piece, freq)` vocabulary as a
    * driver Seq (bounded by `seedSize`); [[train]] and [[fertility]]
    * are readouts over it. */
  def trainVocab(
      df: DataFrame,
      textCol: String,
      seedSize: Int = 1000,
      maxPieceLen: Int = 4,
      rounds: Int = 2,
      minUsage: Long = 2L): Seq[(String, Long)] = {
    require(seedSize >= 1 && seedSize <= MaxSeedSize,
      s"graft: unigram.train needs 1 <= seedSize <= $MaxSeedSize, got $seedSize")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"graft: unigram.train needs 1 <= maxPieceLen <= 16, got $maxPieceLen")
    require(rounds >= 1 && minUsage >= 1L,
      s"graft: unigram.train needs rounds/minUsage >= 1; " +
        s"got $rounds, $minUsage")
    val spark = df.sparkSession
    import spark.implicits._
    // The ONE corpus-wide pass: word -> count, lineage cut so every EM
    // round rereads materialized words (the bpe.train discipline).
    val words = ckpt.cut(
      df.select(explode(text.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")))
    // Seed: every substring of length 1..maxPieceLen, occurrence-
    // weighted (a char twice in a word counts twice per word instance);
    // substr/length are code-point based on both engines.
    val seed = words.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("w")) - i + lit(1))),
            l => col("w").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("piece")).limit(seedSize)
      .as[(String, Long)].collect().toSeq
    var vocab: Seq[(String, Long)] = seed
    var r = 0
    while (r < rounds && vocab.nonEmpty) {
      // E-step: one distributed pass over the word vocabulary; the
      // usage aggregate is piece-keyed and collects <= seedSize +
      // alphabet rows (segmentation pieces are vocab pieces or single
      // UNK code points).
      val usage = words.select(col("cnt"),
          explode(NativeExprs.unigramSegment(col("w"), scoresOf(vocab),
            maxPieceLen, UnkScoreQ6)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("usage"))
        .as[(String, Long)].collect().toMap
      // M-step: usage becomes frequency; UNK emissions of non-vocab
      // characters never enter (vocab.flatMap keys the update), and
      // pieces the segmentations stopped using are pruned.
      vocab = vocab.flatMap { case (p, _) =>
        usage.get(p).filter(_ >= minUsage).map(u => (p, u))
      }
      r += 1
    }
    vocab
  }

  /** FERTILITY of the trained vocabulary — the will-this-tokenizer-
    * bloat-my-token-budget card ([[graft.ops.text]]'s fertility meter,
    * for the LEARNED unigram vocab): segment the corpus's word
    * vocabulary once more under the final scores and report pieces per
    * whitespace token plus the UNK share (segment steps covered by no
    * piece — falls to single-character UNK steps). Exact: every count
    * is a long sum over the word vocab weighted by word frequency;
    * rates are basis-point / ppm integer DIVs.
    *
    * Returns one row `(n_word_types, n_tokens, n_pieces, fertility_bp,
    * unk_ppm)`. */
  def fertility(
      df: DataFrame,
      textCol: String,
      seedSize: Int = 1000,
      maxPieceLen: Int = 4,
      rounds: Int = 2,
      minUsage: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = trainVocab(df, textCol, seedSize, maxPieceLen, rounds,
      minUsage)
    val words = df.select(explode(text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val pieceDf = broadcast(
      spark.createDataset(vocab.map(_._1)).toDF("piece")
        .withColumn("_inv", lit(1L)))
    words.select(col("cnt"),
        explode(NativeExprs.unigramSegment(col("w"), scoresOf(vocab),
          maxPieceLen, UnkScoreQ6)).as("piece"))
      .join(pieceDf, Seq("piece"), "left")
      .agg(sum(col("cnt")).as("n_pieces"),
        sum(when(col("_inv").isNull, col("cnt")).otherwise(0L))
          .as("n_unk"))
      .crossJoin(broadcast(words.agg(
        count(lit(1)).as("n_word_types"), sum(col("cnt")).as("n_tokens"))))
      .select(col("n_word_types"), col("n_tokens"), col("n_pieces"),
        expr("n_pieces * 10000 DIV n_tokens").as("fertility_bp"),
        expr("n_unk * 1000000 DIV n_pieces").as("unk_ppm"))
  }

  /** Viterbi unigram encode of a TEXT column under a trained
    * `(piece, score_q6)` table — the inference twin of [[train]]
    * ([[bpe.encodeTokens]]' contract): one fused pass, zero shuffle. */
  def encodeTokens(
      c: Column,
      pieces: Seq[(String, Long)],
      maxPieceLen: Int = 4): Column =
    NativeExprs.unigramSegment(c, pieces, maxPieceLen, UnkScoreQ6)
}
