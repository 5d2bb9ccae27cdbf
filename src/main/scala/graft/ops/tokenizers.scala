package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned on-disk tokenizer artifacts — train once, persist, encode
  * everywhere. [[bpe.train]] / [[unigram.trainVocab]] return driver
  * Seqs, which is right for the trainer but wrong for a pipeline: the
  * vocabulary a 100 TB corpus was encoded with must outlive the session
  * that trained it, and every later job (token budgets, packing, dedup
  * thresholds, fertility audits) must load EXACTLY those pieces.
  *
  * Layout (the [[graft.index.VecIndex]] `_graft_meta` convention):
  * {{{
  *   <path>/pieces/version=N/   — the vocabulary rows (parquet)
  *   <path>/_graft_meta/        — one config row per version (parquet)
  * }}}
  * `version` is a parquet PARTITION column, so loading one version is
  * partition pruning — a reader touches one directory of an artifact
  * that may hold years of retrains (pinned in TokenizerArtifactSpec).
  * Writes append: version n+1 never rewrites version n (an encode job
  * running concurrently keeps reading its pinned version).
  *
  * Row shapes: unigram `(piece, freq, score_q6)` — score recorded at
  * train time so load-then-encode replays the trainer's exact integer
  * DP scores; BPE `(step, left, right, pair_count)` in training order.
  *
  * Determinism: versions are dense integers (max existing + 1), no
  * timestamps or randomness anywhere; the artifact is a pure function
  * of (corpus, config, prior version count).
  *
  * Reference scope note: the reference engine persists vector indexes
  * but has no tokenizer surface (SURVEY.md §2.8) — this extends its
  * build()/load() persistence idiom (ref meta.rs:151-305) to the
  * tokenizer family. */
object tokenizers {

  private val MetaDir = "_graft_meta"
  private val PiecesDir = "pieces"

  /** Load-side sanity ceiling: a tokenizer vocabulary is a bounded
    * driver literal by construction (unigram ≤ [[unigram.MaxSeedSize]],
    * BPE ≤ its merge budget); a version with more rows than this is a
    * corrupt or foreign artifact, not a vocabulary. */
  val MaxArtifactRows: Int = 100000

  private val metaSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("seed_size", IntegerType, nullable = true),
    StructField("max_piece_len", IntegerType, nullable = true),
    StructField("rounds", IntegerType, nullable = true),
    StructField("min_usage", LongType, nullable = true),
    StructField("merges", IntegerType, nullable = true),
    StructField("min_pair_count", LongType, nullable = true)))

  /** All recorded `(version, kind, n_rows)` triples, version-ordered;
    * empty for a path never written. */
  def versions(spark: SparkSession, path: String): Seq[(Int, String, Long)] = {
    val metaPath = new org.apache.hadoop.fs.Path(path, MetaDir)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaPath)) return Seq.empty
    spark.read.parquet(metaPath.toString)
      .select(col("version"), col("kind"), col("n_rows"))
      .orderBy(col("version"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq
  }

  /** Highest recorded version, if any. */
  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption.map(_._1)

  // Explicit Row + schema (not .toDF): product-encoder derivation fails
  // inside REPL-generated classloaders, and artifact writes must work
  // from spark-shell/console too (the VecIndex.writeMetaValues rule).
  private def appendMeta(spark: SparkSession, path: String, row: Row): Unit =
    spark.createDataFrame(java.util.Collections.singletonList(row), metaSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$path/$MetaDir")

  private def nextVersion(spark: SparkSession, path: String): Int =
    latestVersion(spark, path).getOrElse(0) + 1

  /** Persist a trained unigram vocabulary `(piece, freq)` as the next
    * version of the artifact at `path`, recording the q6 scores the
    * encode DP will replay ([[unigram]]'s `floor(ln(freq)·10⁶) −
    * floor(ln(Σfreq)·10⁶)` convention) and the training config in the
    * meta row. Returns the new version number. */
  def writeUnigram(
      spark: SparkSession,
      path: String,
      vocab: Seq[(String, Long)],
      seedSize: Int,
      maxPieceLen: Int,
      rounds: Int,
      minUsage: Long): Int = {
    require(vocab.nonEmpty && vocab.size <= unigram.MaxSeedSize,
      s"graft: tokenizers.writeUnigram needs 1 <= pieces <= " +
        s"${unigram.MaxSeedSize}, got ${vocab.size}")
    val v = nextVersion(spark, path)
    val totalQ6 =
      math.floor(math.log(vocab.map(_._2).sum.toDouble) * 1e6).toLong
    val rowSchema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("freq", LongType, nullable = false),
      StructField("score_q6", LongType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    vocab.foreach { case (p, f) =>
      rows.add(Row(p, f,
        math.floor(math.log(f.toDouble) * 1e6).toLong - totalQ6, v))
    }
    spark.createDataFrame(rows, rowSchema)
      .coalesce(1).write.mode(SaveMode.Append)
      .partitionBy("version").parquet(s"$path/$PiecesDir")
    appendMeta(spark, path, Row(v, "unigram", vocab.size.toLong,
      seedSize, maxPieceLen, rounds, minUsage, null, null))
    v
  }

  /** Persist trained BPE merge rules `(step, left, right, pair_count)`
    * as the next version of the artifact at `path`. Returns the new
    * version number. */
  def writeBpe(
      spark: SparkSession,
      path: String,
      rules: Seq[(Int, String, String, Long)],
      merges: Int,
      minPairCount: Long): Int = {
    require(rules.nonEmpty && rules.size <= MaxArtifactRows,
      s"graft: tokenizers.writeBpe needs 1 <= rules <= $MaxArtifactRows, " +
        s"got ${rules.size}")
    val v = nextVersion(spark, path)
    val rowSchema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    rules.foreach { case (s, l, r, c) => rows.add(Row(s, l, r, c, v)) }
    spark.createDataFrame(rows, rowSchema)
      .coalesce(1).write.mode(SaveMode.Append)
      .partitionBy("version").parquet(s"$path/$PiecesDir")
    appendMeta(spark, path, Row(v, "bpe", rules.size.toLong,
      null, null, null, null, merges, minPairCount))
    v
  }

  private def pieceRows(
      spark: SparkSession, path: String, version: Option[Int],
      wantKind: String): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"graft: no tokenizer artifact at $path")
    val v = version.getOrElse(vs.last._1)
    val rec = vs.find(_._1 == v).getOrElse(
      throw new IllegalArgumentException(
        s"graft: tokenizer artifact $path has no version $v " +
          s"(recorded: ${vs.map(_._1).mkString(", ")})"))
    require(rec._2 == wantKind,
      s"graft: tokenizer artifact $path version $v is kind '${rec._2}', " +
        s"expected '$wantKind'")
    require(rec._3 <= MaxArtifactRows,
      s"graft: tokenizer artifact $path version $v records ${rec._3} " +
        s"rows > $MaxArtifactRows — not a vocabulary")
    // version is a partition column: this filter is partition PRUNING —
    // one directory read out of an arbitrarily-retrained artifact
    spark.read.parquet(s"$path/$PiecesDir")
      .where(col("version") === v)
  }

  /** Load one version's unigram pieces `(piece, score_q6)` (latest when
    * `version` is None) — the exact scores [[unigram.encodeTokens]]'s
    * DP replays. */
  def loadUnigram(
      spark: SparkSession,
      path: String,
      version: Option[Int] = None): Seq[(String, Long)] =
    pieceRows(spark, path, version, "unigram")
      .select(col("piece"), col("score_q6"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq

  /** Load one version's BPE rules in training order (latest when
    * `version` is None) — [[bpe.encodeTokens]]'s input. */
  def loadBpe(
      spark: SparkSession,
      path: String,
      version: Option[Int] = None): Seq[(String, String)] =
    pieceRows(spark, path, version, "bpe")
      .select(col("step"), col("left"), col("right"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Train-and-persist convenience: [[unigram.trainVocab]] with the
    * given config, written as the next version at `path`. Returns the
    * version. */
  def trainUnigramTo(
      df: DataFrame,
      textCol: String,
      path: String,
      seedSize: Int = 1000,
      maxPieceLen: Int = 4,
      rounds: Int = 2,
      minUsage: Long = 2L): Int = {
    val vocab = unigram.trainVocab(df, textCol, seedSize, maxPieceLen,
      rounds, minUsage)
    writeUnigram(df.sparkSession, path, vocab, seedSize, maxPieceLen,
      rounds, minUsage)
  }

  /** Viterbi-encode a text column under a PERSISTED unigram vocabulary
    * — load the version's `(piece, score_q6)` literals, then the same
    * fused row-local kernel as [[unigram.encodeTokens]] (zero shuffle;
    * the encode plan is identical to the in-session form, pinned in
    * TokenizerArtifactSpec). `maxPieceLen` must match the recorded
    * config; it is read from the meta row. */
  def encodeUnigramFrom(
      spark: SparkSession,
      path: String,
      c: Column,
      version: Option[Int] = None): Column = {
    val pieces = loadUnigram(spark, path, version)
    val vs = versions(spark, path)
    val v = version.getOrElse(vs.last._1)
    val maxLen = spark.read.parquet(s"$path/$MetaDir")
      .where(col("version") === v)
      .select(col("max_piece_len")).head().getInt(0)
    unigram.encodeTokens(c, pieces, maxLen)
  }
}
