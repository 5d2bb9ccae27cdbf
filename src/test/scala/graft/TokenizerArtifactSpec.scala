package graft

import org.apache.spark.sql.functions._

import graft.ops.{bpe, tokenizers, unigram}

/** Versioned tokenizer artifacts: round trip, append/versioning,
  * partition-pruned load, and load-then-encode equivalence with the
  * in-session trainer. */
class TokenizerArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the data the data pipeline"),
    (2L, "data pipeline runs the data"),
    (3L, "pipeline data data the runs runs")).toDF("doc_id", "text")

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-tokart-$tag-").toString + "/a"

  test("unigram round trip: write then load returns the trainer's exact scores") {
    val path = tmp("uni")
    val vocab = unigram.trainVocab(corpus, "text",
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    val v = tokenizers.writeUnigram(spark, path, vocab,
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    assert(v == 1)
    val totalQ6 = math.floor(math.log(vocab.map(_._2).sum.toDouble) * 1e6).toLong
    val want = vocab.map { case (p, f) =>
      (p, math.floor(math.log(f.toDouble) * 1e6).toLong - totalQ6)
    }.sortBy(_._1)
    assert(tokenizers.loadUnigram(spark, path) == want)
    assert(tokenizers.versions(spark, path) ==
      Seq((1, "unigram", vocab.size.toLong)))
  }

  test("append creates dense versions; each loads its own pieces") {
    val path = tmp("ver")
    val v1 = unigram.trainVocab(corpus, "text",
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    val v2 = unigram.trainVocab(corpus, "text",
      seedSize = 10, maxPieceLen = 2, rounds = 1, minUsage = 1L)
    assert(tokenizers.writeUnigram(spark, path, v1, 30, 3, 1, 1L) == 1)
    assert(tokenizers.writeUnigram(spark, path, v2, 10, 2, 1, 1L) == 2)
    assert(tokenizers.versions(spark, path).map(x => (x._1, x._3)) ==
      Seq((1, v1.size.toLong), (2, v2.size.toLong)))
    assert(tokenizers.latestVersion(spark, path).contains(2))
    // each version loads its OWN vocabulary; latest defaults to v2
    assert(tokenizers.loadUnigram(spark, path, Some(1)).size == v1.size)
    assert(tokenizers.loadUnigram(spark, path).size == v2.size)
    // loading a version that was never written names the recorded ones
    val err = intercept[IllegalArgumentException] {
      tokenizers.loadUnigram(spark, path, Some(7))
    }
    assert(err.getMessage.contains("no version 7"))
  }

  test("version load is partition pruning, and encode stays row-local") {
    val path = tmp("prune")
    val vocab = unigram.trainVocab(corpus, "text",
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    tokenizers.writeUnigram(spark, path, vocab, 30, 3, 1, 1L)
    tokenizers.writeUnigram(spark, path, vocab, 30, 3, 1, 1L)
    // the pieces read carries the version as a PartitionFilter — one
    // directory touched out of the artifact's retrain history
    val reader = spark.read.parquet(s"$path/pieces")
      .where(col("version") === 1)
    val plan = reader.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("version"),
      s"no partition pruning in:\n$plan")
    // load-then-encode builds the same plan shape as in-session encode:
    // one projection over the scan, no shuffle anywhere
    val enc = corpus.select(
      tokenizers.encodeUnigramFrom(spark, path, col("text")).as("pieces"))
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"encode shuffled:\n$encPlan")
  }

  test("load-then-encode equals in-session encode (unigram and bpe)") {
    val pathU = tmp("equni")
    val vocab = unigram.trainVocab(corpus, "text",
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    tokenizers.writeUnigram(spark, path = pathU, vocab = vocab,
      seedSize = 30, maxPieceLen = 3, rounds = 1, minUsage = 1L)
    val totalQ6 = math.floor(math.log(vocab.map(_._2).sum.toDouble) * 1e6).toLong
    val scores = vocab.map { case (p, f) =>
      (p, math.floor(math.log(f.toDouble) * 1e6).toLong - totalQ6) }
    val diffU = corpus.select(
        unigram.encodeTokens(col("text"), scores, maxPieceLen = 3).as("a"),
        tokenizers.encodeUnigramFrom(spark, pathU, col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diffU == 0)

    val pathB = tmp("eqbpe")
    val rulesDf = bpe.train(corpus, "text", merges = 6, minPairCount = 1L)
    val rules = rulesDf.orderBy(col("step")).collect().map(r =>
      (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    tokenizers.writeBpe(spark, pathB, rules, merges = 6, minPairCount = 1L)
    val loaded = tokenizers.loadBpe(spark, pathB)
    assert(loaded == rules.map(r => (r._2, r._3)))
    val diffB = corpus.select(
        bpe.encodeTokens(col("text"), rules.map(r => (r._2, r._3))).as("a"),
        bpe.encodeTokens(col("text"), loaded).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diffB == 0)
    // kind mismatch is an explicit error, not a silent wrong decode
    val kindErr = intercept[IllegalArgumentException] {
      tokenizers.loadUnigram(spark, pathB)
    }
    assert(kindErr.getMessage.contains("kind"))
  }
}
