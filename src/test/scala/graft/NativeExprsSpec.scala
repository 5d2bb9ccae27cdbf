package graft

import org.apache.spark.sql.functions._

import graft.functions.{hashing, NativeExprs}
import graft.ops.dedup

class NativeExprsSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("native h32 equals the conv(md5) composition on real text") {
    val diff = docs.select(
        NativeExprs.h32(col("text")).as("a"), hashing.h32(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native wordShingles equals the HOF composition on real text") {
    val diff = docs.select(
        dedup.wordShingles(col("text")).as("a"),
        dedup.wordShinglesHof(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
    // edge cases: short text, repeated whitespace, case folding
    import spark.implicits._
    val edge = Seq("", "a b", "A  B\tC  a b c", "x y z").toDF("text")
    val rows = edge.select(dedup.wordShingles(col("text")).as("a"),
      dedup.wordShinglesHof(col("text")).as("b")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("native minhash signature equals the affine HOF composition") {
    val grams = docs.select(col("doc_id"), dedup.wordShingles(col("text")).as("g"))
      .where(size(col("g")) > 0)
      .withColumn("hs", transform(col("g"), x => hashing.h32(x)))
    val diff = grams.select(
        NativeExprs.minhashSig(col("g"), 16).as("a"),
        dedup.minhashSignatureHof(col("hs"), 16).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0)
  }
}
