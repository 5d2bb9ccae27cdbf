package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.functions.vectors
import graft.sources.ingest

class ExtensionsAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions: kernels callable from spark.sql, equal to the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       graft_l1(array(1.0D, -1.0D), array(-1.0D, 1.0D)) AS l1,
        |       graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |       graft_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS c0,
        |       graft_simhash('the quick brown fox jumps', 32) AS sh
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 4.0)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getDouble(4) == 0.0)                 // zero vector -> 0, not NaN
    // the portable base hash: SQL function == md5-composition == driver twin
    val h = spark.sql("SELECT graft_h32('alpha') AS h").head().getLong(0)
    assert(h == graft.functions.hashing.h32Of("alpha"))
    assert(h == Seq("alpha").toDF("s")
      .select(graft.functions.hashing.h32(col("s"))).head().getLong(0))
    // SQL path and Column path are the same expression, bit-for-bit
    val viaSql = spark.sql(
      "SELECT graft_minhash(graft_word_shingles('a b c d e', 3), 8) AS sig")
      .head().getSeq[Long](0)
    val viaCol = Seq("a b c d e").toDF("t")
      .select(graft.functions.NativeExprs.minhashSig(
        graft.ops.dedup.wordShingles(col("t"), 3), 8).as("sig"))
      .head().getSeq[Long](0)
    assert(viaSql == viaCol)
    // fused char-entropy kernel from SQL == the Column path
    val ce = spark.sql("SELECT graft_char_entropy('aab') AS s").head().getStruct(0)
    assert(ce.getLong(0) == 3L && ce.getLong(1) == 1386294L)
    // fused gram-set digest == the compositional h63 chain
    val gs = spark.sql(
      "SELECT graft_gram_set('a b c a b', 2) AS g").head().getSeq[Long](0)
    val h63 = (s: String) => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val a = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      val b = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
      a * 2147483648L + (b % 2147483648L)
    }
    assert(gs == Seq("a b", "b c", "c a").map(h63))
    // clipped-overlap counts: "a a b" vs "a b b" shares {a, b} at n=1
    val ov = spark.sql(
      "SELECT graft_overlap('a a b', 'a b b', 1) AS o").head().getStruct(0)
    assert((ov.getLong(0), ov.getLong(1), ov.getLong(2)) == ((2L, 3L, 3L)))
    // sized params must be literals: a column reference is rejected
    val e = intercept[Exception] {
      Seq(("a b c", 3)).toDF("t", "n")
        .createOrReplaceTempView("ext_bad")
      spark.sql("SELECT graft_word_shingles(t, n) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("jsonl ingest: schema enforced, malformed lines quarantined not dropped") {
    val dir = Files.createTempDirectory("graft-src-").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "second doc"}
        |{not json at all
        |{"doc_id": "NOT_A_NUMBER", "text": "bad type"}
        |""".stripMargin)
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val (good, bad) = ingest.jsonl(spark, s"$dir/docs.jsonl", schema)
    assert(good.schema.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(good.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json")))
    assert(quarantined.exists(_.contains("NOT_A_NUMBER")))
  }

  test("csv ingest: header + schema; ragged row quarantined") {
    val dir = Files.createTempDirectory("graft-src-").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/docs.csv"),
      """doc_id,text
        |1,hello
        |oops_not_a_long,world
        |2,fine
        |""".stripMargin)
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val (good, bad) = ingest.csv(spark, s"$dir/docs.csv", schema)
    assert(good.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(bad.as[String].collect().toSeq == Seq("oops_not_a_long,world"))
  }

  test("textFiles: one doc per file with path+length provenance") {
    val dir = Files.createTempDirectory("graft-src-").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "alpha doc\nline two")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"), "beta")
    val rows = ingest.textFiles(spark, dir)
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("a.txt", 18L, "alpha doc\nline two"), ("b.txt", 4L, "beta")))
  }

  test("textLines: exact 1-based per-file line numbers, empty lines kept") {
    val dir = Files.createTempDirectory("graft-src-").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "one\n\nthree")
    val rows = ingest.textLines(spark, dir)
      .select("line_no", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "one"), (2L, ""), (3L, "three")))
  }

  test("writeShards: lossless deterministic partition of the corpus + honest manifest") {
    import org.apache.spark.sql.functions._
    val df = (0 until 500).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val out = Files.createTempDirectory("graft-shards-").toString + "/t"
    val manifest = ingest.writeShards(df, out, "id", shards = 4)
      .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // manifest covers every shard; rows sum to the corpus; files+bytes real
    assert(manifest.map(_._1) == Seq(0, 1, 2, 3))
    assert(manifest.map(_._2).sum == 500L)
    assert(manifest.forall(m => m._3 >= 1 && m._4 > 0), s"empty file stats: $manifest")
    // read-back equals the input exactly (no row lost or duplicated)
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    assert(back.select("id", "text").exceptAll(df).isEmpty &&
      df.exceptAll(back.select("id", "text")).isEmpty)
    // determinism: a second export shards identically
    val out2 = Files.createTempDirectory("graft-shards-").toString + "/t"
    ingest.writeShards(df, out2, "id", shards = 4)
    val a = spark.read.parquet(out).select("id", "shard")
    val b = spark.read.parquet(out2).select("id", "shard")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
