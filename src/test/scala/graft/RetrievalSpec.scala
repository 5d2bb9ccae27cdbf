package graft

import org.apache.spark.sql.functions._

import graft.ops.retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark runs fast"),
    (2L, "spark is mentioned once here in a longer document about engines"),
    (3L, "completely unrelated words with no match at all"),
    (4L, "query query spark")
  ).toDF("doc_id", "text")

  test("bm25: higher tf scores higher; non-matching docs absent; rare terms weigh more") {
    val scores = retrieval.bm25(docs, "text", "doc_id", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(3L))
    assert(scores(1L) > scores(2L)) // tf 3 beats tf 1 (similar lengths)
    // doc 4 matches BOTH terms, one of them rarer -> beats single-term docs
    assert(scores(4L) > scores(1L))
    assert(scores.values.forall(_ > 0))
  }

  test("rrfFuse: hand-computed reciprocal ranks, full outer semantics") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = retrieval.rrfFuse(a, b, "id").select("id", "rrf")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(30L) - 1.0 / 62) < 1e-12)
    assert(got(20L) > got(10L) && got(10L) > got(30L))
  }

  test("hybridSearch fuses vector and keyword evidence over the test tables") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = (0 until 64).map(i => math.sin(i + 1.0))
    val hits = retrieval.hybridSearch(graft.core.VecStore(emb), d, "text", "doc_id",
      q, Seq("spark", "query"), k = 10)
    val rows = hits.collect()
    assert(rows.length == 10)
    val rrfs = rows.map(_.getDouble(1)).toSeq
    assert(rrfs == rrfs.sorted.reverse && rrfs.forall(_ > 0))
  }
}
