package graft

import org.apache.spark.sql.functions._

import graft.ops.sample

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministicSample: stable across runs, ~pct of rows, subset-monotone") {
    val s20a = sample.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val s20b = sample.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val s50 = sample.deterministicSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s20a == s20b)                    // no RNG state
    assert(s20a.subsetOf(s50))              // pct bands nest
    assert(s20a.size > 50 && s20a.size < 150) // ~20% of 500
  }

  test("split: disjoint, exhaustive, roughly proportioned") {
    val r = sample.split(docs, "doc_id", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(r.keySet == Set("train", "val", "test"))
    assert(r.values.sum == docs.count())
    assert(r("train") > r("val") && r("train") > r("test"))
  }

  test("packSequences: packs respect the budget unless a single doc exceeds it") {
    val packed = sample.packSequences(docs, "doc_id",
      graft.ops.text.tokenCount(col("text")).cast("long"), budget = 512)
    val packs = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    // a pack only exceeds budget by (at most) its final document
    val maxDoc = packed.agg(max("n_tokens")).head().getLong(0)
    assert(packs.forall { case (_, tok, _) => tok < 512 + maxDoc })
    // ids within a pack are contiguous (prefix-sum assignment)
    val byPack = packed.select("pack_id", "doc_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byPack.values.foreach(ids => assert(ids.last - ids.head == ids.length - 1))
  }
}
