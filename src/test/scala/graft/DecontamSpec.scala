package graft

import org.apache.spark.sql.functions._

import graft.ops.decontam

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 is verbatim inside train doc 1; train doc 2 is clean
  private val bench = Seq(
    (100L, "alpha bravo charlie delta echo foxtrot golf hotel")
  ).toDF("doc_id", "text")
  private val train = Seq(
    (1L, "intro words alpha bravo charlie delta echo foxtrot golf hotel outro"),
    (2L, "completely unrelated content with no shared phrases at all here now")
  ).toDF("doc_id", "text")

  test("contaminationHits counts shared distinct 8-grams") {
    val hits = decontam.contaminationHits(train, bench, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    // bench doc has 8 tokens -> exactly one 8-gram, contained once in doc 1
    assert(hits == Map(1L -> 1L))
  }

  test("decontaminate drops flagged docs, keeps clean ones") {
    val kept = decontam.decontaminate(train, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("shorter n catches partial overlap with higher hit counts") {
    val hits = decontam.contaminationHits(train, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    // bench has 4 distinct 5-grams, all inside doc 1
    assert(hits == Map(1L -> 4L))
  }

  test("bench grams are broadcast: the train side never shuffles before the join") {
    val p = decontam.contaminationHits(train, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }
}
