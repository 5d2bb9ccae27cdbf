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

  // ---- semantic (embedding-space) screen ----

  private val benchVec = Seq(
    (100L, Seq(1.0f, 0.0f, 0.0f)),
    (101L, Seq(0.0f, 1.0f, 0.0f))
  ).toDF("id", "vec")
  private val trainVec = Seq(
    (1L, Seq(0.99f, 0.1f, 0.0f)),  // near bench 100 (paraphrase leak)
    (2L, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal to both
    (3L, Seq(0.0f, 0.0f, 0.0f))    // zero vector: scores 0.0, never NaN
  ).toDF("id", "vec")

  test("semanticHits flags exactly the tau+ cosine pairs") {
    val hits = decontam.semanticHits(trainVec, benchVec, "id", "vec", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(hits.map(h => (h._1, h._2)) == Set((1L, 100L)))
    val cos = hits.head._3
    assert(cos > 0.99 && cos <= 1.0)
  }

  test("decontaminateSemantic drops flagged docs; zero vectors never match") {
    val kept = decontam.decontaminateSemantic(
        trainVec, benchVec, "id", "vec", tau = 0.9)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // even tau = 0 keeps the zero vector (cos = 0.0 < any positive tau)
    val all = decontam.semanticHits(trainVec, benchVec, "id", "vec", tau = 0.01)
    assert(!all.select("train_id").as[Long].collect().contains(3L))
  }

  test("bloom screen: superset of the exact screen, zero train shuffles") {
    val bloom = decontam.benchGramBloom(bench, "text")
    val exact = decontam.contaminationHits(train, bench, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    val screened = decontam.bloomScreenHits(train, bloom, "text", "doc_id")
    val byBloom = screened.as[(Long, Long)].collect().toMap
    // no false negatives: every exact hit is flagged with >= the count
    exact.foreach { case (id, n) =>
      assert(byBloom.contains(id) && byBloom(id) >= n,
        s"doc $id: bloom ${byBloom.get(id)} < exact $n")
    }
    // on this fixture the FP odds are ~0.2%/gram — the clean doc stays clean
    assert(!byBloom.contains(2L))
    // kernel screen == the exploded executable-spec twin, exactly
    val byExploded = decontam
      .bloomScreenHitsExploded(train, bloom, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(byBloom == byExploded)
    // row-local: the fused kernel screen needs ZERO exchanges — no
    // explode, no per-doc count shuffle; the sketch rides as a literal
    val exchanges = screened.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, s"expected 0 exchanges (row-local screen), got $exchanges")
  }

  test("bloomClean: in-row gate equals the explode screen's complement; runs on a TRUE stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bloom = decontam.benchGramBloom(bench, "text")
    // batch: survivors == docs the audit screen does NOT flag
    val surv = decontam.bloomClean(train, bloom, "text")
      .select("doc_id").as[Long].collect().toSet
    val flagged = decontam.bloomScreenHits(train, bloom, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(surv == train.select("doc_id").as[Long].collect().toSet -- flagged)

    // the SAME call is streaming-legal: stateless row-local filter
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = decontam.bloomClean(
        in.toDF().toDF("doc_id", "text"), bloom, "text")
      .writeStream.format("memory").queryName("graft_bloom_clean")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "intro words alpha bravo charlie delta echo foxtrot golf hotel outro"),
        (2L, "completely unrelated content with no shared phrases at all here now"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_bloom_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == Set(2L), "contaminated doc must be dropped in-stream")
  }

  test("semantic screen broadcasts the bench side — train is never shuffled") {
    val p = decontam.semanticHits(trainVec, benchVec, "id", "vec", 0.9)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      "train side must not shuffle:\n" + p.take(900))
  }

  test("urlHost: scheme-default ports and www stripped, case folded, path ignored") {
    def host(u: String): String =
      Seq(u).toDF("url").select(decontam.urlHost(col("url"))).head().getString(0)
    assert(host("HTTPS://WWW.Example.COM:443/path?q=1#f") == "example.com")
    assert(host("http://example.com:80/") == "example.com")
    assert(host("http://example.com:8080/x") == "example.com:8080") // non-default kept
    assert(host("https://sub.example.com/a") == "sub.example.com")  // hosts, not PSL
    assert(host("not a url") == "")
  }

  test("domainScreen drops train docs sharing a host with the bench set; keeps unparseable") {
    val train = Seq(
      (1L, "https://www.leaky.com/page/1"),
      (2L, "http://LEAKY.com:80/other"),     // same host, different casing/port
      (3L, "https://safe.org/x"),
      (4L, "garbage-no-scheme")              // no provenance -> kept
    ).toDF("doc_id", "url")
    val bench = Seq((100L, "https://leaky.com/eval/questions"))
      .toDF("qid", "url")
    val kept = decontam.domainScreen(train, bench, "url")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // the schema passes through untouched (no helper columns leak)
    assert(decontam.domainScreen(train, bench, "url").columns.toSeq ==
      Seq("doc_id", "url"))
  }
}
