package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.dedup
import graft.streaming.DocIngest

class DocIngestSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("screened streaming ingestion drops corpus near-dups AND cross-batch near-dups") {
    val sigDir = java.nio.file.Files.createTempDirectory("graft-ingest-").toString + "/sigs"
    // seed corpus: one known document, signatures persisted
    val corpus = Seq((100L, boiler)).toDF("doc_id", "text")
    dedup.minhashed(corpus, "text", "doc_id", k = 16, n = 3)
      .write.parquet(sigDir)

    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (epoch, doc_id)
    val q = DocIngest.screened(
        in.toDF().toDF("doc_id", "text"), sigDir,
        "text", "doc_id", threshold = 0.5) { (clean, epoch) =>
      seen.synchronized {
        seen ++= clean.select("doc_id").as[Long].collect().map(epoch -> _)
      }
    }.start()
    try {
      // batch 1: a near-dup of the corpus doc (one word changed) and a
      // genuinely new doc
      in.addData((1L, boiler.replace("dog", "cat")),
        (2L, "completely different content about spark query planning engines"))
      q.processAllAvailable()
      // batch 2: a near-dup of batch 1's SURVIVOR — must be caught by the
      // signatures appended after batch 1
      in.addData((3L, "completely different content about spark query planning systems"))
      q.processAllAvailable()
    } finally q.stop()

    val ids = seen.map(_._2).toSet
    assert(!ids.contains(1L), "corpus near-dup must be screened out")
    assert(ids.contains(2L), "novel doc must survive")
    assert(!ids.contains(3L), "near-dup of an earlier BATCH must be screened out")
    // corpus table grew by exactly the survivor's signature
    val sigIds = spark.read.parquet(sigDir).select("doc_id").as[Long].collect().toSet
    assert(sigIds == Set(100L, 2L))
  }

  test("stateless quality gates (entropy kernel + linear clf) run on a TRUE stream") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val sdf = in.toDF().toDF("doc_id", "text")
    val w = Seq(0.5, -0.25, 0.1, 0.9)
    // pure select/filter shapes — append mode, no state, no watermark:
    // the scan-composable gates screen an ingest stream as-is
    val q1 = graft.ops.text.charEntropy(sdf, "text", "doc_id")
      .writeStream.format("memory").queryName("qual_stream")
      .outputMode("append").start()
    val q2 = graft.ops.text.linearGate(sdf, "text", "doc_id", w)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    try {
      val rows = Seq((1L, "aab"), (2L, "aaaa"), (3L, "the quick brown fox"))
      in.addData(rows)
      q1.processAllAvailable(); q2.processAllAvailable()
      val batchDf = rows.toDF("doc_id", "text")
      val se = spark.table("qual_stream").as[(Long, Long, Double)].collect().toSet
      val be = graft.ops.text.charEntropy(batchDf, "text", "doc_id")
        .as[(Long, Long, Double)].collect().toSet
      assert(se == be && se.nonEmpty)
      val sc = spark.table("clf_stream").as[(Long, Long, Double, Int)].collect().toSet
      val bc = graft.ops.text.linearGate(batchDf, "text", "doc_id", w)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(sc == bc && sc.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }

  test("blocklist gate is streaming-legal: stateless filter on a TRUE stream") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val terms = Seq("bad", "very bad phrase")
    val q = graft.ops.text.blocklistClean(
        in.toDF().toDF("doc_id", "text"), "text", terms)
      .writeStream.format("memory").queryName("blk_stream")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, "a clean document here"),
        (2L, "this one is bad indeed"),       // single-token hit
        (3L, "contains a very bad phrase ok"), // phrase hit
        (4L, "badly is a different word")))    // boundary: survives
      q.processAllAvailable()
      val kept = spark.table("blk_stream").as[(Long, String)]
        .collect().map(_._1).toSet
      assert(kept == Set(1L, 4L), kept.toString)
    } finally q.stop()
  }

  test("cold start: a missing signature table is an empty corpus, created by epoch 0") {
    // No pre-seeding — the path does not exist when the stream starts.
    val sigDir = java.nio.file.Files.createTempDirectory("graft-ingest-").toString + "/sigs"
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = DocIngest.screened(
        in.toDF().toDF("doc_id", "text"), sigDir,
        "text", "doc_id", threshold = 0.5) { (clean, _) =>
      seen.synchronized { seen ++= clean.select("doc_id").as[Long].collect() }
    }.start()
    try {
      in.addData((1L, boiler))
      q.processAllAvailable()
      // the appended epoch-0 signatures must screen THIS near-dup
      in.addData((2L, boiler.replace("dog", "cat")))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.toSet == Set(1L), "epoch 0 passes through; epoch 1 screens against it")
    val sigIds = spark.read.parquet(sigDir).select("doc_id").as[Long].collect().toSet
    assert(sigIds == Set(1L))
  }

  test("urlDeduped: canonical-URL keep-first across batches, bounded state") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val q = DocIngest.urlDeduped(
        in.toDF().toDF("doc_id", "url", "ts"), "url", "ts")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.select("doc_id").as[Long].collect() }
        ()
      }.start()
    try {
      // batch 1: three spellings of ONE page + one distinct page
      in.addData(
        (1L, "HTTPS://WWW.A.com/p?utm_source=x", ts(0)),
        (2L, "https://a.com:443/p#frag", ts(1)),
        (3L, "https://b.com/q", ts(1)))
      q.processAllAvailable()
      // batch 2: yet another spelling of the same page, still within the
      // watermark horizon -> dropped by persisted state, not batch-local;
      // plus two MALFORMED (null-url) records — they must BOTH pass
      // (null is not a dedup key; the first malformed record must not
      // swallow the second)
      in.addData((4L, "https://a.com/p", ts(2)),
        (5L, null.asInstanceOf[String], ts(2)),
        (6L, null.asInstanceOf[String], ts(3)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = out.toSet
    assert(ids.contains(3L), "distinct page must pass")
    assert((ids & Set(1L, 2L)).size == 1, s"exactly one spelling passes: $ids")
    assert(!ids.contains(4L), "cross-batch re-crawl must be dropped")
    assert(ids.contains(5L) && ids.contains(6L),
      s"malformed records bypass the gate, both of them: $ids")
  }

  test("upsertStream emits winner changes only; folded changelog = batch cdcApply") {
    import DocIngest.{DocChange, DocCurrent}
    implicit val sql = spark.sqlContext
    val in = MemoryStream[DocChange]
    val q = DocIngest.upsertStream(in.toDS())
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").start()
    val changes = scala.collection.mutable.ArrayBuffer[DocChange]()
    def push(cs: DocChange*): Unit = {
      changes ++= cs; in.addData(cs); q.processAllAvailable()
    }
    try {
      push(DocChange(1L, 1L, "upsert", "v1"),
        DocChange(2L, 1L, "upsert", "w1"))
      push(DocChange(1L, 3L, "upsert", "v2"), // newer → emit
        DocChange(2L, 1L, "upsert", "w1"))    // replay → silent
      push(DocChange(1L, 2L, "upsert", "vStale"), // out of order → silent
        DocChange(2L, 2L, "delete", "w1"),        // tombstone → emit
        DocChange(3L, 1L, "upsert", "x1"))
      // stale upsert must NOT resurrect the tombstoned key
      push(DocChange(2L, 1L, "upsert", "wGhost"))
    } finally q.stop()

    val emitted = spark.table("cdc_stream").as[DocCurrent].collect().toSeq
    // per key, fold latest-emitted and drop tombstones
    val folded = emitted.groupBy(_.doc_id).view
      .mapValues(_.maxBy(_.ts)).values.filterNot(_.deleted)
      .map(c => (c.doc_id, c.text)).toSet
    // batch twin over the SAME change log applied to an empty snapshot
    val snap = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val applied = graft.ops.rel.cdcApply(snap,
        changes.toSeq.toDF("doc_id", "ts", "op", "text"), "doc_id", "ts", "op")
      .as[(Long, String)].collect().toSet
    assert(folded == applied, s"stream $folded != batch $applied")
    assert(folded == Set((1L, "v2"), (3L, "x1")))
    // emission discipline: replays and stale changes produced no rows
    assert(emitted.count(_.doc_id == 1L) == 2, "id 1: v1 then v2 only")
    assert(emitted.count(_.doc_id == 2L) == 2, "id 2: w1 then tombstone only")
  }

  test("quotaGate: per-source lifetime cap across batches, deterministic admit order") {
    import DocIngest.SourceDoc
    implicit val sql = spark.sqlContext
    val in = MemoryStream[SourceDoc]
    val q = DocIngest.quotaGate(in.toDS(), maxPerSource = 3)
      .writeStream.format("memory").queryName("quota_stream")
      .outputMode("append").start()
    try {
      // batch 1: source a sends 5 (only lowest 3 ids admitted), b sends 1
      in.addData((1 to 5).map(i => SourceDoc("a", i.toLong, s"a$i")) :+
        SourceDoc("b", 10L, "b10"))
      q.processAllAvailable()
      // batch 2: a is exhausted (all dropped); b admits 2 more then drops
      in.addData(Seq(SourceDoc("a", 6L, "a6"), SourceDoc("b", 11L, "b11"),
        SourceDoc("b", 12L, "b12"), SourceDoc("b", 13L, "b13")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quota_stream").as[SourceDoc].collect()
      .map(d => (d.source, d.doc_id)).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 11L), ("b", 12L)), got.toString)
  }

  test("quotaGate: hot source in one skewed batch — bounded heap admits the sorted prefix") {
    // One source floods a single micro-batch with 50k docs in descending
    // id order (worst case for a bounded k-smallest heap: every element
    // displaces the current worst). The gate must admit exactly the k
    // lowest (doc_id, text) — identical to a full sort's prefix — while
    // holding only O(k) per-group memory (the heap never sees more than
    // `room` elements at once; the old full-sort buffered all 50k).
    import DocIngest.SourceDoc
    implicit val sql = spark.sqlContext
    val in = MemoryStream[SourceDoc]
    val q = DocIngest.quotaGate(in.toDS(), maxPerSource = 7)
      .writeStream.format("memory").queryName("quota_skew_stream")
      .outputMode("append").start()
    try {
      in.addData((50000 to 1 by -1).map(i =>
        SourceDoc("hot", i.toLong, s"d$i")) :+ SourceDoc("cold", 99L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quota_skew_stream").as[SourceDoc].collect()
    assert(got.filter(_.source == "hot").map(_.doc_id).sorted.toSeq ==
      (1L to 7L), got.filter(_.source == "hot").mkString(", "))
    assert(got.count(_.source == "cold") == 1)
  }
}
