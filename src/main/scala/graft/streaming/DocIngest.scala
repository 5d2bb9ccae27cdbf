package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.dedup

/** Streaming document ingestion with near-duplicate screening — the
  * production loop around [[dedup.incrementalNearDups]]: documents
  * arrive as a stream, each micro-batch is screened against the
  * PERSISTED corpus signature table, survivors go to the caller's sink,
  * and the survivors' own signatures are appended so the very next
  * batch screens against them too (cross-batch dedup, not just
  * batch-vs-history).
  */
object DocIngest {

  /** Build the screened writer. Start it with `.start(...)` /
    * `.trigger(...)` as usual; `sink` receives each epoch's CLEAN rows.
    *
    * Scale/semantics notes:
    *   - The corpus table never re-reads raw text: only the thin
    *     signature table (`id, grams, sig`) is scanned per batch, and
    *     the BATCH side of the band join broadcasts
    *     ([[dedup.incrementalNearDups]]) — per-batch cost is
    *     O(corpus signatures) scan + broadcast-joins, no corpus
    *     self-pairing, no shuffle of the corpus.
    *   - The batch is persisted for the duration of the epoch: it feeds
    *     the dup screen, the sink, and the signature append — without
    *     the persist each action would recompute (and a source like
    *     Kafka would re-read) the micro-batch.
    *   - Delivery is the usual foreachBatch contract: on retry an epoch
    *     can run twice, so `sink` should write idempotently (e.g. keyed
    *     by `epoch`) — and a replayed signature append only re-adds
    *     signatures that deduplicate downstream by id.
    *   - Cold start: a not-yet-existing `corpusSigsPath` is an empty
    *     corpus, not an error — the first epoch screens nothing, passes
    *     everything, and its signature append creates the table.
    *   - In-batch duplicates: rows of the SAME batch that near-dup each
    *     other both survive (screening is batch-vs-corpus); they are
    *     separated one batch later at most. Callers needing in-batch
    *     dedup run [[dedup.minhashNearDupPairs]] inside `sink`. */
  def screened(
      docs: DataFrame,
      corpusSigsPath: String,
      textCol: String,
      idCol: String,
      threshold: Double,
      k: Int = 16,
      bands: Int = 8,
      n: Int = 3)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      batch.persist()
      try {
        // snapshot of the signature table as of batch start (the read
        // lists files eagerly, so this epoch's append is not visible to
        // its own screen). A missing table is an EMPTY corpus, not an
        // error: the first epoch of a fresh pipeline has nothing to
        // screen against and must not require a pre-seeded path — it
        // passes everything through and CREATES the table via its own
        // signature append below.
        val corpus =
          try Some(spark.read.parquet(corpusSigsPath))
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" => None
          }
        val clean = corpus match {
          case Some(c) =>
            val dupIds = dedup.incrementalNearDups(
                batch, c, textCol, idCol, threshold, k, bands, n)
              .select(col("new_id").as(idCol)).distinct()
            batch.join(dupIds, Seq(idCol), "left_anti").persist()
          case None => batch.persist()
        }
        try {
          sink(clean, epoch)
          dedup.minhashed(clean, textCol, idCol, k, n)
            .write.mode("append").parquet(corpusSigsPath)
        } finally clean.unpersist()
      } finally batch.unpersist()
    }
  }

  /** Streaming URL-keyed keep-first gate — the crawl FRONT DOOR, run
    * before any content even downloads: each arriving record keys on
    * the CANONICAL URL ([[graft.ops.text.normalizeUrl]] — tracking
    * params, host case, fragments collapse) and only the first
    * occurrence within the watermark horizon passes. State is BOUNDED:
    * `dropDuplicatesWithinWatermark` evicts a URL's key once the
    * watermark passes its event time (plain `dropDuplicates` would
    * accumulate one state row per distinct URL forever — unbounded on a
    * crawl). A re-crawl arriving AFTER eviction passes again by design:
    * that is the recrawl-cadence knob, and the batch [[graft.ops.dedup
    * .urlDedup]] over the landed corpus is the exact backfill twin.
    * Output carries `norm_url` so downstream sinks can key on it.
    *
    * Null-URL records are MALFORMED, not duplicates of one another:
    * `dropDuplicates*` treats null as an equal key, so keying them
    * would let the first malformed record swallow every later one.
    * They bypass the gate (norm_url = null in the output) for the
    * caller to quarantine — silent row loss is an ingestion
    * anti-pattern. */
  def urlDeduped(
      docs: DataFrame,
      urlCol: String,
      tsCol: String,
      delay: String = "10 minutes"): DataFrame = {
    val keyed = docs
      .withColumn("norm_url", graft.ops.text.normalizeUrl(col(urlCol)))
      .withWatermark(tsCol, delay)
    keyed.where(col("norm_url").isNotNull)
      .dropDuplicatesWithinWatermark("norm_url")
      .unionByName(keyed.where(col("norm_url").isNull))
  }

  /** One CDC change record: `ts` is the log sequence (strictly
    * increasing per key), `op` is "delete" or anything-else-is-upsert
    * — the [[graft.ops.rel.cdcApply]] contract. */
  final case class DocChange(doc_id: Long, ts: Long, op: String, text: String)

  /** The current winner for a key, as emitted by [[upsertStream]].
    * `deleted` rows are tombstones — the downstream materializer drops
    * the key. */
  final case class DocCurrent(doc_id: Long, ts: Long, deleted: Boolean, text: String)

  /** Streaming keep-LATEST (CDC upsert) — the unbounded twin of the
    * batch [[graft.ops.rel.cdcApply]]: per key, track the
    * highest-`ts` change seen and emit a row WHENEVER THE WINNER
    * CHANGES (a changelog of the applied state, tombstones included).
    * Folding the emitted changelog latest-per-key and dropping
    * tombstones equals `cdcApply(empty, allChanges)` — the
    * batch/stream agreement law DocIngestSpec pins.
    *
    *   - Out-of-order and replayed changes are ABSORBED, not re-emitted:
    *     a change with `ts` ≤ the state's is stale by the CDC contract
    *     (ts is the log sequence) and produces no output — which is what
    *     makes the emitted changelog idempotent under at-least-once
    *     delivery upstream.
    *   - State is one `(ts, deleted, text)` per live key, keyed and
    *     hash-partitioned by doc_id — O(corpus keys), the floor for
    *     exact keep-latest. A tombstoned key keeps its (tiny) state so a
    *     late stale upsert cannot resurrect it; bound the horizon
    *     upstream (e.g. compaction dropping tombstones older than the
    *     replay window) when keys churn forever. */
  final case class SourceDoc(source: String, doc_id: Long, text: String)
  final case class QuotaState(admitted: Long)

  /** Per-source ingestion QUOTA gate — the crawl front door that stops
    * one domain from flooding an epoch's corpus (the C4/RefinedWeb
    * per-domain cap, as a stream): admit at most `maxPerSource`
    * documents per source over the stream's lifetime, drop the rest.
    * State per source is ONE counter — `flatMapGroupsWithState` keyed by
    * source, constant memory per key, no timeout (a lifetime budget; run
    * per epoch and restart the query to reset, or wrap with a window
    * upstream for rolling quotas).
    *
    * Within one micro-batch the group's slice admits in (doc_id, text)
    * order, so replaying the same batches reproduces the same admitted
    * set — the determinism contract everything in this module keeps.
    * The selection is a size-`room` bounded heap (k-smallest by
    * (doc_id, text)), NOT a full sort of the group's slice: a hot source
    * in a large micro-batch would otherwise buffer its whole slice in
    * executor memory. Memory is O(min(room, slice)) regardless of how
    * skewed the batch is; the admitted set is identical to the sorted
    * prefix. */
  def quotaGate(
      docs: org.apache.spark.sql.Dataset[SourceDoc],
      maxPerSource: Long): org.apache.spark.sql.Dataset[SourceDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    require(maxPerSource >= 1,
      s"graft: quotaGate needs maxPerSource >= 1, got $maxPerSource")
    docs.groupByKey(_.source).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: String, it: Iterator[SourceDoc], state: GroupState[QuotaState]) =>
        val used = state.getOption.map(_.admitted).getOrElse(0L)
        val room = math.min((maxPerSource - used).max(0L),
          Int.MaxValue.toLong).toInt
        // k-smallest by (doc_id, text) via a bounded max-heap: keep the
        // `room` best seen so far, evicting the current worst.
        val worstFirst = Ordering.by[SourceDoc, (Long, String)](
          d => (d.doc_id, d.text))
        val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
        if (room > 0) it.foreach { d =>
          if (heap.size < room) heap.enqueue(d)
          else if (worstFirst.lt(d, heap.head)) { heap.dequeue(); heap.enqueue(d) }
        }
        val admitted = heap.dequeueAll.reverse // ascending (doc_id, text)
        state.update(QuotaState(used + admitted.size))
        admitted.iterator
    }
  }

  def upsertStream(
      changes: org.apache.spark.sql.Dataset[DocChange])
      : org.apache.spark.sql.Dataset[DocCurrent] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import changes.sparkSession.implicits._
    changes.groupByKey(_.doc_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (id: Long, it: Iterator[DocChange], state: GroupState[DocCurrent]) =>
        // winner of THIS batch's slice for the key (ts unique per key
        // by the CDC contract; (ts, op, text) tiebreak keeps even a
        // violated contract deterministic)
        val incoming = it.maxBy(c => (c.ts, c.op, c.text))
        val cur = state.getOption
        if (cur.forall(_.ts < incoming.ts)) {
          val next = DocCurrent(id, incoming.ts,
            incoming.op == "delete", incoming.text)
          state.update(next)
          Iterator.single(next)
        } else Iterator.empty
    }
  }
}
