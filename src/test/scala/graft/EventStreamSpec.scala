package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val batch = Seq(
    (1L, ts("2024-01-01 00:01:00"), 7L, "click", 1.5, """{"k": 1}"""),
    (2L, ts("2024-01-01 00:03:30"), 7L, "click", 2.5, """{"k": 60}"""),
    (3L, ts("2024-01-01 00:06:00"), 8L, "view", 4.0, """{"k": 90}"""),
    (4L, ts("2024-01-01 01:00:00"), 7L, "click", 8.0, """{"k": 30}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("windowedAgg (batch): 5-minute tumbling windows per type") {
    val r = EventStream.windowedAgg(batch).orderBy("window_start", "event_type")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(("00:00", "click", 2L, 4.0), ("00:05", "view", 1L, 4.0),
      ("01:00", "click", 1L, 8.0)))
  }

  test("windowedAgg runs as a REAL stream (watermark + complete mode) and matches batch") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.windowedAgg(sdf, watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("win_agg")
        .select(date_format(col("window_start"), "HH:mm"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == Set(("00:00", "click", 2L, 4.0), ("00:05", "view", 1L, 4.0),
        ("01:00", "click", 1L, 8.0)))
    } finally q.stop()
  }

  test("calibrationStream: streamed reliability grid equals batch; ece finishes") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val prob = (graft.functions.hashing.h32(col("user_id").cast("string"))
      % 1000001L)
    val label = col("event_type") === "click"
    val q = EventStream.calibrationStream(sdf, prob, label,
        windowDur = "1 hour", bins = 4)
      .writeStream.format("memory").queryName("cal_grid")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)]
        .collect().toSeq)
      q.processAllAvailable()
      val key = (d: org.apache.spark.sql.DataFrame) => d
        .select(date_format(col("win.start"), "HH:mm").as("w"), col("bin"),
          col("n"), col("pos"), col("conf_sum"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val streamed = key(spark.table("cal_grid"))
      val batched = key(EventStream.calibrationStream(batch, prob, label,
        windowDur = "1 hour", bins = 4))
      assert(streamed == batched && streamed.nonEmpty,
        s"stream=$streamed batch=$batched")
      // finish step: per-window ECE from the sink snapshot
      val ece = graft.ops.evals.eceFrom(
        spark.table("cal_grid")
          .withColumn("w", date_format(col("win.start"), "HH:mm"))
          .drop("win"),
        Seq("w")).orderBy("w").collect()
      assert(ece.length == 2 && ece.forall(r => r.getLong(2) >= 0L
        && r.getLong(2) <= 1000000L), ece.mkString(","))
    } finally q.stop()
  }

  test("winRateStream: streamed win-rate grid equals batch; finish yields conventions") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = graft.functions.hashing.h32(
      concat(col("user_id").cast("string"), lit("a"))) % 1000L
    val b = graft.functions.hashing.h32(
      concat(col("user_id").cast("string"), lit("b"))) % 1000L
    val q = EventStream.winRateStream(sdf, a, b, windowDur = "1 hour")
      .writeStream.format("memory").queryName("wr_grid")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)]
        .collect().toSeq)
      q.processAllAvailable()
      val key = (d: org.apache.spark.sql.DataFrame) => d
        .select(date_format(col("win.start"), "HH:mm").as("w"),
          col("n"), col("wins"), col("ties"), col("losses"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val streamed = key(spark.table("wr_grid"))
      val batched = key(EventStream.winRateStream(batch, a, b,
        windowDur = "1 hour"))
      assert(streamed == batched && streamed.nonEmpty,
        s"stream=$streamed batch=$batched")
      // finish step: the sink snapshot folds to the winRate conventions
      val wr = graft.ops.evals.winRateFrom(
        spark.table("wr_grid")
          .withColumn("w", date_format(col("win.start"), "HH:mm")).drop("win"),
        Seq("w")).orderBy("w").collect()
      assert(wr.nonEmpty && wr.forall { r =>
        r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4) &&
          r.getLong(5) >= 0L && r.getLong(5) <= 1000000L
      }, wr.mkString(","))
    } finally q.stop()
  }

  test("histDriftStream: streamed bin grid equals batch; psiFrom finishes a snapshot") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cents = floor(col("value") * 100.0).cast("long")
    val q = EventStream.histDriftStream(sdf, cents, binWidth = 200L,
        windowDur = "1 hour")
      .writeStream.format("memory").queryName("hist_grid")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)]
        .collect().toSeq)
      q.processAllAvailable()
      val key = (d: org.apache.spark.sql.DataFrame) => d
        .select(date_format(col("win.start"), "HH:mm").as("w"),
          col("bin"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      val streamed = key(spark.table("hist_grid"))
      val batched = key(EventStream.histDriftStream(batch, cents,
        binWidth = 200L, windowDur = "1 hour"))
      assert(streamed == batched && streamed.nonEmpty,
        s"stream=$streamed batch=$batched")
      // finish step: score each window's snapshot against the first
      // window's grid; every PSI is finite and the self-window reads 0
      val snap = spark.table("hist_grid")
        .withColumn("w", date_format(col("win.start"), "HH:mm")).drop("win")
      val w0 = snap.orderBy("w").select("w").head().getString(0)
      val ref = snap.where(col("w") === w0).select("bin", "n")
      val psi = graft.ops.sample.psiFrom(ref, snap, Seq("w"))
        .orderBy("w").collect()
      assert(psi.nonEmpty && psi.head.getDouble(3) == 0.0,
        s"reference window scores 0 against itself: ${psi.mkString(",")}")
      assert(psi.forall(_.getDouble(3) >= 0.0), psi.mkString(","))
    } finally q.stop()
  }

  test("cusumStream: finished sink snapshot equals batch cusum (stream==batch law)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // a denser series across minutes: 60-second buckets, volume ramps up
    val events = (0 until 40).map { i =>
      (i.toLong, ts(f"2024-01-01 00:${i / 4}%02d:${(i % 4) * 15}%02d"),
        7L, "click", 1.0, "{}")
    }
    val edf = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.cusumStream(sdf, bucketSec = 60L)
      .writeStream.format("memory").queryName("cusum_grid")
      .outputMode("complete").start()
    try {
      mem.addData(events)
      q.processAllAvailable()
      val snap = spark.table("cusum_grid")
      // stream grid == batch grid (same bucket ids, same counts)
      val batchGrid = edf
        .select(expr("(unix_micros(ts) DIV 1000000) DIV 60").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("x"))
        .as[(Long, Long)].collect().toSet
      assert(snap.as[(Long, Long)].collect().toSet == batchGrid)
      // finishing the snapshot == batch cusum on the same events
      val key = (d: org.apache.spark.sql.DataFrame) => d
        .select("bucket", "x", "s_scaled", "alarm")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      val finished = key(EventStream.cusumFrom(snap, refN = 3,
        slack = 1L, threshold = 5L))
      val batched = key(EventStream.cusum(edf, bucketSec = 60L, refN = 3,
        slack = 1L, threshold = 5L))
      assert(finished == batched && finished.nonEmpty,
        s"finished=$finished batch=$batched")
      // merge-by-addition: a snapshot split into two halves re-folds to
      // the same statistic (the sink restart/backfill contract)
      val split = snap.select(col("bucket"), (col("x") - 1L).as("x"))
        .unionByName(snap.select(col("bucket"), lit(1L).as("x")))
      assert(key(EventStream.cusumFrom(split, refN = 3,
        slack = 1L, threshold = 5L)) == batched)
      // the SAME grid contract finishes into the Holt statistic too:
      // holtFrom(stream snapshot) == batch holtLinear, and the
      // merge-by-addition law holds for it as well
      val hkey = (d: org.apache.spark.sql.DataFrame) => d
        .select("bucket", "x", "level_fp", "trend_fp")
        .as[(Long, Long, Long, Long)].collect().toSet
      val hFinished = hkey(EventStream.holtFrom(snap))
      val hBatched = hkey(EventStream.holtLinear(edf, bucketSec = 60L))
      assert(hFinished == hBatched && hFinished.nonEmpty)
      assert(hkey(EventStream.holtFrom(split)) == hBatched)
      // ... and into Holt-Winters (seasonal ring included), same laws
      val wkey = (d: org.apache.spark.sql.DataFrame) => d
        .select("bucket", "x", "level_fp", "trend_fp", "season_fp")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val wFinished = wkey(EventStream.holtWintersFrom(snap, period = 3))
      val wBatched = wkey(EventStream.holtWinters(edf, bucketSec = 60L,
        period = 3))
      assert(wFinished == wBatched && wFinished.nonEmpty)
      assert(wkey(EventStream.holtWintersFrom(split, period = 3)) == wBatched)
      // ... and the descriptive grid meters: classical decomposition and
      // the median/MAD flag finish from the same snapshot contract
      val dkey = (d: org.apache.spark.sql.DataFrame) => d
        .select("bucket", "x", "trend_q6", "seasonal_q6", "remainder_q6")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val dBatched = dkey(EventStream.decompose(edf, bucketSec = 60L,
        period = 3))
      assert(dkey(EventStream.decomposeFrom(snap, period = 3)) == dBatched)
      assert(dkey(EventStream.decomposeFrom(split, period = 3)) == dBatched)
      val zkey = (d: org.apache.spark.sql.DataFrame) => d
        .select("bucket", "x", "med", "mad", "flag")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val zBatched = zkey(EventStream.robustZ(edf, bucketSec = 60L))
      assert(zkey(EventStream.robustZFrom(snap)) == zBatched)
      assert(zkey(EventStream.robustZFrom(split)) == zBatched)
    } finally q.stop()
  }

  test("driftCard: streamed snapshot card == batch card; self-window reads (0, 0, 0)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cents = floor(col("value") * 100.0).cast("long")
    val q = EventStream.histDriftStream(sdf, cents, binWidth = 200L,
        windowDur = "1 hour")
      .writeStream.format("memory").queryName("drift_card_grid")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)]
        .collect().toSeq)
      q.processAllAvailable()
      // the full fit->finish card off a grid: first window is the
      // pinned reference, all three readouts join per window
      def card(grid: org.apache.spark.sql.DataFrame) = {
        val snap = grid
          .withColumn("w", date_format(col("win.start"), "HH:mm")).drop("win")
        val w0 = snap.orderBy("w").select("w").head().getString(0)
        val ref = snap.where(col("w") === w0).select("bin", "n")
        graft.ops.sample.driftCard(ref, snap, Seq("w"), binWidth = 200L)
          .orderBy("w")
          .as[(String, Long, Long, Long, Double, Double, Double)]
          .collect().toSeq
      }
      val streamed = card(spark.table("drift_card_grid"))
      val batched = card(EventStream.histDriftStream(batch, cents,
        binWidth = 200L, windowDur = "1 hour"))
      assert(streamed == batched && streamed.nonEmpty,
        s"stream=$streamed batch=$batched")
      // the reference window scored against itself: PSI = KS = EMD = 0
      val self = streamed.head
      assert(self._5 == 0.0 && self._6 == 0.0 && self._7 == 0.0,
        s"self-window must read a zero card, got $self")
    } finally q.stop()
  }

  test("windowedAgg APPEND mode: watermark closes windows; LATE data is dropped, not counted") {
    // The complete-mode test above checks values; this one checks the
    // EVICTION contract bounded state depends on: a window only emits
    // once the watermark passes its end, and an event arriving behind
    // the watermark never mutates an already-closed window.
    implicit val sql = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.windowedAgg(sdf, watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_agg_append")
      .outputMode("append").start()
    try {
      // batch 1: one event in [00:00, 00:05), one at 00:20 that will
      // push the watermark to 00:10 at batch end
      mem.addData(Seq(
        (1L, ts("00:00:30"), 1L, "click", 1.0, ""),
        (2L, ts("00:20:00"), 1L, "click", 2.0, "")))
      q.processAllAvailable()
      // batch 2: a LATE event for the (about-to-close) first window —
      // behind the 00:10 watermark, must be dropped — plus a fresh event
      // that advances the watermark to 00:30
      mem.addData(Seq(
        (3L, ts("00:01:00"), 1L, "click", 100.0, ""),
        (4L, ts("00:40:00"), 1L, "click", 4.0, "")))
      q.processAllAvailable()
      // batch 3: advance once more so the 00:20 window closes too
      mem.addData(Seq((5L, ts("01:00:00"), 1L, "click", 8.0, "")))
      q.processAllAvailable()
      val got = spark.table("win_agg_append")
        .select(date_format(col("window_start"), "HH:mm"),
          col("n_events"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      // 00:00 window emitted WITHOUT the late 100.0; 00:20 and 00:40
      // windows closed by later watermarks; 01:00 still open (absent)
      assert(got == Set(("00:00", 1L, 1.0), ("00:20", 1L, 2.0),
        ("00:40", 1L, 4.0)), got.toString)
    } finally q.stop()
  }

  test("intervalJoin (batch) agrees with the oracle-checked rangeJoin on real events") {
    val e = SparkEntry.events(spark, "/root/testdata/sf0.001")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.where(col("event_type") === "click")
    val viaInterval = EventStream.intervalJoin(purchases, clicks,
        rightCols = Seq("event_id"), lookbackMinutes = 30)
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val viaRange = graft.ops.asof.rangeJoin(purchases,
        e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id")),
        Seq("user_id"), "ts", lowerUs = -30L * 60 * 1000000, upperUs = 0L,
        Seq("click_id"))
      .select(col("event_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet
    assert(viaInterval == viaRange && viaInterval.nonEmpty)
  }

  test("intervalJoin runs as a TRUE stream-stream join with bounded state") {
    implicit val sql = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, Long)]
    val rMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val l = lMem.toDF.toDF("event_id", "ts", "user_id")
    val r = rMem.toDF.toDF("event_id", "ts", "user_id", "value")
    val joined = EventStream.intervalJoin(l, r,
      rightCols = Seq("event_id", "value"), lookbackMinutes = 10,
      watermark = Some("5 minutes"))
    val q = joined.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    try {
      // purchase at 00:20 on user 7; clicks at 00:12 (in window), 00:05
      // (outside the 10-min lookback), and user 8 at 00:15 (wrong key)
      rMem.addData(Seq(
        (101L, ts("2024-01-01 00:05:00"), 7L, 1.0),
        (102L, ts("2024-01-01 00:12:00"), 7L, 2.0),
        (103L, ts("2024-01-01 00:15:00"), 8L, 3.0)))
      lMem.addData(Seq((1L, ts("2024-01-01 00:20:00"), 7L)))
      q.processAllAvailable()
      val got = spark.table("ij_stream")
        .select(col("event_id"), col("r_event_id"), col("r_value"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 102L, 2.0)))
      // the physical plan is a genuine two-stream symmetric hash join
      val plan = q.lastProgress.sources.length
      assert(plan == 2, "both sides must be streaming sources")
    } finally q.stop()
  }

  test("sessionize: 30-minute gaps split sessions; stats per session") {
    val r = EventStream.sessionize(batch, gapMinutes = 30)
      .orderBy("user_id", "session_idx")
      .select(col("user_id"), col("session_idx"), col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // user 7: events at 00:01/00:03 (one session), 01:00 (new session); user 8: one
    assert(r == Seq((7L, 1L, 2L, 4.0), (7L, 2L, 1L, 8.0), (8L, 1L, 1L, 4.0)))
  }

  test("stateful streaming sessionization closes sessions on in-stream gaps") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "value")
      .as[EventStream.SessionEvent]
    val q = EventStream.sessionizeStream(sdf, gapMinutes = 30, useTimeout = false)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // user 7: two events 2.5 min apart, then a 56.5-min gap closes the
      // first session when the third event arrives
      mem.addData(Seq(
        (7L, ts("2024-01-01 00:01:00"), 1.5),
        (7L, ts("2024-01-01 00:03:30"), 2.5)))
      q.processAllAvailable()
      mem.addData(Seq((7L, ts("2024-01-01 01:00:00"), 8.0)))
      q.processAllAvailable()
      val closed = spark.table("sess_stream")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSeq
      // only the FIRST session is closed (second still open in state)
      assert(closed == Seq((7L, 2L, 4.0)))
    } finally q.stop()
  }

  test("streaming keep-first dedup agrees with the batch window-rank form") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = EventStream.dedupKeepFirstStream(sdf)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // in-event-time order: dup of (7, click) and (8, view) arrive later
      val rows = Seq(
        (7L, ts("2024-01-01 00:01:00"), "click", 1.0),
        (8L, ts("2024-01-01 00:02:00"), "view", 2.0),
        (7L, ts("2024-01-01 00:03:00"), "click", 3.0),
        (7L, ts("2024-01-01 00:04:00"), "view", 4.0),
        (8L, ts("2024-01-01 00:05:00"), "view", 5.0))
      mem.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("dedup_stream")
        .select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
      // batch twin: first event per (user_id, event_type) by ts
      import org.apache.spark.sql.expressions.Window
      val batchFirst = rows.toDF("user_id", "ts", "event_type", "value")
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("user_id"), col("event_type")).orderBy(col("ts"))))
        .where(col("rn") === 1)
        .select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(streamed == batchFirst)
      assert(streamed == Set((7L, "click", 1.0), (8L, "view", 2.0), (7L, "view", 4.0)))
    } finally q.stop()
  }

  test("funnel: steps must follow in event time, not merely co-occur") {
    val rows = Seq(
      // A: full ordered funnel
      (1L, ts("2024-01-01 00:01:00"), "view", 0.0),
      (1L, ts("2024-01-01 00:02:00"), "click", 0.0),
      (1L, ts("2024-01-01 00:03:00"), "purchase", 0.0),
      // B: click BEFORE view -> step 2 not reached (co-occurrence isn't a funnel)
      (2L, ts("2024-01-01 00:01:00"), "click", 0.0),
      (2L, ts("2024-01-01 00:02:00"), "view", 0.0),
      // C: view then click, no purchase
      (3L, ts("2024-01-01 00:01:00"), "view", 0.0),
      (3L, ts("2024-01-01 00:02:00"), "click", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventStream.funnel(rows, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("propInt extracts typed JSON props") {
    val ks = batch.select(EventStream.propInt("k").as("k")).as[Int].collect().toSeq
    assert(ks == Seq(1, 60, 90, 30))
  }

  test("rollingAgg: trailing RANGE frame is inclusive at windowSec-1, ties share a frame") {
    val rows = Seq(
      // user 7: 00:00:00, 00:59:59 (3599 s later — inside the trailing
      // hour), 01:00:00 (3600 s after the first — outside its frame),
      // plus a same-second tie at 01:00:00.
      (1L, ts("2024-01-01 00:00:00"), 7L, 1.0),
      (2L, ts("2024-01-01 00:59:59"), 7L, 2.0),
      (3L, ts("2024-01-01 01:00:00"), 7L, 4.0),
      (4L, ts("2024-01-01 01:00:00"), 7L, 8.0),
      (5L, ts("2024-01-01 00:30:00"), 8L, 16.0) // other user: frames never cross
    ).toDF("event_id", "ts", "user_id", "value")
    val r = EventStream.rollingAgg(rows, windowSec = 3600)
      .select("event_id", "mov_n", "mov_sum_micros")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 1L, 1000000L),
      (2L, 2L, 3000000L),          // includes event 1 (3599 s back)
      (3L, 3L, 14000000L),         // tie peer 4 shares the frame (RANGE)
      (4L, 3L, 14000000L),         // ... and event 1 has aged out
      (5L, 1L, 16000000L)))
  }

  test("ewma: dyadic recency weights over the last k events, id tiebreak, per-user frames") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:01:00"), 7L, 1.0),
      (2L, ts("2024-01-01 00:02:00"), 7L, 2.0),
      (3L, ts("2024-01-01 00:03:00"), 7L, 4.0),
      (4L, ts("2024-01-01 00:04:00"), 7L, 8.0),
      // user 8: same-second tie — event_id orders the frame
      (5L, ts("2024-01-01 00:05:00"), 8L, 1.0),
      (6L, ts("2024-01-01 00:05:00"), 8L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val r = EventStream.ewma(rows, k = 3)
      .select("event_id", "ewma_n", "ewma")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 1L, 1.0),               // single event: ewma = value
      (2L, 2L, 1.6667),            // (1 + 2·2)/3 = 5/3, half-up 4dp
      (3L, 3L, 3.0),               // (1 + 2·2 + 4·4)/7 = 21/7
      (4L, 3L, 6.0),               // frame slid: (2 + 2·4 + 4·8)/7 = 42/7
      (5L, 1L, 1.0),               // tie ordered by id: 5 first...
      (6L, 2L, 3.0)))              // ...then (1 + 2·4)/3 = 3
    // recency-weighted: after the jump to 8.0 the EWMA (6.0) sits above
    // the uniform mean of the same frame ((2+4+8)/3 = 4.67)
  }

  test("enrichStream: static dim broadcast onto a true stream; misses pass through") {
    implicit val sql = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "trial")).toDF("user_id", "segment")
    val mem = MemoryStream[(Long, Long, Double)]
    val q = EventStream.enrichStream(
        mem.toDF().toDF("event_id", "user_id", "value"), dim, "user_id")
      .writeStream.format("memory").queryName("graft_enriched")
      .outputMode("append").start()
    try {
      mem.addData((1L, 7L, 1.0), (2L, 9L, 2.0)) // user 9 has no dim row
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("graft_enriched")
      .select("event_id", "segment")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("gold"), 2L -> None))
  }

  test("windowedAgg sliding: each event lands in len/slide overlapping windows") {
    val r = EventStream.windowedAgg(batch, windowLen = "10 minutes",
        slide = Some("5 minutes"))
      .orderBy("window_start", "event_type")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_events"))
      .as[(String, String, Long)].collect().toSeq
    // events at 00:01, 00:03:30 (clicks), 00:06 (view), 01:00 (click)
    assert(r == Seq(
      ("23:55", "click", 2L),            // 23:55-00:05 catches both early clicks
      ("00:00", "click", 2L), ("00:00", "view", 1L),
      ("00:05", "view", 1L),
      ("00:55", "click", 1L), ("01:00", "click", 1L)))
  }

  test("transitions: per-user consecutive pairs, exact integer shares") {
    val rows = Seq(
      // user 7: view -> click -> view   user 8: view -> view
      (1L, ts("2024-01-01 00:01:00"), 7L, "view"),
      (2L, ts("2024-01-01 00:02:00"), 7L, "click"),
      (3L, ts("2024-01-01 00:03:00"), 7L, "view"),
      (4L, ts("2024-01-01 00:01:00"), 8L, "view"),
      (5L, ts("2024-01-01 00:02:00"), 8L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = EventStream.transitions(rows)
      .orderBy("prev_type", "event_type")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("click", "view", 1L, 10000L),       // click's only exit
      ("view", "click", 1L, 5000L),        // view exits split 1/1
      ("view", "view", 1L, 5000L)))
  }

  test("transitions never pair events across users") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:02:00"), 2L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    assert(EventStream.transitions(rows).count() == 0)
  }

  test("rollingZScore: hand-computed z over exact window moments; zero variance is null") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, 1.0),
      (2L, ts("2024-01-01 00:10:00"), 7L, 2.0),
      (3L, ts("2024-01-01 00:20:00"), 7L, 4.0),
      (4L, ts("2024-01-01 00:00:00"), 8L, 5.0),  // constant-value user
      (5L, ts("2024-01-01 00:10:00"), 8L, 5.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val z = EventStream.rollingZScore(rows, windowSec = 3600)
      .select("event_id", "z")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(z(1L).isEmpty, "single-event window has no variance")
    assert(z(2L).contains(1.0))        // (2*2000-3000)/sqrt(2*5e6-9e6) = 1000/1000
    assert(z(3L).contains(1.3363))     // 5000/sqrt(1.4e7), quantized 4dp
    assert(z(4L).isEmpty && z(5L).isEmpty, "zero variance must be null, not inf")
  }

  test("hllStream: live register state matches the batch sketch bit-for-bit") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF.toDF("user_id", "event_type")
    val q = EventStream.hllStream(sdf, col("user_id"), Seq("event_type"), p = 6)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val b1 = (0 until 300).map(u => (u.toLong, "view")) ++
        (0 until 40).map(u => (u.toLong, "click"))
      val b2 = (200 until 600).map(u => (u.toLong, "view")) // overlap ratchets
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("hll_stream")
      val batch = graft.ops.sketch.hllRegisters(
        (b1 ++ b2).toDF("user_id", "event_type"),
        col("user_id"), Seq("event_type"), p = 6)
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream state after n events == batch sketch of those n events")
      // state is bounded: <= 2^p register rows per group, forever
      val nRows = streamed.groupBy("event_type").count()
        .as[(String, Long)].collect().toMap
      assert(nRows.values.forall(_ <= 64L))
      // and an estimate snapshot is sane (view saw 600 distinct users)
      val est = graft.ops.sketch.hllEstimate(
        streamed.unionByName( // re-spine absent registers as rho 0
          spark.range(64).toDF("register").crossJoin(
            streamed.select("event_type").distinct())
            .select(col("event_type"), col("register"), lit(0).as("rho")))
          .groupBy("event_type", "register").agg(max("rho").as("rho")),
        Seq("event_type"), p = 6)
        .where(col("event_type") === "view")
        .select("hll_est").as[Double].head()
      assert(math.abs(est - 600.0) / 600.0 < 0.52, s"hll_est $est")
    } finally q.stop()
  }

  test("heavyHittersStream: exact-regime state equals the batch summary") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sdf = mem.toDF.toDF("src", "item")
    val q = EventStream.heavyHittersStream(sdf, col("item"), Seq("src"),
        capacity = 64, topN = 3)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // two batches, 20 distinct items per group (< capacity: exact)
      val b1 = (0 until 200).map(i => ("a", (i % 20).toLong)) ++
        (0 until 90).map(i => ("b", (i % 3).toLong))
      val b2 = (0 until 150).map(i => ("a", (i % 5).toLong))
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("hh_stream")
      val batch = graft.ops.sketch.heavyHittersBy(
        (b1 ++ b2).toDF("src", "item"), Seq("src"), col("item"),
        capacity = 64, topN = 3)
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream MG state == batch MG summary in the exact regime")
      // top item of group a: items 0..4 got 10 + 30 each = 40
      val top = streamed.where(col("src") === "a")
        .orderBy(col("est_count").desc, col("item")).head()
      assert(top.getString(1) == "0" && top.getLong(2) == 40L)
    } finally q.stop()
  }

  test("retention: cohort = first epoch-week, offsets count returning users once") {
    val rows = Seq(
      // user 1: weeks w, w+1, w+1 (second visit in a week counts once)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      // user 2: same cohort week, never returns
      (2L, ts("2024-01-02 10:00:00")),
      // user 3: cohort one week later, returns at offset 2
      (3L, ts("2024-01-08 10:00:00")), (3L, ts("2024-01-22 10:00:00"))
    ).toDF("user_id", "ts")
    val r = EventStream.retention(rows)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val w0 = r.head._1
    assert(r == Seq(
      (w0, 0L, 2L), (w0, 1L, 1L),          // users 1+2 cohort; user 1 returns
      (w0 + 1, 0L, 1L), (w0 + 1, 2L, 1L))) // user 3 cohort and its return
  }

  test("windowed MG heavy hitters runs as a REAL stream and matches batch") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // streaming groupBy(window) with the custom TypedImperativeAggregate:
    // partial MG maps merge into the window's state store entry — state
    // is capacity-bounded per open window
    val q = sdf.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"))
      .agg(graft.functions.aggregates.heavyHittersAgg(col("user_id"), 16).as("hh"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      mem.addData(batch.as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("hh_stream")
        .select(date_format(col("wstart"), "HH:mm").as("w"), expr("inline(hh)"))
        .as[(String, String, Long)].collect().toSet
      // hour 00: user 7 twice, user 8 once; hour 01: user 7 once — exact
      // regime (2 distinct users < capacity 16), so counts are exact
      assert(streamed == Set(("00:00", "7", 2L), ("00:00", "8", 1L),
        ("01:00", "7", 1L)))
    } finally q.stop()
  }

  test("autocorr: alternating series -> acf(1)=-1, acf(2)=+1; constant series -> null") {
    def hr(h: Int) = new Timestamp(h * 3600L * 1000L)
    // type p: 2 events at even hours 0,2,4; empty odd hours must count
    // as zeros (densified) -> series [2,0,2,0,2]
    val p = Seq(0, 0, 2, 2, 4, 4).map(h => ("p", hr(h)))
    // type c: one event every hour -> zero variance -> null acf
    val c = (0 to 4).map(h => ("c", hr(h)))
    val ev = (p ++ c).toDF("event_type", "ts")
    val got = EventStream.autocorr(ev, bucketSec = 3600, maxLag = 3)
      .orderBy("event_type", "lag")
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("c", 1, 4L, None), ("c", 2, 3L, None), ("c", 3, 2L, None),
      ("p", 1, 4L, Some(-1.0)), ("p", 2, 3L, Some(1.0)),
      ("p", 3, 2L, Some(-1.0))), got.toString)
  }

  test("changepoints: clean level shift scores (diff)/sqrt(1)=4 at the boundary") {
    def hr(h: Int) = new Timestamp(h * 3600L * 1000L)
    // 1 event/hour for hours 0-5, then 5/hour for 6-11: series
    // [1,1,1,1,1,1,5,5,5,5,5,5]; w=3 -> full windows at t in [3, 9]
    val ev = ((0 to 5).flatMap(h => Seq.fill(1)(("s", hr(h)))) ++
      (6 to 11).flatMap(h => Seq.fill(5)(("s", hr(h))))).toDF("event_type", "ts")
    val got = EventStream.changepoints(ev, bucketSec = 3600, w = 3)
      .orderBy("t").as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == (3L to 9L), got.toString)
    val stats = got.map(t => t._2 -> t._5).toMap
    // at the exact boundary both windows are constant: (5-1)/sqrt(0+1)=4
    assert(stats(6L) == 4.0, stats.toString)
    // far from the shift, both windows identical: stat 0
    assert(stats(3L) == 0.0, stats.toString)
    // the boundary is the argmax
    assert(stats.values.max == stats(6L))
  }

  test("assembleDialogs: chronological transcript per user, turn cap, exact span") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 7L, "view"),
      (2L, ts("2026-01-01 10:00:05"), 7L, "click"),
      (3L, ts("2026-01-01 10:01:00"), 7L, "purchase"),
      // same-ts pair: event_id breaks the tie deterministically
      (5L, ts("2026-01-02 09:00:00"), 8L, "view"),
      (4L, ts("2026-01-02 09:00:00"), 8L, "login"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStream.assembleDialogs(ev)
      .select("user_id", "n_turns", "span_sec", "transcript")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(got(7L) == ((7L, 3L, 60L, "view > click > purchase")))
    assert(got(8L) == ((8L, 2L, 0L, "login > view")))
    // the turn cap keeps the FIRST maxTurns events, not an arbitrary subset
    val capped = EventStream.assembleDialogs(ev, maxTurns = 2)
      .where(col("user_id") === 7L)
      .select("n_turns", "transcript").as[(Long, String)].head()
    assert(capped == ((2L, "view > click")))
  }

  test("timeToConvert: first-view to first-subsequent-purchase, bucketed; non-converters absent") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),   // 30 min -> bucket 0
      (1L, ts("2024-01-01 12:00:00"), "purchase"),   // later purchase ignored
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 12:00:00"), "purchase"),   // 2 h -> bucket 2
      (3L, ts("2024-01-01 09:00:00"), "purchase"),   // purchase BEFORE view
      (3L, ts("2024-01-01 10:00:00"), "view"),       //   -> never converts
      (4L, ts("2024-01-01 10:00:00"), "view"))       // view only
      .toDF("user_id", "ts", "event_type")
    val got = EventStream.timeToConvert(ev, "view", "purchase", bucketSec = 3600L)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (2L, 1L)), got.toString)
  }

  test("trend: exact OLS num/den per series; one-bucket series has den 0") {
    val ev = (
      // "up": counts 1, 2, 3 in hours 0, 1, 2 -> slope exactly 1 (6/6)
      Seq((1L, ts("2024-01-01 00:00:00"), "up")) ++
      Seq.fill(2)((1L, ts("2024-01-01 01:00:00"), "up")) ++
      Seq.fill(3)((1L, ts("2024-01-01 02:00:00"), "up")) ++
      // "flat": 2 then 2 -> slope 0/1
      Seq.fill(2)((2L, ts("2024-01-01 00:00:00"), "flat")) ++
      Seq.fill(2)((2L, ts("2024-01-01 01:00:00"), "flat")) ++
      // "once": a single bucket -> slope undefined, den 0
      Seq((3L, ts("2024-01-01 00:00:00"), "once")))
      .toDF("user_id", "ts", "event_type")
    val got = EventStream.trend(ev, bucketSec = 3600L)
      .orderBy("series").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("flat", 2L, 0L, 1L),
      ("once", 1L, 0L, 0L),
      ("up", 3L, 6L, 6L)), got.toString)
  }

  test("cuped: per-variant exact sums plus pooled theta num/den") {
    val ev = (
      Seq.fill(2)((1L, ts("2024-01-10 10:00:00"))) ++  // u1: x=2
      Seq((1L, ts("2024-01-20 10:00:00"))) ++          //     y=1
      Seq((2L, ts("2024-01-10 10:00:00"))) ++          // u2: x=1
      Seq.fill(3)((2L, ts("2024-01-20 10:00:00"))) ++  //     y=3
      Seq.fill(2)((3L, ts("2024-01-20 10:00:00"))))    // u3: x=0, y=2
      .toDF("user_id", "ts")
    // pooled: n=3 sx=3 sy=6 sxy=5 sxx=5 -> theta = -3/6
    val got = EventStream.cuped(ev, cutoff = "2024-01-15",
        variant = col("user_id") % 2)
      .orderBy("variant")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 3L, -3L, 6L),
      (1L, 2L, 2L, 3L, -3L, 6L)), got.toString)
  }

  test("topPaths: first-n path strings in (ts, event_id) order, counted") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "buy"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "view"),   // beyond n=3: ignored
      (2L, ts("2024-01-01 11:00:00"), 5L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 6L, "click"),  // ts tie -> event_id
      (2L, ts("2024-01-01 11:05:00"), 7L, "buy"),
      (3L, ts("2024-01-01 12:00:00"), 8L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventStream.topPaths(ev, n = 3, topK = 20)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view > click > buy", 2L), ("view", 1L)), got.toString)
  }

  test("seasonality: arithmetic dow/hod grid with basis-point shares") {
    // 2024-01-01 is a Monday -> dow 1 under the 0=Sunday convention
    val ev = (
      Seq.fill(3)((1L, ts("2024-01-01 10:15:00"))) ++
      Seq((2L, ts("2024-01-01 11:59:59"))))
      .toDF("user_id", "ts")
    val got = EventStream.seasonality(ev).orderBy("dow", "hod")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L, 3L, 7500L), (1L, 11L, 1L, 2500L)),
      got.toString)
  }

  test("activeUsers: exact rolling distinct via bounded day fan-out") {
    val ev = Seq(
      (1L, ts("1970-01-01 10:00:00")), (1L, ts("1970-01-01 11:00:00")),
      (1L, ts("1970-01-02 10:00:00")),
      (2L, ts("1970-01-01 09:00:00")))
      .toDF("user_id", "ts")
    val got = EventStream.activeUsers(ev, windowDays = 2)
      .orderBy("day").as[(Long, Long, Long, Long)].collect().toSeq
    // day 0: dau 2, window {u1,u2}; day 1: dau 1, window still {u1,u2}
    assert(got == Seq((0L, 2L, 2L, 10000L), (1L, 1L, 2L, 5000L)),
      got.toString)
  }

  test("concentration: top-k user shares with cumulative curve") {
    val ev = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L))
      .zipWithIndex.map { case (u, i) => (u, ts("2024-01-01 10:00:00"), i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val got = EventStream.concentration(ev, k = 2)
      .orderBy("rnk").as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 1L, 3L, 5000L, 5000L),
      (2, 2L, 2L, 3333L, 8333L)), got.toString)
  }

  test("srm: chi-square num/den over distinct units per variant") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    // variants: v0 = {2}, v1 = {1, 3}; k=2 t=3 -> chi2 = 2/6 = 1/3
    val got = EventStream.srm(ev, variant = col("user_id") % 2)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 3L, 2L, 6L)), got.toString)
  }

  test("botSignals: constant gaps -> cv 0; irregular humans score higher; cap clamps") {
    // user 1 (bot): 6 events exactly 60 s apart -> 5 gaps, cv = 0
    val bot = (0 until 6).map(i => (1L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong))
    // user 2 (human): gaps 10, 300, 30, 2000, 50 s
    val offs = Seq(0L, 10L, 310L, 340L, 2340L, 2390L)
    val human = offs.zipWithIndex.map { case (o, i) =>
      (2L, Timestamp.from(ts("2024-01-01 01:00:00").toInstant.plusSeconds(o)), 10L + i) }
    val ev = (bot ++ human).toDF("user_id", "ts", "event_id")
    val got = EventStream.botSignals(ev, minGaps = 5)
      .orderBy("user_id")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 5L), (2L, 5L)))
    assert(got(0)._4.contains(0.0), "constant cadence must give cv exactly 0")
    assert(got(0)._3 == 60.0)
    assert(got(1)._4.get > 1.0, s"irregular gaps must score high, got ${got(1)._4}")
    // the day cap clamps a pathological gap so moments stay bounded
    val wide = Seq((3L, ts("2024-01-01 00:00:00"), 1L),
      (3L, ts("2024-03-01 00:00:00"), 2L))
    val capped = EventStream.botSignals(wide.toDF("user_id", "ts", "event_id"),
        minGaps = 1)
      .select("mean_gap_s").as[Double].head()
    assert(capped == 86400.0)
  }

  test("lastTouchAttribution: latest prior touch wins, instant ties count, organic = -1") {
    def ev(u: Long, t: String, ty: String, id: Long, v: Double, c: Long) =
      (u, ts(t), ty, id, v, c)
    val events = Seq(
      ev(7L, "2024-01-01 00:01:00", "click", 1L, 0.0, 3L),
      ev(7L, "2024-01-01 00:05:00", "click", 2L, 0.0, 5L),
      // converts AFTER both clicks -> latest (camp 5)
      ev(7L, "2024-01-01 00:06:00", "purchase", 3L, 2.5, -9L),
      // converts at EXACTLY the first click's instant -> inclusive tie (camp 3)
      ev(7L, "2024-01-01 00:01:00", "purchase", 4L, 1.0, -9L),
      // user 8 never clicked -> organic bucket
      ev(8L, "2024-01-01 00:02:00", "purchase", 5L, 4.0, -9L))
      .toDF("user_id", "ts", "event_type", "event_id", "value", "camp")
    val got = EventStream.lastTouchAttribution(
        events, "purchase", "click", col("camp"))
      .orderBy("campaign")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((-1L, 1L, 400L), (3L, 1L, 100L), (5L, 1L, 250L)), got.toString)
  }

  test("streaming dialog assembly agrees with batch; cap bounds state, gap closes") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
      .as[EventStream.TurnEvent]
    val q = EventStream.assembleDialogsStream(sdf, gapMinutes = 30,
        maxTurns = 3, useTimeout = false)
      .writeStream.format("memory").queryName("dialog_stream")
      .outputMode("append").start()
    try {
      // user 7: four turns inside the gap (4th exceeds the cap of 3),
      // then a later event an hour on closes the dialog
      mem.addData(Seq(
        (7L, ts("2024-01-01 00:01:00"), 1L, "view"),
        (7L, ts("2024-01-01 00:02:00"), 2L, "click")))
      q.processAllAvailable()
      mem.addData(Seq(
        (7L, ts("2024-01-01 00:03:00"), 3L, "purchase"),
        (7L, ts("2024-01-01 00:04:00"), 4L, "error")))
      q.processAllAvailable()
      mem.addData(Seq((7L, ts("2024-01-01 01:30:00"), 5L, "view")))
      q.processAllAvailable()
      val closed = spark.table("dialog_stream")
        .select("user_id", "n_turns", "span_sec", "transcript", "truncated")
        .as[(Long, Long, Long, String, Boolean)].collect().toSeq
      // span over KEPT turns (00:01 -> 00:03), truncated flagged; the
      // batch twin on the same capped session agrees
      assert(closed == Seq((7L, 3L, 120L, "view > click > purchase", true)))
      val batchTwin = EventStream.assembleDialogs(
          Seq((1L, ts("2024-01-01 00:01:00"), 7L, "view"),
            (2L, ts("2024-01-01 00:02:00"), 7L, "click"),
            (3L, ts("2024-01-01 00:03:00"), 7L, "purchase"),
            (4L, ts("2024-01-01 00:04:00"), 7L, "error"))
            .toDF("event_id", "ts", "user_id", "event_type"), maxTurns = 3)
        .select("n_turns", "span_sec", "transcript")
        .as[(Long, Long, String)].head()
      assert(batchTwin == ((3L, 120L, "view > click > purchase")))
    } finally q.stop()
  }
}
