package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** events-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object EventsRegistry extends Registry {

    // north-star (streaming surface, batch-checked): tumbling 5-minute
    // windows per event type; same plan works under readStream +
    // watermark (see EventStreamSpec).
    // north-star: KMV distinct-count sketch — deterministic cardinality
    // estimate whose shuffle carries 32-bit hashes (bounded k per group),
    // never the values; exact below k, (k-1)·2³²/(h_k+1) above.
  b.q(
    "events_distinct_kmv" -> ((s, dir) =>
      sketch.kmvDistinct(events(s, dir), col("user_id"),
          Seq(col("event_type")), k = 64)
        .select(col("event_type"), col("n_min"),
          (floor(col("distinct_est") * 10000.0 + 0.5) / 10000.0).as("distinct_est"))
        .orderBy(col("event_type")))
  )
    // Same kth-hash estimator, same JVM-derived scale constant.
  b.o(
    "events_distinct_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |  ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv FROM events),
         |r AS (SELECT event_type, hv, row_number() OVER (
         |  PARTITION BY event_type ORDER BY hv) AS rk FROM h),
         |t AS (SELECT event_type, count(*) AS n_min, max(hv) AS kth
         |  FROM r WHERE rk <= 64 GROUP BY event_type)
         |SELECT event_type, n_min,
         |  floor((CASE WHEN n_min < 64 THEN n_min::DOUBLE
         |    ELSE ${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE) END)
         |    * 10000.0 + 0.5) / 10000.0 AS distinct_est
         |FROM t ORDER BY event_type""".stripMargin
  )

    // north-star: distinct-set OVERLAP from two KMV sketches — "how many
    // users did BOTH view and purchase" with neither corpus re-read; the
    // union minima are a coordinated sample, so shared-hash fraction
    // estimates Jaccard (Beyer et al. 2007).
  b.q(
    "events_kmv_overlap" -> ((s, dir) => {
      val ev = events(s, dir)
      sketch.kmvOverlap(
        sketch.kmv(ev.where(col("event_type") === "view"),
          col("user_id"), Seq.empty, k = 64),
        sketch.kmv(ev.where(col("event_type") === "purchase"),
          col("user_id"), Seq.empty, k = 64),
        Seq.empty, k = 64)
    })
  )
  b.o(
    "events_kmv_overlap" ->
      s"""WITH av AS (SELECT DISTINCT ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
         |a AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
         |  FROM av) WHERE rk <= 64),
         |bv AS (SELECT DISTINCT ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
         |b AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
         |  FROM bv) WHERE rk <= 64),
         |u AS (SELECT hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
         |  SELECT hv, 1 AS in_a, 0 AS in_b FROM a
         |  UNION ALL SELECT hv, 0 AS in_a, 1 AS in_b FROM b) GROUP BY hv),
         |r2 AS (SELECT hv, in_a, in_b, row_number() OVER (ORDER BY hv) AS rk FROM u),
         |t AS (SELECT count(*)::BIGINT AS n_min, max(hv) AS kth,
         |  sum(in_a * in_b)::BIGINT AS k_cap FROM r2 WHERE rk <= 64)
         |SELECT n_min, k_cap,
         |  floor((CASE WHEN n_min < 64 THEN n_min::DOUBLE
         |    ELSE ${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE) END)
         |    * 10000.0 + 0.5) / 10000.0 AS union_est,
         |  floor(k_cap::DOUBLE / n_min::DOUBLE * 10000.0 + 0.5) / 10000.0 AS jaccard,
         |  floor((CASE WHEN n_min < 64 THEN k_cap::DOUBLE
         |    ELSE (k_cap::DOUBLE / n_min::DOUBLE)
         |      * (${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE)) END)
         |    * 10000.0 + 0.5) / 10000.0 AS intersect_est
         |FROM t""".stripMargin
  )

    // north-star: HyperLogLog — the constant-size MERGEABLE distinct
    // state; every register bit is a pure function of the input set and
    // the portable hash, so the sketch itself hash-matches the oracle.
  b.q(
    "events_hll_users" -> ((s, dir) =>
      sketch.hllEstimate(
        sketch.hll(events(s, dir), col("user_id"), Seq("event_type"), p = 6),
        Seq("event_type"), p = 6)
        .orderBy(col("event_type")))
  )
  b.o(
    "events_hll_users" ->
      s"""WITH $SqlHllRegs,
         |e AS (SELECT event_type,
         |  count(CASE WHEN rho = 0 THEN 1 END) AS n_zero,
         |  (sum(1::BIGINT << (40 - rho)))::BIGINT AS harmonic_fixed
         |  FROM reg GROUP BY 1)
         |SELECT event_type, n_zero, harmonic_fixed,
         |  floor((${sketch.hllEstimateNumerator(6)}::DOUBLE) / harmonic_fixed::DOUBLE
         |    * 10000.0 + 0.5) / 10000.0 AS hll_est
         |FROM e ORDER BY event_type""".stripMargin
  )

    // the merge law as a checked query: register-wise max of two
    // half-corpus sketches ≡ the from-scratch whole-corpus sketch,
    // which is exactly what the oracle computes.
  b.q(
    "events_hll_merge" -> ((s, dir) => {
      val ev = events(s, dir)
      sketch.hllMerge(
        sketch.hll(ev.where(col("event_id") % 2 === 0), col("user_id"),
          Seq("event_type"), p = 6),
        sketch.hll(ev.where(col("event_id") % 2 === 1), col("user_id"),
          Seq("event_type"), p = 6),
        Seq("event_type"))
        .orderBy(col("event_type"), col("register"))
    })
  )
    // the oracle computes the sketch FROM SCRATCH over the whole corpus;
    // the Spark side merges two half-corpus sketches — hash-matching
    // register tables IS the merge law merge(hll(A), hll(B)) = hll(A∪B)
  b.o(
    "events_hll_merge" ->
      s"""WITH $SqlHllRegs
         |SELECT event_type, register, rho FROM reg
         |ORDER BY event_type, register""".stripMargin
  )

    // north-star: ordered funnel — per-step earliest-reach times as
    // stacked conditional-min windows over ONE user shuffle.
  b.q(
    "events_funnel" -> ((s, dir) =>
      EventStream.funnel(events(s, dir), Seq("view", "click", "purchase")))
  )
    // Layered min-after-previous-step CTEs — strict event-time ordering,
    // the same reach semantics as EventStream.funnel's stacked windows.
  b.o(
    "events_funnel" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM events GROUP BY user_id),
        |e1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= u.t0 GROUP BY e.user_id),
        |e2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN e1 ON e.user_id = e1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= e1.t1 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin
  )

  b.q(
    "events_window_agg" -> ((s, dir) =>
      EventStream.windowedAgg(events(s, dir))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n_events"), col("sum_value_micros"))
        .orderBy(col("wstart"), col("event_type")))
  )
  b.o(
    "events_window_agg" ->
      """SELECT strftime(make_timestamp((floor(epoch(ts)/300)*300*1000000)::BIGINT),
        |         '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  sum(floor(value * 1000000.0)::BIGINT)::BIGINT AS sum_value_micros
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin
  )

    // SLIDING windows (10-minute length, 5-minute slide): every event
    // lands in exactly 2 overlapping windows; in streaming mode the
    // watermark evicts closed window state.
  b.q(
    "events_sliding_agg" -> ((s, dir) =>
      EventStream.windowedAgg(events(s, dir), windowLen = "10 minutes",
          slide = Some("5 minutes"))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n_events"), col("sum_value_micros"))
        .orderBy(col("wstart"), col("event_type")))
  )
    // Each event expands to its len/slide = 2 overlapping window starts:
    // the aligned 5-minute slot and the one before it.
  b.o(
    "events_sliding_agg" ->
      """WITH m AS (SELECT event_type, value,
        |  (epoch_us(ts) // 300000000 - i) * 300 AS wstart_s
        |  FROM events, range(0, 2) r(i)),
        |w AS (SELECT strftime(make_timestamp(wstart_s * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  sum(floor(value * 1000000.0)::BIGINT)::BIGINT AS sum_value_micros
        |  FROM m GROUP BY 1, 2)
        |SELECT wstart, event_type, n_events, sum_value_micros
        |FROM w ORDER BY wstart, event_type""".stripMargin
  )

    // NATIVE session windows (session_window + state-store merge in
    // streaming) — must draw the same session boundaries as the
    // gaps-and-islands form: the oracle is the sessionize chain with
    // end = last event + gap (session_window's end semantics).
  b.q(
    "events_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("s_start")))
  )
    // Same islands as events_sessionize; session_window's end = last
    // event + gap.
  b.o(
    "events_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM f)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, session_idx ORDER BY user_id, s_start""".stripMargin
  )

    // north-star: gap-based sessionization (lag -> flag -> running sum),
    // one shuffle on user_id.
  b.q(
    "events_sessionize" -> ((s, dir) =>
      EventStream.sessionize(events(s, dir))
        .select(col("user_id"), col("session_idx"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_idx")))
  )
  b.o(
    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM f)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin
  )

    // north-star: typed JSON prop extraction. The fence matters: without
    // it, PushDownPredicates clones the parse into the filter AND the
    // projection — every row parses twice (the pipeline_e2e lesson).
  b.q(
    "events_json_extract" -> ((s, dir) =>
      events(s, dir)
        .withColumn("k", graft.functions.NativeExprs.fence(EventStream.propInt("k")))
        .where(col("k") > 50)
        .select(col("event_id"), col("event_type"), col("k"))
        .orderBy(col("event_id")))
  )
  b.o(
    "events_json_extract" ->
      """SELECT event_id, event_type, json_extract_string(props, '$.k')::INT AS k
        |FROM events WHERE json_extract_string(props, '$.k')::INT > 50
        |ORDER BY event_id""".stripMargin
  )

    // fixed-width histogram with clamped edge bins and an explicit bin
    // spine (empty bins emitted, not omitted).
  b.q(
    "events_histogram" -> ((s, dir) =>
      sketch.histogram(events(s, dir), col("value"), lo = 0.0, hi = 500.0,
          nbins = 25)
        .orderBy(col("bin")))
  )
  b.o(
    "events_histogram" ->
      """WITH b AS (SELECT greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events),
        |c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin)
        |SELECT r.bin, 0.0 + r.bin * 20.0 AS bin_lo, 0.0 + (r.bin + 1) * 20.0 AS bin_hi,
        |  coalesce(c.n, 0) AS n
        |FROM (SELECT unnest(range(0, 25)) AS bin) r LEFT JOIN c USING (bin)
        |ORDER BY r.bin""".stripMargin
  )

    // north-star: mergeable quantiles — derive any quantile from the
    // (mergeable) histogram counts; no full-data sort, no rescan.
  b.q(
    "events_hist_quantiles" -> ((s, dir) =>
      sketch.histogramQuantile(
        sketch.histogram(events(s, dir), col("value"), lo = 0.0, hi = 500.0,
          nbins = 25),
        Seq(0.5, 0.9, 0.99))
        .orderBy(col("q")))
  )
  b.o(
    "events_hist_quantiles" ->
      """WITH b AS (SELECT greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events),
        |c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
        |h AS (SELECT r.bin, 0.0 + r.bin * 20.0 AS bin_lo, 0.0 + (r.bin + 1) * 20.0 AS bin_hi,
        |  coalesce(c.n, 0) AS n
        |  FROM (SELECT unnest(range(0, 25)) AS bin) r LEFT JOIN c USING (bin)),
        |cc AS (SELECT bin, bin_lo, bin_hi, n, sum(n) OVER (ORDER BY bin) AS cum,
        |  sum(n) OVER () AS total FROM h),
        |qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
        |cand AS (SELECT q, bin_lo, bin_hi, n, cum, total,
        |  row_number() OVER (PARTITION BY q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0)
        |SELECT q, floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |    * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v_est
        |FROM cand WHERE rk = 1 ORDER BY q""".stripMargin
  )

    // north-star: quantiles from a deterministic bottom-k-hash sample —
    // no domain knob (histogramQuantile's [lo,hi)), mergeable, and
    // exactly reproducible by an independent engine (no RNG, no
    // interpolation: nearest-rank over the value-sorted sample).
  b.q(
    "events_sample_quantiles" -> ((s, dir) =>
      sketch.sampleQuantiles(table(s, dir, "events"), col("value"),
        col("event_id"), k = 256, qs = Seq(0.1, 0.5, 0.9, 0.99)))
  )
  b.o(
    "events_sample_quantiles" ->
      s"""WITH sm AS (SELECT ${hashing.sqlH63("event_id::VARCHAR")} AS h,
         |    value::DOUBLE AS v
         |  FROM events WHERE value IS NOT NULL ORDER BY h LIMIT 256),
         |n AS (SELECT count(*)::BIGINT AS sz FROM sm),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v, h) AS r FROM sm),
         |qq AS (SELECT unnest([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
         |SELECT q, v FROM rk JOIN qq
         |  ON rk.r = (floor(q * ((SELECT sz FROM n) - 1)) + 1)::INT
         |ORDER BY q""".stripMargin
  )

    // per-type medians/tails from independent per-group bottom-k
    // samples — WindowGroupLimit bounds the heap before the exchange.
  b.q(
    "events_sample_quantiles_by" -> ((s, dir) =>
      sketch.sampleQuantilesBy(table(s, dir, "events"), col("value"),
        col("event_id"), Seq("event_type"), k = 128, qs = Seq(0.5, 0.95)))
  )
  b.o(
    "events_sample_quantiles_by" ->
      s"""WITH h AS (SELECT event_type,
         |    ${hashing.sqlH63("event_id::VARCHAR")} AS h, value::DOUBLE AS v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ${hashing.sqlH63("event_id::VARCHAR")}) AS sr
         |  FROM events WHERE value IS NOT NULL),
         |sm AS (SELECT event_type, h, v FROM h WHERE sr <= 128),
         |sz AS (SELECT event_type, count(*)::BIGINT AS n FROM sm GROUP BY 1),
         |rk AS (SELECT event_type, v, row_number() OVER (
         |    PARTITION BY event_type ORDER BY v, h) AS r FROM sm),
         |qq AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q)
         |SELECT rk.event_type, q, v
         |FROM rk JOIN sz USING (event_type) JOIN qq
         |  ON rk.r = (floor(q * (sz.n - 1)) + 1)::INT
         |ORDER BY event_type, q""".stripMargin
  )

    // north-star: robust (IQR-fence) anomaly card per event type —
    // Tukey's fence Q3 + 1.5·IQR from MERGEABLE histogram quantiles
    // (both windows run over the 25-bin grid, never the table), then one
    // broadcast of 4 fences back onto the scan. The robust complement
    // to events_anomaly's rolling z-score: means move with the outliers
    // they're trying to catch, quartiles don't.
  b.q(
    "events_anomaly_iqr" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val hist = sketch.histogramBy(ev, col("value"), Seq("event_type"),
        lo = 0.0, hi = 500.0, nbins = 25)
      val qs = sketch.histogramQuantileBy(hist, Seq("event_type"),
        Seq(0.25, 0.75))
      val f = qs.where(col("q") === 0.25)
        .select(col("event_type"), col("v_est").as("q1"))
        .join(qs.where(col("q") === 0.75)
          .select(col("event_type"), col("v_est").as("q3")), "event_type")
        .withColumn("fence", col("q3") + (col("q3") - col("q1")) * 1.5)
      val out = ev.join(broadcast(f.select(col("event_type"), col("fence"))),
          "event_type")
        .where(col("value") > col("fence"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"), max(col("value")).as("_mx"))
      f.join(out, Seq("event_type"), "left")
        .select(col("event_type"),
          (floor(col("fence") * 10000.0 + 0.5) / 10000.0).as("fence"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
          (floor(coalesce(col("_mx"), lit(0.0)) * 10000.0 + 0.5) / 10000.0)
            .as("max_value"))
        .orderBy(col("event_type"))
    })
  )
  b.o(
    "events_anomaly_iqr" ->
      """WITH tt AS (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type,
        |    greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
        |h AS (SELECT tt.event_type, r.bin, 0.0 + r.bin * 20.0 AS bin_lo,
        |    0.0 + (r.bin + 1) * 20.0 AS bin_hi, coalesce(c.n, 0) AS n
        |  FROM tt CROSS JOIN (SELECT unnest(range(0, 25)) AS bin) r
        |  LEFT JOIN c ON c.event_type = tt.event_type AND c.bin = r.bin),
        |cc AS (SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS total FROM h),
        |qq AS (SELECT unnest([0.25::DOUBLE, 0.75::DOUBLE]) AS q),
        |cand AS (SELECT event_type, q, bin_lo, bin_hi, n, cum, total,
        |    row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0),
        |vq AS (SELECT event_type, q,
        |    floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |      * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM cand WHERE rk = 1),
        |f AS (SELECT a.event_type, b.v + (b.v - a.v) * 1.5 AS fence
        |  FROM vq a JOIN vq b ON a.event_type = b.event_type
        |  WHERE a.q = 0.25 AND b.q = 0.75),
        |o AS (SELECT e.event_type, count(*)::BIGINT AS n_outliers,
        |    max(value) AS mx
        |  FROM events e JOIN f ON e.event_type = f.event_type
        |  WHERE e.value > f.fence GROUP BY 1)
        |SELECT f.event_type,
        |  floor(f.fence * 10000.0 + 0.5) / 10000.0 AS fence,
        |  coalesce(o.n_outliers, 0)::BIGINT AS n_outliers,
        |  floor(coalesce(o.mx, 0.0) * 10000.0 + 0.5) / 10000.0 AS max_value
        |FROM f LEFT JOIN o ON f.event_type = o.event_type
        |ORDER BY f.event_type""".stripMargin
  )

    // trailing event-time rolling aggregate: RANGE-frame window after ONE
    // user shuffle; fixed-point sums, single final division.
  b.q(
    "events_rolling_avg" -> ((s, dir) =>
      EventStream.rollingAgg(events(s, dir), windowSec = 3600)
        .select(col("event_id"), col("epoch_s"), col("mov_n"),
          col("mov_sum_micros"), col("mov_avg"))
        .orderBy(col("event_id")))
  )
    // Same RANGE frame over whole-second event times; fixed-point sums,
    // identical two-division mean.
  b.o(
    "events_rolling_avg" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  epoch_us(ts) // 1000000 AS epoch_s FROM events),
        |w AS (SELECT event_id, epoch_s,
        |  count(*) OVER win AS mov_n,
        |  (sum(floor(value * 1000000.0)::BIGINT) OVER win)::BIGINT AS mov_sum_micros
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT event_id, epoch_s, mov_n, mov_sum_micros,
        |  floor(mov_sum_micros / 1000000.0 / mov_n * 10000.0 + 0.5) / 10000.0 AS mov_avg
        |FROM w ORDER BY event_id""".stripMargin
  )

    // per-user EWMA over the last k events — dyadic weights make the
    // weighted numerator/denominator exact integers; one user shuffle.
  b.q(
    "events_ewma" -> ((s, dir) =>
      EventStream.ewma(events(s, dir), k = 4)
        .select(col("event_id"), col("user_id"), col("ewma_n"), col("ewma"))
        .orderBy(col("event_id")))
  )
    // Same frame-ordered list (event_id tiebreak); index weights 2^(i-1)
    // via an indexed list rebuild — exact integer num/den, one division.
  b.o(
    "events_ewma" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS eus,
        |  floor(value * 1000000.0)::BIGINT AS vq FROM events),
        |w AS (SELECT event_id, user_id,
        |  list(vq) OVER (PARTITION BY user_id ORDER BY eus, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS l FROM e)
        |SELECT event_id, user_id, len(l)::BIGINT AS ewma_n,
        |  floor(list_sum(list_transform(range(1, len(l) + 1),
        |      i -> l[i] * (1::BIGINT << (i - 1))))::DOUBLE
        |    / ((1::BIGINT << len(l)) - 1)::DOUBLE / 1000000.0
        |    * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM w ORDER BY event_id""".stripMargin
  )

    // trailing z-score anomaly signal — exact-integer window moments,
    // one division + sqrt at the end; zero-variance windows are null.
  b.q(
    "events_anomaly" -> ((s, dir) =>
      EventStream.rollingZScore(events(s, dir), windowSec = 3600)
        .select(col("event_id"), col("win_n"), col("z"))
        .orderBy(col("event_id")))
  )
    // Same exact-integer moments; `//` not needed — one double division.
  b.o(
    "events_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  epoch_us(ts) // 1000000 AS epoch_s,
        |  floor(value * 1000.0 + 0.5)::BIGINT AS vq FROM events),
        |w AS (SELECT event_id,
        |  count(*) OVER win AS win_n,
        |  (sum(vq) OVER win)::BIGINT AS s1,
        |  (sum(vq * vq) OVER win)::BIGINT AS s2,
        |  vq
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT event_id, win_n,
        |  CASE WHEN win_n * s2 - s1 * s1 > 0
        |    THEN floor((win_n * vq - s1)::DOUBLE / sqrt((win_n * s2 - s1 * s1)::DOUBLE)
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS z
        |FROM w ORDER BY event_id""".stripMargin
  )

    // weekly cohort retention triangle — distinct user-weeks collapse
    // before the co-partitioned first-week join.
  b.q(
    "events_retention" -> ((s, dir) =>
      EventStream.retention(events(s, dir))
        .orderBy(col("cohort_week"), col("week_offset")))
  )
    // Integer epoch-weeks (day DIV 7 arithmetic — no calendar semantics).
  b.o(
    "events_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |  epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT u, min(week) AS cohort_week FROM uw GROUP BY u)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN f USING (u)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin
  )

    // first-order Markov transition matrix — one user shuffle for the
    // lag window; shares as exact fixed-point integers.
  b.q(
    "events_transitions" -> ((s, dir) =>
      EventStream.transitions(events(s, dir))
        .orderBy(col("prev_type"), col("event_type")))
  )
    // Same lag window (event_id tiebreak), integer shares.
  b.o(
    "events_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, count(*) AS n FROM p
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  ((n * 10000) // sum(n) OVER (PARTITION BY prev_type))::BIGINT AS share_4dp
        |FROM c ORDER BY prev_type, event_type""".stripMargin
  )

    // keep-first dedup per (user, event_type) — the batch twin of
    // streaming dropDuplicatesWithinWatermark.
  b.q(
    "events_dedup_keepfirst" -> ((s, dir) =>
      events(s, dir)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("event_type"))
            .orderBy(col("ts"), col("event_id"))))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type")))
  )
  b.o(
    "events_dedup_keepfirst" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn FROM events)
        |SELECT user_id, event_type, event_id FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
  )

    // north-star: event-time AS-OF join — each purchase annotated with the
    // user's latest click at-or-before it. Union + running-last window:
    // one shuffle on user_id, no per-key range explosion.
  b.q(
    "events_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      asof.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"), col("click_id"), col("click_value"))
        .orderBy(col("event_id"))
    })
  )
    // DuckDB has a native ASOF JOIN — the ideal oracle for the
    // union+running-last implementation.
  b.o(
    "events_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |  FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  l.value, r.click_id, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin
  )

    // north-star: bucketed time-RANGE join — every (purchase, click) pair
    // by the same user within the 30 minutes before the purchase. Both
    // sides bucket by the window width, so this is one uniform equi-join
    // shuffle (≤2× left duplication), never a per-key nested loop.
  b.q(
    "events_range_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asof.rangeJoin(purchases, clicks, Seq("user_id"), "ts",
          lowerUs = -30L * 60 * 1000000, upperUs = 0L, Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy(col("event_id"), col("click_id"))
    })
  )
  b.o(
    "events_range_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, r.click_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts
        |ORDER BY event_id, click_id""".stripMargin
  )

    // north-star: trending items — MG heavy hitters composed with
    // event-time tumbling windows (top users per hour). The same plan
    // runs under Structured Streaming (EventStreamSpec pins it on a
    // MemoryStream): windowed MG state is capacity-bounded per open
    // window, the canonical "trending now" shape at firehose scale.
  b.q(
    "events_trending_hh" -> ((s, dir) =>
      sketch.heavyHittersBy(
          events(s, dir).withColumn("wstart",
            date_format(window(col("ts"), "1 hour").getField("start"),
              "yyyy-MM-dd HH:mm:ss")),
          // 4096 like the other oracle-checked MG queries: exact regime
          // must hold per window at every test sf, not just sf0.01
          Seq("wstart"), col("user_id"), capacity = 4096, topN = 3)
        .orderBy(col("wstart"), col("est_count").desc, col("item")))
  )
  b.o(
    "events_trending_hh" ->
      """WITH c AS (SELECT
        |    strftime(make_timestamp((floor(epoch(ts)/3600)*3600*1000000)::BIGINT),
        |      '%Y-%m-%d %H:%M:%S') AS wstart,
        |    user_id::VARCHAR AS item, count(*)::BIGINT AS est_count
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY wstart
        |    ORDER BY est_count DESC, item) AS rk FROM c)
        |SELECT wstart, item, est_count FROM r WHERE rk <= 3
        |ORDER BY wstart, est_count DESC, item""".stripMargin
  )

    // north-star: autocorrelation of the hourly event-count series per
    // type — seasonality diagnostic over a DENSIFIED domain-bounded
    // series; exact long sufficient statistics, one double combine.
  b.q(
    "events_acf" -> ((s, dir) =>
      EventStream.autocorr(events(s, dir), bucketSec = 3600,
          maxLag = 3)
        .orderBy(col("event_type"), col("lag")))
  )
  b.o(
    "events_acf" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // ${1000000L * 3600} AS t,
         |    count(*)::BIGINT AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, unnest(range(t0, t1 + 1)) AS t
         |  FROM (SELECT event_type, min(t) AS t0, max(t) AS t1 FROM c
         |        GROUP BY event_type)),
         |ds AS (SELECT sp.event_type, sp.t, coalesce(c.n, 0)::BIGINT AS n
         |  FROM sp LEFT JOIN c USING (event_type, t)),
         |ld AS (SELECT event_type, n AS x,
         |  lead(n, 1) OVER w AS l1, lead(n, 2) OVER w AS l2,
         |  lead(n, 3) OVER w AS l3
         |  FROM ds WINDOW w AS (PARTITION BY event_type ORDER BY t)),
         |p AS (
         |  SELECT event_type, 1 AS lag, x, l1 AS y FROM ld WHERE l1 IS NOT NULL
         |  UNION ALL
         |  SELECT event_type, 2, x, l2 FROM ld WHERE l2 IS NOT NULL
         |  UNION ALL
         |  SELECT event_type, 3, x, l3 FROM ld WHERE l3 IS NOT NULL),
         |a AS (SELECT event_type, lag, count(*)::BIGINT AS m,
         |  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         |  sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         |  sum(x * y)::BIGINT AS sxy
         |  FROM p GROUP BY 1, 2)
         |SELECT event_type, lag, m,
         |  CASE WHEN m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0.0
         |    AND m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0.0 THEN
         |    ${r4("(m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / " +
              "(sqrt(m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * " +
              "sqrt(m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))")}
         |  END AS acf
         |FROM a ORDER BY event_type, lag""".stripMargin
  )

    // north-star: sliding two-sample change-point statistic over the
    // same densified series — mean-shift detection with exact long
    // window sums; full-window buckets only.
  b.q(
    "events_changepoint" -> ((s, dir) =>
      EventStream.changepoints(events(s, dir), bucketSec = 3600, w = 6)
        .orderBy(col("event_type"), col("t")))
  )
  b.o(
    "events_changepoint" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // ${1000000L * 3600} AS t,
         |    count(*)::BIGINT AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, unnest(range(t0, t1 + 1)) AS t
         |  FROM (SELECT event_type, min(t) AS t0, max(t) AS t1 FROM c
         |        GROUP BY event_type)),
         |ds AS (SELECT sp.event_type, sp.t, coalesce(c.n, 0)::BIGINT AS n
         |  FROM sp LEFT JOIN c USING (event_type, t)),
         |f AS (SELECT event_type, t,
         |  (count(*) OVER pre)::BIGINT AS n_pre,
         |  (sum(n) OVER pre)::BIGINT AS s1p, (sum(n * n) OVER pre)::BIGINT AS s2p,
         |  (count(*) OVER post)::BIGINT AS n_post,
         |  (sum(n) OVER post)::BIGINT AS s1q, (sum(n * n) OVER post)::BIGINT AS s2q
         |  FROM ds WINDOW
         |    pre AS (PARTITION BY event_type ORDER BY t
         |      ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
         |    post AS (PARTITION BY event_type ORDER BY t
         |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING))
         |SELECT event_type, t, n_pre, n_post,
         |  ${r4("((s1q::DOUBLE - s1p::DOUBLE) / 6.0) / " +
              "sqrt(((6.0 * s2p::DOUBLE - s1p::DOUBLE * s1p::DOUBLE) / 36.0 + " +
              "(6.0 * s2q::DOUBLE - s1q::DOUBLE * s1q::DOUBLE) / 36.0) / 6.0 + 1.0)")}
         |    AS stat
         |FROM f WHERE n_pre = 6 AND n_post = 6
         |ORDER BY event_type, t""".stripMargin
  )

    // north-star: conversion-latency histogram — first view → first
    // subsequent purchase per user, hour buckets; the funnel's "how
    // long" companion.
  b.q(
    "events_time_to_convert" -> ((s, dir) =>
      EventStream.timeToConvert(events(s, dir), "view", "purchase",
          bucketSec = 3600L)
        .orderBy(col("bucket")))
  )
    // First-from, first-to-at-or-after, integer second/bucket floors.
  b.o(
    "events_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(ts) AS fv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS fp, min(v.fv) AS fv
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.fv
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |d AS (SELECT user_id,
        |    ((epoch_us(fp) - epoch_us(fv)) // 1000000) // 3600 AS bucket
        |  FROM p)
        |SELECT bucket, count(*)::BIGINT AS n_users
        |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin
  )

    // north-star: per-type OLS volume trend over hour buckets — exact
    // integer slope as a num/den pair; the growing-or-dying meter a
    // crawl scheduler consumes.
  b.q(
    "events_trend" -> ((s, dir) =>
      EventStream.trend(events(s, dir), bucketSec = 3600L)
        .orderBy(col("series")))
  )
    // Rebase x per series so the OLS sums stay small; slope stays a
    // num/den pair (signed division is the engine trap).
  b.o(
    "events_trend" ->
      """WITH b AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS x, count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT series, x - min(x) OVER (PARTITION BY series) AS xs, y
        |  FROM b)
        |SELECT series, count(*)::BIGINT AS n_buckets,
        |  (count(*) * sum(xs * y) - sum(xs) * sum(y))::BIGINT AS slope_num,
        |  (count(*) * sum(xs * xs) - sum(xs) * sum(xs))::BIGINT AS slope_den
        |FROM r GROUP BY series ORDER BY series""".stripMargin
  )

    // north-star: CUSUM changepoint monitor — sequential drift the
    // snapshot meters can't catch; exact n_ref-scaled recurrence as a
    // bounded in-plan HOF fold over the day grid (corpus crosses the
    // wire as <= 30 rows).
  b.q(
    "events_cusum" -> ((s, dir) =>
      EventStream.cusum(events(s, dir), bucketSec = 86400L, refN = 7,
          slack = 0L, threshold = 100L)
        .orderBy(col("bucket")))
  )
    // CUSUM: the same n_ref-scaled recurrence as a recursive CTE over
    // the ordered day index.
  b.o(
    "events_cusum" ->
      """WITH RECURSIVE g AS (
        |  SELECT (epoch_us(ts) // 1000000) // 86400 AS b,
        |    count(*)::BIGINT AS x FROM events GROUP BY 1),
        |o AS (SELECT b, x, row_number() OVER (ORDER BY b) AS rn FROM g),
        |ref AS (SELECT sum(x)::BIGINT AS sref, count(*)::BIGINT AS nref
        |  FROM o WHERE rn <= 7),
        |c(rn, s) AS (
        |  SELECT 0::BIGINT, 0::BIGINT
        |  UNION ALL
        |  SELECT o.rn, greatest(0, c.s + (SELECT nref FROM ref) * o.x
        |    - (SELECT sref FROM ref))
        |  FROM c JOIN o ON o.rn = c.rn + 1)
        |SELECT o.b AS bucket, o.x, c.s AS s_scaled,
        |  c.s > 100 * (SELECT nref FROM ref) AS alarm
        |FROM c JOIN o USING (rn) ORDER BY bucket""".stripMargin
  )

    // north-star: Holt linear smoothing — adaptive level+trend with
    // one-step forecasts/residuals; exact dyadic q10 recurrence (every
    // step one multiply-add + one arithmetic shift) as a bounded
    // in-plan HOF fold over the day grid.
  b.q(
    "events_holt" -> ((s, dir) =>
      EventStream.holtLinear(events(s, dir), bucketSec = 86400L,
          aNum = 307, bNum = 102)
        .orderBy(col("bucket")))
  )
    // Holt: the same shift-quantized recurrence as a recursive CTE.
    // DuckDB's // TRUNCATES toward zero while Spark's arithmetic
    // shiftright FLOORS (the signed-division engine trap, live here
    // because the trend term goes negative) — so the oracle floors
    // explicitly: subtract the positive mod, then divide exactly.
  b.o(
    "events_holt" -> {
      def fd(e: String) =
        s"((($e) - ((($e) % 1024 + 1024) % 1024)) // 1024)"
      val lp = fd("307 * o.x * 1024 + 717 * (c.l + c.t)")
      val tp = fd(s"102 * ($lp - c.l) + 922 * c.t")
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_us(ts) // 1000000) // 86400 AS b,
         |    count(*)::BIGINT AS x FROM events GROUP BY 1),
         |o AS (SELECT b, x, row_number() OVER (ORDER BY b) AS rn FROM g),
         |c(rn, l, t, f) AS (
         |  SELECT 1::BIGINT, (SELECT x * 1024 FROM o WHERE rn = 1)::BIGINT,
         |    0::BIGINT, NULL::BIGINT
         |  UNION ALL
         |  SELECT o.rn, $lp, $tp, c.l + c.t
         |  FROM c JOIN o ON o.rn = c.rn + 1)
         |SELECT o.b AS bucket, o.x, c.l AS level_fp, c.t AS trend_fp,
         |  c.f AS forecast_fp, o.x * 1024 - c.f AS err_fp,
         |  floor(c.f::DOUBLE / 1024.0 * 100.0 + 0.5) / 100.0 AS forecast_q2
         |FROM c JOIN o USING (rn) ORDER BY bucket""".stripMargin
    }
  )

    // north-star: Holt-Winters additive — Holt plus a day-of-week
    // seasonal ring (period 7, phase = bucket mod 7 so grid gaps can't
    // rotate it); same exact q10 dyadic recurrence, one bounded fold.
  b.q(
    "events_holt_winters" -> ((s, dir) =>
      EventStream.holtWinters(events(s, dir), bucketSec = 86400L,
          period = 7, aNum = 307, bNum = 102, gNum = 205)
        .orderBy(col("bucket")))
  )
    // Recursive CTE carrying the seasonal ring as a BIGINT list: read
    // the phase slot, run the three floored-shift updates, write the
    // slot back by list slicing. Same explicit-floor discipline as the
    // Holt oracle (seasonal terms go negative routinely).
  b.o(
    "events_holt_winters" -> {
      def fd(e: String) =
        s"((($e) - ((($e) % 1024 + 1024) % 1024)) // 1024)"
      val pos = "(o.b % 7)"
      val sp = s"c.se[$pos + 1]"
      val lp = fd(s"307 * (o.x * 1024 - $sp) + 717 * (c.l + c.t)")
      val tp = fd(s"102 * ($lp - c.l) + 922 * c.t")
      val sq = fd(s"205 * (o.x * 1024 - $lp) + 819 * $sp")
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_us(ts) // 1000000) // 86400 AS b,
         |    count(*)::BIGINT AS x FROM events GROUP BY 1),
         |o AS (SELECT b, x, row_number() OVER (ORDER BY b) AS rn FROM g),
         |c(rn, l, t, s, f, se) AS (
         |  SELECT 1::BIGINT, (SELECT x * 1024 FROM o WHERE rn = 1)::BIGINT,
         |    0::BIGINT, 0::BIGINT, NULL::BIGINT,
         |    list_transform(range(7), i -> 0::BIGINT)
         |  UNION ALL
         |  SELECT o.rn, $lp, $tp, $sq, c.l + c.t + $sp,
         |    c.se[:$pos] || [$sq] || c.se[$pos + 2:]
         |  FROM c JOIN o ON o.rn = c.rn + 1)
         |SELECT o.b AS bucket, o.x, c.l AS level_fp, c.t AS trend_fp,
         |  c.s AS season_fp, c.f AS forecast_fp, o.x * 1024 - c.f AS err_fp,
         |  floor(c.f::DOUBLE / 1024.0 * 100.0 + 0.5) / 100.0 AS forecast_q2
         |FROM c JOIN o USING (rn) ORDER BY bucket""".stripMargin
    }
  )

    // north-star: h-step Holt-Winters forecast — frozen final state
    // projected l + k·t + ring[(b_last+k) mod 7]; capacity planning.
  b.q(
    "events_hw_forecast" -> ((s, dir) =>
      EventStream.holtWintersForecast(events(s, dir), bucketSec = 86400L,
          period = 7, horizon = 14)
        .orderBy(col("step")))
  )
  b.o(
    "events_hw_forecast" -> {
      def fd(e: String) =
        s"((($e) - ((($e) % 1024 + 1024) % 1024)) // 1024)"
      val pos = "(o.b % 7)"
      val sp = s"c.se[$pos + 1]"
      val lp = fd(s"307 * (o.x * 1024 - $sp) + 717 * (c.l + c.t)")
      val tp = fd(s"102 * ($lp - c.l) + 922 * c.t")
      val sq = fd(s"205 * (o.x * 1024 - $lp) + 819 * $sp")
      s"""WITH RECURSIVE g AS (
         |  SELECT (epoch_us(ts) // 1000000) // 86400 AS b,
         |    count(*)::BIGINT AS x FROM events GROUP BY 1),
         |o AS (SELECT b, x, row_number() OVER (ORDER BY b) AS rn FROM g),
         |c(rn, l, t, se) AS (
         |  SELECT 1::BIGINT, (SELECT x * 1024 FROM o WHERE rn = 1)::BIGINT,
         |    0::BIGINT, list_transform(range(7), i -> 0::BIGINT)
         |  UNION ALL
         |  SELECT o.rn, $lp, $tp,
         |    c.se[:$pos] || [$sq] || c.se[$pos + 2:]
         |  FROM c JOIN o ON o.rn = c.rn + 1),
         |fin AS (SELECT l, t, se FROM c
         |  WHERE rn = (SELECT max(rn) FROM o)),
         |lastb AS (SELECT max(b) AS lb FROM g)
         |SELECT (SELECT lb FROM lastb) + k.s AS bucket, k.s AS step,
         |  (fin.l + k.s * fin.t
         |    + fin.se[(((SELECT lb FROM lastb) + k.s) % 7) + 1])::BIGINT
         |    AS forecast_fp,
         |  floor((fin.l + k.s * fin.t
         |    + fin.se[(((SELECT lb FROM lastb) + k.s) % 7) + 1])::DOUBLE
         |    / 1024.0 * 100.0 + 0.5) / 100.0 AS forecast_q2
         |FROM fin, unnest(range(1, 15)) AS k(s)
         |ORDER BY step""".stripMargin
    }
  )

    // north-star: classical additive seasonal decomposition — symmetric
    // range-window trend, centered hour-of-day seasonal indices, exact
    // q6 floored-division cells; one grid window + one phase aggregate.
  b.q(
    "events_decompose" -> ((s, dir) =>
      EventStream.decompose(events(s, dir), bucketSec = 3600L, period = 24)
        .orderBy(col("bucket")))
  )
  b.o(
    "events_decompose" ->
      """WITH g AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS b,
        |    count(*)::BIGINT AS x FROM events GROUP BY 1),
        |t AS (SELECT b, x,
        |    (sum(x) OVER (ORDER BY b RANGE BETWEEN 12 PRECEDING AND
        |      12 FOLLOWING) * 1000000)::BIGINT AS ts_,
        |    count(*) OVER (ORDER BY b RANGE BETWEEN 12 PRECEDING AND
        |      12 FOLLOWING)::BIGINT AS tc
        |  FROM g),
        |t2 AS (SELECT b, x,
        |    ((ts_ - ((ts_ % tc + tc) % tc)) // tc)::BIGINT AS trend_q6 FROM t),
        |t3 AS (SELECT b, x, trend_q6, (x * 1000000 - trend_q6)::BIGINT AS d,
        |    (b % 24)::BIGINT AS phase FROM t2),
        |p AS (SELECT phase, sum(d)::BIGINT AS sd, count(*)::BIGINT AS c
        |  FROM t3 GROUP BY 1),
        |p2 AS (SELECT phase,
        |    ((sd - ((sd % c + c) % c)) // c)::BIGINT AS sraw FROM p),
        |ctr AS (SELECT sum(sraw)::BIGINT AS gs, count(*)::BIGINT AS gc FROM p2),
        |ctr2 AS (SELECT ((gs - ((gs % gc + gc) % gc)) // gc)::BIGINT AS g_
        |  FROM ctr),
        |s AS (SELECT phase, (sraw - (SELECT g_ FROM ctr2))::BIGINT
        |    AS seasonal_q6 FROM p2)
        |SELECT t3.b AS bucket, t3.x, t3.phase, t3.trend_q6, s.seasonal_q6,
        |  (t3.d - s.seasonal_q6)::BIGINT AS remainder_q6
        |FROM t3 JOIN s USING (phase) ORDER BY bucket""".stripMargin
  )

    // north-star: median/MAD robust anomaly flag — lower-median
    // convention, exact integer dev*1000 > k*mad comparison.
  b.q(
    "events_robust_z" -> ((s, dir) =>
      EventStream.robustZ(events(s, dir), bucketSec = 86400L, kMilli = 1500L)
        .orderBy(col("bucket")))
  )
  b.o(
    "events_robust_z" ->
      """WITH g AS (SELECT (epoch_us(ts) // 1000000) // 86400 AS bucket,
        |    count(*)::BIGINT AS x FROM events GROUP BY 1),
        |r AS (SELECT bucket, x, row_number() OVER (ORDER BY x, bucket) AS rn,
        |    count(*) OVER () AS n FROM g),
        |m AS (SELECT x AS med FROM r WHERE rn = (n + 1) // 2),
        |d AS (SELECT bucket, x, (SELECT med FROM m) AS med,
        |    abs(x - (SELECT med FROM m))::BIGINT AS dev FROM g),
        |r2 AS (SELECT dev, row_number() OVER (ORDER BY dev, bucket) AS rn,
        |    count(*) OVER () AS n FROM d),
        |m2 AS (SELECT dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT bucket, x, med, (SELECT mad FROM m2) AS mad, dev,
        |  (dev * 1000 > 1500 * (SELECT mad FROM m2))::BIGINT AS flag
        |FROM d ORDER BY bucket""".stripMargin
  )

    // north-star: CUPED experiment readout — per-variant exact sums of
    // pre-period X / post-period Y plus the pooled theta as num/den;
    // the variance-reduced A/B number assembles downstream in floats.
  b.q(
    "events_cuped" -> ((s, dir) =>
      EventStream.cuped(events(s, dir), cutoff = "2024-01-15",
          variant = col("user_id") % 2)
        .orderBy(col("variant")))
  )
    // Pooled theta over ALL users' (x, y); signed, so num/den only.
  b.o(
    "events_cuped" ->
      """WITH per AS (SELECT user_id, user_id % 2 AS variant,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |  sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |  sum(x * x)::BIGINT AS sxx FROM per)
        |SELECT variant, count(*)::BIGINT AS n_users, sum(x)::BIGINT AS sum_x,
        |  sum(y)::BIGINT AS sum_y,
        |  (SELECT n * sxy - sx * sy FROM t)::BIGINT AS theta_num,
        |  (SELECT n * sxx - sx * sx FROM t)::BIGINT AS theta_den
        |FROM per GROUP BY variant ORDER BY variant""".stripMargin
  )

    // north-star: top entry paths — each user's first 3 events joined
    // into a path string, counted; deterministic (ts, event_id) order.
  b.q(
    "events_top_paths" -> ((s, dir) =>
      EventStream.topPaths(events(s, dir), n = 3, topK = 20))
  )
    // string_agg ordered by the same (ts, event_id) rank.
  b.o(
    "events_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*)::BIGINT AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path LIMIT 20""".stripMargin
  )

    // north-star: exact DAU / rolling-7 actives / stickiness — the
    // rolling distinct is a bounded ×7 fan-out of the (user, day) set,
    // never a per-day re-scan.
  b.q(
    "events_active_users" -> ((s, dir) =>
      EventStream.activeUsers(events(s, dir), windowDays = 7)
        .orderBy(col("day")))
  )
    // Rolling distinct = the same ×7 day fan-out of the distinct
    // (user, day) set, trimmed at the corpus max day. LEFT join from
    // rolling so zero-DAU engagement-gap days surface with dau = 0.
  b.o(
    "events_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 1000000 // 86400 AS d FROM events),
        |dau AS (SELECT d AS day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
        |mx AS (SELECT max(d) AS m FROM ud),
        |r AS (SELECT DISTINCT u, d + i AS day FROM ud, range(0, 7) t(i)),
        |rl AS (SELECT day, count(*)::BIGINT AS rolling FROM r
        |  WHERE day <= (SELECT m FROM mx) GROUP BY 1)
        |SELECT day, coalesce(dau, 0)::BIGINT AS dau, rolling,
        |  (coalesce(dau, 0) * 10000 // rolling)::BIGINT AS stickiness_bp
        |FROM rl LEFT JOIN dau USING (day) ORDER BY day""".stripMargin
  )

    // north-star: event concentration — top-10 heaviest users' share of
    // all events in basis points, with the cumulative curve.
  b.q(
    "events_concentration" -> ((s, dir) =>
      EventStream.concentration(events(s, dir), k = 10)
        .orderBy(col("rnk")))
  )
  b.o(
    "events_concentration" ->
      """WITH per AS (SELECT user_id, count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n_events)::BIGINT AS total FROM per),
        |top AS (SELECT user_id, n_events,
        |    row_number() OVER (ORDER BY n_events DESC, user_id) AS rnk
        |  FROM per ORDER BY n_events DESC, user_id LIMIT 10),
        |c AS (SELECT rnk, user_id, n_events,
        |  sum(n_events) OVER (ORDER BY rnk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM top)
        |SELECT rnk, user_id, n_events,
        |  (n_events * 10000 // (SELECT total FROM t))::BIGINT AS share_bp,
        |  (cum * 10000 // (SELECT total FROM t))::BIGINT AS cum_share_bp
        |FROM c ORDER BY rnk""".stripMargin
  )

    // north-star: sample-ratio-mismatch check — distinct users per
    // variant vs uniform, chi-square as exact num/den; the broken-
    // randomizer guard run before any experiment readout.
  b.q(
    "events_srm" -> ((s, dir) =>
      EventStream.srm(events(s, dir), variant = col("user_id") % 2))
  )
  b.o(
    "events_srm" ->
      """WITH u AS (SELECT DISTINCT user_id % 2 AS variant, user_id FROM events),
        |per AS (SELECT variant, count(*)::BIGINT AS n FROM u GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS tot FROM per)
        |SELECT k AS n_variants, tot AS n_units,
        |  sum((k * n - tot) * (k * n - tot))::BIGINT AS chi2_num,
        |  (k * tot)::BIGINT AS chi2_den
        |FROM per CROSS JOIN t GROUP BY k, tot""".stripMargin
  )

    // north-star: day-of-week × hour-of-day traffic profile — pure
    // integer calendar arithmetic, basis-point shares over the ≤168-row
    // grid.
  b.q(
    "events_seasonality" -> ((s, dir) =>
      EventStream.seasonality(events(s, dir))
        .orderBy(col("dow"), col("hod")))
  )
    // Arithmetic dow/hod (no calendar functions), grid-total shares.
  b.o(
    "events_seasonality" ->
      """WITH b AS (SELECT
        |    ((epoch_us(ts) // 1000000 // 86400) + 4) % 7 AS dow,
        |    (epoch_us(ts) // 1000000 // 3600) % 24 AS hod
        |  FROM events),
        |g AS (SELECT dow, hod, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT sum(n)::BIGINT AS total FROM g)
        |SELECT dow, hod, n, (n * 10000 // total)::BIGINT AS share_bp
        |FROM g CROSS JOIN t ORDER BY dow, hod""".stripMargin
  )

    // north-star: bot-regularity signals — per-user inter-event gap
    // moments and coefficient of variation; scripted clients show LOW cv
    // at high rate. The pre-training interaction-log hygiene filter.
  b.q(
    "events_bot_score" -> ((s, dir) =>
      EventStream.botSignals(events(s, dir), minGaps = 10)
        .orderBy(col("user_id")))
  )
    // Exact integer gap moments (gaps in clamped whole seconds), then
    // one rounded float formula each for mean and cv — the rel_corr
    // discipline; the cv numerator multiplies as doubles on both sides.
  b.o(
    "events_bot_score" ->
      """WITH g0 AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (SELECT user_id,
        |    least((epoch_us(ts) - epoch_us(prev)) // 1000000, 86400)::BIGINT AS gs
        |  FROM g0 WHERE prev IS NOT NULL),
        |a AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
        |    sum(gs)::BIGINT AS sg, sum(gs * gs)::BIGINT AS sgg
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_gaps,
        |  floor(sg::DOUBLE / n_gaps::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN
        |    floor(sqrt(n_gaps::DOUBLE * sgg::DOUBLE - sg::DOUBLE * sg::DOUBLE)
        |      / sg::DOUBLE * 10000.0 + 0.5) / 10000.0
        |  END AS cv_gap
        |FROM a WHERE n_gaps >= 10 ORDER BY user_id""".stripMargin
  )

    // north-star: last-touch attribution — each purchase credited to the
    // user's latest prior click's campaign (props.k % 10), organic = -1;
    // revenue in exact integer cents. One user-keyed asof shuffle.
  b.q(
    "events_attribution" -> ((s, dir) =>
      EventStream.lastTouchAttribution(events(s, dir), "purchase", "click",
          get_json_object(col("props"), "$.k").cast("long") % 10)
        .orderBy(col("campaign")))
  )
    // Decorrelated twin of the asof attribution: per purchase, the
    // latest prior click by (ts, event_id), ties at the purchase instant
    // inclusive; integer-cent revenue keeps the bucket sums exact.
  b.o(
    "events_attribution" ->
      """WITH conv AS (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id,
        |    json_extract_string(props, '$.k')::BIGINT % 10 AS camp
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT c.event_id AS ceid, c.value,
        |    (SELECT t.camp FROM t
        |     WHERE t.user_id = c.user_id AND t.ts <= c.ts
        |     ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS camp
        |  FROM conv c)
        |SELECT coalesce(camp, -1)::BIGINT AS campaign,
        |  count(*)::BIGINT AS n_conv,
        |  sum(floor(value * 100)::BIGINT)::BIGINT AS revenue_c
        |FROM a GROUP BY 1 ORDER BY campaign""".stripMargin
  )

    // north-star: conversation assembly — per-user chronological
    // transcript (first 16 turns) with span stats; the interaction-log →
    // training-dialogue primitive.
  b.q(
    "events_dialogs" -> ((s, dir) =>
      EventStream.assembleDialogs(events(s, dir), maxTurns = 16)
        .select(col("user_id"), col("n_turns"),
          unix_micros(col("first_ts")).as("first_us"),
          unix_micros(col("last_ts")).as("last_us"),
          col("span_sec"), col("transcript"))
        .orderBy(col("user_id")))
  )
    // Turn cap first (row_number <= 16 on the same (ts, event_id) total
    // order), then per-user assembly; span in whole seconds from
    // microsecond epochs.
  b.o(
    "events_dialogs" ->
      """WITH rk AS (SELECT user_id, event_type, ts, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
        |  FROM events),
        |c AS (SELECT * FROM rk WHERE turn <= 16)
        |SELECT user_id, count(*)::BIGINT AS n_turns,
        |  epoch_us(min(ts))::BIGINT AS first_us,
        |  epoch_us(max(ts))::BIGINT AS last_us,
        |  ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::BIGINT AS span_sec,
        |  string_agg(event_type, ' > ' ORDER BY ts, event_id) AS transcript
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin
  )

    // north-star: Kaplan-Meier signup→purchase survival with censoring
    // at study end — survival surfaced in exact-integer log space; the
    // one cumulative window runs over day buckets, never users.
  b.q(
    "events_kaplan_meier" -> ((s, dir) =>
      EventStream.kaplanMeier(events(s, dir), "signup", "purchase",
          bucketSec = 86400L)
        .orderBy(col("t")))
  )
    // KM estimator: entry = first signup, conversion = first purchase at
    // or after it, censoring at global max ts; survival as the running
    // exact-integer sum of per-bucket floor-quantized ln terms, null
    // from the first curve-zero bucket onward.
  b.o(
    "events_kaplan_meier" ->
      """WITH entry AS (SELECT user_id, min(ts) AS fts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (SELECT e.user_id, min(c.ts) AS tts FROM entry e
        |  JOIN events c ON c.user_id = e.user_id
        |    AND c.event_type = 'purchase' AND c.ts >= e.fts GROUP BY 1),
        |d AS (SELECT
        |    ((epoch_us(coalesce(c.tts, (SELECT max(ts) FROM events)))
        |      - epoch_us(e.fts)) // 1000000) // 86400 AS t,
        |    (c.tts IS NOT NULL)::BIGINT AS obs
        |  FROM entry e LEFT JOIN conv c USING (user_id)),
        |bt AS (SELECT t, count(*)::BIGINT AS n_all, sum(obs)::BIGINT AS n_event,
        |    sum(1 - obs)::BIGINT AS n_censored FROM d GROUP BY 1),
        |r AS (SELECT t, n_event, n_censored,
        |    ((SELECT sum(n_all) FROM bt)::BIGINT - coalesce(sum(n_all)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0))::BIGINT AS n_risk
        |  FROM bt),
        |q AS (SELECT t, n_risk, n_event, n_censored,
        |    CASE WHEN n_event > 0 AND n_event < n_risk THEN
        |      floor(ln((n_risk - n_event)::DOUBLE / n_risk::DOUBLE)
        |        * 1000000000.0)::BIGINT
        |    WHEN n_event = 0 THEN 0 END AS term,
        |    max(CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS dead
        |  FROM r)
        |SELECT t, n_risk, n_event, n_censored,
        |  (CASE WHEN dead = 0 THEN sum(term)
        |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  END)::BIGINT AS ln_surv_q9
        |FROM q ORDER BY t""".stripMargin
  )

    // north-star: difference-in-differences 2×2 readout — exact
    // per-cell user counts and cent sums, one rounded interaction term.
  b.q(
    "events_did" -> ((s, dir) =>
      EventStream.diffInDiff(events(s, dir), cutoff = "2024-01-15",
        variant = col("user_id") % 2))
  )
    // 2×2 DiD cells as exact integers; the interaction is the one
    // documented float formula, both engines dividing the SAME exact
    // cent/user integers.
  b.o(
    "events_did" ->
      """WITH per AS (SELECT user_id % 2 AS v,
        |    (ts >= TIMESTAMP '2024-01-15 00:00:00')::BIGINT AS post, user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS s
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT
        |  sum(CASE WHEN v = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS u00,
        |  sum(CASE WHEN v = 0 AND post = 0 THEN s ELSE 0 END)::BIGINT AS cents00,
        |  sum(CASE WHEN v = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS u01,
        |  sum(CASE WHEN v = 0 AND post = 1 THEN s ELSE 0 END)::BIGINT AS cents01,
        |  sum(CASE WHEN v = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS u10,
        |  sum(CASE WHEN v = 1 AND post = 0 THEN s ELSE 0 END)::BIGINT AS cents10,
        |  sum(CASE WHEN v = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS u11,
        |  sum(CASE WHEN v = 1 AND post = 1 THEN s ELSE 0 END)::BIGINT AS cents11
        |  FROM per)
        |SELECT u00, cents00, u01, cents01, u10, cents10, u11, cents11,
        |  CASE WHEN u00 > 0 AND u01 > 0 AND u10 > 0 AND u11 > 0 THEN
        |    floor(((cents11::DOUBLE / u11::DOUBLE - cents10::DOUBLE / u10::DOUBLE)
        |      - (cents01::DOUBLE / u01::DOUBLE - cents00::DOUBLE / u00::DOUBLE))
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS did_4dp
        |FROM w""".stripMargin
  )

    // north-star: dense gap-filled hourly value series with forward
    // fill — the equal-spacing primitive downstream forecasters need;
    // fills are flagged, never silent.
  b.q(
    "events_gapfill" -> ((s, dir) =>
      EventStream.gapFill(events(s, dir), bucketSec = 3600L)
        .orderBy(col("series"), col("t")))
  )
    // Dense spine per series, forward fill via IGNORE NULLS last_value;
    // fills flagged by observed = 0.
  b.o(
    "events_gapfill" ->
      """WITH sums AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM sums GROUP BY series),
        |j AS (SELECT sp.series, sp.t, sums.c
        |  FROM sp LEFT JOIN sums USING (series, t))
        |SELECT series, t,
        |  last_value(c IGNORE NULLS) OVER (PARTITION BY series ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cents,
        |  (c IS NOT NULL)::BIGINT AS observed
        |FROM j ORDER BY series, t""".stripMargin
  )

    // north-star: seasonal-naive forecast backtest vs the lag-1
    // persistence baseline — exact integer MAE pair per series plus the
    // ppm skill quotient; the is-seasonality-real meter.
  b.q(
    "events_snaive" -> ((s, dir) =>
      EventStream.snaiveBacktest(events(s, dir), bucketSec = 3600,
          season = 168)
        .orderBy(col("series")))
  )
    // Seasonal-naive vs lag-1 persistence on the densified count series;
    // evaluable rows are exactly those with the seasonal lag defined.
  b.o(
    "events_snaive" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |l AS (SELECT series, c,
        |    lag(c, 168) OVER (PARTITION BY series ORDER BY t) AS ls,
        |    lag(c, 1) OVER (PARTITION BY series ORDER BY t) AS l1
        |  FROM d)
        |SELECT series, count(*)::BIGINT AS n_eval,
        |  sum(abs(c - ls))::BIGINT AS mae_num, count(*)::BIGINT AS mae_den,
        |  sum(abs(c - l1))::BIGINT AS naive_num,
        |  (CASE WHEN sum(abs(c - l1)) > 0 THEN
        |    sum(abs(c - ls))::BIGINT * 1000000 // sum(abs(c - l1))::BIGINT
        |  END)::BIGINT AS skill_ppm
        |FROM l WHERE ls IS NOT NULL GROUP BY series ORDER BY series""".stripMargin
  )

    // north-star: Theil-Sen robust trend — the median pairwise slope
    // per daily series, surfaced as the selected pair's exact rational;
    // the pair stage is time-range-bounded, not data-bounded.
  b.q(
    "events_theilsen" -> ((s, dir) =>
      EventStream.theilSen(events(s, dir), bucketSec = 86400)
        .orderBy(col("series")))
  )
    // Median pairwise slope selected (never computed): pairs ordered by
    // the one-IEEE-division key with exact-integer tie-breaks, lower
    // median surfaced as its exact rational.
  b.o(
    "events_theilsen" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 86400 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |p AS (SELECT a.series, (b.c - a.c)::BIGINT AS num,
        |    (b.t - a.t)::BIGINT AS den, a.t AS t1
        |  FROM d a JOIN d b ON a.series = b.series AND a.t < b.t),
        |r AS (SELECT series, num, den,
        |    row_number() OVER (PARTITION BY series
        |      ORDER BY num::DOUBLE / den::DOUBLE, num, den, t1) AS rnk,
        |    count(*) OVER (PARTITION BY series) AS np
        |  FROM p)
        |SELECT series, np::BIGINT AS n_pairs, num AS med_num, den AS med_den
        |FROM r WHERE rnk = (np + 1) // 2 ORDER BY series""".stripMargin
  )

    // north-star: minimum-detectable-effect sizing readout for the
    // user_id%2 split — exact per-user cents moments, one documented
    // float formula.
  b.q(
    "events_mde" -> ((s, dir) =>
      EventStream.mdeReadout(events(s, dir), variant = col("user_id") % 2))
  )
    // Two-sample MDE at alpha=.05/power=.8 (z-sum literal 2.801585):
    // exact per-user cents moments, sample variances, pooled, sqrt.
  b.o(
    "events_mde" ->
      """WITH per AS (SELECT user_id % 2 AS v, user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS s
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |  sum(CASE WHEN v = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |  sum(CASE WHEN v = 0 THEN s ELSE 0 END)::BIGINT AS cents0,
        |  sum(CASE WHEN v = 0 THEN s * s ELSE 0 END)::BIGINT AS ss0,
        |  sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |  sum(CASE WHEN v = 1 THEN s ELSE 0 END)::BIGINT AS cents1,
        |  sum(CASE WHEN v = 1 THEN s * s ELSE 0 END)::BIGINT AS ss1
        |  FROM per),
        |f AS (SELECT n0, n1, cents0, cents1,
        |  2.801585 * sqrt((((n0::DOUBLE - 1.0)
        |      * ((n0::DOUBLE * ss0::DOUBLE - cents0::DOUBLE * cents0::DOUBLE)
        |        / (n0::DOUBLE * (n0::DOUBLE - 1.0)))
        |    + (n1::DOUBLE - 1.0)
        |      * ((n1::DOUBLE * ss1::DOUBLE - cents1::DOUBLE * cents1::DOUBLE)
        |        / (n1::DOUBLE * (n1::DOUBLE - 1.0))))
        |    / (n0::DOUBLE + n1::DOUBLE - 2.0))
        |    * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)) AS mde
        |  FROM w)
        |SELECT n0, n1, cents0, cents1,
        |  CASE WHEN n0 > 1 AND n1 > 1 THEN
        |    floor(mde * 100.0 + 0.5) / 100.0 END AS mde_cents_q2,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND cents0 > 0 THEN
        |    floor(mde / (cents0::DOUBLE / n0::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |  END AS mde_rel_q4
        |FROM f""".stripMargin
  )

    // north-star: deterministic Poisson bootstrap — 40 hash-seeded
    // resamples of the mean event value in ONE pass; error bars with
    // no data copies and no RNG state.
  b.q(
    "events_bootstrap_ci" -> ((s, dir) =>
      sample.bootstrapCI(events(s, dir), "value", "event_id", reps = 40)
        .orderBy(col("rep")))
  )
    // Hash-seeded Poisson multiplicities from the SAME injected CDF
    // literals; one pass, map-side collapse to 40 rows per task.
  b.o(
    "events_bootstrap_ci" -> {
      val h = graft.functions.hashing.sqlH32("(event_id::VARCHAR || '/boot')")
      val aff = graft.functions.hashing.sqlAffineVar("h", "rep")
      val p = graft.functions.hashing.AffineP
      val cdf = graft.ops.sample.PoissonCdf
      val w = cdf.zipWithIndex
        .map { case (t, k) => s"WHEN uu < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""WITH r AS (SELECT floor(value * 100)::BIGINT AS c, ($h)::BIGINT AS h,
         |    unnest(range(0, 40)) AS rep
         |  FROM events WHERE value IS NOT NULL),
         |u AS (SELECT rep, c, ($aff)::DOUBLE / $p.0 AS uu FROM r),
         |ww AS (SELECT rep, c, ($w)::BIGINT AS w FROM u),
         |a AS (SELECT rep, sum(w)::BIGINT AS n_eff,
         |    sum(w * c)::BIGINT AS cents FROM ww GROUP BY 1)
         |SELECT rep, n_eff, cents,
         |  CASE WHEN n_eff > 0 THEN
         |    floor(cents::DOUBLE / n_eff::DOUBLE * 10000.0) / 10000.0
         |  END AS mean_q4
         |FROM a ORDER BY rep""".stripMargin
    }
  )

    // north-star: weekly-cohort LTV triangle — exact cents accumulated
    // by cohort age, cohort-keyed window over domain-bounded cells.
  b.q(
    "events_cohort_ltv" -> ((s, dir) =>
      EventStream.cohortLtv(events(s, dir), bucketSec = 604800L)
        .orderBy(col("cohort"), col("age")))
  )
    // Cohort = first-event week, age = whole weeks since; exact cents,
    // cumulative over age, one floor-4dp per-user quotient.
  b.o(
    "events_cohort_ltv" ->
      """WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY 1),
        |aged AS (SELECT e.user_id,
        |    (epoch_us(f.fts) // 1000000) // 604800 AS cohort,
        |    ((epoch_us(e.ts) - epoch_us(f.fts)) // 1000000) // 604800 AS age,
        |    floor(coalesce(e.value, 0) * 100)::BIGINT AS c
        |  FROM events e JOIN f USING (user_id)),
        |cells AS (SELECT cohort, age, count(DISTINCT user_id)::BIGINT AS n_active,
        |    sum(c)::BIGINT AS cents FROM aged GROUP BY 1, 2),
        |sizes AS (SELECT (epoch_us(fts) // 1000000) // 604800 AS cohort,
        |    count(*)::BIGINT AS cohort_users FROM f GROUP BY 1),
        |cum AS (SELECT cohort, age, n_active, cents,
        |    sum(cents) OVER (PARTITION BY cohort ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cum_cents
        |  FROM cells)
        |SELECT c.cohort, c.age, c.n_active, c.cents, c.cum_cents,
        |  s.cohort_users,
        |  floor(c.cum_cents::DOUBLE / s.cohort_users::DOUBLE * 10000.0)
        |    / 10000.0 AS ltv_q4
        |FROM cum c JOIN sizes s USING (cohort)
        |ORDER BY cohort, age""".stripMargin
  )

    // north-star: per-day calibration drift — the streaming reliability
    // grid's batch twin (same reliabilityGrid code path the live
    // calibrationStream runs), finished to per-window ECE/MCE. The
    // scorer is a portable hash-derived probability so both engines
    // bin identical values.
  b.q(
    "events_calibration_drift" -> ((s, dir) => {
      val grid = EventStream.calibrationStream(events(s, dir),
        hashing.h32(col("user_id").cast("string")) % 1000001L,
        col("event_type") === "purchase", windowDur = "1 day", bins = 10)
      evals.eceFrom(
          grid.withColumn("day",
            date_format(col("win.start"), "yyyy-MM-dd")).drop("win"),
          Seq("day"))
        .orderBy(col("day"))
    })
  )
    // Per-day reliability grid folded to ECE/MCE; hash-derived scorer.
  b.o(
    "events_calibration_drift" ->
      s"""WITH sc AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |  (${hashing.sqlH32("user_id::VARCHAR")}) % 1000001 AS p,
         |  (event_type = 'purchase')::BIGINT AS y
         |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |b AS (SELECT day, least((p * 10) // 1000000, 9)::BIGINT AS bin,
         |  p, y FROM sc),
         |g AS (SELECT day, bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |  sum(p)::BIGINT AS conf_sum FROM b GROUP BY 1, 2),
         |gg AS (SELECT day, n,
         |  abs(pos * 1000000 - conf_sum)::BIGINT AS gap FROM g)
         |SELECT day, sum(n)::BIGINT AS n_total,
         |  (sum(gap) // sum(n))::BIGINT AS ece_ppm,
         |  max(gap // n)::BIGINT AS mce_ppm
         |FROM gg GROUP BY 1 ORDER BY day""".stripMargin
  )

    // north-star: per-day preference drift — the streaming win-rate
    // grid's batch twin (same winRateGrid path the live winRateStream
    // runs), finished to the ppm conventions. Scorers are portable
    // hash-derived so both engines compare identical integers.
  b.q(
    "events_winrate_drift" -> ((s, dir) => {
      val a = hashing.h32(concat(col("user_id").cast("string"), lit("a"))) % 1000L
      val b = hashing.h32(concat(col("user_id").cast("string"), lit("b"))) % 1000L
      evals.winRateFrom(
        EventStream.winRateStream(events(s, dir), a, b, windowDur = "1 day")
          .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
          .drop("win"),
        Seq("day")).orderBy(col("day"))
    })
  )
    // Per-day win/tie/loss of the two hash-derived scorers; truncating
    // ppm conventions identical to eval_winrate.
  b.o(
    "events_winrate_drift" ->
      s"""WITH sc AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |  (${hashing.sqlH32("user_id::VARCHAR || 'a'")}) % 1000 AS a,
         |  (${hashing.sqlH32("user_id::VARCHAR || 'b'")}) % 1000 AS b
         |  FROM events WHERE user_id IS NOT NULL),
         |g AS (SELECT day, count(*)::BIGINT AS n,
         |  sum((a > b)::BIGINT)::BIGINT AS wins,
         |  sum((a = b)::BIGINT)::BIGINT AS ties,
         |  sum((a < b)::BIGINT)::BIGINT AS losses FROM sc GROUP BY 1)
         |SELECT day, n, wins, ties, losses,
         |  (CASE WHEN n > 0 THEN wins * 1000000 // n END)::BIGINT AS win_ppm,
         |  (CASE WHEN n > 0 THEN (2 * wins + ties) * 1000000 // (2 * n)
         |   END)::BIGINT AS win_tie_ppm
         |FROM g ORDER BY day""".stripMargin
  )

    // north-star: session-scoped funnel — the ladder must complete in
    // one visit; one user-keyed exchange feeds tagging and steps.
  b.q(
    "events_session_funnel" -> ((s, dir) =>
      EventStream.sessionFunnel(events(s, dir),
          Seq("view", "click", "purchase"), gapMinutes = 30)
        .orderBy(col("step")))
  )
    // Session tagging replayed (lag + gap + cumsum), ladder per
    // (user, session), sessions counted per step.
  b.o(
    "events_session_funnel" ->
      """WITH t AS (SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        |  FROM events),
        |n AS (SELECT *, CASE WHEN pv IS NULL
        |      OR epoch_us(ts) - epoch_us(pv) > 1800000000 THEN 1 ELSE 0 END
        |    AS nw FROM t),
        |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM n),
        |u AS (SELECT user_id, s,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM sid GROUP BY 1, 2),
        |e1 AS (SELECT d.user_id, d.s, min(d.ts) AS t1 FROM sid d
        |  JOIN u ON d.user_id = u.user_id AND d.s = u.s
        |  WHERE d.event_type = 'click' AND d.ts >= u.t0 GROUP BY 1, 2),
        |e2 AS (SELECT d.user_id, d.s, min(d.ts) AS t2 FROM sid d
        |  JOIN e1 ON d.user_id = e1.user_id AND d.s = e1.s
        |  WHERE d.event_type = 'purchase' AND d.ts >= e1.t1 GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_sessions
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin
  )

    // north-star: first-order Markov predictability — majority next
    // event per state, exact bp accuracy; the is-this-stream-mechanical
    // meter.
  b.q(
    "events_markov_acc" -> ((s, dir) =>
      EventStream.markovPredictability(events(s, dir))
        .orderBy(col("prev_type")))
  )
    // Majority next-event per state over the same lag pairs; exact bp.
  b.o(
    "events_markov_acc" ->
      """WITH p AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev AS prev_type, event_type AS cur,
        |    count(*)::BIGINT AS n FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT prev_type, cur, n, row_number() OVER (
        |    PARTITION BY prev_type ORDER BY n DESC, cur) AS rk FROM c),
        |pr AS (SELECT prev_type, cur AS predicted, n AS n_correct
        |  FROM r WHERE rk = 1),
        |tot AS (SELECT prev_type, sum(n)::BIGINT AS n_total FROM c GROUP BY 1)
        |SELECT t.prev_type, pr.predicted, t.n_total, pr.n_correct,
        |  (pr.n_correct * 10000 // t.n_total)::BIGINT AS acc_bp
        |FROM tot t JOIN pr USING (prev_type)
        |ORDER BY prev_type""".stripMargin
  )

    // north-star: exact Gini over per-user value — the whole Lorenz
    // curve as one number, cumulative counts via the distributed
    // prefix-sum (no global window).
  b.q(
    "events_gini" -> ((s, dir) =>
      rel.gini(
        events(s, dir).groupBy(col("user_id"))
          .agg(sum(floor(col("value") * 100.0).cast("long")).as("_c")),
        col("_c")))
  )
    // Grouped-value Gini identity: cumulative counts over the distinct
    // value grid, one float chain over three exact integers.
  b.o(
    "events_gini" ->
      """WITH per AS (SELECT user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS c
        |  FROM events GROUP BY 1),
        |grid AS (SELECT c AS v, count(*)::BIGINT AS nv FROM per
        |  WHERE c IS NOT NULL AND c >= 0 GROUP BY 1),
        |cum AS (SELECT v, nv, coalesce(sum(nv) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS b
        |  FROM grid),
        |a AS (SELECT sum(nv)::BIGINT AS n, sum(v * nv)::BIGINT AS total,
        |    sum(v * (nv * b + (nv * (nv + 1)) // 2))::BIGINT AS r FROM cum)
        |SELECT n, total,
        |  CASE WHEN n > 0 AND total > 0 THEN
        |    floor((2.0 * r::DOUBLE - (n + 1)::DOUBLE * total::DOUBLE)
        |      / (n::DOUBLE * total::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |  END AS gini_q4
        |FROM a""".stripMargin
  )

    // north-star: funnel with a conversion deadline — purchase counts
    // only within an hour of the click; the unlimited funnel's numbers
    // sit alongside for the deadline's bite to be visible.
  b.q(
    "events_funnel_windowed" -> ((s, dir) =>
      EventStream.funnelWindowed(events(s, dir),
          Seq("view", "click", "purchase"), maxGapSec = 3600L)
        .orderBy(col("step")))
  )
    // Same greedy ladder as events_funnel plus the per-step deadline.
  b.o(
    "events_funnel_windowed" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM events GROUP BY user_id),
        |e1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= u.t0
        |    AND epoch_us(e.ts) - epoch_us(u.t0) <= 3600000000
        |  GROUP BY e.user_id),
        |e2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN e1 ON e.user_id = e1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= e1.t1
        |    AND epoch_us(e.ts) - epoch_us(e1.t1) <= 3600000000
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin
  )

    // north-star: hour-of-week seasonal anomaly screen — exact cell
    // stats, one float z chain, densified so silence is a reading too.
  b.q(
    "events_seasonal_anomaly" -> ((s, dir) =>
      EventStream.seasonalAnomaly(events(s, dir), zMin = 1.5)
        .orderBy(col("series"), col("t")))
  )
    // Hour-of-week cells over the densified hourly series; z is the one
    // float chain over exact integer cell stats.
  b.o(
    "events_seasonal_anomaly" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c,
        |    sp.t % 168 AS cell
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |st AS (SELECT series, cell, count(*)::BIGINT AS n,
        |    sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
        |  FROM d GROUP BY 1, 2),
        |z AS (SELECT d.series, d.t, d.c, d.cell,
        |    CASE WHEN (st.s2::DOUBLE / st.n::DOUBLE
        |        - (st.s1::DOUBLE / st.n::DOUBLE) * (st.s1::DOUBLE / st.n::DOUBLE))
        |        > 0.0 THEN
        |      floor((d.c::DOUBLE - st.s1::DOUBLE / st.n::DOUBLE)
        |        / sqrt(st.s2::DOUBLE / st.n::DOUBLE
        |          - (st.s1::DOUBLE / st.n::DOUBLE) * (st.s1::DOUBLE / st.n::DOUBLE))
        |        * 10000.0 + 0.5) / 10000.0
        |    END AS z_q4
        |  FROM d JOIN st USING (series, cell))
        |SELECT series, t, c, cell, z_q4 FROM z
        |WHERE abs(z_q4) >= 1.5 ORDER BY series, t""".stripMargin
  )

    // north-star: temporal drift gate — KS between the first and second
    // half-month of the event stream's value distribution (cents grid).
  b.q(
    "events_ks_drift" -> ((s, dir) => {
      val ev = events(s, dir)
      val cents = floor(col("value") * 100.0).cast("long")
      val cut = lit("2024-01-16").cast("timestamp")
      sample.ksStat(
        ev.where(col("ts") < cut), cents,
        ev.where(col("ts") >= cut), cents)
    })
  )
    // Same KS chain on the event stream's cents grid, split at the
    // mid-month cut.
  b.o(
    "events_ks_drift" ->
      """WITH ha AS (SELECT floor(value * 100.0)::BIGINT AS v,
        |    count(*)::BIGINT AS na FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'
        |  GROUP BY 1),
        |hb AS (SELECT floor(value * 100.0)::BIGINT AS v,
        |    count(*)::BIGINT AS nb FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16'
        |  GROUP BY 1),
        |m AS (SELECT coalesce(ha.v, hb.v) AS v,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v,
        |    sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb
        |  FROM m)
        |SELECT ta AS n_a, tb AS n_b,
        |  max(abs(ca * tb - cb * ta))::BIGINT AS ks_num,
        |  CASE WHEN ta > 0 AND tb > 0 THEN
        |    floor(max(abs(ca * tb - cb * ta))::DOUBLE
        |      / (ta::DOUBLE * tb::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ks_q6
        |FROM c GROUP BY 1, 2""".stripMargin
  )

    // north-star: per-day PSI against a pinned day-1 reference
    // histogram — histGrid snapshots (the streaming histDriftStream
    // path) finished by psiFrom; everything downstream of the two
    // grids is bin-bounded.
  b.q(
    "events_psi_drift" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val cents = floor(col("value") * 100.0).cast("long")
      val ref = sample.histGrid(
        ev.where(col("ts") < lit("2024-01-02").cast("timestamp")),
        cents, Seq.empty, binWidth = 1000L)
      val cur = EventStream.histDriftStream(ev, cents, binWidth = 1000L,
          windowDur = "1 day")
        .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
        .drop("win")
      sample.psiFrom(ref, cur, Seq("day")).orderBy(col("day"))
    })
  )
    // Per-day PSI vs the pinned day-1 reference: union bin domain per
    // day (days x ref-bins full-outer the per-day grid), add-one
    // smoothing over that domain, 1e-12 fixed-point terms.
  b.o(
    "events_psi_drift" ->
      """WITH ref AS (SELECT
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 1000.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nr
        |  FROM events WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-02' GROUP BY 1),
        |cur AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 1000.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nc
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |dom AS (SELECT day, bin, nr
        |  FROM (SELECT DISTINCT day FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(dom.day, cur.day) AS day,
        |    coalesce(dom.bin, cur.bin) AS bin,
        |    coalesce(nr, 0)::BIGINT AS nr, coalesce(nc, 0)::BIGINT AS nc
        |  FROM dom FULL OUTER JOIN cur
        |    ON dom.day = cur.day AND dom.bin = cur.bin),
        |t AS (SELECT day, sum(nr)::BIGINT AS tr, sum(nc)::BIGINT AS tc,
        |    count(*)::BIGINT AS vb FROM j GROUP BY 1),
        |terms AS (SELECT j.day, tc, vb,
        |    floor(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE)
        |        - (nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE))
        |      * ln(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE))
        |        / ((nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE)))
        |      * 1000000000000.0)::BIGINT AS term
        |  FROM j JOIN t USING (day))
        |SELECT day, max(tc)::BIGINT AS n_cur, max(vb)::BIGINT AS bins,
        |  floor(sum(term)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS psi_q6
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin
  )

    // north-star: per-day KS against the same pinned day-1 reference —
    // the second readout of the one histDriftStream sink ($1 bins for
    // CDF resolution); cross-multiplied integers, one division at the
    // quantized readout.
  b.q(
    "events_ks_daily" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val cents = floor(col("value") * 100.0).cast("long")
      val ref = sample.histGrid(
        ev.where(col("ts") < lit("2024-01-02").cast("timestamp")),
        cents, Seq.empty, binWidth = 100L)
      val cur = EventStream.histDriftStream(ev, cents, binWidth = 100L,
          windowDur = "1 day")
        .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
        .drop("win")
      sample.ksFrom(ref, cur, Seq("day")).orderBy(col("day"))
    })
  )
    // Per-day KS from the same union-domain grid chain, $1 bins.
  b.o(
    "events_ks_daily" ->
      """WITH ref AS (SELECT
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 100.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nr
        |  FROM events WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-02' GROUP BY 1),
        |cur AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 100.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nc
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |dom AS (SELECT day, bin, nr
        |  FROM (SELECT DISTINCT day FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(dom.day, cur.day) AS day,
        |    coalesce(dom.bin, cur.bin) AS bin,
        |    coalesce(nr, 0)::BIGINT AS nr, coalesce(nc, 0)::BIGINT AS nc
        |  FROM dom FULL OUTER JOIN cur
        |    ON dom.day = cur.day AND dom.bin = cur.bin),
        |c AS (SELECT day,
        |    sum(nr) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS ca,
        |    sum(nc) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cc,
        |    sum(nr) OVER (PARTITION BY day)::BIGINT AS tr,
        |    sum(nc) OVER (PARTITION BY day)::BIGINT AS tc
        |  FROM j)
        |SELECT day, tr AS n_ref, tc AS n_cur,
        |  max(abs(ca * tc - cc * tr))::BIGINT AS ks_num,
        |  CASE WHEN tr > 0 AND tc > 0 THEN
        |    floor(max(abs(ca * tc - cc * tr))::DOUBLE
        |      / (tr::DOUBLE * tc::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ks_q6
        |FROM c GROUP BY 1, 2, 3 ORDER BY day""".stripMargin
  )
}
