package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream operators, written once against the unified
  * batch/streaming DataFrame surface: the same function builds the plan
  * for a parquet batch (driver correctness checks, backfills) and for a
  * `readStream` source with watermarked state (production). The reference
  * engine has no streaming at all (SURVEY.md §2.8) — north-star extension.
  *
  * Scale notes: both aggregations shuffle once on (window/user, key) —
  * uniformly distributed keys; Structured Streaming keeps state per key
  * and the watermark bounds it (late events beyond the horizon drop, state
  * for closed windows evicts), so state size is O(active keys), not
  * O(stream length).
  */
object EventStream {

  /** Tumbling-window counts/sums per event type. For a streaming input
    * set `watermark` (e.g. "10 minutes") so window state can close; leave
    * it None for batch. Emits (window_start, event_type, n_events,
    * sum_value). */
  def windowedAgg(
      events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    src
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"),
        // Fixed-point companion: double sums depend on partition merge
        // order in the last ulps; the floored-micros long sum is exact and
        // therefore identical on every run and every engine.
        sum(floor(col("value") * 1e6).cast("long")).as("sum_value_micros"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("sum_value_micros"))
  }

  /** Gap-based sessionization: consecutive events of a user belong to one
    * session while gaps stay under `gapMinutes`. Classic two-pass window
    * plan (lag → gap flag → running sum = session index), one shuffle on
    * user_id. Emits one row per session: (user_id, session_idx,
    * session_start, session_end, n_events, sum_value). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L,
          1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
  }

  /** Extract a typed field from the JSON `props` payload — shuffle-free
    * scan work (`get_json_object` is a codegen expression). */
  def propInt(name: String): org.apache.spark.sql.Column =
    get_json_object(col("props"), s"$$.$name").cast("int")
}
