package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.asof

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: clicks at :00 and :10, purchases at :05 and :10 (equal-ts match)
  // user 2: purchase before any click -> null payload
  private val purchases = Seq(
    (100L, 1L, ts("2024-01-01 10:00:05"), 9.99),
    (101L, 1L, ts("2024-01-01 10:00:10"), 5.00),
    (102L, 2L, ts("2024-01-01 10:00:01"), 1.23)
  ).toDF("event_id", "user_id", "ts", "value")

  private val clicks = Seq(
    (1L, ts("2024-01-01 10:00:00"), 200L, 0.1),
    (1L, ts("2024-01-01 10:00:10"), 201L, 0.2),
    (2L, ts("2024-01-01 10:00:30"), 202L, 0.3)
  ).toDF("user_id", "ts", "click_id", "click_value")

  test("asofJoin picks latest right at-or-before each left row; inclusive ties") {
    val r = asof.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
      .select("event_id", "click_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(r(100L) == Some(200L)) // click :00 precedes purchase :05
    assert(r(101L) == Some(201L)) // equal ts matches inclusively
    assert(r(102L) == None)       // no click before user 2's purchase
  }

  test("all payload fields come from the same right row") {
    val r = asof.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
      .where(col("event_id") === 101L).head()
    assert(r.getAs[Long]("click_id") == 201L &&
      math.abs(r.getAs[Double]("click_value") - 0.2) < 1e-12)
  }

  test("duplicate right rows at one (key, ts) resolve to the greatest payload") {
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 300L, 0.5),
      (1L, ts("2024-01-01 10:00:00"), 301L, 0.4)
    ).toDF("user_id", "ts", "click_id", "click_value")
    val r = asof.asofJoin(purchases.where(col("event_id") === 100L), dup,
      "user_id", "ts", Seq("click_id", "click_value")).head()
    assert(r.getAs[Long]("click_id") == 301L)
  }

  test("payload name collisions are rejected") {
    intercept[IllegalArgumentException] {
      asof.asofJoin(purchases, clicks.withColumnRenamed("click_id", "value"),
        "user_id", "ts", Seq("value"))
    }
  }

  test("rangeJoin: inclusive bounds, bucket-boundary pairs survive, out-of-range dropped") {
    // window [-10s, 0]; left at :20 — right rows at :10 (boundary, in),
    // :09.999999 (just out), :15 (in, different bucket than :20), :20
    // (equal ts, in), :21 (after, out)
    val l = Seq((1L, 7L, ts("2024-01-01 00:00:20"))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (7L, ts("2024-01-01 00:00:10"), 900L),
      (7L, Timestamp.valueOf("2024-01-01 00:00:09.999999"), 901L),
      (7L, ts("2024-01-01 00:00:15"), 902L),
      (7L, ts("2024-01-01 00:00:20"), 903L),
      (7L, ts("2024-01-01 00:00:21"), 904L),
      (8L, ts("2024-01-01 00:00:20"), 905L) // right user, wrong key
    ).toDF("user_id", "ts", "click_id")
    val got = asof.rangeJoin(l, r, Seq("user_id"), "ts",
      -10L * 1000000, 0L, Seq("click_id"))
      .select("click_id").as[Long].collect().toSet
    assert(got == Set(900L, 902L, 903L))
  }

  test("rangeJoin plans as an equi-join on (key, bucket), not a nested loop") {
    val l = purchases
    val r = clicks.select(col("user_id"), col("ts"), col("click_id"))
    val p = asof.rangeJoin(l, r, Seq("user_id"), "ts", -60000000L, 0L, Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
  }

  test("plan: one exchange on the key, no cartesian/range explosion") {
    val p = asof.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(600))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges\n${p.take(800)}")
  }
}
