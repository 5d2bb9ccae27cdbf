package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** sketch-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object SketchRegistry extends Registry {

    // north-star: join-size estimate from Count-Min inner products —
    // the pre-join planner meter; touches depth×width sketch cells,
    // never the fact tables' join.
  b.q(
    "sketch_cm_join_size" -> ((s, dir) => {
      val a = sketch.countMin(table(s, dir, "lineitem"), col("l_orderkey"),
        depth = 4, width = 512)
      val b = sketch.countMin(table(s, dir, "orders"), col("o_orderkey"),
        depth = 4, width = 512)
      sketch.cmJoinSize(a, b, depth = 4, width = 512)
    })
  )
  b.o(
    "sketch_cm_join_size" ->
      s"""WITH ca AS (SELECT i AS row,
         |    ${hashing.sqlAffineVar(hashing.sqlH32("l_orderkey::VARCHAR"), "i")} % 512 AS bucket,
         |    count(*)::BIGINT AS cnt
         |  FROM lineitem, range(0, 4) r(i) GROUP BY 1, 2),
         |cb AS (SELECT i AS row,
         |    ${hashing.sqlAffineVar(hashing.sqlH32("o_orderkey::VARCHAR"), "i")} % 512 AS bucket,
         |    count(*)::BIGINT AS cnt
         |  FROM orders, range(0, 4) r(i) GROUP BY 1, 2),
         |ip AS (SELECT ca.row, sum(ca.cnt * cb.cnt)::BIGINT AS ip
         |  FROM ca JOIN cb USING (row, bucket) GROUP BY ca.row),
         |sp AS (SELECT i AS row FROM range(0, 4) r(i))
         |SELECT min(coalesce(ip, 0))::BIGINT AS join_size_est
         |FROM sp LEFT JOIN ip USING (row)""".stripMargin
  )

    // north-star: heavy hitters via the native Misra–Gries mergeable
    // aggregate — constant capacity-entry state per partial buffer, so
    // the exchange carries one small map per map task instead of the
    // item universe. capacity 256 ≥ the 150 distinct users ⇒ the exact
    // regime, where MG output equals the exact group-count top-N the
    // oracle computes (the N/(k+1) undercount bound beyond that regime
    // is SketchSpec's job — DuckDB has no MG to compare against).
  b.q(
    "sketch_heavyhitters" -> ((s, dir) =>
      // capacity 4096 >= distinct users at EVERY test sf (sf0.1 has
      // 1500): the oracle is an exact GROUP BY, and MG only equals it —
      // independent of Spark's partial-merge order — in the exact
      // (no-eviction) regime. The round-9 sf0.1 sweep caught capacity
      // 256 silently leaving that regime above sf0.01. The eviction
      // regime stays exercised where exactness isn't hashed: SketchSpec
      // error-bound asserts + the 10x/30x rehearsals at capacity 256.
      sketch.heavyHitters(table(s, dir, "events"), col("user_id"),
        capacity = 4096, topN = 20))
  )
    // exact regime (capacity ≥ distinct users): MG counts are exact
  b.o(
    "sketch_heavyhitters" ->
      """SELECT user_id::VARCHAR AS item, count(*)::BIGINT AS est_count
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY est_count DESC, item LIMIT 20""".stripMargin
  )

    // north-star: per-group heavy hitters — one MG summary per group;
    // the per-group top-N is a row-local slice of the already-sorted
    // summary, no second shuffle.
  b.q(
    "sketch_heavyhitters_by" -> ((s, dir) =>
      sketch.heavyHittersBy(table(s, dir, "events"), Seq("event_type"),
          col("user_id"), capacity = 4096, topN = 5)
        .orderBy(col("event_type"), col("est_count").desc, col("item")))
  )
  b.o(
    "sketch_heavyhitters_by" ->
      """WITH c AS (SELECT event_type, user_id::VARCHAR AS item,
        |    count(*)::BIGINT AS est_count
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY est_count DESC, item) AS rk FROM c)
        |SELECT event_type, item, est_count FROM r WHERE rk <= 5
        |ORDER BY event_type, est_count DESC, item""".stripMargin
  )

    // north-star: WEIGHTED heavy hitters — top users by total event
    // VALUE (micros, exact integer weights), not event count. Exact
    // regime again (capacity ≥ distinct users), so MG totals equal the
    // exact group sums.
  b.q(
    "sketch_heavyhitters_weighted" -> ((s, dir) =>
      sketch.heavyHittersWeighted(
        table(s, dir, "events").where(col("value").isNotNull),
        col("user_id"), floor(col("value") * 1000000.0).cast("long"),
        capacity = 4096, topN = 20))
  )
  b.o(
    "sketch_heavyhitters_weighted" ->
      """SELECT user_id::VARCHAR AS item,
        |  sum(greatest(floor(value * 1000000.0)::BIGINT, 0))::BIGINT AS est_weight
        |FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1 HAVING est_weight > 0
        |ORDER BY est_weight DESC, item LIMIT 20""".stripMargin
  )

    // north-star: mergeable moments sketch — exact power sums per
    // event type plus the quantized skewness read.
  b.q(
    "sketch_moments" -> ((s, dir) =>
      graft.ops.sketch.moments(events(s, dir), "value",
          Seq("event_type"), q = 1.0)
        .orderBy(col("event_type")))
  )
    // Exact power sums of floor(value) per type; skewness is the one
    // engine-identical float chain over them.
  b.o(
    "sketch_moments" ->
      """WITH b AS (SELECT event_type, floor(value * 1.0)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS s1,
        |    sum(v * v)::BIGINT AS s2, sum(v * v * v)::BIGINT AS s3
        |  FROM b GROUP BY 1)
        |SELECT event_type, n, s1, s2, s3,
        |  CASE WHEN n > 0 AND (s2::DOUBLE / n::DOUBLE
        |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)) > 0.0 THEN
        |    floor((s3::DOUBLE / n::DOUBLE
        |        - 3.0 * (s1::DOUBLE / n::DOUBLE) * (s2::DOUBLE / n::DOUBLE)
        |        + 2.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |          * (s1::DOUBLE / n::DOUBLE))
        |      / ((s2::DOUBLE / n::DOUBLE
        |          - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
        |        * sqrt(s2::DOUBLE / n::DOUBLE
        |          - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)))
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS skew_q4
        |FROM a ORDER BY event_type""".stripMargin
  )
}
