package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** rel-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object RelRegistry extends Registry {

    // north-star: categorical mutual information (lang vs source) —
    // the column-leakage / skew audit; exact contingency grid, q12
    // ln terms, 6-dp nats.
  b.q(
    "rel_mutual_info" -> ((s, dir) =>
      rel.mutualInfo(table(s, dir, "documents"), col("lang"),
        col("source")))
  )
    // MI/entropies on the corpusDivergence quantization convention:
    // q12 floor per cell, long sums, 6-dp quantized nats.
  b.o(
    "rel_mutual_info" ->
      """WITH b AS (SELECT lang AS a, source AS bb FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT a, bb, count(*)::BIGINT AS nij FROM b GROUP BY 1, 2),
        |na AS (SELECT a, sum(nij)::BIGINT AS na FROM g GROUP BY 1),
        |nb AS (SELECT bb, sum(nij)::BIGINT AS nb FROM g GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT AS n,
        |  count(DISTINCT a)::BIGINT AS a_card,
        |  count(DISTINCT bb)::BIGINT AS b_card FROM g),
        |mi AS (SELECT sum(floor((g.nij::DOUBLE / t.n)
        |    * ln((g.nij::DOUBLE * t.n) / (na.na::DOUBLE * nb.nb))
        |    * 1e12))::BIGINT AS smi
        |  FROM g JOIN na ON g.a = na.a JOIN nb ON g.bb = nb.bb CROSS JOIN t),
        |ha AS (SELECT sum(floor((na::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / na) * 1e12))::BIGINT AS sha
        |  FROM na CROSS JOIN t),
        |hb AS (SELECT sum(floor((nb::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / nb) * 1e12))::BIGINT AS shb
        |  FROM nb CROSS JOIN t)
        |SELECT n, a_card, b_card,
        |  floor(sha::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_a,
        |  floor(shb::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_b,
        |  floor(smi::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS mi,
        |  CASE WHEN greatest(sha, shb) > 0 THEN
        |    floor(smi::DOUBLE / greatest(sha, shb)::DOUBLE * 1000000.0 + 0.5)
        |      / 1000000.0 END AS nmi
        |FROM t, mi, ha, hb""".stripMargin
  )

    // north-star: chi-square independence + Cramér's V (lang vs source)
    // — the significance/effect-size companion to rel_mutual_info; one
    // exact DECIMAL quotient per contingency cell.
  b.q(
    "rel_chi_square" -> ((s, dir) =>
      rel.chiSquare(table(s, dir, "documents"), col("lang"),
        col("source")))
  )
  b.o(
    "rel_chi_square" ->
      """WITH b AS (SELECT lang AS a, source AS bb FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT a, bb, count(*)::BIGINT AS nij FROM b GROUP BY 1, 2),
        |na AS (SELECT a, sum(nij)::BIGINT AS na FROM g GROUP BY 1),
        |nb AS (SELECT bb, sum(nij)::BIGINT AS nb FROM g GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT AS n,
        |  count(DISTINCT a)::BIGINT AS a_card,
        |  count(DISTINCT bb)::BIGINT AS b_card FROM g),
        |s AS (SELECT sum((g.nij::HUGEINT * g.nij * 1000000000000)
        |    // (na.na::HUGEINT * nb.nb))::HUGEINT AS sq12
        |  FROM g JOIN na ON g.a = na.a JOIN nb ON g.bb = nb.bb),
        |f AS (SELECT n, a_card, b_card,
        |  (a_card - 1) * (b_card - 1) AS dof,
        |  ((n::HUGEINT * greatest(sq12 - 1000000000000, 0)) // 1000000)::BIGINT
        |    AS chi2_q6
        |  FROM t, s)
        |SELECT n, a_card, b_card, dof, chi2_q6,
        |  CASE WHEN n > 0 AND least(a_card, b_card) > 1 THEN
        |    floor(sqrt(chi2_q6::DOUBLE / 1e6
        |      / (n::DOUBLE * (least(a_card, b_card) - 1)::DOUBLE))
        |      * 10000.0 + 0.5) / 10000.0 END AS cramers_v_q4
        |FROM f""".stripMargin
  )

    // relational coverage a pipeline needs around the vector core: grouped
    // aggregation (Q1 shape) — doubles summed as exact fixed-point cents.
  b.q(
    "rel_groupby_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("revenue_cents"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
  b.o(
    "rel_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity)::BIGINT AS sum_qty,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS revenue_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

    // north-star scale pattern: skew-salted equi-join — the hot key's
    // rows spread over (key, salt) reducers; result equals the plain
    // join, proven by the oracle's unsalted SQL.
  b.q(
    "rel_salted_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_custkey"))
      rel.saltedJoin(li, ords, "okey", saltBy = "l_linenumber", salts = 4)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("o_custkey"))
    })
  )
    // The UNSALTED join — salting must be result-invisible.
  b.o(
    "rel_salted_join" ->
      """SELECT o_custkey, count(*) AS n_items, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )

    // north-star: corpus snapshot diff (dataset versioning). Version B
    // is synthesized from A: every 17th doc removed, every 13th kept doc
    // edited, every 19th doc re-added under a shifted id — exercising
    // all four statuses with a deterministic fixture.
  b.q(
    "rel_snapshot_diff" -> ((s, dir) => {
      val aV = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val bV = aV.where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(aV.where(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      rel.snapshotDiff(aV, bV, "doc_id", "text")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("status"))
    })
  )
    // Same synthesized version-B fixture; the diff is replayed as a
    // full outer join comparing the text directly (the op compares
    // 128-bit fingerprints — equality is equality either way).
  b.o(
    "rel_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 19 = 0),
        |d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.text = b.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT status, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM d GROUP BY status ORDER BY status""".stripMargin
  )

    // north-star: one-pass column profile — per-column rows/nulls/exact
    // distincts/min/max from a single aggregation job + stack unpivot.
  b.q(
    "rel_profile" -> ((s, dir) =>
      rel.profileColumns(table(s, dir, "orders"),
          Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
        .orderBy(col("column")))
  )
    // Per-column profile re-derived as one UNION ALL branch per column;
    // min/max compared as strings only for canonical-format types.
  b.o(
    "rel_profile" -> {
      def branch(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
           |FROM orders""".stripMargin
      Seq("o_custkey", "o_orderpriority", "o_orderstatus")
        .map(branch).mkString("", "\nUNION ALL ", "\nORDER BY \"column\"")
    }
  )

    // broadcast dimension join + top-n aggregate.
  b.q(
    "rel_join_topn" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("spend_cents"))
        .orderBy(col("spend_cents").desc, col("c_custkey"))
        .limit(10)
    })
  )
  b.o(
    "rel_join_topn" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS spend_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY spend_cents DESC, c_custkey LIMIT 10""".stripMargin
  )

    // fact-to-fact join over PERSISTED bucket layouts — both scans are
    // co-partitioned on their join keys, so the join plans no exchange
    // (asserted in RelSpec); revenue quantized per-row, summed as longs.
  b.q(
    "rel_bucketed_join" -> ((s, dir) => {
      val (liT, ordT) = bucketedTables(s, dir)
      s.table(liT).join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("rev_cents"))
        .orderBy(col("o_orderpriority"))
    })
  )
    // The UNBUCKETED join — bucketing is a layout choice and must be
    // result-invisible, exactly like salting.
  b.o(
    "rel_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(floor(((l_extendedprice * (1 - l_discount)) * 100.0) + 0.5)::BIGINT)::BIGINT
        |    AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )

    // CUBE: all 2^k facet marginals in the same one-pass Expand shape.
  b.q(
    "rel_cube" -> ((s, dir) =>
      rel.cubeAgg(table(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
  b.o(
    "rel_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

    // explicit grouping sets — the two independent marginals plus the
    // grand total, none of the cross cells: one Expand pass, one scan.
  b.q(
    "rel_grouping_sets" -> ((s, dir) =>
      rel.groupingSetsAgg(table(s, dir, "lineitem"),
          Seq(Seq("l_returnflag"), Seq("l_linestatus"), Seq.empty),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
  b.o(
    "rel_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

    // per-group Pearson correlation from EXACT fixed-point moments —
    // order-free long sums; the float formula runs once per group.
  b.q(
    "rel_corr" -> ((s, dir) =>
      rel.corrExact(table(s, dir, "lineitem"), "l_quantity", "l_discount",
          Seq("l_returnflag"), xScale = 1.0, yScale = 10000.0)
        .orderBy(col("l_returnflag")))
  )
    // Five exact integer moments (DuckDB sums BIGINT into HUGEINT —
    // still exact; the double conversion of equal integers is identical),
    // one float formula per group.
  b.o(
    "rel_corr" ->
      """WITH q AS (SELECT l_returnflag,
        |  floor(l_quantity * 1.0 + 0.5)::BIGINT AS xq,
        |  floor(l_discount * 10000.0 + 0.5)::BIGINT AS yq FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |a AS (SELECT l_returnflag, count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
        |  sum(xq*yq) AS sxy, sum(xq*xq) AS sxx, sum(yq*yq) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n > 1 AND (n*sxx - sx*sx)::DOUBLE > 0 AND (n*syy - sy*sy)::DOUBLE > 0
        |    THEN floor((n*sxy - sx*sy)::DOUBLE
        |      / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |  END AS corr
        |FROM a ORDER BY l_returnflag""".stripMargin
  )

    // pivot long→wide with an EXPLICIT value domain — no distinct
    // discovery pass over the table; one groupBy shuffle of
    // groups × values cells (quantities are integral, so the double sums
    // are exact and order-free).
  b.q(
    "rel_pivot" -> ((s, dir) =>
      rel.pivotAgg(table(s, dir, "lineitem"), "l_returnflag", "l_linestatus",
          Seq("F", "O"), "l_quantity")
        .select(col("l_returnflag"),
          col("F").cast("long").as("qty_f"),
          col("O").cast("long").as("qty_o"))
        .orderBy(col("l_returnflag")))
  )
  b.o(
    "rel_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)::BIGINT AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)::BIGINT AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )

    // ROLLUP subtotals at every prefix level + grand total in ONE
    // Expand+agg pass (no per-level rescans).
  b.q(
    "rel_rollup" -> ((s, dir) =>
      rel.rollupAgg(table(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
  b.o(
    "rel_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

    // north-star: declarative data-quality gate — four constraints over
    // orders, ONE aggregation pass (a per-rule loop would scan 4×);
    // null predicates count as violations (three-valued logic fence).
  b.q(
    "rel_check_rules" -> ((s, dir) =>
      rel.checkRules(table(s, dir, "orders"), Seq(
          "o1_pk_nonnull" -> col("o_orderkey").isNotNull,
          "o2_price_band" -> (col("o_totalprice") > 0.0 && col("o_totalprice") < 400000.0),
          "o3_status_domain" -> col("o_orderstatus").isin("F", "O", "P"),
          "o4_urgent" -> (col("o_orderpriority") === "1-URGENT")))
        .orderBy(col("rule")))
  )
    // Violation = NOT coalesce(pred, false): the identical three-valued
    // fence the Spark op applies.
  b.o(
    "rel_check_rules" ->
      s"""WITH w AS (SELECT count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, false) THEN 1 ELSE 0 END)::BIGINT AS v1,
         |  sum(CASE WHEN NOT coalesce(o_totalprice > 0.0 AND o_totalprice < 400000.0, false) THEN 1 ELSE 0 END)::BIGINT AS v2,
         |  sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F', 'O', 'P'), false) THEN 1 ELSE 0 END)::BIGINT AS v3,
         |  sum(CASE WHEN NOT coalesce(o_orderpriority = '1-URGENT', false) THEN 1 ELSE 0 END)::BIGINT AS v4
         |  FROM orders),
         |u AS (SELECT 'o1_pk_nonnull' AS rule, n_rows, v1 AS n_viol FROM w
         |  UNION ALL SELECT 'o2_price_band', n_rows, v2 FROM w
         |  UNION ALL SELECT 'o3_status_domain', n_rows, v3 FROM w
         |  UNION ALL SELECT 'o4_urgent', n_rows, v4 FROM w)
         |SELECT rule, n_rows, n_viol,
         |  ${r4("CASE WHEN n_rows > 0 THEN n_viol::DOUBLE / n_rows::DOUBLE ELSE 0.0 END")} AS viol_rate
         |FROM u ORDER BY rule""".stripMargin
  )

    // north-star: key-skew diagnostic — heaviest keys with share, skew
    // factor vs the mean key, and the saltedJoin salt count they'd need.
  b.q(
    "rel_skew_probe" -> ((s, dir) =>
      rel.skewProbe(table(s, dir, "documents"), "lang", topN = 5)
        .orderBy(col("cnt").desc, col("key")))
  )
  b.o(
    "rel_skew_probe" ->
      s"""WITH c AS (SELECT coalesce(lang, 'NULL') AS key, count(*)::BIGINT AS cnt
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM c)
         |SELECT key, cnt,
         |  ${r4("cnt * 100.0 / total")} AS share_pct,
         |  ${r4("(cnt * n_keys) / total::DOUBLE")} AS skew,
         |  ceil((cnt * n_keys) / total::DOUBLE)::INT AS rec_salts
         |FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 5""".stripMargin
  )

    // north-star: deterministic dense global row index with NO
    // single-partition window — range exchange (reused across the rank
    // and offset branches) + partition-count-bounded offset cumsum.
  b.q(
    "rel_zip_index" -> ((s, dir) =>
      rel.zipIndex(table(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id")
        .select(col("doc_id"), col("idx"))
        .orderBy(col("doc_id")))
  )
    // The naive global-order window IS the semantics — the Spark side
    // just refuses to execute it single-partition.
  b.o(
    "rel_zip_index" ->
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |FROM documents ORDER BY doc_id""".stripMargin
  )

    // north-star: bloom-prefiltered join — the explicit runtime-filter
    // idiom: a driver-held bloom over the rare orders' keys guards the
    // lineitem scan, so only possibly-matching rows pay the join
    // shuffle; false positives die in the exact join (result identical
    // to the plain join — that IS the oracle).
  b.q(
    "rel_bloom_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_quantity"))
      val ords = table(s, dir, "orders").where(col("o_totalprice") > 480000.0)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      rel.bloomJoin(li, ords, "okey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    })
  )
    // The UNFILTERED exact join — the bloom prefilter must be
    // result-invisible, exactly like salting and bucketing.
  b.o(
    "rel_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 480000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )

    // north-star: CDC apply — yesterday's snapshot + today's
    // upsert/delete log = today's table, latest-change-wins per key;
    // the log shuffles (rank-filter idiom), the snapshot joins once.
    // Fixture: lang upserts at ts=2 for doc_id%10, deletes at ts=1 for
    // doc_id%7 — %70 docs carry BOTH, and the later upsert must win.
  b.q(
    "rel_cdc_apply" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val snap = docs.select(col("doc_id"), col("lang"), col("source"))
      val ups = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("xx").as("lang"), col("source"),
          lit(2).as("ts"), lit("upsert").as("op"))
      val dels = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"), col("source"),
          lit(1).as("ts"), lit("delete").as("op"))
      rel.cdcApply(snap, ups.unionByName(dels), "doc_id")
        .orderBy(col("doc_id"))
    })
  )
  b.o(
    "rel_cdc_apply" ->
      """WITH ch AS (
        |  SELECT doc_id, 'xx' AS lang, source, 2 AS ts, 'upsert' AS op
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, source, 1, 'delete'
        |  FROM documents WHERE doc_id % 7 = 0),
        |latest AS (SELECT * FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY doc_id ORDER BY ts DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT coalesce(s.doc_id, l.doc_id) AS doc_id,
        |  CASE WHEN l.doc_id IS NOT NULL THEN l.lang ELSE s.lang END AS lang,
        |  CASE WHEN l.doc_id IS NOT NULL THEN l.source ELSE s.source END AS source
        |FROM documents s FULL OUTER JOIN latest l ON s.doc_id = l.doc_id
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY doc_id""".stripMargin
  )

    // north-star: ANSI/Delta-style MERGE with all three clauses and SQL
    // precedence (matched DELETE before unconditional UPDATE; INSERT for
    // source-only keys). Source: keys %10==0 / %15==0 carry 'U'/'D'
    // status at half price; shifted keys (+1 of %10==3) mostly insert —
    // the ones landing on real orders exercise update-despite-'I'.
  b.q(
    "rel_merge" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val srcUd = table(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 15 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 15 === 0, lit("D")).otherwise(lit("U"))
            .as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"))
      val srcIns = table(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 3)
        .select((col("o_orderkey") + 1).as("o_orderkey"),
          lit("I").as("o_orderstatus"), col("o_totalprice"))
      rel.merge(o, srcUd.unionByName(srcIns), Seq("o_orderkey"),
          whenMatchedUpdate = Some(lit(true)),
          whenMatchedDelete = Some(col("s.o_orderstatus") === "D"),
          whenNotMatchedInsert = Some(lit(true)))
        .orderBy(col("o_orderkey"))
    })
  )
    // Clause-by-clause replay of the MERGE: target-only rows survive,
    // matched rows delete on 'D' else take source values, source-only
    // rows insert. Keys are unique in every branch, so UNION ALL + sort
    // is deterministic.
  b.o(
    "rel_merge" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 15 = 0 THEN 'D' ELSE 'U' END AS o_orderstatus,
        |    o_totalprice / 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1, 'I', o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |kept AS (
        |  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        |  FROM orders o LEFT JOIN src s USING (o_orderkey)
        |  WHERE s.o_orderkey IS NULL),
        |upd AS (
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
        |  FROM src s JOIN orders o USING (o_orderkey)
        |  WHERE s.o_orderstatus <> 'D'),
        |ins AS (
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
        |  FROM src s LEFT JOIN orders o USING (o_orderkey)
        |  WHERE o.o_orderkey IS NULL)
        |SELECT * FROM (
        |  SELECT * FROM kept UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY o_orderkey""".stripMargin
  )

    // north-star: referential-integrity audit — lineitems orphaned by a
    // half-missing orders parent; the distinct-key anti-join reduces the
    // parent to thin keys in-scan, and the data card aggregates the
    // orphan rows.
  b.q(
    "rel_fk_orphans" -> ((s, dir) =>
      rel.fkOrphans(table(s, dir, "lineitem"),
          table(s, dir, "orders").where(col("o_orderkey") % 2 === 0),
          Seq("l_orderkey"), Seq("o_orderkey"))
        .agg(count(lit(1)).as("n_orphans"),
          countDistinct(col("l_orderkey")).as("n_orphan_keys"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key")))
  )
  b.o(
    "rel_fk_orphans" ->
      """SELECT count(*)::BIGINT AS n_orphans,
        |  count(DISTINCT l.l_orderkey)::BIGINT AS n_orphan_keys,
        |  min(l.l_orderkey) AS min_key, max(l.l_orderkey) AS max_key
        |FROM lineitem l LEFT JOIN (
        |  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) o
        |  ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL""".stripMargin
  )

    // north-star: POINT-IN-TIME join — each fact picks the SCD2 version
    // valid at its own timestamp (left join: fact_ts=0 predates every
    // version and keeps a null lang — the anti-leakage contract). One
    // key equi-join with the interval as residual predicate.
  b.q(
    "rel_pit_join" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      val v1 = d.select(col("doc_id"), col("lang"), lit(1).as("ts"))
      val v2 = d.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        lit(2).as("ts"))
      val v3 = d.select(col("doc_id"), col("lang"), lit(3).as("ts"))
      val dim = rel.scd2Intervals(v1.unionByName(v2).unionByName(v3),
        "doc_id", "ts", Seq("lang"))
      val facts = d.select(col("doc_id"),
        (col("doc_id") % 4).cast("int").as("fact_ts"))
      rel.pitJoin(facts, dim, "doc_id", "fact_ts")
        .orderBy(col("doc_id"))
    })
  )
  b.o(
    "rel_pit_join" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, 1 AS ts FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END, 2
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, 3 FROM documents),
        |f AS (SELECT doc_id, lang, ts,
        |    lag(lang) OVER (PARTITION BY doc_id ORDER BY ts) AS prev FROM ch),
        |r AS (SELECT doc_id, lang, ts FROM f WHERE prev IS NULL OR lang <> prev),
        |iv AS (SELECT doc_id, lang, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY doc_id ORDER BY ts) AS valid_to FROM r),
        |facts AS (SELECT doc_id, (doc_id % 4)::INT AS fact_ts FROM documents)
        |SELECT fa.doc_id, fa.fact_ts, iv.lang
        |FROM facts fa LEFT JOIN iv
        |  ON fa.doc_id = iv.doc_id AND fa.fact_ts >= iv.valid_from
        |  AND (iv.valid_to IS NULL OR fa.fact_ts < iv.valid_to)
        |ORDER BY fa.doc_id""".stripMargin
  )

    // north-star: SCD type-2 intervals from a change log — no-op writes
    // collapsed via fingerprint lag, validity closed via lead; every
    // window keyed on the id, no global order anywhere.
  b.q(
    "rel_scd2" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      val v1 = d.select(col("doc_id"), col("lang"), lit(1).as("ts"))
      val v2 = d.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        lit(2).as("ts"))
      val v3 = d.select(col("doc_id"), col("lang"), lit(3).as("ts"))
      rel.scd2Intervals(v1.unionByName(v2).unionByName(v3), "doc_id", "ts",
          Seq("lang"))
        .select(col("doc_id"), col("lang"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
        .orderBy(col("doc_id"), col("valid_from"))
    })
  )
  b.o(
    "rel_scd2" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, 1 AS ts FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END, 2
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, 3 FROM documents),
        |f AS (SELECT doc_id, lang, ts,
        |    lag(lang) OVER (PARTITION BY doc_id ORDER BY ts) AS prev FROM ch),
        |r AS (SELECT doc_id, lang, ts FROM f WHERE prev IS NULL OR lang <> prev),
        |iv AS (SELECT doc_id, lang, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY doc_id ORDER BY ts) AS valid_to FROM r)
        |SELECT doc_id, lang, valid_from, valid_to,
        |  (valid_to IS NULL)::INT AS is_current
        |FROM iv ORDER BY doc_id, valid_from""".stripMargin
  )

    // north-star: incremental materialized-aggregate maintenance — the
    // rollup refreshes from the CDC log alone (signed deltas + one thin
    // full-outer merge); the fact table is never rescanned.
  b.q(
    "rel_incremental_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val base = li.where(col("l_orderkey") % 10 =!= 0)
      val agg0 = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_l_quantity"))
      val inserts = li.where(col("l_orderkey") % 10 === 0)
        .select(col("l_returnflag"), col("l_quantity"), lit("insert").as("op"))
      val deletes = base.where(col("l_partkey") % 5 === 0)
        .select(col("l_returnflag"), col("l_quantity"), lit("delete").as("op"))
      rel.incrementalAgg(agg0, inserts.unionByName(deletes),
          Seq("l_returnflag"), "l_quantity")
        .orderBy(col("l_returnflag"))
    })
  )
    // The from-scratch aggregate over (base − deletes + inserts) — the
    // maintenance law the incremental path must reproduce exactly.
  b.o(
    "rel_incremental_agg" ->
      """WITH rows_after AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE l_orderkey % 10 <> 0 AND l_partkey % 5 <> 0
        |  UNION ALL
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE l_orderkey % 10 = 0)
        |SELECT l_returnflag, count(*) AS n,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_l_quantity
        |FROM rows_after GROUP BY 1 ORDER BY l_returnflag""".stripMargin
  )

    // north-star: majority-vote label adjudication — items synthesized
    // as event_id % 200 (≈50 votes each), label = event_type; two
    // map-side-combined aggregates, lex-min tie-break, no window.
  b.q(
    "rel_majority_label" -> ((s, dir) =>
      rel.majorityLabel(
        table(s, dir, "events")
          .select((col("event_id") % 200).as("item"), col("event_type")),
        "item", "event_type")
        .orderBy(col("item")))
  )
  b.o(
    "rel_majority_label" ->
      s"""WITH v AS (SELECT event_id % 200 AS item, event_type AS label,
         |    count(*)::BIGINT AS n
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT item, label, n,
         |  row_number() OVER (PARTITION BY item ORDER BY n DESC, label ASC) AS rk,
         |  (sum(n) OVER (PARTITION BY item))::BIGINT AS n_total FROM v)
         |SELECT item, label, n AS n_votes, n_total,
         |  ${r4("n::DOUBLE / n_total::DOUBLE")} AS agreement
         |FROM r WHERE rk = 1 ORDER BY item""".stripMargin
  )

    // north-star: k-anonymity / l-diversity privacy screen — equivalence
    // classes of the (nation, segment) quasi-identifiers with account
    // balance as the sensitive attribute; ONE hash agg at any scale.
  b.q(
    "rel_k_anonymity" -> ((s, dir) =>
      rel.kAnonymity(table(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 8)
        .orderBy(col("c_nationkey"), col("c_mktsegment")))
  )
  b.o(
    "rel_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
        |  count(DISTINCT c_acctbal)::BIGINT AS l_div,
        |  (CASE WHEN count(*) < 8 THEN 1 ELSE 0 END)::BIGINT AS at_risk
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

    // north-star: t-closeness — per-nation TVD between the class's
    // market-segment distribution and the global one; HUGEINT
    // cleared-denominator cells, closed-form absent-value mass, one
    // truncating division per class (the term-dispersion discipline).
  b.q(
    "rel_t_closeness" -> ((s, dir) =>
      rel.tCloseness(table(s, dir, "customer"),
          Seq("c_nationkey"), "c_mktsegment", tPpm = 100000L)
        .orderBy(col("c_nationkey")))
  )
  b.o(
    "rel_t_closeness" ->
      """WITH c AS (SELECT c_nationkey AS q, c_mktsegment AS v,
        |    count(*)::BIGINT AS nv
        |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
        |ct AS (SELECT q, sum(nv)::BIGINT AS n FROM c GROUP BY 1),
        |g AS (SELECT v, sum(nv)::BIGINT AS gv FROM c GROUP BY 1),
        |t AS (SELECT sum(gv)::BIGINT AS nn FROM g),
        |j AS (SELECT c.q, ct.n, c.nv, g.gv,
        |    abs(c.nv::HUGEINT * t.nn - g.gv::HUGEINT * ct.n) AS an,
        |    floor(c.nv::DOUBLE * ln(c.nv::DOUBLE / ct.n::DOUBLE)
        |      * 1000000.0)::BIGINT AS ec
        |  FROM c JOIN g USING (v) JOIN ct USING (q) CROSS JOIN t),
        |a AS (SELECT q, max(n) AS n, count(*)::BIGINT AS l_div,
        |    sum(an) AS pres, sum(gv)::BIGINT AS presg,
        |    sum(ec)::BIGINT AS ents
        |  FROM j GROUP BY 1),
        |f AS (SELECT q, n, l_div,
        |    floor(-ents::DOUBLE / 1000000.0 / n::DOUBLE * 10000.0 + 0.5)
        |      / 10000.0 AS entropy_q4,
        |    ((pres + n::HUGEINT * ((SELECT nn FROM t) - presg)) * 1000000
        |      // (2 * n::HUGEINT * (SELECT nn FROM t)))::BIGINT AS tvd_ppm
        |  FROM a)
        |SELECT q AS c_nationkey, n, l_div, entropy_q4, tvd_ppm,
        |  (tvd_ppm > 100000)::BIGINT AS at_risk
        |FROM f ORDER BY c_nationkey""".stripMargin
  )

    // north-star: Fleiss' kappa inter-annotator agreement over the same
    // ratings shaping as rel_majority_label — one exact-integer row;
    // kappa surfaced as num/den (signed integer division is an engine
    // trap: Spark DIV truncates, DuckDB // floors).
  b.q(
    "rel_fleiss_kappa" -> ((s, dir) =>
      rel.fleissKappa(
        table(s, dir, "events")
          .select((col("event_id") % 200).as("item"), col("user_id"),
            col("event_type")),
        "item", "user_id", "event_type"))
  )
    // Every quotient is on non-negative integers (// == DIV there);
    // the one signed quantity, kappa, stays a num/den pair.
  b.o(
    "rel_fleiss_kappa" ->
      """WITH src AS (SELECT event_id % 200 AS item, user_id, event_type
        |  FROM events),
        |cells AS (SELECT item, event_type AS label, count(*)::BIGINT AS nij
        |  FROM src WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |items AS (SELECT item, sum(nij)::BIGINT AS ni,
        |    sum(nij * nij)::BIGINT AS si
        |  FROM cells GROUP BY 1 HAVING sum(nij) >= 2),
        |pi AS (SELECT ni, ((si - ni) * 1000000) // (ni * (ni - 1)) AS pi_ppm
        |  FROM items),
        |tot AS (SELECT count(*)::BIGINT AS n_items, sum(pi_ppm)::BIGINT AS sp,
        |  sum(ni)::BIGINT AS n_ratings FROM pi),
        |marg AS (SELECT c.label, sum(c.nij)::BIGINT AS cj
        |  FROM cells c JOIN items i USING (item) GROUP BY 1),
        |pj AS (SELECT (cj * 1000000) // (SELECT n_ratings FROM tot) AS pj_ppm
        |  FROM marg),
        |pe AS (SELECT (sum(pj_ppm * pj_ppm) // 1000000)::BIGINT AS pe_ppm FROM pj)
        |SELECT n_items, n_ratings, (sp // n_items)::BIGINT AS pbar_ppm, pe_ppm,
        |  ((sp // n_items) - pe_ppm)::BIGINT AS kappa_num,
        |  (1000000 - pe_ppm)::BIGINT AS kappa_den
        |FROM tot CROSS JOIN pe""".stripMargin
  )

    // north-star: one-level a-priori association rules over order
    // baskets of part brands — exact support counts, ppm confidence
    // and lift; infrequent items pruned before the pair stage.
  b.q(
    "rel_assoc_rules" -> ((s, dir) =>
      rel.assocRules(
          table(s, dir, "lineitem").join(table(s, dir, "part"),
            col("l_partkey") === col("p_partkey")),
          "l_orderkey", "p_brand", minSupport = 150L)
        .orderBy(col("ante"), col("cons")))
  )
    // One-level a-priori: frequent items pruned before the pair stage,
    // both rule directions, all-positive ppm quotients.
  b.o(
    "rel_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |itn AS (SELECT i, count(*)::BIGINT AS n FROM it GROUP BY 1
        |  HAVING count(*) >= 150),
        |nb AS (SELECT count(DISTINCT b)::BIGINT AS n_baskets FROM it),
        |pr AS (SELECT it.b, it.i FROM it JOIN itn ON it.i = itn.i),
        |pn AS (SELECT a.i AS x, c.i AS y, count(*)::BIGINT AS pair_n
        |  FROM pr a JOIN pr c ON a.b = c.b AND a.i < c.i GROUP BY 1, 2
        |  HAVING count(*) >= 150),
        |dirs AS (SELECT x AS ante, y AS cons, pair_n FROM pn
        |  UNION ALL SELECT y, x, pair_n FROM pn)
        |SELECT bo.ante, bo.cons, bo.pair_n, ia.n AS ante_n, ic.n AS cons_n,
        |  nb.n_baskets,
        |  (bo.pair_n * 1000000 // ia.n)::BIGINT AS conf_ppm,
        |  (bo.pair_n * nb.n_baskets * 1000000 // (ia.n * ic.n))::BIGINT AS lift_ppm
        |FROM dirs bo JOIN itn ia ON bo.ante = ia.i
        |  JOIN itn ic ON bo.cons = ic.i CROSS JOIN nb
        |ORDER BY ante, cons""".stripMargin
  )

    // north-star: leakage-free out-of-fold target encoding of order
    // priority against order value — exact cents sums per (cat, fold),
    // one documented float quotient.
  b.q(
    "rel_target_encode" -> ((s, dir) =>
      rel.targetEncode(table(s, dir, "orders"), "o_orderpriority",
          "o_totalprice", "o_orderkey", k = 5)
        .orderBy(col("o_orderpriority"), col("fold")))
  )
    // Out-of-fold encode: the same portable fold hash as sample_kfold,
    // exact complements per (cat, fold), one floor-4dp quotient.
  b.o(
    "rel_target_encode" ->
      s"""WITH f AS (SELECT o_orderpriority,
         |    (${graft.functions.hashing.sqlH32("(o_orderkey::VARCHAR || '/te')")} % 5)::INT AS fold,
         |    floor(o_totalprice * 100)::BIGINT AS c FROM orders),
         |cells AS (SELECT o_orderpriority, fold, count(*)::BIGINT AS n_fold,
         |    sum(c)::BIGINT AS s FROM f GROUP BY 1, 2),
         |t AS (SELECT o_orderpriority, sum(n_fold)::BIGINT AS nn,
         |    sum(s)::BIGINT AS ss FROM cells GROUP BY 1)
         |SELECT c.o_orderpriority, c.fold, c.n_fold,
         |  (t.nn - c.n_fold)::BIGINT AS oof_n, (t.ss - c.s)::BIGINT AS oof_cents,
         |  CASE WHEN t.nn - c.n_fold > 0 THEN
         |    floor((t.ss - c.s)::DOUBLE / (t.nn - c.n_fold)::DOUBLE * 10000.0)
         |      / 10000.0 END AS oof_mean_q4
         |FROM cells c JOIN t USING (o_orderpriority)
         |ORDER BY 1, 2""".stripMargin
  )

    // north-star: RFM segmentation with grid-quantile scores — ties
    // share scores, every grid is value-bounded, the score maps
    // broadcast back onto the customer scan.
  b.q(
    "rel_rfm" -> ((s, dir) =>
      rel.rfm(table(s, dir, "orders"), "o_custkey", "o_orderdate",
          "o_totalprice", buckets = 5, binCents = 100000L)
        .orderBy(col("o_custkey")))
  )
    // Grid-quantile RFM: cumulative counts over bounded value grids,
    // score maps joined back; ties share scores by construction.
  b.o(
    "rel_rfm" ->
      """WITH per AS (SELECT o_custkey, max(o_orderdate) AS lastd,
        |    count(*)::BIGINT AS n_orders,
        |    sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT o_custkey,
        |    date_diff('day', lastd, (SELECT max(o_orderdate) FROM orders))::BIGINT
        |      AS recency_days, n_orders, cents FROM per),
        |gr AS (SELECT -recency_days AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mr AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS r_score FROM gr),
        |gf AS (SELECT n_orders AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mf AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS f_score FROM gf),
        |gm AS (SELECT cents // 100000 AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mm AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS m_score FROM gm)
        |SELECT b.o_custkey, b.recency_days, b.n_orders, b.cents,
        |  mr.r_score, mf.f_score, mm.m_score,
        |  (mr.r_score * 100 + mf.f_score * 10 + mm.m_score)::BIGINT AS rfm
        |FROM b JOIN mr ON -b.recency_days = mr.v
        |  JOIN mf ON b.n_orders = mf.v
        |  JOIN mm ON b.cents // 100000 = mm.v
        |ORDER BY o_custkey""".stripMargin
  )

    // TPC-H Q6 shape (forecast revenue change): pure scan + one global
    // aggregate; every predicate reaches PushedFilters, revenue is an
    // exact integer (cents x rounded discount-hundredths).
  b.q(
    "rel_tpch_q6" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_quantity") < 24.0)
        .select((floor(col("l_extendedprice") * 100.0).cast("long")
          * floor(col("l_discount") * 100.0 + 0.5).cast("long")).as("_r"),
          floor(col("l_discount") * 100.0 + 0.5).cast("long").as("_dq"))
        .where(col("_dq").between(5L, 7L))
        .agg(count(lit(1)).as("n_rows"), sum(col("_r")).as("revenue_qc")))
  )
  b.o(
    "rel_tpch_q6" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |    * floor(l_discount * 100 + 0.5)::BIGINT)::BIGINT AS revenue_qc
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND floor(l_discount * 100 + 0.5)::BIGINT BETWEEN 5 AND 7""".stripMargin
  )

    // TPC-H Q3 shape (unshipped-orders revenue): segment-filtered
    // customer broadcast onto orders, lineitem joined on the order key,
    // top-10 by exact revenue via TakeOrderedAndProject.
  b.q(
    "rel_tpch_q3" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      table(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * 100.0).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100.0 + 0.5).cast("long")))
          .as("revenue_qc"))
        .orderBy(col("revenue_qc").desc, col("l_orderkey"))
        .limit(10)
    })
  )
  b.o(
    "rel_tpch_q3" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |  sum(floor(l.l_extendedprice * 100)::BIGINT
        |    * (100 - floor(l.l_discount * 100 + 0.5)::BIGINT))::BIGINT
        |    AS revenue_qc
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_qc DESC, l_orderkey LIMIT 10""".stripMargin
  )

    // north-star: Benford first-digit screen over order totals — exact
    // digit counts, micro-quantized chi-square terms.
  b.q(
    "rel_benford" -> ((s, dir) =>
      rel.benford(table(s, dir, "orders"),
          floor(col("o_totalprice") * 100.0).cast("long"))
        .orderBy(col("digit")))
  )
    // Benford expectations injected as the SAME Scala-computed double
    // literals; chi-square terms micro-quantized before the sum.
  b.o(
    "rel_benford" -> {
      val pCase = (1 to 9).map(d =>
        s"WHEN ${d} THEN ${math.log10(1.0 + 1.0 / d)}")
        .mkString("CASE sp.digit ", " ", " END")
      s"""WITH c AS (SELECT floor(o_totalprice * 100)::BIGINT AS v FROM orders),
         |obs AS (SELECT substr(v::VARCHAR, 1, 1)::INT AS digit,
         |    count(*)::BIGINT AS n_obs FROM c WHERE v > 0 GROUP BY 1),
         |sp AS (SELECT unnest(range(1, 10))::INT AS digit),
         |dn AS (SELECT sp.digit, coalesce(obs.n_obs, 0)::BIGINT AS n_obs,
         |    ($pCase) AS p
         |  FROM sp LEFT JOIN obs USING (digit)),
         |t AS (SELECT digit, n_obs, p,
         |    (SELECT sum(n_obs) FROM dn)::BIGINT AS n FROM dn),
         |q AS (SELECT digit, n_obs, p,
         |    floor((n_obs::DOUBLE - n::DOUBLE * p)
         |      * (n_obs::DOUBLE - n::DOUBLE * p)
         |      / (n::DOUBLE * p) * 1000000.0)::BIGINT AS tq
         |  FROM t)
         |SELECT digit, n_obs, floor(p * 1000000.0)::BIGINT AS expected_ppm,
         |  (floor((SELECT sum(tq) FROM q)::DOUBLE / 1000000.0 * 10000.0 + 0.5)
         |    / 10000.0)::DOUBLE AS chi2_q4
         |FROM q ORDER BY digit""".stripMargin
    }
  )

    // TPC-H Q14 shape (promo revenue share): one month of lineitem
    // against the part dimension, share as a ppm quotient of exact
    // integer revenues.
  b.q(
    "rel_tpch_q14" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select((floor(col("l_extendedprice") * 100.0).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100.0 + 0.5).cast("long")))
          .as("_r"), col("p_type"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("_r")).otherwise(lit(0L)))
            .as("promo_qc"),
          sum(col("_r")).as("total_qc"))
        .withColumn("promo_ppm",
          expr("(promo_qc * 1000000L) DIV total_qc")))
  )
  b.o(
    "rel_tpch_q14" ->
      """WITH r AS (SELECT
        |    floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100 + 0.5)::BIGINT) AS rev,
        |    p.p_type
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT
        |  sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT AS promo_qc,
        |  sum(rev)::BIGINT AS total_qc,
        |  (sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT * 1000000
        |    // sum(rev)::BIGINT)::BIGINT AS promo_ppm
        |FROM r""".stripMargin
  )

    // TPC-H Q1 shape (pricing summary): THE canonical scan-aggregate —
    // one pushed date range, one hash aggregate to a ≤6-row grid, no
    // join, no shuffle beyond the final exchange. All measures exact
    // integers (qty is integral 1-50 in the data; price in cents;
    // discount/tax in rounded hundredths so disc revenue is x100 scale);
    // averages are truncating integer quotients — both engines truncate
    // on non-negative operands. The charge triple product (x10000 scale,
    // ~1e11/row) is summed EXACTLY in wide integers — DECIMAL(38,0) on
    // Spark, HUGEINT on DuckDB — and divided back to cents ONCE per
    // group (IntegralDivide accepts decimal operands, yields LONG), so
    // sum_charge_c is the exact TPC-H charge sum: no per-row truncation
    // drift, and 38 digits give ~1e27 rows/group of headroom where a
    // BIGINT sum would wrap silently near SF100.
  b.q(
    "rel_tpch_q1" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("_q"),
          floor(col("l_extendedprice") * 100.0).cast("long").as("_c"),
          floor(col("l_discount") * 100.0 + 0.5).cast("long").as("_dh"),
          floor(col("l_tax") * 100.0 + 0.5).cast("long").as("_th"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("_q")).as("sum_qty"),
          sum(col("_c")).as("sum_base_qc"),
          sum(col("_c") * (lit(100L) - col("_dh"))).as("sum_disc_qc"),
          sum(expr("CAST(_c * (100L - _dh) * (100L + _th) AS DECIMAL(38,0))"))
            .as("_charge_q4"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_qc"), col("sum_disc_qc"),
          expr("_charge_q4 DIV 10000").as("sum_charge_c"),
          expr("sum_qty * 100 DIV n_rows").as("avg_qty_x100"),
          expr("sum_base_qc DIV n_rows").as("avg_price_c"),
          col("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )
    // Same quantizations as the Spark side; averages are floor
    // quotients of non-negative integers (= Spark's truncating DIV).
  b.o(
    "rel_tpch_q1" ->
      """WITH b AS (SELECT l_returnflag, l_linestatus,
        |    l_quantity::BIGINT AS q,
        |    floor(l_extendedprice * 100)::BIGINT AS c,
        |    floor(l_discount * 100 + 0.5)::BIGINT AS dh,
        |    floor(l_tax * 100 + 0.5)::BIGINT AS th
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06')
        |SELECT l_returnflag, l_linestatus,
        |  sum(q)::BIGINT AS sum_qty,
        |  sum(c)::BIGINT AS sum_base_qc,
        |  sum(c * (100 - dh))::BIGINT AS sum_disc_qc,
        |  (sum(c * (100 - dh) * (100 + th)) // 10000)::BIGINT AS sum_charge_c,
        |  (sum(q) * 100 // count(*))::BIGINT AS avg_qty_x100,
        |  (sum(c) // count(*))::BIGINT AS avg_price_c,
        |  count(*)::BIGINT AS n_rows
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

    // TPC-H Q18 shape (large-volume customers): group-filter-join — the
    // HAVING > 300 survivor set (~0.1% of orders) keyed back onto orders
    // and customer. Join strategy is left to Catalyst/AQE deliberately:
    // at small SF the survivor side broadcasts at runtime; at 100 TB it
    // exceeds the broadcast bar and AQE keeps the keyed SMJ — pinning a
    // broadcast hint here is exactly the plan that would NOT survive a
    // 100x scale-up. Deterministic tie-break (total_c, o_orderdate,
    // o_orderkey) under TakeOrderedAndProject.
  b.q(
    "rel_tpch_q18" -> ((s, dir) => {
      val big = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("order_qty"))
        .where(col("order_qty") > 300L)
      table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          floor(col("o_totalprice") * 100.0).cast("long").as("total_c"),
          col("order_qty"))
        .orderBy(col("total_c").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    })
  )
  b.o(
    "rel_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    sum(l_quantity::BIGINT)::BIGINT AS order_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity::BIGINT) > 300)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  floor(o.o_totalprice * 100)::BIGINT AS total_c,
        |  b.order_qty
        |FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_c DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin
  )
}
