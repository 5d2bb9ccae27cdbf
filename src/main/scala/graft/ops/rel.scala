package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Generic relational utilities that round out the pipeline surface. */
object rel {

  /** Top-`k` rows per group in rank order. Declared as the rank-filter
    * idiom (`row_number` over the group window, then `rnk <= k`) — Spark's
    * `InferWindowGroupLimit` rule rewrites exactly this shape into a
    * `WindowGroupLimit` physical node: each map task keeps a bounded
    * per-group heap BEFORE the shuffle, so only ~k rows per group per
    * partition ever cross the wire, and no group is fully sorted. At 100 TB
    * this is the difference between shuffling k·groups rows and shuffling
    * the corpus (asserted in PlanQualitySpec).
    *
    * `orderCols` must define a total order within each group (append a
    * unique tiebreak column) or ranks are nondeterministic. */
  /** Skew-salted equi-join for hot keys AQE can't fully split (e.g. one
    * user_id owning 1% of a 100 TB event log): the LEFT (big, skewed)
    * side gets a deterministic salt in [0, `salts`) hashed from
    * `saltBy` — a column that spreads the hot key's rows, e.g. its
    * unique id — and the RIGHT side is EXPLODED into `salts` copies, so
    * the join key becomes (key, salt) and the hot key's rows land on
    * `salts` different reducers instead of one. Results are identical to
    * the plain join (salt columns are internal and dropped); cost is
    * right-side duplication, so keep the right side the smaller one. Use
    * when AQE's skew split can't apply — e.g. the skewed side feeds from
    * an aggregation in the same stage, or deterministic task sizing
    * matters more than adaptive re-planning. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBy: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be positive, got $salts")
    // coalesce: h32(NULL) is NULL, and a NULL salt would make the
    // (key, _salt) equi-join silently drop rows the plain join keeps —
    // NULL saltBy rows all land in salt 0 instead (no spread, but correct).
    val l = left.withColumn("_salt",
      coalesce(
        pmod(graft.functions.hashing.h32(col(saltBy).cast("string")), lit(salts)),
        lit(0)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Write `df` as a bucketed, bucket-sorted parquet table registered in
    * the session catalog (external, at `path`). Bucketing PERSISTS the
    * shuffle: rows are hash-placed into `buckets` files by `bucketCol`
    * (Murmur3 pmod, the same function Spark's HashPartitioning uses), so
    * every later equi-join or aggregation keyed on `bucketCol` between
    * tables with matching bucket counts reads co-partitioned data and
    * plans NO exchange — at 100 TB the fact-to-fact join that cannot
    * broadcast pays its shuffle ONCE at ingest, not per query.
    *
    * The `repartition` before the write matters: Spark writes one file
    * per (task, bucket) pair, and HashPartitioning by `bucketCol` into
    * exactly `buckets` tasks aligns the two, yielding ONE file per bucket
    * — without it, t tasks × b buckets can emit t·b small files, and the
    * downstream sort-elimination (from `sortBy`) is lost. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      buckets: Int): Unit = {
    require(buckets >= 1, s"graft: buckets must be positive, got $buckets")
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
  }

  /** Pivot (long → wide): one output row per `groupCol`, one column per
    * value in `pivotValues` holding `sum(valueCol)` over the matching
    * rows. `pivotValues` is REQUIRED here, not optional sugar: without an
    * explicit domain Spark first runs a distinct job over the pivot
    * column to discover it — a full extra pass over the table that a
    * 100 TB pipeline cannot pay (and does not need to: the domain of a
    * pivotable column is known schema-side). With values given, the whole
    * pivot is a single groupBy with map-side partial aggregation — one
    * shuffle of `groups × values` cells, nothing resembling table size. */
  def pivotAgg(
      df: DataFrame,
      groupCol: String,
      pivotCol: String,
      pivotValues: Seq[String],
      valueCol: String): DataFrame = {
    require(pivotValues.nonEmpty, "graft: pivotAgg needs explicit pivot values")
    df.groupBy(col(groupCol))
      .pivot(pivotCol, pivotValues)
      .agg(sum(col(valueCol)))
  }

  /** ROLLUP aggregate: subtotals at every prefix level of `groupCols`
    * plus the grand total, in ONE pass (Spark expands the rollup to
    * grouping sets inside a single Expand + partial-agg plan — it does
    * NOT rescan per level, which is exactly why rollup beats a UNION ALL
    * of per-level aggregates at scale). Subtotal rows carry NULL in the
    * rolled-up columns; they are COALESCEd to the sentinel `ALL` so
    * downstream consumers (and the oracle hash) need no NULL-vs-value
    * disambiguation — callers whose data legitimately contains the
    * sentinel should pass a different one. */
  def rollupAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      sentinel: String = "ALL"): DataFrame = {
    require(groupCols.nonEmpty, "graft: rollupAgg needs at least one group column")
    df.rollup(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(groupCols.map(c => coalesce(col(c), lit(sentinel)).as(c)) ++
        Seq(col("n"), col(s"sum_$valueCol")): _*)
  }

  /** CUBE aggregate — every SUBSET of `groupCols` (2ᵏ grouping sets vs
    * rollup's k+1 prefixes), still ONE Expand+agg pass over one scan.
    * Same sentinel discipline as [[rollupAgg]]. Use rollup when the
    * dimensions are hierarchical (year→month→day); cube when they are
    * independent facets (region × segment × priority) and every marginal
    * matters. Expansion factor is 2ᵏ rows into the partial aggregate —
    * keep k small at scale (3-4 facets), which is also where cubes stop
    * being readable anyway. */
  def cubeAgg(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      sentinel: String = "ALL"): DataFrame = {
    require(groupCols.nonEmpty, "graft: cubeAgg needs at least one group column")
    df.cube(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(groupCols.map(c => coalesce(col(c), lit(sentinel)).as(c)) ++
        Seq(col("n"), col(s"sum_$valueCol")): _*)
  }

  /** Explicit GROUPING SETS aggregate — the general form that
    * [[rollupAgg]] (prefix sets) and [[cubeAgg]] (all 2ᵏ subsets)
    * specialize: aggregate exactly the facet combinations the report
    * needs, nothing else. Still ONE Expand+agg pass over ONE scan —
    * `sets.size` rows per input into the partial aggregate, with
    * map-side combine — where the naive union-of-groupBys re-reads the
    * corpus once per set (the difference between 3 and |sets| scans of
    * 100 TB). Same sentinel discipline as rollup/cube: absent facet
    * levels surface as `sentinel`, so pick one outside the data domain. */
  def groupingSetsAgg(
      df: DataFrame,
      sets: Seq[Seq[String]],
      groupCols: Seq[String],
      valueCol: String,
      sentinel: String = "ALL"): DataFrame = {
    require(sets.nonEmpty, "graft: groupingSetsAgg needs at least one set")
    val unknown = sets.flatten.distinct.filterNot(groupCols.contains)
    require(unknown.isEmpty,
      s"graft: grouping sets reference columns not in groupCols: " +
        s"${unknown.mkString(", ")}")
    df.groupingSets(sets.map(_.map(col)), groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as(s"sum_$valueCol"))
      .select(groupCols.map(c => coalesce(col(c), lit(sentinel)).as(c)) ++
        Seq(col("n"), col(s"sum_$valueCol")): _*)
  }

  /** Per-group Pearson correlation from EXACT fixed-point moments.
    * Spark's `corr` (and DuckDB's) streams Welford-style updates whose
    * float error depends on partition merge order — the same data can
    * yield last-ulp-different results run to run, which poisons both
    * reproducibility and cross-engine checks. Here the five moments
    * (Σx, Σy, Σxy, Σx², Σy²) are summed as LONGS over inputs quantized at
    * `xScale`/`yScale` (order-free, exactly associative), and the Pearson
    * formula runs ONCE per group on the exact integers. The quantization
    * scales cancel algebraically in the ratio, so they only bound input
    * precision, not the result's.
    *
    * Caller owns overflow headroom: with n rows per group,
    * n·max(x·xScale)·max(y·yScale) must stay under 2⁶³ — pick scales for
    * the column domains (that's why they're parameters, not constants).
    * One ordinary groupBy shuffle of 6 longs per group; map-side combine
    * does the heavy summing. */
  def corrExact(
      df: DataFrame,
      xCol: String,
      yCol: String,
      groupCols: Seq[String],
      xScale: Double = 1.0,
      yScale: Double = 10000.0): DataFrame = {
    val xq = floor(col(xCol) * xScale + 0.5).cast("long")
    val yq = floor(col(yCol) * yScale + 0.5).cast("long")
    val agg = df
      // a row with a null coordinate has no (x, y) point: it must not
      // count in n while its moments silently drop — the same null fence
      // as quantileBins / histogram / pageRank
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("_xq", xq).withColumn("_yq", yq)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_xq")).as("sx"), sum(col("_yq")).as("sy"),
        sum(col("_xq") * col("_yq")).as("sxy"),
        sum(col("_xq") * col("_xq")).as("sxx"),
        sum(col("_yq") * col("_yq")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg.withColumn("corr",
      when(col("n") > 1 && denx > 0.0 && deny > 0.0,
        graft.functions.vectors.quantize(num / (sqrt(denx) * sqrt(deny)), 4)))
      .select(groupCols.map(col) ++ Seq(col("n"), col("corr")): _*)
  }

  /** Mutual information between two CATEGORICAL columns, with both
    * marginal entropies — the does-this-column-predict-that-one audit
    * (domain↔language skew, source↔label leakage): MI ≈ 0 means the
    * columns are independent; NMI → 1 means one determines the other.
    * Natural-log units (nats), computed on the [[graft.ops.text
    * .corpusDivergence]] convention: per-cell terms floor-quantized at
    * 1e-12 and summed as longs (order-free), the single transcendental
    * ln being the documented accepted-ulp-risk class; entropies the
    * same way over the marginal grids. `nmi` normalizes by
    * `max(H(a), H(b))` (MI ≤ min ≤ max, so nmi ∈ [0, 1]); one constant
    * column reads nmi = 0 (it carries nothing to share), and only when
    * BOTH are constant is the ratio 0/0 → NULL, not a fake verdict.
    *
    * Plan shape: ONE corpus scan to the (a, b) contingency grid
    * (map-side combined, grid rows ≤ |A|·|B| — eagerly cut via
    * [[ckpt]] so the marginal/total/term consumers reread grid rows,
    * never the corpus), marginals and totals are grid-local
    * aggregates, and the result is four 1-row frames broadcast
    * together. Returns one row
    * `(n, a_card, b_card, h_a, h_b, mi, nmi)` — entropies/MI 6-dp
    * quantized nats. */
  def mutualInfo(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val grid = ckpt.cut(df
      .select(aCol.as("_a"), bCol.as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("_nij")))
    val na = grid.groupBy(col("_a")).agg(sum(col("_nij")).as("_na"))
    val nb = grid.groupBy(col("_b")).agg(sum(col("_nij")).as("_nb"))
    val tot = grid.agg(sum(col("_nij")).as("n"),
      count_distinct(col("_a")).as("a_card"),
      count_distinct(col("_b")).as("b_card"))
    val q12 = lit(1.0e12)
    val mi = grid.join(na, "_a").join(nb, "_b").crossJoin(broadcast(tot))
      .select(floor((col("_nij").cast("double") / col("n").cast("double"))
        * log((col("_nij").cast("double") * col("n").cast("double"))
          / (col("_na").cast("double") * col("_nb").cast("double"))) * q12)
        .cast("long").as("_q"))
      .agg(sum(col("_q")).as("_smi"))
    def entropy(m: DataFrame, c: String, out: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .select(floor((col(c).cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") / col(c).cast("double")) * q12)
          .cast("long").as("_q"))
        .agg(sum(col("_q")).as(out))
    val q = graft.functions.vectors.quantize(_: Column, 6)
    tot.crossJoin(broadcast(entropy(na, "_na", "_sha")))
      .crossJoin(broadcast(entropy(nb, "_nb", "_shb")))
      .crossJoin(broadcast(mi))
      .select(col("n"), col("a_card"), col("b_card"),
        q(col("_sha").cast("double") / q12).as("h_a"),
        q(col("_shb").cast("double") / q12).as("h_b"),
        q(col("_smi").cast("double") / q12).as("mi"),
        when(greatest(col("_sha"), col("_shb")) > 0L,
          q(col("_smi").cast("double")
            / greatest(col("_sha"), col("_shb")).cast("double"))).as("nmi"))
  }

  /** Rows a [[chiSquare]] input may carry before `O·N` products leave
    * the DECIMAL(38,0)-exact per-cell quotient's range (ENFORCED
    * in-plan). An eval/profile-set ceiling — pre-sample beyond it. */
  val ChiSquareMaxN: Long = 1000000000L

  /** Pearson chi-square test of INDEPENDENCE over the (a, b)
    * contingency grid, with Cramér's V effect size — the
    * categorical-association significance meter beside [[mutualInfo]]'s
    * information meter (MI says how much the columns share; chi²/V says
    * whether the association clears chance and how strong it is on a
    * [0,1] scale). The "is source confounded with language" audit.
    *
    * Exactness: via the identity `χ² = N·(Σ O²/(R·C) − 1)` each cell
    * contributes ONE truncating DECIMAL(38,0) quotient
    * `O²·10¹² DIV (R·C)` (bias ≤ cells·10⁻¹²·N, deterministic), summed
    * exactly; `chi2_q6` is one more integer DIV under
    * [[ChiSquareMaxN]] (ENFORCED in-plan). V is the single double
    * `sqrt` at the end, 4-dp quantized.
    *
    * Plan shape: [[mutualInfo]]'s — one corpus scan to the checkpointed
    * grid, marginals grid-local, broadcast assembly. Returns one row
    * `(n, a_card, b_card, dof, chi2_q6, cramers_v_q4)`. */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val grid = ckpt.cut(df
      .select(aCol.as("_a"), bCol.as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("_nij")))
    val na = grid.groupBy(col("_a")).agg(sum(col("_nij")).as("_na"))
    val nb = grid.groupBy(col("_b")).agg(sum(col("_nij")).as("_nb"))
    val tot = grid.agg(sum(col("_nij")).as("n"),
        count_distinct(col("_a")).as("a_card"),
        count_distinct(col("_b")).as("b_card"))
      .withColumn("n",
        when(col("n") > ChiSquareMaxN,
          raise_error(format_string(
            "graft: chiSquare DECIMAL(38,0)-exactness ceiling exceeded " +
              s"(n = %s > $ChiSquareMaxN rows) — pre-sample",
            col("n"))).cast("long"))
          .otherwise(col("n")))
    val sumq = grid.join(na, "_a").join(nb, "_b")
      .select(expr(
        """(CAST(_nij AS DECIMAL(38,0)) * _nij * 1000000000000)
           DIV (CAST(_na AS DECIMAL(38,0)) * _nb)""").as("_q"))
      .agg(sum(col("_q")).as("_sq12"))
    tot.crossJoin(broadcast(sumq))
      .withColumn("dof", (col("a_card") - 1L) * (col("b_card") - 1L))
      // clamp BEFORE the final DIV: per-cell truncation can pull Σ a
      // hair below 10¹² on near-independent grids, and a negative
      // numerator would both break χ² ≥ 0 and split the engines on
      // truncate-vs-floor (round-15 review finding)
      .withColumn("chi2_q6", expr(
        """CAST((CAST(n AS DECIMAL(38,0))
           * greatest(_sq12 - 1000000000000, 0))
           DIV 1000000 AS LONG)"""))
      .withColumn("cramers_v_q4",
        when(col("n") > 0L && least(col("a_card"), col("b_card")) > 1L,
          graft.functions.vectors.quantize(
            sqrt(col("chi2_q6").cast("double") / 1.0e6
              / (col("n").cast("double")
                * (least(col("a_card"), col("b_card")) - 1L).cast("double"))),
            4)))
      .select(col("n"), col("a_card"), col("b_card"), col("dof"),
        col("chi2_q6"), col("cramers_v_q4"))
  }

  /** One-pass column profile — the generic data-quality gate a pipeline
    * runs before trusting a new table: per column, row count, null
    * count, EXACT distinct count, and min/max (cast to string so one
    * schema serves any column type). One aggregation job over the table
    * produces a single wide row that unpivots (`stack`) into one row
    * per profiled column — the table is never scanned per column.
    *
    * Scale note: multiple exact `count(DISTINCT)`s in one aggregate
    * plan via Expand — the scan is multiplied by `cols.size` thin
    * rows before the shuffle. That is the honest price of EXACT
    * distincts; profile the columns you care about, not all of them
    * (or use [[sketch.kmvDistinct]] for a one-pass estimate). Min/max
    * string casts are for display; compare them as values only for
    * types whose string form is canonical (ints, strings, dates). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "graft: profileColumns needs at least one column")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
      countDistinct(col(c)).as(s"_dist_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', _n, `_null_$c`, `_dist_$c`, `_min_$c`, `_max_$c`").mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stacked) AS (column, n_rows, n_null, n_distinct, min_val, max_val)"))
  }

  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    if (partitionCols.nonEmpty)
      df.withColumn(rankCol,
          row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
        .where(col(rankCol) <= k)
    else {
      // GLOBAL top-k (ungrouped kmv/kmvMerge/kmvOverlap land here):
      // declare it as orderBy+limit so it plans as TakeOrderedAndProject
      // — per-partition bounded k-heaps, no full-data exchange, no
      // WindowExec — then rank the surviving ≤k rows with a k-bounded
      // window ([[graft.ops.windows.boundedGlobal]]). `orderCols` must be
      // a total order (same determinism contract as the grouped path).
      df.orderBy(orderCols: _*).limit(k)
        .withColumn(rankCol, row_number().over(
          graft.ops.windows.boundedGlobal("k-limit", col(df.columns.head))
            .orderBy(orderCols: _*)))
    }
  }

  /** Declarative data-quality rule engine (the Deequ-shaped gate a
    * pipeline runs before promoting a new table): each rule is a
    * `(name, predicate)` pair; the result is one row per rule with the
    * table's row count, the rule's violation count, and the violation
    * rate. A row VIOLATES a rule when the predicate is false OR null —
    * three-valued logic must not let a null sneak past a constraint
    * (`col >= 0` on a null is unknown, and unknown is not "passes").
    *
    * Scale shape: ONE aggregation job over ONE scan regardless of rule
    * count — every rule compiles to a `sum(when(...))` in the same
    * partial aggregate (map-side combine, a single ~rules-wide row per
    * task crosses the wire), then the wide row unfolds rule-per-row via
    * an inline explode of a bounded struct array. The naive
    * one-query-per-rule loop scans the corpus `rules.size` times;
    * this scans it once. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "graft: checkRules needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"graft: duplicate rule names: ${rules.map(_._1).diff(rules.map(_._1).distinct).mkString(", ")}")
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_viol_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col("_n").as("n_rows"),
          col(s"_viol_$i").as("n_viol"))
      }: _*)).as("_r"))
      .select(col("_r.rule").as("rule"), col("_r.n_rows").as("n_rows"),
        col("_r.n_viol").as("n_viol"),
        graft.functions.vectors.quantize(
          when(col("_r.n_rows") > 0,
            col("_r.n_viol").cast("double") / col("_r.n_rows").cast("double"))
            .otherwise(lit(0.0)), 4).as("viol_rate"))
  }

  /** Key-skew diagnostic — the meter to run BEFORE choosing a join
    * strategy on a new key: the `topN` heaviest keys with their share of
    * the table, each key's skew factor vs the mean key, and the salt
    * count [[saltedJoin]] would need to spread that key to average-sized
    * reducers (`ceil(cnt / mean)` — the number of average keys this one
    * key weighs). A top key at `share_pct` ≈ 1% of a 100 TB table is the
    * one-reducer straggler AQE may or may not split; this makes it a
    * number in an artifact instead of a surprise in hour three.
    *
    * Scale shape: one groupBy shuffle of `(key, count)` partials
    * (map-side combine — the wire carries keys, not rows), then a
    * `TakeOrderedAndProject` for the top-N (bounded per-task heaps, no
    * global sort) and a single-row grand total broadcast back over the
    * N winners. Null keys count as a real group — at scale the null key
    * is the USUAL skew monster, so hiding it would defeat the meter;
    * it surfaces with key = "NULL". */
  def skewProbe(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"graft: skewProbe needs topN >= 1, got $topN")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col(keyCol).cast("string"), lit("NULL")).as("key"), col("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("_total"),
      count(lit(1)).as("_n_keys"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        graft.functions.vectors.quantize(
          col("cnt") * 100.0 / col("_total"), 4).as("share_pct"),
        // cnt·n_keys in DOUBLE: at the billions-of-keys scale this meter
        // is pitched for, the long·long product overflows Int64 and
        // would report a negative skew (share_pct already does this)
        graft.functions.vectors.quantize(
          col("cnt").cast("double") * col("_n_keys") / col("_total").cast("double"),
          4).as("skew"),
        ceil(col("cnt").cast("double") * col("_n_keys") / col("_total").cast("double"))
          .cast("int").as("rec_salts"))
  }

  /** Deterministic dense global row index (0-based) in `orderCol` order
    * — the "assign every document a stable id" primitive — WITHOUT the
    * naive `row_number() OVER (ORDER BY ...)` whose empty partitionBy
    * drags the entire corpus through ONE task. Shape: range-repartition
    * on `orderCol` (partition p holds keys below partition p+1's), rank
    * locally per partition (parallel window keyed on partition id), and
    * add per-partition offsets — cumulated over at most `parts` rows, a
    * PARTITION-COUNT-bounded window, which is why its empty partitionBy
    * is fine (the same domain-bounded-window argument as the grid
    * idioms). Global index = offset + local rank - 1.
    *
    * The local-rank branch and the count branch both read the SAME
    * range exchange — Spark's ReuseExchange dedupes them (asserted in
    * RelSpec), which is load-bearing twice over: the sort shuffle runs
    * once, AND both branches see identical sampled range boundaries, so
    * offsets always line up with local ranks. `orderCol` must be unique
    * and non-null or the order (hence the index) is nondeterministic. */
  def zipIndex(df: DataFrame, orderCol: String, parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // The range exchange SAMPLES its bounds per physical execution
    // (seed derives from the rdd id), and this subtree feeds TWO
    // consumers — the local-rank window and the per-partition count
    // aggregate. When exchange reuse fails (column pruning makes the
    // two subplans differ), each consumer executes its own exchange
    // with its own sampled bounds, and offsets computed under one
    // partitioning added to ranks computed under another yield
    // duplicate/gapped indices (caught by the sf0.1 oracle sweep,
    // round 10 — shard counts off by ±3). Cutting lineage here
    // materializes ONE partitioning that both consumers read; same
    // [[graft.ops.ckpt.cut]] policy the iterative ops use (reliable
    // checkpoint on a configured cluster, local blocks otherwise).
    val ranged = graft.ops.ckpt.cut(
      df.repartitionByRange(p, col(orderCol))
        .withColumn("_pid", spark_partition_id()))
    val local = ranged.withColumn("_lrank",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(col(orderCol))))
    // ≤ `parts` rows: the cumulative window is partition-count-bounded.
    val offsets = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(
        sum(col("_cnt")).over(windows.boundedGlobal("parts", col("_pid"))
          .orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("idx", col("_offset") + col("_lrank") - 1L)
      .drop("_pid", "_lrank", "_offset")
  }

  /** Distributed EXCLUSIVE prefix sum in `orderCol` order — the
    * cumulative-sum primitive WITHOUT `sum() OVER (ORDER BY ...)`'s
    * single-partition window: the [[zipIndex]] discipline (one pinned
    * range exchange, per-partition local cumsum, partition offsets
    * cumulated over a partition-COUNT-bounded window and broadcast
    * back). Adds `cum_before` = Σ of `value` over all rows strictly
    * below this row's `orderCol`. `orderCol` must be unique and
    * non-null (group first — a cumulative over distinct keys is the
    * usual shape, e.g. [[gini]]'s value grid). */
  def prefixSum(df: DataFrame, orderCol: String, value: Column,
      parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // same lineage-cut rationale as zipIndex: both consumers (local
    // cumsum + per-partition totals) must read ONE materialized range
    // partitioning or their sampled bounds can disagree
    val ranged = graft.ops.ckpt.cut(
      df.withColumn("_pv", value)
        .repartitionByRange(p, col(orderCol))
        .withColumn("_pid", spark_partition_id()))
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("_lcum",
      coalesce(sum(col("_pv")).over(w), lit(0L)))
    val offsets = ranged.groupBy(col("_pid")).agg(sum(col("_pv")).as("_psum"))
      .withColumn("_offset", coalesce(
        sum(col("_psum")).over(windows.boundedGlobal("parts", col("_pid"))
          .orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("cum_before", col("_offset") + col("_lcum"))
      .drop("_pid", "_pv", "_lcum", "_offset")
  }

  /** Exact Gini coefficient of a non-negative integer metric — the
    * whole-distribution inequality meter behind "5% of users are 80% of
    * revenue" ([[graft.streaming.EventStream.concentration]] reads one
    * top-k point; this integrates the whole Lorenz curve). Uses the
    * grouped-value identity: with distinct values v ascending, counts
    * n_v, and B_v = count strictly below, the rank-weighted sum is
    * `R = Σ v·(n_v·B_v + n_v(n_v+1)/2)` — exact, tie-stable, and
    * needing only a cumulative count over DISTINCT values, which
    * [[prefixSum]] supplies without a global window. Then
    * `G = (2R − (n+1)S) / (n·S)`, surfaced as the one floor-4dp float
    * over exact integers.
    *
    * Headroom: R ≤ max(v)·n² — exact to ~10⁸ rows at cent scale
    * (quantize the metric coarser beyond; it is a meter). Returns one
    * row `(n, total, gini_q4)`; null when n = 0 or S = 0. */
  def gini(df: DataFrame, value: Column): DataFrame = {
    val grid = df.select(value.cast("long").as("_v"))
      .where(col("_v").isNotNull && col("_v") >= 0L)
      .groupBy(col("_v")).agg(count(lit(1)).as("_nv"))
    val withCum = prefixSum(grid, "_v", col("_nv"))
    val agg = withCum.agg(
      sum(col("_nv")).as("n"),
      sum(col("_v") * col("_nv")).as("total"),
      sum(col("_v") * (col("_nv") * col("cum_before")
        + expr("(_nv * (_nv + 1)) DIV 2"))).as("_r"))
    agg.select(col("n"), col("total"),
      when(col("n") > 0L && col("total") > 0L,
        graft.functions.vectors.quantize(
          (lit(2.0) * col("_r").cast("double")
            - (col("n") + lit(1L)).cast("double") * col("total").cast("double"))
            / (col("n").cast("double") * col("total").cast("double")), 4))
        .as("gini_q4"))
  }

  /** First-digit Benford screen (Benford 1938; the classic fabricated-
    * numbers tripwire): observed leading-digit counts of a positive
    * integer metric against the log₁₀(1 + 1/d) expectation, plus the
    * chi-square statistic as one engine-identical float chain over the
    * exact counts (the 8-df critical value at α=0.05 is ~15.51 — read
    * downstream). Digit extraction is string-based (`substr(v::string,
    * 1, 1)`) — portable where float log10 binning is not. One hash
    * aggregate over a 9-row digit grid. Returns
    * `(digit, n_obs, expected_ppm, chi2_q4)` — chi2 repeated per row
    * (it is a distribution-level stat; the grid is the readout). */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val probs = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val counts = df.select(value.cast("long").as("_v"))
      .where(col("_v") > 0L)
      .groupBy(substring(col("_v").cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    // densify to all 9 digits: an absent digit is evidence, not a gap
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val pExpr = (1 to 9).foldRight(lit(0.0)) { case (d, rest) =>
      when(col("digit") === d, lit(probs(d - 1))).otherwise(rest)
    }
    val dense = spine.join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("_p", pExpr)
    val wg = windows.boundedGlobal("digit-grid", col("digit"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dense
      .withColumn("_n", sum(col("n_obs")).over(wg))
      // per-term micro-quantization BEFORE the window sum: a float sum
      // over an unordered window frame is order-dependent in its last
      // ulp on any engine; quantized longs sum order-free
      .withColumn("_term_q6", floor(
        (col("n_obs").cast("double") - col("_n").cast("double") * col("_p"))
          * (col("n_obs").cast("double") - col("_n").cast("double") * col("_p"))
          / (col("_n").cast("double") * col("_p")) * 1000000.0).cast("long"))
      .withColumn("chi2_q4", graft.functions.vectors.quantize(
        sum(col("_term_q6")).over(wg).cast("double") / 1000000.0, 4))
      .select(col("digit"), col("n_obs"),
        floor(col("_p") * 1000000.0).cast("long").as("expected_ppm"),
        col("chi2_q4"))
  }

  /** Bloom-prefiltered join — the runtime-filter idiom for the
    * fact-to-dim join where the dim is too big to broadcast as a hash
    * relation but its KEY SET compresses into a bloom: build a bloom
    * over the small side's join keys (driver-held word array, `mBits/63`
    * longs — a 64 KB sketch summarizes millions of keys), prefilter the
    * large side IN ITS SCAN, then run the exact join on the survivors.
    * False positives pass the bloom and die in the join, so the result
    * is EXACTLY the plain join; false negatives never happen. At 100 TB
    * the win is shuffle mass: only large-side rows that can possibly
    * match pay the exchange — with a 1%-selective key set and fpp ~1%,
    * ~98% of the fact table never crosses the wire. (Spark's own AQE
    * runtime bloom does this adaptively; this is the explicit,
    * deterministic form a pipeline can pin and size.)
    *
    * The small side is scanned twice (bloom build + join) — by
    * construction it is the cheap side; size `mBits` ≥ ~10 bits/key for
    * ~1% fpp. */
  def bloomJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      mBits: Int = 65142,
      k: Int = 3): DataFrame = {
    import graft.ops.sketch
    val words = sketch.bloom(small, col(key), mBits, k)
      .orderBy(col("word")).collect().map(_.getLong(1)).toSeq
    // fused probe (one digest per row), not sketch.bloomMightContain:
    // a filter condition gets no subexpression elimination, so the
    // compositional twin pays up to 2k digests per large-side row
    large.where(graft.functions.NativeExprs.bloomContains(
        col(key).cast("string"), words, mBits, k))
      .join(small, Seq(key))
  }

  /** Apply a change-data-capture log to a snapshot — the incremental
    * corpus-maintenance primitive ("yesterday's table + today's
    * upserts/deletes = today's table" without rebuilding from source):
    * per key, the LATEST change by `tsCol` wins; a winning `deleteOp`
    * removes the row, any other op replaces it wholesale; untouched
    * snapshot rows pass through. `changes` must carry `idCol`, `tsCol`,
    * `opCol`, and every snapshot value column. `(idCol, tsCol)` must be
    * unique or the winner is nondeterministic — CDC feeds carry a
    * log-sequence number; put it (or a composite) in `tsCol`.
    *
    * Scale shape: latest-change-per-key is the rank-filter idiom
    * (`InferWindowGroupLimit` → bounded per-key heaps before the
    * shuffle — the change LOG shuffles, which is the small side by
    * nature), then ONE thin full-outer join against the snapshot on the
    * unique key (no skew: ids are unique per side). The snapshot is
    * read once and never wholesale rewritten row-by-row — pair with a
    * partitioned sink to rewrite only touched partitions. */
  def cdcApply(
      snapshot: DataFrame,
      changes: DataFrame,
      idCol: String,
      tsCol: String = "ts",
      opCol: String = "op",
      deleteOp: String = "delete"): DataFrame = {
    val valueCols = snapshot.columns.filterNot(_ == idCol).toSeq
    val missing = (Seq(idCol, tsCol, opCol) ++ valueCols)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"graft: cdcApply changes are missing columns: ${missing.mkString(", ")}")
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col(tsCol).desc)))
      .where(col("_rn") === 1)
      .select(col(idCol) +:
        (valueCols.map(c => col(c).as(s"_ch_$c")) :+ col(opCol).as("_op")): _*)
    snapshot.join(latest, Seq(idCol), "full_outer")
      .where(col("_op").isNull || col("_op") =!= deleteOp)
      .select(col(idCol) +: valueCols.map(c =>
        when(col("_op").isNotNull, col(s"_ch_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** ANSI/Delta-style MERGE: apply `source` to `target` on `keyCols`
    * with the three standard clauses, conditions written against the
    * aliases `t` (target) and `s` (source) — e.g.
    * `whenMatchedDelete = Some(col("s.status") === "D")`. Clause
    * precedence is SQL MERGE's: matched rows test DELETE first, then
    * UPDATE (update takes the source row's values), else keep the
    * target row unchanged; source-only rows INSERT when their
    * condition holds; target-only rows always survive. A null
    * condition is "not satisfied" (SQL three-valued logic), and rows
    * with null keys never match (plain equality, as in MERGE).
    *
    * `source` must be unique on `keyCols` — SQL MERGE raises on
    * multiple matches; here a duplicate source key would apply
    * nondeterministically, so dedup upstream ([[cdcApply]]'s keep-latest
    * window is the standard preamble for CDC feeds).
    *
    * Scale shape: ONE full-outer sort-merge join, both sides shuffled
    * on the key once, everything else row-local — the semantic core of
    * what table formats execute. At 100 TB the production win layered
    * on top is touched-file pruning (join the source's key range/bloom
    * against file stats first, rewrite only matched files); compose
    * with [[bloomJoin]]/partition filters for that — this op is the
    * per-row merge those prunings funnel into. */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      whenMatchedUpdate: Option[Column] = None,
      whenMatchedDelete: Option[Column] = None,
      whenNotMatchedInsert: Option[Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "graft: merge needs key columns")
    val valueCols = target.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ valueCols).filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"graft: merge source is missing columns: ${missing.mkString(", ")}")
    require(
      Seq(whenMatchedUpdate, whenMatchedDelete, whenNotMatchedInsert).exists(_.isDefined),
      "graft: merge with no WHEN clause is the identity — pass at least one")
    val t = target.withColumn("_t_present", lit(true)).alias("t")
    val s = source.withColumn("_s_present", lit(true)).alias("s")
    val on = keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val matched = col("t._t_present").isNotNull && col("s._s_present").isNotNull
    val tOnly = col("t._t_present").isNotNull && col("s._s_present").isNull
    // null condition = clause not satisfied, exactly as SQL MERGE
    def cond(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(false)), lit(false))
    val doDelete = cond(whenMatchedDelete)
    val doUpdate = !doDelete && cond(whenMatchedUpdate)
    val doInsert = cond(whenNotMatchedInsert)
    t.join(s, on, "full_outer")
      .where((matched && !doDelete) || tOnly || (!matched && !tOnly && doInsert))
      .select(
        keyCols.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k)) ++
          valueCols.map(c =>
            when(matched && doUpdate, col(s"s.$c"))
              .when(matched || tOnly, col(s"t.$c"))
              .otherwise(col(s"s.$c")).as(c)): _*)
  }

  /** Incremental MATERIALIZED-AGGREGATE maintenance — keep a `(groups,
    * n, sum_<value>)` rollup current under a change log WITHOUT
    * rescanning the fact table: the log's rows aggregate into signed
    * deltas (`deleteOp` rows count −1 and subtract their value; an
    * update is delete-old + insert-new in the same log), and one thin
    * full-outer join merges deltas into the existing aggregate. Groups
    * whose count reaches zero disappear, brand-new groups appear. This
    * is the 100 TB dashboard pattern: the fact table is write-once
    * history, the rollup is maintained from the CDC feed at
    * O(log size + touched groups) per refresh — `maintained(agg, log) ≡
    * aggregate(apply(fact, log))` exactly (RelSpec pins the law), for
    * the count/sum family (mins/maxes are not delta-maintainable:
    * deleting the current max needs the runner-up, which only a rescan
    * or an auxiliary structure knows).
    *
    * `agg` must carry `groupCols`, `n`, and `sum_<valueCol>` — the
    * shape [[rollupAgg]]-style aggregates and this op itself emit, so
    * refreshes CHAIN: today's output is tomorrow's `agg`. Value sums
    * are exact only for integral `valueCol` (float deltas would drift
    * run-over-run; quantize currency to cents upstream). */
  def incrementalAgg(
      agg: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      opCol: String = "op",
      deleteOp: String = "delete"): DataFrame = {
    require(groupCols.nonEmpty, "graft: incrementalAgg needs group columns")
    val sumCol = s"sum_$valueCol"
    val missing = (groupCols :+ "n" :+ sumCol).filterNot(agg.columns.contains)
    require(missing.isEmpty,
      s"graft: aggregate table is missing columns: ${missing.mkString(", ")}")
    val sign = when(col(opCol) === deleteOp, lit(-1L)).otherwise(lit(1L))
    val delta = changes
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("_dn"),
        sum(sign * col(valueCol).cast("long")).as("_dsum"))
    agg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("_dsum"), lit(0L)))
          .as(sumCol)): _*)
      .where(col("n") > 0)
  }

  /** Build type-2 slowly-changing-dimension validity intervals from a
    * change log: per key ordered by `tsCol`, consecutive rows whose
    * tracked `valueCols` did not actually change are collapsed
    * (CDC feeds are full of no-op writes), and each surviving version
    * gets `[valid_from, valid_to)` — `valid_to` null on the current
    * version, flagged `is_current`. This is how a pipeline keeps
    * history queryable ("what was this document's quality label when
    * the model trained?") without snapshotting the corpus per day.
    *
    * Scale shape: two windows, BOTH partitioned by the key (no global
    * order anywhere): a lag-fingerprint pass to drop no-op versions,
    * then lead for the interval close. One shuffle on the key total —
    * the two windows share the (key, ts) sort. Change-collapse
    * compares a 128-bit fingerprint of the tracked columns, so wide
    * payloads don't inflate the sort. */
  def scd2Intervals(
      changes: DataFrame,
      idCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "graft: scd2Intervals needs tracked value columns")
    val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol))
    val fp = graft.functions.hashing.fingerprint128(
      concat_ws("\u0001", valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val real = changes
      .withColumn("_fp", fp)
      .withColumn("_prev_fp", lag(col("_fp"), 1).over(w))
      .where(col("_prev_fp").isNull || col("_fp") =!= col("_prev_fp"))
    real
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(idCol) +: valueCols.map(col) ++:
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Referential-integrity check: child rows whose foreign key has NO
    * match in the parent (orphans) — the cross-table data-quality
    * primitive next to the row-local [[checkRules]]. Returns the orphan
    * child rows themselves; aggregate for the data-card count, or feed
    * them straight to a quarantine sink.
    *
    * Scale shape: the parent reduces to its DISTINCT key projection in
    * its own scan (thin rows), then ONE left-anti join — Spark
    * broadcasts it when small, falls back to key-partitioned SMJ when
    * not; null child keys are orphans by definition here (they
    * reference nothing) and are kept, unlike SQL's IN-subquery
    * three-valued trap. */
  def fkOrphans(
      child: DataFrame,
      parent: DataFrame,
      childKeys: Seq[String],
      parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      s"graft: fkOrphans needs matching key lists, got $childKeys vs $parentKeys")
    val p = parent
      .select(parentKeys.zip(childKeys).map { case (pk, ck) => col(pk).as(ck) }: _*)
      .distinct()
    // left_anti with null-safe equality would treat null==null as a
    // match; FK semantics want null child keys flagged, so plain
    // equality (nulls never match → always orphaned) is correct
    child.join(p, childKeys, "left_anti")
  }

  /** POINT-IN-TIME join — the feature-store primitive: attach to each
    * fact row the dimension version that was valid AT THE FACT'S OWN
    * TIMESTAMP (`valid_from <= fact_ts < valid_to`, open `valid_to` =
    * current), against an [[scd2Intervals]]-shaped dimension. This is
    * what makes offline training features match what online serving saw
    * ("what was this document's quality label when the model trained on
    * it?") — joining on `is_current` instead is the classic
    * feature-leakage bug.
    *
    * Left join: facts predating the key's first version (or with no key
    * match) keep null dimension values — dropping them silently would
    * bias the training set toward old entities.
    *
    * Scale shape: ONE equi-join on the key with the interval predicate
    * as a residual filter — both sides shuffle once on the key, and
    * since version counts per key are small (that's what the SCD2
    * no-op-collapse is for), the per-key match scan is bounded. No
    * window, no range-explode. `dim` must share ONLY `keyCol` with
    * `facts`, carry non-overlapping intervals per key
    * ([[scd2Intervals]] guarantees both), and every fact matches at
    * most one version. */
  def pitJoin(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String,
      factTsCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    val dimMissing = Seq(keyCol, validFromCol, validToCol)
      .filterNot(dim.columns.contains)
    require(dimMissing.isEmpty,
      s"graft: pitJoin dimension is missing columns: ${dimMissing.mkString(", ")}")
    val overlap = dim.columns.toSet.intersect(facts.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"graft: pitJoin fact/dimension column collision: ${overlap.mkString(", ")}")
    val d = dim.withColumnRenamed(keyCol, "_pit_key")
    facts.join(d,
        col(keyCol) === col("_pit_key") &&
          col(factTsCol) >= col(validFromCol) &&
          (col(validToCol).isNull || col(factTsCol) < col(validToCol)),
        "left")
      .drop("_pit_key", validFromCol, validToCol, "is_current")
  }

  /** Corpus snapshot diff — the dataset-versioning meter ("what changed
    * between crawl v1 and v2"): one row per id present in EITHER
    * version, labeled `added` (only in `b`), `removed` (only in `a`),
    * `changed` (both, content fingerprint differs), or `unchanged`.
    * Presence is tracked with explicit marker columns, not fingerprint
    * nullness, so a legitimately-null content value can't masquerade as
    * a missing row.
    *
    * Scale shape: both sides reduce to `(id, 128-bit fingerprint)` in
    * their scans — the full-outer join shuffles THIN rows (~24 bytes),
    * never document bodies, and id keys are unique per side so the
    * sort-merge join has no skew. Aggregating the output by `status` is
    * the 4-row data-card summary. */
  def snapshotDiff(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      contentCol: String): DataFrame = {
    val fa = a.select(col(idCol),
      graft.functions.hashing.fingerprint128(col(contentCol)).as("_fp_a"),
      lit(1).as("_in_a"))
    val fb = b.select(col(idCol),
      graft.functions.hashing.fingerprint128(col(contentCol)).as("_fp_b"),
      lit(1).as("_in_b"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_in_a").isNull, lit("added"))
          .when(col("_in_b").isNull, lit("removed"))
          // null-safe equality: two null contents are the SAME content
          // (plain === would yield null and fall through to 'changed')
          .when(col("_fp_a") <=> col("_fp_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Majority-vote label consolidation — the multi-annotator primitive
    * behind RLHF/eval label pipelines (one row per (item, annotator
    * vote) in, one adjudicated row per item out): per item, the label
    * with the most votes, vote counts, and the agreement share
    * (`n_votes / n_total`, floor-4dp) — the per-item confidence a
    * downstream filter thresholds on (drop items below 2/3 agreement,
    * route them to re-annotation, etc.). Ties break on the
    * lexicographically smallest label — deterministic, engine-neutral.
    * Null votes are abstentions: excluded from both counts.
    *
    * Plan shape: one (item, label) hash aggregate with map-side combine
    * — a hot item's million votes collapse to ≤ label-domain rows
    * before the wire — then one item-keyed aggregate over those
    * per-label counts only (struct extrema sort-aggregate, but over the
    * already-collapsed ≤ items×labels rows, not the vote stream). The
    * tie-break rides that second aggregate as `min(struct(−votes,
    * label))`: no window, no per-item buffering. Returns
    * `(itemCol, label, n_votes, n_total, agreement)`. */
  def majorityLabel(
      df: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val votes = df.where(col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol).as("label"))
      .agg(count(lit(1)).as("_n"))
    votes.groupBy(col(itemCol))
      .agg(min(struct((-col("_n")).as("neg"), col("label"))).as("_w"),
        sum(col("_n")).as("n_total"))
      .select(col(itemCol), col("_w.label").as("label"),
        (-col("_w.neg")).as("n_votes"), col("n_total"),
        graft.functions.vectors.quantize(
          (-col("_w.neg")).cast("double") / col("n_total").cast("double"),
          4).as("agreement"))
  }

  /** k-anonymity / l-diversity screen (Sweeney 2002; Machanavajjhala et
    * al. 2007): group rows by their quasi-identifier columns and report
    * each equivalence class's size `n` and the number of distinct
    * sensitive values `l_div` it contains; `at_risk` = 1 when `n < k`
    * (a class small enough to re-identify someone). The
    * release-this-table-or-not meter a privacy review runs before a
    * dataset with user attributes leaves the pipeline — the PII story's
    * structural counterpart to [[graft.ops.text.redact]]'s value-level
    * scrubbing.
    *
    * Plan shape: ONE hash aggregation keyed on the quasi columns, with
    * map-side partials — corpus-linear at any scale; the output is at
    * most the quasi-identifier cross-product, which is what the meter
    * measures. Returns the quasi columns + `(n, l_div, at_risk)`. */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "graft: kAnonymity needs quasi columns")
    require(k >= 2, s"graft: kAnonymity needs k >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_div"))
      .withColumn("at_risk", (col("n") < k).cast("long"))
  }

  /** t-CLOSENESS privacy audit (Li, Li & Venkatasubramanian 2007) — the
    * stronger screen [[kAnonymity]]'s class sizes can't give: a class
    * can be large and l-diverse yet still leak because its SENSITIVE
    * distribution differs from the table's (e.g. one nation's customers
    * are 90% one segment). Per quasi-identifier equivalence class this
    * reports the total-variation distance between the class's
    * categorical sensitive distribution and the global one
    * (`tvd = ½ Σ_v |n_cv/n_c − N_v/N|`, the standard instantiation of
    * the paper's EMD for unordered categories), plus entropy
    * l-diversity (`−Σ p ln p` over the class).
    *
    * Exactness: tvd is cleared of denominators per (class, value) cell
    * — `|n_cv·N − N_v·n_c|` in DECIMAL(38,0) (corpus-scale products
    * overflow int64 — the [[graft.ops.text.termDispersion]] widening),
    * values ABSENT from a class contribute `n_c·(N − ΣN_present)` in
    * closed form (no dense class×value grid), and
    * `tvd_ppm = (Σ|…|·10⁶) DIV (2·n_c·N)` is one truncating DECIMAL
    * division per class. Entropy cells are the
    * [[graft.ops.text.unigramLogProb]] fixed-point discipline:
    * `floor(n_cv·ln(n_cv/n_c)·10⁶)` exact longs, summed, one quantized
    * double at the end.
    *
    * Plan shape: one (quasi, value) hash aggregate (map-side combined),
    * then value-keyed and quasi-keyed joins of its two marginals back
    * onto the cell grid (value domain is small → AQE broadcasts; the
    * one-row total rides an explicit broadcast), one final class-keyed
    * aggregate. Table rows are scanned once; nothing is sorted.
    *
    * Returns one row per class: `(quasi…, n, l_div, entropy_q4,
    * tvd_ppm, at_risk)` where `at_risk = tvd_ppm > tPpm`. */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      tPpm: Long = 200000L): DataFrame = {
    require(quasiCols.nonEmpty, "graft: tCloseness needs quasi columns")
    require(tPpm >= 0L && tPpm <= 1000000L,
      s"graft: tCloseness needs 0 <= tPpm <= 1e6, got $tPpm")
    val qs = quasiCols.map(col)
    val cells = ckpt.cut(df.where(col(sensitiveCol).isNotNull)
      .groupBy(qs :+ col(sensitiveCol).as("_v"): _*)
      .agg(count(lit(1)).as("_nv")))
    val classTot = cells.groupBy(qs: _*).agg(sum(col("_nv")).as("n"))
    val globTot = cells.groupBy(col("_v")).agg(sum(col("_nv")).as("_gv"))
    val tot = globTot.agg(sum(col("_gv")).as("_N"))
    cells
      .join(globTot, "_v")
      .join(classTot, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qs: _*)
      .agg(max(col("n")).as("n"),
        count(lit(1)).as("l_div"),
        max(col("_N")).as("_NN"),
        sum(col("_gv")).as("_presentG"),
        sum(abs(expr("CAST(_nv AS DECIMAL(38,0)) * _N")
          - expr("CAST(_gv AS DECIMAL(38,0)) * n"))).as("_presNum"),
        sum(floor(col("_nv").cast("double")
          * log(col("_nv").cast("double") / col("n").cast("double"))
          * 1000000.0).cast("long")).as("_entCells"))
      .withColumn("_tvdNum", col("_presNum")
        + expr("CAST(n AS DECIMAL(38,0))") * (col("_NN") - col("_presentG")))
      .select((qs :+ col("n") :+ col("l_div")
        :+ graft.functions.vectors.quantize(
            -col("_entCells").cast("double") / 1000000.0
              / col("n").cast("double"), 4).as("entropy_q4")
        :+ expr("""CAST((_tvdNum * 1000000)
             DIV (2 * CAST(n AS DECIMAL(38,0)) * _NN) AS LONG)""")
          .as("tvd_ppm")): _*)
      .withColumn("at_risk", (col("tvd_ppm") > tPpm).cast("long"))
  }

  /** Fleiss' kappa (Fleiss 1971, generalized to per-item rater counts):
    * chance-corrected inter-annotator agreement over a ratings table of
    * one row per (item, rater) vote. [[majorityLabel]] resolves each
    * item; this scores whether the raters agree more than label
    * marginals predict — the is-this-labeling-process-trustworthy meter
    * run before majority votes become training labels.
    *
    * All arithmetic is exact-integer: per-item agreement `P_i` and the
    * marginal expectation `P_e` are parts-per-million integer quotients
    * (`ppm`), and kappa is surfaced as a NUMERATOR/DENOMINATOR pair
    * (`kappa = kappa_num / kappa_den`) rather than one more quotient —
    * kappa can be negative, and Spark's `DIV` truncates toward zero
    * while other engines floor, so a signed division would diverge
    * engine-to-engine on the last digit. Items with fewer than 2
    * ratings carry no agreement evidence and are excluded everywhere
    * (including the marginals).
    *
    * Plan shape: two hash aggregations (cells, then items), two 1-row
    * reductions combined by broadcast cross join — no windows, no
    * driver collect. Returns one row
    * `(n_items, n_ratings, pbar_ppm, pe_ppm, kappa_num, kappa_den)`. */
  def fleissKappa(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String): DataFrame = {
    val scale = 1000000L
    val cells = df.where(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_item"), col(labelCol).as("_label"))
      .agg(count(lit(1)).as("_nij"))
    val items = cells.groupBy(col("_item"))
      .agg(sum(col("_nij")).as("_ni"),
        sum(col("_nij") * col("_nij")).as("_si"))
      .where(col("_ni") >= 2)
    val tot = items
      .select(col("_item"), col("_ni"),
        expr(s"((_si - _ni) * ${scale}L) DIV (_ni * (_ni - 1))").as("_pi"))
      .agg(count(lit(1)).as("n_items"), sum(col("_pi")).as("_sp"),
        sum(col("_ni")).as("n_ratings"))
    val pe = cells.join(items.select(col("_item")), "_item")
      .groupBy(col("_label")).agg(sum(col("_nij")).as("_cj"))
      .crossJoin(broadcast(tot.select(col("n_ratings").as("_total"))))
      .select(expr(s"(_cj * ${scale}L) DIV _total").as("_pj"))
      .agg(expr(s"sum(_pj * _pj) DIV ${scale}L").as("pe_ppm"))
    broadcast(tot).crossJoin(pe)
      .select(col("n_items"), col("n_ratings"),
        expr("_sp DIV n_items").as("pbar_ppm"), col("pe_ppm"),
        (expr("_sp DIV n_items") - col("pe_ppm")).as("kappa_num"),
        (lit(scale) - col("pe_ppm")).as("kappa_den"))
  }

  /** Schema drift report between two corpus versions: one row per
    * added / removed / retyped column — the metadata companion to
    * [[snapshotDiff]]'s value diff, run before a pipeline trusts a new
    * drop of an externally-produced table (a silently retyped column
    * breaks every downstream cast at full-corpus scale; this catches it
    * at plan time). Pure schema metadata — no data is read, no job runs;
    * the result is a literal DataFrame. Returns
    * `(column, change, from_type, to_type)`, change ∈
    * {added, removed, retyped}. */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    val b = before.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      a.keySet.diff(b.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, a(c))) ++
      b.keySet.diff(a.keySet).toSeq.sorted.map(c =>
        (c, "removed", b(c), null: String)) ++
      b.keySet.intersect(a.keySet).toSeq.sorted
        .filter(c => b(c) != a(c))
        .map(c => (c, "retyped", b(c), a(c)))
    rows.toDF("column", "change", "from_type", "to_type")
  }

  /** Market-basket association rules (Agrawal & Srikant, VLDB 1994 —
    * the one-level a-priori pass): for every ordered item pair (a → b)
    * whose co-occurrence clears `minSupport` baskets, the exact support
    * counts plus `conf_ppm = P(b|a)` and `lift_ppm = P(a,b)/(P(a)P(b))`
    * as parts-per-million integer quotients (all counts positive, so
    * truncating division is engine-identical). The
    * what-co-occurs-with-what miner behind recommendation seeds and
    * curriculum pairing.
    *
    * Scale shape — ONE basket aggregation feeds everything: the basket
    * count, the item counts, and the pair stage, which generates
    * ordered pairs IN-ROW from each basket's sorted distinct-item array
    * (the a-priori monotonicity makes the explicit pre-prune
    * unnecessary for correctness: any pair with an infrequent member
    * has `pair_n ≤ min(ante_n, cons_n) < minSupport` and dies at the
    * pair-support filter — measured 1.7× faster than the
    * semi-join + basket self-join form it replaced, whose four
    * consumers re-derived the items subtree). Per-basket cost is
    * quadratic in the basket's DISTINCT items — the item vocabulary
    * bounds it, never basket count; a degenerate basket (one key
    * holding a large fraction of the vocabulary) is the
    * [[graft.ops.graph.bipartiteProject]] maxBasket situation — apply
    * that cap upstream if the basket key can degenerate. The rule
    * assembly joins the vocab-bounded item counts back by broadcast.
    * `lift_ppm` multiplies `pair_n · n_baskets` — exact to ~3·10⁹
    * baskets (past that, derive lift downstream from the surfaced
    * counts). Returns
    * `(ante, cons, pair_n, ante_n, cons_n, n_baskets, conf_ppm,
    * lift_ppm)` for both directions of each pair. */
  def assocRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 10L,
      minConfPpm: Long = 0L): DataFrame = {
    require(minSupport >= 1, s"graft: assocRules needs minSupport >= 1")
    val items = baskets
      .select(col(basketCol).as("_b"), col(itemCol).cast("string").as("_i"))
      .where(col("_b").isNotNull && col("_i").isNotNull)
      .distinct()
    // one basket aggregation; all three readers consume ITS exchange
    val basketSets = items.groupBy(col("_b"))
      .agg(sort_array(collect_set(col("_i"))).as("_is"))
    val itemN = basketSets.select(explode(col("_is")).as("_i"))
      .groupBy(col("_i")).agg(count(lit(1)).as("_in"))
      .where(col("_in") >= minSupport)
    val nB = basketSets.agg(count(lit(1)).as("n_baskets"))
    // ordered pairs in-row from the sorted set: for element i, pair it
    // with every later element — x < y holds by the sort
    val pairCol = flatten(transform(col("_is"), (x, i) =>
      transform(slice(col("_is"), i + 2,
          greatest(size(col("_is")) - i - 1, lit(0))),
        y => struct(x.as("x"), y.as("y")))))
    val pairN = basketSets.select(explode(pairCol).as("p"))
      .groupBy(col("p.x").as("_x"), col("p.y").as("_y"))
      .agg(count(lit(1)).as("pair_n"))
      .where(col("pair_n") >= minSupport)
    val both = pairN.select(col("_x").as("ante"), col("_y").as("cons"),
        col("pair_n"))
      .union(pairN.select(col("_y"), col("_x"), col("pair_n")))
    both
      .join(broadcast(itemN.select(col("_i").as("ante"), col("_in").as("ante_n"))),
        "ante")
      .join(broadcast(itemN.select(col("_i").as("cons"), col("_in").as("cons_n"))),
        "cons")
      .crossJoin(broadcast(nB))
      .withColumn("conf_ppm", expr("(pair_n * 1000000L) DIV ante_n"))
      .withColumn("lift_ppm",
        expr("(pair_n * n_baskets * 1000000L) DIV (ante_n * cons_n)"))
      .where(col("conf_ppm") >= minConfPpm)
      .select(col("ante"), col("cons"), col("pair_n"), col("ante_n"),
        col("cons_n"), col("n_baskets"), col("conf_ppm"), col("lift_ppm"))
  }

  /** Leakage-free target encoding: the per-category mean of a numeric
    * target computed OUT-OF-FOLD — row r's encode excludes every row in
    * r's own fold, so the feature carries no information about r's own
    * label (in-fold target means are the classic train-set leak; Micci-
    * Barreca SIGKDD Expl. 2001 is the smoothed ancestor). Folds come
    * from the portable id hash ([[graft.ops.sample.kfold]]) — stable
    * under corpus growth and engine-reproducible.
    *
    * Exactness: targets quantize to integer cents once, then everything
    * is exact sums — the encode surfaces as `(oof_cents, oof_n)` plus
    * the one documented float quotient `oof_mean_q4` (floor-4dp of
    * cents/n, null when a category lives entirely in one fold).
    *
    * Plan shape: one (category, fold) hash aggregate, then category
    * totals by a fold-count-bounded window (≤ k rows per category) —
    * the encoder table is (categories × k) rows, broadcast-joinable
    * onto the training scan. Returns
    * `(catCol, fold, n_fold, oof_n, oof_cents, oof_mean_q4)`. */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      idCol: String,
      k: Int = 5,
      salt: String = "te"): DataFrame = {
    val folded = graft.ops.sample.kfold(df, idCol, k, salt)
      .select(col(catCol), col("fold"),
        floor(col(targetCol) * 100.0).cast("long").as("_c"))
    val cells = folded.groupBy(col(catCol), col("fold"))
      .agg(count(lit(1)).as("n_fold"), sum(col("_c")).as("_s"))
    val w = Window.partitionBy(col(catCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("oof_n", sum(col("n_fold")).over(w) - col("n_fold"))
      .withColumn("oof_cents", sum(col("_s")).over(w) - col("_s"))
      .withColumn("oof_mean_q4", when(col("oof_n") > 0L,
        floor(col("oof_cents").cast("double") / col("oof_n").cast("double")
          * 10000.0) / 10000.0))
      .select(col(catCol), col("fold"), col("n_fold"), col("oof_n"),
        col("oof_cents"), col("oof_mean_q4"))
  }

  /** RFM segmentation (recency / frequency / monetary) with GRID
    * quantile scores: per customer, days since last order (against the
    * corpus max date), order count, and exact cents; each metric scored
    * 1..`buckets` by its position in the cumulative distribution. The
    * classic customer-value / contributor-value segmenter.
    *
    * Scores come from a VALUE-GRID cumulative count, not `ntile`: a
    * global ntile is one unpartitioned window over every customer (the
    * non-scalable shape), and it splits ties arbitrarily. Here each
    * metric aggregates to its bounded value grid — recency is bounded
    * by the corpus time range, frequency by max orders-per-customer,
    * monetary by `binCents` bins — a cumulative count runs over GRID
    * rows only ([[windows.boundedGlobal]]), and the score map
    * (`score = (customers-below · buckets) DIV n + 1`) broadcasts back
    * onto the customer scan. Equal values always share a score, and
    * monetary's quantile resolution is `binCents` (the documented
    * grid-vs-exactness trade every grid idiom in this library makes).
    *
    * Returns `(custCol, recency_days, n_orders, cents, r_score,
    * f_score, m_score, rfm)` — `rfm` = r·100 + f·10 + m, recency scored
    * so HIGHER = more recent.
    *
    * EAGER construction: the three bounded score grids are materialized
    * (collected + re-broadcast) inside this call — calling `rfm` runs
    * three small Spark jobs immediately, even if the returned frame is
    * only inspected for schema/plan. Customers whose `dateCol` or
    * `amountCol` aggregate is NULL get a NULL grid key; those rows are
    * counted in the grid totals (same denominators as before) but carry
    * no score and are dropped by the inner score-map join — identical
    * to the pre-eager lazy-join behavior. */
  def rfm(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String,
      buckets: Int = 5,
      binCents: Long = 100000L): DataFrame = {
    require(buckets >= 2, s"graft: rfm needs buckets >= 2, got $buckets")
    require(binCents >= 1, s"graft: rfm needs binCents >= 1")
    val per = orders.groupBy(col(custCol))
      .agg(max(col(dateCol)).as("_last"), count(lit(1)).as("n_orders"),
        sum(floor(col(amountCol) * 100.0).cast("long")).as("cents"))
    val asof = orders.agg(max(col(dateCol)).as("_asof"))
    // Persisted for the FUNCTION CALL only: the three bounded grid maps
    // are materialized eagerly below while the cache is warm, then base
    // is unpersisted before returning — a long-lived session does not
    // accumulate executor storage across rfm calls (the graph-ops cache
    // discipline). The final join recomputes base once at execution
    // (one orders aggregate), the price of not leaking the cache.
    val base = per.crossJoin(broadcast(asof))
      .withColumn("recency_days", datediff(col("_asof"), col("_last")).cast("long"))
      .drop("_last", "_asof")
      .persist()
    // One bounded-grid score map per metric: value -> customers strictly
    // below it, broadcast back. The customer total rides the same bounded
    // window (no driver-side count). `neg` flips the order so higher =
    // better for recency without a signed-division rounding hazard.
    def scoreMap(v: Column, name: String, neg: Boolean): DataFrame = {
      val key = if (neg) -v else v
      val grid = base.groupBy(key.as("_v")).agg(count(lit(1)).as("_cnt"))
      val wg = windows.boundedGlobal(s"rfm-$name-grid", col("_v")).orderBy(col("_v"))
      grid
        .withColumn("_below", coalesce(
          sum(col("_cnt")).over(wg.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("_total", sum(col("_cnt")).over(
          wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("_v").as(s"_k_$name"),
          (expr(s"(_below * $buckets) DIV _total") + 1L).as(s"${name}_score"))
    }
    // Materialize each bounded grid to a driver-local relation NOW (the
    // grids are broadcast anyway — same rows, same BroadcastHashJoin),
    // so base's cache can be released before the function returns.
    val spark = orders.sparkSession
    // NULL grid keys (a customer whose date/amount aggregate is NULL)
    // stay in the window denominators above but are dropped HERE, after
    // the cumulative counts — the equality join they feed can never
    // match them, so this reproduces the lazy broadcast join's silent
    // drop instead of NPE-ing on getLong(0). Explicit-schema
    // createDataFrame (not implicits.toDF): the reflection-based
    // product encoder breaks under REPL classloaders (sbt console's
    // java.sql SecurityException), and the schema is two longs anyway.
    def localize(grid: DataFrame, name: String): DataFrame = {
      val rows = grid.collect().iterator
        .filterNot(r => r.isNullAt(0) || r.isNullAt(1))
        .map(r => Row(r.getLong(0), r.getLong(1))).toSeq
      spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField(s"_k_$name", LongType, nullable = false),
        StructField(s"${name}_score", LongType, nullable = false))))
    }
    val rMap = localize(scoreMap(col("recency_days"), "r", neg = true), "r")
    val fMap = localize(scoreMap(col("n_orders"), "f", neg = false), "f")
    val mMap = localize(
      scoreMap(expr(s"cents DIV ${binCents}L"), "m", neg = false), "m")
    base.unpersist(false)
    base
      .withColumn("_bin", expr(s"cents DIV ${binCents}L"))
      .join(broadcast(rMap), (-col("recency_days")) === col("_k_r"))
      .join(broadcast(fMap), col("n_orders") === col("_k_f"))
      .join(broadcast(mMap), col("_bin") === col("_k_m"))
      .withColumn("rfm", col("r_score") * 100L + col("f_score") * 10L
        + col("m_score"))
      .select(col(custCol), col("recency_days"), col("n_orders"), col("cents"),
        col("r_score"), col("f_score"), col("m_score"), col("rfm"))
  }
}
