package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.hashing

/** Deterministic sampling, splitting, and sequence packing for
  * training-data pipelines.
  *
  * All three are hash- or prefix-sum-based rather than RNG-based: the
  * same row lands in the same sample/split/pack on every run, on any
  * cluster size, with no seed state to ship — the property that makes
  * dataset versions reproducible (and lets an independent engine verify
  * results exactly).
  */
object sample {

  /** Per-row sampling key in [0, 100): portable hash of the id and a salt
    * (different salts → independent samples). */
  def pctKey(id: Column, salt: String): Column =
    hashing.h32(concat(id.cast("string"), lit("/" + salt))) % 100

  /** Keep ~`pct`% of rows, deterministically by id hash — scan-parallel,
    * no shuffle, stable across runs and engines. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int,
      salt: String = "sample"): DataFrame =
    df.where(pctKey(col(idCol), salt) < pct)

  /** Stratified deterministic sampling: keep a different percentage per
    * stratum (e.g. rebalance a language-skewed corpus by keeping 100% of
    * rare languages and 10% of the dominant one). Same scan-parallel
    * hash-filter shape as [[deterministicSample]] — the per-stratum rate
    * is a branch on the stratum column, not a shuffle, so this stays a
    * pure pushed-down scan at any scale. Strata not in `pcts` keep
    * `defaultPct`%. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      pcts: Map[String, Int], defaultPct: Int,
      salt: String = "strat"): DataFrame = {
    val target = pcts.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.where(pctKey(col(idCol), salt) < target)
  }

  /** Disjoint train/val/test split by hash band: adds a `split` column
    * ("train"/"val"/"test"). Bands are [0, train), [train, train+val),
    * [train+val, 100). */
  def split(df: DataFrame, idCol: String, trainPct: Int, valPct: Int,
      salt: String = "split"): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val k = pctKey(col(idCol), salt)
    df.withColumn("split",
      when(k < trainPct, "train")
        .when(k < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic k-fold assignment by portable id hash: adds `fold` in
    * `[0, k)` — cross-validation splits that are scan-parallel,
    * engine-reproducible, and stable under corpus growth (a document's
    * fold never changes when other documents arrive, unlike
    * row_number % k). Fold i's train set is `fold =!= i` — a scan
    * filter, no materialized copies. */
  def kfold(df: DataFrame, idCol: String, k: Int,
      salt: String = "kfold"): DataFrame = {
    require(k >= 2, s"graft: kfold needs k >= 2, got $k")
    df.withColumn("fold",
      (hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt))) % k)
        .cast("int"))
  }

  /** Per-row Bernoulli keep with probability `weight` (clamped to [0,1]),
    * decided by the portable id hash: keep iff `h32(id/salt) < w·2³²`.
    * This is the data-MIXING primitive — sample proportional to a quality
    * score, downweight a dominant domain, upsample underrepresented
    * strata by fraction — still a pure scan filter (the weight is a
    * per-row expression, no shuffle, no RNG state), and still
    * reproducible bit-for-bit by an independent engine. Monotone in the
    * weight for a fixed salt: raising a row's weight can only flip it
    * from dropped to kept. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      salt: String = "wsample"): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.where(
      hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt)))
        .cast("double") < w * lit(4294967296.0))
  }

  /** Leakage-safe split: band on the hash of a GROUP column (source
    * domain, dedup cluster id, …) instead of the row id, so every row of
    * a group lands in the same split. This is the contamination guard a
    * training pipeline needs — row-level splitting puts near-duplicate
    * documents from one site on both sides of the train/test fence, and
    * the eval silently measures memorization. Same zero-shuffle scan
    * filter as [[split]]; group sizes never matter because the key is
    * computed per row from the group column. */
  def groupSplit(df: DataFrame, groupCol: String, trainPct: Int,
      valPct: Int, salt: String = "gsplit"): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val k = pctKey(col(groupCol), salt)
    df.withColumn("split",
      when(k < trainPct, "train")
        .when(k < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic per-group reservoir: keep exactly `n` rows per group
    * (all rows of groups smaller than `n`), chosen by portable hash rank
    * — the uniform-without-replacement sample a seeded reservoir would
    * draw, but with no RNG state and bit-reproducible on any engine.
    * Adds `sample_rank` (1-based within the group).
    *
    * Scale: the rank filter compiles to WindowGroupLimit, so each task
    * keeps a bounded n-row heap per group — one shuffle on the group key,
    * never a full per-group sort. This is the per-stratum "show me n
    * examples" / eval-set carve-out primitive. */
  def perGroupSample(df: DataFrame, groupCol: String, idCol: String, n: Int,
      salt: String = "res"): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(
      hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt))), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }

  /** Temperature-based source mixing (the multilingual-sampling rule of
    * Conneau & Lample's XLM / mC4): rebalance a skewed corpus so stratum
    * probabilities follow `p_i^alpha` instead of `p_i`. The per-stratum
    * keep rate is `(n_i / n_min)^(alpha-1)`, normalized so the rarest
    * stratum keeps 100% — `alpha = 1` keeps everything, `alpha → 0`
    * flattens toward uniform. Rows are then kept by the same portable
    * hash-Bernoulli rule as [[weightedSample]].
    *
    * Adds `mix_rate`. Scale: one tiny per-stratum count aggregate
    * (map-side combined, `strata` rows) broadcast back onto the scan —
    * the corpus itself never shuffles. */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, salt: String = "tmix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n_stratum"))
    val nMin = counts.agg(min(col("_n_stratum")).as("_n_min"))
    val rates = broadcast(counts.crossJoin(broadcast(nMin))
      .select(col(stratumCol),
        pow(col("_n_stratum").cast("double") / col("_n_min").cast("double"),
          lit(alpha - 1.0)).as("mix_rate")))
    df.join(rates, stratumCol)
      .where(
        hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt)))
          .cast("double") < col("mix_rate") * lit(4294967296.0))
  }

  /** Calibrate a corpus to EXPLICIT target mixture proportions (the
    * "rebalance to 30% code / 70% web" primitive) by deterministic
    * downsampling. `targets` maps stratum → weight (any positive scale —
    * weights are normalized); strata not named are dropped. The largest
    * total achievable by pure downsampling is `T = min_g(n_g / w_g)`;
    * each stratum then keeps `rate_g = w_g·T / n_g` of its rows (the
    * binding stratum keeps ~100%), decided by the same portable
    * hash-Bernoulli rule as [[weightedSample]]. Adds `mix_rate`.
    *
    * [[temperatureMix]] flattens a skew by exponent; this hits NAMED
    * proportions — the knob a data-mixture ablation actually turns.
    *
    * Scale: one aggregate over only the targeted strata collects
    * `|targets|` counts to the driver (bounded by the caller's own map,
    * the k-means-centroids class of driver state); the rates embed as
    * literals, so the keep decision is a pure pushed-down scan filter —
    * the corpus never shuffles. Determinism: counts are exact longs,
    * the rate arithmetic is a fixed IEEE expression an independent
    * engine reproduces bit-for-bit from the same literals. */
  def toMixture(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Double], salt: String = "mix"): DataFrame = {
    require(targets.nonEmpty, "graft: toMixture needs at least one target stratum")
    targets.foreach { case (g, w) =>
      require(w > 0.0, s"graft: target weight for '$g' must be > 0, got $w")
    }
    val wSum = targets.values.sum
    val names = targets.keys.toSeq.sorted
    val counts = df.where(col(stratumCol).isin(names: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    names.foreach(g => require(counts.getOrElse(g, 0L) > 0L,
      s"graft: toMixture target stratum '$g' has no rows"))
    // T = min_g(n_g / w_g); rate_g = (w_g · T) / n_g — exact expression
    // order matters (the oracle mirrors these ops on the same literals).
    val t = names.map(g => counts(g).toDouble / (targets(g) / wSum)).min
    val rate = names.map(g =>
      g -> ((targets(g) / wSum) * t) / counts(g).toDouble).toMap
    val rateCol = names.foldLeft(lit(0.0)) { (acc, g) =>
      when(col(stratumCol) === g, lit(rate(g))).otherwise(acc)
    }
    df.where(col(stratumCol).isin(names: _*))
      .withColumn("mix_rate", rateCol)
      .where(
        hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt)))
          .cast("double") < col("mix_rate") * lit(4294967296.0))
  }

  /** Sequence packing: assign documents to packs of at most ~`budget`
    * tokens via a running token-count prefix sum —
    * `local_pack = floor((cumsum - n_tokens) / budget)` (each doc's pack
    * is decided by the budget consumed BEFORE it). Oversized docs occupy
    * packs alone rather than being dropped.
    *
    * Packing is SHARDED: rows hash into `shards` deterministic shards
    * (`pack_shard` = h32(id || "/pack") mod shards) and the prefix-sum
    * window runs per shard, so no single task ever sorts the whole
    * dataset — an unpartitioned window would serialize 100 TB through one
    * task. `pack_id = pack_shard · 2³² + local_pack` stays globally
    * unique. Set `shards` ≈ cluster parallelism; packs are shard-local,
    * which is exactly what a training pipeline wants (any grouping into
    * budget-sized packs is acceptable; global id order is not a packing
    * requirement). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
      budget: Int, shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be positive, got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pack_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCol)
      .withColumn("pack_shard",
        (hashing.h32(concat(col(idCol).cast("string"), lit("/pack"))) % shards).cast("int"))
      .withColumn("pack_id",
        col("pack_shard").cast("long") * lit(4294967296L) +
          floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget.toDouble))
  }

  /** Exact quantile binning on a QUANTIZED grid (curriculum/difficulty
    * buckets, length-stratified batching): each row gets the bin its
    * value's exact rank falls in —
    * `bin = floor(rank_below · nbins / total)` — with ties (equal grid
    * values) always sharing a bin.
    *
    * Scale design: the naive exact route (`ntile` over a global sort, or
    * Spark's `percentile`) either serializes the table through one task
    * or buffers every value per group — both die at 100 TB. Here values
    * quantize to a grid (`scale` decimals-style factor), counts collapse
    * to ONE ROW PER DISTINCT GRID VALUE, and the cumulative rank runs as
    * a window over that grid histogram — whose size is bounded by the
    * value DOMAIN (e.g. 49k cells for a [0,490]×100 grid), not by row
    * count, at any data scale. The unpartitioned window is over those
    * grid rows only. Rows then pick up their bin through a broadcast join
    * on the grid value. Quantization bounds accuracy (values closer than
    * 1/scale tie); rank arithmetic is pure integers — deterministic
    * everywhere. Returns df + `(bin)`. */
  /** Deterministic round-robin INTERLEAVE of strata into one global
    * training order — the "don't feed the model a month of one source
    * then a month of the next" primitive: position `k` of the output
    * cycles through the strata (sorted lexically), each stratum serving
    * its rows in `orderCol` order. Gradient noise then sees every
    * source at every horizon, and the order is a pure function of the
    * data — reshufflable, resumable, engine-reproducible.
    *
    * `order_idx = (rank_within_stratum − 1) · |strata| + stratum_index`
    * — a strict total order (no two rows share an index), gapped where
    * a stratum exhausts (small sources run out early — round-robin
    * semantics; rebalance FIRST with [[temperatureMix]] / [[toMixture]]
    * if proportions should survive to the end of training).
    *
    * Plan shape: ONE stratum-keyed shuffle for the rank window plus a
    * broadcast of the |strata|-row index map; writing the result sorted
    * by `order_idx` is the usual global sort a training-order sink pays
    * ([[graft.sources.ingest.writeShards]] shards it instead). */
  def interleave(
      df: DataFrame,
      stratumCol: String,
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // |strata|-bounded global windows (distinct stratum keys, not rows)
    val idx = broadcast(df.select(col(stratumCol)).distinct()
      .withColumn("_s_idx",
        row_number().over(windows.boundedGlobal("strata", col(stratumCol))
          .orderBy(col(stratumCol))).cast("long") - 1L)
      .withColumn("_n_strata",
        count(lit(1)).over(windows.boundedGlobal("strata", col(stratumCol)))))
    val rk = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(col(orderCol))).cast("long")
    df.join(idx, stratumCol)
      .withColumn("order_idx", (rk - 1L) * col("_n_strata") + col("_s_idx"))
      .drop("_s_idx", "_n_strata")
  }

  def quantileBins(
      df: DataFrame,
      valueCol: Column,
      nbins: Int,
      scale: Double = 100.0): DataFrame = {
    require(nbins >= 1, s"quantileBins needs nbins >= 1, got $nbins")
    import org.apache.spark.sql.expressions.Window
    val gv = floor(valueCol * scale + 0.5).cast("long")
    // Null values are EXCLUDED explicitly: a null grid key would drop out
    // of the equi-join silently (and engines disagree on null sort order
    // in the rank window) — an explicit filter makes the semantics a
    // contract instead of a join artifact.
    val rows = df.where(valueCol.isNotNull)
    val grid = rows.select(gv.as("_gv")).groupBy("_gv")
      .agg(count(lit(1)).as("_cnt"))
    // grid-bounded global windows: rows = distinct quantized score keys
    val w = windows.boundedGlobal("score-grid", col("_gv")).orderBy(col("_gv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mapping = grid
      .withColumn("_below", sum(col("_cnt")).over(w) - col("_cnt"))
      .withColumn("_total", sum(col("_cnt")).over(
        windows.boundedGlobal("score-grid", col("_gv"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_gv"),
        least(lit(nbins - 1L), floor(col("_below") * nbins / col("_total")).cast("long"))
          .as("bin"))
    rows.withColumn("_gv", gv)
      .join(broadcast(mapping), Seq("_gv"))
      .drop("_gv")
  }

  /** Keep the top `frac` of rows by a QUANTIZED score column — the
    * selection step after any quality scorer (FineWeb-Edu keeps the top
    * classifier scores; DSIR keeps the top importance weights): find the
    * highest score threshold whose at-or-above population still reaches
    * `ceil(frac·N)`, then keep every row at or above it. Rows TIED at
    * the threshold are kept whole, so the kept set is the smallest
    * threshold-superset of the target size — deterministic, total-order-
    * free; compose with [[deterministicSample]] inside the tie value for
    * exact counts.
    *
    * Exactness: scores are expected already 4-dp quantized (every graft
    * scorer emits that), so the 1e4 grid key is exact; ranks are integer
    * cumsums over the DESCENDING grid — no doubles anywhere in the keep
    * decision. Plan shape: one grid aggregate (bounded by distinct 4-dp
    * scores), the cumsum window over grid rows, a 1-row threshold
    * broadcast onto the scan — the data is never sorted. */
  def topFracByScore(
      df: DataFrame,
      scoreCol: Column,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0,
      s"topFracByScore needs 0 < frac <= 1, got $frac")
    import org.apache.spark.sql.expressions.Window
    val gv = floor(scoreCol * 10000.0 + 0.5).cast("long")
    val rows = df.where(scoreCol.isNotNull)
    val grid = rows.select(gv.as("_gv")).groupBy("_gv")
      .agg(count(lit(1)).as("_cnt"))
    // grid-bounded global windows: rows = distinct 4-dp score keys
    val w = windows.boundedGlobal("score-grid", col("_gv")).orderBy(col("_gv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // quota = ceil(frac·N) in exact integer arithmetic: the frac is a
    // driver literal, so quantize it once to 1e-6 fixed point
    val fracQ = math.floor(frac * 1.0e6 + 0.5).toLong
    val thr = grid
      .withColumn("_atOrAbove", sum(col("_cnt")).over(w))
      .withColumn("_total", sum(col("_cnt")).over(
        windows.boundedGlobal("score-grid", col("_gv"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // ceil(fracQ·total / 1e6) without doubles (integer DIV — a double
      // division would lose exactness past 2^53 at full corpus counts)
      .withColumn("_quota", expr(s"(_total * ${fracQ}L + 999999L) DIV 1000000L"))
      .where(col("_atOrAbove") >= col("_quota"))
      .agg(max(col("_gv")).as("_thr"))
    rows.withColumn("_gv", gv)
      .crossJoin(broadcast(thr))
      .where(col("_gv") >= col("_thr"))
      .drop("_gv", "_thr")
  }

  /** FIXED-SIZE weighted sample without replacement (Efraimidis–
    * Spirakis A-ES, IPL 2006) — the missing cell next to
    * [[deterministicSample]] (rate, unweighted), [[weightedSample]]
    * (rate, weighted) and [[perGroupSample]] (fixed-size, unweighted):
    * exactly `k` rows, selection probability proportional to weight.
    * Each row draws a deterministic uniform `u` from its id hash and
    * keys on `ln(u)/w` (the monotone twin of the textbook `u^(1/w)` —
    * one transcendental instead of two); the k LARGEST keys win. Same
    * `(id, salt)` → same sample on any engine/cluster/run.
    *
    * Rows with null or non-positive weight are EXCLUDED explicitly
    * (they have no defined inclusion probability; silently keying them
    * would rank them last-but-present). Plan shape: scan-side key
    * computation + TakeOrderedAndProject (per-partition bounded heap,
    * k·P driver merge) — no shuffle, no global sort. */
  def weightedReservoir(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "wres"): DataFrame = {
    require(k >= 1, s"weightedReservoir needs k >= 1, got $k")
    // u in (0,1) from the 63-bit hash: ~10^12 distinct strata, so the
    // id TIEBREAK never decides winners at corpus scale (a 10^6 grid
    // would put ~1000 rows of a 10^9-row corpus in the top stratum and
    // hand the sample to the lowest ids — weight-proportionality lost)
    val u = ((hashing.h63(concat(col(idCol).cast("string"), lit("/" + salt)))
      % 1000000000000L) + 1L).cast("double") / 1.000000000001e12
    df.where(weight.isNotNull && weight > 0)
      .withColumn("_wkey", log(u) / weight)
      .orderBy(col("_wkey").desc, col(idCol))
      .limit(k)
      .drop("_wkey")
  }

  /** Per-group percentile rank (SQL `percent_rank` semantics: fraction
    * of the group strictly below, ties share a rank, single-row group =
    * 0) of a QUANTIZED score — the per-language quality calibration
    * primitive (FineWeb-style pipelines threshold each language on its
    * OWN score distribution; a global cut keeps only the dominant
    * language's idea of quality).
    *
    * Scale design: the textbook `percent_rank().over(partitionBy(lang)
    * .orderBy(score))` sorts every group's full row set — one language
    * is most of the corpus, so that window is a near-global sort with
    * skew. Here the [[quantileBins]]/[[topFracByScore]] grid idiom
    * applies per group: counts collapse to one row per `(group, grid
    * value)`, the rank cumsum runs over that domain-bounded grid, and
    * rows pick up `pct_rank` through a broadcast join — exact integer
    * rank arithmetic, the corpus itself is never sorted. Returns df +
    * `pct_rank`. EXCLUDED explicitly (the [[quantileBins]] contract):
    * rows with a null group key (a null would silently fall out of the
    * grid equi-join anyway — the filter makes it a contract) and rows
    * with a null or NaN score (a NaN would otherwise key to grid cell 0
    * and rank as if the score were 0, where SQL percent_rank sorts NaN
    * largest — neither is a rank worth emitting). */
  def percentileRankBy(
      df: DataFrame,
      groupCol: String,
      scoreCol: Column,
      scale: Double = 10000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gv = floor(scoreCol * scale + 0.5).cast("long")
    val rows = df.where(col(groupCol).isNotNull && scoreCol.isNotNull &&
      !isnan(scoreCol.cast("double")))
    val grid = rows.select(col(groupCol), gv.as("_gv"))
      .groupBy(col(groupCol), col("_gv"))
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_gv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mapping = grid
      .withColumn("_below", sum(col("_cnt")).over(w) - col("_cnt"))
      .withColumn("_n", sum(col("_cnt")).over(
        Window.partitionBy(col(groupCol))))
      .select(col(groupCol), col("_gv"),
        when(col("_n") > 1L,
          col("_below").cast("double") / (col("_n") - 1L).cast("double"))
          .otherwise(lit(0.0)).as("pct_rank"))
    rows.withColumn("_gv", gv)
      .join(broadcast(mapping), Seq(groupCol, "_gv"))
      .drop("_gv")
  }

  /** Token-budget plan for a target training mixture: given per-source
    * mixture `weights` (fractions of the total token `budget` each
    * source should contribute — the DoReMi/data-schedule shape) and a
    * token-count column, emit one planning row per source:
    *
    *   - `n_docs`, `n_tokens` — what the corpus holds,
    *   - `target_tokens = round(weight · budget)` (0 for unlisted
    *     sources — they are excluded by the plan, not silently kept),
    *   - `sample_rate = target/available` — `< 1` means downsample,
    *     `> 1` means the source must repeat to meet its target,
    *   - `n_epochs = ceil(sample_rate)` — passes over the source a
    *     repeat-then-trim schedule needs (the "epochs over source"
    *     number data cards report).
    *
    * The rate itself feeds [[deterministicSample]]/[[toMixture]]; this
    * op is the PLAN, kept separate so the decision is inspectable (and
    * oracle-checkable) before any row is dropped or repeated.
    *
    * Scale shape: one hash aggregation on the source key (map-side
    * partials; sources number in the hundreds, not billions) joined to a
    * broadcast literal weights table — the corpus is scanned once and
    * never reshuffled. */
  def planTokenBudget(
      df: DataFrame,
      sourceCol: String,
      tokenCol: Column,
      weights: Map[String, Double],
      budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w >= 0.0) && budget > 0,
      s"need non-empty weights >= 0 and budget > 0; got $weights budget=$budget")
    val spark = df.sparkSession
    // explicit-schema createDataFrame, not toDF: the product-encoder
    // TypeTag path reflects through the REPL classloader and dies there
    // (Java 17 "Prohibited package name") — same REPL-safety discipline
    // as VecIndex's meta writes.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val w = spark.createDataFrame(
      java.util.Arrays.asList(
        weights.toSeq.sortBy(_._1).map { case (s, d) => Row(s, d) }: _*),
      StructType(Seq(StructField(sourceCol, StringType, nullable = false),
        StructField("_w", DoubleType, nullable = false))))
    // FULL join, not left: a weighted source with NO corpus rows (typo'd
    // name, empty source) must surface as a plan row with n_docs = 0 and
    // a null rate — a left join would silently drop its budget share.
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCol).cast("long").as("n_tokens"))
      .join(broadcast(w), Seq(sourceCol), "full")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("target_tokens",
        floor(coalesce(col("_w"), lit(0.0)) * budget + 0.5).cast("long"))
      // A weighted source with ZERO available tokens has no meaningful
      // rate (target/0 would emit Infinity and epochs = Long.MaxValue):
      // surface NULL so the impossible plan row is visible, not garbage.
      .withColumn("sample_rate", when(col("n_tokens") > 0L,
        col("target_tokens").cast("double") / col("n_tokens")))
      .withColumn("n_epochs", ceil(col("sample_rate")).cast("long"))
      .drop("_w")
  }

  /** Binned CALIBRATION map for a scorer against binary outcomes: equal-
    * width score bins, per-bin count / positives / empirical rate in
    * integer basis points — the table that tells you whether a quality
    * classifier's 0.9 means 90% (and the lookup a pipeline applies as a
    * monotone score → probability correction before thresholding).
    * Histogram-style one-pass groupBy on the bin id; everything integer
    * after the bin floor, so engine-exact. Returns
    * `(bin, bin_lo, bin_hi, n, n_pos, rate_bp)` for non-empty bins. */
  def calibrationMap(
      df: DataFrame,
      scoreCol: Column,
      positiveCol: Column,
      lo: Double,
      hi: Double,
      nbins: Int): DataFrame = {
    require(nbins >= 1 && lo < hi,
      s"graft: calibrationMap needs nbins >= 1 and lo < hi, got $nbins, [$lo, $hi)")
    val width = (hi - lo) / nbins
    val bin = greatest(lit(0L), least(lit(nbins - 1L),
      floor((scoreCol - lo) / width).cast("long")))
    df.where(scoreCol.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(positiveCol, 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1L) * width).as("bin_hi"),
        col("n"), col("n_pos"),
        expr("n_pos * 10000 DIV n").as("rate_bp"))
  }

  /** SEMANTIC training order (related-document packing, "In-Context
    * Pretraining", Shi et al. 2023): assign every document to its
    * nearest centroid and emit a dense global `seq_pos` ordered by
    * `(cluster, centroid distance, id)` — adjacent training positions
    * hold semantically adjacent documents, so long-context batches see
    * related material instead of a random bag. The inverse knob of
    * [[epochShuffle]]; run one or the other per epoch.
    *
    * Scale shape: the argmin is a literal-centroid expression in-scan
    * (no join), distance is QUANTIZED (4dp) before ordering so the
    * sequence is engine-reproducible, and the dense position is
    * [[graft.ops.rel.zipIndex]]'s range-partitioned rank — no
    * single-partition stage anywhere. */
  def semanticOrder(
      df: DataFrame,
      centroids: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      parts: Int = 0): DataFrame = {
    require(centroids.nonEmpty, "graft: semanticOrder needs centroids")
    val v = graft.functions.vectors.asDoubleArray(col(vecCol))
    // Each per-centroid distance is QUANTIZED before the argmin — not
    // just the surfaced ordering distance. Near-tie cluster assignment
    // must not hinge on bit-identical float evaluation across engines;
    // on the 4-dp grid the argmin (first-index tiebreak = lowest
    // centroid id) is exactly reproducible, the same discipline
    // [[graft.ops.ann.kCenterSelect]] applies before its argmax.
    val dists = array(centroids.map { case (_, cvec) =>
      graft.functions.vectors.quantize(
        graft.functions.vectors.l2Squared(v, graft.functions.vectors.vecLit(cvec)),
        4)
    }: _*)
    val cids = array(centroids.map { case (cid, _) => lit(cid) }: _*)
    val assigned = df
      .withColumn("_d", dists)
      .withColumn("cluster_id", element_at(cids,
        array_position(col("_d"), array_min(col("_d"))).cast("int")))
      .withColumn("_cdist", array_min(col("_d"))) // already 4-dp quantized
      .drop("_d")
      .withColumn("_ord",
        struct(col("cluster_id"), col("_cdist"), col(idCol)))
    graft.ops.rel.zipIndex(assigned, "_ord", parts)
      .withColumnRenamed("idx", "seq_pos")
      .drop("_ord", "_cdist")
  }

  /** Deterministic epoch shuffle — the training-order primitive: give
    * every row a pseudo-random but REPRODUCIBLE global position
    * (`epoch_pos`, dense 0-based) keyed on `(seed, id)`, so epoch 1 and
    * epoch 2 use different seeds, every re-run of the job yields the
    * identical order, and any shard of the output can be re-derived
    * independently (no RNG state threading — the order IS a pure
    * function of the data). `ORDER BY rand()` fails all three: it is
    * unseedable per-row, irreproducible across retries (a recomputed
    * task re-draws), and un-auditable.
    *
    * The shuffle key is `md5(seed:id) || '_' || id` — md5 for mixing,
    * the id suffix for UNIQUENESS (zipIndex's determinism contract)
    * even in the astronomically-unlikely digest collision. Scale shape:
    * one range exchange on the key (the same sampled-boundary sort any
    * global sort pays) + [[graft.ops.rel.zipIndex]]'s partition-count-
    * bounded offset math — the corpus never sees a single-partition
    * stage. A writer that only needs shuffled SHARDS (not the audit
    * rank) can skip zipIndex and range-write directly on the same key;
    * `epoch_pos` is what makes the order checkable in an artifact. */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      seed: Long,
      parts: Int = 0): DataFrame = {
    val key = concat(
      md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
      lit("_"), col(idCol).cast("string"))
    graft.ops.rel.zipIndex(df.withColumn("_ekey", key), "_ekey", parts)
      .withColumnRenamed("idx", "epoch_pos")
      .drop("_ekey")
  }

  /** Training-ORDER diversity meter — the audit twin of the ordering
    * family ([[interleave]] / [[epochShuffle]] / [[semanticOrder]]):
    * over consecutive positions of an ordered corpus, the fraction of
    * adjacent pairs drawn from the SAME stratum. A fresh [[interleave]]
    * reads ~0 (round-robin by construction), a good [[epochShuffle]]
    * reads ~Σpᵢ² (the collision mass of the stratum mix), and a
    * [[semanticOrder]] reads deliberately HIGH — so one number says
    * whether the order a trainer is about to consume is the one the
    * pipeline intended, from the artifact instead of a spot check.
    *
    * Scale shape: two thin `(pos, stratum)` projections hash-joined on
    * `pos = pos+1` — no global window, no sort; positions with gaps
    * simply contribute no pair (identical on any engine). Returns one
    * row `(n_pairs, n_same, frac_same)`, fraction 4-dp quantized. */
  def orderDiversity(df: DataFrame, posCol: String,
      stratumCol: String): DataFrame = {
    val a = df.select(col(posCol).cast("long").as("_p"),
      col(stratumCol).as("_sa"))
    val b = df.select((col(posCol).cast("long") - 1L).as("_p"),
      col(stratumCol).as("_sb"))
    a.join(b, "_p")
      .agg(count(lit(1)).as("n_pairs"),
        // coalesce: an order with no adjacent pairs at all (gapped or
        // single-row input) sums over zero rows → NULL, not 0
        coalesce(sum(when(col("_sa") <=> col("_sb"), 1L).otherwise(0L)),
          lit(0L)).as("n_same"))
      .select(col("n_pairs"), col("n_same"),
        when(col("n_pairs") > 0, graft.functions.vectors.quantize(
            col("n_same").cast("double") / col("n_pairs").cast("double"), 4))
          .otherwise(lit(0.0)).as("frac_same"))
  }

  /** Token-BALANCED shard assignment — the export planner for "write n
    * files a trainer reads in parallel": hash sharding balances ROW
    * counts, but token counts per document are heavy-tailed, so
    * hash-balanced shards can differ by whole documents' worth of work.
    * This is serpentine greedy assignment (the parallel-machine
    * scheduling heuristic): rank documents by size descending and deal
    * rank r to shard `r mod n`, direction alternating every pass —
    * big items spread first, the boustrophedon ordering cancels the
    * per-pass bias plain round-robin keeps. Deterministic (pure
    * function of sizes + ids), and per-shard totals land within one
    * document of each other for heavy-tailed inputs.
    *
    * Scale shape: the descending size rank is [[graft.ops.rel.zipIndex]]
    * over a `(-size, id)` struct key — a RANGE exchange, never a
    * single-partition window — and the shard arithmetic is row-local
    * from the rank. Adds `shard` to the input; feed
    * `.write.partitionBy("shard")` or
    * [[graft.sources.ingest.writeShards]]. */
  def balancedShards(
      df: DataFrame,
      idCol: String,
      tokenCol: Column,
      shards: Int,
      parts: Int = 0): DataFrame = {
    require(shards >= 1, s"graft: balancedShards needs shards >= 1, got $shards")
    // null size = zero work, not "sorts first": the negated key would
    // otherwise put null-sized docs at rank 0 (nulls-first ordering)
    // and hand them the emptiest slots big documents need
    val keyed = df.withColumn("_bkey",
      struct((-coalesce(tokenCol, lit(0L))).as("neg_size"), col(idCol).as("tie")))
    val n = lit(shards.toLong)
    // integer pass number: `/` on longs is DOUBLE division in Spark —
    // floor() it or odd passes beyond the first two reverse wrongly
    val pass = floor(col("idx") / n).cast("long")
    graft.ops.rel.zipIndex(keyed, "_bkey", parts)
      .withColumn("shard",
        when(pmod(pass, lit(2L)) === 0, pmod(col("idx"), n))
          .otherwise(n - lit(1L) - pmod(col("idx"), n)).cast("int"))
      .drop("_bkey", "idx")
  }

  /** Preference-pair construction — the DPO/RLHF data-prep primitive:
    * per group (prompt, conversation, query), pair the best-scored
    * response with the worst as `(chosen, rejected)` with the score
    * margin. Groups with fewer than two responses, or where best and
    * worst tie exactly, emit nothing — an equal-score pair teaches a
    * preference model nothing and a tie would make chosen/rejected
    * assignment arbitrary. Null scores are excluded. Tie-breaks within
    * equal scores are deterministic and engine-neutral: chosen takes the
    * SMALLEST id at the top score, rejected the LARGEST id at the bottom
    * score (max/min over `struct(score, −id)` — no window, no sort).
    *
    * Plan shape: ONE narrow-projected group aggregate. Struct extrema
    * are not hash-bufferable, so Spark plans SortAggregate — the
    * partial still combines map-side after a LOCAL spillable sort of
    * the two projected columns, and what crosses the wire is two
    * constant-size struct extrema and a count per (group × partition),
    * never the responses themselves; a prompt with a million candidates
    * costs local sort CPU, not shuffle mass. Margin is one double
    * subtraction of two parquet-exact values — deterministic
    * everywhere. Returns `(groupCol, chosen_id, rejected_id,
    * chosen_score, rejected_score, margin)`. */
  def preferencePairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String): DataFrame =
    df.where(col(scoreCol).isNotNull)
      .select(col(groupCol),
        struct(col(scoreCol).cast("double").as("score"),
          (-col(idCol).cast("long")).as("neg")).as("_sv"))
      .groupBy(col(groupCol))
      .agg(max(col("_sv")).as("_c"), min(col("_sv")).as("_r"),
        count(lit(1)).as("_n"))
      .where(col("_n") >= 2 && col("_c.score") > col("_r.score"))
      .select(col(groupCol),
        (-col("_c.neg")).as("chosen_id"), (-col("_r.neg")).as("rejected_id"),
        col("_c.score").as("chosen_score"), col("_r.score").as("rejected_score"),
        (col("_c.score") - col("_r.score")).as("margin"))

  /** Domain-reweighting plan (the DoReMi / data-mixture shape, Xie et
    * al. 2023 simplified to its serving half): given per-domain TARGET
    * shares in basis points and an epoch cap, compute from the observed
    * token mass what sampling weight each domain needs so the training
    * stream matches the target mixture. All integer basis-point
    * arithmetic — `epochs_bp = (target_bp · total_tokens) DIV
    * (10000 · tokens) · 10000`-style ratios collapse to one BIGINT
    * divide per domain, engine-exact. A domain needing more than
    * `capBp/10000` epochs is capped (upsampling a tiny domain 50× is a
    * memorization bug, not a mixture fix — Muennighoff et al. 2023 put
    * the useful-repeat ceiling near 4), and the realized share after
    * capping is reported so the gap is visible, not silent.
    *
    * Plan shape: ONE hash aggregate over the corpus (map-side partials
    * absorb domain skew), a broadcast of the ≤|domains| target rows, a
    * 1-row total broadcast back via cross join — no second corpus scan,
    * no window. Returns `(domain, n_tokens, share_bp, target_bp,
    * epochs_bp, eff_tokens, realized_bp)` sorted by the caller. */
  def domainReweight(
      df: DataFrame,
      domainCol: String,
      tokenCol: Column,
      targetBp: Map[String, Long],
      capBp: Long = 40000L): DataFrame = {
    require(targetBp.nonEmpty && targetBp.values.forall(_ >= 0L),
      s"graft: domainReweight needs non-empty targets >= 0, got $targetBp")
    require(capBp >= 10000L,
      s"graft: domainReweight cap below 1 epoch makes every domain short, got $capBp")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    // explicit-schema createDataFrame — the planTokenBudget REPL-safety
    // discipline (product-encoder TypeTags die under Java 17 REPL loaders)
    val tgt = spark.createDataFrame(
      java.util.Arrays.asList(
        targetBp.toSeq.sortBy(_._1).map { case (d, b) => Row(d, b) }: _*),
      StructType(Seq(StructField(domainCol, StringType, nullable = false),
        StructField("target_bp", LongType, nullable = false))))
    val perDomain = df.groupBy(col(domainCol))
      .agg(sum(tokenCol).cast("long").as("n_tokens"))
      // FULL join: a targeted domain absent from the corpus must surface
      // as a zero-token plan row, not vanish (planTokenBudget's rule).
      // No broadcast hint — Spark can't broadcast-build a full outer
      // join; both sides here are already ≤|domains| rows, so the sort-
      // merge it plans shuffles plan rows, never the corpus.
      .join(tgt, Seq(domainCol), "full")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("target_bp", coalesce(col("target_bp"), lit(0L)))
    // totals via bounded global windows over the ≤|domains| plan rows —
    // a second aggregate branch would re-scan the corpus; a window over
    // post-aggregation rows costs one 1-partition pass over plan rows
    perDomain
      .withColumn("_total", sum(col("n_tokens")).over(
        windows.boundedGlobal("domains", col(domainCol))))
      .withColumn("share_bp",
        when(col("_total") > 0L, expr("n_tokens * 10000 DIV _total"))
          .otherwise(lit(0L)))
      // epochs_bp = how many passes (in bp) over the domain the target
      // share demands; NULL when the domain has no tokens (impossible
      // plan row — visible, not Infinity), capped at capBp otherwise
      .withColumn("epochs_bp", when(col("n_tokens") > 0L,
        least(expr("target_bp * _total DIV n_tokens"), lit(capBp))))
      .withColumn("eff_tokens",
        coalesce(expr("n_tokens * epochs_bp DIV 10000"), lit(0L)))
      .drop("_total")
      // realized share is over the EFFECTIVE stream (what training sees),
      // so its denominator is Σ eff — a global window over the ≤|domains|
      // plan rows, bounded by construction
      .withColumn("_eff_total", sum(col("eff_tokens")).over(
        windows.boundedGlobal("domains", col(domainCol))))
      .withColumn("realized_bp", when(col("_eff_total") > 0L,
        expr("eff_tokens * 10000 DIV _eff_total")).otherwise(lit(0L)))
      .drop("_eff_total")
  }

  /** Freshness-decay scoring: halve a document's quality weight every
    * `halfLifeDays` of age, entirely in integer arithmetic —
    * `score = weight >> min(62, age_days DIV halfLifeDays)` — so the
    * decay curve is a step-exponential both engines reproduce bit-for-
    * bit (a float `exp(-age/τ)` would be the textbook form; the
    * half-life shift is its engine-portable twin, and recency tiers are
    * all a curation order consumes). Emits the top `k` per group by
    * `(score, -id)` — WindowGroupLimit prunes to per-partition heaps,
    * nothing global sorts. `asOf` pins NOW as an explicit instant so
    * the query is deterministic and re-runnable (wall-clock NOW inside
    * a data pipeline is a reproducibility bug).
    *
    * Returns the group/id/age/score columns plus `rnk` (1-based). */
  def freshnessTopK(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tsCol: String,
      weight: Column,
      asOf: String,
      halfLifeDays: Int,
      k: Int): DataFrame = {
    require(halfLifeDays >= 1 && k >= 1,
      s"graft: freshnessTopK needs halfLifeDays >= 1, k >= 1; got $halfLifeDays, $k")
    val age = datediff(lit(asOf).cast("date"), col(tsCol).cast("date")).cast("long")
    val halvings = least(lit(62L), age.divide(lit(halfLifeDays)).cast("long"))
      .cast("int")
    val scored = df
      .where(col(tsCol).isNotNull && col(tsCol).cast("date") <= lit(asOf).cast("date"))
      .select(col(groupCol), col(idCol), age.as("age_days"),
        // dynamic shift amount, so the registry form (the Int-literal
        // functions.shiftright overload can't take a per-row column)
        call_function("shiftright", weight.cast("long"), halvings).as("score"))
    rel.topKPerGroup(scored, Seq(col(groupCol)),
      Seq(col("score").desc, col(idCol).asc), k, "rnk")
  }

  /** Split-leakage meter: cross near-dup pairs (from any detector —
    * [[graft.ops.dedup.minhashNearDupPairs]], simhash, embedding
    * pairs...) with a per-id split assignment and count pairs per
    * unordered split combination. A nonzero `crosses = 1` row is a
    * leaked eval set: a document's near-duplicate sits across the
    * train/test fence, so held-out metrics silently measure
    * memorization — the failure [[groupSplit]] prevents for SAME-group
    * dups and this detects for cross-group ones (mirror sites, syndicated
    * articles). Run after splitting, before training.
    *
    * Plan shape: two id-keyed joins of the (already banded, never
    * O(n²)) pair table against the id→split map, then a ≤ |splits|²
    * aggregation. Returns `(split_a, split_b, n_pairs, crosses)` with
    * `split_a <= split_b`. */
  def splitLeakage(
      pairs: DataFrame,
      assign: DataFrame,
      idCol: String,
      splitCol: String = "split",
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val a = assign.select(col(idCol).as(idACol), col(splitCol).as("_sa"))
    val b = assign.select(col(idCol).as(idBCol), col(splitCol).as("_sb"))
    pairs.join(a, idACol).join(b, idBCol)
      .groupBy(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("crosses", (col("split_a") =!= col("split_b")).cast("long"))
  }

  /** Distribution matching by deterministic rejection: filter `df` so a
    * bounded numeric feature's distribution matches a TARGET corpus's —
    * the continuous-feature companion to [[toMixture]]'s categorical
    * calibration (match a new crawl's length/score profile to the
    * existing training set before mixing it in). Feature values bucket
    * to a `binWidth` grid; per bin the acceptance rate is the classic
    * rejection form `p(bin) = ratio(bin)/M` with
    * `ratio = targetFrac/sourceFrac` and `M = max ratio` (maximal
    * acceptance), and each row keeps iff
    * `h32(id/salt) % 10⁶ < keep_ppm(bin)` — a pure scan filter,
    * reproducible bit-for-bit, stable under corpus growth.
    *
    * Determinism: ratios are single IEEE divisions of exact integer
    * counts in a FIXED expression order, the max runs over grid rows,
    * and the final `keep_ppm` is floor-quantized — engine-identical.
    * Both histograms and the rate table are GRID-bounded
    * (feature-range/binWidth — [[graft.ops.windows.boundedGlobal]]);
    * the rates broadcast back onto the scan. Bins the target never
    * saw keep nothing; conversely, target mass in bins the SOURCE never
    * saw is unreachable and drops out of the target total — fractions
    * renormalize over the source's support (rejection can only delete,
    * never invent). Returns `df` plus `(bin, keep_ppm, kept)`. */
  def matchDistribution(
      df: DataFrame,
      feature: Column,
      target: DataFrame,
      targetFeature: Column,
      idCol: String,
      binWidth: Long = 1L,
      salt: String = "mdist"): DataFrame = {
    require(binWidth >= 1, s"graft: matchDistribution needs binWidth >= 1")
    import org.apache.spark.sql.expressions.Window
    // floor-division binning: floor(f/w) over exact integer doubles is
    // misrounding-free below 2^53 and matches DuckDB's integer `//`
    // (floor) for every sign
    def binOf(f: Column) =
      floor(f.cast("long").cast("double") / lit(binWidth.toDouble)).cast("long")
    def hist(d: DataFrame, f: Column) =
      d.where(f.isNotNull)
        .groupBy(binOf(f).as("bin"))
        .agg(count(lit(1)).as("_n"))
    val s = hist(df, feature)
    val t = hist(target, targetFeature)
    val wg = windows.boundedGlobal("feature-grid", col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // note: Spark resolves column names case-insensitively — the totals
    // must NOT be spelled `_Ns`/`_Nt` or withColumn REPLACES the per-bin
    // counts (observed: every ratio collapsed to 1.0)
    val rates = s.withColumnRenamed("_n", "_ns")
      .join(t.withColumnRenamed("_n", "_nt"), Seq("bin"), "left")
      .withColumn("_nt", coalesce(col("_nt"), lit(0L)))
      .withColumn("_tot_s", sum(col("_ns")).over(wg))
      .withColumn("_tot_t", sum(col("_nt")).over(wg))
      .withColumn("_ratio",
        (col("_nt").cast("double") / col("_tot_t").cast("double"))
          / (col("_ns").cast("double") / col("_tot_s").cast("double")))
      .withColumn("_m", max(col("_ratio")).over(wg))
      .select(col("bin"), when(col("_m") > 0.0,
        floor(col("_ratio") / col("_m") * 1000000.0).cast("long"))
        .otherwise(lit(0L)).as("keep_ppm"))
    df.withColumn("bin", binOf(feature))
      .join(broadcast(rates), Seq("bin"), "left")
      .withColumn("keep_ppm", coalesce(col("keep_ppm"), lit(0L)))
      .withColumn("kept",
        (hashing.h32(concat(col(idCol).cast("string"), lit("/" + salt)))
          % 1000000L < col("keep_ppm")).cast("long"))
  }

  /** 1-D Wasserstein (earth-mover's) distance between two corpora's
    * distributions of a bounded non-negative feature — the drift meter
    * that respects ORDER ([[graft.ops.text.corpusDivergence]]'s KL
    * treats 510-vs-520-char docs as unrelated categories; EMD knows
    * they are close). Both sides bin to the `binWidth` grid; on the
    * merged grid `EMD = Σ |CDF_a − CDF_b| · gap`, computed exactly as
    * `Σ |cumA·N_b − cumB·N_a| · gap` in integers with the single float
    * quotient `emd_q4 = num · binWidth / (N_a·N_b)` at the end (units
    * of the raw feature).
    *
    * Plan shape: two grid histograms (bounded), one merged-grid outer
    * join, cumulative sums and the lead-gap over GRID rows
    * ([[graft.ops.windows.boundedGlobal]]). Returns one row
    * `(n_a, n_b, emd_num, emd_q4)`. */
  def emd1d(
      a: DataFrame,
      aFeature: Column,
      b: DataFrame,
      bFeature: Column,
      binWidth: Long = 1L): DataFrame = {
    require(binWidth >= 1, s"graft: emd1d needs binWidth >= 1")
    import org.apache.spark.sql.expressions.Window
    def binOf(f: Column) =
      floor(f.cast("long").cast("double") / lit(binWidth.toDouble)).cast("long")
    def hist(d: DataFrame, f: Column, n: String) =
      d.where(f.isNotNull).groupBy(binOf(f).as("bin"))
        .agg(count(lit(1)).as(n))
    val merged = hist(a, aFeature, "_na")
      .join(hist(b, bFeature, "_nb"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("_na"), lit(0L)).as("_na"),
        coalesce(col("_nb"), lit(0L)).as("_nb"))
    val wg = windows.boundedGlobal("feature-grid", col("bin")).orderBy(col("bin"))
    val run = wg.rowsBetween(Window.unboundedPreceding, 0)
    val all = wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    merged
      .withColumn("_ca", sum(col("_na")).over(run))
      .withColumn("_cb", sum(col("_nb")).over(run))
      .withColumn("_ta", sum(col("_na")).over(all))
      .withColumn("_tb", sum(col("_nb")).over(all))
      .withColumn("_gap", lead(col("bin"), 1).over(wg) - col("bin"))
      .where(col("_gap").isNotNull)
      .select(col("_ta"), col("_tb"),
        (abs(col("_ca") * col("_tb") - col("_cb") * col("_ta")) * col("_gap"))
          .as("_term"))
      .groupBy(col("_ta").as("n_a"), col("_tb").as("n_b"))
      .agg(sum(col("_term")).as("emd_num"))
      .withColumn("emd_q4", when(col("n_a") > 0L && col("n_b") > 0L,
        graft.functions.vectors.quantize(
          col("emd_num").cast("double") * lit(binWidth.toDouble)
            / (col("n_a").cast("double") * col("n_b").cast("double")), 4)))
  }

  /** Cumulative Poisson(1) CDF thresholds for [[bootstrapCI]]'s
    * hash-uniform inverse transform (`P(X ≤ k)` for k = 0..5; weights
    * cap at 6). Computed once and injected as the SAME double literals
    * into both the Spark plan and the oracle SQL. */
  private[graft] val PoissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0, 163.0 / 60.0).map(_ * e1)
  }

  /** Deterministic Poisson bootstrap (the online/streaming bootstrap of
    * Oza & Russell 2001, hash-seeded): error bars for the mean of any
    * metric WITHOUT resampling the dataset — each row's multiplicity in
    * resample `r` is Poisson(1), inverse-transformed from the portable
    * id hash, so resamples are reproducible bit-for-bit by any engine
    * and stable under partitioning. Surfaces each resample's exact
    * integer (weighted n, weighted cents) plus its floor-4dp mean —
    * rank the `reps` means downstream for any percentile interval, or
    * read the spread directly.
    *
    * Scale shape: the classic multiplicity trick — NO per-resample
    * passes and no shuffled copies: one scan explodes each row into its
    * `reps` (replicate, weight) pairs row-locally, and map-side partial
    * aggregation collapses every task's output to ≤ `reps` rows before
    * the one exchange (compute cost `reps`× the scan, shuffle mass
    * tasks·reps rows — corpus-independent). Weights cap at 6
    * (P(X > 6) ≈ 8·10⁻⁵: at most ~1 in 12k rows is clipped by one
    * count, a bias far below bootstrap noise; documented, not silent).
    * Returns `(rep, n_eff, cents, mean_q4)` — `reps` rows. */
  def bootstrapCI(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      reps: Int = 40,
      salt: String = "boot"): DataFrame = {
    require(reps >= 2, s"graft: bootstrapCI needs reps >= 2, got $reps")
    // ONE digest per row; the reps uniforms come from the affine family
    // over it (the minhash discipline — k transforms, not k digests;
    // this was an 8.9 s -> sub-2 s change at sf0.1, 40 md5s/row is real
    // money). (2·rep+1)·h < 2^38: no overflow under ANSI arithmetic.
    val u = ((col("_h") * (lit(2L) * col("rep") + lit(1L))
      + lit(12582917L) * col("rep")) % lit(hashing.AffineP)).cast("double") /
      lit(hashing.AffineP.toDouble)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(6L): Column) {
      case ((t, k), rest) => when(u < lit(t), lit(k.toLong)).otherwise(rest)
    }
    df.where(col(valueCol).isNotNull)
      .select(col(idCol), floor(col(valueCol) * 100.0).cast("long").as("_c"))
      .withColumn("_h", hashing.h32(
        concat(col(idCol).cast("string"), lit("/" + salt))))
      .withColumn("rep", explode(sequence(lit(0L), lit((reps - 1).toLong))))
      .withColumn("_w", w)
      .groupBy(col("rep"))
      .agg(sum(col("_w")).as("n_eff"), sum(col("_w") * col("_c")).as("cents"))
      .withColumn("mean_q4", when(col("n_eff") > 0L,
        floor(col("cents").cast("double") / col("n_eff").cast("double")
          * 10000.0) / 10000.0))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the did-the-distribution-
    * move meter (release gating on score drift, slice-vs-slice skew).
    * `D = max_v |F_a(v) − F_b(v)|` computed EXACTLY over the value grid:
    * per-value counts from each side, full-outer-joined, cumulated, and
    * compared as the cross-multiplied integers `|ca·n_b − cb·n_a|` so no
    * division happens before the final quantized readout (the
    * [[emd1d]] rational discipline — same grid, max instead of
    * gap-weighted sum).
    *
    * Scale shape: two hash-aggregates (one scan each side), one
    * full-outer join on the value grid, one bounded-global window — the
    * grid is value-domain-sized (callers pass QUANTIZED values: cents,
    * char counts, ppm scores), never row-sized. Exact while
    * `n_a·n_b < 2⁶³` (~3·10⁹ rows per side). Returns one row
    * `(n_a, n_b, ks_num, ks_q6)` with `ks_q6 = ks_num/(n_a·n_b)`
    * floor-quantized to 6dp. */
  def ksStat(
      a: DataFrame,
      aFeature: Column,
      b: DataFrame,
      bFeature: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def hist(d: DataFrame, f: Column, n: String) =
      d.where(f.isNotNull).groupBy(f.cast("long").as("v"))
        .agg(count(lit(1)).as(n))
    val merged = hist(a, aFeature, "_na")
      .join(hist(b, bFeature, "_nb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("_na"), lit(0L)).as("_na"),
        coalesce(col("_nb"), lit(0L)).as("_nb"))
    val wg = windows.boundedGlobal("value-grid", col("v")).orderBy(col("v"))
    val run = wg.rowsBetween(Window.unboundedPreceding, 0)
    val all = wg.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    merged
      .withColumn("_ca", sum(col("_na")).over(run))
      .withColumn("_cb", sum(col("_nb")).over(run))
      .withColumn("_ta", sum(col("_na")).over(all))
      .withColumn("_tb", sum(col("_nb")).over(all))
      .groupBy(col("_ta").as("n_a"), col("_tb").as("n_b"))
      .agg(max(abs(col("_ca") * col("_tb") - col("_cb") * col("_ta")))
        .as("ks_num"))
      .withColumn("ks_q6", when(col("n_a") > 0L && col("n_b") > 0L,
        graft.functions.vectors.quantize(
          col("ks_num").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6)))
  }

  /** Per-(group, bin) exact histogram counts — the mergeable substrate
    * for [[psiFrom]] and the streaming hist-drift meter
    * ([[graft.streaming.EventStream.histDriftStream]]): one count per
    * row, so grid snapshots MERGE BY ADDITION across restarts/backfills
    * and the same code runs as a watermarked streaming aggregation.
    * Returns `(groupCols…, bin, n)`. */
  def histGrid(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[Column],
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"graft: histGrid needs binWidth >= 1")
    val bin = floor(valueCol.cast("long").cast("double")
      / lit(binWidth.toDouble)).cast("long").as("bin")
    df.where(valueCol.isNotNull)
      .groupBy((groupCols :+ bin): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Population Stability Index per group against one reference
    * histogram — the classic drift score over [[histGrid]] snapshots:
    * `PSI_g = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)` with add-one
    * smoothing over the group's union bin domain
    * (`p = (n+1)/(total+|bins|)`, so bins absent from one side stay
    * finite and the score is exactly reproducible from integer counts).
    * Each bin's term is floor-quantized to a 1e-12 fixed-point LONG
    * before the sum (the [[graft.ops.text.corpusDivergence]] order-free
    * addition rule), then the total reads out at 6dp.
    *
    * Scale shape: `ref` is a bounded bin grid (broadcast onto the
    * per-group domain); the full-outer join and both aggregates are
    * grid-sized, never row-sized. PSI conventions: < 0.1 stable,
    * 0.1–0.25 moderate shift, > 0.25 major shift. Returns
    * `(groupKeys…, n_cur, bins, psi_q6)`. */
  /** Shared union-domain construction for the grid-drift readouts
    * ([[psiFrom]], [[ksFrom]], [[emdFrom]]): per group, the union of the
    * reference grid's bins and the group's own bins, each row carrying
    * `(_nr, _nc)` exact counts — built WITHOUT a full-outer self-join
    * (ref and cur often derive from the same grid — e.g. scoring a sink
    * snapshot against its own first window — and a join between frames
    * sharing lineage hits Spark's conflicting-reference resolution):
    * every group is crossed with the broadcast ref bins, cur rows union
    * in, and one (group, bin) aggregate folds the two tags. max(_nr) is
    * exact — each ref bin appears once per group. */
  private def unionGrid(
      ref: DataFrame,
      cur: DataFrame,
      groupKeys: Seq[String],
      what: String): DataFrame = {
    val reserved = groupKeys.intersect(Seq("bin", "n", "_nr", "_nc"))
    require(reserved.isEmpty,
      s"graft: $what group keys collide with grid columns: $reserved")
    cur.select(groupKeys.map(col): _*).distinct()
      .crossJoin(broadcast(ref.select(col("bin"), col("n").as("_nr"))))
      .withColumn("_nc", lit(0L))
      .unionByName(cur.select((groupKeys.map(col) :+ col("bin")
        :+ lit(0L).as("_nr") :+ col("n").as("_nc")): _*))
      .groupBy((groupKeys.map(col) :+ col("bin")): _*)
      .agg(max(col("_nr")).as("_nr"), sum(col("_nc")).as("_nc"))
  }

  def psiFrom(
      ref: DataFrame,
      cur: DataFrame,
      groupKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scale = lit(1.0e12)
    // Group totals via a group-partitioned window (bins-bounded frames),
    // so the term pass reuses the aggregate's exchange — one shuffle for
    // the whole finish.
    val wg = Window.partitionBy(groupKeys.map(col): _*)
    val pr = (col("_nr").cast("double") + lit(1.0)) /
      (col("_tr").cast("double") + col("_vb").cast("double"))
    val pc = (col("_nc").cast("double") + lit(1.0)) /
      (col("_tc").cast("double") + col("_vb").cast("double"))
    unionGrid(ref, cur, groupKeys, "psiFrom")
      .withColumn("_tr", sum(col("_nr")).over(wg))
      .withColumn("_tc", sum(col("_nc")).over(wg))
      .withColumn("_vb", count(lit(1)).over(wg))
      .select((groupKeys.map(col) :+ col("_tc") :+ col("_vb")
        :+ floor((pc - pr) * log(pc / pr) * scale).cast("long")
          .as("_term")): _*)
      .groupBy(groupKeys.map(col): _*)
      .agg(max(col("_tc")).as("n_cur"), max(col("_vb")).as("bins"),
        sum(col("_term")).as("_psi_fp"))
      .withColumn("psi_q6", graft.functions.vectors.quantize(
        col("_psi_fp").cast("double") / lit(1.0e12), 6))
      .drop("_psi_fp")
  }

  /** Per-group Kolmogorov–Smirnov statistic against one reference
    * [[histGrid]] — [[ksStat]]'s finish over grid snapshots, so the SAME
    * streaming sink ([[graft.streaming.EventStream.histDriftStream]])
    * feeds PSI, KS, and EMD readouts. On binWidth-1 grids this equals
    * [[ksStat]] on the raw values exactly (SampleSpec pins the law);
    * coarser bins measure KS of the binned distributions — the standard
    * streaming tradeoff, and monotone bins keep it a lower bound of the
    * raw D. Same cross-multiplied-integer discipline: no division before
    * the quantized readout. Returns `(groupKeys…, n_ref, n_cur, ks_num,
    * ks_q6)`. */
  def ksFrom(
      ref: DataFrame,
      cur: DataFrame,
      groupKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(groupKeys.map(col): _*)
    val run = wg.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unionGrid(ref, cur, groupKeys, "ksFrom")
      .withColumn("_ca", sum(col("_nr")).over(run))
      .withColumn("_cc", sum(col("_nc")).over(run))
      .withColumn("_tr", sum(col("_nr")).over(wg))
      .withColumn("_tc", sum(col("_nc")).over(wg))
      .groupBy((groupKeys.map(col) :+ col("_tr").as("n_ref")
        :+ col("_tc").as("n_cur")): _*)
      .agg(max(abs(col("_ca") * col("_tc") - col("_cc") * col("_tr")))
        .as("ks_num"))
      .withColumn("ks_q6", when(col("n_ref") > 0L && col("n_cur") > 0L,
        graft.functions.vectors.quantize(
          col("ks_num").cast("double")
            / (col("n_ref").cast("double") * col("n_cur").cast("double")),
          6)))
  }

  /** Per-group 1-D earth mover's distance against one reference
    * [[histGrid]] — [[emd1d]]'s finish over grid snapshots (the third
    * readout of the drift sink). `binWidth` scales bin gaps back to
    * value units and must be the width the grids were built with.
    * Returns `(groupKeys…, n_ref, n_cur, emd_num, emd_q4)`. */
  /** One-stop DRIFT CARD: PSI + KS + EMD per group against ONE
    * reference grid — the three finishes of the same [[histGrid]] /
    * [[graft.streaming.EventStream.histDriftStream]] sink snapshot joined into a
    * single readout row per group, the distribution-shift analogue of
    * the corpus-report composition: PSI for the banded
    * stable/moderate/major verdict, KS for the sharpest single-point
    * CDF gap, EMD for how FAR the mass moved. A group scored against
    * its own bins reads (0, 0, 0) — the self-consistency row.
    *
    * Scale shape: callers should [[ckpt]]-cut the grid so the three
    * finishes reread GRID rows (one corpus scan total); every stage is
    * grid-sized and the final join keys on the thin group domain.
    * Returns `(groupKeys…, n_ref, n_cur, bins, psi_q6, ks_q6,
    * emd_q4)`. */
  def driftCard(
      ref: DataFrame,
      cur: DataFrame,
      groupKeys: Seq[String],
      binWidth: Long = 1L): DataFrame = {
    val psi = psiFrom(ref, cur, groupKeys)
      .select((groupKeys.map(col) :+ col("n_cur") :+ col("bins")
        :+ col("psi_q6")): _*)
    val ks = ksFrom(ref, cur, groupKeys)
      .select((groupKeys.map(col) :+ col("n_ref") :+ col("ks_q6")): _*)
    val emd = emdFrom(ref, cur, groupKeys, binWidth)
      .select((groupKeys.map(col) :+ col("emd_q4")): _*)
    // one row per group on every side — broadcast the ks/emd readouts
    // so the card never sort-merge joins its own thin group domain
    psi.join(broadcast(ks), groupKeys).join(broadcast(emd), groupKeys)
      .select((groupKeys.map(col) :+ col("n_ref") :+ col("n_cur")
        :+ col("bins") :+ col("psi_q6") :+ col("ks_q6")
        :+ col("emd_q4")): _*)
  }

  def emdFrom(
      ref: DataFrame,
      cur: DataFrame,
      groupKeys: Seq[String],
      binWidth: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidth >= 1, s"graft: emdFrom needs binWidth >= 1")
    val wg = Window.partitionBy(groupKeys.map(col): _*)
    val wo = wg.orderBy(col("bin"))
    val run = wo.rowsBetween(Window.unboundedPreceding, 0)
    unionGrid(ref, cur, groupKeys, "emdFrom")
      .withColumn("_ca", sum(col("_nr")).over(run))
      .withColumn("_cc", sum(col("_nc")).over(run))
      .withColumn("_tr", sum(col("_nr")).over(wg))
      .withColumn("_tc", sum(col("_nc")).over(wg))
      .withColumn("_gap", lead(col("bin"), 1).over(wo) - col("bin"))
      .where(col("_gap").isNotNull)
      .groupBy((groupKeys.map(col) :+ col("_tr").as("n_ref")
        :+ col("_tc").as("n_cur")): _*)
      .agg(sum(abs(col("_ca") * col("_tc") - col("_cc") * col("_tr"))
        * col("_gap")).as("emd_num"))
      .withColumn("emd_q4", when(col("n_ref") > 0L && col("n_cur") > 0L,
        graft.functions.vectors.quantize(
          col("emd_num").cast("double") * lit(binWidth.toDouble)
            / (col("n_ref").cast("double") * col("n_cur").cast("double")),
          4)))
  }

  /** Sequence LAYOUT map — the concat-and-chunk packing (GPT-2 /
    * LLaMA-style pretraining batches): documents are concatenated into
    * `shards` independent token streams and the stream is cut every
    * `seqLen` tokens, so every training sequence is exactly full and a
    * document crossing a cut boundary is split across consecutive
    * sequences. This op computes, per document, WHERE it lands:
    * `(shard, start, bin_first, bin_last, split)` — the deterministic
    * layout a packing loader materializes, auditable before any GPU
    * sees it (split-rate too high → raise seqLen or pre-chunk docs).
    *
    * Determinism & oracle-replicability: shard = `id mod shards` and
    * in-shard order = id — a pure function of the table (pass a
    * pre-hashed id for randomized placement; [[epochShuffle]] provides
    * exactly that key). Zero-token documents occupy no stream space and
    * are EXCLUDED (they'd otherwise alias the next doc's start).
    *
    * Plan shape (100 TB): one shuffle on `shard`, one running-sum
    * window per shard partition ordered by id — each shard stream is
    * corpus/`shards` rows, so `shards` is the parallelism knob (1024 on
    * a big cluster); nothing global, nothing on the driver. */
  def packLayout(
      df: DataFrame,
      textCol: String,
      idCol: String,
      seqLen: Long = 2048L,
      shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen >= 1, s"graft: packLayout needs seqLen >= 1, got $seqLen")
    require(shards >= 1, s"graft: packLayout needs shards >= 1, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
        size(text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0L)
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_first", expr(s"start DIV $seqLen"))
      .withColumn("bin_last", expr(s"(start + n_tokens - 1) DIV $seqLen"))
      .withColumn("split", (col("bin_last") > col("bin_first")).cast("long"))
  }

  /** Per-shard packing data card over [[packLayout]]:
    * `(shard, n_docs, n_tokens, n_bins, tail_pad, split_docs)` —
    * `n_bins = ceil(tokens/seqLen)`, `tail_pad` the padding wasted in
    * the shard's final partial sequence, `split_docs` how many documents
    * straddle a cut. The packing-efficiency readout (total pad / total
    * tokens) and the doc-integrity readout (split rate) in one
    * shard-sized grid. */
  def packStats(
      df: DataFrame,
      textCol: String,
      idCol: String,
      seqLen: Long = 2048L,
      shards: Int = 32): DataFrame =
    packLayout(df, textCol, idCol, seqLen, shards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("split")).as("split_docs"))
      .withColumn("n_bins", expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen"))
      .withColumn("tail_pad", col("n_bins") * seqLen - col("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_bins"),
        col("tail_pad"), col("split_docs"))
}
