package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** sample-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object SampleRegistry extends Registry {

    // north-star: score-threshold selection — keep the top 25% of docs
    // by entropy; integer grid ranks, threshold broadcast, no data sort.
  b.q(
    "sample_top_frac" -> ((s, dir) =>
      sample.topFracByScore(
        text.charEntropy(table(s, dir, "documents"), "text", "doc_id"),
        col("entropy"), frac = 0.25)
        .orderBy(col("doc_id")))
  )
  b.o(
    "sample_top_frac" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cf AS (SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM ch GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars,
        |  sum(floor(cnt * ln(cnt::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS qa
        |  FROM cf GROUP BY 1),
        |ent AS (SELECT doc_id, n_chars,
        |  floor(-(qa::DOUBLE / 1000000.0 - n_chars::DOUBLE * ln(n_chars::DOUBLE))
        |    / n_chars::DOUBLE * 10000.0 + 0.5) / 10000.0 AS entropy FROM a),
        |e AS (SELECT doc_id, n_chars, entropy,
        |  floor(entropy * 10000.0 + 0.5)::BIGINT AS gv FROM ent),
        |g AS (SELECT gv, count(*)::BIGINT AS cnt FROM e GROUP BY 1),
        |c AS (SELECT gv, sum(cnt) OVER (ORDER BY gv DESC) AS ato,
        |  sum(cnt) OVER () AS total FROM g),
        |t AS (SELECT max(gv) AS thr FROM c
        |  WHERE ato >= (total * 250000 + 999999) // 1000000)
        |SELECT doc_id, n_chars, entropy FROM e, t WHERE gv >= thr
        |ORDER BY doc_id""".stripMargin
  )

    // north-star: per-stratum deterministic reservoir — exactly n rows
    // per language by portable hash rank (WindowGroupLimit bounded heap).
  b.q(
    "sample_reservoir" -> ((s, dir) =>
      sample.perGroupSample(table(s, dir, "documents"), "lang", "doc_id", n = 5)
        .select(col("lang"), col("doc_id"), col("sample_rank"))
        .orderBy(col("lang"), col("sample_rank")))
  )
  b.o(
    "sample_reservoir" ->
      s"""SELECT lang, doc_id, sample_rank FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${hashing.sqlH32("(doc_id::VARCHAR || '/res')")}, doc_id) AS sample_rank
         |  FROM documents) WHERE sample_rank <= 5
         |ORDER BY lang, sample_rank""".stripMargin
  )

    // north-star: temperature-based language rebalancing (XLM/mC4 alpha
    // sampling) — rarest language keeps 100%, dominant one downsampled.
  b.q(
    "sample_temperature" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val kept = sample.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          vectors.quantize(max(col("mix_rate")), 4).as("rate"))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_in"))
        .join(kept, "lang")
        .select(col("lang"), col("n_in"), col("n_kept"), col("rate"))
        .orderBy(col("lang"))
    })
  )
  b.o(
    "sample_temperature" ->
      s"""WITH n AS (SELECT lang, count(*)::BIGINT AS n_in FROM documents GROUP BY 1),
         |m AS (SELECT min(n_in) AS n_min FROM n),
         |r AS (SELECT lang, n_in,
         |  pow(n_in::DOUBLE / (SELECT n_min FROM m)::DOUBLE, -0.5) AS rate FROM n),
         |kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
         |  WHERE ${hashing.sqlH32("(d.doc_id::VARCHAR || '/tmix')")}::DOUBLE < rate * 4294967296.0)
         |SELECT r.lang, r.n_in,
         |  (SELECT count(*) FROM kept k WHERE k.lang = r.lang)::BIGINT AS n_kept,
         |  floor(r.rate * 10000.0 + 0.5) / 10000.0 AS rate
         |FROM r ORDER BY r.lang""".stripMargin
  )

    // north-star: token-budget mixture plan — per-source targets, sample
    // rates, and epoch counts for an explicit weights→budget schedule
    // (sources outside the weights map plan to zero, not pass-through).
  b.q(
    "sample_token_budget" -> ((s, dir) =>
      sample.planTokenBudget(table(s, dir, "documents"), "source",
          text.tokenCount(col("text")),
          Map("src0" -> 0.4, "src1" -> 0.25, "src2" -> 0.2, "src3" -> 0.15),
          budget = 1000000L)
        .orderBy(col("source")))
  )
    // Plan arithmetic replayed in the same IEEE double ops: round the
    // weight·budget product via floor(+0.5), divide by the BIGINT token
    // sum cast to double, ceil for epochs.
  b.o(
    "sample_token_budget" ->
      s"""WITH t AS (SELECT source, count(*) AS n_docs,
         |    sum(len($SqlToks))::BIGINT AS n_tokens
         |  FROM documents GROUP BY source),
         |w(source, w) AS (VALUES ('src0', 0.4), ('src1', 0.25),
         |                        ('src2', 0.2), ('src3', 0.15))
         |SELECT source, coalesce(n_docs, 0) AS n_docs,
         |  coalesce(n_tokens, 0) AS n_tokens,
         |  floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT AS target_tokens,
         |  CASE WHEN coalesce(n_tokens, 0) > 0 THEN floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT::DOUBLE / n_tokens END AS sample_rate,
         |  ceil(CASE WHEN coalesce(n_tokens, 0) > 0 THEN floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT::DOUBLE / n_tokens END)::BIGINT AS n_epochs
         |FROM t FULL JOIN w USING (source)
         |ORDER BY source""".stripMargin
  )

    // north-star: per-language percentile rank of a score — the
    // quality-calibration primitive (per-lang thresholds, not a global
    // cut). n_chars is already integral, so scale=1 makes the grid key
    // exact and the ranks match SQL percent_rank bit-for-bit.
  b.q(
    "sample_pct_rank" -> ((s, dir) =>
      sample.percentileRankBy(
          table(s, dir, "documents").select(col("doc_id"), col("lang"),
            col("n_chars")),
          "lang", col("n_chars"), scale = 1.0)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("pct_rank"))
        .orderBy(col("doc_id")))
  )
    // percent_rank is the exact SQL semantics the grid-rank computes:
    // strictly-below count over (n-1), ties share, single-row group = 0.
  b.o(
    "sample_pct_rank" ->
      """SELECT doc_id, lang, n_chars,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin
  )

    // exact quantile binning on a quantized grid — the rank cumsum runs
    // over domain-bounded grid rows, never over the table.
  b.q(
    "sample_quantile_bins" -> ((s, dir) =>
      sample.quantileBins(table(s, dir, "documents"),
          col("n_chars").cast("double"), nbins = 4, scale = 1.0)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo_chars"), max(col("n_chars")).as("hi_chars"))
        .orderBy(col("bin")))
  )
    // Grid histogram → exclusive-rank cumsum → integer bin arithmetic;
    // `/` is double division in both engines, floored identically.
  b.o(
    "sample_quantile_bins" ->
      """WITH g AS (SELECT floor(n_chars * 1.0 + 0.5)::BIGINT AS gv, count(*) AS cnt
        |  FROM documents GROUP BY 1),
        |m AS (SELECT gv,
        |  (sum(cnt) OVER (ORDER BY gv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)::BIGINT AS below,
        |  (sum(cnt) OVER ())::BIGINT AS total FROM g),
        |mp AS (SELECT gv, least(3, floor(below * 4 / total)::BIGINT) AS bin FROM m),
        |d AS (SELECT doc_id, n_chars, floor(n_chars * 1.0 + 0.5)::BIGINT AS gv FROM documents)
        |SELECT bin, count(*) AS n_docs, min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
        |FROM d JOIN mp USING (gv) GROUP BY bin ORDER BY bin""".stripMargin
  )

    // north-star: deterministic hash split + sampling — reproducible
    // dataset versions with no RNG state; pure scan work.
  b.q(
    "sample_split" -> ((s, dir) =>
      sample.split(table(s, dir, "documents"), "doc_id", trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("split")))
  )
  b.o(
    "sample_split" ->
      s"""WITH k AS (SELECT doc_id,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/split')")} % 100 AS key FROM documents),
         |s AS (SELECT doc_id, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k)
         |SELECT split, count(*) AS n, min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin
  )

    // north-star: semantic training order (related-document packing) —
    // nearest-centroid clusters laid out contiguously, quantized
    // distance then id inside each; seq_pos is the range-partitioned
    // dense rank, no single-partition stage.
  b.q(
    "sample_semantic_order" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      sample.semanticOrder(emb, ann.seedCentroids(emb, 8))
        .select(col("vec_id"), col("cluster_id"), col("seq_pos"))
        .orderBy(col("seq_pos"))
    })
  )
  b.o(
    "sample_semantic_order" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 8)),
         |assign AS (SELECT vec_id, cluster_id, cdist FROM (
         |  SELECT s.vec_id, c.cid AS cluster_id,
         |    ${r4(sqlL2Between("s.e", "c.e"))} AS cdist,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${r4(sqlL2Between("s.e", "c.e"))}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1)
         |SELECT vec_id, cluster_id,
         |  row_number() OVER (ORDER BY cluster_id, cdist, vec_id) - 1 AS seq_pos
         |FROM assign ORDER BY seq_pos""".stripMargin
  )

    // north-star: hash-stable k-fold CV assignment — a document's fold
    // never changes as the corpus grows (row_number % k can't say that).
  b.q(
    "sample_kfold" -> ((s, dir) =>
      sample.kfold(table(s, dir, "documents"), "doc_id", k = 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("fold")))
  )
  b.o(
    "sample_kfold" ->
      s"""WITH k AS (SELECT doc_id,
         |  (${hashing.sqlH32("(doc_id::VARCHAR || '/kfold')")} % 5)::INT AS fold
         |  FROM documents)
         |SELECT fold, count(*) AS n, min(doc_id) AS min_id
         |FROM k GROUP BY fold ORDER BY fold""".stripMargin
  )

    // north-star: sequence packing by token budget — SHARDED prefix-sum
    // windows (8 hash shards; no single-task global sort).
  b.q(
    "sample_pack" -> ((s, dir) =>
      sample.packSequences(table(s, dir, "documents"), "doc_id",
          text.tokenCount(col("text")).cast("long"), budget = 512, shards = 8)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
        .orderBy(col("pack_id")))
  )
  b.o(
    "sample_pack" ->
      s"""WITH t AS (SELECT doc_id, len($SqlToks) AS n_tokens,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/pack')")} % 8 AS pack_shard FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |  pack_shard * 4294967296 +
         |  floor((sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0)::BIGINT AS pack_id
         |FROM t)
         |SELECT pack_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
         |FROM p GROUP BY pack_id ORDER BY pack_id""".stripMargin
  )

    // north-star: deterministic percent sampling — pure scan filter on a
    // portable id hash, no RNG state, reproducible on any engine.
  b.q(
    "sample_det" -> ((s, dir) =>
      sample.deterministicSample(table(s, dir, "documents"), "doc_id", pct = 10)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "sample_det" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/sample')")} % 100 < 10
         |ORDER BY doc_id""".stripMargin
  )

    // north-star: stratified sampling — rebalance a language-skewed
    // corpus with per-stratum keep rates; still a pure scan filter.
  b.q(
    "sample_stratified" -> ((s, dir) =>
      sample.stratifiedSample(table(s, dir, "documents"), "doc_id", "lang",
          pcts = Map("en" -> 10, "zh" -> 60), defaultPct = 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("lang")))
  )
  b.o(
    "sample_stratified" ->
      s"""WITH k AS (SELECT doc_id, lang,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/strat')")} % 100 AS key FROM documents)
         |SELECT lang, count(*) AS n, min(doc_id) AS min_id
         |FROM k WHERE key < (CASE WHEN lang = 'en' THEN 10
         |  WHEN lang = 'zh' THEN 60 ELSE 30 END)
         |GROUP BY lang ORDER BY lang""".stripMargin
  )

    // north-star: mixture calibration — downsample to EXPLICIT target
    // proportions (en:de:fr = 5:3:2); rates derived from exact counts,
    // keep decision a pure scan filter. sum_chars pins which rows.
  b.q(
    "sample_mixture" -> ((s, dir) =>
      sample.toMixture(table(s, dir, "documents"), "doc_id", "lang",
          targets = Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("lang")))
  )
    // Independent re-derivation of the mixture calibration: exact
    // counts → T = min(n/w) → rate = (w·T)/n, with the NORMALIZED
    // weights interpolated from the same Scala doubles the operator
    // computes (Double.toString round-trips through DuckDB's parser),
    // and the same hash-Bernoulli keep rule as sample_weighted.
  b.o(
    "sample_mixture" -> {
      val targets = Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0)
      val wSum = targets.values.sum
      val names = targets.keys.toSeq.sorted
      val wCase = names.map(g => s"WHEN '$g' THEN ${targets(g) / wSum}")
        .mkString("CASE lang ", " ", " END")
      val inList = names.map("'" + _ + "'").mkString(", ")
      s"""WITH nw AS (SELECT lang, count(*)::DOUBLE AS n, $wCase AS w
         |  FROM documents WHERE lang IN ($inList) GROUP BY lang),
         |tt AS (SELECT min(n / w) AS t FROM nw),
         |r AS (SELECT lang, (w * (SELECT t FROM tt)) / n AS rate FROM nw)
         |SELECT lang, count(*) AS n, min(doc_id) AS min_id,
         |  sum(n_chars)::BIGINT AS sum_chars
         |FROM documents JOIN r USING (lang)
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/mix')")}::DOUBLE < rate * 4294967296.0
         |GROUP BY lang ORDER BY lang""".stripMargin
    }
  )

    // north-star: deterministic round-robin interleave of language
    // strata into one global training order — strict total order, pure
    // function of the data.
  b.q(
    "sample_interleave" -> ((s, dir) =>
      sample.interleave(table(s, dir, "documents"), "lang", "doc_id")
        .select(col("doc_id"), col("lang"), col("order_idx"))
        .orderBy(col("doc_id")))
  )
    // Same rank-within-stratum arithmetic: idx = rk·|strata| + s_idx.
  b.o(
    "sample_interleave" ->
      """WITH s AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS s_idx
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |n AS (SELECT count(*) AS k FROM s),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rk
        |  FROM documents)
        |SELECT doc_id, lang, (r.rk * n.k + s.s_idx)::BIGINT AS order_idx
        |FROM r JOIN s USING (lang) CROSS JOIN n ORDER BY doc_id""".stripMargin
  )

    // north-star: training-order diversity meter — one number telling
    // whether the order a trainer consumes is the intended one: the
    // round-robin interleave must read near-zero adjacent-same-stratum.
  b.q(
    "sample_order_diversity" -> ((s, dir) =>
      sample.orderDiversity(
        sample.interleave(table(s, dir, "documents"), "lang", "doc_id"),
        "order_idx", "lang"))
  )
  b.o(
    "sample_order_diversity" ->
      """WITH s AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS s_idx
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |n AS (SELECT count(*) AS k FROM s),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rk
        |  FROM documents),
        |o AS (SELECT doc_id, lang, (r.rk * n.k + s.s_idx)::BIGINT AS p
        |  FROM r JOIN s USING (lang) CROSS JOIN n),
        |j AS (SELECT a.lang AS sa, b.lang AS sb
        |  FROM o a JOIN o b ON b.p = a.p + 1)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  coalesce(sum(CASE WHEN sa IS NOT DISTINCT FROM sb THEN 1 ELSE 0 END), 0)::BIGINT AS n_same,
        |  CASE WHEN count(*) > 0 THEN
        |    floor(sum(CASE WHEN sa IS NOT DISTINCT FROM sb THEN 1 ELSE 0 END)::DOUBLE
        |      / count(*) * 10000.0 + 0.5) / 10000.0
        |  ELSE 0.0 END AS frac_same
        |FROM j""".stripMargin
  )

    // north-star: weighted (quality-proportional) sampling — the data-
    // mixing primitive; keep probability = min(n_chars/1000, 1), pure
    // scan filter.
  b.q(
    "sample_weighted" -> ((s, dir) =>
      sample.weightedSample(table(s, dir, "documents"), "doc_id",
          least(col("n_chars").cast("double") / lit(1000.0), lit(1.0)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang")))
  )
    // Same clamp chain and multiply order as sample.weightedSample.
  b.o(
    "sample_weighted" ->
      s"""SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS sum_chars
         |FROM documents
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/wsample')")}::DOUBLE <
         |  least(greatest(n_chars::DOUBLE / 1000.0::DOUBLE, 0.0::DOUBLE), 1.0::DOUBLE)
         |    * 4294967296.0::DOUBLE
         |GROUP BY lang ORDER BY lang""".stripMargin
  )

    // north-star: leakage-safe split — band on hash(source) so all docs
    // from one site share a split; n_sources proves no group straddles.
  b.q(
    "sample_group_split" -> ((s, dir) =>
      sample.groupSplit(table(s, dir, "documents"), "source", trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_id"))
        .orderBy(col("split")))
  )
  b.o(
    "sample_group_split" ->
      s"""WITH k AS (SELECT doc_id, source,
         |  ${hashing.sqlH32("(source || '/gsplit')")} % 100 AS key FROM documents),
         |s AS (SELECT doc_id, source, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k)
         |SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
         |  min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin
  )

    // north-star: deterministic epoch shuffle — reproducible
    // pseudo-random global training order keyed on (seed, id); the
    // position is a pure function of the data, so any shard re-derives
    // independently and epoch 2 is just seed+1.
  b.q(
    "sample_epoch_shuffle" -> ((s, dir) =>
      sample.epochShuffle(
          table(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", seed = 7)
        .select(col("doc_id"), col("epoch_pos"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "sample_epoch_shuffle" ->
      """SELECT doc_id, row_number() OVER (
        |    ORDER BY md5('7:' || doc_id::VARCHAR) || '_' || doc_id::VARCHAR) - 1
        |  AS epoch_pos
        |FROM documents ORDER BY doc_id""".stripMargin
  )

    // north-star: token-balanced shard assignment — serpentine greedy
    // deal by size rank (zipIndex over a (-size, id) struct key, range
    // exchange, no single-partition window); per-shard totals land
    // within one document of each other.
  b.q(
    "sample_balanced_shards" -> ((s, dir) =>
      sample.balancedShards(
          table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars").cast("long"), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("shard")))
  )
  b.o(
    "sample_balanced_shards" ->
      """WITH r AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY -n_chars, doc_id) - 1 AS idx
        |  FROM documents),
        |s AS (SELECT n_chars, (CASE WHEN (idx // 8) % 2 = 0 THEN idx % 8
        |    ELSE 7 - (idx % 8) END)::INT AS shard FROM r)
        |SELECT shard, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  )

    // north-star: DPO preference-pair construction — per user (the
    // prompt-group stand-in), best-vs-worst scored event with margin;
    // ONE group aggregate, struct-extrema tie-breaks, ties dropped.
  b.q(
    "sample_preference_pairs" -> ((s, dir) =>
      sample.preferencePairs(table(s, dir, "events"),
          "user_id", "event_id", "value")
        .orderBy(col("user_id")))
  )
  b.o(
    "sample_preference_pairs" ->
      s"""WITH e AS (SELECT user_id, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |r AS (SELECT user_id, event_id, value,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id ASC) AS rc,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY value ASC, event_id DESC) AS rr,
         |  count(*) OVER (PARTITION BY user_id) AS n FROM e)
         |SELECT c.user_id, c.event_id AS chosen_id, j.event_id AS rejected_id,
         |  c.value AS chosen_score, j.value AS rejected_score,
         |  c.value - j.value AS margin
         |FROM (SELECT * FROM r WHERE rc = 1 AND n >= 2) c
         |JOIN (SELECT * FROM r WHERE rr = 1) j USING (user_id)
         |WHERE c.value > j.value ORDER BY c.user_id""".stripMargin
  )

    // north-star: DoReMi-lite domain reweighting — integer mixture plan
    // from observed token mass to literal target shares, epoch-capped,
    // with realized shares over the effective stream; "srcX" is a
    // deliberately absent domain (full-join zero row).
  b.q(
    "sample_domain_reweight" -> ((s, dir) =>
      sample.domainReweight(table(s, dir, "documents"), "source",
          col("n_chars"),
          Map("src0" -> 2500L, "src1" -> 2000L, "src2" -> 1500L,
            "src3" -> 1000L, "src4" -> 1000L, "src5" -> 1000L,
            "src6" -> 500L, "src7" -> 500L, "srcX" -> 0L),
          capBp = 30000L)
        .orderBy(col("source")))
  )
    // Integer basis-point mixture plan; sums cast ::BIGINT immediately
    // (HUGEINT discipline), NULL epochs for the zero-token full-join row.
  b.o(
    "sample_domain_reweight" ->
      """WITH tgt(source, target_bp) AS (VALUES
        |  ('src0', 2500), ('src1', 2000), ('src2', 1500), ('src3', 1000),
        |  ('src4', 1000), ('src5', 1000), ('src6', 500), ('src7', 500),
        |  ('srcX', 0)),
        |agg AS (SELECT source, sum(n_chars)::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |j AS (SELECT coalesce(a.source, t.source) AS source,
        |    coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |    coalesce(t.target_bp, 0)::BIGINT AS target_bp
        |  FROM agg a FULL JOIN tgt t ON a.source = t.source),
        |tot AS (SELECT sum(n_tokens)::BIGINT AS total FROM j),
        |e AS (SELECT source, n_tokens, target_bp,
        |    (CASE WHEN total > 0 THEN n_tokens * 10000 // total ELSE 0 END)::BIGINT AS share_bp,
        |    (CASE WHEN n_tokens > 0
        |      THEN least(target_bp * total // n_tokens, 30000) END)::BIGINT AS epochs_bp
        |  FROM j CROSS JOIN tot),
        |f AS (SELECT source, n_tokens, target_bp, share_bp, epochs_bp,
        |    coalesce(n_tokens * epochs_bp // 10000, 0)::BIGINT AS eff_tokens FROM e),
        |ft AS (SELECT sum(eff_tokens)::BIGINT AS efft FROM f)
        |SELECT source, n_tokens, target_bp, share_bp, epochs_bp, eff_tokens,
        |  (CASE WHEN efft > 0 THEN eff_tokens * 10000 // efft ELSE 0 END)::BIGINT AS realized_bp
        |FROM f CROSS JOIN ft ORDER BY source""".stripMargin
  )

    // north-star: freshness-decay selection — quality weight halved per
    // 7-day half-life from a PINNED as-of date, top-5 per event type;
    // the recency-tiered curation order.
  b.q(
    "sample_freshness" -> ((s, dir) =>
      sample.freshnessTopK(events(s, dir), "event_type", "event_id", "ts",
          floor(col("value") * 100).cast("long"),
          asOf = "2024-01-31", halfLifeDays = 7, k = 5)
        .orderBy(col("event_type"), col("rnk")))
  )
    // Half-life decay as an arithmetic right shift (both engines shift
    // BIGINT arithmetically; scores non-negative), pinned as-of date.
  b.o(
    "sample_freshness" ->
      """WITH f AS (SELECT event_type, event_id,
        |  date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')::BIGINT AS age_days,
        |  (floor(value * 100)::BIGINT >>
        |    least(62, date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') // 7)::INT
        |  )::BIGINT AS score
        |  FROM events
        |  WHERE ts IS NOT NULL AND CAST(ts AS DATE) <= DATE '2024-01-31'),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY event_type ORDER BY score DESC, event_id ASC) AS rk FROM f)
        |SELECT event_type, event_id, age_days, score, rk::INT AS rnk
        |FROM r WHERE rk <= 5 ORDER BY event_type, rnk""".stripMargin
  )

    // north-star: split-leakage meter — the production minhash pair
    // detector crossed with the leakage-safe source split; any
    // crosses=1 row means a near-duplicate straddles the train/test
    // fence and held-out metrics measure memorization.
  b.q(
    "sample_split_leakage" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.splitLeakage(
          dedup.minhashNearDupPairs(docs, "text", "doc_id", threshold = 0.5),
          sample.groupSplit(docs, "source", trainPct = 80, valPct = 10),
          "doc_id")
        .orderBy(col("split_a"), col("split_b"))
    })
  )
    // The full minhash pair chain, then each side's group-split key.
  b.o(
    "sample_split_leakage" ->
      s"""WITH $SqlMinhashPairCtes,
         |k AS (SELECT doc_id,
         |  ${hashing.sqlH32("(source || '/gsplit')")} % 100 AS key FROM documents),
         |asg AS (SELECT doc_id, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k),
         |p AS (SELECT least(a.split, b.split) AS split_a,
         |    greatest(a.split, b.split) AS split_b
         |  FROM mp JOIN asg a ON mp.id_a = a.doc_id
         |  JOIN asg b ON mp.id_b = b.doc_id)
         |SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
         |  (CASE WHEN split_a <> split_b THEN 1 ELSE 0 END)::BIGINT AS crosses
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

    // north-star: 1-D Wasserstein drift between the 'de' and 'en'
    // length distributions — order-aware where KL is categorical;
    // exact integer mass transport, one float quotient.
  b.q(
    "sample_emd" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.emd1d(
        docs.where(col("lang") === "de"), col("n_chars"),
        docs.where(col("lang") === "en"), col("n_chars"),
        binWidth = 100L)
    })
  )
    // Exact |cumA*Nb - cumB*Na| transport over the merged bin grid,
    // one float quotient in raw-feature units.
  b.o(
    "sample_emd" ->
      """WITH ha AS (SELECT floor(n_chars::DOUBLE / 100.0)::BIGINT AS bin,
        |    count(*)::BIGINT AS na FROM documents
        |  WHERE lang = 'de' AND n_chars IS NOT NULL GROUP BY 1),
        |hb AS (SELECT floor(n_chars::DOUBLE / 100.0)::BIGINT AS bin,
        |    count(*)::BIGINT AS nb FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL GROUP BY 1),
        |m AS (SELECT coalesce(ha.bin, hb.bin) AS bin,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin),
        |c AS (SELECT bin, na, nb,
        |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb,
        |    lead(bin) OVER (ORDER BY bin) - bin AS gap
        |  FROM m),
        |t AS (SELECT ta AS n_a, tb AS n_b,
        |    sum(abs(ca * tb - cb * ta) * gap)::BIGINT AS emd_num
        |  FROM c WHERE gap IS NOT NULL GROUP BY 1, 2)
        |SELECT n_a, n_b, emd_num,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    floor(emd_num::DOUBLE * 100.0 / (n_a::DOUBLE * n_b::DOUBLE)
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS emd_q4
        |FROM t""".stripMargin
  )

    // north-star: exact two-sample KS on the shared value grid — the
    // emd1d rational discipline with max instead of the gap-weighted
    // sum; no division before the final quantized readout.
  b.q(
    "sample_ks" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.ksStat(
        docs.where(col("lang") === "de"), col("n_chars"),
        docs.where(col("lang") === "en"), col("n_chars"))
    })
  )
    // Exact KS from the same full-outer value grid: cross-multiplied
    // integer CDF gaps, one division at the quantized readout.
  b.o(
    "sample_ks" ->
      """WITH ha AS (SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS na
        |  FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |hb AS (SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS nb
        |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
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

    // north-star: deterministic rejection matching — calibrate the 'de'
    // slice's length distribution to the 'en' slice; bounded grid, rates
    // broadcast, keep decision a pure scan filter.
  b.q(
    "sample_match_dist" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.matchDistribution(
          docs.where(col("lang") === "de"), col("n_chars"),
          docs.where(col("lang") === "en"), col("n_chars"),
          "doc_id", binWidth = 200L)
        .groupBy(col("bin"), col("keep_ppm"))
        .agg(count(lit(1)).as("n_src"), sum(col("kept")).as("n_kept"))
        .orderBy(col("bin"))
    })
  )
    // Rejection rates from the same exact-count double chain (fixed op
    // order), floor-ppm; keep decision replays the portable hash.
  b.o(
    "sample_match_dist" -> {
      val h = graft.functions.hashing.sqlH32("(s.doc_id::VARCHAR || '/mdist')")
      s"""WITH src AS (SELECT doc_id,
         |    floor(n_chars::DOUBLE / 200.0)::BIGINT AS bin
         |  FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL),
         |tgt AS (SELECT floor(n_chars::DOUBLE / 200.0)::BIGINT AS bin
         |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL),
         |sh AS (SELECT bin, count(*)::BIGINT AS ns FROM src GROUP BY 1),
         |th AS (SELECT bin, count(*)::BIGINT AS nt FROM tgt GROUP BY 1),
         |r0 AS (SELECT sh.bin, sh.ns, coalesce(th.nt, 0)::BIGINT AS nt
         |  FROM sh LEFT JOIN th USING (bin)),
         |r1 AS (SELECT bin, ns, nt,
         |    (nt::DOUBLE / (SELECT sum(nt) FROM r0)::DOUBLE)
         |      / (ns::DOUBLE / (SELECT sum(ns) FROM r0)::DOUBLE) AS ratio
         |  FROM r0),
         |r2 AS (SELECT bin, ns,
         |    (CASE WHEN (SELECT max(ratio) FROM r1) > 0 THEN
         |      floor(ratio / (SELECT max(ratio) FROM r1) * 1000000.0)
         |    ELSE 0 END)::BIGINT AS keep_ppm
         |  FROM r1),
         |k AS (SELECT r2.bin, r2.keep_ppm,
         |    count(*)::BIGINT AS n_src,
         |    sum(($h % 1000000 < r2.keep_ppm)::BIGINT)::BIGINT AS n_kept
         |  FROM src s JOIN r2 ON s.bin = r2.bin
         |  GROUP BY 1, 2)
         |SELECT bin, keep_ppm, n_src, n_kept FROM k ORDER BY bin""".stripMargin
    }
  )

    // north-star: concat-and-chunk sequence-packing layout — per doc its
    // (shard, start, bins, split) placement; one shuffle on shard + one
    // per-shard running sum, the pretraining batch layout made auditable.
  b.q(
    "sample_pack_layout" -> ((s, dir) =>
      sample.packLayout(table(s, dir, "documents"), "text", "doc_id",
          seqLen = 512L, shards = 8)
        .orderBy(col("doc_id")))
  )
  b.o(
    "sample_pack_layout" ->
      s"""WITH t AS (SELECT doc_id, len($SqlToks)::BIGINT AS n_tokens
         |    FROM documents),
         |p AS (SELECT doc_id, doc_id % 8 AS shard, n_tokens FROM t
         |    WHERE n_tokens > 0),
         |w AS (SELECT doc_id, shard, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
         |  FROM p)
         |SELECT doc_id, shard, n_tokens, start,
         |  start // 512 AS bin_first,
         |  (start + n_tokens - 1) // 512 AS bin_last,
         |  ((start + n_tokens - 1) // 512 > start // 512)::BIGINT AS split
         |FROM w ORDER BY doc_id""".stripMargin
  )

    // north-star: packing-efficiency data card — per shard the bin
    // count, tail padding, and boundary-split doc count.
  b.q(
    "sample_pack_stats" -> ((s, dir) =>
      sample.packStats(table(s, dir, "documents"), "text", "doc_id",
          seqLen = 512L, shards = 8)
        .orderBy(col("shard")))
  )
  b.o(
    "sample_pack_stats" ->
      s"""WITH t AS (SELECT doc_id, len($SqlToks)::BIGINT AS n_tokens
         |    FROM documents),
         |p AS (SELECT doc_id, doc_id % 8 AS shard, n_tokens FROM t
         |    WHERE n_tokens > 0),
         |w AS (SELECT doc_id, shard, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start
         |  FROM p),
         |s AS (SELECT shard, count(*)::BIGINT AS n_docs,
         |    sum(n_tokens)::BIGINT AS n_tokens,
         |    sum(((start + n_tokens - 1) // 512 > start // 512)::BIGINT)::BIGINT
         |      AS split_docs
         |  FROM w GROUP BY shard)
         |SELECT shard, n_docs, n_tokens, (n_tokens + 511) // 512 AS n_bins,
         |  ((n_tokens + 511) // 512) * 512 - n_tokens AS tail_pad, split_docs
         |FROM s ORDER BY shard""".stripMargin
  )
}
