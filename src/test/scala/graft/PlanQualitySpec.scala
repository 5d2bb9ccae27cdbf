package graft

import org.apache.spark.sql.DataFrame

/** Pins the PLAN-SHAPE properties the scale story depends on — the
  * claims in module docs ("pushed to scan", "no shuffle", "broadcast",
  * "never O(n²)") as executable assertions, so a refactor that silently
  * breaks one fails CI rather than a 100 TB run. */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan.toString

  test("vector search: metadata predicate reaches the scan; top-k is TakeOrdered") {
    val p = plan("vec_cosine_topk")
    assert(p.contains("PushedFilters: [IsNotNull(label), GreaterThanOrEqual(label,2)]"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("per-document scan ops plan with ZERO exchanges (shuffle-free claims)") {
    // sorts in these queries are presentation-only output ordering; the
    // claim under test is no mid-plan aggregation/join exchange beyond
    // the final order-by's range exchange.
    Seq("text_stats", "text_fingerprint", "dedup_simhash", "mm_features", "text_clean")
      .foreach { q =>
        val exchanges = "Exchange".r.findAllIn(plan(q)).length
        assert(exchanges <= 1, s"$q should shuffle at most once (output sort), got $exchanges")
      }
  }

  test("generation-eval meters are kernel passes: at most the output-sort exchange") {
    // rouge/bleu/chrf are per-pair gen_overlap kernel projections — the
    // ONLY exchange is the presentation orderBy. A reappearing explode +
    // (id, gram) aggregate (the 77 s interpreted-HOF shape) would add
    // exchanges and fail here.
    Seq("eval_rouge2", "eval_bleu", "eval_chrf").foreach { q =>
      val p = plan(q)
      assert("Exchange".r.findAllIn(p).length <= 1,
        s"$q should shuffle at most once (output sort)")
      assert(p.contains("gen_overlap"), s"$q must ride the fused kernel")
    }
    // grid meters: one hash aggregate, no window, no join
    Seq("eval_ece", "eval_winrate").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("Join"), s"$q shape")
    }
    // embed-F1 is an unrolled cosine lattice over one scan — row-local
    // like the text meters: only the presentation orderBy may exchange,
    // and nothing may join (a slice-to-token EXPLODE + self-join shape
    // would show up here)
    val ef = plan("eval_embed_f1")
    assert("Exchange".r.findAllIn(ef).length <= 1,
      "eval_embed_f1 should shuffle at most once (output sort)")
    assert(!ef.contains("Join"), "eval_embed_f1 must stay row-local")
    // ROUGE-L rides the compiled LCS kernel: row-local like the others
    val rl = plan("eval_rouge_l")
    assert("Exchange".r.findAllIn(rl).length <= 1,
      "eval_rouge_l should shuffle at most once (output sort)")
    assert(rl.contains("lcs_row") && !rl.contains("Join"),
      "eval_rouge_l must ride the fused LCS kernel, no join")
    // WER rides the compiled edit-distance kernel: same contract
    val wr = plan("eval_wer")
    assert("Exchange".r.findAllIn(wr).length <= 1,
      "eval_wer should shuffle at most once (output sort)")
    assert(wr.contains("edit_row") && !wr.contains("Join"),
      "eval_wer must ride the fused edit kernel, no join")
    // AP: ONE qid-keyed exchange feeds both the rank and the running
    // count (shared window frame), then the group aggregate reuses it —
    // plus the presentation orderBy; never a join
    val ap = plan("eval_map")
    assert(!ap.contains("Join"), "eval_map must not join")
    assert("Window".r.findAllIn(ap).length == 1,
      "rank and running count must share ONE window")
    // Krippendorff: grid folds only — no window; the one join is the
    // broadcast of the 1-row De side onto the 1-row Do side
    val ka = plan("eval_krippendorff")
    assert(!ka.contains("Window"), "eval_krippendorff shape")
    assert(ka.contains("BroadcastNestedLoopJoin")
      || ka.contains("BroadcastExchange"),
      "the De side must broadcast")
    // ARI: contingency-grid folds only — no window; marginal folds
    // broadcast onto the 1-row cell fold
    val ar = plan("eval_ari")
    assert(!ar.contains("Window"), "eval_ari shape")
    assert(ar.contains("BroadcastNestedLoopJoin")
      || ar.contains("BroadcastExchange"), "ARI marginals must broadcast")
    // RBO: both top-D rankings must be bounded per-group heaps BEFORE
    // the shuffle (a full sort per qid would be the 100 TB bug)
    val rb = plan("eval_rbo")
    assert("WindowGroupLimit".r.findAllIn(rb).length >= 2,
      "both RBO rankings need WindowGroupLimit heaps")
    assert(!rb.contains("Cartesian"), "RBO joins on (qid, doc), never crosses")
    // Brier decomposition: grid folds only, no window, no sort-merge
    val bd = plan("eval_brier_decomp")
    assert(!bd.contains("Window") && !bd.contains("SortMergeJoin"),
      "brier decomposition must stay on the grid")
    // Isotonic: the pair stage must BROADCAST the grid side (a
    // sort-merge self-join would shuffle the corpus-keyed grid twice)
    val iso = plan("eval_isotonic")
    assert(iso.contains("BroadcastNestedLoopJoin"),
      "isotonic pair grid must broadcast (range-condition join)")
    assert(!iso.contains("CartesianProduct"),
      "the k >= i condition must ride the broadcast join, not a cartesian")
    // Isotonic APPLY: the curve collapses to ONE array row and
    // broadcasts; the corpus side must never sort or sort-merge join
    // (the step lookup is a row-local HOF scan of the broadcast array)
    val ia = plan("eval_isotonic_apply")
    assert(ia.contains("BroadcastNestedLoopJoin")
      || ia.contains("BroadcastExchange"),
      "isotonic apply must broadcast the 1-row curve array")
    assert(!ia.contains("SortMergeJoin"),
      "isotonic apply must not sort-merge join the corpus")
  }

  test("bootstrap meters: replicate fan-out map-side combines; bands broadcast back") {
    // the x200 explode must partially aggregate BEFORE the shuffle (b
    // rows per task cross the wire, not corpus x b), and the band/point
    // glue must be broadcast, never sort-merge
    Seq("eval_bootstrap_ci", "eval_paired_bootstrap",
      "eval_bootstrap_clustered").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("HashAggregate"),
        s"$q replicate sums must map-side combine")
      assert(p.contains("BroadcastNestedLoopJoin")
        || p.contains("BroadcastExchange"), s"$q band must broadcast")
      assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge join")
    }
    val bl = plan("eval_bootstrap_by_lang")
    assert(!bl.contains("SortMergeJoin"),
      "grouped bootstrap joins its thin group domain broadcast")
  }

  test("drift meters: grid-bounded joins broadcast; kendall pairs cells, not rows") {
    // kendall's self-pairing must be a BROADCAST nested-loop over the
    // joint GRID (cells), never a shuffled row-level product
    val kt = plan("eval_kendall")
    assert(kt.contains("BroadcastNestedLoopJoin"),
      s"kendall pairs grid cells via BNLJ: ${kt.take(600)}")
    // the PSI/KS daily finishes broadcast the bounded ref grid onto the
    // day domain; no sort-merge join anywhere
    Seq("events_psi_drift", "events_ks_daily", "pipeline_drift_card")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("BroadcastExchange"), s"$q broadcasts the ref grid")
        assert(!p.contains("SortMergeJoin"), s"$q must not sort-merge join")
      }
    // embedding drift joins two d-row moment grids — broadcast-sized
    val ed = plan("ann_embed_drift")
    assert(!ed.contains("SortMergeJoin"),
      "embedDrift joins d-row grids, never sort-merge")
  }

  test("grid-cut audits scan the corpus once: consumers read the checkpointed grid") {
    // cohenKappa / mutualInfo / vocabGrowth aggregate the corpus to a
    // domain-bounded grid and cut it via ckpt — their final plans must
    // contain NO parquet scan at all (every consumer reads the
    // checkpointed RDD; the lazy form planned 6 corpus scans for kappa).
    Seq("eval_kappa", "rel_mutual_info", "text_vocab_growth").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Scan parquet"),
        s"$q must not re-scan the corpus per grid consumer:\n${p.take(1200)}")
    }
    // sampled-correctness meters: task-grid aggregates, no window, and
    // pass@k must not join at all (the estimator is row-local on the grid)
    val pk = plan("eval_pass_at_k")
    assert(!pk.contains("Join") && !pk.contains("Window"), pk.take(800))
    assert(!plan("eval_majority_vote").contains("Window"),
      "majority vote must use struct-max, never a window")
  }

  test("no candidate-pair plan ever contains a cartesian product") {
    // eval_self_bleu's opponent fan-out is a capped in-row explode + one
    // id-keyed join (its only BNLJ is the 1-row bounds broadcast) — an
    // all-pairs regression would surface as a cartesian here.
    Seq("dedup_minhash_pairs", "dedup_emb_neardup", "ann_lsh_topk",
      "hybrid_rrf_topk", "eval_self_bleu", "dedup_substring_pairs")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q degenerated to a cartesian product")
      }
    // the substring matcher's self-join must be keyed on the gram
    // fingerprint (an equi-join), and the occurrence-cap anti-join must
    // broadcast the thin hot list
    val sp = plan("dedup_substring_pairs")
    assert(sp.contains("BroadcastHashJoin") || sp.contains("BroadcastExchange"),
      "substring occurrence cap must broadcast the hot-fp list")
  }

  test("batch scoring broadcasts the query side, never the store") {
    val p = plan("vec_batch_merge")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query batch should be broadcast")
  }

  test("dimension joins broadcast") {
    assert(plan("rel_join_topn").contains("BroadcastHashJoin"))
  }

  test("LSH-partitioned ANN prunes partitions at the source") {
    val p = plan("ann_lsh_part_topk")
    assert(p.contains("PartitionFilters") && p.contains("lsh_bucket"), p.take(800))
  }

  test("bucketed fact join never exchanges on the join keys (persisted shuffle)") {
    val p = plan("rel_bucketed_join")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"join-key exchange means the bucket layout was ignored:\n${p.take(800)}")
    assert(p.contains("Bucketed: true"), p.take(800))
  }

  test("per-group top-k plans as WindowGroupLimit (bounded heap before the shuffle)") {
    val p = plan("group_topk")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("decontamination broadcasts the bench gram set; train side stays unshuffled") {
    assert(plan("decontam_overlap").contains("BroadcastHashJoin"))
  }

  test("column pruning: token stats never read the embedding-sized columns") {
    val p = plan("text_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
  }

  test("tfidf per-doc top-k plans as WindowGroupLimit") {
    assert(plan("text_tfidf_topterms").contains("WindowGroupLimit"))
  }

  test("vocabulary top-N is a TakeOrderedAndProject, not a global sort") {
    assert(plan("text_vocab_topn").contains("TakeOrderedAndProject"))
  }

  test("funnel reuses ONE user-keyed exchange for all step windows") {
    val p = plan("events_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one user shuffle (windows + per-user agg share it via reuse/sort
    // order) + one for the tiny per-step aggregate
    assert(exchanges <= 2, s"funnel should not shuffle per step:\n${p.take(1200)}")
  }

  test("chunking and redaction are scan-parallel (no mid-plan exchange)") {
    Seq("text_chunk", "text_redact").foreach { q =>
      val exchanges = "Exchange".r.findAllIn(plan(q)).length
      assert(exchanges <= 1, s"$q should shuffle at most once (output sort), got $exchanges")
    }
  }

  test("semantic dedup pairs join on cluster equality, never a cartesian product") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster pair join must be key-equal:\n${p.take(1200)}")
  }

  test("PQ and outlier scoring are scan + TakeOrdered (no join, no agg exchange)") {
    Seq("vec_pq_topk", "vec_outlier").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q top-k shape:\n${p.take(800)}")
      assert(!p.contains("Join"), s"$q must not join (literal argmin/LUT):\n${p.take(800)}")
    }
  }

  test("temperature mixing broadcasts the per-stratum rates onto the scan") {
    assert(plan("sample_temperature").contains("BroadcastHashJoin"))
  }

  test("reservoir sampling plans as WindowGroupLimit (bounded per-group heap)") {
    assert(plan("sample_reservoir").contains("WindowGroupLimit"))
  }

  test("pivot has no distinct discovery pass: one scan, group-keyed exchanges only") {
    // Spark plans pivot as two stacked aggregates (pre-agg + pivotfirst),
    // both keyed on the group column — the claim worth pinning is that
    // the TABLE is scanned once and nothing exchanges on the pivot
    // column (a value-discovery pass would add a distinct over it).
    val p = plan("rel_pivot")
    assert("Scan parquet".r.findAllIn(p).length == 1, p.take(800))
    assert(!p.contains("Exchange hashpartitioning(l_linestatus"), p.take(800))
  }

  test("rollup is ONE Expand pass, not a union of per-level rescans") {
    val p = plan("rel_rollup")
    assert(p.contains("Expand"), p.take(600))
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"rollup must scan once:\n${p.take(800)}")
  }

  test("rolling aggregate: one user exchange feeds the RANGE window") {
    val p = plan("events_rolling_avg")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"rolling window should shuffle once on user:\n${p.take(800)}")
  }

  test("corpus report is one scan + one lang aggregate") {
    val p = plan("pipeline_corpus_report")
    assert("Scan parquet".r.findAllIn(p).length == 1, p.take(800))
  }

  test("quantile binning broadcasts the grid map onto the scan") {
    assert(plan("sample_quantile_bins").contains("BroadcastHashJoin"))
  }

  test("kNN graph: key-equal joins only, per-source top-k is WindowGroupLimit") {
    val p = plan("ann_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("multi-probe LSH prunes to probe-set partition directories") {
    val p = plan("ann_lsh_multiprobe_topk")
    assert(p.contains("PartitionFilters") && p.contains("lsh_bucket"), p.take(800))
  }

  test("rolling z-score and transitions shuffle exactly once on the user key") {
    Seq("events_anomaly", "events_transitions").foreach { q =>
      val exchanges = "Exchange hashpartitioning\\(user".r.findAllIn(plan(q)).length
      assert(exchanges == 1, s"$q should shuffle once on user:\n${plan(q).take(800)}")
    }
  }

  test("indexed BM25 probes bucket directories; fertility is one scan") {
    val p = plan("text_bm25_indexed")
    assert(p.contains("PartitionFilters") && p.contains("term_bucket"), p.take(800))
    assert("Scan parquet".r.findAllIn(plan("text_fertility")).length == 1)
  }

  test("Count-Min probe lookup never degenerates to a cartesian product") {
    val p = plan("text_cm_tokens")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("toMixture keep-decision is a pure scan filter (zero exchanges pre-agg)") {
    // The op itself (before the registered query's reporting aggregate)
    // must plan as filter-on-scan: rates are literals, the stratum
    // filter and hash threshold push into the scan pipeline.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.sample.toMixture(docs, "doc_id", "lang",
        Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0))
      .queryExecution.executedPlan.toString
    assert(!"Exchange".r.findAllIn(p).hasNext,
      s"toMixture must not shuffle:\n${p.take(800)}")
    assert(p.contains("PushedFilters") && p.contains("In(lang"),
      s"stratum filter should reach the scan:\n${p.take(800)}")
  }

  test("tokenShift top-k is TakeOrderedAndProject over vocab-sized work") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.text.tokenShift(docs.where(col("lang") === "en"),
        docs.where(col("lang") === "de"), "text", k = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("semantic decontamination broadcasts the bench side; train never shuffles") {
    val p = plan("decontam_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bench side must broadcast:\n${p.take(800)}")
    // the only Exchange allowed is the presentation order-by, AFTER the join
    val joinIdx = p.indexOf("BroadcastNestedLoopJoin")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(joinIdx >= 0 && exchanges == 0,
      s"train corpus must reach the join unshuffled:\n${p.take(800)}")
  }

  test("linear classifier gate is zero-shuffle (in-row HOF scoring)") {
    val exchanges = "Exchange".r.findAllIn(plan("text_quality_linear")).length
    // <=1: the presentation-only output sort
    assert(exchanges <= 1, s"linearGate must not shuffle to score, got $exchanges")
  }

  test("global KMV sketch bounds the window: TakeOrderedAndProject before it") {
    val p = plan("events_kmv_overlap")
    assert(p.contains("TakeOrderedAndProject"),
      s"global kmv must plan a per-partition top-k, not a full-data window:\n${p.take(1200)}")
  }

  test("histogram quantiles: window work happens on nbins rows, data side is one agg") {
    val p = plan("events_hist_quantiles")
    // the events scan feeds exactly one aggregate exchange (bin counts);
    // cumsum/rank windows run after the spine join on driver-bounded rows
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastExchange"), s"spine/quantile sides broadcast:\n${p.take(800)}")
  }

  test("HLL registers: shuffle carries (group, register, partial max), never values") {
    import org.apache.spark.sql.functions.col
    val p = graft.ops.sketch.hllRegisters(SparkEntry.events(spark, dir),
        col("user_id"), Seq("event_type"), p = 6)
      .queryExecution.executedPlan.toString
    // the map-side combine row — the only thing that crosses the wire —
    // is (event_type, register, max); raw user_id dies at the projection
    val partial = p.linesIterator.find(_.contains("partial_max"))
    assert(partial.isDefined, s"register max must map-side combine:\n${p.take(900)}")
    assert(partial.get.contains("register#") && !partial.get.contains("user_id#"),
      s"shuffled row must be (group, register, rho), got: ${partial.get}")
  }

  test("round-6 row-local ops shuffle at most once (output sort only)") {
    // gopherQuality, dHash, and the bloom-clean gate are pure scan work;
    // the single allowed exchange is the presentation order-by
    Seq("text_gopher_quality", "mm_dhash", "decontam_bloom_clean").foreach { q =>
      val exchanges = "Exchange".r.findAllIn(plan(q)).length
      assert(exchanges <= 1, s"$q should shuffle at most once, got $exchanges")
    }
  }

  test("ewma shuffles exactly once on the user key; grouping sets is one Expand pass") {
    val pe = plan("events_ewma")
    val userEx = pe.linesIterator.filter(_.contains("Exchange hashpartitioning(user_id"))
    assert(userEx.size == 1, s"ewma must shuffle once on user_id:\n${pe.take(900)}")
    val pg = plan("rel_grouping_sets")
    assert("Expand".r.findAllIn(pg).length == 1,
      s"grouping sets must be ONE Expand pass, not a union of jobs:\n${pg.take(900)}")
    assert(!pg.contains("Union"), "grouping sets must not union per-set aggregates")
  }

  test("bloom screen: the sketch rides as a literal — probe side has no join") {
    val p = plan("decontam_bloom")
    // since round 8 the screen is the fused row-local kernel: the ONLY
    // exchange left is the output sort; NO join — membership is in-row
    assert(!p.contains("Join"), s"bloom probe must not join:\n${p.take(900)}")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"bloom screen: output sort only, got $exchanges")
  }

  test("packed hamming: row-local scoring + TakeOrdered, zero exchanges") {
    val p = plan("vec_hamming_packed_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"packed hamming must be scan + bounded top-k only:\n${p.take(900)}")
  }

  test("persisted-rp search: one index scan feeding two bounded top-k stages") {
    val p = plan("index_rp_topk")
    // stage 1 pool and stage 2 rerank are both TakeOrderedAndProject
    // (bounded heaps) — no Exchange, no Join, no Window anywhere
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 1, p.take(600))
    assert(!p.contains("Join") && !p.contains("Window"),
      s"rp search must not join/window:\n${p.take(900)}")
    // the scan reads the persisted projection, not a recomputed one:
    // rp_vec appears in the parquet ReadSchema
    assert(p.contains("rp_vec"), s"rp_vec missing from scan:\n${p.take(900)}")
  }

  test("URL and match-key dedup are aggregation-only — no join, no window") {
    // dedup_url pays one extra uniform-keyed exchange for the
    // countDistinct(url) two-phase rewrite ((norm_url, url) partial →
    // norm_url final); dedup_normalized has no distinct agg, so it's the
    // single agg exchange plus the output sort.
    Seq("dedup_url" -> 3, "dedup_normalized" -> 2).foreach { case (q, maxEx) =>
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Window"),
        s"$q must be scan + aggregate only:\n${p.take(900)}")
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= maxEx, s"$q should shuffle <= $maxEx, got $exchanges")
    }
  }

  test("token-budget plan joins weights AFTER aggregation — corpus never re-shuffles") {
    // the weights join is full-outer (absent sources must surface), which
    // Spark cannot broadcast — but it joins two |sources|-row aggregates,
    // so the only corpus-sized exchange is the source aggregation itself
    val p = plan("sample_token_budget")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"weights join degenerated:\n${p.take(900)}")
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"))
    assert(aggIdx >= 0, p.take(600))
    assert(joinIdx < 0 || p.indexOf("FullOuter") >= 0,
      s"expected a full-outer weights join:\n${p.take(900)}")
  }

  test("snapshot diff joins thin fingerprints, never a nested-loop product") {
    val p = plan("rel_snapshot_diff")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"diff must be an equi-join:\n${p.take(900)}")
    // document bodies never cross the exchange: the join schema carries
    // fingerprints, and 'text' appears only below the scans
    assert(p.contains("FullOuter"), s"expected full outer equi-join:\n${p.take(900)}")
  }

  test("pii stats is a pure scan pass (no exchange beyond the output sort)") {
    val exchanges = "Exchange".r.findAllIn(plan("text_pii_stats")).length
    assert(exchanges <= 1,
      s"text_pii_stats should shuffle at most once (output sort), got $exchanges")
  }

  test("rule gate is one aggregation pass — no join, no per-rule rescan") {
    val p = plan("rel_check_rules")
    assert(!p.contains("Join"), s"checkRules must not join:\n${p.take(600)}")
    val scans = "FileScan".r.findAllIn(p).length
    assert(scans == 1, s"checkRules must scan the table once, got $scans scans")
  }

  test("MaxSim fast path: zero shuffles, bounded-heap top-k, one scan") {
    val p = plan("retrieval_maxsim_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Join"), s"unrolled MaxSim must not join:\n${p.take(600)}")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 0,
      s"unrolled MaxSim should be scan-only + TakeOrdered, got $exchanges exchanges")
  }

  test("long-form MaxSim shuffles once on the doc id (partial maxima)") {
    val p = plan("retrieval_maxsim_long")
    assert(p.contains("partial"), s"expected map-side partial aggregation:\n${p.take(900)}")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"long MaxSim should shuffle once (id agg), got $exchanges exchanges")
  }

  test("CM join-size estimate never scans a fact table into a join") {
    // the only joins in the plan are sketch-cell-sized: assert the fact
    // scans feed aggregates, and no exchange carries raw order keys
    val p = plan("sketch_cm_join_size")
    assert(!p.contains("SortMergeJoin") ||
      !p.contains("Exchange hashpartitioning(okey"),
      s"fact rows must not shuffle for the estimate:\n${p.take(900)}")
    assert(p.contains("HashAggregate"), p.take(600))
  }

  test("CDC apply ranks the change log with a bounded per-key heap") {
    val p = plan("rel_cdc_apply")
    assert(p.contains("WindowGroupLimit"),
      s"latest-change-per-key should plan WindowGroupLimit:\n${p.take(900)}")
    assert(p.contains("FullOuter"), s"expected full-outer apply join:\n${p.take(900)}")
  }

  test("SCD2 windows are keyed on the id — no single-partition window") {
    val p = plan("rel_scd2")
    // every Window node must carry a partition spec mentioning doc_id
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, p.take(600))
    windows.foreach(w => assert(w.contains("doc_id"),
      s"window not partitioned by doc_id: $w"))
  }

  test("MG heavy hitters run as ObjectHashAggregate with map-side partials") {
    Seq("sketch_heavyhitters", "sketch_heavyhitters_weighted").foreach { q =>
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"),
        s"$q: typed-imperative aggregate should plan ObjectHashAggregate:\n${p.take(600)}")
      assert(p.contains("partial_mg_heavy_hitters"),
        s"$q: no map-side partial MG — the exchange would carry raw items:\n${p.take(900)}")
    }
  }

  test("MERGE is one full-outer join — no cartesian, no window") {
    val p = plan("rel_merge")
    assert(p.contains("FullOuter"), p.take(900))
    assert(!p.contains("CartesianProduct") && !p.contains("Window ["),
      s"MERGE grew an unexpected node:\n${p.take(900)}")
    assert("SortMergeJoin".r.findAllIn(p).length +
      "BroadcastHashJoin".r.findAllIn(p).length == 1,
      s"MERGE should be exactly one join:\n${p.take(900)}")
  }

  test("point-in-time join is one key join with residual interval predicate") {
    val p = plan("rel_pit_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"PIT join must stay a key equi-join:\n${p.take(900)}")
  }

  test("FK orphan check plans an anti join over a distinct thin parent") {
    val p = plan("rel_fk_orphans")
    assert(p.contains("LeftAnti"), s"expected anti join:\n${p.take(900)}")
  }

  test("matryoshka search: both stages are bounded top-k, no agg exchange") {
    val p = plan("vec_matryoshka_topk")
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 2,
      s"coarse pool and rerank should both be TakeOrdered:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("per-group bottom-k samples bound their heaps before the exchange") {
    val p = plan("events_sample_quantiles_by")
    assert(p.contains("WindowGroupLimit"),
      s"per-group bottom-k should plan WindowGroupLimit:\n${p.take(900)}")
  }

  test("sample quantiles: global bottom-k is a TakeOrderedAndProject") {
    val p = plan("events_sample_quantiles")
    assert(p.contains("TakeOrderedAndProject"), p.take(900))
  }

  test("triangle count and k-core never degenerate to cartesian products") {
    Seq("graph_triangles", "graph_kcore", "graph_ppr").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q")
    }
  }

  test("blocklist gate is a pure scan: one aggregation, no join, no window") {
    val p = plan("text_blocklist_clean")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    // one partial/final agg pair over the scan → exactly one exchange
    assert("Exchange".r.findAllIn(p).length == 1, p.take(800))
  }

  test("frame-family queries shuffle exactly once (the id-keyed lag window)") {
    Seq("mm_audio_fp", "mm_scene_changes").foreach { q =>
      val p = plan(q)
      // one hash exchange on id for the lag window + the presentation
      // order-by's range exchange — nothing else
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 2, s"$q: got $exchanges exchanges\n${p.take(900)}")
      assert(p.contains("hashpartitioning(id"), s"$q must window per id")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("winnowing pairs: inverted-index join, never a cartesian; fp stage windowless") {
    val p = plan("dedup_winnow_pairs")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // physical WindowExec prints as `Window [`; WindowGroupLimit is a
    // different (bounded) node and does not match
    assert(!"\\bWindow \\[".r.findFirstIn(p).isDefined,
      "fingerprints must be in-row (fused kernel) and the df cap streamed")
  }

  test("round-10 families: claimed plan shapes hold") {
    // readability is row-local: no exchange beyond the output sort
    assert("Exchange".r.findAllIn(plan("text_readability")).length <= 1)
    // majority vote: first collapse is a HASH agg (vote stream never
    // sorts); no window anywhere
    val ml = plan("rel_majority_label")
    assert(ml.contains("HashAggregate"), ml.take(600))
    assert(!"\\bWindow \\[".r.findFirstIn(ml).isDefined)
    // preference pairs: one aggregate pass over a 2-column projection,
    // no window, no join
    val pp = plan("sample_preference_pairs")
    assert(!"\\bWindow \\[".r.findFirstIn(pp).isDefined)
    assert(!pp.contains("Join"), pp.take(600))
    // silhouette: centroids are literals — the scoring scan joins NOTHING
    val sil = plan("vec_silhouette")
    assert(!sil.contains("Join"), sil.take(600))
    // acf: the lead window partitions by the type column, never global
    val acf = plan("events_acf")
    assert(acf.contains("windowspecdefinition(event_type"), acf.take(900))
    assert(!acf.contains("CartesianProduct"))
    // changepoint: same series substrate, same window discipline
    val cp = plan("events_changepoint")
    assert(cp.contains("windowspecdefinition(event_type"), cp.take(900))
    assert(!cp.contains("CartesianProduct"))
    // novelty: NO window and no gram-keyed join-back — the seen count
    // derives from first-occurrence ownership (two doc-keyed aggs)
    val nv = plan("dedup_ngram_novelty")
    assert(!"\\bWindow \\[".r.findFirstIn(nv).isDefined, nv.take(600))
    // top-ngrams: k rows via TakeOrdered, never a global sort
    val tn = plan("text_top_ngrams")
    assert(tn.contains("TakeOrderedAndProject"), tn.take(600))
  }

  test("inverted-index df caps stream: broadcast hot-fp anti-join, no window buffer") {
    // round-9 advisor: count().over(partitionBy(fp)) buffered a hot
    // fingerprint's whole group in WindowExec — the cap must instead be
    // a streamed hash-agg hot list broadcast-anti-joined off, so a
    // boilerplate fp shared by millions of docs never materializes as
    // one window partition.
    Seq("dedup_winnow_pairs", "mm_audio_neardup").foreach { q =>
      val p = plan(q)
      assert(p.contains("LeftAnti"), s"$q: df cap must be an anti-join")
      // the audio query's FINGERPRINT stage legitimately windows (lag
      // per media id; statically re-planned under the hot agg and both
      // self-join sides — AQE stage reuse dedupes at runtime); the CAP
      // itself must never window, i.e. no window partitioned by fp
      assert(!p.contains("windowspecdefinition(fp"),
        s"$q: df cap buffered in an fp-partitioned window")
      if (q != "mm_audio_neardup")
        assert(!"\\bWindow \\[".r.findFirstIn(p).isDefined, s"$q: unexpected window")
    }
  }

  test("round-10 ops: plan shapes hold") {
    // domain screen: bench host set broadcasts; the train side is
    // filter + projection over ONE scan — no shuffle before the anti-join
    val ds = plan("decontam_domain_screen")
    assert(ds.contains("BroadcastExchange"), ds.take(800))
    assert(ds.contains("LeftAnti"), ds.take(800))
    // dialogs: the turn cap collapses to WindowGroupLimit heaps, and the
    // cap + assembly share the user-keyed exchange (≤1 hash exchange
    // before the output sort)
    val dl = plan("events_dialogs")
    assert(dl.contains("WindowGroupLimit"), dl.take(800))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(dl).length <= 1,
      dl.take(1200))
    // bipartite: the basket-size cap is the streamed anti-join shape,
    // never an fp-window buffer
    val bp = plan("graph_bipartite")
    assert(bp.contains("LeftAnti"), bp.take(800))
    assert(!"\\bWindow \\[".r.findFirstIn(bp).isDefined, bp.take(800))
    // encoding quality: row-local — zero exchanges beyond the output sort
    val eq = plan("text_encoding_quality")
    assert("Exchange".r.findAllIn(eq).length <= 1, eq.take(800))
    // freshness: per-group heaps, no global sort of the corpus
    val fr = plan("sample_freshness")
    assert(fr.contains("WindowGroupLimit"), fr.take(800))
    // reweight: ONE corpus scan feeds the whole plan — the target full
    // join and both total windows operate on ≤|domains| plan rows
    val rw = plan("sample_domain_reweight")
    assert("Scan parquet|FileScan".r.findAllIn(rw).length == 1, rw.take(1200))
    assert(!rw.contains("CartesianProduct"), rw.take(1200))
  }

  test("round-10 session-4 ops: plan shapes hold") {
    // clustering coefficient: the wedge stage stays a keyed join
    val cc = plan("graph_clustering")
    assert(!cc.contains("CartesianProduct"), cc.take(1200))
    // k-anonymity: ONE hash aggregation over one scan, no join anywhere
    val ka = plan("rel_k_anonymity")
    assert(!ka.contains("Join"), ka.take(1200))
    assert("Scan parquet|FileScan".r.findAllIn(ka).length == 1, ka.take(1200))
    // kappa: the 1-row reductions combine by broadcast, never cartesian
    val fk = plan("rel_fleiss_kappa")
    assert(fk.contains("BroadcastNestedLoopJoin") || fk.contains("BroadcastExchange"),
      fk.take(1200))
    assert(!fk.contains("CartesianProduct"), fk.take(1200))
    // trend: pure aggregation pipeline — no join; the rebase window is
    // series-keyed, not global
    val tr = plan("events_trend")
    assert(!tr.contains("Join"), tr.take(1200))
    assert(!tr.contains("Window [") || tr.contains("windowspecdefinition(series"),
      tr.take(1500))
    // split leakage: the pair detector's banded shape survives the two
    // assignment joins — still no cartesian
    val sl = plan("sample_split_leakage")
    assert(!sl.contains("CartesianProduct"), sl.take(1200))
  }

  test("round-10 session-5 ops: plan shapes hold") {
    // RFM: all three grid score maps broadcast back onto the customer
    // scan — never a shuffled join on a score key
    val rfm = plan("rel_rfm")
    assert("BroadcastHashJoin".r.findAllIn(rfm).length >= 3, rfm.take(1500))
    // feature hashing: tokenize + ONE (doc, bucket) hash aggregate;
    // partial aggregation collapses repeats before its single exchange
    val fh = plan("text_feature_hash")
    assert(!fh.contains("Join"), fh.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(fh).length == 1, fh.take(1500))
    // Gram: one scan, one (i, j)-keyed exchange fed by partial_count/
    // partial_sum — the map-side collapse the docstring promises
    val g = plan("vec_gram")
    assert("Exchange hashpartitioning".r.findAllIn(g).length == 1, g.take(1500))
    assert(g.contains("partial_sum") || g.contains("partial_count"), g.take(1500))
    // association rules: the frequent-item prune is a broadcast
    // semi-join and the pair stage joins on the basket key, never
    // a cartesian
    val ar = plan("rel_assoc_rules")
    assert(ar.contains("BroadcastHashJoin") && !ar.contains("CartesianProduct"),
      ar.take(1500))
    // Theil-Sen: the pair stage joins on series equality (keyed), and
    // the rank window is series-keyed, not global
    val ts = plan("events_theilsen")
    assert(!ts.contains("CartesianProduct"), ts.take(1200))
    assert(ts.contains("windowspecdefinition(series"), ts.take(1500))
    // MDE / DiD: one user-keyed aggregation then 1-row rollups — no
    // window, no join beyond the final broadcast assembly
    Seq("events_mde", "events_did").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window ["), s"$q should have no window\n" + p.take(1200))
    }
  }

  test("TPC-H shapes: Q6 scan-only with pushed range, Q3 broadcast + TakeOrdered") {
    val q6 = plan("rel_tpch_q6")
    assert(q6.contains("PushedFilters") && q6.contains("l_shipdate"),
      q6.take(1200))
    assert(!q6.contains("Join"), "Q6 is scan + aggregate only")
    val q3 = plan("rel_tpch_q3")
    assert(q3.contains("TakeOrderedAndProject"), q3.take(1200))
    assert(q3.contains("BroadcastHashJoin"), q3.take(1200))
    val q14 = plan("rel_tpch_q14")
    assert(q14.contains("PushedFilters") && !q14.contains("CartesianProduct"),
      q14.take(1200))
    // Q1: pure scan + aggregate — pushed date range, no join, and the
    // aggregate is partial (map-side combine) before the one exchange.
    val q1 = plan("rel_tpch_q1")
    assert(q1.contains("PushedFilters") && q1.contains("l_shipdate"),
      q1.take(1200))
    assert(!q1.contains("Join"), "Q1 is scan + aggregate only\n" + q1.take(1200))
    assert(q1.contains("partial_sum") || q1.contains("partial_count"),
      q1.take(1500))
    // Q18: keyed joins only (broadcast or sort-merge, AQE's choice),
    // never a cartesian, and the top-100 is TakeOrderedAndProject, not
    // a global sort.
    val q18 = plan("rel_tpch_q18")
    assert(!q18.contains("CartesianProduct"), q18.take(1200))
    assert(q18.contains("BroadcastHashJoin") || q18.contains("SortMergeJoin"),
      q18.take(1500))
    assert(q18.contains("TakeOrderedAndProject"), q18.take(1500))
  }

  test("round-15 additions keep their documented shapes") {
    // scriptProfile: pure scan work — no exchange beyond the output sort
    val sp = plan("text_script_profile")
    assert("Exchange".r.findAllIn(sp).length <= 1,
      "scriptProfile must be scan-parallel")
    assert(!sp.contains("Join"), "scriptProfile has no join")
    // packLayout: exactly one data shuffle (the shard partition) before
    // the per-shard running-sum window + the output sort
    val pl = plan("sample_pack_layout")
    assert("Exchange".r.findAllIn(pl).length <= 2,
      "packLayout is one shard shuffle + output sort\n" + pl.take(1200))
    assert(!pl.toLowerCase.contains("cartesian"))
    // permutation sweep: replicate fan-out must partial-aggregate
    // map-side (the bootstrap discipline) and broadcast the observed row
    val pt = plan("eval_perm_test")
    assert(pt.contains("partial_sum") || pt.contains("partial_count"),
      pt.take(1500))
    assert(pt.contains("BroadcastNestedLoopJoin")
      || pt.contains("BroadcastHashJoin"), pt.take(1500))
    // chi-square: grid-local marginal joins, never a cartesian on data
    val cs = plan("rel_chi_square")
    assert(!cs.contains("CartesianProduct"), cs.take(1200))
    // winsorized mean and mann-whitney ride the bounded value grid —
    // no data-axis window (the only Window is over grid rows)
    Seq("eval_winsorized_mean", "eval_mann_whitney").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), q)
    }
    // anomaly card: the three meters consume the SAME checkpointed grid
    // (scan once) and every join is broadcast
    val ac = plan("pipeline_anomaly_card")
    assert(!ac.contains("SortMergeJoin") && !ac.contains("CartesianProduct"),
      ac.take(1500))
  }
}
