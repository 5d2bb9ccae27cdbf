package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** vec-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object VecRegistry extends Registry {

    // §2.3/§2.4: cosine scoring + metadata filter + top-k
  b.q(
    "vec_cosine_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Cosine)
        .metaFilter(col("label") >= 2)
        .take(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_cosine_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score
         |  FROM embeddings WHERE label >= 2
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

    // §2.3: dot-product scoring, no filter
  b.q(
    "vec_dot_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.DotProduct)
        .take(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_dot_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlDot(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

    // §2.3/§2.4: SQUARED euclidean, metric-default ascending take
  b.q(
    "vec_l2_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Euclidean)
        .take(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_l2_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlL2sq(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
  )

    // §2.5: score threshold filter, default k = all rows
  b.q(
    "vec_score_filter" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Cosine)
        .vecFilter(0.15, Cmp.Gt)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_score_filter" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s WHERE score > 0.15
         |ORDER BY score DESC, vec_id""".stripMargin
  )

    // §2.6: batch query with GLOBAL top-k merge (one pool, not per-query)
  b.q(
    "vec_batch_merge" -> ((s, dir) =>
      embStore(s, dir)
        .queryBatch(Seq(Q1, Q2), Metric.Cosine)
        .take(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_batch_merge" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, label, ${r4(sqlCosine(Q2))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

    // extension: PER-QUERY batch top-k (each query its own k; the
    // reference only merges globally) — window rank after one scan.
  b.q(
    "vec_batch_perquery" -> ((s, dir) =>
      embStore(s, dir)
        .queryBatchPerQuery(Seq(Q1, Q2), Metric.Cosine, k = 5,
          roundScoreDecimals = Some(4)))
  )
  b.o(
    "vec_batch_perquery" ->
      s"""WITH s AS (
         |  SELECT 0 AS q_idx, vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |  UNION ALL
         |  SELECT 1, vec_id, label, ${r4(sqlCosine(Q2))} FROM embeddings
         |),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_idx
         |  ORDER BY score DESC, vec_id) AS rk FROM s)
         |SELECT q_idx, vec_id, score, label FROM r WHERE rk <= 5
         |ORDER BY q_idx, score DESC, vec_id""".stripMargin
  )

    // roadmap metric (reference README.md:204-215): Manhattan / L1
    // distance, smallest-first.
  b.q(
    "vec_l1_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Manhattan)
        .take(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_l1_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    ${r4(s"list_sum(list_transform(list_zip($E, ${sqlVec(Q1)}), x -> abs(x[1]-x[2])))")} AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
  )

    // roadmap metric (reference README.md:211): Hamming distance over
    // binary SIGN signatures (1 bit per coordinate — the binary-code
    // serving shape). The signature column derives in-scan; the query is
    // binarized driver-side; smallest-first, integral scores, id tiebreak.
  b.q(
    "vec_hamming_topk" -> ((s, dir) => {
      val sig = transform(col("embedding"),
        x => when(x >= 0, 1.0).otherwise(0.0))
      VecStore(
        table(s, dir, "embeddings")
          .select(col("vec_id"), sig.as("sig"), col("label")),
        idCol = "vec_id", vecCol = "sig")
        .query(Q1.map(x => if (x >= 0) 1.0 else 0.0), Metric.Hamming)
        .take(10)
        .collect()
    })
  )
    // Sign-binarize both sides, count differing positions.
  b.o(
    "vec_hamming_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
    }
  )

    // the PACKED binary-signature serving shape: sign bits in 63-bit
    // words (2 longs for 64 dims — 16 bytes/row instead of 256), Hamming
    // = XOR + popcount per word. The oracle computes the same score the
    // UNPACKED way (per-coordinate sign diff count), so a hash match
    // proves the packed kernel's bit arithmetic, not just its ordering.
  b.q(
    "vec_hamming_packed_topk" -> ((s, dir) => {
      val packed = vectors.signBitsPacked(col("embedding"), 64)
      val qw = vectors.signBitsPackedOf(Q1)
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          vectors.hammingPacked(packed, vectors.longArrayLit(qw)).as("score"),
          col("label"))
        .orderBy(col("score").asc, col("vec_id"))
        .limit(10)
    })
  )
    // Deliberately the UNPACKED form: per-coordinate sign-diff count.
    // The Spark plan scores packed 63-bit words via XOR+popcount; value
    // equality across the two formulations is the point of the check.
  b.o(
    "vec_hamming_packed_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
    }
  )

    // roadmap metric (reference README.md:211): Jaccard similarity over
    // ACTIVE-DIMENSION sets (indices with a positive coordinate) — set
    // columns legitimately differ in size row to row, the one metric
    // exempt from the SearchPlan dimension guard; largest-first.
  b.q(
    "vec_jaccard_topk" -> ((s, dir) => {
      val active = filter(
        transform(col("embedding"),
          (x, i) => when(x > 0, i.cast("double")).otherwise(lit(null))),
        y => y.isNotNull)
      VecStore(
        table(s, dir, "embeddings")
          .select(col("vec_id"), active.as("dims"), col("label")),
        idCol = "vec_id", vecCol = "dims")
        .query(Q1.zipWithIndex.collect { case (x, i) if x > 0 => i.toDouble },
          Metric.Jaccard)
        .take(10)
        .withScoreRounding(4)
        .collect()
    })
  )
    // Active-dimension sets via a literal index spine (no index lambdas);
    // both sides are distinct sets, so |A∪B| = |A| + |B| - |A∩B|.
  b.o(
    "vec_jaccard_topk" -> {
      val idx = (0 until 64).map(_.toDouble)
      val qset = Q1.zipWithIndex.collect { case (x, i) if x > 0 => i.toDouble }
      s"""WITH a AS (
         |  SELECT vec_id, label,
         |    list_filter(list_transform(list_zip($E, ${sqlVec(idx)}),
         |      p -> CASE WHEN p[1] > 0 THEN p[2] END), v -> v IS NOT NULL) AS dims
         |  FROM embeddings
         |), s AS (
         |  SELECT vec_id, label,
         |    len(list_intersect(dims, ${sqlVec(qset)})) AS i,
         |    len(dims) + ${qset.length} - len(list_intersect(dims, ${sqlVec(qset)})) AS u
         |  FROM a
         |), sc AS (
         |  SELECT vec_id, label,
         |    CASE WHEN u = 0 THEN 0.0 ELSE ${r4("i * 1.0 / u")} END AS score
         |  FROM s
         |)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // extension: Johnson–Lindenstrauss random projection (Achlioptas
    // 2001) — 64→16 dims via a deterministic ±1 matrix, cosine top-k in
    // the PROJECTED space. The 4× byte shrink is what a 100 TB pipeline
    // applies before any vector-heavy shuffle (clustering, kNN graphs).
  b.q(
    "vec_rp_topk" -> ((s, dir) => {
      val p = vectors.rpMatrix(64, 16)
      val pq = vectors.projectOf(Q1, p)
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          vectors.quantize(
            vectors.score(Metric.Cosine,
              vectors.projectWith(col("embedding"), p), vectors.vecLit(pq),
              queryInvNorm = Some(lit(vectors.invNormOf(pq)))), 4)
            .as("score"),
          col("label"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    })
  )
  b.o(
    "vec_rp_topk" -> {
      val p = vectors.rpMatrix(64, 16)
      val pq = vectors.projectOf(Q1, p)
      // Projected store vector rebuilt in SQL from the same ±1 literal
      // rows; the projected QUERY is the driver-computed double literal
      // list the Spark plan also embeds.
      val projE = p.map(row => s"list_dot_product($E, ${sqlVec(row)})")
        .mkString("[", ", ", "]")
      s"""WITH pe AS (
         |  SELECT vec_id, label, $projE AS p FROM embeddings
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("p", pq))} AS score FROM pe
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // north-star: Matryoshka prefix-dim search (Kusupati et al. 2022) —
    // coarse cosine on the first 16 of 64 dims (a `slice` of the
    // already-scanned array, no auxiliary column or matrix), 40-candidate
    // pool, exact f32 rerank. Both stages deterministic (quantized score
    // + id tiebreak), so the oracle replays them exactly.
  b.q(
    "vec_matryoshka_topk" -> ((s, dir) =>
      ann.matryoshkaSearch(embStore(s, dir), Q1, k = 10,
          prefixDims = 16, candK = 40)
        .select(col("vec_id"), col("score"), col("label")))
  )
  b.o(
    "vec_matryoshka_topk" -> {
      val qp = Q1.take(16)
      s"""WITH pe AS (
         |  SELECT vec_id, label, $E AS e, list_slice($E, 1, 16) AS p FROM embeddings
         |), c AS (
         |  SELECT vec_id, label, e, ${r4(sqlCosineOn("p", qp))} AS mrl_score FROM pe
         |  ORDER BY mrl_score DESC, vec_id LIMIT 40
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM c
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // north-star: binary-quantization serving — coarse stage is packed
    // sign-bit Hamming (XOR + popcount per 63 dims, 16 bytes scanned
    // per row instead of 256), exact cosine rerank on the 40-candidate
    // pool; the oracle computes the SAME coarse score the unpacked way,
    // so a hash match proves the packed kernel feeding candidate
    // selection, not just final ordering.
  b.q(
    "vec_binary_topk" -> ((s, dir) =>
      ann.binarySearch(embStore(s, dir), Q1, k = 10, candK = 40)
        .select(col("vec_id"), col("score"), col("label")))
  )
    // Coarse score computed the UNPACKED way (per-coordinate sign
    // mismatch count) against the packed-kernel plan.
  b.o(
    "vec_binary_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH h AS (
         |  SELECT vec_id, label, $E AS e,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS ham
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, label, e FROM h ORDER BY ham ASC, vec_id LIMIT 40
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM c
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // roadmap (README.md:204-215): int8 scalar quantization — first-pass
    // scoring over 4x fewer bytes; exact f32 rerank stays available.
  b.q(
    "vec_quant_dot_topk" -> ((s, dir) => {
      val (qq, qs) = graft.ops.quant.quantizeQuery(Q1)
      graft.ops.quant.quantized(table(s, dir, "embeddings"))
        .select(col("vec_id"),
          vectors.quantize(graft.ops.quant.dequantizedDot(
            col("q_vec"), col("q_scale"),
            array(qq.map(lit): _*), lit(qs)), 4).as("score"),
          col("label"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    })
  )
  b.o(
    "vec_quant_dot_topk" -> {
      val (qq, qs) = graft.ops.quant.quantizeQuery(Q1)
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label, e,
         |  coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) / 127.0 AS qs FROM s),
         |v AS (SELECT vec_id, label, qs,
         |  CASE WHEN qs > 0 THEN list_transform(e, x -> least(greatest(floor(x/qs + 0.5), -127.0), 127.0))
         |       ELSE list_transform(e, x -> 0.0) END AS qv FROM sc),
         |p AS (SELECT vec_id, label,
         |  floor((list_dot_product(qv, ${qq.map(_.toDouble).mkString("[", ", ", "]::DOUBLE[]")}) * qs * $qs) * 10000.0 + 0.5) / 10000.0 AS score
         |FROM v)
         |SELECT vec_id, score, label FROM p
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // north-star: product quantization — ADC scoring (m lookups per row,
    // no float vector read); the 64x-fewer-scan-bytes serving path.
  b.q(
    "vec_pq_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.ops.quant.pqSearchDot(emb,
          graft.ops.quant.pqSeedCodebooks(emb, m = 4, k = 16), Q1, k = 10)
        .select(col("vec_id"), col("score"), col("label"))
    })
  )
  b.o(
    "vec_pq_topk" -> {
      // Per-subspace CTEs: a<s> = nearest-codeword assignment (argmin L2,
      // ties to the lower code id — same rn idiom as ann_ivf_topk), d<s> =
      // that codeword's dot with the query's subspace slice. DuckDB
      // derives the codebooks from the same 16 lowest-id rows the Spark
      // plan seeds from, so both engines compute identical doubles.
      val subs = (0 until 4).map { si =>
        val lo = si * 16 + 1
        def sl(e: String) = s"list_slice($e, $lo, ${lo + 15})"
        s"""a$si AS (SELECT vec_id, c AS c$si FROM (
           |  SELECT s.vec_id, cb.c, row_number() OVER (PARTITION BY s.vec_id
           |    ORDER BY ${sqlL2Between(sl("s.e"), sl("cb.e"))}, cb.c) AS rn FROM s, cb) WHERE rn = 1),
           |d$si AS (SELECT a$si.vec_id, list_dot_product(${sl("cb.e")}, ${sl(sqlVec(Q1))}) AS d
           |  FROM a$si JOIN cb ON a$si.c$si = cb.c)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |$subs,
         |sc AS (SELECT s.vec_id, s.label, floor((d0.d + d1.d + d2.d + d3.d) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM s JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
         |         JOIN d2 USING (vec_id) JOIN d3 USING (vec_id))
         |SELECT vec_id, score, label FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // north-star: embedding OOD outliers — distance to nearest centroid,
    // one scan + TakeOrderedAndProject; the data-cleaning triage list.
  b.q(
    "vec_outlier" -> ((s, dir) =>
      ann.centroidOutliers(table(s, dir, "embeddings"),
          ann.seedCentroids(table(s, dir, "embeddings"), 8), topN = 20)
        .select(col("vec_id"), col("centroid_dist"), col("label")))
  )
  b.o(
    "vec_outlier" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 8)),
         |nd AS (SELECT vec_id, label, floor(min(${sqlL2Between("s.e", "cent.e")}) * 10000.0 + 0.5) / 10000.0 AS centroid_dist
         |  FROM s, cent GROUP BY 1, 2)
         |SELECT vec_id, centroid_dist, label FROM nd
         |ORDER BY centroid_dist DESC, vec_id LIMIT 20""".stripMargin
  )

    // north-star: per-label embedding centroids (class prototypes) —
    // order-free fixed-point sums, shuffle is labels x dims cells.
  b.q(
    "vec_label_centroids" -> ((s, dir) =>
      ann.labelCentroids(table(s, dir, "embeddings"))
        .select(col("label"), col("pos"),
          (floor(col("mean") * 10000.0 + 0.5) / 10000.0).as("mean"), col("n"))
        .orderBy(col("label"), col("pos")))
  )
    // Fixed-point component sums (exact integers) divided once — the
    // same two double ops in the same order as the Spark plan.
  b.o(
    "vec_label_centroids" ->
      s"""WITH s AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |x AS (SELECT label, i AS pos, floor(e[i + 1] * 10000000.0)::BIGINT AS q
         |  FROM s, range(0, 64) r(i)),
         |m AS (SELECT label, pos, sum(q)::DOUBLE / (10000000.0::DOUBLE * count(*)) AS mean,
         |  count(*) AS n FROM x GROUP BY label, pos)
         |SELECT label, pos, floor(mean * 10000.0 + 0.5) / 10000.0 AS mean, n
         |FROM m ORDER BY label, pos""".stripMargin
  )

    // the complete reference flagship path in one query: indexed store,
    // metadata predicate (pushed to scan), score threshold, top-k
    // (ref README.md:59-136: query + meta_filter + vec_filter + take).
  b.q(
    "vec_full_pipeline" -> ((s, dir) =>
      embIndex(s, dir)
        .query(Q2, Metric.Cosine)
        .metaFilter(col("label") >= 3 && col("label") <= 7)
        .vecFilter(0.05, Cmp.Gte)
        .take(15)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_full_pipeline" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q2))} AS score
         |  FROM embeddings WHERE label >= 3 AND label <= 7
         |)
         |SELECT vec_id, score, label FROM s WHERE score >= 0.05
         |ORDER BY score DESC, vec_id LIMIT 15""".stripMargin
  )

    // §2.4: explicit take direction override (take_max on a min-default
    // metric = farthest points, ref vec.rs:161-168).
  b.q(
    "vec_takemax_l2" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Euclidean)
        .takeMax(10)
        .withScoreRounding(4)
        .collect())
  )
  b.o(
    "vec_takemax_l2" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlL2sq(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

    // north-star: label-noise screen — points whose kNN neighbors
    // mostly carry a different label, ranked by integer basis-point
    // disagreement. The audit queue for label quality.
  b.q(
    "vec_label_noise" -> ((s, dir) =>
      ann.labelNoise(table(s, dir, "embeddings"), k = 3, nbits = 6,
        topN = 50))
  )
  b.o(
    "vec_label_noise" ->
      s"""WITH $SqlKnnCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ed AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |j AS (SELECT ed.src, (la.label <> lb.label)::INT AS mism
         |  FROM ed JOIN lab la ON ed.src = la.vec_id
         |  JOIN lab lb ON ed.dst = lb.vec_id),
         |a AS (SELECT src AS vec_id, count(*)::BIGINT AS n_nb,
         |  coalesce(sum(mism), 0)::BIGINT AS n_mismatch FROM j GROUP BY 1)
         |SELECT vec_id, n_nb, n_mismatch,
         |  (n_mismatch * 10000) // n_nb AS mismatch_bp
         |FROM a WHERE n_mismatch > 0
         |ORDER BY mismatch_bp DESC, vec_id LIMIT 50""".stripMargin
  )

    // north-star: embedding-space drift between two corpus versions —
    // centroid cosine + squared centroid shift, exact fixed-point sums.
  b.q(
    "vec_corpus_drift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.centroidDrift(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1))
    })
  )
  b.o(
    "vec_corpus_drift" ->
      """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |d AS (SELECT unnest(range(1, 65)) AS pos),
        |qa AS (SELECT pos, sum(floor(e[pos] * 1000000.0)::BIGINT)::BIGINT AS q_a,
        |  count(*)::BIGINT AS n_a FROM s CROSS JOIN d WHERE vec_id % 2 = 0 GROUP BY pos),
        |qb AS (SELECT pos, sum(floor(e[pos] * 1000000.0)::BIGINT)::BIGINT AS q_b,
        |  count(*)::BIGINT AS n_b FROM s CROSS JOIN d WHERE vec_id % 2 = 1 GROUP BY pos),
        |m AS (SELECT qa.pos, n_a, n_b,
        |  q_a::DOUBLE / 1000000.0 / n_a::DOUBLE AS ma,
        |  q_b::DOUBLE / 1000000.0 / n_b::DOUBLE AS mb
        |  FROM qa JOIN qb ON qa.pos = qb.pos),
        |t AS (SELECT n_a, n_b,
        |  sum(floor(ma * mb * 1000000.0)::BIGINT)::BIGINT AS d2,
        |  sum(floor(ma * ma * 1000000.0)::BIGINT)::BIGINT AS na,
        |  sum(floor(mb * mb * 1000000.0)::BIGINT)::BIGINT AS nb,
        |  sum(floor((ma - mb) * (ma - mb) * 1000000.0)::BIGINT)::BIGINT AS s2
        |  FROM m GROUP BY 1, 2)
        |SELECT n_a, n_b,
        |  floor(d2::DOUBLE / 1000000.0 / (sqrt(na::DOUBLE / 1000000.0)
        |    * sqrt(nb::DOUBLE / 1000000.0)) * 10000.0 + 0.5) / 10000.0 AS cos,
        |  floor(s2::DOUBLE / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS l2_shift
        |FROM t""".stripMargin
  )

    // north-star: scorer calibration table — quantized cosine-to-query
    // as the "classifier score", label >= 5 as the outcome; per-bin
    // empirical rate in integer basis points. One bin-keyed groupBy.
  b.q(
    "vec_score_calibration" -> ((s, dir) => {
      val score = vectors.quantize(
        vectors.score(Metric.Cosine,
          vectors.asDoubleArray(col("embedding")), vectors.vecLit(Q1),
          queryInvNorm = Some(lit(vectors.invNormOf(Q1)))), 4)
      sample.calibrationMap(table(s, dir, "embeddings"),
          score, col("label") >= 5, lo = -1.0, hi = 1.0, nbins = 20)
        // bin edges as integer milli-units for the compare: the double
        // edges differ by an ulp across engines (DuckDB decimal literals)
        .select(col("bin"), (lit(-1000L) + col("bin") * 100L).as("lo_milli"),
          (lit(-1000L) + (col("bin") + 1L) * 100L).as("hi_milli"),
          col("n"), col("n_pos"), col("rate_bp"))
        .orderBy(col("bin"))
    })
  )
  b.o(
    "vec_score_calibration" ->
      s"""WITH s AS (SELECT label, ${r4(sqlCosine(Q1))} AS score FROM embeddings),
         |b AS (SELECT label,
         |    greatest(0, least(19, floor((score - (-1.0)) / 0.1)::BIGINT)) AS bin
         |  FROM s)
         |SELECT bin, -1000 + bin * 100 AS lo_milli,
         |  -1000 + (bin + 1) * 100 AS hi_milli,
         |  count(*)::BIGINT AS n,
         |  sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         |  ((sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT AS rate_bp
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  )

    // north-star: simplified silhouette over the labeled embeddings —
    // clustering-quality meter; centroids baked as literals into one
    // scan, per-label mean via exact fixed-point longs.
  b.q(
    "vec_silhouette" -> ((s, dir) =>
      ann.silhouetteSimplified(table(s, dir, "embeddings"))
        .orderBy(col("label")))
  )
  b.o(
    "vec_silhouette" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |x AS (SELECT label, i AS pos, floor(e[i + 1] * 10000000.0)::BIGINT AS q
         |  FROM s, range(0, 64) r(i)),
         |m AS (SELECT label, pos,
         |  sum(q)::DOUBLE / (10000000.0::DOUBLE * count(*)) AS c
         |  FROM x GROUP BY label, pos),
         |cv AS (SELECT label AS clabel, list(c ORDER BY pos) AS cvec
         |  FROM m GROUP BY label),
         |d AS (SELECT s.vec_id, s.label, cv.clabel,
         |  sqrt(${sqlL2Between("s.e", "cv.cvec")}) AS dist FROM s, cv),
         |ab AS (SELECT vec_id, label,
         |  min(CASE WHEN label = clabel THEN dist END) AS a,
         |  min(CASE WHEN label != clabel THEN dist END) AS b
         |  FROM d GROUP BY vec_id, label),
         |sil AS (SELECT label,
         |  CASE WHEN greatest(a, b) > 0.0 THEN (b - a) / greatest(a, b)
         |    ELSE 0.0 END AS sv FROM ab)
         |SELECT label, count(*)::BIGINT AS n,
         |  ${r4("sum(floor(sv * 10000000.0)::BIGINT)::DOUBLE / (10000000.0::DOUBLE * count(*))")} AS silhouette
         |FROM sil GROUP BY label ORDER BY label""".stripMargin
  )

    // north-star: chunk→doc embedding rollup — fixed-point exact mean
    // pooling (vec_id % 100 stands in for the doc of each chunk); the
    // long-doc coarse-index builder. Output is FLATTENED to one scalar
    // row per (doc, component) — the driver's diff harness lexsorts all
    // columns and cannot hash an array<double> cell (the round-10 trap).
  b.q(
    "vec_chunk_pool" -> ((s, dir) =>
      ann.poolEmbeddings(
          table(s, dir, "embeddings")
            .withColumn("doc_id", col("vec_id") % 100),
          "doc_id")
        .select(col("doc_id"), col("n_chunks"),
          posexplode(col("pooled")).as(Seq("pos", "v")))
        .orderBy(col("doc_id"), col("pos")))
  )
    // Fixed-point micro-unit sums per (doc, dim), exact BIGINT, one
    // rounded float per component; flattened to scalar (doc, pos, v)
    // rows — pos is 0-based to match posexplode.
  b.o(
    "vec_chunk_pool" ->
      """WITH e AS (SELECT vec_id % 100 AS doc_id,
        |    CAST(embedding AS DOUBLE[])[i] AS x, i
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
        |a AS (SELECT doc_id, i, sum(floor(x * 1000000.0)::BIGINT)::BIGINT AS s,
        |    count(*)::BIGINT AS n
        |  FROM e GROUP BY 1, 2),
        |nc AS (SELECT doc_id, max(n)::BIGINT AS n_chunks FROM a GROUP BY 1)
        |SELECT a.doc_id, nc.n_chunks, (a.i - 1)::INT AS pos,
        |  floor(s::DOUBLE / n::DOUBLE / 100.0 + 0.5) / 10000.0 AS v
        |FROM a JOIN nc ON a.doc_id = nc.doc_id
        |ORDER BY a.doc_id, pos""".stripMargin
  )

    // north-star: per-dimension embedding health — dead/collapsed-dim
    // screen with exact fixed-point sums; variance quotient is the one
    // division and its numerator is non-negative by Cauchy-Schwarz.
  b.q(
    "vec_dim_stats" -> ((s, dir) =>
      ann.dimStats(table(s, dir, "embeddings"))
        .orderBy(col("dim")))
  )
    // 1e-3 fixed point; var numerator non-negative, so // == DIV.
  b.o(
    "vec_dim_stats" ->
      s"""WITH e AS (SELECT i - 1 AS dim, $E[i] AS x
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
         |  WHERE embedding IS NOT NULL),
         |m AS (SELECT dim, x, floor(x * 1000.0)::BIGINT AS xm FROM e)
         |SELECT dim, count(*)::BIGINT AS n,
         |  sum(CASE WHEN x = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
         |  sum(xm)::BIGINT AS sum_milli,
         |  ((count(*) * sum(xm * xm) - sum(xm) * sum(xm))
         |    // (count(*) * count(*)))::BIGINT AS var_milli2
         |FROM m GROUP BY dim ORDER BY dim""".stripMargin
  )

    // north-star: exact fixed-point Gram matrix of the embedding corpus
    // — the one-pass second-moment substrate for PCA and anisotropy
    // reads; every entry an exact integer.
  b.q(
    "vec_gram" -> ((s, dir) =>
      graft.ops.linalg.gram(table(s, dir, "embeddings"), "embedding",
          dim = 64, q = 10000L)
        .orderBy(col("i"), col("j")))
  )
    // Upper-triangle exact integer Gram entries: quantize once per
    // element, multiply, sum — order-free on both engines.
  b.o(
    "vec_gram" ->
      """WITH s AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |q AS (SELECT list_transform(e, v -> floor(v * 10000)::BIGINT) AS qa FROM s),
        |d AS (SELECT unnest(range(0, 64))::INT AS i)
        |SELECT di.i AS i, dj.i AS j, count(*)::BIGINT AS n,
        |  sum(qa[di.i + 1] * qa[dj.i + 1])::BIGINT AS g
        |FROM q CROSS JOIN d di CROSS JOIN d dj
        |WHERE dj.i >= di.i
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin
  )

    // north-star: embedding anisotropy — exact off-diagonal vs trace
    // mass of the Gram matrix; the is-cosine-trustworthy-here screen.
  b.q(
    "vec_anisotropy" -> ((s, dir) =>
      graft.ops.linalg.anisotropy(
        graft.ops.linalg.gram(table(s, dir, "embeddings"), "embedding",
          dim = 64, q = 10000L)))
  )
    // Trace vs doubled |off-diagonal| mass of the same exact Gram;
    // the ratio is the one quantized float.
  b.o(
    "vec_anisotropy" ->
      """WITH s AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |q AS (SELECT list_transform(e, v -> floor(v * 10000)::BIGINT) AS qa FROM s),
        |d AS (SELECT unnest(range(0, 64))::INT AS i),
        |g AS (SELECT di.i AS i, dj.i AS j,
        |    sum(qa[di.i + 1] * qa[dj.i + 1])::BIGINT AS g
        |  FROM q CROSS JOIN d di CROSS JOIN d dj WHERE dj.i >= di.i
        |  GROUP BY 1, 2),
        |t AS (SELECT
        |    sum(CASE WHEN i = j THEN g ELSE 0 END)::BIGINT AS trace,
        |    sum(CASE WHEN i != j THEN abs(g) * 2 ELSE 0 END)::BIGINT AS offdiag_abs
        |  FROM g)
        |SELECT trace, offdiag_abs,
        |  CASE WHEN trace > 0 THEN
        |    floor(offdiag_abs::DOUBLE / trace::DOUBLE * 1000000.0 + 0.5) / 1000000.0
        |  END AS aniso_q6
        |FROM t""".stripMargin
  )

    // north-star: in-engine linear-probe training — 2 rounds of exact
    // integer full-batch GD on the first 8 embedding dims vs the
    // label>=5 target; the whole run engine-reproducible bit-for-bit.
  b.q(
    "vec_linear_probe" -> ((s, dir) =>
      graft.ops.linalg.linearProbeTrain(table(s, dir, "embeddings"),
          "embedding", col("label") >= 5, dims = 8, iters = 2, q = 100L)
        .orderBy(col("j")))
  )
  b.o(
    "vec_linear_probe" -> sqlLinearProbe(dims = 8, iters = 2, q = 100L,
      lrInv = 1L)
  )

    // north-star: distributed Lloyd k-means, bit-exact — integer
    // distances (no ulp can flip an assignment), driver-truncated
    // centroid updates, k smallest-id init; 2 rounds + final summary.
  b.q(
    "vec_kmeans" -> ((s, dir) =>
      graft.ops.linalg.kmeansFit(table(s, dir, "embeddings"), "embedding",
          "vec_id", dim = 64, k = 4, iters = 2)
        .orderBy(col("cluster")))
  )
  b.o(
    "vec_kmeans" -> sqlKmeans(dim = 64, k = 4, iters = 2, q = 10000L)
  )
}
