package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** ann-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object AnnRegistry extends Registry {

    // north-star: binary-quantization recall meter — run before
    // persisting sign-bit codes; recall is a property of the space.
  b.q(
    "ann_binary_recall" -> ((s, dir) =>
      ann.binaryRecallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10,
        candK = 40))
  )
  b.o(
    "ann_binary_recall" -> {
      def stages(i: Int, q: Seq[Double]): String = {
        val qb = q.map(x => if (x >= 0) 1.0 else 0.0)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e,
           |    list_sum(list_transform(list_zip(
           |      list_transform(e, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
           |      ${sqlVec(qb)}),
           |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS ham
           |  FROM s ORDER BY ham ASC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    }
  )

    // north-star: greedy k-center (farthest-point) coreset selection —
    // 6 rounds, each one full scan with the chosen centers riding the
    // plan as literals and a single-row TakeOrderedAndProject; the
    // quantize-before-argmax discipline makes the greedy trajectory
    // engine-reproducible, so the oracle replays all 6 rounds as
    // unrolled CTEs and must select the identical centers.
  b.q(
    "ann_kcenter_select" -> ((s, dir) =>
      ann.kCenterSelect(table(s, dir, "embeddings"), k = 6))
  )
    // Gonzalez greedy unrolled: d_r = least(d_{r-1}, quantized pairwise
    // L2 to the newest center), winner by (d desc, id asc) — exactly the
    // Spark op's per-round computation.
  b.o(
    "ann_kcenter_select" -> {
      val k = 6
      val head =
        s"""WITH e AS (SELECT vec_id, $E AS v FROM embeddings),
           |c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
           |d1 AS (SELECT e.vec_id, e.v, ${r4(sqlL2Between("e.v", "c.v"))} AS d
           |  FROM e, c0 c),
           |c1 AS (SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
      val rounds = (2 until k).map(r =>
        s""",
           |d$r AS (SELECT d.vec_id, d.v,
           |  least(d.d, ${r4(sqlL2Between("d.v", "c.v"))}) AS d
           |  FROM d${r - 1} d, c${r - 1} c),
           |c$r AS (SELECT vec_id, v, d FROM d$r ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin).mkString
      val sel = "SELECT 0 AS round, vec_id AS center_id, 0.0::DOUBLE AS dist_sq FROM c0" +
        (1 until k).map(r =>
          s" UNION ALL SELECT $r, vec_id, d FROM c$r").mkString
      s"$head$rounds\n$sel ORDER BY round"
    }
  )

    // north-star: IVF-PQ over the persisted index — partition pruning
    // (nprobe of 16 lists read) COMPOUNDS with ADC code scoring (float
    // vectors never read); the FAISS-style 100 TB serving layout.
  b.q(
    "ann_ivfpq_topk" -> ((s, dir) =>
      ann.ivfPqSearch(embIvfIndex(s, dir), Q1, k = 10, nprobe = 4)
        .select(col("vec_id"), col("score"), col("label")))
  )
  b.o(
    "ann_ivfpq_topk" -> {
      // IVF probe CTEs (as in ann_ivf_topk) compose with the PQ
      // assignment CTEs (as in vec_pq_topk), restricted to the probed
      // lists — the SQL mirror of partition pruning + ADC scoring.
      val subs = (0 until 4).map { si =>
        val lo = si * 16 + 1
        def sl(e: String) = s"list_slice($e, $lo, ${lo + 15})"
        s"""a$si AS (SELECT vec_id, c AS c$si FROM (
           |  SELECT sel.vec_id, cb.c, row_number() OVER (PARTITION BY sel.vec_id
           |    ORDER BY ${sqlL2Between(sl("sel.e"), sl("cb.e"))}, cb.c) AS rn FROM sel, cb) WHERE rn = 1),
           |d$si AS (SELECT a$si.vec_id, list_dot_product(${sl("cb.e")}, ${sl(sqlVec(Q1))}) AS d
           |  FROM a$si JOIN cb ON a$si.c$si = cb.c)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |probe AS (SELECT cid FROM cent
         |  ORDER BY ${sqlL2Between("e", sqlVec(Q1))}, cid LIMIT 4),
         |sel AS (SELECT vec_id, label, e FROM (
         |  SELECT s.vec_id, s.label, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1 AND cid IN (SELECT cid FROM probe)),
         |$subs,
         |sc AS (SELECT sel.vec_id, sel.label, floor((d0.d + d1.d + d2.d + d3.d) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM sel JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
         |         JOIN d2 USING (vec_id) JOIN d3 USING (vec_id))
         |SELECT vec_id, score, label FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    }
  )

    // north-star: LSH-bucketed ANN — scan only the query's 6-bit
    // hyperplane bucket (~1/64 of the store with a persisted+partitioned
    // signature), exact cosine rerank inside it.
  b.q(
    "ann_lsh_topk" -> ((s, dir) =>
      ann.lshSearch(embStore(s, dir), Q1, k = 5, nbits = 6))
  )
  b.o(
    "ann_lsh_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q1, 0, 6)}),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
  )

    // north-star: batched ANN serving — B queries amortize ONE
    // bucket-pruned scan; per-query top-k is a rank window
    // (WindowGroupLimit), never a global sort.
  b.q(
    "ann_lsh_batch" -> ((s, dir) =>
      ann.lshSearchBatch(embStore(s, dir), Seq((0L, Q1), (1L, Q2)), k = 5)
        .orderBy(col("query_id"), col("score").desc, col("vec_id")))
  )
    // Per query: the single-query oracle form with a query_id tag,
    // unioned — the Spark side must reproduce it from ONE shared scan.
  b.o(
    "ann_lsh_batch" -> {
      def one(qid: Int, q: Seq[Double]) =
        s"""SELECT $qid::BIGINT AS query_id, vec_id, score FROM (
           |  SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score FROM s
           |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(q, 0, 6)}
           |  ORDER BY score DESC, vec_id LIMIT 5)""".stripMargin
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
         |SELECT query_id, vec_id, score FROM (
         |${one(0, Q1)}
         |UNION ALL
         |${one(1, Q2)})
         |ORDER BY query_id, score DESC, vec_id""".stripMargin
    }
  )

    // north-star: recall@k measurement for the LSH search — the tuning
    // number behind the nbits ↔ scan-fraction trade; exact side is the
    // ground-truth full scan, both sides k-row subplans.
  b.q(
    "ann_recall_at_k" -> ((s, dir) =>
      ann.recallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10, nbits = 6))
  )
    // Per query: exact top-10 CTE, bucket top-10 CTE, one-row hit count;
    // recall = hits / k (single IEEE division, identical both engines).
  b.o(
    "ann_recall_at_k" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |ex0 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q1))} AS score
         |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
         |ap0 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q1))} AS score
         |  FROM s WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q1, 0, 6)}
         |  ORDER BY score DESC, vec_id LIMIT 10)),
         |h0 AS (SELECT 0 AS q_idx, count(*) AS hits FROM ex0 JOIN ap0 USING (vec_id)),
         |ex1 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q2))} AS score
         |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
         |ap1 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q2))} AS score
         |  FROM s WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q2, 0, 6)}
         |  ORDER BY score DESC, vec_id LIMIT 10)),
         |h1 AS (SELECT 1 AS q_idx, count(*) AS hits FROM ex1 JOIN ap1 USING (vec_id))
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
  )

    // north-star: recall of the persisted-projection search — the candK
    // tuning knob measured, not argued (same discipline as nprobe/nbits).
  b.q(
    "ann_rp_recall" -> ((s, dir) =>
      ann.rpRecallAtK(embIndex(s, dir), Seq(Q1, Q2), k = 10))
  )
    // Per query: exact top-10 vs the rp two-stage (rounded projected
    // cosine pool of 40 with id tiebreak, exact rerank to 10) — the
    // matrix rebuilt from the same ±1 literals the build persisted.
  b.o(
    "ann_rp_recall" -> {
      val p = vectors.rpMatrix(64, 16)
      val projE = p.map(row => s"list_dot_product(e, ${sqlVec(row)})")
        .mkString("[", ", ", "]")
      def stages(i: Int, q: Seq[Double]): String = {
        val pq = vectors.projectOf(q, p)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e, ${r4(sqlCosineOn("p", pq))} AS rp_score
           |  FROM (SELECT vec_id, e, $projE AS p FROM s)
           |  ORDER BY rp_score DESC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    }
  )

    // recall meter for the prefix-dim path — the number that tells you
    // whether these embeddings were matryoshka-trained at all.
  b.q(
    "ann_matryoshka_recall" -> ((s, dir) =>
      ann.matryoshkaRecallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10,
        prefixDims = 16, candK = 40))
  )
  b.o(
    "ann_matryoshka_recall" -> {
      def stages(i: Int, q: Seq[Double]): String = {
        val qp = q.take(16)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e, ${r4(sqlCosineOn("p", qp))} AS mrl_score
           |  FROM (SELECT vec_id, e, list_slice(e, 1, 16) AS p FROM s)
           |  ORDER BY mrl_score DESC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    }
  )

    // north-star: ANN over an LSH-PARTITIONED index — the bucket filter
    // becomes directory-level partition pruning (63 of 64 buckets never
    // read; see AnnSpec's PartitionFilters assertion).
  b.q(
    "ann_lsh_part_topk" -> ((s, dir) =>
      ann.lshSearch(embLshIndex(s, dir), Q2, k = 5, nbits = 6))
  )
  b.o(
    "ann_lsh_part_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q2, 0, 6)}),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q2))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
  )

    // north-star: MULTI-PROBE LSH — the query's bucket plus the 3
    // lowest-margin bit-flip buckets, read as 4 pruned partition
    // directories of the same persisted index (recall rises with probes,
    // not with tables/storage).
  b.q(
    "ann_lsh_multiprobe_topk" -> ((s, dir) =>
      ann.lshSearchMultiProbe(embLshIndex(s, dir), Q1, k = 5, nbits = 6,
        probes = 4))
  )
    // The probe set is computed by the same driver-side margin sort the
    // Spark path uses, injected as literals.
  b.o(
    "ann_lsh_multiprobe_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) IN (${ann.lshProbeSigsOf(Q1, 0, 6, 4).mkString(", ")})),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
  )

    // north-star: IVF ANN over a cluster-partitioned index — assignment
    // ran once at build (16 deterministic seed centroids, persisted in
    // the index metadata); the probe of the 4 nearest lists is directory
    // partition pruning, so 12 of 16 lists are never read.
    // (pq_code rides in the same index for ann_ivfpq_topk — project it
    // away here so the exact-scoring result shape matches the oracle's.)
  b.q(
    "ann_ivf_topk" -> ((s, dir) =>
      ann.ivfSearchIndexed(embIvfIndex(s, dir), Q1, k = 10, nprobe = 4)
        .select(col("vec_id"), col("score"), col("label")))
  )
  b.o(
    "ann_ivf_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |probe AS (SELECT cid FROM cent
         |  ORDER BY ${sqlL2Between("e", sqlVec(Q1))}, cid LIMIT 4),
         |assign AS (SELECT vec_id, label, e FROM (
         |  SELECT s.vec_id, s.label, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1 AND cid IN (SELECT cid FROM probe)),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM assign)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

    // north-star: batched serving over the IVF layout — B queries, ONE
    // scan pruned to the union of probed list directories.
  b.q(
    "ann_ivf_batch" -> ((s, dir) =>
      ann.ivfSearchBatch(embIvfIndex(s, dir), Seq((0L, Q1), (1L, Q2)),
          k = 10, nprobe = 4)
        .orderBy(col("query_id"), col("score").desc, col("vec_id")))
  )
    // Shared centroid/assignment CTEs; per-query probe + top-k branches
    // tagged with query_id and unioned.
  b.o(
    "ann_ivf_batch" -> {
      def branch(qid: Int, q: Seq[Double]) =
        s"""SELECT $qid::BIGINT AS query_id, vec_id, score FROM (
           |  SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score FROM assign
           |  WHERE cid IN (SELECT cid FROM cent
           |    ORDER BY ${sqlL2Between("e", sqlVec(q))}, cid LIMIT 4)
           |  ORDER BY score DESC, vec_id LIMIT 10)""".stripMargin
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |assign AS (SELECT vec_id, e, cid FROM (
         |  SELECT s.vec_id, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1)
         |SELECT query_id, vec_id, score FROM (
         |${branch(0, Q1)}
         |UNION ALL
         |${branch(1, Q2)})
         |ORDER BY query_id, score DESC, vec_id""".stripMargin
    }
  )

    // north-star: recall@k for the IVF index — the nprobe tuning loop
    // (lists read vs recall), exact side is the full-scan ground truth.
  b.q(
    "ann_ivf_recall" -> ((s, dir) =>
      ann.ivfRecallAtK(embIvfIndex(s, dir), Seq(Q1, Q2), k = 10, nprobe = 4))
  )
  b.o(
    "ann_ivf_recall" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |${ivfRecallCtes(0, Q1)},
         |${ivfRecallCtes(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
  )

    // approximate kNN GRAPH (per-vector top-k neighbor lists from shared
    // LSH buckets) — thin-row banding, rank on the ROUNDED score.
  b.q(
    "ann_knn_graph" -> ((s, dir) =>
      ann.knnGraph(table(s, dir, "embeddings"), k = 3, nbits = 6)
        .orderBy(col("src"), col("rnk")))
  )
  b.o(
    "ann_knn_graph" ->
      s"""WITH $SqlKnnCtes
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 3 ORDER BY src, rnk""".stripMargin
  )

    // north-star: hard-negative mining — nearest different-label
    // neighbors, the informative contrastive-training examples; the
    // label gate applies BEFORE the per-source rank.
  b.q(
    "ann_hard_negatives" -> ((s, dir) =>
      ann.hardNegatives(table(s, dir, "embeddings"), k = 2)
        .orderBy(col("src"), col("rnk")))
  )
  b.o(
    "ann_hard_negatives" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |c AS (SELECT a.vec_id AS src, x.vec_id AS dst, a.e AS ea, x.e AS eb
         |  FROM b a JOIN b x ON a.sig = x.sig AND a.vec_id != x.vec_id
         |    AND a.label != x.label),
         |p AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM c),
         |r AS (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 2 ORDER BY src, rnk""".stripMargin
  )

    // two-corpus kNN JOIN — link a query set to a reference corpus by
    // embedding (disjoint modulo split of the same table stands in for
    // the two datasets).
  b.q(
    "ann_knn_join" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.knnJoin(
          emb.where(col("vec_id") % 7 === 0),
          emb.where(col("vec_id") % 7 =!= 0), k = 2, nbits = 6)
        .orderBy(col("src"), col("rnk"))
    })
  )
  b.o(
    "ann_knn_join" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |l AS (SELECT * FROM b WHERE vec_id % 7 = 0),
         |rr AS (SELECT * FROM b WHERE vec_id % 7 != 0),
         |c AS (SELECT l.vec_id AS src, rr.vec_id AS dst, l.e AS ea, rr.e AS eb
         |  FROM l JOIN rr ON l.sig = rr.sig),
         |p AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM c),
         |r AS (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 2 ORDER BY src, rnk""".stripMargin
  )

    // north-star: margin-based pair mining (Artetxe & Schwenk 2019 —
    // the CCMatrix/NLLB bitext score): forward kNN cosine normalized by
    // both endpoints' neighborhood averages, exact-integer num/den,
    // mined set = ratio margin >= 1.
  b.q(
    "ann_margin_mine" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.marginMine(
          emb.where(col("vec_id") % 7 === 0),
          emb.where(col("vec_id") % 7 =!= 0), k = 2, threshold = 1.0,
          nbits = 6)
        .orderBy(col("src"), col("dst"))
    })
  )
    // Margin mining: the knn-join chain BOTH directions, q4-long
    // neighborhood sums, cleared-denominator exact margin, one
    // quantized division at the readout.
  b.o(
    "ann_margin_mine" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |l AS (SELECT * FROM b WHERE vec_id % 7 = 0),
         |rr AS (SELECT * FROM b WHERE vec_id % 7 != 0),
         |cf AS (SELECT l.vec_id AS src, rr.vec_id AS dst, l.e AS ea, rr.e AS eb
         |  FROM l JOIN rr ON l.sig = rr.sig),
         |pf AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM cf),
         |fwd AS (SELECT src, dst, cos FROM (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
         |  FROM pf) WHERE rnk <= 2),
         |cb AS (SELECT rr.vec_id AS src, l.vec_id AS dst, rr.e AS ea, l.e AS eb
         |  FROM rr JOIN l ON rr.sig = l.sig),
         |pb AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM cb),
         |bwd AS (SELECT src, dst, cos FROM (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
         |  FROM pb) WHERE rnk <= 2),
         |fa AS (SELECT src, sum(floor(cos * 10000.0 + 0.5)::BIGINT)::BIGINT AS sf,
         |  count(*)::BIGINT AS kf FROM fwd GROUP BY src),
         |ba AS (SELECT src AS dst, sum(floor(cos * 10000.0 + 0.5)::BIGINT)::BIGINT AS sb,
         |  count(*)::BIGINT AS kb FROM bwd GROUP BY src),
         |m AS (SELECT f.src, f.dst, f.cos,
         |    (floor(f.cos * 10000.0 + 0.5)::BIGINT * 2 * kf * kb)::BIGINT AS margin_num,
         |    (sf * kb + sb * kf)::BIGINT AS margin_den
         |  FROM fwd f JOIN fa USING (src) JOIN ba USING (dst)),
         |q AS (SELECT src, dst, cos, margin_num, margin_den,
         |    CASE WHEN margin_den != 0 THEN
         |      floor(margin_num::DOUBLE / margin_den::DOUBLE * 1000000.0 + 0.5)
         |        / 1000000.0 END AS margin_q6
         |  FROM m)
         |SELECT src, dst, cos, margin_num, margin_den, margin_q6 FROM q
         |WHERE margin_q6 >= 1.0 ORDER BY src, dst""".stripMargin
  )

    // north-star: IVF cluster-balance meter — vectors per centroid with
    // share and load (10000 bp = perfectly even); the partition-pruning
    // health check before trusting nprobe math.
  b.q(
    "ann_cluster_balance" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val counts = ann.ivfAssign(emb, ann.seedCentroids(emb, 16))
        .groupBy(col("cluster_id").cast("long").as("cluster_id"))
        .agg(count(lit(1)).as("n"))
      val w = graft.ops.windows.boundedGlobal("k-clusters", col("cluster_id"))
      counts
        .withColumn("_total", sum(col("n")).over(w))
        .withColumn("_k", count(lit(1)).over(w))
        .select(col("cluster_id"), col("n"),
          expr("n * 10000 DIV _total").as("share_bp"),
          expr("n * _k * 10000 DIV _total").as("load_bp"))
        .orderBy(col("cluster_id"))
    })
  )
    // The IVF assignment argmin (ORDER BY dist, cid — ivfAssign's
    // first-minimum tie rule), then integer share/load basis points over
    // non-empty clusters.
  b.o(
    "ann_cluster_balance" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT s.vec_id, c.cid, row_number() OVER (PARTITION BY s.vec_id
         |    ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1),
         |a AS (SELECT cid, count(*)::BIGINT AS n FROM asg GROUP BY 1),
         |t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS k FROM a)
         |SELECT cid::BIGINT AS cluster_id, n,
         |  (n * 10000 // total)::BIGINT AS share_bp,
         |  (n * k * 10000 // total)::BIGINT AS load_bp
         |FROM a CROSS JOIN t ORDER BY cluster_id""".stripMargin
  )

    // north-star: embedding-corpus drift (diagonal FID family) between
    // the even- and odd-label halves — two d-row moment grids, linear
    // MMD² + per-dim variance gap; the corpora never move.
  b.q(
    "ann_embed_drift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.ops.linalg.embedDrift(
        graft.ops.linalg.momentGrid(
          emb.where(col("label") % 2 === 0), "embedding", 64),
        graft.ops.linalg.momentGrid(
          emb.where(col("label") % 2 === 1), "embedding", 64))
    })
  )
    // Diagonal-FID drift: per-dim exact integer moments of each label
    // half, fixed-order double readout, 1e-12 fixed-point terms.
  b.o(
    "ann_embed_drift" ->
      """WITH qa AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> floor(v * 10000.0)::BIGINT) AS qx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(embedding) = 64 AND label % 2 = 0),
        |qb AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> floor(v * 10000.0)::BIGINT) AS qx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(embedding) = 64 AND label % 2 = 1),
        |d AS (SELECT unnest(range(0, 64))::INT AS i),
        |ga AS (SELECT d.i AS pos, count(*)::BIGINT AS n_a,
        |    sum(qx[d.i + 1])::BIGINT AS s_a,
        |    sum(qx[d.i + 1] * qx[d.i + 1])::BIGINT AS s2_a
        |  FROM qa CROSS JOIN d GROUP BY 1),
        |gb AS (SELECT d.i AS pos, count(*)::BIGINT AS n_b,
        |    sum(qx[d.i + 1])::BIGINT AS s_b,
        |    sum(qx[d.i + 1] * qx[d.i + 1])::BIGINT AS s2_b
        |  FROM qb CROSS JOIN d GROUP BY 1),
        |e AS (SELECT n_a, n_b,
        |    s_a::DOUBLE / (n_a::DOUBLE * 10000.0) AS mua,
        |    s_b::DOUBLE / (n_b::DOUBLE * 10000.0) AS mub,
        |    s2_a::DOUBLE / (n_a::DOUBLE * 10000.0 * 10000.0) AS ra,
        |    s2_b::DOUBLE / (n_b::DOUBLE * 10000.0 * 10000.0) AS rb
        |  FROM ga JOIN gb ON ga.pos = gb.pos),
        |t AS (SELECT n_a, n_b,
        |    floor((mua - mub) * (mua - mub)
        |      * 1000000000000.0)::BIGINT AS tm,
        |    floor(abs((ra - mua * mua) - (rb - mub * mub))
        |      * 1000000000000.0)::BIGINT AS tv
        |  FROM e)
        |SELECT n_a, n_b, count(*)::BIGINT AS dim,
        |  floor(sum(tm)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS mmd2_q6,
        |  floor(sum(tv)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS vargap_q6
        |FROM t GROUP BY 1, 2""".stripMargin
  )
}
