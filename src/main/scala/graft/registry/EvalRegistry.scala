package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** eval-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object EvalRegistry extends Registry {

    // north-star: ROC AUC of a cosine scorer against binary labels —
    // tie-corrected Mann-Whitney rank-sum as exact num/den integers.
    // Scores quantize to a 4-dp grid first, so the one cumulative
    // window runs over a ≤20k-row domain, never the corpus.
  b.q(
    "eval_auc" -> ((s, dir) =>
      evals.aucRank(table(s, dir, "embeddings"),
        scoreQ4(col("embedding"), Q1), col("label") < 5))
  )
    // Tie-corrected rank-sum AUC over the 4-dp score grid; doubled
    // mid-ranks keep everything integer. All quantities non-negative, so
    // Spark DIV (truncate) == DuckDB // (floor).
  b.o(
    "eval_auc" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS np
         |  FROM sc GROUP BY 1),
         |c AS (SELECT s, n, np, coalesce(sum(n) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
         |  FROM g),
         |a AS (SELECT sum(np)::BIGINT AS n_pos, sum(n - np)::BIGINT AS n_neg,
         |  sum(np * (2 * below + n + 1))::BIGINT AS r2 FROM c)
         |SELECT n_pos, n_neg,
         |  (r2 - n_pos * (n_pos + 1))::BIGINT AS auc_num,
         |  (2 * n_pos * n_neg)::BIGINT AS auc_den,
         |  CASE WHEN n_pos * n_neg > 0 THEN
         |    ((r2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg))::BIGINT
         |  END AS auc_ppm
         |FROM a""".stripMargin
  )

    // north-star: operating-point sweep — exact confusion counts and
    // ppm precision/recall/F1 at a literal threshold grid; one scan,
    // map-side combine absorbs the ×|grid| fan-out.
  b.q(
    "eval_confusion" -> ((s, dir) =>
      evals.confusionGrid(table(s, dir, "embeddings"),
          scoreQ4(col("embedding"), Q1), col("label") < 5, EvalThresholds)
        .orderBy(col("threshold")))
  )
    // Literal-grid confusion sweep; predict positive iff s >= t.
  b.o(
    "eval_confusion" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |t AS (SELECT unnest([${EvalThresholds.mkString(", ")}]::BIGINT[]) AS threshold),
         |f AS (SELECT t.threshold, (sc.s >= t.threshold)::BIGINT AS p, sc.y
         |  FROM sc CROSS JOIN t),
         |g AS (SELECT threshold, sum(p * y)::BIGINT AS tp,
         |    sum(p * (1 - y))::BIGINT AS fp, sum((1 - p) * y)::BIGINT AS fn,
         |    sum((1 - p) * (1 - y))::BIGINT AS tn
         |  FROM f GROUP BY 1)
         |SELECT threshold, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN (tp * 1000000 // (tp + fp))::BIGINT END AS prec_ppm,
         |  CASE WHEN tp + fn > 0 THEN (tp * 1000000 // (tp + fn))::BIGINT END AS rec_ppm,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    (2 * tp * 1000000 // (2 * tp + fp + fn))::BIGINT END AS f1_ppm
         |FROM g ORDER BY threshold""".stripMargin
  )

    // north-star: NDCG@10 for two query vectors with graded relevance —
    // integer discount table shared driver-side with the oracle; both
    // the actual and ideal top-10 are WindowGroupLimit heap shapes.
  b.q(
    "eval_ndcg" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel2: Int, rel1: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          when(col("label") === rel2, 2L)
            .when(col("label") === rel1, 1L).otherwise(0L).as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.ndcgAtK(run(0L, Q1, 3, 7).unionAll(run(1L, Q2, 5, 1)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    })
  )
    // NDCG@10: the SAME driver-computed integer discount table as the
    // Spark plan (floor(1e6/log2(r+1)) literals), actual and ideal
    // rankings tie-broken by vec_id.
  b.o(
    "eval_ndcg" -> {
      val disc = evals.ndcgDiscounts(10).zipWithIndex
        .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
      s"""WITH d AS (SELECT * FROM (VALUES $disc) v(rnk, disc)),
         |r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id,
         |    (CASE WHEN label = 3 THEN 2 WHEN label = 7 THEN 1 ELSE 0 END)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id,
         |    (CASE WHEN label = 5 THEN 2 WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |dcg AS (SELECT qid, sum(rel * disc)::BIGINT AS dcg_q6
         |  FROM a JOIN d USING (rnk) WHERE rnk <= 10 GROUP BY 1),
         |i AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, vec_id) AS rnk FROM r0),
         |idcg AS (SELECT qid, sum(rel * disc)::BIGINT AS idcg_q6
         |  FROM i JOIN d USING (rnk) WHERE rnk <= 10 GROUP BY 1)
         |SELECT qid, dcg_q6, idcg_q6,
         |  CASE WHEN idcg_q6 > 0 THEN (dcg_q6 * 1000000 // idcg_q6)::BIGINT
         |  END AS ndcg_ppm
         |FROM dcg JOIN idcg USING (qid) ORDER BY qid""".stripMargin
    }
  )

    // north-star: log-loss + Brier of a linearly calibrated cosine
    // scorer — per-row terms quantize before summing, so both sums are
    // exact integers; clamped ppm probabilities keep ln finite.
  b.q(
    "eval_logloss" -> ((s, dir) => {
      val sq4 = scoreQ4(col("embedding"), Q1)
      evals.loglossBrier(table(s, dir, "embeddings"),
        (sq4 + lit(10000L)) * lit(50L), col("label") < 5)
    })
  )
    // Log-loss/Brier with clamped ppm probabilities; per-row floor
    // quantization before the sums keeps both totals exact integers.
  b.o(
    "eval_logloss" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |p AS (SELECT least(greatest((s + 10000) * 50, 1), 999999)::BIGINT AS p, y
         |  FROM sc),
         |r AS (SELECT y,
         |    floor(-ln((CASE WHEN y = 1 THEN p ELSE 1000000 - p END)::DOUBLE
         |      / 1000000.0) * 1000000.0)::BIGINT AS ll,
         |    ((p - y * 1000000) * (p - y * 1000000) // 1000000)::BIGINT AS br
         |  FROM p)
         |SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
         |  sum(ll)::BIGINT AS logloss_q6_sum, sum(br)::BIGINT AS brier_micro_sum,
         |  (sum(ll)::BIGINT // count(*))::BIGINT AS logloss_mean_q6,
         |  (sum(br)::BIGINT // count(*))::BIGINT AS brier_mean_micro
         |FROM r""".stripMargin
  )

    // north-star: reciprocal rank @10 per query — the first-relevant
    // position as an exact ppm; average downstream for MRR.
  b.q(
    "eval_mrr" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          (col("label") === rel).cast("long").as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.mrrAtK(run(0L, Q1, 3).unionAll(run(1L, Q2, 5)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    })
  )
    // First relevant rank within the top 10 under the same 4dp scorer.
  b.o(
    "eval_mrr" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id, (label = 3)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id, (label = 5)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |f AS (SELECT qid, min(CASE WHEN rel > 0 THEN rnk END)::BIGINT
         |    AS first_rank
         |  FROM a WHERE rnk <= 10 GROUP BY 1)
         |SELECT qid, first_rank,
         |  coalesce(1000000 // first_rank, 0)::BIGINT AS rr_ppm
         |FROM f ORDER BY qid""".stripMargin
  )

    // north-star: precision/recall @10 per query — exact ppm set
    // overlap; completes the rank-eval family (MRR, NDCG, AUC).
  b.q(
    "eval_pr_at_k" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          (col("label") === rel).cast("long").as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.precisionRecallAtK(run(0L, Q1, 3).unionAll(run(1L, Q2, 5)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    })
  )
    // Top-10 overlap counts under the same 4dp scorer and tie order.
  b.o(
    "eval_pr_at_k" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id, (label = 3)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id, (label = 5)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |g AS (SELECT qid, sum((rel > 0)::BIGINT)::BIGINT AS n_rel_total,
         |    sum(CASE WHEN rnk <= 10 AND rel > 0 THEN 1 ELSE 0 END)::BIGINT
         |      AS n_rel_topk
         |  FROM a GROUP BY 1)
         |SELECT qid, n_rel_total, n_rel_topk,
         |  (n_rel_topk * 1000000 // 10)::BIGINT AS p_at_k_ppm,
         |  (CASE WHEN n_rel_total > 0 THEN n_rel_topk * 1000000 // n_rel_total
         |   END)::BIGINT AS r_at_k_ppm
         |FROM g ORDER BY qid""".stripMargin
  )

    // north-star: generation evals — ROUGE-2 P/R/F1 over the lossy-
    // candidate fixture; clip counts are exact longs, quotients ppm.
  b.q(
    "eval_rouge2" -> ((s, dir) =>
      evals.ngramOverlap(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), n = 2)
        .orderBy(col("doc_id")))
  )
    // ROUGE-2 both directions: clipped bigram multiset intersection.
  b.o(
    "eval_rouge2" ->
      s"""WITH t AS ($SqlGenToks),
         |g AS (SELECT doc_id, ${sqlNgrams("ct", "2")} AS cg,
         |  ${sqlNgrams("rt", "2")} AS rg FROM t),
         |cc AS (SELECT doc_id, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, unnest(cg) AS g2 FROM g) GROUP BY 1, 2),
         |rc AS (SELECT doc_id, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, unnest(rg) AS g2 FROM g) GROUP BY 1, 2),
         |cl AS (SELECT cc.doc_id, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.gram = rc.gram
         |  GROUP BY 1),
         |z AS (SELECT g.doc_id, len(cg)::BIGINT AS cand_n,
         |  len(rg)::BIGINT AS ref_n, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id)
         |SELECT doc_id, cand_n, ref_n, clip,
         |  (CASE WHEN cand_n > 0 THEN clip * 1000000 // cand_n
         |   END)::BIGINT AS prec_ppm,
         |  (CASE WHEN ref_n > 0 THEN clip * 1000000 // ref_n
         |   END)::BIGINT AS rec_ppm,
         |  (CASE WHEN cand_n + ref_n > 0 THEN
         |    2 * clip * 1000000 // (cand_n + ref_n) END)::BIGINT AS f1_ppm
         |FROM z ORDER BY doc_id""".stripMargin
  )

    // north-star: ROUGE-L — in-order LCS F-measure, one compiled O(32²)
    // DP kernel per row, capped token prefixes on both sides, zero
    // shuffle; the oracle replays the DP as a recursive CTE.
  b.q(
    "eval_rouge_l" -> ((s, dir) =>
      evals.rougeL(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), maxToks = 32)
        .orderBy(col("doc_id")))
  )
    // ROUGE-L: the LCS DP replayed as a recursive CTE over the capped
    // token prefixes — row i is the full DP row after consuming ref
    // token i, via the prefix-max form dp[i][j] = max(dp[i-1][j],
    // max_{k<=j}(dp[i-1][k-1] + eq(c[k], r[i]))).
  b.o(
    "eval_rouge_l" ->
      s"""WITH RECURSIVE t AS ($SqlGenToks),
         |p AS (SELECT doc_id, list_slice(ct, 1, 32) AS c,
         |  list_slice(rt, 1, 32) AS r FROM t),
         |dp AS (
         |  SELECT doc_id, c, r, 0 AS i,
         |    list_transform(range(0, len(c) + 1), x -> 0::BIGINT) AS dpr
         |  FROM p
         |  UNION ALL
         |  SELECT doc_id, c, r, i + 1,
         |    list_transform(range(0, len(c) + 1), j ->
         |      CASE WHEN j = 0 THEN 0::BIGINT ELSE
         |        greatest(dpr[j + 1],
         |          list_max(list_transform(range(1, j + 1), k ->
         |            dpr[k] + (CASE WHEN c[k] = r[i + 1] THEN 1 ELSE 0
         |              END)::BIGINT)))
         |      END)
         |  FROM dp WHERE i < len(r)),
         |f AS (SELECT doc_id, dpr[len(c) + 1] AS lcs,
         |    len(c)::BIGINT AS m_cand, len(r)::BIGINT AS n_ref
         |  FROM dp WHERE i = len(r))
         |SELECT doc_id, lcs, m_cand, n_ref,
         |  (CASE WHEN m_cand + n_ref > 0 THEN
         |    (2 * lcs * 1000000) // (m_cand + n_ref) END)::BIGINT AS f_ppm
         |FROM f ORDER BY doc_id""".stripMargin
  )

    // north-star: token-level WER — the edit-distance DP kernel at word
    // grain (eval_edit is the char meter); capped prefixes, zero
    // shuffle; the oracle replays the DP via the prefix-min identity.
  b.q(
    "eval_wer" -> ((s, dir) =>
      evals.wer(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), maxToks = 32)
        .orderBy(col("doc_id")))
  )
    // Token-level WER: the Levenshtein DP replayed as a recursive CTE —
    // per ref token, the row update splits into vertical/diagonal
    // candidates then a prefix-min with unit horizontal cost
    // (D[i][j] = min_{k<=j}(tmp[k] + j - k), exact by the
    // one-insertion-per-step identity).
  b.o(
    "eval_wer" ->
      s"""WITH RECURSIVE t AS ($SqlGenToks),
         |p AS (SELECT doc_id, list_slice(ct, 1, 32) AS c,
         |  list_slice(rt, 1, 32) AS r FROM t),
         |dp AS (
         |  SELECT doc_id, c, r, 0 AS i,
         |    list_transform(range(0, len(c) + 1), x -> x::BIGINT) AS dpr
         |  FROM p
         |  UNION ALL
         |  SELECT doc_id, c, r, i + 1,
         |    list_transform(range(0, len(c) + 1), j ->
         |      list_min(list_transform(range(0, j + 1), k ->
         |        (CASE WHEN k = 0 THEN (i + 1)::BIGINT
         |         ELSE least(dpr[k + 1] + 1, dpr[k] +
         |           (CASE WHEN c[k] = r[i + 1] THEN 0 ELSE 1 END)::BIGINT)
         |         END) + (j - k))))
         |  FROM dp WHERE i < len(r)),
         |f AS (SELECT doc_id, dpr[len(c) + 1] AS dist,
         |    len(c)::BIGINT AS m_cand, len(r)::BIGINT AS n_ref
         |  FROM dp WHERE i = len(r))
         |SELECT doc_id, dist, m_cand, n_ref,
         |  (CASE WHEN n_ref > 0 THEN (dist * 1000000) // n_ref
         |   END)::BIGINT AS wer_ppm
         |FROM f ORDER BY doc_id""".stripMargin
  )

    // north-star: segment BLEU-4, surfaced in LOG space (exp() is a
    // libm call whose last ulp is not portable across engines; gate in
    // log space, the lmQualityFilter precedent). Per-n ln terms are
    // 1e-6-quantized longs, the BP term an exact rational.
  b.q(
    "eval_bleu" -> ((s, dir) =>
      evals.bleu(genPairs(s, dir), col("doc_id"), col("cand"), col("ref"),
          maxN = 4)
        .orderBy(col("doc_id")))
  )
    // BLEU-4 in log space: per-n clipped precision (add-one smoothing
    // for n >= 2, unsmoothed p1 -> NULL on zero overlap), ln terms
    // quantized to 1e-6 longs per term, exact-rational brevity penalty.
    // max(CASE ...) pivots keep the NULL-propagating + (DuckDB's sum()
    // would IGNORE a NULL n=1 term; Spark's reduce(+) propagates it).
  b.o(
    "eval_bleu" -> {
      val pv = (1 to 4).map(n =>
        s"max(CASE WHEN n = $n THEN clip END)::BIGINT AS clip_$n,\n" +
          s"  max(CASE WHEN n = $n THEN tot END)::BIGINT AS tot_$n")
        .mkString(",\n  ")
      val q1 = "(CASE WHEN clip_1 > 0 AND tot_1 > 0 THEN " +
        "floor(ln(clip_1::DOUBLE / tot_1::DOUBLE) * 1000000.0)::BIGINT END)"
      val qRest = (2 to 4).map(n =>
        s"floor(ln((clip_$n + 1)::DOUBLE / (tot_$n + 1)::DOUBLE) " +
          "* 1000000.0)::BIGINT").mkString(" + ")
      val pCols = (1 to 4).map(n =>
        s"(CASE WHEN tot_$n > 0 THEN clip_$n * 1000000 // tot_$n " +
          s"END)::BIGINT AS p${n}_ppm").mkString(",\n  ")
      s"""WITH t AS ($SqlGenToks),
         |lens AS (SELECT doc_id, len(ct)::BIGINT AS cand_len,
         |  len(rt)::BIGINT AS ref_len FROM t),
         |g AS (SELECT doc_id, n, ${sqlNgrams("ct", "n")} AS cg,
         |  ${sqlNgrams("rt", "n")} AS rg
         |  FROM t CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n)),
         |cc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |rc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |cl AS (SELECT cc.doc_id, cc.n, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n
         |    AND cc.gram = rc.gram GROUP BY 1, 2),
         |pn AS (SELECT g.doc_id, g.n, len(g.cg)::BIGINT AS tot,
         |  coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.n = cl.n),
         |pv AS (SELECT doc_id,
         |  $pv
         |  FROM pn GROUP BY 1),
         |q AS (SELECT doc_id, tot_1, clip_1, tot_2, clip_2, tot_3, clip_3,
         |  tot_4, clip_4, $q1 + $qRest AS qsum FROM pv)
         |SELECT l.doc_id, l.cand_len, l.ref_len,
         |  $pCols,
         |  CASE WHEN l.cand_len > 0 THEN
         |    floor((qsum::DOUBLE / 4000000.0 + least(0.0,
         |      1.0 - l.ref_len::DOUBLE / l.cand_len::DOUBLE))
         |      * 10000.0 + 0.5) / 10000.0 END AS logbleu
         |FROM lens l LEFT JOIN q ON l.doc_id = q.doc_id
         |ORDER BY l.doc_id""".stripMargin
    }
  )

    // north-star: chrF (character 1..4-gram F-2) — the tokenizer-free
    // generation meter; same clipped-overlap machinery at char grain.
  b.q(
    "eval_chrf" -> ((s, dir) =>
      evals.chrF(genPairs(s, dir), col("doc_id"), col("cand"), col("ref"),
          maxN = 4, beta = 2)
        .orderBy(col("doc_id")))
  )
    // chrF: char 1..4-gram clipped P/R averaged over n (all orders must
    // exist), F-2 combined with the floor-form 4dp quantization.
  b.o(
    "eval_chrf" -> {
      def cgrams(l: String) =
        s"CASE WHEN length($l) >= n THEN list_transform(" +
          s"range(1, length($l)-n+2), i -> $l[i:i+n-1]) " +
          s"ELSE []::VARCHAR[] END"
      s"""WITH t AS ($SqlGenToks),
         |s AS (SELECT doc_id, array_to_string(ct, '') AS cs,
         |  array_to_string(rt, '') AS rr FROM t),
         |g AS (SELECT doc_id, n, ${cgrams("cs")} AS cg,
         |  ${cgrams("rr")} AS rg
         |  FROM s CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n)),
         |cc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |rc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |cl AS (SELECT cc.doc_id, cc.n, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n
         |    AND cc.gram = rc.gram GROUP BY 1, 2),
         |pn AS (SELECT g.doc_id, g.n, len(g.cg)::BIGINT AS tot_c,
         |  len(g.rg)::BIGINT AS tot_r, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.n = cl.n),
         |pr AS (SELECT doc_id,
         |  CASE WHEN tot_c > 0 THEN clip * 1000000 // tot_c END AS p_n,
         |  CASE WHEN tot_r > 0 THEN clip * 1000000 // tot_r END AS r_n
         |  FROM pn),
         |a AS (SELECT doc_id, sum(p_n)::BIGINT AS ps, count(p_n) AS pc,
         |  sum(r_n)::BIGINT AS rsum, count(r_n) AS rcnt FROM pr GROUP BY 1),
         |f AS (SELECT doc_id,
         |  (CASE WHEN pc = 4 THEN ps // 4 END)::BIGINT AS chrp_ppm,
         |  (CASE WHEN rcnt = 4 THEN rsum // 4 END)::BIGINT AS chrr_ppm
         |  FROM a)
         |SELECT doc_id, chrp_ppm, chrr_ppm,
         |  CASE WHEN chrp_ppm + chrr_ppm > 0 THEN
         |    floor(5.0 * chrp_ppm * chrr_ppm / (4 * chrp_ppm + chrr_ppm)
         |      / 100.0 + 0.5) / 10000.0 END AS chrf
         |FROM f ORDER BY doc_id""".stripMargin
    }
  )

    // north-star: edit similarity on the ASCII projection — DuckDB's
    // levenshtein is BYTE-based while Spark's is char-based; stripping
    // non-ASCII makes byte == char so the engines agree exactly.
  b.q(
    "eval_edit" -> ((s, dir) => {
      val ascii = (c: Column) => regexp_replace(c, "[^ -~]", "")
      genPairs(s, dir)
        // levenshtein is O(|c|·|r|) PER ROW — the corpus scan's natural
        // splits carry the parallelism at scale, but this small fixture
        // reads as one file split, so spread the CPU-heavy rows by pair
        // id (a keyed exchange of ~300-byte rows, negligible vs the
        // quadratic row cost it parallelizes). The EXPLICIT partition
        // count matters: byte-sized AQE coalescing would merge the tiny
        // shuffle back into one CPU-bound task.
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), ascii(col("cand")).as("_c"),
          ascii(col("ref")).as("_r"))
        .select(col("doc_id"),
          levenshtein(col("_c"), col("_r")).cast("long").as("dist"),
          greatest(length(col("_c")), length(col("_r"))).cast("long")
            .as("_m"))
        .select(col("doc_id"), col("dist"),
          when(col("_m") > 0L, expr("((_m - dist) * 1000000L) DIV _m"))
            .as("sim_ppm"))
        .orderBy(col("doc_id"))
    })
  )
    // Levenshtein on the ASCII projection (byte == char both engines).
  b.o(
    "eval_edit" ->
      s"""WITH t AS ($SqlGenToks),
         |p AS (SELECT doc_id,
         |  regexp_replace(array_to_string(ct, ' '), '[^ -~]', '', 'g') AS c,
         |  regexp_replace(array_to_string(rt, ' '), '[^ -~]', '', 'g') AS r
         |  FROM t),
         |d AS (SELECT doc_id, levenshtein(c, r)::BIGINT AS dist,
         |  greatest(length(c), length(r))::BIGINT AS m FROM p)
         |SELECT doc_id, dist,
         |  (CASE WHEN m > 0 THEN (m - dist) * 1000000 // m
         |   END)::BIGINT AS sim_ppm
         |FROM d ORDER BY doc_id""".stripMargin
  )

    // north-star: reliability diagram of the linearly calibrated cosine
    // scorer (the eval_logloss fixture) — per-bin exact counts and the
    // |acc − conf| gap numerator; the whole grid is one hash aggregate.
  b.q(
    "eval_reliability" -> ((s, dir) =>
      evals.reliability(table(s, dir, "embeddings"),
          (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
          col("label") < 5, bins = 10)
        .orderBy(col("bin")))
  )
    // Calibration grid over the eval_logloss scorer fixture.
  b.o(
    "eval_reliability" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |b AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin, p, y
         |  FROM sc),
         |g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |  sum(p)::BIGINT AS conf_sum FROM b GROUP BY 1)
         |SELECT bin, n, pos, conf_sum,
         |  (pos * 1000000 // n)::BIGINT AS acc_ppm,
         |  (conf_sum // n)::BIGINT AS conf_ppm,
         |  abs(pos * 1000000 - conf_sum)::BIGINT AS gap_abs
         |FROM g ORDER BY bin""".stripMargin
  )

    // north-star: expected + max calibration error — exact-integer ECE
    // (bin weights cancel against per-bin denominators, so no float).
  b.q(
    "eval_ece" -> ((s, dir) =>
      evals.ece(table(s, dir, "embeddings"),
        (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
        col("label") < 5, bins = 10))
  )
    // ECE/MCE: bin weights cancel -> one exact quotient each.
  b.o(
    "eval_ece" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |b AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin, p, y
         |  FROM sc),
         |g AS (SELECT bin, count(*)::BIGINT AS n,
         |  abs(sum(y) * 1000000 - sum(p))::BIGINT AS gap_abs FROM b GROUP BY 1)
         |SELECT sum(n)::BIGINT AS n_total,
         |  (sum(gap_abs) // sum(n))::BIGINT AS ece_ppm,
         |  max(gap_abs // n)::BIGINT AS mce_ppm
         |FROM g""".stripMargin
  )

    // north-star: isotonic calibration fit — the PAV solution via its
    // minimax characterization over a 2-dp score grid; two window
    // passes over the bounded pair grid, monotone by construction.
  b.q(
    "eval_isotonic" -> ((s, dir) =>
      evals.isotonicFit(
        table(s, dir, "embeddings")
          .where(col("embedding").isNotNull && col("label").isNotNull),
        // floor-division to a 2-dp grid on BOTH engines (DIV truncates
        // toward zero on negatives; floor of the double quotient is
        // exact here and floors identically)
        floor(scoreQ4(col("embedding"), Q1) / lit(100.0)).cast("long"),
        col("label") < 5, maxGrid = 512)
        .orderBy(col("s")))
  )
    // Isotonic fit: the same minimax double chain — exact prefix sums,
    // one IEEE division per (i, k) pool, suffix-min/prefix-max windows
    // over the bounded pair grid, 6-dp quantize.
  b.o(
    "eval_isotonic" ->
      s"""WITH sc AS (SELECT floor((${sqlScoreQ4(Q1)}) / 100.0)::BIGINT AS s,
         |    (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
         |  FROM sc GROUP BY 1),
         |gg AS (SELECT s, n, p,
         |    row_number() OVER (ORDER BY s) AS j,
         |    sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
         |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cn
         |  FROM g),
         |pr AS (SELECT i.j AS i, k.j AS k,
         |    (k.cp - (i.cp - i.p))::DOUBLE / (k.cn - (i.cn - i.n))::DOUBLE AS r
         |  FROM gg i JOIN gg k ON k.j >= i.j),
         |m AS (SELECT i, k, min(r) OVER (PARTITION BY i ORDER BY k DESC
         |    ROWS UNBOUNDED PRECEDING) AS mm FROM pr),
         |f AS (SELECT i, k, max(mm) OVER (PARTITION BY k ORDER BY i
         |    ROWS UNBOUNDED PRECEDING) AS ff FROM m),
         |sel AS (SELECT k AS j, ff FROM f WHERE i = k)
         |SELECT gg.s, gg.n, gg.p AS pos,
         |  floor(ff * 1000000.0 + 0.5) / 1000000.0 AS fit_q6
         |FROM sel JOIN gg USING (j) ORDER BY gg.s""".stripMargin
  )

    // north-star: isotonic APPLY — the fit→apply loop closed. The curve
    // fits on the 2-dp grid, rescales its grid ×100 to q4 units, then
    // broadcast-applies as a step-function lookup onto the RAW 4-dp
    // scores (which genuinely fall BETWEEN grid points), folded to one
    // row per fitted value. One 1-row broadcast; corpus rows never
    // shuffle before the thin final fold.
  b.q(
    "eval_isotonic_apply" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
      val curve = evals.isotonicFit(e,
        floor(scoreQ4(col("embedding"), Q1) / lit(100.0)).cast("long"),
        col("label") < 5, maxGrid = 512)
        .select((col("s") * 100L).as("s"), col("fit_q6"))
      evals.isotonicApply(e.select(scoreQ4(col("embedding"), Q1).as("sq4")),
          curve, col("sq4"))
        .groupBy(col("calibrated_q6"))
        .agg(count(lit(1)).as("n"), min(col("sq4")).as("s_min"),
          max(col("sq4")).as("s_max"))
        .orderBy(col("calibrated_q6"))
    })
  )
    // Isotonic apply: the same fit chain, grid rescaled x100 to q4
    // units, step-lookup via DuckDB's native ASOF LEFT JOIN (greatest
    // curve s <= raw score; below-grid scores clamp to the first fit
    // value — the documented isotonicApply contract), folded per
    // fitted value.
  b.o(
    "eval_isotonic_apply" ->
      s"""WITH sc AS (SELECT floor((${sqlScoreQ4(Q1)}) / 100.0)::BIGINT AS s,
         |    (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
         |  FROM sc GROUP BY 1),
         |gg AS (SELECT s, n, p,
         |    row_number() OVER (ORDER BY s) AS j,
         |    sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
         |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cn
         |  FROM g),
         |pr AS (SELECT i.j AS i, k.j AS k,
         |    (k.cp - (i.cp - i.p))::DOUBLE / (k.cn - (i.cn - i.n))::DOUBLE AS r
         |  FROM gg i JOIN gg k ON k.j >= i.j),
         |m AS (SELECT i, k, min(r) OVER (PARTITION BY i ORDER BY k DESC
         |    ROWS UNBOUNDED PRECEDING) AS mm FROM pr),
         |f AS (SELECT i, k, max(mm) OVER (PARTITION BY k ORDER BY i
         |    ROWS UNBOUNDED PRECEDING) AS ff FROM m),
         |curve AS (SELECT gg.s * 100 AS s,
         |    floor(ff * 1000000.0 + 0.5) / 1000000.0 AS fit_q6
         |  FROM f JOIN gg ON f.k = gg.j WHERE f.i = f.k),
         |raw AS (SELECT ${sqlScoreQ4(Q1)} AS sq4
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |ap AS (SELECT sq4, coalesce(fit_q6,
         |    (SELECT fit_q6 FROM curve ORDER BY s LIMIT 1)) AS fit_q6
         |  FROM raw ASOF LEFT JOIN curve ON raw.sq4 >= curve.s)
         |SELECT fit_q6 AS calibrated_q6, count(*)::BIGINT AS n,
         |  min(sq4)::BIGINT AS s_min, max(sq4)::BIGINT AS s_max
         |FROM ap GROUP BY 1 ORDER BY 1""".stripMargin
  )

    // north-star: Poisson-bootstrap CI on the mean score — the
    // data-card uncertainty band; one md5 per row stretched to 200
    // replicates by the affine family, integer Poisson weights,
    // order-statistic band over the replicate means.
  b.q(
    "eval_bootstrap_ci" -> ((s, dir) =>
      evals.bootstrapCI(
        table(s, dir, "embeddings").where(col("embedding").isNotNull),
        col("vec_id"), scoreQ4(col("embedding"), Q1), b = 200))
  )
    // Bootstrap CI: same md5+affine uniforms, same Poisson threshold
    // table, same conservative-outward percentile indices.
  b.o(
    "eval_bootstrap_ci" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT vec_id, ${sqlScoreQ4(Q1)} AS x, $h AS h
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v),
         |r AS (SELECT j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT mean_q6 FROM p) AS mean_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |FROM o""".stripMargin
    }
  )

    // north-star: stratified bootstrap card — per-language mean doc
    // length, each stratum with its own uncertainty band; everything
    // after the scan is groups x b sized.
  b.q(
    "eval_bootstrap_by_lang" -> ((s, dir) =>
      evals.bootstrapCIBy(
          table(s, dir, "documents").where(col("lang").isNotNull),
          Seq("lang"), col("doc_id"), col("n_chars"), b = 100)
        .orderBy(col("lang")))
  )
    // Grouped bootstrap: the same chain with (lang, replicate) keys and
    // per-lang order statistics.
  b.o(
    "eval_bootstrap_by_lang" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(doc_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT lang, n_chars::BIGINT AS x, $h AS h
         |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT lang, count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v GROUP BY lang),
         |r AS (SELECT lang, j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT lang, x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 100)) AS rr(j))
         |  GROUP BY lang, j),
         |m AS (SELECT lang, j,
         |  floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT lang, mq,
         |  row_number() OVER (PARTITION BY lang ORDER BY mq, j) AS rn,
         |  count(*) OVER (PARTITION BY lang) AS mm FROM m),
         |bd AS (SELECT lang, count(*)::BIGINT AS b_reps,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |  FROM o GROUP BY lang)
         |SELECT p.lang, n_rows, b_reps, mean_q6, lo_q6, hi_q6
         |FROM p JOIN bd USING (lang) ORDER BY p.lang""".stripMargin
    }
  )

    // north-star: CLUSTER bootstrap — resample SOURCES, not rows (every
    // row of a source draws the same weights), the honest CI when docs
    // within a source are correlated; compare against
    // eval_bootstrap_ci's row-level band.
  b.q(
    "eval_bootstrap_clustered" -> ((s, dir) =>
      evals.bootstrapCI(
        table(s, dir, "documents")
          .where(col("source").isNotNull && col("n_chars").isNotNull),
        col("source"), col("n_chars"), b = 200))
  )
    // Cluster bootstrap: the row chain with the SOURCE as the hash key
    // (cluster-constant weights).
  b.o(
    "eval_bootstrap_clustered" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(source::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT n_chars::BIGINT AS x, $h AS h
         |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v),
         |r AS (SELECT j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT mean_q6 FROM p) AS mean_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |FROM o""".stripMargin
    }
  )

    // north-star: bootstrap CI for a RATIO OF SUMS (chars per token by
    // language) — the data-card shape the mean can't express; same
    // md5+affine weights, both sums reweighted together, zero-denominator
    // replicates dropped.
  b.q(
    "eval_bootstrap_ratio" -> ((s, dir) =>
      evals.bootstrapRatioCIBy(
          table(s, dir, "documents").where(col("lang").isNotNull),
          Seq("lang"), col("doc_id"),
          col("n_chars"), text.tokenCount(col("text")), b = 100)
        .orderBy(col("lang")))
  )
    // Paired bootstrap: same uniforms/weights as eval_bootstrap_ci,
    // Ratio-of-sums bootstrap: the by-lang chain with BOTH sums
    // reweighted by the same integer Poisson draws; zero-denominator
    // replicates dropped before the order statistic.
  b.o(
    "eval_bootstrap_ratio" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(doc_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT lang, n_chars::BIGINT AS x,
         |    len($SqlToks)::BIGINT AS d, $h AS h
         |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT lang, count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / sum(d)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS ratio_q6 FROM v GROUP BY lang),
         |r AS (SELECT lang, j, sum(w * x)::BIGINT AS swx,
         |    sum(w * d)::BIGINT AS swd
         |  FROM (SELECT lang, x, d, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 100)) AS rr(j))
         |  GROUP BY lang, j),
         |m AS (SELECT lang, j,
         |  floor(swx::DOUBLE / swd::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE swd > 0),
         |o AS (SELECT lang, mq,
         |  row_number() OVER (PARTITION BY lang ORDER BY mq, j) AS rn,
         |  count(*) OVER (PARTITION BY lang) AS mm FROM m),
         |bd AS (SELECT lang, count(*)::BIGINT AS b_reps,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |  FROM o GROUP BY lang)
         |SELECT p.lang, n_rows, b_reps, ratio_q6, lo_q6, hi_q6
         |FROM p JOIN bd USING (lang) ORDER BY p.lang""".stripMargin
    }
  )

    // north-star: paired bootstrap A-vs-B — is the Q1-vs-Q2 score
    // difference real; same resamples hit both systems (the pairing),
    // band + replicate win rate.
  b.q(
    "eval_paired_bootstrap" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("embedding").isNotNull)
      evals.pairedBootstrap(e, col("vec_id"),
        scoreQ4(col("embedding"), Q1), scoreQ4(col("embedding"), Q2),
        b = 200)
    })
  )
    // applied to the per-row difference; win rate over replicates.
  b.o(
    "eval_paired_bootstrap" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT vec_id,
         |    (${sqlScoreQ4(Q1)}) - (${sqlScoreQ4(Q2)}) AS d, $h AS h
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(d)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS diff_q6 FROM v),
         |r AS (SELECT j, sum(w * d)::BIGINT AS swd, sum(w)::BIGINT AS sw
         |  FROM (SELECT d, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swd::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT diff_q6 FROM p) AS diff_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6,
         |  (sum(CASE WHEN mq > 0 THEN 1 ELSE 0 END) * 1000000
         |    // count(*))::BIGINT AS win_ppm
         |FROM o""".stripMargin
    }
  )

    // north-star: Murphy decomposition of the Brier score — REL/RES/UNC
    // from the same reliability grid, quantized-estimator form in
    // DECIMAL(38); the why-is-my-Brier-bad companion to eval_ece.
  b.q(
    "eval_brier_decomp" -> ((s, dir) =>
      evals.brierDecomp(table(s, dir, "embeddings"),
        (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
        col("label") < 5, bins = 10))
  )
    // Murphy decomposition off the same grid: truncated per-bin ppm
    // quotients, HUGEINT weighted squared gaps, one DIV by N each.
  b.o(
    "eval_brier_decomp" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin,
         |    count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |    sum(p)::BIGINT AS cs
         |  FROM sc GROUP BY 1),
         |t AS (SELECT sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS pt FROM g),
         |yb AS (SELECT nt, pt, ((pt * 1000000) // nt)::BIGINT AS ybar FROM t),
         |a AS (SELECT nt, pt, ybar,
         |    sum(n::HUGEINT * ((cs // n) - ((pos * 1000000) // n))
         |      * ((cs // n) - ((pos * 1000000) // n))) AS rel,
         |    sum(n::HUGEINT * (((pos * 1000000) // n) - ybar)
         |      * (((pos * 1000000) // n) - ybar)) AS res
         |  FROM g, yb GROUP BY 1, 2, 3)
         |SELECT nt AS n, pt AS pos, ybar AS ybar_ppm,
         |  (rel // nt)::BIGINT AS rel_q12, (res // nt)::BIGINT AS res_q12,
         |  (ybar * (1000000 - ybar))::BIGINT AS unc_q12
         |FROM a""".stripMargin
  )

    // north-star: exact Spearman rank agreement between two scorers
    // (Q1 vs Q2 cosine) — doubled mid-ranks from bounded value grids,
    // one IEEE sqrt chain for rho.
  b.q(
    "eval_spearman" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.spearman(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    })
  )
    // Doubled mid-ranks from value grids; rank sums are n(n+1) exactly.
  b.o(
    "eval_spearman" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS x, ${sqlScoreQ4(Q2)} AS y
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |gx AS (SELECT x AS v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1),
         |cx AS (SELECT v, (2 * coalesce(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1)::BIGINT AS r FROM gx),
         |gy AS (SELECT y AS v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1),
         |cy AS (SELECT v, (2 * coalesce(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1)::BIGINT AS r FROM gy),
         |j AS (SELECT cx.r AS rx, cy.r AS ry FROM sc
         |  JOIN cx ON sc.x = cx.v JOIN cy ON sc.y = cy.v),
         |a AS (SELECT count(*)::BIGINT AS n, sum(rx * ry)::BIGINT AS sxy,
         |  sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy FROM j),
         |f AS (SELECT n,
         |  (n * sxy - n * (n + 1) * n * (n + 1))::BIGINT AS num,
         |  (n * sxx - n * (n + 1) * n * (n + 1))::BIGINT AS den_x,
         |  (n * syy - n * (n + 1) * n * (n + 1))::BIGINT AS den_y FROM a)
         |SELECT n, num, den_x, den_y,
         |  CASE WHEN den_x > 0 AND den_y > 0 THEN
         |    floor(num::DOUBLE / sqrt(den_x::DOUBLE) / sqrt(den_y::DOUBLE)
         |      * 10000.0 + 0.5) / 10000.0 END AS rho
         |FROM f""".stripMargin
  )

    // north-star: Kendall tau-b between the same two scorers — exact
    // concordant/discordant masses over the joint value grid (cell
    // pairs, never row pairs), in-plan grid guard.
  b.q(
    "eval_kendall" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.kendallTau(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    })
  )
    // Exact C/D masses over the joint grid's cell pairs; tie terms from
    // the marginals; spearman's division chain at the readout.
  b.o(
    "eval_kendall" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS x, ${sqlScoreQ4(Q2)} AS y
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT x, y, count(*)::BIGINT AS c FROM sc GROUP BY 1, 2),
         |cd AS (SELECT
         |    coalesce(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END),
         |      0)::BIGINT AS conc,
         |    coalesce(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END),
         |      0)::BIGINT AS disc
         |  FROM g a JOIN g b ON a.x < b.x),
         |tx AS (SELECT (coalesce(sum(t * (t - 1)), 0) // 2)::BIGINT AS tie_x
         |  FROM (SELECT count(*)::BIGINT AS t FROM sc GROUP BY x)),
         |ty AS (SELECT (coalesce(sum(t * (t - 1)), 0) // 2)::BIGINT AS tie_y
         |  FROM (SELECT count(*)::BIGINT AS t FROM sc GROUP BY y)),
         |m AS (SELECT count(*)::BIGINT AS n,
         |  ((count(*) * (count(*) - 1)) // 2)::BIGINT AS n0 FROM sc)
         |SELECT n, conc, disc, tie_x, tie_y,
         |  CASE WHEN n0 > tie_x AND n0 > tie_y THEN
         |    floor((conc - disc)::DOUBLE / sqrt((n0 - tie_x)::DOUBLE)
         |      / sqrt((n0 - tie_y)::DOUBLE) * 10000.0 + 0.5) / 10000.0
         |  END AS tau_q4
         |FROM m, tx, ty, cd""".stripMargin
  )

    // north-star: corpus distinct-n generation-diversity read-out.
  b.q(
    "eval_distinct_n" -> ((s, dir) =>
      evals.distinctNgrams(table(s, dir, "documents"), col("text"),
          Seq(1, 2))
        .orderBy(col("n")))
  )
    // Corpus distinct-n diversity: exact distinct over total grams.
  b.o(
    "eval_distinct_n" ->
      s"""WITH t AS (SELECT $SqlToks AS toks FROM documents),
         |g1 AS (SELECT unnest(${sqlNgrams("toks", "1")}) AS g FROM t),
         |a1 AS (SELECT 1::BIGINT AS n, count(*)::BIGINT AS total,
         |  count(DISTINCT g)::BIGINT AS uniq FROM g1),
         |g2 AS (SELECT unnest(${sqlNgrams("toks", "2")}) AS g FROM t),
         |a2 AS (SELECT 2::BIGINT AS n, count(*)::BIGINT AS total,
         |  count(DISTINCT g)::BIGINT AS uniq FROM g2),
         |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
         |SELECT n, total, uniq,
         |  (CASE WHEN total > 0 THEN uniq * 1000000 // total
         |   END)::BIGINT AS distinct_ppm
         |FROM u ORDER BY n""".stripMargin
  )

    // north-star: preference win rate — does scorer Q1 beat Q2 per
    // item, exact counts + ppm conventions (tie-aware and not).
  b.q(
    "eval_winrate" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.winRate(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    })
  )
    // Exact win/tie/loss between the two fixed scorers.
  b.o(
    "eval_winrate" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS a, ${sqlScoreQ4(Q2)} AS b
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT count(*)::BIGINT AS n,
         |  sum((a > b)::BIGINT)::BIGINT AS wins,
         |  sum((a = b)::BIGINT)::BIGINT AS ties,
         |  sum((a < b)::BIGINT)::BIGINT AS losses FROM sc)
         |SELECT n, wins, ties, losses,
         |  (CASE WHEN n > 0 THEN wins * 1000000 // n END)::BIGINT AS win_ppm,
         |  (CASE WHEN n > 0 THEN (2 * wins + ties) * 1000000 // (2 * n)
         |   END)::BIGINT AS win_tie_ppm
         |FROM g""".stripMargin
  )

    // north-star: BERTScore-style embedding F1 — greedy max-cosine
    // matching over the 4x16 sliced token layout (the maxSim lattice);
    // ref side = the reversed embedding (deterministic, row-local,
    // related-but-not-identical). Zero shuffle; F1 is one exact
    // positive integer DIV, no float combine at all.
  b.q(
    "eval_embed_f1" -> ((s, dir) =>
      evals.embedF1(table(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), reverse(col("embedding")),
          nTokens = 4, dim = 16)
        .orderBy(col("vec_id")))
  )
    // BERTScore-style embed F1: the 4x16 token lattice unrolled — 16
    // quantized cosines, greedy row/col maxima, one positive integer
    // DIV for F1. The * chain mirrors Spark's left-assoc
    // dot*invA*invB*1e4 exactly.
  b.o(
    "eval_embed_f1" -> {
      def sl(e: String, k: Int) =
        s"list_slice($e, ${k * 16 + 1}, ${k * 16 + 16})"
      val slices = (0 until 4).map(i => s"${sl(E, i)} AS c$i") ++
        (0 until 4).map(j => s"${sl(s"list_reverse($E)", j)} AS r$j")
      def inv(c: String) =
        s"(CASE WHEN list_dot_product($c, $c) > 0 THEN " +
          s"1.0/sqrt(list_dot_product($c, $c)) ELSE 0.0 END)"
      val invs = (0 until 4).map(i => s"${inv(s"c$i")} AS ic$i") ++
        (0 until 4).map(j => s"${inv(s"r$j")} AS ir$j")
      val coss = (for { i <- 0 until 4; j <- 0 until 4 } yield
        s"floor(list_dot_product(c$i, r$j) * ic$i * ir$j * 10000.0 + 0.5)" +
          s"::BIGINT AS s${i}_$j").mkString(",\n|  ")
      val pTerms = (0 until 4)
        .map(i => "greatest(" + (0 until 4).map(j => s"s${i}_$j").mkString(", ") + ")")
        .mkString(" + ")
      val rTerms = (0 until 4)
        .map(j => "greatest(" + (0 until 4).map(i => s"s${i}_$j").mkString(", ") + ")")
        .mkString(" + ")
      s"""WITH s0 AS (SELECT vec_id, ${slices.mkString(",\n|  ")}
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |s1 AS (SELECT vec_id, c0, c1, c2, c3, r0, r1, r2, r3,
         |  ${invs.mkString(",\n|  ")} FROM s0),
         |sc AS (SELECT vec_id,
         |  $coss FROM s1),
         |p AS (SELECT vec_id, ($pTerms)::BIGINT AS p_sum_q4,
         |  ($rTerms)::BIGINT AS r_sum_q4 FROM sc)
         |SELECT vec_id, p_sum_q4, r_sum_q4,
         |  (CASE WHEN p_sum_q4 > 0 AND r_sum_q4 > 0 THEN
         |    (2 * p_sum_q4 * r_sum_q4) // (4 * (p_sum_q4 + r_sum_q4))
         |   END)::BIGINT AS f1_q4
         |FROM p ORDER BY vec_id""".stripMargin
    }
  )

    // north-star: self-BLEU corpus diversity — each generation scored as
    // a BLEU-2 candidate against 3 cyclic-successor generations (capped
    // fan-out, never all-pairs); high self-BLEU = the model repeats
    // itself. Unsmoothed p1 leaves zero-overlap pairs unscored
    // (n_scored < n_opp reads the miss).
  b.q(
    "eval_self_bleu" -> ((s, dir) =>
      evals.selfBleu(genPairs(s, dir), col("doc_id"), col("cand"),
          opponents = 3, maxN = 2)
        .orderBy(col("doc_id")))
  )
    // Self-BLEU-2 vs 3 cyclic-successor opponents: the eval_bleu oracle
    // machinery per (doc, opp) pair — max(CASE) pivot + NULL-propagating
    // + for the unsmoothed p1 term — then per-doc skip-NULL aggregation
    // (both engines' sum() skip, intentionally: n_scored reads the drop).
  b.o(
    "eval_self_bleu" ->
      s"""WITH t AS ($SqlGenToks),
         |d AS (SELECT doc_id, ct FROM t),
         |b AS (SELECT min(doc_id) AS lo, count(*) AS n FROM d),
         |f AS (SELECT d.doc_id, ((d.doc_id - b.lo + j.j) % b.n) + b.lo AS opp
         |  FROM d CROSS JOIN b CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
         |  WHERE j.j < b.n),
         |p AS (SELECT f.doc_id, f.opp, a.ct AS cl, o.ct AS rl
         |  FROM f JOIN d a ON f.doc_id = a.doc_id JOIN d o ON f.opp = o.doc_id),
         |g AS (SELECT doc_id, opp, n, ${sqlNgrams("cl", "n")} AS cg,
         |  ${sqlNgrams("rl", "n")} AS rg
         |  FROM p CROSS JOIN (SELECT unnest([1, 2]) AS n)),
         |cc AS (SELECT doc_id, opp, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, opp, n, unnest(cg) AS g2 FROM g)
         |  GROUP BY 1, 2, 3, 4),
         |rc AS (SELECT doc_id, opp, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, opp, n, unnest(rg) AS g2 FROM g)
         |  GROUP BY 1, 2, 3, 4),
         |cl AS (SELECT cc.doc_id, cc.opp, cc.n,
         |  sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.opp = rc.opp
         |    AND cc.n = rc.n AND cc.gram = rc.gram GROUP BY 1, 2, 3),
         |pn AS (SELECT g.doc_id, g.opp, g.n, len(g.cg)::BIGINT AS tot,
         |  len(g.rg)::BIGINT AS rtot, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.opp = cl.opp
         |    AND g.n = cl.n),
         |pv AS (SELECT doc_id, opp,
         |  max(CASE WHEN n = 1 THEN clip END)::BIGINT AS clip_1,
         |  max(CASE WHEN n = 1 THEN tot END)::BIGINT AS tot_1,
         |  max(CASE WHEN n = 1 THEN rtot END)::BIGINT AS ref_len,
         |  max(CASE WHEN n = 2 THEN clip END)::BIGINT AS clip_2,
         |  max(CASE WHEN n = 2 THEN tot END)::BIGINT AS tot_2
         |  FROM pn GROUP BY 1, 2),
         |q AS (SELECT doc_id, opp, tot_1 AS cand_len, ref_len,
         |  (CASE WHEN clip_1 > 0 AND tot_1 > 0 THEN
         |    floor(ln(clip_1::DOUBLE / tot_1::DOUBLE) * 1000000.0)::BIGINT END)
         |   + floor(ln((clip_2 + 1)::DOUBLE / (tot_2 + 1)::DOUBLE)
         |       * 1000000.0)::BIGINT AS qsum
         |  FROM pv),
         |lb AS (SELECT doc_id,
         |  CASE WHEN cand_len > 0 THEN
         |    floor((qsum::DOUBLE / 2000000.0 + least(0.0,
         |      1.0 - ref_len::DOUBLE / cand_len::DOUBLE)) * 1000000.0)::BIGINT
         |  END AS lbq FROM q)
         |SELECT doc_id, count(*)::BIGINT AS n_opp,
         |  count(lbq)::BIGINT AS n_scored,
         |  sum(lbq)::BIGINT AS self_bleu_q6_sum,
         |  (CASE WHEN count(lbq) > 0 THEN
         |    floor(sum(lbq)::DOUBLE / count(lbq))::BIGINT
         |   END)::BIGINT AS self_bleu_mean_q6
         |FROM lb GROUP BY 1 ORDER BY doc_id""".stripMargin
  )

    // north-star: pass@k — the HumanEval estimator per task from 503
    // hash-bucketed tasks × ~12 samples; exact falling-factorial
    // arithmetic in DECIMAL(38), NULL where n < k.
  b.q(
    "eval_pass_at_k" -> ((s, dir) =>
      evals.passAtK(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 503L).as("task"), (col("label") < 4).as("ok")),
        col("task"), col("ok"), ks = Seq(1, 2, 5))
        .orderBy(col("task")))
  )
    // pass@k unrolled per k: clamped falling factorials in HUGEINT
    // (Spark's DECIMAL(38,0) twin), truncating ppm quotient, NULL
    // where n < k.
  b.o(
    "eval_pass_at_k" ->
      """WITH b AS (SELECT vec_id % 503 AS task,
        |    CASE WHEN label < 4 THEN 1 ELSE 0 END AS ok FROM embeddings),
        |g AS (SELECT task, count(*)::BIGINT AS n, sum(ok)::BIGINT AS c
        |  FROM b GROUP BY 1)
        |SELECT task, n, c,
        |  (1000000 - ((greatest(n - c, 0)::HUGEINT * 1000000)
        |    // n::HUGEINT))::BIGINT AS pass_1_ppm,
        |  (CASE WHEN n >= 2 THEN 1000000 -
        |    ((greatest(n - c, 0)::HUGEINT * greatest(n - c - 1, 0) * 1000000)
        |     // (n::HUGEINT * (n - 1))) END)::BIGINT AS pass_2_ppm,
        |  (CASE WHEN n >= 5 THEN 1000000 -
        |    ((greatest(n - c, 0)::HUGEINT * greatest(n - c - 1, 0)
        |      * greatest(n - c - 2, 0) * greatest(n - c - 3, 0)
        |      * greatest(n - c - 4, 0) * 1000000)
        |     // (n::HUGEINT * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
        |   END)::BIGINT AS pass_5_ppm
        |FROM g ORDER BY task""".stripMargin
  )

    // north-star: self-consistency / majority-vote accuracy — modal
    // answer per task vs gold, struct-max tie-break, no window.
  b.q(
    "eval_majority_vote" -> ((s, dir) =>
      evals.selfConsistency(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 503L).as("task"),
          pmod(scoreQ4(col("embedding"), Q1), lit(7L)).as("ans"),
          ((col("vec_id") % 503L) % 7L).as("gold")),
        col("task"), col("ans"), col("gold"))
        .orderBy(col("task")))
  )
    // Majority vote via max-count + min-answer tie-break (the
    // struct-max twin), gold = min per task.
  b.o(
    "eval_majority_vote" ->
      s"""WITH b AS (SELECT vec_id % 503 AS task,
         |    (((${sqlScoreQ4(Q1)}) % 7) + 7) % 7 AS ans,
         |    (vec_id % 503) % 7 AS gold FROM embeddings),
         |c AS (SELECT task, ans, count(*)::BIGINT AS cnt, min(gold) AS g
         |  FROM b GROUP BY 1, 2),
         |m AS (SELECT task, max(cnt) AS mx FROM c GROUP BY 1),
         |mj AS (SELECT c.task, min(c.ans) AS maj FROM c
         |  JOIN m ON c.task = m.task AND c.cnt = m.mx GROUP BY 1),
         |t AS (SELECT task, sum(cnt)::BIGINT AS n_samples, min(g) AS gold
         |  FROM c GROUP BY 1)
         |SELECT t.task, t.n_samples, mj.maj::BIGINT AS maj_answer,
         |  m.mx::BIGINT AS maj_count, t.gold::BIGINT AS gold,
         |  (CASE WHEN mj.maj = t.gold THEN 1 ELSE 0 END)::BIGINT AS correct
         |FROM t JOIN m ON t.task = m.task JOIN mj ON t.task = mj.task
         |ORDER BY t.task""".stripMargin
  )

    // north-star: Cohen's kappa between the data label and a
    // hash-derived second rater — chance-corrected agreement, all
    // integer, floor-division portable on the negative branch.
  b.q(
    "eval_kappa" -> ((s, dir) =>
      evals.cohenKappa(
        table(s, dir, "embeddings").where(col("embedding").isNotNull)
          .select(col("label").cast("long").as("a"),
            pmod(scoreQ4(col("embedding"), Q1), lit(10L)).as("b")),
        col("a"), col("b")))
  )
    // Kappa from the confusion grid's marginals; DuckDB's // already
    // floors, mirroring the Spark side's pmod floor-division identity.
  b.o(
    "eval_kappa" ->
      s"""WITH b AS (SELECT label::BIGINT AS a,
         |    (((${sqlScoreQ4(Q1)}) % 10) + 10) % 10 AS bb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT a, bb, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
         |t AS (SELECT sum(n)::BIGINT AS n,
         |  sum(CASE WHEN a = bb THEN n ELSE 0 END)::BIGINT AS agree FROM g),
         |s AS (SELECT coalesce(sum(ra * cb), 0)::BIGINT AS s_cross FROM
         |  (SELECT a AS k, sum(n)::BIGINT AS ra FROM g GROUP BY 1) x
         |  JOIN (SELECT bb AS k, sum(n)::BIGINT AS cb FROM g GROUP BY 1) y
         |  ON x.k = y.k)
         |SELECT n, agree, s_cross,
         |  (CASE WHEN n > 0 THEN agree * 1000000 // n END)::BIGINT AS po_ppm,
         |  (CASE WHEN n > 0 THEN s_cross * 1000000 // (n * n)
         |   END)::BIGINT AS pe_ppm,
         |  (CASE WHEN n * n - s_cross > 0 THEN
         |    (n * agree * 1000000 - s_cross * 1000000) // (n * n - s_cross)
         |   END)::BIGINT AS kappa_ppm
         |FROM t, s""".stripMargin
  )

    // north-star: split-conformal threshold at 90% coverage — exact
    // order-statistic selection over the score grid, integer rank from
    // the ceiling-division identity.
  b.q(
    "eval_conformal" -> ((s, dir) =>
      evals.conformalThreshold(
        table(s, dir, "embeddings").where(col("embedding").isNotNull),
        scoreQ4(col("embedding"), Q1), alphaPpm = 100000L))
  )
    // Conformal rank k = ceil((n+1)(1-alpha)) in integer arithmetic;
    // threshold is the k-th order statistic off the value grid.
  b.o(
    "eval_conformal" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS c FROM sc GROUP BY 1),
         |c AS (SELECT s,
         |    sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW)::BIGINT AS cum,
         |    (SELECT sum(c) FROM g)::BIGINT AS n
         |  FROM g),
         |k AS (SELECT n, (((n + 1) * 900000 + 999999) // 1000000)::BIGINT
         |    AS k_rank
         |  FROM (SELECT DISTINCT n FROM c))
         |SELECT c.n, k.k_rank, min(s)::BIGINT AS threshold,
         |  ((k.k_rank * 1000000) // (c.n + 1))::BIGINT AS coverage_min_ppm
         |FROM c, k WHERE cum >= k_rank GROUP BY 1, 2""".stripMargin
  )

    // north-star: fairness table for a boolean screen across label%3
    // slices — per-group exact confusion counts, demographic-parity and
    // equalized-odds ppm rates.
  b.q(
    "eval_fairness" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
      evals.fairnessGaps(e, pmod(col("label"), lit(3)).cast("long"),
          scoreQ4(col("embedding"), Q1) > 0L, col("label") < 5)
        .orderBy(col("grp"))
    })
  )
    // Per-slice confusion counts and ppm rates; empty denominators stay
    // NULL on both engines.
  b.o(
    "eval_fairness" ->
      s"""WITH b AS (SELECT ((label % 3) + 3) % 3 AS grp,
         |    (${sqlScoreQ4(Q1)}) > 0 AS p, label < 5 AS y
         |  FROM embeddings WHERE embedding IS NOT NULL
         |    AND label IS NOT NULL),
         |g AS (SELECT grp, count(*)::BIGINT AS n,
         |    sum((p AND y)::BIGINT)::BIGINT AS tp,
         |    sum((p AND NOT y)::BIGINT)::BIGINT AS fp,
         |    sum((NOT p AND y)::BIGINT)::BIGINT AS fn,
         |    sum((NOT p AND NOT y)::BIGINT)::BIGINT AS tn
         |  FROM b GROUP BY 1)
         |SELECT grp::BIGINT AS grp, n, tp, fp, fn, tn,
         |  (CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
         |   END)::BIGINT AS tpr_ppm,
         |  (CASE WHEN fp + tn > 0 THEN fp * 1000000 // (fp + tn)
         |   END)::BIGINT AS fpr_ppm,
         |  (CASE WHEN n > 0 THEN (tp + fp) * 1000000 // n
         |   END)::BIGINT AS ppr_ppm
         |FROM g ORDER BY grp""".stripMargin
  )

    // north-star: Fleiss' kappa — a fixed 3-rater panel (hash-derived
    // labels over 4 categories) per unit; exact DECIMAL(38) combine,
    // floor-ppm readouts on both engines.
  b.q(
    "eval_fleiss" -> ((s, dir) => {
      val rated = table(s, dir, "embeddings")
        .where(col("vec_id").isNotNull)
        .select(col("vec_id"),
          explode(sequence(lit(0L), lit(2L))).as("r"))
        .select(col("vec_id"),
          (hashing.h32(concat(col("vec_id").cast("string"), lit("/fl"),
            col("r").cast("string"))) % 4L).as("lab"))
      evals.fleissKappa(rated, col("vec_id"), col("lab"), m = 3)
    })
  )
    // Fleiss over the synthetic 3-rater panel: HUGEINT mirrors the
    // Spark side's DECIMAL(38,0) exact combine; // floors like the
    // pmod identity.
  b.o(
    "eval_fleiss" -> {
      val h = graft.functions.hashing.sqlH32(
        "(vec_id::VARCHAR || '/fl' || rr::VARCHAR)")
      s"""WITH r AS (SELECT vec_id, unnest(range(0, 3)) AS rr
         |  FROM embeddings WHERE vec_id IS NOT NULL),
         |sc AS (SELECT vec_id AS u, ($h) % 4 AS l FROM r),
         |g AS (SELECT u, l, count(*)::BIGINT AS n FROM sc GROUP BY 1, 2),
         |ua AS (SELECT u, sum(n * n)::BIGINT AS sq FROM g GROUP BY 1),
         |a AS (SELECT count(*)::HUGEINT AS nu,
         |  coalesce(sum(sq), 0)::HUGEINT AS ssq FROM ua),
         |b AS (SELECT coalesce(sum(s * s), 0)::HUGEINT AS bb
         |  FROM (SELECT sum(n)::BIGINT AS s FROM g GROUP BY l)),
         |f AS (SELECT nu, ssq - nu * 3 AS aa, (nu * 3) * 2 AS d1,
         |  bb, nu * 3 AS t FROM a, b)
         |SELECT nu::BIGINT AS n_units, 3::BIGINT AS m,
         |  (CASE WHEN d1 > 0 THEN (aa * 1000000) // d1
         |   END)::BIGINT AS po_ppm,
         |  (CASE WHEN t > 0 THEN (bb * 1000000) // (t * t)
         |   END)::BIGINT AS pe_ppm,
         |  (CASE WHEN d1 > 0 AND t * t - bb > 0 THEN
         |    ((aa * t * t - bb * d1) * 1000000) // (d1 * (t * t - bb))
         |   END)::BIGINT AS kappa_ppm
         |FROM f""".stripMargin
    }
  )

    // north-star: average precision per query (the MAP building block)
    // over the eval_ndcg run fixture — per-term ppm quantization makes
    // the surfaced AP engine-exact; one window per qid, full ranking.
  b.q(
    "eval_map" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel2: Int, rel1: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          when(col("label") === rel2, 2L)
            .when(col("label") === rel1, 1L).otherwise(0L).as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.averagePrecision(run(0L, Q1, 3, 7).unionAll(run(1L, Q2, 5, 1)),
          col("qid"), col("rel"), col("s"), col("vec_id"))
        .orderBy(col("qid"))
    })
  )
    // AP per query: rank + running relevant count in one window pair,
    // per-term ppm quantization ((relcnt * 1e6) // rk on relevant rows
    // only — positive DIV), mean by one positive integer division.
  b.o(
    "eval_map" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id,
         |    (CASE WHEN label = 3 THEN 2 WHEN label = 7 THEN 1 ELSE 0 END)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id,
         |    (CASE WHEN label = 5 THEN 2 WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, (rel > 0)::BIGINT AS rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
         |      AS rk,
         |    sum((rel > 0)::BIGINT) OVER (PARTITION BY qid
         |      ORDER BY s DESC, vec_id ROWS UNBOUNDED PRECEDING) AS relcnt
         |  FROM r0),
         |t AS (SELECT qid, rel,
         |    CASE WHEN rel = 1 THEN (relcnt * 1000000) // rk ELSE NULL END
         |      AS term
         |  FROM a)
         |SELECT qid, count(*)::BIGINT AS n_cand, sum(rel)::BIGINT AS n_rel,
         |  coalesce(sum(term), 0)::BIGINT AS ap_ppm_sum,
         |  (CASE WHEN sum(rel) > 0
         |    THEN coalesce(sum(term), 0) // sum(rel) END)::BIGINT AS ap_ppm
         |FROM t GROUP BY qid ORDER BY qid""".stripMargin
  )

    // north-star: Adjusted Rand Index — cluster agreement between the
    // data label and a 20%-perturbed copy; pair-counting contingency
    // sums in exact longs, chance correction in DECIMAL(38), ppm by
    // the pmod floor identity (ARI can be negative).
  b.q(
    "eval_ari" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("label").isNotNull)
      evals.adjustedRand(e, col("label"),
        pmod(col("label") + when(col("vec_id") % 5L === 0L, 1L)
          .otherwise(0L), lit(10L)))
    })
  )
    // ARI: contingency comb sums as exact BIGINTs, the cleared-fraction
    // form in HUGEINT (Spark DECIMAL(38) twin), floor-division ppm.
  b.o(
    "eval_ari" ->
      s"""WITH r AS (SELECT label AS a,
         |    (label + (CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)) % 10 AS b
         |  FROM embeddings WHERE label IS NOT NULL),
         |g AS (SELECT a, b, count(*)::BIGINT AS n FROM r GROUP BY 1, 2),
         |c AS (SELECT sum(n)::BIGINT AS n,
         |    coalesce(sum((n * (n - 1)) // 2), 0)::BIGINT AS s_ij FROM g),
         |ma AS (SELECT coalesce(sum((m * (m - 1)) // 2), 0)::BIGINT AS s_a
         |  FROM (SELECT sum(n)::BIGINT AS m FROM g GROUP BY a)),
         |mb AS (SELECT coalesce(sum((m * (m - 1)) // 2), 0)::BIGINT AS s_b
         |  FROM (SELECT sum(n)::BIGINT AS m FROM g GROUP BY b)),
         |f AS (SELECT n, s_ij, s_a, s_b,
         |    ((n * (n - 1)) // 2)::HUGEINT AS cc FROM c, ma, mb)
         |SELECT n, s_ij, s_a, s_b,
         |  (CASE WHEN cc * (s_a + s_b) - 2 * s_a::HUGEINT * s_b <> 0 THEN
         |    ((2 * cc * s_ij - 2 * s_a::HUGEINT * s_b) * 1000000)
         |      // (cc * (s_a + s_b) - 2 * s_a::HUGEINT * s_b)
         |   END)::BIGINT AS ari_ppm
         |FROM f""".stripMargin
  )

    // north-star: rank-biased overlap — top-weighted agreement between
    // the Q1 and Q2 rankings per label-parity query; a doc's whole
    // contribution is the literal suffix-sum at max(ra, rb), so the
    // score is one exact long sum after a thin top-20 join.
  b.q(
    "eval_rbo" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
        .select(pmod(col("label"), lit(2L)).as("qid"), col("vec_id"),
          scoreQ4(col("embedding"), Q1).as("sa"),
          scoreQ4(col("embedding"), Q2).as("sb"))
      evals.rboAtD(e, col("qid"), col("vec_id"), col("sa"), col("sb"),
          pPpm = 900000L, depth = 20)
        .orderBy(col("qid"))
    })
  )
    // RBO: the shared driver-literal suffix-sum table, two ranked CTEs,
    // one (qid, doc) join, one exact long sum per query.
  b.o(
    "eval_rbo" -> {
      val w = evals.rboWeights(900000L, 20).zipWithIndex
        .map { case (wt, i) => s"(${i + 1}, ${wt})" }.mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $w) v(m, wt)),
         |r AS (SELECT label % 2 AS qid, vec_id AS doc,
         |    ${sqlScoreQ4(Q1)} AS sa, ${sqlScoreQ4(Q2)} AS sb
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |a AS (SELECT qid, doc, row_number() OVER (PARTITION BY qid
         |    ORDER BY sa DESC, doc) AS ra FROM r),
         |b AS (SELECT qid, doc, row_number() OVER (PARTITION BY qid
         |    ORDER BY sb DESC, doc) AS rb FROM r),
         |j AS (SELECT a.qid, greatest(ra, rb) AS m
         |  FROM a JOIN b ON a.qid = b.qid AND a.doc = b.doc
         |  WHERE ra <= 20 AND rb <= 20),
         |p AS (SELECT qid, count(*)::BIGINT AS n_common,
         |    sum(wt)::BIGINT AS rbo_q9
         |  FROM j JOIN w USING (m) GROUP BY qid),
         |q AS (SELECT DISTINCT qid FROM r)
         |SELECT q.qid, coalesce(n_common, 0)::BIGINT AS n_common,
         |  coalesce(rbo_q9, 0)::BIGINT AS rbo_q9
         |FROM q LEFT JOIN p USING (qid) ORDER BY qid""".stripMargin
    }
  )

    // north-star: V-measure (homogeneity/completeness) — the entropy
    // twin of eval_ari over the same perturbed-labeling fixture,
    // composed from mutualInfo's quantized sums: h = MI/H(a),
    // c = MI/H(b), v = 2·MI/(H(a)+H(b)) (the harmonic-mean identity).
    // Ratios of identically-rounded doubles re-quantize identically on
    // both engines.
  b.q(
    "eval_vmeasure" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("label").isNotNull)
      def q6(c: Column) = graft.functions.vectors.quantize(c, 6)
      rel.mutualInfo(e, col("label"),
          pmod(col("label") + when(col("vec_id") % 5L === 0L, 1L)
            .otherwise(0L), lit(10L)))
        .select(col("n"),
          when(col("h_a") > 0.0, q6(col("mi") / col("h_a")))
            .as("homogeneity"),
          when(col("h_b") > 0.0, q6(col("mi") / col("h_b")))
            .as("completeness"),
          when(col("h_a") + col("h_b") > 0.0,
            q6(lit(2.0) * col("mi") / (col("h_a") + col("h_b"))))
            .as("v_measure"))
    })
  )
    // V-measure: the mutualInfo CTE chain on the perturbed-labeling
    // fixture, finishing with ratio-of-rounded-doubles re-quantization
    // (identical operand doubles -> identical results cross-engine).
  b.o(
    "eval_vmeasure" ->
      """WITH b AS (SELECT label AS a,
        |    (label + (CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)) % 10 AS bb
        |  FROM embeddings WHERE label IS NOT NULL),
        |g AS (SELECT a, bb, count(*)::BIGINT AS nij FROM b GROUP BY 1, 2),
        |na AS (SELECT a, sum(nij)::BIGINT AS na FROM g GROUP BY 1),
        |nb AS (SELECT bb, sum(nij)::BIGINT AS nb FROM g GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT AS n FROM g),
        |mi AS (SELECT sum(floor((g.nij::DOUBLE / t.n)
        |    * ln((g.nij::DOUBLE * t.n) / (na.na::DOUBLE * nb.nb))
        |    * 1e12))::BIGINT AS smi
        |  FROM g JOIN na ON g.a = na.a JOIN nb ON g.bb = nb.bb CROSS JOIN t),
        |ha AS (SELECT sum(floor((na::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / na) * 1e12))::BIGINT AS sha
        |  FROM na CROSS JOIN t),
        |hb AS (SELECT sum(floor((nb::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / nb) * 1e12))::BIGINT AS shb
        |  FROM nb CROSS JOIN t),
        |r AS (SELECT n,
        |    floor(sha::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_a,
        |    floor(shb::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_b,
        |    floor(smi::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS mi
        |  FROM t, mi, ha, hb)
        |SELECT n,
        |  CASE WHEN h_a > 0 THEN
        |    floor(mi / h_a * 1000000.0 + 0.5) / 1000000.0 END AS homogeneity,
        |  CASE WHEN h_b > 0 THEN
        |    floor(mi / h_b * 1000000.0 + 0.5) / 1000000.0 END AS completeness,
        |  CASE WHEN h_a + h_b > 0 THEN
        |    floor(2.0 * mi / (h_a + h_b) * 1000000.0 + 0.5) / 1000000.0
        |  END AS v_measure
        |FROM r""".stripMargin
  )

    // north-star: Krippendorff's alpha — variable raters per unit
    // (1..3 hash-derived ratings; single-rating units drop, exercising
    // the missing-data path Fleiss' fixed panel can't represent).
  b.q(
    "eval_krippendorff" -> ((s, dir) => {
      val rated = table(s, dir, "embeddings")
        .where(col("vec_id").isNotNull)
        .select(col("vec_id"),
          explode(sequence(lit(0L), pmod(col("vec_id"), lit(3L)))).as("r"))
        .select(col("vec_id"),
          (hashing.h32(concat(col("vec_id").cast("string"), lit("/kr"),
            col("r").cast("string"))) % 4L).as("lab"))
      evals.krippendorffAlpha(rated, col("vec_id"), col("lab"))
    })
  )
    // Krippendorff alpha (nominal, variable raters): per-unit Do terms
    // quantized by one positive `//` each, marginals over kept units,
    // alpha as the final 4-dp float chain.
  b.o(
    "eval_krippendorff" -> {
      val h = graft.functions.hashing.sqlH32(
        "(vec_id::VARCHAR || '/kr' || rr::VARCHAR)")
      s"""WITH r AS (SELECT vec_id, unnest(range(0, (vec_id % 3) + 1)) AS rr
         |  FROM embeddings WHERE vec_id IS NOT NULL),
         |sc AS (SELECT vec_id AS u, ($h) % 4 AS l FROM r),
         |g AS (SELECT u, l, count(*)::BIGINT AS n FROM sc GROUP BY 1, 2),
         |un AS (SELECT u, sum(n)::BIGINT AS mu, sum(n * n)::BIGINT AS sq
         |  FROM g GROUP BY 1 HAVING sum(n) >= 2),
         |ds AS (SELECT count(*)::BIGINT AS n_units,
         |    coalesce(sum(mu), 0)::BIGINT AS n_total,
         |    coalesce(sum(((mu * mu - sq) * 1000000) // (mu - 1)), 0)::BIGINT
         |      AS do_q6
         |  FROM un),
         |de AS (SELECT coalesce(sum(nc * nc), 0)::BIGINT AS sumc2
         |  FROM (SELECT sum(g.n)::BIGINT AS nc FROM g JOIN un USING (u)
         |    GROUP BY g.l)),
         |f AS (SELECT n_units, n_total, do_q6,
         |    n_total * n_total - sumc2 AS de_num FROM ds, de)
         |SELECT n_units, n_total, do_q6, de_num,
         |  (CASE WHEN de_num > 0 AND n_total > 1 THEN
         |    floor((1.0 - do_q6::DOUBLE * (n_total - 1)::DOUBLE
         |      / 1000000.0 / de_num::DOUBLE) * 10000.0 + 0.5) / 10000.0
         |   END)::DOUBLE AS alpha_q4
         |FROM f""".stripMargin
    }
  )

    // north-star: Bradley-Terry arena ratings — 8 synthetic models with
    // index-increasing skill margins, 3 MM fixed-point rounds in
    // integer arithmetic, deterministic rescale; the leaderboard read.
  b.q(
    "eval_bt_ratings" -> ((s, dir) =>
      evals.btRatings(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 8L).as("a"),
          expr("(vec_id DIV 8) % 8").as("b"),
          (scoreQ4(col("embedding"), Q1) - scoreQ4(col("embedding"), Q2)
            + ((col("vec_id") % 8L) - expr("(vec_id DIV 8) % 8")) * 500L)
            .as("mg"))
          .where(col("a") =!= col("b") && col("mg") =!= 0L)
          .withColumn("win", col("mg") > 0L),
        col("a"), col("b"), col("win"), iters = 3)
        .orderBy(col("model")))
  )
    // Bradley-Terry MM unrolled 3 rounds: per-pair quantized quotient
    // sums + the hits-style integer rescale, HUGEINT mirroring Spark's
    // DECIMAL(38,0) products.
  b.o(
    "eval_bt_ratings" -> {
      def iter(k: Int): String = {
        val (p, n) = (s"r$k", s"r${k + 1}")
        s"""d$n AS (SELECT p.i,
           |  sum((p.nij::HUGEINT * 1000000000000) // (ri.r + rj.r)) AS d
           |  FROM p JOIN $p ri ON p.i = ri.i JOIN $p rj ON p.j = rj.i
           |  GROUP BY 1),
           |w$n AS (SELECT t.i, t.games, t.wins,
           |  CASE WHEN d.d > 0 THEN (t.wins::HUGEINT * 1000000000000) // d.d
           |    ELSE 0 END AS raw
           |  FROM $p t JOIN d$n d ON t.i = d.i),
           |m$n AS (SELECT max(raw) AS mx FROM w$n),
           |$n AS (SELECT i, games, wins,
           |  greatest(raw // (1 + (greatest(mx, 1) - 1) // 1000000), 1) AS r
           |  FROM w$n, m$n)""".stripMargin
      }
      s"""WITH mt AS (SELECT vec_id % 8 AS a, (vec_id // 8) % 8 AS b,
         |    (${sqlScoreQ4(Q1)}) - (${sqlScoreQ4(Q2)})
         |      + ((vec_id % 8) - ((vec_id // 8) % 8)) * 500 AS mg
         |  FROM embeddings),
         |f AS (SELECT a, b, mg > 0 AS w FROM mt WHERE a <> b AND mg <> 0),
         |p AS (SELECT i, j, count(*)::BIGINT AS nij,
         |    sum(CASE WHEN w THEN 1 ELSE 0 END)::BIGINT AS wij
         |  FROM (SELECT a AS i, b AS j, w FROM f
         |    UNION ALL SELECT b AS i, a AS j, NOT w FROM f)
         |  GROUP BY 1, 2),
         |r0 AS (SELECT i, sum(nij)::BIGINT AS games,
         |    sum(wij)::BIGINT AS wins, 1000000::BIGINT AS r
         |  FROM p GROUP BY 1),
         |${iter(0)},
         |${iter(1)},
         |${iter(2)}
         |SELECT i AS model, games, wins, r::BIGINT AS rating
         |FROM r3 ORDER BY model""".stripMargin
    }
  )

    // north-star: win-rate error bars — the per-item win indicator
    // (1 / 0.5 / 0) through the deterministic Poisson bootstrap; the
    // rep spread IS the CI a launch review reads.
  b.q(
    "eval_winrate_ci" -> ((s, dir) => {
      val ind = when(scoreQ4(col("embedding"), Q1)
          > scoreQ4(col("embedding"), Q2), 1.0)
        .when(scoreQ4(col("embedding"), Q1)
          === scoreQ4(col("embedding"), Q2), 0.5)
        .otherwise(0.0)
      sample.bootstrapCI(
        table(s, dir, "embeddings").where(col("embedding").isNotNull)
          .select(col("vec_id"), ind.as("ind")),
        "ind", "vec_id", reps = 20, salt = "wr")
        .orderBy(col("rep"))
    })
  )
    // Win indicator through the same deterministic Poisson bootstrap
    // replay as events_bootstrap_ci.
  b.o(
    "eval_winrate_ci" -> {
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || '/wr')")
      val aff = graft.functions.hashing.sqlAffineVar("h", "rep")
      val p = graft.functions.hashing.AffineP
      val w = graft.ops.sample.PoissonCdf.zipWithIndex
        .map { case (t, k) => s"WHEN uu < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""WITH sc AS (SELECT vec_id, ${sqlScoreQ4(Q1)} AS a,
         |    ${sqlScoreQ4(Q2)} AS b
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |ind AS (SELECT vec_id, CASE WHEN a > b THEN 1.0
         |    WHEN a = b THEN 0.5 ELSE 0.0 END AS v FROM sc),
         |r AS (SELECT floor(v * 100)::BIGINT AS c, ($h)::BIGINT AS h,
         |    unnest(range(0, 20)) AS rep FROM ind),
         |u AS (SELECT rep, c, ($aff)::DOUBLE / $p.0 AS uu FROM r),
         |ww AS (SELECT rep, c, ($w)::BIGINT AS w FROM u),
         |a AS (SELECT rep, sum(w)::BIGINT AS n_eff,
         |    sum(w * c)::BIGINT AS cents FROM ww GROUP BY 1)
         |SELECT rep, n_eff, cents,
         |  CASE WHEN n_eff > 0 THEN
         |    floor(cents::DOUBLE / n_eff::DOUBLE * 10000.0) / 10000.0
         |  END AS mean_q4
         |FROM a ORDER BY rep""".stripMargin
    }
  )

    // north-star: Cohen's d / Hedges' g — the how-big-in-noise-units
    // companion to the significance suite; exact sums incl. DECIMAL x².
  b.q(
    "eval_cohens_d" -> ((s, dir) =>
      evals.cohensD(events(s, dir),
        floor(col("value") * 1000000.0).cast("long"),
        col("user_id") % 2 === 1))
  )
  b.o(
    "eval_cohens_d" ->
      """WITH r AS (SELECT floor(value * 1000000.0)::BIGINT AS x,
        |    (user_id % 2 = 1)::BIGINT AS g FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT sum(g)::BIGINT AS n_a, sum(1 - g)::BIGINT AS n_b,
        |  sum(x * g)::BIGINT AS sa, sum(x * (1 - g))::BIGINT AS sb,
        |  sum(x::HUGEINT * x * g)::HUGEINT AS ssa,
        |  sum(x::HUGEINT * x * (1 - g))::HUGEINT AS ssb FROM r),
        |f AS (SELECT n_a, n_b,
        |  sa::DOUBLE / n_a::DOUBLE AS ma, sb::DOUBLE / n_b::DOUBLE AS mb,
        |  ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n_a::DOUBLE AS va,
        |  ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / n_b::DOUBLE AS vb
        |  FROM a),
        |f2 AS (SELECT *, (va + vb) / (n_a + n_b - 2)::DOUBLE AS sp2 FROM f),
        |f3 AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2
        |    AND sp2 > 0 THEN (ma - mb) / sqrt(sp2) END AS d FROM f2)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN floor(ma * 1000000.0 + 0.5) / 1000000.0 END
        |    AS mean_a_q6,
        |  CASE WHEN n_b > 0 THEN floor(mb * 1000000.0 + 0.5) / 1000000.0 END
        |    AS mean_b_q6,
        |  floor(d * 10000.0 + 0.5) / 10000.0 AS d_q4,
        |  floor(d * (1.0 - 3.0 / (4.0 * (n_a + n_b - 2)::DOUBLE - 1.0))
        |    * 10000.0 + 0.5) / 10000.0 AS g_q4
        |FROM f3""".stripMargin
  )

    // north-star: Welch's t with Satterthwaite df — the parametric
    // two-sample statistic beside ranks (mannWhitney) and resampling
    // (permTest); exact sums, fixed double assembly.
  b.q(
    "eval_welch_t" -> ((s, dir) =>
      evals.welchT(events(s, dir),
        floor(col("value") * 1000000.0).cast("long"),
        col("user_id") % 2 === 1))
  )
  b.o(
    "eval_welch_t" ->
      """WITH r AS (SELECT floor(value * 1000000.0)::BIGINT AS x,
        |    (user_id % 2 = 1)::BIGINT AS g FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT sum(g)::BIGINT AS n_a, sum(1 - g)::BIGINT AS n_b,
        |  sum(x * g)::BIGINT AS sa, sum(x * (1 - g))::BIGINT AS sb,
        |  sum(x::HUGEINT * x * g)::HUGEINT AS ssa,
        |  sum(x::HUGEINT * x * (1 - g))::HUGEINT AS ssb FROM r),
        |f AS (SELECT n_a, n_b,
        |  sa::DOUBLE / n_a::DOUBLE AS ma, sb::DOUBLE / n_b::DOUBLE AS mb,
        |  (ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n_a::DOUBLE)
        |    / (n_a - 1)::DOUBLE AS va,
        |  (ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / n_b::DOUBLE)
        |    / (n_b - 1)::DOUBLE AS vb
        |  FROM a),
        |f2 AS (SELECT *, va / n_a::DOUBLE AS wa, vb / n_b::DOUBLE AS wb,
        |  (n_a > 1 AND n_b > 1) AS okn FROM f)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN floor(ma * 1000000.0 + 0.5) / 1000000.0 END
        |    AS mean_a_q6,
        |  CASE WHEN n_b > 0 THEN floor(mb * 1000000.0 + 0.5) / 1000000.0 END
        |    AS mean_b_q6,
        |  CASE WHEN okn AND wa + wb > 0 THEN
        |    floor((ma - mb) / sqrt(wa + wb) * 10000.0 + 0.5) / 10000.0
        |  END AS t_q4,
        |  CASE WHEN okn AND wa + wb > 0 THEN
        |    floor((wa + wb) * (wa + wb)
        |      / (wa * wa / (n_a - 1)::DOUBLE + wb * wb / (n_b - 1)::DOUBLE)
        |      * 100.0 + 0.5) / 100.0
        |  END AS df_q2
        |FROM f2""".stripMargin
  )

    // north-star: McNemar's paired test — discordant cells only, exact
    // (b-c)^2*1e6 DIV (b+c); the accuracy-metric significance gate.
  b.q(
    "eval_mcnemar" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull)
      evals.mcnemar(emb,
        scoreQ4(col("embedding"), Q1) > 0.0,
        scoreQ4(col("embedding"), Q2) > 0.0)
    })
  )
  b.o(
    "eval_mcnemar" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS a4, ${sqlScoreQ4(Q2)} AS b4
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |x AS (SELECT (a4 > 0) AS a, (b4 > 0) AS b FROM sc),
         |t AS (SELECT count(*)::BIGINT AS n,
         |  sum((a AND b)::BIGINT)::BIGINT AS both_right,
         |  sum((NOT a AND NOT b)::BIGINT)::BIGINT AS both_wrong,
         |  sum((a AND NOT b)::BIGINT)::BIGINT AS b01,
         |  sum((NOT a AND b)::BIGINT)::BIGINT AS c10 FROM x)
         |SELECT n, both_right, both_wrong, b01, c10,
         |  CASE WHEN b01 + c10 > 0 THEN
         |    ((b01 - c10) * (b01 - c10) * 1000000) // (b01 + c10)
         |  END AS chi2_q6
         |FROM t""".stripMargin
  )

    // north-star: Wilson score interval — the pass-rate band that stays
    // sane at k=0/k=n; exact counts, one closed-form sqrt.
  b.q(
    "eval_wilson" -> ((s, dir) =>
      evals.wilsonInterval(table(s, dir, "documents"),
        col("n_chars") > 500L))
  )
  b.o(
    "eval_wilson" ->
      """WITH t AS (SELECT count(*)::BIGINT AS n,
        |    sum((n_chars > 500)::BIGINT)::BIGINT AS k
        |  FROM documents WHERE n_chars IS NOT NULL),
        |f AS (SELECT n, k, (1960.0 / 1000.0) AS z, n::DOUBLE AS nn,
        |    k::DOUBLE / n::DOUBLE AS p FROM t),
        |g AS (SELECT *, (1.0 + z * z / nn) AS den,
        |    (p + z * z / (2.0 * nn)) / (1.0 + z * z / nn) AS ctr,
        |    z * sqrt(p * (1.0 - p) / nn + z * z / (4.0 * nn * nn))
        |      / (1.0 + z * z / nn) AS hw
        |  FROM f)
        |SELECT n, k,
        |  CASE WHEN n > 0 THEN floor(p * 1000000.0 + 0.5) / 1000000.0 END
        |    AS p_q6,
        |  CASE WHEN n > 0 THEN floor((ctr - hw) * 1000000.0 + 0.5)
        |    / 1000000.0 END AS lo_q6,
        |  CASE WHEN n > 0 THEN floor((ctr + hw) * 1000000.0 + 0.5)
        |    / 1000000.0 END AS hi_q6
        |FROM g""".stripMargin
  )

    // north-star: winsorized mean — outlier-robust data-card average on
    // exact order statistics over the value grid; clamp, then mean.
  b.q(
    "eval_winsorized_mean" -> ((s, dir) =>
      evals.winsorizedMean(events(s, dir),
        floor(col("value") * 1000000.0).cast("long")))
  )
  b.o(
    "eval_winsorized_mean" ->
      """WITH v AS (SELECT floor(value * 1000000.0)::BIGINT AS v FROM events
        |  WHERE value IS NOT NULL),
        |g AS (SELECT v, count(*)::BIGINT AS c FROM v GROUP BY v),
        |r AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |    AS below FROM g),
        |t AS (SELECT sum(c)::BIGINT AS n FROM g),
        |t2 AS (SELECT n,
        |  greatest(1, least(n, (n * 50000) // 1000000 + 1)) AS lor,
        |  greatest(1, least(n, (n * 950000 + 999999) // 1000000)) AS hir
        |  FROM t),
        |p AS (SELECT
        |  min(CASE WHEN below + c >= (SELECT lor FROM t2) THEN v END)::BIGINT
        |    AS lo_v,
        |  min(CASE WHEN below + c >= (SELECT hir FROM t2) THEN v END)::BIGINT
        |    AS hi_v FROM r),
        |s AS (SELECT sum(c * least(greatest(v, (SELECT lo_v FROM p)),
        |    (SELECT hi_v FROM p)))::BIGINT AS s FROM r)
        |SELECT (SELECT n FROM t) AS n, p.lo_v, p.hi_v,
        |  CASE WHEN (SELECT n FROM t) > 0 THEN
        |    floor(s.s::DOUBLE / (SELECT n FROM t)::DOUBLE * 1000000.0 + 0.5)
        |      / 1000000.0 END AS mean_q6
        |FROM p, s""".stripMargin
  )

    // north-star: Mann-Whitney U rank-sum test — tie-corrected U, null
    // mean, exact DECIMAL variance, z; the nonparametric A/B readout
    // over the doubled-midrank grid aucRank already rides.
  b.q(
    "eval_mann_whitney" -> ((s, dir) =>
      evals.mannWhitney(events(s, dir), col("value"),
        col("user_id") % 2 === 1))
  )
  b.o(
    "eval_mann_whitney" ->
      """WITH g AS (SELECT value AS s, count(*)::BIGINT AS n,
        |    sum((user_id % 2 = 1)::BIGINT)::BIGINT AS na
        |  FROM events WHERE value IS NOT NULL GROUP BY value),
        |w AS (SELECT s, n, na, coalesce(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
        |  FROM g),
        |a AS (SELECT sum(na)::BIGINT AS n_a, sum(n - na)::BIGINT AS n_b,
        |    sum(na * (2 * below + n + 1))::BIGINT AS r2,
        |    sum(n::HUGEINT * n * n - n)::HUGEINT AS t3 FROM w),
        |f AS (SELECT n_a, n_b, (r2 - n_a * (n_a + 1))::BIGINT AS u2_a,
        |    (n_a * n_b)::BIGINT AS mu2,
        |    (n_a::HUGEINT * n_b * ((n_a + n_b)::HUGEINT * (n_a + n_b)
        |      * (n_a + n_b) - (n_a + n_b) - t3)) AS vn,
        |    (12 * (n_a + n_b)::HUGEINT * (n_a + n_b - 1)) AS vd
        |  FROM a)
        |SELECT n_a, n_b, u2_a, mu2,
        |  CASE WHEN vn > 0 THEN floor((u2_a - mu2)::DOUBLE / 2.0
        |    / sqrt(vn::DOUBLE / vd::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |  END AS z_q4
        |FROM f""".stripMargin
  )

    // north-star: Monte-Carlo permutation test — md5-coin group
    // reassignment per replicate, EXACT decimal cross-multiplied mean
    // comparison, add-one p; the bootstrap machinery pointed at
    // significance instead of uncertainty.
  b.q(
    "eval_perm_test" -> ((s, dir) =>
      evals.permTest(events(s, dir), col("event_id"),
        floor(col("value") * 1000000.0).cast("long"),
        col("user_id") % 2 === 1, reps = 100))
  )
  b.o(
    "eval_perm_test" -> {
      val h = graft.functions.hashing.sqlH32("(event_id::VARCHAR || ':perm')")
      s"""WITH r AS (SELECT floor(value * 1000000.0)::BIGINT AS x,
         |    (user_id % 2 = 1)::BIGINT AS g, $h AS h
         |  FROM events WHERE value IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows, sum(g)::BIGINT AS n_a,
         |    sum(x * g)::BIGINT AS sa, sum(x)::BIGINT AS s FROM r),
         |p2 AS (SELECT n_rows, n_a, (n_rows - n_a)::BIGINT AS n_b, sa,
         |    (s - sa)::BIGINT AS sb FROM p),
         |p3 AS (SELECT *, abs(sa::HUGEINT * n_b - sb::HUGEINT * n_a) AS ao,
         |    (n_a::HUGEINT * n_b) AS bo,
         |    CASE WHEN n_a > 0 AND n_b > 0 THEN
         |      floor((sa::DOUBLE / n_a::DOUBLE - sb::DOUBLE / n_b::DOUBLE)
         |        * 1000000.0 + 0.5) / 1000000.0 END AS diff_q6
         |  FROM p2),
         |bb AS (SELECT rr.j AS rep, x,
         |    (((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |      % 1000000 < 500000)::BIGINT AS ga
         |  FROM r, unnest(range(0, 100)) AS rr(j)),
         |a AS (SELECT rep, count(*)::BIGINT AS n, sum(ga)::BIGINT AS nar,
         |    sum(x * ga)::BIGINT AS sar, sum(x)::BIGINT AS sr FROM bb
         |  GROUP BY rep),
         |c AS (SELECT rep,
         |    abs(sar::HUGEINT * (n - nar) - (sr - sar)::HUGEINT * nar) AS ar,
         |    (nar::HUGEINT * (n - nar)) AS br FROM a),
         |e AS (SELECT count(*)::BIGINT AS reps_eff,
         |    sum((c.ar * (SELECT bo FROM p3) >=
         |      (SELECT ao FROM p3) * c.br)::BIGINT)::BIGINT AS exceed
         |  FROM c WHERE br > 0)
         |SELECT p3.n_rows, p3.n_a, p3.n_b, e.reps_eff, p3.diff_q6,
         |  CASE WHEN p3.bo > 0 AND e.reps_eff > 0 THEN
         |    ((1 + e.exceed) * 1000000) // (e.reps_eff + 1) END AS p_ppm
         |FROM p3, e""".stripMargin
    }
  )

  /** Shared CTE chain for the per-event-type permutation sweep — the
    * [[eval_perm_test]] oracle with every stage keyed on event_type. */
  private def sqlPermByEventType: String = {
    val h = graft.functions.hashing.sqlH32("(event_id::VARCHAR || ':perm')")
    s"""r AS (SELECT event_type AS et, floor(value * 1000000.0)::BIGINT AS x,
       |    (user_id % 2 = 1)::BIGINT AS g, $h AS h
       |  FROM events WHERE value IS NOT NULL),
       |p AS (SELECT et, count(*)::BIGINT AS n_rows, sum(g)::BIGINT AS n_a,
       |    sum(x * g)::BIGINT AS sa, sum(x)::BIGINT AS s FROM r GROUP BY et),
       |p2 AS (SELECT et, n_rows, n_a, (n_rows - n_a)::BIGINT AS n_b, sa,
       |    (s - sa)::BIGINT AS sb FROM p),
       |p3 AS (SELECT *, abs(sa::HUGEINT * n_b - sb::HUGEINT * n_a) AS ao,
       |    (n_a::HUGEINT * n_b) AS bo,
       |    CASE WHEN n_a > 0 AND n_b > 0 THEN
       |      floor((sa::DOUBLE / n_a::DOUBLE - sb::DOUBLE / n_b::DOUBLE)
       |        * 1000000.0 + 0.5) / 1000000.0 END AS diff_q6
       |  FROM p2),
       |bb AS (SELECT et, rr.j AS rep, x,
       |    (((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
       |      % 1000000 < 500000)::BIGINT AS ga
       |  FROM r, unnest(range(0, 100)) AS rr(j)),
       |a AS (SELECT et, rep, count(*)::BIGINT AS n, sum(ga)::BIGINT AS nar,
       |    sum(x * ga)::BIGINT AS sar, sum(x)::BIGINT AS sr FROM bb
       |  GROUP BY et, rep),
       |c AS (SELECT et, rep,
       |    abs(sar::HUGEINT * (n - nar) - (sr - sar)::HUGEINT * nar) AS ar,
       |    (nar::HUGEINT * (n - nar)) AS br FROM a),
       |e AS (SELECT c.et, count(*)::BIGINT AS reps_eff,
       |    sum((c.ar * p3.bo >= p3.ao * c.br)::BIGINT)::BIGINT AS exceed
       |  FROM c JOIN p3 ON p3.et = c.et WHERE c.br > 0 GROUP BY c.et),
       |pt AS (SELECT p3.et AS event_type, p3.n_rows, p3.n_a, p3.n_b,
       |  e.reps_eff, p3.diff_q6,
       |  CASE WHEN p3.bo > 0 AND e.reps_eff > 0 THEN
       |    ((1 + e.exceed) * 1000000) // (e.reps_eff + 1) END AS p_ppm
       |FROM p3 LEFT JOIN e ON e.et = p3.et)""".stripMargin
  }

    // north-star: per-slice significance sweep — one permutation test
    // per event type (each stratum its own coin sequence over its rows).
  b.q(
    "eval_perm_test_by" -> ((s, dir) =>
      evals.permTestBy(events(s, dir), Seq("event_type"), col("event_id"),
          floor(col("value") * 1000000.0).cast("long"),
          col("user_id") % 2 === 1, reps = 100)
        .orderBy(col("event_type")))
  )
  b.o(
    "eval_perm_test_by" ->
      s"""WITH $sqlPermByEventType
         |SELECT * FROM pt ORDER BY event_type""".stripMargin
  )

    // north-star: Benjamini-Hochberg step-up over the per-slice sweep —
    // exact integer (p*m) DIV rank + back-running min, reject at q.
  b.q(
    "eval_bh_fdr" -> ((s, dir) =>
      evals.bhAdjust(
          evals.permTestBy(events(s, dir), Seq("event_type"),
            col("event_id"), floor(col("value") * 1000000.0).cast("long"),
            col("user_id") % 2 === 1, reps = 100),
          Seq("event_type"), col("p_ppm"), qPpm = 500000L)
        .orderBy(col("rank")))
  )
  b.o(
    "eval_bh_fdr" ->
      s"""WITH $sqlPermByEventType,
         |t AS (SELECT event_type, p_ppm FROM pt WHERE p_ppm IS NOT NULL),
         |rk AS (SELECT event_type, p_ppm,
         |    row_number() OVER (ORDER BY p_ppm, event_type)::BIGINT AS rank,
         |    count(*) OVER ()::BIGINT AS m FROM t),
         |rw AS (SELECT *, least(1000000, (p_ppm * m) // rank)::BIGINT AS raw
         |  FROM rk),
         |ad AS (SELECT event_type, p_ppm, rank, m,
         |    min(raw) OVER (ORDER BY rank DESC ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW)::BIGINT AS p_adj_ppm FROM rw)
         |SELECT event_type, p_ppm, rank, m, p_adj_ppm,
         |  (p_adj_ppm <= 500000)::BIGINT AS rejected
         |FROM ad ORDER BY rank""".stripMargin
  )
}
