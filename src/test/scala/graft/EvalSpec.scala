package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.evals

/** Known-answer tests for the evaluation meters: AUC laws (perfect /
  * inverted / chance separation, tie handling), confusion-grid algebra,
  * NDCG boundary cases, and the log-loss/Brier clamp discipline. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucRank: perfect separation scores 1, inverted scores 0") {
    val perfect = Seq((10L, 1), (9L, 1), (2L, 0), (1L, 0)).toDF("s", "y")
    val Row(np: Long, nn: Long, num: Long, den: Long, ppm: Long) =
      evals.aucRank(perfect, col("s"), col("y")).head()
    assert((np, nn) == (2L, 2L))
    assert(num == den && ppm == 1000000L)
    val inverted = Seq((10L, 0), (9L, 0), (2L, 1), (1L, 1)).toDF("s", "y")
    val r2 = evals.aucRank(inverted, col("s"), col("y")).head()
    assert(r2.getLong(2) == 0L && r2.getLong(4) == 0L)
  }

  test("aucRank: all-tied scores give exactly AUC 1/2") {
    val tied = Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0)).toDF("s", "y")
    val r = evals.aucRank(tied, col("s"), col("y")).head()
    assert(r.getLong(2) * 2 == r.getLong(3), s"num/den = $r")
    assert(r.getLong(4) == 500000L)
  }

  test("aucRank matches the brute-force pair count on a mixed sample") {
    val rows = (0 until 60).map(i => ((i * 7) % 23L, (i * 5) % 3 == 0))
    val df = rows.toDF("s", "y")
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r = evals.aucRank(df, col("s"), col("y")).head()
    // auc_num/auc_den == wins / (2·|pos|·|neg|) with ties at half weight
    assert(r.getLong(2) == wins, s"got ${r.getLong(2)} want $wins")
    assert(r.getLong(3) == 2L * pos.size * neg.size)
  }

  test("confusionGrid: counts partition n and F1 algebra holds") {
    val df = Seq((10L, 1), (8L, 0), (6L, 1), (4L, 0), (2L, 1))
      .toDF("s", "y")
    val rows = evals.confusionGrid(df, col("s"), col("y"), Seq(5L, 9L))
      .orderBy("threshold").collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val (tp, fp, fn, tn) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tp + fp + fn + tn == 5L)
      val f1 = r.getLong(7)
      assert(f1 == 2 * tp * 1000000L / (2 * tp + fp + fn))
    }
    // t=5: predicted {10,8,6}, tp=2 fp=1 fn=1 tn=1
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 1L)
    // t=9: predicted {10}, tp=1 fp=0
    assert(rows(1).getLong(1) == 1L && rows(1).getLong(2) == 0L)
  }

  test("ndcgAtK: ideal ordering scores exactly 1e6 ppm, reversed less") {
    val ideal = Seq((1L, 2L, 30L, 1L), (1L, 1L, 20L, 2L), (1L, 0L, 10L, 3L))
      .toDF("qid", "rel", "s", "tie")
    val r = evals.ndcgAtK(ideal, col("qid"), col("rel"), col("s"),
      col("tie"), k = 3).head()
    assert(r.getLong(3) == 1000000L, s"ideal ndcg_ppm = $r")
    val rev = Seq((1L, 0L, 30L, 1L), (1L, 1L, 20L, 2L), (1L, 2L, 10L, 3L))
      .toDF("qid", "rel", "s", "tie")
    val r2 = evals.ndcgAtK(rev, col("qid"), col("rel"), col("s"),
      col("tie"), k = 3).head()
    assert(r2.getLong(3) < 1000000L && r2.getLong(3) > 0L)
    assert(r2.getLong(2) == r.getLong(2), "same result set, same idcg")
  }

  test("ndcgAtK: query with no relevant results yields null ndcg") {
    val df = Seq((7L, 0L, 5L, 1L), (7L, 0L, 4L, 2L)).toDF("qid", "rel", "s", "tie")
    val r = evals.ndcgAtK(df, col("qid"), col("rel"), col("s"), col("tie"), 2)
      .head()
    assert(r.isNullAt(3) && r.getLong(1) == 0L)
  }

  test("ndcgDiscounts: rank-1 discount is exactly 1e6 and decreasing") {
    val d = evals.ndcgDiscounts(10)
    assert(d.head == 1000000L)
    assert(d == d.sorted.reverse && d.distinct == d)
  }

  test("loglossBrier: confident-correct is cheap, clamp keeps wrong finite") {
    val good = Seq((999999L, 1), (1L, 0)).toDF("p", "y")
    val g = evals.loglossBrier(good, col("p"), col("y")).head()
    assert(g.getLong(2) <= 2L, s"near-zero logloss, got $g") // 2·floor(ln(1+1e-6)·1e6)
    assert(g.getLong(3) == 0L) // brier micro of 1-ppm error truncates to 0
    val bad = Seq((1000000L, 0), (0L, 1)).toDF("p", "y")
    val b = evals.loglossBrier(bad, col("p"), col("y")).head()
    // clamped to 999999/1 ppm: each side costs floor(ln(1e6)·1e6)
    assert(b.getLong(2) == 2L * 13815510L, s"clamped logloss, got $b")
    assert(b.getLong(3) == 2L * (999999L * 999999L / 1000000L))
  }

  test("mrrAtK: first-relevant rank, ties broken, misses surface as 0") {
    // qid 0: relevant at rank 2; qid 1: nothing relevant in top-2
    val runs = Seq(
      (0L, 10L, 0L, 9.0), (0L, 11L, 1L, 8.0), (0L, 12L, 1L, 7.0),
      (1L, 20L, 0L, 9.0), (1L, 21L, 0L, 8.0), (1L, 22L, 1L, 7.0)
    ).toDF("qid", "id", "rel", "s")
    val got = evals.mrrAtK(runs, col("qid"), col("rel"), col("s"),
        col("id"), k = 2)
      .orderBy("qid").collect()
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 500000L)
    assert(got(1).isNullAt(1) && got(1).getLong(2) == 0L,
      "a top-k miss is a 0 reading, not an absent row")
  }

  test("precisionRecallAtK: hand overlap; no-relevant query has null recall") {
    // qid 0: 3 relevant total, 2 inside top-2 -> P@2 = 1.0, R@2 = 2/3
    val runs = Seq(
      (0L, 1L, 1L, 9.0), (0L, 2L, 1L, 8.0), (0L, 3L, 1L, 1.0),
      (0L, 4L, 0L, 7.0),
      (1L, 5L, 0L, 9.0), (1L, 6L, 0L, 8.0)
    ).toDF("qid", "id", "rel", "s")
    val got = evals.precisionRecallAtK(runs, col("qid"), col("rel"),
      col("s"), col("id"), k = 2).orderBy("qid").collect()
    val q0 = got(0)
    assert((q0.getLong(1), q0.getLong(2)) == ((3L, 2L)))
    assert(q0.getLong(3) == 1000000L && q0.getLong(4) == 666666L)
    assert(got(1).getLong(3) == 0L && got(1).isNullAt(4),
      "no relevant items -> recall undefined, precision 0")
  }
}
