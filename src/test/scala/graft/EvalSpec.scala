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

  test("ngramOverlap: hand clip counts at n=1 and n=2, with multiplicity") {
    val df = Seq(
      (1L, "the cat sat", "the cat ate"),
      (2L, "a a a", "a a"),
      (3L, "", "the cat")
    ).toDF("id", "cand", "ref")
    val u = evals.ngramOverlap(df, col("id"), col("cand"), col("ref"), 1)
      .orderBy("id").collect()
    // pair 1: unigram clip = {the, cat} = 2 of 3/3
    assert((u(0).getLong(1), u(0).getLong(2), u(0).getLong(3)) == ((3L, 3L, 2L)))
    assert(u(0).getLong(4) == 666666L && u(0).getLong(5) == 666666L
      && u(0).getLong(6) == 666666L)
    // pair 2: clipping caps "a" at the reference's 2, recall is exact 1
    assert(u(1).getLong(3) == 2L && u(1).getLong(4) == 666666L
      && u(1).getLong(5) == 1000000L)
    // pair 3: empty candidate -> precision NULL, recall 0, row present
    assert(u(2).getLong(1) == 0L && u(2).isNullAt(4)
      && u(2).getLong(5) == 0L)
    val b = evals.ngramOverlap(df, col("id"), col("cand"), col("ref"), 2)
      .orderBy("id").collect()
    // pair 1 bigrams: cand {the cat, cat sat}, ref {the cat, cat ate}
    assert(b(0).getLong(3) == 1L && b(0).getLong(4) == 500000L)
  }

  test("bleu: identity scores logbleu 0; short candidate pays exact BP") {
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      (2L, "the cat", "the cat sat"),
      (3L, "x y z", "p q r")
    ).toDF("id", "cand", "ref")
    val got = evals.bleu(df, col("id"), col("cand"), col("ref"), maxN = 4)
      .orderBy("id").collect()
    // identity: every p_n = 1e6, BP = 0 -> logbleu exactly 0
    assert(got(0).getLong(3) == 1000000L && got(0).getLong(6) == 1000000L)
    assert(got(0).getDouble(7) == 0.0)
    // pair 2: p1 = 1, p2 smoothed (1+1)/(1+1) = 1, p3/p4 degenerate 1;
    // BP = 1 - 3/2 = -0.5 exactly
    assert(got(1).getDouble(7) == -0.5)
    // zero unigram overlap -> unsmoothed p1 = 0 -> NULL, row present
    assert(got(2).isNullAt(7) && got(2).getLong(3) == 0L)
  }

  test("reliability + ece: hand-binned gaps; bin weights cancel exactly") {
    val df = Seq((100000L, 0), (300000L, 1), (600000L, 1), (900000L, 1))
      .toDF("p", "y")
    val grid = evals.reliability(df, col("p"), col("y"), bins = 2)
      .orderBy("bin").collect()
    // bin 0: n=2 pos=1 conf_sum=400000 -> acc 500000, conf 200000,
    // gap |1e6 - 4e5| = 600000; bin 1: n=2 pos=2 conf_sum=1500000 ->
    // gap |2e6 - 1.5e6| = 500000
    assert((grid(0).getLong(1), grid(0).getLong(2), grid(0).getLong(4),
      grid(0).getLong(5), grid(0).getLong(6)) ==
      ((2L, 1L, 500000L, 200000L, 600000L)))
    assert(grid(1).getLong(6) == 500000L)
    val e = evals.ece(df, col("p"), col("y"), bins = 2).head()
    // ece = (600000 + 500000) DIV 4 = 275000; mce = 600000 DIV 2
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) ==
      ((4L, 275000L, 300000L)))
  }

  test("spearman: monotone 1.0, inverted -1.0, perfect-tie NULL") {
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val m = evals.spearman(mono, col("x"), col("y")).head()
    assert(m.getLong(1) == m.getLong(2) && m.getDouble(4) == 1.0)
    val inv = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("x", "y")
    assert(evals.spearman(inv, col("x"), col("y")).head().getDouble(4)
      == -1.0)
    // all-tied x -> zero rank variance -> rho undefined, NULL
    val tied = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    assert(evals.spearman(tied, col("x"), col("y")).head().isNullAt(4))
  }

  test("conformalThreshold: exact order statistic, coverage floor, small-n empty") {
    // scores 1..10, alpha = 0.2: k = ceil(11 * 0.8) = 9 -> threshold 9
    val sc = (1L to 10L).toDF("s")
    val r = evals.conformalThreshold(sc, col("s"), alphaPpm = 200000L)
      .head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 9L
      && r.getLong(2) == 9L, r.toString)
    assert(r.getLong(3) == 818181L, s"floor 9e6 DIV 11: $r")
    // ties: duplicate values select the same threshold value
    val tied = Seq(1L, 2L, 2L, 2L, 3L).toDF("s")
    val t = evals.conformalThreshold(tied, col("s"), alphaPpm = 500000L)
      .head()
    // k = ceil(6 * 0.5) = 3 -> 3rd smallest = 2
    assert(t.getLong(1) == 3L && t.getLong(2) == 2L, t.toString)
    // n too small for the coverage: k = ceil(4 * 0.9) = 4 > 3 -> EMPTY
    assert(evals.conformalThreshold((1L to 3L).toDF("s"), col("s"),
      alphaPpm = 100000L).count() == 0L)
  }

  test("fairnessGaps: hand confusion counts per group; empty denominators NULL") {
    val rows = Seq(
      // group 0: tp, fp, fn, tn -> tpr 1/2, fpr 1/2, ppr 2/4
      (0L, true, true), (0L, true, false), (0L, false, true),
      (0L, false, false),
      // group 1: all predicted positive, all labeled positive
      (1L, true, true), (1L, true, true),
      // group 2: no positives labeled -> tpr NULL
      (2L, false, false), (2L, true, false)
    ).toDF("g", "p", "y")
    val got = evals.fairnessGaps(rows, col("g"), col("p"), col("y"))
      .orderBy("grp").collect()
    assert(got.length == 3)
    val g0 = got(0)
    assert(g0.getLong(1) == 4L && g0.getLong(2) == 1L && g0.getLong(3) == 1L
      && g0.getLong(4) == 1L && g0.getLong(5) == 1L)
    assert(g0.getLong(6) == 500000L && g0.getLong(7) == 500000L
      && g0.getLong(8) == 500000L)
    val g1 = got(1)
    assert(g1.getLong(6) == 1000000L && g1.isNullAt(7)
      && g1.getLong(8) == 1000000L, s"g1: $g1")
    val g2 = got(2)
    assert(g2.isNullAt(6) && g2.getLong(7) == 500000L
      && g2.getLong(8) == 500000L, s"g2: $g2")
  }

  test("fleissKappa: textbook hand case; fixed-panel contract raises") {
    // unit 1: (a,a,a); unit 2: (a,b,b) with a=0, b=1 and m=3:
    // A = 14-6 = 8, B = 16+4 = 20, T = 6 -> po = 8/12, pe = 20/36,
    // kappa = 48/192 = 0.25 exactly
    val rated = Seq((1L, 0L), (1L, 0L), (1L, 0L),
      (2L, 0L), (2L, 1L), (2L, 1L)).toDF("u", "l")
    val r = evals.fleissKappa(rated, col("u"), col("l"), m = 3).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 666666L, s"po: $r")
    assert(r.getLong(3) == 555555L, s"pe: $r")
    assert(r.getLong(4) == 250000L, s"kappa: $r")
    // perfect agreement -> kappa exactly 1e6
    val perfect = Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L))
      .toDF("u", "l")
    assert(evals.fleissKappa(perfect, col("u"), col("l"), m = 2)
      .head().getLong(4) == 1000000L)
    // a unit with the wrong rater count must RAISE, not reweight
    val ragged = Seq((1L, 0L), (1L, 0L), (1L, 0L), (2L, 1L))
      .toDF("u", "l")
    val e = intercept[Exception] {
      evals.fleissKappa(ragged, col("u"), col("l"), m = 3).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("fixed-panel contract broken")),
      s"expected the panel raise, got: $e")
  }

  test("rougeL: hand LCS cases, order sensitivity, token cap, empty sides") {
    val pairs = Seq(
      (1L, "a b c d", "a c d e"),   // LCS "a c d" = 3
      (2L, "a b", "b a"),           // LCS 1 either way
      (3L, "", "x y"),              // empty candidate
      (4L, "x y", "x y")            // identity
    ).toDF("doc_id", "cand", "ref")
    val got = evals.rougeL(pairs, col("doc_id"), col("cand"), col("ref"))
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, 3L, 4L, 4L, 750000L)), got(0).toString)
    assert(got(1) == ((2L, 1L, 2L, 2L, 500000L)))
    assert(got(2) == ((3L, 0L, 0L, 2L, 0L)))
    assert(got(3) == ((4L, 2L, 2L, 2L, 1000000L)))
    // cap: with maxToks = 2 only the first two tokens of each side count
    val capped = evals.rougeL(pairs.where(col("doc_id") === 1L),
      col("doc_id"), col("cand"), col("ref"), maxToks = 2).head()
    // "a b" vs "a c": LCS = 1, m = n = 2 -> f = 2/4
    assert(capped.getLong(1) == 1L && capped.getLong(2) == 2L
      && capped.getLong(3) == 2L && capped.getLong(4) == 500000L,
      capped.toString)
  }

  test("kendallTau: hand-counted C/D, tie terms, grid guard raises") {
    // monotone -> tau 1; one swapped pair -> (C-D)/n0 = 1/3
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val m = evals.kendallTau(mono, col("x"), col("y")).head()
    assert(m.getLong(0) == 3L && m.getLong(1) == 3L && m.getLong(2) == 0L)
    assert(m.getDouble(5) == 1.0)
    val swap = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "y")
    val s = evals.kendallTau(swap, col("x"), col("y")).head()
    assert(s.getLong(1) == 2L && s.getLong(2) == 1L
      && s.getDouble(5) == 0.3333, s.toString)
    // x-tie: C=2, tie_x=1 -> tau-b = 2/(sqrt(2)*sqrt(3)) = 0.8165
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val t = evals.kendallTau(tied, col("x"), col("y")).head()
    assert(t.getLong(1) == 2L && t.getLong(3) == 1L && t.getLong(4) == 0L)
    assert(t.getDouble(5) == 0.8165, t.toString)
    // all-tied x: denominator hits zero -> NULL, not a crash
    val flat = Seq((7L, 1L), (7L, 2L)).toDF("x", "y")
    assert(evals.kendallTau(flat, col("x"), col("y")).head().isNullAt(5))
    // grid guard: 3 distinct cells through maxGrid=2 must RAISE
    val e = intercept[Exception] {
      evals.kendallTau(mono, col("x"), col("y"), maxGrid = 2).head()
    }
    def messages(t2: Throwable): Seq[String] =
      Option(t2).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("kendallTau joint grid exceeds")),
      s"expected the grid raise, got: $e")
  }

  test("spearman: int64 ceiling is enforced in-plan at the boundary") {
    // just UNDER the ceiling: runs, rho defined (monotone ids -> 1.0)
    val under = spark.range(evals.SpearmanMaxN)
      .selectExpr("id AS x", "id AS y")
    assert(evals.spearman(under, col("x"), col("y")).head().getDouble(4)
      == 1.0)
    // just OVER: the plan must RAISE, not silently wrap the rank moments
    val over = spark.range(evals.SpearmanMaxN + 1)
      .selectExpr("id AS x", "id AS y")
    val e = intercept[Exception] {
      evals.spearman(over, col("x"), col("y")).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("spearman int64-exactness ceiling")),
      s"expected the ceiling raise, got: $e")
  }

  test("reliabilityGrid rejects group columns that collide with internals") {
    val df = Seq((500000L, 1, "a")).toDF("p", "y", "g")
    val e = intercept[IllegalArgumentException] {
      evals.reliabilityGrid(df, col("p"), col("y"),
        Seq(col("g").as("bin")), bins = 2)
    }
    assert(e.getMessage.contains("collide with internal names"))
    // properly aliased group columns still work
    val ok = evals.reliabilityGrid(df, col("p"), col("y"),
      Seq(col("g")), bins = 2)
    assert(ok.columns.toSeq == Seq("g", "bin", "n", "pos", "conf_sum"))
  }

  test("embedF1: identity scores 10000, orthogonal tokens NULL f1, dim guard raises") {
    // 2 tokens x 2 dims; identical sides: every diagonal cosine is 1.0
    // -> maxima 10000 each, p_sum = r_sum = 20000,
    // f1 = 2*20000*20000 DIV (2*40000) = 10000
    val same = Seq((1L, Seq(1.0, 0.0, 0.0, 2.0), Seq(1.0, 0.0, 0.0, 2.0)))
      .toDF("id", "c", "r")
    val r1 = evals.embedF1(same, col("id"), col("c"), col("r"), 2, 2).head()
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) ==
      ((20000L, 20000L, 10000L)))
    // orthogonal tokens on both sides: all cosines 0 -> sums 0, f1 NULL
    val ortho = Seq((1L, Seq(1.0, 0.0, 1.0, 0.0), Seq(0.0, 1.0, 0.0, 1.0)))
      .toDF("id", "c", "r")
    val r2 = evals.embedF1(ortho, col("id"), col("c"), col("r"), 2, 2).head()
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 0L && r2.isNullAt(3))
    // mixed: cand token 0 matches ref token 1 exactly, token 1 matches
    // ref token 0 — greedy maxima still find them (permutation-invariant)
    val perm = Seq((1L, Seq(1.0, 0.0, 0.0, 1.0), Seq(0.0, 1.0, 1.0, 0.0)))
      .toDF("id", "c", "r")
    val r3 = evals.embedF1(perm, col("id"), col("c"), col("r"), 2, 2).head()
    assert(r3.getLong(3) == 10000L)
    // NULL side rows are dropped (unscorable), not nulled through
    val withNull = Seq((1L, Some(Seq(1.0, 0.0, 0.0, 1.0)), None: Option[Seq[Double]]))
      .toDF("id", "c", "r")
    assert(evals.embedF1(withNull, col("id"), col("c"), col("r"), 2, 2).count() == 0)
    // wrong element count raises in-plan rather than truncating the dot
    val short = Seq((1L, Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0, 1.0)))
      .toDF("id", "c", "r")
    val e = intercept[Exception] {
      evals.embedF1(short, col("id"), col("c"), col("r"), 2, 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("embedF1 expects 4 elements")))
  }

  test("selfBleu: identical docs score 0, disjoint docs stay unscored") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "x y z"))
      .toDF("id", "t")
    val got = evals.selfBleu(df, col("id"), col("t"), opponents = 2, maxN = 2)
      .orderBy("id").collect()
    // doc 0 vs {1, 2}: identical pair scores logbleu 0 (ln 1 terms, no
    // brevity penalty); the disjoint pair has zero unigram overlap ->
    // unscored. Same for doc 1.
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3),
      got(0).getLong(4)) == ((2L, 1L, 0L, 0L)))
    assert((got(1).getLong(1), got(1).getLong(2)) == ((2L, 1L)))
    // doc 2 overlaps neither opponent: every pair unscored, sums NULL
    assert(got(2).getLong(1) == 2L && got(2).getLong(2) == 0L)
    assert(got(2).isNullAt(3) && got(2).isNullAt(4))
    // corpora smaller than opponents+1: each doc pairs with every OTHER
    // doc once (j < n excludes self-pairing)
    val two = Seq((0L, "a b"), (1L, "a b")).toDF("id", "t")
    val g2 = evals.selfBleu(two, col("id"), col("t"), opponents = 5, maxN = 1)
      .orderBy("id").collect()
    assert(g2.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L))
  }

  test("passAtK: hand-computed estimator, degeneracies, ceiling guard") {
    // one task: n=4, c=2 → pass@1 = c/n = 0.5; pass@2 = 1 − C(2,2)/C(4,2)
    // = 5/6 → 833334 in truncated ppm (1e6 − 2e6 DIV 12 = 1e6 − 166666)
    val df = Seq((7L, true), (7L, true), (7L, false), (7L, false))
      .toDF("task", "ok")
    val r = evals.passAtK(df, col("task"), col("ok"), Seq(1, 2)).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2)) == ((4L, 2L)))
    assert(r(0).getLong(3) == 500000L && r(0).getLong(4) == 833334L)
    // degeneracies: n < k → NULL; all correct → exactly 1e6; none → 0
    val d = Seq((1L, true), (2L, true), (2L, true), (3L, false), (3L, false))
      .toDF("task", "ok")
    val g = evals.passAtK(d, col("task"), col("ok"), Seq(2))
      .orderBy("task").collect()
    assert(g(0).isNullAt(3), "n=1 < k=2 must be NULL")
    assert(g(1).getLong(3) == 1000000L && g(2).getLong(3) == 0L)
    // ceiling: k=10 caps n at 1584 — a 1585-sample task must raise
    assert(evals.passAtKMaxN(10) == 1584L)
    val big = spark.range(1585).select(lit(1L).as("task"),
      (col("id") % 2 === 0).as("ok"))
    val e = intercept[Exception] {
      evals.passAtK(big, col("task"), col("ok"), Seq(10)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("passAtK exactness ceiling")))
  }

  test("selfConsistency: majority vote, deterministic tie-break, gold match") {
    val df = Seq(
      (1L, 3L, 3L), (1L, 3L, 3L), (1L, 5L, 3L), // maj 3 (2 votes) = gold
      (2L, 1L, 2L), (2L, 2L, 2L))               // tie 1v1 → min ans 1 ≠ gold
      .toDF("task", "ans", "gold")
    val r = evals.selfConsistency(df, col("task"), col("ans"), col("gold"))
      .orderBy("task").collect()
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5)) == ((3L, 3L, 2L, 3L, 1L)))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3),
      r(1).getLong(4), r(1).getLong(5)) == ((2L, 1L, 1L, 2L, 0L)))
  }

  test("cohenKappa: textbook grid, negative kappa floors portably") {
    // classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no →
    // po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))
    val r = evals.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((50L, 35L, 1250L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5))
      == ((700000L, 500000L, 400000L)))
    // perfect disagreement on 2 rows: kappa = −1 exactly — the negative
    // branch exercises the pmod floor-division (Spark DIV alone would
    // truncate toward zero and disagree with an oracle's floor)
    val neg = evals.cohenKappa(Seq((0L, 1L), (1L, 0L)).toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    assert(neg.getLong(5) == -1000000L)
  }

  test("btRatings: 3:1 head-to-head converges to the exact 3x ratio") {
    val m = (Seq.fill(3)((1L, 2L, true)) ++ Seq((1L, 2L, false)))
      .toDF("a", "b", "win")
    val r = evals.btRatings(m, col("a"), col("b"), col("win"), iters = 3)
      .orderBy("model").collect()
    // fixed point: r1/r2 = wins ratio 3; integer rescale pins max-ish
    // model at 750000 after the first-round q=2 division (hand-traced)
    assert((r(0).getLong(1), r(0).getLong(2)) == ((4L, 3L)))
    assert(r(0).getLong(3) == 750000L && r(1).getLong(3) == 250000L)
    // self-matches and null winners are dropped, never scored
    val junk = Seq((1L, 1L, Some(true)), (1L, 2L, None))
      .toDF("a", "b", "win")
    assert(evals.btRatings(junk, col("a"), col("b"), col("win")).count() == 0L)
  }

  test("winRate: hand counts, tie-aware convention, null rows excluded") {
    val df = Seq((Some(3L), Some(1L)), (Some(2L), Some(2L)),
      (Some(1L), Some(5L)), (Some(4L), Some(0L)),
      (None: Option[Long], Some(1L))).toDF("a", "b")
    val r = evals.winRate(df, col("a"), col("b")).head()
    // 2 wins, 1 tie, 1 loss over 4 comparable rows
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 1L, 1L)))
    assert(r.getLong(4) == 500000L && r.getLong(5) == 625000L)
  }

  test("distinctNgrams: hand unique/total counts per n") {
    val df = Seq(Tuple1("a b a b"), Tuple1("a b")).toDF("text")
    val got = evals.distinctNgrams(df, col("text"), Seq(1, 2))
      .orderBy("n").collect()
    // 1-grams: 6 total, {a, b} unique; 2-grams: 4 total, {a b, b a} uniq
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) ==
      ((6L, 2L, 333333L)))
    assert((got(1).getLong(1), got(1).getLong(2), got(1).getLong(3)) ==
      ((4L, 2L, 500000L)))
  }

  test("genOverlap kernel == exploded gramCounts twin (word, unicode)") {
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat ate on the mat the cat"),
      (2L, "a a a b", "a a b b"),
      (3L, "", "x y"),
      (4L, "é … ü tok", "é ü … tok")
    ).toDF("id", "cand", "ref")
    val ns = Seq(1, 2, 3)
    val o = graft.functions.NativeExprs.genOverlap(col("cand"), col("ref"),
      ns, charMode = false)
    val kernel = df.select(col("id") +: ns.flatMap(n => Seq(
        o.getField(s"clip_$n"), o.getField(s"tot_c_$n"),
        o.getField(s"tot_r_$n"))): _*)
      .orderBy("id").collect()
    val toks = evals.tokenized(df.select(col("id").as("_id"),
      col("cand").as("_cand"), col("ref").as("_ref")))
    val exploded = evals.gramCounts(toks, ns)
      .groupBy(col("_id"), col("n"))
      .agg(sum(least(col("c"), col("r"))).as("clip"),
        sum(col("c")).as("tc"), sum(col("r")).as("tr"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (row <- kernel; (n, j) <- ns.zipWithIndex) {
      val got = (row.getLong(1 + j * 3), row.getLong(2 + j * 3),
        row.getLong(3 + j * 3))
      val want = exploded.getOrElse((row.getLong(0), n), (0L, 0L, 0L))
      assert(got == want, s"id=${row.getLong(0)} n=$n kernel=$got hof=$want")
    }
  }

  test("genOverlap char mode: codepoint grams, ASCII whitespace stripped") {
    val df = Seq((1L, "ab cd", "abcd"), (2L, "a…b", "…ab"))
      .toDF("id", "cand", "ref")
    val o = graft.functions.NativeExprs.genOverlap(col("cand"), col("ref"),
      Seq(1, 2), charMode = true)
    val got = df.select(col("id"), o.getField("clip_1"), o.getField("tot_c_1"),
        o.getField("clip_2"), o.getField("tot_c_2"))
      .orderBy("id").collect()
    // pair 1: both strip to "abcd" -> 4/4 unigrams, 3/3 bigrams
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3),
      got(0).getLong(4)) == ((4L, 4L, 3L, 3L)))
    // pair 2: unigram multisets equal ({a, ..., b}), bigrams disjoint —
    // and the ellipsis is ONE codepoint unit, not three UTF-8 bytes
    assert((got(1).getLong(1), got(1).getLong(3)) == ((3L, 0L)))
  }

  test("chrF: identity is 1.0; disjoint is 0; short side is NULL") {
    val df = Seq(
      (1L, "the cat", "the cat"),
      (2L, "aaaaaa", "bbbbbb"),
      (3L, "abc", "abcdef")
    ).toDF("id", "cand", "ref")
    val got = evals.chrF(df, col("id"), col("cand"), col("ref"),
      maxN = 4, beta = 2).orderBy("id").collect()
    assert(got(0).getLong(1) == 1000000L && got(0).getLong(2) == 1000000L
      && got(0).getDouble(3) == 1.0)
    assert(got(1).getLong(1) == 0L && got(1).isNullAt(3),
      "0/0 F-beta is NULL, precision reads exact 0")
    // cand "abc" has only n=1..3 grams -> not all 4 orders -> NULL avg
    assert(got(2).isNullAt(1))
  }

  test("wer: hand edit distances, token grain, cap, empty-ref NULL") {
    val df = Seq(
      (1L, "The CAT sat", "the cat sat"),   // identity (case-folded)
      (2L, "the dog sat", "the cat sat"),   // 1 substitution
      (3L, "the cat", "the big cat"),       // 1 deletion vs ref
      (4L, "a b c d", "x"),                 // 1 sub + 3 dels -> WER 4.0
      (5L, "left over", "")                 // empty ref: rate undefined
    ).toDF("id", "cand", "ref")
    val got = evals.wer(df, col("id"), col("cand"), col("ref"), maxToks = 32)
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 0L && got(0).getLong(4) == 0L)
    assert(got(1).getLong(1) == 1L && got(1).getLong(4) == 333333L)
    assert(got(2).getLong(1) == 1L && got(2).getLong(4) == 333333L)
    assert(got(3).getLong(1) == 4L && got(3).getLong(4) == 4000000L,
      "WER is not bounded by 1")
    assert(got(4).getLong(1) == 2L && got(4).getLong(3) == 0L
      && got(4).isNullAt(4))
    // the cap truncates BOTH prefixes before the DP: equal 2-prefixes
    val capped = evals.wer(Seq((1L, "a b c", "a b")).toDF("id", "cand", "ref"),
      col("id"), col("cand"), col("ref"), maxToks = 2).head()
    assert(capped.getLong(1) == 0L && capped.getLong(2) == 2L)
  }

  test("averagePrecision: hand terms, per-term ppm floor, no-rel NULL") {
    val runs = Seq(
      (0L, 1L, 10L, 1L), (0L, 0L, 9L, 2L), (0L, 1L, 8L, 3L), (0L, 0L, 7L, 4L),
      (1L, 0L, 5L, 1L), (1L, 0L, 4L, 2L)).toDF("qid", "rel", "s", "tie")
    val out = evals.averagePrecision(runs, col("qid"), col("rel"),
      col("s"), col("tie")).orderBy("qid").collect()
    // qid 0: relevant at ranks 1 and 3 -> terms 1e6 and (2e6 DIV 3)
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(0).getLong(3) == 1000000L + 666666L)
    assert(out(0).getLong(4) == 833333L)
    // qid 1: no relevant rows -> sum 0, AP undefined (NULL, not 0)
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L
      && out(1).isNullAt(4))
  }

  test("averagePrecision: tie column breaks equal scores deterministically") {
    // equal scores: tie asc puts the relevant row FIRST -> AP 1.0
    val runs = Seq((0L, 1L, 5L, 1L), (0L, 0L, 5L, 2L)).toDF("qid", "rel", "s", "tie")
    assert(evals.averagePrecision(runs, col("qid"), col("rel"), col("s"),
      col("tie")).head().getLong(4) == 1000000L)
  }

  test("isotonicFit: hand PAV pools, monotone passthrough, grid guard") {
    // classic violation: rates 0, 1, 0 -> PAV pools the last two to 1/2
    val v = Seq((1L, 0L), (2L, 1L), (3L, 0L)).toDF("s", "y")
    val got = evals.isotonicFit(v, col("s"), col("y")).orderBy("s").collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(0.0, 0.5, 0.5))
    // already-isotonic input passes through as empirical rates
    val mono = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)).toDF("s", "y")
    val m = evals.isotonicFit(mono, col("s"), col("y")).orderBy("s").collect()
    assert(m.map(_.getDouble(3)).toSeq == Seq(0.0, 0.5, 1.0))
    // full reversal pools everything to the global rate
    val rev = Seq((1L, 1L), (2L, 0L)).toDF("s", "y")
    assert(evals.isotonicFit(rev, col("s"), col("y")).orderBy("s")
      .collect().map(_.getDouble(3)).toSeq == Seq(0.5, 0.5))
    // the pair stage squares the grid -> in-plan guard raises past it;
    // pin the raise_error TEXT so an unrelated failure can't pass
    val e = intercept[Exception] {
      evals.isotonicFit(v, col("s"), col("y"), maxGrid = 2).collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("isotonicFit score grid exceeds maxGrid"))
  }

  test("isotonicApply: step lookup between grid points, below-min clamp") {
    val curve = Seq((10L, 0.2), (20L, 0.5), (30L, 0.9)).toDF("s", "fit_q6")
    val scored = Seq(5L, 10L, 15L, 25L, 99L).toDF("sc")
    val got = evals.isotonicApply(scored, curve, col("sc")).orderBy("sc")
      .collect().map(_.getDouble(1)).toSeq
    // 5 clamps below-min to the first fit; 15/25 step DOWN to the
    // largest grid point <= score; 99 holds the last fit past the grid
    assert(got == Seq(0.2, 0.2, 0.2, 0.5, 0.9))
    // an EMPTY curve surfaces NULL, not a crash (try_element_at path)
    val empty = curve.where(col("s") < 0L)
    assert(evals.isotonicApply(scored, empty, col("sc"))
      .where(col("calibrated_q6").isNotNull).count() == 0L)
  }

  test("bootstrapCI: CDF table pinned; constant column collapses the band; laws") {
    // the driver-literal Poisson(1) CDF table equals its definition
    val fact = (0 to 8).map(k => (0 to k).map(i =>
      1.0 / (1 to i).foldLeft(1.0)(_ * _)).sum)
    val want = fact.map(s => math.floor(math.exp(-1.0) * s * 1e6).toLong)
    assert(evals.PoissonCdfPpm == want, s"table drifted: $want")
    // a constant metric has zero sampling variance: every replicate
    // mean is the constant, so lo = mean = hi exactly
    val const = (1L to 50L).map(i => (i, 7L)).toDF("id", "x")
    val c = evals.bootstrapCI(const, col("id"), col("x"), b = 50).head()
    assert(c.getLong(0) == 50L && c.getLong(1) == 50L)
    assert(c.getDouble(2) == 7.0 && c.getDouble(3) == 7.0
      && c.getDouble(4) == 7.0, c.toString)
    // a mixed column: band brackets the point mean, deterministic
    val mixed = (1L to 200L).map(i => (i, i % 10)).toDF("id", "x")
    val m1 = evals.bootstrapCI(mixed, col("id"), col("x"), b = 100).head()
    val m2 = evals.bootstrapCI(mixed, col("id"), col("x"), b = 100).head()
    assert(m1 == m2, "bootstrap must be a pure function of the data")
    assert(m1.getDouble(3) <= m1.getDouble(2)
      && m1.getDouble(2) <= m1.getDouble(4), m1.toString)
    assert(m1.getDouble(3) < m1.getDouble(4), "band must have width here")
    intercept[IllegalArgumentException] {
      evals.bootstrapCI(mixed, col("id"), col("x"), b = 1)
    }
    // grouped form: each stratum's card equals running the ungrouped
    // form on that stratum alone (groups never contaminate each other)
    val grouped = (1L to 120L).map(i => (i, if (i % 3 == 0) "a" else "b",
      i % 7)).toDF("id", "g", "x")
    val byG = evals.bootstrapCIBy(grouped, Seq("g"), col("id"), col("x"),
        b = 50).orderBy("g").collect()
    Seq("a", "b").zipWithIndex.foreach { case (g, i) =>
      val solo = evals.bootstrapCI(grouped.where(col("g") === g),
        col("id"), col("x"), b = 50).head()
      assert(byG(i).getLong(1) == solo.getLong(0)
        && byG(i).getDouble(3) == solo.getDouble(2)
        && byG(i).getDouble(4) == solo.getDouble(3)
        && byG(i).getDouble(5) == solo.getDouble(4),
        s"group $g: ${byG(i)} vs $solo")
    }
  }

  test("bootstrapRatioCI: ratio of sums, mean-equivalence law, null-id law") {
    // point = Σnum/Σden, band brackets it, pure function of the data
    val df = (1L to 200L).map(i => (i, i % 10 + 1, i % 3 + 1))
      .toDF("id", "num", "den")
    val r1 = evals.bootstrapRatioCI(df, col("id"), col("num"), col("den"),
      b = 100).head()
    val r2 = evals.bootstrapRatioCI(df, col("id"), col("num"), col("den"),
      b = 100).head()
    assert(r1 == r2)
    val num = (1L to 200L).map(i => i % 10 + 1).sum.toDouble
    val den = (1L to 200L).map(i => i % 3 + 1).sum.toDouble
    val wantPoint = math.floor(num / den * 1e6 + 0.5) / 1e6
    assert(r1.getAs[Double]("ratio_q6") == wantPoint, r1.toString)
    assert(r1.getAs[Double]("lo_q6") <= wantPoint
      && wantPoint <= r1.getAs[Double]("hi_q6"))
    // mean-equivalence: denominator 1 reproduces bootstrapCI EXACTLY
    // (same weights, same replicate values, same band)
    val mixed = (1L to 200L).map(i => (i, i % 10)).toDF("id", "x")
    val mean = evals.bootstrapCI(mixed, col("id"), col("x"), b = 100).head()
    val ratio = evals.bootstrapRatioCI(mixed, col("id"), col("x"), lit(1L),
      b = 100).head()
    assert(ratio.getAs[Double]("ratio_q6") == mean.getAs[Double]("mean_q6"))
    assert(ratio.getAs[Double]("lo_q6") == mean.getAs[Double]("lo_q6"))
    assert(ratio.getAs[Double]("hi_q6") == mean.getAs[Double]("hi_q6"))
    // a null id row is excluded from BOTH the point and the replicates
    // (the round-14 advice law), so it changes nothing it half-counts in
    val withNull = (1L to 200L).map(i => (Some(i), i % 10 + 1, i % 3 + 1))
      .toDF("id", "num", "den")
      .union(Seq((Option.empty[Long], 999999L, 1L)).toDF("id", "num", "den"))
    val rn = evals.bootstrapRatioCI(withNull, col("id"), col("num"),
      col("den"), b = 100).head()
    assert(rn == r1, s"null id leaked: $rn vs $r1")
    // grouped form matches per-stratum solo runs
    val grouped = (1L to 120L).map(i => (i, if (i % 3 == 0) "a" else "b",
      i % 7 + 1, i % 5 + 1)).toDF("id", "g", "num", "den")
    val byG = evals.bootstrapRatioCIBy(grouped, Seq("g"), col("id"),
      col("num"), col("den"), b = 50).orderBy("g").collect()
    Seq("a", "b").zipWithIndex.foreach { case (g, i) =>
      val solo = evals.bootstrapRatioCI(grouped.where(col("g") === g),
        col("id"), col("num"), col("den"), b = 50).head()
      assert(byG(i).getAs[Double]("ratio_q6") == solo.getAs[Double]("ratio_q6"))
      assert(byG(i).getAs[Double]("lo_q6") == solo.getAs[Double]("lo_q6"))
      assert(byG(i).getAs[Double]("hi_q6") == solo.getAs[Double]("hi_q6"))
    }
  }

  test("bootstrapCI as cluster bootstrap: group-keyed hashing widens the band") {
    // two clusters with very different means: resampling CLUSTERS
    // (group id as the hash key) must see the between-cluster variance
    // a row-level resample of 200 rows averages away
    val rows = (1L to 100L).map(i => (i, "s1", 10L)) ++
      (101L to 200L).map(i => (i, "s2", 90L))
    val df = rows.toDF("id", "src", "x")
    val byRow = evals.bootstrapCI(df, col("id"), col("x"), b = 100).head()
    val byCluster = evals.bootstrapCI(df, col("src"), col("x"), b = 100).head()
    val rowW = byRow.getDouble(4) - byRow.getDouble(3)
    val clW = byCluster.getDouble(4) - byCluster.getDouble(3)
    assert(clW > rowW,
      s"cluster band ($clW) must exceed row band ($rowW)")
    // cluster-constant weights: each replicate mean is a weighted mix
    // of exactly {10, 90}, so the band endpoints stay inside [10, 90]
    assert(byCluster.getDouble(3) >= 10.0 && byCluster.getDouble(4) <= 90.0)
  }

  test("pairedBootstrap: dominant system wins every replicate; equal systems tie") {
    // A beats B by exactly 3 on EVERY row: every replicate difference
    // is 3 regardless of weights -> band collapses, win rate 100%
    val dom = (1L to 100L).map(i => (i, i + 3, i)).toDF("id", "a", "b")
    val d = evals.pairedBootstrap(dom, col("id"), col("a"), col("b"),
      b = 100).head()
    assert(d.getLong(0) == 100L && d.getDouble(2) == 3.0)
    assert(d.getDouble(3) == 3.0 && d.getDouble(4) == 3.0)
    assert(d.getLong(5) == 1000000L, d.toString)
    // identical systems: zero difference, zero wins
    val eq = (1L to 100L).map(i => (i, i, i)).toDF("id", "a", "b")
    val e = evals.pairedBootstrap(eq, col("id"), col("a"), col("b"),
      b = 100).head()
    assert(e.getDouble(2) == 0.0 && e.getLong(5) == 0L, e.toString)
  }

  test("brierDecomp: miscalibration lands in REL, separation in RES = UNC") {
    // one bin, conf 0.25 vs acc 0.5 -> REL = 0.25^2 in q12, RES 0
    val miscal = Seq((250000L, 0L), (250000L, 0L), (250000L, 1L),
      (250000L, 1L)).toDF("p", "y")
    val m = evals.brierDecomp(miscal, col("p"), col("y"), bins = 2).head()
    assert(m.getLong(2) == 500000L)
    assert(m.getLong(3) == 62500000000L && m.getLong(4) == 0L)
    assert(m.getLong(5) == 250000000000L)
    // perfectly separated and calibrated: REL 0, RES = UNC exactly
    val sep = Seq((0L, 0L), (0L, 0L), (1000000L, 1L), (1000000L, 1L))
      .toDF("p", "y")
    val s = evals.brierDecomp(sep, col("p"), col("y"), bins = 2).head()
    assert(s.getLong(3) == 0L && s.getLong(4) == s.getLong(5))
  }

  test("rboAtD: identical ranking = 1-p^D, reversal pays the tail weight") {
    // p=0.5, depth=2: S(1)=0.625e9, S(2)=0.125e9 (exact in q9)
    assert(evals.rboWeights(500000L, 2) == Seq(625000000L, 125000000L))
    val runs = Seq(
      (0L, 1L, 9L, 9L), (0L, 2L, 8L, 8L),  // qid 0: identical rankings
      (1L, 1L, 9L, 1L), (1L, 2L, 8L, 2L)   // qid 1: reversed
    ).toDF("qid", "doc", "sa", "sb")
    val got = evals.rboAtD(runs, col("qid"), col("doc"), col("sa"),
      col("sb"), pPpm = 500000L, depth = 2).orderBy("qid").collect()
    // identical: S(1)+S(2) = 0.75e9 = 1 - p^D exactly
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 750000000L)
    // reversed: both docs agree only at depth 2 -> 2*S(2)
    assert(got(1).getLong(1) == 2L && got(1).getLong(2) == 250000000L)
    // disjoint top-D surfaces an EXPLICIT zero row (RBO@D = 0 is
    // well-defined; dropping the qid would overstate a downstream mean)
    val disjoint = Seq((0L, 1L, 9L, 1L), (0L, 2L, 1L, 9L))
      .toDF("qid", "doc", "sa", "sb")
    val dj = evals.rboAtD(disjoint, col("qid"), col("doc"), col("sa"),
      col("sb"), pPpm = 500000L, depth = 1).collect()
    assert(dj.length == 1 && dj(0).getLong(1) == 0L
      && dj(0).getLong(2) == 0L)
  }

  test("adjustedRand: relabel-invariant 1, chance 0, hand negative case") {
    // permuted labels are a perfect clustering match -> ARI exactly 1
    val perfect = Seq((0L, 1L), (0L, 1L), (1L, 0L), (1L, 0L)).toDF("a", "b")
    assert(evals.adjustedRand(perfect, col("a"), col("b"))
      .head().getLong(4) == 1000000L)
    // one side constant -> numerator cancels exactly -> ARI 0
    val const = Seq((0L, 9L), (0L, 9L), (1L, 9L), (2L, 9L)).toDF("a", "b")
    assert(evals.adjustedRand(const, col("a"), col("b"))
      .head().getLong(4) == 0L)
    // crossed 2x2 design: S_ij=0, S_a=S_b=2, C=6 -> ARI = -1/2 (floors
    // portably on the negative branch)
    val crossed = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)).toDF("a", "b")
    val r = evals.adjustedRand(crossed, col("a"), col("b")).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == -500000L)
    // degenerate: both sides one cluster -> den 0 -> NULL, not 0
    val degen = Seq((0L, 0L), (0L, 0L)).toDF("a", "b")
    assert(evals.adjustedRand(degen, col("a"), col("b")).head().isNullAt(4))
  }

  test("krippendorffAlpha: hand coincidence case; singletons drop; identity 1") {
    // u1 [a,a] agree, u2 [a,b] disagree, u3 [b,b] agree, u9 [c] dropped:
    // Do = 2 (q6 2e6), marginals a=3 b=3 -> de_num = 36-18 = 18,
    // alpha = 1 - 2*5/18 = 0.4444 (coincidence-matrix hand computation)
    val r = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L), (3L, 1L),
      (9L, 2L)).toDF("u", "l")
    val Row(nu: Long, nt: Long, doq: Long, de: Long, a: Double) =
      evals.krippendorffAlpha(r, col("u"), col("l")).head()
    assert(nu == 3L && nt == 6L, "singleton unit must drop")
    assert(doq == 2000000L && de == 18L)
    assert(a == 0.4444)
    val perfect = Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L)).toDF("u", "l")
    assert(evals.krippendorffAlpha(perfect, col("u"), col("l"))
      .head().getDouble(4) == 1.0)
  }

  test("krippendorffAlpha: variable panel sizes weight by 1/(m-1) exactly") {
    // u1 has 3 ratings [a,a,b]: (9 - 5) * 1e6 DIV 2 = 2e6;
    // u2 has 2 ratings [a,b]: (4 - 2) * 1e6 DIV 1 = 2e6
    val r = Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)).toDF("u", "l")
    val row = evals.krippendorffAlpha(r, col("u"), col("l")).head()
    assert(row.getLong(2) == 4000000L, s"do_q6 = ${row.getLong(2)}")
    // marginals a=3 b=2 over n=5 -> de_num = 25 - 13 = 12
    assert(row.getLong(3) == 12L)
    // alpha = 1 - 4*4/12 = -1/3 -> floor(-3333.33 + 0.5)/1e4 = -0.3333
    assert(row.getDouble(4) == -0.3333)
  }

  test("krippendorffAlpha: per-unit int64 ceiling raises at the offending unit") {
    // one unit with > 3e6 ratings: its (mu² − sq)·1e6 Do term would wrap
    // int64 even though n_total is far below the 3e9 total ceiling —
    // the in-plan guard must raise, and with ITS text (pin the message
    // so an unrelated exception can't pass the test)
    val big = spark.range(3000001L)
      .select(lit(1L).as("u"), (col("id") % 2L).as("l"))
    val e = intercept[Exception] {
      evals.krippendorffAlpha(big, col("u"), col("l")).collect()
    }
    assert(Option(e.getMessage).getOrElse("")
      .contains("per-unit int64-exactness ceiling"), e.getMessage)
    // and exactly AT the ceiling it still computes (no false raise)
    val ok = spark.range(3000000L)
      .select(lit(1L).as("u"), (col("id") % 2L).as("l"))
    val row2 = evals.krippendorffAlpha(ok, col("u"), col("l")).head()
    assert(row2.getLong(1) == 3000000L)
  }

  test("cohensD: hand-computed pooled effect; degenerate variance null") {
    // A = {2,4,6}, B = {1,2,3}: means 4 and 2, SS_A = 8, SS_B = 2,
    // sp2 = 10/4 = 2.5, d = 2/sqrt(2.5) = 1.264911 -> q4 1.2649;
    // g = d*(1 - 3/(4*4-1)) = d*12/15 -> 1.0119
    val df = (Seq(2L, 4L, 6L).map((_, 1)) ++ Seq(1L, 2L, 3L).map((_, 0)))
      .toDF("v", "g")
    val r = evals.cohensD(df, col("v"), col("g") === 1).head()
    assert((r.getLong(0), r.getLong(1)) == (3L, 3L))
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.2649, s"d = ${r.getDouble(4)}")
    assert(r.getDouble(5) == 1.0119, s"g = ${r.getDouble(5)}")
    // all-constant values: pooled variance 0 -> d null
    val const = (1 to 6).map(i => (5L, i % 2)).toDF("v", "g")
    assert(evals.cohensD(const, col("v"), col("g") === 1).head().isNullAt(4))
  }

  test("welchT: hand-computed t and Satterthwaite df; degenerate null") {
    // A = {2,4,6}: v = 4, w = 4/3; B = {1,2,3}: v = 1, w = 1/3
    // t = 2/sqrt(5/3) = 1.549193 -> 1.5492
    // df = (5/3)^2 / ((4/3)^2/2 + (1/3)^2/2) = 50/17 = 2.9411 -> 2.94
    val df = (Seq(2L, 4L, 6L).map((_, 1)) ++ Seq(1L, 2L, 3L).map((_, 0)))
      .toDF("v", "g")
    val r = evals.welchT(df, col("v"), col("g") === 1).head()
    assert(r.getDouble(4) == 1.5492, s"t = ${r.getDouble(4)}")
    assert(r.getDouble(5) == 2.94, s"df = ${r.getDouble(5)}")
    // symmetric equal groups: t = 0, df = 2(n-1)
    val sym = (Seq(1L, 3L).map((_, 1)) ++ Seq(1L, 3L).map((_, 0)))
      .toDF("v", "g")
    val s = evals.welchT(sym, col("v"), col("g") === 1).head()
    assert(s.getDouble(4) == 0.0 && s.getDouble(5) == 2.0)
    // constant data: both variances 0 -> t null
    val const = (1 to 6).map(i => (5L, i % 2)).toDF("v", "g")
    assert(evals.welchT(const, col("v"), col("g") === 1).head().isNullAt(4))
  }

  test("mcnemar: only discordant cells count; no-evidence null") {
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(10)((false, false)) ++
      Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true))
    val r = evals.mcnemar(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (38L, 20L, 10L))
    assert((r.getLong(3), r.getLong(4)) == (6L, 2L))
    // chi2 = (6-2)^2 / 8 = 2.0
    assert(r.getLong(5) == 2000000L)
    // perfect agreement: b = c = 0 -> no evidence, chi2 null
    val agree = Seq.fill(5)((true, true)).toDF("a", "b")
    assert(evals.mcnemar(agree, col("a"), col("b")).head().isNullAt(5))
    // int64-exactness ceiling is ENFORCED in-plan, not just documented
    val big = spark.range(evals.McnemarMaxDiscordant + 1)
      .select(lit(true).as("a"), lit(false).as("b"))
    val e = intercept[Exception] {
      evals.mcnemar(big, col("a"), col("b")).head()
    }
    assert(e.getMessage.contains("mcnemar int64-exactness ceiling"),
      e.getMessage)
  }

  test("wilsonInterval: brackets p; sane at the k=0 and k=n extremes") {
    val half = (1 to 100).map(i => i <= 50).toDF("s")
    val r = evals.wilsonInterval(half, col("s")).head()
    assert((r.getLong(0), r.getLong(1)) == (100L, 50L))
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) < 0.5 && r.getDouble(4) > 0.5)
    assert(r.getDouble(3) > 0.40 && r.getDouble(4) < 0.60)
    // k = 0: the naive interval collapses to [0,0]; Wilson's upper
    // bound stays positive while the lower clamps to 0
    val none = (1 to 20).map(_ => false).toDF("s")
    val z = evals.wilsonInterval(none, col("s")).head()
    assert(z.getDouble(3) == 0.0 && z.getDouble(4) > 0.1)
    val all = (1 to 20).map(_ => true).toDF("s")
    val o = evals.wilsonInterval(all, col("s")).head()
    assert(o.getDouble(4) == 1.0 && o.getDouble(3) < 0.9)
  }

  test("winsorizedMean: exact rank bounds; the outlier clamps to the band") {
    // 1..10 at the default 5%/95%: ranks 1 and 10 -> no clamping
    val plain = (1 to 10).map(_.toLong).toDF("v")
    val r = evals.winsorizedMean(plain, col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (10L, 1L, 10L))
    assert(r.getDouble(3) == 5.5)
    // 1..9 plus a 1000-outlier at 10%/90%: bounds are ranks 2 and 9
    // (values 2 and 9); clamped series sums to 55 -> same 5.5 mean
    val out = ((1 to 9).map(_.toLong) :+ 1000L).toDF("v")
    val o = evals.winsorizedMean(out, col("v"), loPpm = 100000L,
      hiPpm = 900000L).head()
    assert((o.getLong(1), o.getLong(2)) == (2L, 9L))
    assert(o.getDouble(3) == 5.5)
    // the unwinsorized mean would have been 104.5 — the point
    intercept[IllegalArgumentException] {
      evals.winsorizedMean(plain, col("v"), loPpm = 600000L,
        hiPpm = 500000L)
    }
  }

  test("mannWhitney: disjoint samples give extreme U; identical give z 0") {
    // A = {11..20}, B = {1..10}: every A beats every B -> U_A = 100,
    // u2_a = 200; mu2 = 100; no ties -> positive z
    val sep = ((1 to 10).map(v => (v.toLong, 0)) ++
      (11 to 20).map(v => (v.toLong, 1))).toDF("v", "g")
    val r = evals.mannWhitney(sep, col("v"), col("g")).head()
    assert((r.getLong(0), r.getLong(1)) == (10L, 10L))
    assert(r.getLong(2) == 200L && r.getLong(3) == 100L)
    assert(r.getDouble(4) > 3.0)
    // same multiset in both groups: U = mean, z = 0 (tie-corrected)
    val same = ((1 to 10).map(v => (v.toLong, 0)) ++
      (1 to 10).map(v => (v.toLong, 1))).toDF("v", "g")
    val r2 = evals.mannWhitney(same, col("v"), col("g")).head()
    assert(r2.getLong(2) == r2.getLong(3))
    assert(r2.getDouble(4) == 0.0)
  }

  test("permTest: overwhelming effect -> small p; exchangeable null -> p = 1") {
    val eff = ((1 to 40).map(i => (i.toLong, 100L, 1)) ++
      (41 to 80).map(i => (i.toLong, 0L, 0))).toDF("id", "v", "g")
    val r = evals.permTest(eff, col("id"), col("v"), col("g") === 1,
      reps = 100).head()
    assert((r.getLong(1), r.getLong(2)) == (40L, 40L))
    assert(r.getDouble(4) == 100.0)
    assert(r.getLong(5) < 100000L, s"p_ppm = ${r.getLong(5)}")
    // identical values everywhere: observed gap 0, every replicate's
    // |gap| >= 0 -> add-one p is exactly 1
    val nul = (1 to 80).map(i => (i.toLong, 7L, i % 2)).toDF("id", "v", "g")
    val r2 = evals.permTest(nul, col("id"), col("v"), col("g") === 1,
      reps = 100).head()
    assert(r2.getLong(5) == 1000000L)
    // deterministic: identical reruns agree cell-for-cell
    val again = evals.permTest(eff, col("id"), col("v"), col("g") === 1,
      reps = 100).head()
    assert(again.getLong(5) == r.getLong(5))
  }

  test("bhAdjust: textbook step-up ladder with the running-min tail") {
    val ps = Seq(("a", 10000L), ("b", 20000L), ("c", 30000L),
      ("d", 400000L), ("e", 800000L)).toDF("k", "p")
    val got = evals.bhAdjust(ps, Seq("k"), col("p"), qPpm = 50000L)
      .orderBy("rank")
      .select("k", "p_ppm", "rank", "m", "p_adj_ppm", "rejected")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // raw = p*5/k: 50000, 50000, 50000, 500000, 800000; back-min keeps
    // them; reject first three at q = 50000
    assert(got == Seq(
      ("a", 10000L, 1L, 5L, 50000L, 1L),
      ("b", 20000L, 2L, 5L, 50000L, 1L),
      ("c", 30000L, 3L, 5L, 50000L, 1L),
      ("d", 400000L, 4L, 5L, 500000L, 0L),
      ("e", 800000L, 5L, 5L, 800000L, 0L)))
    // a small late p drags every earlier adjusted p down via the min
    val ps2 = Seq(("a", 600000L), ("b", 100000L)).toDF("k", "p")
    val g2 = evals.bhAdjust(ps2, Seq("k"), col("p"), qPpm = 250000L)
      .orderBy("rank")
      .select("k", "p_adj_ppm", "rejected")
      .as[(String, Long, Long)].collect().toSeq
    // rank1 = b: raw 200000; rank2 = a: raw 600000 -> adj (200000, 600000)
    assert(g2 == Seq(("b", 200000L, 1L), ("a", 600000L, 0L)))
  }
}
