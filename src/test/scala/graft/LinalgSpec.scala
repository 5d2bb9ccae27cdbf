package graft

import org.apache.spark.sql.functions._

import graft.ops.linalg

/** Known-answer tests for the Gram/PCA primitives. */
class LinalgSpec extends SparkSpec {
  import spark.implicits._

  test("gram: exact integer entries on hand vectors") {
    // rows (1.0, 2.0) and (0.5, -1.0); q=10 -> quantized (10,20), (5,-10)
    val df = Seq(Seq(1.0, 2.0), Seq(0.5, -1.0)).toDF("v")
    val g = linalg.gram(df, "v", dim = 2, q = 10L)
      .orderBy("i", "j").as[(Int, Int, Long, Long)].collect().toSeq
    // G00 = 100+25, G01 = 200-50, G11 = 400+100
    assert(g == Seq((0, 0, 2L, 125L), (0, 1, 2L, 150L), (1, 1, 2L, 500L)))
  }

  test("gram: wrong-dim and null vectors are excluded, not mangled") {
    val df = Seq(Some(Seq(1.0, 1.0)), Some(Seq(1.0)), None)
      .toDF("v")
    val g = linalg.gram(df, "v", dim = 2, q = 10L).collect()
    assert(g.forall(_.getLong(2) == 1L), "only the dim-2 row counts")
  }

  test("pcaTopComponent: recovers the dominant axis of a diagonal Gram") {
    // Gram = diag(100, 1): top component is e0 up to sign (fixed +).
    val gramDf = Seq((0, 0, 2L, 100L), (0, 1, 2L, 0L), (1, 1, 2L, 1L))
      .toDF("i", "j", "n", "g")
    val pc = linalg.pcaTopComponent(gramDf, dim = 2)
    assert(math.abs(pc(0) - 1.0) < 1e-12 && math.abs(pc(1)) < 1e-12)
  }

  test("pcaTopComponent + project: separates a planted 2-cluster corpus") {
    // cluster A along +x, cluster B along +y; top PC of the SECOND
    // moment matrix lands in the x/y plane and project() separates
    // nothing orthogonal (z stays ~0).
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) Seq(1.0 + 0.01 * i, 0.1, 0.0)
      else Seq(0.1, 0.5, 0.0)
    }
    val df = rows.toDF("v")
    val pc = linalg.pcaTopComponent(linalg.gram(df, "v", dim = 3), dim = 3)
    assert(math.abs(pc(2)) < 1e-9, "unused dim gets ~0 weight")
    val scores = df.select(linalg.project(col("v"), pc).as("s"))
      .as[Double].collect()
    assert(scores.forall(s => !s.isNaN))
    // A-rows (larger x) score strictly above B-rows under the top PC
    val (a, b) = scores.zipWithIndex.partition(_._2 % 2 == 0)
    assert(a.map(_._1).min > b.map(_._1).max)
  }

  test("linearProbeTrain: hand-computed GD steps on a separable fixture") {
    // qx = +-100 at q=100; y follows sign. Round 1 from w=0:
    // g = sum qx*(0 - y*1e8) = 2 * 100 * (-1e8) = -2e10;
    // dw = -g/(q^2*n) = 2e10/(1e4*4) = 5e5. Round 2: pos resid -5e7,
    // neg resid -5e7, gradients cancel exactly -> w stays put.
    val df = Seq((Seq(1.0), 1L), (Seq(1.0), 1L), (Seq(-1.0), 0L),
      (Seq(-1.0), 0L)).toDF("v", "label")
    val w1 = linalg.linearProbeTrain(df, "v", col("label") === 1L,
      dims = 1, iters = 1).head()
    assert(w1.getLong(1) == 500000L, "first step exactly as computed")
    val w2 = linalg.linearProbeTrain(df, "v", col("label") === 1L,
      dims = 1, iters = 2).head()
    assert(w2.getLong(1) == 500000L, "gradients cancel at equilibrium")
    val w0 = linalg.linearProbeTrain(df, "v", col("label") === 1L,
      dims = 1, iters = 0).head()
    assert(w0.getLong(1) == 0L, "zero iterations -> zero weights")
  }

  test("linearProbeTrain: trained probe separates the planted classes") {
    val rows = (0 until 40).map { i =>
      if (i % 2 == 0) (Seq(0.8 + 0.001 * i, -0.2), 1L)
      else (Seq(-0.7 - 0.001 * i, 0.3), 0L)
    }
    val df = rows.toDF("v", "label")
    val w = linalg.linearProbeTrain(df, "v", col("label") === 1L,
        dims = 2, iters = 3)
      .orderBy("j").as[(Int, Long)].collect().map(_._2)
    val scores = rows.map { case (v, y) =>
      (v(0) * w(0) + v(1) * w(1), y)
    }
    val posMin = scores.filter(_._2 == 1L).map(_._1).min
    val negMax = scores.filter(_._2 == 0L).map(_._1).max
    assert(posMin > negMax, s"probe separates: posMin=$posMin negMax=$negMax")
  }

  test("kmeansFit: planted clusters recovered; Lloyd never increases inertia") {
    // two tight blobs far apart; init = ids 0 and 1 (one per blob)
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i.toLong, Seq(base + 0.001 * i, base))
    }
    val df = rows.toDF("id", "v")
    val r2 = graft.ops.linalg.kmeansFit(df, "v", "id", dim = 2, k = 2,
      iters = 2).orderBy("cluster").collect()
    assert(r2.map(_.getLong(1)).toSeq == Seq(10L, 10L), "blobs split evenly")
    val inertia0 = graft.ops.linalg.kmeansFit(df, "v", "id", 2, 2, iters = 0)
      .agg(sum("inertia")).head().getLong(0)
    val inertia2 = r2.map(_.getLong(2)).sum
    assert(inertia2 <= inertia0, "Lloyd iterations never increase inertia")
  }

  test("kmeansFit: an emptied cluster keeps its previous centroid") {
    // k=3 but only two distinct points: one centroid starves and must
    // keep its init value rather than divide by zero
    val df = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(-1.0, 0.0))).toDF("id", "v")
    val got = graft.ops.linalg.kmeansFit(df, "v", "id", dim = 2, k = 3,
      iters = 2).collect()
    assert(got.map(_.getLong(1)).sum == 4L, "all rows assigned somewhere")
  }

  test("anisotropy: axis-aligned corpus scores 0, correlated corpus high") {
    // one-hot rows -> diagonal Gram -> zero off-diagonal mass
    val axis = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)).toDF("v")
    val a = linalg.anisotropy(linalg.gram(axis, "v", dim = 2, q = 10L)).head()
    assert(a.getLong(1) == 0L && a.getDouble(2) == 0.0)
    // every row on the diagonal direction -> |offdiag| = trace
    val cone = Seq(Seq(1.0, 1.0), Seq(2.0, 2.0)).toDF("v")
    val c = linalg.anisotropy(linalg.gram(cone, "v", dim = 2, q = 10L)).head()
    assert(c.getLong(1) == c.getLong(0), "offdiag mass equals trace")
    assert(c.getDouble(2) == 1.0)
  }

  test("momentGrid: exact integer sums; wrong-dim and null rows excluded") {
    val df = Seq(Some(Seq(0.25, 0.5)), Some(Seq(0.75, -0.5)),
      Some(Seq(1.0)), None).toDF("v")
    val g = linalg.momentGrid(df, "v", dim = 2, q = 100L)
      .orderBy("pos").as[(Int, Long, Long, Long)].collect().toSeq
    // quantized rows: (25, 50), (75, -50)
    assert(g == Seq((0, 2L, 100L, 25 * 25 + 75 * 75L),
      (1, 2L, 0L, 2L * 50 * 50)))
  }

  test("embedDrift: 0 on identical corpora; exact mean-shift readout") {
    val a = Seq(Seq(0.25, 0.5), Seq(0.25, 0.5)).toDF("v")
    val b = Seq(Seq(0.5, 0.5), Seq(0.5, 0.5)).toDF("v")
    val ga = linalg.momentGrid(a, "v", dim = 2)
    val gb = linalg.momentGrid(b, "v", dim = 2)
    val self = linalg.embedDrift(ga, ga).head()
    assert(self.getDouble(3) == 0.0 && self.getDouble(4) == 0.0)
    val r = linalg.embedDrift(ga, gb).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    // dim-0 means 0.25 vs 0.5 (both exact in binary): mmd2 = 0.0625;
    // zero variance on both sides
    assert(r.getDouble(3) == 0.0625, s"mmd2: $r")
    assert(r.getDouble(4) == 0.0, s"vargap: $r")
    // symmetry of both readouts
    val rev = linalg.embedDrift(gb, ga).head()
    assert(rev.getDouble(3) == r.getDouble(3)
      && rev.getDouble(4) == r.getDouble(4))
  }
}
