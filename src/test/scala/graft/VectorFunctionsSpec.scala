package graft

import org.apache.spark.sql.functions._

import graft.functions.vectors._

/** Scoring-kernel semantics, mirroring the reference's hand-computed cases
  * (/root/reference/tests/vec_store_tests.rs — see FIXTURES.md §A1). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def scores(vs: Seq[Seq[Double]], expr: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Double] =
    vs.toDF("v").select(expr(col("v")).as("s")).as[Double].collect().toSeq

  test("cosine: parallel / anti-parallel / orthogonal / 45-degree") {
    val vs = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0))
    val q = vecLit(Seq(1.0, 0.0))
    val got = scores(vs, v => cosineSimilarity(v, q))
    val exp = Seq(1.0, -1.0, 0.0, math.sqrt(2) / 2)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
  }

  test("euclidean is SQUARED L2 — 3-4-5 triangle stays 25, no sqrt") {
    val vs = Seq(Seq(0.0, 0.0), Seq(3.0, 4.0), Seq(1.0, 1.0), Seq(0.0, 5.0), Seq(-3.0, -4.0))
    val got = scores(vs, v => l2Squared(v, vecLit(Seq(0.0, 0.0))))
    assert(got == Seq(0.0, 25.0, 2.0, 25.0, 25.0))
  }

  test("dot products vs hand-computed values") {
    val vs = Seq(Seq(2.0, 3.0, 1.0), Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 0.0, 1.0), Seq(-1.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0))
    val got = scores(vs, v => dotProduct(v, vecLit(Seq(2.0, 3.0, 1.0))))
    assert(got == Seq(14.0, 2.0, 3.0, 1.0, -2.0, 6.0))
  }

  test("zero vector: cosine scores 0.0, never NaN (ref vec.rs:365-368)") {
    val got = scores(Seq(Seq(0.0, 0.0), Seq(1.0, 0.0)),
      v => cosineSimilarity(v, vecLit(Seq(0.0, 0.0))))
    assert(got == Seq(0.0, 0.0))
    val inv = scores(Seq(Seq(0.0, 0.0)), v => invNorm(v))
    assert(inv == Seq(0.0))
  }

  test("float input arrays are upcast to double before accumulation") {
    val df = Seq(Tuple1(Seq(0.1f, 0.2f))).toDF("v")
    val s = df.select(dotProduct(col("v"), col("v")).as("s")).as[Double].head()
    // f32 0.1/0.2 widened to double, then double math
    assert(math.abs(s - (0.1f.toDouble * 0.1f.toDouble + 0.2f.toDouble * 0.2f.toDouble)) == 0.0)
  }

  test("quantize: column form == driver twin, incl. negatives and boundaries") {
    val xs = Seq(0.0, -0.0, 1.23456, -1.23456, 0.00005, -0.00005,
      0.99995, 2.5e-5, -3.14159265, 123.456789)
    val viaCol = xs.toDF("x")
      .select(quantize(col("x"), 4).as("q"))
      .collect().map(_.getDouble(0)).toSeq
    val viaDriver = xs.map(quantizeOf(_, 4))
    assert(viaCol == viaDriver)
    // never -0.0 (the oracle hash distinguishes signed zero)
    assert(viaCol.forall(v => !(v == 0.0 && 1.0 / v < 0)))
  }

  test("invNormOf matches the column expression fold") {
    val q = Seq(0.3, -1.7, 2.9, 0.0001)
    val colInv = scores(Seq(q), v => invNorm(v)).head
    assert(math.abs(colInv - invNormOf(q)) < 1e-15)
  }

  test("rpMatrix: deterministic ±1 entries, stable across calls") {
    val p = rpMatrix(8, 4)
    assert(p.length == 4 && p.forall(_.length == 8))
    assert(p.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(p == rpMatrix(8, 4))
    // not degenerate: both signs occur and rows differ
    assert(p.flatten.distinct.sorted == Seq(-1.0, 1.0))
    assert(p.distinct.length == 4)
  }

  test("projectWith == driver twin projectOf, bit-exact") {
    val p = rpMatrix(6, 3)
    val vs = Seq(
      Seq(1.0, -2.0, 0.5, 3.25, -0.125, 7.0),
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(1e-9, -1e9, 2.75, 0.1, 0.2, 0.3))
    val viaCol = vs.toDF("v")
      .select(projectWith(col("v"), p).as("p"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    assert(viaCol == vs.map(projectOf(_, p)))
  }

  test("projection is linear: P(a+b) == P(a) + P(b) on exact dyadics") {
    val p = rpMatrix(4, 2)
    val a = Seq(1.0, 0.5, -0.25, 2.0)
    val b = Seq(0.125, -4.0, 8.0, 0.0625)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val got = projectOf(sum, p)
    val exp = projectOf(a, p).zip(projectOf(b, p)).map { case (x, y) => x + y }
    assert(got == exp) // ±1 weights on dyadic rationals: exact fp
  }
}
