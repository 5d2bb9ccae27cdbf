package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over embedding columns — the Gram/
  * covariance primitives behind PCA whitening checks, anisotropy
  * diagnostics, and low-rank projection. The reference engine has no
  * matrix surface (vec.rs stops at per-pair metrics); this is a
  * north-star extension in the same exact-arithmetic house style.
  */
object linalg {

  /** Exact fixed-point Gram matrix `Gᵢⱼ = Σ_rows q(xᵢ)·q(xⱼ)` of an
    * embedding column, upper triangle (i ≤ j), where `q(v) = floor(v·q)`
    * quantizes once per element. Dividing by `n·q²` downstream gives the
    * (uncentered) second-moment matrix; pairing with per-dimension sums
    * (also derivable from this with a ones-column) gives covariance. The
    * one-pass substrate for [[pcaTopComponent]] and for embedding-health
    * reads (anisotropy = off-diagonal mass, collapsed dims = tiny Gᵢᵢ).
    *
    * Exactness: every Gram entry is an exact integer sum — order-free,
    * partition-free, engine-identical. With |v| ≲ 1 the per-row product
    * is ≤ q², so entries stay inside int64 to ~9·10¹⁸/q² rows (9·10¹⁰
    * at the default q = 10⁴); drop `q` for larger corpora — the
    * quantization-vs-headroom dial every fixed-point op here exposes.
    *
    * Plan shape: ONE scan — each row explodes to its d(d+1)/2 upper-
    * triangle products (d² is the cost dial: 2,080 structs at d = 64)
    * and a (i, j)-keyed hash aggregate collapses them; map-side partial
    * aggregation means each task emits at most d(d+1)/2 rows regardless
    * of row count, so the exchange carries ~tasks·d² rows, never
    * rows·d². Returns `(i, j, n, g)` for i ≤ j. */
  def gram(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      q: Long = 10000L): DataFrame = {
    require(dim >= 1, s"graft: gram needs dim >= 1, got $dim")
    require(q >= 1, s"graft: gram needs q >= 1, got $q")
    val spark = df.sparkSession
    import spark.implicits._
    // Hot-path representation: the d(d+1)/2 per-row products live in one
    // FLAT long array (a struct per element allocates an InternalRow per
    // product — measured ~2x slower on the same data); (i, j) are
    // recovered from the flat position AFTER aggregation via a d²-row
    // literal map, where the decoration costs nothing.
    val posMap = (for {
      i <- 0 until dim; j <- i until dim
    } yield (i * dim - i * (i - 1) / 2 + (j - i), i, j))
      .toDF("pos", "i", "j")
    df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(posexplode(graft.functions.NativeExprs.gramProducts(
        col(vecCol), dim, q)).as(Seq("pos", "p")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("g"))
      .join(broadcast(posMap), "pos")
      .select(col("i"), col("j"), col("n"), col("g"))
  }


  /** Top principal direction of a collected [[gram]] result by driver-
    * side power iteration. The Gram matrix is d², a DRIVER-BOUNDED
    * collect in the k-centroid/probe-set family (4,096 longs at
    * d = 64 — the data never moves, only its second moments do); the
    * iteration is O(iters·d²) driver arithmetic from the deterministic
    * all-ones start, normalizing by the max-|component| each round (no
    * square root until the very end). Ties in sign are fixed by making
    * the largest-magnitude component positive — the eigenvector is then
    * unique up to float rounding on exact integer input.
    *
    * Returns the unit-norm direction as a Seq[Double] to embed as plan
    * LITERALS in a projection scan ([[project]]), the same
    * literal-broadcast discipline as k-center and IVF probes. */
  def pcaTopComponent(
      gramDf: DataFrame,
      dim: Int,
      iters: Int = 30): Seq[Double] = {
    require(dim >= 1 && iters >= 1, "graft: pcaTopComponent needs dim, iters >= 1")
    val g = Array.ofDim[Double](dim, dim)
    // d(d+1)/2 rows: bounded by construction, the documented collect.
    gramDf.select(col("i"), col("j"), col("g")).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + g(i)(j) * v(j)))
      val m = w.map(math.abs).max
      v = if (m == 0.0) w else w.map(_ / m)
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val unit = if (norm == 0.0) v.toSeq else v.map(_ / norm).toSeq
    val lead = unit.indices.maxBy(i => math.abs(unit(i)))
    if (unit(lead) < 0) unit.map(-_) else unit
  }

  /** Projection of an embedding column onto a literal direction —
    * `score = Σ vᵢ·dirᵢ` as one codegen'd fold inside the scan (the
    * [[graft.functions.vectors]] dot discipline; the direction rides
    * the plan as literals, nothing is broadcast or joined). */
  def project(vecCol: Column, dir: Seq[Double]): Column = {
    import graft.functions.vectors
    vectors.dotProduct(vecCol, vectors.vecLit(dir))
  }

  /** Distributed k-means (Lloyd 1957/1982), ALL-INTEGER and therefore
    * bit-exact across engines — the clustering complement to
    * [[linearProbeTrain]]'s in-engine supervised training. Vectors
    * quantize once (`floor(v·q)`); every distance is an exact integer
    * `Σ(qxᵢ − cᵢ)²` (a long-typed HOF fold — no float enters the
    * argmin, so assignments can never flip on an ulp); ties pick the
    * lowest cluster id; centroids update on the DRIVER as
    * `truncDiv(Σqxᵢ, n)` per dimension (the [[linearProbeTrain]] signed-
    * division discipline — Scala `/` truncates, the oracle mirrors with
    * sign CASE logic); an emptied cluster keeps its previous centroid.
    * Init = the k rows with the smallest ids (deterministic and
    * engine-reproducible; pre-shuffle ids upstream for k-means++-like
    * spread, or pass ids from [[graft.ops.ann.kCenterSelect]]).
    *
    * Plan shape per round: ONE scan computing k fold distances + the
    * argmin (centroids ride as literals), one (cluster, dim) aggregate
    * whose k·d result is the bounded driver collect. Cost = `iters + 1`
    * scans. Returns the final assignment summary
    * `(cluster, n, inertia)` — inertia the exact integer within-cluster
    * sum of squared quantized distances. */
  def kmeansFit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      k: Int,
      iters: Int = 2,
      q: Long = 10000L): DataFrame = {
    require(dim >= 1 && k >= 1 && iters >= 0 && q >= 1,
      "graft: kmeansFit needs dim, k, q >= 1 and iters >= 0")
    val base = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("_id"),
        expr(s"transform($vecCol, v -> CAST(floor(v * ${q}L) AS BIGINT))")
          .as("_qx"))
      .persist()
    // deterministic init: the k smallest-id vectors (bounded collect)
    var cents: Array[Array[Long]] = base.orderBy(col("_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(cents.length == k, s"graft: kmeansFit needs >= $k rows")
    def centLit(c: Array[Long]): String = c.mkString("array(", "L, ", "L)")
    def distExpr(c: Array[Long]): String =
      s"aggregate(zip_with(_qx, ${centLit(c)}, (x, y) -> (x - y) * (x - y))," +
        s" 0L, (acc, v) -> acc + v)"
    def assign(d: DataFrame): DataFrame = {
      val withD = cents.zipWithIndex.foldLeft(d) { case (acc, (c, j)) =>
        acc.withColumn(s"_d$j", expr(distExpr(c)))
      }
      val m = least(cents.indices.map(j => col(s"_d$j")): _*)
      val cluster = cents.indices.init.foldRight(lit(k - 1): Column) {
        case (j, rest) => when(col(s"_d$j") === m, lit(j)).otherwise(rest)
      }
      withD.withColumn("_cl", cluster).withColumn("_dist", m)
    }
    for (_ <- 0 until iters) {
      val stats = assign(base)
        .select(col("_cl"), posexplode(col("_qx")).as(Seq("_pos", "_v")))
        .groupBy(col("_cl"), col("_pos"))
        .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"))
        .collect()
      val n = Array.fill(k)(0L)
      val s = Array.fill(k, dim)(0L)
      stats.foreach { r =>
        val (cl, pos) = (r.getInt(0), r.getInt(1))
        n(cl) = r.getLong(2); s(cl)(pos) = r.getLong(3)
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        if (n(j) == 0L) old
        else Array.tabulate(dim)(i => s(j)(i) / n(j)) // Scala /: trunc
      }
    }
    val out = assign(base)
      .groupBy(col("_cl").as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("_dist")).as("inertia"))
    base.unpersist(false)
    out
  }

  /** In-engine linear-probe training: `iters` rounds of full-batch
    * gradient descent on squared loss, ALL-INTEGER — the
    * train-a-quality-probe-on-the-corpus primitive (the reading
    * companion to [[graft.ops.text.linearGate]], which only SCORES
    * pretrained weights). Per round: one scan computes the exact
    * integer gradient `gⱼ = Σᵢ qxᵢⱼ·(predᵢ − yᵢ)` with
    * `pred = Σⱼ qxⱼ·wⱼ` kept in raw `q·ppm` units (NO in-plan division
    * — a signed integer quotient truncates in Spark but floors in
    * DuckDB, so signed division happens only on the driver, where
    * Scala `/` truncates and the oracle mirrors it with explicit sign
    * CASE logic); the d-long gradient is collected (the [[
    * pcaTopComponent]] bounded-driver discipline) and
    * `wⱼ ← wⱼ − gⱼ/(q²·n·lrInv)` updates in exact driver integers, so
    * the whole training run is engine-reproducible bit-for-bit.
    *
    * Headroom: |g| ≤ n·q·max|resid| with resid ≤ d·q·max|w| + q·10⁶ —
    * at q = 100, d = 8 that is ~10⁸ rows before int64 strain; lower q
    * (or pre-scale y) beyond. Cost: `iters` scans, each one aggregate
    * emitting d longs; weights ride every scan as literals. Returns
    * `(j, w_ppm)` — the trained probe, feed to [[project]]-style
    * scoring or persist. */
  def linearProbeTrain(
      df: DataFrame,
      vecCol: String,
      labelCol: Column,
      dims: Int,
      iters: Int = 2,
      q: Long = 100L,
      lrInv: Long = 1L): DataFrame = {
    require(dims >= 1 && iters >= 0 && q >= 1 && lrInv >= 1,
      s"graft: linearProbeTrain needs dims, iters, q, lrInv sane")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
      .select(expr(s"transform(slice($vecCol, 1, $dims)," +
        s" v -> CAST(floor(v * ${q}L) AS BIGINT))").as("_qx"),
        labelCol.cast("long").as("_y"))
      .persist()
    val n = base.count()
    require(n > 0, "graft: linearProbeTrain needs rows")
    val w = Array.fill(dims)(0L)
    for (_ <- 0 until iters) {
      // pred - y in raw q*ppm units: sum_j qx[j]*w[j] - y*q*1e6
      val pred = (0 until dims).map(j => col("_qx")(j) * lit(w(j)))
        .reduce(_ + _) - col("_y") * lit(q * 1000000L)
      val sums = base.withColumn("_r", pred)
        .agg(lit(0L).as("_z"),
          (0 until dims).map(j =>
            sum(col("_qx")(j) * col("_r")).as(s"_g$j")): _*)
        .head()
      val den = q * q * n * lrInv
      (0 until dims).foreach { j =>
        w(j) -= sums.getLong(j + 1) / den // Scala /: truncation toward 0
      }
    }
    base.unpersist(false)
    w.toSeq.zipWithIndex.map { case (v, j) => (j, v) }.toDF("j", "w_ppm")
  }

  /** Anisotropy read over a [[gram]] result: trace (diagonal mass,
    * always ≥ 0), total absolute off-diagonal mass (each unordered pair
    * counted twice — the full-matrix convention), and their ratio. An
    * isotropic embedding space scores ~0; a collapsed/cone-shaped one
    * (the common contrastive-training pathology, Ethayarajh EMNLP 2019)
    * scores high — run it before trusting cosine top-k on a new
    * embedding column. Sums stay exact integers; the ratio is the one
    * quantized float at the end (6 dp — the ratio is scale-free).
    * One d²-row reduction. Returns `(trace, offdiag_abs, aniso_q6)`. */
  def anisotropy(gramDf: DataFrame): DataFrame =
    gramDf
      .agg(
        sum(when(col("i") === col("j"), col("g")).otherwise(lit(0L)))
          .as("trace"),
        sum(when(col("i") =!= col("j"), abs(col("g")) * 2L).otherwise(lit(0L)))
          .as("offdiag_abs"))
      .withColumn("aniso_q6",
        when(col("trace") > 0L, graft.functions.vectors.quantize(
          col("offdiag_abs").cast("double") / col("trace").cast("double"), 6)))

  /** Per-dimension first/second moments of an embedding corpus as exact
    * fixed-point integer sums — the mergeable substrate for
    * [[embedDrift]]. Each component is quantized ONCE (`floor(v·q)`)
    * and the d-row grid carries `(pos, n, s, s2)`; snapshots of two
    * corpora (or two dates of one) feed the drift readout. Exact to
    * ~9·10¹⁸/q² rows on `s2` (9·10¹⁰ at q = 10⁴ with |v| ≲ 1 — the
    * [[gram]] headroom dial). One scan, one d-row hash aggregate. */
  def momentGrid(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      q: Long = 10000L): DataFrame = {
    require(dim >= 1, s"graft: momentGrid needs dim >= 1, got $dim")
    require(q >= 1, s"graft: momentGrid needs q >= 1, got $q")
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(posexplode(transform(col(vecCol),
        v => floor(v.cast("double") * q).cast("long"))).as(Seq("pos", "_qv")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("_qv")).as("s"),
        sum(col("_qv") * col("_qv")).as("s2"))
  }

  /** Embedding-corpus drift between two [[momentGrid]] snapshots — the
    * did-the-encoder-or-the-data-move meter (FID-family, diagonal):
    * linear-kernel MMD² `Σ_d (μa_d − μb_d)²` plus the per-dimension
    * variance L1 gap `Σ_d |σ²a_d − σ²b_d|` (population variance; no
    * square roots, so every per-dim term is the same fixed-order
    * arithmetic on exact integers in any engine). Per-dim terms are
    * floor-quantized to 1e-12 fixed-point LONGs before the d-row sum
    * (order-free addition), readout at 6dp.
    *
    * Scale shape: both inputs are d-row grids — the corpora never move,
    * only their moments do (the [[pcaTopComponent]] discipline). Returns
    * one row `(n_a, n_b, dim, mmd2_q6, vargap_q6)`. */
  def embedDrift(
      gridA: DataFrame,
      gridB: DataFrame,
      q: Long = 10000L): DataFrame = {
    val qd = lit(q.toDouble)
    val scale = lit(1.0e12)
    def mu(side: String) = col(s"s_$side").cast("double") /
      (col(s"n_$side").cast("double") * qd)
    def va(side: String) = col(s"s2_$side").cast("double") /
      (col(s"n_$side").cast("double") * qd * qd) - mu(side) * mu(side)
    gridA.select(col("pos"), col("n").as("n_a"), col("s").as("s_a"),
        col("s2").as("s2_a"))
      .join(gridB.select(col("pos"), col("n").as("n_b"), col("s").as("s_b"),
        col("s2").as("s2_b")), "pos")
      .select(col("n_a"), col("n_b"),
        floor((mu("a") - mu("b")) * (mu("a") - mu("b")) * scale)
          .cast("long").as("_tm"),
        floor(abs(va("a") - va("b")) * scale).cast("long").as("_tv"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("dim"), sum(col("_tm")).as("_m"),
        sum(col("_tv")).as("_v"))
      .select(col("n_a"), col("n_b"), col("dim"),
        graft.functions.vectors.quantize(
          col("_m").cast("double") / lit(1.0e12), 6).as("mmd2_q6"),
        graft.functions.vectors.quantize(
          col("_v").cast("double") / lit(1.0e12), 6).as("vargap_q6"))
  }
}
