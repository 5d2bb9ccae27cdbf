package graft

import org.apache.spark.sql.functions._

import graft.functions.{aggregates, hashing}
import graft.ops.evals

/** [[graft.functions.ReplicateFoldAgg]] — the folded form of the
  * bootstrap/permutation ×reps fan-out — must be BIT-IDENTICAL to the
  * explode form it replaced: same affine coin/weight per (row, rep),
  * same long sums, independent of partitioning (merge path). */
class ReplicateFoldSpec extends SparkSpec {
  import spark.implicits._

  private val reps = 37

  /** The pre-optimization explode form, verbatim: per rep j, the affine
    * uniform and its coin/weight, aggregated with plain sums. */
  private def explodeForm(poisson: Boolean) = {
    val df = (1L to 500L).map(i => (s"id$i", i % 23 - 7, i % 5 + 1))
      .toDF("id", "x", "d")
      .select(col("x").cast("long").as("_x"), col("d").cast("long").as("_d"),
        hashing.h32(concat(col("id"), lit(":t"))).as("_h"))
    val thresholds = lit(evals.PoissonCdfPpm.toArray)
    df.select(col("_x"), col("_d"), explode(transform(
        sequence(lit(0L), lit((reps - 1).toLong)),
        j => {
          val u = pmod(pmod(col("_h") * (j * 2L + lit(1L))
            + j * lit(12582917L), lit(hashing.AffineP)), lit(1000000L))
          val w =
            if (poisson) size(filter(thresholds, t => t <= u)).cast("long")
            else (u < 500000L).cast("long")
          struct(j.as("rep"), w.as("w"))
        })).as("_rw"))
      .select(col("_rw.rep").as("rep"),
        (col("_rw.w") * col("_x")).as("_wx"),
        (col("_rw.w") * col("_d")).as("_wd"), col("_rw.w").as("_w"))
      .groupBy(col("rep"))
      .agg(sum(col("_wx")).as("a"), sum(col("_wd")).as("b"),
        sum(col("_w")).as("w"))
      .orderBy(col("rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def foldForm(poisson: Boolean, parts: Int) = {
    val df = (1L to 500L).map(i => (s"id$i", i % 23 - 7, i % 5 + 1))
      .toDF("id", "x", "d")
      .select(col("x").cast("long").as("_x"), col("d").cast("long").as("_d"),
        hashing.h32(concat(col("id"), lit(":t"))).as("_h"))
      .repartition(parts)
    val agg =
      if (poisson) aggregates.bootFoldAgg(col("_h"), col("_x"), col("_d"),
        reps, evals.PoissonCdfPpm)
      else aggregates.permFoldAgg(col("_h"), col("_x"), reps)
    // perm mode folds (Σ coin·x, Σ coin) = explode form with d ≡ 1
    val df2 = if (poisson) df else df.withColumn("_d", lit(1L))
    df2.agg(agg.as("_f")).select(posexplode(col("_f")))
      .select(col("pos").cast("long"), col("col.a"), col("col.b"))
      .orderBy(col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("boot fold == explode form, across partitionings (merge path)") {
    val want = explodeForm(poisson = true).toSeq
      .map { case (r, a, b, _) => (r, a, b) }
    assert(foldForm(poisson = true, parts = 1).toSeq == want)
    assert(foldForm(poisson = true, parts = 7).toSeq == want)
  }

  test("perm fold == explode form (coin counts and coin-weighted sums)") {
    // perm fold's b = Σ coin — compare against the explode form's Σw
    val want = explodeForm(poisson = false).toSeq
      .map { case (r, a, _, w) => (r, a, w) }
    assert(foldForm(poisson = false, parts = 5).toSeq == want)
  }

  test("empty input folds to all-zero replicates; null rows are skipped") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "h")
      .select(col("h").as("_h"), col("x").as("_x"))
    val z = empty.agg(aggregates.permFoldAgg(col("_h"), col("_x"), 5).as("_f"))
      .select(posexplode(col("_f"))).select(col("col.a"), col("col.b"))
      .collect()
    assert(z.length == 5 && z.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
    val withNulls = Seq((Some(3L), Some(10L)), (None, Some(4L)), (Some(9L), None))
      .toDF("h", "x")
    val n = withNulls
      .agg(aggregates.permFoldAgg(col("h"), col("x"), 5).as("_f"))
      .select(posexplode(col("_f"))).select(col("col.b")).collect()
    // only the (3, 10) row can contribute coins
    assert(n.forall(_.getLong(0) <= 1L))
  }
}
