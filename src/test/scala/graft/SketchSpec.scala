package graft

import org.apache.spark.sql.functions._

import graft.ops.sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, bounded relative error above k") {
    // group "small": 40 distinct values (< k=64) -> exact count
    // group "big": 5000 distinct values -> estimated
    val rows = (0 until 40).map(v => ("small", v.toLong)) ++
      (0 until 5000).map(v => ("big", 100000L + v)) ++
      (0 until 40).map(v => ("small", v.toLong)) // duplicates collapse
    val df = rows.toDF("g", "v")
    val r = sketch.kmvDistinct(df, col("v"), Seq(col("g")), k = 64)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r("small") == ((40L, 40.0)))
    val (nMin, est) = r("big")
    assert(nMin == 64L)
    // KMV stderr ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"estimate $est too far from 5000")
  }

  test("kmvDistinct is deterministic across runs and partitionings") {
    val df = (0 until 3000).map(v => ("g", v.toLong)).toDF("g", "v")
    def run(parts: Int): Double =
      sketch.kmvDistinct(df.repartition(parts), col("v"), Seq(col("g")), k = 32)
        .select("distinct_est").as[Double].head()
    assert(run(2) == run(7))
  }
}
