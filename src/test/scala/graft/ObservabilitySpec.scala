package graft

import org.apache.spark.sql.functions._

import graft.core.GraftStatsListener
import graft.ops.{ann, dedup}

/** The cap-counter contract under TOTAL truncation: when a safety cap
  * (bucketCap, df band) drops EVERYTHING, the result is empty and the
  * observe() counters are the only evidence of why — but AQE's
  * empty-relation propagation deletes CollectMetrics nodes along with
  * the empty subtree they sit on. `GraftStatsListener.attach` therefore
  * excludes that one AQE rule (measured in round 8: without it, a 30×
  * rehearsal's knnGraph reported 0 edges and NO `graft_knn_*`
  * observation at all). */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private val ExcludedKey = "spark.sql.adaptive.optimizer.excludedRules"

  /** Run `mk`'s plan with a fresh listener; return (rowCount, observed). */
  private def observedOf(mk: => org.apache.spark.sql.DataFrame)
      : (Long, Map[String, org.apache.spark.sql.Row]) = {
    val before = spark.conf.getOption(ExcludedKey)
    val listener = GraftStatsListener.attach(spark)
    try {
      val d = mk
      d.write.format("noop").mode("overwrite").save()
      var waited = 0
      while (listener.lastQueryStats.isEmpty && waited < 3000) {
        Thread.sleep(20); waited += 20
      }
      (d.count(), listener.lastQueryStats.map(_.observed).getOrElse(Map.empty))
    } finally {
      spark.listenerManager.unregister(listener)
      before match {
        case Some(v) => spark.conf.set(ExcludedKey, v)
        case None => spark.conf.unset(ExcludedKey)
      }
    }
  }

  // 100 near-identical vectors: ONE sign-LSH bucket, so bucketCap = 5
  // drops every bucket and the knn graph is legitimately empty.
  private lazy val oneBucket = (0 until 100)
    .map(i => (i.toLong, (0 until 16).map(j => math.sin(j + 1.0) + i * 1e-6)))
    .toDF("vec_id", "embedding")

  test("knnGraph: counters survive when every bucket is over cap") {
    val (rows, obs) = observedOf(
      ann.knnGraph(oneBucket, k = 2, dim = 16, bucketCap = 5))
    assert(rows == 0, "all buckets over cap -> empty graph")
    val left = obs.get("graft_knn_left")
    assert(left.isDefined, s"graft_knn_left missing; observed=${obs.keys}")
    assert(left.get.getAs[Long]("dropped_buckets") >= 1L)
    assert(left.get.getAs[Long]("max_bucket") == 100L)
  }

  test("jaccardPairs: df-band counter explains an emptied pair set") {
    // Ten exact clones: every gram has df = 10 > maxDf = 4, so the band
    // drops every posting — the zero-pair result must say so.
    val clones = (0 until 10)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val (rows, obs) = observedOf(
      dedup.jaccardPairs(clones, "text", "doc_id", threshold = 0.5, maxDf = 4))
    assert(rows == 0, "df band drops every posting")
    val g = obs.get("graft_shared_grams")
    assert(g.isDefined, s"graft_shared_grams missing; observed=${obs.keys}")
    assert(g.get.getAs[Long]("dropped_postings") > 0L)
    assert(g.get.getAs[Long]("max_df") == 10L)
  }

  test("attach appends the AQE exclusion without clobbering or duplicating") {
    val before = spark.conf.getOption(ExcludedKey)
    try {
      spark.conf.set(ExcludedKey, "some.user.Rule")
      val l1 = GraftStatsListener.attach(spark)
      spark.listenerManager.unregister(l1)
      val after1 = spark.conf.get(ExcludedKey)
      assert(after1.startsWith("some.user.Rule,"), "existing exclusions kept")
      assert(after1.contains("AQEPropagateEmptyRelation"))
      val l2 = GraftStatsListener.attach(spark)
      spark.listenerManager.unregister(l2)
      assert(spark.conf.get(ExcludedKey) == after1, "no duplicate append")
    } finally {
      before match {
        case Some(v) => spark.conf.set(ExcludedKey, v)
        case None => spark.conf.unset(ExcludedKey)
      }
    }
  }
}
