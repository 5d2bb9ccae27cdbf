package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage cuts for iterative plans ([[graph.pageRank]],
  * [[dedup.connectedComponents]], [[bpe.train]]).
  *
  * Iterated DataFrames must be checkpointed each round or the plan
  * compounds (analysis cost and recovery lineage both grow without
  * bound). WHICH checkpoint matters at cluster scale:
  *
  *  - `localCheckpoint` stores blocks in executor memory/disk only. It
  *    is the right default on a single machine and in tests — no
  *    distributed filesystem needed, no extra write — but it is NOT
  *    fault-tolerant: lose one executor mid-job and every surviving
  *    round's blocks on that executor are gone, killing (say) a
  *    50-round connected-components run at round 49 with no recovery
  *    path (the lineage was truncated — that was the point).
  *  - Reliable `checkpoint()` writes the RDD to the session's
  *    checkpoint directory (HDFS/S3 on a real cluster), so executor
  *    loss costs one re-read, not the job.
  *
  * Policy: callers cut lineage through [[cut]], which uses a reliable
  * checkpoint exactly when the session has a checkpoint directory
  * configured (`spark.sparkContext.setCheckpointDir(...)`) and falls
  * back to `localCheckpoint` otherwise. A 100 TB run sets the
  * directory; local iteration doesn't have to. Both paths are eager —
  * an iterative round must materialize before the next one plans on
  * top of it.
  */
private[graft] object ckpt {

  /** True when the session is configured for reliable checkpoints. */
  def reliable(spark: SparkSession): Boolean =
    spark.sparkContext.getCheckpointDir.isDefined

  /** Eagerly materialize `df` and truncate its lineage — reliably if a
    * checkpoint dir is set, locally otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** LAZY lineage cut: same truncation, but materialization happens
    * inside the FIRST consuming action instead of a dedicated blocking
    * job. The right cut for driver-loop trainers (bpe/wordpiece) whose
    * every round already ends in a collect: the eager form paid one
    * extra job per round just to materialize state the round's own
    * collect was about to compute anyway — and the final round's state,
    * which nothing ever consumes, was still materialized. Later
    * consumers read the cached blocks either way. NOT for the graph
    * iteration shape, where nothing between cuts forces an action. */
  def cutLazy(df: DataFrame): DataFrame =
    if (reliable(df.sparkSession)) df.checkpoint(false)
    else df.localCheckpoint(false)
}
