package graft.core

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query observability — the Spark-native `MetaQueryStats`
  * (/root/reference/src/meta.rs:832-842, stored after each collect at
  * meta.rs:711-721).
  *
  * The reference counts pruned/evaluated chunks and vectors compared; the
  * Spark analog is the file-scan metrics Catalyst already maintains:
  * `numOutputRows` on the scan node = rows that survived row-group
  * (zonemap) pruning and reached the filter, `numFiles`/`filesSize` = I/O
  * actually touched. A listener snapshot after each action plays the role
  * of the reference's `RefCell<Option<MetaQueryStats>>`.
  */
final case class QueryStats(
    durationMs: Long,
    scannedRows: Long,
    filesRead: Long,
    bytesRead: Long,
    scans: Int,
    /** Row-group zonemap counters (the reference's pruned/evaluated
      * chunks) — present when the listener was attached with
      * `trackRowGroups = true`. */
    rowGroups: Option[graft.index.PruneStats.PruneReport] = None,
    /** The query's `observe()` metrics by observation name — the
      * drop/cap counters graft operators emit (`graft_knn_left`,
      * `graft_emb_neardup`, …) surfaced on the same stats object, so a
      * pipeline reads its safety counters where it reads its scan
      * counters. */
    observed: Map[String, org.apache.spark.sql.Row] = Map.empty) {
  def pretty: String =
    f"QueryStats: $durationMs%d ms, $scannedRows%d rows scanned, " +
      f"$filesRead%d files, $bytesRead%d bytes, $scans%d scan(s)" +
      rowGroups.map(r => "; " + r.pretty).getOrElse("")
}

/** @param trackRowGroups also compute per-query row-group pruned/evaluated
  *   counters from the scanned files' parquet footers (metadata-only
  *   reads; costs one footer read per scanned file per query — the
  *   reference pays the same bookkeeping per chunk, meta.rs:711-721). */
final class GraftStatsListener(trackRowGroups: Boolean = false)
    extends QueryExecutionListener {
  private val last = new AtomicReference[Option[QueryStats]](None)

  /** Last completed query's stats (ref `print_last_query_stats`,
    * meta.rs:546-566). */
  def lastQueryStats: Option[QueryStats] = last.get()

  // Descends through AQE wrappers: QueryStageExec nodes report NO
  // children (their subtree hangs off `plan`), so a plain child walk
  // would silently miss every scan once an exchange materializes.
  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scansOf(r.child)
    case s: FileSourceScanExec    => Seq(s)
    case other                    => other.children.flatMap(scansOf)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val scans = scansOf(qe.executedPlan)
    def metric(name: String): Long =
      scans.flatMap(_.metrics.get(name).map(_.value)).sum
    val rg =
      if (trackRowGroups && scans.nonEmpty)
        Some(graft.index.PruneStats.forScans(scans,
          qe.sparkSession.sessionState.newHadoopConf()))
      else None
    last.set(Some(QueryStats(
      durationMs = durationNs / 1000000,
      scannedRows = metric("numOutputRows"),
      filesRead = metric("numFiles"),
      bytesRead = metric("filesSize"),
      scans = scans.size,
      rowGroups = rg,
      observed = qe.observedMetrics)))
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    last.set(None)
}

object GraftStatsListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession, trackRowGroups: Boolean = false): GraftStatsListener = {
    val l = new GraftStatsListener(trackRowGroups)
    spark.listenerManager.register(l)
    l
  }
}
