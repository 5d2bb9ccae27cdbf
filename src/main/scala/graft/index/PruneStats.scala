package graft.index

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.unsafe.types.UTF8String

/** Row-group pruning observability — the Spark analog of the reference's
  * `pruned_chunks` / `evaluated_chunks` counters
  * (/root/reference/src/meta.rs:832-842, printed at display.rs:197-249).
  *
  * Spark's scan metrics report rows/files/bytes but not HOW MANY row
  * groups the pushed predicates allowed the reader to skip — the number a
  * user tunes `rowGroupBytes`/`sortBy`/bloom settings against. This
  * utility recomputes that decision from first principles: it walks the
  * plan's parquet scans, keeps the pushed-down comparison conjuncts it
  * can evaluate, reads each selected file's FOOTER (metadata only — no
  * row data I/O), and applies the same min/max zonemap test the
  * vectorized reader applies per row group.
  *
  * Conservative by construction: unsupported conjuncts are ignored and
  * missing statistics count as not-prunable, so the report never claims
  * MORE pruning than the reader achieves. String comparisons assume the
  * JVM string order matches parquet's unsigned-byte order (true for
  * ASCII data).
  */
object PruneStats {

  /** Chunk-pruning counters for one query's parquet scans (reference
    * `MetaQueryStats.{pruned,evaluated}_chunks`). */
  final case class PruneReport(
      files: Int,
      rowGroupsTotal: Int,
      rowGroupsPruned: Int,
      rowsTotal: Long,
      rowsPruned: Long) {
    def rowGroupsEvaluated: Int = rowGroupsTotal - rowGroupsPruned
    def pretty: String =
      f"PruneReport: $rowGroupsPruned%d of $rowGroupsTotal%d row groups pruned " +
        f"($rowsPruned%d of $rowsTotal%d rows) across $files%d file(s)"
  }

  private[index] final case class Cmp(column: String, op: String, value: Any)

  /** Supported pushed-down conjuncts: {=, <, <=, >, >=} between a column
    * and a literal (either side). Anything else contributes nothing. */
  private[index] def comparisons(e: Expression): Seq[Cmp] = e match {
    case And(l, r) => comparisons(l) ++ comparisons(r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => Seq(Cmp(a.name, "=", v))
    case EqualTo(Literal(v, _), a: AttributeReference) => Seq(Cmp(a.name, "=", v))
    case GreaterThan(a: AttributeReference, Literal(v, _)) => Seq(Cmp(a.name, ">", v))
    case GreaterThan(Literal(v, _), a: AttributeReference) => Seq(Cmp(a.name, "<", v))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => Seq(Cmp(a.name, ">=", v))
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => Seq(Cmp(a.name, "<=", v))
    case LessThan(a: AttributeReference, Literal(v, _)) => Seq(Cmp(a.name, "<", v))
    case LessThan(Literal(v, _), a: AttributeReference) => Seq(Cmp(a.name, ">", v))
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => Seq(Cmp(a.name, "<=", v))
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => Seq(Cmp(a.name, ">=", v))
    case _ => Nil
  }

  /** Numeric or string view of a parquet statistics endpoint / Catalyst
    * literal, for cross-type comparison. */
  /** Exact integral view — used before [[asDouble]] so BIGINT stats never
    * lose low bits to the double mantissa. */
  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long    => Some(l.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case b: java.lang.Byte    => Some(b.longValue)
    case _                    => None
  }

  private def asDouble(v: Any): Option[Double] = v match {
    case i: java.lang.Integer => Some(i.doubleValue)
    case l: java.lang.Long    => Some(l.doubleValue)
    case d: java.lang.Double  => Some(d.doubleValue)
    case f: java.lang.Float   => Some(f.doubleValue)
    case s: java.lang.Short   => Some(s.doubleValue)
    case b: java.lang.Byte    => Some(b.doubleValue)
    case _                    => None
  }

  private def asString(v: Any): Option[String] = v match {
    case b: org.apache.parquet.io.api.Binary => Some(b.toStringUsingUTF8)
    case u: UTF8String                       => Some(u.toString)
    case s: String                           => Some(s)
    case _                                   => None
  }

  /** True when `cmp` proves the row group holds NO matching rows given
    * its column [min, max]. */
  private def unsatisfiable(cmp: Cmp, min: Any, max: Any): Boolean = {
    def decide[T](lo: T, hi: T, v: T)(implicit ord: Ordering[T]): Boolean = cmp.op match {
      case "="  => ord.lt(v, lo) || ord.gt(v, hi)
      case ">"  => ord.lteq(hi, v)
      case ">=" => ord.lt(hi, v)
      case "<"  => ord.gteq(lo, v)
      case "<=" => ord.gt(lo, v)
      case _    => false
    }
    // Integral stats compare as Long: a BIGINT endpoint and literal that
    // differ only in low bits compare EQUAL through double (2^53 mantissa),
    // which could claim a row group prunable that the reader evaluates —
    // violating the "never claims MORE pruning" contract. Doubles only for
    // genuinely fractional stats (where parquet stats are doubles anyway).
    (asLong(min), asLong(max), asLong(cmp.value)) match {
      case (Some(lo), Some(hi), Some(v)) => decide(lo, hi, v)
      case (Some(lo), Some(hi), None) =>
        // Integral stats, fractional literal: converting the Long
        // endpoints to double would lose low bits past 2^53 — instead
        // rewrite `x op v` over integral x into a Long bound and decide
        // exactly. Literals beyond Long range resolve without touching
        // the stats (every Long is below/above them).
        asDouble(cmp.value) match {
          case Some(v) => integralVsFractional(cmp.op, lo, hi, v)
          case None    => false
        }
      case _ =>
        (asDouble(min), asDouble(max), asDouble(cmp.value)) match {
          case (Some(lo), Some(hi), Some(v)) => decide(lo, hi, v)
          case _ =>
            (asString(min), asString(max), asString(cmp.value)) match {
              case (Some(lo), Some(hi), Some(v)) => decide(lo, hi, v)
              case _                             => false
            }
        }
    }
  }

  /** Unsatisfiability of `x op v` for integral x in [lo, hi] against a
    * fractional double literal v, decided in exact Long arithmetic:
    *   x >  v  ⇔  x ≥ floor(v)+1      x ≥ v  ⇔  x ≥ ceil(v)
    *   x <  v  ⇔  x ≤ ceil(v)-1       x ≤ v  ⇔  x ≤ floor(v)
    *   x =  v  only possible when v is a whole number in Long range.
    * floor/ceil of a double are exact; they convert to Long exactly when
    * in range, and out-of-range literals dominate every Long. */
  private[index] def integralVsFractional(
      op: String, lo: Long, hi: Long, v: Double): Boolean = {
    if (v.isNaN) return false // NaN comparisons match nothing; reader handles it
    val minD = Long.MinValue.toDouble // -2^63, exact
    val maxD = Long.MaxValue.toDouble // 2^63, exact (rounds up from 2^63-1)
    // Greatest Long ≤ v (None when v < Long range ⇒ no such Long) and
    // least Long ≥ v (None when v > Long range).
    val floorL: Option[Long] =
      if (v < minD) None
      else if (v >= maxD) Some(Long.MaxValue)
      else Some(Math.floor(v).toLong)
    val ceilL: Option[Long] =
      if (v >= maxD) None
      else if (v < minD) Some(Long.MinValue)
      else Some(Math.ceil(v).toLong)
    op match {
      case "=" =>
        // v fractional or out of Long range ⇒ no integral x equals it.
        if (v != Math.floor(v) || v < minD || v >= maxD) true
        else { val w = v.toLong; w < lo || w > hi }
      // x > v  unsat iff hi ≤ v iff hi ≤ floor(v); floorL None means v is
      // below Long range (everything exceeds it — satisfiable).
      case ">" => floorL.exists(f => hi <= f)
      // x ≥ v  unsat iff hi < ceil(v); ceilL None means v is above Long
      // range (nothing reaches it — unsat).
      case ">=" => ceilL.forall(c => hi < c)
      // x < v  unsat iff lo ≥ v iff lo ≥ ceil(v); ceilL None means v is
      // above Long range (everything is below it — satisfiable).
      case "<" => ceilL.exists(c => lo >= c)
      // x ≤ v  unsat iff lo > floor(v); floorL None means v is below Long
      // range (nothing is under it — unsat).
      case "<=" => floorL.forall(f => lo > f)
      case _ => false
    }
  }

  // QueryStageExec nodes report no children (subtree hangs off `plan`) —
  // descend explicitly or AQE-staged plans yield zero scans.
  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scansOf(r.child)
    case s: FileSourceScanExec    => Seq(s)
    case other                    => other.children.flatMap(scansOf)
  }

  /** Footer-level report for the files and data filters of `scan`. */
  private[index] def forScan(scan: FileSourceScanExec, conf: Configuration): PruneReport = {
    val cmps = scan.dataFilters.flatMap(comparisons)
    // listFiles applies the PARTITION filters, so directory-pruned files
    // (LSH buckets, IVF lists) never even get a footer read — matching
    // what the reader touches.
    val files = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath))
    var (groups, pruned) = (0, 0)
    var (rows, prunedRows) = (0L, 0L)
    files.foreach { path: Path =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          groups += 1
          rows += block.getRowCount
          val skip = cmps.exists { cmp =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == cmp.column)
              .exists { c =>
                val st = c.getStatistics
                st != null && st.hasNonNullValue() &&
                  unsatisfiable(cmp, st.genericGetMin(), st.genericGetMax())
              }
          }
          if (skip) { pruned += 1; prunedRows += block.getRowCount }
        }
      } finally reader.close()
    }
    PruneReport(files.size, groups, pruned, rows, prunedRows)
  }

  /** Aggregate report over the given scans (used by
    * [[graft.core.GraftStatsListener]]). */
  def forScans(scans: Seq[FileSourceScanExec], conf: Configuration): PruneReport =
    scans.map(forScan(_, conf))
      .foldLeft(PruneReport(0, 0, 0, 0L, 0L)) { (a, b) =>
        PruneReport(a.files + b.files, a.rowGroupsTotal + b.rowGroupsTotal,
          a.rowGroupsPruned + b.rowGroupsPruned, a.rowsTotal + b.rowsTotal,
          a.rowsPruned + b.rowsPruned)
      }

  /** Aggregate report over every parquet scan in `df`'s physical plan.
    * Reads footers only; safe to call before or after executing the
    * query. */
  def forQuery(df: DataFrame): PruneReport =
    forScans(scansOf(df.queryExecution.executedPlan),
      df.sparkSession.sessionState.newHadoopConf())
}
