package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.core.{Metric, VecStore}

/** The reference's expression-compile error taxonomy
  * (/root/reference/src/expr.rs:229-236) mapped onto Catalyst analysis:
  * UnknownColumn → UNRESOLVED_COLUMN, TypeMismatch → DATATYPE_MISMATCH,
  * and the deferred-to-collect surfacing the reference gets from storing
  * compile errors in the plan (meta.rs:605-616, 634-636) falls out of
  * DataFrame laziness. Where the reference REJECTS (float literal on int
  * column, string ordering), Spark legally coerces — a strictly wider
  * accepted surface, documented in SURVEY.md §7.0 #9. */
class ErrorTaxonomySpec extends SparkSpec {
  import spark.implicits._

  private lazy val store = VecStore(
    Seq((1L, Array(1.0, 0.0), 5)).toDF("vec_id", "embedding", "label"))

  test("unknown column surfaces at collect() as UNRESOLVED_COLUMN") {
    val plan = store.query(Seq(1.0, 0.0), Metric.Cosine)
      .metaFilter(col("no_such_column") > 1)
    val e = intercept[AnalysisException](plan.collect())
    assert(e.getCondition != null && e.getCondition.contains("UNRESOLVED_COLUMN"))
  }

  test("type mismatch (array compared to int) is DATATYPE_MISMATCH") {
    val plan = store.query(Seq(1.0, 0.0), Metric.Cosine)
      .metaFilter(col("embedding") > 1)
    val e = intercept[AnalysisException](plan.collect())
    assert(e.getCondition != null && e.getCondition.contains("DATATYPE_MISMATCH"))
  }

  test("Spark accepts what the reference rejects: float literal on int column") {
    // expr.rs:420-430 rejects 1.5 vs Int32; Catalyst widens — legal here.
    val n = store.query(Seq(1.0, 0.0), Metric.Cosine)
      .metaFilter(col("label") > 1.5).collect().count()
    assert(n == 1)
  }

  test("empty query batch is rejected eagerly") {
    val e = intercept[IllegalArgumentException](
      store.queryBatch(Seq.empty, Metric.Cosine).collect())
    assert(e.getMessage.contains("must not be empty"))
  }

  test("ragged query batch (mixed dims) is rejected with both dims named") {
    val e = intercept[IllegalArgumentException](
      store.queryBatch(Seq(Seq(1.0, 0.0), Seq(1.0)), Metric.Cosine).collect())
    assert(e.getMessage.contains("dimension"))
  }
}
