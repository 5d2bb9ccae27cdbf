package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** File ingestion with an explicit schema and a corrupt-record
  * quarantine — the front door of a training-data pipeline. The
  * reference ingests only from in-memory typed columns (col.rs:196-213);
  * a cluster pipeline ingests crawl dumps, and the two rules that matter
  * at 100 TB are (1) never infer schema (an inference pass reads the
  * whole input twice and can silently widen types between runs) and
  * (2) never DROP malformed input silently — route it to a quarantine
  * the pipeline can count, sample, and alert on.
  *
  * Both readers return `(good, quarantined)` lazily from ONE permissive
  * scan shape: good rows with the declared schema, quarantined rows as
  * `(corrupt)` raw text. Scans are splittable and schema-pruned as usual
  * — quarantine costs nothing extra at scan time.
  */
object ingest {

  private val CorruptCol = "_graft_corrupt"

  private def split(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    // Spark refuses to filter on the corrupt column of the SAME scan
    // (raw-data queries over internal columns are disallowed); a cache
    // materializes the parsed batch once and both filters read from it.
    // At pipeline scale, land the parsed frame to parquet instead and
    // split there — same two lines against the landed table.
    val cached = raw.cache()
    val good = cached.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = cached.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("corrupt"))
    (good, bad)
  }

  /** JSON-lines reader: one JSON object per line, `schema` enforced,
    * malformed lines quarantined. */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) =
    split(
      spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path),
      schema)

  /** CSV reader with header, explicit schema, quarantine. `timestampFmt`
    * mirrors the reference's `with_datetime_fmt` (col.rs:352-355) at the
    * file boundary. */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      timestampFmt: Option[String] = None): (DataFrame, DataFrame) = {
    var r = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
    timestampFmt.foreach(f => r = r.option("timestampFormat", f))
    split(r.csv(path), schema)
  }
}
