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

  /** Whole-file text reader: one document per FILE (the crawl-dump /
    * scraped-corpus landing shape), with the file path and length as
    * provenance columns — `(path, length, text)`. Uses `wholetext`, so a
    * file is one row and one task reads it end to end: right for corpora
    * of many small-to-medium documents; a single multi-GB file does NOT
    * split (that input belongs in [[jsonl]] / parquet). Path comes from
    * the scan's `_metadata` struct — no `input_file_name()` (which is
    * undefined under certain join/union rewrites), and no extra I/O. */
  def textFiles(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(path)
      .select(
        col("_metadata.file_path").as("path"),
        col("_metadata.file_size").as("length"),
        col("value").as("text"))

  /** Line-oriented text reader: one document per LINE with provenance
    * `(path, line_no, text)` — the other common dump layout. Reads whole
    * files and splits in-expression (`posexplode`), because that is the
    * only way to EXACT per-file line numbers: a splittable line scan
    * hands Spark splits it orders by SIZE, not file offset, so any
    * window/id scheme over it numbers lines wrong on multi-split files —
    * silently, sometimes. The cost is the same one-task-per-file bound
    * as [[textFiles]]; 1-based line numbers, empty lines kept (position
    * is identity here, and dropping rows silently is an ingestion
    * anti-pattern). */
  def textLines(spark: SparkSession, path: String): DataFrame =
    textFiles(spark, path)
      .select(col("path"),
        // functions.split — the bare name resolves to this object's
        // private quarantine splitter
        posexplode(org.apache.spark.sql.functions.split(col("text"), "\n"))
          .as(Seq("_pos", "text")))
      .select(col("path"), (col("_pos") + 1).cast("long").as("line_no"),
        col("text"))

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

  /** The back door: export a finished dataset as `shards` deterministic
    * training shards (partition directories `shard=K`) plus a manifest.
    * Shard assignment is the portable id hash — the same row lands in
    * the same shard on every run and any cluster size, so shard-level
    * resume/retry/diff works across dataset versions (an RNG or
    * round-robin assignment would reshuffle everything on each export).
    * One repartition on the shard key writes each shard as one file's
    * worth of tasks; loaders stream shards independently.
    *
    * Returns the manifest `(shard, n_rows, files, bytes)` computed from
    * the WRITTEN data (one metadata listing + one thin count over the
    * landed parquet — the export is verified by reading it back, not by
    * trusting the writer). */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      shards: Int,
      salt: String = "shard"): DataFrame = {
    require(shards >= 1, s"graft: writeShards needs shards >= 1, got $shards")
    val spark = df.sparkSession
    df.withColumn("shard",
        pmod(graft.functions.hashing.h32(
          concat(col(idCol).cast("string"), lit("/" + salt))), lit(shards)))
      .repartition(shards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val written = spark.read.parquet(path)
    val sizes = written.inputFiles.toSeq
      .map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val shard = f.split("/").find(_.startsWith("shard=")).map(_.stripPrefix("shard=").toInt)
        (shard.getOrElse(-1), 1L, fs.getFileStatus(p).getLen)
      }
    import spark.implicits._
    val fileStats = sizes.toDF("shard", "f", "b")
      .groupBy(col("shard"))
      .agg(sum(col("f")).as("files"), sum(col("b")).as("bytes"))
    written.groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
      .join(fileStats, Seq("shard"), "left")
      .select(col("shard").cast("int").as("shard"), col("n_rows"),
        coalesce(col("files"), lit(0L)).as("files"),
        coalesce(col("bytes"), lit(0L)).as("bytes"))
  }
}
