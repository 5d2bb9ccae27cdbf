package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftStatsListener
import graft.index.{zorder, VecIndex}

class ZorderSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-zorder-").toString

  test("zValue interleaves bits (hand-computed Morton codes)") {
    import spark.implicits._
    val got = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 0))
      .toDF("a", "b")
      .select(zorder.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // morton(3,5): a bits 1,1,0 -> even positions 0,2; b bits 1,0,1 -> odd
    // positions 1,5 => 1 + 4 + 2 + 32 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, 0x55555555L))
  }

  test("z-ordered layout prunes scans on BOTH filter columns; single-sort only on one") {
    // 100x100 grid, 4 rows per cell — both columns uniform
    val n = 40000
    val df = spark.range(n.toLong).select(
      col("id"),
      (col("id") % 100).cast("int").as("a"),
      ((col("id") / 100) % 100).cast("int").as("b"))

    def write(path: String, opts: VecIndex.BuildOptions): DataFrame = {
      var w = df
      val parts = 16
      val laid = opts match {
        case o if o.sortBy.nonEmpty =>
          w.repartitionByRange(parts, col("a")).sortWithinPartitions(col("a"))
        case o if o.zorderBy.isDefined =>
          val z = zorder.zValue(col("a"), col("b"))
          w.repartitionByRange(parts, z).sortWithinPartitions(z)
        case _ => w
      }
      laid.write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString).parquet(path)
      spark.read.parquet(path)
    }

    val byA = write(s"$tmp/by_a", VecIndex.BuildOptions(sortBy = Seq("a")))
    val byZ = write(s"$tmp/by_z", VecIndex.BuildOptions(zorderBy = Some(("a", "b"))))

    def scanned(dfr: DataFrame, cond: org.apache.spark.sql.Column): Long = {
      val listener = GraftStatsListener.attach(spark)
      try {
        dfr.filter(cond).collect()
        // Poll for stats that actually contain a scan — AQE can fire a
        // final trailing execution event with no scan nodes.
        var waited = 0
        while (!listener.lastQueryStats.exists(_.scans > 0) && waited < 5000) {
          Thread.sleep(50); waited += 50
        }
        val s = listener.lastQueryStats.filter(_.scans > 0)
        assert(s.isDefined, "no scan stats captured")
        s.get.scannedRows
      } finally spark.listenerManager.unregister(listener)
    }

    locally {
      val aOnSort = scanned(byA, col("a") === 7)
      val bOnSort = scanned(byA, col("b") === 7)
      val aOnZ = scanned(byZ, col("a") === 7)
      val bOnZ = scanned(byZ, col("b") === 7)
      // the lexicographic layout prunes its sort column hard but reads
      // EVERYTHING for the other column; z-order prunes both
      assert(aOnSort < n / 10, s"a-filter on a-sorted: $aOnSort")
      assert(bOnSort > n / 2, s"b-filter on a-sorted should scan most rows: $bOnSort")
      assert(aOnZ < n / 2, s"a-filter on z-order should prune: $aOnZ")
      assert(bOnZ < n / 2, s"b-filter on z-order should prune: $bOnZ")
      assert(bOnZ < bOnSort, s"z-order must beat single-sort on the second column: $bOnZ vs $bOnSort")
    }
  }
}
