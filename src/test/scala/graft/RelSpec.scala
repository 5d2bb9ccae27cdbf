package graft

import org.apache.spark.sql.functions._

import graft.ops.rel

class RelSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a planted-skew fixture") {
    // one hot key (0) carries 80% of the left side
    val left = ((0 until 400).map(i => (0L, i.toLong)) ++
      (0 until 100).map(i => (1L + i % 7, 1000L + i)))
      .toDF("k", "row_id")
    val right = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "payload")

    val salted = rel.saltedJoin(left, right, "k", saltBy = "row_id", salts = 8)
      .select("k", "row_id", "payload")
    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin keeps rows whose saltBy column is NULL") {
    // h32(NULL) is NULL; without the coalesce the (key, _salt) equi-join
    // would silently drop these rows — the plain join keeps them.
    val left = Seq((0L, Some(1L)), (0L, None), (1L, None), (2L, Some(9L)))
      .toDF("k", "row_id")
    val right = (0L to 2L).map(k => (k, s"dim$k")).toDF("k", "payload")
    val salted = rel.saltedJoin(left, right, "k", saltBy = "row_id", salts = 4)
      .select("k", "row_id", "payload")
    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
    assert(salted.count() == 4)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads the hot key across all salt values") {
    val left = (0 until 512).map(i => (0L, i.toLong)).toDF("k", "row_id")
    val salts = left.withColumn("_salt",
        pmod(graft.functions.hashing.h32(col("row_id").cast("string")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts == 8, "hot key's rows must hit every salt bucket")
  }
}
