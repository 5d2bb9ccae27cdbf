package graft

import org.apache.spark.sql.functions._

import graft.functions.vectors
import graft.ops.quant

class QuantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("q_vec is array<tinyint> in [-127,127]; zero vectors quantize to zeros") {
    val df = quant.quantized(
      Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    assert(df.schema("q_vec").dataType.simpleString == "array<tinyint>")
    val rows = df.select("vec_id", "q_vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(rows(1L) == Seq[Byte](64, -127, 32)) // 0.5/s=63.5 -> 64; s=1/127
    assert(rows(2L) == Seq[Byte](0, 0, 0))
    assert(rows.values.flatten.forall(b => b >= -127 && b <= 127))
  }

  test("dequantized dot approximates the exact dot within int8 error bounds") {
    val q = (0 until 64).map(i => math.sin(i + 1.0))
    val (qq, qs) = quant.quantizeQuery(q)
    val stats = quant.quantized(emb)
      .select(
        vectors.dotProduct(col("embedding"), vectors.vecLit(q)).as("exact"),
        quant.dequantizedDot(col("q_vec"), col("q_scale"),
          array(qq.map(lit): _*), lit(qs)).as("approx"))
      .select(max(abs(col("exact") - col("approx"))).as("maxerr"),
        max(abs(col("exact"))).as("maxdot"))
      .head()
    // relative error of symmetric int8 ~ dim * (s_a*s_b/2); generous bound
    assert(stats.getDouble(0) < 0.05 * math.max(1.0, stats.getDouble(1)),
      s"quantization error too large: ${stats.getDouble(0)}")
  }

  test("quantized top-10 largely agrees with exact top-10 (rerank recall)") {
    val q = (0 until 64).map(i => math.sin(i + 1.0))
    val (qq, qs) = quant.quantizeQuery(q)
    val approx = quant.quantized(emb)
      .select(col("vec_id"), quant.dequantizedDot(col("q_vec"), col("q_scale"),
        array(qq.map(lit): _*), lit(qs)).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val exact = emb
      .select(col("vec_id"), vectors.dotProduct(col("embedding"), vectors.vecLit(q)).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    assert((approx intersect exact).size >= 7,
      s"int8 first-pass should mostly agree with exact: $approx vs $exact")
  }
}
