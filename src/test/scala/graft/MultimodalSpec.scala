package graft

import org.apache.spark.sql.functions._

import graft.ops.multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media =
    multimodal.fromText(docs, "doc_id", "text", "source")

  test("fromText: schema contract (id, kind, binary payload, source)") {
    val sch = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch == Map("id" -> "bigint", "kind" -> "string",
      "payload" -> "binary", "source" -> "string"))
  }

  test("mapPartitions featurize path equals the pure-expression path") {
    val typed = multimodal.featurize(media.as[multimodal.MediaItem], dims = 8)
      .collect().map(f => f.id -> ((f.byteLen, f.checksum, f.embedding.toSeq))).toMap
    val exprd = multimodal.featurizeExpr(media, dims = 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3), r.getSeq[Float](4))))
      .toMap
    assert(typed.keySet == exprd.keySet)
    typed.foreach { case (id, v) => assert(v == exprd(id), s"doc $id") }
  }

  test("sampleFrames: frame count, stride, and byte content") {
    val one = Seq((1L, "text", ("a" * 100 + "b" * 100).getBytes("UTF-8"), "s"))
      .toDF("id", "kind", "payload", "source")
    val frames = multimodal.sampleFrames(one, frameBytes = 64, stride = 2)
      .orderBy("frame_idx").collect()
    // 200 bytes -> frames 0..3 (last short), stride 2 keeps 0 and 2
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") == "a" * 64)
    // frame 2 spans bytes 129..192 — all inside the "b" half
    assert(new String(frames(1).getAs[Array[Byte]](2), "UTF-8") == "b" * 64)
  }
}
