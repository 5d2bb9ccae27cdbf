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

  test("dHash: driver-side twin, non-negative 63-bit signature, deterministic") {
    val fixture = Seq(
      (1L, "text", "the quick brown fox".getBytes("UTF-8"), "s"),
      (2L, "text", "a completely different payload".getBytes("UTF-8"), "s"))
      .toDF("id", "kind", "payload", "source")
    val got = multimodal.dHash(fixture)
      .as[(Long, Long)].collect().toMap

    // driver twin: same salted-digest pixel chain, same comparison grid
    def twin(payload: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digs = (0 until 5).map { b =>
        md.digest(payload ++ s"#$b".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      def px(i: Int) =
        Integer.parseInt(digs(i / 16).substring(2 * (i % 16), 2 * (i % 16) + 2), 16)
      (0 until 63).map { j =>
        val (r, c) = (j / 8, j % 8)
        if (px(r * 9 + c) > px(r * 9 + c + 1)) 1L << j else 0L
      }.reduce(_ | _)
    }
    assert(got(1L) == twin("the quick brown fox".getBytes("UTF-8")))
    assert(got(2L) == twin("a completely different payload".getBytes("UTF-8")))
    assert(got.values.forall(_ >= 0L)) // bit 63 never set
  }

  test("dhashNearDupPairs: identical payloads pair at hamming 0; sigHammingPairs reranks") {
    val bytes = "same bytes land at hamming zero".getBytes("UTF-8")
    val fixture = Seq(
      (1L, "text", bytes, "s"),
      (2L, "text", bytes, "s"), // byte-identical copy of 1
      (3L, "text", "unrelated content entirely".getBytes("UTF-8"), "s"))
      .toDF("id", "kind", "payload", "source")
    val pairs = multimodal.dhashNearDupPairs(fixture)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0)))

    // hand-built signatures: block-sharing candidates survive only if
    // the EXACT Hamming rerank passes
    import graft.ops.dedup
    val sigs = Seq(
      (10L, 0L),                      // zero signature
      (11L, 7L),                      // Hamming 3 from 10 (shares blocks 1-3)
      (12L, (0xABL << 32) | 0x3CL))   // Hamming 9 from 10, 10 from 11
      .toDF("id", "sig")
    val got = dedup.sigHammingPairs(sigs, "id", "sig")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    // (10,11) found at d=3; (10,12) and (11,12) blocked or reranked out
    assert(got == Seq((10L, 11L, 3)))
  }

  test("audioFingerprint: one 15-bit fp per frame after the first; copies pair, shorts silent") {
    val long1 = ("alpha " * 40).trim          // ~239 bytes -> 4 frames -> 3 fps
    val long2 = ("other words here " * 16).trim
    val fixture = Seq(
      (1L, "audio", long1.getBytes("UTF-8"), "s"),
      (2L, "audio", long1.getBytes("UTF-8"), "s"),   // byte-identical copy
      (3L, "audio", long2.getBytes("UTF-8"), "s"),
      (4L, "audio", "short".getBytes("UTF-8"), "s"), // 1 frame -> 0 fps
      (5L, "audio", Array.empty[Byte], "s"))         // empty -> 0 frames
      .toDF("id", "kind", "payload", "source")
    val fps = multimodal.audioFingerprint(fixture)
      .as[(Long, Int, Long)].collect()
    val byId = fps.groupBy(_._1)
    assert(byId(1L).map(_._2).sorted.toSeq == Seq(1, 2, 3), "frames 1..n-1")
    assert(fps.forall(f => f._3 >= 0 && f._3 < (1 << 15)), "15-bit fps")
    // determinism + copy identity: id 2's sequence equals id 1's
    assert(byId(1L).map(t => (t._2, t._3)).sortBy(_._1).toSeq ==
      byId(2L).map(t => (t._2, t._3)).sortBy(_._1).toSeq)
    assert(!byId.contains(4L) && !byId.contains(5L))
    val pairs = multimodal.audioNearDupPairs(fixture)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
  }

  test("sceneChanges: repeated frame reads hamming 0 (no cut), distinct frames cut") {
    // payload = frame A, frame A again, then a different frame B:
    // boundary A->A is hamming 0 / no cut; A->B is a cut (stub pixels
    // are md5-random, E[hamming] ~ 31 >> 16)
    val a = "x" * 64
    val b = "y" * 64
    val fixture = Seq((1L, "video", (a + a + b).getBytes("UTF-8"), "s"))
      .toDF("id", "kind", "payload", "source")
    val r = multimodal.sceneChanges(fixture)
      .as[(Long, Int, Int, Boolean)].collect().sortBy(_._2)
    assert(r.length == 2)
    assert(r(0) == ((1L, 1, 0, false)), r(0).toString)
    assert(r(1)._3 > 16 && r(1)._4, r(1).toString)
  }
}
