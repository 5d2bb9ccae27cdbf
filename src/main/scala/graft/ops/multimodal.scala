package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: opaque `binary`
  * payloads (image/audio/video/text bytes) with typed metadata, flowing
  * through schema-checked, partition-parallel decode/featurize/sample
  * stages.
  *
  * The DECODERS here are deliberate stubs — this container has no
  * image/audio codecs — but everything Spark-level is real and tested: the
  * schema contract, the binary column handling, the batched-per-partition
  * execution shape (one decoder init per partition, not per row — the same
  * shape a JNI/FFmpeg/JPEG decoder needs), and the pushdown-friendly
  * metadata layout. Swapping [[StubDecoder]] for a real codec changes no
  * plan shape.
  *
  * Scale notes: payload bytes ride in parquet binary columns; metadata
  * (kind, byte_len, checksum) is scalar and therefore min/max/bloom
  * prunable at scan time, so "all jpegs over 1 MB" never reads the bytes
  * of anything else. Featurization is a narrow map — zero shuffle.
  */
object multimodal {

  /** One media row: id, modality kind, opaque payload, source name. */
  final case class MediaItem(id: Long, kind: String, payload: Array[Byte], source: String)

  /** Extracted features: deterministic stand-ins for decoded content
    * (real pipeline: pixel stats, mel spectrogram, CLIP embedding, ...). */
  final case class MediaFeatures(
      id: Long, kind: String, byteLen: Long, checksum: String, embedding: Array[Float])

  /** STUB decoder — stands in for the real image/audio codec this
    * container lacks. Deterministic: features derive from the md5 of the
    * payload, so results are reproducible (and oracle-checkable) anywhere.
    * The interface is the real contract: init once per partition, decode
    * many payloads. */
  final class StubDecoder {
    private val md = MessageDigest.getInstance("MD5")

    def checksumHex(payload: Array[Byte]): String =
      md.digest(payload).map("%02x".format(_)).mkString

    /** Fake `dims`-dim embedding: byte i of the md5 scaled to [0,1].
      * A real decoder would run the model here. */
    def embed(payload: Array[Byte], dims: Int): Array[Float] = {
      val h = md.digest(payload)
      Array.tabulate(dims)(i => (h(i) & 0xff) / 255.0f)
    }
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes. Stands in
    * for `spark.read.format("binaryFile")` over an image/audio bucket. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit("text").as("kind"),
      col(textCol).cast("binary").as("payload"),
      col(sourceCol).as("source"))

  /** Featurize via the typed per-partition path — the execution shape a
    * real codec needs (decoder constructed ONCE per partition, rows
    * streamed through it; no per-row init, no driver collect). */
  def featurize(items: Dataset[MediaItem], dims: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val dec = new StubDecoder // one init per partition (real-codec shape)
      it.map { m =>
        MediaFeatures(m.id, m.kind, m.payload.length.toLong,
          dec.checksumHex(m.payload), dec.embed(m.payload, dims))
      }
    }
  }

  /** The same features as pure codegen expressions — no JVM boundary, used
    * to cross-check the mapPartitions path and as the fast path when
    * features are expression-derivable. */
  def featurizeExpr(media: DataFrame, dims: Int = 8): DataFrame = {
    val ck = md5(col("payload"))
    val emb = array((0 until dims).map(i =>
      (conv(substring(ck, 2 * i + 1, 2), 16, 10).cast("int") / lit(255.0)).cast("float")): _*)
    media.select(col("id"), col("kind"),
      length(col("payload")).cast("long").as("byteLen"),
      ck.as("checksum"), emb.as("embedding"))
  }

  /** 63-bit difference-hash (dHash) perceptual fingerprint of a media
    * payload — the image-dedup primitive: real pipelines decode to a
    * 9×8 grayscale grid and set bit `r·8+c` when `pixel[r][c] >
    * pixel[r][c+1]`, so near-identical images land within a few Hamming
    * bits. The DECODE here is the [[StubDecoder]] stand-in (this
    * container has no image codec): the 72 "pixels" derive from a chain
    * of 5 salted md5 digests of the payload — deterministic,
    * expression-only, oracle-reproducible — while the bit layout, the
    * comparison grid, and everything downstream (blocking, Hamming
    * rerank) is exactly what a real decoder would feed. Swapping in real
    * pixels changes no plan shape and no pairing code.
    *
    * 63 bits, not 64 (comparison (7,7) dropped): signatures stay
    * non-negative in a signed int64 — the [[graft.ops.sketch.BloomWordBits]]
    * portability discipline, and what [[graft.ops.dedup.sigHammingPairs]]
    * requires. Pure per-row projection: zero shuffle, codegen'd md5 —
    * at 100 TB the fingerprint is free scan work next to the decode. */
  def dHash(media: DataFrame): DataFrame = {
    val digs = (0 until 5).map(b =>
      md5(concat(col("payload"), lit("#" + b).cast("binary"))))
    def px(i: Int): Column =
      conv(substring(digs(i / 16), 2 * (i % 16) + 1, 2), 16, 10).cast("int")
    val sig = (0 until 63).map { j =>
      val (r, c) = (j / 8, j % 8)
      when(px(r * 9 + c) > px(r * 9 + c + 1), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    media.select(col("id"), sig.as("dhash"))
  }

  /** Near-duplicate media pairs by dHash Hamming distance — the
    * image-dedup path: [[dHash]] fingerprints fed to the generic
    * 4-block pigeonhole pairing ([[graft.ops.dedup.sigHammingPairs]],
    * complete for Hamming ≤ 3). With the stub decode, "visually near"
    * degenerates to "byte-identical" (distinct payloads hash to random
    * signatures); with a real decoder the SAME code finds re-encoded /
    * lightly-edited copies. Returns `(id_a, id_b, hamming)`. */
  def dhashNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    dedup.sigHammingPairs(dHash(media), "id", "dhash", maxHamming)

  /** Frame sampling plumbing: split a payload into fixed-size frames and
    * keep every `stride`-th one (a video keyframe-sampler stands here; the
    * byte slicing is the stand-in decode). Emits (id, frame_idx, frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
    // Empty payloads emit ZERO frames. Unguarded, sequence(0, -1) yields
    // [0, -1] (descending default step), which would fabricate two bogus
    // frames per empty document.
    val frames = when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
    media
      .select(col("id"), posexplode(frames))
      .toDF("id", "frame_idx", "frame")
      .where(col("frame_idx") % stride === 0)
  }
}
