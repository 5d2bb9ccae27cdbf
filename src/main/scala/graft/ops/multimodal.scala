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

  /** Chromaprint-SHAPED audio fingerprints: frame the payload, derive
    * per-frame band "energies" (stub: the 16 bytes of the frame's md5 —
    * a real pipeline puts mel/chroma band energies here; nothing
    * downstream changes), then fingerprint bit `b` of frame `t` is the
    * classic double difference `(E_b−E_{b+1})(t) − (E_b−E_{b+1})(t−1) >
    * 0` — energy structure across BOTH band and time, which is what
    * makes audio fingerprints robust to level/offset changes (Haitsma &
    * Kalker 2002; chromaprint). Emits one 15-bit sub-fingerprint per
    * frame from the second frame on: `(id, frame_idx, fp)`.
    *
    * Scale shape: frame explode is row-local; the time difference is one
    * id-keyed window (lag over frame_idx) — a single shuffle on the
    * media id, the same per-item-sequence idiom as the event family. */
  def audioFingerprint(media: DataFrame, frameBytes: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = md5(col("frame"))
    def e(b: Int): Column = conv(substring(d, 2 * b + 1, 2), 16, 10).cast("int")
    val framed = sampleFrames(media, frameBytes, stride = 1)
      .select(Seq(col("id"), col("frame_idx")) ++
        (0 until 15).map(b => (e(b) - e(b + 1)).as(s"_d$b")): _*)
    val w = Window.partitionBy(col("id")).orderBy(col("frame_idx"))
    framed
      .select(Seq(col("id"), col("frame_idx")) ++
        (0 until 15).map(b =>
          when(col(s"_d$b") - lag(col(s"_d$b"), 1).over(w) > 0, lit(1L << b))
            .otherwise(lit(0L)).as(s"_b$b")): _*)
      .where(col("frame_idx") > 0) // no predecessor, no fingerprint
      .select(col("id"), col("frame_idx"),
        (0 until 15).map(b => col(s"_b$b")).reduce(_ bitwiseOR _).as("fp"))
  }

  /** Audio near-dup pairs by SHARED sub-fingerprints — the
    * Shazam/chromaprint matching discipline (count common
    * sub-fingerprints, not Hamming over one signature): explode each
    * item's DISTINCT fps, drop fps shared by more than `maxDf` items
    * (the silence/boilerplate frame of audio — same df-cap rule as every
    * inverted-index pair stage here), join, count per pair. Returns
    * `(id_a, id_b, n_shared)` with `n_shared >= minShared`. */
  def audioNearDupPairs(media: DataFrame, frameBytes: Int = 64,
      minShared: Int = 2, maxDf: Int = 256): DataFrame = {
    // df cap as a streamed count + broadcast hot-fp anti-join on ONE
    // pinned repartition(fp) of the distinct table — the same
    // discipline as [[graft.ops.dedup.winnowPairs]]: the aggregate and
    // the anti-join probe share the exchange (ReuseExchange → one
    // fingerprint-pipeline scan), and the silence/boilerplate frame of
    // audio (one fp across millions of items) is absorbed by map-side
    // partials instead of buffering as a single window partition.
    val fpx = audioFingerprint(media, frameBytes)
      .select(col("id"), col("fp")).distinct()
      .repartition(col("fp"))
    val hot = fpx.groupBy(col("fp"))
      .agg(count(lit(1)).as("_df")).where(col("_df") > maxDf)
      .select(col("fp"))
    val fpo = fpx.join(broadcast(hot), Seq("fp"), "left_anti")
      .select(col("fp"), col("id"))
    val a = fpo.select(col("fp"), col("id").as("id_a"))
    val b = fpo.select(col("fp"), col("id").as("id_b"))
    a.join(b, Seq("fp")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Video SCENE-CHANGE detection over sampled frames: per-frame dHash
    * (same 63-bit difference-grid construction as [[dHash]], here over
    * each frame's stub pixels), then the Hamming distance to the
    * PREVIOUS frame via one id-keyed lag window; a distance above
    * `cutThreshold` flags a cut. This is the shot-boundary primitive a
    * video pipeline keyframes on (pick one frame per scene instead of
    * every nth) — with a real decoder the same plan finds real cuts; the
    * stub makes every distinct frame a "cut", which the spec pins.
    * Returns `(id, frame_idx, hamming, is_cut)` from frame 1 on.
    *
    * Scale shape: frame explode + fingerprint are row-local; the only
    * shuffle is the per-id lag window — identical to
    * [[audioFingerprint]]'s. */
  def sceneChanges(media: DataFrame, frameBytes: Int = 64,
      cutThreshold: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digs = (0 until 5).map(b =>
      md5(concat(col("frame"), lit("#" + b).cast("binary"))))
    def px(i: Int): Column =
      conv(substring(digs(i / 16), 2 * (i % 16) + 1, 2), 16, 10).cast("int")
    val sig = (0 until 63).map { j =>
      val (r, c) = (j / 8, j % 8)
      when(px(r * 9 + c) > px(r * 9 + c + 1), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val w = Window.partitionBy(col("id")).orderBy(col("frame_idx"))
    sampleFrames(media, frameBytes, stride = 1)
      .select(col("id"), col("frame_idx"), sig.as("_h"))
      .select(col("id"), col("frame_idx"),
        bit_count(col("_h").bitwiseXOR(lag(col("_h"), 1).over(w)))
          .cast("int").as("hamming"))
      .where(col("frame_idx") > 0)
      .withColumn("is_cut", col("hamming") > cutThreshold)
  }

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
