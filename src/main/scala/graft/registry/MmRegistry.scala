package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** mm-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object MmRegistry extends Registry {

    // north-star: video scene-change detection — per-frame dHash, then
    // the Hamming distance to the previous frame via one id-keyed lag
    // window; the oracle replays the identical digest/bit arithmetic.
  b.q(
    "mm_scene_changes" -> ((s, dir) =>
      multimodal.sceneChanges(
        multimodal.fromText(table(s, dir, "documents"), "doc_id", "text",
          "source"))
        .orderBy(col("id"), col("frame_idx")))
  )
  b.o(
    "mm_scene_changes" -> {
      val digs = (0 until 5).map(b => s"md5(frame || '#$b') AS dg$b").mkString(", ")
      val pxs = (0 until 72).map(i =>
        s"(('0x' || substr(dg${i / 16}, ${2 * (i % 16) + 1}, 2))::INT) AS px$i")
        .mkString(", ")
      val sig = (0 until 63).map { j =>
        val (r, c) = (j / 8, j % 8)
        s"(CASE WHEN px${r * 9 + c} > px${r * 9 + c + 1} THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH f AS (SELECT doc_id, i AS frame_idx,
         |    substr(text, i * 64 + 1, 64) AS frame
         |  FROM documents, unnest(range(0,
         |    CAST(ceil(length(text) / 64.0) AS INT))) u(i)
         |  WHERE length(text) > 0),
         |d AS (SELECT doc_id, frame_idx, $digs FROM f),
         |p AS (SELECT doc_id, frame_idx, $pxs FROM d),
         |h AS (SELECT doc_id AS id, frame_idx, ($sig)::BIGINT AS hv FROM p),
         |x AS (SELECT id, frame_idx,
         |    bit_count(xor(hv, lag(hv, 1) OVER w))::INT AS hamming
         |  FROM h WINDOW w AS (PARTITION BY id ORDER BY frame_idx))
         |SELECT id, frame_idx, hamming, hamming > 16 AS is_cut
         |FROM x WHERE frame_idx > 0 ORDER BY id, frame_idx""".stripMargin
    }
  )

    // north-star: chromaprint-shaped audio fingerprints — per-frame
    // band-energy double differences (band x time); frame explode
    // row-local, time diff one id-keyed lag window.
  b.q(
    "mm_audio_fp" -> ((s, dir) =>
      multimodal.audioFingerprint(
        multimodal.fromText(table(s, dir, "documents"), "doc_id", "text",
          "source"))
        .orderBy(col("id"), col("frame_idx")))
  )
  b.o(
    "mm_audio_fp" -> {
      val energies = (0 until 16).map(b =>
        s"(('0x' || substr(md5(frame), ${2 * b + 1}, 2))::INT) AS e$b").mkString(", ")
      val diffs = (0 until 15).map(b => s"(e$b - e${b + 1}) AS d$b").mkString(", ")
      val bits = (0 until 15).map(b =>
        s"(CASE WHEN d$b - lag(d$b, 1) OVER w > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH f AS (SELECT doc_id, i AS frame_idx,
         |    substr(text, i * 64 + 1, 64) AS frame
         |  FROM documents, unnest(range(0,
         |    CAST(ceil(length(text) / 64.0) AS INT))) u(i)
         |  WHERE length(text) > 0),
         |e AS (SELECT doc_id, frame_idx, $energies FROM f),
         |d AS (SELECT doc_id, frame_idx, $diffs FROM e),
         |p AS (SELECT doc_id AS id, frame_idx, ($bits)::BIGINT AS fp
         |  FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
         |SELECT id, frame_idx, fp FROM p WHERE frame_idx > 0
         |ORDER BY id, frame_idx""".stripMargin
    }
  )

    // north-star: audio near-dup by SHARED sub-fingerprints (the
    // Shazam/chromaprint matching discipline) — planted byte-identical
    // copies must pair; minShared=2 kills random 15-bit collisions.
  b.q(
    "mm_audio_neardup" -> ((s, dir) => {
      val base = table(s, dir, "documents")
      val planted = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      multimodal.audioNearDupPairs(
        multimodal.fromText(planted, "doc_id", "text", "source"))
        .orderBy(col("id_a"), col("id_b"))
    })
  )
  b.o(
    "mm_audio_neardup" -> {
      val energies = (0 until 16).map(b =>
        s"(('0x' || substr(md5(frame), ${2 * b + 1}, 2))::INT) AS e$b").mkString(", ")
      val diffs = (0 until 15).map(b => s"(e$b - e${b + 1}) AS d$b").mkString(", ")
      val bits = (0 until 15).map(b =>
        s"(CASE WHEN d$b - lag(d$b, 1) OVER w > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents
         |    WHERE doc_id % 97 = 0),
         |f AS (SELECT doc_id, i AS frame_idx,
         |    substr(text, i * 64 + 1, 64) AS frame
         |  FROM u, unnest(range(0,
         |    CAST(ceil(length(text) / 64.0) AS INT))) u2(i)
         |  WHERE length(text) > 0),
         |e AS (SELECT doc_id, frame_idx, $energies FROM f),
         |d AS (SELECT doc_id, frame_idx, $diffs FROM e),
         |p AS (SELECT doc_id AS id, ($bits)::BIGINT AS fp
         |  FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
         |  QUALIFY frame_idx > 0),
         |fp AS (SELECT DISTINCT id, fp FROM p),
         |ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 256),
         |fo AS (SELECT fp.id, fp.fp FROM fp JOIN ok USING (fp)),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_shared
         |  FROM fo a JOIN fo b ON a.fp = b.fp AND a.id < b.id GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared FROM pr WHERE n_shared >= 2
         |ORDER BY id_a, id_b""".stripMargin
    }
  )

    // north-star: multimodal featurization — binary payloads with typed
    // metadata; stub decoder features via the expression path (the
    // mapPartitions path is cross-checked in MultimodalSpec).
  b.q(
    "mm_features" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.featurizeExpr(media, dims = 4)
        .select(col("id"), col("kind"), col("byteLen").as("byte_len"),
          col("checksum"),
          col("embedding")(0).as("e0"), col("embedding")(1).as("e1"),
          col("embedding")(2).as("e2"), col("embedding")(3).as("e3"))
        .orderBy(col("id"))
    })
  )
  b.o(
    "mm_features" ->
      s"""SELECT doc_id AS id, 'text' AS kind,
         |  octet_length(encode(text)) AS byte_len, md5(text) AS checksum,
         |  ${(0 until 4).map(i =>
        s"((('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT) / 255.0)::FLOAT AS e$i").mkString(", ")}
         |FROM documents ORDER BY id""".stripMargin
  )

    // north-star: the TYPED featurize path (mapPartitions, one decoder
    // init per partition — the real-codec execution shape) must produce
    // the same rows as the expression path; same oracle as mm_features.
  b.q(
    "mm_features_typed" -> ((s, dir) => {
      import s.implicits._
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
        .as[multimodal.MediaItem]
      multimodal.featurize(media, dims = 4).toDF()
        .select(col("id"), col("kind"), col("byteLen").as("byte_len"),
          col("checksum"),
          col("embedding")(0).as("e0"), col("embedding")(1).as("e1"),
          col("embedding")(2).as("e2"), col("embedding")(3).as("e3"))
        .orderBy(col("id"))
    })
  )
    // identical oracle to mm_features: the typed mapPartitions decoder
    // must be row-equal to the expression path
  b.o(
    "mm_features_typed" ->
      s"""SELECT doc_id AS id, 'text' AS kind,
         |  octet_length(encode(text)) AS byte_len, md5(text) AS checksum,
         |  ${(0 until 4).map(i =>
        s"((('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT) / 255.0)::FLOAT AS e$i").mkString(", ")}
         |FROM documents ORDER BY id""".stripMargin
  )

    // north-star: perceptual-hash media fingerprint — stubbed decode,
    // real bit layout; pure per-row projection, zero shuffle.
  b.q(
    "mm_dhash" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.dHash(media).orderBy(col("id"))
    })
  )
    // Same salted-digest pixel chain and 63-bit comparison grid.
  b.o(
    "mm_dhash" ->
      s"""WITH d AS (SELECT doc_id, ${(0 until 5).map(b =>
        s"md5(text || '#$b') AS d$b").mkString(", ")} FROM documents),
         |p AS (SELECT doc_id, ${(0 until 72).map(i =>
        s"(('0x' || substr(d${i / 16}, ${2 * (i % 16) + 1}, 2))::INT) AS px$i").mkString(", ")}
         |FROM d)
         |SELECT doc_id AS id,
         |  (${(0 until 63).map { j =>
        val (r, c) = (j / 8, j % 8)
        s"(CASE WHEN px${r * 9 + c} > px${r * 9 + c + 1} THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")})::BIGINT AS dhash
         |FROM p ORDER BY id""".stripMargin
  )

    // north-star: image near-dup pairs — dHash + the generic 4-block
    // Hamming pairing (complete for d <= 3); stub decode makes near =
    // byte-identical, a real decoder changes no pairing code. The
    // corpus is seeded with id-offset byte-identical copies of the
    // doc_id % 97 slice so the pairing is exercised at every scale
    // (the raw corpus has no exact dups at sf0.01).
  b.q(
    "mm_dhash_pairs" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val seeded = docs.unionByName(
        docs.where(col("doc_id") % 97 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      multimodal.dhashNearDupPairs(
          multimodal.fromText(seeded, "doc_id", "text", "source"))
        .orderBy(col("id_a"), col("id_b"))
    })
  )
    // Same signature, same 16+16+16+15 block keys, same d<=3 rerank,
    // same seeded byte-identical copies.
  b.o(
    "mm_dhash_pairs" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
         |d AS (SELECT doc_id, ${(0 until 5).map(b =>
        s"md5(text || '#$b') AS d$b").mkString(", ")} FROM u),
         |p AS (SELECT doc_id, ${(0 until 72).map(i =>
        s"(('0x' || substr(d${i / 16}, ${2 * (i % 16) + 1}, 2))::INT) AS px$i").mkString(", ")}
         |FROM d),
         |s AS (SELECT doc_id AS id,
         |  (${(0 until 63).map { j =>
        val (r, c) = (j / 8, j % 8)
        s"(CASE WHEN px${r * 9 + c} > px${r * 9 + c + 1} THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")})::BIGINT AS dhash FROM p),
         |bd AS (SELECT id, dhash, q,
         |  CASE q WHEN 0 THEN dhash & 65535 WHEN 1 THEN (dhash >> 16) & 65535
         |         WHEN 2 THEN (dhash >> 32) & 65535 ELSE (dhash >> 48) & 32767 END AS key
         |  FROM s, range(0, 4) r(q)),
         |c AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b,
         |  bit_count(xor(a.dhash, b2.dhash))::INT AS hamming
         |  FROM bd a JOIN bd b2 ON a.q = b2.q AND a.key = b2.key AND a.id < b2.id)
         |SELECT id_a, id_b, hamming FROM c WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin
  )

    // north-star: frame-sampling plumbing — fixed-size payload frames,
    // every 2nd kept (stride), frame identity checked by md5.
  b.q(
    "mm_frames" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
        .select(col("id"), col("frame_idx"), md5(col("frame")).as("frame_ck"))
        .orderBy(col("id"), col("frame_idx"))
    })
  )
  b.o(
    "mm_frames" ->
      """WITH f AS (SELECT doc_id AS id, u.i::INT AS frame_idx,
        |    substr(text, (u.i*64)::INT + 1, 64) AS fr
        |  FROM documents, unnest(range(0, ceil(length(text)/64.0)::BIGINT)) u(i))
        |SELECT id, frame_idx, md5(fr) AS frame_ck
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY id, frame_idx""".stripMargin
  )

    // north-star: within-asset frame dedup meter — static scenes and
    // duplicated segments show as repeated frame checksums; the number
    // that decides whether to keyframe-sample a video before featurize.
  b.q(
    "mm_frame_dedup" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"),
        "doc_id", "text", "source")
      multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(md5(col("frame"))).as("n_distinct"))
        .withColumn("dup_frames", col("n_frames") - col("n_distinct"))
        .orderBy(col("id"))
    })
  )
  b.o(
    "mm_frame_dedup" ->
      """WITH f AS (SELECT doc_id AS id,
        |    substr(text, (u.i*64)::INT + 1, 64) AS fr
        |  FROM documents, unnest(range(0, ceil(length(text)/64.0)::BIGINT)) u(i))
        |SELECT id, count(*)::BIGINT AS n_frames,
        |  count(DISTINCT md5(fr))::BIGINT AS n_distinct,
        |  (count(*) - count(DISTINCT md5(fr)))::BIGINT AS dup_frames
        |FROM f GROUP BY id ORDER BY id""".stripMargin
  )
}
