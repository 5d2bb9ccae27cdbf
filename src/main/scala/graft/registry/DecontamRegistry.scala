package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** decontam-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object DecontamRegistry extends Registry {

    // north-star: benchmark decontamination — train docs (doc_id % 20 != 0)
    // sharing distinct 8-gram shingles with the held-out slice
    // (doc_id % 20 == 0). Bench grams broadcast: the train corpus is never
    // shuffled; only matching rows reach the count aggregation.
  b.q(
    "decontam_overlap" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      decontam.contaminationHits(
        docs.where(col("doc_id") % 20 =!= 0),
        docs.where(col("doc_id") % 20 === 0),
        "text", "doc_id", n = 8)
        .orderBy(col("doc_id"))
    })
  )
  b.o(
    "decontam_overlap" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
         |  i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS grams
         |  FROM t WHERE len(toks) >= 8),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
         |tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 != 0)
         |SELECT doc_id, count(*) AS hits FROM tg JOIN bg USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

    // north-star: the bench gram set as a constant-size Bloom sketch —
    // 64 words of 63 bits; one hash-only distinct, one bit_or aggregate.
  b.q(
    "decontam_bloom_sketch" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0), "text")
        .orderBy(col("word"))
    })
  )
    // Same 63-bit-word packing over the same affine family; bit_or
    // aggregate onto the full 64-word spine.
  b.o(
    "decontam_bloom_sketch" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
         |  i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS grams
         |  FROM t WHERE len(toks) >= 8),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
         |h AS (SELECT DISTINCT ${hashing.sqlH32("gram")} AS hb,
         |  ${hashing.sqlH32b("gram")} AS hb2 FROM bg),
         |c AS (SELECT (hb + j * hb2) % 4032 AS pos
         |  FROM h CROSS JOIN range(0, 3) r(j)),
         |w AS (SELECT pos // 63 AS word,
         |  bit_or(1::BIGINT << (pos % 63)::INT) AS bits FROM c GROUP BY 1)
         |SELECT s.word, coalesce(w.bits, 0)::BIGINT AS bits
         |FROM range(0, 64) s(word) LEFT JOIN w USING (word) ORDER BY word""".stripMargin
  )

    // north-star: decontamination via the bloom — the words ride the
    // plan as ONE literal array; train corpus scanned once, never
    // shuffled; false positives deterministic (same public hash family
    // in the oracle), false negatives impossible. Sized so the FP rate
    // is negligible at both oracle scales (~1M bits for <= ~25k grams),
    // unlike the 64-word display sketch above.
  b.q(
    "decontam_bloom" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bl = decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0),
        "text", mBits = ScreenBloomBits)
      decontam.bloomScreenHits(
        docs.where(col("doc_id") % 20 =!= 0), bl, "text", "doc_id",
        mBits = ScreenBloomBits)
        .orderBy(col("doc_id"))
    })
  )
    // The same bloom rebuilt in SQL, probed gram-by-gram: a gram is a
    // member iff all 3 of its bits are set — false positives reproduce
    // exactly (same public hash family).
  b.o(
    "decontam_bloom" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
         |  i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS grams
         |  FROM t WHERE len(toks) >= 8),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
         |h AS (SELECT DISTINCT ${hashing.sqlH32("gram")} AS hb,
         |  ${hashing.sqlH32b("gram")} AS hb2 FROM bg),
         |c AS (SELECT (hb + j * hb2) % ${ScreenBloomBits} AS pos
         |  FROM h CROSS JOIN range(0, 3) r(j)),
         |w AS (SELECT pos // 63 AS word,
         |  bit_or(1::BIGINT << (pos % 63)::INT) AS bits FROM c GROUP BY 1),
         |tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 != 0),
         |th AS (SELECT doc_id, gram, ${hashing.sqlH32("gram")} AS hb,
         |  ${hashing.sqlH32b("gram")} AS hb2 FROM tg),
         |pc AS (SELECT doc_id, gram, (hb + j * hb2) % ${ScreenBloomBits} AS pos
         |  FROM th CROSS JOIN range(0, 3) r(j)),
         |ok AS (SELECT doc_id, gram FROM pc JOIN w ON pc.pos // 63 = w.word
         |  AND (w.bits & (1::BIGINT << (pc.pos % 63)::INT)) != 0
         |  GROUP BY doc_id, gram HAVING count(*) = 3)
         |SELECT doc_id, count(*) AS hits FROM ok GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
  )

    // north-star: the stateless in-row bloom gate — survivors of the
    // screen; the same call is streaming-legal (no state, no explode).
  b.q(
    "decontam_bloom_clean" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bl = decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0),
        "text", mBits = ScreenBloomBits)
      decontam.bloomClean(docs.where(col("doc_id") % 20 =!= 0), bl, "text",
        mBits = ScreenBloomBits)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    })
  )
    // Complement of decontam_bloom at minHits=1: train docs with ZERO
    // bloom-member grams (short docs have no grams and survive).
  b.o(
    "decontam_bloom_clean" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
         |  i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS grams
         |  FROM t WHERE len(toks) >= 8),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
         |h AS (SELECT DISTINCT ${hashing.sqlH32("gram")} AS hb,
         |  ${hashing.sqlH32b("gram")} AS hb2 FROM bg),
         |c AS (SELECT (hb + j * hb2) % ${ScreenBloomBits} AS pos
         |  FROM h CROSS JOIN range(0, 3) r(j)),
         |w AS (SELECT pos // 63 AS word,
         |  bit_or(1::BIGINT << (pos % 63)::INT) AS bits FROM c GROUP BY 1),
         |tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 != 0),
         |th AS (SELECT doc_id, gram, ${hashing.sqlH32("gram")} AS hb,
         |  ${hashing.sqlH32b("gram")} AS hb2 FROM tg),
         |pc AS (SELECT doc_id, gram, (hb + j * hb2) % ${ScreenBloomBits} AS pos
         |  FROM th CROSS JOIN range(0, 3) r(j)),
         |ok AS (SELECT doc_id, gram FROM pc JOIN w ON pc.pos // 63 = w.word
         |  AND (w.bits & (1::BIGINT << (pc.pos % 63)::INT)) != 0
         |  GROUP BY doc_id, gram HAVING count(*) = 3)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % 20 != 0 AND doc_id NOT IN (SELECT DISTINCT doc_id FROM ok)
         |ORDER BY doc_id""".stripMargin
  )

    // north-star: embedding-space decontamination — the paraphrase
    // complement of the n-gram screen; bench vectors broadcast, train
    // corpus scanned once, never shuffled.
  b.q(
    "decontam_semantic" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      decontam.semanticHits(
        emb.where(col("vec_id") >= 100),
        emb.where(col("vec_id") < 100),
        "vec_id", "embedding", tau = 0.45)
        .orderBy(col("train_id"), col("bench_id"))
    })
  )
  b.o(
    "decontam_semantic" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id AS bench_id, e AS be FROM s WHERE vec_id < 100),
         |c AS (SELECT vec_id AS train_id, e FROM s WHERE vec_id >= 100),
         |p AS (SELECT train_id, bench_id,
         |  floor((list_dot_product(e, be)
         |  * (CASE WHEN list_dot_product(e, e) > 0 THEN 1.0/sqrt(list_dot_product(e, e)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(be, be) > 0 THEN 1.0/sqrt(list_dot_product(be, be)) ELSE 0.0 END))
         |    * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM c CROSS JOIN b)
         |SELECT train_id, bench_id, cos FROM p WHERE cos >= 0.45
         |ORDER BY train_id, bench_id""".stripMargin
  )

    // north-star: provenance decontamination — drop train docs whose URL
    // host appears among the held-out slice's hosts (doc_id % 530 == 0
    // is the "benchmark scrape"); hosts synthesized over a 37-residue
    // space so the screen is selective but non-trivial at every SF, with
    // casing/www/port noise the canonicalizer must fold.
  b.q(
    "decontam_domain_screen" -> ((s, dir) => {
      val d = col("doc_id")
      val url = concat(lit("https://"),
        when(d % 2 === 0, lit("WWW.")).otherwise(lit("")),
        lit("docs-"), (d % 37).cast("string"), lit(".Example.com"),
        when(d % 3 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), d.cast("string"))
      val docs = table(s, dir, "documents").select(d, url.as("url"))
      decontam.domainScreen(
          docs.where(d % 530 =!= 0), docs.where(d % 530 === 0), "url")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    })
  )
    // Ground-truth twin: the synthesized host is a pure function of
    // doc_id (residue mod 37), so the oracle screens on residues — the
    // Spark side must reach the same set THROUGH url synthesis + host
    // canonicalization (www/port/case folding).
  b.o(
    "decontam_domain_screen" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id % 530 != 0
        |  AND doc_id % 37 NOT IN
        |    (SELECT DISTINCT doc_id % 37 FROM documents WHERE doc_id % 530 = 0)
        |ORDER BY doc_id""".stripMargin
  )
}
