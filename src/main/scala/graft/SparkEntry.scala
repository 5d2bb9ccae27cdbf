package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram}
import graft.streaming.EventStream

/** Driver contract — one named query per implemented operator
  * (SURVEY.md §2), each with a DuckDB-equivalent oracle SQL where
  * ANSI-expressible.
  *
  * Oracle determinism rules (SURVEY.md §7.4): every query emits a total
  * deterministic order (unique tiebreak column last), quantizes float
  * scores to 4 decimals half-up (`+ 0.0` normalizes IEEE -0.0), renders
  * timestamps as `yyyy-MM-dd` strings, and aliases every computed column
  * identically in the Spark plan and the SQL.
  */
object SparkEntry {

  // ---- shared fixtures -----------------------------------------------

  /** Deterministic 64-dim query vectors (embedding tables are 64-dim,
    * ~unit-norm — TESTDATA.md). Literal doubles round-trip exactly through
    * `Double.toString`, so the SQL literal parses to identical bits. */
  private[graft] val Q1: Seq[Double] = (0 until 64).map(i => math.sin(i + 1.0))
  private[graft] val Q2: Seq[Double] = (0 until 64).map(i => math.cos(2.0 * i + 1.0))

  /** Multi-token query for MaxSim: Q1 viewed as 4 token vectors of 16
    * dims — the same layout `retrieval_maxsim_topk` imposes on the
    * document side. */
  private[graft] val QTok: Seq[Seq[Double]] =
    (0 until 4).map(j => Q1.slice(j * 16, j * 16 + 16))

  /** Second MaxSim query (Q2 sliced) for the batched serving path. */
  private[graft] val QTok2: Seq[Seq[Double]] =
    (0 until 4).map(j => Q2.slice(j * 16, j * 16 + 16))

  private[graft] def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical type has varied across testdata
    * generations: parquet TIMESTAMP(NANOS) (read as a raw long under
    * `nanosAsLong`, set in every session builder) vs TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ). Branch on the LOADED dtype and normalize
    * to session-TZ TimestampType either way. The long path converts
    * nanos→micros with exact integer division — 2024 epoch-nanos
    * (~1.7e18) exceed double precision, so `/ 1000.0` would corrupt low
    * bits. The NTZ→TZ cast is value-preserving because every session
    * runs with `spark.sql.session.timeZone=UTC`. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(s, dir, "events"))

  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  private def embStore(s: SparkSession, dir: String): VecStore =
    VecStore(table(s, dir, "embeddings"), idCol = "vec_id", vecCol = "embedding")

  /** Memoized on-disk index build per sf-dir (one-time cost, like the
    * reference's `build()`; queries then reuse the precomputed inv_norm +
    * label-sorted layout). */
  private val builtIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private def embIndex(s: SparkSession, dir: String): VecStore = {
    val path = builtIndexes.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-idx-").toString + "/emb"
      graft.index.VecIndex.build(table(s, dir, "embeddings"), out,
        opts = graft.index.VecIndex.BuildOptions(sortBy = Seq("label"),
          rpDims = Some(16)))._2.path
      out
    })
    graft.index.VecIndex.load(s, path)
  }

  /** Memoized LSH-partitioned index (6-bit hyperplane buckets as parquet
    * partition directories — ANN queries read ONE bucket directory). */
  private val builtLshIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private def embLshIndex(s: SparkSession, dir: String): VecStore = {
    val path = builtLshIndexes.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-lsh-").toString + "/emb"
      graft.index.VecIndex.build(table(s, dir, "embeddings"), out,
        opts = graft.index.VecIndex.BuildOptions(lshBits = Some(6)))._2.path
      out
    })
    graft.index.VecIndex.load(s, path)
  }

  /** Memoized IVF-partitioned index: build-time nearest-centroid
    * assignment (16 deterministic seed centroids, persisted in the index
    * metadata), layout partitioned by cluster_id — probing = partition
    * pruning. Also carries PQ codes (4 subspaces × 16 seed codewords), so
    * the same index serves plain IVF (exact in-list scoring) and IVF-PQ
    * (ADC over `pq_code`, float column never read). */
  private val builtIvfIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private def embIvfIndex(s: SparkSession, dir: String): VecStore = {
    val path = builtIvfIndexes.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-ivf-").toString + "/emb"
      val emb = table(s, dir, "embeddings")
      graft.index.VecIndex.build(emb, out,
        opts = graft.index.VecIndex.BuildOptions(
          ivfCentroids = Some(ann.seedCentroids(emb, 16)),
          pqCodebooks = Some(graft.ops.quant.pqSeedCodebooks(emb, m = 4, k = 16))))._2.path
      out
    })
    graft.index.VecIndex.load(s, path)
  }

  /** Memoized bucketed fact tables (lineitem/orders hashed into matching
    * bucket files on their join keys) — the persisted-shuffle layout: the
    * one-time write pays the exchange, `rel_bucketed_join` then plans the
    * fact-to-fact join with NO shuffle on either side. */
  private val builtBucketed = new scala.collection.concurrent.TrieMap[String, (String, String)]()
  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    builtBucketed.getOrElseUpdate(dir, {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
      val (liT, ordT) = (s"graft_li$tag", s"graft_ord$tag")
      rel.writeBucketed(
        table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        liT, s"$base/li", "l_orderkey", buckets = 8)
      rel.writeBucketed(
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        ordT, s"$base/ord", "o_orderkey", buckets = 8)
      (liT, ordT)
    })
  }

  /** Memoized persisted inverted text index (term-bucket-partitioned
    * postings + exact corpus stats) — build once, BM25-query many. */
  private val builtTextIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private def textIndex(s: SparkSession, dir: String): String =
    builtTextIndexes.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-ti-").toString + "/docs"
      retrieval.buildTextIndex(table(s, dir, "documents"), out, "text", "doc_id")
      out
    })

  /** Memoized kNN similarity-graph edge table ([[ann.knnGraph]] over the
    * embeddings, written once to parquet). `graph_pagerank` reads this,
    * so its bench row times RANKING — power iteration over a built graph
    * — not graph construction; a deployment materializes the kNN graph
    * once and ranks it many times, the same amortization argument as the
    * vector/text index builds above. (`ann_knn_graph` still times the
    * construction itself — that is what that query IS.) */
  private val builtKnnEdges = new scala.collection.concurrent.TrieMap[String, String]()
  private def knnEdges(s: SparkSession, dir: String): String =
    builtKnnEdges.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-knn-").toString + "/edges"
      ann.knnGraph(table(s, dir, "embeddings"), k = 3, nbits = 6)
        .select(col("src"), col("dst"))
        .write.parquet(out)
      out
    })

  /** Memoized Z-ORDER-CLUSTERED document layout (Morton of
    * (n_chars, doc_id), small row groups): pushed range filters on
    * EITHER column prune row groups — the multi-dimensional zonemap
    * story, priced by `index_zorder_range`. */
  private val builtZorderLayout = new scala.collection.concurrent.TrieMap[String, String]()
  private def zorderLayout(s: SparkSession, dir: String): String =
    builtZorderLayout.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-zo-").toString + "/docs"
      graft.index.zorder.writeClustered(
        table(s, dir, "documents").select(col("doc_id"), col("n_chars"), col("lang")),
        out, "n_chars", "doc_id", bits = 12, files = 4)
      out
    })

  /** Memoized persisted MinHash signature index over the corpus slice
    * (`doc_id < 400` — the same batch/corpus split every incremental
    * query uses): bucket-partitioned band table + signature table,
    * build once, screen many. */
  private val builtSigIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private def sigIndex(s: SparkSession, dir: String): String =
    builtSigIndexes.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-sig-").toString + "/docs"
      dedup.writeSignatureIndex(
        table(s, dir, "documents").where(col("doc_id") < 400),
        "text", "doc_id", out)
      out
    })

  /** Memoized persisted gram-hash set over the reference slice
    * (`doc_id % 5 != 0` — the [[dedup.crossNovelty]] reference):
    * build once, screen every candidate batch. */
  private val builtGramSets = new scala.collection.concurrent.TrieMap[String, String]()
  private def gramSet(s: SparkSession, dir: String): String =
    builtGramSets.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-gs-").toString + "/grams"
      dedup.writeGramSet(
        table(s, dir, "documents").where(col("doc_id") % 5 =!= 0),
        "text", out, n = 5)
      out
    })

  /** Memoized persisted unigram-tokenizer artifact (the
    * [[graft.ops.tokenizers]] versioned layout): train once with the
    * text_unigram_train config, write `(piece, freq, score_q6)` +
    * meta, and let every encode query load-then-encode from disk —
    * train-once, encode-everywhere. */
  private val builtTokenizers = new scala.collection.concurrent.TrieMap[String, String]()
  private def unigramArtifact(s: SparkSession, dir: String): String =
    builtTokenizers.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-tok-").toString + "/uni"
      graft.ops.tokenizers.trainUnigramTo(
        table(s, dir, "documents"), "text", out,
        seedSize = 60, maxPieceLen = 3, rounds = 2, minUsage = 2L)
      out
    })

  /** One-time index builds, callable from Bench's untimed warmup so
    * per-query numbers measure steady-state execution, not builds. */
  def prebuildIndexes(s: SparkSession, dir: String): Unit = {
    embIndex(s, dir); embLshIndex(s, dir); embIvfIndex(s, dir)
    bucketedTables(s, dir); textIndex(s, dir); knnEdges(s, dir)
    sigIndex(s, dir); gramSet(s, dir)
  }

  // ---- DuckDB SQL snippet builders ------------------------------------

  /** Unrolled all-integer Lloyd oracle for [[graft.ops.linalg
    * .kmeansFit]]: per round, exact integer distances with the
    * (dist, j) tie order, per-(cluster, dim) integer sums, and centroid
    * updates whose signed division mirrors the driver's Scala truncation
    * (sign CASE); emptied clusters coalesce to the previous centroid. */
  private def sqlKmeans(dim: Int, k: Int, iters: Int, q: Long): String = {
    val dist =
      s"""list_sum(list_transform(range(1, ${dim + 1}),
         |    i -> (b.qx[i] - c.c[i]) * (b.qx[i] - c.c[i])))""".stripMargin
    def assignCtes(t: String, cPrev: String): String =
      s"""p$t AS (SELECT b.id, b.qx, c.j, $dist AS dist
         |  FROM b CROSS JOIN $cPrev c),
         |a$t AS (SELECT id, qx, j AS cl, dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist, j) AS rn
         |  FROM p$t) WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s""",
         |${assignCtes(t.toString, s"c${t - 1}")},
         |s$t AS (SELECT cl, d.i AS pos, count(*)::BIGINT AS n,
         |    sum(qx[d.i + 1])::BIGINT AS s
         |  FROM a$t CROSS JOIN (SELECT unnest(range(0, $dim))::INT AS i) d
         |  GROUP BY 1, 2),
         |c$t AS (SELECT sp.j, coalesce(nc.c, pv.c) AS c
         |  FROM (SELECT unnest(range(0, $k))::INT AS j) sp
         |  LEFT JOIN (SELECT cl AS j, list(CASE WHEN s >= 0 THEN s // n
         |      ELSE -((-s) // n) END ORDER BY pos) AS c
         |    FROM s$t GROUP BY cl) nc ON sp.j = nc.j
         |  LEFT JOIN c${t - 1} pv ON sp.j = pv.j)""".stripMargin
    }.mkString
    s"""WITH b AS (SELECT vec_id AS id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      v -> floor(v * $q)::BIGINT) AS qx
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |c0 AS (SELECT (row_number() OVER (ORDER BY id) - 1)::INT AS j, qx AS c
       |  FROM (SELECT id, qx FROM b ORDER BY id LIMIT $k))$rounds,
       |${assignCtes("F", s"c$iters")}
       |SELECT cl AS cluster, count(*)::BIGINT AS n,
       |  sum(dist)::BIGINT AS inertia
       |FROM aF GROUP BY 1 ORDER BY cluster""".stripMargin
  }

  /** Unrolled exact-integer GD oracle for [[graft.ops.linalg
    * .linearProbeTrain]]: per round one gradient CTE over the corpus
    * and one 1-row weight-update CTE whose signed division mirrors the
    * driver's Scala truncation with explicit sign CASE logic. */
  private def sqlLinearProbe(dims: Int, iters: Int, q: Long, lrInv: Long): String = {
    val cols = 0 until dims
    val base =
      s"""b AS (SELECT list_transform((CAST(embedding AS DOUBLE[]))[1:$dims],
         |    v -> floor(v * $q)::BIGINT) AS qx, (label >= 5)::BIGINT AS y
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) >= $dims),
         |nn AS (SELECT count(*)::BIGINT AS n FROM b),
         |w0 AS (SELECT ${cols.map(j => s"0::BIGINT AS w$j").mkString(", ")})""".stripMargin
    val rounds = (1 to iters).map { t =>
      val pred = cols.map(j => s"qx[${j + 1}] * w.w$j").mkString(" + ") +
        s" - y * ${q * 1000000L}"
      val grads = cols.map(j =>
        s"sum(qx[${j + 1}] * ($pred))::BIGINT AS g$j").mkString(",\n|    ")
      val den = s"($q * $q * nn.n * $lrInv)"
      val ups = cols.map(j =>
        s"""(w.w$j - (CASE WHEN g.g$j >= 0 THEN g.g$j // $den
           | ELSE -((-g.g$j) // $den) END))::BIGINT AS w$j""".stripMargin
          .replace("\n", "")).mkString(",\n|    ")
      s""",
         |g$t AS (SELECT
         |    $grads
         |  FROM b, w${t - 1} w),
         |w$t AS (SELECT
         |    $ups
         |  FROM g$t g, w${t - 1} w, nn)""".stripMargin
    }.mkString
    val out = cols.map(j => s"SELECT $j::INT AS j, w$j AS w_ppm FROM w$iters")
      .mkString("\n|  UNION ALL ")
    s"""WITH $base$rounds
       |$out
       |ORDER BY j""".stripMargin
  }

  private def sqlVec(q: Seq[Double]): String =
    q.mkString("[", ", ", "]::DOUBLE[]")

  private val E = "CAST(embedding AS DOUBLE[])"

  /** Cosine score vs a literal query, matching graft.functions.vectors
    * semantics: dot * invnorm(store) * invnorm(query), zero vector → 0. The
    * query inverse norm is injected as the SAME Scala-computed double
    * literal the Spark plan uses. */
  private def sqlCosineOn(e: String, q: Seq[Double]): String = {
    val n = s"list_dot_product($e, $e)"
    s"(list_dot_product($e, ${sqlVec(q)})" +
      s" * (CASE WHEN $n > 0 THEN 1.0/sqrt($n) ELSE 0.0 END)" +
      s" * ${vectors.invNormOf(q)})"
  }

  private def sqlCosine(q: Seq[Double]): String = sqlCosineOn(E, q)

  /** DuckDB squared-L2 between two list expressions (same fold as
    * [[vectors.l2Squared]]). */
  private def sqlL2Between(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"

  private def sqlDot(q: Seq[Double]): String =
    s"list_dot_product($E, ${sqlVec(q)})"

  /** Squared L2 as sum((x-y)^2) — same fold as the Spark expression; NOT
    * the norm expansion (cancellation on near-dups). */
  private def sqlL2sq(q: Seq[Double]): String =
    s"list_sum(list_transform(list_zip($E, ${sqlVec(q)}), x -> (x[1]-x[2])*(x[1]-x[2])))"

  private def r4(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Shared oracle for the live and index-backed novelty gates — the
    * persisted gram set is value-identical to a live reference build. */
  private lazy val SqlCrossNovelty: String =
    s"""WITH tk AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS ts
       |  FROM documents),
       |g AS (SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(ts) - 3),
       |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
       |      || ' ' || ts[i+4])) AS gs
       |  FROM tk WHERE len(ts) >= 5),
       |cand AS (SELECT * FROM g WHERE doc_id % 5 = 0),
       |refset AS (SELECT DISTINCT unnest(gs) AS gram FROM g
       |  WHERE doc_id % 5 != 0),
       |pd AS (SELECT doc_id, len(gs)::BIGINT AS n_grams FROM cand),
       |ce AS (SELECT doc_id, unnest(gs) AS gram FROM cand),
       |kn AS (SELECT ce.doc_id, count(*)::BIGINT AS n_known
       |  FROM ce JOIN refset USING (gram) GROUP BY 1)
       |SELECT pd.doc_id, pd.n_grams, coalesce(kn.n_known, 0)::BIGINT AS n_known,
       |  ${r4("(pd.n_grams - coalesce(kn.n_known, 0))::DOUBLE / pd.n_grams::DOUBLE")}
       |    AS novel_frac
       |FROM pd LEFT JOIN kn USING (doc_id) ORDER BY pd.doc_id""".stripMargin

  /** 4-dp-quantized cosine as an exact INTEGER score (units of 1e-4) —
    * the shared scorer of the `eval_*` family: the same three IEEE ops
    * as [[vectors.quantize]] but staying in the integer domain, so the
    * score is a grouping/threshold key, not a float. */
  private def scoreQ4(v: org.apache.spark.sql.Column, q: Seq[Double]) =
    floor(vectors.cosineSimilarity(v, lit(q.toArray)) * 10000.0 + 0.5)
      .cast("long")

  /** DuckDB twin of [[scoreQ4]]. */
  private def sqlScoreQ4(q: Seq[Double]): String =
    s"floor(${sqlCosineOn(E, q)} * 10000.0 + 0.5)::BIGINT"

  /** Literal threshold grid for `eval_confusion` (score units of 1e-4). */
  private val EvalThresholds = Seq(-5000L, -2500L, 0L, 2500L, 5000L, 7500L)

  /** MaxSim score over the 4×16 sliced layout for a given token set —
    * shared by the single, long-form, and batched oracle SQL. */
  private def sqlMaxSimScore(qtoks: Seq[Seq[Double]]): String =
    qtoks.map { q =>
      "greatest(" + (0 until 4).map(i =>
        s"list_dot_product(list_slice($E, ${i * 16 + 1}, ${i * 16 + 16}), ${sqlVec(q)})")
        .mkString(", ") + ")"
    }.mkString("(", " + ", ")")

  /** Shared oracle for both single-query MaxSim paths (unrolled fast
    * path and long-form token table) — the two are result-identical by
    * design. */
  private lazy val SqlMaxSimTopK: String =
    s"""WITH s AS (SELECT vec_id, ${r4(sqlMaxSimScore(QTok))} AS maxsim FROM embeddings)
       |SELECT vec_id, maxsim FROM s ORDER BY maxsim DESC, vec_id LIMIT 10""".stripMargin

  /** Bloom size for the decontamination SCREEN queries: 16384 words
    * (~1M bits) keeps the gram false-positive rate ≤ ~3e-4 at sf0.1's
    * ~25k bench grams, so flagged docs are (essentially) the truly
    * contaminated ones — the 64-word `decontam_bloom_sketch` artifact
    * stays small deliberately, as the mergeable-state display shape. */
  private val ScreenBloomBits = 16384 * 63

  /** DuckDB token-array fragment matching [[text.tokens]]. */
  private val SqlToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

  /** Blocklist fixture for the C4-style wordlist gate queries — one
    * single token, one bigram, one trigram phrase, all present in the
    * synthetic corpus so every match length is exercised. */
  private val BlockTerms = Seq("slow", "big query", "merge batch part")

  /** Deterministic fixed-point weight vector (1e-6 units, ±1.0 range)
    * for the hashed linear classifier query — stands in for a trained
    * model's weights; both the Spark plan and the DuckDB oracle embed
    * the SAME integer literals ([[graft.ops.text.linearWeightsFixed]]
    * round-trips `LinW` back to exactly [[LinWq]]). */
  private val LinWq: Seq[Long] =
    (0 until 64).map(j => (j * 2654435761L) % 2000001L - 1000000L)
  private val LinW: Seq[Double] = LinWq.map(_ / 1.0e6)

  private def sqlStopHits(listExpr: String, words: Seq[String]): String =
    s"len(list_filter($listExpr, t -> t IN (${words.map("'" + _ + "'").mkString(", ")})))"

  /** Generation-eval pair fixture: reference = the document's normalized
    * token string, candidate = the same with every 3rd token dropped ("the
    * model lost a third of the words") — deterministic, engine-shared, and
    * related-but-not-identical so the overlap meters read out mid-range
    * values. Spark's HOF index is 0-based, DuckDB's 1-based: dropping
    * 0-based `i % 3 == 2` equals dropping 1-based `i % 3 == 0`. */
  private def genPairs(s: SparkSession, dir: String): DataFrame = {
    val toks = text.tokens(col("text"))
    table(s, dir, "documents").select(col("doc_id"),
      concat_ws(" ", filter(toks, (t, i) => i % 3 =!= 2)).as("cand"),
      concat_ws(" ", toks).as("ref"))
  }

  /** DuckDB twin of [[genPairs]] as token LISTS (`ct`, `rt`) — the
    * word-gram oracles consume lists directly; string consumers
    * re-join (tokens carry no whitespace, so the round trip is exact).
    * NULL text coalesces to '' HERE so `len(ct)` reads 0, matching the
    * Spark side's NULL-as-empty-document contract (on the Spark side
    * `concat_ws` absorbs the NULL token array; latent today — no sf
    * corpus carries NULL text — the gopherQuality r11-advice class). */
  private val SqlGenToks =
    s"""SELECT doc_id, list_filter(toks, (t, i) -> i % 3 != 0) AS ct,
       |  toks AS rt
       |FROM (SELECT doc_id, $SqlToks AS toks
       |  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))"""
      .stripMargin

  /** DuckDB word n-gram list over a token-list expression `l` — space-
    * joined, in order, with multiplicity ([[graft.ops.text.ngramList]]).
    * `n` may be a column reference. */
  private def sqlNgrams(l: String, n: String): String =
    s"CASE WHEN len($l) >= $n THEN list_transform(range(1, len($l)-($n-1)+1), " +
      s"i -> array_to_string(list_slice($l, i, i+$n-1), ' ')) " +
      s"ELSE []::VARCHAR[] END"

  /** DuckDB CTE chain ending in `reg(event_type, register, rho)` — the
    * full 64-register HLL spine over `user_id` per event type, mirroring
    * [[sketch.hll]] at p=6 bit for bit: register = top 6 hash bits,
    * rho = leading zeros of the remaining 57 bits + 1 via the portable
    * `length(bin(w))` bit-length identity, capped at [[sketch.HllRhoCap]].
    * Shared by the estimate oracle and the merge-law oracle. */
  private val SqlHllRegs = {
    val mask = (1L << 57) - 1
    s"""hs AS (SELECT event_type, ${hashing.sqlH63("(user_id::VARCHAR)")} AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |hr AS (SELECT event_type, h >> 57 AS register,
       |  least(CASE WHEN (h & $mask) = 0 THEN 58
       |        ELSE 58 - length(bin(h & $mask)) END, 40)::INTEGER AS rho0 FROM hs),
       |hmx AS (SELECT event_type, register, max(rho0) AS rho
       |  FROM hr GROUP BY 1, 2),
       |hsp AS (SELECT event_type, g.range AS register
       |  FROM (SELECT DISTINCT event_type FROM hs) CROSS JOIN range(64) g),
       |reg AS (SELECT hsp.event_type, hsp.register,
       |  coalesce(hmx.rho, 0::INTEGER) AS rho
       |  FROM hsp LEFT JOIN hmx USING (event_type, register))""".stripMargin
  }

  /** DuckDB CTE body: distinct word-3-gram shingle sets per document,
    * matching [[dedup.wordShingles]] (docs with < 3 tokens excluded, as in
    * [[dedup.minhashed]]). */
  private def sqlGramsFrom(src: String) =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |  i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS grams
       |FROM (SELECT doc_id, $SqlToks AS toks FROM $src) WHERE len(toks) >= 3""".stripMargin
  private val SqlGrams = sqlGramsFrom("documents")

  /** DuckDB CTE chain ending in `mp(id_a, id_b, jacc)` — MinHash-LSH
    * near-dup pairs at threshold 0.5 (k=16, 8 bands of r=2), mirroring
    * [[dedup.minhashNearDupPairs]] stage for stage. Shared by the pairs
    * oracle, the connected-components (cluster) oracle, and (via the
    * `src`-parameterized form) the dedup-funnel oracle. */
  private def sqlMinhashPairCtesFrom(src: String) =
    s"""g AS (${sqlGramsFrom(src)}),
       |sg AS (SELECT doc_id, grams, list_transform(range(0, 16),
       |  j -> list_min(list_transform(list_transform(grams, s -> ${hashing.sqlH32("s")}),
       |       h -> ${hashing.sqlAffineVar("h", "j")}))) AS sig FROM g),
       |bd AS (SELECT doc_id, grams, i,
       |  array_to_string(list_transform(list_slice(sig, 2*i+1, 2*i+2), x -> x::VARCHAR), '_') AS key
       |  FROM sg, range(0, 8) r(i)),
       |c AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.grams AS ga, b.grams AS gb
       |  FROM bd a JOIN bd b ON a.i = b.i AND a.key = b.key AND a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b,
       |  len(list_intersect(ga, gb))::DOUBLE / len(list_distinct(ga || gb)) AS jacc FROM c),
       |mp AS (SELECT id_a, id_b, jacc FROM j WHERE jacc >= 0.5)""".stripMargin
  private val SqlMinhashPairCtes = sqlMinhashPairCtesFrom("documents")

  /** DuckDB fragment replaying [[graft.ops.text.matchKey]] over `e` —
    * shared by the normalized-dedup and funnel oracles ('g' flags:
    * DuckDB regexp_replace is first-match by default, Spark's global).
    * Includes the non-Latin fallback: an empty Latin projection keys on
    * the whitespace-collapsed lowercased raw text. */
  private def sqlMatchKey(e: String): String = {
    val latin = s"trim(regexp_replace(regexp_replace(translate(lower($e), " +
      s"'${text.AccentFrom}', '${text.AccentTo}'), '[^a-z0-9\\s]', '', 'g'), " +
      s"'\\s+', ' ', 'g'))"
    val fb = s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"
    s"(CASE WHEN length($latin) * 2 >= length($fb) THEN $latin ELSE $fb END)"
  }

  /** DuckDB CTE chain computing BM25 scores over `documents` for the
    * fixed term set, ending in `sc(doc_id, score)`. Scalar folds (k1+1,
    * 1-b) are interpolated from the SAME Scala doubles the Spark plan
    * embeds; corpus stats (N, avgdl) are exact-integer derived, so both
    * engines compute identical doubles. Operation shapes mirror
    * [[retrieval.bm25]] term for term. */
  private val SqlBm25Ctes: String = {
    val p = graft.ops.retrieval.Bm25Params()
    val terms = Seq("spark", "query", "window").map("'" + _ + "'").mkString(", ")
    s"""b2 AS (SELECT doc_id, $SqlToks AS toks FROM documents),
       |b3 AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM b2),
       |st AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS sumdl FROM b3),
       |m AS (SELECT doc_id, dl, unnest(toks) AS term FROM b3),
       |mm AS (SELECT * FROM m WHERE term IN ($terms)),
       |tfq AS (SELECT doc_id, term, dl, count(*)::DOUBLE AS tf FROM mm GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM mm GROUP BY 1),
       |tsq AS (SELECT tfq.doc_id,
       |  ln((((SELECT n FROM st) - df + 0.5) / (df + 0.5)) + 1.0)
       |    * (tf * ${p.k1 + 1.0}) / (tf + ${p.k1} * (${1.0 - p.b} + ${p.b} / (SELECT sumdl / n FROM st) * dl)) AS ts
       |  FROM tfq JOIN dfq USING (term)),
       |sc AS (SELECT doc_id, floor(sum(ts) * 1000000.0 + 0.5) / 1000000.0 AS score
       |  FROM tsq GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTE chain ending in `d(tok, ca, cb, na, nb, v, pa, pb)` —
    * the add-one-smoothed unigram distributions of the en/de document
    * corpora over their union vocabulary, matching
    * [[graft.ops.text.unigramDists]] operation for operation (same
    * integer counts, same division order, so both engines compute
    * identical doubles). */
  private val SqlUnigramDists: String =
    s"""wa AS (SELECT tok, count(*) AS ca FROM (
       |  SELECT unnest($SqlToks) AS tok FROM documents WHERE lang = 'en') GROUP BY tok),
       |wb AS (SELECT tok, count(*) AS cb FROM (
       |  SELECT unnest($SqlToks) AS tok FROM documents WHERE lang = 'de') GROUP BY tok),
       |j AS (SELECT tok, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
       |  FROM wa FULL JOIN wb USING (tok)),
       |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb, count(*) AS v FROM j),
       |d AS (SELECT tok, ca, cb, na, nb, v,
       |  (ca + 1)::DOUBLE / (na + v)::DOUBLE AS pa,
       |  (cb + 1)::DOUBLE / (nb + v)::DOUBLE AS pb
       |  FROM j, t)""".stripMargin

  /** DuckDB re-derivation of [[graft.ops.bpe.train]]: the `merges`
    * training rounds unrolled as CTEs (the pagerank-oracle trick). Round
    * i pair-counts the word vocabulary (`p$i`), argmaxes on
    * (count desc, l, r) (`b$i`), then applies ONE greedy left-to-right
    * merge pass (`v${i+1}`) via non-overlapping string replace over a
    * `|`-wrapped symbol string — `replace()` scans left-to-right and
    * never rescans its own output, which is exactly the no-re-examination
    * law BpeSpec pins on the Spark kernel. `|` cannot collide: tokens are
    * whitespace-split document text and the corpus alphabet is
    * `[a-z ]`. CTEs are MATERIALIZED — each round is referenced by the
    * next AND by the pair scan, and inlining would re-derive the chain
    * exponentially. Early stop mirrors the trainer: an empty `b$i`
    * (best pair under `minPair`) leaves the vocabulary untouched and
    * emits no row. */
  private def sqlBpeTrain(merges: Int, minPair: Long): String = {
    val head = Seq(
      s"""w0 AS MATERIALIZED (SELECT t AS w, count(*) AS cnt FROM (
         |  SELECT unnest($SqlToks) AS t FROM documents) GROUP BY t)""".stripMargin,
      "v0 AS MATERIALIZED (SELECT cnt, string_split(w, '') AS sy FROM w0)")
    val rounds = (0 until merges).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, sum(cnt)::BIGINT AS pc FROM (
           |  SELECT cnt, unnest(list_transform(range(1, len(sy)), j ->
           |    struct_pack(l := sy[j], r := sy[j+1]))) AS pr FROM v$i)
           |  GROUP BY pr.l, pr.r)""".stripMargin,
        s"""b$i AS MATERIALIZED (SELECT l, r, pc FROM p$i
           |  WHERE pc >= $minPair ORDER BY pc DESC, l, r LIMIT 1)""".stripMargin,
        s"""v${i + 1} AS MATERIALIZED (SELECT cnt,
           |  CASE WHEN (SELECT count(*) FROM b$i) = 1 THEN
           |    string_split(substring(s2, 2, len(s2) - 2), '||') ELSE sy END AS sy
           |  FROM (SELECT cnt, sy, replace('|' || array_to_string(sy, '||') || '|',
           |    '|' || (SELECT l FROM b$i) || '||' || (SELECT r FROM b$i) || '|',
           |    '|' || (SELECT l || r FROM b$i) || '|') AS s2 FROM v$i))""".stripMargin)
    }
    val emit = (0 until merges)
      .map(i => s"""SELECT $i AS step, l AS "left", r AS "right", pc AS pair_count FROM b$i""")
      .mkString("\nUNION ALL ")
    (head ++ rounds).mkString("WITH ", ",\n", "\n") + emit + "\nORDER BY step"
  }

  /** Unrolled unigram-LM training oracle (the [[sqlBpeTrain]] pattern):
    * per EM round, the Viterbi DP unrolls one CTE per token position
    * (`maxWordLen` is the FIXTURE's max token length — 8 at every SF),
    * candidates as (score, length) structs whose `list_max` is exactly
    * the trainer's longer-piece tie-break, then a recursive backtrace
    * reads the picked lengths and a piece-keyed usage fold closes the
    * round. Scores re-derive per round from the same integer freqs. */
  /** Shared CTE chain for the unigram-trainer oracles: seed + `rounds`
    * EM rounds (scores, per-position DP, backtrace, usage, prune). With
    * `finalSegRound`, appends one more scored DP + backtrace under the
    * FINAL vocab (no prune) — the fertility readout's segmentation. */
  private def sqlUnigramCtes(
      seedSize: Int, maxPieceLen: Int, rounds: Int, minUsage: Long,
      maxWordLen: Int, finalSegRound: Boolean): String = {
    val unk = graft.ops.unigram.UnkScoreQ6
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    ctes += s"""w0 AS MATERIALIZED (SELECT t AS w, count(*)::BIGINT AS cnt FROM (
       |  SELECT unnest($SqlToks) AS t FROM documents) GROUP BY t)""".stripMargin
    ctes += s"""sub AS MATERIALIZED (SELECT piece, sum(cnt)::BIGINT AS freq FROM (
       |    SELECT cnt, substr(w, s.i, l.j) AS piece
       |    FROM w0, LATERAL unnest(range(1, len(w)+1)) s(i),
       |         LATERAL unnest(range(1, least($maxPieceLen, len(w) - s.i + 1)+1)) l(j)
       |  ) GROUP BY piece)""".stripMargin
    ctes += s"p1 AS MATERIALIZED (SELECT piece, freq FROM sub " +
      s"ORDER BY freq DESC, piece LIMIT $seedSize)"
    val dpRounds = if (finalSegRound) rounds + 1 else rounds
    for (r <- 1 to dpRounds) {
      ctes += s"""s$r AS MATERIALIZED (SELECT piece,
         |  (floor(ln(freq::DOUBLE)*1000000)
         |    - (SELECT floor(ln(sum(freq)::DOUBLE)*1000000) FROM p$r))::BIGINT AS sc
         |  FROM p$r)""".stripMargin
      for (i <- 1 to maxWordLen) {
        val cands = scala.collection.mutable.ArrayBuffer.empty[String]
        val joins = scala.collection.mutable.ArrayBuffer.empty[String]
        for (l <- 1 to math.min(maxPieceLen, i)) {
          val prev = if (i - l == 0) "0" else s"pb$l.m.s"
          if (i - l >= 1) joins += s"LEFT JOIN b${r}_${i - l} pb$l ON pb$l.w = w0.w"
          joins += s"LEFT JOIN s$r px$l ON px$l.piece = substr(w0.w, ${i - l + 1}, $l)"
          val sc = if (l == 1) s"coalesce(px$l.sc, $unk)" else s"px$l.sc"
          cands += s"struct_pack(s := $prev + $sc, l := $l)"
        }
        ctes += s"""b${r}_$i AS MATERIALIZED (
           |  SELECT w0.w AS w, w0.cnt AS cnt,
           |    list_max(list_filter([${cands.mkString(", ")}],
           |      x -> x.s IS NOT NULL)) AS m
           |  FROM w0 ${joins.mkString(" ")}
           |  WHERE len(w0.w) >= $i)""".stripMargin
      }
      val un = (1 to maxWordLen)
        .map(i => s"SELECT w, cnt, $i AS pos, m.l AS pl FROM b${r}_$i")
        .mkString(" UNION ALL ")
      ctes += s"B$r AS MATERIALIZED ($un)"
      ctes += s"""bt$r(w, cnt, pos) AS (
         |  SELECT w, cnt, len(w) FROM w0
         |  UNION ALL
         |  SELECT bt.w, bt.cnt, bt.pos - B.pl FROM bt$r bt
         |  JOIN B$r B ON B.w = bt.w AND B.pos = bt.pos
         |  WHERE bt.pos > 0)""".stripMargin
      if (r <= rounds) {
        ctes += s"""u$r AS MATERIALIZED (
           |  SELECT seg.piece, sum(seg.cnt)::BIGINT AS usage FROM (
           |    SELECT substr(bt.w, bt.pos - B.pl + 1, B.pl) AS piece, bt.cnt AS cnt
           |    FROM bt$r bt JOIN B$r B ON B.w = bt.w AND B.pos = bt.pos
           |    WHERE bt.pos > 0) seg
           |  JOIN p$r ON p$r.piece = seg.piece
           |  GROUP BY seg.piece)""".stripMargin
        ctes += s"p${r + 1} AS MATERIALIZED (SELECT piece, usage AS freq " +
          s"FROM u$r WHERE usage >= $minUsage)"
      }
    }
    s"WITH RECURSIVE ${ctes.mkString(",\n")}"
  }

  private def sqlUnigramTrain(
      seedSize: Int, maxPieceLen: Int, rounds: Int, minUsage: Long,
      keepTop: Int, maxWordLen: Int): String =
    sqlUnigramCtes(seedSize, maxPieceLen, rounds, minUsage, maxWordLen,
      finalSegRound = false) + "\n" +
      s"""SELECT piece, freq,
         |  (floor(ln(freq::DOUBLE)*1000000)
         |    - (SELECT floor(ln(sum(freq)::DOUBLE)*1000000)
         |       FROM p${rounds + 1}))::BIGINT AS score_q6
         |FROM p${rounds + 1} ORDER BY freq DESC, piece LIMIT $keepTop""".stripMargin

  /** Fertility readout: segment the word vocab under the FINAL scores
    * (DP round rounds+1, no prune), count piece steps and UNK steps. */
  private def sqlUnigramFertility(
      seedSize: Int, maxPieceLen: Int, rounds: Int, minUsage: Long,
      maxWordLen: Int): String = {
    val fr = rounds + 1
    sqlUnigramCtes(seedSize, maxPieceLen, rounds, minUsage, maxWordLen,
      finalSegRound = true) + ",\n" +
      s"""seg AS (SELECT substr(bt.w, bt.pos - B.pl + 1, B.pl) AS piece,
         |    bt.cnt AS cnt
         |  FROM bt$fr bt JOIN B$fr B ON B.w = bt.w AND B.pos = bt.pos
         |  WHERE bt.pos > 0),
         |tots AS (SELECT count(*)::BIGINT AS n_word_types,
         |  sum(cnt)::BIGINT AS n_tokens FROM w0),
         |agg AS (SELECT sum(cnt)::BIGINT AS n_pieces,
         |  sum(CASE WHEN piece NOT IN (SELECT piece FROM p$fr)
         |    THEN cnt ELSE 0 END)::BIGINT AS n_unk FROM seg)
         |SELECT n_word_types, n_tokens, n_pieces,
         |  (n_pieces * 10000 // n_tokens)::BIGINT AS fertility_bp,
         |  (n_unk * 1000000 // n_pieces)::BIGINT AS unk_ppm
         |FROM tots, agg""".stripMargin
  }

  private def sqlBm25Top(k: Int): String =
    s"""WITH $SqlBm25Ctes
       |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB literal for a deterministic hyperplane, from the SAME
    * JVM-computed doubles the Spark plan embeds (Double.toString
    * round-trips exactly through DuckDB's literal parser). */
  private def sqlPlane(t: Int, j: Int, dim: Int): String =
    ann.hyperplane(t, j, dim).mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB fragment: packed sign-bit LSH signature of `e` for table `t`
    * — matches [[ann.lshSignature]]. */
  /** Per-query CTE block for the IVF recall oracle: exact top-10, probe
    * list, nearest-centroid assignment restricted to probed lists,
    * bucket top-10, one-row hit count. Mirrors `ann_ivf_topk`'s CTEs with
    * a numeric suffix so two queries coexist in one WITH chain. */
  private def ivfRecallCtes(i: Int, q: Seq[Double]): String =
    s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
       |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
       |probe$i AS (SELECT cid FROM cent ORDER BY ${sqlL2Between("e", sqlVec(q))}, cid LIMIT 4),
       |assign$i AS (SELECT vec_id, e FROM (
       |  SELECT s.vec_id, s.e, c.cid, row_number() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
       |  FROM s, cent c) WHERE rn = 1 AND cid IN (SELECT cid FROM probe$i)),
       |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
       |  FROM assign$i ORDER BY score DESC, vec_id LIMIT 10)),
       |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin

  private def sqlLshSig(t: Int, nbits: Int, dim: Int): String =
    (0 until nbits).map(j =>
      s"(CASE WHEN list_dot_product(e, ${sqlPlane(t, j, dim)}) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** DuckDB CTE chain ending in `r(src, dst, cos, rnk)` — the
    * LSH-bucketed kNN graph (k unbounded here; consumers filter `rnk`),
    * mirroring [[ann.knnGraph]] stage for stage. Shared by the
    * `ann_knn_graph` oracle and the PageRank oracle built on its edges. */
  private lazy val SqlKnnCtes: String =
    s"""s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
       |c AS (SELECT a.vec_id AS src, x.vec_id AS dst, a.e AS ea, x.e AS eb
       |  FROM b a JOIN b x ON a.sig = x.sig AND a.vec_id != x.vec_id),
       |p AS (SELECT src, dst, floor((list_dot_product(ea, eb)
       |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
       |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
       |  FROM c),
       |r AS (SELECT src, dst, cos,
       |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)""".stripMargin

  // ---- the flagship ----------------------------------------------------

  /** Flagship query on sf0.001: metadata-filtered cosine top-10 joined
    * back to document metadata — the reference's headline path
    * (README.md:59-136) expressed Spark-first. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = table(spark, dir, "documents")
    val hits = embStore(spark, dir)
      .query(Q1, Metric.Cosine)
      .metaFilter(col("label") >= 2)
      .take(10)
      .withScoreRounding(4)
      .collect()
    hits.join(broadcast(docs), hits("vec_id") === docs("doc_id"))
      .select(hits("vec_id"), hits("score"), docs("lang"), docs("source"))
      .orderBy(col("score").desc, col("vec_id"))
  }

  // ---- registered operators -------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3/§2.4: cosine scoring + metadata filter + top-k
    "vec_cosine_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Cosine)
        .metaFilter(col("label") >= 2)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // §2.3: dot-product scoring, no filter
    "vec_dot_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.DotProduct)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // §2.3/§2.4: SQUARED euclidean, metric-default ascending take
    "vec_l2_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Euclidean)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // §2.5: score threshold filter, default k = all rows
    "vec_score_filter" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Cosine)
        .vecFilter(0.15, Cmp.Gt)
        .withScoreRounding(4)
        .collect()),

    // §2.6: batch query with GLOBAL top-k merge (one pool, not per-query)
    "vec_batch_merge" -> ((s, dir) =>
      embStore(s, dir)
        .queryBatch(Seq(Q1, Q2), Metric.Cosine)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // extension: PER-QUERY batch top-k (each query its own k; the
    // reference only merges globally) — window rank after one scan.
    "vec_batch_perquery" -> ((s, dir) =>
      embStore(s, dir)
        .queryBatchPerQuery(Seq(Q1, Q2), Metric.Cosine, k = 5,
          roundScoreDecimals = Some(4))),

    // roadmap metric (reference README.md:204-215): Manhattan / L1
    // distance, smallest-first.
    "vec_l1_topk" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Manhattan)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // roadmap metric (reference README.md:211): Hamming distance over
    // binary SIGN signatures (1 bit per coordinate — the binary-code
    // serving shape). The signature column derives in-scan; the query is
    // binarized driver-side; smallest-first, integral scores, id tiebreak.
    "vec_hamming_topk" -> ((s, dir) => {
      val sig = transform(col("embedding"),
        x => when(x >= 0, 1.0).otherwise(0.0))
      VecStore(
        table(s, dir, "embeddings")
          .select(col("vec_id"), sig.as("sig"), col("label")),
        idCol = "vec_id", vecCol = "sig")
        .query(Q1.map(x => if (x >= 0) 1.0 else 0.0), Metric.Hamming)
        .take(10)
        .collect()
    }),

    // the PACKED binary-signature serving shape: sign bits in 63-bit
    // words (2 longs for 64 dims — 16 bytes/row instead of 256), Hamming
    // = XOR + popcount per word. The oracle computes the same score the
    // UNPACKED way (per-coordinate sign diff count), so a hash match
    // proves the packed kernel's bit arithmetic, not just its ordering.
    "vec_hamming_packed_topk" -> ((s, dir) => {
      val packed = vectors.signBitsPacked(col("embedding"), 64)
      val qw = vectors.signBitsPackedOf(Q1)
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          vectors.hammingPacked(packed, vectors.longArrayLit(qw)).as("score"),
          col("label"))
        .orderBy(col("score").asc, col("vec_id"))
        .limit(10)
    }),

    // roadmap metric (reference README.md:211): Jaccard similarity over
    // ACTIVE-DIMENSION sets (indices with a positive coordinate) — set
    // columns legitimately differ in size row to row, the one metric
    // exempt from the SearchPlan dimension guard; largest-first.
    "vec_jaccard_topk" -> ((s, dir) => {
      val active = filter(
        transform(col("embedding"),
          (x, i) => when(x > 0, i.cast("double")).otherwise(lit(null))),
        y => y.isNotNull)
      VecStore(
        table(s, dir, "embeddings")
          .select(col("vec_id"), active.as("dims"), col("label")),
        idCol = "vec_id", vecCol = "dims")
        .query(Q1.zipWithIndex.collect { case (x, i) if x > 0 => i.toDouble },
          Metric.Jaccard)
        .take(10)
        .withScoreRounding(4)
        .collect()
    }),

    // extension: Johnson–Lindenstrauss random projection (Achlioptas
    // 2001) — 64→16 dims via a deterministic ±1 matrix, cosine top-k in
    // the PROJECTED space. The 4× byte shrink is what a 100 TB pipeline
    // applies before any vector-heavy shuffle (clustering, kNN graphs).
    "vec_rp_topk" -> ((s, dir) => {
      val p = vectors.rpMatrix(64, 16)
      val pq = vectors.projectOf(Q1, p)
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          vectors.quantize(
            vectors.score(Metric.Cosine,
              vectors.projectWith(col("embedding"), p), vectors.vecLit(pq),
              queryInvNorm = Some(lit(vectors.invNormOf(pq)))), 4)
            .as("score"),
          col("label"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    // north-star: the PERSISTED JL projection — `rp_vec` (64→16 dims)
    // written at index build like `inv_norm`, matrix in the index
    // metadata; the query projects once driver-side, scores the slim
    // column for a 40-candidate pool, and exact-reranks on f32. Unlike
    // vec_rp_topk (which prices the in-scan projection), this is the
    // serving path — the projection is never recomputed per query.
    "index_rp_topk" -> ((s, dir) =>
      ann.rpSearch(embIndex(s, dir), Q1, k = 10)
        .select(col("vec_id"), col("score"), col("label"))),

    // north-star: Matryoshka prefix-dim search (Kusupati et al. 2022) —
    // coarse cosine on the first 16 of 64 dims (a `slice` of the
    // already-scanned array, no auxiliary column or matrix), 40-candidate
    // pool, exact f32 rerank. Both stages deterministic (quantized score
    // + id tiebreak), so the oracle replays them exactly.
    "vec_matryoshka_topk" -> ((s, dir) =>
      ann.matryoshkaSearch(embStore(s, dir), Q1, k = 10,
          prefixDims = 16, candK = 40)
        .select(col("vec_id"), col("score"), col("label"))),

    // north-star: binary-quantization serving — coarse stage is packed
    // sign-bit Hamming (XOR + popcount per 63 dims, 16 bytes scanned
    // per row instead of 256), exact cosine rerank on the 40-candidate
    // pool; the oracle computes the SAME coarse score the unpacked way,
    // so a hash match proves the packed kernel feeding candidate
    // selection, not just final ordering.
    "vec_binary_topk" -> ((s, dir) =>
      ann.binarySearch(embStore(s, dir), Q1, k = 10, candK = 40)
        .select(col("vec_id"), col("score"), col("label"))),

    // north-star: binary-quantization recall meter — run before
    // persisting sign-bit codes; recall is a property of the space.
    "ann_binary_recall" -> ((s, dir) =>
      ann.binaryRecallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10,
        candK = 40)),

    // north-star: greedy k-center (farthest-point) coreset selection —
    // 6 rounds, each one full scan with the chosen centers riding the
    // plan as literals and a single-row TakeOrderedAndProject; the
    // quantize-before-argmax discipline makes the greedy trajectory
    // engine-reproducible, so the oracle replays all 6 rounds as
    // unrolled CTEs and must select the identical centers.
    "ann_kcenter_select" -> ((s, dir) =>
      ann.kCenterSelect(table(s, dir, "embeddings"), k = 6)),

    // roadmap (README.md:204-215): int8 scalar quantization — first-pass
    // scoring over 4x fewer bytes; exact f32 rerank stays available.
    "vec_quant_dot_topk" -> ((s, dir) => {
      val (qq, qs) = graft.ops.quant.quantizeQuery(Q1)
      graft.ops.quant.quantized(table(s, dir, "embeddings"))
        .select(col("vec_id"),
          vectors.quantize(graft.ops.quant.dequantizedDot(
            col("q_vec"), col("q_scale"),
            array(qq.map(lit): _*), lit(qs)), 4).as("score"),
          col("label"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),

    // north-star: IVF-PQ over the persisted index — partition pruning
    // (nprobe of 16 lists read) COMPOUNDS with ADC code scoring (float
    // vectors never read); the FAISS-style 100 TB serving layout.
    "ann_ivfpq_topk" -> ((s, dir) =>
      ann.ivfPqSearch(embIvfIndex(s, dir), Q1, k = 10, nprobe = 4)
        .select(col("vec_id"), col("score"), col("label"))),

    // north-star: product quantization — ADC scoring (m lookups per row,
    // no float vector read); the 64x-fewer-scan-bytes serving path.
    "vec_pq_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.ops.quant.pqSearchDot(emb,
          graft.ops.quant.pqSeedCodebooks(emb, m = 4, k = 16), Q1, k = 10)
        .select(col("vec_id"), col("score"), col("label"))
    }),

    // north-star: embedding OOD outliers — distance to nearest centroid,
    // one scan + TakeOrderedAndProject; the data-cleaning triage list.
    "vec_outlier" -> ((s, dir) =>
      ann.centroidOutliers(table(s, dir, "embeddings"),
          ann.seedCentroids(table(s, dir, "embeddings"), 8), topN = 20)
        .select(col("vec_id"), col("centroid_dist"), col("label"))),

    // north-star: SemDeDup — semantic near-dup removal via per-cluster
    // cosine pair search; survivors (lowest id per similar set) returned.
    "dedup_semantic" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      dedup.semanticDedup(emb, ann.seedCentroids(emb, 8), threshold = 0.4)
        .orderBy(col("vec_id"))
    }),

    // north-star: corpus-unigram LM quality score (CCNet-style perplexity
    // filtering, engine-primitive form); fixed-point sums keep it exact.
    "text_unigram_logprob" -> ((s, dir) =>
      text.unigramLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // north-star: CCNet-style perplexity gate, applied in log space on
    // the quantized score (exp() is libm — not oracle-portable).
    "text_lm_filter" -> ((s, dir) =>
      text.lmQualityFilter(table(s, dir, "documents"), "text", "doc_id",
          minLogProb = -3.42)
        .orderBy(col("doc_id"))),

    // north-star: score-threshold selection — keep the top 25% of docs
    // by entropy; integer grid ranks, threshold broadcast, no data sort.
    "sample_top_frac" -> ((s, dir) =>
      sample.topFracByScore(
        text.charEntropy(table(s, dir, "documents"), "text", "doc_id"),
        col("entropy"), frac = 0.25)
        .orderBy(col("doc_id"))),

    // north-star: type-token ratio — scattered-repeat templates and
    // word salad, in row, zero shuffle.
    "text_lexical_diversity" -> ((s, dir) =>
      text.lexicalDiversity(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // north-star: Gopher hard-threshold rule bundle (Rae et al. 2021) —
    // the standard pre-filter stack before any model gate; all signals
    // from ONE bound token array, in row, zero shuffle.
    "text_gopher_quality" -> ((s, dir) =>
      text.gopherQuality(table(s, dir, "documents"), "text", "doc_id",
          minWords = 20)
        .orderBy(col("doc_id"))),

    // north-star: character-entropy quality signal — mash and
    // base64/hex blobs sit in the tails prose never reaches.
    "text_char_entropy" -> ((s, dir) =>
      text.charEntropy(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // north-star: pretrained linear quality classifier over hashed
    // bag-of-words features (the FineWeb-Edu-shaped gate) — zero-shuffle
    // in-row scoring; gate on the linear score (sigmoid is monotone).
    "text_quality_linear" -> ((s, dir) =>
      text.linearGate(table(s, dir, "documents"), "text", "doc_id",
          LinW, bias = 0.0, tau = 0.0)
        .orderBy(col("doc_id"))),

    // north-star: DSIR importance weights — resample the raw corpus
    // toward a small high-quality target distribution (Xie et al. 2023);
    // docs whose unigram profile matches the target score high.
    "text_dsir_weights" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.dsirWeights(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 7 === 0), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // north-star: bigram conditional logprob — word-ORDER quality (word
    // salad scores low even when every word is individually common).
    "text_bigram_logprob" -> ((s, dir) =>
      text.bigramLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // north-star: per-stratum deterministic reservoir — exactly n rows
    // per language by portable hash rank (WindowGroupLimit bounded heap).
    "sample_reservoir" -> ((s, dir) =>
      sample.perGroupSample(table(s, dir, "documents"), "lang", "doc_id", n = 5)
        .select(col("lang"), col("doc_id"), col("sample_rank"))
        .orderBy(col("lang"), col("sample_rank"))),

    // north-star: temperature-based language rebalancing (XLM/mC4 alpha
    // sampling) — rarest language keeps 100%, dominant one downsampled.
    "sample_temperature" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val kept = sample.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          vectors.quantize(max(col("mix_rate")), 4).as("rate"))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_in"))
        .join(kept, "lang")
        .select(col("lang"), col("n_in"), col("n_kept"), col("rate"))
        .orderBy(col("lang"))
    }),

    // north-star: MMR diversification re-rank — distributed cosine pool
    // (TakeOrderedAndProject), then the inherently-sequential greedy pick
    // driver-side over the BOUNDED pool (same class as the IVF probe list).
    "retrieval_mmr_topk" -> ((s, dir) =>
      retrieval.mmr(table(s, dir, "embeddings"), Q1, k = 10,
          lambda = 0.7, poolCap = 50)
        .orderBy(col("mmr_rank"))),

    // roadmap string ops (README.md:204-215): starts_with / contains /
    // ends_with metadata predicates — free as pushed Spark filters.
    "meta_string_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(col("source").startsWith("src1") &&
          col("text").contains("spark") && !col("lang").endsWith("h"))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))),

    // roadmap "fuzzy matching" on string metadata (README.md:210): an
    // edit-distance predicate as an ordinary row-level filter —
    // `levenshtein` is a codegen'd Catalyst builtin, so the typo-tolerant
    // match ("scr1" finds src1/src11, "eng" finds en) rides the same
    // pushed-scan + WSCG path as the exact string filters above. Not a
    // join: each row is compared against LITERAL probe strings only.
    "meta_fuzzy_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(levenshtein(col("source"), lit("scr1")) <= 2 &&
          levenshtein(col("lang"), lit("eng")) <= 1)
        .select(col("doc_id"), col("source"), col("lang"),
          levenshtein(col("source"), lit("scr1")).cast("long").as("dist"))
        .orderBy(col("doc_id"))),

    // §2.1: index build (precomputed inv_norm + label-sorted parquet
    // layout = chunk zonemaps); must return identical results to the
    // direct path — checked against the same oracle shape.
    "index_cosine_topk" -> ((s, dir) =>
      embIndex(s, dir)
        .query(Q1, Metric.Cosine)
        .metaFilter(col("label") === 7)
        .take(10)
        .withScoreRounding(4)
        .collect()),

    // §2.2: typed predicate surface (int/double/string/timestamp, AND/OR)
    "meta_filter_pred" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 &&
          (col("l_returnflag") === "A" || col("l_returnflag") === "R") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column for a total deterministic order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"),
          col("l_quantity"), col("l_returnflag"))),

    // north-star §7.2#7: token counting (whitespace + BPE-ish regex) and
    // prose-shape ratios over the documents table — all fused codegen
    // expressions, no shuffle, scan-parallel at any scale.
    "text_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        text.tokenCount(col("text")).cast("long").as("n_tokens"),
        text.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        vectors.quantize(text.meanTokenLen(col("text")), 4).as("mean_tok_len"),
        vectors.quantize(text.punctuationRatio(col("text")), 4).as("punct_ratio"),
        vectors.quantize(text.stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // north-star: C4-style blocklist content gate — word-boundary
    // occurrence counts for a mixed-length term/phrase list via the
    // fused hash-set kernel; one row-local pass, zero shuffle.
    "text_blocklist_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.blocklistHits(col("text"), BlockTerms).as("n_hits"))
        .where(col("n_hits") > 0)
        .orderBy(col("doc_id"))),

    // the gate summary: corpus size, survivors, total flagged mass in
    // ONE aggregation over ONE scan.
    "text_blocklist_clean" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(text.blocklistHits(col("text"), BlockTerms).as("h"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("h") === 0L, 1L).otherwise(0L)).as("n_clean"),
          sum(col("h")).as("total_hits"))),

    // north-star: video scene-change detection — per-frame dHash, then
    // the Hamming distance to the previous frame via one id-keyed lag
    // window; the oracle replays the identical digest/bit arithmetic.
    "mm_scene_changes" -> ((s, dir) =>
      multimodal.sceneChanges(
        multimodal.fromText(table(s, dir, "documents"), "doc_id", "text",
          "source"))
        .orderBy(col("id"), col("frame_idx"))),

    // north-star: chromaprint-shaped audio fingerprints — per-frame
    // band-energy double differences (band x time); frame explode
    // row-local, time diff one id-keyed lag window.
    "mm_audio_fp" -> ((s, dir) =>
      multimodal.audioFingerprint(
        multimodal.fromText(table(s, dir, "documents"), "doc_id", "text",
          "source"))
        .orderBy(col("id"), col("frame_idx"))),

    // north-star: audio near-dup by SHARED sub-fingerprints (the
    // Shazam/chromaprint matching discipline) — planted byte-identical
    // copies must pair; minShared=2 kills random 15-bit collisions.
    "mm_audio_neardup" -> ((s, dir) => {
      val base = table(s, dir, "documents")
      val planted = base.unionByName(base.where(col("doc_id") % 97 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      multimodal.audioNearDupPairs(
        multimodal.fromText(planted, "doc_id", "text", "source"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // north-star: winnowing (MOSS) partial-copy pairs — local
    // fingerprint selection with the w+n-1 shared-run guarantee; the
    // detector whole-doc MinHash dilutes and exact dedup misses.
    "dedup_winnow_pairs" -> ((s, dir) =>
      dedup.winnowPairs(table(s, dir, "documents"), "text", "doc_id",
          n = 4, w = 4, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: C4 line-level cleanup — the synthetic corpus is
    // single-line and unpunctuated, so the query first manufactures
    // deterministic sentence/line structure (every ' table ' becomes
    // '.\n', both engines verbatim), then keeps only terminal-punctuated
    // >= 3-word lines; one fused row-local HOF pass.
    "text_c4_line_clean" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.c4LineClean(
            regexp_replace(col("text"), " table ", ".\n"), minWords = 3)
            .as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("clean_len"))
        .orderBy(col("doc_id"))),

    // north-star: the FAITHFUL C4 composition (Raffel et al. §2.2) —
    // "lorem ipsum" and `{` discard the whole PAGE, then the line
    // cleanup runs on survivors. Signals are manufactured
    // deterministically (doc_id % 7 appends 'lorem ipsum', % 11 a
    // brace) so the page gate actually fires; two row-local passes,
    // zero shuffle.
    "text_c4_page_gate" -> ((s, dir) => {
      val t = table(s, dir, "documents").withColumn("tx", concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" lorem ipsum")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" {code}")).otherwise(lit(""))))
      t.where(!text.c4PageDiscard(col("tx")))
        .select(col("doc_id"),
          md5(text.c4LineClean(
            regexp_replace(col("tx"), " table ", ".\n"), minWords = 3))
            .as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // north-star: FineWeb-style line-shape signals over the same
    // manufactured line structure (bullets via ' row ' -> '\n- ').
    "text_line_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.lineStats(regexp_replace(
            regexp_replace(col("text"), " table ", ".\n"),
            " row ", "\n- ")).as("ls"))
        .select(col("doc_id"), col("ls.n_lines").as("n_lines"),
          col("ls.frac_bullet").as("frac_bullet"),
          col("ls.frac_ellipsis").as("frac_ellipsis"),
          col("ls.frac_terminal").as("frac_terminal"))
        .orderBy(col("doc_id"))),

    // north-star: overlapping token-window chunking — the text→context-
    // window expansion step; row-local explode, no shuffle.
    "text_chunk" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), text.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(text.tokenChunksOf(col("_toks"), window = 64, stride = 48)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          size(col("c.chunk")).cast("long").as("n_toks"),
          md5(concat_ws(" ", col("c.chunk"))).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // north-star: corpus vocabulary (tf + df) top-N — token-keyed
    // aggregate with map-side combine; top-N via TakeOrderedAndProject.
    "text_vocab_topn" -> ((s, dir) =>
      text.vocabulary(table(s, dir, "documents"), "text", "doc_id", topN = 100)),

    // north-star: Heaps'-law vocabulary growth — new word types per
    // corpus id-slice + cumulative curves; the diminishing-returns
    // read for "does more data still buy new language".
    "text_vocab_growth" -> ((s, dir) =>
      text.vocabGrowth(table(s, dir, "documents"), "text", "doc_id",
          buckets = 20)
        .orderBy(col("bucket"))),

    // north-star: Zipf rank-frequency slope — Heaps' standard data-card
    // companion: exact-integer OLS of q4 log-freq on q4 log-rank over
    // the top-1000 vocabulary grid; slope as signed num/den + one
    // quantized double.
    "text_zipf_slope" -> ((s, dir) =>
      text.zipfSlope(table(s, dir, "documents"), "text", topK = 1000)),

    // north-star: term dispersion across sources (Gries' DP) — which
    // high-frequency terms are ONE source's template text; cleared-
    // denominator DECIMAL cells, absent sources in closed form.
    "text_term_dispersion" -> ((s, dir) =>
      text.termDispersion(table(s, dir, "documents"), "text", "source",
        minTf = 10L, topK = 20)),

    // north-star: interpolated Kneser-Ney 3-gram LM quality score — the
    // paper-correct CCNet gate (continuation-count smoothing);
    // lmQualityFilter/bigramLogProb are its MLE ablations. All KN
    // statistics are integer grids; one doc-sized shuffle.
    "text_kn_logprob" -> ((s, dir) =>
      text.knLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // north-star: char-4-gram language ID over 16 languages (Cavnar &
    // Trenkle rank-weight profiles as driver literals) — the production
    // langid replacing the 4-language stopword heuristic; one fused
    // row-local pass, grouped by (metadata lang, predicted lang) with
    // summed top-score evidence so the hash verifies the whole scoring
    // pipeline, not just the labels.
    "text_langid_ngram" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang").as("meta_lang"),
          graft.functions.NativeExprs.fence(
            text.langNgramScores(col("text"))).as("_sc"))
        .select(col("meta_lang"),
          text.langIdNgramOf(col("_sc")).as("lang_pred"),
          array_max(col("_sc")).as("_top"))
        .groupBy(col("meta_lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_top")).as("sum_score"))
        .orderBy(col("meta_lang"), col("lang_pred"))),

    // north-star: categorical mutual information (lang vs source) —
    // the column-leakage / skew audit; exact contingency grid, q12
    // ln terms, 6-dp nats.
    "rel_mutual_info" -> ((s, dir) =>
      rel.mutualInfo(table(s, dir, "documents"), col("lang"),
        col("source"))),

    // north-star: learned BPE merge rules — iterative trainer; corpus
    // read once, merge rounds run on the distributed word vocabulary.
    // Deterministic (exact integer pair counts, fixed tie order); the
    // oracle unrolls the 12 training rounds as DuckDB CTEs (see
    // [[sqlBpeTrain]]) the same way the pagerank oracle unrolls its
    // power iterations.
    "text_bpe_merges" -> ((s, dir) =>
      bpe.train(table(s, dir, "documents"), "text",
          merges = 12, minPairCount = 2)
        .orderBy(col("step"))),

    // north-star: unigram-LM (SentencePiece-style) tokenizer training —
    // the BPE companion: seed from frequent substrings, Viterbi hard-EM
    // rounds over the word vocabulary (corpus read once; pieces are
    // bounded driver literals), prune by usage. Oracle unrolls both EM
    // rounds' DP position-by-position (sqlUnigramTrain).
    "text_unigram_train" -> ((s, dir) =>
      unigram.train(table(s, dir, "documents"), "text", seedSize = 60,
        maxPieceLen = 3, rounds = 2, minUsage = 2L, keepTop = 40)),

    // north-star: learned-vocab fertility — pieces per whitespace token
    // + UNK share under the trained unigram vocabulary; the trainer's
    // fit-for-budget readout (oracle re-derives the full EM chain plus
    // one final segmentation round).
    "text_unigram_fertility" -> ((s, dir) =>
      unigram.fertility(table(s, dir, "documents"), "text", seedSize = 60,
        maxPieceLen = 3, rounds = 2, minUsage = 2L)),

    // north-star: encode under a PERSISTED tokenizer artifact — train
    // once (memoized build, the prebuilt-index discipline), write the
    // versioned (piece, freq, score_q6) parquet + meta, then
    // load-then-encode the corpus word vocabulary with the same fused
    // Viterbi kernel; piece-usage histogram proves the round trip.
    "text_unigram_encode_indexed" -> ((s, dir) => {
      val path = unigramArtifact(s, dir)
      val pieces = graft.ops.tokenizers.loadUnigram(s, path)
      val words = table(s, dir, "documents")
        .select(explode(text.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      words.select(col("cnt"),
          explode(unigram.encodeTokens(col("w"), pieces, maxPieceLen = 3))
            .as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("n_uses"))
        .orderBy(col("n_uses").desc, col("piece"))
        .limit(40)
    }),

    // north-star: cross-corpus token shift — what changed between two
    // domains (en vs de here); smoothed log-ratio, vocab-sized work.
    "text_token_shift" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.tokenShift(docs.where(col("lang") === "en"),
        docs.where(col("lang") === "de"), "text", k = 10)
    }),

    // north-star: corpus distribution divergence — the domain-shift /
    // mixture-drift meter (KL both ways + bounded JS), fixed-point sums.
    "text_corpus_divergence" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.corpusDivergence(docs.where(col("lang") === "en"),
        docs.where(col("lang") === "de"), "text")
    }),

    // north-star: per-doc language consistency — chunk-level langId
    // against the doc majority; catches code-switched docs that a
    // doc-level langId averages into one confident label.
    "text_lang_consistency" -> ((s, dir) =>
      text.langConsistency(table(s, dir, "documents"), "text", "doc_id",
          window = 64, stride = 64)
        .orderBy(col("doc_id"))),

    // north-star: typed PII scrub — emails/urls/phones/IPs/card-shaped
    // digit runs → placeholder tokens; fused regex chain, zero shuffle.
    "text_redact" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), md5(text.redactPii(col("text"))).as("redacted_md5"))
        .orderBy(col("doc_id"))),

    // north-star: per-doc keyword extraction — smoothed TF-IDF top-3,
    // rank window partitioned by document (WindowGroupLimit).
    "text_tfidf_topterms" -> ((s, dir) =>
      text.tfidfTopTerms(table(s, dir, "documents"), "text", "doc_id", k = 3)
        .orderBy(col("doc_id"), col("rk"))),

    // north-star: per-language corpus shape report — exact interpolated
    // length quantiles; one uniform-key aggregate. SCALE NOTE: exact
    // `percentile` buffers per-group DISTINCT values, which is safe HERE
    // only because n_chars is a bounded integer domain (≤ ~20k distinct
    // values per language regardless of corpus size). Do NOT copy this
    // shape onto an unbounded-domain column (timings, scores) — use the
    // mergeable histogram twin `sketch.histogramQuantileBy`
    // (`docs_len_quantiles_lang`) there.
    "text_len_quantiles" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          (floor(expr("percentile(n_chars, 0.5)") * 10000.0 + 0.5) / 10000.0).as("p50"),
          (floor(expr("percentile(n_chars, 0.9)") * 10000.0 + 0.5) / 10000.0).as("p90"))
        .orderBy(col("lang"))),

    // north-star: composite quality score (usable as a pushed-down scan
    // filter) + stopword-profile language-ID heuristic.
    "text_quality_langid" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        // floor-based quantization, NOT round(): ratio-of-small-ints scores
        // sit exactly on .00005 boundaries where Spark (BigDecimal half-up
        // on the shortest decimal repr) and DuckDB (float rounding)
        // disagree; floor(x*1e4+0.5)/1e4 is identical IEEE math in both.
        (floor(text.qualityScore(col("text")) * 10000.0 + 0.5) / 10000.0).as("quality"),
        text.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // north-star: Gopher-style repetition signals — top-2-gram char
    // fraction, duplicate-3-gram char fraction, duplicate-line fraction,
    // and the composite keep flag. One native kernel pass per n; zero
    // shuffle.
    "text_repetition" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        (floor(text.topNgramCharFraction(col("text"), 2) * 10000.0 + 0.5) / 10000.0)
          .as("top2_frac"),
        (floor(text.dupNgramCharFraction(col("text"), 3) * 10000.0 + 0.5) / 10000.0)
          .as("dup3_frac"),
        (floor(text.dupLineFraction(col("text")) * 10000.0 + 0.5) / 10000.0)
          .as("dup_line_frac"),
        text.repetitionFilter(col("text")).cast("int").as("keep"))
        .orderBy(col("doc_id"))),

    // north-star: exact 128-bit content fingerprint + rolling-hash
    // min-shingle fingerprint (robust to small edits).
    "text_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        text.contentFingerprint(col("text")).as("fp128"),
        text.minShingleFingerprint(col("text")).as("fp_shingle"))
        .orderBy(col("doc_id"))),

    // north-star: exact dedup — one hash-partitioned agg on the content
    // fingerprint (uniform keys, map-side combine; the only shuffle).
    "dedup_exact" -> ((s, dir) =>
      dedup.exactGroups(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("keep_id"))),

    // north-star: MinHash signatures (k=4 shown as scalar columns) —
    // shingle + k salted hash minima, all codegen, zero shuffle.
    "dedup_minhash_sig" -> ((s, dir) =>
      dedup.minhashed(table(s, dir, "documents"), "text", "doc_id", k = 4)
        .select(col("doc_id"), col("sig")(0).as("m0"), col("sig")(1).as("m1"),
          col("sig")(2).as("m2"), col("sig")(3).as("m3"))
        .orderBy(col("doc_id"))),

    // north-star: MinHash-LSH near-dup pairs (k=16, 8 bands of r=2) with
    // exact Jaccard rerank at >= 0.5. Candidates only ever materialize
    // after banding — never O(n^2).
    "dedup_minhash_pairs" -> ((s, dir) =>
      dedup.minhashNearDupPairs(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: incremental (batch-vs-corpus) near-dup screening — the
    // daily-ingest shape: new docs (id >= 400) against the persisted
    // corpus signature table (id < 400); corpus text never re-read,
    // corpus x corpus pairs never generated, batch bands broadcast.
    "dedup_incremental" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val corpusSigs = dedup.minhashed(
        docs.where(col("doc_id") < 400), "text", "doc_id", k = 16)
      dedup.incrementalNearDups(docs.where(col("doc_id") >= 400), corpusSigs,
          "text", "doc_id", threshold = 0.5)
        .select(col("corpus_id"), col("new_id"),
          (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
        .orderBy(col("corpus_id"), col("new_id"))
    }),

    // north-star: near-dup CLUSTERS — the terminal dedup stage. MinHash
    // pairs feed alternating large-star/small-star connected components
    // (O(log²) rounds, lineage cut per round); every clustered doc gets
    // its component-min rep and a keep flag.
    "dedup_cluster" -> ((s, dir) =>
      dedup.nearDupClusters(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.5)
        .select(col("doc_id"), col("rep").as("rep_id"),
          col("keep").cast("int").as("keep"))
        .orderBy(col("doc_id"))),

    // north-star: benchmark decontamination — train docs (doc_id % 20 != 0)
    // sharing distinct 8-gram shingles with the held-out slice
    // (doc_id % 20 == 0). Bench grams broadcast: the train corpus is never
    // shuffled; only matching rows reach the count aggregation.
    "decontam_overlap" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      decontam.contaminationHits(
        docs.where(col("doc_id") % 20 =!= 0),
        docs.where(col("doc_id") % 20 === 0),
        "text", "doc_id", n = 8)
        .orderBy(col("doc_id"))
    }),

    // north-star: the bench gram set as a constant-size Bloom sketch —
    // 64 words of 63 bits; one hash-only distinct, one bit_or aggregate.
    "decontam_bloom_sketch" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0), "text")
        .orderBy(col("word"))
    }),

    // north-star: decontamination via the bloom — the words ride the
    // plan as ONE literal array; train corpus scanned once, never
    // shuffled; false positives deterministic (same public hash family
    // in the oracle), false negatives impossible. Sized so the FP rate
    // is negligible at both oracle scales (~1M bits for <= ~25k grams),
    // unlike the 64-word display sketch above.
    "decontam_bloom" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bl = decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0),
        "text", mBits = ScreenBloomBits)
      decontam.bloomScreenHits(
        docs.where(col("doc_id") % 20 =!= 0), bl, "text", "doc_id",
        mBits = ScreenBloomBits)
        .orderBy(col("doc_id"))
    }),

    // north-star: the stateless in-row bloom gate — survivors of the
    // screen; the same call is streaming-legal (no state, no explode).
    "decontam_bloom_clean" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bl = decontam.benchGramBloom(docs.where(col("doc_id") % 20 === 0),
        "text", mBits = ScreenBloomBits)
      decontam.bloomClean(docs.where(col("doc_id") % 20 =!= 0), bl, "text",
        mBits = ScreenBloomBits)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // north-star: embedding-space decontamination — the paraphrase
    // complement of the n-gram screen; bench vectors broadcast, train
    // corpus scanned once, never shuffled.
    "decontam_semantic" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      decontam.semanticHits(
        emb.where(col("vec_id") >= 100),
        emb.where(col("vec_id") < 100),
        "vec_id", "embedding", tau = 0.45)
        .orderBy(col("train_id"), col("bench_id"))
    }),

    // north-star: 16-bit SimHash signatures (explode -> one agg per doc).
    "dedup_simhash" -> ((s, dir) =>
      dedup.simhash(table(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))),

    // north-star + roadmap Hamming metric: SimHash near-dup pairs at
    // 64 bits — four-block blocking is COMPLETE for hamming <= 3
    // (pigeonhole: one of the four 16-bit blocks must match exactly; the
    // Manku/Google simhash-dedup layout).
    "dedup_simhash_pairs" -> ((s, dir) =>
      dedup.simhashNearDupPairs(table(s, dir, "documents"), "text", "doc_id",
          maxHamming = 3, bits = 64)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: embedding-cosine near-dup via 4x16-bit hyperplane LSH
    // blocking (bucket-capped at 256 with an observe() spill counter)
    // + exact cosine rerank >= 0.45.
    "dedup_emb_neardup" -> ((s, dir) =>
      dedup.embeddingNearDupPairs(table(s, dir, "embeddings"), threshold = 0.45)
        .select(col("id_a"), col("id_b"), vectors.quantize(col("cos"), 4).as("cos"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: LSH-bucketed ANN — scan only the query's 6-bit
    // hyperplane bucket (~1/64 of the store with a persisted+partitioned
    // signature), exact cosine rerank inside it.
    "ann_lsh_topk" -> ((s, dir) =>
      ann.lshSearch(embStore(s, dir), Q1, k = 5, nbits = 6)),

    // north-star: batched ANN serving — B queries amortize ONE
    // bucket-pruned scan; per-query top-k is a rank window
    // (WindowGroupLimit), never a global sort.
    "ann_lsh_batch" -> ((s, dir) =>
      ann.lshSearchBatch(embStore(s, dir), Seq((0L, Q1), (1L, Q2)), k = 5)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))),

    // north-star: per-label embedding centroids (class prototypes) —
    // order-free fixed-point sums, shuffle is labels x dims cells.
    "vec_label_centroids" -> ((s, dir) =>
      ann.labelCentroids(table(s, dir, "embeddings"))
        .select(col("label"), col("pos"),
          (floor(col("mean") * 10000.0 + 0.5) / 10000.0).as("mean"), col("n"))
        .orderBy(col("label"), col("pos"))),

    // north-star: recall@k measurement for the LSH search — the tuning
    // number behind the nbits ↔ scan-fraction trade; exact side is the
    // ground-truth full scan, both sides k-row subplans.
    "ann_recall_at_k" -> ((s, dir) =>
      ann.recallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10, nbits = 6)),

    // north-star: recall of the persisted-projection search — the candK
    // tuning knob measured, not argued (same discipline as nprobe/nbits).
    "ann_rp_recall" -> ((s, dir) =>
      ann.rpRecallAtK(embIndex(s, dir), Seq(Q1, Q2), k = 10)),

    // recall meter for the prefix-dim path — the number that tells you
    // whether these embeddings were matryoshka-trained at all.
    "ann_matryoshka_recall" -> ((s, dir) =>
      ann.matryoshkaRecallAtK(embStore(s, dir), Seq(Q1, Q2), k = 10,
        prefixDims = 16, candK = 40)),

    // north-star: ANN over an LSH-PARTITIONED index — the bucket filter
    // becomes directory-level partition pruning (63 of 64 buckets never
    // read; see AnnSpec's PartitionFilters assertion).
    "ann_lsh_part_topk" -> ((s, dir) =>
      ann.lshSearch(embLshIndex(s, dir), Q2, k = 5, nbits = 6)),

    // north-star: MULTI-PROBE LSH — the query's bucket plus the 3
    // lowest-margin bit-flip buckets, read as 4 pruned partition
    // directories of the same persisted index (recall rises with probes,
    // not with tables/storage).
    "ann_lsh_multiprobe_topk" -> ((s, dir) =>
      ann.lshSearchMultiProbe(embLshIndex(s, dir), Q1, k = 5, nbits = 6,
        probes = 4)),

    // north-star: IVF ANN over a cluster-partitioned index — assignment
    // ran once at build (16 deterministic seed centroids, persisted in
    // the index metadata); the probe of the 4 nearest lists is directory
    // partition pruning, so 12 of 16 lists are never read.
    // (pq_code rides in the same index for ann_ivfpq_topk — project it
    // away here so the exact-scoring result shape matches the oracle's.)
    "ann_ivf_topk" -> ((s, dir) =>
      ann.ivfSearchIndexed(embIvfIndex(s, dir), Q1, k = 10, nprobe = 4)
        .select(col("vec_id"), col("score"), col("label"))),

    // north-star: batched serving over the IVF layout — B queries, ONE
    // scan pruned to the union of probed list directories.
    "ann_ivf_batch" -> ((s, dir) =>
      ann.ivfSearchBatch(embIvfIndex(s, dir), Seq((0L, Q1), (1L, Q2)),
          k = 10, nprobe = 4)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))),

    // north-star: recall@k for the IVF index — the nprobe tuning loop
    // (lists read vs recall), exact side is the full-scan ground truth.
    "ann_ivf_recall" -> ((s, dir) =>
      ann.ivfRecallAtK(embIvfIndex(s, dir), Seq(Q1, Q2), k = 10, nprobe = 4)),

    // the complete reference flagship path in one query: indexed store,
    // metadata predicate (pushed to scan), score threshold, top-k
    // (ref README.md:59-136: query + meta_filter + vec_filter + take).
    "vec_full_pipeline" -> ((s, dir) =>
      embIndex(s, dir)
        .query(Q2, Metric.Cosine)
        .metaFilter(col("label") >= 3 && col("label") <= 7)
        .vecFilter(0.05, Cmp.Gte)
        .take(15)
        .withScoreRounding(4)
        .collect()),

    // §2.4: explicit take direction override (take_max on a min-default
    // metric = farthest points, ref vec.rs:161-168).
    "vec_takemax_l2" -> ((s, dir) =>
      embStore(s, dir)
        .query(Q1, Metric.Euclidean)
        .takeMax(10)
        .withScoreRounding(4)
        .collect()),

    // north-star (streaming surface, batch-checked): tumbling 5-minute
    // windows per event type; same plan works under readStream +
    // watermark (see EventStreamSpec).
    // north-star: KMV distinct-count sketch — deterministic cardinality
    // estimate whose shuffle carries 32-bit hashes (bounded k per group),
    // never the values; exact below k, (k-1)·2³²/(h_k+1) above.
    "events_distinct_kmv" -> ((s, dir) =>
      sketch.kmvDistinct(events(s, dir), col("user_id"),
          Seq(col("event_type")), k = 64)
        .select(col("event_type"), col("n_min"),
          (floor(col("distinct_est") * 10000.0 + 0.5) / 10000.0).as("distinct_est"))
        .orderBy(col("event_type"))),

    // north-star: distinct-set OVERLAP from two KMV sketches — "how many
    // users did BOTH view and purchase" with neither corpus re-read; the
    // union minima are a coordinated sample, so shared-hash fraction
    // estimates Jaccard (Beyer et al. 2007).
    "events_kmv_overlap" -> ((s, dir) => {
      val ev = events(s, dir)
      sketch.kmvOverlap(
        sketch.kmv(ev.where(col("event_type") === "view"),
          col("user_id"), Seq.empty, k = 64),
        sketch.kmv(ev.where(col("event_type") === "purchase"),
          col("user_id"), Seq.empty, k = 64),
        Seq.empty, k = 64)
    }),

    // north-star: HyperLogLog — the constant-size MERGEABLE distinct
    // state; every register bit is a pure function of the input set and
    // the portable hash, so the sketch itself hash-matches the oracle.
    "events_hll_users" -> ((s, dir) =>
      sketch.hllEstimate(
        sketch.hll(events(s, dir), col("user_id"), Seq("event_type"), p = 6),
        Seq("event_type"), p = 6)
        .orderBy(col("event_type"))),

    // the merge law as a checked query: register-wise max of two
    // half-corpus sketches ≡ the from-scratch whole-corpus sketch,
    // which is exactly what the oracle computes.
    "events_hll_merge" -> ((s, dir) => {
      val ev = events(s, dir)
      sketch.hllMerge(
        sketch.hll(ev.where(col("event_id") % 2 === 0), col("user_id"),
          Seq("event_type"), p = 6),
        sketch.hll(ev.where(col("event_id") % 2 === 1), col("user_id"),
          Seq("event_type"), p = 6),
        Seq("event_type"))
        .orderBy(col("event_type"), col("register"))
    }),

    // north-star: ordered funnel — per-step earliest-reach times as
    // stacked conditional-min windows over ONE user shuffle.
    "events_funnel" -> ((s, dir) =>
      EventStream.funnel(events(s, dir), Seq("view", "click", "purchase"))),

    "events_window_agg" -> ((s, dir) =>
      EventStream.windowedAgg(events(s, dir))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n_events"), col("sum_value_micros"))
        .orderBy(col("wstart"), col("event_type"))),

    // SLIDING windows (10-minute length, 5-minute slide): every event
    // lands in exactly 2 overlapping windows; in streaming mode the
    // watermark evicts closed window state.
    "events_sliding_agg" -> ((s, dir) =>
      EventStream.windowedAgg(events(s, dir), windowLen = "10 minutes",
          slide = Some("5 minutes"))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n_events"), col("sum_value_micros"))
        .orderBy(col("wstart"), col("event_type"))),

    // NATIVE session windows (session_window + state-store merge in
    // streaming) — must draw the same session boundaries as the
    // gaps-and-islands form: the oracle is the sessionize chain with
    // end = last event + gap (session_window's end semantics).
    "events_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("s_start"))),

    // north-star: gap-based sessionization (lag -> flag -> running sum),
    // one shuffle on user_id.
    "events_sessionize" -> ((s, dir) =>
      EventStream.sessionize(events(s, dir))
        .select(col("user_id"), col("session_idx"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_idx"))),

    // north-star: typed JSON prop extraction. The fence matters: without
    // it, PushDownPredicates clones the parse into the filter AND the
    // projection — every row parses twice (the pipeline_e2e lesson).
    "events_json_extract" -> ((s, dir) =>
      events(s, dir)
        .withColumn("k", graft.functions.NativeExprs.fence(EventStream.propInt("k")))
        .where(col("k") > 50)
        .select(col("event_id"), col("event_type"), col("k"))
        .orderBy(col("event_id"))),

    // north-star: multimodal featurization — binary payloads with typed
    // metadata; stub decoder features via the expression path (the
    // mapPartitions path is cross-checked in MultimodalSpec).
    "mm_features" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.featurizeExpr(media, dims = 4)
        .select(col("id"), col("kind"), col("byteLen").as("byte_len"),
          col("checksum"),
          col("embedding")(0).as("e0"), col("embedding")(1).as("e1"),
          col("embedding")(2).as("e2"), col("embedding")(3).as("e3"))
        .orderBy(col("id"))
    }),

    // north-star: the TYPED featurize path (mapPartitions, one decoder
    // init per partition — the real-codec execution shape) must produce
    // the same rows as the expression path; same oracle as mm_features.
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
    }),

    // north-star: perceptual-hash media fingerprint — stubbed decode,
    // real bit layout; pure per-row projection, zero shuffle.
    "mm_dhash" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.dHash(media).orderBy(col("id"))
    }),

    // north-star: image near-dup pairs — dHash + the generic 4-block
    // Hamming pairing (complete for d <= 3); stub decode makes near =
    // byte-identical, a real decoder changes no pairing code. The
    // corpus is seeded with id-offset byte-identical copies of the
    // doc_id % 97 slice so the pairing is exercised at every scale
    // (the raw corpus has no exact dups at sf0.01).
    "mm_dhash_pairs" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val seeded = docs.unionByName(
        docs.where(col("doc_id") % 97 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      multimodal.dhashNearDupPairs(
          multimodal.fromText(seeded, "doc_id", "text", "source"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // north-star: frame-sampling plumbing — fixed-size payload frames,
    // every 2nd kept (stride), frame identity checked by md5.
    "mm_frames" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"), "doc_id", "text", "source")
      multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
        .select(col("id"), col("frame_idx"), md5(col("frame")).as("frame_ck"))
        .orderBy(col("id"), col("frame_idx"))
    }),

    // north-star: within-asset frame dedup meter — static scenes and
    // duplicated segments show as repeated frame checksums; the number
    // that decides whether to keyframe-sample a video before featurize.
    "mm_frame_dedup" -> ((s, dir) => {
      val media = multimodal.fromText(table(s, dir, "documents"),
        "doc_id", "text", "source")
      multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(md5(col("frame"))).as("n_distinct"))
        .withColumn("dup_frames", col("n_frames") - col("n_distinct"))
        .orderBy(col("id"))
    }),

    // relational coverage a pipeline needs around the vector core: grouped
    // aggregation (Q1 shape) — doubles summed as exact fixed-point cents.
    "rel_groupby_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("revenue_cents"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // north-star scale pattern: skew-salted equi-join — the hot key's
    // rows spread over (key, salt) reducers; result equals the plain
    // join, proven by the oracle's unsalted SQL.
    "rel_salted_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_custkey"))
      rel.saltedJoin(li, ords, "okey", saltBy = "l_linenumber", salts = 4)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("o_custkey"))
    }),

    // north-star: line-level exact dedup (the Dolma/FineWeb paragraph
    // stage). The corpus is single-line text, so the fixture SYNTHESIZES
    // multi-line docs — each doc gets its successor's (`doc_id + 1`;
    // ids are dense, TESTDATA.md) text as line 2, making every line 2 a
    // guaranteed earlier-seen duplicate for the op to strip. The
    // successor comes from an EQUI-JOIN, not a global-order lead window:
    // a partitionless window would drag the whole table through one
    // partition inside a timed query (and its WindowExec warning would
    // mask real unpartitioned-window regressions elsewhere).
    "dedup_lines" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val succ = docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("_next"))
      val multi = docs.join(succ, Seq("doc_id"), "left")
        .select(col("doc_id"),
          concat_ws("\n", col("text"), col("_next")).as("text"))
      dedup.dedupLines(multi, "text", "doc_id")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_lines"), col("n_kept"))
        .orderBy(col("doc_id"))
    }),

    // north-star: URL-level crawl dedup (C4/CCNet stage zero). The
    // documents table carries no URL, so synthesize a deterministic one
    // per doc exercising every normalization rule — scheme/host case,
    // www., explicit :443, trailing slash, tracking params (alone and
    // mixed with real ones), fragments — with doc_id % 50 path collisions
    // so normalization actually merges re-crawl variants.
    "dedup_url" -> ((s, dir) => {
      val d = col("doc_id")
      val url = concat(
        when(d % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
        lit("Docs-"), (d % 7).cast("string"), lit(".Example.COM"),
        when(d % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Wiki/Page-"), (d % 50).cast("string"),
        when(d % 5 === 0, lit("/")).otherwise(lit("")),
        when(d % 5 === 1, lit("?utm_source=feed&utm_campaign=spring"))
          .when(d % 5 === 2, lit("?page=2&utm_medium=email"))
          .when(d % 5 === 3, lit("?page=2"))
          .otherwise(lit("")),
        when(d % 6 === 0, lit("#section-3")).otherwise(lit("")))
      dedup.urlDedup(
        table(s, dir, "documents").select(col("doc_id"), url.as("url")),
        "url", "doc_id")
        .orderBy(col("norm_url"))
    }),

    // north-star: token-budget mixture plan — per-source targets, sample
    // rates, and epoch counts for an explicit weights→budget schedule
    // (sources outside the weights map plan to zero, not pass-through).
    "sample_token_budget" -> ((s, dir) =>
      sample.planTokenBudget(table(s, dir, "documents"), "source",
          text.tokenCount(col("text")),
          Map("src0" -> 0.4, "src1" -> 0.25, "src2" -> 0.2, "src3" -> 0.15),
          budget = 1000000L)
        .orderBy(col("source"))),

    // north-star: empirical LSH recall meter — plant near-dups at
    // controlled perturbation levels, run the PRODUCTION pair detector,
    // report measured recall per level (the companion to lshTune's
    // closed-form S-curve; re-tune on a sample before the 100 TB run).
    "dedup_minhash_recall" -> ((s, dir) =>
      dedup.minhashPlantedRecall(table(s, dir, "documents"), "text", "doc_id",
          levels = Seq(1, 2, 4, 8))
        .orderBy(col("level"))),

    // flagship: the DEDUP FUNNEL data card — what each dedup stage
    // would save, measured independently over one augmented corpus
    // (exact clones of every 4th doc, re-typeset variants of every even
    // doc, re-crawled URLs keyed to the original page). Per-stage
    // independent counts, NOT a sequential pipeline: the card ranks
    // stages before committing to an order.
    "pipeline_dedup_funnel" -> ((s, dir) => {
      val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val clones = base.where(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val variants = base.where(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(translate(upper(col("text")), "AEIOU", "ÀÉÎÕÜ"), lit(" !!"))
            .as("text"))
      val corpus = base.unionByName(clones).unionByName(variants)
      val url = concat(lit("https://x.example.com/p/"),
        ((col("doc_id") % 1000000L) % 200L).cast("string"))
      def stage(name: String, docsOut: DataFrame): DataFrame =
        docsOut.select(lit(name).as("stage"), col("docs_out"))
      val raw = stage("1_raw", corpus.agg(count(lit(1)).as("docs_out")))
      val urlS = stage("2_url", dedup.urlDedup(
          corpus.select(col("doc_id"), url.as("url")), "url", "doc_id")
        .agg(count(lit(1)).as("docs_out")))
      val exactS = stage("3_exact", dedup.exactGroups(corpus, "text", "doc_id")
        .agg(count(lit(1)).as("docs_out")))
      val normS = stage("4_normalized",
        dedup.normalizedExactGroups(corpus, "text", "doc_id")
          .agg(count(lit(1)).as("docs_out")))
      val cl = dedup.nearDupClusters(corpus, "text", "doc_id", threshold = 0.5)
      val ndS = stage("5_neardup", corpus.agg(count(lit(1)).as("_n"))
        .crossJoin(cl.agg(count(lit(1)).as("_m"),
          countDistinct(col("rep")).as("_c")))
        .select((col("_n") - col("_m") + col("_c")).as("docs_out")))
      raw.unionByName(urlS).unionByName(exactS).unionByName(normS)
        .unionByName(ndS).orderBy(col("stage"))
    }),

    // north-star: normalization-aware exact dedup. The variant corpus
    // re-typesets every doc (uppercased, vowels accented, punctuation
    // appended) under a shifted id — byte-exact dedup finds nothing,
    // the match key pairs each doc with its variant.
    "dedup_normalized" -> ((s, dir) => {
      val base = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(translate(upper(col("text")), "AEIOU", "ÀÉÎÕÜ"), lit(" !!"))
          .as("text"))
      dedup.normalizedExactGroups(base.unionByName(variants), "text", "doc_id")
        .select(md5(col("match_key")).as("key_md5"), col("keep_id"),
          col("group_size"))
        .orderBy(col("keep_id"))
    }),

    // north-star: PII shape counts for the data card. The corpus text is
    // PII-free word salad, so inject deterministic shapes (email, URL,
    // IP, card-grouped digits, phone) on modular doc_id classes — counts
    // then exercise every pattern including multi-hit rows.
    "text_pii_stats" -> ((s, dir) => {
      val d = col("doc_id")
      val injected = table(s, dir, "documents").select(d, concat(col("text"),
        when(d % 4 === 0, lit(" contact bob@example.com now")).otherwise(lit("")),
        when(d % 5 === 0, lit(" see https://t.example.com/p?id=1")).otherwise(lit("")),
        when(d % 7 === 0, lit(" from 192.168.1.100 at")).otherwise(lit("")),
        when(d % 9 === 0, lit(" card 4111 1111 1111 1111 or 555-123-4567"))
          .otherwise(lit(""))).as("text"))
      injected
        .select(d, text.piiStats(col("text")).as("_p"))
        .select(d, col("_p.n_emails").as("n_emails"),
          col("_p.n_urls").as("n_urls"), col("_p.n_ips").as("n_ips"),
          col("_p.n_card_like").as("n_card_like"),
          col("_p.n_phones").as("n_phones"))
        .orderBy(d)
    }),

    // north-star: quality-aware canonical selection — within each
    // near-dup cluster keep the HIGHEST-QUALITY member (longest doc,
    // id tiebreak), not the smallest id: the FineWeb-style "keep the
    // full article, drop the syndicated excerpt" policy.
    // north-star: mass-preserving dedup — keep one representative per
    // near-dup cluster but carry the cluster SIZE as its training
    // weight (upweight-the-survivor instead of silently shrinking the
    // distribution; the D4/SemDeDup follow-up move).
    "dedup_cluster_weights" -> ((s, dir) =>
      dedup.nearDupClusters(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.5)
        .groupBy(col("rep").as("rep_id"))
        .agg(count(lit(1)).as("weight"))
        .orderBy(col("rep_id"))),

    "dedup_cluster_best" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val cl = dedup.nearDupClusters(docs, "text", "doc_id", threshold = 0.5)
      val j = cl.select(col("doc_id"), col("rep"))
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      rel.topKPerGroup(j, Seq(col("rep")),
          Seq(col("n_chars").desc, col("doc_id")), 1)
        .select(col("rep").as("rep_id"), col("doc_id").as("best_id"),
          col("n_chars").cast("long").as("best_chars"))
        .orderBy(col("rep_id"))
    }),

    // north-star: per-language percentile rank of a score — the
    // quality-calibration primitive (per-lang thresholds, not a global
    // cut). n_chars is already integral, so scale=1 makes the grid key
    // exact and the ranks match SQL percent_rank bit-for-bit.
    "sample_pct_rank" -> ((s, dir) =>
      sample.percentileRankBy(
          table(s, dir, "documents").select(col("doc_id"), col("lang"),
            col("n_chars")),
          "lang", col("n_chars"), scale = 1.0)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("pct_rank"))
        .orderBy(col("doc_id"))),

    // north-star: corpus snapshot diff (dataset versioning). Version B
    // is synthesized from A: every 17th doc removed, every 13th kept doc
    // edited, every 19th doc re-added under a shifted id — exercising
    // all four statuses with a deterministic fixture.
    "rel_snapshot_diff" -> ((s, dir) => {
      val aV = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val bV = aV.where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(aV.where(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      rel.snapshotDiff(aV, bV, "doc_id", "text")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("status"))
    }),

    // north-star: deterministic training-shard export — write, then
    // verify by READING BACK the landed parquet (shard membership is the
    // portable id hash, so the oracle recomputes it from the raw table).
    "export_shards" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft-shards-")
        .toString + "/docs"
      graft.sources.ingest.writeShards(table(s, dir, "documents"), out,
        "doc_id", shards = 8)
      s.read.parquet(out)
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .orderBy(col("shard"))
    }),

    // north-star: one-pass column profile — per-column rows/nulls/exact
    // distincts/min/max from a single aggregation job + stack unpivot.
    "rel_profile" -> ((s, dir) =>
      rel.profileColumns(table(s, dir, "orders"),
          Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
        .orderBy(col("column"))),

    // broadcast dimension join + top-n aggregate.
    "rel_join_topn" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("spend_cents"))
        .orderBy(col("spend_cents").desc, col("c_custkey"))
        .limit(10)
    }),

    // fact-to-fact join over PERSISTED bucket layouts — both scans are
    // co-partitioned on their join keys, so the join plans no exchange
    // (asserted in RelSpec); revenue quantized per-row, summed as longs.
    "rel_bucketed_join" -> ((s, dir) => {
      val (liT, ordT) = bucketedTables(s, dir)
      s.table(liT).join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
            .cast("long")).as("rev_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // approximate kNN GRAPH (per-vector top-k neighbor lists from shared
    // LSH buckets) — thin-row banding, rank on the ROUNDED score.
    "ann_knn_graph" -> ((s, dir) =>
      ann.knnGraph(table(s, dir, "embeddings"), k = 3, nbits = 6)
        .orderBy(col("src"), col("rnk"))),

    // north-star: label-noise screen — points whose kNN neighbors
    // mostly carry a different label, ranked by integer basis-point
    // disagreement. The audit queue for label quality.
    "vec_label_noise" -> ((s, dir) =>
      ann.labelNoise(table(s, dir, "embeddings"), k = 3, nbits = 6,
        topN = 50)),

    // north-star: embedding-space drift between two corpus versions —
    // centroid cosine + squared centroid shift, exact fixed-point sums.
    "vec_corpus_drift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.centroidDrift(
        emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1))
    }),

    // north-star: hard-negative mining — nearest different-label
    // neighbors, the informative contrastive-training examples; the
    // label gate applies BEFORE the per-source rank.
    "ann_hard_negatives" -> ((s, dir) =>
      ann.hardNegatives(table(s, dir, "embeddings"), k = 2)
        .orderBy(col("src"), col("rnk"))),

    // two-corpus kNN JOIN — link a query set to a reference corpus by
    // embedding (disjoint modulo split of the same table stands in for
    // the two datasets).
    "ann_knn_join" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.knnJoin(
          emb.where(col("vec_id") % 7 === 0),
          emb.where(col("vec_id") % 7 =!= 0), k = 2, nbits = 6)
        .orderBy(col("src"), col("rnk"))
    }),

    // north-star: margin-based pair mining (Artetxe & Schwenk 2019 —
    // the CCMatrix/NLLB bitext score): forward kNN cosine normalized by
    // both endpoints' neighborhood averages, exact-integer num/den,
    // mined set = ratio margin >= 1.
    "ann_margin_mine" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      ann.marginMine(
          emb.where(col("vec_id") % 7 === 0),
          emb.where(col("vec_id") % 7 =!= 0), k = 2, threshold = 1.0,
          nbits = 6)
        .orderBy(col("src"), col("dst"))
    }),

    // deterministic fixed-point PageRank over the kNN similarity graph —
    // document centrality for curation; every rank is an exact long.
    // Edges come from the memoized [[knnEdges]] parquet (graph built
    // once, ranked many times); knnGraph is deterministic, so the
    // persisted edges are value-identical to a live build.
    "graph_pagerank" -> ((s, dir) =>
      graft.ops.graph.pageRank(
          s.read.parquet(knnEdges(s, dir)), iters = 3)
        .orderBy(col("id"))),

    // north-star: exact triangle count over the kNN graph via the
    // degree-ordered node-iterator — each triangle has ONE apex under
    // the (degree, id) total order, so no /3 correction; orientation
    // bounds the wedge stage against hubs. The oracle uses the simple
    // a<b<c three-way join: orientation changes the plan, not the count.
    "graph_triangles" -> ((s, dir) =>
      graft.ops.graph.triangleCount(s.read.parquet(knnEdges(s, dir)))),

    // north-star: TextRank corpus keywords — PageRank over the token
    // co-occurrence graph (window 2), fixed-point integer ranks over
    // h63 term ids; centrality rewards context-bridging terms TF-IDF's
    // per-document lens misses.
    "text_textrank" -> ((s, dir) =>
      graft.ops.text.textRankTerms(table(s, dir, "documents"), "text",
        window = 2, iters = 3, topN = 20)),

    // north-star: personalized PageRank from a 5-doc seed set — the
    // expand-a-curated-set primitive: restart mass teleports to seeds,
    // so rank = multi-hop relevance, decaying with graph distance.
    "graph_ppr" -> ((s, dir) =>
      graft.ops.graph.personalizedPageRank(
          s.read.parquet(knnEdges(s, dir)), seeds = Seq(0L, 1L, 2L, 3L, 4L),
          iters = 3)
        .where(col("rank") > 0)
        .orderBy(col("id"))),

    // north-star: 3-core of the kNN graph by 4 synchronous peeling
    // rounds (fixed-round semantics, oracle unrolls the same rounds) —
    // the dense-subgraph screen: template farms live in high cores.
    "graph_kcore" -> ((s, dir) =>
      graft.ops.graph.kCorePeel(s.read.parquet(knnEdges(s, dir)),
          k = 3, rounds = 4)
        .orderBy(col("id"))),

    // deterministic synchronous label propagation over the same built
    // kNN graph — community labels travel <= iters hops; smallest-label
    // tie rule makes every round engine-reproducible.
    "graph_label_prop" -> ((s, dir) =>
      graft.ops.graph.labelPropagation(
          s.read.parquet(knnEdges(s, dir)), iters = 2)
        .orderBy(col("id"))),

    // CUBE: all 2^k facet marginals in the same one-pass Expand shape.
    "rel_cube" -> ((s, dir) =>
      rel.cubeAgg(table(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // explicit grouping sets — the two independent marginals plus the
    // grand total, none of the cross cells: one Expand pass, one scan.
    "rel_grouping_sets" -> ((s, dir) =>
      rel.groupingSetsAgg(table(s, dir, "lineitem"),
          Seq(Seq("l_returnflag"), Seq("l_linestatus"), Seq.empty),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // per-group Pearson correlation from EXACT fixed-point moments —
    // order-free long sums; the float formula runs once per group.
    "rel_corr" -> ((s, dir) =>
      rel.corrExact(table(s, dir, "lineitem"), "l_quantity", "l_discount",
          Seq("l_returnflag"), xScale = 1.0, yScale = 10000.0)
        .orderBy(col("l_returnflag"))),

    // tokenizer fertility per language (BPE-ish subwords per whitespace
    // word) — the tokenizer-suitability signal a multilingual corpus
    // report carries; exact integer sums, fixed-point ratio.
    "text_fertility" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"),
          text.tokenCount(col("text")).cast("long").as("ws"),
          text.bpeTokenCount(col("text")).cast("long").as("bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).as("ws_tokens"),
          sum(col("bpe")).as("bpe_tokens"),
          expr("(sum(bpe) * 10000) DIV sum(ws)").as("fertility_4dp"))
        .orderBy(col("lang"))),

    // Count-Min sketch over corpus tokens + point estimates for probe
    // words — the depth×width frequency summary is deterministic and
    // mergeable; estimates never undercount.
    "text_cm_tokens" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(text.tokens(col("text"))).as("tok"))
      val sk = sketch.countMin(toks, col("tok"), depth = 4, width = 512)
      sketch.cmEstimate(sk, Seq("the", "spark", "query", "zzzz_absent"),
          depth = 4, width = 512)
        .orderBy(col("value"))
    }),

    // fixed-width histogram with clamped edge bins and an explicit bin
    // spine (empty bins emitted, not omitted).
    "events_histogram" -> ((s, dir) =>
      sketch.histogram(events(s, dir), col("value"), lo = 0.0, hi = 500.0,
          nbins = 25)
        .orderBy(col("bin"))),

    // north-star: per-group mergeable quantiles — length distribution
    // per language from fixed-shape histogram state.
    "docs_len_quantiles_lang" -> ((s, dir) =>
      sketch.histogramQuantileBy(
        sketch.histogramBy(table(s, dir, "documents"),
          col("n_chars").cast("double"), Seq("lang"), lo = 0.0, hi = 640.0,
          nbins = 32),
        Seq("lang"), Seq(0.5, 0.95))
        .orderBy(col("lang"), col("q"))),

    // north-star: mergeable quantiles — derive any quantile from the
    // (mergeable) histogram counts; no full-data sort, no rescan.
    "events_hist_quantiles" -> ((s, dir) =>
      sketch.histogramQuantile(
        sketch.histogram(events(s, dir), col("value"), lo = 0.0, hi = 500.0,
          nbins = 25),
        Seq(0.5, 0.9, 0.99))
        .orderBy(col("q"))),

    // north-star: quantiles from a deterministic bottom-k-hash sample —
    // no domain knob (histogramQuantile's [lo,hi)), mergeable, and
    // exactly reproducible by an independent engine (no RNG, no
    // interpolation: nearest-rank over the value-sorted sample).
    "events_sample_quantiles" -> ((s, dir) =>
      sketch.sampleQuantiles(table(s, dir, "events"), col("value"),
        col("event_id"), k = 256, qs = Seq(0.1, 0.5, 0.9, 0.99))),

    // per-type medians/tails from independent per-group bottom-k
    // samples — WindowGroupLimit bounds the heap before the exchange.
    "events_sample_quantiles_by" -> ((s, dir) =>
      sketch.sampleQuantilesBy(table(s, dir, "events"), col("value"),
        col("event_id"), Seq("event_type"), k = 128, qs = Seq(0.5, 0.95))),

    // north-star: robust (IQR-fence) anomaly card per event type —
    // Tukey's fence Q3 + 1.5·IQR from MERGEABLE histogram quantiles
    // (both windows run over the 25-bin grid, never the table), then one
    // broadcast of 4 fences back onto the scan. The robust complement
    // to events_anomaly's rolling z-score: means move with the outliers
    // they're trying to catch, quartiles don't.
    "events_anomaly_iqr" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val hist = sketch.histogramBy(ev, col("value"), Seq("event_type"),
        lo = 0.0, hi = 500.0, nbins = 25)
      val qs = sketch.histogramQuantileBy(hist, Seq("event_type"),
        Seq(0.25, 0.75))
      val f = qs.where(col("q") === 0.25)
        .select(col("event_type"), col("v_est").as("q1"))
        .join(qs.where(col("q") === 0.75)
          .select(col("event_type"), col("v_est").as("q3")), "event_type")
        .withColumn("fence", col("q3") + (col("q3") - col("q1")) * 1.5)
      val out = ev.join(broadcast(f.select(col("event_type"), col("fence"))),
          "event_type")
        .where(col("value") > col("fence"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"), max(col("value")).as("_mx"))
      f.join(out, Seq("event_type"), "left")
        .select(col("event_type"),
          (floor(col("fence") * 10000.0 + 0.5) / 10000.0).as("fence"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
          (floor(coalesce(col("_mx"), lit(0.0)) * 10000.0 + 0.5) / 10000.0)
            .as("max_value"))
        .orderBy(col("event_type"))
    }),

    // exact quantile binning on a quantized grid — the rank cumsum runs
    // over domain-bounded grid rows, never over the table.
    "sample_quantile_bins" -> ((s, dir) =>
      sample.quantileBins(table(s, dir, "documents"),
          col("n_chars").cast("double"), nbins = 4, scale = 1.0)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo_chars"), max(col("n_chars")).as("hi_chars"))
        .orderBy(col("bin"))),

    // pivot long→wide with an EXPLICIT value domain — no distinct
    // discovery pass over the table; one groupBy shuffle of
    // groups × values cells (quantities are integral, so the double sums
    // are exact and order-free).
    "rel_pivot" -> ((s, dir) =>
      rel.pivotAgg(table(s, dir, "lineitem"), "l_returnflag", "l_linestatus",
          Seq("F", "O"), "l_quantity")
        .select(col("l_returnflag"),
          col("F").cast("long").as("qty_f"),
          col("O").cast("long").as("qty_o"))
        .orderBy(col("l_returnflag"))),

    // ROLLUP subtotals at every prefix level + grand total in ONE
    // Expand+agg pass (no per-level rescans).
    "rel_rollup" -> ((s, dir) =>
      rel.rollupAgg(table(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("sum_l_quantity").cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // trailing event-time rolling aggregate: RANGE-frame window after ONE
    // user shuffle; fixed-point sums, single final division.
    "events_rolling_avg" -> ((s, dir) =>
      EventStream.rollingAgg(events(s, dir), windowSec = 3600)
        .select(col("event_id"), col("epoch_s"), col("mov_n"),
          col("mov_sum_micros"), col("mov_avg"))
        .orderBy(col("event_id"))),

    // per-user EWMA over the last k events — dyadic weights make the
    // weighted numerator/denominator exact integers; one user shuffle.
    "events_ewma" -> ((s, dir) =>
      EventStream.ewma(events(s, dir), k = 4)
        .select(col("event_id"), col("user_id"), col("ewma_n"), col("ewma"))
        .orderBy(col("event_id"))),

    // trailing z-score anomaly signal — exact-integer window moments,
    // one division + sqrt at the end; zero-variance windows are null.
    "events_anomaly" -> ((s, dir) =>
      EventStream.rollingZScore(events(s, dir), windowSec = 3600)
        .select(col("event_id"), col("win_n"), col("z"))
        .orderBy(col("event_id"))),

    // weekly cohort retention triangle — distinct user-weeks collapse
    // before the co-partitioned first-week join.
    "events_retention" -> ((s, dir) =>
      EventStream.retention(events(s, dir))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // first-order Markov transition matrix — one user shuffle for the
    // lag window; shares as exact fixed-point integers.
    "events_transitions" -> ((s, dir) =>
      EventStream.transitions(events(s, dir))
        .orderBy(col("prev_type"), col("event_type"))),

    // per-group top-k via the rank-filter idiom — planned as
    // WindowGroupLimit (bounded per-group heap before the shuffle;
    // asserted in PlanQualitySpec): top-3 docs per predicted language by
    // quality score.
    "group_topk" -> ((s, dir) =>
      rel.topKPerGroup(
        table(s, dir, "documents").select(col("doc_id"),
          text.langId(col("text")).as("lang"),
          (floor(text.qualityScore(col("text")) * 10000.0 + 0.5) / 10000.0)
            .as("quality")),
        Seq(col("lang")), Seq(col("quality").desc, col("doc_id")), k = 3)
        .orderBy(col("lang"), col("rnk"))),

    // north-star: text scrubbing (url/email placeholders + whitespace
    // normalization) — checked by fingerprinting the cleaned text.
    "text_clean" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          md5(text.cleanText(col("text")).cast("binary")).as("clean_fp"),
          length(text.cleanText(col("text"))).cast("long").as("clean_len"))
        .orderBy(col("doc_id"))),

    // keep-first dedup per (user, event_type) — the batch twin of
    // streaming dropDuplicatesWithinWatermark.
    "events_dedup_keepfirst" -> ((s, dir) =>
      events(s, dir)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("event_type"))
            .orderBy(col("ts"), col("event_id"))))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))),

    // north-star: event-time AS-OF join — each purchase annotated with the
    // user's latest click at-or-before it. Union + running-last window:
    // one shuffle on user_id, no per-key range explosion.
    "events_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      asof.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"), col("click_id"), col("click_value"))
        .orderBy(col("event_id"))
    }),

    // north-star: bucketed time-RANGE join — every (purchase, click) pair
    // by the same user within the 30 minutes before the purchase. Both
    // sides bucket by the window width, so this is one uniform equi-join
    // shuffle (≤2× left duplication), never a per-key nested loop.
    "events_range_join" -> ((s, dir) => {
      val e = events(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asof.rangeJoin(purchases, clicks, Seq("user_id"), "ts",
          lowerUs = -30L * 60 * 1000000, upperUs = 0L, Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy(col("event_id"), col("click_id"))
    }),

    // north-star: BM25 keyword retrieval over the documents table.
    "text_bm25_topk" -> ((s, dir) =>
      retrieval.bm25Search(table(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "query", "window"), k = 10)),

    // north-star: pseudo-relevance-feedback expansion — mine the top-5
    // BM25 docs for 5 expansion terms (all-integer ranking: feedback df
    // desc, corpus df asc, term) and re-run; the oracle replays both
    // rounds including the term mining.
    "text_bm25_prf" -> ((s, dir) =>
      retrieval.prfExpand(table(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "query", "window"), k = 10,
        feedbackK = 5, expandTerms = 5)),

    // PERSISTED inverted index — probe-bucket partition pruning, corpus
    // never re-tokenized; scores bit-identical to the live path (same
    // oracle SQL as text_bm25_topk).
    "text_bm25_indexed" -> ((s, dir) =>
      retrieval.bm25Indexed(s, textIndex(s, dir),
        Seq("spark", "query", "window"), k = 10)),

    // north-star: hybrid retrieval — cosine ANN ranks fused with BM25
    // ranks by reciprocal rank (exact rational arithmetic).
    "hybrid_rrf_topk" -> ((s, dir) =>
      retrieval.hybridSearch(embStore(s, dir), table(s, dir, "documents"),
        "text", "doc_id", Q1, Seq("spark", "query", "window"), k = 10)),

    // roadmap (README.md:204-215): Z-order curve values — the sort key
    // that makes row-group pruning work on two filter columns at once
    // (layout effect proven in ZorderSpec).
    "index_zorder_value" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.index.zorder.zValue(col("n_chars"), col("doc_id")).as("z"))
        .orderBy(col("doc_id"))),

    // north-star: 2-D range query over the Z-CLUSTERED layout — both
    // range predicates push to the scan, and because the layout is
    // Morton-sorted the row-group min/max stats stay narrow in BOTH
    // dimensions (VecIndexSpec asserts most groups prune). Results are
    // layout-independent, so the oracle filters the logical table.
    "index_zorder_range" -> ((s, dir) =>
      s.read.parquet(zorderLayout(s, dir))
        .where(col("n_chars") >= 120 && col("n_chars") <= 200 &&
          col("doc_id") >= 100 && col("doc_id") <= 220)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))),

    // north-star: deterministic hash split + sampling — reproducible
    // dataset versions with no RNG state; pure scan work.
    "sample_split" -> ((s, dir) =>
      sample.split(table(s, dir, "documents"), "doc_id", trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))),

    // north-star: scorer calibration table — quantized cosine-to-query
    // as the "classifier score", label >= 5 as the outcome; per-bin
    // empirical rate in integer basis points. One bin-keyed groupBy.
    "vec_score_calibration" -> ((s, dir) => {
      val score = vectors.quantize(
        vectors.score(Metric.Cosine,
          vectors.asDoubleArray(col("embedding")), vectors.vecLit(Q1),
          queryInvNorm = Some(lit(vectors.invNormOf(Q1)))), 4)
      sample.calibrationMap(table(s, dir, "embeddings"),
          score, col("label") >= 5, lo = -1.0, hi = 1.0, nbins = 20)
        // bin edges as integer milli-units for the compare: the double
        // edges differ by an ulp across engines (DuckDB decimal literals)
        .select(col("bin"), (lit(-1000L) + col("bin") * 100L).as("lo_milli"),
          (lit(-1000L) + (col("bin") + 1L) * 100L).as("hi_milli"),
          col("n"), col("n_pos"), col("rate_bp"))
        .orderBy(col("bin"))
    }),

    // north-star: semantic training order (related-document packing) —
    // nearest-centroid clusters laid out contiguously, quantized
    // distance then id inside each; seq_pos is the range-partitioned
    // dense rank, no single-partition stage.
    "sample_semantic_order" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      sample.semanticOrder(emb, ann.seedCentroids(emb, 8))
        .select(col("vec_id"), col("cluster_id"), col("seq_pos"))
        .orderBy(col("seq_pos"))
    }),

    // north-star: hash-stable k-fold CV assignment — a document's fold
    // never changes as the corpus grows (row_number % k can't say that).
    "sample_kfold" -> ((s, dir) =>
      sample.kfold(table(s, dir, "documents"), "doc_id", k = 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("fold"))),

    // north-star: sequence packing by token budget — SHARDED prefix-sum
    // windows (8 hash shards; no single-task global sort).
    "sample_pack" -> ((s, dir) =>
      sample.packSequences(table(s, dir, "documents"), "doc_id",
          text.tokenCount(col("text")).cast("long"), budget = 512, shards = 8)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
        .orderBy(col("pack_id"))),

    // §2.1 datetime ingestion: format round-trip + try-parse fallback
    // chain (ref col.rs:506-545 auto-parse).
    "datetime_parse" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(date_format(col("l_shipdate"), "yyyy/MM/dd").as("s"))
        .distinct()
        .withColumn("parsed", coalesce(
          try_to_timestamp(col("s"), lit("yyyy-MM-dd")),
          try_to_timestamp(col("s"), lit("yyyy/MM/dd"))))
        .select(col("s"), date_format(col("parsed"), "yyyy-MM-dd").as("d"))
        .orderBy(col("s"))),

    // north-star: span-level dedup — maximal token runs whose 5-gram
    // repeats across >= 3 docs (boilerplate/template detection).
    "dedup_repeated_spans" -> ((s, dir) =>
      dedup.repeatedSpans(table(s, dir, "documents"), "text", "doc_id",
          n = 5, minDf = 3)
        .orderBy(col("doc_id"), col("span_start"))),

    // north-star: span REMOVAL — the actionable form of span detection;
    // in-row HOF rebuild, no token-level explode.
    "dedup_spans_removed" -> ((s, dir) =>
      dedup.removeRepeatedSpans(table(s, dir, "documents"), "text", "doc_id",
          n = 5, minDf = 3)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))),

    // north-star: cross-document exact-substring extents (Lee et al.
    // 2022's suffix-array dedup modality as a diagonal-run merge) —
    // every maximal verbatim token run of >= 8 tokens shared between
    // two docs, with positions in BOTH; md5-gram inverted index +
    // gaps-and-islands per pair-diagonal, occurrence-capped.
    "dedup_substring_pairs" -> ((s, dir) =>
      dedup.crossSubstringPairs(table(s, dir, "documents"), "text",
          "doc_id", minLen = 8, maxOcc = 256)
        .orderBy(col("id_a"), col("id_b"), col("a_start"), col("b_start"))),

    // north-star: cross-document duplication RATE — the data-card
    // number (Lee et al. Table-1 shape): per doc, tokens covered by any
    // cross-doc extent on either side of a pair, overlapping extents
    // island-merged so nothing double-counts; exact basis points.
    "dedup_substring_rate" -> ((s, dir) =>
      dedup.crossDupStats(table(s, dir, "documents"), "text", "doc_id",
          minLen = 8, maxOcc = 256)
        .orderBy(col("doc_id"))),

    // north-star: cross-document substring REMOVAL — keep-first
    // excision (lowest doc id keeps its copy); in-row HOF rebuild, no
    // token-level explode on the corpus side.
    "dedup_substring_removed" -> ((s, dir) =>
      dedup.removeCrossDupSubstrings(table(s, dir, "documents"), "text",
          "doc_id", minLen = 8, maxOcc = 256)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))),

    // north-star: EXACT n-gram Jaccard pairs — inverted-index candidate
    // generation (complete pair set above the threshold, unlike MinHash's
    // probabilistic recall), document-frequency cap bounds hot shingles.
    "dedup_jaccard_pairs" -> ((s, dir) =>
      dedup.jaccardPairs(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: containment pairs — the asymmetric near-dup score
    // (excerpt-inside-article) Jaccard structurally misses; no size
    // prune, bounded by the df cap.
    "dedup_containment_pairs" -> ((s, dir) =>
      dedup.containmentPairs(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          (floor(col("containment") * 10000.0 + 0.5) / 10000.0).as("containment"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: deterministic percent sampling — pure scan filter on a
    // portable id hash, no RNG state, reproducible on any engine.
    "sample_det" -> ((s, dir) =>
      sample.deterministicSample(table(s, dir, "documents"), "doc_id", pct = 10)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // north-star flagship: the WHOLE training-data prep pipeline as ONE
    // declarative plan — scrub → exact-dedup → quality gate →
    // leakage-safe split → per-split stats. Catalyst fuses the scan-side
    // stages; the only shuffles are the dedup group and the final tiny agg.
    "pipeline_e2e" -> ((s, dir) => {
      // fence: the 3-regex scrub is referenced by the dedup hash, the
      // quality filter (which references it ~10×), and the token-count
      // aggregate — without the fence, CollapseProject+PushDownPredicates
      // inline the regex chain into every reference (measured 2.3s → 0.9s).
      val cleaned = table(s, dir, "documents")
        .withColumn("clean", graft.functions.NativeExprs.fence(text.cleanText(col("text"))))
      val deduped = dedup.exactDedup(cleaned, "clean", "doc_id")
        .withColumn("_pf", graft.functions.NativeExprs.fence(text.profile(col("clean"))))
      val quality =
        floor(text.qualityScoreOf(col("_pf"), col("clean")) * 10000.0 + 0.5) / 10000.0
      sample.groupSplit(deduped.where(quality >= 0.5), "source",
          trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_pf").getField("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))
    }),

    // flagship #2: the per-language DATA CARD — doc/source counts, token
    // volume, quality profile — ONE scan (the profile kernel runs once
    // per doc behind a fence) and ONE lang-keyed shuffle; every reported
    // number is an exact integer (means in fixed-point units via DIV).
    "pipeline_corpus_report" -> ((s, dir) => {
      val prof = table(s, dir, "documents")
        .withColumn("_pf", graft.functions.NativeExprs.fence(text.profile(col("text"))))
        .select(col("lang"), col("source"), col("n_chars"),
          col("_pf").getField("n_tokens").cast("long").as("n_toks"),
          floor(text.qualityScoreOf(col("_pf"), col("text")) * 10000.0 + 0.5)
            .cast("long").as("q4"))
      prof.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_toks")).as("n_tokens"),
          expr("sum(q4) DIV count(1)").as("mean_quality_4dp"),
          sum((col("q4") >= 5000).cast("long")).as("hi_quality_docs"),
          expr("sum(n_chars) DIV count(1)").as("mean_chars"))
        .orderBy(col("lang"))
    }),

    // north-star: end-to-end drift card — ONE histDriftStream sink
    // snapshot ($1 bins per day) feeds all three readouts (PSI banded
    // verdict, KS sharpest CDF gap, EMD mass moved) against the pinned
    // day-1 reference from the SAME snapshot; grid cut once, finishes
    // grid-sized, day-1 self-scores (0, 0, 0).
    "pipeline_drift_card" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val cents = floor(col("value") * 100.0).cast("long")
      val grid = graft.ops.ckpt.cut(
        EventStream.histDriftStream(ev, cents, binWidth = 100L,
            windowDur = "1 day")
          .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
          .drop("win"))
      val ref = grid.where(col("day") === "2024-01-01")
        .select(col("bin"), col("n"))
      sample.driftCard(ref, grid, Seq("day"), binWidth = 100L)
        .orderBy(col("day"))
    }),

    // north-star: stratified sampling — rebalance a language-skewed
    // corpus with per-stratum keep rates; still a pure scan filter.
    "sample_stratified" -> ((s, dir) =>
      sample.stratifiedSample(table(s, dir, "documents"), "doc_id", "lang",
          pcts = Map("en" -> 10, "zh" -> 60), defaultPct = 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("lang"))),

    // north-star: mixture calibration — downsample to EXPLICIT target
    // proportions (en:de:fr = 5:3:2); rates derived from exact counts,
    // keep decision a pure scan filter. sum_chars pins which rows.
    "sample_mixture" -> ((s, dir) =>
      sample.toMixture(table(s, dir, "documents"), "doc_id", "lang",
          targets = Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("lang"))),

    // north-star: deterministic round-robin interleave of language
    // strata into one global training order — strict total order, pure
    // function of the data.
    "sample_interleave" -> ((s, dir) =>
      sample.interleave(table(s, dir, "documents"), "lang", "doc_id")
        .select(col("doc_id"), col("lang"), col("order_idx"))
        .orderBy(col("doc_id"))),

    // north-star: training-order diversity meter — one number telling
    // whether the order a trainer consumes is the intended one: the
    // round-robin interleave must read near-zero adjacent-same-stratum.
    "sample_order_diversity" -> ((s, dir) =>
      sample.orderDiversity(
        sample.interleave(table(s, dir, "documents"), "lang", "doc_id"),
        "order_idx", "lang")),

    // north-star: weighted (quality-proportional) sampling — the data-
    // mixing primitive; keep probability = min(n_chars/1000, 1), pure
    // scan filter.
    "sample_weighted" -> ((s, dir) =>
      sample.weightedSample(table(s, dir, "documents"), "doc_id",
          least(col("n_chars").cast("double") / lit(1000.0), lit(1.0)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))),

    // north-star: leakage-safe split — band on hash(source) so all docs
    // from one site share a split; n_sources proves no group straddles.
    "sample_group_split" -> ((s, dir) =>
      sample.groupSplit(table(s, dir, "documents"), "source", trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))),

    // north-star: exact dedup, JOIN form — the surviving rows themselves
    // (exactGroups gives the group summary; this keeps the min-id row).
    "dedup_exact_keep" -> ((s, dir) =>
      dedup.exactDedup(table(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))),

    // roadmap fuzzy matching (ref README.md:204-215): edit-distance
    // near-dup pairs, exact-prefix blocked, bounded-head rerank.
    "dedup_fuzzy_pairs" -> ((s, dir) =>
      dedup.fuzzyPairs(table(s, dir, "documents"), "text", "doc_id")
        .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: standalone reciprocal-rank fusion over two bounded
    // deterministic rank lists (longest-docs vs hash-ordered) — exact
    // rational arithmetic from integer ranks.
    "hybrid_rrf_fuse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents")
      // k-bounded single-partition rank windows (see retrieval.scala)
      val one = Window.partitionBy(pmod(col("doc_id"), lit(1)))
      val a = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(50)
        .withColumn("rank",
          row_number().over(one.orderBy(col("n_chars").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val b = docs
        .withColumn("h", hashing.h32(concat(col("doc_id").cast("string"), lit("/rrf"))))
        .orderBy(col("h"), col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(one.orderBy(col("h"), col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      retrieval.rrfFuse(a, b, "doc_id")
        .select(col("doc_id"),
          (floor(col("rrf") * 1000000.0 + 0.5) / 1000000.0).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // north-star: declarative data-quality gate — four constraints over
    // orders, ONE aggregation pass (a per-rule loop would scan 4×);
    // null predicates count as violations (three-valued logic fence).
    "rel_check_rules" -> ((s, dir) =>
      rel.checkRules(table(s, dir, "orders"), Seq(
          "o1_pk_nonnull" -> col("o_orderkey").isNotNull,
          "o2_price_band" -> (col("o_totalprice") > 0.0 && col("o_totalprice") < 400000.0),
          "o3_status_domain" -> col("o_orderstatus").isin("F", "O", "P"),
          "o4_urgent" -> (col("o_orderpriority") === "1-URGENT")))
        .orderBy(col("rule"))),

    // north-star: key-skew diagnostic — heaviest keys with share, skew
    // factor vs the mean key, and the saltedJoin salt count they'd need.
    "rel_skew_probe" -> ((s, dir) =>
      rel.skewProbe(table(s, dir, "documents"), "lang", topN = 5)
        .orderBy(col("cnt").desc, col("key"))),

    // north-star: deterministic dense global row index with NO
    // single-partition window — range exchange (reused across the rank
    // and offset branches) + partition-count-bounded offset cumsum.
    "rel_zip_index" -> ((s, dir) =>
      rel.zipIndex(table(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id")
        .select(col("doc_id"), col("idx"))
        .orderBy(col("doc_id"))),

    // north-star: bloom-prefiltered join — the explicit runtime-filter
    // idiom: a driver-held bloom over the rare orders' keys guards the
    // lineitem scan, so only possibly-matching rows pay the join
    // shuffle; false positives die in the exact join (result identical
    // to the plain join — that IS the oracle).
    "rel_bloom_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_quantity"))
      val ords = table(s, dir, "orders").where(col("o_totalprice") > 480000.0)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      rel.bloomJoin(li, ords, "okey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // north-star: late-interaction (ColBERT MaxSim) top-k — documents as
    // bags of 4×16-dim token vectors (contiguous slices), score =
    // Σ_q max_t dot(q, t); both loops unrolled driver-side into one
    // codegen scan expression, zero shuffles.
    "retrieval_maxsim_topk" -> ((s, dir) =>
      retrieval.maxSimTopK(table(s, dir, "embeddings"), "embedding", "vec_id",
          QTok, tokDim = 16, docDim = 64, k = 10)
        .orderBy(col("maxsim").desc, col("vec_id"))),

    // north-star: deterministic epoch shuffle — reproducible
    // pseudo-random global training order keyed on (seed, id); the
    // position is a pure function of the data, so any shard re-derives
    // independently and epoch 2 is just seed+1.
    "sample_epoch_shuffle" -> ((s, dir) =>
      sample.epochShuffle(
          table(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", seed = 7)
        .select(col("doc_id"), col("epoch_pos"))
        .orderBy(col("doc_id"))),

    // north-star: CDC apply — yesterday's snapshot + today's
    // upsert/delete log = today's table, latest-change-wins per key;
    // the log shuffles (rank-filter idiom), the snapshot joins once.
    // Fixture: lang upserts at ts=2 for doc_id%10, deletes at ts=1 for
    // doc_id%7 — %70 docs carry BOTH, and the later upsert must win.
    "rel_cdc_apply" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val snap = docs.select(col("doc_id"), col("lang"), col("source"))
      val ups = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("xx").as("lang"), col("source"),
          lit(2).as("ts"), lit("upsert").as("op"))
      val dels = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"), col("source"),
          lit(1).as("ts"), lit("delete").as("op"))
      rel.cdcApply(snap, ups.unionByName(dels), "doc_id")
        .orderBy(col("doc_id"))
    }),

    // north-star: ANSI/Delta-style MERGE with all three clauses and SQL
    // precedence (matched DELETE before unconditional UPDATE; INSERT for
    // source-only keys). Source: keys %10==0 / %15==0 carry 'U'/'D'
    // status at half price; shifted keys (+1 of %10==3) mostly insert —
    // the ones landing on real orders exercise update-despite-'I'.
    "rel_merge" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val srcUd = table(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 15 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 15 === 0, lit("D")).otherwise(lit("U"))
            .as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"))
      val srcIns = table(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 3)
        .select((col("o_orderkey") + 1).as("o_orderkey"),
          lit("I").as("o_orderstatus"), col("o_totalprice"))
      rel.merge(o, srcUd.unionByName(srcIns), Seq("o_orderkey"),
          whenMatchedUpdate = Some(lit(true)),
          whenMatchedDelete = Some(col("s.o_orderstatus") === "D"),
          whenNotMatchedInsert = Some(lit(true)))
        .orderBy(col("o_orderkey"))
    }),

    // north-star: referential-integrity audit — lineitems orphaned by a
    // half-missing orders parent; the distinct-key anti-join reduces the
    // parent to thin keys in-scan, and the data card aggregates the
    // orphan rows.
    "rel_fk_orphans" -> ((s, dir) =>
      rel.fkOrphans(table(s, dir, "lineitem"),
          table(s, dir, "orders").where(col("o_orderkey") % 2 === 0),
          Seq("l_orderkey"), Seq("o_orderkey"))
        .agg(count(lit(1)).as("n_orphans"),
          countDistinct(col("l_orderkey")).as("n_orphan_keys"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"))),

    // north-star: POINT-IN-TIME join — each fact picks the SCD2 version
    // valid at its own timestamp (left join: fact_ts=0 predates every
    // version and keeps a null lang — the anti-leakage contract). One
    // key equi-join with the interval as residual predicate.
    "rel_pit_join" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      val v1 = d.select(col("doc_id"), col("lang"), lit(1).as("ts"))
      val v2 = d.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        lit(2).as("ts"))
      val v3 = d.select(col("doc_id"), col("lang"), lit(3).as("ts"))
      val dim = rel.scd2Intervals(v1.unionByName(v2).unionByName(v3),
        "doc_id", "ts", Seq("lang"))
      val facts = d.select(col("doc_id"),
        (col("doc_id") % 4).cast("int").as("fact_ts"))
      rel.pitJoin(facts, dim, "doc_id", "fact_ts")
        .orderBy(col("doc_id"))
    }),

    // north-star: SCD type-2 intervals from a change log — no-op writes
    // collapsed via fingerprint lag, validity closed via lead; every
    // window keyed on the id, no global order anywhere.
    "rel_scd2" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      val v1 = d.select(col("doc_id"), col("lang"), lit(1).as("ts"))
      val v2 = d.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        lit(2).as("ts"))
      val v3 = d.select(col("doc_id"), col("lang"), lit(3).as("ts"))
      rel.scd2Intervals(v1.unionByName(v2).unionByName(v3), "doc_id", "ts",
          Seq("lang"))
        .select(col("doc_id"), col("lang"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
        .orderBy(col("doc_id"), col("valid_from"))
    }),

    // north-star: join-size estimate from Count-Min inner products —
    // the pre-join planner meter; touches depth×width sketch cells,
    // never the fact tables' join.
    "sketch_cm_join_size" -> ((s, dir) => {
      val a = sketch.countMin(table(s, dir, "lineitem"), col("l_orderkey"),
        depth = 4, width = 512)
      val b = sketch.countMin(table(s, dir, "orders"), col("o_orderkey"),
        depth = 4, width = 512)
      sketch.cmJoinSize(a, b, depth = 4, width = 512)
    }),

    // north-star: heavy hitters via the native Misra–Gries mergeable
    // aggregate — constant capacity-entry state per partial buffer, so
    // the exchange carries one small map per map task instead of the
    // item universe. capacity 256 ≥ the 150 distinct users ⇒ the exact
    // regime, where MG output equals the exact group-count top-N the
    // oracle computes (the N/(k+1) undercount bound beyond that regime
    // is SketchSpec's job — DuckDB has no MG to compare against).
    "sketch_heavyhitters" -> ((s, dir) =>
      // capacity 4096 >= distinct users at EVERY test sf (sf0.1 has
      // 1500): the oracle is an exact GROUP BY, and MG only equals it —
      // independent of Spark's partial-merge order — in the exact
      // (no-eviction) regime. The round-9 sf0.1 sweep caught capacity
      // 256 silently leaving that regime above sf0.01. The eviction
      // regime stays exercised where exactness isn't hashed: SketchSpec
      // error-bound asserts + the 10x/30x rehearsals at capacity 256.
      sketch.heavyHitters(table(s, dir, "events"), col("user_id"),
        capacity = 4096, topN = 20)),

    // north-star: per-group heavy hitters — one MG summary per group;
    // the per-group top-N is a row-local slice of the already-sorted
    // summary, no second shuffle.
    "sketch_heavyhitters_by" -> ((s, dir) =>
      sketch.heavyHittersBy(table(s, dir, "events"), Seq("event_type"),
          col("user_id"), capacity = 4096, topN = 5)
        .orderBy(col("event_type"), col("est_count").desc, col("item"))),

    // north-star: WEIGHTED heavy hitters — top users by total event
    // VALUE (micros, exact integer weights), not event count. Exact
    // regime again (capacity ≥ distinct users), so MG totals equal the
    // exact group sums.
    "sketch_heavyhitters_weighted" -> ((s, dir) =>
      sketch.heavyHittersWeighted(
        table(s, dir, "events").where(col("value").isNotNull),
        col("user_id"), floor(col("value") * 1000000.0).cast("long"),
        capacity = 4096, topN = 20)),

    // north-star: trending items — MG heavy hitters composed with
    // event-time tumbling windows (top users per hour). The same plan
    // runs under Structured Streaming (EventStreamSpec pins it on a
    // MemoryStream): windowed MG state is capacity-bounded per open
    // window, the canonical "trending now" shape at firehose scale.
    "events_trending_hh" -> ((s, dir) =>
      sketch.heavyHittersBy(
          events(s, dir).withColumn("wstart",
            date_format(window(col("ts"), "1 hour").getField("start"),
              "yyyy-MM-dd HH:mm:ss")),
          // 4096 like the other oracle-checked MG queries: exact regime
          // must hold per window at every test sf, not just sf0.01
          Seq("wstart"), col("user_id"), capacity = 4096, topN = 3)
        .orderBy(col("wstart"), col("est_count").desc, col("item"))),

    // north-star: long-form MaxSim over a token TABLE (variable-length
    // multi-vector docs) — result-identical to the unrolled fast path
    // on the sliced layout, which is exactly what this fixture checks
    // end-to-end against the same oracle.
    "retrieval_maxsim_long" -> ((s, dir) => {
      val toks = table(s, dir, "embeddings").select(col("vec_id"),
        explode(array((0 until 4).map(i =>
          slice(vectors.asDoubleArray(col("embedding")), i * 16 + 1, 16)): _*))
          .as("tok"))
      retrieval.maxSimLong(toks, "vec_id", "tok", QTok, k = 10)
        .orderBy(col("maxsim").desc, col("vec_id"))
    }),

    // north-star: incremental materialized-aggregate maintenance — the
    // rollup refreshes from the CDC log alone (signed deltas + one thin
    // full-outer merge); the fact table is never rescanned.
    "rel_incremental_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val base = li.where(col("l_orderkey") % 10 =!= 0)
      val agg0 = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_l_quantity"))
      val inserts = li.where(col("l_orderkey") % 10 === 0)
        .select(col("l_returnflag"), col("l_quantity"), lit("insert").as("op"))
      val deletes = base.where(col("l_partkey") % 5 === 0)
        .select(col("l_returnflag"), col("l_quantity"), lit("delete").as("op"))
      rel.incrementalAgg(agg0, inserts.unionByName(deletes),
          Seq("l_returnflag"), "l_quantity")
        .orderBy(col("l_returnflag"))
    }),

    // north-star: TF-IDF cosine near-dup pairs — WEIGHTED similarity
    // (rare shared vocabulary scores high) over the inverted-index pair
    // engine; every cross-row sum is an exact integer (fixed-point
    // discipline), so the score is engine-reproducible.
    "dedup_tfidf_pairs" -> ((s, dir) =>
      dedup.tfidfCosinePairs(table(s, dir, "documents"), "text", "doc_id",
          threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // north-star: token-balanced shard assignment — serpentine greedy
    // deal by size rank (zipIndex over a (-size, id) struct key, range
    // exchange, no single-partition window); per-shard totals land
    // within one document of each other.
    "sample_balanced_shards" -> ((s, dir) =>
      sample.balancedShards(
          table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars").cast("long"), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("shard"))),

    // north-star: batched MaxSim serving — two multi-token queries in
    // ONE corpus scan, per-query top-k via WindowGroupLimit heaps.
    "retrieval_maxsim_batch" -> ((s, dir) =>
      retrieval.maxSimBatch(table(s, dir, "embeddings"), "embedding", "vec_id",
          Seq(0L -> QTok, 1L -> QTok2), tokDim = 16, docDim = 64, k = 5)
        .orderBy(col("query_id"), col("rnk"))),

    // north-star: ingest screening against the PERSISTED signature index
    // — incrementalNearDups semantics (identical banding + rerank, same
    // oracle), but the corpus side is the bucket-partitioned on-disk
    // layout: the batch's band buckets become a literal partition filter
    // on the index scan, corpus text never read.
    "dedup_index_screen" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      dedup.screenAgainstIndex(docs.where(col("doc_id") >= 400),
          sigIndex(s, dir), "text", "doc_id", threshold = 0.5)
        .select(col("corpus_id"), col("new_id"),
          (floor(col("jacc") * 10000.0 + 0.5) / 10000.0).as("jacc"))
        .orderBy(col("corpus_id"), col("new_id"))
    }),

    // ---- round 10: annotation, preference, readability, series, ----
    // ---- clustering-quality families                             ----

    // north-star: Flesch reading-ease gate — row-local regex counts +
    // one double expression; sentences manufactured deterministically
    // (' table ' -> '. ') since the synthetic corpus is unpunctuated.
    "text_readability" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          text.readability(regexp_replace(col("text"), " table ", ". "))
            .as("r"))
        .select(col("doc_id"), col("r.n_words").as("n_words"),
          col("r.n_sentences").as("n_sentences"),
          col("r.n_syllables").as("n_syllables"),
          col("r.flesch").as("flesch"))
        .orderBy(col("doc_id"))),

    // north-star: majority-vote label adjudication — items synthesized
    // as event_id % 200 (≈50 votes each), label = event_type; two
    // map-side-combined aggregates, lex-min tie-break, no window.
    "rel_majority_label" -> ((s, dir) =>
      rel.majorityLabel(
        table(s, dir, "events")
          .select((col("event_id") % 200).as("item"), col("event_type")),
        "item", "event_type")
        .orderBy(col("item"))),

    // north-star: DPO preference-pair construction — per user (the
    // prompt-group stand-in), best-vs-worst scored event with margin;
    // ONE group aggregate, struct-extrema tie-breaks, ties dropped.
    "sample_preference_pairs" -> ((s, dir) =>
      sample.preferencePairs(table(s, dir, "events"),
          "user_id", "event_id", "value")
        .orderBy(col("user_id"))),

    // north-star: simplified silhouette over the labeled embeddings —
    // clustering-quality meter; centroids baked as literals into one
    // scan, per-label mean via exact fixed-point longs.
    "vec_silhouette" -> ((s, dir) =>
      ann.silhouetteSimplified(table(s, dir, "embeddings"))
        .orderBy(col("label"))),

    // north-star: autocorrelation of the hourly event-count series per
    // type — seasonality diagnostic over a DENSIFIED domain-bounded
    // series; exact long sufficient statistics, one double combine.
    "events_acf" -> ((s, dir) =>
      EventStream.autocorr(events(s, dir), bucketSec = 3600,
          maxLag = 3)
        .orderBy(col("event_type"), col("lag"))),

    // north-star: sliding two-sample change-point statistic over the
    // same densified series — mean-shift detection with exact long
    // window sums; full-window buckets only.
    "events_changepoint" -> ((s, dir) =>
      EventStream.changepoints(events(s, dir), bucketSec = 3600, w = 6)
        .orderBy(col("event_type"), col("t"))),

    // north-star: Lee-et-al-style n-gram novelty — fraction of each
    // doc's distinct 5-grams first seen in an earlier doc; planted
    // copies (doc_id % 97 -> +1e6) must report seen_frac = 1. No
    // gram-keyed join-back: seen = n_grams - owned first occurrences.
    "dedup_ngram_novelty" -> ((s, dir) => {
      val base = table(s, dir, "documents")
      val planted = base.select(col("doc_id"), col("text")).unionByName(
        base.where(col("doc_id") % 97 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      dedup.ngramNovelty(planted, "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    }),

    // north-star: corpus boilerplate audit — the k most-duplicated word
    // trigrams by document frequency; one gram explode, one combine-
    // collapsed aggregate, TakeOrdered.
    "text_top_ngrams" -> ((s, dir) =>
      dedup.topNgrams(table(s, dir, "documents"), "text", "doc_id",
        n = 3, k = 20)),

    // north-star: link prediction over the kNN graph — non-adjacent pairs
    // ranked by common-neighbor count and the fixed-point resource-
    // allocation index; the "dup cluster the pair detector missed"
    // candidate generator.
    "graph_linkpred" -> ((s, dir) =>
      graft.ops.graph.linkPredict(s.read.parquet(knnEdges(s, dir)))
        .orderBy(col("a"), col("b"))),

    // north-star: HITS hubs/authorities on the directed kNN graph with
    // deterministic integer rescaling — hub = doc whose neighborhood
    // covers the corpus, authority = doc many neighborhoods agree on.
    "graph_hits" -> ((s, dir) =>
      graft.ops.graph.hits(s.read.parquet(knnEdges(s, dir)), iters = 2)
        .orderBy(col("id"))),

    // north-star: bipartite co-occurrence projection — the co-purchase
    // graph from order->part membership, whole-basket capped, pairs
    // appearing in >= 2 baskets.
    "graph_bipartite" -> ((s, dir) =>
      graft.ops.graph.bipartiteProject(table(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasket = 1000L, minCount = 2L)
        .orderBy(col("item_a"), col("item_b"))),

    // north-star: encoding-quality screen — replacement/control/mojibake
    // counts per doc over a deterministically dirtied corpus (the clean
    // synthetic corpus can't exercise the counters on its own).
    "text_encoding_quality" -> ((s, dir) => {
      val d = col("doc_id")
      val dirtied = concat(col("text"),
        when(d % 7 === 0, lit(" caf\u00C3\u00A9 \u00E2\u20AC\u0153x"))
          .otherwise(lit("")),
        when(d % 11 === 0, lit(" \uFFFD\uFFFD")).otherwise(lit("")),
        when(d % 13 === 0, lit(" a\u0007b")).otherwise(lit("")))
      table(s, dir, "documents")
        .select(d, text.encodingQuality(dirtied).as("q"))
        .select(d, col("q.n_repl"), col("q.n_ctrl"), col("q.n_moji"),
          col("q.enc_clean"))
        .orderBy(d)
    }),

    // north-star: DoReMi-lite domain reweighting — integer mixture plan
    // from observed token mass to literal target shares, epoch-capped,
    // with realized shares over the effective stream; "srcX" is a
    // deliberately absent domain (full-join zero row).
    "sample_domain_reweight" -> ((s, dir) =>
      sample.domainReweight(table(s, dir, "documents"), "source",
          col("n_chars"),
          Map("src0" -> 2500L, "src1" -> 2000L, "src2" -> 1500L,
            "src3" -> 1000L, "src4" -> 1000L, "src5" -> 1000L,
            "src6" -> 500L, "src7" -> 500L, "srcX" -> 0L),
          capBp = 30000L)
        .orderBy(col("source"))),

    // north-star: freshness-decay selection — quality weight halved per
    // 7-day half-life from a PINNED as-of date, top-5 per event type;
    // the recency-tiered curation order.
    "sample_freshness" -> ((s, dir) =>
      sample.freshnessTopK(events(s, dir), "event_type", "event_id", "ts",
          floor(col("value") * 100).cast("long"),
          asOf = "2024-01-31", halfLifeDays = 7, k = 5)
        .orderBy(col("event_type"), col("rnk"))),

    // north-star: provenance decontamination — drop train docs whose URL
    // host appears among the held-out slice's hosts (doc_id % 530 == 0
    // is the "benchmark scrape"); hosts synthesized over a 37-residue
    // space so the screen is selective but non-trivial at every SF, with
    // casing/www/port noise the canonicalizer must fold.
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
    }),

    // north-star: chunk→doc embedding rollup — fixed-point exact mean
    // pooling (vec_id % 100 stands in for the doc of each chunk); the
    // long-doc coarse-index builder. Output is FLATTENED to one scalar
    // row per (doc, component) — the driver's diff harness lexsorts all
    // columns and cannot hash an array<double> cell (the round-10 trap).
    "vec_chunk_pool" -> ((s, dir) =>
      ann.poolEmbeddings(
          table(s, dir, "embeddings")
            .withColumn("doc_id", col("vec_id") % 100),
          "doc_id")
        .select(col("doc_id"), col("n_chunks"),
          posexplode(col("pooled")).as(Seq("pos", "v")))
        .orderBy(col("doc_id"), col("pos"))),

    // north-star: conversion-latency histogram — first view → first
    // subsequent purchase per user, hour buckets; the funnel's "how
    // long" companion.
    "events_time_to_convert" -> ((s, dir) =>
      EventStream.timeToConvert(events(s, dir), "view", "purchase",
          bucketSec = 3600L)
        .orderBy(col("bucket"))),

    // north-star: IVF cluster-balance meter — vectors per centroid with
    // share and load (10000 bp = perfectly even); the partition-pruning
    // health check before trusting nprobe math.
    "ann_cluster_balance" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val counts = ann.ivfAssign(emb, ann.seedCentroids(emb, 16))
        .groupBy(col("cluster_id").cast("long").as("cluster_id"))
        .agg(count(lit(1)).as("n"))
      val w = graft.ops.windows.boundedGlobal("k-clusters", col("cluster_id"))
      counts
        .withColumn("_total", sum(col("n")).over(w))
        .withColumn("_k", count(lit(1)).over(w))
        .select(col("cluster_id"), col("n"),
          expr("n * 10000 DIV _total").as("share_bp"),
          expr("n * _k * 10000 DIV _total").as("load_bp"))
        .orderBy(col("cluster_id"))
    }),

    // north-star: per-node local clustering coefficient over the kNN
    // graph — exact integer basis points; a high-degree LOW-cc node is
    // a boilerplate hub stitching unrelated docs, a high-cc node sits
    // inside a genuine duplicate clique. Same degree-oriented wedge
    // plan as graph_triangles, credited to all three corners.
    "graph_clustering" -> ((s, dir) =>
      graft.ops.graph.clusteringCoef(s.read.parquet(knnEdges(s, dir)))
        .orderBy(col("id"))),

    // north-star: k-anonymity / l-diversity privacy screen — equivalence
    // classes of the (nation, segment) quasi-identifiers with account
    // balance as the sensitive attribute; ONE hash agg at any scale.
    "rel_k_anonymity" -> ((s, dir) =>
      rel.kAnonymity(table(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 8)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // north-star: Fleiss' kappa inter-annotator agreement over the same
    // ratings shaping as rel_majority_label — one exact-integer row;
    // kappa surfaced as num/den (signed integer division is an engine
    // trap: Spark DIV truncates, DuckDB // floors).
    "rel_fleiss_kappa" -> ((s, dir) =>
      rel.fleissKappa(
        table(s, dir, "events")
          .select((col("event_id") % 200).as("item"), col("user_id"),
            col("event_type")),
        "item", "user_id", "event_type")),

    // north-star: per-type OLS volume trend over hour buckets — exact
    // integer slope as a num/den pair; the growing-or-dying meter a
    // crawl scheduler consumes.
    "events_trend" -> ((s, dir) =>
      EventStream.trend(events(s, dir), bucketSec = 3600L)
        .orderBy(col("series"))),

    // north-star: CUSUM changepoint monitor — sequential drift the
    // snapshot meters can't catch; exact n_ref-scaled recurrence as a
    // bounded in-plan HOF fold over the day grid (corpus crosses the
    // wire as <= 30 rows).
    "events_cusum" -> ((s, dir) =>
      EventStream.cusum(events(s, dir), bucketSec = 86400L, refN = 7,
          slack = 0L, threshold = 100L)
        .orderBy(col("bucket"))),

    // north-star: CUPED experiment readout — per-variant exact sums of
    // pre-period X / post-period Y plus the pooled theta as num/den;
    // the variance-reduced A/B number assembles downstream in floats.
    "events_cuped" -> ((s, dir) =>
      EventStream.cuped(events(s, dir), cutoff = "2024-01-15",
          variant = col("user_id") % 2)
        .orderBy(col("variant"))),

    // north-star: top entry paths — each user's first 3 events joined
    // into a path string, counted; deterministic (ts, event_id) order.
    "events_top_paths" -> ((s, dir) =>
      EventStream.topPaths(events(s, dir), n = 3, topK = 20)),

    // north-star: exact DAU / rolling-7 actives / stickiness — the
    // rolling distinct is a bounded ×7 fan-out of the (user, day) set,
    // never a per-day re-scan.
    "events_active_users" -> ((s, dir) =>
      EventStream.activeUsers(events(s, dir), windowDays = 7)
        .orderBy(col("day"))),

    // north-star: event concentration — top-10 heaviest users' share of
    // all events in basis points, with the cumulative curve.
    "events_concentration" -> ((s, dir) =>
      EventStream.concentration(events(s, dir), k = 10)
        .orderBy(col("rnk"))),

    // north-star: sample-ratio-mismatch check — distinct users per
    // variant vs uniform, chi-square as exact num/den; the broken-
    // randomizer guard run before any experiment readout.
    "events_srm" -> ((s, dir) =>
      EventStream.srm(events(s, dir), variant = col("user_id") % 2)),

    // north-star: per-doc OOV rate against the corpus's own top-200
    // vocabulary — the will-the-tokenizer-cope screen; vocab broadcasts,
    // the token stream never shuffles for membership.
    "text_oov_rate" -> ((s, dir) =>
      text.oovStats(table(s, dir, "documents"), "text", "doc_id",
          topN = 200)
        .orderBy(col("doc_id"))),

    // north-star: split-leakage meter — the production minhash pair
    // detector crossed with the leakage-safe source split; any
    // crosses=1 row means a near-duplicate straddles the train/test
    // fence and held-out metrics measure memorization.
    "sample_split_leakage" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.splitLeakage(
          dedup.minhashNearDupPairs(docs, "text", "doc_id", threshold = 0.5),
          sample.groupSplit(docs, "source", trainPct = 80, valPct = 10),
          "doc_id")
        .orderBy(col("split_a"), col("split_b"))
    }),

    // north-star: connected components of the 1-NN graph (each vector's
    // single nearest neighbor) — NN-chain micro-clusters, surfaced as a
    // component-size table; the CC machinery is the audited large-star/
    // small-star loop dedup clustering runs.
    "graph_components" -> ((s, dir) => {
      val edges = ann.knnGraph(table(s, dir, "embeddings"), k = 1, nbits = 6)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      dedup.connectedComponents(edges)
        .groupBy(col("rep").as("component"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("component"))
    }),

    // north-star: per-dimension embedding health — dead/collapsed-dim
    // screen with exact fixed-point sums; variance quotient is the one
    // division and its numerator is non-negative by Cauchy-Schwarz.
    "vec_dim_stats" -> ((s, dir) =>
      ann.dimStats(table(s, dir, "embeddings"))
        .orderBy(col("dim"))),

    // north-star: day-of-week × hour-of-day traffic profile — pure
    // integer calendar arithmetic, basis-point shares over the ≤168-row
    // grid.
    "events_seasonality" -> ((s, dir) =>
      EventStream.seasonality(events(s, dir))
        .orderBy(col("dow"), col("hod"))),

    // north-star: Newman modularity of the label-propagation partition
    // over the kNN graph — exact integer numerators (Q = Σ q_num / 4m²);
    // the did-clustering-actually-find-structure meter.
    "graph_modularity" -> ((s, dir) => {
      val edges = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.modularity(
          edges, graft.ops.graph.labelPropagation(edges, iters = 2))
        .orderBy(col("label"))
    }),

    // north-star: bot-regularity signals — per-user inter-event gap
    // moments and coefficient of variation; scripted clients show LOW cv
    // at high rate. The pre-training interaction-log hygiene filter.
    "events_bot_score" -> ((s, dir) =>
      EventStream.botSignals(events(s, dir), minGaps = 10)
        .orderBy(col("user_id"))),

    // north-star: last-touch attribution — each purchase credited to the
    // user's latest prior click's campaign (props.k % 10), organic = -1;
    // revenue in exact integer cents. One user-keyed asof shuffle.
    "events_attribution" -> ((s, dir) =>
      EventStream.lastTouchAttribution(events(s, dir), "purchase", "click",
          get_json_object(col("props"), "$.k").cast("long") % 10)
        .orderBy(col("campaign"))),

    // north-star: conversation assembly — per-user chronological
    // transcript (first 16 turns) with span stats; the interaction-log →
    // training-dialogue primitive.
    "events_dialogs" -> ((s, dir) =>
      EventStream.assembleDialogs(events(s, dir), maxTurns = 16)
        .select(col("user_id"), col("n_turns"),
          unix_micros(col("first_ts")).as("first_us"),
          unix_micros(col("last_ts")).as("last_us"),
          col("span_sec"), col("transcript"))
        .orderBy(col("user_id"))),

    // north-star: ROC AUC of a cosine scorer against binary labels —
    // tie-corrected Mann-Whitney rank-sum as exact num/den integers.
    // Scores quantize to a 4-dp grid first, so the one cumulative
    // window runs over a ≤20k-row domain, never the corpus.
    "eval_auc" -> ((s, dir) =>
      evals.aucRank(table(s, dir, "embeddings"),
        scoreQ4(col("embedding"), Q1), col("label") < 5)),

    // north-star: operating-point sweep — exact confusion counts and
    // ppm precision/recall/F1 at a literal threshold grid; one scan,
    // map-side combine absorbs the ×|grid| fan-out.
    "eval_confusion" -> ((s, dir) =>
      evals.confusionGrid(table(s, dir, "embeddings"),
          scoreQ4(col("embedding"), Q1), col("label") < 5, EvalThresholds)
        .orderBy(col("threshold"))),

    // north-star: NDCG@10 for two query vectors with graded relevance —
    // integer discount table shared driver-side with the oracle; both
    // the actual and ideal top-10 are WindowGroupLimit heap shapes.
    "eval_ndcg" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel2: Int, rel1: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          when(col("label") === rel2, 2L)
            .when(col("label") === rel1, 1L).otherwise(0L).as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.ndcgAtK(run(0L, Q1, 3, 7).unionAll(run(1L, Q2, 5, 1)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    }),

    // north-star: log-loss + Brier of a linearly calibrated cosine
    // scorer — per-row terms quantize before summing, so both sums are
    // exact integers; clamped ppm probabilities keep ln finite.
    "eval_logloss" -> ((s, dir) => {
      val sq4 = scoreQ4(col("embedding"), Q1)
      evals.loglossBrier(table(s, dir, "embeddings"),
        (sq4 + lit(10000L)) * lit(50L), col("label") < 5)
    }),

    // north-star: Kaplan-Meier signup→purchase survival with censoring
    // at study end — survival surfaced in exact-integer log space; the
    // one cumulative window runs over day buckets, never users.
    "events_kaplan_meier" -> ((s, dir) =>
      EventStream.kaplanMeier(events(s, dir), "signup", "purchase",
          bucketSec = 86400L)
        .orderBy(col("t"))),

    // north-star: difference-in-differences 2×2 readout — exact
    // per-cell user counts and cent sums, one rounded interaction term.
    "events_did" -> ((s, dir) =>
      EventStream.diffInDiff(events(s, dir), cutoff = "2024-01-15",
        variant = col("user_id") % 2)),

    // north-star: dense gap-filled hourly value series with forward
    // fill — the equal-spacing primitive downstream forecasters need;
    // fills are flagged, never silent.
    "events_gapfill" -> ((s, dir) =>
      EventStream.gapFill(events(s, dir), bucketSec = 3600L)
        .orderBy(col("series"), col("t"))),

    // north-star: seasonal-naive forecast backtest vs the lag-1
    // persistence baseline — exact integer MAE pair per series plus the
    // ppm skill quotient; the is-seasonality-real meter.
    "events_snaive" -> ((s, dir) =>
      EventStream.snaiveBacktest(events(s, dir), bucketSec = 3600,
          season = 168)
        .orderBy(col("series"))),

    // north-star: Theil-Sen robust trend — the median pairwise slope
    // per daily series, surfaced as the selected pair's exact rational;
    // the pair stage is time-range-bounded, not data-bounded.
    "events_theilsen" -> ((s, dir) =>
      EventStream.theilSen(events(s, dir), bucketSec = 86400)
        .orderBy(col("series"))),

    // north-star: one-level a-priori association rules over order
    // baskets of part brands — exact support counts, ppm confidence
    // and lift; infrequent items pruned before the pair stage.
    "rel_assoc_rules" -> ((s, dir) =>
      rel.assocRules(
          table(s, dir, "lineitem").join(table(s, dir, "part"),
            col("l_partkey") === col("p_partkey")),
          "l_orderkey", "p_brand", minSupport = 150L)
        .orderBy(col("ante"), col("cons"))),

    // north-star: leakage-free out-of-fold target encoding of order
    // priority against order value — exact cents sums per (cat, fold),
    // one documented float quotient.
    "rel_target_encode" -> ((s, dir) =>
      rel.targetEncode(table(s, dir, "orders"), "o_orderpriority",
          "o_totalprice", "o_orderkey", k = 5)
        .orderBy(col("o_orderpriority"), col("fold"))),

    // north-star: RFM segmentation with grid-quantile scores — ties
    // share scores, every grid is value-bounded, the score maps
    // broadcast back onto the customer scan.
    "rel_rfm" -> ((s, dir) =>
      rel.rfm(table(s, dir, "orders"), "o_custkey", "o_orderdate",
          "o_totalprice", buckets = 5, binCents = 100000L)
        .orderBy(col("o_custkey"))),

    // north-star: multi-source BFS hop rings over the symmetrized kNN
    // graph — exact integer distances, seeds as bounded literals, one
    // thin join per round.
    "graph_bfs" -> ((s, dir) => {
      val e = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.bfsDistances(
          e.union(e.select(col("dst").as("src"), col("src").as("dst"))),
          seeds = Seq(0L, 1L, 2L, 3L, 4L), maxHops = 3)
        .orderBy(col("id"))
    }),

    // north-star: hashing-trick featurization — vocabulary-free sparse
    // vectors, sign-cancelled collisions, one (doc, bucket) aggregate.
    "text_feature_hash" -> ((s, dir) =>
      graft.ops.text.featureHash(
          table(s, dir, "documents").where(col("doc_id") < 50),
          "text", "doc_id", nBuckets = 256)
        .orderBy(col("doc_id"), col("bucket"))),

    // north-star: exact fixed-point Gram matrix of the embedding corpus
    // — the one-pass second-moment substrate for PCA and anisotropy
    // reads; every entry an exact integer.
    "vec_gram" -> ((s, dir) =>
      graft.ops.linalg.gram(table(s, dir, "embeddings"), "embedding",
          dim = 64, q = 10000L)
        .orderBy(col("i"), col("j"))),

    // north-star: embedding anisotropy — exact off-diagonal vs trace
    // mass of the Gram matrix; the is-cosine-trustworthy-here screen.
    "vec_anisotropy" -> ((s, dir) =>
      graft.ops.linalg.anisotropy(
        graft.ops.linalg.gram(table(s, dir, "embeddings"), "embedding",
          dim = 64, q = 10000L))),

    // north-star: embedding-corpus drift (diagonal FID family) between
    // the even- and odd-label halves — two d-row moment grids, linear
    // MMD² + per-dim variance gap; the corpora never move.
    "ann_embed_drift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.ops.linalg.embedDrift(
        graft.ops.linalg.momentGrid(
          emb.where(col("label") % 2 === 0), "embedding", 64),
        graft.ops.linalg.momentGrid(
          emb.where(col("label") % 2 === 1), "embedding", 64))
    }),

    // north-star: degree assortativity of the kNN graph — hub-to-hub
    // vs hub-to-leaf wiring as one exact-moment correlation.
    "graph_assortativity" -> ((s, dir) =>
      graft.ops.graph.assortativity(s.read.parquet(knnEdges(s, dir)))),

    // north-star: mergeable moments sketch — exact power sums per
    // event type plus the quantized skewness read.
    "sketch_moments" -> ((s, dir) =>
      graft.ops.sketch.moments(events(s, dir), "value",
          Seq("event_type"), q = 1.0)
        .orderBy(col("event_type"))),

    // north-star: minimum-detectable-effect sizing readout for the
    // user_id%2 split — exact per-user cents moments, one documented
    // float formula.
    "events_mde" -> ((s, dir) =>
      EventStream.mdeReadout(events(s, dir), variant = col("user_id") % 2)),

    // north-star: deterministic Poisson bootstrap — 40 hash-seeded
    // resamples of the mean event value in ONE pass; error bars with
    // no data copies and no RNG state.
    "events_bootstrap_ci" -> ((s, dir) =>
      sample.bootstrapCI(events(s, dir), "value", "event_id", reps = 40)
        .orderBy(col("rep"))),

    // north-star: in-engine linear-probe training — 2 rounds of exact
    // integer full-batch GD on the first 8 embedding dims vs the
    // label>=5 target; the whole run engine-reproducible bit-for-bit.
    "vec_linear_probe" -> ((s, dir) =>
      graft.ops.linalg.linearProbeTrain(table(s, dir, "embeddings"),
          "embedding", col("label") >= 5, dims = 8, iters = 2, q = 100L)
        .orderBy(col("j"))),

    // north-star: weekly-cohort LTV triangle — exact cents accumulated
    // by cohort age, cohort-keyed window over domain-bounded cells.
    "events_cohort_ltv" -> ((s, dir) =>
      EventStream.cohortLtv(events(s, dir), bucketSec = 604800L)
        .orderBy(col("cohort"), col("age"))),

    // TPC-H Q6 shape (forecast revenue change): pure scan + one global
    // aggregate; every predicate reaches PushedFilters, revenue is an
    // exact integer (cents x rounded discount-hundredths).
    "rel_tpch_q6" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_quantity") < 24.0)
        .select((floor(col("l_extendedprice") * 100.0).cast("long")
          * floor(col("l_discount") * 100.0 + 0.5).cast("long")).as("_r"),
          floor(col("l_discount") * 100.0 + 0.5).cast("long").as("_dq"))
        .where(col("_dq").between(5L, 7L))
        .agg(count(lit(1)).as("n_rows"), sum(col("_r")).as("revenue_qc"))),

    // TPC-H Q3 shape (unshipped-orders revenue): segment-filtered
    // customer broadcast onto orders, lineitem joined on the order key,
    // top-10 by exact revenue via TakeOrderedAndProject.
    "rel_tpch_q3" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      table(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * 100.0).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100.0 + 0.5).cast("long")))
          .as("revenue_qc"))
        .orderBy(col("revenue_qc").desc, col("l_orderkey"))
        .limit(10)
    }),

    // north-star: cross-corpus novelty — gate a candidate slice against
    // the existing corpus: reference collapses to its distinct gram-hash
    // set once, candidates probe it with one semi-join.
    "dedup_cross_novelty" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      dedup.crossNovelty(
          docs.where(col("doc_id") % 5 === 0),
          docs.where(col("doc_id") % 5 =!= 0),
          "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    }),

    // north-star: per-community structure readout over the label-prop
    // assignment — size, exact internal edges, ppm density.
    "graph_community_stats" -> ((s, dir) => {
      val e = s.read.parquet(knnEdges(s, dir))
      graft.ops.graph.communityStats(e,
          graft.ops.graph.labelPropagation(e, iters = 2))
        .orderBy(col("label"))
    }),

    // north-star: the same novelty gate against the PERSISTED gram-set
    // artifact — reference never rescanned; value-identical to the live
    // build, so it shares dedup_cross_novelty's oracle SQL.
    "dedup_novelty_indexed" -> ((s, dir) =>
      dedup.crossNoveltyIndexed(
          table(s, dir, "documents").where(col("doc_id") % 5 === 0),
          gramSet(s, dir), "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))),

    // north-star: reciprocal rank @10 per query — the first-relevant
    // position as an exact ppm; average downstream for MRR.
    "eval_mrr" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          (col("label") === rel).cast("long").as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.mrrAtK(run(0L, Q1, 3).unionAll(run(1L, Q2, 5)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    }),

    // north-star: precision/recall @10 per query — exact ppm set
    // overlap; completes the rank-eval family (MRR, NDCG, AUC).
    "eval_pr_at_k" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          (col("label") === rel).cast("long").as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.precisionRecallAtK(run(0L, Q1, 3).unionAll(run(1L, Q2, 5)),
          col("qid"), col("rel"), col("s"), col("vec_id"), k = 10)
        .orderBy(col("qid"))
    }),

    // north-star: generation evals — ROUGE-2 P/R/F1 over the lossy-
    // candidate fixture; clip counts are exact longs, quotients ppm.
    "eval_rouge2" -> ((s, dir) =>
      evals.ngramOverlap(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), n = 2)
        .orderBy(col("doc_id"))),

    // north-star: ROUGE-L — in-order LCS F-measure, one compiled O(32²)
    // DP kernel per row, capped token prefixes on both sides, zero
    // shuffle; the oracle replays the DP as a recursive CTE.
    "eval_rouge_l" -> ((s, dir) =>
      evals.rougeL(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), maxToks = 32)
        .orderBy(col("doc_id"))),

    // north-star: token-level WER — the edit-distance DP kernel at word
    // grain (eval_edit is the char meter); capped prefixes, zero
    // shuffle; the oracle replays the DP via the prefix-min identity.
    "eval_wer" -> ((s, dir) =>
      evals.wer(genPairs(s, dir), col("doc_id"), col("cand"),
          col("ref"), maxToks = 32)
        .orderBy(col("doc_id"))),

    // north-star: segment BLEU-4, surfaced in LOG space (exp() is a
    // libm call whose last ulp is not portable across engines; gate in
    // log space, the lmQualityFilter precedent). Per-n ln terms are
    // 1e-6-quantized longs, the BP term an exact rational.
    "eval_bleu" -> ((s, dir) =>
      evals.bleu(genPairs(s, dir), col("doc_id"), col("cand"), col("ref"),
          maxN = 4)
        .orderBy(col("doc_id"))),

    // north-star: chrF (character 1..4-gram F-2) — the tokenizer-free
    // generation meter; same clipped-overlap machinery at char grain.
    "eval_chrf" -> ((s, dir) =>
      evals.chrF(genPairs(s, dir), col("doc_id"), col("cand"), col("ref"),
          maxN = 4, beta = 2)
        .orderBy(col("doc_id"))),

    // north-star: edit similarity on the ASCII projection — DuckDB's
    // levenshtein is BYTE-based while Spark's is char-based; stripping
    // non-ASCII makes byte == char so the engines agree exactly.
    "eval_edit" -> ((s, dir) => {
      val ascii = (c: Column) => regexp_replace(c, "[^ -~]", "")
      genPairs(s, dir)
        // levenshtein is O(|c|·|r|) PER ROW — the corpus scan's natural
        // splits carry the parallelism at scale, but this small fixture
        // reads as one file split, so spread the CPU-heavy rows by pair
        // id (a keyed exchange of ~300-byte rows, negligible vs the
        // quadratic row cost it parallelizes). The EXPLICIT partition
        // count matters: byte-sized AQE coalescing would merge the tiny
        // shuffle back into one CPU-bound task.
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), ascii(col("cand")).as("_c"),
          ascii(col("ref")).as("_r"))
        .select(col("doc_id"),
          levenshtein(col("_c"), col("_r")).cast("long").as("dist"),
          greatest(length(col("_c")), length(col("_r"))).cast("long")
            .as("_m"))
        .select(col("doc_id"), col("dist"),
          when(col("_m") > 0L, expr("((_m - dist) * 1000000L) DIV _m"))
            .as("sim_ppm"))
        .orderBy(col("doc_id"))
    }),

    // north-star: reliability diagram of the linearly calibrated cosine
    // scorer (the eval_logloss fixture) — per-bin exact counts and the
    // |acc − conf| gap numerator; the whole grid is one hash aggregate.
    "eval_reliability" -> ((s, dir) =>
      evals.reliability(table(s, dir, "embeddings"),
          (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
          col("label") < 5, bins = 10)
        .orderBy(col("bin"))),

    // north-star: expected + max calibration error — exact-integer ECE
    // (bin weights cancel against per-bin denominators, so no float).
    "eval_ece" -> ((s, dir) =>
      evals.ece(table(s, dir, "embeddings"),
        (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
        col("label") < 5, bins = 10)),

    // north-star: isotonic calibration fit — the PAV solution via its
    // minimax characterization over a 2-dp score grid; two window
    // passes over the bounded pair grid, monotone by construction.
    "eval_isotonic" -> ((s, dir) =>
      evals.isotonicFit(
        table(s, dir, "embeddings")
          .where(col("embedding").isNotNull && col("label").isNotNull),
        // floor-division to a 2-dp grid on BOTH engines (DIV truncates
        // toward zero on negatives; floor of the double quotient is
        // exact here and floors identically)
        floor(scoreQ4(col("embedding"), Q1) / lit(100.0)).cast("long"),
        col("label") < 5, maxGrid = 512)
        .orderBy(col("s"))),

    // north-star: isotonic APPLY — the fit→apply loop closed. The curve
    // fits on the 2-dp grid, rescales its grid ×100 to q4 units, then
    // broadcast-applies as a step-function lookup onto the RAW 4-dp
    // scores (which genuinely fall BETWEEN grid points), folded to one
    // row per fitted value. One 1-row broadcast; corpus rows never
    // shuffle before the thin final fold.
    "eval_isotonic_apply" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
      val curve = evals.isotonicFit(e,
        floor(scoreQ4(col("embedding"), Q1) / lit(100.0)).cast("long"),
        col("label") < 5, maxGrid = 512)
        .select((col("s") * 100L).as("s"), col("fit_q6"))
      evals.isotonicApply(e.select(scoreQ4(col("embedding"), Q1).as("sq4")),
          curve, col("sq4"))
        .groupBy(col("calibrated_q6"))
        .agg(count(lit(1)).as("n"), min(col("sq4")).as("s_min"),
          max(col("sq4")).as("s_max"))
        .orderBy(col("calibrated_q6"))
    }),

    // north-star: Poisson-bootstrap CI on the mean score — the
    // data-card uncertainty band; one md5 per row stretched to 200
    // replicates by the affine family, integer Poisson weights,
    // order-statistic band over the replicate means.
    "eval_bootstrap_ci" -> ((s, dir) =>
      evals.bootstrapCI(
        table(s, dir, "embeddings").where(col("embedding").isNotNull),
        col("vec_id"), scoreQ4(col("embedding"), Q1), b = 200)),

    // north-star: stratified bootstrap card — per-language mean doc
    // length, each stratum with its own uncertainty band; everything
    // after the scan is groups x b sized.
    "eval_bootstrap_by_lang" -> ((s, dir) =>
      evals.bootstrapCIBy(
          table(s, dir, "documents").where(col("lang").isNotNull),
          Seq("lang"), col("doc_id"), col("n_chars"), b = 100)
        .orderBy(col("lang"))),

    // north-star: CLUSTER bootstrap — resample SOURCES, not rows (every
    // row of a source draws the same weights), the honest CI when docs
    // within a source are correlated; compare against
    // eval_bootstrap_ci's row-level band.
    "eval_bootstrap_clustered" -> ((s, dir) =>
      evals.bootstrapCI(
        table(s, dir, "documents")
          .where(col("source").isNotNull && col("n_chars").isNotNull),
        col("source"), col("n_chars"), b = 200)),

    // north-star: bootstrap CI for a RATIO OF SUMS (chars per token by
    // language) — the data-card shape the mean can't express; same
    // md5+affine weights, both sums reweighted together, zero-denominator
    // replicates dropped.
    "eval_bootstrap_ratio" -> ((s, dir) =>
      evals.bootstrapRatioCIBy(
          table(s, dir, "documents").where(col("lang").isNotNull),
          Seq("lang"), col("doc_id"),
          col("n_chars"), text.tokenCount(col("text")), b = 100)
        .orderBy(col("lang"))),

    // north-star: paired bootstrap A-vs-B — is the Q1-vs-Q2 score
    // difference real; same resamples hit both systems (the pairing),
    // band + replicate win rate.
    "eval_paired_bootstrap" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("embedding").isNotNull)
      evals.pairedBootstrap(e, col("vec_id"),
        scoreQ4(col("embedding"), Q1), scoreQ4(col("embedding"), Q2),
        b = 200)
    }),

    // north-star: Murphy decomposition of the Brier score — REL/RES/UNC
    // from the same reliability grid, quantized-estimator form in
    // DECIMAL(38); the why-is-my-Brier-bad companion to eval_ece.
    "eval_brier_decomp" -> ((s, dir) =>
      evals.brierDecomp(table(s, dir, "embeddings"),
        (scoreQ4(col("embedding"), Q1) + lit(10000L)) * lit(50L),
        col("label") < 5, bins = 10)),

    // north-star: exact Spearman rank agreement between two scorers
    // (Q1 vs Q2 cosine) — doubled mid-ranks from bounded value grids,
    // one IEEE sqrt chain for rho.
    "eval_spearman" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.spearman(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    }),

    // north-star: Kendall tau-b between the same two scorers — exact
    // concordant/discordant masses over the joint value grid (cell
    // pairs, never row pairs), in-plan grid guard.
    "eval_kendall" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.kendallTau(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    }),

    // north-star: corpus distinct-n generation-diversity read-out.
    "eval_distinct_n" -> ((s, dir) =>
      evals.distinctNgrams(table(s, dir, "documents"), col("text"),
          Seq(1, 2))
        .orderBy(col("n"))),

    // north-star: preference win rate — does scorer Q1 beat Q2 per
    // item, exact counts + ppm conventions (tie-aware and not).
    "eval_winrate" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      evals.winRate(e, scoreQ4(col("embedding"), Q1),
        scoreQ4(col("embedding"), Q2))
    }),

    // north-star: BERTScore-style embedding F1 — greedy max-cosine
    // matching over the 4x16 sliced token layout (the maxSim lattice);
    // ref side = the reversed embedding (deterministic, row-local,
    // related-but-not-identical). Zero shuffle; F1 is one exact
    // positive integer DIV, no float combine at all.
    "eval_embed_f1" -> ((s, dir) =>
      evals.embedF1(table(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), reverse(col("embedding")),
          nTokens = 4, dim = 16)
        .orderBy(col("vec_id"))),

    // north-star: self-BLEU corpus diversity — each generation scored as
    // a BLEU-2 candidate against 3 cyclic-successor generations (capped
    // fan-out, never all-pairs); high self-BLEU = the model repeats
    // itself. Unsmoothed p1 leaves zero-overlap pairs unscored
    // (n_scored < n_opp reads the miss).
    "eval_self_bleu" -> ((s, dir) =>
      evals.selfBleu(genPairs(s, dir), col("doc_id"), col("cand"),
          opponents = 3, maxN = 2)
        .orderBy(col("doc_id"))),

    // north-star: pass@k — the HumanEval estimator per task from 503
    // hash-bucketed tasks × ~12 samples; exact falling-factorial
    // arithmetic in DECIMAL(38), NULL where n < k.
    "eval_pass_at_k" -> ((s, dir) =>
      evals.passAtK(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 503L).as("task"), (col("label") < 4).as("ok")),
        col("task"), col("ok"), ks = Seq(1, 2, 5))
        .orderBy(col("task"))),

    // north-star: self-consistency / majority-vote accuracy — modal
    // answer per task vs gold, struct-max tie-break, no window.
    "eval_majority_vote" -> ((s, dir) =>
      evals.selfConsistency(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 503L).as("task"),
          pmod(scoreQ4(col("embedding"), Q1), lit(7L)).as("ans"),
          ((col("vec_id") % 503L) % 7L).as("gold")),
        col("task"), col("ans"), col("gold"))
        .orderBy(col("task"))),

    // north-star: Cohen's kappa between the data label and a
    // hash-derived second rater — chance-corrected agreement, all
    // integer, floor-division portable on the negative branch.
    "eval_kappa" -> ((s, dir) =>
      evals.cohenKappa(
        table(s, dir, "embeddings").where(col("embedding").isNotNull)
          .select(col("label").cast("long").as("a"),
            pmod(scoreQ4(col("embedding"), Q1), lit(10L)).as("b")),
        col("a"), col("b"))),

    // north-star: split-conformal threshold at 90% coverage — exact
    // order-statistic selection over the score grid, integer rank from
    // the ceiling-division identity.
    "eval_conformal" -> ((s, dir) =>
      evals.conformalThreshold(
        table(s, dir, "embeddings").where(col("embedding").isNotNull),
        scoreQ4(col("embedding"), Q1), alphaPpm = 100000L)),

    // north-star: fairness table for a boolean screen across label%3
    // slices — per-group exact confusion counts, demographic-parity and
    // equalized-odds ppm rates.
    "eval_fairness" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
      evals.fairnessGaps(e, pmod(col("label"), lit(3)).cast("long"),
          scoreQ4(col("embedding"), Q1) > 0L, col("label") < 5)
        .orderBy(col("grp"))
    }),

    // north-star: Fleiss' kappa — a fixed 3-rater panel (hash-derived
    // labels over 4 categories) per unit; exact DECIMAL(38) combine,
    // floor-ppm readouts on both engines.
    "eval_fleiss" -> ((s, dir) => {
      val rated = table(s, dir, "embeddings")
        .where(col("vec_id").isNotNull)
        .select(col("vec_id"),
          explode(sequence(lit(0L), lit(2L))).as("r"))
        .select(col("vec_id"),
          (hashing.h32(concat(col("vec_id").cast("string"), lit("/fl"),
            col("r").cast("string"))) % 4L).as("lab"))
      evals.fleissKappa(rated, col("vec_id"), col("lab"), m = 3)
    }),

    // north-star: average precision per query (the MAP building block)
    // over the eval_ndcg run fixture — per-term ppm quantization makes
    // the surfaced AP engine-exact; one window per qid, full ranking.
    "eval_map" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      def run(qid: Long, q: Seq[Double], rel2: Int, rel1: Int) =
        e.select(lit(qid).as("qid"), col("vec_id"),
          when(col("label") === rel2, 2L)
            .when(col("label") === rel1, 1L).otherwise(0L).as("rel"),
          scoreQ4(col("embedding"), q).as("s"))
      evals.averagePrecision(run(0L, Q1, 3, 7).unionAll(run(1L, Q2, 5, 1)),
          col("qid"), col("rel"), col("s"), col("vec_id"))
        .orderBy(col("qid"))
    }),

    // north-star: Adjusted Rand Index — cluster agreement between the
    // data label and a 20%-perturbed copy; pair-counting contingency
    // sums in exact longs, chance correction in DECIMAL(38), ppm by
    // the pmod floor identity (ARI can be negative).
    "eval_ari" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("label").isNotNull)
      evals.adjustedRand(e, col("label"),
        pmod(col("label") + when(col("vec_id") % 5L === 0L, 1L)
          .otherwise(0L), lit(10L)))
    }),

    // north-star: rank-biased overlap — top-weighted agreement between
    // the Q1 and Q2 rankings per label-parity query; a doc's whole
    // contribution is the literal suffix-sum at max(ra, rb), so the
    // score is one exact long sum after a thin top-20 join.
    "eval_rbo" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .where(col("embedding").isNotNull && col("label").isNotNull)
        .select(pmod(col("label"), lit(2L)).as("qid"), col("vec_id"),
          scoreQ4(col("embedding"), Q1).as("sa"),
          scoreQ4(col("embedding"), Q2).as("sb"))
      evals.rboAtD(e, col("qid"), col("vec_id"), col("sa"), col("sb"),
          pPpm = 900000L, depth = 20)
        .orderBy(col("qid"))
    }),

    // north-star: V-measure (homogeneity/completeness) — the entropy
    // twin of eval_ari over the same perturbed-labeling fixture,
    // composed from mutualInfo's quantized sums: h = MI/H(a),
    // c = MI/H(b), v = 2·MI/(H(a)+H(b)) (the harmonic-mean identity).
    // Ratios of identically-rounded doubles re-quantize identically on
    // both engines.
    "eval_vmeasure" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").where(col("label").isNotNull)
      def q6(c: Column) = graft.functions.vectors.quantize(c, 6)
      rel.mutualInfo(e, col("label"),
          pmod(col("label") + when(col("vec_id") % 5L === 0L, 1L)
            .otherwise(0L), lit(10L)))
        .select(col("n"),
          when(col("h_a") > 0.0, q6(col("mi") / col("h_a")))
            .as("homogeneity"),
          when(col("h_b") > 0.0, q6(col("mi") / col("h_b")))
            .as("completeness"),
          when(col("h_a") + col("h_b") > 0.0,
            q6(lit(2.0) * col("mi") / (col("h_a") + col("h_b"))))
            .as("v_measure"))
    }),

    // north-star: Krippendorff's alpha — variable raters per unit
    // (1..3 hash-derived ratings; single-rating units drop, exercising
    // the missing-data path Fleiss' fixed panel can't represent).
    "eval_krippendorff" -> ((s, dir) => {
      val rated = table(s, dir, "embeddings")
        .where(col("vec_id").isNotNull)
        .select(col("vec_id"),
          explode(sequence(lit(0L), pmod(col("vec_id"), lit(3L)))).as("r"))
        .select(col("vec_id"),
          (hashing.h32(concat(col("vec_id").cast("string"), lit("/kr"),
            col("r").cast("string"))) % 4L).as("lab"))
      evals.krippendorffAlpha(rated, col("vec_id"), col("lab"))
    }),

    // north-star: Bradley-Terry arena ratings — 8 synthetic models with
    // index-increasing skill margins, 3 MM fixed-point rounds in
    // integer arithmetic, deterministic rescale; the leaderboard read.
    "eval_bt_ratings" -> ((s, dir) =>
      evals.btRatings(
        table(s, dir, "embeddings").select(
          (col("vec_id") % 8L).as("a"),
          expr("(vec_id DIV 8) % 8").as("b"),
          (scoreQ4(col("embedding"), Q1) - scoreQ4(col("embedding"), Q2)
            + ((col("vec_id") % 8L) - expr("(vec_id DIV 8) % 8")) * 500L)
            .as("mg"))
          .where(col("a") =!= col("b") && col("mg") =!= 0L)
          .withColumn("win", col("mg") > 0L),
        col("a"), col("b"), col("win"), iters = 3)
        .orderBy(col("model"))),

    // north-star: win-rate error bars — the per-item win indicator
    // (1 / 0.5 / 0) through the deterministic Poisson bootstrap; the
    // rep spread IS the CI a launch review reads.
    "eval_winrate_ci" -> ((s, dir) => {
      val ind = when(scoreQ4(col("embedding"), Q1)
          > scoreQ4(col("embedding"), Q2), 1.0)
        .when(scoreQ4(col("embedding"), Q1)
          === scoreQ4(col("embedding"), Q2), 0.5)
        .otherwise(0.0)
      sample.bootstrapCI(
        table(s, dir, "embeddings").where(col("embedding").isNotNull)
          .select(col("vec_id"), ind.as("ind")),
        "ind", "vec_id", reps = 20, salt = "wr")
        .orderBy(col("rep"))
    }),

    // north-star: per-day calibration drift — the streaming reliability
    // grid's batch twin (same reliabilityGrid code path the live
    // calibrationStream runs), finished to per-window ECE/MCE. The
    // scorer is a portable hash-derived probability so both engines
    // bin identical values.
    "events_calibration_drift" -> ((s, dir) => {
      val grid = EventStream.calibrationStream(events(s, dir),
        hashing.h32(col("user_id").cast("string")) % 1000001L,
        col("event_type") === "purchase", windowDur = "1 day", bins = 10)
      evals.eceFrom(
          grid.withColumn("day",
            date_format(col("win.start"), "yyyy-MM-dd")).drop("win"),
          Seq("day"))
        .orderBy(col("day"))
    }),

    // north-star: per-day preference drift — the streaming win-rate
    // grid's batch twin (same winRateGrid path the live winRateStream
    // runs), finished to the ppm conventions. Scorers are portable
    // hash-derived so both engines compare identical integers.
    "events_winrate_drift" -> ((s, dir) => {
      val a = hashing.h32(concat(col("user_id").cast("string"), lit("a"))) % 1000L
      val b = hashing.h32(concat(col("user_id").cast("string"), lit("b"))) % 1000L
      evals.winRateFrom(
        EventStream.winRateStream(events(s, dir), a, b, windowDur = "1 day")
          .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
          .drop("win"),
        Seq("day")).orderBy(col("day"))
    }),

    // north-star: session-scoped funnel — the ladder must complete in
    // one visit; one user-keyed exchange feeds tagging and steps.
    "events_session_funnel" -> ((s, dir) =>
      EventStream.sessionFunnel(events(s, dir),
          Seq("view", "click", "purchase"), gapMinutes = 30)
        .orderBy(col("step"))),

    // north-star: first-order Markov predictability — majority next
    // event per state, exact bp accuracy; the is-this-stream-mechanical
    // meter.
    "events_markov_acc" -> ((s, dir) =>
      EventStream.markovPredictability(events(s, dir))
        .orderBy(col("prev_type"))),

    // north-star: exact Gini over per-user value — the whole Lorenz
    // curve as one number, cumulative counts via the distributed
    // prefix-sum (no global window).
    "events_gini" -> ((s, dir) =>
      rel.gini(
        events(s, dir).groupBy(col("user_id"))
          .agg(sum(floor(col("value") * 100.0).cast("long")).as("_c")),
        col("_c"))),

    // north-star: Benford first-digit screen over order totals — exact
    // digit counts, micro-quantized chi-square terms.
    "rel_benford" -> ((s, dir) =>
      rel.benford(table(s, dir, "orders"),
          floor(col("o_totalprice") * 100.0).cast("long"))
        .orderBy(col("digit"))),

    // north-star: funnel with a conversion deadline — purchase counts
    // only within an hour of the click; the unlimited funnel's numbers
    // sit alongside for the deadline's bite to be visible.
    "events_funnel_windowed" -> ((s, dir) =>
      EventStream.funnelWindowed(events(s, dir),
          Seq("view", "click", "purchase"), maxGapSec = 3600L)
        .orderBy(col("step"))),

    // north-star: hour-of-week seasonal anomaly screen — exact cell
    // stats, one float z chain, densified so silence is a reading too.
    "events_seasonal_anomaly" -> ((s, dir) =>
      EventStream.seasonalAnomaly(events(s, dir), zMin = 1.5)
        .orderBy(col("series"), col("t"))),

    // north-star: distributed Lloyd k-means, bit-exact — integer
    // distances (no ulp can flip an assignment), driver-truncated
    // centroid updates, k smallest-id init; 2 rounds + final summary.
    "vec_kmeans" -> ((s, dir) =>
      graft.ops.linalg.kmeansFit(table(s, dir, "embeddings"), "embedding",
          "vec_id", dim = 64, k = 4, iters = 2)
        .orderBy(col("cluster"))),

    // north-star: 1-D Wasserstein drift between the 'de' and 'en'
    // length distributions — order-aware where KL is categorical;
    // exact integer mass transport, one float quotient.
    "sample_emd" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.emd1d(
        docs.where(col("lang") === "de"), col("n_chars"),
        docs.where(col("lang") === "en"), col("n_chars"),
        binWidth = 100L)
    }),

    // north-star: exact two-sample KS on the shared value grid — the
    // emd1d rational discipline with max instead of the gap-weighted
    // sum; no division before the final quantized readout.
    "sample_ks" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.ksStat(
        docs.where(col("lang") === "de"), col("n_chars"),
        docs.where(col("lang") === "en"), col("n_chars"))
    }),

    // north-star: temporal drift gate — KS between the first and second
    // half-month of the event stream's value distribution (cents grid).
    "events_ks_drift" -> ((s, dir) => {
      val ev = events(s, dir)
      val cents = floor(col("value") * 100.0).cast("long")
      val cut = lit("2024-01-16").cast("timestamp")
      sample.ksStat(
        ev.where(col("ts") < cut), cents,
        ev.where(col("ts") >= cut), cents)
    }),

    // north-star: per-day PSI against a pinned day-1 reference
    // histogram — histGrid snapshots (the streaming histDriftStream
    // path) finished by psiFrom; everything downstream of the two
    // grids is bin-bounded.
    "events_psi_drift" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val cents = floor(col("value") * 100.0).cast("long")
      val ref = sample.histGrid(
        ev.where(col("ts") < lit("2024-01-02").cast("timestamp")),
        cents, Seq.empty, binWidth = 1000L)
      val cur = EventStream.histDriftStream(ev, cents, binWidth = 1000L,
          windowDur = "1 day")
        .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
        .drop("win")
      sample.psiFrom(ref, cur, Seq("day")).orderBy(col("day"))
    }),

    // north-star: per-day KS against the same pinned day-1 reference —
    // the second readout of the one histDriftStream sink ($1 bins for
    // CDF resolution); cross-multiplied integers, one division at the
    // quantized readout.
    "events_ks_daily" -> ((s, dir) => {
      val ev = events(s, dir).where(col("value").isNotNull)
      val cents = floor(col("value") * 100.0).cast("long")
      val ref = sample.histGrid(
        ev.where(col("ts") < lit("2024-01-02").cast("timestamp")),
        cents, Seq.empty, binWidth = 100L)
      val cur = EventStream.histDriftStream(ev, cents, binWidth = 100L,
          windowDur = "1 day")
        .withColumn("day", date_format(col("win.start"), "yyyy-MM-dd"))
        .drop("win")
      sample.ksFrom(ref, cur, Seq("day")).orderBy(col("day"))
    }),

    // north-star: deterministic rejection matching — calibrate the 'de'
    // slice's length distribution to the 'en' slice; bounded grid, rates
    // broadcast, keep decision a pure scan filter.
    "sample_match_dist" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      sample.matchDistribution(
          docs.where(col("lang") === "de"), col("n_chars"),
          docs.where(col("lang") === "en"), col("n_chars"),
          "doc_id", binWidth = 200L)
        .groupBy(col("bin"), col("keep_ppm"))
        .agg(count(lit(1)).as("n_src"), sum(col("kept")).as("n_kept"))
        .orderBy(col("bin"))
    }),

    // TPC-H Q14 shape (promo revenue share): one month of lineitem
    // against the part dimension, share as a ppm quotient of exact
    // integer revenues.
    "rel_tpch_q14" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select((floor(col("l_extendedprice") * 100.0).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100.0 + 0.5).cast("long")))
          .as("_r"), col("p_type"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("_r")).otherwise(lit(0L)))
            .as("promo_qc"),
          sum(col("_r")).as("total_qc"))
        .withColumn("promo_ppm",
          expr("(promo_qc * 1000000L) DIV total_qc"))),

    // TPC-H Q1 shape (pricing summary): THE canonical scan-aggregate —
    // one pushed date range, one hash aggregate to a ≤6-row grid, no
    // join, no shuffle beyond the final exchange. All measures exact
    // integers (qty is integral 1-50 in the data; price in cents;
    // discount/tax in rounded hundredths so disc revenue is x100 scale);
    // averages are truncating integer quotients — both engines truncate
    // on non-negative operands. The charge triple product (x10000 scale,
    // ~1e11/row) is summed EXACTLY in wide integers — DECIMAL(38,0) on
    // Spark, HUGEINT on DuckDB — and divided back to cents ONCE per
    // group (IntegralDivide accepts decimal operands, yields LONG), so
    // sum_charge_c is the exact TPC-H charge sum: no per-row truncation
    // drift, and 38 digits give ~1e27 rows/group of headroom where a
    // BIGINT sum would wrap silently near SF100.
    "rel_tpch_q1" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("_q"),
          floor(col("l_extendedprice") * 100.0).cast("long").as("_c"),
          floor(col("l_discount") * 100.0 + 0.5).cast("long").as("_dh"),
          floor(col("l_tax") * 100.0 + 0.5).cast("long").as("_th"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("_q")).as("sum_qty"),
          sum(col("_c")).as("sum_base_qc"),
          sum(col("_c") * (lit(100L) - col("_dh"))).as("sum_disc_qc"),
          sum(expr("CAST(_c * (100L - _dh) * (100L + _th) AS DECIMAL(38,0))"))
            .as("_charge_q4"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_qc"), col("sum_disc_qc"),
          expr("_charge_q4 DIV 10000").as("sum_charge_c"),
          expr("sum_qty * 100 DIV n_rows").as("avg_qty_x100"),
          expr("sum_base_qc DIV n_rows").as("avg_price_c"),
          col("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q18 shape (large-volume customers): group-filter-join — the
    // HAVING > 300 survivor set (~0.1% of orders) keyed back onto orders
    // and customer. Join strategy is left to Catalyst/AQE deliberately:
    // at small SF the survivor side broadcasts at runtime; at 100 TB it
    // exceeds the broadcast bar and AQE keeps the keyed SMJ — pinning a
    // broadcast hint here is exactly the plan that would NOT survive a
    // 100x scale-up. Deterministic tie-break (total_c, o_orderdate,
    // o_orderkey) under TakeOrderedAndProject.
    "rel_tpch_q18" -> ((s, dir) => {
      val big = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("order_qty"))
        .where(col("order_qty") > 300L)
      table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          floor(col("o_totalprice") * 100.0).cast("long").as("total_c"),
          col("order_qty"))
        .orderBy(col("total_c").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "vec_cosine_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score
         |  FROM embeddings WHERE label >= 2
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "vec_dot_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlDot(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "vec_l2_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlL2sq(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin,

    "vec_score_filter" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s WHERE score > 0.15
         |ORDER BY score DESC, vec_id""".stripMargin,

    "vec_batch_merge" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, label, ${r4(sqlCosine(Q2))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "index_cosine_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q1))} AS score
         |  FROM embeddings WHERE label = 7
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "meta_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_quantity > 30 AND (l_returnflag = 'A' OR l_returnflag = 'R')
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_date, l_quantity, l_returnflag""".stripMargin,

    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents)
         |SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(regexp_extract_all(lower(text), '${text.BpeTokenPattern}')) AS n_bpe,
         |  floor((CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS mean_tok_len,
         |  floor((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         |  floor((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_blocklist_stats" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |g1 AS (SELECT doc_id FROM tk, unnest(ts) u(t) WHERE t IN ('slow')),
         |g2 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts))) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] IN ('big query')),
         |g3 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts) - 1)) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] IN ('merge batch part'))
         |SELECT doc_id, count(*)::BIGINT AS n_hits FROM
         |  (SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
         |GROUP BY doc_id HAVING count(*) > 0 ORDER BY doc_id""".stripMargin,

    "text_blocklist_clean" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |g1 AS (SELECT doc_id FROM tk, unnest(ts) u(t) WHERE t IN ('slow')),
         |g2 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts))) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] IN ('big query')),
         |g3 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts) - 1)) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] IN ('merge batch part')),
         |h AS (SELECT doc_id, count(*) AS n_hits FROM
         |  (SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
         |  GROUP BY doc_id)
         |SELECT count(*)::BIGINT AS n_total,
         |  sum(CASE WHEN coalesce(h.n_hits, 0) = 0 THEN 1 ELSE 0 END)::BIGINT AS n_clean,
         |  sum(coalesce(h.n_hits, 0))::BIGINT AS total_hits
         |FROM tk LEFT JOIN h USING (doc_id)""".stripMargin,

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
    },

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
    },

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
    },

    "dedup_winnow_pairs" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |g AS (SELECT doc_id, list_transform(range(1, len(ts) - 2),
         |    i -> ${hashing.sqlH32("array_to_string(list_slice(ts, i, i + 3), ' ')")})
         |  AS hs FROM tk WHERE len(ts) >= 4),
         |f AS (SELECT doc_id, CASE WHEN len(hs) >= 4
         |  THEN list_distinct(list_transform(range(1, len(hs) - 2),
         |    i -> list_min(list_slice(hs, i, i + 3))))
         |  ELSE [list_min(hs)] END AS fps FROM g),
         |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
         |d AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 256),
         |eo AS (SELECT e.doc_id, e.fp FROM e JOIN d USING (fp)),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    count(*)::BIGINT AS n_shared
         |  FROM eo a JOIN eo b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= 2
         |ORDER BY id_a, id_b""".stripMargin,

    "text_c4_line_clean" ->
      s"""WITH t AS (SELECT doc_id,
         |  replace(text, ' table ', '.' || chr(10)) AS tx FROM documents),
         |c AS (SELECT doc_id, coalesce(array_to_string(list_filter(
         |  string_split(tx, chr(10)),
         |  l -> regexp_matches(trim(l), '[.!?"]$$')
         |    AND len(list_filter(string_split_regex(trim(l), '\\s+'),
         |          w -> w != '')) >= 3
         |    AND NOT contains(lower(trim(l)), 'lorem ipsum')
         |    AND NOT contains(lower(trim(l)), 'javascript')
         |    AND NOT contains(trim(l), '{')), chr(10)), '') AS clean FROM t)
         |SELECT doc_id, md5(clean) AS clean_md5,
         |  length(clean)::BIGINT AS clean_len
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_c4_page_gate" ->
      s"""WITH s AS (SELECT doc_id, text
         |    || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum' ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0 THEN ' {code}' ELSE '' END AS tx0
         |  FROM documents),
         |k AS (SELECT doc_id, tx0 FROM s
         |  WHERE NOT (contains(lower(tx0), 'lorem ipsum') OR contains(tx0, '{'))),
         |t AS (SELECT doc_id, replace(tx0, ' table ', '.' || chr(10)) AS tx FROM k),
         |c AS (SELECT doc_id, coalesce(array_to_string(list_filter(
         |  string_split(tx, chr(10)),
         |  l -> regexp_matches(trim(l), '[.!?"]$$')
         |    AND len(list_filter(string_split_regex(trim(l), '\\s+'),
         |          w -> w != '')) >= 3
         |    AND NOT contains(lower(trim(l)), 'lorem ipsum')
         |    AND NOT contains(lower(trim(l)), 'javascript')
         |    AND NOT contains(trim(l), '{')), chr(10)), '') AS clean FROM t)
         |SELECT doc_id, md5(clean) AS clean_md5
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_line_stats" ->
      s"""WITH t AS (SELECT doc_id,
         |  replace(replace(text, ' table ', '.' || chr(10)),
         |          ' row ', chr(10) || '- ') AS tx FROM documents),
         |l AS (SELECT doc_id, list_filter(
         |  list_transform(string_split(tx, chr(10)), x -> trim(x)),
         |  x -> x != '') AS ls FROM t)
         |SELECT doc_id, len(ls)::BIGINT AS n_lines,
         |  CASE WHEN len(ls) > 0 THEN floor(len(list_filter(ls,
         |    x -> regexp_matches(x, '^[-*•]')))::DOUBLE / len(ls)
         |    * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS frac_bullet,
         |  CASE WHEN len(ls) > 0 THEN floor(len(list_filter(ls,
         |    x -> regexp_matches(x, '(\\.\\.\\.|…)$$')))::DOUBLE / len(ls)
         |    * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS frac_ellipsis,
         |  CASE WHEN len(ls) > 0 THEN floor(len(list_filter(ls,
         |    x -> regexp_matches(x, '[.!?"]$$')))::DOUBLE / len(ls)
         |    * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS frac_terminal
         |FROM l ORDER BY doc_id""".stripMargin,

    // Same start set as text.tokenChunks: 0, 48, 96, … with the last
    // start the first covering the tail; docs with no tokens drop out.
    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, toks, len(toks) AS n
         |  FROM (SELECT doc_id, $SqlToks AS toks FROM documents) WHERE len(toks) > 0),
         |c AS (SELECT doc_id, toks,
         |  unnest(range(0, CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END)) AS chunk_idx
         |  FROM t),
         |ch AS (SELECT doc_id, chunk_idx,
         |  list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64) AS chunk FROM c)
         |SELECT doc_id, chunk_idx, len(chunk) AS n_toks,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_vocab_topn" ->
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS word FROM documents)
         |SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM t GROUP BY word ORDER BY tf DESC, word LIMIT 100""".stripMargin,

    // Heaps curve: first occurrence = min bucket per type; cumulative
    // sums over the 20-row grid.
    "text_vocab_growth" ->
      s"""WITH tk AS (SELECT doc_id AS id, $SqlToks AS toks FROM documents),
         |b AS (SELECT min(id) AS lo, max(id) AS hi FROM tk),
         |e AS (SELECT ((id - lo) * 20) // (hi - lo + 1) AS bucket,
         |    unnest(toks) AS t FROM tk CROSS JOIN b),
         |pb AS (SELECT bucket, count(*)::BIGINT AS toks FROM e GROUP BY 1),
         |fs AS (SELECT fb AS bucket, count(*)::BIGINT AS new_types FROM
         |  (SELECT t, min(bucket) AS fb FROM e GROUP BY 1) GROUP BY 1),
         |g AS (SELECT pb.bucket, pb.toks,
         |    coalesce(fs.new_types, 0)::BIGINT AS new_types
         |  FROM pb LEFT JOIN fs ON pb.bucket = fs.bucket)
         |SELECT bucket, toks, new_types,
         |  sum(toks) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |    AS toks_cum,
         |  sum(new_types) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |    AS vocab_cum
         |FROM g ORDER BY bucket""".stripMargin,

    // Term dispersion: HUGEINT cleared-denominator cells, closed-form
    // absent-source mass, one truncating division per term.
    "text_term_dispersion" ->
      s"""WITH g AS (SELECT word, source AS s, count(*)::BIGINT AS tfs FROM (
         |    SELECT source, unnest($SqlToks) AS word FROM documents
         |    WHERE source IS NOT NULL) GROUP BY 1, 2),
         |st AS (SELECT s, sum(tfs)::BIGINT AS ts FROM g GROUP BY 1),
         |t AS (SELECT sum(ts)::BIGINT AS tt FROM st),
         |tm AS (SELECT word, sum(tfs)::BIGINT AS tf FROM g GROUP BY 1),
         |c AS (SELECT g.word, tm.tf,
         |    abs(g.tfs::HUGEINT * t.tt - tm.tf::HUGEINT * st.ts) AS an,
         |    st.ts
         |  FROM g JOIN st USING (s) JOIN tm USING (word) CROSS JOIN t),
         |b AS (SELECT word, max(tf) AS tf, count(*)::BIGINT AS n_sources,
         |    sum(an) AS pres, sum(ts)::BIGINT AS present_ts
         |  FROM c GROUP BY word HAVING max(tf) >= 10),
         |f AS (SELECT word, tf, n_sources,
         |    ((pres + tf::HUGEINT * ((SELECT tt FROM t) - present_ts))
         |      * 1000000
         |      // (2 * tf::HUGEINT * (SELECT tt FROM t)))::BIGINT AS dp_ppm
         |  FROM b)
         |SELECT word, tf, n_sources, dp_ppm FROM f
         |ORDER BY dp_ppm DESC, tf DESC, word LIMIT 20""".stripMargin,

    // Zipf slope: same top-1000 head as text_vocab_topn, q4-floored ln
    // terms, exact integer OLS sums, signed num/den + one quantized
    // double (floor(x*1e6+0.5) on identical operands both engines).
    "text_zipf_slope" ->
      s"""WITH t AS (SELECT unnest($SqlToks) AS word FROM documents),
         |v AS (SELECT word, count(*)::BIGINT AS tf FROM t GROUP BY 1
         |  ORDER BY tf DESC, word LIMIT 1000),
         |r AS (SELECT
         |    floor(ln(row_number() OVER (ORDER BY tf DESC, word))
         |      * 10000)::BIGINT AS x,
         |    floor(ln(tf) * 10000)::BIGINT AS y FROM v),
         |a AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |  sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         |  sum(x * x)::BIGINT AS sxx FROM r)
         |SELECT n AS n_terms, (n * sxy - sx * sy)::BIGINT AS slope_num,
         |  (n * sxx - sx * sx)::BIGINT AS slope_den,
         |  CASE WHEN n * sxx - sx * sx > 0 THEN
         |    floor((n * sxy - sx * sy)::DOUBLE
         |      / (n * sxx - sx * sx)::DOUBLE * 1000000.0 + 0.5) / 1000000.0
         |  END AS slope_q6
         |FROM a""".stripMargin,

    // Interpolated Kneser-Ney trigram LM: every count statistic replayed
    // as an integer-grid CTE (c3 -> context/continuation/middle/word
    // grids), then the SAME fixed parenthesization of the p3 double
    // expression, the same floor-1e6 long terms, the same 4-dp mean.
    "text_kn_logprob" ->
      s"""WITH t AS (SELECT doc_id, toks FROM
         |  (SELECT doc_id, $SqlToks AS toks FROM documents)
         |  WHERE len(toks) >= 3),
         |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |  i -> [toks[i], toks[i+1], toks[i+2]])) AS g FROM t),
         |tf AS (SELECT doc_id, g[1] AS t1, g[2] AS t2, g[3] AS t3,
         |  count(*)::BIGINT AS tf FROM tg GROUP BY 1, 2, 3, 4),
         |c3 AS (SELECT t1, t2, t3, sum(tf)::BIGINT AS c3 FROM tf
         |  GROUP BY 1, 2, 3),
         |c12 AS (SELECT t1, t2, sum(c3)::BIGINT AS c12,
         |  count(*)::BIGINT AS n1p12 FROM c3 GROUP BY 1, 2),
         |g23 AS (SELECT t2, t3, count(*)::BIGINT AS cvw FROM c3
         |  GROUP BY 1, 2),
         |g2 AS (SELECT t2, sum(cvw)::BIGINT AS nmid,
         |  count(*)::BIGINT AS nvdot FROM g23 GROUP BY 1),
         |g3 AS (SELECT t3, count(*)::BIGINT AS cw FROM g23 GROUP BY 1),
         |nbt AS (SELECT count(*)::BIGINT AS nbt FROM g23),
         |sc AS (SELECT tf.doc_id, tf.tf,
         |  ln((greatest(c3.c3::DOUBLE - 0.75, 0.0)
         |      + (0.75 * c12.n1p12::DOUBLE)
         |        * ((greatest(g23.cvw::DOUBLE - 0.75, 0.0)
         |            + (0.75 * g2.nvdot::DOUBLE)
         |              * (g3.cw::DOUBLE / nbt.nbt::DOUBLE))
         |          / g2.nmid::DOUBLE))
         |    / c12.c12::DOUBLE) AS lp
         |  FROM tf JOIN c3 USING (t1, t2, t3) JOIN c12 USING (t1, t2)
         |    JOIN g23 USING (t2, t3) JOIN g2 USING (t2)
         |    JOIN g3 USING (t3) CROSS JOIN nbt),
         |d AS (SELECT doc_id, sum(tf)::BIGINT AS n_trigrams,
         |  sum(floor(tf * lp * 1000000.0)::BIGINT) AS q FROM sc GROUP BY 1)
         |SELECT doc_id, n_trigrams,
         |  floor(q::DOUBLE / 1000000.0 / n_trigrams * 10000.0 + 0.5)
         |    / 10000.0 AS logprob
         |FROM d ORDER BY doc_id""".stripMargin,

    // Char-4-gram langid: the 16-language rank-weight profile table is
    // emitted as a VALUES literal FROM THE SAME driver-trained
    // [[graft.ops.langprofiles.Default]] the Spark kernel uses, so both
    // engines score with identical integer weights; normalization,
    // gram slide, argmax tie order (score desc, profile order), the
    // below-minScore 'und' fallback, and the no-hit LEFT JOIN fallback
    // are replayed exactly.
    "text_langid_ngram" -> {
      val values = graft.ops.langprofiles.Default.zipWithIndex.flatMap {
        case ((lang, grams), li) => grams.map { case (g, wt) =>
          s"($li, '$lang', '${g.replace("'", "''")}', $wt)" }
      }.mkString(", ")
      s"""WITH w(lr, lang, g, wt) AS (VALUES $values),
         |d AS (SELECT doc_id, lang AS meta_lang,
         |    ' ' || regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')
         |      || ' ' AS t
         |  FROM documents),
         |gr AS (SELECT doc_id, substr(t, CAST(i AS INT), 4) AS g
         |  FROM d, unnest(range(1, greatest(len(t) - 2, 1))) AS r(i)),
         |sc AS (SELECT gr.doc_id, w.lr, w.lang, sum(w.wt)::BIGINT AS s
         |  FROM gr JOIN w ON gr.g = w.g GROUP BY 1, 2, 3),
         |b AS (SELECT doc_id, lang, s,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lr)
         |      AS rk
         |  FROM sc),
         |lab AS (SELECT d.doc_id, d.meta_lang,
         |    CASE WHEN b1.s IS NULL OR b1.s < 1 THEN 'und'
         |         ELSE b1.lang END AS lang_pred,
         |    coalesce(b1.s, 0)::BIGINT AS ts
         |  FROM d LEFT JOIN (SELECT * FROM b WHERE rk = 1) b1 USING (doc_id))
         |SELECT meta_lang, lang_pred, count(*)::BIGINT AS n_docs,
         |  sum(ts)::BIGINT AS sum_score
         |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // MI/entropies on the corpusDivergence quantization convention:
    // q12 floor per cell, long sums, 6-dp quantized nats.
    "rel_mutual_info" ->
      """WITH b AS (SELECT lang AS a, source AS bb FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT a, bb, count(*)::BIGINT AS nij FROM b GROUP BY 1, 2),
        |na AS (SELECT a, sum(nij)::BIGINT AS na FROM g GROUP BY 1),
        |nb AS (SELECT bb, sum(nij)::BIGINT AS nb FROM g GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT AS n,
        |  count(DISTINCT a)::BIGINT AS a_card,
        |  count(DISTINCT bb)::BIGINT AS b_card FROM g),
        |mi AS (SELECT sum(floor((g.nij::DOUBLE / t.n)
        |    * ln((g.nij::DOUBLE * t.n) / (na.na::DOUBLE * nb.nb))
        |    * 1e12))::BIGINT AS smi
        |  FROM g JOIN na ON g.a = na.a JOIN nb ON g.bb = nb.bb CROSS JOIN t),
        |ha AS (SELECT sum(floor((na::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / na) * 1e12))::BIGINT AS sha
        |  FROM na CROSS JOIN t),
        |hb AS (SELECT sum(floor((nb::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / nb) * 1e12))::BIGINT AS shb
        |  FROM nb CROSS JOIN t)
        |SELECT n, a_card, b_card,
        |  floor(sha::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_a,
        |  floor(shb::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_b,
        |  floor(smi::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS mi,
        |  CASE WHEN greatest(sha, shb) > 0 THEN
        |    floor(smi::DOUBLE / greatest(sha, shb)::DOUBLE * 1000000.0 + 0.5)
        |      / 1000000.0 END AS nmi
        |FROM t, mi, ha, hb""".stripMargin,

    // The trainer's 12 rounds unrolled in DuckDB — an independent
    // re-derivation of the merge rules, not a pinned transcript.
    "text_bpe_merges" -> sqlBpeTrain(merges = 12, minPair = 2L),

    // The unigram trainer's 2 EM rounds unrolled — an independent
    // re-derivation of seed, per-round Viterbi DP (one CTE per token
    // position; the fixture's max token length is 8 at every SF),
    // recursive backtrace, usage fold, and prune.
    "text_unigram_train" -> sqlUnigramTrain(seedSize = 60,
      maxPieceLen = 3, rounds = 2, minUsage = 2L, keepTop = 40,
      maxWordLen = 8),

    // Fertility of the trained vocab: the same chain + one final
    // scored segmentation round; counts are cnt-weighted long sums.
    "text_unigram_fertility" -> sqlUnigramFertility(seedSize = 60,
      maxPieceLen = 3, rounds = 2, minUsage = 2L, maxWordLen = 8),

    // Persisted-artifact encode: the oracle re-derives the trained
    // vocabulary (same EM chain) and the final-scores segmentation
    // (finalSegRound DP), then folds the piece-usage histogram — i.e.
    // it verifies that what was WRITTEN, LOADED, and ENCODED equals a
    // from-scratch re-derivation of the same trainer.
    "text_unigram_encode_indexed" -> {
      val fr = 3 // rounds + 1
      sqlUnigramCtes(seedSize = 60, maxPieceLen = 3, rounds = 2,
        minUsage = 2L, maxWordLen = 8, finalSegRound = true) + ",\n" +
        s"""seg AS (SELECT substr(bt.w, bt.pos - B.pl + 1, B.pl) AS piece,
           |    bt.cnt AS cnt
           |  FROM bt$fr bt JOIN B$fr B ON B.w = bt.w AND B.pos = bt.pos
           |  WHERE bt.pos > 0)
           |SELECT piece, sum(cnt)::BIGINT AS n_uses FROM seg
           |GROUP BY 1 ORDER BY n_uses DESC, piece LIMIT 40""".stripMargin
    },

    // Shared smoothed-unigram CTE chain for the two cross-corpus
    // queries: identical add-one smoothing, identical op order.
    "text_token_shift" ->
      s"""WITH $SqlUnigramDists
         |SELECT tok, ca AS n_a, cb AS n_b,
         |  floor(ln(pa / pb) * 1000000.0 + 0.5) / 1000000.0 AS shift
         |FROM d ORDER BY abs(floor(ln(pa / pb) * 1000000.0 + 0.5) / 1000000.0) DESC, tok
         |LIMIT 10""".stripMargin,

    "text_corpus_divergence" ->
      s"""WITH $SqlUnigramDists,
         |q AS (SELECT na, nb, v,
         |  floor(pa * ln(pa / pb) * 1000000000000.0)::BIGINT AS qab,
         |  floor(pb * ln(pb / pa) * 1000000000000.0)::BIGINT AS qba,
         |  floor(pa * ln(pa / ((pa + pb) / 2.0)) * 1000000000000.0)::BIGINT AS qja,
         |  floor(pb * ln(pb / ((pa + pb) / 2.0)) * 1000000000000.0)::BIGINT AS qjb
         |  FROM d)
         |SELECT max(na) AS n_a, max(nb) AS n_b, max(v) AS vocab,
         |  floor(sum(qab)::BIGINT::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS kl_ab,
         |  floor(sum(qba)::BIGINT::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS kl_ba,
         |  floor((sum(qja)::BIGINT + sum(qjb)::BIGINT)::DOUBLE / 2.0 / 1000000000000.0
         |    * 1000000.0 + 0.5) / 1000000.0 AS js
         |FROM q""".stripMargin,

    // Same 64-token non-overlapping chunking as tokenChunks(64, 64); lang
    // per chunk from stopword-hit argmax over the chunk's token list.
    "text_lang_consistency" ->
      s"""WITH t AS (SELECT doc_id, toks, len(toks) AS n
         |  FROM (SELECT doc_id, $SqlToks AS toks FROM documents) WHERE len(toks) > 0),
         |c AS (SELECT doc_id,
         |  list_slice(toks, chunk_idx*64 + 1, chunk_idx*64 + 64) AS chunk
         |  FROM (SELECT doc_id, toks,
         |    unnest(range(0, CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 63) // 64 + 1 END)) AS chunk_idx
         |    FROM t)),
         |l AS (SELECT doc_id,
         |  CASE WHEN greatest(e, d, s, f) < 1 THEN 'und'
         |       WHEN e = greatest(e, d, s, f) THEN 'en'
         |       WHEN d = greatest(e, d, s, f) THEN 'de'
         |       WHEN s = greatest(e, d, s, f) THEN 'es'
         |       ELSE 'fr' END AS lang
         |  FROM (SELECT doc_id,
         |    ${sqlStopHits("chunk", text.EnStop)} AS e,
         |    ${sqlStopHits("chunk", text.DeStop)} AS d,
         |    ${sqlStopHits("chunk", text.EsStop)} AS s,
         |    ${sqlStopHits("chunk", text.FrStop)} AS f FROM c)),
         |g AS (SELECT doc_id, lang, count(*) AS c FROM l GROUP BY doc_id, lang),
         |m AS (SELECT doc_id, lang, c,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rk,
         |  (sum(c) OVER (PARTITION BY doc_id))::BIGINT AS n_chunks,
         |  count(*) OVER (PARTITION BY doc_id) AS n_langs FROM g)
         |SELECT doc_id, n_chunks, n_langs, lang AS major_lang,
         |  floor(c * 10000.0 / n_chunks + 0.5) / 10000.0 AS consistency
         |FROM m WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // Same rule order as text.redactPii: email, url, ip, card-run, phone.
    "text_redact" ->
      s"""SELECT doc_id, md5(
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(text, '${text.EmailPattern}', '<email>', 'g'),
         |          '${text.UrlPattern}', '<url>', 'g'),
         |        '${text.Ipv4Pattern}', '<ip>', 'g'),
         |      '${text.LongDigitPattern}', '<number>', 'g'),
         |    '${text.PhonePattern}', '<phone>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Ranking is on the ROUNDED score, so both engines agree at ulp ties.
    "text_tfidf_topterms" ->
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS word FROM documents),
         |tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf FROM t GROUP BY 1, 2),
         |dfs AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |sc AS (SELECT doc_id, word,
         |  floor(tf * ln(((SELECT n FROM n) + 1.0) / (df + 1.0)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS score
         |  FROM tf JOIN dfs USING (word)),
         |r AS (SELECT doc_id, word, score, row_number() OVER (
         |  PARTITION BY doc_id ORDER BY score DESC, word) AS rk FROM sc)
         |SELECT doc_id, word AS term, score, rk FROM r WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin,

    "text_len_quantiles" ->
      """SELECT lang, count(*) AS n,
        |  floor(quantile_cont(n_chars, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(n_chars, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality_langid" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  least(len(toks)::DOUBLE / 50.0, 1.0) AS content,
         |  1.0 - least((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 4.0, 1.0) AS clean,
         |  least((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 4.0, 1.0) AS prose,
         |  ${sqlStopHits("toks", text.EnStop)} AS en_hits,
         |  ${sqlStopHits("toks", text.DeStop)} AS de_hits,
         |  ${sqlStopHits("toks", text.EsStop)} AS es_hits,
         |  ${sqlStopHits("toks", text.FrStop)} AS fr_hits
         |FROM t)
         |SELECT doc_id,
         |  floor((content * 0.4 + clean * 0.3 + prose * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) < 1 THEN 'und'
         |       WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM q ORDER BY doc_id""".stripMargin,

    // Quality replicated from the proven text_quality_langid fragments;
    // integer means via // (both engines floor-divide exact sums).
    "pipeline_corpus_report" ->
      s"""WITH t AS (SELECT lang, source, n_chars, text, $SqlToks AS toks FROM documents),
         |q AS (SELECT lang, source, n_chars, len(toks)::BIGINT AS n_toks,
         |  floor((least(len(toks)::DOUBLE / 50.0, 1.0) * 0.4
         |    + (1.0 - least((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 4.0, 1.0)) * 0.3
         |    + least((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 4.0, 1.0) * 0.3) * 10000.0 + 0.5)::BIGINT AS q4
         |  FROM t)
         |SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
         |  sum(n_toks)::BIGINT AS n_tokens,
         |  (sum(q4) // count(*))::BIGINT AS mean_quality_4dp,
         |  sum(CASE WHEN q4 >= 5000 THEN 1 ELSE 0 END)::BIGINT AS hi_quality_docs,
         |  (sum(n_chars) // count(*))::BIGINT AS mean_chars
         |FROM q GROUP BY lang ORDER BY lang""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |  i -> array_to_string(list_slice(toks, i, i+1), ' '))) AS g FROM t WHERE len(toks) >= 2),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
         |m2 AS (SELECT doc_id, max(c * len(g)) AS topmass FROM c2 GROUP BY 1),
         |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |  i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS g FROM t WHERE len(toks) >= 3),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
         |m3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c * len(g) ELSE 0 END) AS dupmass FROM c3 GROUP BY 1),
         |ln AS (SELECT doc_id, list_filter(list_transform(string_split(text, chr(10)),
         |  l -> trim(l)), l -> l != '') AS ls FROM documents),
         |lf AS (SELECT doc_id, CASE WHEN len(ls) > 0
         |  THEN (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) ELSE 0.0 END AS dlf FROM ln),
         |v AS (SELECT d.doc_id,
         |  CASE WHEN len(d.text) > 0 THEN coalesce(m2.topmass, 0)::DOUBLE / len(d.text) ELSE 0.0 END AS top2,
         |  CASE WHEN len(d.text) > 0 THEN coalesce(m3.dupmass, 0)::DOUBLE / len(d.text) ELSE 0.0 END AS dup3,
         |  lf.dlf AS dlf
         |  FROM documents d LEFT JOIN m2 ON d.doc_id = m2.doc_id
         |  LEFT JOIN m3 ON d.doc_id = m3.doc_id JOIN lf ON d.doc_id = lf.doc_id)
         |SELECT doc_id,
         |  floor(top2 * 10000.0 + 0.5) / 10000.0 AS top2_frac,
         |  floor(dup3 * 10000.0 + 0.5) / 10000.0 AS dup3_frac,
         |  floor(dlf * 10000.0 + 0.5) / 10000.0 AS dup_line_frac,
         |  (dlf <= 0.3 AND top2 <= 0.2 AND dup3 <= 0.6)::INT AS keep
         |FROM v ORDER BY doc_id""".stripMargin,

    "group_topk" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
         |q AS (SELECT doc_id,
         |  least(len(toks)::DOUBLE / 50.0, 1.0) AS content,
         |  1.0 - least((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 4.0, 1.0) AS clean,
         |  least((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 4.0, 1.0) AS prose,
         |  ${sqlStopHits("toks", text.EnStop)} AS en_hits,
         |  ${sqlStopHits("toks", text.DeStop)} AS de_hits,
         |  ${sqlStopHits("toks", text.EsStop)} AS es_hits,
         |  ${sqlStopHits("toks", text.FrStop)} AS fr_hits
         |FROM t),
         |v AS (SELECT doc_id,
         |  floor((content * 0.4 + clean * 0.3 + prose * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) < 1 THEN 'und'
         |       WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
         |       ELSE 'fr' END AS lang
         |FROM q),
         |r AS (SELECT doc_id, lang, quality,
         |  row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rnk FROM v)
         |SELECT doc_id, lang, quality, rnk FROM r WHERE rnk <= 3
         |ORDER BY lang, rnk""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(text) AS fp128,
         |  list_min(list_transform(range(1, length(text) - 6), i -> ${hashing.sqlH32("substr(text, i, 8)")})) AS fp_shingle
         |FROM documents ORDER BY doc_id""".stripMargin,

    "decontam_overlap" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
         |  i -> array_to_string(list_slice(toks, i, i + 7), ' '))) AS grams
         |  FROM t WHERE len(toks) >= 8),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
         |tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 != 0)
         |SELECT doc_id, count(*) AS hits FROM tg JOIN bg USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same 63-bit-word packing over the same affine family; bit_or
    // aggregate onto the full 64-word spine.
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
         |FROM range(0, 64) s(word) LEFT JOIN w USING (word) ORDER BY word""".stripMargin,

    // The same bloom rebuilt in SQL, probed gram-by-gram: a gram is a
    // member iff all 3 of its bits are set — false positives reproduce
    // exactly (same public hash family).
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
         |ORDER BY doc_id""".stripMargin,

    // Complement of decontam_bloom at minHits=1: train docs with ZERO
    // bloom-member grams (short docs have no grams and survive).
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
         |ORDER BY doc_id""".stripMargin,

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
         |ORDER BY train_id, bench_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp128, min(doc_id) AS keep_id, count(*) AS group_size
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH g AS ($SqlGrams),
         |hsv AS (SELECT doc_id, list_transform(grams, s -> ${hashing.sqlH32("s")}) AS hs FROM g)
         |SELECT doc_id, ${(0 until 4).map(j =>
        s"list_min(list_transform(hs, h -> ${hashing.sqlAffine("h", j)})) AS m$j").mkString(", ")}
         |FROM hsv ORDER BY doc_id""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH $SqlMinhashPairCtes
         |SELECT id_a, id_b, floor(jacc * 10000.0 + 0.5) / 10000.0 AS jacc
         |FROM mp ORDER BY id_a, id_b""".stripMargin,

    // The full-pair CTE chain restricted to straddling pairs IS the
    // incremental result: candidate generation (shared band key) and
    // rerank are identical whether the non-batch side pairs among itself
    // or not — corpus-side ids < 400, batch side >= 400.
    "dedup_incremental" ->
      s"""WITH $SqlMinhashPairCtes
         |SELECT id_a AS corpus_id, id_b AS new_id,
         |  floor(jacc * 10000.0 + 0.5) / 10000.0 AS jacc
         |FROM mp WHERE id_a < 400 AND id_b >= 400
         |ORDER BY corpus_id, new_id""".stripMargin,

    // transitive closure via recursive CTE = the oracle for the
    // large-star/small-star connected components
    "dedup_cluster" ->
      s"""WITH RECURSIVE $SqlMinhashPairCtes,
         |e AS (SELECT id_a AS u, id_b AS v FROM mp
         |      UNION SELECT id_b, id_a FROM mp),
         |r AS (SELECT u, v FROM e
         |      UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM r GROUP BY u)
         |SELECT doc_id, rep_id, (doc_id = rep_id)::INT AS keep
         |FROM lbl ORDER BY doc_id""".stripMargin,

    // Same connected components, one weight row per component rep;
    // un-clustered docs implicitly keep weight 1 downstream.
    "dedup_cluster_weights" ->
      s"""WITH RECURSIVE $SqlMinhashPairCtes,
         |e AS (SELECT id_a AS u, id_b AS v FROM mp
         |      UNION SELECT id_b, id_a FROM mp),
         |r AS (SELECT u, v FROM e
         |      UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM r GROUP BY u)
         |SELECT rep_id, count(*)::BIGINT AS weight
         |FROM lbl GROUP BY rep_id ORDER BY rep_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ${hashing.sqlH32("tk")} AS hv FROM tok),
         |b AS (SELECT doc_id, ${(0 until 16).map(j =>
        s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")}
         |FROM h GROUP BY doc_id)
         |SELECT doc_id, (${(0 until 16).map(j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")})::BIGINT AS simhash
         |FROM b ORDER BY doc_id""".stripMargin,

    // 64-bit signature carried as two unsigned 32-bit halves (lo = bits
    // 0-31 voted by h32, hi = bits 32-63 voted by the md5's second word)
    // so no value ever touches the BIGINT sign bit; hamming = popcount of
    // both halves' xor. Block keys q0..q3 = (lo&65535, lo>>16, hi&65535,
    // hi>>16), matching shiftrightunsigned on the packed Spark long.
    "dedup_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ${hashing.sqlH32("tk")} AS hv, ${hashing.sqlH32b("tk")} AS hv2 FROM tok),
         |b AS (SELECT doc_id, ${(0 until 64).map(j =>
        if (j < 32) s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
        else s"sum(CASE WHEN (hv2 >> ${j - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")}
         |FROM h GROUP BY doc_id),
         |sh AS (SELECT doc_id,
         |  (${(0 until 32).map(j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")})::BIGINT AS lo,
         |  (${(32 until 64).map(j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << (j - 32)} ELSE 0 END)").mkString(" + ")})::BIGINT AS hi FROM b),
         |bd AS (SELECT doc_id, lo, hi, q,
         |  CASE q WHEN 0 THEN lo & 65535 WHEN 1 THEN lo >> 16
         |         WHEN 2 THEN hi & 65535 ELSE hi >> 16 END AS key
         |  FROM sh, range(0, 4) r(q)),
         |c AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |  (bit_count(xor(a.lo, b2.lo)) + bit_count(xor(a.hi, b2.hi)))::INT AS hamming
         |  FROM bd a JOIN bd b2 ON a.q = b2.q AND a.key = b2.key AND a.doc_id < b2.doc_id)
         |SELECT id_a, id_b, hamming FROM c WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_emb_neardup" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sg AS (SELECT vec_id, e, ${(0 until 4).map(t =>
        s"${sqlLshSig(t, 16, 64)} AS sig$t").mkString(", ")} FROM s),
         |bd AS (${(0 until 4).map(t =>
        s"SELECT vec_id, $t AS t, sig$t AS key FROM sg").mkString("\n       UNION ALL ")}),
         |ok AS (SELECT t, key FROM (SELECT t, key, count(*) AS c FROM bd GROUP BY 1, 2)
         |       WHERE c <= 256),
         |bdo AS (SELECT bd.vec_id, bd.t, bd.key FROM bd JOIN ok USING (t, key)),
         |c AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bdo a JOIN bdo b ON a.t = b.t AND a.key = b.key AND a.vec_id < b.vec_id),
         |p AS (SELECT id_a, id_b,
         |  list_dot_product(sa.e, sb.e)
         |  * (CASE WHEN list_dot_product(sa.e, sa.e) > 0 THEN 1.0/sqrt(list_dot_product(sa.e, sa.e)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(sb.e, sb.e) > 0 THEN 1.0/sqrt(list_dot_product(sb.e, sb.e)) ELSE 0.0 END) AS cos
         |  FROM c JOIN s sa ON c.id_a = sa.vec_id JOIN s sb ON c.id_b = sb.vec_id)
         |SELECT id_a, id_b, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM p WHERE cos >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q1, 0, 6)}),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,

    // Per query: the single-query oracle form with a query_id tag,
    // unioned — the Spark side must reproduce it from ONE shared scan.
    "ann_lsh_batch" -> {
      def one(qid: Int, q: Seq[Double]) =
        s"""SELECT $qid::BIGINT AS query_id, vec_id, score FROM (
           |  SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score FROM s
           |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(q, 0, 6)}
           |  ORDER BY score DESC, vec_id LIMIT 5)""".stripMargin
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
         |SELECT query_id, vec_id, score FROM (
         |${one(0, Q1)}
         |UNION ALL
         |${one(1, Q2)})
         |ORDER BY query_id, score DESC, vec_id""".stripMargin
    },

    // Fixed-point component sums (exact integers) divided once — the
    // same two double ops in the same order as the Spark plan.
    "vec_label_centroids" ->
      s"""WITH s AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |x AS (SELECT label, i AS pos, floor(e[i + 1] * 10000000.0)::BIGINT AS q
         |  FROM s, range(0, 64) r(i)),
         |m AS (SELECT label, pos, sum(q)::DOUBLE / (10000000.0::DOUBLE * count(*)) AS mean,
         |  count(*) AS n FROM x GROUP BY label, pos)
         |SELECT label, pos, floor(mean * 10000.0 + 0.5) / 10000.0 AS mean, n
         |FROM m ORDER BY label, pos""".stripMargin,

    // Per query: exact top-10 CTE, bucket top-10 CTE, one-row hit count;
    // recall = hits / k (single IEEE division, identical both engines).
    "ann_recall_at_k" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |ex0 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q1))} AS score
         |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
         |ap0 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q1))} AS score
         |  FROM s WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q1, 0, 6)}
         |  ORDER BY score DESC, vec_id LIMIT 10)),
         |h0 AS (SELECT 0 AS q_idx, count(*) AS hits FROM ex0 JOIN ap0 USING (vec_id)),
         |ex1 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q2))} AS score
         |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
         |ap1 AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", Q2))} AS score
         |  FROM s WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q2, 0, 6)}
         |  ORDER BY score DESC, vec_id LIMIT 10)),
         |h1 AS (SELECT 1 AS q_idx, count(*) AS hits FROM ex1 JOIN ap1 USING (vec_id))
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin,

    // Per query: exact top-10 vs the rp two-stage (rounded projected
    // cosine pool of 40 with id tiebreak, exact rerank to 10) — the
    // matrix rebuilt from the same ±1 literals the build persisted.
    "ann_rp_recall" -> {
      val p = vectors.rpMatrix(64, 16)
      val projE = p.map(row => s"list_dot_product(e, ${sqlVec(row)})")
        .mkString("[", ", ", "]")
      def stages(i: Int, q: Seq[Double]): String = {
        val pq = vectors.projectOf(q, p)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e, ${r4(sqlCosineOn("p", pq))} AS rp_score
           |  FROM (SELECT vec_id, e, $projE AS p FROM s)
           |  ORDER BY rp_score DESC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    },

    "ann_matryoshka_recall" -> {
      def stages(i: Int, q: Seq[Double]): String = {
        val qp = q.take(16)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e, ${r4(sqlCosineOn("p", qp))} AS mrl_score
           |  FROM (SELECT vec_id, e, list_slice(e, 1, 16) AS p FROM s)
           |  ORDER BY mrl_score DESC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    },

    // The probe set is computed by the same driver-side margin sort the
    // Spark path uses, injected as literals.
    "ann_lsh_multiprobe_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) IN (${ann.lshProbeSigsOf(Q1, 0, 6, 4).mkString(", ")})),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,

    "ann_lsh_part_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e FROM s
         |  WHERE (${sqlLshSig(0, 6, 64)}) = ${ann.lshSignatureOf(Q2, 0, 6)}),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q2))} AS score FROM b)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,

    "ann_ivf_topk" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |probe AS (SELECT cid FROM cent
         |  ORDER BY ${sqlL2Between("e", sqlVec(Q1))}, cid LIMIT 4),
         |assign AS (SELECT vec_id, label, e FROM (
         |  SELECT s.vec_id, s.label, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1 AND cid IN (SELECT cid FROM probe)),
         |sc AS (SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM assign)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Shared centroid/assignment CTEs; per-query probe + top-k branches
    // tagged with query_id and unioned.
    "ann_ivf_batch" -> {
      def branch(qid: Int, q: Seq[Double]) =
        s"""SELECT $qid::BIGINT AS query_id, vec_id, score FROM (
           |  SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score FROM assign
           |  WHERE cid IN (SELECT cid FROM cent
           |    ORDER BY ${sqlL2Between("e", sqlVec(q))}, cid LIMIT 4)
           |  ORDER BY score DESC, vec_id LIMIT 10)""".stripMargin
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |assign AS (SELECT vec_id, e, cid FROM (
         |  SELECT s.vec_id, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1)
         |SELECT query_id, vec_id, score FROM (
         |${branch(0, Q1)}
         |UNION ALL
         |${branch(1, Q2)})
         |ORDER BY query_id, score DESC, vec_id""".stripMargin
    },

    "ann_ivf_recall" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |${ivfRecallCtes(0, Q1)},
         |${ivfRecallCtes(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin,

    "vec_batch_perquery" ->
      s"""WITH s AS (
         |  SELECT 0 AS q_idx, vec_id, label, ${r4(sqlCosine(Q1))} AS score FROM embeddings
         |  UNION ALL
         |  SELECT 1, vec_id, label, ${r4(sqlCosine(Q2))} FROM embeddings
         |),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_idx
         |  ORDER BY score DESC, vec_id) AS rk FROM s)
         |SELECT q_idx, vec_id, score, label FROM r WHERE rk <= 5
         |ORDER BY q_idx, score DESC, vec_id""".stripMargin,

    "vec_l1_topk" ->
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    ${r4(s"list_sum(list_transform(list_zip($E, ${sqlVec(Q1)}), x -> abs(x[1]-x[2])))")} AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin,

    // Sign-binarize both sides, count differing positions.
    "vec_hamming_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
    },

    // Deliberately the UNPACKED form: per-coordinate sign-diff count.
    // The Spark plan scores packed 63-bit words via XOR+popcount; value
    // equality across the two formulations is the point of the check.
    "vec_hamming_packed_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH s AS (
         |  SELECT vec_id, label,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS score
         |  FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score ASC, vec_id LIMIT 10""".stripMargin
    },

    // Active-dimension sets via a literal index spine (no index lambdas);
    // both sides are distinct sets, so |A∪B| = |A| + |B| - |A∩B|.
    "vec_jaccard_topk" -> {
      val idx = (0 until 64).map(_.toDouble)
      val qset = Q1.zipWithIndex.collect { case (x, i) if x > 0 => i.toDouble }
      s"""WITH a AS (
         |  SELECT vec_id, label,
         |    list_filter(list_transform(list_zip($E, ${sqlVec(idx)}),
         |      p -> CASE WHEN p[1] > 0 THEN p[2] END), v -> v IS NOT NULL) AS dims
         |  FROM embeddings
         |), s AS (
         |  SELECT vec_id, label,
         |    len(list_intersect(dims, ${sqlVec(qset)})) AS i,
         |    len(dims) + ${qset.length} - len(list_intersect(dims, ${sqlVec(qset)})) AS u
         |  FROM a
         |), sc AS (
         |  SELECT vec_id, label,
         |    CASE WHEN u = 0 THEN 0.0 ELSE ${r4("i * 1.0 / u")} END AS score
         |  FROM s
         |)
         |SELECT vec_id, score, label FROM sc
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    "vec_rp_topk" -> {
      val p = vectors.rpMatrix(64, 16)
      val pq = vectors.projectOf(Q1, p)
      // Projected store vector rebuilt in SQL from the same ±1 literal
      // rows; the projected QUERY is the driver-computed double literal
      // list the Spark plan also embeds.
      val projE = p.map(row => s"list_dot_product($E, ${sqlVec(row)})")
        .mkString("[", ", ", "]")
      s"""WITH pe AS (
         |  SELECT vec_id, label, $projE AS p FROM embeddings
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("p", pq))} AS score FROM pe
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    // Two deterministic stages: candidate pool by QUANTIZED projected
    // cosine + id tiebreak (matrix rebuilt from the same ±1 literals the
    // build persisted), then exact rerank — both engines pick the same
    // 40 candidates, so the same top 10.
    "index_rp_topk" -> {
      val p = vectors.rpMatrix(64, 16)
      val pq = vectors.projectOf(Q1, p)
      val projE = p.map(row => s"list_dot_product($E, ${sqlVec(row)})")
        .mkString("[", ", ", "]")
      s"""WITH pe AS (
         |  SELECT vec_id, label, $E AS e, $projE AS p FROM embeddings
         |), c AS (
         |  SELECT vec_id, label, e, ${r4(sqlCosineOn("p", pq))} AS rp_score FROM pe
         |  ORDER BY rp_score DESC, vec_id LIMIT 40
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM c
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    "vec_matryoshka_topk" -> {
      val qp = Q1.take(16)
      s"""WITH pe AS (
         |  SELECT vec_id, label, $E AS e, list_slice($E, 1, 16) AS p FROM embeddings
         |), c AS (
         |  SELECT vec_id, label, e, ${r4(sqlCosineOn("p", qp))} AS mrl_score FROM pe
         |  ORDER BY mrl_score DESC, vec_id LIMIT 40
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM c
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    // Coarse score computed the UNPACKED way (per-coordinate sign
    // mismatch count) against the packed-kernel plan.
    "vec_binary_topk" -> {
      val qb = Q1.map(x => if (x >= 0) 1.0 else 0.0)
      s"""WITH h AS (
         |  SELECT vec_id, label, $E AS e,
         |    list_sum(list_transform(list_zip(
         |      list_transform($E, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
         |      ${sqlVec(qb)}),
         |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS ham
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, label, e FROM h ORDER BY ham ASC, vec_id LIMIT 40
         |), s AS (
         |  SELECT vec_id, label, ${r4(sqlCosineOn("e", Q1))} AS score FROM c
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    "ann_binary_recall" -> {
      def stages(i: Int, q: Seq[Double]): String = {
        val qb = q.map(x => if (x >= 0) 1.0 else 0.0)
        s"""ex$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM s ORDER BY score DESC, vec_id LIMIT 10)),
           |pool$i AS (SELECT vec_id, e FROM (
           |  SELECT vec_id, e,
           |    list_sum(list_transform(list_zip(
           |      list_transform(e, x -> CASE WHEN x >= 0 THEN 1.0 ELSE 0.0 END),
           |      ${sqlVec(qb)}),
           |      p -> CASE WHEN p[1] = p[2] THEN 0.0 ELSE 1.0 END)) AS ham
           |  FROM s ORDER BY ham ASC, vec_id LIMIT 40)),
           |ap$i AS (SELECT vec_id FROM (SELECT vec_id, ${r4(sqlCosineOn("e", q))} AS score
           |  FROM pool$i ORDER BY score DESC, vec_id LIMIT 10)),
           |h$i AS (SELECT $i AS q_idx, count(*) AS hits FROM ex$i JOIN ap$i USING (vec_id))""".stripMargin
      }
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${stages(0, Q1)},
         |${stages(1, Q2)}
         |SELECT q_idx, hits, hits::DOUBLE / 10.0::DOUBLE AS recall
         |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) ORDER BY q_idx""".stripMargin
    },

    // Gonzalez greedy unrolled: d_r = least(d_{r-1}, quantized pairwise
    // L2 to the newest center), winner by (d desc, id asc) — exactly the
    // Spark op's per-round computation.
    "ann_kcenter_select" -> {
      val k = 6
      val head =
        s"""WITH e AS (SELECT vec_id, $E AS v FROM embeddings),
           |c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
           |d1 AS (SELECT e.vec_id, e.v, ${r4(sqlL2Between("e.v", "c.v"))} AS d
           |  FROM e, c0 c),
           |c1 AS (SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
      val rounds = (2 until k).map(r =>
        s""",
           |d$r AS (SELECT d.vec_id, d.v,
           |  least(d.d, ${r4(sqlL2Between("d.v", "c.v"))}) AS d
           |  FROM d${r - 1} d, c${r - 1} c),
           |c$r AS (SELECT vec_id, v, d FROM d$r ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin).mkString
      val sel = "SELECT 0 AS round, vec_id AS center_id, 0.0::DOUBLE AS dist_sq FROM c0" +
        (1 until k).map(r =>
          s" UNION ALL SELECT $r, vec_id, d FROM c$r").mkString
      s"$head$rounds\n$sel ORDER BY round"
    },

    "vec_quant_dot_topk" -> {
      val (qq, qs) = graft.ops.quant.quantizeQuery(Q1)
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label, e,
         |  coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) / 127.0 AS qs FROM s),
         |v AS (SELECT vec_id, label, qs,
         |  CASE WHEN qs > 0 THEN list_transform(e, x -> least(greatest(floor(x/qs + 0.5), -127.0), 127.0))
         |       ELSE list_transform(e, x -> 0.0) END AS qv FROM sc),
         |p AS (SELECT vec_id, label,
         |  floor((list_dot_product(qv, ${qq.map(_.toDouble).mkString("[", ", ", "]::DOUBLE[]")}) * qs * $qs) * 10000.0 + 0.5) / 10000.0 AS score
         |FROM v)
         |SELECT vec_id, score, label FROM p
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    "ann_ivfpq_topk" -> {
      // IVF probe CTEs (as in ann_ivf_topk) compose with the PQ
      // assignment CTEs (as in vec_pq_topk), restricted to the probed
      // lists — the SQL mirror of partition pruning + ADC scoring.
      val subs = (0 until 4).map { si =>
        val lo = si * 16 + 1
        def sl(e: String) = s"list_slice($e, $lo, ${lo + 15})"
        s"""a$si AS (SELECT vec_id, c AS c$si FROM (
           |  SELECT sel.vec_id, cb.c, row_number() OVER (PARTITION BY sel.vec_id
           |    ORDER BY ${sqlL2Between(sl("sel.e"), sl("cb.e"))}, cb.c) AS rn FROM sel, cb) WHERE rn = 1),
           |d$si AS (SELECT a$si.vec_id, list_dot_product(${sl("cb.e")}, ${sl(sqlVec(Q1))}) AS d
           |  FROM a$si JOIN cb ON a$si.c$si = cb.c)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |probe AS (SELECT cid FROM cent
         |  ORDER BY ${sqlL2Between("e", sqlVec(Q1))}, cid LIMIT 4),
         |sel AS (SELECT vec_id, label, e FROM (
         |  SELECT s.vec_id, s.label, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1 AND cid IN (SELECT cid FROM probe)),
         |$subs,
         |sc AS (SELECT sel.vec_id, sel.label, floor((d0.d + d1.d + d2.d + d3.d) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM sel JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
         |         JOIN d2 USING (vec_id) JOIN d3 USING (vec_id))
         |SELECT vec_id, score, label FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    "vec_pq_topk" -> {
      // Per-subspace CTEs: a<s> = nearest-codeword assignment (argmin L2,
      // ties to the lower code id — same rn idiom as ann_ivf_topk), d<s> =
      // that codeword's dot with the query's subspace slice. DuckDB
      // derives the codebooks from the same 16 lowest-id rows the Spark
      // plan seeds from, so both engines compute identical doubles.
      val subs = (0 until 4).map { si =>
        val lo = si * 16 + 1
        def sl(e: String) = s"list_slice($e, $lo, ${lo + 15})"
        s"""a$si AS (SELECT vec_id, c AS c$si FROM (
           |  SELECT s.vec_id, cb.c, row_number() OVER (PARTITION BY s.vec_id
           |    ORDER BY ${sqlL2Between(sl("s.e"), sl("cb.e"))}, cb.c) AS rn FROM s, cb) WHERE rn = 1),
           |d$si AS (SELECT a$si.vec_id, list_dot_product(${sl("cb.e")}, ${sl(sqlVec(Q1))}) AS d
           |  FROM a$si JOIN cb ON a$si.c$si = cb.c)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |$subs,
         |sc AS (SELECT s.vec_id, s.label, floor((d0.d + d1.d + d2.d + d3.d) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM s JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
         |         JOIN d2 USING (vec_id) JOIN d3 USING (vec_id))
         |SELECT vec_id, score, label FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    // Recursive-CTE mirror of the driver-side greedy: base case = highest
    // relevance; each step's LATERAL argmax scores the not-yet-selected
    // pool by lambda·rel − (1−lambda)·max-sim-to-selected. The lambda
    // constants are interpolated from the SAME Scala doubles the driver
    // uses (1−0.7 is NOT the double 0.3 — interpolation keeps both
    // engines on identical bits).
    "retrieval_mmr_topk" -> {
      val lam = 0.7
      s"""WITH RECURSIVE pool AS (
         |  SELECT vec_id, e, list_dot_product(e, ${sqlVec(Q1)}) * inv * ${vectors.invNormOf(Q1)} AS rel, inv
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    (CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
         |      THEN 1.0/sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
         |      ELSE 0.0 END) AS inv FROM embeddings)
         |  ORDER BY rel DESC, vec_id LIMIT 50),
         |sel(step, sel_ids, pick_id, pick_score) AS (
         |  SELECT 1, [p.vec_id], p.vec_id, p.rel
         |  FROM (SELECT * FROM pool ORDER BY rel DESC, vec_id LIMIT 1) p
         |  UNION ALL
         |  SELECT s.step + 1, list_append(s.sel_ids, c.vec_id), c.vec_id, c.mmr
         |  FROM sel s, LATERAL (
         |    SELECT p.vec_id, $lam * p.rel - ${1.0 - lam} * (
         |        SELECT max(list_dot_product(p.e, p2.e) * p.inv * p2.inv)
         |        FROM pool p2 WHERE list_contains(s.sel_ids, p2.vec_id)) AS mmr
         |    FROM pool p WHERE NOT list_contains(s.sel_ids, p.vec_id)
         |    ORDER BY mmr DESC, p.vec_id LIMIT 1) c
         |  WHERE s.step < 10)
         |SELECT step AS mmr_rank, pick_id AS vec_id, round(pick_score, 4) + 0.0 AS mmr_score
         |FROM sel ORDER BY mmr_rank""".stripMargin
    },

    "vec_outlier" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 8)),
         |nd AS (SELECT vec_id, label, floor(min(${sqlL2Between("s.e", "cent.e")}) * 10000.0 + 0.5) / 10000.0 AS centroid_dist
         |  FROM s, cent GROUP BY 1, 2)
         |SELECT vec_id, centroid_dist, label FROM nd
         |ORDER BY centroid_dist DESC, vec_id LIMIT 20""".stripMargin,

    "dedup_semantic" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 8)),
         |assign AS (SELECT vec_id, e, cid AS cluster_id FROM (
         |  SELECT s.vec_id, s.e, c.cid,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1),
         |p AS (SELECT b.vec_id AS dropped,
         |  list_dot_product(a.e, b.e)
         |  * (CASE WHEN list_dot_product(a.e, a.e) > 0 THEN 1.0/sqrt(list_dot_product(a.e, a.e)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(b.e, b.e) > 0 THEN 1.0/sqrt(list_dot_product(b.e, b.e)) ELSE 0.0 END) AS cos
         |  FROM assign a JOIN assign b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id)
         |SELECT vec_id, cluster_id FROM assign
         |WHERE vec_id NOT IN (SELECT dropped FROM p WHERE cos >= 0.4)
         |ORDER BY vec_id""".stripMargin,

    "text_unigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
         |v AS (SELECT tok, sum(tf)::BIGINT AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(ctf)::BIGINT AS n FROM v),
         |c AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         |  sum(floor(tf * ln(ctf::DOUBLE / (SELECT n FROM tot)::DOUBLE) * 1000000.0)::BIGINT) AS q
         |  FROM tf JOIN v USING (tok) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  floor(q::DOUBLE / 1000000.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS logprob
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_lm_filter" ->
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
         |v AS (SELECT tok, sum(tf)::BIGINT AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT sum(ctf)::BIGINT AS n FROM v),
         |c AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         |  sum(floor(tf * ln(ctf::DOUBLE / (SELECT n FROM tot)::DOUBLE) * 1000000.0)::BIGINT) AS q
         |  FROM tf JOIN v USING (tok) GROUP BY 1),
         |lp AS (SELECT doc_id, n_tokens,
         |  floor(q::DOUBLE / 1000000.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS logprob
         |  FROM c)
         |SELECT doc_id, n_tokens, logprob,
         |  (logprob >= -3.42::DOUBLE)::INTEGER AS keep
         |FROM lp ORDER BY doc_id""".stripMargin,

    "sample_top_frac" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cf AS (SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM ch GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars,
        |  sum(floor(cnt * ln(cnt::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS qa
        |  FROM cf GROUP BY 1),
        |ent AS (SELECT doc_id, n_chars,
        |  floor(-(qa::DOUBLE / 1000000.0 - n_chars::DOUBLE * ln(n_chars::DOUBLE))
        |    / n_chars::DOUBLE * 10000.0 + 0.5) / 10000.0 AS entropy FROM a),
        |e AS (SELECT doc_id, n_chars, entropy,
        |  floor(entropy * 10000.0 + 0.5)::BIGINT AS gv FROM ent),
        |g AS (SELECT gv, count(*)::BIGINT AS cnt FROM e GROUP BY 1),
        |c AS (SELECT gv, sum(cnt) OVER (ORDER BY gv DESC) AS ato,
        |  sum(cnt) OVER () AS total FROM g),
        |t AS (SELECT max(gv) AS thr FROM c
        |  WHERE ato >= (total * 250000 + 999999) // 1000000)
        |SELECT doc_id, n_chars, entropy FROM e, t WHERE gv >= thr
        |ORDER BY doc_id""".stripMargin,

    "text_lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |s AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::BIGINT AS n_types FROM t)
         |SELECT doc_id, n_tokens, n_types,
         |  floor(n_types::DOUBLE / n_tokens::DOUBLE * 10000.0 + 0.5) / 10000.0 AS ttr
         |FROM s WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin,

    "text_gopher_quality" ->
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
         |t AS (SELECT doc_id, text, $SqlToks AS toks FROM d),
         |s AS (SELECT doc_id, len(toks)::BIGINT AS n_words,
         |  coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS sum_len,
         |  len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
         |  len(list_filter(['the','be','to','of','and','that','have','with'],
         |    w -> list_contains(toks, w)))::BIGINT AS n_stop_hits,
         |  (length(text) - length(regexp_replace(text, '[#…]', '', 'g')))::BIGINT AS n_sym
         |  FROM t),
         |q AS (SELECT doc_id, n_words,
         |  CASE WHEN n_words > 0 THEN ${r4("sum_len::DOUBLE / n_words")} ELSE 0.0 END AS mean_word_len,
         |  CASE WHEN n_words > 0 THEN ${r4("n_alpha::DOUBLE / n_words")} ELSE 0.0 END AS alpha_frac,
         |  CASE WHEN n_words > 0 THEN ${r4("n_sym::DOUBLE / n_words")} ELSE 0.0 END AS symbol_ratio,
         |  n_stop_hits FROM s)
         |SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio, n_stop_hits,
         |  (n_words >= 20 AND n_words <= 100000
         |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |   AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1
         |   AND n_stop_hits >= 2)::INTEGER AS keep
         |FROM q ORDER BY doc_id""".stripMargin,

    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cf AS (SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM ch GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars,
        |  sum(floor(cnt * ln(cnt::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS qa
        |  FROM cf GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  floor(-(qa::DOUBLE / 1000000.0 - n_chars::DOUBLE * ln(n_chars::DOUBLE))
        |    / n_chars::DOUBLE * 10000.0 + 0.5) / 10000.0 AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,

    "text_quality_linear" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |s AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  coalesce(list_sum(list_transform(toks, tk ->
         |    list_extract([${LinWq.mkString(", ")}],
         |      ((${hashing.sqlH32("tk")}) % 64 + 1)::INTEGER))), 0)::BIGINT AS q
         |  FROM t),
         |sc AS (SELECT doc_id, n_tokens,
         |  floor((q::DOUBLE / 1000000.0 + (0.0)::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM s)
         |SELECT doc_id, n_tokens, score, (score >= (0.0)::DOUBLE)::INTEGER AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "text_dsir_weights" ->
      s"""WITH rt AS (SELECT doc_id, unnest($SqlToks) AS tok
         |  FROM documents WHERE doc_id % 7 <> 0),
         |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM rt GROUP BY 1, 2),
         |vr AS (SELECT tok, sum(tf)::BIGINT AS ctf_r FROM tf GROUP BY 1),
         |tt AS (SELECT unnest($SqlToks) AS tok
         |  FROM documents WHERE doc_id % 7 = 0),
         |vt AS (SELECT tok, count(*)::BIGINT AS ctf_t FROM tt GROUP BY 1),
         |un AS (SELECT coalesce(vr.tok, vt.tok) AS tok,
         |  coalesce(ctf_r, 0::BIGINT) AS ctf_r,
         |  coalesce(ctf_t, 0::BIGINT) AS ctf_t
         |  FROM vr FULL OUTER JOIN vt ON vr.tok = vt.tok),
         |tot AS (SELECT sum(ctf_r)::BIGINT AS n_r, sum(ctf_t)::BIGINT AS n_t,
         |  count(*)::BIGINT AS v FROM un),
         |c AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         |  sum(floor(tf * (ln((ctf_t + 1.0) / ((n_t + v)::DOUBLE))
         |            - ln((ctf_r + 1.0) / ((n_r + v)::DOUBLE))) * 1000000.0)::BIGINT) AS q
         |  FROM tf JOIN un USING (tok) CROSS JOIN tot GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  floor(q::DOUBLE / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS logw
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, toks FROM
         |  (SELECT doc_id, $SqlToks AS toks FROM documents) WHERE len(toks) >= 2),
         |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |  i -> [toks[i], toks[i+1]])) AS bg FROM t),
         |tf AS (SELECT doc_id, bg[1] AS t1, bg[2] AS t2, count(*)::BIGINT AS tf
         |  FROM b GROUP BY 1, 2, 3),
         |cb AS (SELECT t1, t2, sum(tf)::BIGINT AS cnt2 FROM tf GROUP BY 1, 2),
         |cp AS (SELECT t1, sum(cnt2)::BIGINT AS cnt1 FROM cb GROUP BY 1),
         |c AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
         |  sum(floor(tf * ln(cnt2::DOUBLE / cnt1::DOUBLE) * 1000000.0)::BIGINT) AS q
         |  FROM tf JOIN cb USING (t1, t2) JOIN cp USING (t1) GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  floor(q::DOUBLE / 1000000.0 / n_bigrams * 10000.0 + 0.5) / 10000.0 AS logprob
         |FROM c ORDER BY doc_id""".stripMargin,

    "sample_reservoir" ->
      s"""SELECT lang, doc_id, sample_rank FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${hashing.sqlH32("(doc_id::VARCHAR || '/res')")}, doc_id) AS sample_rank
         |  FROM documents) WHERE sample_rank <= 5
         |ORDER BY lang, sample_rank""".stripMargin,

    "sample_temperature" ->
      s"""WITH n AS (SELECT lang, count(*)::BIGINT AS n_in FROM documents GROUP BY 1),
         |m AS (SELECT min(n_in) AS n_min FROM n),
         |r AS (SELECT lang, n_in,
         |  pow(n_in::DOUBLE / (SELECT n_min FROM m)::DOUBLE, -0.5) AS rate FROM n),
         |kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
         |  WHERE ${hashing.sqlH32("(d.doc_id::VARCHAR || '/tmix')")}::DOUBLE < rate * 4294967296.0)
         |SELECT r.lang, r.n_in,
         |  (SELECT count(*) FROM kept k WHERE k.lang = r.lang)::BIGINT AS n_kept,
         |  floor(r.rate * 10000.0 + 0.5) / 10000.0 AS rate
         |FROM r ORDER BY r.lang""".stripMargin,

    "meta_string_filter" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE starts_with(source, 'src1') AND contains(text, 'spark')
        |  AND NOT ends_with(lang, 'h')
        |ORDER BY doc_id""".stripMargin,

    "meta_fuzzy_filter" ->
      """SELECT doc_id, source, lang, levenshtein(source, 'scr1') AS dist
        |FROM documents
        |WHERE levenshtein(source, 'scr1') <= 2 AND levenshtein(lang, 'eng') <= 1
        |ORDER BY doc_id""".stripMargin,

    "vec_full_pipeline" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlCosine(Q2))} AS score
         |  FROM embeddings WHERE label >= 3 AND label <= 7
         |)
         |SELECT vec_id, score, label FROM s WHERE score >= 0.05
         |ORDER BY score DESC, vec_id LIMIT 15""".stripMargin,

    "vec_takemax_l2" ->
      s"""WITH s AS (
         |  SELECT vec_id, label, ${r4(sqlL2sq(Q1))} AS score FROM embeddings
         |)
         |SELECT vec_id, score, label FROM s
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Layered min-after-previous-step CTEs — strict event-time ordering,
    // the same reach semantics as EventStream.funnel's stacked windows.
    "events_funnel" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM events GROUP BY user_id),
        |e1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= u.t0 GROUP BY e.user_id),
        |e2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN e1 ON e.user_id = e1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= e1.t1 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin,

    // Same kth-hash estimator, same JVM-derived scale constant.
    "events_distinct_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |  ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv FROM events),
         |r AS (SELECT event_type, hv, row_number() OVER (
         |  PARTITION BY event_type ORDER BY hv) AS rk FROM h),
         |t AS (SELECT event_type, count(*) AS n_min, max(hv) AS kth
         |  FROM r WHERE rk <= 64 GROUP BY event_type)
         |SELECT event_type, n_min,
         |  floor((CASE WHEN n_min < 64 THEN n_min::DOUBLE
         |    ELSE ${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE) END)
         |    * 10000.0 + 0.5) / 10000.0 AS distinct_est
         |FROM t ORDER BY event_type""".stripMargin,

    "events_kmv_overlap" ->
      s"""WITH av AS (SELECT DISTINCT ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
         |a AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
         |  FROM av) WHERE rk <= 64),
         |bv AS (SELECT DISTINCT ${hashing.sqlH63("(user_id::VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
         |b AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
         |  FROM bv) WHERE rk <= 64),
         |u AS (SELECT hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
         |  SELECT hv, 1 AS in_a, 0 AS in_b FROM a
         |  UNION ALL SELECT hv, 0 AS in_a, 1 AS in_b FROM b) GROUP BY hv),
         |r2 AS (SELECT hv, in_a, in_b, row_number() OVER (ORDER BY hv) AS rk FROM u),
         |t AS (SELECT count(*)::BIGINT AS n_min, max(hv) AS kth,
         |  sum(in_a * in_b)::BIGINT AS k_cap FROM r2 WHERE rk <= 64)
         |SELECT n_min, k_cap,
         |  floor((CASE WHEN n_min < 64 THEN n_min::DOUBLE
         |    ELSE ${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE) END)
         |    * 10000.0 + 0.5) / 10000.0 AS union_est,
         |  floor(k_cap::DOUBLE / n_min::DOUBLE * 10000.0 + 0.5) / 10000.0 AS jaccard,
         |  floor((CASE WHEN n_min < 64 THEN k_cap::DOUBLE
         |    ELSE (k_cap::DOUBLE / n_min::DOUBLE)
         |      * (${63.0 * 9223372036854775808.0} / (kth::DOUBLE + 1.0::DOUBLE)) END)
         |    * 10000.0 + 0.5) / 10000.0 AS intersect_est
         |FROM t""".stripMargin,

    "events_hll_users" ->
      s"""WITH $SqlHllRegs,
         |e AS (SELECT event_type,
         |  count(CASE WHEN rho = 0 THEN 1 END) AS n_zero,
         |  (sum(1::BIGINT << (40 - rho)))::BIGINT AS harmonic_fixed
         |  FROM reg GROUP BY 1)
         |SELECT event_type, n_zero, harmonic_fixed,
         |  floor((${sketch.hllEstimateNumerator(6)}::DOUBLE) / harmonic_fixed::DOUBLE
         |    * 10000.0 + 0.5) / 10000.0 AS hll_est
         |FROM e ORDER BY event_type""".stripMargin,

    // the oracle computes the sketch FROM SCRATCH over the whole corpus;
    // the Spark side merges two half-corpus sketches — hash-matching
    // register tables IS the merge law merge(hll(A), hll(B)) = hll(A∪B)
    "events_hll_merge" ->
      s"""WITH $SqlHllRegs
         |SELECT event_type, register, rho FROM reg
         |ORDER BY event_type, register""".stripMargin,

    "events_window_agg" ->
      """SELECT strftime(make_timestamp((floor(epoch(ts)/300)*300*1000000)::BIGINT),
        |         '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  sum(floor(value * 1000000.0)::BIGINT)::BIGINT AS sum_value_micros
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,

    // Each event expands to its len/slide = 2 overlapping window starts:
    // the aligned 5-minute slot and the one before it.
    "events_sliding_agg" ->
      """WITH m AS (SELECT event_type, value,
        |  (epoch_us(ts) // 300000000 - i) * 300 AS wstart_s
        |  FROM events, range(0, 2) r(i)),
        |w AS (SELECT strftime(make_timestamp(wstart_s * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  event_type, count(*) AS n_events,
        |  sum(floor(value * 1000000.0)::BIGINT)::BIGINT AS sum_value_micros
        |  FROM m GROUP BY 1, 2)
        |SELECT wstart, event_type, n_events, sum_value_micros
        |FROM w ORDER BY wstart, event_type""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM f)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    // Same islands as events_sessionize; session_window's end = last
    // event + gap.
    "events_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx FROM f)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS s_end,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, session_idx ORDER BY user_id, s_start""".stripMargin,

    "events_json_extract" ->
      """SELECT event_id, event_type, json_extract_string(props, '$.k')::INT AS k
        |FROM events WHERE json_extract_string(props, '$.k')::INT > 50
        |ORDER BY event_id""".stripMargin,

    "mm_features" ->
      s"""SELECT doc_id AS id, 'text' AS kind,
         |  octet_length(encode(text)) AS byte_len, md5(text) AS checksum,
         |  ${(0 until 4).map(i =>
        s"((('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT) / 255.0)::FLOAT AS e$i").mkString(", ")}
         |FROM documents ORDER BY id""".stripMargin,

    // Same salted-digest pixel chain and 63-bit comparison grid.
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
         |FROM p ORDER BY id""".stripMargin,

    // Same signature, same 16+16+16+15 block keys, same d<=3 rerank,
    // same seeded byte-identical copies.
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
         |ORDER BY id_a, id_b""".stripMargin,

    // identical oracle to mm_features: the typed mapPartitions decoder
    // must be row-equal to the expression path
    "mm_features_typed" ->
      s"""SELECT doc_id AS id, 'text' AS kind,
         |  octet_length(encode(text)) AS byte_len, md5(text) AS checksum,
         |  ${(0 until 4).map(i =>
        s"((('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT) / 255.0)::FLOAT AS e$i").mkString(", ")}
         |FROM documents ORDER BY id""".stripMargin,

    "mm_frames" ->
      """WITH f AS (SELECT doc_id AS id, u.i::INT AS frame_idx,
        |    substr(text, (u.i*64)::INT + 1, 64) AS fr
        |  FROM documents, unnest(range(0, ceil(length(text)/64.0)::BIGINT)) u(i))
        |SELECT id, frame_idx, md5(fr) AS frame_ck
        |FROM f WHERE frame_idx % 2 = 0 ORDER BY id, frame_idx""".stripMargin,

    "mm_frame_dedup" ->
      """WITH f AS (SELECT doc_id AS id,
        |    substr(text, (u.i*64)::INT + 1, 64) AS fr
        |  FROM documents, unnest(range(0, ceil(length(text)/64.0)::BIGINT)) u(i))
        |SELECT id, count(*)::BIGINT AS n_frames,
        |  count(DISTINCT md5(fr))::BIGINT AS n_distinct,
        |  (count(*) - count(DISTINCT md5(fr)))::BIGINT AS dup_frames
        |FROM f GROUP BY id ORDER BY id""".stripMargin,

    "rel_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity)::BIGINT AS sum_qty,
        |  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS revenue_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // The UNSALTED join — salting must be result-invisible.
    "rel_salted_join" ->
      """SELECT o_custkey, count(*) AS n_items, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "rel_join_topn" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS spend_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY spend_cents DESC, c_custkey LIMIT 10""".stripMargin,

    // The UNBUCKETED join — bucketing is a layout choice and must be
    // result-invisible, exactly like salting.
    "rel_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(floor(((l_extendedprice * (1 - l_discount)) * 100.0) + 0.5)::BIGINT)::BIGINT
        |    AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "ann_knn_graph" ->
      s"""WITH $SqlKnnCtes
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 3 ORDER BY src, rnk""".stripMargin,

    "graph_triangles" ->
      s"""WITH $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2)
         |SELECT count(*)::BIGINT AS n_triangles
         |FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin,

    "text_textrank" -> {
      val base = "((1000000 - 850000) * 1000000000000 // 1000000) // (SELECT n FROM nn)"
      val iterCtes = (0 until 3).map { i =>
        s"""c$i AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           |  FROM e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r${i + 1} AS (SELECT nodes.id,
           |  ($base + (850000 * coalesce(c.s, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes LEFT JOIN c$i c USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |p1 AS (SELECT least(ts[i], ts[i+1]) AS a, greatest(ts[i], ts[i+1]) AS b
         |  FROM tk, unnest(range(1, len(ts))) u(i) WHERE ts[i] <> ts[i+1]),
         |p2 AS (SELECT least(ts[i], ts[i+2]), greatest(ts[i], ts[i+2])
         |  FROM tk, unnest(range(1, len(ts) - 1)) u(i) WHERE ts[i] <> ts[i+2]),
         |und AS (SELECT DISTINCT a, b FROM
         |  (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
         |e AS (SELECT ${hashing.sqlH63("a")} AS src, ${hashing.sqlH63("b")} AS dst FROM und
         |  UNION ALL SELECT ${hashing.sqlH63("b")}, ${hashing.sqlH63("a")} FROM und),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS rank FROM nodes),
         |$iterCtes,
         |terms AS (SELECT DISTINCT term FROM
         |  (SELECT a AS term FROM und UNION ALL SELECT b FROM und)),
         |tid AS (SELECT term, ${hashing.sqlH63("term")} AS id FROM terms)
         |SELECT term, rank FROM r3 JOIN tid USING (id)
         |ORDER BY rank DESC, term LIMIT 20""".stripMargin
    },

    "graph_ppr" -> {
      val seeds = "(0, 1, 2, 3, 4)"
      val base = "((1000000 - 850000) * 1000000000000 // 1000000) // 5"
      val iterCtes = (0 until 3).map { i =>
        s"""c$i AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           |  FROM e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r${i + 1} AS (SELECT nodes.id,
           |  ((CASE WHEN nodes.id IN $seeds THEN $base ELSE 0 END)
           |    + (850000 * coalesce(c.s, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes LEFT JOIN c$i c USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT id, (CASE WHEN id IN $seeds
         |  THEN 1000000000000 // 5 ELSE 0 END)::BIGINT AS rank FROM nodes),
         |$iterCtes
         |SELECT id, rank FROM r3 WHERE rank > 0 ORDER BY id""".stripMargin
    },

    "graph_kcore" -> {
      val rounds = (1 to 4).map(i =>
        s""",
           |d$i AS (SELECT src AS id, count(*) AS d FROM u${i - 1} GROUP BY 1),
           |s$i AS (SELECT id FROM d$i WHERE d >= 3),
           |u$i AS (SELECT u.src, u.dst FROM u${i - 1} u
           |  JOIN s$i x ON u.src = x.id JOIN s$i y ON u.dst = y.id)""".stripMargin)
        .mkString
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |u0 AS (SELECT a AS src, b AS dst FROM e0
         |  UNION ALL SELECT b, a FROM e0)$rounds
         |SELECT DISTINCT src AS id FROM u4 ORDER BY id""".stripMargin
    },

    "vec_label_noise" ->
      s"""WITH $SqlKnnCtes,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ed AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |j AS (SELECT ed.src, (la.label <> lb.label)::INT AS mism
         |  FROM ed JOIN lab la ON ed.src = la.vec_id
         |  JOIN lab lb ON ed.dst = lb.vec_id),
         |a AS (SELECT src AS vec_id, count(*)::BIGINT AS n_nb,
         |  coalesce(sum(mism), 0)::BIGINT AS n_mismatch FROM j GROUP BY 1)
         |SELECT vec_id, n_nb, n_mismatch,
         |  (n_mismatch * 10000) // n_nb AS mismatch_bp
         |FROM a WHERE n_mismatch > 0
         |ORDER BY mismatch_bp DESC, vec_id LIMIT 50""".stripMargin,

    "vec_corpus_drift" ->
      """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |d AS (SELECT unnest(range(1, 65)) AS pos),
        |qa AS (SELECT pos, sum(floor(e[pos] * 1000000.0)::BIGINT)::BIGINT AS q_a,
        |  count(*)::BIGINT AS n_a FROM s CROSS JOIN d WHERE vec_id % 2 = 0 GROUP BY pos),
        |qb AS (SELECT pos, sum(floor(e[pos] * 1000000.0)::BIGINT)::BIGINT AS q_b,
        |  count(*)::BIGINT AS n_b FROM s CROSS JOIN d WHERE vec_id % 2 = 1 GROUP BY pos),
        |m AS (SELECT qa.pos, n_a, n_b,
        |  q_a::DOUBLE / 1000000.0 / n_a::DOUBLE AS ma,
        |  q_b::DOUBLE / 1000000.0 / n_b::DOUBLE AS mb
        |  FROM qa JOIN qb ON qa.pos = qb.pos),
        |t AS (SELECT n_a, n_b,
        |  sum(floor(ma * mb * 1000000.0)::BIGINT)::BIGINT AS d2,
        |  sum(floor(ma * ma * 1000000.0)::BIGINT)::BIGINT AS na,
        |  sum(floor(mb * mb * 1000000.0)::BIGINT)::BIGINT AS nb,
        |  sum(floor((ma - mb) * (ma - mb) * 1000000.0)::BIGINT)::BIGINT AS s2
        |  FROM m GROUP BY 1, 2)
        |SELECT n_a, n_b,
        |  floor(d2::DOUBLE / 1000000.0 / (sqrt(na::DOUBLE / 1000000.0)
        |    * sqrt(nb::DOUBLE / 1000000.0)) * 10000.0 + 0.5) / 10000.0 AS cos,
        |  floor(s2::DOUBLE / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS l2_shift
        |FROM t""".stripMargin,

    "ann_hard_negatives" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |c AS (SELECT a.vec_id AS src, x.vec_id AS dst, a.e AS ea, x.e AS eb
         |  FROM b a JOIN b x ON a.sig = x.sig AND a.vec_id != x.vec_id
         |    AND a.label != x.label),
         |p AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM c),
         |r AS (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 2 ORDER BY src, rnk""".stripMargin,

    "ann_knn_join" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |l AS (SELECT * FROM b WHERE vec_id % 7 = 0),
         |rr AS (SELECT * FROM b WHERE vec_id % 7 != 0),
         |c AS (SELECT l.vec_id AS src, rr.vec_id AS dst, l.e AS ea, rr.e AS eb
         |  FROM l JOIN rr ON l.sig = rr.sig),
         |p AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM c),
         |r AS (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)
         |SELECT src, dst, cos, rnk FROM r WHERE rnk <= 2 ORDER BY src, rnk""".stripMargin,

    // Margin mining: the knn-join chain BOTH directions, q4-long
    // neighborhood sums, cleared-denominator exact margin, one
    // quantized division at the readout.
    "ann_margin_mine" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, (${sqlLshSig(0, 6, 64)}) AS sig FROM s),
         |l AS (SELECT * FROM b WHERE vec_id % 7 = 0),
         |rr AS (SELECT * FROM b WHERE vec_id % 7 != 0),
         |cf AS (SELECT l.vec_id AS src, rr.vec_id AS dst, l.e AS ea, rr.e AS eb
         |  FROM l JOIN rr ON l.sig = rr.sig),
         |pf AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM cf),
         |fwd AS (SELECT src, dst, cos FROM (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
         |  FROM pf) WHERE rnk <= 2),
         |cb AS (SELECT rr.vec_id AS src, l.vec_id AS dst, rr.e AS ea, l.e AS eb
         |  FROM rr JOIN l ON rr.sig = l.sig),
         |pb AS (SELECT src, dst, floor((list_dot_product(ea, eb)
         |  * (CASE WHEN list_dot_product(ea, ea) > 0 THEN 1.0/sqrt(list_dot_product(ea, ea)) ELSE 0.0 END)
         |  * (CASE WHEN list_dot_product(eb, eb) > 0 THEN 1.0/sqrt(list_dot_product(eb, eb)) ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM cb),
         |bwd AS (SELECT src, dst, cos FROM (SELECT src, dst, cos,
         |  row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
         |  FROM pb) WHERE rnk <= 2),
         |fa AS (SELECT src, sum(floor(cos * 10000.0 + 0.5)::BIGINT)::BIGINT AS sf,
         |  count(*)::BIGINT AS kf FROM fwd GROUP BY src),
         |ba AS (SELECT src AS dst, sum(floor(cos * 10000.0 + 0.5)::BIGINT)::BIGINT AS sb,
         |  count(*)::BIGINT AS kb FROM bwd GROUP BY src),
         |m AS (SELECT f.src, f.dst, f.cos,
         |    (floor(f.cos * 10000.0 + 0.5)::BIGINT * 2 * kf * kb)::BIGINT AS margin_num,
         |    (sf * kb + sb * kf)::BIGINT AS margin_den
         |  FROM fwd f JOIN fa USING (src) JOIN ba USING (dst)),
         |q AS (SELECT src, dst, cos, margin_num, margin_den,
         |    CASE WHEN margin_den != 0 THEN
         |      floor(margin_num::DOUBLE / margin_den::DOUBLE * 1000000.0 + 0.5)
         |        / 1000000.0 END AS margin_q6
         |  FROM m)
         |SELECT src, dst, cos, margin_num, margin_den, margin_q6 FROM q
         |WHERE margin_q6 >= 1.0 ORDER BY src, dst""".stripMargin,

    // 3 unrolled integer iterations over the kNN edges; every rank is a
    // long, so the compare is hash-exact with no float discipline at all.
    "graph_pagerank" -> {
      val base = "((1000000 - 850000) * 1000000000000 // 1000000) // (SELECT n FROM nn)"
      val iterCtes = (0 until 3).map { i =>
        s"""c$i AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
           |  FROM e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r${i + 1} AS (SELECT nodes.id,
           |  ($base + (850000 * coalesce(c.s, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes LEFT JOIN c$i c USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, (1000000000000 // (SELECT n FROM nn))::BIGINT AS rank FROM nodes),
         |$iterCtes
         |SELECT id, rank FROM r3 ORDER BY id""".stripMargin
    },

    // Same undirected edges, same count-argmax with the smallest-label
    // tie rule, 2 unrolled synchronous rounds.
    "graph_label_prop" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes
         |SELECT id, label FROM l2 ORDER BY id""".stripMargin
    },

    // Five exact integer moments (DuckDB sums BIGINT into HUGEINT —
    // still exact; the double conversion of equal integers is identical),
    // one float formula per group.
    "rel_corr" ->
      """WITH q AS (SELECT l_returnflag,
        |  floor(l_quantity * 1.0 + 0.5)::BIGINT AS xq,
        |  floor(l_discount * 10000.0 + 0.5)::BIGINT AS yq FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |a AS (SELECT l_returnflag, count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
        |  sum(xq*yq) AS sxy, sum(xq*xq) AS sxx, sum(yq*yq) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n > 1 AND (n*sxx - sx*sx)::DOUBLE > 0 AND (n*syy - sy*sy)::DOUBLE > 0
        |    THEN floor((n*sxy - sx*sy)::DOUBLE
        |      / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |  END AS corr
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "text_fertility" ->
      s"""WITH t AS (SELECT lang, len($SqlToks) AS ws,
         |  len(regexp_extract_all(lower(text), '${text.BpeTokenPattern}')) AS bpe
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs, sum(ws)::BIGINT AS ws_tokens,
         |  sum(bpe)::BIGINT AS bpe_tokens,
         |  ((sum(bpe) * 10000) // sum(ws))::BIGINT AS fertility_4dp
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // Sketch cells rebuilt in SQL from the same portable hash family;
    // probe cells injected as driver-computed literals (identical
    // arithmetic to sketch.cmEstimate).
    "text_cm_tokens" -> {
      val probeRows = Seq("the", "spark", "query", "zzzz_absent").flatMap { v =>
        val base = hashing.h32Of(v)
        (0 until 4).map(i =>
          s"('$v', $i, ${math.floorMod(hashing.affineOf(base, i), 512L)})")
      }.mkString(", ")
      s"""WITH toks AS (SELECT unnest($SqlToks) AS tok FROM documents),
         |cells AS (SELECT i AS row,
         |  ${hashing.sqlAffineVar(hashing.sqlH32("tok"), "i")} % 512 AS bucket,
         |  count(*) AS cnt
         |  FROM toks, range(0, 4) r(i) GROUP BY 1, 2),
         |p(value, row, bucket) AS (VALUES $probeRows)
         |SELECT p.value, min(coalesce(cells.cnt, 0))::BIGINT AS est
         |FROM p LEFT JOIN cells USING (row, bucket)
         |GROUP BY p.value ORDER BY p.value""".stripMargin
    },

    "events_histogram" ->
      """WITH b AS (SELECT greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events),
        |c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin)
        |SELECT r.bin, 0.0 + r.bin * 20.0 AS bin_lo, 0.0 + (r.bin + 1) * 20.0 AS bin_hi,
        |  coalesce(c.n, 0) AS n
        |FROM (SELECT unnest(range(0, 25)) AS bin) r LEFT JOIN c USING (bin)
        |ORDER BY r.bin""".stripMargin,

    "docs_len_quantiles_lang" ->
      """WITH b AS (SELECT lang, greatest(0, least(31, floor((n_chars::DOUBLE - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM documents),
        |c AS (SELECT lang, bin, count(*) AS n FROM b GROUP BY 1, 2),
        |h AS (SELECT g.lang, r.bin, 0.0 + r.bin * 20.0 AS bin_lo,
        |  0.0 + (r.bin + 1) * 20.0 AS bin_hi, coalesce(c.n, 0) AS n
        |  FROM (SELECT DISTINCT lang FROM b) g
        |  CROSS JOIN (SELECT unnest(range(0, 32)) AS bin) r
        |  LEFT JOIN c ON c.lang = g.lang AND c.bin = r.bin),
        |cc AS (SELECT lang, bin, bin_lo, bin_hi, n,
        |  sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |  sum(n) OVER (PARTITION BY lang) AS total FROM h),
        |qq AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q),
        |cand AS (SELECT lang, q, bin_lo, bin_hi, n, cum, total,
        |  row_number() OVER (PARTITION BY lang, q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0)
        |SELECT lang, q, floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |    * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v_est
        |FROM cand WHERE rk = 1 ORDER BY lang, q""".stripMargin,

    "events_hist_quantiles" ->
      """WITH b AS (SELECT greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events),
        |c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
        |h AS (SELECT r.bin, 0.0 + r.bin * 20.0 AS bin_lo, 0.0 + (r.bin + 1) * 20.0 AS bin_hi,
        |  coalesce(c.n, 0) AS n
        |  FROM (SELECT unnest(range(0, 25)) AS bin) r LEFT JOIN c USING (bin)),
        |cc AS (SELECT bin, bin_lo, bin_hi, n, sum(n) OVER (ORDER BY bin) AS cum,
        |  sum(n) OVER () AS total FROM h),
        |qq AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
        |cand AS (SELECT q, bin_lo, bin_hi, n, cum, total,
        |  row_number() OVER (PARTITION BY q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0)
        |SELECT q, floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |    * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v_est
        |FROM cand WHERE rk = 1 ORDER BY q""".stripMargin,

    "events_sample_quantiles" ->
      s"""WITH sm AS (SELECT ${hashing.sqlH63("event_id::VARCHAR")} AS h,
         |    value::DOUBLE AS v
         |  FROM events WHERE value IS NOT NULL ORDER BY h LIMIT 256),
         |n AS (SELECT count(*)::BIGINT AS sz FROM sm),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v, h) AS r FROM sm),
         |qq AS (SELECT unnest([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
         |SELECT q, v FROM rk JOIN qq
         |  ON rk.r = (floor(q * ((SELECT sz FROM n) - 1)) + 1)::INT
         |ORDER BY q""".stripMargin,

    "events_sample_quantiles_by" ->
      s"""WITH h AS (SELECT event_type,
         |    ${hashing.sqlH63("event_id::VARCHAR")} AS h, value::DOUBLE AS v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ${hashing.sqlH63("event_id::VARCHAR")}) AS sr
         |  FROM events WHERE value IS NOT NULL),
         |sm AS (SELECT event_type, h, v FROM h WHERE sr <= 128),
         |sz AS (SELECT event_type, count(*)::BIGINT AS n FROM sm GROUP BY 1),
         |rk AS (SELECT event_type, v, row_number() OVER (
         |    PARTITION BY event_type ORDER BY v, h) AS r FROM sm),
         |qq AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE]) AS q)
         |SELECT rk.event_type, q, v
         |FROM rk JOIN sz USING (event_type) JOIN qq
         |  ON rk.r = (floor(q * (sz.n - 1)) + 1)::INT
         |ORDER BY event_type, q""".stripMargin,

    "events_anomaly_iqr" ->
      """WITH tt AS (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type,
        |    greatest(0, least(24, floor((value - 0.0) / 20.0)::BIGINT)) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
        |h AS (SELECT tt.event_type, r.bin, 0.0 + r.bin * 20.0 AS bin_lo,
        |    0.0 + (r.bin + 1) * 20.0 AS bin_hi, coalesce(c.n, 0) AS n
        |  FROM tt CROSS JOIN (SELECT unnest(range(0, 25)) AS bin) r
        |  LEFT JOIN c ON c.event_type = tt.event_type AND c.bin = r.bin),
        |cc AS (SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS total FROM h),
        |qq AS (SELECT unnest([0.25::DOUBLE, 0.75::DOUBLE]) AS q),
        |cand AS (SELECT event_type, q, bin_lo, bin_hi, n, cum, total,
        |    row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rk
        |  FROM cc JOIN qq ON cum::DOUBLE >= q * total::DOUBLE AND n > 0),
        |vq AS (SELECT event_type, q,
        |    floor((bin_lo + (q * total::DOUBLE - (cum - n)::DOUBLE) / n::DOUBLE
        |      * (bin_hi - bin_lo)) * 10000.0 + 0.5) / 10000.0 AS v
        |  FROM cand WHERE rk = 1),
        |f AS (SELECT a.event_type, b.v + (b.v - a.v) * 1.5 AS fence
        |  FROM vq a JOIN vq b ON a.event_type = b.event_type
        |  WHERE a.q = 0.25 AND b.q = 0.75),
        |o AS (SELECT e.event_type, count(*)::BIGINT AS n_outliers,
        |    max(value) AS mx
        |  FROM events e JOIN f ON e.event_type = f.event_type
        |  WHERE e.value > f.fence GROUP BY 1)
        |SELECT f.event_type,
        |  floor(f.fence * 10000.0 + 0.5) / 10000.0 AS fence,
        |  coalesce(o.n_outliers, 0)::BIGINT AS n_outliers,
        |  floor(coalesce(o.mx, 0.0) * 10000.0 + 0.5) / 10000.0 AS max_value
        |FROM f LEFT JOIN o ON f.event_type = o.event_type
        |ORDER BY f.event_type""".stripMargin,

    // Grid histogram → exclusive-rank cumsum → integer bin arithmetic;
    // `/` is double division in both engines, floored identically.
    "sample_quantile_bins" ->
      """WITH g AS (SELECT floor(n_chars * 1.0 + 0.5)::BIGINT AS gv, count(*) AS cnt
        |  FROM documents GROUP BY 1),
        |m AS (SELECT gv,
        |  (sum(cnt) OVER (ORDER BY gv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)::BIGINT AS below,
        |  (sum(cnt) OVER ())::BIGINT AS total FROM g),
        |mp AS (SELECT gv, least(3, floor(below * 4 / total)::BIGINT) AS bin FROM m),
        |d AS (SELECT doc_id, n_chars, floor(n_chars * 1.0 + 0.5)::BIGINT AS gv FROM documents)
        |SELECT bin, count(*) AS n_docs, min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
        |FROM d JOIN mp USING (gv) GROUP BY bin ORDER BY bin""".stripMargin,

    // Conditional aggregation IS the relational meaning of pivot — the
    // wide columns are the explicit value domain.
    // Same synthesized multi-line fixture; the global-first winner is
    // min(doc_id·1e6 + pos) per line — equivalent to the op's
    // lexicographic (id, pos) struct-min at this fixture's line counts.
    "dedup_lines" ->
      """WITH m AS (SELECT d.doc_id,
        |  concat_ws(chr(10), d.text, n.text) AS text
        |  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1),
        |l AS (SELECT doc_id, unnest(list_transform(string_split(text, chr(10)),
        |    (s, i) -> struct_pack(line := s, pos := i - 1))) AS u FROM m),
        |x AS (SELECT doc_id, u.line AS line, u.pos AS pos FROM l),
        |win AS (SELECT line, min(doc_id * 1000000 + pos) AS wk FROM x GROUP BY line),
        |k AS (SELECT x.doc_id, x.pos, x.line,
        |  (x.doc_id * 1000000 + x.pos = win.wk) AS keep FROM x JOIN win USING (line))
        |SELECT doc_id,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '')) AS text_md5,
        |  count(*) AS n_lines,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same synthesized URL fixture; the normalization chain is replayed
    // step-for-step with RE2-compatible patterns (no backrefs, no
    // engine-specific flags), so the canonical strings match exactly.
    "dedup_url" ->
      """WITH r AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |  'Docs-' || (doc_id % 7)::VARCHAR || '.Example.COM' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |  '/Wiki/Page-' || (doc_id % 50)::VARCHAR ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 1 THEN '?utm_source=feed&utm_campaign=spring'
        |        WHEN doc_id % 5 = 2 THEN '?page=2&utm_medium=email'
        |        WHEN doc_id % 5 = 3 THEN '?page=2' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN '#section-3' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*', '') AS u FROM r),
        |p0 AS (SELECT doc_id, url,
        |  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(
        |    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)),
        |    '^www\.', '') AS hostraw,
        |  substr(u, length(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', 0)) + 1) AS tail
        |  FROM n),
        |p AS (SELECT doc_id, url, scheme,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$', '')
        |       ELSE hostraw END AS host, tail
        |  FROM p0),
        |q AS (SELECT doc_id, url, scheme || '://' || host ||
        |  regexp_replace(regexp_extract(tail, '^([^?]*)', 1), '/+$', '') ||
        |  (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS norm_url
        |  FROM (SELECT *, array_to_string(list_filter(
        |    string_split(regexp_extract(tail, '\?(.*)', 1), '&'),
        |    x -> x <> '' AND NOT regexp_matches(x,
        |      '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|ref|referrer|igshid)=')),
        |    '&') AS qs FROM p))
        |SELECT norm_url, count(*) AS n_docs,
        |  count(DISTINCT url) AS n_variants, min(doc_id) AS keep_id
        |FROM q GROUP BY norm_url ORDER BY norm_url""".stripMargin,

    // Plan arithmetic replayed in the same IEEE double ops: round the
    // weight·budget product via floor(+0.5), divide by the BIGINT token
    // sum cast to double, ceil for epochs.
    "sample_token_budget" ->
      s"""WITH t AS (SELECT source, count(*) AS n_docs,
         |    sum(len($SqlToks))::BIGINT AS n_tokens
         |  FROM documents GROUP BY source),
         |w(source, w) AS (VALUES ('src0', 0.4), ('src1', 0.25),
         |                        ('src2', 0.2), ('src3', 0.15))
         |SELECT source, coalesce(n_docs, 0) AS n_docs,
         |  coalesce(n_tokens, 0) AS n_tokens,
         |  floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT AS target_tokens,
         |  CASE WHEN coalesce(n_tokens, 0) > 0 THEN floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT::DOUBLE / n_tokens END AS sample_rate,
         |  ceil(CASE WHEN coalesce(n_tokens, 0) > 0 THEN floor(coalesce(w.w, 0.0) * 1000000 + 0.5)::BIGINT::DOUBLE / n_tokens END)::BIGINT AS n_epochs
         |FROM t FULL JOIN w USING (source)
         |ORDER BY source""".stripMargin,

    // Plants replayed with inclusive-index list_slice (Spark slice is
    // length-based: slice(toks, 5+L, n-4-L) == list_slice(toks, 5+L,
    // len)); detection credits only the exact (orig, own-plant) id pair.
    "dedup_minhash_recall" -> {
      val levels = Seq(1, 2, 4, 8)
      val plants = levels.map { l =>
        val subs = (1 to l).map(i => s"'xsub${i}x'").mkString("[", ", ", "]")
        s"SELECT id + ${l * 10000000L} AS id, list_slice(toks, 1, 4) || $subs" +
          s" || list_slice(toks, ${5 + l}, len(toks)) AS toks FROM base"
      }.mkString("\n  UNION ALL ")
      val lvValues = levels.map(l => s"($l)").mkString(", ")
      s"""WITH base AS (SELECT doc_id AS id, toks FROM
         |    (SELECT doc_id, $SqlToks AS toks FROM documents)
         |    WHERE len(toks) >= ${5 + levels.max} AND doc_id < 10000000),
         |plants AS ($plants),
         |corpus AS (SELECT id AS doc_id, array_to_string(toks, ' ') AS text FROM base
         |  UNION ALL SELECT id AS doc_id, array_to_string(toks, ' ') AS text FROM plants),
         |${sqlMinhashPairCtesFrom("corpus")},
         |det AS (SELECT (id_b - id_a) // 10000000 AS level, count(*) AS n_detected
         |  FROM mp WHERE id_a < 10000000 AND (id_b - id_a) % 10000000 = 0
         |  GROUP BY 1),
         |lv(level) AS (VALUES $lvValues)
         |SELECT lv.level::BIGINT AS level,
         |  (SELECT count(*) FROM base) AS n_planted,
         |  coalesce(det.n_detected, 0) AS n_detected,
         |  (coalesce(det.n_detected, 0) * 10000) // (SELECT count(*) FROM base) AS recall_bp
         |FROM lv LEFT JOIN det ON lv.level = det.level ORDER BY level""".stripMargin
    },

    // Funnel stages re-derived independently: raw count, distinct
    // canonical URLs, distinct texts (= exactGroups' fingerprint
    // groups), distinct match keys, and survivors after near-dup
    // clustering (total - clustered + clusters) via the shared minhash
    // CTE chain parameterized over the augmented corpus.
    "pipeline_dedup_funnel" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 2000000, text FROM documents
         |    WHERE doc_id % 4 = 0
         |  UNION ALL SELECT doc_id + 1000000,
         |    translate(upper(text), 'AEIOU', 'ÀÉÎÕÜ') || ' !!' FROM documents
         |    WHERE doc_id % 2 = 0),
         |${sqlMinhashPairCtesFrom("corpus")},
         |e AS (SELECT id_a AS u, id_b AS v FROM mp
         |      UNION SELECT id_b, id_a FROM mp),
         |r AS (SELECT u, v FROM e
         |      UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM r GROUP BY u)
         |SELECT '1_raw' AS stage, count(*) AS docs_out FROM corpus
         |UNION ALL SELECT '2_url', count(DISTINCT 'https://x.example.com/p/' ||
         |  ((doc_id % 1000000) % 200)::VARCHAR) FROM corpus
         |UNION ALL SELECT '3_exact', count(DISTINCT text) FROM corpus
         |UNION ALL SELECT '4_normalized',
         |  count(DISTINCT ${sqlMatchKey("text")}) FROM corpus
         |UNION ALL SELECT '5_neardup',
         |  (SELECT count(*) FROM corpus) - (SELECT count(*) FROM lbl)
         |    + (SELECT count(DISTINCT rep_id) FROM lbl)
         |ORDER BY stage""".stripMargin,

    // Same re-typeset fixture; the match key is replayed with the shared
    // accent table ('g' flags — DuckDB regexp_replace is first-match by
    // default where Spark's is global).
    "dedup_normalized" ->
      s"""WITH c AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000,
         |    translate(upper(text), 'AEIOU', 'ÀÉÎÕÜ') || ' !!' FROM documents),
         |k AS (SELECT doc_id, ${sqlMatchKey("text")} AS mk FROM c)
         |SELECT md5(mk) AS key_md5, min(doc_id) AS keep_id,
         |  count(*) AS group_size
         |FROM k GROUP BY mk ORDER BY keep_id""".stripMargin,

    // Same injected-PII fixture; counts via regexp_extract_all with the
    // IDENTICAL pattern constants (RE2-compatible, no flags).
    "text_pii_stats" ->
      s"""WITH j AS (SELECT doc_id, text ||
         |  (CASE WHEN doc_id % 4 = 0 THEN ' contact bob@example.com now' ELSE '' END) ||
         |  (CASE WHEN doc_id % 5 = 0 THEN ' see https://t.example.com/p?id=1' ELSE '' END) ||
         |  (CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.1.100 at' ELSE '' END) ||
         |  (CASE WHEN doc_id % 9 = 0 THEN ' card 4111 1111 1111 1111 or 555-123-4567' ELSE '' END)
         |  AS text FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '${text.EmailPattern}'))::INT AS n_emails,
         |  len(regexp_extract_all(text, '${text.UrlPattern}'))::INT AS n_urls,
         |  len(regexp_extract_all(text, '${text.Ipv4Pattern}'))::INT AS n_ips,
         |  len(regexp_extract_all(text, '${text.LongDigitPattern}'))::INT AS n_card_like,
         |  len(regexp_extract_all(text, '${text.PhonePattern}'))::INT AS n_phones
         |FROM j ORDER BY doc_id""".stripMargin,

    // Cluster labels re-derived with the recursive-CTE transitive
    // closure, then the keep policy becomes a per-cluster argmax window.
    "dedup_cluster_best" ->
      s"""WITH RECURSIVE $SqlMinhashPairCtes,
         |e AS (SELECT id_a AS u, id_b AS v FROM mp
         |      UNION SELECT id_b, id_a FROM mp),
         |r AS (SELECT u, v FROM e
         |      UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lbl AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM r GROUP BY u),
         |q AS (SELECT lbl.doc_id, rep_id, n_chars
         |      FROM lbl JOIN documents ON lbl.doc_id = documents.doc_id),
         |w AS (SELECT rep_id, doc_id, n_chars, row_number() OVER (
         |        PARTITION BY rep_id ORDER BY n_chars DESC, doc_id) AS rn FROM q)
         |SELECT rep_id, doc_id AS best_id, n_chars::BIGINT AS best_chars
         |FROM w WHERE rn = 1 ORDER BY rep_id""".stripMargin,

    // percent_rank is the exact SQL semantics the grid-rank computes:
    // strictly-below count over (n-1), ties share, single-row group = 0.
    "sample_pct_rank" ->
      """SELECT doc_id, lang, n_chars,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same synthesized version-B fixture; the diff is replayed as a
    // full outer join comparing the text directly (the op compares
    // 128-bit fingerprints — equality is equality either way).
    "rel_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 19 = 0),
        |d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.text = b.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT status, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    // Shard membership recomputed from the raw table with the same
    // portable hash — proves the written shards partition the corpus.
    "export_shards" ->
      s"""SELECT (${hashing.sqlH32("(doc_id::VARCHAR || '/shard')")} % 8)::INT AS shard,
         |  count(*) AS n_rows, sum(doc_id)::BIGINT AS sum_ids
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    // Per-column profile re-derived as one UNION ALL branch per column;
    // min/max compared as strings only for canonical-format types.
    "rel_profile" -> {
      def branch(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
           |FROM orders""".stripMargin
      Seq("o_custkey", "o_orderpriority", "o_orderstatus")
        .map(branch).mkString("", "\nUNION ALL ", "\nORDER BY \"column\"")
    },

    "rel_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)::BIGINT AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)::BIGINT AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "rel_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "rel_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n, sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Same RANGE frame over whole-second event times; fixed-point sums,
    // identical two-division mean.
    "events_rolling_avg" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  epoch_us(ts) // 1000000 AS epoch_s FROM events),
        |w AS (SELECT event_id, epoch_s,
        |  count(*) OVER win AS mov_n,
        |  (sum(floor(value * 1000000.0)::BIGINT) OVER win)::BIGINT AS mov_sum_micros
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT event_id, epoch_s, mov_n, mov_sum_micros,
        |  floor(mov_sum_micros / 1000000.0 / mov_n * 10000.0 + 0.5) / 10000.0 AS mov_avg
        |FROM w ORDER BY event_id""".stripMargin,

    // Same frame-ordered list (event_id tiebreak); index weights 2^(i-1)
    // via an indexed list rebuild — exact integer num/den, one division.
    "events_ewma" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS eus,
        |  floor(value * 1000000.0)::BIGINT AS vq FROM events),
        |w AS (SELECT event_id, user_id,
        |  list(vq) OVER (PARTITION BY user_id ORDER BY eus, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS l FROM e)
        |SELECT event_id, user_id, len(l)::BIGINT AS ewma_n,
        |  floor(list_sum(list_transform(range(1, len(l) + 1),
        |      i -> l[i] * (1::BIGINT << (i - 1))))::DOUBLE
        |    / ((1::BIGINT << len(l)) - 1)::DOUBLE / 1000000.0
        |    * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM w ORDER BY event_id""".stripMargin,

    // Same lag window (event_id tiebreak), integer shares.
    "events_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, count(*) AS n FROM p
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  ((n * 10000) // sum(n) OVER (PARTITION BY prev_type))::BIGINT AS share_4dp
        |FROM c ORDER BY prev_type, event_type""".stripMargin,

    // Same exact-integer moments; `//` not needed — one double division.
    "events_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |  epoch_us(ts) // 1000000 AS epoch_s,
        |  floor(value * 1000.0 + 0.5)::BIGINT AS vq FROM events),
        |w AS (SELECT event_id,
        |  count(*) OVER win AS win_n,
        |  (sum(vq) OVER win)::BIGINT AS s1,
        |  (sum(vq * vq) OVER win)::BIGINT AS s2,
        |  vq
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY epoch_s
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT event_id, win_n,
        |  CASE WHEN win_n * s2 - s1 * s1 > 0
        |    THEN floor((win_n * vq - s1)::DOUBLE / sqrt((win_n * s2 - s1 * s1)::DOUBLE)
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS z
        |FROM w ORDER BY event_id""".stripMargin,

    // Integer epoch-weeks (day DIV 7 arithmetic — no calendar semantics).
    "events_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |  epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT u, min(week) AS cohort_week FROM uw GROUP BY u)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN f USING (u)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "text_clean" ->
      s"""SELECT doc_id,
         |  md5(trim(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${text.UrlPattern}', '<x>', 'g'),
         |    '${text.EmailPattern}', '<x>', 'g'),
         |    '\\s+', ' ', 'g'))) AS clean_fp,
         |  length(trim(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${text.UrlPattern}', '<x>', 'g'),
         |    '${text.EmailPattern}', '<x>', 'g'),
         |    '\\s+', ' ', 'g'))) AS clean_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB has a native ASOF JOIN — the ideal oracle for the
    // union+running-last implementation.
    "events_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |  FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  l.value, r.click_id, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "events_range_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, r.click_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts
        |ORDER BY event_id, click_id""".stripMargin,

    "events_dedup_keepfirst" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn FROM events)
        |SELECT user_id, event_type, event_id FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "text_bm25_topk" -> sqlBm25Top(10),

    // Two full BM25 rounds + the integer-ranked term mining between them.
    "text_bm25_prf" -> {
      val p = graft.ops.retrieval.Bm25Params()
      val terms = Seq("spark", "query", "window").map("'" + _ + "'").mkString(", ")
      def sc(mm: String, o: String) =
        s"""tf_$o AS (SELECT doc_id, term, dl, count(*)::DOUBLE AS tf FROM $mm GROUP BY 1, 2, 3),
           |df_$o AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM $mm GROUP BY 1),
           |ts_$o AS (SELECT tf_$o.doc_id,
           |  ln((((SELECT n FROM st) - df + 0.5) / (df + 0.5)) + 1.0)
           |    * (tf * ${p.k1 + 1.0}) / (tf + ${p.k1} * (${1.0 - p.b} + ${p.b} / (SELECT sumdl / n FROM st) * dl)) AS ts
           |  FROM tf_$o JOIN df_$o USING (term)),
           |sc_$o AS (SELECT doc_id, floor(sum(ts) * 1000000.0 + 0.5) / 1000000.0 AS score
           |  FROM ts_$o GROUP BY doc_id)""".stripMargin
      s"""WITH b2 AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |b3 AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM b2),
         |st AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS sumdl FROM b3),
         |m AS (SELECT doc_id, dl, unnest(toks) AS term FROM b3),
         |q1 AS (SELECT unnest([$terms]) AS term),
         |mm1 AS (SELECT m.* FROM m JOIN q1 USING (term)),
         |${sc("mm1", "1")},
         |fbk AS (SELECT doc_id FROM sc_1 ORDER BY score DESC, doc_id LIMIT 5),
         |cand AS (SELECT term, count(DISTINCT m.doc_id)::BIGINT AS fdf
         |  FROM m JOIN fbk USING (doc_id)
         |  WHERE term NOT IN (SELECT term FROM q1) GROUP BY term),
         |dfall AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS dfa FROM m GROUP BY term),
         |ex AS (SELECT cand.term FROM cand JOIN dfall USING (term)
         |  ORDER BY fdf DESC, dfa ASC, term LIMIT 5),
         |q2 AS (SELECT term FROM q1 UNION SELECT term FROM ex),
         |mm2 AS (SELECT m.* FROM m JOIN q2 USING (term)),
         |${sc("mm2", "2")}
         |SELECT doc_id, score FROM sc_2
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    },

    // The indexed path must reproduce the LIVE path's scores exactly.
    "text_bm25_indexed" -> sqlBm25Top(10),

    "hybrid_rrf_topk" ->
      s"""WITH ${SqlBm25Ctes},
         |b100 AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 100),
         |br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_b FROM b100),
         |es AS (SELECT vec_id, ${"floor((" + sqlCosine(Q1) + ") * 1000000.0 + 0.5) / 1000000.0"} AS vscore FROM embeddings),
         |v100 AS (SELECT vec_id, vscore FROM es ORDER BY vscore DESC, vec_id LIMIT 100),
         |vr AS (SELECT vec_id, row_number() OVER (ORDER BY vscore DESC, vec_id) AS rank_a FROM v100),
         |f AS (SELECT coalesce(vr.vec_id, br.doc_id) AS doc_id,
         |  coalesce(1.0 / (60.0 + rank_a), 0.0) + coalesce(1.0 / (60.0 + rank_b), 0.0) AS rrf
         |  FROM vr FULL OUTER JOIN br ON vr.vec_id = br.doc_id)
         |SELECT doc_id, floor(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "index_zorder_value" ->
      s"""SELECT doc_id, ${graft.index.zorder.sqlZValue("n_chars", "doc_id")} AS z
         |FROM documents ORDER BY doc_id""".stripMargin,

    "index_zorder_range" ->
      """SELECT lang, count(*)::BIGINT AS n, min(doc_id) AS min_id,
        |  max(n_chars) AS max_chars
        |FROM documents
        |WHERE n_chars BETWEEN 120 AND 200 AND doc_id BETWEEN 100 AND 220
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_split" ->
      s"""WITH k AS (SELECT doc_id,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/split')")} % 100 AS key FROM documents),
         |s AS (SELECT doc_id, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k)
         |SELECT split, count(*) AS n, min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "vec_score_calibration" ->
      s"""WITH s AS (SELECT label, ${r4(sqlCosine(Q1))} AS score FROM embeddings),
         |b AS (SELECT label,
         |    greatest(0, least(19, floor((score - (-1.0)) / 0.1)::BIGINT)) AS bin
         |  FROM s)
         |SELECT bin, -1000 + bin * 100 AS lo_milli,
         |  -1000 + (bin + 1) * 100 AS hi_milli,
         |  count(*)::BIGINT AS n,
         |  sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         |  ((sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT AS rate_bp
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "sample_semantic_order" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 8)),
         |assign AS (SELECT vec_id, cluster_id, cdist FROM (
         |  SELECT s.vec_id, c.cid AS cluster_id,
         |    ${r4(sqlL2Between("s.e", "c.e"))} AS cdist,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${r4(sqlL2Between("s.e", "c.e"))}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1)
         |SELECT vec_id, cluster_id,
         |  row_number() OVER (ORDER BY cluster_id, cdist, vec_id) - 1 AS seq_pos
         |FROM assign ORDER BY seq_pos""".stripMargin,

    "sample_kfold" ->
      s"""WITH k AS (SELECT doc_id,
         |  (${hashing.sqlH32("(doc_id::VARCHAR || '/kfold')")} % 5)::INT AS fold
         |  FROM documents)
         |SELECT fold, count(*) AS n, min(doc_id) AS min_id
         |FROM k GROUP BY fold ORDER BY fold""".stripMargin,

    "sample_pack" ->
      s"""WITH t AS (SELECT doc_id, len($SqlToks) AS n_tokens,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/pack')")} % 8 AS pack_shard FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |  pack_shard * 4294967296 +
         |  floor((sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0)::BIGINT AS pack_id
         |FROM t)
         |SELECT pack_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
         |FROM p GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    "datetime_parse" ->
      """WITH s AS (SELECT DISTINCT strftime(l_shipdate, '%Y/%m/%d') AS s FROM lineitem)
        |SELECT s, strftime(coalesce(try_strptime(s, '%Y-%m-%d'), try_strptime(s, '%Y/%m/%d')),
        |  '%Y-%m-%d') AS d
        |FROM s ORDER BY s""".stripMargin,

    // Same 1-based positions, df gate, and islands merge as
    // dedup.repeatedSpans.
    "dedup_repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, toks FROM (
         |    SELECT doc_id, $SqlToks AS toks FROM documents) WHERE len(toks) >= 5),
         |gr AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 4), ' ') AS g
         |  FROM t, unnest(range(1, len(toks) - 5 + 2)) AS r(i)),
         |hot AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
         |  FROM gr GROUP BY g) WHERE df >= 3),
         |s AS (SELECT doc_id, i FROM gr WHERE g IN (SELECT g FROM hot)),
         |r AS (SELECT doc_id, i,
         |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island FROM s)
         |SELECT doc_id, min(i) AS span_start, max(i) + 4 AS span_end,
         |  count(*) AS n_grams
         |FROM r GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    // Positional anti-join formulation (fine in DuckDB; the Spark plan
    // rebuilds in-row instead) — same kept-token set, same output text.
    "dedup_spans_removed" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tl AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 5),
         |gr AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 4), ' ') AS g
         |  FROM tl, unnest(range(1, len(toks) - 5 + 2)) AS r(i)),
         |hot AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
         |  FROM gr GROUP BY g) WHERE df >= 3),
         |sp AS (SELECT doc_id, i FROM gr WHERE g IN (SELECT g FROM hot)),
         |ri AS (SELECT doc_id, i,
         |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island FROM sp),
         |spans AS (SELECT doc_id, min(i) AS span_start, max(i) + 4 AS span_end
         |  FROM ri GROUP BY doc_id, island),
         |pos AS (SELECT doc_id, p, toks[p] AS tok
         |  FROM t, unnest(range(1, len(toks) + 1)) AS rr(p)),
         |dropp AS (SELECT DISTINCT pos.doc_id, pos.p FROM pos JOIN spans
         |  ON pos.doc_id = spans.doc_id AND pos.p BETWEEN span_start AND span_end),
         |kept AS (SELECT pos.doc_id, pos.p, pos.tok
         |  FROM pos ANTI JOIN dropp USING (doc_id, p)),
         |agg AS (SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, md5(coalesce(a.clean_text, '')) AS clean_md5
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Cross-document substring extents: gram-string inverted index
    // (the Spark plan joins on md5 fingerprints of the same grams),
    // occurrence cap, islands per (pair, diagonal).
    "dedup_substring_pairs" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tl AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         |gr AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 7), ' ') AS g
         |  FROM tl, unnest(range(1, len(toks) - 8 + 2)) AS r(i)),
         |cap AS (SELECT g FROM (SELECT g, count(*) AS n FROM gr GROUP BY g)
         |  WHERE n <= 256),
         |cold AS (SELECT doc_id, i, g FROM gr WHERE g IN (SELECT g FROM cap)),
         |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.i AS ia,
         |    b.i - a.i AS d
         |  FROM cold a JOIN cold b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (SELECT id_a, id_b, ia, d,
         |  ia - row_number() OVER (PARTITION BY id_a, id_b, d ORDER BY ia)
         |    AS island FROM m)
         |SELECT id_a, id_b, min(ia) AS a_start, max(ia) + 7 AS a_end,
         |  min(ia) + d AS b_start, max(ia) + 7 + d AS b_end,
         |  (max(ia) - min(ia) + 8)::BIGINT AS len_tokens
         |FROM r GROUP BY id_a, id_b, d, island
         |ORDER BY id_a, id_b, a_start, b_start""".stripMargin,

    // Duplication rate: the pairs chain, both sides' extents unioned
    // distinct, classic islands interval-merge, exact bp DIV;
    // FULL-DOMAIN left join so untouched docs surface as rate 0.
    "dedup_substring_rate" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tl AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         |gr AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 7), ' ') AS g
         |  FROM tl, unnest(range(1, len(toks) - 8 + 2)) AS r(i)),
         |cap AS (SELECT g FROM (SELECT g, count(*) AS n FROM gr GROUP BY g)
         |  WHERE n <= 256),
         |cold AS (SELECT doc_id, i, g FROM gr WHERE g IN (SELECT g FROM cap)),
         |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.i AS ia,
         |    b.i - a.i AS d
         |  FROM cold a JOIN cold b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (SELECT id_a, id_b, ia, d,
         |  ia - row_number() OVER (PARTITION BY id_a, id_b, d ORDER BY ia)
         |    AS island FROM m),
         |px AS (SELECT id_a, id_b, min(ia) AS a_s, max(ia) + 7 AS a_e,
         |    min(ia) + d AS b_s, max(ia) + 7 + d AS b_e
         |  FROM r GROUP BY id_a, id_b, d, island),
         |sp AS (SELECT DISTINCT doc_id, s, e FROM (
         |  SELECT id_a AS doc_id, a_s AS s, a_e AS e FROM px
         |  UNION ALL SELECT id_b, b_s, b_e FROM px)),
         |il AS (SELECT doc_id, s, e,
         |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM sp),
         |ik AS (SELECT doc_id, s, e,
         |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s, e
         |        ROWS UNBOUNDED PRECEDING) AS isl
         |  FROM il),
         |mg AS (SELECT doc_id, isl, min(s) AS ms, max(e) AS me
         |  FROM ik GROUP BY 1, 2),
         |du AS (SELECT doc_id, sum(me - ms + 1)::BIGINT AS dup_tokens
         |  FROM mg GROUP BY 1),
         |tc AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t
         |  WHERE len(toks) > 0)
         |SELECT tc.doc_id, n_tokens,
         |  coalesce(dup_tokens, 0)::BIGINT AS dup_tokens,
         |  (coalesce(dup_tokens, 0) * 10000 // n_tokens)::BIGINT AS dup_bp
         |FROM tc LEFT JOIN du USING (doc_id) ORDER BY tc.doc_id""".stripMargin,

    // Keep-first removal: b-side extents drop from the higher-id doc;
    // positional anti-join formulation (fine in DuckDB; the Spark plan
    // rebuilds in-row) — same kept-token set, same output text.
    "dedup_substring_removed" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |tl AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         |gr AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 7), ' ') AS g
         |  FROM tl, unnest(range(1, len(toks) - 8 + 2)) AS r(i)),
         |cap AS (SELECT g FROM (SELECT g, count(*) AS n FROM gr GROUP BY g)
         |  WHERE n <= 256),
         |cold AS (SELECT doc_id, i, g FROM gr WHERE g IN (SELECT g FROM cap)),
         |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.i AS ia,
         |    b.i - a.i AS d
         |  FROM cold a JOIN cold b ON a.g = b.g AND a.doc_id < b.doc_id),
         |r AS (SELECT id_a, id_b, ia, d,
         |  ia - row_number() OVER (PARTITION BY id_a, id_b, d ORDER BY ia)
         |    AS island FROM m),
         |spans AS (SELECT DISTINCT id_b AS doc_id, min(ia) + d AS span_start,
         |    max(ia) + 7 + d AS span_end
         |  FROM r GROUP BY id_a, id_b, d, island),
         |pos AS (SELECT doc_id, p, toks[p] AS tok
         |  FROM t, unnest(range(1, len(toks) + 1)) AS rr(p)),
         |dropp AS (SELECT DISTINCT pos.doc_id, pos.p FROM pos JOIN spans
         |  ON pos.doc_id = spans.doc_id AND pos.p BETWEEN span_start AND span_end),
         |kept AS (SELECT pos.doc_id, pos.p, pos.tok
         |  FROM pos ANTI JOIN dropp USING (doc_id, p)),
         |agg AS (SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, md5(coalesce(a.clean_text, '')) AS clean_md5
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Counting form: c = shared shingles (df in [2, 256]) per pair;
    // jacc = c / (n_a + n_b - c) — exact while no shingle exceeds the cap
    // (mirrors dedup.jaccardPairs).
    "dedup_jaccard_pairs" ->
      s"""WITH g AS ($SqlGrams),
         |inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |nn AS (SELECT doc_id, count(*) AS n_grams FROM inv GROUP BY 1),
         |dfs AS (SELECT gram, count(*) AS df FROM inv GROUP BY 1),
         |p AS (SELECT inv.doc_id, inv.gram FROM inv JOIN dfs USING (gram)
         |      WHERE df BETWEEN 2 AND 256),
         |sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM p a JOIN p b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (SELECT id_a, id_b, c::DOUBLE / (na.n_grams + nb.n_grams - c) AS jacc
         |  FROM sh JOIN nn na ON sh.id_a = na.doc_id JOIN nn nb ON sh.id_b = nb.doc_id)
         |SELECT id_a, id_b, floor(jacc * 10000.0 + 0.5) / 10000.0 AS jacc
         |FROM j WHERE jacc >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "dedup_containment_pairs" ->
      s"""WITH g AS ($SqlGrams),
         |inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |nn AS (SELECT doc_id, count(*) AS n_grams FROM inv GROUP BY 1),
         |dfs AS (SELECT gram, count(*) AS df FROM inv GROUP BY 1),
         |p AS (SELECT inv.doc_id, inv.gram FROM inv JOIN dfs USING (gram)
         |      WHERE df BETWEEN 2 AND 256),
         |sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM p a JOIN p b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (SELECT id_a, id_b,
         |  c::DOUBLE / least(na.n_grams, nb.n_grams)::DOUBLE AS containment
         |  FROM sh JOIN nn na ON sh.id_a = na.doc_id JOIN nn nb ON sh.id_b = nb.doc_id)
         |SELECT id_a, id_b, floor(containment * 10000.0 + 0.5) / 10000.0 AS containment
         |FROM j WHERE containment >= 0.7 ORDER BY id_a, id_b""".stripMargin,

    "sample_det" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/sample')")} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""WITH k AS (SELECT doc_id, lang,
         |  ${hashing.sqlH32("(doc_id::VARCHAR || '/strat')")} % 100 AS key FROM documents)
         |SELECT lang, count(*) AS n, min(doc_id) AS min_id
         |FROM k WHERE key < (CASE WHEN lang = 'en' THEN 10
         |  WHEN lang = 'zh' THEN 60 ELSE 30 END)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // Clean/dedup/quality/split stages are the proven fragments from
    // text_clean, dedup_exact_keep, text_quality_langid, and
    // sample_group_split, chained over the SAME cleaned column.
    "pipeline_e2e" ->
      s"""WITH c AS (SELECT doc_id, source,
         |    trim(regexp_replace(regexp_replace(regexp_replace(text,
         |      '${text.UrlPattern}', '<x>', 'g'),
         |      '${text.EmailPattern}', '<x>', 'g'),
         |      '\\s+', ' ', 'g')) AS clean
         |  FROM documents),
         |d AS (SELECT * FROM c
         |  WHERE doc_id IN (SELECT min(doc_id) FROM c GROUP BY md5(clean))),
         |tt AS (SELECT doc_id, source, clean,
         |    list_filter(string_split_regex(lower(clean), '\\s+'), t -> t != '') AS toks
         |  FROM d),
         |q AS (SELECT doc_id, source, toks,
         |    floor((least(len(toks)::DOUBLE / 50.0, 1.0) * 0.4
         |      + (1.0 - least((CASE WHEN length(clean) > 0 THEN length(regexp_replace(lower(clean), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(clean) ELSE 0.0 END) * 4.0, 1.0)) * 0.3
         |      + least((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 4.0, 1.0) * 0.3)
         |      * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM tt),
         |s AS (SELECT *, CASE
         |    WHEN ${hashing.sqlH32("(source || '/gsplit')")} % 100 < 80 THEN 'train'
         |    WHEN ${hashing.sqlH32("(source || '/gsplit')")} % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM q WHERE quality >= 0.5)
         |SELECT split, count(*) AS n_docs, sum(len(toks))::BIGINT AS total_tokens,
         |  min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    // Independent re-derivation of the mixture calibration: exact
    // counts → T = min(n/w) → rate = (w·T)/n, with the NORMALIZED
    // weights interpolated from the same Scala doubles the operator
    // computes (Double.toString round-trips through DuckDB's parser),
    // and the same hash-Bernoulli keep rule as sample_weighted.
    "sample_mixture" -> {
      val targets = Map("en" -> 5.0, "de" -> 3.0, "fr" -> 2.0)
      val wSum = targets.values.sum
      val names = targets.keys.toSeq.sorted
      val wCase = names.map(g => s"WHEN '$g' THEN ${targets(g) / wSum}")
        .mkString("CASE lang ", " ", " END")
      val inList = names.map("'" + _ + "'").mkString(", ")
      s"""WITH nw AS (SELECT lang, count(*)::DOUBLE AS n, $wCase AS w
         |  FROM documents WHERE lang IN ($inList) GROUP BY lang),
         |tt AS (SELECT min(n / w) AS t FROM nw),
         |r AS (SELECT lang, (w * (SELECT t FROM tt)) / n AS rate FROM nw)
         |SELECT lang, count(*) AS n, min(doc_id) AS min_id,
         |  sum(n_chars)::BIGINT AS sum_chars
         |FROM documents JOIN r USING (lang)
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/mix')")}::DOUBLE < rate * 4294967296.0
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Same rank-within-stratum arithmetic: idx = rk·|strata| + s_idx.
    "sample_interleave" ->
      """WITH s AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS s_idx
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |n AS (SELECT count(*) AS k FROM s),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rk
        |  FROM documents)
        |SELECT doc_id, lang, (r.rk * n.k + s.s_idx)::BIGINT AS order_idx
        |FROM r JOIN s USING (lang) CROSS JOIN n ORDER BY doc_id""".stripMargin,

    "sample_order_diversity" ->
      """WITH s AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS s_idx
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |n AS (SELECT count(*) AS k FROM s),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rk
        |  FROM documents),
        |o AS (SELECT doc_id, lang, (r.rk * n.k + s.s_idx)::BIGINT AS p
        |  FROM r JOIN s USING (lang) CROSS JOIN n),
        |j AS (SELECT a.lang AS sa, b.lang AS sb
        |  FROM o a JOIN o b ON b.p = a.p + 1)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  coalesce(sum(CASE WHEN sa IS NOT DISTINCT FROM sb THEN 1 ELSE 0 END), 0)::BIGINT AS n_same,
        |  CASE WHEN count(*) > 0 THEN
        |    floor(sum(CASE WHEN sa IS NOT DISTINCT FROM sb THEN 1 ELSE 0 END)::DOUBLE
        |      / count(*) * 10000.0 + 0.5) / 10000.0
        |  ELSE 0.0 END AS frac_same
        |FROM j""".stripMargin,

    // Same clamp chain and multiply order as sample.weightedSample.
    "sample_weighted" ->
      s"""SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS sum_chars
         |FROM documents
         |WHERE ${hashing.sqlH32("(doc_id::VARCHAR || '/wsample')")}::DOUBLE <
         |  least(greatest(n_chars::DOUBLE / 1000.0::DOUBLE, 0.0::DOUBLE), 1.0::DOUBLE)
         |    * 4294967296.0::DOUBLE
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_group_split" ->
      s"""WITH k AS (SELECT doc_id, source,
         |  ${hashing.sqlH32("(source || '/gsplit')")} % 100 AS key FROM documents),
         |s AS (SELECT doc_id, source, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k)
         |SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
         |  min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "dedup_exact_keep" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "dedup_fuzzy_pairs" ->
      """WITH p AS (SELECT doc_id, substr(text, 1, 16) AS pre,
        |    substr(text, 1, 64) AS head FROM documents),
        |f AS (SELECT * FROM (SELECT p.*,
        |    count(*) OVER (PARTITION BY pre) AS df FROM p)
        |  WHERE df BETWEEN 2 AND 256),
        |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    levenshtein(a.head, b.head)::INT AS dist
        |  FROM f a JOIN f b ON a.pre = b.pre AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, dist FROM c WHERE dist <= 8
        |ORDER BY id_a, id_b""".stripMargin,

    "hybrid_rrf_fuse" ->
      s"""WITH a AS (SELECT doc_id, rank_a FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_a
         |    FROM documents) WHERE rank_a <= 50),
         |b AS (SELECT doc_id, rank_b FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) AS rank_b
         |    FROM (SELECT doc_id, ${hashing.sqlH32("(doc_id::VARCHAR || '/rrf')")} AS h
         |          FROM documents)) WHERE rank_b <= 50)
         |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |  floor((coalesce(1.0 / (60.0 + rank_a), 0.0)
         |       + coalesce(1.0 / (60.0 + rank_b), 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS rrf
         |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |ORDER BY rrf DESC, doc_id""".stripMargin,

    // Violation = NOT coalesce(pred, false): the identical three-valued
    // fence the Spark op applies.
    "rel_check_rules" ->
      s"""WITH w AS (SELECT count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, false) THEN 1 ELSE 0 END)::BIGINT AS v1,
         |  sum(CASE WHEN NOT coalesce(o_totalprice > 0.0 AND o_totalprice < 400000.0, false) THEN 1 ELSE 0 END)::BIGINT AS v2,
         |  sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F', 'O', 'P'), false) THEN 1 ELSE 0 END)::BIGINT AS v3,
         |  sum(CASE WHEN NOT coalesce(o_orderpriority = '1-URGENT', false) THEN 1 ELSE 0 END)::BIGINT AS v4
         |  FROM orders),
         |u AS (SELECT 'o1_pk_nonnull' AS rule, n_rows, v1 AS n_viol FROM w
         |  UNION ALL SELECT 'o2_price_band', n_rows, v2 FROM w
         |  UNION ALL SELECT 'o3_status_domain', n_rows, v3 FROM w
         |  UNION ALL SELECT 'o4_urgent', n_rows, v4 FROM w)
         |SELECT rule, n_rows, n_viol,
         |  ${r4("CASE WHEN n_rows > 0 THEN n_viol::DOUBLE / n_rows::DOUBLE ELSE 0.0 END")} AS viol_rate
         |FROM u ORDER BY rule""".stripMargin,

    "rel_skew_probe" ->
      s"""WITH c AS (SELECT coalesce(lang, 'NULL') AS key, count(*)::BIGINT AS cnt
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM c)
         |SELECT key, cnt,
         |  ${r4("cnt * 100.0 / total")} AS share_pct,
         |  ${r4("(cnt * n_keys) / total::DOUBLE")} AS skew,
         |  ceil((cnt * n_keys) / total::DOUBLE)::INT AS rec_salts
         |FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 5""".stripMargin,

    // The naive global-order window IS the semantics — the Spark side
    // just refuses to execute it single-partition.
    "rel_zip_index" ->
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The UNFILTERED exact join — the bloom prefilter must be
    // result-invisible, exactly like salting and bucketing.
    "rel_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 480000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "retrieval_maxsim_topk" -> SqlMaxSimTopK,

    // the long-form token-table path must produce the IDENTICAL result
    "retrieval_maxsim_long" -> SqlMaxSimTopK,

    "rel_cdc_apply" ->
      """WITH ch AS (
        |  SELECT doc_id, 'xx' AS lang, source, 2 AS ts, 'upsert' AS op
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, source, 1, 'delete'
        |  FROM documents WHERE doc_id % 7 = 0),
        |latest AS (SELECT * FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY doc_id ORDER BY ts DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT coalesce(s.doc_id, l.doc_id) AS doc_id,
        |  CASE WHEN l.doc_id IS NOT NULL THEN l.lang ELSE s.lang END AS lang,
        |  CASE WHEN l.doc_id IS NOT NULL THEN l.source ELSE s.source END AS source
        |FROM documents s FULL OUTER JOIN latest l ON s.doc_id = l.doc_id
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY doc_id""".stripMargin,

    // Clause-by-clause replay of the MERGE: target-only rows survive,
    // matched rows delete on 'D' else take source values, source-only
    // rows insert. Keys are unique in every branch, so UNION ALL + sort
    // is deterministic.
    "rel_merge" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 15 = 0 THEN 'D' ELSE 'U' END AS o_orderstatus,
        |    o_totalprice / 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1, 'I', o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |kept AS (
        |  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        |  FROM orders o LEFT JOIN src s USING (o_orderkey)
        |  WHERE s.o_orderkey IS NULL),
        |upd AS (
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
        |  FROM src s JOIN orders o USING (o_orderkey)
        |  WHERE s.o_orderstatus <> 'D'),
        |ins AS (
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
        |  FROM src s LEFT JOIN orders o USING (o_orderkey)
        |  WHERE o.o_orderkey IS NULL)
        |SELECT * FROM (
        |  SELECT * FROM kept UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY o_orderkey""".stripMargin,

    "rel_fk_orphans" ->
      """SELECT count(*)::BIGINT AS n_orphans,
        |  count(DISTINCT l.l_orderkey)::BIGINT AS n_orphan_keys,
        |  min(l.l_orderkey) AS min_key, max(l.l_orderkey) AS max_key
        |FROM lineitem l LEFT JOIN (
        |  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) o
        |  ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL""".stripMargin,

    "rel_pit_join" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, 1 AS ts FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END, 2
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, 3 FROM documents),
        |f AS (SELECT doc_id, lang, ts,
        |    lag(lang) OVER (PARTITION BY doc_id ORDER BY ts) AS prev FROM ch),
        |r AS (SELECT doc_id, lang, ts FROM f WHERE prev IS NULL OR lang <> prev),
        |iv AS (SELECT doc_id, lang, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY doc_id ORDER BY ts) AS valid_to FROM r),
        |facts AS (SELECT doc_id, (doc_id % 4)::INT AS fact_ts FROM documents)
        |SELECT fa.doc_id, fa.fact_ts, iv.lang
        |FROM facts fa LEFT JOIN iv
        |  ON fa.doc_id = iv.doc_id AND fa.fact_ts >= iv.valid_from
        |  AND (iv.valid_to IS NULL OR fa.fact_ts < iv.valid_to)
        |ORDER BY fa.doc_id""".stripMargin,

    "rel_scd2" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, 1 AS ts FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'xx' ELSE lang END, 2
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, 3 FROM documents),
        |f AS (SELECT doc_id, lang, ts,
        |    lag(lang) OVER (PARTITION BY doc_id ORDER BY ts) AS prev FROM ch),
        |r AS (SELECT doc_id, lang, ts FROM f WHERE prev IS NULL OR lang <> prev),
        |iv AS (SELECT doc_id, lang, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY doc_id ORDER BY ts) AS valid_to FROM r)
        |SELECT doc_id, lang, valid_from, valid_to,
        |  (valid_to IS NULL)::INT AS is_current
        |FROM iv ORDER BY doc_id, valid_from""".stripMargin,

    "sketch_cm_join_size" ->
      s"""WITH ca AS (SELECT i AS row,
         |    ${hashing.sqlAffineVar(hashing.sqlH32("l_orderkey::VARCHAR"), "i")} % 512 AS bucket,
         |    count(*)::BIGINT AS cnt
         |  FROM lineitem, range(0, 4) r(i) GROUP BY 1, 2),
         |cb AS (SELECT i AS row,
         |    ${hashing.sqlAffineVar(hashing.sqlH32("o_orderkey::VARCHAR"), "i")} % 512 AS bucket,
         |    count(*)::BIGINT AS cnt
         |  FROM orders, range(0, 4) r(i) GROUP BY 1, 2),
         |ip AS (SELECT ca.row, sum(ca.cnt * cb.cnt)::BIGINT AS ip
         |  FROM ca JOIN cb USING (row, bucket) GROUP BY ca.row),
         |sp AS (SELECT i AS row FROM range(0, 4) r(i))
         |SELECT min(coalesce(ip, 0))::BIGINT AS join_size_est
         |FROM sp LEFT JOIN ip USING (row)""".stripMargin,

    // exact regime (capacity ≥ distinct users): MG counts are exact
    "sketch_heavyhitters" ->
      """SELECT user_id::VARCHAR AS item, count(*)::BIGINT AS est_count
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY est_count DESC, item LIMIT 20""".stripMargin,

    "sketch_heavyhitters_by" ->
      """WITH c AS (SELECT event_type, user_id::VARCHAR AS item,
        |    count(*)::BIGINT AS est_count
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY est_count DESC, item) AS rk FROM c)
        |SELECT event_type, item, est_count FROM r WHERE rk <= 5
        |ORDER BY event_type, est_count DESC, item""".stripMargin,

    "sketch_heavyhitters_weighted" ->
      """SELECT user_id::VARCHAR AS item,
        |  sum(greatest(floor(value * 1000000.0)::BIGINT, 0))::BIGINT AS est_weight
        |FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1 HAVING est_weight > 0
        |ORDER BY est_weight DESC, item LIMIT 20""".stripMargin,

    "events_trending_hh" ->
      """WITH c AS (SELECT
        |    strftime(make_timestamp((floor(epoch(ts)/3600)*3600*1000000)::BIGINT),
        |      '%Y-%m-%d %H:%M:%S') AS wstart,
        |    user_id::VARCHAR AS item, count(*)::BIGINT AS est_count
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY wstart
        |    ORDER BY est_count DESC, item) AS rk FROM c)
        |SELECT wstart, item, est_count FROM r WHERE rk <= 3
        |ORDER BY wstart, est_count DESC, item""".stripMargin,

    "sample_epoch_shuffle" ->
      """SELECT doc_id, row_number() OVER (
        |    ORDER BY md5('7:' || doc_id::VARCHAR) || '_' || doc_id::VARCHAR) - 1
        |  AS epoch_pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The from-scratch aggregate over (base − deletes + inserts) — the
    // maintenance law the incremental path must reproduce exactly.
    "rel_incremental_agg" ->
      """WITH rows_after AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE l_orderkey % 10 <> 0 AND l_partkey % 5 <> 0
        |  UNION ALL
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE l_orderkey % 10 = 0)
        |SELECT l_returnflag, count(*) AS n,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_l_quantity
        |FROM rows_after GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // terms = word 3-grams WITH multiplicity (not the distinct shingle
    // set — tf is real term frequency here)
    "dedup_tfidf_pairs" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |gr AS (SELECT doc_id, unnest(CASE WHEN len(ts) >= 3
         |    THEN list_transform(range(1, len(ts) - 1),
         |      i -> array_to_string(list_slice(ts, i, i + 2), ' '))
         |    ELSE [] END) AS term FROM tk),
         |tf AS (SELECT doc_id AS id, term, count(*)::BIGINT AS tf
         |  FROM gr GROUP BY 1, 2),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |wq AS (SELECT id, tf.term, df,
         |    floor(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) * 1000.0 + 0.5)::BIGINT AS wq
         |  FROM tf JOIN dfs USING (term) CROSS JOIN nn),
         |norms AS (SELECT id, sqrt(sum(wq * wq)::DOUBLE) AS norm
         |  FROM wq GROUP BY id),
         |p AS (SELECT term, id,
         |    floor(wq / norm * 1000000.0 + 0.5)::BIGINT AS nwq
         |  FROM wq JOIN norms USING (id) WHERE df BETWEEN 2 AND 256),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |    sum(a.nwq * b.nwq)::BIGINT AS num
         |  FROM p a JOIN p b ON a.term = b.term AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, cos FROM (
         |  SELECT id_a, id_b,
         |    ${r4("num::DOUBLE / 1000000000000.0")} AS cos FROM pr)
         |WHERE cos >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "sample_balanced_shards" ->
      """WITH r AS (SELECT n_chars,
        |    row_number() OVER (ORDER BY -n_chars, doc_id) - 1 AS idx
        |  FROM documents),
        |s AS (SELECT n_chars, (CASE WHEN (idx // 8) % 2 = 0 THEN idx % 8
        |    ELSE 7 - (idx % 8) END)::INT AS shard FROM r)
        |SELECT shard, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    "retrieval_maxsim_batch" -> {
      def side(qid: Long, toks: Seq[Seq[Double]]): String =
        s"""(SELECT query_id, vec_id, maxsim,
           |  row_number() OVER (ORDER BY maxsim DESC, vec_id) AS rnk
           | FROM (SELECT ${qid}::BIGINT AS query_id, vec_id,
           |   ${r4(sqlMaxSimScore(toks))} AS maxsim FROM embeddings))""".stripMargin
      s"""SELECT query_id, vec_id, maxsim, rnk FROM (
         |  SELECT * FROM ${side(0L, QTok)} WHERE rnk <= 5
         |  UNION ALL
         |  SELECT * FROM ${side(1L, QTok2)} WHERE rnk <= 5)
         |ORDER BY query_id, rnk""".stripMargin
    },

    // Identical semantics to dedup_incremental: the persisted index
    // changes WHERE the corpus signatures live, not what they say.
    "dedup_index_screen" ->
      s"""WITH $SqlMinhashPairCtes
         |SELECT id_a AS corpus_id, id_b AS new_id,
         |  floor(jacc * 10000.0 + 0.5) / 10000.0 AS jacc
         |FROM mp WHERE id_a < 400 AND id_b >= 400
         |ORDER BY corpus_id, new_id""".stripMargin,

    // ---- round 10 ----

    "text_readability" ->
      s"""WITH t AS (SELECT doc_id, replace(text, ' table ', '. ') AS tx
         |  FROM documents),
         |c AS (SELECT doc_id,
         |  len(list_filter(string_split_regex(lower(tx), '\\s+'), x -> x != ''))::BIGINT AS n_words,
         |  len(regexp_extract_all(tx, '[.!?]+'))::BIGINT AS n_sentences,
         |  len(regexp_extract_all(lower(tx), '[aeiouy]+'))::BIGINT AS n_syllables
         |  FROM t)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
         |    ${r4("206.835 - 1.015 * n_words::DOUBLE / n_sentences::DOUBLE" +
              " - 84.6 * n_syllables::DOUBLE / n_words::DOUBLE")}
         |  END AS flesch
         |FROM c ORDER BY doc_id""".stripMargin,

    "rel_majority_label" ->
      s"""WITH v AS (SELECT event_id % 200 AS item, event_type AS label,
         |    count(*)::BIGINT AS n
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT item, label, n,
         |  row_number() OVER (PARTITION BY item ORDER BY n DESC, label ASC) AS rk,
         |  (sum(n) OVER (PARTITION BY item))::BIGINT AS n_total FROM v)
         |SELECT item, label, n AS n_votes, n_total,
         |  ${r4("n::DOUBLE / n_total::DOUBLE")} AS agreement
         |FROM r WHERE rk = 1 ORDER BY item""".stripMargin,

    "sample_preference_pairs" ->
      s"""WITH e AS (SELECT user_id, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |r AS (SELECT user_id, event_id, value,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id ASC) AS rc,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY value ASC, event_id DESC) AS rr,
         |  count(*) OVER (PARTITION BY user_id) AS n FROM e)
         |SELECT c.user_id, c.event_id AS chosen_id, j.event_id AS rejected_id,
         |  c.value AS chosen_score, j.value AS rejected_score,
         |  c.value - j.value AS margin
         |FROM (SELECT * FROM r WHERE rc = 1 AND n >= 2) c
         |JOIN (SELECT * FROM r WHERE rr = 1) j USING (user_id)
         |WHERE c.value > j.value ORDER BY c.user_id""".stripMargin,

    "vec_silhouette" ->
      s"""WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |x AS (SELECT label, i AS pos, floor(e[i + 1] * 10000000.0)::BIGINT AS q
         |  FROM s, range(0, 64) r(i)),
         |m AS (SELECT label, pos,
         |  sum(q)::DOUBLE / (10000000.0::DOUBLE * count(*)) AS c
         |  FROM x GROUP BY label, pos),
         |cv AS (SELECT label AS clabel, list(c ORDER BY pos) AS cvec
         |  FROM m GROUP BY label),
         |d AS (SELECT s.vec_id, s.label, cv.clabel,
         |  sqrt(${sqlL2Between("s.e", "cv.cvec")}) AS dist FROM s, cv),
         |ab AS (SELECT vec_id, label,
         |  min(CASE WHEN label = clabel THEN dist END) AS a,
         |  min(CASE WHEN label != clabel THEN dist END) AS b
         |  FROM d GROUP BY vec_id, label),
         |sil AS (SELECT label,
         |  CASE WHEN greatest(a, b) > 0.0 THEN (b - a) / greatest(a, b)
         |    ELSE 0.0 END AS sv FROM ab)
         |SELECT label, count(*)::BIGINT AS n,
         |  ${r4("sum(floor(sv * 10000000.0)::BIGINT)::DOUBLE / (10000000.0::DOUBLE * count(*))")} AS silhouette
         |FROM sil GROUP BY label ORDER BY label""".stripMargin,

    "events_acf" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // ${1000000L * 3600} AS t,
         |    count(*)::BIGINT AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, unnest(range(t0, t1 + 1)) AS t
         |  FROM (SELECT event_type, min(t) AS t0, max(t) AS t1 FROM c
         |        GROUP BY event_type)),
         |ds AS (SELECT sp.event_type, sp.t, coalesce(c.n, 0)::BIGINT AS n
         |  FROM sp LEFT JOIN c USING (event_type, t)),
         |ld AS (SELECT event_type, n AS x,
         |  lead(n, 1) OVER w AS l1, lead(n, 2) OVER w AS l2,
         |  lead(n, 3) OVER w AS l3
         |  FROM ds WINDOW w AS (PARTITION BY event_type ORDER BY t)),
         |p AS (
         |  SELECT event_type, 1 AS lag, x, l1 AS y FROM ld WHERE l1 IS NOT NULL
         |  UNION ALL
         |  SELECT event_type, 2, x, l2 FROM ld WHERE l2 IS NOT NULL
         |  UNION ALL
         |  SELECT event_type, 3, x, l3 FROM ld WHERE l3 IS NOT NULL),
         |a AS (SELECT event_type, lag, count(*)::BIGINT AS m,
         |  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         |  sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         |  sum(x * y)::BIGINT AS sxy
         |  FROM p GROUP BY 1, 2)
         |SELECT event_type, lag, m,
         |  CASE WHEN m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0.0
         |    AND m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0.0 THEN
         |    ${r4("(m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / " +
              "(sqrt(m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * " +
              "sqrt(m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))")}
         |  END AS acf
         |FROM a ORDER BY event_type, lag""".stripMargin,

    "events_changepoint" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // ${1000000L * 3600} AS t,
         |    count(*)::BIGINT AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, unnest(range(t0, t1 + 1)) AS t
         |  FROM (SELECT event_type, min(t) AS t0, max(t) AS t1 FROM c
         |        GROUP BY event_type)),
         |ds AS (SELECT sp.event_type, sp.t, coalesce(c.n, 0)::BIGINT AS n
         |  FROM sp LEFT JOIN c USING (event_type, t)),
         |f AS (SELECT event_type, t,
         |  (count(*) OVER pre)::BIGINT AS n_pre,
         |  (sum(n) OVER pre)::BIGINT AS s1p, (sum(n * n) OVER pre)::BIGINT AS s2p,
         |  (count(*) OVER post)::BIGINT AS n_post,
         |  (sum(n) OVER post)::BIGINT AS s1q, (sum(n * n) OVER post)::BIGINT AS s2q
         |  FROM ds WINDOW
         |    pre AS (PARTITION BY event_type ORDER BY t
         |      ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING),
         |    post AS (PARTITION BY event_type ORDER BY t
         |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING))
         |SELECT event_type, t, n_pre, n_post,
         |  ${r4("((s1q::DOUBLE - s1p::DOUBLE) / 6.0) / " +
              "sqrt(((6.0 * s2p::DOUBLE - s1p::DOUBLE * s1p::DOUBLE) / 36.0 + " +
              "(6.0 * s2q::DOUBLE - s1q::DOUBLE * s1q::DOUBLE) / 36.0) / 6.0 + 1.0)")}
         |    AS stat
         |FROM f WHERE n_pre = 6 AND n_post = 6
         |ORDER BY event_type, t""".stripMargin,

    "dedup_ngram_novelty" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
         |tk AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS ts
         |  FROM base),
         |g AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(ts) - 3),
         |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
         |      || ' ' || ts[i+4])) AS gs
         |  FROM tk WHERE len(ts) >= 5),
         |pd AS (SELECT doc_id, len(gs)::BIGINT AS n_grams FROM g),
         |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
         |fo AS (SELECT gram, min(doc_id) AS fid FROM e GROUP BY gram),
         |nf AS (SELECT fid AS doc_id, count(*)::BIGINT AS n_first FROM fo
         |  GROUP BY fid)
         |SELECT pd.doc_id, pd.n_grams,
         |  (pd.n_grams - coalesce(nf.n_first, 0))::BIGINT AS n_seen,
         |  ${r4("(pd.n_grams - coalesce(nf.n_first, 0))::DOUBLE / pd.n_grams::DOUBLE")}
         |    AS seen_frac
         |FROM pd LEFT JOIN nf USING (doc_id) ORDER BY pd.doc_id""".stripMargin,

    "text_top_ngrams" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |e AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
         |  FROM tk, unnest(range(1, len(ts) - 1)) u(i))
         |SELECT gram, count(DISTINCT doc_id)::BIGINT AS doc_freq,
         |  count(*)::BIGINT AS occurrences
         |FROM e GROUP BY gram
         |ORDER BY doc_freq DESC, occurrences DESC, gram LIMIT 20""".stripMargin,

    // Same normalized undirected kNN edges, symmetric adjacency, fixed-
    // point resource-allocation weights (scale // deg — all integer), a
    // wedge self-join on the shared neighbor, and an anti-join against
    // the edge set. maxDeg = 1000 never trips on a k=3 kNN graph; the cap
    // is exercised by GraphSpec.
    "graph_linkpred" ->
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e0 WHERE src != dst),
         |adj AS (SELECT a AS z, b AS x FROM und
         |  UNION ALL SELECT b AS z, a AS x FROM und),
         |deg AS (SELECT z, count(*)::BIGINT AS d FROM adj GROUP BY z),
         |ak AS (SELECT adj.z, adj.x, (1000000000000 // d)::BIGINT AS w
         |  FROM adj JOIN deg USING (z) WHERE d <= 1000),
         |pr AS (SELECT l.x AS a, rt.x AS b, count(*)::BIGINT AS cn,
         |    sum(l.w)::BIGINT AS ra
         |  FROM ak l JOIN ak rt ON l.z = rt.z AND l.x < rt.x GROUP BY 1, 2)
         |SELECT a, b, cn, ra FROM pr
         |WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = pr.a AND und.b = pr.b)
         |ORDER BY a, b""".stripMargin,

    // HITS with the impl's exact half-step order (auth from hub, hub
    // from the NEW auth) and the deterministic integer rescale
    // q = 1 + (max-1) // scale, unrolled 2 iterations.
    "graph_hits" -> {
      def rescale(src: String, c: String): String =
        s"(SELECT id, ($c // (1 + (greatest((SELECT max($c) FROM $src), 1) - 1)" +
          s" // 1000000))::BIGINT AS $c FROM $src)"
      val iterCtes = (0 until 2).map { i =>
        s"""ar$i AS (SELECT nodes.id, coalesce(s.v, 0)::BIGINT AS auth
           |  FROM nodes LEFT JOIN (SELECT e0.dst AS id, sum(h$i.hub)::BIGINT AS v
           |    FROM e0 JOIN h$i ON e0.src = h$i.id GROUP BY 1) s USING (id)),
           |a${i + 1} AS ${rescale(s"ar$i", "auth")},
           |hr$i AS (SELECT nodes.id, coalesce(s.v, 0)::BIGINT AS hub
           |  FROM nodes LEFT JOIN (SELECT e0.src AS id, sum(a${i + 1}.auth)::BIGINT AS v
           |    FROM e0 JOIN a${i + 1} ON e0.dst = a${i + 1}.id GROUP BY 1) s USING (id)),
           |h${i + 1} AS ${rescale(s"hr$i", "hub")}""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT DISTINCT src, dst FROM r WHERE rnk <= 3),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e0 UNION ALL SELECT dst AS id FROM e0)),
         |h0 AS (SELECT id, 1000000::BIGINT AS hub FROM nodes),
         |$iterCtes
         |SELECT nodes.id, h2.hub, a2.auth FROM nodes
         |JOIN h2 USING (id) JOIN a2 USING (id) ORDER BY id""".stripMargin
    },

    // Whole-basket cap, distinct membership, one self-join on the basket.
    "graph_bipartite" ->
      """WITH m AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |sz AS (SELECT bk, count(*)::BIGINT AS s FROM m GROUP BY bk),
        |k AS (SELECT m.bk, m.it FROM m JOIN sz USING (bk) WHERE s <= 1000)
        |SELECT a.it AS item_a, b.it AS item_b, count(*)::BIGINT AS n_baskets
        |FROM k a JOIN k b ON a.bk = b.bk AND a.it < b.it
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,

    // Same deterministic dirtying (chr() spells the exact codepoints the
    // Spark side injects), length-difference marker counts, C0-control
    // regexp. length() is code points on both engines.
    "text_encoding_quality" ->
      """WITH d AS (SELECT doc_id, text ||
        |  (CASE WHEN doc_id % 7 = 0 THEN ' caf' || chr(195) || chr(169) || ' '
        |    || chr(226) || chr(8364) || chr(339) || 'x' ELSE '' END) ||
        |  (CASE WHEN doc_id % 11 = 0 THEN ' ' || chr(65533) || chr(65533) ELSE '' END) ||
        |  (CASE WHEN doc_id % 13 = 0 THEN ' a' || chr(7) || 'b' ELSE '' END) AS tx
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  (length(tx) - length(replace(tx, chr(65533), '')))::BIGINT AS n_repl,
        |  len(regexp_extract_all(tx, '[\x00-\x08\x0B\x0C\x0E-\x1F]'))::BIGINT AS n_ctrl,
        |  ((length(tx) - length(replace(tx, chr(195), '')))
        |    + (length(tx) - length(replace(tx, chr(226) || chr(8364), ''))) // 2
        |  )::BIGINT AS n_moji
        |  FROM d)
        |SELECT doc_id, n_repl, n_ctrl, n_moji,
        |  (n_repl = 0 AND n_ctrl = 0 AND n_moji <= 0) AS enc_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    // Integer basis-point mixture plan; sums cast ::BIGINT immediately
    // (HUGEINT discipline), NULL epochs for the zero-token full-join row.
    "sample_domain_reweight" ->
      """WITH tgt(source, target_bp) AS (VALUES
        |  ('src0', 2500), ('src1', 2000), ('src2', 1500), ('src3', 1000),
        |  ('src4', 1000), ('src5', 1000), ('src6', 500), ('src7', 500),
        |  ('srcX', 0)),
        |agg AS (SELECT source, sum(n_chars)::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |j AS (SELECT coalesce(a.source, t.source) AS source,
        |    coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |    coalesce(t.target_bp, 0)::BIGINT AS target_bp
        |  FROM agg a FULL JOIN tgt t ON a.source = t.source),
        |tot AS (SELECT sum(n_tokens)::BIGINT AS total FROM j),
        |e AS (SELECT source, n_tokens, target_bp,
        |    (CASE WHEN total > 0 THEN n_tokens * 10000 // total ELSE 0 END)::BIGINT AS share_bp,
        |    (CASE WHEN n_tokens > 0
        |      THEN least(target_bp * total // n_tokens, 30000) END)::BIGINT AS epochs_bp
        |  FROM j CROSS JOIN tot),
        |f AS (SELECT source, n_tokens, target_bp, share_bp, epochs_bp,
        |    coalesce(n_tokens * epochs_bp // 10000, 0)::BIGINT AS eff_tokens FROM e),
        |ft AS (SELECT sum(eff_tokens)::BIGINT AS efft FROM f)
        |SELECT source, n_tokens, target_bp, share_bp, epochs_bp, eff_tokens,
        |  (CASE WHEN efft > 0 THEN eff_tokens * 10000 // efft ELSE 0 END)::BIGINT AS realized_bp
        |FROM f CROSS JOIN ft ORDER BY source""".stripMargin,

    // Half-life decay as an arithmetic right shift (both engines shift
    // BIGINT arithmetically; scores non-negative), pinned as-of date.
    "sample_freshness" ->
      """WITH f AS (SELECT event_type, event_id,
        |  date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')::BIGINT AS age_days,
        |  (floor(value * 100)::BIGINT >>
        |    least(62, date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') // 7)::INT
        |  )::BIGINT AS score
        |  FROM events
        |  WHERE ts IS NOT NULL AND CAST(ts AS DATE) <= DATE '2024-01-31'),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY event_type ORDER BY score DESC, event_id ASC) AS rk FROM f)
        |SELECT event_type, event_id, age_days, score, rk::INT AS rnk
        |FROM r WHERE rk <= 5 ORDER BY event_type, rnk""".stripMargin,

    // Ground-truth twin: the synthesized host is a pure function of
    // doc_id (residue mod 37), so the oracle screens on residues — the
    // Spark side must reach the same set THROUGH url synthesis + host
    // canonicalization (www/port/case folding).
    "decontam_domain_screen" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id % 530 != 0
        |  AND doc_id % 37 NOT IN
        |    (SELECT DISTINCT doc_id % 37 FROM documents WHERE doc_id % 530 = 0)
        |ORDER BY doc_id""".stripMargin,

    // Fixed-point micro-unit sums per (doc, dim), exact BIGINT, one
    // rounded float per component; flattened to scalar (doc, pos, v)
    // rows — pos is 0-based to match posexplode.
    "vec_chunk_pool" ->
      """WITH e AS (SELECT vec_id % 100 AS doc_id,
        |    CAST(embedding AS DOUBLE[])[i] AS x, i
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
        |a AS (SELECT doc_id, i, sum(floor(x * 1000000.0)::BIGINT)::BIGINT AS s,
        |    count(*)::BIGINT AS n
        |  FROM e GROUP BY 1, 2),
        |nc AS (SELECT doc_id, max(n)::BIGINT AS n_chunks FROM a GROUP BY 1)
        |SELECT a.doc_id, nc.n_chunks, (a.i - 1)::INT AS pos,
        |  floor(s::DOUBLE / n::DOUBLE / 100.0 + 0.5) / 10000.0 AS v
        |FROM a JOIN nc ON a.doc_id = nc.doc_id
        |ORDER BY a.doc_id, pos""".stripMargin,

    // First-from, first-to-at-or-after, integer second/bucket floors.
    "events_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(ts) AS fv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS fp, min(v.fv) AS fv
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.fv
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |d AS (SELECT user_id,
        |    ((epoch_us(fp) - epoch_us(fv)) // 1000000) // 3600 AS bucket
        |  FROM p)
        |SELECT bucket, count(*)::BIGINT AS n_users
        |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin,

    // The IVF assignment argmin (ORDER BY dist, cid — ivfAssign's
    // first-minimum tie rule), then integer share/load basis points over
    // non-empty clusters.
    "ann_cluster_balance" ->
      s"""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
         |  FROM (SELECT vec_id, e FROM s ORDER BY vec_id LIMIT 16)),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT s.vec_id, c.cid, row_number() OVER (PARTITION BY s.vec_id
         |    ORDER BY ${sqlL2Between("s.e", "c.e")}, c.cid) AS rn
         |  FROM s, cent c) WHERE rn = 1),
         |a AS (SELECT cid, count(*)::BIGINT AS n FROM asg GROUP BY 1),
         |t AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS k FROM a)
         |SELECT cid::BIGINT AS cluster_id, n,
         |  (n * 10000 // total)::BIGINT AS share_bp,
         |  (n * k * 10000 // total)::BIGINT AS load_bp
         |FROM a CROSS JOIN t ORDER BY cluster_id""".stripMargin,

    // The simple a<b<c three-way triangle join (like graph_triangles),
    // but keeping corners: each triangle credits all three nodes.
    "graph_clustering" ->
      s"""WITH $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tv AS (SELECT v, count(*)::BIGINT AS t FROM (
         |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
         |  UNION ALL SELECT z FROM tri) GROUP BY 1),
         |deg AS (SELECT v, count(*)::BIGINT AS d FROM (
         |  SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY 1)
         |SELECT deg.v AS id, d AS deg, coalesce(t, 0)::BIGINT AS n_tri,
         |  (coalesce(t, 0) * 2 * 10000 // (d * (d - 1)))::BIGINT AS cc_bp
         |FROM deg LEFT JOIN tv ON deg.v = tv.v
         |WHERE d >= 2 ORDER BY id""".stripMargin,

    "rel_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
        |  count(DISTINCT c_acctbal)::BIGINT AS l_div,
        |  (CASE WHEN count(*) < 8 THEN 1 ELSE 0 END)::BIGINT AS at_risk
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Every quotient is on non-negative integers (// == DIV there);
    // the one signed quantity, kappa, stays a num/den pair.
    "rel_fleiss_kappa" ->
      """WITH src AS (SELECT event_id % 200 AS item, user_id, event_type
        |  FROM events),
        |cells AS (SELECT item, event_type AS label, count(*)::BIGINT AS nij
        |  FROM src WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |items AS (SELECT item, sum(nij)::BIGINT AS ni,
        |    sum(nij * nij)::BIGINT AS si
        |  FROM cells GROUP BY 1 HAVING sum(nij) >= 2),
        |pi AS (SELECT ni, ((si - ni) * 1000000) // (ni * (ni - 1)) AS pi_ppm
        |  FROM items),
        |tot AS (SELECT count(*)::BIGINT AS n_items, sum(pi_ppm)::BIGINT AS sp,
        |  sum(ni)::BIGINT AS n_ratings FROM pi),
        |marg AS (SELECT c.label, sum(c.nij)::BIGINT AS cj
        |  FROM cells c JOIN items i USING (item) GROUP BY 1),
        |pj AS (SELECT (cj * 1000000) // (SELECT n_ratings FROM tot) AS pj_ppm
        |  FROM marg),
        |pe AS (SELECT (sum(pj_ppm * pj_ppm) // 1000000)::BIGINT AS pe_ppm FROM pj)
        |SELECT n_items, n_ratings, (sp // n_items)::BIGINT AS pbar_ppm, pe_ppm,
        |  ((sp // n_items) - pe_ppm)::BIGINT AS kappa_num,
        |  (1000000 - pe_ppm)::BIGINT AS kappa_den
        |FROM tot CROSS JOIN pe""".stripMargin,

    // Rebase x per series so the OLS sums stay small; slope stays a
    // num/den pair (signed division is the engine trap).
    "events_trend" ->
      """WITH b AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS x, count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT series, x - min(x) OVER (PARTITION BY series) AS xs, y
        |  FROM b)
        |SELECT series, count(*)::BIGINT AS n_buckets,
        |  (count(*) * sum(xs * y) - sum(xs) * sum(y))::BIGINT AS slope_num,
        |  (count(*) * sum(xs * xs) - sum(xs) * sum(xs))::BIGINT AS slope_den
        |FROM r GROUP BY series ORDER BY series""".stripMargin,

    // CUSUM: the same n_ref-scaled recurrence as a recursive CTE over
    // the ordered day index.
    "events_cusum" ->
      """WITH RECURSIVE g AS (
        |  SELECT (epoch_us(ts) // 1000000) // 86400 AS b,
        |    count(*)::BIGINT AS x FROM events GROUP BY 1),
        |o AS (SELECT b, x, row_number() OVER (ORDER BY b) AS rn FROM g),
        |ref AS (SELECT sum(x)::BIGINT AS sref, count(*)::BIGINT AS nref
        |  FROM o WHERE rn <= 7),
        |c(rn, s) AS (
        |  SELECT 0::BIGINT, 0::BIGINT
        |  UNION ALL
        |  SELECT o.rn, greatest(0, c.s + (SELECT nref FROM ref) * o.x
        |    - (SELECT sref FROM ref))
        |  FROM c JOIN o ON o.rn = c.rn + 1)
        |SELECT o.b AS bucket, o.x, c.s AS s_scaled,
        |  c.s > 100 * (SELECT nref FROM ref) AS alarm
        |FROM c JOIN o USING (rn) ORDER BY bucket""".stripMargin,

    // Pooled theta over ALL users' (x, y); signed, so num/den only.
    "events_cuped" ->
      """WITH per AS (SELECT user_id, user_id % 2 AS variant,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |  sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |  sum(x * x)::BIGINT AS sxx FROM per)
        |SELECT variant, count(*)::BIGINT AS n_users, sum(x)::BIGINT AS sum_x,
        |  sum(y)::BIGINT AS sum_y,
        |  (SELECT n * sxy - sx * sy FROM t)::BIGINT AS theta_num,
        |  (SELECT n * sxx - sx * sx FROM t)::BIGINT AS theta_den
        |FROM per GROUP BY variant ORDER BY variant""".stripMargin,

    // string_agg ordered by the same (ts, event_id) rank.
    "events_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*)::BIGINT AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // Transitive closure over the rnk<=1 edge set; rep = least reachable
    // id (the dedup_cluster recursive-CTE pattern on the kNN CTEs).
    "graph_components" ->
      s"""WITH RECURSIVE $SqlKnnCtes,
         |ed AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 1 GROUP BY 1, 2),
         |e AS (SELECT a AS u, b AS v FROM ed UNION SELECT b, a FROM ed),
         |cl AS (SELECT u, v FROM e
         |       UNION SELECT cl.u, e.v FROM cl JOIN e ON cl.v = e.u),
         |lbl AS (SELECT u AS id, least(u, min(v)) AS rep FROM cl GROUP BY u)
         |SELECT rep AS component, count(*)::BIGINT AS n_nodes
         |FROM lbl GROUP BY 1 ORDER BY component""".stripMargin,

    // 1e-3 fixed point; var numerator non-negative, so // == DIV.
    "vec_dim_stats" ->
      s"""WITH e AS (SELECT i - 1 AS dim, $E[i] AS x
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
         |  WHERE embedding IS NOT NULL),
         |m AS (SELECT dim, x, floor(x * 1000.0)::BIGINT AS xm FROM e)
         |SELECT dim, count(*)::BIGINT AS n,
         |  sum(CASE WHEN x = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
         |  sum(xm)::BIGINT AS sum_milli,
         |  ((count(*) * sum(xm * xm) - sum(xm) * sum(xm))
         |    // (count(*) * count(*)))::BIGINT AS var_milli2
         |FROM m GROUP BY dim ORDER BY dim""".stripMargin,

    // Arithmetic dow/hod (no calendar functions), grid-total shares.
    "events_seasonality" ->
      """WITH b AS (SELECT
        |    ((epoch_us(ts) // 1000000 // 86400) + 4) % 7 AS dow,
        |    (epoch_us(ts) // 1000000 // 3600) % 24 AS hod
        |  FROM events),
        |g AS (SELECT dow, hod, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
        |t AS (SELECT sum(n)::BIGINT AS total FROM g)
        |SELECT dow, hod, n, (n * 10000 // total)::BIGINT AS share_bp
        |FROM g CROSS JOIN t ORDER BY dow, hod""".stripMargin,

    // Rolling distinct = the same ×7 day fan-out of the distinct
    // (user, day) set, trimmed at the corpus max day. LEFT join from
    // rolling so zero-DAU engagement-gap days surface with dau = 0.
    "events_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 1000000 // 86400 AS d FROM events),
        |dau AS (SELECT d AS day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
        |mx AS (SELECT max(d) AS m FROM ud),
        |r AS (SELECT DISTINCT u, d + i AS day FROM ud, range(0, 7) t(i)),
        |rl AS (SELECT day, count(*)::BIGINT AS rolling FROM r
        |  WHERE day <= (SELECT m FROM mx) GROUP BY 1)
        |SELECT day, coalesce(dau, 0)::BIGINT AS dau, rolling,
        |  (coalesce(dau, 0) * 10000 // rolling)::BIGINT AS stickiness_bp
        |FROM rl LEFT JOIN dau USING (day) ORDER BY day""".stripMargin,

    "events_concentration" ->
      """WITH per AS (SELECT user_id, count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1),
        |t AS (SELECT sum(n_events)::BIGINT AS total FROM per),
        |top AS (SELECT user_id, n_events,
        |    row_number() OVER (ORDER BY n_events DESC, user_id) AS rnk
        |  FROM per ORDER BY n_events DESC, user_id LIMIT 10),
        |c AS (SELECT rnk, user_id, n_events,
        |  sum(n_events) OVER (ORDER BY rnk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM top)
        |SELECT rnk, user_id, n_events,
        |  (n_events * 10000 // (SELECT total FROM t))::BIGINT AS share_bp,
        |  (cum * 10000 // (SELECT total FROM t))::BIGINT AS cum_share_bp
        |FROM c ORDER BY rnk""".stripMargin,

    "events_srm" ->
      """WITH u AS (SELECT DISTINCT user_id % 2 AS variant, user_id FROM events),
        |per AS (SELECT variant, count(*)::BIGINT AS n FROM u GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS tot FROM per)
        |SELECT k AS n_variants, tot AS n_units,
        |  sum((k * n - tot) * (k * n - tot))::BIGINT AS chi2_num,
        |  (k * tot)::BIGINT AS chi2_den
        |FROM per CROSS JOIN t GROUP BY k, tot""".stripMargin,

    // The same head vocabulary as text_vocab_topn (tf desc, word ties),
    // then a membership left join and per-doc counts.
    "text_oov_rate" ->
      s"""WITH tk AS (SELECT doc_id, unnest($SqlToks) AS word FROM documents),
         |v AS (SELECT word FROM (SELECT word, count(*) AS tf FROM tk
         |  GROUP BY 1 ORDER BY tf DESC, word LIMIT 200)),
         |j AS (SELECT t.doc_id, (v.word IS NOT NULL) AS inv
         |  FROM tk t LEFT JOIN v ON t.word = v.word)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  sum(CASE WHEN NOT inv THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         |  (sum(CASE WHEN NOT inv THEN 1 ELSE 0 END) * 10000
         |    // count(*))::BIGINT AS oov_bp
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The full minhash pair chain, then each side's group-split key.
    "sample_split_leakage" ->
      s"""WITH $SqlMinhashPairCtes,
         |k AS (SELECT doc_id,
         |  ${hashing.sqlH32("(source || '/gsplit')")} % 100 AS key FROM documents),
         |asg AS (SELECT doc_id, CASE WHEN key < 80 THEN 'train'
         |  WHEN key < 90 THEN 'val' ELSE 'test' END AS split FROM k),
         |p AS (SELECT least(a.split, b.split) AS split_a,
         |    greatest(a.split, b.split) AS split_b
         |  FROM mp JOIN asg a ON mp.id_a = a.doc_id
         |  JOIN asg b ON mp.id_b = b.doc_id)
         |SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
         |  (CASE WHEN split_a <> split_b THEN 1 ELSE 0 END)::BIGINT AS crosses
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Label-prop l2 labels (same unrolled rounds as graph_label_prop),
    // then exact modularity numerators over the normalized undirected
    // edge set: q_num = 4·m·e_c − d_c².
    "graph_modularity" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes,
         |u2 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e0 WHERE src != dst),
         |mm AS (SELECT count(*)::BIGINT AS m FROM u2),
         |degs AS (SELECT id, count(*)::BIGINT AS d FROM
         |  (SELECT a AS id FROM u2 UNION ALL SELECT b AS id FROM u2) GROUP BY id),
         |ei AS (SELECT la.label, count(*)::BIGINT AS e_c FROM u2
         |  JOIN l2 la ON u2.a = la.id JOIN l2 lb ON u2.b = lb.id
         |  WHERE la.label = lb.label GROUP BY 1),
         |ds AS (SELECT l2.label, count(*)::BIGINT AS n_nodes,
         |    sum(d)::BIGINT AS degree_sum
         |  FROM l2 JOIN degs USING (id) GROUP BY 1),
         |f AS (SELECT ds.label, ds.n_nodes,
         |    coalesce(ei.e_c, 0)::BIGINT AS intra_edges, ds.degree_sum,
         |    (4 * (SELECT m FROM mm) * coalesce(ei.e_c, 0)
         |      - ds.degree_sum * ds.degree_sum)::BIGINT AS q_num
         |  FROM ds LEFT JOIN ei USING (label))
         |SELECT label, n_nodes, intra_edges, degree_sum, q_num,
         |  floor(q_num::DOUBLE / (4.0 * (SELECT m FROM mm)::DOUBLE
         |    * (SELECT m FROM mm)::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS q_4dp
         |FROM f ORDER BY label""".stripMargin
    },

    // Exact integer gap moments (gaps in clamped whole seconds), then
    // one rounded float formula each for mean and cv — the rel_corr
    // discipline; the cv numerator multiplies as doubles on both sides.
    "events_bot_score" ->
      """WITH g0 AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (SELECT user_id,
        |    least((epoch_us(ts) - epoch_us(prev)) // 1000000, 86400)::BIGINT AS gs
        |  FROM g0 WHERE prev IS NOT NULL),
        |a AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
        |    sum(gs)::BIGINT AS sg, sum(gs * gs)::BIGINT AS sgg
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_gaps,
        |  floor(sg::DOUBLE / n_gaps::DOUBLE * 10000.0 + 0.5) / 10000.0 AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN
        |    floor(sqrt(n_gaps::DOUBLE * sgg::DOUBLE - sg::DOUBLE * sg::DOUBLE)
        |      / sg::DOUBLE * 10000.0 + 0.5) / 10000.0
        |  END AS cv_gap
        |FROM a WHERE n_gaps >= 10 ORDER BY user_id""".stripMargin,

    // Decorrelated twin of the asof attribution: per purchase, the
    // latest prior click by (ts, event_id), ties at the purchase instant
    // inclusive; integer-cent revenue keeps the bucket sums exact.
    "events_attribution" ->
      """WITH conv AS (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id,
        |    json_extract_string(props, '$.k')::BIGINT % 10 AS camp
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT c.event_id AS ceid, c.value,
        |    (SELECT t.camp FROM t
        |     WHERE t.user_id = c.user_id AND t.ts <= c.ts
        |     ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS camp
        |  FROM conv c)
        |SELECT coalesce(camp, -1)::BIGINT AS campaign,
        |  count(*)::BIGINT AS n_conv,
        |  sum(floor(value * 100)::BIGINT)::BIGINT AS revenue_c
        |FROM a GROUP BY 1 ORDER BY campaign""".stripMargin,

    // Turn cap first (row_number <= 16 on the same (ts, event_id) total
    // order), then per-user assembly; span in whole seconds from
    // microsecond epochs.
    "events_dialogs" ->
      """WITH rk AS (SELECT user_id, event_type, ts, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn
        |  FROM events),
        |c AS (SELECT * FROM rk WHERE turn <= 16)
        |SELECT user_id, count(*)::BIGINT AS n_turns,
        |  epoch_us(min(ts))::BIGINT AS first_us,
        |  epoch_us(max(ts))::BIGINT AS last_us,
        |  ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::BIGINT AS span_sec,
        |  string_agg(event_type, ' > ' ORDER BY ts, event_id) AS transcript
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Tie-corrected rank-sum AUC over the 4-dp score grid; doubled
    // mid-ranks keep everything integer. All quantities non-negative, so
    // Spark DIV (truncate) == DuckDB // (floor).
    "eval_auc" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS np
         |  FROM sc GROUP BY 1),
         |c AS (SELECT s, n, np, coalesce(sum(n) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
         |  FROM g),
         |a AS (SELECT sum(np)::BIGINT AS n_pos, sum(n - np)::BIGINT AS n_neg,
         |  sum(np * (2 * below + n + 1))::BIGINT AS r2 FROM c)
         |SELECT n_pos, n_neg,
         |  (r2 - n_pos * (n_pos + 1))::BIGINT AS auc_num,
         |  (2 * n_pos * n_neg)::BIGINT AS auc_den,
         |  CASE WHEN n_pos * n_neg > 0 THEN
         |    ((r2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg))::BIGINT
         |  END AS auc_ppm
         |FROM a""".stripMargin,

    // Literal-grid confusion sweep; predict positive iff s >= t.
    "eval_confusion" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |t AS (SELECT unnest([${EvalThresholds.mkString(", ")}]::BIGINT[]) AS threshold),
         |f AS (SELECT t.threshold, (sc.s >= t.threshold)::BIGINT AS p, sc.y
         |  FROM sc CROSS JOIN t),
         |g AS (SELECT threshold, sum(p * y)::BIGINT AS tp,
         |    sum(p * (1 - y))::BIGINT AS fp, sum((1 - p) * y)::BIGINT AS fn,
         |    sum((1 - p) * (1 - y))::BIGINT AS tn
         |  FROM f GROUP BY 1)
         |SELECT threshold, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN (tp * 1000000 // (tp + fp))::BIGINT END AS prec_ppm,
         |  CASE WHEN tp + fn > 0 THEN (tp * 1000000 // (tp + fn))::BIGINT END AS rec_ppm,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    (2 * tp * 1000000 // (2 * tp + fp + fn))::BIGINT END AS f1_ppm
         |FROM g ORDER BY threshold""".stripMargin,

    // NDCG@10: the SAME driver-computed integer discount table as the
    // Spark plan (floor(1e6/log2(r+1)) literals), actual and ideal
    // rankings tie-broken by vec_id.
    "eval_ndcg" -> {
      val disc = evals.ndcgDiscounts(10).zipWithIndex
        .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
      s"""WITH d AS (SELECT * FROM (VALUES $disc) v(rnk, disc)),
         |r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id,
         |    (CASE WHEN label = 3 THEN 2 WHEN label = 7 THEN 1 ELSE 0 END)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id,
         |    (CASE WHEN label = 5 THEN 2 WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |dcg AS (SELECT qid, sum(rel * disc)::BIGINT AS dcg_q6
         |  FROM a JOIN d USING (rnk) WHERE rnk <= 10 GROUP BY 1),
         |i AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel DESC, vec_id) AS rnk FROM r0),
         |idcg AS (SELECT qid, sum(rel * disc)::BIGINT AS idcg_q6
         |  FROM i JOIN d USING (rnk) WHERE rnk <= 10 GROUP BY 1)
         |SELECT qid, dcg_q6, idcg_q6,
         |  CASE WHEN idcg_q6 > 0 THEN (dcg_q6 * 1000000 // idcg_q6)::BIGINT
         |  END AS ndcg_ppm
         |FROM dcg JOIN idcg USING (qid) ORDER BY qid""".stripMargin
    },

    // Log-loss/Brier with clamped ppm probabilities; per-row floor
    // quantization before the sums keeps both totals exact integers.
    "eval_logloss" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s, (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |p AS (SELECT least(greatest((s + 10000) * 50, 1), 999999)::BIGINT AS p, y
         |  FROM sc),
         |r AS (SELECT y,
         |    floor(-ln((CASE WHEN y = 1 THEN p ELSE 1000000 - p END)::DOUBLE
         |      / 1000000.0) * 1000000.0)::BIGINT AS ll,
         |    ((p - y * 1000000) * (p - y * 1000000) // 1000000)::BIGINT AS br
         |  FROM p)
         |SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
         |  sum(ll)::BIGINT AS logloss_q6_sum, sum(br)::BIGINT AS brier_micro_sum,
         |  (sum(ll)::BIGINT // count(*))::BIGINT AS logloss_mean_q6,
         |  (sum(br)::BIGINT // count(*))::BIGINT AS brier_mean_micro
         |FROM r""".stripMargin,

    // KM estimator: entry = first signup, conversion = first purchase at
    // or after it, censoring at global max ts; survival as the running
    // exact-integer sum of per-bucket floor-quantized ln terms, null
    // from the first curve-zero bucket onward.
    "events_kaplan_meier" ->
      """WITH entry AS (SELECT user_id, min(ts) AS fts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (SELECT e.user_id, min(c.ts) AS tts FROM entry e
        |  JOIN events c ON c.user_id = e.user_id
        |    AND c.event_type = 'purchase' AND c.ts >= e.fts GROUP BY 1),
        |d AS (SELECT
        |    ((epoch_us(coalesce(c.tts, (SELECT max(ts) FROM events)))
        |      - epoch_us(e.fts)) // 1000000) // 86400 AS t,
        |    (c.tts IS NOT NULL)::BIGINT AS obs
        |  FROM entry e LEFT JOIN conv c USING (user_id)),
        |bt AS (SELECT t, count(*)::BIGINT AS n_all, sum(obs)::BIGINT AS n_event,
        |    sum(1 - obs)::BIGINT AS n_censored FROM d GROUP BY 1),
        |r AS (SELECT t, n_event, n_censored,
        |    ((SELECT sum(n_all) FROM bt)::BIGINT - coalesce(sum(n_all)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0))::BIGINT AS n_risk
        |  FROM bt),
        |q AS (SELECT t, n_risk, n_event, n_censored,
        |    CASE WHEN n_event > 0 AND n_event < n_risk THEN
        |      floor(ln((n_risk - n_event)::DOUBLE / n_risk::DOUBLE)
        |        * 1000000000.0)::BIGINT
        |    WHEN n_event = 0 THEN 0 END AS term,
        |    max(CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS dead
        |  FROM r)
        |SELECT t, n_risk, n_event, n_censored,
        |  (CASE WHEN dead = 0 THEN sum(term)
        |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  END)::BIGINT AS ln_surv_q9
        |FROM q ORDER BY t""".stripMargin,

    // 2×2 DiD cells as exact integers; the interaction is the one
    // documented float formula, both engines dividing the SAME exact
    // cent/user integers.
    "events_did" ->
      """WITH per AS (SELECT user_id % 2 AS v,
        |    (ts >= TIMESTAMP '2024-01-15 00:00:00')::BIGINT AS post, user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS s
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT
        |  sum(CASE WHEN v = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS u00,
        |  sum(CASE WHEN v = 0 AND post = 0 THEN s ELSE 0 END)::BIGINT AS cents00,
        |  sum(CASE WHEN v = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS u01,
        |  sum(CASE WHEN v = 0 AND post = 1 THEN s ELSE 0 END)::BIGINT AS cents01,
        |  sum(CASE WHEN v = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS u10,
        |  sum(CASE WHEN v = 1 AND post = 0 THEN s ELSE 0 END)::BIGINT AS cents10,
        |  sum(CASE WHEN v = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS u11,
        |  sum(CASE WHEN v = 1 AND post = 1 THEN s ELSE 0 END)::BIGINT AS cents11
        |  FROM per)
        |SELECT u00, cents00, u01, cents01, u10, cents10, u11, cents11,
        |  CASE WHEN u00 > 0 AND u01 > 0 AND u10 > 0 AND u11 > 0 THEN
        |    floor(((cents11::DOUBLE / u11::DOUBLE - cents10::DOUBLE / u10::DOUBLE)
        |      - (cents01::DOUBLE / u01::DOUBLE - cents00::DOUBLE / u00::DOUBLE))
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS did_4dp
        |FROM w""".stripMargin,

    // Dense spine per series, forward fill via IGNORE NULLS last_value;
    // fills flagged by observed = 0.
    "events_gapfill" ->
      """WITH sums AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM sums GROUP BY series),
        |j AS (SELECT sp.series, sp.t, sums.c
        |  FROM sp LEFT JOIN sums USING (series, t))
        |SELECT series, t,
        |  last_value(c IGNORE NULLS) OVER (PARTITION BY series ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cents,
        |  (c IS NOT NULL)::BIGINT AS observed
        |FROM j ORDER BY series, t""".stripMargin,

    // Seasonal-naive vs lag-1 persistence on the densified count series;
    // evaluable rows are exactly those with the seasonal lag defined.
    "events_snaive" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |l AS (SELECT series, c,
        |    lag(c, 168) OVER (PARTITION BY series ORDER BY t) AS ls,
        |    lag(c, 1) OVER (PARTITION BY series ORDER BY t) AS l1
        |  FROM d)
        |SELECT series, count(*)::BIGINT AS n_eval,
        |  sum(abs(c - ls))::BIGINT AS mae_num, count(*)::BIGINT AS mae_den,
        |  sum(abs(c - l1))::BIGINT AS naive_num,
        |  (CASE WHEN sum(abs(c - l1)) > 0 THEN
        |    sum(abs(c - ls))::BIGINT * 1000000 // sum(abs(c - l1))::BIGINT
        |  END)::BIGINT AS skill_ppm
        |FROM l WHERE ls IS NOT NULL GROUP BY series ORDER BY series""".stripMargin,

    // Median pairwise slope selected (never computed): pairs ordered by
    // the one-IEEE-division key with exact-integer tie-breaks, lower
    // median surfaced as its exact rational.
    "events_theilsen" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 86400 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |p AS (SELECT a.series, (b.c - a.c)::BIGINT AS num,
        |    (b.t - a.t)::BIGINT AS den, a.t AS t1
        |  FROM d a JOIN d b ON a.series = b.series AND a.t < b.t),
        |r AS (SELECT series, num, den,
        |    row_number() OVER (PARTITION BY series
        |      ORDER BY num::DOUBLE / den::DOUBLE, num, den, t1) AS rnk,
        |    count(*) OVER (PARTITION BY series) AS np
        |  FROM p)
        |SELECT series, np::BIGINT AS n_pairs, num AS med_num, den AS med_den
        |FROM r WHERE rnk = (np + 1) // 2 ORDER BY series""".stripMargin,

    // One-level a-priori: frequent items pruned before the pair stage,
    // both rule directions, all-positive ppm quotients.
    "rel_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |itn AS (SELECT i, count(*)::BIGINT AS n FROM it GROUP BY 1
        |  HAVING count(*) >= 150),
        |nb AS (SELECT count(DISTINCT b)::BIGINT AS n_baskets FROM it),
        |pr AS (SELECT it.b, it.i FROM it JOIN itn ON it.i = itn.i),
        |pn AS (SELECT a.i AS x, c.i AS y, count(*)::BIGINT AS pair_n
        |  FROM pr a JOIN pr c ON a.b = c.b AND a.i < c.i GROUP BY 1, 2
        |  HAVING count(*) >= 150),
        |dirs AS (SELECT x AS ante, y AS cons, pair_n FROM pn
        |  UNION ALL SELECT y, x, pair_n FROM pn)
        |SELECT bo.ante, bo.cons, bo.pair_n, ia.n AS ante_n, ic.n AS cons_n,
        |  nb.n_baskets,
        |  (bo.pair_n * 1000000 // ia.n)::BIGINT AS conf_ppm,
        |  (bo.pair_n * nb.n_baskets * 1000000 // (ia.n * ic.n))::BIGINT AS lift_ppm
        |FROM dirs bo JOIN itn ia ON bo.ante = ia.i
        |  JOIN itn ic ON bo.cons = ic.i CROSS JOIN nb
        |ORDER BY ante, cons""".stripMargin,

    // Out-of-fold encode: the same portable fold hash as sample_kfold,
    // exact complements per (cat, fold), one floor-4dp quotient.
    "rel_target_encode" ->
      s"""WITH f AS (SELECT o_orderpriority,
         |    (${graft.functions.hashing.sqlH32("(o_orderkey::VARCHAR || '/te')")} % 5)::INT AS fold,
         |    floor(o_totalprice * 100)::BIGINT AS c FROM orders),
         |cells AS (SELECT o_orderpriority, fold, count(*)::BIGINT AS n_fold,
         |    sum(c)::BIGINT AS s FROM f GROUP BY 1, 2),
         |t AS (SELECT o_orderpriority, sum(n_fold)::BIGINT AS nn,
         |    sum(s)::BIGINT AS ss FROM cells GROUP BY 1)
         |SELECT c.o_orderpriority, c.fold, c.n_fold,
         |  (t.nn - c.n_fold)::BIGINT AS oof_n, (t.ss - c.s)::BIGINT AS oof_cents,
         |  CASE WHEN t.nn - c.n_fold > 0 THEN
         |    floor((t.ss - c.s)::DOUBLE / (t.nn - c.n_fold)::DOUBLE * 10000.0)
         |      / 10000.0 END AS oof_mean_q4
         |FROM cells c JOIN t USING (o_orderpriority)
         |ORDER BY 1, 2""".stripMargin,

    // Grid-quantile RFM: cumulative counts over bounded value grids,
    // score maps joined back; ties share scores by construction.
    "rel_rfm" ->
      """WITH per AS (SELECT o_custkey, max(o_orderdate) AS lastd,
        |    count(*)::BIGINT AS n_orders,
        |    sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT o_custkey,
        |    date_diff('day', lastd, (SELECT max(o_orderdate) FROM orders))::BIGINT
        |      AS recency_days, n_orders, cents FROM per),
        |gr AS (SELECT -recency_days AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mr AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS r_score FROM gr),
        |gf AS (SELECT n_orders AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mf AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS f_score FROM gf),
        |gm AS (SELECT cents // 100000 AS v, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
        |mm AS (SELECT v, ((coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT * 5)
        |    // (sum(cnt) OVER ())::BIGINT + 1)::BIGINT AS m_score FROM gm)
        |SELECT b.o_custkey, b.recency_days, b.n_orders, b.cents,
        |  mr.r_score, mf.f_score, mm.m_score,
        |  (mr.r_score * 100 + mf.f_score * 10 + mm.m_score)::BIGINT AS rfm
        |FROM b JOIN mr ON -b.recency_days = mr.v
        |  JOIN mf ON b.n_orders = mf.v
        |  JOIN mm ON b.cents // 100000 = mm.v
        |ORDER BY o_custkey""".stripMargin,

    // Synchronous unit-weight Bellman-Ford unrolled 3 rounds over the
    // symmetrized kNN edges; distances are exact integer mins.
    "graph_bfs" -> {
      val rounds = (1 to 3).map(h =>
        s""",
           |d$h AS (SELECT id, min(dist)::BIGINT AS dist FROM (
           |  SELECT id, dist FROM d${h - 1}
           |  UNION ALL
           |  SELECT u.dst AS id, d.dist + 1 AS dist
           |  FROM u0 u JOIN d${h - 1} d ON u.src = d.id) GROUP BY id)""".stripMargin)
        .mkString
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |u0 AS (SELECT src, dst FROM e0
         |  UNION ALL SELECT dst, src FROM e0),
         |d0 AS (SELECT unnest([0, 1, 2, 3, 4])::BIGINT AS id, 0::BIGINT AS dist)$rounds
         |SELECT id, dist FROM d3 ORDER BY id""".stripMargin
    },

    // The same portable token hash pair: bucket from h32, sign from one
    // h32b bit; zero-sum buckets dropped on both engines.
    "text_feature_hash" -> {
      val h = graft.functions.hashing.sqlH32("(tok || '/fh')")
      val hb = graft.functions.hashing.sqlH32b("(tok || '/fh')")
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS tok
         |  FROM documents WHERE doc_id < 50),
         |s AS (SELECT doc_id, ($h % 256)::BIGINT AS bucket,
         |    (1 - 2 * ($hb % 2))::BIGINT AS sign FROM t),
         |a AS (SELECT doc_id, bucket, sum(sign)::BIGINT AS v
         |  FROM s GROUP BY 1, 2)
         |SELECT doc_id, bucket, v FROM a WHERE v != 0
         |ORDER BY doc_id, bucket""".stripMargin
    },

    // Upper-triangle exact integer Gram entries: quantize once per
    // element, multiply, sum — order-free on both engines.
    "vec_gram" ->
      """WITH s AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |q AS (SELECT list_transform(e, v -> floor(v * 10000)::BIGINT) AS qa FROM s),
        |d AS (SELECT unnest(range(0, 64))::INT AS i)
        |SELECT di.i AS i, dj.i AS j, count(*)::BIGINT AS n,
        |  sum(qa[di.i + 1] * qa[dj.i + 1])::BIGINT AS g
        |FROM q CROSS JOIN d di CROSS JOIN d dj
        |WHERE dj.i >= di.i
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,

    // Trace vs doubled |off-diagonal| mass of the same exact Gram;
    // the ratio is the one quantized float.
    "vec_anisotropy" ->
      """WITH s AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |q AS (SELECT list_transform(e, v -> floor(v * 10000)::BIGINT) AS qa FROM s),
        |d AS (SELECT unnest(range(0, 64))::INT AS i),
        |g AS (SELECT di.i AS i, dj.i AS j,
        |    sum(qa[di.i + 1] * qa[dj.i + 1])::BIGINT AS g
        |  FROM q CROSS JOIN d di CROSS JOIN d dj WHERE dj.i >= di.i
        |  GROUP BY 1, 2),
        |t AS (SELECT
        |    sum(CASE WHEN i = j THEN g ELSE 0 END)::BIGINT AS trace,
        |    sum(CASE WHEN i != j THEN abs(g) * 2 ELSE 0 END)::BIGINT AS offdiag_abs
        |  FROM g)
        |SELECT trace, offdiag_abs,
        |  CASE WHEN trace > 0 THEN
        |    floor(offdiag_abs::DOUBLE / trace::DOUBLE * 1000000.0 + 0.5) / 1000000.0
        |  END AS aniso_q6
        |FROM t""".stripMargin,

    // Endpoint-degree Pearson over the symmetrized kNN edges — exact
    // integer moments, corrExact's quantized float at the end.
    "graph_assortativity" ->
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2),
         |u0 AS (SELECT a AS src, b AS dst FROM e0
         |  UNION ALL SELECT b, a FROM e0),
         |deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM u0 GROUP BY 1),
         |pr AS (SELECT dx.d AS x, dy.d AS y FROM u0
         |  JOIN deg dx ON u0.src = dx.id JOIN deg dy ON u0.dst = dy.id),
         |m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy FROM pr)
         |SELECT n,
         |  CASE WHEN n > 1 AND (n * sxx - sx * sx)::DOUBLE > 0.0
         |      AND (n * syy - sy * sy)::DOUBLE > 0.0 THEN
         |    floor((n * sxy - sx * sy)::DOUBLE
         |      / (sqrt((n * sxx - sx * sx)::DOUBLE)
         |        * sqrt((n * syy - sy * sy)::DOUBLE)) * 10000.0 + 0.5) / 10000.0
         |  END AS corr
         |FROM m""".stripMargin,

    // Exact power sums of floor(value) per type; skewness is the one
    // engine-identical float chain over them.
    "sketch_moments" ->
      """WITH b AS (SELECT event_type, floor(value * 1.0)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS s1,
        |    sum(v * v)::BIGINT AS s2, sum(v * v * v)::BIGINT AS s3
        |  FROM b GROUP BY 1)
        |SELECT event_type, n, s1, s2, s3,
        |  CASE WHEN n > 0 AND (s2::DOUBLE / n::DOUBLE
        |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)) > 0.0 THEN
        |    floor((s3::DOUBLE / n::DOUBLE
        |        - 3.0 * (s1::DOUBLE / n::DOUBLE) * (s2::DOUBLE / n::DOUBLE)
        |        + 2.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |          * (s1::DOUBLE / n::DOUBLE))
        |      / ((s2::DOUBLE / n::DOUBLE
        |          - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
        |        * sqrt(s2::DOUBLE / n::DOUBLE
        |          - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)))
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS skew_q4
        |FROM a ORDER BY event_type""".stripMargin,

    // Two-sample MDE at alpha=.05/power=.8 (z-sum literal 2.801585):
    // exact per-user cents moments, sample variances, pooled, sqrt.
    "events_mde" ->
      """WITH per AS (SELECT user_id % 2 AS v, user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS s
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |  sum(CASE WHEN v = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |  sum(CASE WHEN v = 0 THEN s ELSE 0 END)::BIGINT AS cents0,
        |  sum(CASE WHEN v = 0 THEN s * s ELSE 0 END)::BIGINT AS ss0,
        |  sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |  sum(CASE WHEN v = 1 THEN s ELSE 0 END)::BIGINT AS cents1,
        |  sum(CASE WHEN v = 1 THEN s * s ELSE 0 END)::BIGINT AS ss1
        |  FROM per),
        |f AS (SELECT n0, n1, cents0, cents1,
        |  2.801585 * sqrt((((n0::DOUBLE - 1.0)
        |      * ((n0::DOUBLE * ss0::DOUBLE - cents0::DOUBLE * cents0::DOUBLE)
        |        / (n0::DOUBLE * (n0::DOUBLE - 1.0)))
        |    + (n1::DOUBLE - 1.0)
        |      * ((n1::DOUBLE * ss1::DOUBLE - cents1::DOUBLE * cents1::DOUBLE)
        |        / (n1::DOUBLE * (n1::DOUBLE - 1.0))))
        |    / (n0::DOUBLE + n1::DOUBLE - 2.0))
        |    * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)) AS mde
        |  FROM w)
        |SELECT n0, n1, cents0, cents1,
        |  CASE WHEN n0 > 1 AND n1 > 1 THEN
        |    floor(mde * 100.0 + 0.5) / 100.0 END AS mde_cents_q2,
        |  CASE WHEN n0 > 1 AND n1 > 1 AND cents0 > 0 THEN
        |    floor(mde / (cents0::DOUBLE / n0::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |  END AS mde_rel_q4
        |FROM f""".stripMargin,

    // Hash-seeded Poisson multiplicities from the SAME injected CDF
    // literals; one pass, map-side collapse to 40 rows per task.
    "events_bootstrap_ci" -> {
      val h = graft.functions.hashing.sqlH32("(event_id::VARCHAR || '/boot')")
      val aff = graft.functions.hashing.sqlAffineVar("h", "rep")
      val p = graft.functions.hashing.AffineP
      val cdf = graft.ops.sample.PoissonCdf
      val w = cdf.zipWithIndex
        .map { case (t, k) => s"WHEN uu < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""WITH r AS (SELECT floor(value * 100)::BIGINT AS c, ($h)::BIGINT AS h,
         |    unnest(range(0, 40)) AS rep
         |  FROM events WHERE value IS NOT NULL),
         |u AS (SELECT rep, c, ($aff)::DOUBLE / $p.0 AS uu FROM r),
         |ww AS (SELECT rep, c, ($w)::BIGINT AS w FROM u),
         |a AS (SELECT rep, sum(w)::BIGINT AS n_eff,
         |    sum(w * c)::BIGINT AS cents FROM ww GROUP BY 1)
         |SELECT rep, n_eff, cents,
         |  CASE WHEN n_eff > 0 THEN
         |    floor(cents::DOUBLE / n_eff::DOUBLE * 10000.0) / 10000.0
         |  END AS mean_q4
         |FROM a ORDER BY rep""".stripMargin
    },

    "vec_linear_probe" -> sqlLinearProbe(dims = 8, iters = 2, q = 100L,
      lrInv = 1L),

    // Cohort = first-event week, age = whole weeks since; exact cents,
    // cumulative over age, one floor-4dp per-user quotient.
    "events_cohort_ltv" ->
      """WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY 1),
        |aged AS (SELECT e.user_id,
        |    (epoch_us(f.fts) // 1000000) // 604800 AS cohort,
        |    ((epoch_us(e.ts) - epoch_us(f.fts)) // 1000000) // 604800 AS age,
        |    floor(coalesce(e.value, 0) * 100)::BIGINT AS c
        |  FROM events e JOIN f USING (user_id)),
        |cells AS (SELECT cohort, age, count(DISTINCT user_id)::BIGINT AS n_active,
        |    sum(c)::BIGINT AS cents FROM aged GROUP BY 1, 2),
        |sizes AS (SELECT (epoch_us(fts) // 1000000) // 604800 AS cohort,
        |    count(*)::BIGINT AS cohort_users FROM f GROUP BY 1),
        |cum AS (SELECT cohort, age, n_active, cents,
        |    sum(cents) OVER (PARTITION BY cohort ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cum_cents
        |  FROM cells)
        |SELECT c.cohort, c.age, c.n_active, c.cents, c.cum_cents,
        |  s.cohort_users,
        |  floor(c.cum_cents::DOUBLE / s.cohort_users::DOUBLE * 10000.0)
        |    / 10000.0 AS ltv_q4
        |FROM cum c JOIN sizes s USING (cohort)
        |ORDER BY cohort, age""".stripMargin,

    "rel_tpch_q6" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |    * floor(l_discount * 100 + 0.5)::BIGINT)::BIGINT AS revenue_qc
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND floor(l_discount * 100 + 0.5)::BIGINT BETWEEN 5 AND 7""".stripMargin,

    "rel_tpch_q3" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |  sum(floor(l.l_extendedprice * 100)::BIGINT
        |    * (100 - floor(l.l_discount * 100 + 0.5)::BIGINT))::BIGINT
        |    AS revenue_qc
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_qc DESC, l_orderkey LIMIT 10""".stripMargin,

    // Candidate 5-grams vs the reference's distinct gram set; same
    // tokenizer, counts exact, one floor-4dp fraction.
    "dedup_cross_novelty" -> SqlCrossNovelty,

    "dedup_novelty_indexed" -> SqlCrossNovelty,

    // Community sizes + exact internal undirected edges + ppm density
    // over the SAME unrolled label-prop rounds as graph_label_prop.
    "graph_community_stats" -> {
      val iterCtes = (0 until 2).map { i =>
        s"""c$i AS (SELECT u.src AS id, l.label, count(*) AS c
           |  FROM und u JOIN l$i l ON u.dst = l.id GROUP BY 1, 2),
           |t$i AS (SELECT id, label FROM (SELECT id, label,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1),
           |l${i + 1} AS (SELECT nodes.id, coalesce(t$i.label, nodes.id) AS label
           |  FROM nodes LEFT JOIN t$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $SqlKnnCtes,
         |e0 AS (SELECT src, dst FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |$iterCtes,
         |sizes AS (SELECT label, count(*)::BIGINT AS n_nodes FROM l2 GROUP BY 1),
         |internal AS (SELECT ls.label, (count(*) // 2)::BIGINT AS internal_edges
         |  FROM und u JOIN l2 ls ON u.src = ls.id JOIN l2 ld ON u.dst = ld.id
         |  WHERE ls.label = ld.label GROUP BY 1)
         |SELECT s.label, s.n_nodes,
         |  coalesce(i.internal_edges, 0)::BIGINT AS internal_edges,
         |  (CASE WHEN s.n_nodes > 1 THEN
         |    coalesce(i.internal_edges, 0) * 1000000
         |      // ((s.n_nodes * (s.n_nodes - 1)) // 2) END)::BIGINT AS density_ppm
         |FROM sizes s LEFT JOIN internal i USING (label)
         |ORDER BY label""".stripMargin
    },

    // Top-10 overlap counts under the same 4dp scorer and tie order.
    "eval_pr_at_k" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id, (label = 3)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id, (label = 5)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |g AS (SELECT qid, sum((rel > 0)::BIGINT)::BIGINT AS n_rel_total,
         |    sum(CASE WHEN rnk <= 10 AND rel > 0 THEN 1 ELSE 0 END)::BIGINT
         |      AS n_rel_topk
         |  FROM a GROUP BY 1)
         |SELECT qid, n_rel_total, n_rel_topk,
         |  (n_rel_topk * 1000000 // 10)::BIGINT AS p_at_k_ppm,
         |  (CASE WHEN n_rel_total > 0 THEN n_rel_topk * 1000000 // n_rel_total
         |   END)::BIGINT AS r_at_k_ppm
         |FROM g ORDER BY qid""".stripMargin,

    // First relevant rank within the top 10 under the same 4dp scorer.
    "eval_mrr" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id, (label = 3)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id, (label = 5)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, vec_id) AS rnk FROM r0),
         |f AS (SELECT qid, min(CASE WHEN rel > 0 THEN rnk END)::BIGINT
         |    AS first_rank
         |  FROM a WHERE rnk <= 10 GROUP BY 1)
         |SELECT qid, first_rank,
         |  coalesce(1000000 // first_rank, 0)::BIGINT AS rr_ppm
         |FROM f ORDER BY qid""".stripMargin,

    // ROUGE-2 both directions: clipped bigram multiset intersection.
    "eval_rouge2" ->
      s"""WITH t AS ($SqlGenToks),
         |g AS (SELECT doc_id, ${sqlNgrams("ct", "2")} AS cg,
         |  ${sqlNgrams("rt", "2")} AS rg FROM t),
         |cc AS (SELECT doc_id, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, unnest(cg) AS g2 FROM g) GROUP BY 1, 2),
         |rc AS (SELECT doc_id, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, unnest(rg) AS g2 FROM g) GROUP BY 1, 2),
         |cl AS (SELECT cc.doc_id, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.gram = rc.gram
         |  GROUP BY 1),
         |z AS (SELECT g.doc_id, len(cg)::BIGINT AS cand_n,
         |  len(rg)::BIGINT AS ref_n, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id)
         |SELECT doc_id, cand_n, ref_n, clip,
         |  (CASE WHEN cand_n > 0 THEN clip * 1000000 // cand_n
         |   END)::BIGINT AS prec_ppm,
         |  (CASE WHEN ref_n > 0 THEN clip * 1000000 // ref_n
         |   END)::BIGINT AS rec_ppm,
         |  (CASE WHEN cand_n + ref_n > 0 THEN
         |    2 * clip * 1000000 // (cand_n + ref_n) END)::BIGINT AS f1_ppm
         |FROM z ORDER BY doc_id""".stripMargin,

    // ROUGE-L: the LCS DP replayed as a recursive CTE over the capped
    // token prefixes — row i is the full DP row after consuming ref
    // token i, via the prefix-max form dp[i][j] = max(dp[i-1][j],
    // max_{k<=j}(dp[i-1][k-1] + eq(c[k], r[i]))).
    "eval_rouge_l" ->
      s"""WITH RECURSIVE t AS ($SqlGenToks),
         |p AS (SELECT doc_id, list_slice(ct, 1, 32) AS c,
         |  list_slice(rt, 1, 32) AS r FROM t),
         |dp AS (
         |  SELECT doc_id, c, r, 0 AS i,
         |    list_transform(range(0, len(c) + 1), x -> 0::BIGINT) AS dpr
         |  FROM p
         |  UNION ALL
         |  SELECT doc_id, c, r, i + 1,
         |    list_transform(range(0, len(c) + 1), j ->
         |      CASE WHEN j = 0 THEN 0::BIGINT ELSE
         |        greatest(dpr[j + 1],
         |          list_max(list_transform(range(1, j + 1), k ->
         |            dpr[k] + (CASE WHEN c[k] = r[i + 1] THEN 1 ELSE 0
         |              END)::BIGINT)))
         |      END)
         |  FROM dp WHERE i < len(r)),
         |f AS (SELECT doc_id, dpr[len(c) + 1] AS lcs,
         |    len(c)::BIGINT AS m_cand, len(r)::BIGINT AS n_ref
         |  FROM dp WHERE i = len(r))
         |SELECT doc_id, lcs, m_cand, n_ref,
         |  (CASE WHEN m_cand + n_ref > 0 THEN
         |    (2 * lcs * 1000000) // (m_cand + n_ref) END)::BIGINT AS f_ppm
         |FROM f ORDER BY doc_id""".stripMargin,

    // Token-level WER: the Levenshtein DP replayed as a recursive CTE —
    // per ref token, the row update splits into vertical/diagonal
    // candidates then a prefix-min with unit horizontal cost
    // (D[i][j] = min_{k<=j}(tmp[k] + j - k), exact by the
    // one-insertion-per-step identity).
    "eval_wer" ->
      s"""WITH RECURSIVE t AS ($SqlGenToks),
         |p AS (SELECT doc_id, list_slice(ct, 1, 32) AS c,
         |  list_slice(rt, 1, 32) AS r FROM t),
         |dp AS (
         |  SELECT doc_id, c, r, 0 AS i,
         |    list_transform(range(0, len(c) + 1), x -> x::BIGINT) AS dpr
         |  FROM p
         |  UNION ALL
         |  SELECT doc_id, c, r, i + 1,
         |    list_transform(range(0, len(c) + 1), j ->
         |      list_min(list_transform(range(0, j + 1), k ->
         |        (CASE WHEN k = 0 THEN (i + 1)::BIGINT
         |         ELSE least(dpr[k + 1] + 1, dpr[k] +
         |           (CASE WHEN c[k] = r[i + 1] THEN 0 ELSE 1 END)::BIGINT)
         |         END) + (j - k))))
         |  FROM dp WHERE i < len(r)),
         |f AS (SELECT doc_id, dpr[len(c) + 1] AS dist,
         |    len(c)::BIGINT AS m_cand, len(r)::BIGINT AS n_ref
         |  FROM dp WHERE i = len(r))
         |SELECT doc_id, dist, m_cand, n_ref,
         |  (CASE WHEN n_ref > 0 THEN (dist * 1000000) // n_ref
         |   END)::BIGINT AS wer_ppm
         |FROM f ORDER BY doc_id""".stripMargin,

    // BLEU-4 in log space: per-n clipped precision (add-one smoothing
    // for n >= 2, unsmoothed p1 -> NULL on zero overlap), ln terms
    // quantized to 1e-6 longs per term, exact-rational brevity penalty.
    // max(CASE ...) pivots keep the NULL-propagating + (DuckDB's sum()
    // would IGNORE a NULL n=1 term; Spark's reduce(+) propagates it).
    "eval_bleu" -> {
      val pv = (1 to 4).map(n =>
        s"max(CASE WHEN n = $n THEN clip END)::BIGINT AS clip_$n,\n" +
          s"  max(CASE WHEN n = $n THEN tot END)::BIGINT AS tot_$n")
        .mkString(",\n  ")
      val q1 = "(CASE WHEN clip_1 > 0 AND tot_1 > 0 THEN " +
        "floor(ln(clip_1::DOUBLE / tot_1::DOUBLE) * 1000000.0)::BIGINT END)"
      val qRest = (2 to 4).map(n =>
        s"floor(ln((clip_$n + 1)::DOUBLE / (tot_$n + 1)::DOUBLE) " +
          "* 1000000.0)::BIGINT").mkString(" + ")
      val pCols = (1 to 4).map(n =>
        s"(CASE WHEN tot_$n > 0 THEN clip_$n * 1000000 // tot_$n " +
          s"END)::BIGINT AS p${n}_ppm").mkString(",\n  ")
      s"""WITH t AS ($SqlGenToks),
         |lens AS (SELECT doc_id, len(ct)::BIGINT AS cand_len,
         |  len(rt)::BIGINT AS ref_len FROM t),
         |g AS (SELECT doc_id, n, ${sqlNgrams("ct", "n")} AS cg,
         |  ${sqlNgrams("rt", "n")} AS rg
         |  FROM t CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n)),
         |cc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |rc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |cl AS (SELECT cc.doc_id, cc.n, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n
         |    AND cc.gram = rc.gram GROUP BY 1, 2),
         |pn AS (SELECT g.doc_id, g.n, len(g.cg)::BIGINT AS tot,
         |  coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.n = cl.n),
         |pv AS (SELECT doc_id,
         |  $pv
         |  FROM pn GROUP BY 1),
         |q AS (SELECT doc_id, tot_1, clip_1, tot_2, clip_2, tot_3, clip_3,
         |  tot_4, clip_4, $q1 + $qRest AS qsum FROM pv)
         |SELECT l.doc_id, l.cand_len, l.ref_len,
         |  $pCols,
         |  CASE WHEN l.cand_len > 0 THEN
         |    floor((qsum::DOUBLE / 4000000.0 + least(0.0,
         |      1.0 - l.ref_len::DOUBLE / l.cand_len::DOUBLE))
         |      * 10000.0 + 0.5) / 10000.0 END AS logbleu
         |FROM lens l LEFT JOIN q ON l.doc_id = q.doc_id
         |ORDER BY l.doc_id""".stripMargin
    },

    // chrF: char 1..4-gram clipped P/R averaged over n (all orders must
    // exist), F-2 combined with the floor-form 4dp quantization.
    "eval_chrf" -> {
      def cgrams(l: String) =
        s"CASE WHEN length($l) >= n THEN list_transform(" +
          s"range(1, length($l)-n+2), i -> $l[i:i+n-1]) " +
          s"ELSE []::VARCHAR[] END"
      s"""WITH t AS ($SqlGenToks),
         |s AS (SELECT doc_id, array_to_string(ct, '') AS cs,
         |  array_to_string(rt, '') AS rr FROM t),
         |g AS (SELECT doc_id, n, ${cgrams("cs")} AS cg,
         |  ${cgrams("rr")} AS rg
         |  FROM s CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n)),
         |cc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |rc AS (SELECT doc_id, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g) GROUP BY 1, 2, 3),
         |cl AS (SELECT cc.doc_id, cc.n, sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n
         |    AND cc.gram = rc.gram GROUP BY 1, 2),
         |pn AS (SELECT g.doc_id, g.n, len(g.cg)::BIGINT AS tot_c,
         |  len(g.rg)::BIGINT AS tot_r, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.n = cl.n),
         |pr AS (SELECT doc_id,
         |  CASE WHEN tot_c > 0 THEN clip * 1000000 // tot_c END AS p_n,
         |  CASE WHEN tot_r > 0 THEN clip * 1000000 // tot_r END AS r_n
         |  FROM pn),
         |a AS (SELECT doc_id, sum(p_n)::BIGINT AS ps, count(p_n) AS pc,
         |  sum(r_n)::BIGINT AS rsum, count(r_n) AS rcnt FROM pr GROUP BY 1),
         |f AS (SELECT doc_id,
         |  (CASE WHEN pc = 4 THEN ps // 4 END)::BIGINT AS chrp_ppm,
         |  (CASE WHEN rcnt = 4 THEN rsum // 4 END)::BIGINT AS chrr_ppm
         |  FROM a)
         |SELECT doc_id, chrp_ppm, chrr_ppm,
         |  CASE WHEN chrp_ppm + chrr_ppm > 0 THEN
         |    floor(5.0 * chrp_ppm * chrr_ppm / (4 * chrp_ppm + chrr_ppm)
         |      / 100.0 + 0.5) / 10000.0 END AS chrf
         |FROM f ORDER BY doc_id""".stripMargin
    },

    // Levenshtein on the ASCII projection (byte == char both engines).
    "eval_edit" ->
      s"""WITH t AS ($SqlGenToks),
         |p AS (SELECT doc_id,
         |  regexp_replace(array_to_string(ct, ' '), '[^ -~]', '', 'g') AS c,
         |  regexp_replace(array_to_string(rt, ' '), '[^ -~]', '', 'g') AS r
         |  FROM t),
         |d AS (SELECT doc_id, levenshtein(c, r)::BIGINT AS dist,
         |  greatest(length(c), length(r))::BIGINT AS m FROM p)
         |SELECT doc_id, dist,
         |  (CASE WHEN m > 0 THEN (m - dist) * 1000000 // m
         |   END)::BIGINT AS sim_ppm
         |FROM d ORDER BY doc_id""".stripMargin,

    // Calibration grid over the eval_logloss scorer fixture.
    "eval_reliability" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |b AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin, p, y
         |  FROM sc),
         |g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |  sum(p)::BIGINT AS conf_sum FROM b GROUP BY 1)
         |SELECT bin, n, pos, conf_sum,
         |  (pos * 1000000 // n)::BIGINT AS acc_ppm,
         |  (conf_sum // n)::BIGINT AS conf_ppm,
         |  abs(pos * 1000000 - conf_sum)::BIGINT AS gap_abs
         |FROM g ORDER BY bin""".stripMargin,

    // ECE/MCE: bin weights cancel -> one exact quotient each.
    "eval_ece" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |b AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin, p, y
         |  FROM sc),
         |g AS (SELECT bin, count(*)::BIGINT AS n,
         |  abs(sum(y) * 1000000 - sum(p))::BIGINT AS gap_abs FROM b GROUP BY 1)
         |SELECT sum(n)::BIGINT AS n_total,
         |  (sum(gap_abs) // sum(n))::BIGINT AS ece_ppm,
         |  max(gap_abs // n)::BIGINT AS mce_ppm
         |FROM g""".stripMargin,

    // Isotonic fit: the same minimax double chain — exact prefix sums,
    // one IEEE division per (i, k) pool, suffix-min/prefix-max windows
    // over the bounded pair grid, 6-dp quantize.
    "eval_isotonic" ->
      s"""WITH sc AS (SELECT floor((${sqlScoreQ4(Q1)}) / 100.0)::BIGINT AS s,
         |    (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
         |  FROM sc GROUP BY 1),
         |gg AS (SELECT s, n, p,
         |    row_number() OVER (ORDER BY s) AS j,
         |    sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
         |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cn
         |  FROM g),
         |pr AS (SELECT i.j AS i, k.j AS k,
         |    (k.cp - (i.cp - i.p))::DOUBLE / (k.cn - (i.cn - i.n))::DOUBLE AS r
         |  FROM gg i JOIN gg k ON k.j >= i.j),
         |m AS (SELECT i, k, min(r) OVER (PARTITION BY i ORDER BY k DESC
         |    ROWS UNBOUNDED PRECEDING) AS mm FROM pr),
         |f AS (SELECT i, k, max(mm) OVER (PARTITION BY k ORDER BY i
         |    ROWS UNBOUNDED PRECEDING) AS ff FROM m),
         |sel AS (SELECT k AS j, ff FROM f WHERE i = k)
         |SELECT gg.s, gg.n, gg.p AS pos,
         |  floor(ff * 1000000.0 + 0.5) / 1000000.0 AS fit_q6
         |FROM sel JOIN gg USING (j) ORDER BY gg.s""".stripMargin,

    // Isotonic apply: the same fit chain, grid rescaled x100 to q4
    // units, step-lookup via DuckDB's native ASOF LEFT JOIN (greatest
    // curve s <= raw score; below-grid scores clamp to the first fit
    // value — the documented isotonicApply contract), folded per
    // fitted value.
    "eval_isotonic_apply" ->
      s"""WITH sc AS (SELECT floor((${sqlScoreQ4(Q1)}) / 100.0)::BIGINT AS s,
         |    (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
         |  FROM sc GROUP BY 1),
         |gg AS (SELECT s, n, p,
         |    row_number() OVER (ORDER BY s) AS j,
         |    sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
         |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cn
         |  FROM g),
         |pr AS (SELECT i.j AS i, k.j AS k,
         |    (k.cp - (i.cp - i.p))::DOUBLE / (k.cn - (i.cn - i.n))::DOUBLE AS r
         |  FROM gg i JOIN gg k ON k.j >= i.j),
         |m AS (SELECT i, k, min(r) OVER (PARTITION BY i ORDER BY k DESC
         |    ROWS UNBOUNDED PRECEDING) AS mm FROM pr),
         |f AS (SELECT i, k, max(mm) OVER (PARTITION BY k ORDER BY i
         |    ROWS UNBOUNDED PRECEDING) AS ff FROM m),
         |curve AS (SELECT gg.s * 100 AS s,
         |    floor(ff * 1000000.0 + 0.5) / 1000000.0 AS fit_q6
         |  FROM f JOIN gg ON f.k = gg.j WHERE f.i = f.k),
         |raw AS (SELECT ${sqlScoreQ4(Q1)} AS sq4
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |ap AS (SELECT sq4, coalesce(fit_q6,
         |    (SELECT fit_q6 FROM curve ORDER BY s LIMIT 1)) AS fit_q6
         |  FROM raw ASOF LEFT JOIN curve ON raw.sq4 >= curve.s)
         |SELECT fit_q6 AS calibrated_q6, count(*)::BIGINT AS n,
         |  min(sq4)::BIGINT AS s_min, max(sq4)::BIGINT AS s_max
         |FROM ap GROUP BY 1 ORDER BY 1""".stripMargin,

    // Bootstrap CI: same md5+affine uniforms, same Poisson threshold
    // table, same conservative-outward percentile indices.
    "eval_bootstrap_ci" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT vec_id, ${sqlScoreQ4(Q1)} AS x, $h AS h
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v),
         |r AS (SELECT j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT mean_q6 FROM p) AS mean_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |FROM o""".stripMargin
    },

    // Grouped bootstrap: the same chain with (lang, replicate) keys and
    // per-lang order statistics.
    "eval_bootstrap_by_lang" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(doc_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT lang, n_chars::BIGINT AS x, $h AS h
         |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT lang, count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v GROUP BY lang),
         |r AS (SELECT lang, j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT lang, x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 100)) AS rr(j))
         |  GROUP BY lang, j),
         |m AS (SELECT lang, j,
         |  floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT lang, mq,
         |  row_number() OVER (PARTITION BY lang ORDER BY mq, j) AS rn,
         |  count(*) OVER (PARTITION BY lang) AS mm FROM m),
         |bd AS (SELECT lang, count(*)::BIGINT AS b_reps,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |  FROM o GROUP BY lang)
         |SELECT p.lang, n_rows, b_reps, mean_q6, lo_q6, hi_q6
         |FROM p JOIN bd USING (lang) ORDER BY p.lang""".stripMargin
    },

    // Cluster bootstrap: the row chain with the SOURCE as the hash key
    // (cluster-constant weights).
    "eval_bootstrap_clustered" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(source::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT n_chars::BIGINT AS x, $h AS h
         |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_q6 FROM v),
         |r AS (SELECT j, sum(w * x)::BIGINT AS swx, sum(w)::BIGINT AS sw
         |  FROM (SELECT x, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swx::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT mean_q6 FROM p) AS mean_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |FROM o""".stripMargin
    },

    // Paired bootstrap: same uniforms/weights as eval_bootstrap_ci,
    // Ratio-of-sums bootstrap: the by-lang chain with BOTH sums
    // reweighted by the same integer Poisson draws; zero-denominator
    // replicates dropped before the order statistic.
    "eval_bootstrap_ratio" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(doc_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT lang, n_chars::BIGINT AS x,
         |    len($SqlToks)::BIGINT AS d, $h AS h
         |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         |p AS (SELECT lang, count(*)::BIGINT AS n_rows,
         |  floor(sum(x)::DOUBLE / sum(d)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS ratio_q6 FROM v GROUP BY lang),
         |r AS (SELECT lang, j, sum(w * x)::BIGINT AS swx,
         |    sum(w * d)::BIGINT AS swd
         |  FROM (SELECT lang, x, d, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 100)) AS rr(j))
         |  GROUP BY lang, j),
         |m AS (SELECT lang, j,
         |  floor(swx::DOUBLE / swd::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE swd > 0),
         |o AS (SELECT lang, mq,
         |  row_number() OVER (PARTITION BY lang ORDER BY mq, j) AS rn,
         |  count(*) OVER (PARTITION BY lang) AS mm FROM m),
         |bd AS (SELECT lang, count(*)::BIGINT AS b_reps,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6
         |  FROM o GROUP BY lang)
         |SELECT p.lang, n_rows, b_reps, ratio_q6, lo_q6, hi_q6
         |FROM p JOIN bd USING (lang) ORDER BY p.lang""".stripMargin
    },

    // applied to the per-row difference; win rate over replicates.
    "eval_paired_bootstrap" -> {
      val cdf = evals.PoissonCdfPpm.mkString("[", ", ", "]")
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || ':boot')")
      s"""WITH v AS (SELECT vec_id,
         |    (${sqlScoreQ4(Q1)}) - (${sqlScoreQ4(Q2)}) AS d, $h AS h
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT count(*)::BIGINT AS n_rows,
         |  floor(sum(d)::DOUBLE / count(*)::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS diff_q6 FROM v),
         |r AS (SELECT j, sum(w * d)::BIGINT AS swd, sum(w)::BIGINT AS sw
         |  FROM (SELECT d, rr.j,
         |      len(list_filter($cdf, t -> t <=
         |        ((h * (2 * rr.j + 1) + 12582917 * rr.j) % 4294967291)
         |          % 1000000))::BIGINT AS w
         |    FROM v, unnest(range(0, 200)) AS rr(j))
         |  GROUP BY j),
         |m AS (SELECT j, floor(swd::DOUBLE / sw::DOUBLE * 1000000.0 + 0.5)
         |    / 1000000.0 AS mq FROM r WHERE sw > 0),
         |o AS (SELECT mq, row_number() OVER (ORDER BY mq, j) AS rn,
         |  count(*) OVER () AS mm FROM m)
         |SELECT (SELECT n_rows FROM p) AS n_rows,
         |  count(*)::BIGINT AS b_reps,
         |  (SELECT diff_q6 FROM p) AS diff_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 25000) // 1000000 + 1))
         |    THEN mq END) AS lo_q6,
         |  max(CASE WHEN rn = least(mm, greatest(1, (mm * 975000 + 999999) // 1000000))
         |    THEN mq END) AS hi_q6,
         |  (sum(CASE WHEN mq > 0 THEN 1 ELSE 0 END) * 1000000
         |    // count(*))::BIGINT AS win_ppm
         |FROM o""".stripMargin
    },

    // Murphy decomposition off the same grid: truncated per-bin ppm
    // quotients, HUGEINT weighted squared gaps, one DIV by N each.
    "eval_brier_decomp" ->
      s"""WITH sc AS (SELECT (${sqlScoreQ4(Q1)} + 10000) * 50 AS p,
         |  (label < 5)::BIGINT AS y
         |  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |g AS (SELECT least((p * 10) // 1000000, 9)::BIGINT AS bin,
         |    count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |    sum(p)::BIGINT AS cs
         |  FROM sc GROUP BY 1),
         |t AS (SELECT sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS pt FROM g),
         |yb AS (SELECT nt, pt, ((pt * 1000000) // nt)::BIGINT AS ybar FROM t),
         |a AS (SELECT nt, pt, ybar,
         |    sum(n::HUGEINT * ((cs // n) - ((pos * 1000000) // n))
         |      * ((cs // n) - ((pos * 1000000) // n))) AS rel,
         |    sum(n::HUGEINT * (((pos * 1000000) // n) - ybar)
         |      * (((pos * 1000000) // n) - ybar)) AS res
         |  FROM g, yb GROUP BY 1, 2, 3)
         |SELECT nt AS n, pt AS pos, ybar AS ybar_ppm,
         |  (rel // nt)::BIGINT AS rel_q12, (res // nt)::BIGINT AS res_q12,
         |  (ybar * (1000000 - ybar))::BIGINT AS unc_q12
         |FROM a""".stripMargin,

    // Doubled mid-ranks from value grids; rank sums are n(n+1) exactly.
    "eval_spearman" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS x, ${sqlScoreQ4(Q2)} AS y
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |gx AS (SELECT x AS v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1),
         |cx AS (SELECT v, (2 * coalesce(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1)::BIGINT AS r FROM gx),
         |gy AS (SELECT y AS v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1),
         |cy AS (SELECT v, (2 * coalesce(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1)::BIGINT AS r FROM gy),
         |j AS (SELECT cx.r AS rx, cy.r AS ry FROM sc
         |  JOIN cx ON sc.x = cx.v JOIN cy ON sc.y = cy.v),
         |a AS (SELECT count(*)::BIGINT AS n, sum(rx * ry)::BIGINT AS sxy,
         |  sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy FROM j),
         |f AS (SELECT n,
         |  (n * sxy - n * (n + 1) * n * (n + 1))::BIGINT AS num,
         |  (n * sxx - n * (n + 1) * n * (n + 1))::BIGINT AS den_x,
         |  (n * syy - n * (n + 1) * n * (n + 1))::BIGINT AS den_y FROM a)
         |SELECT n, num, den_x, den_y,
         |  CASE WHEN den_x > 0 AND den_y > 0 THEN
         |    floor(num::DOUBLE / sqrt(den_x::DOUBLE) / sqrt(den_y::DOUBLE)
         |      * 10000.0 + 0.5) / 10000.0 END AS rho
         |FROM f""".stripMargin,

    // Exact C/D masses over the joint grid's cell pairs; tie terms from
    // the marginals; spearman's division chain at the readout.
    "eval_kendall" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS x, ${sqlScoreQ4(Q2)} AS y
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT x, y, count(*)::BIGINT AS c FROM sc GROUP BY 1, 2),
         |cd AS (SELECT
         |    coalesce(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END),
         |      0)::BIGINT AS conc,
         |    coalesce(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END),
         |      0)::BIGINT AS disc
         |  FROM g a JOIN g b ON a.x < b.x),
         |tx AS (SELECT (coalesce(sum(t * (t - 1)), 0) // 2)::BIGINT AS tie_x
         |  FROM (SELECT count(*)::BIGINT AS t FROM sc GROUP BY x)),
         |ty AS (SELECT (coalesce(sum(t * (t - 1)), 0) // 2)::BIGINT AS tie_y
         |  FROM (SELECT count(*)::BIGINT AS t FROM sc GROUP BY y)),
         |m AS (SELECT count(*)::BIGINT AS n,
         |  ((count(*) * (count(*) - 1)) // 2)::BIGINT AS n0 FROM sc)
         |SELECT n, conc, disc, tie_x, tie_y,
         |  CASE WHEN n0 > tie_x AND n0 > tie_y THEN
         |    floor((conc - disc)::DOUBLE / sqrt((n0 - tie_x)::DOUBLE)
         |      / sqrt((n0 - tie_y)::DOUBLE) * 10000.0 + 0.5) / 10000.0
         |  END AS tau_q4
         |FROM m, tx, ty, cd""".stripMargin,

    // Exact win/tie/loss between the two fixed scorers.
    "eval_winrate" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS a, ${sqlScoreQ4(Q2)} AS b
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT count(*)::BIGINT AS n,
         |  sum((a > b)::BIGINT)::BIGINT AS wins,
         |  sum((a = b)::BIGINT)::BIGINT AS ties,
         |  sum((a < b)::BIGINT)::BIGINT AS losses FROM sc)
         |SELECT n, wins, ties, losses,
         |  (CASE WHEN n > 0 THEN wins * 1000000 // n END)::BIGINT AS win_ppm,
         |  (CASE WHEN n > 0 THEN (2 * wins + ties) * 1000000 // (2 * n)
         |   END)::BIGINT AS win_tie_ppm
         |FROM g""".stripMargin,

    // Win indicator through the same deterministic Poisson bootstrap
    // replay as events_bootstrap_ci.
    "eval_winrate_ci" -> {
      val h = graft.functions.hashing.sqlH32("(vec_id::VARCHAR || '/wr')")
      val aff = graft.functions.hashing.sqlAffineVar("h", "rep")
      val p = graft.functions.hashing.AffineP
      val w = graft.ops.sample.PoissonCdf.zipWithIndex
        .map { case (t, k) => s"WHEN uu < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 6 END")
      s"""WITH sc AS (SELECT vec_id, ${sqlScoreQ4(Q1)} AS a,
         |    ${sqlScoreQ4(Q2)} AS b
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |ind AS (SELECT vec_id, CASE WHEN a > b THEN 1.0
         |    WHEN a = b THEN 0.5 ELSE 0.0 END AS v FROM sc),
         |r AS (SELECT floor(v * 100)::BIGINT AS c, ($h)::BIGINT AS h,
         |    unnest(range(0, 20)) AS rep FROM ind),
         |u AS (SELECT rep, c, ($aff)::DOUBLE / $p.0 AS uu FROM r),
         |ww AS (SELECT rep, c, ($w)::BIGINT AS w FROM u),
         |a AS (SELECT rep, sum(w)::BIGINT AS n_eff,
         |    sum(w * c)::BIGINT AS cents FROM ww GROUP BY 1)
         |SELECT rep, n_eff, cents,
         |  CASE WHEN n_eff > 0 THEN
         |    floor(cents::DOUBLE / n_eff::DOUBLE * 10000.0) / 10000.0
         |  END AS mean_q4
         |FROM a ORDER BY rep""".stripMargin
    },

    // Per-day reliability grid folded to ECE/MCE; hash-derived scorer.
    "events_calibration_drift" ->
      s"""WITH sc AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |  (${hashing.sqlH32("user_id::VARCHAR")}) % 1000001 AS p,
         |  (event_type = 'purchase')::BIGINT AS y
         |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |b AS (SELECT day, least((p * 10) // 1000000, 9)::BIGINT AS bin,
         |  p, y FROM sc),
         |g AS (SELECT day, bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
         |  sum(p)::BIGINT AS conf_sum FROM b GROUP BY 1, 2),
         |gg AS (SELECT day, n,
         |  abs(pos * 1000000 - conf_sum)::BIGINT AS gap FROM g)
         |SELECT day, sum(n)::BIGINT AS n_total,
         |  (sum(gap) // sum(n))::BIGINT AS ece_ppm,
         |  max(gap // n)::BIGINT AS mce_ppm
         |FROM gg GROUP BY 1 ORDER BY day""".stripMargin,

    // Per-day win/tie/loss of the two hash-derived scorers; truncating
    // ppm conventions identical to eval_winrate.
    "events_winrate_drift" ->
      s"""WITH sc AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |  (${hashing.sqlH32("user_id::VARCHAR || 'a'")}) % 1000 AS a,
         |  (${hashing.sqlH32("user_id::VARCHAR || 'b'")}) % 1000 AS b
         |  FROM events WHERE user_id IS NOT NULL),
         |g AS (SELECT day, count(*)::BIGINT AS n,
         |  sum((a > b)::BIGINT)::BIGINT AS wins,
         |  sum((a = b)::BIGINT)::BIGINT AS ties,
         |  sum((a < b)::BIGINT)::BIGINT AS losses FROM sc GROUP BY 1)
         |SELECT day, n, wins, ties, losses,
         |  (CASE WHEN n > 0 THEN wins * 1000000 // n END)::BIGINT AS win_ppm,
         |  (CASE WHEN n > 0 THEN (2 * wins + ties) * 1000000 // (2 * n)
         |   END)::BIGINT AS win_tie_ppm
         |FROM g ORDER BY day""".stripMargin,

    // Corpus distinct-n diversity: exact distinct over total grams.
    "eval_distinct_n" ->
      s"""WITH t AS (SELECT $SqlToks AS toks FROM documents),
         |g1 AS (SELECT unnest(${sqlNgrams("toks", "1")}) AS g FROM t),
         |a1 AS (SELECT 1::BIGINT AS n, count(*)::BIGINT AS total,
         |  count(DISTINCT g)::BIGINT AS uniq FROM g1),
         |g2 AS (SELECT unnest(${sqlNgrams("toks", "2")}) AS g FROM t),
         |a2 AS (SELECT 2::BIGINT AS n, count(*)::BIGINT AS total,
         |  count(DISTINCT g)::BIGINT AS uniq FROM g2),
         |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
         |SELECT n, total, uniq,
         |  (CASE WHEN total > 0 THEN uniq * 1000000 // total
         |   END)::BIGINT AS distinct_ppm
         |FROM u ORDER BY n""".stripMargin,

    // BERTScore-style embed F1: the 4x16 token lattice unrolled — 16
    // quantized cosines, greedy row/col maxima, one positive integer
    // DIV for F1. The * chain mirrors Spark's left-assoc
    // dot*invA*invB*1e4 exactly.
    "eval_embed_f1" -> {
      def sl(e: String, k: Int) =
        s"list_slice($e, ${k * 16 + 1}, ${k * 16 + 16})"
      val slices = (0 until 4).map(i => s"${sl(E, i)} AS c$i") ++
        (0 until 4).map(j => s"${sl(s"list_reverse($E)", j)} AS r$j")
      def inv(c: String) =
        s"(CASE WHEN list_dot_product($c, $c) > 0 THEN " +
          s"1.0/sqrt(list_dot_product($c, $c)) ELSE 0.0 END)"
      val invs = (0 until 4).map(i => s"${inv(s"c$i")} AS ic$i") ++
        (0 until 4).map(j => s"${inv(s"r$j")} AS ir$j")
      val coss = (for { i <- 0 until 4; j <- 0 until 4 } yield
        s"floor(list_dot_product(c$i, r$j) * ic$i * ir$j * 10000.0 + 0.5)" +
          s"::BIGINT AS s${i}_$j").mkString(",\n|  ")
      val pTerms = (0 until 4)
        .map(i => "greatest(" + (0 until 4).map(j => s"s${i}_$j").mkString(", ") + ")")
        .mkString(" + ")
      val rTerms = (0 until 4)
        .map(j => "greatest(" + (0 until 4).map(i => s"s${i}_$j").mkString(", ") + ")")
        .mkString(" + ")
      s"""WITH s0 AS (SELECT vec_id, ${slices.mkString(",\n|  ")}
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |s1 AS (SELECT vec_id, c0, c1, c2, c3, r0, r1, r2, r3,
         |  ${invs.mkString(",\n|  ")} FROM s0),
         |sc AS (SELECT vec_id,
         |  $coss FROM s1),
         |p AS (SELECT vec_id, ($pTerms)::BIGINT AS p_sum_q4,
         |  ($rTerms)::BIGINT AS r_sum_q4 FROM sc)
         |SELECT vec_id, p_sum_q4, r_sum_q4,
         |  (CASE WHEN p_sum_q4 > 0 AND r_sum_q4 > 0 THEN
         |    (2 * p_sum_q4 * r_sum_q4) // (4 * (p_sum_q4 + r_sum_q4))
         |   END)::BIGINT AS f1_q4
         |FROM p ORDER BY vec_id""".stripMargin
    },

    // Self-BLEU-2 vs 3 cyclic-successor opponents: the eval_bleu oracle
    // machinery per (doc, opp) pair — max(CASE) pivot + NULL-propagating
    // + for the unsmoothed p1 term — then per-doc skip-NULL aggregation
    // (both engines' sum() skip, intentionally: n_scored reads the drop).
    "eval_self_bleu" ->
      s"""WITH t AS ($SqlGenToks),
         |d AS (SELECT doc_id, ct FROM t),
         |b AS (SELECT min(doc_id) AS lo, count(*) AS n FROM d),
         |f AS (SELECT d.doc_id, ((d.doc_id - b.lo + j.j) % b.n) + b.lo AS opp
         |  FROM d CROSS JOIN b CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
         |  WHERE j.j < b.n),
         |p AS (SELECT f.doc_id, f.opp, a.ct AS cl, o.ct AS rl
         |  FROM f JOIN d a ON f.doc_id = a.doc_id JOIN d o ON f.opp = o.doc_id),
         |g AS (SELECT doc_id, opp, n, ${sqlNgrams("cl", "n")} AS cg,
         |  ${sqlNgrams("rl", "n")} AS rg
         |  FROM p CROSS JOIN (SELECT unnest([1, 2]) AS n)),
         |cc AS (SELECT doc_id, opp, n, g2 AS gram, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, opp, n, unnest(cg) AS g2 FROM g)
         |  GROUP BY 1, 2, 3, 4),
         |rc AS (SELECT doc_id, opp, n, g2 AS gram, count(*)::BIGINT AS r
         |  FROM (SELECT doc_id, opp, n, unnest(rg) AS g2 FROM g)
         |  GROUP BY 1, 2, 3, 4),
         |cl AS (SELECT cc.doc_id, cc.opp, cc.n,
         |  sum(least(cc.c, rc.r))::BIGINT AS clip
         |  FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.opp = rc.opp
         |    AND cc.n = rc.n AND cc.gram = rc.gram GROUP BY 1, 2, 3),
         |pn AS (SELECT g.doc_id, g.opp, g.n, len(g.cg)::BIGINT AS tot,
         |  len(g.rg)::BIGINT AS rtot, coalesce(cl.clip, 0)::BIGINT AS clip
         |  FROM g LEFT JOIN cl ON g.doc_id = cl.doc_id AND g.opp = cl.opp
         |    AND g.n = cl.n),
         |pv AS (SELECT doc_id, opp,
         |  max(CASE WHEN n = 1 THEN clip END)::BIGINT AS clip_1,
         |  max(CASE WHEN n = 1 THEN tot END)::BIGINT AS tot_1,
         |  max(CASE WHEN n = 1 THEN rtot END)::BIGINT AS ref_len,
         |  max(CASE WHEN n = 2 THEN clip END)::BIGINT AS clip_2,
         |  max(CASE WHEN n = 2 THEN tot END)::BIGINT AS tot_2
         |  FROM pn GROUP BY 1, 2),
         |q AS (SELECT doc_id, opp, tot_1 AS cand_len, ref_len,
         |  (CASE WHEN clip_1 > 0 AND tot_1 > 0 THEN
         |    floor(ln(clip_1::DOUBLE / tot_1::DOUBLE) * 1000000.0)::BIGINT END)
         |   + floor(ln((clip_2 + 1)::DOUBLE / (tot_2 + 1)::DOUBLE)
         |       * 1000000.0)::BIGINT AS qsum
         |  FROM pv),
         |lb AS (SELECT doc_id,
         |  CASE WHEN cand_len > 0 THEN
         |    floor((qsum::DOUBLE / 2000000.0 + least(0.0,
         |      1.0 - ref_len::DOUBLE / cand_len::DOUBLE)) * 1000000.0)::BIGINT
         |  END AS lbq FROM q)
         |SELECT doc_id, count(*)::BIGINT AS n_opp,
         |  count(lbq)::BIGINT AS n_scored,
         |  sum(lbq)::BIGINT AS self_bleu_q6_sum,
         |  (CASE WHEN count(lbq) > 0 THEN
         |    floor(sum(lbq)::DOUBLE / count(lbq))::BIGINT
         |   END)::BIGINT AS self_bleu_mean_q6
         |FROM lb GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // pass@k unrolled per k: clamped falling factorials in HUGEINT
    // (Spark's DECIMAL(38,0) twin), truncating ppm quotient, NULL
    // where n < k.
    "eval_pass_at_k" ->
      """WITH b AS (SELECT vec_id % 503 AS task,
        |    CASE WHEN label < 4 THEN 1 ELSE 0 END AS ok FROM embeddings),
        |g AS (SELECT task, count(*)::BIGINT AS n, sum(ok)::BIGINT AS c
        |  FROM b GROUP BY 1)
        |SELECT task, n, c,
        |  (1000000 - ((greatest(n - c, 0)::HUGEINT * 1000000)
        |    // n::HUGEINT))::BIGINT AS pass_1_ppm,
        |  (CASE WHEN n >= 2 THEN 1000000 -
        |    ((greatest(n - c, 0)::HUGEINT * greatest(n - c - 1, 0) * 1000000)
        |     // (n::HUGEINT * (n - 1))) END)::BIGINT AS pass_2_ppm,
        |  (CASE WHEN n >= 5 THEN 1000000 -
        |    ((greatest(n - c, 0)::HUGEINT * greatest(n - c - 1, 0)
        |      * greatest(n - c - 2, 0) * greatest(n - c - 3, 0)
        |      * greatest(n - c - 4, 0) * 1000000)
        |     // (n::HUGEINT * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
        |   END)::BIGINT AS pass_5_ppm
        |FROM g ORDER BY task""".stripMargin,

    // Majority vote via max-count + min-answer tie-break (the
    // struct-max twin), gold = min per task.
    "eval_majority_vote" ->
      s"""WITH b AS (SELECT vec_id % 503 AS task,
         |    (((${sqlScoreQ4(Q1)}) % 7) + 7) % 7 AS ans,
         |    (vec_id % 503) % 7 AS gold FROM embeddings),
         |c AS (SELECT task, ans, count(*)::BIGINT AS cnt, min(gold) AS g
         |  FROM b GROUP BY 1, 2),
         |m AS (SELECT task, max(cnt) AS mx FROM c GROUP BY 1),
         |mj AS (SELECT c.task, min(c.ans) AS maj FROM c
         |  JOIN m ON c.task = m.task AND c.cnt = m.mx GROUP BY 1),
         |t AS (SELECT task, sum(cnt)::BIGINT AS n_samples, min(g) AS gold
         |  FROM c GROUP BY 1)
         |SELECT t.task, t.n_samples, mj.maj::BIGINT AS maj_answer,
         |  m.mx::BIGINT AS maj_count, t.gold::BIGINT AS gold,
         |  (CASE WHEN mj.maj = t.gold THEN 1 ELSE 0 END)::BIGINT AS correct
         |FROM t JOIN m ON t.task = m.task JOIN mj ON t.task = mj.task
         |ORDER BY t.task""".stripMargin,

    // Kappa from the confusion grid's marginals; DuckDB's // already
    // floors, mirroring the Spark side's pmod floor-division identity.
    "eval_kappa" ->
      s"""WITH b AS (SELECT label::BIGINT AS a,
         |    (((${sqlScoreQ4(Q1)}) % 10) + 10) % 10 AS bb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT a, bb, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
         |t AS (SELECT sum(n)::BIGINT AS n,
         |  sum(CASE WHEN a = bb THEN n ELSE 0 END)::BIGINT AS agree FROM g),
         |s AS (SELECT coalesce(sum(ra * cb), 0)::BIGINT AS s_cross FROM
         |  (SELECT a AS k, sum(n)::BIGINT AS ra FROM g GROUP BY 1) x
         |  JOIN (SELECT bb AS k, sum(n)::BIGINT AS cb FROM g GROUP BY 1) y
         |  ON x.k = y.k)
         |SELECT n, agree, s_cross,
         |  (CASE WHEN n > 0 THEN agree * 1000000 // n END)::BIGINT AS po_ppm,
         |  (CASE WHEN n > 0 THEN s_cross * 1000000 // (n * n)
         |   END)::BIGINT AS pe_ppm,
         |  (CASE WHEN n * n - s_cross > 0 THEN
         |    (n * agree * 1000000 - s_cross * 1000000) // (n * n - s_cross)
         |   END)::BIGINT AS kappa_ppm
         |FROM t, s""".stripMargin,

    // Conformal rank k = ceil((n+1)(1-alpha)) in integer arithmetic;
    // threshold is the k-th order statistic off the value grid.
    "eval_conformal" ->
      s"""WITH sc AS (SELECT ${sqlScoreQ4(Q1)} AS s
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |g AS (SELECT s, count(*)::BIGINT AS c FROM sc GROUP BY 1),
         |c AS (SELECT s,
         |    sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW)::BIGINT AS cum,
         |    (SELECT sum(c) FROM g)::BIGINT AS n
         |  FROM g),
         |k AS (SELECT n, (((n + 1) * 900000 + 999999) // 1000000)::BIGINT
         |    AS k_rank
         |  FROM (SELECT DISTINCT n FROM c))
         |SELECT c.n, k.k_rank, min(s)::BIGINT AS threshold,
         |  ((k.k_rank * 1000000) // (c.n + 1))::BIGINT AS coverage_min_ppm
         |FROM c, k WHERE cum >= k_rank GROUP BY 1, 2""".stripMargin,

    // Per-slice confusion counts and ppm rates; empty denominators stay
    // NULL on both engines.
    "eval_fairness" ->
      s"""WITH b AS (SELECT ((label % 3) + 3) % 3 AS grp,
         |    (${sqlScoreQ4(Q1)}) > 0 AS p, label < 5 AS y
         |  FROM embeddings WHERE embedding IS NOT NULL
         |    AND label IS NOT NULL),
         |g AS (SELECT grp, count(*)::BIGINT AS n,
         |    sum((p AND y)::BIGINT)::BIGINT AS tp,
         |    sum((p AND NOT y)::BIGINT)::BIGINT AS fp,
         |    sum((NOT p AND y)::BIGINT)::BIGINT AS fn,
         |    sum((NOT p AND NOT y)::BIGINT)::BIGINT AS tn
         |  FROM b GROUP BY 1)
         |SELECT grp::BIGINT AS grp, n, tp, fp, fn, tn,
         |  (CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
         |   END)::BIGINT AS tpr_ppm,
         |  (CASE WHEN fp + tn > 0 THEN fp * 1000000 // (fp + tn)
         |   END)::BIGINT AS fpr_ppm,
         |  (CASE WHEN n > 0 THEN (tp + fp) * 1000000 // n
         |   END)::BIGINT AS ppr_ppm
         |FROM g ORDER BY grp""".stripMargin,

    // Fleiss over the synthetic 3-rater panel: HUGEINT mirrors the
    // Spark side's DECIMAL(38,0) exact combine; // floors like the
    // pmod identity.
    "eval_fleiss" -> {
      val h = graft.functions.hashing.sqlH32(
        "(vec_id::VARCHAR || '/fl' || rr::VARCHAR)")
      s"""WITH r AS (SELECT vec_id, unnest(range(0, 3)) AS rr
         |  FROM embeddings WHERE vec_id IS NOT NULL),
         |sc AS (SELECT vec_id AS u, ($h) % 4 AS l FROM r),
         |g AS (SELECT u, l, count(*)::BIGINT AS n FROM sc GROUP BY 1, 2),
         |ua AS (SELECT u, sum(n * n)::BIGINT AS sq FROM g GROUP BY 1),
         |a AS (SELECT count(*)::HUGEINT AS nu,
         |  coalesce(sum(sq), 0)::HUGEINT AS ssq FROM ua),
         |b AS (SELECT coalesce(sum(s * s), 0)::HUGEINT AS bb
         |  FROM (SELECT sum(n)::BIGINT AS s FROM g GROUP BY l)),
         |f AS (SELECT nu, ssq - nu * 3 AS aa, (nu * 3) * 2 AS d1,
         |  bb, nu * 3 AS t FROM a, b)
         |SELECT nu::BIGINT AS n_units, 3::BIGINT AS m,
         |  (CASE WHEN d1 > 0 THEN (aa * 1000000) // d1
         |   END)::BIGINT AS po_ppm,
         |  (CASE WHEN t > 0 THEN (bb * 1000000) // (t * t)
         |   END)::BIGINT AS pe_ppm,
         |  (CASE WHEN d1 > 0 AND t * t - bb > 0 THEN
         |    ((aa * t * t - bb * d1) * 1000000) // (d1 * (t * t - bb))
         |   END)::BIGINT AS kappa_ppm
         |FROM f""".stripMargin
    },

    // AP per query: rank + running relevant count in one window pair,
    // per-term ppm quantization ((relcnt * 1e6) // rk on relevant rows
    // only — positive DIV), mean by one positive integer division.
    "eval_map" ->
      s"""WITH r0 AS (
         |  SELECT 0::BIGINT AS qid, vec_id,
         |    (CASE WHEN label = 3 THEN 2 WHEN label = 7 THEN 1 ELSE 0 END)::BIGINT AS rel,
         |    ${sqlScoreQ4(Q1)} AS s FROM embeddings
         |  UNION ALL
         |  SELECT 1::BIGINT, vec_id,
         |    (CASE WHEN label = 5 THEN 2 WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT,
         |    ${sqlScoreQ4(Q2)} FROM embeddings),
         |a AS (SELECT qid, (rel > 0)::BIGINT AS rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id)
         |      AS rk,
         |    sum((rel > 0)::BIGINT) OVER (PARTITION BY qid
         |      ORDER BY s DESC, vec_id ROWS UNBOUNDED PRECEDING) AS relcnt
         |  FROM r0),
         |t AS (SELECT qid, rel,
         |    CASE WHEN rel = 1 THEN (relcnt * 1000000) // rk ELSE NULL END
         |      AS term
         |  FROM a)
         |SELECT qid, count(*)::BIGINT AS n_cand, sum(rel)::BIGINT AS n_rel,
         |  coalesce(sum(term), 0)::BIGINT AS ap_ppm_sum,
         |  (CASE WHEN sum(rel) > 0
         |    THEN coalesce(sum(term), 0) // sum(rel) END)::BIGINT AS ap_ppm
         |FROM t GROUP BY qid ORDER BY qid""".stripMargin,

    // ARI: contingency comb sums as exact BIGINTs, the cleared-fraction
    // form in HUGEINT (Spark DECIMAL(38) twin), floor-division ppm.
    "eval_ari" ->
      s"""WITH r AS (SELECT label AS a,
         |    (label + (CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)) % 10 AS b
         |  FROM embeddings WHERE label IS NOT NULL),
         |g AS (SELECT a, b, count(*)::BIGINT AS n FROM r GROUP BY 1, 2),
         |c AS (SELECT sum(n)::BIGINT AS n,
         |    coalesce(sum((n * (n - 1)) // 2), 0)::BIGINT AS s_ij FROM g),
         |ma AS (SELECT coalesce(sum((m * (m - 1)) // 2), 0)::BIGINT AS s_a
         |  FROM (SELECT sum(n)::BIGINT AS m FROM g GROUP BY a)),
         |mb AS (SELECT coalesce(sum((m * (m - 1)) // 2), 0)::BIGINT AS s_b
         |  FROM (SELECT sum(n)::BIGINT AS m FROM g GROUP BY b)),
         |f AS (SELECT n, s_ij, s_a, s_b,
         |    ((n * (n - 1)) // 2)::HUGEINT AS cc FROM c, ma, mb)
         |SELECT n, s_ij, s_a, s_b,
         |  (CASE WHEN cc * (s_a + s_b) - 2 * s_a::HUGEINT * s_b <> 0 THEN
         |    ((2 * cc * s_ij - 2 * s_a::HUGEINT * s_b) * 1000000)
         |      // (cc * (s_a + s_b) - 2 * s_a::HUGEINT * s_b)
         |   END)::BIGINT AS ari_ppm
         |FROM f""".stripMargin,

    // RBO: the shared driver-literal suffix-sum table, two ranked CTEs,
    // one (qid, doc) join, one exact long sum per query.
    "eval_rbo" -> {
      val w = evals.rboWeights(900000L, 20).zipWithIndex
        .map { case (wt, i) => s"(${i + 1}, ${wt})" }.mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $w) v(m, wt)),
         |r AS (SELECT label % 2 AS qid, vec_id AS doc,
         |    ${sqlScoreQ4(Q1)} AS sa, ${sqlScoreQ4(Q2)} AS sb
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
         |a AS (SELECT qid, doc, row_number() OVER (PARTITION BY qid
         |    ORDER BY sa DESC, doc) AS ra FROM r),
         |b AS (SELECT qid, doc, row_number() OVER (PARTITION BY qid
         |    ORDER BY sb DESC, doc) AS rb FROM r),
         |j AS (SELECT a.qid, greatest(ra, rb) AS m
         |  FROM a JOIN b ON a.qid = b.qid AND a.doc = b.doc
         |  WHERE ra <= 20 AND rb <= 20),
         |p AS (SELECT qid, count(*)::BIGINT AS n_common,
         |    sum(wt)::BIGINT AS rbo_q9
         |  FROM j JOIN w USING (m) GROUP BY qid),
         |q AS (SELECT DISTINCT qid FROM r)
         |SELECT q.qid, coalesce(n_common, 0)::BIGINT AS n_common,
         |  coalesce(rbo_q9, 0)::BIGINT AS rbo_q9
         |FROM q LEFT JOIN p USING (qid) ORDER BY qid""".stripMargin
    },

    // V-measure: the mutualInfo CTE chain on the perturbed-labeling
    // fixture, finishing with ratio-of-rounded-doubles re-quantization
    // (identical operand doubles -> identical results cross-engine).
    "eval_vmeasure" ->
      """WITH b AS (SELECT label AS a,
        |    (label + (CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)) % 10 AS bb
        |  FROM embeddings WHERE label IS NOT NULL),
        |g AS (SELECT a, bb, count(*)::BIGINT AS nij FROM b GROUP BY 1, 2),
        |na AS (SELECT a, sum(nij)::BIGINT AS na FROM g GROUP BY 1),
        |nb AS (SELECT bb, sum(nij)::BIGINT AS nb FROM g GROUP BY 1),
        |t AS (SELECT sum(nij)::BIGINT AS n FROM g),
        |mi AS (SELECT sum(floor((g.nij::DOUBLE / t.n)
        |    * ln((g.nij::DOUBLE * t.n) / (na.na::DOUBLE * nb.nb))
        |    * 1e12))::BIGINT AS smi
        |  FROM g JOIN na ON g.a = na.a JOIN nb ON g.bb = nb.bb CROSS JOIN t),
        |ha AS (SELECT sum(floor((na::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / na) * 1e12))::BIGINT AS sha
        |  FROM na CROSS JOIN t),
        |hb AS (SELECT sum(floor((nb::DOUBLE / t.n)
        |    * ln(t.n::DOUBLE / nb) * 1e12))::BIGINT AS shb
        |  FROM nb CROSS JOIN t),
        |r AS (SELECT n,
        |    floor(sha::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_a,
        |    floor(shb::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS h_b,
        |    floor(smi::DOUBLE / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS mi
        |  FROM t, mi, ha, hb)
        |SELECT n,
        |  CASE WHEN h_a > 0 THEN
        |    floor(mi / h_a * 1000000.0 + 0.5) / 1000000.0 END AS homogeneity,
        |  CASE WHEN h_b > 0 THEN
        |    floor(mi / h_b * 1000000.0 + 0.5) / 1000000.0 END AS completeness,
        |  CASE WHEN h_a + h_b > 0 THEN
        |    floor(2.0 * mi / (h_a + h_b) * 1000000.0 + 0.5) / 1000000.0
        |  END AS v_measure
        |FROM r""".stripMargin,

    // Krippendorff alpha (nominal, variable raters): per-unit Do terms
    // quantized by one positive `//` each, marginals over kept units,
    // alpha as the final 4-dp float chain.
    "eval_krippendorff" -> {
      val h = graft.functions.hashing.sqlH32(
        "(vec_id::VARCHAR || '/kr' || rr::VARCHAR)")
      s"""WITH r AS (SELECT vec_id, unnest(range(0, (vec_id % 3) + 1)) AS rr
         |  FROM embeddings WHERE vec_id IS NOT NULL),
         |sc AS (SELECT vec_id AS u, ($h) % 4 AS l FROM r),
         |g AS (SELECT u, l, count(*)::BIGINT AS n FROM sc GROUP BY 1, 2),
         |un AS (SELECT u, sum(n)::BIGINT AS mu, sum(n * n)::BIGINT AS sq
         |  FROM g GROUP BY 1 HAVING sum(n) >= 2),
         |ds AS (SELECT count(*)::BIGINT AS n_units,
         |    coalesce(sum(mu), 0)::BIGINT AS n_total,
         |    coalesce(sum(((mu * mu - sq) * 1000000) // (mu - 1)), 0)::BIGINT
         |      AS do_q6
         |  FROM un),
         |de AS (SELECT coalesce(sum(nc * nc), 0)::BIGINT AS sumc2
         |  FROM (SELECT sum(g.n)::BIGINT AS nc FROM g JOIN un USING (u)
         |    GROUP BY g.l)),
         |f AS (SELECT n_units, n_total, do_q6,
         |    n_total * n_total - sumc2 AS de_num FROM ds, de)
         |SELECT n_units, n_total, do_q6, de_num,
         |  (CASE WHEN de_num > 0 AND n_total > 1 THEN
         |    floor((1.0 - do_q6::DOUBLE * (n_total - 1)::DOUBLE
         |      / 1000000.0 / de_num::DOUBLE) * 10000.0 + 0.5) / 10000.0
         |   END)::DOUBLE AS alpha_q4
         |FROM f""".stripMargin
    },

    // Bradley-Terry MM unrolled 3 rounds: per-pair quantized quotient
    // sums + the hits-style integer rescale, HUGEINT mirroring Spark's
    // DECIMAL(38,0) products.
    "eval_bt_ratings" -> {
      def iter(k: Int): String = {
        val (p, n) = (s"r$k", s"r${k + 1}")
        s"""d$n AS (SELECT p.i,
           |  sum((p.nij::HUGEINT * 1000000000000) // (ri.r + rj.r)) AS d
           |  FROM p JOIN $p ri ON p.i = ri.i JOIN $p rj ON p.j = rj.i
           |  GROUP BY 1),
           |w$n AS (SELECT t.i, t.games, t.wins,
           |  CASE WHEN d.d > 0 THEN (t.wins::HUGEINT * 1000000000000) // d.d
           |    ELSE 0 END AS raw
           |  FROM $p t JOIN d$n d ON t.i = d.i),
           |m$n AS (SELECT max(raw) AS mx FROM w$n),
           |$n AS (SELECT i, games, wins,
           |  greatest(raw // (1 + (greatest(mx, 1) - 1) // 1000000), 1) AS r
           |  FROM w$n, m$n)""".stripMargin
      }
      s"""WITH mt AS (SELECT vec_id % 8 AS a, (vec_id // 8) % 8 AS b,
         |    (${sqlScoreQ4(Q1)}) - (${sqlScoreQ4(Q2)})
         |      + ((vec_id % 8) - ((vec_id // 8) % 8)) * 500 AS mg
         |  FROM embeddings),
         |f AS (SELECT a, b, mg > 0 AS w FROM mt WHERE a <> b AND mg <> 0),
         |p AS (SELECT i, j, count(*)::BIGINT AS nij,
         |    sum(CASE WHEN w THEN 1 ELSE 0 END)::BIGINT AS wij
         |  FROM (SELECT a AS i, b AS j, w FROM f
         |    UNION ALL SELECT b AS i, a AS j, NOT w FROM f)
         |  GROUP BY 1, 2),
         |r0 AS (SELECT i, sum(nij)::BIGINT AS games,
         |    sum(wij)::BIGINT AS wins, 1000000::BIGINT AS r
         |  FROM p GROUP BY 1),
         |${iter(0)},
         |${iter(1)},
         |${iter(2)}
         |SELECT i AS model, games, wins, r::BIGINT AS rating
         |FROM r3 ORDER BY model""".stripMargin
    },

    // Session tagging replayed (lag + gap + cumsum), ladder per
    // (user, session), sessions counted per step.
    "events_session_funnel" ->
      """WITH t AS (SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
        |  FROM events),
        |n AS (SELECT *, CASE WHEN pv IS NULL
        |      OR epoch_us(ts) - epoch_us(pv) > 1800000000 THEN 1 ELSE 0 END
        |    AS nw FROM t),
        |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM n),
        |u AS (SELECT user_id, s,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM sid GROUP BY 1, 2),
        |e1 AS (SELECT d.user_id, d.s, min(d.ts) AS t1 FROM sid d
        |  JOIN u ON d.user_id = u.user_id AND d.s = u.s
        |  WHERE d.event_type = 'click' AND d.ts >= u.t0 GROUP BY 1, 2),
        |e2 AS (SELECT d.user_id, d.s, min(d.ts) AS t2 FROM sid d
        |  JOIN e1 ON d.user_id = e1.user_id AND d.s = e1.s
        |  WHERE d.event_type = 'purchase' AND d.ts >= e1.t1 GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_sessions
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin,

    // Majority next-event per state over the same lag pairs; exact bp.
    "events_markov_acc" ->
      """WITH p AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev AS prev_type, event_type AS cur,
        |    count(*)::BIGINT AS n FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT prev_type, cur, n, row_number() OVER (
        |    PARTITION BY prev_type ORDER BY n DESC, cur) AS rk FROM c),
        |pr AS (SELECT prev_type, cur AS predicted, n AS n_correct
        |  FROM r WHERE rk = 1),
        |tot AS (SELECT prev_type, sum(n)::BIGINT AS n_total FROM c GROUP BY 1)
        |SELECT t.prev_type, pr.predicted, t.n_total, pr.n_correct,
        |  (pr.n_correct * 10000 // t.n_total)::BIGINT AS acc_bp
        |FROM tot t JOIN pr USING (prev_type)
        |ORDER BY prev_type""".stripMargin,

    // Grouped-value Gini identity: cumulative counts over the distinct
    // value grid, one float chain over three exact integers.
    "events_gini" ->
      """WITH per AS (SELECT user_id,
        |    sum(floor(value * 100)::BIGINT)::BIGINT AS c
        |  FROM events GROUP BY 1),
        |grid AS (SELECT c AS v, count(*)::BIGINT AS nv FROM per
        |  WHERE c IS NOT NULL AND c >= 0 GROUP BY 1),
        |cum AS (SELECT v, nv, coalesce(sum(nv) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS b
        |  FROM grid),
        |a AS (SELECT sum(nv)::BIGINT AS n, sum(v * nv)::BIGINT AS total,
        |    sum(v * (nv * b + (nv * (nv + 1)) // 2))::BIGINT AS r FROM cum)
        |SELECT n, total,
        |  CASE WHEN n > 0 AND total > 0 THEN
        |    floor((2.0 * r::DOUBLE - (n + 1)::DOUBLE * total::DOUBLE)
        |      / (n::DOUBLE * total::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |  END AS gini_q4
        |FROM a""".stripMargin,

    // Benford expectations injected as the SAME Scala-computed double
    // literals; chi-square terms micro-quantized before the sum.
    "rel_benford" -> {
      val pCase = (1 to 9).map(d =>
        s"WHEN ${d} THEN ${math.log10(1.0 + 1.0 / d)}")
        .mkString("CASE sp.digit ", " ", " END")
      s"""WITH c AS (SELECT floor(o_totalprice * 100)::BIGINT AS v FROM orders),
         |obs AS (SELECT substr(v::VARCHAR, 1, 1)::INT AS digit,
         |    count(*)::BIGINT AS n_obs FROM c WHERE v > 0 GROUP BY 1),
         |sp AS (SELECT unnest(range(1, 10))::INT AS digit),
         |dn AS (SELECT sp.digit, coalesce(obs.n_obs, 0)::BIGINT AS n_obs,
         |    ($pCase) AS p
         |  FROM sp LEFT JOIN obs USING (digit)),
         |t AS (SELECT digit, n_obs, p,
         |    (SELECT sum(n_obs) FROM dn)::BIGINT AS n FROM dn),
         |q AS (SELECT digit, n_obs, p,
         |    floor((n_obs::DOUBLE - n::DOUBLE * p)
         |      * (n_obs::DOUBLE - n::DOUBLE * p)
         |      / (n::DOUBLE * p) * 1000000.0)::BIGINT AS tq
         |  FROM t)
         |SELECT digit, n_obs, floor(p * 1000000.0)::BIGINT AS expected_ppm,
         |  (floor((SELECT sum(tq) FROM q)::DOUBLE / 1000000.0 * 10000.0 + 0.5)
         |    / 10000.0)::DOUBLE AS chi2_q4
         |FROM q ORDER BY digit""".stripMargin
    },

    // Same greedy ladder as events_funnel plus the per-step deadline.
    "events_funnel_windowed" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |  FROM events GROUP BY user_id),
        |e1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
        |  JOIN u ON e.user_id = u.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= u.t0
        |    AND epoch_us(e.ts) - epoch_us(u.t0) <= 3600000000
        |  GROUP BY e.user_id),
        |e2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN e1 ON e.user_id = e1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= e1.t1
        |    AND epoch_us(e.ts) - epoch_us(e1.t1) <= 3600000000
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM u WHERE t0 IS NOT NULL) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM e1)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM e2))
        |ORDER BY step""".stripMargin,

    // Hour-of-week cells over the densified hourly series; z is the one
    // float chain over exact integer cell stats.
    "events_seasonal_anomaly" ->
      """WITH counts AS (SELECT event_type AS series,
        |    (epoch_us(ts) // 1000000) // 3600 AS t, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT series, unnest(generate_series(min(t), max(t))) AS t
        |  FROM counts GROUP BY series),
        |d AS (SELECT sp.series, sp.t, coalesce(counts.c, 0)::BIGINT AS c,
        |    sp.t % 168 AS cell
        |  FROM sp LEFT JOIN counts USING (series, t)),
        |st AS (SELECT series, cell, count(*)::BIGINT AS n,
        |    sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
        |  FROM d GROUP BY 1, 2),
        |z AS (SELECT d.series, d.t, d.c, d.cell,
        |    CASE WHEN (st.s2::DOUBLE / st.n::DOUBLE
        |        - (st.s1::DOUBLE / st.n::DOUBLE) * (st.s1::DOUBLE / st.n::DOUBLE))
        |        > 0.0 THEN
        |      floor((d.c::DOUBLE - st.s1::DOUBLE / st.n::DOUBLE)
        |        / sqrt(st.s2::DOUBLE / st.n::DOUBLE
        |          - (st.s1::DOUBLE / st.n::DOUBLE) * (st.s1::DOUBLE / st.n::DOUBLE))
        |        * 10000.0 + 0.5) / 10000.0
        |    END AS z_q4
        |  FROM d JOIN st USING (series, cell))
        |SELECT series, t, c, cell, z_q4 FROM z
        |WHERE abs(z_q4) >= 1.5 ORDER BY series, t""".stripMargin,

    "vec_kmeans" -> sqlKmeans(dim = 64, k = 4, iters = 2, q = 10000L),

    // Exact |cumA*Nb - cumB*Na| transport over the merged bin grid,
    // one float quotient in raw-feature units.
    "sample_emd" ->
      """WITH ha AS (SELECT floor(n_chars::DOUBLE / 100.0)::BIGINT AS bin,
        |    count(*)::BIGINT AS na FROM documents
        |  WHERE lang = 'de' AND n_chars IS NOT NULL GROUP BY 1),
        |hb AS (SELECT floor(n_chars::DOUBLE / 100.0)::BIGINT AS bin,
        |    count(*)::BIGINT AS nb FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL GROUP BY 1),
        |m AS (SELECT coalesce(ha.bin, hb.bin) AS bin,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin),
        |c AS (SELECT bin, na, nb,
        |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb,
        |    lead(bin) OVER (ORDER BY bin) - bin AS gap
        |  FROM m),
        |t AS (SELECT ta AS n_a, tb AS n_b,
        |    sum(abs(ca * tb - cb * ta) * gap)::BIGINT AS emd_num
        |  FROM c WHERE gap IS NOT NULL GROUP BY 1, 2)
        |SELECT n_a, n_b, emd_num,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    floor(emd_num::DOUBLE * 100.0 / (n_a::DOUBLE * n_b::DOUBLE)
        |      * 10000.0 + 0.5) / 10000.0
        |  END AS emd_q4
        |FROM t""".stripMargin,

    // Exact KS from the same full-outer value grid: cross-multiplied
    // integer CDF gaps, one division at the quantized readout.
    "sample_ks" ->
      """WITH ha AS (SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS na
        |  FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |hb AS (SELECT n_chars::BIGINT AS v, count(*)::BIGINT AS nb
        |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT coalesce(ha.v, hb.v) AS v,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v,
        |    sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb
        |  FROM m)
        |SELECT ta AS n_a, tb AS n_b,
        |  max(abs(ca * tb - cb * ta))::BIGINT AS ks_num,
        |  CASE WHEN ta > 0 AND tb > 0 THEN
        |    floor(max(abs(ca * tb - cb * ta))::DOUBLE
        |      / (ta::DOUBLE * tb::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ks_q6
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Same KS chain on the event stream's cents grid, split at the
    // mid-month cut.
    "events_ks_drift" ->
      """WITH ha AS (SELECT floor(value * 100.0)::BIGINT AS v,
        |    count(*)::BIGINT AS na FROM events
        |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'
        |  GROUP BY 1),
        |hb AS (SELECT floor(value * 100.0)::BIGINT AS v,
        |    count(*)::BIGINT AS nb FROM events
        |  WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16'
        |  GROUP BY 1),
        |m AS (SELECT coalesce(ha.v, hb.v) AS v,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v,
        |    sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb
        |  FROM m)
        |SELECT ta AS n_a, tb AS n_b,
        |  max(abs(ca * tb - cb * ta))::BIGINT AS ks_num,
        |  CASE WHEN ta > 0 AND tb > 0 THEN
        |    floor(max(abs(ca * tb - cb * ta))::DOUBLE
        |      / (ta::DOUBLE * tb::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ks_q6
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Per-day PSI vs the pinned day-1 reference: union bin domain per
    // day (days x ref-bins full-outer the per-day grid), add-one
    // smoothing over that domain, 1e-12 fixed-point terms.
    "events_psi_drift" ->
      """WITH ref AS (SELECT
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 1000.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nr
        |  FROM events WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-02' GROUP BY 1),
        |cur AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 1000.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nc
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |dom AS (SELECT day, bin, nr
        |  FROM (SELECT DISTINCT day FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(dom.day, cur.day) AS day,
        |    coalesce(dom.bin, cur.bin) AS bin,
        |    coalesce(nr, 0)::BIGINT AS nr, coalesce(nc, 0)::BIGINT AS nc
        |  FROM dom FULL OUTER JOIN cur
        |    ON dom.day = cur.day AND dom.bin = cur.bin),
        |t AS (SELECT day, sum(nr)::BIGINT AS tr, sum(nc)::BIGINT AS tc,
        |    count(*)::BIGINT AS vb FROM j GROUP BY 1),
        |terms AS (SELECT j.day, tc, vb,
        |    floor(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE)
        |        - (nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE))
        |      * ln(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE))
        |        / ((nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE)))
        |      * 1000000000000.0)::BIGINT AS term
        |  FROM j JOIN t USING (day))
        |SELECT day, max(tc)::BIGINT AS n_cur, max(vb)::BIGINT AS bins,
        |  floor(sum(term)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS psi_q6
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    // Per-day KS from the same union-domain grid chain, $1 bins.
    "events_ks_daily" ->
      """WITH ref AS (SELECT
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 100.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nr
        |  FROM events WHERE value IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-02' GROUP BY 1),
        |cur AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 100.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nc
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |dom AS (SELECT day, bin, nr
        |  FROM (SELECT DISTINCT day FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(dom.day, cur.day) AS day,
        |    coalesce(dom.bin, cur.bin) AS bin,
        |    coalesce(nr, 0)::BIGINT AS nr, coalesce(nc, 0)::BIGINT AS nc
        |  FROM dom FULL OUTER JOIN cur
        |    ON dom.day = cur.day AND dom.bin = cur.bin),
        |c AS (SELECT day,
        |    sum(nr) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS ca,
        |    sum(nc) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cc,
        |    sum(nr) OVER (PARTITION BY day)::BIGINT AS tr,
        |    sum(nc) OVER (PARTITION BY day)::BIGINT AS tc
        |  FROM j)
        |SELECT day, tr AS n_ref, tc AS n_cur,
        |  max(abs(ca * tc - cc * tr))::BIGINT AS ks_num,
        |  CASE WHEN tr > 0 AND tc > 0 THEN
        |    floor(max(abs(ca * tc - cc * tr))::DOUBLE
        |      / (tr::DOUBLE * tc::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ks_q6
        |FROM c GROUP BY 1, 2, 3 ORDER BY day""".stripMargin,

    // Drift card: one grid, day-1 reference from the SAME grid, one
    // union domain feeding the PSI terms, the KS/EMD cumulative pass,
    // and the three-way join.
    "pipeline_drift_card" ->
      """WITH cur AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    floor(floor(value * 100.0)::BIGINT::DOUBLE / 100.0)::BIGINT
        |      AS bin, count(*)::BIGINT AS nc
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |ref AS (SELECT bin, nc AS nr FROM cur WHERE day = '2024-01-01'),
        |dom AS (SELECT day, bin, nr
        |  FROM (SELECT DISTINCT day FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(dom.day, cur.day) AS day,
        |    coalesce(dom.bin, cur.bin) AS bin,
        |    coalesce(nr, 0)::BIGINT AS nr, coalesce(nc, 0)::BIGINT AS nc
        |  FROM dom FULL OUTER JOIN cur
        |    ON dom.day = cur.day AND dom.bin = cur.bin),
        |t AS (SELECT day, sum(nr)::BIGINT AS tr, sum(nc)::BIGINT AS tc,
        |    count(*)::BIGINT AS vb FROM j GROUP BY 1),
        |psi AS (SELECT day, max(tc)::BIGINT AS n_cur, max(vb)::BIGINT AS bins,
        |    floor(sum(term)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |      / 1000000.0 AS psi_q6
        |  FROM (SELECT j.day, tc, vb,
        |      floor(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE)
        |          - (nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE))
        |        * ln(((nc::DOUBLE + 1.0) / (tc::DOUBLE + vb::DOUBLE))
        |          / ((nr::DOUBLE + 1.0) / (tr::DOUBLE + vb::DOUBLE)))
        |        * 1000000000000.0)::BIGINT AS term
        |    FROM j JOIN t USING (day)) GROUP BY 1),
        |c AS (SELECT day, bin,
        |    sum(nr) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ca,
        |    sum(nc) OVER (PARTITION BY day ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cc,
        |    sum(nr) OVER (PARTITION BY day)::BIGINT AS tr,
        |    sum(nc) OVER (PARTITION BY day)::BIGINT AS tc,
        |    lead(bin) OVER (PARTITION BY day ORDER BY bin) - bin AS gap
        |  FROM j),
        |ks AS (SELECT day, tr AS n_ref,
        |    CASE WHEN tr > 0 AND tc > 0 THEN
        |      floor(max(abs(ca * tc - cc * tr))::DOUBLE
        |        / (tr::DOUBLE * tc::DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    END AS ks_q6
        |  FROM c GROUP BY day, tr, tc),
        |emd AS (SELECT day,
        |    CASE WHEN tr > 0 AND tc > 0 THEN
        |      floor(sum(abs(ca * tc - cc * tr) * gap)::DOUBLE * 100.0
        |        / (tr::DOUBLE * tc::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    END AS emd_q4
        |  FROM c WHERE gap IS NOT NULL GROUP BY day, tr, tc)
        |SELECT psi.day, n_ref, n_cur, bins, psi_q6, ks_q6, emd_q4
        |FROM psi JOIN ks USING (day) JOIN emd USING (day)
        |ORDER BY psi.day""".stripMargin,

    // Diagonal-FID drift: per-dim exact integer moments of each label
    // half, fixed-order double readout, 1e-12 fixed-point terms.
    "ann_embed_drift" ->
      """WITH qa AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> floor(v * 10000.0)::BIGINT) AS qx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(embedding) = 64 AND label % 2 = 0),
        |qb AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> floor(v * 10000.0)::BIGINT) AS qx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(embedding) = 64 AND label % 2 = 1),
        |d AS (SELECT unnest(range(0, 64))::INT AS i),
        |ga AS (SELECT d.i AS pos, count(*)::BIGINT AS n_a,
        |    sum(qx[d.i + 1])::BIGINT AS s_a,
        |    sum(qx[d.i + 1] * qx[d.i + 1])::BIGINT AS s2_a
        |  FROM qa CROSS JOIN d GROUP BY 1),
        |gb AS (SELECT d.i AS pos, count(*)::BIGINT AS n_b,
        |    sum(qx[d.i + 1])::BIGINT AS s_b,
        |    sum(qx[d.i + 1] * qx[d.i + 1])::BIGINT AS s2_b
        |  FROM qb CROSS JOIN d GROUP BY 1),
        |e AS (SELECT n_a, n_b,
        |    s_a::DOUBLE / (n_a::DOUBLE * 10000.0) AS mua,
        |    s_b::DOUBLE / (n_b::DOUBLE * 10000.0) AS mub,
        |    s2_a::DOUBLE / (n_a::DOUBLE * 10000.0 * 10000.0) AS ra,
        |    s2_b::DOUBLE / (n_b::DOUBLE * 10000.0 * 10000.0) AS rb
        |  FROM ga JOIN gb ON ga.pos = gb.pos),
        |t AS (SELECT n_a, n_b,
        |    floor((mua - mub) * (mua - mub)
        |      * 1000000000000.0)::BIGINT AS tm,
        |    floor(abs((ra - mua * mua) - (rb - mub * mub))
        |      * 1000000000000.0)::BIGINT AS tv
        |  FROM e)
        |SELECT n_a, n_b, count(*)::BIGINT AS dim,
        |  floor(sum(tm)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS mmd2_q6,
        |  floor(sum(tv)::DOUBLE / 1000000000000.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS vargap_q6
        |FROM t GROUP BY 1, 2""".stripMargin,

    // Rejection rates from the same exact-count double chain (fixed op
    // order), floor-ppm; keep decision replays the portable hash.
    "sample_match_dist" -> {
      val h = graft.functions.hashing.sqlH32("(s.doc_id::VARCHAR || '/mdist')")
      s"""WITH src AS (SELECT doc_id,
         |    floor(n_chars::DOUBLE / 200.0)::BIGINT AS bin
         |  FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL),
         |tgt AS (SELECT floor(n_chars::DOUBLE / 200.0)::BIGINT AS bin
         |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL),
         |sh AS (SELECT bin, count(*)::BIGINT AS ns FROM src GROUP BY 1),
         |th AS (SELECT bin, count(*)::BIGINT AS nt FROM tgt GROUP BY 1),
         |r0 AS (SELECT sh.bin, sh.ns, coalesce(th.nt, 0)::BIGINT AS nt
         |  FROM sh LEFT JOIN th USING (bin)),
         |r1 AS (SELECT bin, ns, nt,
         |    (nt::DOUBLE / (SELECT sum(nt) FROM r0)::DOUBLE)
         |      / (ns::DOUBLE / (SELECT sum(ns) FROM r0)::DOUBLE) AS ratio
         |  FROM r0),
         |r2 AS (SELECT bin, ns,
         |    (CASE WHEN (SELECT max(ratio) FROM r1) > 0 THEN
         |      floor(ratio / (SELECT max(ratio) FROM r1) * 1000000.0)
         |    ELSE 0 END)::BIGINT AS keep_ppm
         |  FROM r1),
         |k AS (SELECT r2.bin, r2.keep_ppm,
         |    count(*)::BIGINT AS n_src,
         |    sum(($h % 1000000 < r2.keep_ppm)::BIGINT)::BIGINT AS n_kept
         |  FROM src s JOIN r2 ON s.bin = r2.bin
         |  GROUP BY 1, 2)
         |SELECT bin, keep_ppm, n_src, n_kept FROM k ORDER BY bin""".stripMargin
    },

    "rel_tpch_q14" ->
      """WITH r AS (SELECT
        |    floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100 + 0.5)::BIGINT) AS rev,
        |    p.p_type
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT
        |  sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT AS promo_qc,
        |  sum(rev)::BIGINT AS total_qc,
        |  (sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)::BIGINT * 1000000
        |    // sum(rev)::BIGINT)::BIGINT AS promo_ppm
        |FROM r""".stripMargin,

    // Same quantizations as the Spark side; averages are floor
    // quotients of non-negative integers (= Spark's truncating DIV).
    "rel_tpch_q1" ->
      """WITH b AS (SELECT l_returnflag, l_linestatus,
        |    l_quantity::BIGINT AS q,
        |    floor(l_extendedprice * 100)::BIGINT AS c,
        |    floor(l_discount * 100 + 0.5)::BIGINT AS dh,
        |    floor(l_tax * 100 + 0.5)::BIGINT AS th
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06')
        |SELECT l_returnflag, l_linestatus,
        |  sum(q)::BIGINT AS sum_qty,
        |  sum(c)::BIGINT AS sum_base_qc,
        |  sum(c * (100 - dh))::BIGINT AS sum_disc_qc,
        |  (sum(c * (100 - dh) * (100 + th)) // 10000)::BIGINT AS sum_charge_c,
        |  (sum(q) * 100 // count(*))::BIGINT AS avg_qty_x100,
        |  (sum(c) // count(*))::BIGINT AS avg_price_c,
        |  count(*)::BIGINT AS n_rows
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "rel_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    sum(l_quantity::BIGINT)::BIGINT AS order_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity::BIGINT) > 300)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  floor(o.o_totalprice * 100)::BIGINT AS total_c,
        |  b.order_qty
        |FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_c DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin
  )
}
