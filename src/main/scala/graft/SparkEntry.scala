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

  private[graft] def embStore(s: SparkSession, dir: String): VecStore =
    VecStore(table(s, dir, "embeddings"), idCol = "vec_id", vecCol = "embedding")

  /** Memoized on-disk index build per sf-dir (one-time cost, like the
    * reference's `build()`; queries then reuse the precomputed inv_norm +
    * label-sorted layout). */
  private[graft] val builtIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def embIndex(s: SparkSession, dir: String): VecStore = {
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
  private[graft] val builtLshIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def embLshIndex(s: SparkSession, dir: String): VecStore = {
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
  private[graft] val builtIvfIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def embIvfIndex(s: SparkSession, dir: String): VecStore = {
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
  private[graft] val builtBucketed = new scala.collection.concurrent.TrieMap[String, (String, String)]()
  private[graft] def bucketedTables(s: SparkSession, dir: String): (String, String) = {
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
  private[graft] val builtTextIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def textIndex(s: SparkSession, dir: String): String =
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
  private[graft] val builtKnnEdges = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def knnEdges(s: SparkSession, dir: String): String =
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
  private[graft] val builtZorderLayout = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def zorderLayout(s: SparkSession, dir: String): String =
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
  private[graft] val builtSigIndexes = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def sigIndex(s: SparkSession, dir: String): String =
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
  private[graft] val builtGramSets = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def gramSet(s: SparkSession, dir: String): String =
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
  private[graft] val builtTokenizers = new scala.collection.concurrent.TrieMap[String, String]()
  private[graft] def unigramArtifact(s: SparkSession, dir: String): String =
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
  private[graft] def sqlKmeans(dim: Int, k: Int, iters: Int, q: Long): String = {
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
  private[graft] def sqlLinearProbe(dims: Int, iters: Int, q: Long, lrInv: Long): String = {
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

  private[graft] def sqlVec(q: Seq[Double]): String =
    q.mkString("[", ", ", "]::DOUBLE[]")

  private[graft] val E = "CAST(embedding AS DOUBLE[])"

  /** Cosine score vs a literal query, matching graft.functions.vectors
    * semantics: dot * invnorm(store) * invnorm(query), zero vector → 0. The
    * query inverse norm is injected as the SAME Scala-computed double
    * literal the Spark plan uses. */
  private[graft] def sqlCosineOn(e: String, q: Seq[Double]): String = {
    val n = s"list_dot_product($e, $e)"
    s"(list_dot_product($e, ${sqlVec(q)})" +
      s" * (CASE WHEN $n > 0 THEN 1.0/sqrt($n) ELSE 0.0 END)" +
      s" * ${vectors.invNormOf(q)})"
  }

  private[graft] def sqlCosine(q: Seq[Double]): String = sqlCosineOn(E, q)

  /** DuckDB squared-L2 between two list expressions (same fold as
    * [[vectors.l2Squared]]). */
  private[graft] def sqlL2Between(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"

  private[graft] def sqlDot(q: Seq[Double]): String =
    s"list_dot_product($E, ${sqlVec(q)})"

  /** Squared L2 as sum((x-y)^2) — same fold as the Spark expression; NOT
    * the norm expansion (cancellation on near-dups). */
  private[graft] def sqlL2sq(q: Seq[Double]): String =
    s"list_sum(list_transform(list_zip($E, ${sqlVec(q)}), x -> (x[1]-x[2])*(x[1]-x[2])))"

  private[graft] def r4(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Shared oracle for the live and index-backed novelty gates — the
    * persisted gram set is value-identical to a live reference build. */
  private[graft] lazy val SqlCrossNovelty: String =
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
  private[graft] def scoreQ4(v: org.apache.spark.sql.Column, q: Seq[Double]) =
    floor(vectors.cosineSimilarity(v, lit(q.toArray)) * 10000.0 + 0.5)
      .cast("long")

  /** DuckDB twin of [[scoreQ4]]. */
  private[graft] def sqlScoreQ4(q: Seq[Double]): String =
    s"floor(${sqlCosineOn(E, q)} * 10000.0 + 0.5)::BIGINT"

  /** Literal threshold grid for `eval_confusion` (score units of 1e-4). */
  private[graft] val EvalThresholds = Seq(-5000L, -2500L, 0L, 2500L, 5000L, 7500L)

  /** MaxSim score over the 4×16 sliced layout for a given token set —
    * shared by the single, long-form, and batched oracle SQL. */
  private[graft] def sqlMaxSimScore(qtoks: Seq[Seq[Double]]): String =
    qtoks.map { q =>
      "greatest(" + (0 until 4).map(i =>
        s"list_dot_product(list_slice($E, ${i * 16 + 1}, ${i * 16 + 16}), ${sqlVec(q)})")
        .mkString(", ") + ")"
    }.mkString("(", " + ", ")")

  /** Shared oracle for both single-query MaxSim paths (unrolled fast
    * path and long-form token table) — the two are result-identical by
    * design. */
  private[graft] lazy val SqlMaxSimTopK: String =
    s"""WITH s AS (SELECT vec_id, ${r4(sqlMaxSimScore(QTok))} AS maxsim FROM embeddings)
       |SELECT vec_id, maxsim FROM s ORDER BY maxsim DESC, vec_id LIMIT 10""".stripMargin

  /** Bloom size for the decontamination SCREEN queries: 16384 words
    * (~1M bits) keeps the gram false-positive rate ≤ ~3e-4 at sf0.1's
    * ~25k bench grams, so flagged docs are (essentially) the truly
    * contaminated ones — the 64-word `decontam_bloom_sketch` artifact
    * stays small deliberately, as the mergeable-state display shape. */
  private[graft] val ScreenBloomBits = 16384 * 63

  /** DuckDB token-array fragment matching [[text.tokens]]. */
  private[graft] val SqlToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

  /** Blocklist fixture for the C4-style wordlist gate queries — one
    * single token, one bigram, one trigram phrase, all present in the
    * synthetic corpus so every match length is exercised. */
  private[graft] val BlockTerms = Seq("slow", "big query", "merge batch part")

  /** Deterministic fixed-point weight vector (1e-6 units, ±1.0 range)
    * for the hashed linear classifier query — stands in for a trained
    * model's weights; both the Spark plan and the DuckDB oracle embed
    * the SAME integer literals ([[graft.ops.text.linearWeightsFixed]]
    * round-trips `LinW` back to exactly [[LinWq]]). */
  private[graft] val LinWq: Seq[Long] =
    (0 until 64).map(j => (j * 2654435761L) % 2000001L - 1000000L)
  private[graft] val LinW: Seq[Double] = LinWq.map(_ / 1.0e6)

  private[graft] def sqlStopHits(listExpr: String, words: Seq[String]): String =
    s"len(list_filter($listExpr, t -> t IN (${words.map("'" + _ + "'").mkString(", ")})))"

  /** Generation-eval pair fixture: reference = the document's normalized
    * token string, candidate = the same with every 3rd token dropped ("the
    * model lost a third of the words") — deterministic, engine-shared, and
    * related-but-not-identical so the overlap meters read out mid-range
    * values. Spark's HOF index is 0-based, DuckDB's 1-based: dropping
    * 0-based `i % 3 == 2` equals dropping 1-based `i % 3 == 0`. */
  private[graft] def genPairs(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] val SqlGenToks =
    s"""SELECT doc_id, list_filter(toks, (t, i) -> i % 3 != 0) AS ct,
       |  toks AS rt
       |FROM (SELECT doc_id, $SqlToks AS toks
       |  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))"""
      .stripMargin

  /** DuckDB word n-gram list over a token-list expression `l` — space-
    * joined, in order, with multiplicity ([[graft.ops.text.ngramList]]).
    * `n` may be a column reference. */
  private[graft] def sqlNgrams(l: String, n: String): String =
    s"CASE WHEN len($l) >= $n THEN list_transform(range(1, len($l)-($n-1)+1), " +
      s"i -> array_to_string(list_slice($l, i, i+$n-1), ' ')) " +
      s"ELSE []::VARCHAR[] END"

  /** DuckDB CTE chain ending in `reg(event_type, register, rho)` — the
    * full 64-register HLL spine over `user_id` per event type, mirroring
    * [[sketch.hll]] at p=6 bit for bit: register = top 6 hash bits,
    * rho = leading zeros of the remaining 57 bits + 1 via the portable
    * `length(bin(w))` bit-length identity, capped at [[sketch.HllRhoCap]].
    * Shared by the estimate oracle and the merge-law oracle. */
  private[graft] val SqlHllRegs = {
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
  private[graft] def sqlGramsFrom(src: String) =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |  i -> array_to_string(list_slice(toks, i, i+2), ' '))) AS grams
       |FROM (SELECT doc_id, $SqlToks AS toks FROM $src) WHERE len(toks) >= 3""".stripMargin
  private[graft] val SqlGrams = sqlGramsFrom("documents")

  /** DuckDB CTE chain ending in `mp(id_a, id_b, jacc)` — MinHash-LSH
    * near-dup pairs at threshold 0.5 (k=16, 8 bands of r=2), mirroring
    * [[dedup.minhashNearDupPairs]] stage for stage. Shared by the pairs
    * oracle, the connected-components (cluster) oracle, and (via the
    * `src`-parameterized form) the dedup-funnel oracle. */
  private[graft] def sqlMinhashPairCtesFrom(src: String) =
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
  private[graft] val SqlMinhashPairCtes = sqlMinhashPairCtesFrom("documents")

  /** DuckDB fragment replaying [[graft.ops.text.matchKey]] over `e` —
    * shared by the normalized-dedup and funnel oracles ('g' flags:
    * DuckDB regexp_replace is first-match by default, Spark's global).
    * Includes the non-Latin fallback: an empty Latin projection keys on
    * the whitespace-collapsed lowercased raw text. */
  private[graft] def sqlMatchKey(e: String): String = {
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
  private[graft] val SqlBm25Ctes: String = {
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
  private[graft] val SqlUnigramDists: String =
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
  private[graft] def sqlBpeTrain(merges: Int, minPair: Long): String = {
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

  /** Unrolled WordPiece training oracle — [[sqlBpeTrain]] with the
    * likelihood-ratio argmax: each round adds a symbol-count CTE under
    * the current segmentation and picks the pair maximizing
    * `pc·10¹² // (sl·sr)` in HUGEINT (the trainer's DECIMAL(38,0)
    * quotient — both are exact 38-digit integer DIV on the same exact
    * counts). Tie order matches the trainer:
    * (score desc, pc desc, l, r). */
  private[graft] def sqlWordPieceTrain(merges: Int, minPair: Long): String = {
    val head = Seq(
      s"""w0 AS MATERIALIZED (SELECT t AS w, count(*) AS cnt FROM (
         |  SELECT unnest($SqlToks) AS t FROM documents) GROUP BY t)""".stripMargin,
      "v0 AS MATERIALIZED (SELECT cnt, string_split(w, '') AS sy FROM w0)")
    val rounds = (0 until merges).flatMap { i =>
      Seq(
        s"""s$i AS MATERIALIZED (SELECT sym, sum(cnt)::BIGINT AS sc FROM (
           |  SELECT cnt, unnest(sy) AS sym FROM v$i) GROUP BY sym)""".stripMargin,
        s"""p$i AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, sum(cnt)::BIGINT AS pc FROM (
           |  SELECT cnt, unnest(list_transform(range(1, len(sy)), j ->
           |    struct_pack(l := sy[j], r := sy[j+1]))) AS pr FROM v$i)
           |  GROUP BY pr.l, pr.r)""".stripMargin,
        s"""b$i AS MATERIALIZED (SELECT l, r, pc,
           |    ((pc::HUGEINT * 1000000000000) // (sl.sc::HUGEINT * sr.sc::HUGEINT))::BIGINT AS score
           |  FROM p$i JOIN s$i sl ON sl.sym = p$i.l JOIN s$i sr ON sr.sym = p$i.r
           |  WHERE pc >= $minPair
           |  ORDER BY score DESC, pc DESC, l, r LIMIT 1)""".stripMargin,
        s"""v${i + 1} AS MATERIALIZED (SELECT cnt,
           |  CASE WHEN (SELECT count(*) FROM b$i) = 1 THEN
           |    string_split(substring(s2, 2, len(s2) - 2), '||') ELSE sy END AS sy
           |  FROM (SELECT cnt, sy, replace('|' || array_to_string(sy, '||') || '|',
           |    '|' || (SELECT l FROM b$i) || '||' || (SELECT r FROM b$i) || '|',
           |    '|' || (SELECT l || r FROM b$i) || '|') AS s2 FROM v$i))""".stripMargin)
    }
    val emit = (0 until merges)
      .map(i => s"""SELECT $i AS step, l AS "left", r AS "right", pc AS pair_count,
         | score AS score_q12 FROM b$i""".stripMargin)
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
  private[graft] def sqlUnigramCtes(
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

  private[graft] def sqlUnigramTrain(
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
  private[graft] def sqlUnigramFertility(
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

  private[graft] def sqlBm25Top(k: Int): String =
    s"""WITH $SqlBm25Ctes
       |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB literal for a deterministic hyperplane, from the SAME
    * JVM-computed doubles the Spark plan embeds (Double.toString
    * round-trips exactly through DuckDB's literal parser). */
  private[graft] def sqlPlane(t: Int, j: Int, dim: Int): String =
    ann.hyperplane(t, j, dim).mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB fragment: packed sign-bit LSH signature of `e` for table `t`
    * — matches [[ann.lshSignature]]. */
  /** Per-query CTE block for the IVF recall oracle: exact top-10, probe
    * list, nearest-centroid assignment restricted to probed lists,
    * bucket top-10, one-row hit count. Mirrors `ann_ivf_topk`'s CTEs with
    * a numeric suffix so two queries coexist in one WITH chain. */
  private[graft] def ivfRecallCtes(i: Int, q: Seq[Double]): String =
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

  private[graft] def sqlLshSig(t: Int, nbits: Int, dim: Int): String =
    (0 until nbits).map(j =>
      s"(CASE WHEN list_dot_product(e, ${sqlPlane(t, j, dim)}) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** DuckDB CTE chain ending in `r(src, dst, cos, rnk)` — the
    * LSH-bucketed kNN graph (k unbounded here; consumers filter `rnk`),
    * mirroring [[ann.knnGraph]] stage for stage. Shared by the
    * `ann_knn_graph` oracle and the PageRank oracle built on its edges. */
  private[graft] lazy val SqlKnnCtes: String =
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
  private lazy val registries: Seq[graft.registry.Registry] = Seq(
    graft.registry.VecRegistry,
    graft.registry.IndexRegistry,
    graft.registry.AnnRegistry,
    graft.registry.DedupRegistry,
    graft.registry.TextRegistry,
    graft.registry.SampleRegistry,
    graft.registry.RetrievalRegistry,
    graft.registry.MetaRegistry,
    graft.registry.MmRegistry,
    graft.registry.RelRegistry,
    graft.registry.DecontamRegistry,
    graft.registry.EventsRegistry,
    graft.registry.PipelineRegistry,
    graft.registry.ExportRegistry,
    graft.registry.GraphRegistry,
    graft.registry.DocsRegistry,
    graft.registry.GroupRegistry,
    graft.registry.HybridRegistry,
    graft.registry.DatetimeRegistry,
    graft.registry.SketchRegistry,
    graft.registry.EvalRegistry)

  private lazy val QueriesMap: Map[String, (SparkSession, String) => DataFrame] = {
    val all = registries.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size,
      "graft: duplicate query name across registries")
    all.toMap
  }

  private lazy val OracleMap: Map[String, String] = {
    val all = registries.flatMap(_.oracles)
    require(all.map(_._1).distinct.size == all.size,
      "graft: duplicate oracle name across registries")
    all.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = QueriesMap

  def oracleSql: Map[String, String] = OracleMap
}
