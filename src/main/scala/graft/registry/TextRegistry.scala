package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry._
import graft.core.{Cmp, Metric, VecStore}
import graft.functions.{hashing, vectors}
import graft.ops.{ann, asof, bpe, decontam, dedup, evals, multimodal, rel, retrieval, sample, sketch, text, unigram, wordpiece}
import graft.streaming.EventStream

/** text-family query registry: each Spark-side query with its DuckDB
  * oracle SQL immediately adjacent (mechanical split of SparkEntry,
  * round 15 — no behavior change; SparkEntry composes the families). */
private[graft] object TextRegistry extends Registry {

    // north-star: corpus-unigram LM quality score (CCNet-style perplexity
    // filtering, engine-primitive form); fixed-point sums keep it exact.
  b.q(
    "text_unigram_logprob" -> ((s, dir) =>
      text.unigramLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: CCNet-style perplexity gate, applied in log space on
    // the quantized score (exp() is libm — not oracle-portable).
  b.q(
    "text_lm_filter" -> ((s, dir) =>
      text.lmQualityFilter(table(s, dir, "documents"), "text", "doc_id",
          minLogProb = -3.42)
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM lp ORDER BY doc_id""".stripMargin
  )

    // north-star: type-token ratio — scattered-repeat templates and
    // word salad, in row, zero shuffle.
  b.q(
    "text_lexical_diversity" -> ((s, dir) =>
      text.lexicalDiversity(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
         |s AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::BIGINT AS n_types FROM t)
         |SELECT doc_id, n_tokens, n_types,
         |  floor(n_types::DOUBLE / n_tokens::DOUBLE * 10000.0 + 0.5) / 10000.0 AS ttr
         |FROM s WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin
  )

    // north-star: Gopher hard-threshold rule bundle (Rae et al. 2021) —
    // the standard pre-filter stack before any model gate; all signals
    // from ONE bound token array, in row, zero shuffle.
  b.q(
    "text_gopher_quality" -> ((s, dir) =>
      text.gopherQuality(table(s, dir, "documents"), "text", "doc_id",
          minWords = 20)
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM q ORDER BY doc_id""".stripMargin
  )

    // north-star: character-entropy quality signal — mash and
    // base64/hex blobs sit in the tails prose never reaches.
  b.q(
    "text_char_entropy" -> ((s, dir) =>
      text.charEntropy(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cf AS (SELECT doc_id, ch, count(*)::BIGINT AS cnt FROM ch GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars,
        |  sum(floor(cnt * ln(cnt::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS qa
        |  FROM cf GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  floor(-(qa::DOUBLE / 1000000.0 - n_chars::DOUBLE * ln(n_chars::DOUBLE))
        |    / n_chars::DOUBLE * 10000.0 + 0.5) / 10000.0 AS entropy
        |FROM a ORDER BY doc_id""".stripMargin
  )

    // north-star: pretrained linear quality classifier over hashed
    // bag-of-words features (the FineWeb-Edu-shaped gate) — zero-shuffle
    // in-row scoring; gate on the linear score (sigmoid is monotone).
  b.q(
    "text_quality_linear" -> ((s, dir) =>
      text.linearGate(table(s, dir, "documents"), "text", "doc_id",
          LinW, bias = 0.0, tau = 0.0)
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM sc ORDER BY doc_id""".stripMargin
  )

    // north-star: DSIR importance weights — resample the raw corpus
    // toward a small high-quality target distribution (Xie et al. 2023);
    // docs whose unigram profile matches the target score high.
  b.q(
    "text_dsir_weights" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.dsirWeights(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 7 === 0), "text", "doc_id")
        .orderBy(col("doc_id"))
    })
  )
  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: bigram conditional logprob — word-ORDER quality (word
    // salad scores low even when every word is individually common).
  b.q(
    "text_bigram_logprob" -> ((s, dir) =>
      text.bigramLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star §7.2#7: token counting (whitespace + BPE-ish regex) and
    // prose-shape ratios over the documents table — all fused codegen
    // expressions, no shuffle, scan-parallel at any scale.
  b.q(
    "text_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        text.tokenCount(col("text")).cast("long").as("n_tokens"),
        text.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        vectors.quantize(text.meanTokenLen(col("text")), 4).as("mean_tok_len"),
        vectors.quantize(text.punctuationRatio(col("text")), 4).as("punct_ratio"),
        vectors.quantize(text.stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $SqlToks AS toks FROM documents)
         |SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(regexp_extract_all(lower(text), '${text.BpeTokenPattern}')) AS n_bpe,
         |  floor((CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS mean_tok_len,
         |  floor((CASE WHEN length(text) > 0 THEN length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE / length(text) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         |  floor((CASE WHEN len(toks) > 0 THEN ${sqlStopHits("toks", text.EnStop)}::DOUBLE / len(toks) ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio
         |FROM t ORDER BY doc_id""".stripMargin
  )

    // north-star: C4-style blocklist content gate — word-boundary
    // occurrence counts for a mixed-length term/phrase list via the
    // fused hash-set kernel; one row-local pass, zero shuffle.
  b.q(
    "text_blocklist_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.blocklistHits(col("text"), BlockTerms).as("n_hits"))
        .where(col("n_hits") > 0)
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_blocklist_stats" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |g1 AS (SELECT doc_id FROM tk, unnest(ts) u(t) WHERE t IN ('slow')),
         |g2 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts))) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] IN ('big query')),
         |g3 AS (SELECT doc_id FROM tk, unnest(range(1, len(ts) - 1)) u(i)
         |  WHERE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] IN ('merge batch part'))
         |SELECT doc_id, count(*)::BIGINT AS n_hits FROM
         |  (SELECT * FROM g1 UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
         |GROUP BY doc_id HAVING count(*) > 0 ORDER BY doc_id""".stripMargin
  )

    // the gate summary: corpus size, survivors, total flagged mass in
    // ONE aggregation over ONE scan.
  b.q(
    "text_blocklist_clean" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(text.blocklistHits(col("text"), BlockTerms).as("h"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("h") === 0L, 1L).otherwise(0L)).as("n_clean"),
          sum(col("h")).as("total_hits")))
  )
  b.o(
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
         |FROM tk LEFT JOIN h USING (doc_id)""".stripMargin
  )

    // north-star: C4 line-level cleanup — the synthetic corpus is
    // single-line and unpunctuated, so the query first manufactures
    // deterministic sentence/line structure (every ' table ' becomes
    // '.\n', both engines verbatim), then keeps only terminal-punctuated
    // >= 3-word lines; one fused row-local HOF pass.
  b.q(
    "text_c4_line_clean" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.c4LineClean(
            regexp_replace(col("text"), " table ", ".\n"), minWords = 3)
            .as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("clean_len"))
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: the FAITHFUL C4 composition (Raffel et al. §2.2) —
    // "lorem ipsum" and `{` discard the whole PAGE, then the line
    // cleanup runs on survivors. Signals are manufactured
    // deterministically (doc_id % 7 appends 'lorem ipsum', % 11 a
    // brace) so the page gate actually fires; two row-local passes,
    // zero shuffle.
  b.q(
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
    })
  )
  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: FineWeb-style line-shape signals over the same
    // manufactured line structure (bullets via ' row ' -> '\n- ').
  b.q(
    "text_line_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
          text.lineStats(regexp_replace(
            regexp_replace(col("text"), " table ", ".\n"),
            " row ", "\n- ")).as("ls"))
        .select(col("doc_id"), col("ls.n_lines").as("n_lines"),
          col("ls.frac_bullet").as("frac_bullet"),
          col("ls.frac_ellipsis").as("frac_ellipsis"),
          col("ls.frac_terminal").as("frac_terminal"))
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM l ORDER BY doc_id""".stripMargin
  )

    // north-star: overlapping token-window chunking — the text→context-
    // window expansion step; row-local explode, no shuffle.
  b.q(
    "text_chunk" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), text.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(text.tokenChunksOf(col("_toks"), window = 64, stride = 48)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          size(col("c.chunk")).cast("long").as("n_toks"),
          md5(concat_ws(" ", col("c.chunk"))).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx")))
  )
    // Same start set as text.tokenChunks: 0, 48, 96, … with the last
    // start the first covering the tail; docs with no tokens drop out.
  b.o(
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
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin
  )

    // north-star: corpus vocabulary (tf + df) top-N — token-keyed
    // aggregate with map-side combine; top-N via TakeOrderedAndProject.
  b.q(
    "text_vocab_topn" -> ((s, dir) =>
      text.vocabulary(table(s, dir, "documents"), "text", "doc_id", topN = 100))
  )
  b.o(
    "text_vocab_topn" ->
      s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS word FROM documents)
         |SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM t GROUP BY word ORDER BY tf DESC, word LIMIT 100""".stripMargin
  )

    // north-star: Heaps'-law vocabulary growth — new word types per
    // corpus id-slice + cumulative curves; the diminishing-returns
    // read for "does more data still buy new language".
  b.q(
    "text_vocab_growth" -> ((s, dir) =>
      text.vocabGrowth(table(s, dir, "documents"), "text", "doc_id",
          buckets = 20)
        .orderBy(col("bucket")))
  )
    // Heaps curve: first occurrence = min bucket per type; cumulative
    // sums over the 20-row grid.
  b.o(
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
         |FROM g ORDER BY bucket""".stripMargin
  )

    // north-star: Zipf rank-frequency slope — Heaps' standard data-card
    // companion: exact-integer OLS of q4 log-freq on q4 log-rank over
    // the top-1000 vocabulary grid; slope as signed num/den + one
    // quantized double.
  b.q(
    "text_zipf_slope" -> ((s, dir) =>
      text.zipfSlope(table(s, dir, "documents"), "text", topK = 1000))
  )
    // Zipf slope: same top-1000 head as text_vocab_topn, q4-floored ln
    // terms, exact integer OLS sums, signed num/den + one quantized
    // double (floor(x*1e6+0.5) on identical operands both engines).
  b.o(
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
         |FROM a""".stripMargin
  )

    // north-star: term dispersion across sources (Gries' DP) — which
    // high-frequency terms are ONE source's template text; cleared-
    // denominator DECIMAL cells, absent sources in closed form.
  b.q(
    "text_term_dispersion" -> ((s, dir) =>
      text.termDispersion(table(s, dir, "documents"), "text", "source",
        minTf = 10L, topK = 20))
  )
    // Term dispersion: HUGEINT cleared-denominator cells, closed-form
    // absent-source mass, one truncating division per term.
  b.o(
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
         |ORDER BY dp_ppm DESC, tf DESC, word LIMIT 20""".stripMargin
  )

    // north-star: interpolated Kneser-Ney 3-gram LM quality score — the
    // paper-correct CCNet gate (continuation-count smoothing);
    // lmQualityFilter/bigramLogProb are its MLE ablations. All KN
    // statistics are integer grids; one doc-sized shuffle.
  b.q(
    "text_kn_logprob" -> ((s, dir) =>
      text.knLogProb(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
    // Interpolated Kneser-Ney trigram LM: every count statistic replayed
    // as an integer-grid CTE (c3 -> context/continuation/middle/word
    // grids), then the SAME fixed parenthesization of the p3 double
    // expression, the same floor-1e6 long terms, the same 4-dp mean.
  b.o(
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
         |FROM d ORDER BY doc_id""".stripMargin
  )

    // north-star: char-4-gram language ID over 16 languages (Cavnar &
    // Trenkle rank-weight profiles as driver literals) — the production
    // langid replacing the 4-language stopword heuristic; one fused
    // row-local pass, grouped by (metadata lang, predicted lang) with
    // summed top-score evidence so the hash verifies the whole scoring
    // pipeline, not just the labels.
  b.q(
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
        .orderBy(col("meta_lang"), col("lang_pred")))
  )
    // Char-4-gram langid: the 16-language rank-weight profile table is
    // emitted as a VALUES literal FROM THE SAME driver-trained
    // [[graft.ops.langprofiles.Default]] the Spark kernel uses, so both
    // engines score with identical integer weights; normalization,
    // gram slide, argmax tie order (score desc, profile order), the
    // below-minScore 'und' fallback, and the no-hit LEFT JOIN fallback
    // are replayed exactly.
  b.o(
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
    }
  )

    // north-star: learned BPE merge rules — iterative trainer; corpus
    // read once, merge rounds run on the distributed word vocabulary.
    // Deterministic (exact integer pair counts, fixed tie order); the
    // oracle unrolls the 12 training rounds as DuckDB CTEs (see
    // [[sqlBpeTrain]]) the same way the pagerank oracle unrolls its
    // power iterations.
  b.q(
    "text_bpe_merges" -> ((s, dir) =>
      bpe.train(table(s, dir, "documents"), "text",
          merges = 12, minPairCount = 2)
        .orderBy(col("step")))
  )
    // The trainer's 12 rounds unrolled in DuckDB — an independent
    // re-derivation of the merge rules, not a pinned transcript.
  b.o(
    "text_bpe_merges" -> sqlBpeTrain(merges = 12, minPair = 2L)
  )

    // north-star: WordPiece merge rules — the likelihood-ratio trainer
    // (BERT's): argmax of pc/(sl·sr) as an exact DECIMAL(38,0) integer
    // quotient, same read-corpus-once / rounds-over-the-word-vocabulary
    // shape as BPE. Oracle re-derives all rounds in HUGEINT CTEs.
  b.q(
    "text_wordpiece_merges" -> ((s, dir) =>
      wordpiece.train(table(s, dir, "documents"), "text",
          merges = 10, minPairCount = 2)
        .orderBy(col("step")))
  )
  b.o(
    "text_wordpiece_merges" -> sqlWordPieceTrain(merges = 10, minPair = 2L)
  )

    // north-star: Unicode-script profile — exact per-class regexp counts
    // over explicit code-point ranges, dominant script via the
    // struct-greatest argmax (count, -lexIndex), row-local scan.
  b.q(
    "text_script_profile" -> ((s, dir) =>
      text.scriptProfile(table(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_script_profile" -> {
      val cls = text.ScriptClasses
      val counts = cls.map { case (n, p) =>
        s"len(regexp_extract_all(text, '$p'))::BIGINT AS n_$n" }
      val digit = "len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit"
      val space =
        "len(regexp_extract_all(text, '[ \\t\\n\\r]'))::BIGINT AS n_space"
      val otherCls = "[^" + (cls.map(_._2) :+ "[0-9]" :+ "[ \\t\\n\\r]")
        .map(c => c.substring(1, c.length - 1)).mkString + "]"
      val other = s"len(regexp_extract_all(text, '$otherCls'))::BIGINT AS n_other"
      val dom = cls.zipWithIndex.map { case ((n, _), i) =>
        s"struct_pack(c := n_$n, ni := ${-i})" }.mkString("list_max([", ", ", "])")
      val tot = cls.map(c => s"n_${c._1}").mkString(" + ")
      val nameList = cls.map(c => s"'${c._1}'").mkString("[", ", ", "]")
      s"""WITH c AS (SELECT doc_id, ${(counts :+ digit :+ space :+ other)
           .mkString(",\n  ")}
         |  FROM documents),
         |d AS (SELECT *, $dom AS dom, ($tot)::BIGINT AS tot FROM c)
         |SELECT doc_id, ${cls.map(c => s"n_${c._1}").mkString(", ")},
         |  n_digit, n_space, n_other,
         |  CASE WHEN tot > 0 THEN ($nameList)[-dom.ni + 1]
         |    ELSE 'none' END AS dominant,
         |  CASE WHEN tot > 0 THEN (dom.c * 1000000) // tot END AS dom_ppm
         |FROM d ORDER BY doc_id""".stripMargin
    }
  )

    // north-star: unigram-LM (SentencePiece-style) tokenizer training —
    // the BPE companion: seed from frequent substrings, Viterbi hard-EM
    // rounds over the word vocabulary (corpus read once; pieces are
    // bounded driver literals), prune by usage. Oracle unrolls both EM
    // rounds' DP position-by-position (sqlUnigramTrain).
  b.q(
    "text_unigram_train" -> ((s, dir) =>
      unigram.train(table(s, dir, "documents"), "text", seedSize = 60,
        maxPieceLen = 3, rounds = 2, minUsage = 2L, keepTop = 40))
  )
    // The unigram trainer's 2 EM rounds unrolled — an independent
    // re-derivation of seed, per-round Viterbi DP (one CTE per token
    // position; the fixture's max token length is 8 at every SF),
    // recursive backtrace, usage fold, and prune.
  b.o(
    "text_unigram_train" -> sqlUnigramTrain(seedSize = 60,
      maxPieceLen = 3, rounds = 2, minUsage = 2L, keepTop = 40,
      maxWordLen = 8)
  )

    // north-star: learned-vocab fertility — pieces per whitespace token
    // + UNK share under the trained unigram vocabulary; the trainer's
    // fit-for-budget readout (oracle re-derives the full EM chain plus
    // one final segmentation round).
  b.q(
    "text_unigram_fertility" -> ((s, dir) =>
      unigram.fertility(table(s, dir, "documents"), "text", seedSize = 60,
        maxPieceLen = 3, rounds = 2, minUsage = 2L))
  )
    // Fertility of the trained vocab: the same chain + one final
    // scored segmentation round; counts are cnt-weighted long sums.
  b.o(
    "text_unigram_fertility" -> sqlUnigramFertility(seedSize = 60,
      maxPieceLen = 3, rounds = 2, minUsage = 2L, maxWordLen = 8)
  )

    // north-star: encode under a PERSISTED tokenizer artifact — train
    // once (memoized build, the prebuilt-index discipline), write the
    // versioned (piece, freq, score_q6) parquet + meta, then
    // load-then-encode the corpus word vocabulary with the same fused
    // Viterbi kernel; piece-usage histogram proves the round trip.
  b.q(
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
    })
  )
    // Persisted-artifact encode: the oracle re-derives the trained
    // vocabulary (same EM chain) and the final-scores segmentation
    // (finalSegRound DP), then folds the piece-usage histogram — i.e.
    // it verifies that what was WRITTEN, LOADED, and ENCODED equals a
    // from-scratch re-derivation of the same trainer.
  b.o(
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
    }
  )

    // north-star: cross-corpus token shift — what changed between two
    // domains (en vs de here); smoothed log-ratio, vocab-sized work.
  b.q(
    "text_token_shift" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.tokenShift(docs.where(col("lang") === "en"),
        docs.where(col("lang") === "de"), "text", k = 10)
    })
  )
    // Shared smoothed-unigram CTE chain for the two cross-corpus
    // queries: identical add-one smoothing, identical op order.
  b.o(
    "text_token_shift" ->
      s"""WITH $SqlUnigramDists
         |SELECT tok, ca AS n_a, cb AS n_b,
         |  floor(ln(pa / pb) * 1000000.0 + 0.5) / 1000000.0 AS shift
         |FROM d ORDER BY abs(floor(ln(pa / pb) * 1000000.0 + 0.5) / 1000000.0) DESC, tok
         |LIMIT 10""".stripMargin
  )

    // north-star: corpus distribution divergence — the domain-shift /
    // mixture-drift meter (KL both ways + bounded JS), fixed-point sums.
  b.q(
    "text_corpus_divergence" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      text.corpusDivergence(docs.where(col("lang") === "en"),
        docs.where(col("lang") === "de"), "text")
    })
  )
  b.o(
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
         |FROM q""".stripMargin
  )

    // north-star: per-doc language consistency — chunk-level langId
    // against the doc majority; catches code-switched docs that a
    // doc-level langId averages into one confident label.
  b.q(
    "text_lang_consistency" -> ((s, dir) =>
      text.langConsistency(table(s, dir, "documents"), "text", "doc_id",
          window = 64, stride = 64)
        .orderBy(col("doc_id")))
  )
    // Same 64-token non-overlapping chunking as tokenChunks(64, 64); lang
    // per chunk from stopword-hit argmax over the chunk's token list.
  b.o(
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
         |FROM m WHERE rk = 1 ORDER BY doc_id""".stripMargin
  )

    // north-star: typed PII scrub — emails/urls/phones/IPs/card-shaped
    // digit runs → placeholder tokens; fused regex chain, zero shuffle.
  b.q(
    "text_redact" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), md5(text.redactPii(col("text"))).as("redacted_md5"))
        .orderBy(col("doc_id")))
  )
    // Same rule order as text.redactPii: email, url, ip, card-run, phone.
  b.o(
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
         |FROM documents ORDER BY doc_id""".stripMargin
  )

    // north-star: per-doc keyword extraction — smoothed TF-IDF top-3,
    // rank window partitioned by document (WindowGroupLimit).
  b.q(
    "text_tfidf_topterms" -> ((s, dir) =>
      text.tfidfTopTerms(table(s, dir, "documents"), "text", "doc_id", k = 3)
        .orderBy(col("doc_id"), col("rk")))
  )
    // Ranking is on the ROUNDED score, so both engines agree at ulp ties.
  b.o(
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
         |ORDER BY doc_id, rk""".stripMargin
  )

    // north-star: per-language corpus shape report — exact interpolated
    // length quantiles; one uniform-key aggregate. SCALE NOTE: exact
    // `percentile` buffers per-group DISTINCT values, which is safe HERE
    // only because n_chars is a bounded integer domain (≤ ~20k distinct
    // values per language regardless of corpus size). Do NOT copy this
    // shape onto an unbounded-domain column (timings, scores) — use the
    // mergeable histogram twin `sketch.histogramQuantileBy`
    // (`docs_len_quantiles_lang`) there.
  b.q(
    "text_len_quantiles" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          (floor(expr("percentile(n_chars, 0.5)") * 10000.0 + 0.5) / 10000.0).as("p50"),
          (floor(expr("percentile(n_chars, 0.9)") * 10000.0 + 0.5) / 10000.0).as("p90"))
        .orderBy(col("lang")))
  )
  b.o(
    "text_len_quantiles" ->
      """SELECT lang, count(*) AS n,
        |  floor(quantile_cont(n_chars, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(n_chars, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )

    // north-star: composite quality score (usable as a pushed-down scan
    // filter) + stopword-profile language-ID heuristic.
  b.q(
    "text_quality_langid" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        // floor-based quantization, NOT round(): ratio-of-small-ints scores
        // sit exactly on .00005 boundaries where Spark (BigDecimal half-up
        // on the shortest decimal repr) and DuckDB (float rounding)
        // disagree; floor(x*1e4+0.5)/1e4 is identical IEEE math in both.
        (floor(text.qualityScore(col("text")) * 10000.0 + 0.5) / 10000.0).as("quality"),
        text.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM q ORDER BY doc_id""".stripMargin
  )

    // north-star: Gopher-style repetition signals — top-2-gram char
    // fraction, duplicate-3-gram char fraction, duplicate-line fraction,
    // and the composite keep flag. One native kernel pass per n; zero
    // shuffle.
  b.q(
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
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM v ORDER BY doc_id""".stripMargin
  )

    // north-star: exact 128-bit content fingerprint + rolling-hash
    // min-shingle fingerprint (robust to small edits).
  b.q(
    "text_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        text.contentFingerprint(col("text")).as("fp128"),
        text.minShingleFingerprint(col("text")).as("fp_shingle"))
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(text) AS fp128,
         |  list_min(list_transform(range(1, length(text) - 6), i -> ${hashing.sqlH32("substr(text, i, 8)")})) AS fp_shingle
         |FROM documents ORDER BY doc_id""".stripMargin
  )

    // north-star: PII shape counts for the data card. The corpus text is
    // PII-free word salad, so inject deterministic shapes (email, URL,
    // IP, card-grouped digits, phone) on modular doc_id classes — counts
    // then exercise every pattern including multi-hit rows.
  b.q(
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
    })
  )
    // Same injected-PII fixture; counts via regexp_extract_all with the
    // IDENTICAL pattern constants (RE2-compatible, no flags).
  b.o(
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
         |FROM j ORDER BY doc_id""".stripMargin
  )

    // north-star: TextRank corpus keywords — PageRank over the token
    // co-occurrence graph (window 2), fixed-point integer ranks over
    // h63 term ids; centrality rewards context-bridging terms TF-IDF's
    // per-document lens misses.
  b.q(
    "text_textrank" -> ((s, dir) =>
      graft.ops.text.textRankTerms(table(s, dir, "documents"), "text",
        window = 2, iters = 3, topN = 20))
  )
  b.o(
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
    }
  )

    // tokenizer fertility per language (BPE-ish subwords per whitespace
    // word) — the tokenizer-suitability signal a multilingual corpus
    // report carries; exact integer sums, fixed-point ratio.
  b.q(
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
        .orderBy(col("lang")))
  )
  b.o(
    "text_fertility" ->
      s"""WITH t AS (SELECT lang, len($SqlToks) AS ws,
         |  len(regexp_extract_all(lower(text), '${text.BpeTokenPattern}')) AS bpe
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs, sum(ws)::BIGINT AS ws_tokens,
         |  sum(bpe)::BIGINT AS bpe_tokens,
         |  ((sum(bpe) * 10000) // sum(ws))::BIGINT AS fertility_4dp
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin
  )

    // Count-Min sketch over corpus tokens + point estimates for probe
    // words — the depth×width frequency summary is deterministic and
    // mergeable; estimates never undercount.
  b.q(
    "text_cm_tokens" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(text.tokens(col("text"))).as("tok"))
      val sk = sketch.countMin(toks, col("tok"), depth = 4, width = 512)
      sketch.cmEstimate(sk, Seq("the", "spark", "query", "zzzz_absent"),
          depth = 4, width = 512)
        .orderBy(col("value"))
    })
  )
    // Sketch cells rebuilt in SQL from the same portable hash family;
    // probe cells injected as driver-computed literals (identical
    // arithmetic to sketch.cmEstimate).
  b.o(
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
    }
  )

    // north-star: text scrubbing (url/email placeholders + whitespace
    // normalization) — checked by fingerprinting the cleaned text.
  b.q(
    "text_clean" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          md5(text.cleanText(col("text")).cast("binary")).as("clean_fp"),
          length(text.cleanText(col("text"))).cast("long").as("clean_len"))
        .orderBy(col("doc_id")))
  )
  b.o(
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
         |FROM documents ORDER BY doc_id""".stripMargin
  )

    // north-star: BM25 keyword retrieval over the documents table.
  b.q(
    "text_bm25_topk" -> ((s, dir) =>
      retrieval.bm25Search(table(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "query", "window"), k = 10))
  )
  b.o(
    "text_bm25_topk" -> sqlBm25Top(10)
  )

    // north-star: pseudo-relevance-feedback expansion — mine the top-5
    // BM25 docs for 5 expansion terms (all-integer ranking: feedback df
    // desc, corpus df asc, term) and re-run; the oracle replays both
    // rounds including the term mining.
  b.q(
    "text_bm25_prf" -> ((s, dir) =>
      retrieval.prfExpand(table(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "query", "window"), k = 10,
        feedbackK = 5, expandTerms = 5))
  )
    // Two full BM25 rounds + the integer-ranked term mining between them.
  b.o(
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
    }
  )

    // PERSISTED inverted index — probe-bucket partition pruning, corpus
    // never re-tokenized; scores bit-identical to the live path (same
    // oracle SQL as text_bm25_topk).
  b.q(
    "text_bm25_indexed" -> ((s, dir) =>
      retrieval.bm25Indexed(s, textIndex(s, dir),
        Seq("spark", "query", "window"), k = 10))
  )
    // The indexed path must reproduce the LIVE path's scores exactly.
  b.o(
    "text_bm25_indexed" -> sqlBm25Top(10)
  )

    // ---- round 10: annotation, preference, readability, series, ----
    // ---- clustering-quality families                             ----

    // north-star: Flesch reading-ease gate — row-local regex counts +
    // one double expression; sentences manufactured deterministically
    // (' table ' -> '. ') since the synthetic corpus is unpunctuated.
  b.q(
    "text_readability" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          text.readability(regexp_replace(col("text"), " table ", ". "))
            .as("r"))
        .select(col("doc_id"), col("r.n_words").as("n_words"),
          col("r.n_sentences").as("n_sentences"),
          col("r.n_syllables").as("n_syllables"),
          col("r.flesch").as("flesch"))
        .orderBy(col("doc_id")))
  )
    // ---- round 10 ----

  b.o(
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
         |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: corpus boilerplate audit — the k most-duplicated word
    // trigrams by document frequency; one gram explode, one combine-
    // collapsed aggregate, TakeOrdered.
  b.q(
    "text_top_ngrams" -> ((s, dir) =>
      dedup.topNgrams(table(s, dir, "documents"), "text", "doc_id",
        n = 3, k = 20))
  )
  b.o(
    "text_top_ngrams" ->
      s"""WITH tk AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |e AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
         |  FROM tk, unnest(range(1, len(ts) - 1)) u(i))
         |SELECT gram, count(DISTINCT doc_id)::BIGINT AS doc_freq,
         |  count(*)::BIGINT AS occurrences
         |FROM e GROUP BY gram
         |ORDER BY doc_freq DESC, occurrences DESC, gram LIMIT 20""".stripMargin
  )

    // north-star: encoding-quality screen — replacement/control/mojibake
    // counts per doc over a deterministically dirtied corpus (the clean
    // synthetic corpus can't exercise the counters on its own).
  b.q(
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
    })
  )
    // Same deterministic dirtying (chr() spells the exact codepoints the
    // Spark side injects), length-difference marker counts, C0-control
    // regexp. length() is code points on both engines.
  b.o(
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
        |FROM c ORDER BY doc_id""".stripMargin
  )

    // north-star: per-doc OOV rate against the corpus's own top-200
    // vocabulary — the will-the-tokenizer-cope screen; vocab broadcasts,
    // the token stream never shuffles for membership.
  b.q(
    "text_oov_rate" -> ((s, dir) =>
      text.oovStats(table(s, dir, "documents"), "text", "doc_id",
          topN = 200)
        .orderBy(col("doc_id")))
  )
    // The same head vocabulary as text_vocab_topn (tf desc, word ties),
    // then a membership left join and per-doc counts.
  b.o(
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
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

    // north-star: hashing-trick featurization — vocabulary-free sparse
    // vectors, sign-cancelled collisions, one (doc, bucket) aggregate.
  b.q(
    "text_feature_hash" -> ((s, dir) =>
      graft.ops.text.featureHash(
          table(s, dir, "documents").where(col("doc_id") < 50),
          "text", "doc_id", nBuckets = 256)
        .orderBy(col("doc_id"), col("bucket")))
  )
    // The same portable token hash pair: bucket from h32, sign from one
    // h32b bit; zero-sum buckets dropped on both engines.
  b.o(
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
    }
  )

    // north-star: vocabulary coverage — Good-Turing unseen mass + Chao1
    // richness off ONE vocabulary aggregate; exact longs + num/den pairs,
    // two quantized doubles.
  b.q(
    "text_vocab_coverage" -> ((s, dir) =>
      text.vocabCoverage(table(s, dir, "documents"), "text"))
  )
  b.o(
    "text_vocab_coverage" ->
      s"""WITH t AS (SELECT unnest($SqlToks) AS word FROM documents),
         |v AS (SELECT word, count(*)::BIGINT AS tf FROM t GROUP BY 1),
         |a AS (SELECT sum(tf)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         |  sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
         |  sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis FROM v)
         |SELECT n_tokens, n_types, n_hapax, n_dis,
         |  CASE WHEN n_tokens > 0 THEN
         |    floor(n_hapax::DOUBLE / n_tokens::DOUBLE * 1000000.0 + 0.5)
         |      / 1000000.0 END AS unseen_mass_q6,
         |  (n_hapax * (n_hapax - 1))::BIGINT AS chao1_extra_num,
         |  (2 * (n_dis + 1))::BIGINT AS chao1_extra_den,
         |  floor((n_types::DOUBLE + (n_hapax * (n_hapax - 1))::DOUBLE
         |      / (2 * (n_dis + 1))::DOUBLE) * 100.0 + 0.5) / 100.0 AS chao1_q2
         |FROM a""".stripMargin
  )

    // north-star: Kirchenbauer-style n-gram watermark detector — the
    // synthetic-text screen; portable-hash green lists, binomial z, one
    // row-local HOF fold per doc (no shuffle).
  b.q(
    "text_watermark" -> ((s, dir) =>
      text.watermarkDetect(table(s, dir, "documents"), "text", "doc_id",
          key = "graft", gammaPct = 25, zTau = 4.0)
        .orderBy(col("doc_id")))
  )
  b.o(
    "text_watermark" -> {
      val h = graft.functions.hashing.sqlH32(
        "(ts[i-1] || ' ' || ts[i] || '/wm/graft')")
      s"""WITH t AS (SELECT doc_id, $SqlToks AS ts FROM documents),
         |s AS (SELECT doc_id,
         |    greatest(len(ts) - 1, 0)::BIGINT AS n_scored,
         |    CASE WHEN len(ts) >= 2 THEN
         |      len(list_filter(range(2, len(ts) + 1),
         |        i -> $h % 100 < 25))::BIGINT
         |    ELSE 0 END AS n_green
         |  FROM t),
         |z AS (SELECT doc_id, n_scored, n_green,
         |    CASE WHEN n_scored > 0 THEN
         |      floor(n_green::DOUBLE / n_scored::DOUBLE * 10000.0 + 0.5)
         |        / 10000.0 END AS green_rate_q4,
         |    CASE WHEN n_scored > 0 THEN
         |      floor((n_green::DOUBLE - n_scored::DOUBLE * 0.25)
         |          / sqrt(n_scored::DOUBLE * 0.25 * 0.75) * 10000.0 + 0.5)
         |        / 10000.0 END AS z_q4
         |  FROM s)
         |SELECT doc_id, n_scored, n_green, green_rate_q4, z_q4,
         |  (CASE WHEN z_q4 IS NOT NULL AND z_q4 >= 4.0
         |    THEN 1 ELSE 0 END)::BIGINT AS watermarked
         |FROM z ORDER BY doc_id""".stripMargin
    }
  )
}
