package graft

import org.apache.spark.sql.functions._

import graft.ops.text

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq(s).toDF("text")

  test("tokenCount: whitespace split, empties dropped, case-insensitive") {
    val df = one("The  quick\tbrown\nfox ").select(
      text.tokenCount(col("text")).as("n"),
      text.tokens(col("text")).as("ts"))
    val r = df.head()
    assert(r.getInt(0) == 4)
    assert(r.getSeq[String](1) == Seq("the", "quick", "brown", "fox"))
    assert(one("").select(text.tokenCount(col("text"))).head().getInt(0) == 0)
  }

  test("bpeTokenCount: letter runs, digit runs, single symbols") {
    // "gpt2-style!" -> [gpt][2][-][style][!]
    val n = one("gpt2-style!").select(text.bpeTokenCount(col("text"))).head().getInt(0)
    assert(n == 5)
  }

  test("ratios: punctuation and stopword fractions") {
    val df = one("the cat!!").select(
      text.punctuationRatio(col("text")).as("p"),
      text.stopwordRatio(col("text")).as("s"),
      text.meanTokenLen(col("text")).as("m"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 2.0 / 9.0) < 1e-12)  // 2 of 9 chars
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)         // "the" of 2 tokens
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-12)         // (3 + 5)/2
  }

  test("tokenChunks: coverage, overlap, tail, and empty-doc guard") {
    def chunks(s: String, w: Int, st: Int): Seq[(Long, Seq[String])] =
      one(s).select(explode(text.tokenChunks(col("text"), w, st)).as("c"))
        .select($"c.chunk_idx", $"c.chunk").as[(Long, Seq[String])].collect().toSeq

    assert(chunks("", 4, 2).isEmpty)                  // no [0,-1] sequence trap
    assert(chunks("a b", 4, 2) == Seq((0L, Seq("a", "b"))))  // short doc: one chunk
    // 7 tokens, window 4, stride 2 -> starts 0,2,4 (start 4 covers the tail)
    val c = chunks("t0 t1 t2 t3 t4 t5 t6", 4, 2)
    assert(c.map(_._1) == Seq(0L, 1L, 2L))
    assert(c(0)._2 == Seq("t0", "t1", "t2", "t3"))
    assert(c(1)._2 == Seq("t2", "t3", "t4", "t5"))
    assert(c(2)._2 == Seq("t4", "t5", "t6"))          // tail chunk, shorter
    // every token appears in some chunk; consecutive chunks share w-st tokens
    assert(c.flatMap(_._2).distinct.size == 7)
  }

  test("vocabulary: tf counts occurrences, df counts documents, top-N ordered") {
    val docs = Seq((1L, "the cat the dog"), (2L, "the bird")).toDF("doc_id", "text")
    val v = text.vocabulary(docs, "text", "doc_id", topN = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(v.head == ("the", 3L, 2L))                 // tf=3 across both docs
    assert(v.map(r => r._1 -> ((r._2, r._3))).toMap.apply("cat") == ((1L, 1L)))
    assert(v.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(text.vocabulary(docs, "text", "doc_id", topN = 2).count() == 2)
  }

  test("redactPii replaces typed PII with placeholders, leaves prose alone") {
    val in = "Call +1 (555) 123-4567 or mail bob@x.com; card 4111 1111 1111 1111 " +
      "at 10.0.0.1 via https://x.com/a?b=1 — normal text 2024 stays."
    val out = one(in).select(text.redactPii(col("text"))).head().getString(0)
    assert(out.contains("<phone>") && out.contains("<email>") &&
      out.contains("<number>") && out.contains("<ip>") && out.contains("<url>"))
    assert(!out.contains("bob@") && !out.contains("4111") && !out.contains("10.0.0.1"))
    assert(out.contains("normal text 2024 stays"))  // years survive
  }

  test("matchKey conflates case/accent/punct/spacing variants; fold table is 1:1") {
    // translate is per-character: a ragged table would silently DELETE
    assert(text.AccentFrom.length === text.AccentTo.length)
    def key(s: String): String =
      one(s).select(text.matchKey(col("text"))).head().getString(0)
    val k = key("Héllo,  Wörld! 42")
    assert(k === "hello world 42")
    assert(key("hello world 42") === k)
    // punctuation is stripped, NOT turned into spacing: "world…42" keys
    // as "world42", a genuinely different token stream than "world 42"
    assert(key("HELLO — wórld…42") !== k)
    assert(key("  hèllo   WORLD 42  ") === k)
    // distinct content stays distinct
    assert(key("hello there 42") !== k)
    // non-Latin guard: CJK/Cyrillic docs must NOT all collapse to the
    // empty key (that would merge the whole non-Latin corpus into one
    // dedup group) — they fall back to spacing/case-insensitive raw text
    val cjk1 = key("你好 世界")
    val cjk2 = key("  你好   世界 ")
    val cjk3 = key("再见 世界")
    assert(cjk1.nonEmpty)
    assert(cjk1 === cjk2)
    assert(cjk1 !== cjk3)
    val ru = key("Привет")
    assert(ru.nonEmpty)
    assert(ru === key("привет"))
    // a SPARSE Latin fragment must not become the key either: two
    // different CJK articles that both mention "2024" are not dups
    val a = key("这是第一篇关于经济的文章 2024")
    val b = key("完全不同的第二篇报道 2024")
    assert(a !== b)
    assert(a !== "2024")
    assert(b !== "2024")
  }

  test("piiStats counts every shape independently; clean prose counts zero") {
    val in = "mail bob@x.com or sue@y.org, card 4111 1111 1111 1111, " +
      "call 555-123-4567, host 10.0.0.1, see https://x.com/a and www.y.com/b"
    val r = one(in).select(text.piiStats(col("text")).as("p"))
      .select("p.n_emails", "p.n_urls", "p.n_ips", "p.n_card_like", "p.n_phones")
      .as[(Int, Int, Int, Int, Int)].head()
    // n_phones = 2: the card-grouped digits ALSO match the phone shape —
    // counts are per-pattern independent (unlike redactPii's consuming
    // chain, where the number rule eats the card before the phone rule)
    assert(r === ((2, 2, 1, 1, 2)))
    val clean = one("plain prose, year 2024, nothing sensitive here")
      .select(text.piiStats(col("text")).as("p"))
      .select("p.n_emails", "p.n_urls", "p.n_ips", "p.n_card_like", "p.n_phones")
      .as[(Int, Int, Int, Int, Int)].head()
    assert(clean === ((0, 0, 0, 0, 0)))
  }

  test("tfidfTopTerms ranks rare terms above common ones per doc") {
    val docs = Seq(
      (1L, "apple apple zebra common"),
      (2L, "common banana"),
      (3L, "common cherry cherry")).toDF("doc_id", "text")
    val r = text.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // "common" is in all 3 docs -> lowest idf; doc terms beat it
    assert(r(1L) == Seq("apple", "zebra"))  // tf=2 rare beats tf=1 rare
    assert(r(2L).head == "banana")
    assert(r(3L).head == "cherry")
    // every score is rounded to 1e-6 fixed point and rank <= k
    val all = text.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .as[(Long, String, Double, Int)].collect()
    assert(all.forall { case (_, _, s, rk) =>
      (s * 1000000.0).round / 1000000.0 == s && rk >= 1 && rk <= 2 })
  }

  test("qualityScore stays in [0,1]; empty text scores low, prose higher") {
    val scores = Seq("", "a!!! b@@@ c###",
      "the cat and the dog sat in the house of the king and a mouse is in the hall")
      .toDF("text").select(text.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(scores.forall(q => q >= 0.0 && q <= 1.0))
    assert(scores(2) > scores(1) && scores(2) > scores(0))
  }

  test("langId picks the dominant stopword profile; no evidence -> und") {
    val df = Seq(
      "the cat is of the dog and a house",
      "der hund und die katze ist ein tier",
      "el gato y la casa es un animal",
      "le chat et la maison est un animal dans paris",
      "xyzzy qwerty asdf").toDF("text")
      .select(text.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "de", "es", "fr", "und"))
  }

  test("langIdNgram: 16-language trigram profiles classify held-out text") {
    // held-out sentences (NOT in the langprofiles seed texts), incl. two
    // non-Latin scripts (Cyrillic, Greek); numbers-only text -> und
    val fixtures = Seq(
      ("en", "the government announced that the new policy would be discussed in parliament next week"),
      ("de", "die regierung hat angekündigt, dass die neue politik nächste woche im parlament besprochen wird"),
      ("fr", "le gouvernement a annoncé que la nouvelle politique serait discutée au parlement la semaine prochaine"),
      ("es", "el gobierno anunció que la nueva política sería discutida en el parlamento la próxima semana"),
      ("pt", "o governo anunciou que a nova política seria discutida no parlamento na próxima semana"),
      ("it", "il governo ha annunciato che la nuova politica sarà discussa in parlamento la prossima settimana"),
      ("nl", "de regering heeft aangekondigd dat het nieuwe beleid volgende week in het parlement zal worden besproken"),
      ("sv", "regeringen meddelade att den nya politiken skulle diskuteras i riksdagen nästa vecka"),
      ("pl", "rząd ogłosił, że nowa polityka będzie omawiana w parlamencie w przyszłym tygodniu"),
      ("cs", "vláda oznámila, že nová politika bude projednána v parlamentu příští týden"),
      ("tr", "hükümet yeni politikanın gelecek hafta mecliste görüşüleceğini duyurdu"),
      ("id", "pemerintah mengumumkan bahwa kebijakan baru akan dibahas di parlemen minggu depan"),
      ("ru", "правительство объявило что новая политика будет обсуждаться в парламенте на следующей неделе"),
      ("el", "η κυβέρνηση ανακοίνωσε ότι η νέα πολιτική θα συζητηθεί στο κοινοβούλιο την επόμενη εβδομάδα"),
      ("und", "12345 67890 !!!"))
    val got = fixtures.toDF("want", "text")
      .select(col("want"), text.langIdNgram(col("text")).as("got"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val misses = got.filter { case (w, g) => w != g }
    assert(misses.isEmpty, s"misclassified: ${misses.mkString(", ")}")
  }

  test("langConsistencyNgram: pure doc consistent, code-switch doc flagged") {
    val en = "the government announced that the new policy would be discussed next week and the children are playing in the garden"
    val de = "die regierung hat angekündigt dass die neue politik besprochen wird und die kinder spielen mit ihren freunden im garten"
    val docs = Seq((1L, en + " " + en), (2L, en + " " + de))
      .toDF("doc_id", "text")
    val r = text.langConsistencyNgram(docs, "text", "doc_id",
        window = 20, stride = 20)
      .orderBy(col("doc_id"))
      .collect()
    assert(r(0).getAs[String]("major_lang") == "en")
    assert(r(0).getAs[Double]("consistency") == 1.0)
    assert(r(1).getAs[Long]("n_langs") >= 2)
    assert(r(1).getAs[Double]("consistency") < 1.0)
  }

  test("knLogProb: hand-computed interpolated Kneser-Ney trigram probabilities") {
    // single doc "a b c": every statistic is 1, discount mass flows back
    // entirely -> p3 = (0.25 + 0.75*1*((0.25 + 0.75*1*1)/1))/1 = 1, ln = 0
    val solo = text.knLogProb(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "text", "doc_id").head()
    assert(solo.getAs[Long]("n_trigrams") == 1L)
    assert(solo.getAs[Double]("logprob") == 0.0)

    // two docs "a b c" / "a b d": c(ab·)=2, N1+(ab·)=2, cont(bc)=1,
    // N1+(·b·)=2, N1+(b·)=2, N1+(·c)=1, N1+(··)=2
    // p1 = 1/2; p2 = (0.25 + 1.5*0.5)/2 = 0.5; p3 = (0.25 + 1.5*0.5)/2 = 0.5
    // q = floor(ln(0.5)*1e6) = -693148 -> logprob -0.6931
    val two = text.knLogProb(
      Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text"),
      "text", "doc_id").orderBy(col("doc_id")).collect()
    assert(two.forall(_.getAs[Long]("n_trigrams") == 1L))
    assert(two.forall(_.getAs[Double]("logprob") == -0.6931))

    // docs shorter than 3 tokens emit no row
    val short = text.knLogProb(Seq((1L, "a b")).toDF("doc_id", "text"),
      "text", "doc_id").count()
    assert(short == 0L)

    // independent plain-Scala KN reference on a mixed-count corpus
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d"), (3L, "c a b a b c"))
    def toks(s: String) = s.split(" ").toSeq
    val triOf = docs.map { case (id, s) =>
      id -> toks(s).sliding(3).filter(_.size == 3).map(_.toList).toSeq }
    val c3 = triOf.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = c3.groupBy(k => (k._1(0), k._1(1)))
    val g23 = c3.keys.map(k => (k(1), k(2))).toSeq.distinct
    val g2 = g23.groupBy(_._1)
    val g3c = g23.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nbt = g23.size.toDouble
    def p3(t: List[String]): Double = {
      val c = c3(t).toDouble
      val ctx = c12((t(0), t(1)))
      val cUV = ctx.values.sum.toDouble
      val n1pUV = ctx.size.toDouble
      val cvw = c3.keys.count(k => k(1) == t(1) && k(2) == t(2)).toDouble
      // N1+(·v·) = distinct (u,w) pairs around middle v = every distinct
      // trigram with middle v contributes one
      val nmid = c3.keys.count(k => k(1) == t(1)).toDouble
      val nvdot = g2(t(1)).size.toDouble
      val p1 = g3c(t(2)).toDouble / nbt
      val p2 = (math.max(cvw - 0.75, 0.0) + (0.75 * nvdot) * p1) / nmid
      (math.max(c - 0.75, 0.0) + (0.75 * n1pUV) * p2) / cUV
    }
    val want = triOf.map { case (id, ts) =>
      val byTri = ts.groupBy(identity).view.mapValues(_.size.toLong)
      val q = byTri.map { case (t, tf) =>
        math.floor(tf * math.log(p3(t)) * 1e6).toLong }.sum
      val n = ts.size.toLong
      id -> (n, math.floor(q.toDouble / 1e6 / n * 10000.0 + 0.5) / 10000.0)
    }.toMap
    val got = text.knLogProb(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("logprob"))).toMap
    assert(got == want, s"got $got want $want")

    // gate twin: keep iff logprob >= threshold
    val gated = text.knQualityFilter(docs.toDF("doc_id", "text"),
        "text", "doc_id", minLogProb = want(1L)._2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(gated(1L) == 1)
    assert(gated.values.sum >= 1)
  }

  test("charShingles: count and content; short text -> empty") {
    val r = one("abcdef").select(text.charShingles(col("text"), 4).as("s")).head()
    assert(r.getSeq[String](0) == Seq("abcd", "bcde", "cdef"))
    val short = one("abc").select(text.charShingles(col("text"), 4).as("s")).head()
    assert(short.getSeq[String](0).isEmpty)
  }

  test("cleanText scrubs urls and emails, collapses whitespace") {
    val r = one("see https://ex.com/a?b=1 or www.foo.org  and mail bob@ex.co.uk   now ")
      .select(text.cleanText(col("text"))).head().getString(0)
    assert(r == "see <x> or <x> and mail <x> now")
  }

  test("repetition: hand-computed n-gram masses and fractions") {
    // "a b a b a b": 2-grams = "a b"×3, "b a"×2 → top mass 3·3=9,
    // dup mass 9+6=15; text length 11
    val r = one("a b a b a b").select(
      text.repetitionMasses(col("text"), 2).as("m"),
      text.topNgramCharFraction(col("text"), 2).as("tf"),
      text.dupNgramCharFraction(col("text"), 2).as("df")).head()
    assert(r.getStruct(0).getLong(0) == 9L && r.getStruct(0).getLong(1) == 15L)
    assert(math.abs(r.getDouble(1) - 9.0 / 11.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 15.0 / 11.0) < 1e-12) // overlap re-counts
    // no repetition → dup mass 0
    val c = one("w x y z").select(text.repetitionMasses(col("text"), 2).as("m")).head()
    assert(c.getStruct(0).getLong(1) == 0L)
  }

  test("repetition: line-level metrics on a multiline fixture") {
    val doc = "hello world\nhello world\nunique line"
    val r = one(doc).select(
      text.dupLineFraction(col("text")).as("f"),
      text.dupLineCharFraction(col("text")).as("cf")).head()
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12)  // 1 dup of 3 lines
    assert(math.abs(r.getDouble(1) - 22.0 / 33.0) < 1e-12) // 2·11 of 33 chars
    // single-line and empty docs → 0
    val z = one("just one line").select(text.dupLineFraction(col("text"))).head()
    assert(z.getDouble(0) == 0.0)
    assert(one("").select(text.dupLineFraction(col("text"))).head().getDouble(0) == 0.0)
  }

  test("repetitionFilter keeps prose, drops a one-phrase spam doc") {
    val keep = Seq(
      "the quick brown fox jumps over the lazy dog while the cat naps today",
      "buy now buy now buy now buy now buy now buy now")
      .toDF("text").select(text.repetitionFilter(col("text")).as("k"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keep == Seq(true, false))
  }

  test("fingerprints: md5 flips on any edit; min-shingle survives a distant edit") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again"),
      ("b", "the quick brown fox jumps over the lazy dog again and AGAIN"), // tail edit
      ("c", "completely different content with no shared shingles at all!"))
      .toDF("id", "text")
      .select(col("id"), text.contentFingerprint(col("text")).as("fp"),
        text.minShingleFingerprint(col("text")).as("msf"))
    val rows = df.collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows("a")._1 != rows("b")._1)          // exact fp flips
    assert(rows("a")._2 == rows("b")._2)          // min-shingle robust to tail edit
    assert(rows("a")._2 != rows("c")._2)          // but separates real differences
  }

  test("unigramLogProb: hand-computed fixed-point scores") {
    // corpus: a:2 b:2 c:1, N=5. Contributions quantize per (doc, token):
    //   d1 = floor(2*ln(0.4)*1e6) + floor(ln(0.4)*1e6) = -2748873
    //        -> round(-2.748873 / 3, 4) = -0.9163
    //   d2 = floor(ln(0.4)*1e6) + floor(ln(0.2)*1e6)   = -2525729
    //        -> round(-2.525729 / 2, 4) = -1.2629
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = text.unigramLogProb(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> ((n, p)) }.toMap
    assert(r(1L) == ((3L, -0.9163)))
    assert(r(2L) == ((2L, -1.2629)))
    // rare-token documents score lower: the quality-ranking property
    assert(r(2L)._2 < r(1L)._2)
  }

  test("lmQualityFilter: log-space perplexity gate on the quantized score") {
    // same fixture as unigramLogProb: d1 = -0.9163, d2 = -1.2629; a
    // threshold between them keeps d1 and rejects d2 — and the gate is
    // inclusive on the quantized value (>= at exactly the score keeps)
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = text.lmQualityFilter(df, "text", "doc_id", minLogProb = -1.0)
      .as[(Long, Long, Double, Int)].collect()
      .map { case (id, _, lp, k) => id -> ((lp, k)) }.toMap
    assert(r(1L) == ((-0.9163, 1)) && r(2L) == ((-1.2629, 0)))
    val atBoundary = text.lmQualityFilter(df, "text", "doc_id", -0.9163)
      .where(col("doc_id") === 1).select("keep").as[Int].head()
    assert(atBoundary == 1, "gate is inclusive at the threshold")
  }

  test("lexicalDiversity: hand-computed TTR; empty doc absent") {
    val df = Seq((1L, "a b a b"), (2L, "x y z"), (3L, "a a a a"), (4L, ""))
      .toDF("doc_id", "text")
    val r = text.lexicalDiversity(df, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, t, ttr) => id -> ((n, t, ttr)) }.toMap
    assert(r(1L) == ((4L, 2L, 0.5)))
    assert(r(2L) == ((3L, 3L, 1.0)))
    assert(r(3L) == ((4L, 1L, 0.25)))
    assert(!r.contains(4L))
  }

  test("charEntropy: hand-computed nats; uniform string is 0; empty doc absent") {
    // "aab": qa = floor(2·ln2·1e6) = 1386294; H = -(1.386294 - 3·ln3)/3 -> 0.6365
    // "aaaa": single symbol -> 0.0 exactly (qa/1e6 ~ n·ln n)
    val df = Seq((1L, "aab"), (2L, "aaaa"), (3L, "")).toDF("doc_id", "text")
    val r = text.charEntropy(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, h) => id -> ((n, h)) }.toMap
    assert(r(1L) == ((3L, 0.6365)))
    assert(r(2L) == ((4L, 0.0)))
    assert(!r.contains(3L))
    // spam scores far below prose; base64-ish far above? no — higher
    // alphabet usage raises entropy: ordering pins the signal direction
    val sig = text.charEntropy(Seq(
        (10L, "the quick brown fox jumps over the lazy dog"),
        (11L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")).toDF("doc_id", "text"),
      "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(sig(10L) > 2.5 && sig(11L) < 0.1)
  }

  test("linearGate: hashed-feature dot product vs a driver-side twin; empty doc = bias") {
    val w = Seq(0.5, -0.25)
    val wq = text.linearWeightsFixed(w)
    assert(wq == Seq(500000L, -250000L))
    def contrib(t: String) =
      wq((graft.functions.hashing.h32Of(t) % 2).toInt)
    val toks = Seq("alpha", "beta", "alpha")
    val expScore = math.floor((toks.map(contrib).sum / 1.0e6 + 0.1)
      * 10000.0 + 0.5) / 10000.0
    val df = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("doc_id", "text")
    val r = text.linearGate(df, "text", "doc_id", w, bias = 0.1, tau = 0.0)
      .as[(Long, Long, Double, Int)].collect()
      .map { case (id, n, s, k) => id -> ((n, s, k)) }.toMap
    assert(r(1L) == ((3L, expScore, if (expScore >= 0.0) 1 else 0)))
    assert(r(2L) == ((0L, 0.1, 1)), "empty doc scores exactly the bias")
    // weights quantized from their own fixed-point form round-trip exactly
    assert(text.linearWeightsFixed(wq.map(_ / 1.0e6)) == wq)
  }

  test("dsirWeights: hand-computed importance weights against a target corpus") {
    // raw d1 "a a b", d2 "b c"; target "a a a b"
    // vocab_r: a:2 b:2 c:1 (N_r=5); vocab_t: a:3 b:1 (N_t=4); V=3
    // lr(a)=ln(4/7)-ln(3/8)=0.4212135; lr(b)=ln(2/7)-ln(3/8)=-0.2719337
    // lr(c)=ln(1/7)-ln(2/8)=-0.5596158
    // d1: floor(2*lr(a)*1e6)+floor(lr(b)*1e6) = 842426-271934 = 570492 -> 0.5705
    // d2: -271934-559616 = -831550 -> -0.8315
    val raw = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val target = Seq((10L, "a a a b")).toDF("doc_id", "text")
    val r = text.dsirWeights(raw, target, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
    assert(r(1L) == ((3L, 0.5705)))
    assert(r(2L) == ((2L, -0.8315)))
    // the target-profile-matching doc outranks the off-profile one
    assert(r(1L)._2 > r(2L)._2)
  }

  test("bigramLogProb: word ORDER matters; hand-computed conditionals") {
    // corpus bigrams: d1 "a b a b" -> (a,b) x2, (b,a) x1; d2 "a b" -> (a,b)
    // c(a,b)=3 c(b,a)=1; predecessors: c(a,.)=3, c(b,.)=1... wait c(b,.)=1
    // d2 score: ln(c(a,b)/c(a,.)) = ln(3/3) = 0.0
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val r = text.bigramLogProb(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> ((n, p)) }.toMap
    assert(!r.contains(3L))                       // < 2 tokens: no bigrams
    assert(r(2L) == ((1L, 0.0)))                  // the corpus's dominant order
    // d1: 2*ln(3/3) + 1*ln(1/1) = 0 -> also 0; reorder the corpus so order is rare
    val df2 = Seq((1L, "a b"), (2L, "b a"), (3L, "a b"), (4L, "a b")).toDF("doc_id", "text")
    val r2 = text.bigramLogProb(df2, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> p }.toMap
    // (a,b): 3 of 3 'a'-starts -> 0.0; (b,a): 1 of 1 'b'-starts -> 0.0... both MLE-1
    // use a corpus where the same predecessor splits: a->b twice, a->c once
    val df3 = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val r3 = text.bigramLogProb(df3, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> p }.toMap
    // ln(2/3) = -0.405465...: floor(-405466)/1e6 -> -0.4055 (4dp half-up)
    assert(r3(1L) == -0.4055 && r3(2L) == -0.4055)
    // ln(1/3) = -1.098612...: floor(-1098613)/1e6 -> -1.0986
    assert(r3(3L) == -1.0986)
    assert(r3(3L) < r3(1L))                       // rare ORDER scores lower
    assert(r2.values.forall(_ == 0.0))
  }

  test("tokenShift + corpusDivergence equal a driver-side twin on a toy fixture") {
    // a: x:2 y:1 (na=3); b: x:1 z:1 (nb=2); union vocab v=3
    val a = Seq("x x y").toDF("text")
    val b = Seq("x z").toDF("text")
    val (na, nb, v) = (3L, 2L, 3L)
    val ca = Map("x" -> 2L, "y" -> 1L, "z" -> 0L)
    val cb = Map("x" -> 1L, "y" -> 0L, "z" -> 1L)
    def pa(t: String) = (ca(t) + 1).toDouble / (na + v)
    def pb(t: String) = (cb(t) + 1).toDouble / (nb + v)
    def q6(x: Double) = math.floor(x * 1.0e6 + 0.5) / 1.0e6
    val wantShift = Seq("x", "y", "z")
      .map(t => t -> q6(math.log(pa(t) / pb(t)))).toMap

    val gotShift = text.tokenShift(a, b, "text", k = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    // ranked by |shift| desc: z (|-0.875|) > y (0.511) > x (0.223)
    assert(gotShift.map(_._1) == Seq("z", "y", "x"))
    gotShift.foreach { case (t, nA, nB, s) =>
      assert(nA == ca(t) && nB == cb(t))
      assert(s == wantShift(t), s"$t: $s != ${wantShift(t)}")
    }

    def fx(x: Double) = math.floor(x * 1.0e12).toLong
    val toks = Seq("x", "y", "z")
    val sab = toks.map(t => fx(pa(t) * math.log(pa(t) / pb(t)))).sum
    val sba = toks.map(t => fx(pb(t) * math.log(pb(t) / pa(t)))).sum
    val sja = toks.map(t => fx(pa(t) * math.log(pa(t) / ((pa(t) + pb(t)) / 2.0)))).sum
    val sjb = toks.map(t => fx(pb(t) * math.log(pb(t) / ((pa(t) + pb(t)) / 2.0)))).sum
    val want = (na, nb, v, q6(sab.toDouble / 1.0e12), q6(sba.toDouble / 1.0e12),
      q6((sja + sjb).toDouble / 2.0 / 1.0e12))
    val got = text.corpusDivergence(a, b, "text")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(got == want, s"$got != $want")
    // KL asymmetric and positive on genuinely different corpora; JS bounded
    assert(got._4 > 0 && got._5 > 0 && got._6 > 0 && got._6 <= math.log(2.0))
  }

  test("gopherQuality gates each rule independently on hand-built docs") {
    val docs = Seq(
      // passes every gate: 6 words >= minWords=5, mean len in [3,10],
      // all alpha, no symbols, 2 distinct required stopwords
      (1L, "the cat sat with the dog"),
      (2L, "one two"),                            // too few words
      (3L, "the numbers eleven 111 222 333"),     // alpha_frac 3/6 = 0.5 < 0.8
      (4L, "the ## cat ## sat with dog"),         // 4 '#' / 7 words > 0.1
      (5L, "aa bb cc dd ee ff"),                  // zero required stopwords
      (6L, "the supercalifragilistic words with extreme elongation here"),
      (7L, ""))                                   // empty: every count 0
      .toDF("doc_id", "text")
    val r = text.gopherQuality(docs, "text", "doc_id", minWords = 5)
      .as[(Long, Long, Double, Double, Double, Long, Int)]
      .collect().map(t => t._1 -> t).toMap

    assert(r(1L) == ((1L, 6L, 3.1667, 1.0, 0.0, 2L, 1)))
    assert(r(2L)._7 == 0 && r(2L)._2 == 2L)       // word-count gate
    assert(r(3L)._7 == 0 && r(3L)._4 == 0.5)      // alpha-fraction gate
    assert(r(4L)._7 == 0 && r(4L)._5 == 0.5714)   // symbol-ratio gate
    assert(r(5L)._7 == 0 && r(5L)._6 == 0L)       // stopword gate
    // mean word length (3+20+5+4+7+10+4)/7 = 53/7 = 7.5714 in [3,10]: passes
    assert(r(6L) == ((6L, 7L, 7.5714, 1.0, 0.0, 2L, 1)))
    assert(r(7L) == ((7L, 0L, 0.0, 0.0, 0.0, 0L, 0)))
    // the flag NEVER drops rows — audit-then-drop contract
    assert(r.size == 7)
  }

  test("blocklistHits: word boundaries, phrases, overlaps, case, gate") {
    val docs = Seq(
      (1L, "the slow classic slowly turns"),  // 1: only the exact token
      (2L, "Big Query beats big query"),      // 2 bigram hits, case-folded
      (3L, "a b a b a"),                      // overlapping bigrams "a b": 2
      (4L, "merge batch part merge batch"),   // trigram 1 + trailing partial 0
      (5L, "slow slow slow"),                 // occurrences, not distinct: 3
      (6L, ""),                               // empty text: 0
      (7L, "nothing here"))                   // clean survivor
      .toDF("doc_id", "text")
    val terms = Seq("slow", "a b", "Big  Query", "merge batch part")
    val hits = docs.select(col("doc_id"),
        text.blocklistHits(col("text"), terms).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 3L,
      6L -> 0L, 7L -> 0L), hits.toString)
    // "classic"/"slowly" not hit by "slow": boundary semantics, the
    // reason a substring contains() is the wrong tool for this gate
    val kept = text.blocklistClean(docs, "text", terms)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(6L, 7L))
  }

  test("c4LineClean: terminal punct, min words, lorem/javascript/brace lines dropped") {
    val docs = Seq(
      (1L, "This line survives the cleanup fine.\nno punct here at all\n" +
        "Too short.\nHe said \"hello there my friend\"\n" +
        "This has lorem ipsum filler inside.\n" +
        "Enable JavaScript to view this page.\n" +
        "function f() { return 1; } is code.\n" +
        "A very last good line stands here!"),
      (2L, "every line fails\nno terminal punct"),
      (3L, ""))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        text.c4LineClean(col("text"), minWords = 4).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) ==
      "This line survives the cleanup fine.\n" +
      "He said \"hello there my friend\"\n" +
      "A very last good line stands here!", out(1L))
    assert(out(2L) == "" && out(3L) == "")
  }

  test("lineStats: bullets, ellipses, terminal fractions; empty doc all zero") {
    val docs = Seq(
      (1L, "- first bullet\n* second bullet\nplain line\nended properly.\nwait for it...\n  \n"),
      (2L, ""))
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"), text.lineStats(col("text")).as("ls"))
      .select(col("doc_id"), col("ls.n_lines"), col("ls.frac_bullet"),
        col("ls.frac_ellipsis"), col("ls.frac_terminal"))
      .as[(Long, Long, Double, Double, Double)].collect().map(t => t._1 -> t).toMap
    // 5 non-empty lines: 2 bullets, 1 ellipsis, 2 terminal ('.' and '...')
    assert(r(1L) == ((1L, 5L, 0.4, 0.2, 0.4)), r(1L).toString)
    assert(r(2L) == ((2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("readability: hand-counted Flesch signals; degenerate docs yield null score") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran away! Did it?"),  // 9 words, 3 sentences
      (2L, "no terminal punctuation here"),            // no sentence mark
      (3L, ""),                                        // empty
      (4L, "xyz.")                                     // 1 word, 0 vowel groups
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"), text.readability(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.n_sentences"),
        col("r.n_syllables"), col("r.flesch"))
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    // doc 1: words=9, sentences=3, vowel groups: e,a,a,e,o,a,a,a,i,i = 10
    assert(r(1L)._2 == 9L && r(1L)._3 == 3L && r(1L)._4 == 10L, r(1L).toString)
    val expected = 206.835 - 1.015 * 9.0 / 3.0 - 84.6 * 10.0 / 9.0
    assert(math.abs(r(1L)._5.get - math.floor(expected * 1e4 + 0.5) / 1e4) < 1e-9)
    assert(r(2L)._5.isEmpty && r(3L)._5.isEmpty, "no sentences/words -> null")
    // 'y' counts as a vowel-group char: "xyz." has one group ('y')
    assert(r(4L)._4 == 1L && r(4L)._5.isDefined)
  }

  test("encodingQuality: counts replacement/control/mojibake chars; null text is clean") {
    val docs = Seq(
      (1L, Some("clean ascii text")),
      (2L, Some("bad � bytes � here")),
      (3L, Some("ctrl and bells")), // \t \n \r are NOT control hits
      (4L, Some("tab\tnl\nok\r fine")),
      (5L, Some("double-encoded: caf\u00C3\u00A9 and \u00E2\u20AC\u0153quoted\u00E2\u20AC")),
      (6L, None)
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"), text.encodingQuality(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_repl"), col("q.n_ctrl"), col("q.n_moji"),
        col("q.enc_clean"))
      .as[(Long, Long, Long, Long, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 0L, 0L, 0L, true)))
    assert(r(2L) == ((2L, 2L, 0L, 0L, false)))
    assert(r(3L) == ((3L, 0L, 2L, 0L, false)))
    assert(r(4L) == ((4L, 0L, 0L, 0L, true)), "tab/newline/cr are legitimate")
    // '\u00C3' once + '\u00E2\u20AC' twice = 3 mojibake markers
    assert(r(5L) == ((5L, 0L, 0L, 3L, false)))
    assert(r(6L) == ((6L, 0L, 0L, 0L, true)), "null text: nothing proven dirty")
    // a loosened marker budget admits light mojibake
    val loose = docs.where(col("doc_id") === 5L)
      .select(text.encodingQuality(col("text"), maxMoji = 3).getField("enc_clean"))
      .as[Boolean].head()
    assert(loose)
  }

  test("oovStats: membership against the head vocabulary, exact bp") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, ""))
      .toDF("doc_id", "text")
    // topN = 1 -> vocabulary is just "a" (tf 3)
    val got = text.oovStats(docs, "text", "doc_id", topN = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 3 has no tokens -> no row (no denominator)
    assert(got == Seq((1L, 3L, 1L, 3333L), (2L, 2L, 1L, 5000L)),
      got.toString)
  }

  test("featureHash: repeats pile into one bucket with a consistent sign") {
    val docs = Seq((1L, "x x x"), (2L, "x")).toDF("doc_id", "text")
    val got = text.featureHash(docs, "text", "doc_id", nBuckets = 16)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got.length == 2, "one token -> one bucket per doc")
    val (r1, r2) = (got(0), got(1))
    assert(r1._2 == r2._2, "same token, same bucket across docs")
    assert(math.abs(r1._3) == 3L && math.abs(r2._3) == 1L)
    assert(r1._3.sign == r2._3.sign, "sign is a token property")
  }

  test("featureHash: zero-sum buckets vanish; totals bound by token count") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = text.featureHash(docs, "text", "doc_id", nBuckets = 4)
    val sumAbs = got.agg(sum(abs(col("v")))).head().getLong(0)
    assert(sumAbs <= 8L, "collision cancellation can only shrink mass")
    assert(got.where(col("v") === 0L).count() == 0L)
  }

  test("vocabGrowth: first occurrences bucket correctly, curves accumulate") {
    // ids 0..3 into 2 buckets: {0,1} -> bucket 0, {2,3} -> bucket 1.
    // bucket 0 sees types {a,b}; bucket 1 re-sees a,b and adds {c}.
    val docs = Seq((0L, "a b"), (1L, "a"), (2L, "b c"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = text.vocabGrowth(docs, "text", "doc_id", buckets = 2)
      .orderBy("bucket").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 3L, 2L), (1L, 4L, 1L, 7L, 3L)))
    // a type whose docs all land in one slice is new exactly once
    val tot = got.map(_._3).sum
    assert(tot == 3L, "every distinct type is counted new exactly once")
  }

  test("termDispersion: hand DP values; absent source contributes in closed form") {
    // s1 = "a a b c", s2 = "b b b a": T_s1 = T_s2 = 4, T = 8
    // DP(a) = 1/2(|2/3 - 1/2| + |1/3 - 1/2|) = 1/6 -> 166666 ppm
    // DP(b) = 1/2(|1/4 - 1/2| + |3/4 - 1/2|) = 1/4 -> 250000 ppm
    // DP(c): only in s1 -> 1/2(|1 - 1/2| + |0 - 1/2|) = 1/2 -> 500000
    val docs = Seq(("s1", "a a b c"), ("s2", "b b b a"))
      .toDF("source", "text")
    val got = text.termDispersion(docs, "text", "source", minTf = 1L,
        topK = 10)
      .orderBy("word").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 2L, 166666L),
      ("b", 4L, 2L, 250000L),
      ("c", 1L, 1L, 500000L)), got.toString)
    // a term spread exactly like the corpus disperses to 0
    val unif = Seq(("s1", "x y"), ("s2", "x y")).toDF("source", "text")
    assert(text.termDispersion(unif, "text", "source", minTf = 1L,
      topK = 10).collect().forall(_.getLong(3) == 0L))
  }

  test("zipfSlope: exact OLS on hand tfs; perfect power law hits -1; guard") {
    // tfs 4,2,1 -> ranks 1,2,3; mirror the op's q4-floored ln terms
    val docs = Seq("a a b", "a a b c").toDF("text")
    def q4ln(v: Long) = math.floor(math.log(v.toDouble) * 1e4).toLong
    val xs = Seq(1L, 2L, 3L).map(q4ln)
    val ys = Seq(4L, 2L, 1L).map(q4ln)
    val n = 3L
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val got = text.zipfSlope(docs, "text", topK = 10).head()
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == n * sxy - sx * sy)
    assert(got.getLong(2) == n * sxx - sx * sx)
    // tf_r = 6/r is an exact Zipf law with slope -1: tfs 6,3,2 at
    // ranks 1,2,3 -> ln tf = ln 6 - ln r exactly, so the q4 OLS lands
    // within one q4 ulp of -1
    val z = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val zd = Seq(z.mkString(" ")).toDF("text")
    val s6 = text.zipfSlope(zd, "text", topK = 10).head().getDouble(3)
    assert(math.abs(s6 + 1.0) < 1e-3, s"expected ~-1, got $s6")
    // topK outside [2, 10000] is rejected before any plan builds
    intercept[IllegalArgumentException] {
      text.zipfSlope(docs, "text", topK = 1)
    }
  }

  test("vocabCoverage: hand counts; Good-Turing mass; Chao1 correction") {
    // tokens: a a a b b c d  -> tfs {a:3, b:2, c:1, d:1}
    // N=7 V=4 N1=2 N2=1 -> P0 = 2/7, chao1 = 4 + 2*1/(2*2) = 4.5
    val docs = Seq("a a a b b", "c d").toDF("text")
    val r = text.vocabCoverage(docs, "text").head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == math.floor(2.0 / 7.0 * 1e6 + 0.5) / 1e6)
    assert(r.getLong(5) == 2L && r.getLong(6) == 4L)
    assert(r.getDouble(7) == 4.5)
    // no dis legomena: bias-corrected form stays finite (den = 2)
    val h = text.vocabCoverage(Seq("x y").toDF("text"), "text").head()
    assert(h.getLong(3) == 0L && h.getLong(6) == 2L)
    assert(h.getDouble(7) == 2.0 + 2.0 * 1.0 / 2.0) // V=2 + N1(N1-1)/2
    // saturated corpus: no hapaxes -> unseen mass 0, chao1 = V
    val s = text.vocabCoverage(Seq("p p q q").toDF("text"), "text").head()
    assert(s.getDouble(4) == 0.0 && s.getDouble(7) == s.getLong(1).toDouble)
  }

  test("watermarkDetect: hand greens; planted chain flags; short docs null") {
    import graft.functions.hashing
    // driver twin of the op's green rule
    def green(prev: String, cur: String): Boolean =
      hashing.h32Of(s"$prev $cur/wm/graft") % 100 < 25
    val docs = Seq((1L, "alpha beta gamma"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val r = text.watermarkDetect(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val g1 = Seq(("alpha", "beta"), ("beta", "gamma"))
      .count { case (p, c) => green(p, c) }
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == g1.toLong)
    // < 2 tokens: zero scored bigrams, null rate/z, not flagged
    assert(r(1).getLong(1) == 0L && r(1).isNullAt(3) && r(1).isNullAt(4))
    assert(r(1).getLong(5) == 0L && r(2).getLong(1) == 0L)
    // plant a watermark: greedily walk an all-green bigram chain — the
    // detector must see 49/49 green (z = 36.75/sqrt(9.1875) ~ 12 >= 4)
    val vocab = (0 until 200).map(i => s"w$i")
    var cur = "w0"
    val sb = new StringBuilder(cur)
    (0 until 49).foreach { _ =>
      val nxt = vocab.find(v => green(cur, v)).get
      sb.append(' ').append(nxt); cur = nxt
    }
    val pr = text.watermarkDetect(
      Seq((9L, sb.toString)).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(pr.getLong(1) == 49L && pr.getLong(2) == 49L)
    assert(pr.getLong(5) == 1L)
    // unwatermarked natural-ish text does NOT flag at z >= 4
    assert(r(0).getLong(5) == 0L)
    intercept[IllegalArgumentException] {
      text.watermarkDetect(docs, "text", "doc_id", gammaPct = 0)
    }
  }

  test("scriptProfile: per-class counts, look-alike mixing, lex tie, none") {
    val df = Seq(
      (1L, "hello world"),                 // pure latin
      (2L, "pаypаl"),            // latin 4 + cyrillic а ×2
      (3L, "你好 world"),          // cjk 2 + latin 5
      (4L, "ab аб"),             // 2-2 tie -> cyrillic < latin
      (5L, "123 456")                      // digits only -> none
    ).toDF("doc_id", "text")
    val r = text.scriptProfile(df, "text", "doc_id").orderBy("doc_id")
      .select("doc_id", "n_latin", "n_cyrillic", "n_cjk", "n_digit",
        "n_space", "dominant", "dom_ppm")
      .collect()
    assert(r(0).getLong(1) == 10L && r(0).getLong(5) == 1L)
    assert(r(0).getString(6) == "latin" && r(0).getLong(7) == 1000000L)
    // the paypal look-alike: dominant latin at 4/6 of script chars
    assert(r(1).getLong(1) == 4L && r(1).getLong(2) == 2L)
    assert(r(1).getString(6) == "latin" && r(1).getLong(7) == 666666L)
    assert(r(2).getLong(3) == 2L && r(2).getString(6) == "latin")
    // exact tie breaks to the lexicographically first script name
    assert(r(3).getLong(1) == 2L && r(3).getLong(2) == 2L)
    assert(r(3).getString(6) == "cyrillic" && r(3).getLong(7) == 500000L)
    assert(r(4).getString(6) == "none" && r(4).isNullAt(7))
    assert(r(4).getLong(4) == 6L)
  }
}
