package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExprs
import graft.ops.unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(
      s: String, pieces: Seq[(String, Long)], m: Int = 4): Seq[String] =
    Seq(s).toDF("t")
      .select(NativeExprs.unigramSegment(col("t"), pieces, m,
        unigram.UnkScoreQ6).as("p"))
      .as[Seq[String]].head()

  test("unigramSegment: DP picks the max-score path, not greedy") {
    // "ab"+"c" = -3e6 beats "a"+"b"+"c" = -4e6 and greedy can't differ
    // here, so also check a case where greedy-longest LOSES: "abc" as
    // one cheap piece vs an expensive long piece
    val p1 = Seq(("ab", -1000000L), ("a", -1000000L), ("b", -1000000L),
      ("c", -2000000L))
    assert(seg("abc", p1) == Seq("ab", "c"))
    // longest-match would take "abc" (-9e6); DP prefers "ab"+"c" (-3e6)
    val p2 = Seq(("abc", -9000000L), ("ab", -1000000L), ("c", -2000000L))
    assert(seg("abc", p2) == Seq("ab", "c"))
  }

  test("unigramSegment: score ties prefer the longer piece") {
    // "ab" (-2e6) ties "a"+"b" (-2e6) -> the l=2 step wins at cell 2
    val p = Seq(("ab", -2000000L), ("a", -1000000L), ("b", -1000000L))
    assert(seg("ab", p) == Seq("ab"))
  }

  test("unigramSegment: unknown code points fall back to UNK single chars") {
    val p = Seq(("a", -1000000L))
    assert(seg("xa", p) == Seq("x", "a"))
    assert(seg("x y", p) == Seq("x", "y"), "tokenizes per whitespace token")
    assert(seg("", p) == Seq.empty, "empty text segments to nothing")
  }

  test("train: one hand-computed EM round prunes the unused piece") {
    // words: ab x3, b x1. seed freqs: a=3, ab=3, b=4 (total 10).
    // scores q6: a = ab = ln3q6 - ln10q6 = -1203973; b = -916291.
    // Viterbi "ab": piece "ab" (-1203973) beats "a"+"b" (-2120264)
    // -> usage ab=3, b=1; "a" unused -> pruned at minUsage=1.
    // Final total 4: score(ab) = ln3q6 - ln4q6 = -287682,
    // score(b) = 0 - ln4q6 = -1386294.
    val df = Seq("ab ab b", "ab").toDF("text")
    val got = unigram.train(df, "text", seedSize = 10, maxPieceLen = 2,
        rounds = 1, minUsage = 1L, keepTop = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L, -287682L), ("b", 1L, -1386294L)))
  }

  test("train: minUsage prunes; a second round re-segments without the pruned piece") {
    // minUsage=2 drops b (usage 1) after round 1; round 2 segments
    // "b" as UNK (uncounted) and "ab" still wins for "ab"
    val df = Seq("ab ab b", "ab").toDF("text")
    val got = unigram.train(df, "text", seedSize = 10, maxPieceLen = 2,
        rounds = 2, minUsage = 2L, keepTop = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L, 0L)), s"got $got")
  }

  test("train: guards reject out-of-range parameters") {
    val df = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      unigram.train(df, "text", seedSize = unigram.MaxSeedSize + 1)
    }
    intercept[IllegalArgumentException] {
      unigram.train(df, "text", rounds = 0)
    }
  }

  test("fertility: hand counts; pruned piece surfaces as UNK share") {
    val df = Seq("ab ab b", "ab").toDF("text")
    // minUsage=1 keeps {ab:3, b:1}: both words segment to one piece
    val f1 = unigram.fertility(df, "text", seedSize = 10, maxPieceLen = 2,
      rounds = 1, minUsage = 1L).head()
    assert(f1.getLong(0) == 2L && f1.getLong(1) == 4L)
    assert(f1.getLong(2) == 4L && f1.getLong(3) == 10000L
      && f1.getLong(4) == 0L, f1.toString)
    // minUsage=2 prunes b: the lone "b" word segments as one UNK step
    val f2 = unigram.fertility(df, "text", seedSize = 10, maxPieceLen = 2,
      rounds = 1, minUsage = 2L).head()
    assert(f2.getLong(2) == 4L && f2.getLong(4) == 250000L, f2.toString)
  }

  test("encodeTokens: inference twin segments with trained pieces") {
    val pieces = Seq(("ab", -287682L), ("b", -1386294L))
    val out = Seq("ab b zz").toDF("t")
      .select(unigram.encodeTokens(col("t"), pieces, maxPieceLen = 2).as("p"))
      .as[Seq[String]].head()
    assert(out == Seq("ab", "b", "z", "z"))
  }
}
