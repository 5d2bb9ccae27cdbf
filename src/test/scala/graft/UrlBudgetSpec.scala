package graft

import org.apache.spark.sql.functions._

import graft.ops.{dedup, sample, text}

/** URL canonicalization / URL-level dedup, the token-budget mixture
  * planner, and the LSH band tuner — the round-8 crawl-pipeline
  * additions. */
class UrlBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(text.normalizeUrl(col("u")).as("n"))
      .head().getString(0)

  test("normalizeUrl lowercases scheme+host, keeps path case") {
    assert(norm("HTTPS://WWW.Example.COM/Wiki/Page") ===
      "https://example.com/Wiki/Page")
  }

  test("normalizeUrl strips fragment, default ports, trailing slashes") {
    assert(norm("https://a.com:443/x/#sec") === "https://a.com/x")
    assert(norm("http://a.com:80/") === "http://a.com")
    assert(norm("https://a.com:8443/x///") === "https://a.com:8443/x")
    // only the scheme's OWN default port is a default: http://h:443 and
    // https://h:80 are genuinely different endpoints and stay distinct
    assert(norm("http://a.com:443/x") === "http://a.com:443/x")
    assert(norm("https://a.com:80/x") === "https://a.com:80/x")
  }

  test("normalizeUrl drops tracking params, keeps real ones in order") {
    assert(norm("https://a.com/p?utm_source=x&page=2&gclid=1&b=1") ===
      "https://a.com/p?page=2&b=1")
    // tracking-only query collapses entirely (no dangling '?')
    assert(norm("https://a.com/p?utm_medium=email") === "https://a.com/p")
    // a page param whose VALUE mentions utm is not a tracking key
    assert(norm("https://a.com/p?q=utm_source") === "https://a.com/p?q=utm_source")
  }

  test("normalizeUrl is idempotent") {
    val raws = Seq(
      "HTTPS://WWW.A.com:443/X/?utm_source=s&k=v#f",
      "http://b.org/path", "https://c.net/?fbclid=z")
    raws.foreach { r => assert(norm(norm(r)) === norm(r)) }
  }

  test("urlDedup merges re-crawl variants under one canonical key") {
    val df = Seq(
      (1L, "https://a.com/p?utm_source=feed"),
      (2L, "HTTPS://WWW.A.com/p"),
      (3L, "https://a.com:443/p/#top"),
      (4L, "https://a.com/p?page=2"),
      (5L, "https://b.com/q")).toDF("id", "url")
    val out = dedup.urlDedup(df, "url", "id").orderBy("norm_url")
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(
      ("https://a.com/p", 3L, 3L, 1L),
      ("https://a.com/p?page=2", 1L, 1L, 4L),
      ("https://b.com/q", 1L, 1L, 5L)))
  }

  test("planTokenBudget: targets, rates, epochs; unlisted source plans to zero") {
    val df = Seq.tabulate(60) { i =>
      (i.toLong, if (i < 20) "a" else if (i < 40) "b" else "c", "w x y z")
    }.toDF("id", "source", "text")
    val plan = sample.planTokenBudget(df, "source",
        text.tokenCount(col("text")), Map("a" -> 0.75, "b" -> 0.25), 400L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Long)].collect()
    // each source holds 20 docs x 4 tokens = 80 tokens
    assert(plan === Array(
      ("a", 20L, 80L, 300L, 3.75, 4L),   // upsample: ~4 epochs
      ("b", 20L, 80L, 100L, 1.25, 2L),   // slight upsample
      ("c", 20L, 80L, 0L, 0.0, 0L)))     // unlisted -> excluded
    // a weighted source with ZERO available tokens plans NULL rate and
    // epochs (not Infinity / Long.MaxValue) — visible, not garbage
    val empty = Seq((1L, "a", ""), (2L, "b", "w x")).toDF("id", "source", "text")
    val row = sample.planTokenBudget(empty, "source",
        text.tokenCount(col("text")), Map("a" -> 0.5, "b" -> 0.5), 100L)
      .where(col("source") === "a").head()
    assert(row.getLong(3) === 50L)        // target still stated
    assert(row.isNullAt(4) && row.isNullAt(5))
    // a weighted source ABSENT from the corpus (typo'd name) must
    // surface as a zero-supply row, not silently lose its budget share
    val ghost = sample.planTokenBudget(df, "source",
        text.tokenCount(col("text")), Map("a" -> 0.5, "nope" -> 0.5), 100L)
      .where(col("source") === "nope").head()
    assert(ghost.getLong(1) === 0L && ghost.getLong(2) === 0L)
    assert(ghost.getLong(3) === 50L && ghost.isNullAt(4))
  }

  test("lshCollisionProb is the MMDS S-curve and is monotone in s") {
    val p = dedup.lshCollisionProb(0.8, 8, 2)
    assert(math.abs(p - (1.0 - math.pow(1.0 - 0.64, 8))) < 1e-12)
    val grid = (0 to 20).map(_ / 20.0).map(dedup.lshCollisionProb(_, 8, 2))
    assert(grid === grid.sorted)
    assert(dedup.lshCollisionProb(0.0, 8, 2) === 0.0)
    assert(dedup.lshCollisionProb(1.0, 8, 2) === 1.0)
  }

  test("lshTune picks the divisor pair whose 50% point is nearest the threshold") {
    val (b, r) = dedup.lshTune(16, 0.5)
    assert(b * r === 16)
    // exhaustive check: no other divisor pair is strictly closer
    val best = (1 to 16).filter(16 % _ == 0).map { bb =>
      math.abs(math.pow(1.0 / bb, 1.0 / (16 / bb)) - 0.5)
    }.min
    assert(math.abs(math.pow(1.0 / b, 1.0 / r) - 0.5) === best)
    // high threshold wants more rows per band than a low one
    val (_, rHi) = dedup.lshTune(16, 0.9)
    val (_, rLo) = dedup.lshTune(16, 0.2)
    assert(rHi >= rLo)
  }
}
