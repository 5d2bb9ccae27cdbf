package graft

/** The uncast-sum oracle lint, shared between the registry-wide test and
  * its own regression test. DuckDB widens `sum(BIGINT)` to HUGEINT
  * (int128) while Spark emits LONG; values compare equal but the driver's
  * typed hash diverges (the `events_rolling_avg` red row round 5,
  * `vec_score_calibration` round 8). The round-8 recurrence disproved the
  * lint's original premise ("a sum consumed by later arithmetic is
  * fine"): HUGEINT propagates through `*`, `+`, `-` and `//`. The rule is
  * therefore taint-based: an aliased expression anywhere in the SQL is
  * tainted if it contains `sum(` or references a tainted alias, UNLESS
  * the whole expression carries a terminal `::TYPE` cast or its outermost
  * operation is a guaranteed double-producer (`/` true division,
  * `round()`, `avg()`) — those match Spark's double on both engines. Any
  * surfaced output column that ends up tainted must be cast.
  */
object UncastSumLint {
  private val word = "[A-Za-z_][A-Za-z0-9_]*"

  /** (alias, expr) for every `expr AS alias` in the SQL, expr recovered by
    * a backward depth-0 walk to the enclosing comma / paren / SELECT. */
  def aliasedExprs(sql: String): Seq[(String, String)] = {
    val asRe = s"(?i)\\bAS\\s+($word)".r
    asRe.findAllMatchIn(sql).flatMap { m =>
      var i = m.start - 1; var depth = 0; var start = 0; var found = false
      while (i >= 0 && !found) {
        sql.charAt(i) match {
          case ')' => depth += 1
          case '(' =>
            if (depth == 0) { start = i + 1; found = true } else depth -= 1
          case ',' if depth == 0 => start = i + 1; found = true
          case _ =>
        }
        i -= 1
      }
      // Strip through the last DEPTH-0 `select` only: the old greedy
      // `^.*\b(select|distinct)\b` also ate into scalar subqueries in
      // the surfaced expression (`floor((SELECT sum(x) FROM q)...) / c`
      // — those are parenthesized, hence depth > 0), leaving unbalanced
      // parens that broke the depth-0 division check and false-flagged
      // a correctly-double column (rel_benford, round 10). Depth-0
      // selects are genuine clause starts the backward comma/paren walk
      // can cross (a preceding CTE body ends in `)` before `SELECT`).
      val expr = stripToClause(sql.substring(start, m.start))
      if (expr.isEmpty) None else Some(m.group(1).toLowerCase -> expr)
    }.toSeq
  }

  /** Cut everything through the LAST select keyword at paren depth ≤ 0
    * (clause starts the backward walk crossed), leaving subquery selects
    * (depth > 0) intact; then drop a leading `distinct`. */
  private def stripToClause(raw: String): String = {
    val lower = raw.toLowerCase
    var depth = 0; var cut = -1; var i = 0
    def wordAt(j: Int, w: String): Boolean =
      lower.regionMatches(j, w, 0, w.length) &&
        (j == 0 || { val c = lower.charAt(j - 1); !c.isLetterOrDigit && c != '_' }) &&
        (j + w.length >= lower.length || {
          val c = lower.charAt(j + w.length); !c.isLetterOrDigit && c != '_' })
    while (i < lower.length) {
      lower.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 's' if depth <= 0 && wordAt(i, "select") => cut = i + 6
        case _ =>
      }
      i += 1
    }
    (if (cut >= 0) raw.substring(cut) else raw)
      .replaceAll("(?is)^\\s*distinct\\b", "").trim
  }

  /** True when `e` is `round(...)`/`avg(...)` wrapping the WHOLE
    * expression — the open paren's match must be the final char, else
    * `round(a) + sum(b)` would slip through. */
  private def wrappedByDoubleFn(e: String): Boolean = {
    val m = "(?is)^\\s*(round|avg)\\s*\\(".r.findFirstMatchIn(e)
    m.exists { mm =>
      var depth = 1; var i = mm.end
      while (i < e.length && depth > 0) {
        e.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      depth == 0 && e.substring(i).trim.isEmpty
    }
  }

  private def stripStrings(e: String): String =
    e.replaceAll("'[^']*'", " ")

  /** True when a depth-0 true-division makes the WHOLE expression
    * DOUBLE: after stripping string literals (a '/' inside a quoted
    * regex is not an operator), some depth-0 `/` (not `//`) exists and
    * no depth-0 binary `+`/`-` sits beside it — `sum(a) + b/2` keeps
    * the sum out of the division (round-9 advisor counterexample), so
    * "a '/' anywhere" is NOT a safe escape. Unary minus (expression
    * start, or after `(`/`,`/another operator) is not a precedence
    * breaker and is ignored. Conservative by design: a false positive
    * just forces an explicit no-op cast in the oracle. */
  private def outermostDivision(e: String): Boolean = {
    var depth = 0; var div = false; var addSub = false; var i = 0
    while (i < e.length) {
      e.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '/' if depth == 0 =>
          if (i + 1 < e.length && e.charAt(i + 1) == '/') i += 1
          else div = true
        case '+' | '-' if depth == 0 =>
          val prev = e.substring(0, i).trim.lastOption
          if (prev.exists(p => p.isLetterOrDigit || p == ')' || p == '_'))
            addSub = true
        case _ =>
      }
      i += 1
    }
    div && !addSub
  }

  def terminallyTyped(e0: String): Boolean = {
    val e = stripStrings(e0)
    e.matches("(?s).*::\\s*[A-Za-z]+\\s*$") ||            // ::BIGINT cast
    wrappedByDoubleFn(e) ||                               // double-producing
    outermostDivision(e)                                  // true division → DOUBLE
  }

  /** Output columns of `out` transitively carrying an uncast sum(). */
  def flagged(name: String, sql: String, out: Set[String]): Seq[String] = {
    val defs = aliasedExprs(sql)
    var tainted = defs.collect {
      case (a, e) if "(?i)\\bsum\\s*\\(".r.findFirstIn(e).isDefined &&
        !terminallyTyped(e) => a
    }.toSet
    var changed = true
    while (changed) {
      changed = false
      defs.foreach { case (a, e) =>
        if (!tainted(a) && !terminallyTyped(e)) {
          // Strip string literals ('\s+' tokenizes as identifier `s`) and
          // skip qualifier words (`b2.doc_id` references column doc_id,
          // not an alias named b2) before extracting references.
          val cleaned = e.toLowerCase.replaceAll("'[^']*'", " ")
          val refs = s"\\b($word)\\b(?!\\s*\\.)".r.findAllIn(cleaned).toSet
          if (refs.exists(tainted)) { tainted += a; changed = true }
        }
      }
    }
    (out & tainted).toSeq.map(a => s"$name.$a")
  }
}

/** The NULL-aggregate oracle lint: DuckDB `sum()`/`avg()` SKIP NULL
  * terms while the Spark twins of these meters often combine terms with
  * `+`/`reduce` (which PROPAGATE NULL) — the `eval_bleu` round-12
  * regression (its unsmoothed p₁ term must poison the total; the oracle
  * needed a `max(CASE)` pivot + explicit `+`). Similarly DuckDB
  * `list_sum([])` is NULL, so a token-list fold without `coalesce`
  * silently nulls empty documents — the `text_gopher_quality` r11-advice
  * regression. Two textual rules, conservative by design (a false
  * positive forces an explicit whitelist entry with a justification):
  *
  *  A. `sum(`/`avg(` whose ARGUMENT contains `CASE WHEN` with fewer
  *     `ELSE`s than `CASE`s and no `coalesce(` — intended-to-vanish
  *     terms that DuckDB skips but a Spark `+` chain would propagate.
  *     (`max(CASE ...)`/`min(CASE ...)` pivots are the sanctioned fix
  *     and are not flagged.)
  *  B. `list_sum(`/`list_avg(` over a token-list expression (argument
  *     mentions `toks`/`string_split`) not directly wrapped in
  *     `coalesce(` — NULL on the empty document.
  */
object NullAggLint {
  /** Balanced-paren arguments of every standalone `fn(` call (a
    * preceding identifier char means a different function, e.g. `sum(`
    * inside `list_sum(`). */
  def callArgs(sql: String, fn: String): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    val lower = sql.toLowerCase
    val needle = fn + "("
    var at = lower.indexOf(needle)
    while (at >= 0) {
      val okStart = at == 0 || {
        val c = lower.charAt(at - 1); !c.isLetterOrDigit && c != '_'
      }
      if (okStart) {
        var depth = 1
        var i = at + needle.length
        while (i < sql.length && depth > 0) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        if (depth == 0) out += ((at, sql.substring(at + needle.length, i - 1)))
      }
      at = lower.indexOf(needle, at + needle.length)
    }
    out.toSeq
  }

  private def caseWithoutElse(arg: String): Boolean = {
    val a = arg.toLowerCase
    val cases = "\\bcase\\s+when\\b".r.findAllIn(a).size
    val elses = "\\belse\\b".r.findAllIn(a).size
    cases > 0 && elses < cases
  }

  /** True when the call at `at` is directly wrapped in `coalesce(`. */
  private def coalesceWrapped(sql: String, at: Int): Boolean =
    sql.substring(0, at).toLowerCase.replaceAll("\\s+", "").endsWith("coalesce(")

  def flagged(name: String, sql: String): Seq[String] = {
    val a = (callArgs(sql, "sum") ++ callArgs(sql, "avg")).collect {
      case (_, arg) if caseWithoutElse(arg) &&
          !arg.toLowerCase.contains("coalesce(") =>
        s"$name: sum/avg over CASE-without-ELSE (DuckDB skips the NULL " +
          s"term): ${arg.replaceAll("\\s+", " ").take(70)}"
    }
    val b = (callArgs(sql, "list_sum") ++ callArgs(sql, "list_avg")).collect {
      case (at, arg) if {
        val la = arg.toLowerCase
        (la.contains("toks") || la.contains("string_split")) &&
          !coalesceWrapped(sql, at) && !la.contains("coalesce(")
      } =>
        s"$name: un-coalesced list_sum/list_avg over a token list (NULL " +
          s"on the empty document): ${arg.replaceAll("\\s+", " ").take(70)}"
    }
    a ++ b
  }
}

/** Guards the driver contract itself: `entry` must return rows on
  * sf0.001 (the driver's smoke gate) and every registered query needs a
  * runnable plan and a matching oracle key. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; oracle coverage is near-total") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // Every registered query carries an oracle — the BPE trainer (the
    // one former rows-only exception) is unrolled round-by-round in
    // DuckDB since round 6.
    assert((qs -- os).isEmpty, s"queries missing an oracle: ${qs -- os}")
  }

  test("all registered queries build an analyzable plan on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name has an empty schema")
    }
  }

  test("no surfaced uncast SUM in oracle SQL (integer-widening lint)") {
    val dir = "/root/testdata/sf0.001"
    val hits = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val out = SparkEntry.queries(name)(spark, dir).schema.fieldNames
        .map(_.toLowerCase).toSet
      UncastSumLint.flagged(name, sql, out)
    }
    assert(hits.isEmpty,
      s"surfaced column transitively carries an uncast sum(): ${hits.mkString(", ")}")
  }

  test("uncast-sum lint catches the round-8 vec_score_calibration shape") {
    // Regression: the exact pre-fix expression — a sum flowing through
    // `*` and `//` without a terminal cast — must be flagged; the fixed
    // form with the terminal ::BIGINT must pass.
    val pre =
      """SELECT bin,
        |  (sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) * 10000) // count(*) AS rate_bp
        |FROM b GROUP BY bin""".stripMargin
    assert(UncastSumLint.flagged("q", pre, Set("rate_bp")) == Seq("q.rate_bp"))
    val post =
      """SELECT bin,
        |  ((sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT AS rate_bp
        |FROM b GROUP BY bin""".stripMargin
    assert(UncastSumLint.flagged("q", post, Set("rate_bp")).isEmpty)
    // Transitive taint through a CTE alias is caught too.
    val transitive =
      """WITH t AS (SELECT k, sum(v) AS s FROM x GROUP BY k)
        |SELECT k, s * 2 AS doubled FROM t""".stripMargin
    assert(UncastSumLint.flagged("q", transitive, Set("doubled")) == Seq("q.doubled"))
    // round() only clears taint when it wraps the WHOLE expression:
    // `round(x, 4) + sum(y)` must stay flagged.
    val partialRound =
      "SELECT round(x, 4) + sum(y) AS mixed FROM t"
    assert(UncastSumLint.flagged("q", partialRound, Set("mixed")) == Seq("q.mixed"))
    val fullRound =
      "SELECT round(sum(y) * 1.5, 4) AS ok FROM t"
    assert(UncastSumLint.flagged("q", fullRound, Set("ok")).isEmpty)
    // round-9 advisor counterexamples: a '/' that is NOT the outermost
    // operator must not clear taint — in `sum(a) + b/2` only the
    // division subterm is DOUBLE, the sum still widens.
    val sideDivision = "SELECT sum(a) + b/2 AS x FROM t"
    assert(UncastSumLint.flagged("q", sideDivision, Set("x")) == Seq("q.x"))
    // ...and a '/' inside a string literal is not an operator at all.
    val literalSlash = "SELECT sum(regexp_extract(s, 'a/b')::BIGINT) AS y FROM t"
    assert(UncastSumLint.flagged("q", literalSlash, Set("y")) == Seq("q.y"))
    // whole-expression division still clears taint (both engines DOUBLE),
    // including with a unary minus in front.
    val wholeDiv = "SELECT sum(a) / count(*) AS r FROM t"
    assert(UncastSumLint.flagged("q", wholeDiv, Set("r")).isEmpty)
    val unaryDiv = "SELECT -sum(a) / count(*) AS r FROM t"
    assert(UncastSumLint.flagged("q", unaryDiv, Set("r")).isEmpty)
  }

  /** Reviewed exceptions to [[NullAggLint]] — each with the reason the
    * NULL-skip/empty-list behavior is SHARED by the Spark twin (or
    * impossible), so the engines agree. */
  val NullAggWhitelist: Map[String, String] = Map(
    "rel_pivot" -> ("sum(CASE..END) IS the pivot here and Spark's pivot " +
      "sum aggregate skips NULL cells identically — both engines drop " +
      "non-matching rows from each cell's sum"),
    "text_stats" -> ("the list_sum sits inside CASE WHEN len(toks) > 0, " +
      "so the folded list is never empty in the evaluated arm; the ELSE " +
      "arm supplies the empty-document 0.0 the Spark twin computes"))

  test("no NULL-skipping aggregate in oracle SQL (NULL-aggregate lint)") {
    val hits = SparkEntry.oracleSql.toSeq
      .filterNot { case (name, _) => NullAggWhitelist.contains(name) }
      .flatMap { case (name, sql) => NullAggLint.flagged(name, sql) }
    assert(hits.isEmpty,
      s"oracle aggregates a NULL-able term DuckDB would skip: ${hits.mkString("; ")}")
  }

  test("NULL-aggregate lint catches the eval_bleu and gopher pre-fix shapes") {
    // the round-12 eval_bleu trap: a sum over CASE-without-ELSE terms —
    // DuckDB's sum() SKIPS the NULL n=1 term the Spark + chain propagates
    val bleuPre =
      """SELECT doc_id,
        |  sum(CASE WHEN n = 1 AND clip > 0 THEN floor(ln(p) * 1e6) END)::BIGINT AS qsum
        |FROM pn GROUP BY 1""".stripMargin
    assert(NullAggLint.flagged("q", bleuPre).nonEmpty)
    // the sanctioned fix — max(CASE) pivot + explicit NULL-propagating +
    val bleuPost =
      """SELECT doc_id,
        |  max(CASE WHEN n = 1 THEN q END)::BIGINT + max(CASE WHEN n = 2 THEN q END)::BIGINT AS qsum
        |FROM pn GROUP BY 1""".stripMargin
    assert(NullAggLint.flagged("q", bleuPost).isEmpty)
    // a CASE with an ELSE arm has no vanishing term — legit
    val guarded = "SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS n FROM t"
    assert(NullAggLint.flagged("q", guarded).isEmpty)
    // the gopher trap: list_sum over a token list is NULL on the empty
    // document (DuckDB list_sum([]) is NULL) — silent drop downstream
    val gopherPre =
      "SELECT doc_id, list_sum(list_transform(toks, x -> length(x)))::BIGINT AS sum_len FROM t"
    assert(NullAggLint.flagged("q", gopherPre).nonEmpty)
    val gopherPost =
      "SELECT doc_id, coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS sum_len FROM t"
    assert(NullAggLint.flagged("q", gopherPost).isEmpty)
    // vector folds (list_zip over fixed-dim embeddings) are out of scope
    val vecFold =
      "SELECT list_sum(list_transform(list_zip(a, b), x -> x[1]*x[2])) AS dot FROM e"
    assert(NullAggLint.flagged("q", vecFold).isEmpty)
  }

  test("the 40 core baseline queries remain registered under their round-1 names") {
    // core_total (the like-for-like number vs the 51.99 s round-1
    // recording) sums these by NAME — a rename would silently shrink the
    // comparable instead of failing the bench.
    val missing = Bench.CoreBaselineQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"renamed/removed core queries: $missing")
    assert(Bench.CoreBaselineQueries.size == 40)
  }

  test("no registered query surfaces a non-scalar output column (hashability lint)") {
    // The driver's diff harness lexsorts ALL output columns in pandas;
    // an array/map/struct cell throws `unhashable type` before any
    // comparison runs (the round-10 vec_chunk_pool red row). Only
    // scalar columns are externally verifiable — queries that compute
    // collections must flatten (posexplode) before registering.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-scalar output columns (driver cannot hash them): ${offenders.mkString(", ")}")
  }

  test("every Spark output column is named in its oracle SQL (alias-mismatch lint)") {
    // The driver compares columns BY NAME (sorted) — a Spark column the
    // oracle spells differently hash-mismatches even on identical values.
    // This lint catches the miss in `sbt test`, before a driver round:
    // each output column name must appear as a word in the oracle text.
    val dir = "/root/testdata/sf0.001"
    val misses = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val words = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(sql.toLowerCase).toSet
      SparkEntry.queries(name)(spark, dir).schema.fieldNames
        .filterNot(c => words.contains(c.toLowerCase))
        .map(c => s"$name.$c")
    }
    assert(misses.isEmpty,
      s"columns missing from their oracle SQL: ${misses.mkString(", ")}")
  }
}
