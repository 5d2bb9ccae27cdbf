package graft

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
    // DuckDB widens sum(BIGINT) to HUGEINT (int128) while Spark emits LONG;
    // values compare equal but the driver's typed hash diverges (the
    // events_rolling_avg red row, round 5). A sum consumed by later
    // arithmetic is fine — the hazard is a sum aliased DIRECTLY to an
    // output column. Require those to carry an explicit cast:
    // `(sum(...) OVER w)::BIGINT AS c` / `sum(...)::BIGINT AS c`.
    val dir = "/root/testdata/sf0.001"
    val sumAliased =
      """(?is)\bsum\s*\((?:[^()]|\([^()]*\))*\)\s*(?:over\s*(?:\w+|\([^()]*\))\s*)?as\s+(\w+)""".r
    val hits = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val out = SparkEntry.queries(name)(spark, dir).schema.fieldNames
        .map(_.toLowerCase).toSet
      sumAliased.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filter(out.contains).map(a => s"$name.$a").toSeq
    }
    assert(hits.isEmpty,
      s"uncast sum() aliased straight to an output column: ${hits.mkString(", ")}")
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
