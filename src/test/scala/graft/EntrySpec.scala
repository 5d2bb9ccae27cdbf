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
    // The iterative BPE trainer is deterministic but not expressible as a
    // single DuckDB statement — it is the ONE sanctioned rows-only query.
    // Anything else missing an oracle is a coverage bug.
    assert((qs -- os) == Set("text_bpe_merges"),
      s"queries missing an oracle: ${qs -- os}")
  }

  test("all registered queries build an analyzable plan on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name has an empty schema")
    }
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
