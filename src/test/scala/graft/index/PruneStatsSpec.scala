package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic tests for the zonemap unsatisfiability decision on MIXED
  * integral-stats vs fractional-literal conjuncts — the tier where
  * converting Long endpoints to double would lose low bits past 2^53 and
  * could claim a row group prunable that the reader evaluates. */
class PruneStatsSpec extends AnyFunSuite {

  private def unsat(op: String, lo: Long, hi: Long, v: Double): Boolean =
    PruneStats.integralVsFractional(op, lo, hi, v)

  test("fractional literal near Long endpoints beyond 2^53 decides exactly") {
    // lo = 2^60, hi = 2^60 + 1: both collapse to the SAME double. The
    // literal 2^60 + 0.5 sits strictly between them — Long arithmetic on
    // floor/ceil must separate what double comparison cannot.
    val lo = 1L << 60
    val hi = (1L << 60) + 1
    val v = Math.pow(2, 60) + 0.5 // rounds to 2^60 as double, but floor/ceil of it are exact
    // x > v is satisfiable only via hi... floor(2^60 + 0.5 as double = 2^60) = 2^60,
    // so x > v ⇔ x ≥ 2^60 + 1 ⇔ hi qualifies: NOT unsat.
    assert(!unsat(">", lo, hi, v))
    // with hi = 2^60 exactly, x > v is unsatisfiable.
    assert(unsat(">", lo, 1L << 60, v))
    // x ≤ v ⇔ x ≤ 2^60: lo qualifies.
    assert(!unsat("<=", lo, hi, v))
    assert(unsat("<=", (1L << 60) + 1, hi, v))
  }

  test("equality against a fractional literal is always unsatisfiable") {
    assert(unsat("=", Long.MinValue, Long.MaxValue, 7.5))
    assert(unsat("=", 0L, 100L, 1e300))            // beyond Long range
    assert(unsat("=", 0L, 100L, -1e300))
    assert(!unsat("=", 0L, 100L, 7.0))             // whole number in range
    assert(unsat("=", 0L, 100L, 101.0))            // whole number outside stats
    assert(!unsat("=", 0L, 100L, Double.NaN))      // conservative on NaN
  }

  test("literals beyond Long range dominate every row group") {
    val big = 1e300
    // x > 1e300 / x ≥ 1e300: no Long qualifies → prunable.
    assert(unsat(">", Long.MinValue, Long.MaxValue, big))
    assert(unsat(">=", Long.MinValue, Long.MaxValue, big))
    // x < 1e300 / x ≤ 1e300: every Long qualifies → never prunable.
    assert(!unsat("<", Long.MinValue, Long.MaxValue, big))
    assert(!unsat("<=", Long.MinValue, Long.MaxValue, big))
    // mirrored for -1e300
    assert(unsat("<", Long.MinValue, Long.MaxValue, -big))
    assert(unsat("<=", Long.MinValue, Long.MaxValue, -big))
    assert(!unsat(">", Long.MinValue, Long.MaxValue, -big))
    assert(!unsat(">=", Long.MinValue, Long.MaxValue, -big))
  }

  test("simple fractional bounds behave like the rewritten integer bound") {
    // x in [10, 20] vs v = 9.5 / 20.5
    assert(!unsat(">", 10, 20, 9.5))
    assert(unsat("<", 10, 20, 9.5))   // x < 9.5 ⇔ x ≤ 9: none
    assert(!unsat("<", 10, 20, 10.5)) // x ≤ 10: lo qualifies
    assert(unsat(">", 10, 20, 20.5))  // x ≥ 21: none
    assert(!unsat("<=", 10, 20, 20.5))
    assert(unsat(">=", 10, 20, 20.5)) // x ≥ 21: none
    assert(!unsat(">=", 10, 20, 19.5))
  }

  test("never prunes on NaN") {
    for (op <- Seq("=", ">", ">=", "<", "<="))
      assert(!unsat(op, 0L, 10L, Double.NaN), op)
  }
}
