package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{hash, lit, pmod}

/** Global (single-partition) windows over PROVABLY BOUNDED row sets.
  *
  * A handful of operators legitimately run a window over ALL rows of an
  * intermediate: the rows are not data-sized but bounded by a driver
  * constant or a quantized domain (|strata|, a 4-dp score grid, `nbins`
  * histogram bins, a k-row sample, the shuffle partition count). A naked
  * `Window.orderBy(...)` is correct there, but it makes Spark log
  * `WindowExec: No Partition Defined ... serious performance degradation`
  * — and once six audited-bounded sites emit that warning in every bench
  * tail, the warning stops being a tripwire for the windows that ARE
  * scale bugs.
  *
  * [[boundedGlobal]] restores the tripwire: it partitions the window by
  * `pmod(hash(anchor, '<bound>'), 1)` — identically 0 on every row, so
  * the semantics are exactly the global window's (one partition holding
  * everything), but the expression references a data column and therefore
  * survives the optimizer (a bare literal key is constant-folded away and
  * the warning returns). The bound label rides inside the hash call, so
  * `.explain` shows WHY the single partition is safe at the exact site
  * that pays it. Any `No Partition Defined` line left in a clean bench
  * tail now signals an UNaudited global window.
  */
private[graft] object windows {

  /** A window partitioned by a constant-0 key anchored on `anchor` — a
    * documented, warning-free global window. Chain `.orderBy(...)` /
    * `.rowsBetween(...)` at the call site as usual.
    *
    * @param bound  names WHY a single partition is safe, e.g. "strata",
    *               "score-grid", "nbins", "k-sample", "parts"; it must
    *               describe a row bound independent of data size.
    * @param anchor any column of the windowed frame (used only to keep
    *               the key from constant-folding; its values are
    *               irrelevant — `pmod(·, 1)` is 0 for every input,
    *               including null, whose hash is the seed).
    */
  def boundedGlobal(bound: String, anchor: Column): WindowSpec =
    Window.partitionBy(pmod(hash(anchor, lit(s"graft.bounded:$bound")), lit(1)))
}
