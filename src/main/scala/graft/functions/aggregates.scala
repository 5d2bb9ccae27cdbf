package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable aggregates. The sketch family in [[graft.ops.sketch]]
  * is deliberately compositional (DataFrame ops whose state rides plans
  * as ordinary columns); the aggregates here are the cases where a
  * summary's update rule is inherently imperative — a bounded map with
  * data-dependent eviction — and has no sane expression as a fold of
  * built-in aggregates.
  *
  * [[MisraGriesAgg]] is the frequent-items (heavy hitters) summary of
  * Misra & Gries (1982), with the merge rule of Agarwal, Cormode, Huang,
  * Phillips, Wei & Yi, "Mergeable Summaries" (PODS 2012, §3.1): two
  * MG summaries of capacity k merge by summing counters and subtracting
  * the (k+1)-th largest count from every survivor. State is O(capacity)
  * per partial buffer regardless of input size, so at 100 TB the shuffle
  * carries one small map per partition, never the item universe — the
  * exact-groupBy twin (`ops.text.vocabTopN`-style) shuffles the universe
  * and is the verification-scale tool, not the production-scale one.
  *
  * Guarantees (classic MG + mergeability):
  *   - every counter UNDERESTIMATES: est ≤ true count;
  *   - the total undercount is bounded: true − est ≤ N/(capacity+1)
  *     where N is total item count (null items excluded), preserved
  *     across arbitrary merge trees;
  *   - any item with true count > N/(capacity+1) is present in the
  *     summary;
  *   - EXACT REGIME: if no buffer ever evicts (global distinct-item
  *     count ≤ capacity), every count is exact and the output is
  *     independent of partitioning — this is the regime the DuckDB
  *     oracle checks; the bound above is what specs check beyond it.
  */
object aggregates {

  /** Heavy-hitter aggregate Column: array<struct<item,est_count>> sorted
    * by est_count desc, item asc. Non-string items: cast before calling. */
  def heavyHittersAgg(items: Column, capacity: Int): Column =
    column(MisraGriesAgg(expression(items.cast("string")), capacity)
      .toAggregateExpression())

  /** WEIGHTED heavy hitters: each observation carries a long weight
    * (token counts, bytes, spend micros) and the summary tracks total
    * weight per item — the standard weighted MG generalization: an
    * arriving item with no slot subtracts the minimum of (all counters,
    * its own weight) from everything, keeping the undercount bound
    * `true − est ≤ W/(capacity+1)` for TOTAL weight W. Rows with null
    * item, null weight, or weight <= 0 are no observation. */
  def heavyHittersWeightedAgg(items: Column, weight: Column, capacity: Int): Column =
    column(MisraGriesAgg(expression(items.cast("string")), capacity,
        weightChild = Some(expression(weight.cast("long"))))
      .toAggregateExpression())

  /** Permutation-coin replicate fold: per replicate `j < reps`, sums
    * `(Σ coin_j·x, Σ coin_j)` where `coin_j = 1{affine_j(h) mod 1e6 <
    * 500000}` — the [[graft.ops.evals.permTest]] fan-out as ONE
    * aggregate state of `2·reps` longs instead of `reps` materialized
    * rows per input row. Output `array<struct<a,b>>[reps]`, `a = Σ
    * coin·x` (the permuted-A sum), `b = Σ coin` (the permuted-A
    * count). Bit-identical to the explode form: same affine family,
    * same wrap-on-overflow long sums. */
  def permFoldAgg(h: Column, x: Column, reps: Int): Column =
    // children cast to long at the API boundary: update() does
    // asInstanceOf[Long], so an int/double caller would otherwise hit a
    // runtime ClassCastException instead of an analysis-time cast (the
    // casts are no-ops — removed by SimplifyCasts — when already long)
    column(ReplicateFoldAgg(expression(h.cast("long")),
        expression(x.cast("long")),
        expression(org.apache.spark.sql.functions.lit(1L)), reps, Nil)
      .toAggregateExpression())

  /** Poisson-bootstrap replicate fold: per replicate `j < reps`, sums
    * `(Σ w_j·x, Σ w_j·d)` where `w_j = #{k : cdfPpm(k) ≤ affine_j(h)
    * mod 1e6}` — the [[graft.ops.evals.bootstrapCI]] fan-out as one
    * aggregate state. Pass `d = lit(1)` for plain weight sums. */
  def bootFoldAgg(h: Column, x: Column, d: Column, reps: Int,
      cdfPpm: Seq[Long]): Column =
    column(ReplicateFoldAgg(expression(h.cast("long")),
        expression(x.cast("long")), expression(d.cast("long")),
        reps, cdfPpm)
      .toAggregateExpression())
}

/** Replicate-family fold for the deterministic resampling suite
  * (bootstrap / permutation): folds the per-row ×reps affine fan-out
  * `u_j = ((2j+1)·h + 12582917·j) mod P mod 1e6` into a primitive
  * long-array buffer — `a[j] += w_j·x`, `b[j] += w_j·d` — instead of
  * exploding `reps` struct rows per input row into a hash aggregate.
  * At 200 replicates this removes a ×200 row materialization from the
  * scan stage while producing IDENTICAL sums (same affine arithmetic,
  * same Java long wrap semantics as the codegen'd explode form — the
  * sums are associative/commutative, so fold order cannot matter).
  *
  * `poissonCdfPpm` empty → permutation coin (`w = 1{u < 500000}`);
  * non-empty → Poisson weight (`w = #{thresholds ≤ u}`). State is
  * `2·reps` longs per group regardless of input size — mergeable by
  * element-wise addition, so map-side combine ships one small array
  * per task exactly like the explode form's partial aggregate, minus
  * the ×reps row fan-out. */
case class ReplicateFoldAgg(
    hChild: Expression,
    xChild: Expression,
    dChild: Expression,
    reps: Int,
    poissonCdfPpm: Seq[Long],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(reps >= 1 && reps <= 65536,
    s"graft: ReplicateFoldAgg needs 1 <= reps <= 65536, got $reps")
  // the weight loop `while (cdf(k) <= u) k += 1` is a prefix scan —
  // only equivalent to the documented #{k : cdf_k <= u} when the cdf is
  // monotone nondecreasing; fail loudly at construction, not silently
  // undercount at runtime
  require(poissonCdfPpm.isEmpty ||
      poissonCdfPpm.sliding(2).forall(w => w.size < 2 || w(0) <= w(1)),
    "graft: ReplicateFoldAgg poissonCdfPpm must be monotone nondecreasing")

  private val cdf: Array[Long] = poissonCdfPpm.toArray

  override def prettyName: String =
    if (cdf.isEmpty) "perm_fold" else "boot_fold"
  override def nullable: Boolean = false
  override def dataType: DataType = ReplicateFoldAgg.resultType
  override def children: Seq[Expression] = Seq(hChild, xChild, dChild)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReplicateFoldAgg =
    copy(hChild = newChildren(0), xChild = newChildren(1),
      dChild = newChildren(2))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * reps)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hChild.eval(input)
    val xv = xChild.eval(input)
    val dv = dChild.eval(input)
    if (hv != null && xv != null && dv != null) {
      val h = hv.asInstanceOf[Long]
      val x = xv.asInstanceOf[Long]
      val d = dv.asInstanceOf[Long]
      val p = graft.functions.hashing.AffineP
      var j = 0
      while (j < reps) {
        // exactly Spark's pmod(pmod(h·(2j+1) + j·12582917, P), 1e6):
        // Java long wrap on the multiply, then a nonneg remainder
        var r = ((2L * j + 1L) * h + 12582917L * j) % p
        if (r < 0L) r += p
        val u = r % 1000000L
        val w: Long =
          if (cdf.isEmpty) { if (u < 500000L) 1L else 0L }
          else {
            var k = 0
            while (k < cdf.length && cdf(k) <= u) k += 1
            k.toLong
          }
        if (w != 0L) {
          buf(j) += w * x
          buf(reps + j) += w * d
        }
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](reps)
    var j = 0
    while (j < reps) {
      out(j) = InternalRow(buf(j), buf(reps + j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReplicateFoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReplicateFoldAgg =
    copy(inputAggBufferOffset = newOffset)
}

object ReplicateFoldAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
}

case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    weightChild: Option[Expression] = None,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(capacity >= 1, s"graft: MisraGriesAgg capacity must be >= 1, got $capacity")

  override def prettyName: String = "mg_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType
  override def children: Seq[Expression] = child +: weightChild.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0),
      weightChild = if (newChildren.length > 1) Some(newChildren(1)) else None)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w: Long = weightChild match {
        case None => 1L
        case Some(e) =>
          val x = e.eval(input)
          if (x == null) 0L else x.asInstanceOf[Long]
      }
      if (w > 0L) {
        val s = v.asInstanceOf[UTF8String].toString
        val cur = buf.get(s)
        if (cur != null) buf.put(s, cur + w)
        else if (buf.size < capacity) buf.put(s, w)
        else {
          // weighted MG step: no free slot — subtract m = min(all
          // counters, w) from everything including the newcomer, drop
          // zeros, and insert the newcomer's remainder if any (a slot is
          // guaranteed free then, because m was some counter's value).
          // With w=1 this is exactly classic MG's decrement-all.
          // O(capacity), amortized O(1) per unit of weight.
          var m = w
          val vit = buf.values().iterator()
          while (vit.hasNext) { val c = vit.next().longValue; if (c < m) m = c }
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= m) it.remove() else e.setValue(e.getValue - m)
          }
          if (w > m) buf.put(s, w - m)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (buf.size > capacity) {
      // Mergeable-summaries prune: subtract the (capacity+1)-th largest
      // count from all, drop non-positives — at most `capacity` survive
      // and the N/(k+1) error bound telescopes across the merge tree.
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= m) eit.remove() else e.setValue(e.getValue - m)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val arr = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue); i += 1 }
    // deterministic output order: count desc, item asc
    val sorted = arr.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object MisraGriesAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
}
