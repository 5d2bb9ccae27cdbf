package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the text-dedup hot path.
  *
  * The compositional forms (`dedup.wordShingles`, HOF `transform` +
  * `array_min`) are built from Spark higher-order functions, which do not
  * participate in whole-stage codegen — every lambda evaluates
  * interpreted, with a Catalyst array materialized per step. That is fine
  * at 64 elements per row (vector scoring) but dominates wall time at
  * ~300 shingles × k hash members per document. These expressions collapse
  * the whole pipeline into one compiled JVM loop per row — the single
  * place this engine drops below the declarative API, as anticipated in
  * SURVEY.md §7.3 (custom `Expression` only where the benchmark demands).
  *
  * Semantics are bit-identical to the compositional forms (asserted in
  * NativeExprsSpec and by the shared DuckDB oracles):
  *   - tokens: lowercase, split `\s+`, drop empties
  *   - shingles: distinct space-joined word n-grams; empty when < n tokens
  *   - base hash: first 8 md5 hex chars of UTF-8 bytes as unsigned 32-bit
  *   - family j: `((2j+1)·h + 12582917·j) mod 4294967291`
  *
  * `CodegenFallback` here costs one virtual call per row from the
  * surrounding generated code; the loop body itself is regular compiled
  * JVM code (and the md5 digest dominates anyway).
  */
object NativeExprs {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** h32: unsigned 32-bit value of the first 4 md5 bytes (== first 8 hex
    * chars) of the UTF-8 input — same value as
    * `conv(substring(md5(s), 1, 8), 16, 10)`. */
  def h32Bytes(utf8: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(utf8)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** Distinct word n-gram shingles of one document (insertion order). */
  def shingles(text: UTF8String, n: Int): Array[UTF8String] = {
    val toks = text.toLowerCase.toString.split("\\s+", -1).filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    out
  }

  /** k-member MinHash signature straight from the shingle array: one md5
    * per shingle, k affine minima, no intermediate arrays. */
  def minhash(grams: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val len = grams.numElements()
    var i = 0
    while (i < len) {
      val h = h32Bytes(grams.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1) * h + 12582917L * j) % hashing.AffineP
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Column: distinct word n-gram shingles (native). */
  def wordShingles(c: Column, n: Int): Column = column(WordShinglesExpr(expression(c), n))

  /** Column: MinHash signature over a shingle array (native). */
  def minhashSig(grams: Column, k: Int): Column = column(MinHashSigExpr(expression(grams), k))

  /** Column: h32 of a string (native twin of [[hashing.h32]]). */
  def h32(c: Column): Column = column(H32Expr(expression(c)))
}

case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      NativeExprs.shingles(input.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(NativeExprs.minhash(input.asInstanceOf[ArrayData], k))
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class H32Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "h32_native"
  override protected def nullSafeEval(input: Any): Any =
    NativeExprs.h32Bytes(input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(newChild: Expression): H32Expr =
    copy(child = newChild)
}
