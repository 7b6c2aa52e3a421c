package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken-style
  * k-gram sketching): every k-codepoint gram gets a rolling polynomial hash,
  * then each sliding window of `w` consecutive gram hashes contributes its
  * minimum — yielding a compact, position-robust sketch whose overlap
  * estimates document similarity. The operator Spark lacks natively; built
  * as a Catalyst `Expression` (with codegen) rather than a UDF so it stays
  * inside the generated stage with no serialization boundary.
  */
object Winnowing {

  /** Core sketch over codepoints. Deterministic, allocation-light, and
    * callable from generated code. Returns distinct window minima in
    * first-seen order.
    *
    * The gram hash is the ENGINE-PORTABLE modular polynomial fold from
    * the sketch-hash family (`HashOps.polyFold`: acc*B + cp mod a 30-bit
    * prime — see `Dedup.scala`, "portable sketch-hash family"), evaluated
    * here as a ROLLING update (subtract the leading codepoint's
    * contribution mod P, shift, append) so the per-document cost stays
    * O(n) not O(n*k). Rolling is an optimization of the same polynomial:
    * hash(i) == polyFold(substring(i, k), B, P) exactly, which is what
    * lets the DuckDB oracle recompute the identical fingerprint from
    * per-position `substr` folds and hash-gate the winnow dedup chain. */
  def sketch(s: UTF8String, k: Int, w: Int): ArrayData = {
    // Decode once: codepoint-indexed grams, matching the oracle's
    // character-based substr (not bytes — multibyte text must agree).
    var cps = new Array[Int](math.max(s.numBytes, 1))
    var n = 0
    val it = s.codePointIterator()
    while (it.hasNext) {
      if (n == cps.length) cps = java.util.Arrays.copyOf(cps, n * 2)
      cps(n) = it.next(); n += 1
    }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    val B = 131L
    val P = 1000000007L // 30-bit prime: every intermediate stays < 2^62
    var topPow = 1L
    var j = 1
    while (j < k) { topPow = topPow * B % P; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      var d = h - cps(i - 1) * topPow % P
      if (d < 0) d += P
      h = (d * B + cps(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](nGrams / w + 1)
    val seen = new scala.collection.mutable.HashSet[Long]
    val lastWin = math.max(nGrams - w, 0)
    var win = 0
    while (win <= lastWin) {
      var m = hashes(win)
      var p = win + 1
      val end = math.min(win + w, nGrams)
      while (p < end) { if (hashes(p) < m) m = hashes(p); p += 1 }
      if (seen.add(m)) out += m
      win += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fingerprint(text, k, w)` as a Catalyst expression: the sketch
  * loop runs via a static call from generated code — no UDF boxing, no
  * encoder round-trip, null-safe. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "winnow_fingerprint requires k >= 2, w >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Winnowing.sketch(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnowing.sketch($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Column-API entry point. */
  def winnowFingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(c), k, w))

  /** SQL registration: `SELECT winnow_fingerprint(text, 8, 4)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprint",
      exprs => exprs match {
        case Seq(e) => WinnowFingerprint(e, 8, 4)
        case Seq(e, kLit, wLit) =>
          def intArg(a: Expression, name: String): Int = {
            if (!a.foldable) throw new IllegalArgumentException(
              s"winnow_fingerprint: $name must be a constant integer, got ${a.sql}")
            a.eval() match {
              case n: Number => n.intValue()
              case other => throw new IllegalArgumentException(
                s"winnow_fingerprint: $name must be a constant integer, got $other")
            }
          }
          WinnowFingerprint(e, intArg(kLit, "k"), intArg(wLit, "w"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprint(text[, k, w])")
      },
      "scala_udf")
}
