package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lowercased character n-grams of a string column in one native pass —
  * for strings of length >= n, bit-identical to the HOF formulation
  * `transform(sequence(1, length(s)-n+1), i -> lower(substring(s, i, n)))`
  * (same UTF8String byte slicing + toLowerCase the builtins use), without
  * the per-element interpreted-lambda walk: the HOF evaluates a boxed
  * lambda and a sequence array per row, which dominates trigram profiling
  * at millions of elements.
  *
  * Sub-n strings return an EMPTY array (the sane semantic); the raw HOF
  * would produce a DESCENDING sequence there (sequence(1, 0) = [1, 0])
  * and emit truncated fragments — callers comparing against the HOF twin
  * must guard `length(s) >= n` as the oracle SQL and NativeExprSpec do.
  */
case class CharNGrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "char_ngrams: n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // one O(len) pass to index char boundaries (UTF-8 aware), then each
    // n-gram is a byte-range slice — substringSQL would walk from the
    // string start per call, O(len^2) on megabyte documents
    val offsets = new Array[Int](s.numChars() + 1)
    var nc = 0
    var b = 0
    while (b < bytes.length) {
      offsets(nc) = b
      nc += 1
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    offsets(nc) = bytes.length
    val m = nc - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val from = offsets(i); val until = offsets(i + n)
      out(i) = UTF8String.fromBytes(bytes, from, until - from).toLowerCase
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): CharNGrams =
    copy(child = c)
}

object CharNGrams {
  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(CharNGrams(GraftBridge.toExpr(c), n))
}
