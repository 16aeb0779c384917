package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL word n-grams of a string column as raw strings, one native pass —
  * bit-identical to the HOF formulation
  * `transform(sequence(1, size(split(s,' ')) - n + 1), i ->
  *   concat_ws(' ', slice(split(s,' '), i, n)))`
  * and to DuckDB's list_transform twin, without the interpreted-lambda
  * walk (and without CollapseProject re-evaluating `split` per index —
  * the HOF pitfall that makes the SQL chain O(len²)).
  *
  * Key identity: tokens from `split(s, ' ')` (limit -1) are contiguous
  * byte runs separated by single ' ' bytes, so joining n CONSECUTIVE
  * tokens with ' ' reproduces exactly the original byte range from the
  * start of token i to the end of token i+n-1 — including the empty
  * tokens consecutive spaces produce. Each n-gram is therefore a
  * zero-copy byte slice: O(len + grams) per row, no per-token strings.
  *
  * Unlike [[WordShingles]] (distinct hashes, for join keys) this keeps
  * duplicates and real strings — the shape n-gram COUNTING needs.
  * Sub-n token counts return an empty array (callers mirroring the HOF
  * twin must guard `size >= n`, as with [[CharNGrams]]).
  */
case class WordNGrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "word_ngrams: n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token boundaries: starts(t) = first byte of token t, ends(t) = byte
    // after its last. split(' ') at limit -1 keeps leading/trailing/empty
    // tokens, so boundaries are exactly the separator positions.
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var tokenStart = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        starts += tokenStart; ends += i
        tokenStart = i + 1
      }
      i += 1
    }
    starts += tokenStart; ends += bytes.length
    val m = starts.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val from = starts(j)
      val until = ends(j + n - 1)
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNGrams =
    copy(child = c)
}

object WordNGrams {
  def word_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordNGrams(GraftBridge.toExpr(c), n))
}
