package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes in one native pass (no per-shingle
  * string allocation): tokens are FNV-1a-64 hashed as byte runs between
  * spaces, consecutive n-token windows combine order-sensitively, and the
  * distinct combined hashes come back as array&lt;long&gt;.
  *
  * This replaces the `split -> transform -> concat_ws -> array_distinct
  * -> explode -> xxhash64` chain whose interpreted HOF evaluation
  * dominates near-dup candidate generation (~100x less work per row).
  * Downstream joins only use the ids as equality keys, so any injective-
  * in-practice 64-bit hash preserves pair counts (collision probability
  * ~k^2/2^64).
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "word_shingles: n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // 1. token hashes (FNV-1a 64 over the bytes of each run between
    //    separators). Tokenization mirrors Spark `split(text, ' ')`
    //    (limit -1) and DuckDB string_split EXACTLY: every separator
    //    emits a boundary, so consecutive/leading/trailing spaces produce
    //    empty tokens (hashed as the FNV basis) just like the SQL twin's
    //    empty strings — irregular whitespace shingles identically.
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = -3750763034362895579L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { tokenHashes += h; h = -3750763034362895579L }
      else h = (h ^ (b & 0xFFL)) * 1099511628211L // FNV prime
      i += 1
    }
    tokenHashes += h // final token; split keeps trailing empties at limit -1
    // 2. combine n consecutive token hashes, order-sensitively
    val m = tokenHashes.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](m)
    var j = 0
    while (j < m) {
      var c = 1125899906842597L
      var t = 0
      while (t < n) { c = c * 31 + tokenHashes(j + t); t += 1 }
      if (seen.add(c)) out += c
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  def word_shingles(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordShingles(GraftBridge.toExpr(c), n))
}
