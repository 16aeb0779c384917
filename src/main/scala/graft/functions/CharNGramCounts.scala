package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character n-gram OCCURRENCE COUNTS in one native pass:
  * `array<struct<f: string, c: long>>`, one entry per DISTINCT n-gram
  * (case preserved), counts equal to what
  * `explode(transform(sequence(1, length(s)-n+1), i -> substring(s, i, n)))
  *  -> groupBy(doc, f).count()` produces — but computed in-task, so the
  * corpus-position explode and its counting shuffle disappear; what
  * leaves the task is the per-doc distinct-gram frame (~alphabet^n
  * entries, hundreds vs thousands of positions for ASCII bigrams).
  *
  * Entries are sorted by gram bytes for determinism. Sub-n strings
  * return an empty array (the oracle's generate_series(1, len-n+1)
  * frame is empty there; callers relying on the raw ascending-sequence
  * HOF must keep the same length guard).
  */
case class CharNGramCounts(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "char_ngram_counts: n must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("f", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
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
    val counts = new java.util.HashMap[UTF8String, Long](256)
    var i = 0
    while (i < m) {
      val from = offsets(i); val until = offsets(i + n)
      val g = UTF8String.fromBytes(bytes, from, until - from)
      counts.put(g, counts.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    val keys = new java.util.ArrayList[UTF8String](counts.keySet())
    java.util.Collections.sort(keys)
    val out = new Array[Any](keys.size())
    i = 0
    while (i < keys.size()) {
      val k = keys.get(i)
      out(i) = InternalRow(k, counts.get(k))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): CharNGramCounts =
    copy(child = c)
}

object CharNGramCounts {
  import org.apache.spark.sql.{Column, GraftBridge}

  def char_ngram_counts(c: Column, n: Int): Column =
    GraftBridge.toColumn(CharNGramCounts(GraftBridge.toExpr(c), n))
}
