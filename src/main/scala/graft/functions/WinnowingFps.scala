package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003),
  * bit-identical to the SQL pipeline it replaces (and to the DuckDB
  * oracle): per character position the k-gram hash is the polynomial
  * fold `acc*31 + codepoint` over k code points (64-bit wrap-around, the
  * same Long arithmetic both engines run), and each length-w window of
  * consecutive k-gram hashes contributes its signed minimum; the result
  * is the DISTINCT fingerprint set (first-occurrence order).
  *
  * The SQL form is O(n*(k+w)) per document — `transform(sequence(...))`
  * re-hashes every k-gram from scratch and re-scans every window for its
  * min. This evaluator is O(n): the k-gram hash rolls
  * (h' = (h - c*31^(k-1))*31 + c_next, exact under mod-2^64 wrap) and the
  * window min uses the monotonic-deque sliding minimum. Semantics match
  * the SQL twin exactly because wrap-around makes the rolling update
  * algebraically identical to the re-fold, and min/distinct are
  * order-insensitive set operations.
  *
  * Returns an empty array for texts shorter than k+w-1 code points (the
  * callers' pre-filter makes that unreachable, but the expression is
  * total either way).
  */
case class WinnowingFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fps"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points, matching split(text,'') + ascii(c) on both engines
    val cps = s.codePoints().toArray
    val n = cps.length
    val m = n - k + 1 // number of k-gram hashes
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // 31^(k-1) under the same 64-bit wrap as the fold itself
    var pow = 1L
    var t = 1
    while (t < k) { pow *= 31L; t += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * 31L + cps(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * pow) * 31L + cps(i + k - 1)
      hs(i) = h
      i += 1
    }
    // monotonic-deque sliding minimum over windows of w hashes
    val seen = new java.util.HashSet[Long](m)
    val out = new scala.collection.mutable.ArrayBuffer[Long](m - w + 1)
    val dq = new Array[Int](m) // indices into hs, values increasing
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val fp = hs(dq(head))
        if (seen.add(fp)) out += fp
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFps {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column API: `winnowing_fps(text, k, w)` — distinct winnowing
    * fingerprints of the k-gram/31-fold hash under a w-hash window.
    */
  def winnowing_fps(text: Column, k: Int, w: Int): Column =
    GraftBridge.toColumn(WinnowingFps(GraftBridge.toExpr(text), k, w))
}
