package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest repeated substring per document, capped at `cap` chars —
  * the per-doc scalar the q278 pipeline previously computed via
  * explode(capped suffixes) -> per-doc window sort -> adjacent-LCP
  * (a ~cap× corpus-bytes explode plus a corpus-wide shuffle on doc_id).
  *
  * Semantics are pinned to that SQL form (and to the DuckDB oracle):
  * sort the n capped suffixes, take the max common-prefix length of
  * adjacent pairs. Max-adjacent-LCP over ANY lexicographically sorted
  * suffix list equals max-pairwise-LCP (suffixes sharing a prefix are
  * contiguous under every character total order), so Java char order
  * gives the same scalar as the engines' string orders. Documents are
  * independent, so the whole query collapses to a projection + one
  * tiny per-source aggregate — no explode, no shuffle of corpus rows.
  *
  * Returns NULL for texts with fewer than 2 characters: such docs have
  * no adjacent suffix pair, and the SQL form's per-doc aggregate
  * excluded them from the report entirely (callers filter the NULLs).
  */
case class LongestRepeat(child: Expression, cap: Int)
  extends UnaryExpression with CodegenFallback {

  require(cap >= 1)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "longest_repeat"

  override def nullSafeEval(input: Any): Any = {
    // iterate CODE POINTS, not UTF-16 units (the WinnowingFps /
    // CharNGramCounts convention): the SQL twin and the DuckDB oracle
    // both count characters, so a charAt/length walk would add
    // lone-low-surrogate suffix positions and count an astral char as
    // length 2 on non-BMP text
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cp.length
    if (n < 2) return null
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) { idx(i) = i; i += 1 }
    // sort suffix start positions by their cap-codepoint-capped suffix
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val la = math.min(cap, n - a)
        val lb = math.min(cap, n - b)
        val lim = math.min(la, lb)
        var t = 0
        while (t < lim) {
          val ca = cp(a + t)
          val cb = cp(b + t)
          if (ca != cb) return ca - cb
          t += 1
        }
        la - lb
      }
    })
    var best = 0
    i = 1
    while (i < n) {
      val a = idx(i - 1).intValue()
      val b = idx(i).intValue()
      val lim = math.min(math.min(cap, n - a), math.min(cap, n - b))
      var l = 0
      while (l < lim && cp(a + l) == cp(b + l)) l += 1
      if (l > best) best = l
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongestRepeat {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column API: `longest_repeat(text, cap)` — length of the longest
    * substring occurring at least twice, capped at `cap`; NULL when the
    * text has fewer than 2 characters.
    */
  def longest_repeat(text: Column, cap: Int): Column =
    GraftBridge.toColumn(LongestRepeat(GraftBridge.toExpr(text), cap))
}
