package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Bounded per-group top-k as an aggregate: keeps at most k (ord1, ord2,
  * row) entries per group in each partial buffer, merged map-side before
  * the shuffle. For "top/latest k rows per key" this shuffles k x |keys|
  * rows instead of the entire fact table — the scale-correct alternative
  * to `row_number() OVER (...) <= k`, which must shuffle and sort every
  * row (SURVEY.md §2.7 SR2 at 100 TB).
  *
  * Ordering is descending lexicographic on (ord1, ord2) — callers pass a
  * tiebreak so results are total-ordered and oracle-deterministic.
  * Output: array&lt;struct&gt; of the kept rows, ordered.
  */
case class TopKByAgg(
    child: Expression, ord1: Expression, ord2: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[TopKByAgg.Entry]] {
  import TopKByAgg.Entry

  require(k > 0, "top_k_by: k must be positive")

  // resolved lazily: child is unresolved at construction time
  private def rowType: StructType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child, ord1, ord2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(rowType, containsNull = false)
  override def prettyName: String = "top_k_by"

  /** Analysis-time contract: struct row + BIGINT ordinals (the update path
    * casts with asInstanceOf[Long]; an int ordering column must fail here,
    * not with a runtime ClassCastException).
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a struct row argument, got ${child.dataType.catalogString}")
    else if (ord1.dataType != LongType || ord2.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName ordinals must be BIGINT, got " +
          s"${ord1.dataType.catalogString} and ${ord2.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val proj = UnsafeProjection.create(rowType)

  // Total order, fully deterministic: descending on (ord1, ord2) with
  // explicit null flags ranking NULLS LAST (a null is distinguishable
  // from a genuine Long.MinValue ordinal), then an unsigned byte-wise
  // compare of the row itself as the final tiebreak. Without the row
  // tiebreak, ties would be resolved by buffer insertion order, which
  // varies with partition/merge order across shrink() calls.
  private val descOrd: Ordering[Entry] =
    new Ordering[Entry] {
      override def compare(x: Entry, y: Entry): Int = {
        val xn1 = (x.nullFlags & 1) != 0; val yn1 = (y.nullFlags & 1) != 0
        if (xn1 != yn1) return if (xn1) 1 else -1
        val c1 = if (xn1) 0 else java.lang.Long.compare(y.o1, x.o1)
        if (c1 != 0) return c1
        val xn2 = (x.nullFlags & 2) != 0; val yn2 = (y.nullFlags & 2) != 0
        if (xn2 != yn2) return if (xn2) 1 else -1
        val c2 = if (xn2) 0 else java.lang.Long.compare(y.o2, x.o2)
        if (c2 != 0) return c2
        java.util.Arrays.compareUnsigned(
          x.row.asInstanceOf[UnsafeRow].getBytes,
          y.row.asInstanceOf[UnsafeRow].getBytes)
      }
    }

  override def createAggregationBuffer(): ArrayBuffer[Entry] =
    ArrayBuffer.empty

  private def shrink(buf: ArrayBuffer[Entry]): Unit =
    if (buf.length > k) {
      val sorted = buf.sorted(descOrd).take(k)
      buf.clear()
      buf ++= sorted
    }

  override def update(buf: ArrayBuffer[Entry],
      input: InternalRow): ArrayBuffer[Entry] = {
    val c = child.eval(input)
    val o1 = ord1.eval(input)
    val o2 = ord2.eval(input)
    if (c != null) {
      // null ordinals rank LAST in this descending order (flag bits in
      // descOrd), matching `row_number() OVER (ORDER BY ord DESC)`
      // NULLS-LAST semantics in both engines — dropping them would return
      // fewer rows than the window twin for keys with < k non-null rows
      val flags = (if (o1 == null) 1 else 0) | (if (o2 == null) 2 else 0)
      val l1 = if (o1 == null) 0L else o1.asInstanceOf[Long]
      val l2 = if (o2 == null) 0L else o2.asInstanceOf[Long]
      buf += Entry(l1, l2, flags.toByte, proj(c.asInstanceOf[InternalRow]).copy())
      if (buf.length >= 4 * k) shrink(buf) // amortized bound
    }
    buf
  }

  override def merge(a: ArrayBuffer[Entry],
      b: ArrayBuffer[Entry]): ArrayBuffer[Entry] = {
    a ++= b
    shrink(a)
    a
  }

  override def eval(buf: ArrayBuffer[Entry]): Any = {
    val top = buf.sorted(descOrd).take(k)
    new GenericArrayData(top.map(_.row).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[Entry]): Array[Byte] = {
    shrink(buf)
    val rows = buf.map(e =>
      (e.o1, e.o2, e.nullFlags, e.row.asInstanceOf[UnsafeRow].getBytes))
    val size = 4 + rows.map(16 + 1 + 4 + _._4.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { case (o1, o2, flags, bytes) =>
      bb.putLong(o1).putLong(o2).put(flags).putInt(bytes.length).put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[Entry]
    var i = 0
    while (i < n) {
      val o1 = bb.getLong; val o2 = bb.getLong
      val flags = bb.get()
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(rowType.length)
      row.pointTo(rowBytes, len)
      buf += Entry(o1, o2, flags, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByAgg =
    copy(child = c(0), ord1 = c(1), ord2 = c(2))
}

object TopKByAgg {
  /** Buffer entry: ordinals, a null-flag byte (bit0 = ord1 null, bit1 =
    * ord2 null) and the projected row. Flags keep NULL distinguishable
    * from genuine Long.MinValue ordinals.
    */
  final case class Entry(o1: Long, o2: Long, nullFlags: Byte, row: InternalRow)

  /** `top_k_by(rowStruct, ord1, ord2, k)`: array of the k rows with the
    * largest (ord1, ord2), descending. ord1/ord2 must be LONG.
    */
  def top_k_by(row: Column, ord1: Column, ord2: Column, k: Int): Column =
    GraftBridge.toColumn(TopKByAgg(
      GraftBridge.toExpr(row), GraftBridge.toExpr(ord1),
      GraftBridge.toExpr(ord2), k).toAggregateExpression())
}
