package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Element-wise sum of array&lt;double&gt; columns as a single-pass
  * `TypedImperativeAggregate` (SURVEY.md §4: the per-group vector/histogram
  * merge the builtin `sum` cannot express without exploding rows).
  *
  * Scale rationale: aggregating a 768-bin histogram or a 64-dim embedding
  * per group via `posexplode` multiplies the shuffle by the vector width;
  * this aggregate keeps one `Array[Double]` buffer per group and merges
  * partials, so shuffle volume is |groups| x width regardless of row
  * count — the map-side-combine shape Spark's own `sum` gets for scalars.
  *
  * Null elements count as 0; rows with null arrays are skipped. The first
  * non-null array fixes the width; later rows must match (engine invariant
  * for fixed-width embeddings/histograms).
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  /** Analysis-time contract: array&lt;double&gt; only. Via the
    * SQL-registered name, an array&lt;float&gt; argument would reinterpret
    * 4-byte slots as doubles and silently return garbage (same hazard
    * CosineSimilarity guards against).
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> (cast the input), got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Double](n) else buf
    require(acc.length == n,
      s"vec_sum: mixed vector widths (${acc.length} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"vec_sum: mixed vector widths (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = c.head)
}

/** Exact element-wise sum over array&lt;decimal(p&le;18,s)&gt;: accumulates
  * UNSCALED 128-bit integers per dimension (a hi/lo long pair with manual
  * carry), so the per-group sum is order-independent and bit-exact (the
  * repo's decimal-sum rule for cross-row double aggregation) while
  * keeping VectorSumAgg's shuffle shape (|groups| x width fixed buffers,
  * map-side merged). Output: array&lt;decimal(38,s)&gt; — callers cast to
  * double after the exact sum, mirroring the oracle's
  * `CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)`.
  *
  * Overflow bound: |per-dim sum| &lt; 2^127 / 10^s in the buffer — beyond
  * any corpus (10^19 rows of maxed decimal(18) inputs stay inside it);
  * eval still throws loudly if the final sum exceeds decimal(38)'s 10^38
  * range rather than wrapping. Buffer layout: hi words in [0, n), lo
  * words (unsigned) in [n, 2n).
  */
case class VectorSumDecAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val elemType: DecimalType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[DecimalType]

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DecimalType(38, elemType.scale), containsNull = false)
  override def prettyName: String = "vec_sum_dec"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(d: DecimalType, _) if d.precision <= 18 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<decimal(p<=18,s)>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  // adds signed-128 (bhi, blo) into buf's dim i (hi at i, lo at n + i)
  @inline private def add128(buf: Array[Long], n: Int, i: Int,
      bhi: Long, blo: Long): Unit = {
    val lo = buf(n + i)
    val nlo = lo + blo
    val carry = ((lo & blo) | ((lo | blo) & ~nlo)) >>> 63
    buf(i) = buf(i) + bhi + carry
    buf(n + i) = nlo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Long](2 * n) else buf
    require(acc.length == 2 * n,
      s"vec_sum_dec: mixed vector widths (${acc.length / 2} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val u = arr.getDecimal(i, elemType.precision, elemType.scale).toUnscaledLong
        add128(acc, n, i, u >> 63, u) // sign-extend the 64-bit input to 128
      }
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"vec_sum_dec: mixed vector widths (${a.length / 2} vs ${b.length / 2})")
    val n = a.length / 2
    var i = 0
    while (i < n) { add128(a, n, i, b(i), b(n + i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else {
      val n = buf.length / 2
      val out = new Array[Any](n)
      val bytes = new Array[Byte](16)
      val bb = ByteBuffer.wrap(bytes)
      var i = 0
      while (i < n) {
        bb.clear(); bb.putLong(buf(i)); bb.putLong(buf(n + i))
        // two's-complement big-endian (hi, lo) is exactly BigInteger's
        // byte encoding of the signed 128-bit sum
        val unscaled = new java.math.BigInteger(bytes)
        out(i) = org.apache.spark.sql.types.Decimal(
          BigDecimal(new java.math.BigDecimal(unscaled, elemType.scale)),
          38, elemType.scale)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumDecAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumDecAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumDecAgg =
    copy(child = c.head)
}

object VectorSumAgg {
  import org.apache.spark.sql.functions.col

  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point: `vec_sum(col)` over array&lt;double&gt;
    * (caller casts: `col.cast("array<double>")`).
    */
  def vec_sum(c: Column): Column =
    GraftBridge.toColumn(
      VectorSumAgg(GraftBridge.toExpr(c)).toAggregateExpression())

  def vec_sum(name: String): Column = vec_sum(col(name))

  /** Exact decimal elementwise sum (see VectorSumDecAgg). */
  def vec_sum_dec(c: Column): Column =
    GraftBridge.toColumn(
      VectorSumDecAgg(GraftBridge.toExpr(c)).toAggregateExpression())
}
