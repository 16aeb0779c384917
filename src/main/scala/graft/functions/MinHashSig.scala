package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Native MinHash signature computation, bit-identical to the SQL
  * pipeline it replaces (and to the DuckDB oracle):
  * distinct word-4-gram shingle STRINGS -> md5 -> h1 = first 15 hex
  * digits mod P, h2 = hex digits 16..30 mod P -> sig_j = min over
  * shingles of (h1 + j*h2) mod P for j in 0..numSigs-1.
  *
  * The hex-digit halves are read directly from the digest bytes (15 hex
  * digits = 7.5 bytes), skipping hex-string construction; the md5 itself
  * is unavoidable (it IS the portable hash family shared with the
  * oracle). One thread-local MessageDigest per task thread.
  */
case class MinHashSig(child: Expression, numSigs: Int, prime: Long)
  extends UnaryExpression with CodegenFallback {

  require(numSigs >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1 mirrors Spark `split(text, ' ')` and DuckDB string_split:
    // trailing empty tokens are kept (Scala's split(Char) would drop them,
    // silently diverging from the SQL twin on trailing whitespace).
    val tokens = text.split(" ", -1)
    if (tokens.length < 4) return new GenericArrayData(Array.emptyLongArray)
    val md = mdLocal.get()
    val seen = new java.util.HashSet[String](tokens.length * 2)
    val sigs = Array.fill(numSigs)(Long.MaxValue)
    var i = 0
    while (i <= tokens.length - 4) {
      val sh = tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2) + " " + tokens(i + 3)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes("UTF-8"))
        // first 15 hex digits: bytes 0..6 + high nibble of byte 7
        var h1 = 0L
        var k = 0
        while (k < 7) { h1 = (h1 << 8) | (d(k) & 0xFFL); k += 1 }
        h1 = ((h1 << 4) | ((d(7) >> 4) & 0xFL)) % prime
        // hex digits 16..30: low nibble of byte 7 + bytes 8..14
        var h2 = (d(7) & 0xFL)
        k = 8
        while (k < 15) { h2 = (h2 << 8) | (d(k) & 0xFFL); k += 1 }
        h2 = h2 % prime
        var j = 0
        while (j < numSigs) {
          val v = (h1 + j * h2) % prime
          if (v < sigs(j)) sigs(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  def minhash_sig(c: Column, numSigs: Int = 12, prime: Long = 1000000007L): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpr(c), numSigs, prime))
}
