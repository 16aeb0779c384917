package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RAKE candidate phrases (Rose et al. 2010) per document in one native
  * pass: split on single spaces, drop empty tokens, break the token
  * stream at stopwords — each maximal run of content tokens is an
  * "island" — and emit `array<struct<plen:int, phrase:string>>`, one
  * entry per island OCCURRENCE (not distinct), phrase = members joined
  * by " " in position order.
  *
  * This is exactly the gaps-and-islands frame the SQL pipeline built
  * with posexplode + a per-doc row_number window + a per-island
  * groupBy/join — three corpus-token shuffles for a doc-local
  * computation. Tokens contain no spaces by construction, so
  * `split(phrase, ' ')` downstream recovers the member multiset
  * losslessly (duplicate members preserved).
  */
case class RakeIslands(child: Expression, stopwords: Seq[String])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("plen", IntegerType, nullable = false),
      StructField("phrase", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "rake_islands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  @transient private lazy val stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[Any]()
    val run = new java.lang.StringBuilder()
    var plen = 0
    def flush(): Unit = {
      if (plen > 0) {
        out.add(InternalRow(plen, UTF8String.fromString(run.toString)))
        run.setLength(0); plen = 0
      }
    }
    val toks = text.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) { // filter(t <> '') before positions, like the SQL
        if (stop.contains(t)) flush()
        else {
          if (plen > 0) run.append(' ')
          run.append(t); plen += 1
        }
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): RakeIslands =
    copy(child = c)
}

object RakeIslands {
  import org.apache.spark.sql.{Column, GraftBridge}

  def rake_islands(c: Column, stopwords: Seq[String]): Column =
    GraftBridge.toColumn(RakeIslands(GraftBridge.toExpr(c), stopwords))
}
