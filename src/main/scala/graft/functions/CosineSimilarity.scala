package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two array&lt;float&gt; /
  * array&lt;double&gt; columns — the ANN hot-path scalar (SURVEY.md §2.9).
  * A custom Expression with doGenCode beats the `zip_with`/`aggregate`
  * higher-order formulation because HOFs evaluate interpreted with boxed
  * lambdas; this compiles to a tight primitive loop inside
  * WholeStageCodegen.
  *
  * Bit-compatibility: accumulation order and operation sequence
  * (sequential dot, sqrt(na)*sqrt(nb) denominator) exactly match the
  * previous fold-based formulation and the DuckDB oracle's list_sum, so
  * results are unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Analysis-time contract: both sides must be array&lt;float&gt; or
    * array&lt;double&gt;. Without this, an array&lt;int&gt; argument via the
    * SQL-registered name would misread the packed buffer and silently
    * return garbage, and non-array input would fail at codegen instead of
    * analysis.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Null array elements contribute 0 to dot and norms (skipped), matching
  // the aggregate-fold formulation where `acc + CAST(null AS DOUBLE)*x`
  // would poison the fold — here we define the total as over non-null slots.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
      }
      i += 1
    }
    i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        na += x * x
      }
      i += 1
    }
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y") // freshName: raw locals could shadow enclosing codegen scope
      s"""
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $dot += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
          }
        }
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i)) {
            double $x = (double) $a.$aGet($i); $na += $x * $x;
          }
        }
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if (!$b.isNullAt($i)) {
            double $y = (double) $b.$bGet($i); $nb += $y * $y;
          }
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      CosineSimilarity(GraftBridge.toExpr(a), GraftBridge.toExpr(b)))
}
