package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Whole-stage-codegen'd vector arithmetic over `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) evaluates its lambda interpreted, one function-call per
  * element — measured ~10× slower than a fused loop on the ANN hot paths
  * (same finding that motivated WordShingles/LshBuckets). These expressions
  * emit a plain Java loop inside whole-stage codegen instead, with the same
  * left-to-right IEEE summation order as the HOF chain so results (and the
  * DuckDB-oracle hashes built on 6-decimal rounding) are bit-identical.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ — null if either array is null OR the lengths differ (the
    * `aggregate(zip_with(...))` chain this replaces null-pads the short
    * side, so a malformed vector propagates NULL and drops out of
    * threshold filters instead of scoring on a truncated prefix).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "dot_product"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $dot;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity a·b / (‖a‖·‖b‖), fused into one pass: dot product and
    * both norms accumulate in the same element order the three separate HOF
    * sums used, so the result is bit-identical to
    * `dotd(a,b) / (sqrt(dotd(a,a)) * sqrt(dotd(b,b)))`.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "cosine_similarity"
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      var na = 0.0
      i = 0
      while (i < n) { val v = x.getDouble(i); na += v * v; i += 1 }
      var nb = 0.0
      i = 0
      while (i < n) { val v = y.getDouble(i); nb += v * v; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val va = ctx.freshName("va")
        val vb = ctx.freshName("vb")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0;
           |  double $na = 0.0;
           |  double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $va = $a.getDouble($i); $na += $va * $va;
           |  }
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $vb = $b.getDouble($i); $nb += $vb * $vb;
           |  }
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
