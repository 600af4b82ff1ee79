package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.L): the declarative
  * form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically right
  * but allocates an intermediate array per row and evaluates the lambdas
  * through interpreted `HigherOrderFunction` paths — at 12.5M row pairs
  * (qn08) that dominates the query. This expression generates a tight
  * primitive loop inside whole-stage codegen instead: no allocation, no
  * virtual calls, same result bit-for-bit.
  *
  * Semantics match the HOF form exactly (and therefore the DuckDB oracle
  * `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b), ...)))`):
  * sequential left-to-right accumulation in double precision, null if
  * either array is null, any element is null, or lengths differ (zip_with
  * pads the shorter side with null, which nulls the fold).
  */
@ExpressionDescription(
  usage = "dot_ff(a, b) - sequential-fold double dot product of two float arrays.")
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_ff requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFF =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column wrapper for [[DotProductFF]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductFF(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm via the native dot: identical fold order to
    * [[TextFns.l2norm]] (x_i * x_i accumulated left to right). */
  def l2normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))
}
