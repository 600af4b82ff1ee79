package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Index of the first LSH band (group of `rowsPerBand` consecutive
  * positions) where two equal-length `array<bigint>` MinHash signatures
  * agree on every position; -1 when no band agrees.
  *
  * The LSH candidate join emits one row per COLLIDING band, so a pair
  * colliding in k of the 16 bands appears k times; round 1 deduplicated
  * with `distinct()` over the pair stream (46.5M rows -> 9.3M pairs at
  * sf0.1, a full extra shuffle). Keeping only the row whose band index
  * IS the first agreeing band (`bandIdx === FirstAgreeingBand(sigA,
  * sigB, rpb)`) selects exactly one occurrence per pair with a streaming
  * filter inside the join stage instead. Null for null/odd-length input.
  */
case class FirstAgreeingBand(left: Expression, right: Expression, rowsPerBand: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok && rowsPerBand > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_agreeing_band requires array<bigint> and rowsPerBand > 0, " +
        s"got ${left.dataType} / ${right.dataType} / $rowsPerBand")
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var band = 0
    while ((band + 1) * rowsPerBand <= n) {
      var i = band * rowsPerBand; var agree = true
      while (agree && i < (band + 1) * rowsPerBand) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        agree = a.getLong(i) == b.getLong(i)
        i += 1
      }
      if (agree) return band
      band += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val band = ctx.freshName("band")
      val i = ctx.freshName("i"); val agree = ctx.freshName("agree")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = -1;
         |  for (int $band = 0; ($band + 1) * $rowsPerBand <= $n; $band++) {
         |    boolean $agree = true;
         |    for (int $i = $band * $rowsPerBand; $agree && $i < ($band + 1) * $rowsPerBand; $i++) {
         |      if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; $agree = false; $band = $n; }
         |      else { $agree = $a.getLong($i) == $b.getLong($i); }
         |    }
         |    if (!${ev.isNull} && $agree) { ${ev.value} = $band; break; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstAgreeingBand =
    copy(left = newLeft, right = newRight)
}

object FirstAgreeingBand {
  def apply(a: Column, b: Column, rowsPerBand: Int): Column =
    GraftSqlBridge.column(FirstAgreeingBand(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), rowsPerBand))
}
