package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `|A ∩ B|` for two ASC-SORTED, DISTINCT string arrays, as a single
  * merge walk — the custom-Expression replacement for
  * `size(array_intersect(a, b))`, which builds a hash set per row.
  *
  * On the Jaccard similarity join (qn03) the intersect runs once per
  * candidate pair (12M+ pairs at sf0.1); the merge walk does no
  * allocation and no hashing, and its codegen stays inside the
  * whole-stage-generated join stage.
  *
  * PRECONDITION: both inputs sorted ascending (Spark `array_sort` /
  * DuckDB `list_sort` binary order) with distinct elements — exactly what
  * [[TextFns.tokenSet]] produces. Null arrays or null elements yield
  * null. Equal to `len(list_intersect(a, b))` in DuckDB for set inputs,
  * so oracles carry over unchanged.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<string>, got ${left.dataType} / ${right.dataType}")
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var ia = 0; var ib = 0; var cnt = 0
    while (ia < na && ib < nb) {
      if (a.isNullAt(ia) || b.isNullAt(ib)) return null
      val c = a.getUTF8String(ia).compareTo(b.getUTF8String(ib))
      if (c == 0) { cnt += 1; ia += 1; ib += 1 }
      else if (c < 0) ia += 1
      else ib += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      val u = classOf[UTF8String].getName
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0, $ib = 0, $cnt = 0;
         |while ($ia < $na && $ib < $nb) {
         |  if ($a.isNullAt($ia) || $b.isNullAt($ib)) { ${ev.isNull} = true; break; }
         |  final int $c = (($u) $a.getUTF8String($ia)).compareTo($b.getUTF8String($ib));
         |  if ($c == 0) { $cnt++; $ia++; $ib++; }
         |  else if ($c < 0) { $ia++; } else { $ib++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
