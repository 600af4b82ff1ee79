package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared element-compare plumbing for merge-walk expressions over
  * ASC-SORTED, DISTINCT arrays (`array<string>`, `array<int>`,
  * `array<bigint>`): one comparison per step, no allocation, no hashing,
  * fully codegen'd so the walk stays inside the whole-stage-generated
  * join stage.
  */
trait SortedMergeWalk { self: BinaryExpression =>

  protected def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  protected def checkSortedArrayInputs(fn: String): TypeCheckResult = {
    val ok = left.dataType == right.dataType && (left.dataType match {
      case ArrayType(StringType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires two arrays of string/int/bigint of the same type, " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  /** Interpreted compare of elements `a(i)` vs `b(j)`. */
  protected def cmpEval(a: ArrayData, i: Int, b: ArrayData, j: Int): Int =
    elemType match {
      case StringType  => a.getUTF8String(i).compareTo(b.getUTF8String(j))
      case IntegerType => java.lang.Integer.compare(a.getInt(i), b.getInt(j))
      case LongType    => java.lang.Long.compare(a.getLong(i), b.getLong(j))
    }

  /** Java source for the compare of elements `$a[$i]` vs `$b[$j]`. */
  protected def cmpCode(a: String, i: String, b: String, j: String): String =
    elemType match {
      case StringType =>
        s"((${classOf[UTF8String].getName}) $a.getUTF8String($i)).compareTo($b.getUTF8String($j))"
      case IntegerType => s"java.lang.Integer.compare($a.getInt($i), $b.getInt($j))"
      case LongType    => s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
    }
}

/** `|A ∩ B|` for two ASC-SORTED, DISTINCT arrays, as a single merge
  * walk — the custom-Expression replacement for
  * `size(array_intersect(a, b))`, which builds a hash set per row.
  *
  * On the Jaccard similarity join (qn03) the intersect runs once per
  * candidate pair (12M+ pairs at sf0.1); with dictionary-encoded
  * `array<int>` token ids the walk is one int compare per step.
  *
  * PRECONDITION: both inputs sorted ascending (Spark `array_sort` /
  * DuckDB `list_sort` order) with distinct elements — what
  * [[TextFns.tokenSet]] (strings) and the vocab encoding in
  * `operators.Dedup` (ints) produce. Null arrays or null elements yield
  * null. Equal to `len(list_intersect(a, b))` in DuckDB for set inputs,
  * so oracles carry over unchanged.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with SortedMergeWalk {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkSortedArrayInputs("sorted_intersect_count")

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
      val c = cmpEval(a, ia, b, ib)
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
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0, $ib = 0, $cnt = 0;
         |while ($ia < $na && $ib < $nb) {
         |  if ($a.isNullAt($ia) || $b.isNullAt($ib)) { ${ev.isNull} = true; break; }
         |  final int $c = ${cmpCode(a, ia, b, ib)};
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

/** First (minimum) common element of two ASC-SORTED, DISTINCT arrays, or
  * null when the arrays are disjoint — the pair-dedup primitive of the
  * similarity joins.
  *
  * A prefix-filter candidate join emits one row per SHARED prefix token,
  * so a pair with k shared prefix tokens appears k times and round 1
  * deduplicated with a `distinct()` — a full extra shuffle of the
  * candidate stream (89M rows at sf0.1 for 12.5M unique pairs). Keeping
  * only the row whose join token IS the first common prefix token
  * (`tok === SortedFirstCommon(prefixA, prefixB)`) selects exactly one
  * occurrence per pair with a streaming filter instead: no shuffle, no
  * hash table, evaluated inside the join's codegen stage.
  */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression with SortedMergeWalk {

  override def dataType: DataType = elemType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkSortedArrayInputs("sorted_first_common")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var ia = 0; var ib = 0
    while (ia < na && ib < nb) {
      if (a.isNullAt(ia) || b.isNullAt(ib)) return null
      val c = cmpEval(a, ia, b, ib)
      if (c == 0) return a.get(ia, elemType)
      else if (c < 0) ia += 1
      else ib += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val c = ctx.freshName("c")
      val getA = elemType match {
        case StringType  => s"$a.getUTF8String($ia)"
        case IntegerType => s"$a.getInt($ia)"
        case LongType    => s"$a.getLong($ia)"
      }
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0, $ib = 0;
         |${ev.isNull} = true;
         |while ($ia < $na && $ib < $nb) {
         |  if ($a.isNullAt($ia) || $b.isNullAt($ib)) break;
         |  final int $c = ${cmpCode(a, ia, b, ib)};
         |  if ($c == 0) { ${ev.isNull} = false; ${ev.value} = $getA; break; }
         |  else if ($c < 0) { $ia++; } else { $ib++; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstCommon =
    copy(left = newLeft, right = newRight)
}

object SortedFirstCommon {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedFirstCommon(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
