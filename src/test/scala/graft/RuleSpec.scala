package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: declarative
  * `size(array_intersect(array_sort(array_distinct(..)), ...))` must be
  * rewritten to the merge-walk expression — and must NOT fire when
  * sortedness/distinctness can't be proven from the plan.
  */
class RuleSpec extends AnyFunSuite {
  import TestSpark._

  private def sortedSet(c: org.apache.spark.sql.Column) =
    array_sort(array_distinct(c))

  test("rule rewrites size(array_intersect) over provably sorted-distinct inputs") {
    val df = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .crossJoin(Tables.documents(spark, sf).limit(5)
        .select(split(col("text"), " ").as("v")))
      .select(size(array_intersect(sortedSet(col("w")), sortedSet(col("v")))).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("sortedintersectcount"), opt)
    // and it computes the same values as the un-rewritten built-in chain
    val builtin = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .crossJoin(Tables.documents(spark, sf).limit(5)
        .select(split(col("text"), " ").as("v")))
      // element_at(.., 1) dependency blocks the pattern (not a Size) so
      // this side stays on the built-in path.
      .select(size(array_intersect(sortedSet(col("w")), sortedSet(col("v")))) + lit(0))
    // Row order of two independently-planned cross joins is not
    // deterministic; compare as sorted multisets.
    assert(df.collect().map(_.getInt(0)).toSeq.sorted ==
      builtin.collect().map(_.getInt(0)).toSeq.sorted)
  }

  test("rule does not fire on unproven operands") {
    val df = Tables.documents(spark, sf).limit(5)
      .select(size(array_intersect(split(col("text"), " "),
        sortedSet(split(col("text"), " ")))).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("sortedintersectcount"), opt)
    assert(df.collect().nonEmpty)
  }
}
