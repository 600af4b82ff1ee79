package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  import TestSpark._

  private def windowForm = {
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    li.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select(col("l_orderkey"), col("rnk"), col("l_linenumber"), col("l_extendedprice"))
  }

  test("TopKRewriteRule swaps the window form for TopKPerGroupExec") {
    val physical = windowForm.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroup"), s"operator missing:\n$physical")
    assert(!physical.contains("Window"), s"window survived:\n$physical")
  }

  test("top-k operator matches the window semantics exactly") {
    // Recompute the expected result without the rule firing: rank > bound
    // comparisons don't match the rewrite pattern, so rank<=k via the
    // complement (NOT rank > k) keeps the built-in window pipeline.
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    val expected = li.withColumn("rnk", row_number().over(w))
      .filter(!(col("rnk") > 2))
      .select(col("l_orderkey"), col("rnk"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey", "rnk")
      .collect().map(_.toString).toSeq
    assert(expected.nonEmpty)
    val got = windowForm.orderBy("l_orderkey", "rnk").collect().map(_.toString).toSeq
    assert(got == expected)
  }

  test("rank === 1 form rewrites too and agrees with max_by") {
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val top = o.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
    assert(top.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = top.select("o_custkey", "o_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = o.groupBy("o_custkey")
      .agg(expr("max_by(o_orderkey, struct(o_totalprice, -o_orderkey))").as("o_orderkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("groups smaller than k emit all rows; ranks dense from 1") {
    import spark.implicits._
    val d = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc)
    val out = d.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .orderBy("g", "rnk").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a", 1, 1), ("a", 2, 2), ("b", 9, 1)))
  }

  test("rank()/dense_rank() and non-cutoff filters are NOT rewritten") {
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_extendedprice").desc)
    val r1 = li.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 2)
    assert(!r1.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val r2 = li.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 3)
    assert(!r2.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("qn07 plans through the operator and keeps its oracle result shape") {
    val df = SparkEntry.queries("qn07_cosine_topk")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per-probe ranks are exactly 1..5 (or fewer if the corpus is tiny)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to rs.length))
    }
  }
}
