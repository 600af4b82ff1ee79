package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .withExtensions(new GraftExtensions)
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query runs at sf0.001 and is deterministic") {
    SparkEntry.registry.foreach { q =>
      val a = q.fn(spark, sf)
      val b = q.fn(spark, sf)
      val ra = a.collect().toSeq.map(_.toString)
      val rb = b.collect().toSeq.map(_.toString)
      assert(ra == rb, s"${q.name} not deterministic")
    }
  }

  test("registry names are unique (a duplicate would silently shadow in the maps)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("oracle keys are a subset of query keys with matching names") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle-only keys: ${ok -- qk}")
  }

  test("q12 pricing summary has the TPC-H Q1 shape") {
    val df = SparkEntry.queries("q12_agg_pricing_summary")(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "count_order"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("q20 top-k is ordered descending") {
    val prices = SparkEntry.queries("q20_topk_orders")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q25 sessions never exceed event count") {
    SparkEntry.queries("q25_session_counts")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_sessions") >= 1L)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
