package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates (and pins) the AQE skew-join story the scale docs lean
  * on: a hot join key that dwarfs every other partition is split by
  * OptimizeSkewedJoin at runtime, without any salting in the query.
  * Thresholds are scaled down so the behavior is observable on test-size
  * data; the mechanism is identical at 100 TB defaults.
  */
class SkewSpec extends AnyFunSuite {

  test("AQE splits a skewed join partition at runtime") {
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    import spark.implicits._

    // key 0 carries 50k rows; keys 1..99 carry ~100 each.
    val fact = spark.range(0, 60000)
      .select(when(col("id") < 50000, 0L).otherwise(col("id") % 99 + 1).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 7).as("attr"))
    val joined = fact.join(dim, "k")

    // collect() executes THIS dataset's QueryExecution (count() would
    // build a separate one, leaving `joined`'s plan unexecuted/non-final).
    assert(joined.collect().length == 60000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead"), finalPlan)
    // OptimizeSkewedJoin marks the join and the skewed side's reader.
    assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skewed=true")
      || finalPlan.contains("skew=true"), s"no skew handling in final plan:\n$finalPlan")
  }
}
