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

  // ---- Salted operators (operators.Skew) --------------------------------

  test("qk01 salted join matches the unsalted join and stays a shuffle join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sf = TestSpark.sf
    val salted = SparkEntry.queries("qk01_salted_skew_join")(spark, sf)

    val dim = Seq("click" -> 0.10, "error" -> 0.00, "purchase" -> 5.00,
      "signup" -> 1.00, "view" -> 0.05).toDF("event_type", "weight")
    val plain = Tables.events(spark, sf).join(dim, "event_type")
      .groupBy(col("event_type"))
      .agg(
        sum(col("value").cast("decimal(18,2)") * col("weight").cast("decimal(9,4)"))
          .cast("double").as("wvalue"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
    assert(salted.collect().toSeq == plain.collect().toSeq)

    // The point of salting is a SHUFFLED join: broadcast would sidestep
    // the skewed exchange entirely and prove nothing.
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("qk02 salted distinct-set agg matches direct countDistinct") {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    val salted = SparkEntry.queries("qk02_salted_distinct_users")(spark, sf)
      .select("event_type", "n_users")
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
    assert(salted.collect().toSeq == direct.collect().toSeq)
  }

  test("saltedJoin equals the plain join on random data, keys, and salt counts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val spark = TestSpark.spark
    import spark.implicits._
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))

    // Skewed key space (few values, geometric-ish mass), dim with partial
    // key coverage (so unmatched fact rows drop in BOTH forms), payloads
    // carried through both sides, S from degenerate 1 to beyond-key-count.
    val factRow = Gen.zip(Gen.chooseNum(0, 6), Gen.chooseNum(-100L, 100L))
    val dimKeys = Gen.someOf(0 to 6)
    (0 until 10).foreach { trial =>
      val facts = sample(Gen.listOfN(200, factRow), 300L + trial)
      val dks = sample(dimKeys, 400L + trial).toSeq
      val s = sample(Gen.chooseNum(1, 24), 500L + trial)
      val fact = facts.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "fid")
      val dim = dks.map(k => (k, s"d$k")).toDF("k", "attr")
      val salted = operators.Skew.saltedJoin(fact, dim, "k", col("fid"), s)
        .select("k", "v", "fid", "attr").collect().map(_.toString).sorted.toSeq
      val plain = fact.join(dim, Seq("k"))
        .select("k", "v", "fid", "attr").collect().map(_.toString).sorted.toSeq
      assert(salted == plain, s"trial $trial (S=$s, dimKeys=$dks)")
    }
  }

  test("saltedJoin rejects a non-positive salt count instead of returning empty") {
    val spark = TestSpark.spark
    import spark.implicits._
    val f = Seq((1, 2L)).toDF("k", "v")
    val d = Seq((1, "a")).toDF("k", "attr")
    intercept[IllegalArgumentException] {
      operators.Skew.saltedJoin(f, d, "k", col("v"), 0)
    }
  }

  test("salting spreads a hot key across reducers") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("event_id"))

    def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
      df.mapPartitions(it => Iterator(it.size.toLong)).collect().max

    // Partitioned on the 5-value key alone: >= total/5 rows pile onto the
    // hottest reducer of 32. With a 16-way salt the same rows spread over
    // 80 key-groups and the hottest reducer carries a fraction of that.
    val total = ev.count()
    val hot = maxPartitionRows(ev.repartition(32, col("event_type")))
    val salted = maxPartitionRows(
      ev.repartition(32, col("event_type"), pmod(hash(col("event_id")), lit(16))))
    assert(hot >= total / 5, s"expected a hot reducer, max=$hot total=$total")
    assert(salted * 2 <= hot, s"salting did not spread: salted=$salted hot=$hot")
  }

  test("saltedDistinctAuto: identical results either side of the measured gate") {
    import graft.operators.Skew
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(2000).select(
      (col("id") % 3).cast("string").as("k"),
      (col("id") % 700).as("v")) // duplicate values per key -> real distinct work
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toSeq
    // force both branches via the estimate; the gate must never change
    // the answer — only the plan (hierarchical merge vs one-level agg)
    val plain = Skew.saltedDistinctAuto(df, "k", "v", 8, estDistinctPerKey = 1L)
    val salted = Skew.saltedDistinctAuto(df, "k", "v", 8,
      estDistinctPerKey = Skew.saltedDistinctMinPerKey)
    assert(canon(plain) == canon(salted))
    // and the plans actually differ where it matters: the salted form
    // aggregates twice (shards, then merge), the plain form once
    def aggCount(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    assert(aggCount(plain) == 1 && aggCount(salted) == 2,
      s"gate did not switch plans: plain=${aggCount(plain)} salted=${aggCount(salted)}")
  }
}
