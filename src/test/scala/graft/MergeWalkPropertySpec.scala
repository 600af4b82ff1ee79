package graft

import graft.functions.{FirstAgreeingBand, PairwiseEqCount, SortedFirstCommon, SortedIntersectCount}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the native merge-walk / band expressions and the
  * TopKPerGroup operator against brute-force Scala references on random
  * inputs, evaluated through real DataFrames so the codegen path (not
  * just interpreted eval) is what's checked. Plain ScalaCheck generators
  * with fixed seeds (scalatestplus isn't in the offline cache).
  */
class MergeWalkPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val sortedSet: Gen[Seq[Int]] =
    Gen.listOf(Gen.chooseNum(0, 50)).map(_.distinct.sorted.toSeq)

  test("sorted intersect count and first common vs set ops on random sets") {
    import spark.implicits._
    (0 until 15).foreach { trial =>
      val pairs = sample(Gen.listOfN(30, Gen.zip(sortedSet, sortedSet)), 100L + trial)
      val rows = pairs.toDF("a", "b")
        .select(SortedIntersectCount(col("a"), col("b")).as("n"),
          SortedFirstCommon(col("a"), col("b")).as("fc"))
        .collect()
      pairs.zip(rows).foreach { case ((a, b), r) =>
        val inter = a.toSet.intersect(b.toSet)
        assert(r.getInt(0) == inter.size, s"trial $trial intersect $a $b")
        val fc = if (r.isNullAt(1)) None else Some(r.getInt(1))
        assert(fc == inter.minOption, s"trial $trial first-common $a $b")
      }
    }
  }

  test("first agreeing band and pairwise-eq count vs brute force") {
    import spark.implicits._
    val sig: Gen[Seq[Long]] = Gen.listOfN(16, Gen.chooseNum(0L, 3L)).map(_.toSeq)
    (0 until 15).foreach { trial =>
      val pairs = sample(Gen.listOfN(25, Gen.zip(sig, sig)), 200L + trial)
      val rows = pairs.toDF("a", "b")
        .select(FirstAgreeingBand(col("a"), col("b"), 4).as("band"),
          PairwiseEqCount(col("a"), col("b")).as("cnt"))
        .collect()
      pairs.zip(rows).foreach { case ((a, b), r) =>
        val expBand = (0 until 4).find(band =>
          (0 until 4).forall(q => a(band * 4 + q) == b(band * 4 + q))).getOrElse(-1)
        assert(r.getInt(0) == expBand, s"trial $trial band")
        assert(r.getInt(1) == a.zip(b).count(p => p._1 == p._2), s"trial $trial cnt")
      }
    }
  }

  test("TopKPerGroup vs sort-and-take per group on random data") {
    import spark.implicits._
    val row: Gen[(Int, Int)] = Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 100))
    (0 until 10).foreach { trial =>
      val k = 1 + trial % 5
      val d = sample(Gen.listOfN(200, row), 300L + trial)
        .zipWithIndex.map { case ((g, v), i) => (g, v, i) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val dfTop = d.toDF("g", "v", "id")
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      assert(dfTop.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val got = dfTop.collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      val exp = d.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
          .map { case ((_, v, id), i) => (g, v, id, i + 1) }
      }.toSet
      assert(got == exp, s"trial $trial k=$k")
    }
  }
}
