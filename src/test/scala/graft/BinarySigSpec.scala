package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted binary-signature index's lifecycle beyond the qn34b
  * hash gate: in-flight parity, O(new) appends with bit-identical
  * encoding, the compaction rebalance as a deterministic fixpoint, the
  * IndexSwap crash polarity, and the loud width/NULL guard.
  */
class BinarySigSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.BinarySig

  test("persisted signature probe replays qn34 bit-exactly") {
    val path = graft.operators.Similarity.newIndexDir()
    BinarySig.buildBinIndex(spark, sf, path)
    val persisted = BinarySig.probeBinIndex(spark, sf, path, 5)
      .collect().map(_.toString).toSeq
    val inFlight = SparkEntry.queries("qn34_ann_binary_hamming")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(persisted == inFlight)
  }

  test("append signs new vectors bit-identically; a planted near-copy is found; old cells untouched") {
    val path = graft.operators.Similarity.newIndexDir()
    BinarySig.buildBinIndex(spark, sf, path)
    val codesBefore = spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes")).count()
    // Near-copy of probe 3 with one dim nudged (same signs): identical
    // signature -> Hamming 0 -> must surface as probe 3's top refined
    // neighbor.
    val planted = Tables.embeddings(spark, sf).filter(col("vec_id") === 3)
      .select(lit(66666L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x.cast("double") * 1.01).cast("float")).otherwise(x)).as("embedding"))
    BinarySig.appendToBinIndex(spark, planted, path)
    assert(spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes")).count() == codesBefore + 1)
    // The appended signature equals the in-flight fold of the same
    // vector (parameter-free encoder — nothing to freeze, nothing to
    // drift).
    val storedSig = spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes"))
      .filter(col("vec_id") === 66666L).head().getAs[Long]("sig")
    val flightSig = planted
      .select(graft.operators.BinarySig.sigCol(col("embedding")).as("sig"))
      .head().getLong(0)
    assert(storedSig == flightSig)
    val top = BinarySig.probeBinIndex(spark, sf, path, 5)
      .filter(col("qid") === 3 && col("rnk") === 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 66666L,
      s"planted near-copy not probe 3's top neighbor: ${top.mkString}")
  }

  test("rebalance compacts the grown index and is a deterministic fixpoint") {
    val path = graft.operators.Similarity.newIndexDir()
    BinarySig.buildBinIndex(spark, sf, path)
    val extra = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    BinarySig.appendToBinIndex(spark, extra, path)
    BinarySig.rebalanceBinIndex(spark, path)
    val codes1 = spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes"))
      .collect().map(_.toString).sorted.toSeq
    BinarySig.rebalanceBinIndex(spark, path)
    val codes2 = spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes"))
      .collect().map(_.toString).sorted.toSeq
    assert(codes1 == codes2, "rebalance is not a fixpoint")
    assert(codes1.length == spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "vectors")).count().toInt,
      "codes and cold tiers diverged")
    assert(BinarySig.probeBinIndex(spark, sf, path, 5).count() == 50)
  }

  test("interrupted rebuild heals: a partial stage is dropped; the live index is untouched") {
    import org.apache.hadoop.fs.Path
    val path = graft.operators.Similarity.newIndexDir()
    BinarySig.buildBinIndex(spark, sf, path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(s"$path/.stage/codes"))
    fs.create(new Path(s"$path/.stage/codes/part-junk.parquet"), true).close()
    val before = spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes"))
      .collect().map(_.toString).sorted.toSeq
    BinarySig.recoverBinRebalance(spark, path)
    assert(!fs.exists(new Path(s"$path/.stage")))
    assert(spark.read.parquet(graft.operators.IndexSwap.side(spark, path, "codes"))
      .collect().map(_.toString).sorted.toSeq == before, "rollback touched the live index")
  }

  test("width mismatch and NULL elements fail loudly, never sign deficient bits") {
    import spark.implicits._
    def rootMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val path = graft.operators.Similarity.newIndexDir()
    BinarySig.buildBinIndex(spark, sf, path)
    val short = Seq((99991L, Seq(1.0f, -2.0f))).toDF("vec_id", "embedding")
    val e1 = intercept[Throwable] { BinarySig.appendToBinIndex(spark, short, path) }
    assert(rootMessages(e1).contains("embedding width"), rootMessages(e1))
    val withNull = Seq((99992L, (0 until 64).map(d =>
      if (d == 7) null else java.lang.Float.valueOf(d.toFloat)))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val e2 = intercept[Throwable] { BinarySig.appendToBinIndex(spark, withNull, path) }
    assert(rootMessages(e2).contains("NULL element") || rootMessages(e2).contains("!= 64"),
      rootMessages(e2))
  }
}
