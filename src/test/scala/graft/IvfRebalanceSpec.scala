package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index's measured drift answer: the autoRebalance
  * trigger on append (the cleanBatch autoCompact pattern applied to the
  * ANN index), the in-place re-cluster it fires, and the two-phase swap
  * that makes the rewrite crash-safe.
  */
class IvfRebalanceSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.Similarity

  /** A drift flood: `count` near-identical vectors around one direction
    * (10 sub-directions so a re-cluster CAN split them), ids offset to
    * 50000+. Under the build-time centroids they all land in one cell.
    */
  private def drift(count: Int) = {
    import spark.implicits._
    (0 until count).map { i =>
      val sub = i % 10
      val base = Array.tabulate(64)(d => math.cos(0.05 * d).toFloat)
      base(0) = (base(0) + 0.005f * sub + 0.00001f * i)
      (50000L + i, base.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("autoRebalance trigger: a drift flood skews one cell, the measured trigger restores balance") {
    val path = Similarity.newIndexDir()
    Similarity.buildIvfIndex(spark, sf, 16, path)
    val before = Similarity.ivfCellStats(spark, path)
    val total0 = before.values.sum

    // Flood WITHOUT the trigger: the drift concentrates.
    Similarity.appendToIvfIndex(spark, drift(200), path)
    val skewed = Similarity.ivfCellStats(spark, path)
    val meanSkewed = skewed.values.sum.toDouble / 16
    assert(skewed.values.max > 4 * meanSkewed,
      s"fixture did not skew: max=${skewed.values.max} mean=$meanSkewed")

    // One more appended batch WITH the trigger: it must fire and the
    // re-cluster must spread the hot mass.
    Similarity.appendToIvfIndex(spark,
      drift(40).select((col("vec_id") + 10000).as("vec_id"), col("embedding")), path,
      autoRebalance = Some(4))
    val after = Similarity.ivfCellStats(spark, path)
    val nCells = after.size
    val meanAfter = after.values.sum.toDouble / nCells
    assert(after.values.sum == total0 + 200 + 40, "rebalance lost or duplicated rows")
    assert(after.values.max <= 4 * meanAfter,
      s"trigger did not restore balance: max=${after.values.max} mean=$meanAfter cells=$nCells")
    // sqrt(N) adaptation: the rebuilt index has more cells than the
    // 16-cell build (N grew to ~440).
    assert(nCells > 16, s"cell count did not adapt: $nCells")

    // Post-rebalance the index is still a valid probe target.
    val probed = Similarity.probeIvfIndex(spark, sf, path, 4, 5)
    val rows = probed.collect()
    assert(rows.length == 50 && rows.forall(_.getLong(2) >= 0))

    // Every lake row's stored cent_id IS the argmax-cosine assignment
    // against the rebuilt centroids (full check at fixture size).
    val lake = spark.read.parquet(s"$path/vectors")
    val cents = spark.read.parquet(s"$path/centroids")
    import graft.functions.VectorExprs.dotNative
    import graft.functions.TextFns.{cosine, e6}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cscore").desc, col("cent_id").asc)
    val expected = lake.select(col("vec_id"), col("embedding"), col("nrm"))
      .join(broadcast(cents), expr("true"))
      .select(col("vec_id"), col("cent_id"),
        e6(cosine(dotNative(col("ce"), col("embedding")), col("cn"), col("nrm"))).as("cscore"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("expected_cent"))
    val mismatches = lake.select(col("vec_id"), col("cent_id").cast("long").as("stored_cent"))
      .join(expected, Seq("vec_id"))
      .filter(col("stored_cent") =!= col("expected_cent")).count()
    assert(mismatches == 0, s"$mismatches rows mis-assigned after rebalance")
  }

  test("rebalance is deterministic: a second run over the same lake is a fixpoint") {
    val path = Similarity.newIndexDir()
    Similarity.buildIvfIndex(spark, sf, 16, path)
    Similarity.rebalanceIvfIndex(spark, path)
    val cents1 = spark.read.parquet(s"$path/centroids")
      .collect().map(_.getLong(0)).sorted.toSeq
    val stats1 = Similarity.ivfCellStats(spark, path)
    Similarity.rebalanceIvfIndex(spark, path)
    val cents2 = spark.read.parquet(s"$path/centroids")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(cents1 == cents2, "re-clustering the same lake picked different seeds")
    assert(Similarity.ivfCellStats(spark, path) == stats1)
  }

  test("streaming vector ingest: foreachBatch append maintains the index, trigger fires mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = Similarity.newIndexDir()
    Similarity.buildIvfIndex(spark, sf, 16, path)
    val total0 = Similarity.ivfCellStats(spark, path).values.sum
    val cells0 = Similarity.ivfCellStats(spark, path).size

    // appendToIvfIndex IS the micro-batch primitive: a vector stream
    // maintains the persisted index through foreachBatch, and the
    // measured rebalance trigger runs inside the stream — no separate
    // maintenance job to schedule.
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          Similarity.appendToIvfIndex(b.sparkSession, b, path, autoRebalance = Some(4))
      }.start()
    try {
      val driftRows = drift(200).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      driftRows.grouped(50).foreach { batch => ms.addData(batch.toSeq); q.processAllAvailable() }
    } finally q.stop()

    val after = Similarity.ivfCellStats(spark, path)
    assert(after.values.sum == total0 + 200, "stream lost or duplicated vectors")
    // The drift concentrated in one cell; the in-stream trigger must
    // have re-clustered (adapted cell count) and restored balance.
    assert(after.size > cells0, s"trigger never fired in-stream: cells=${after.size}")
    val mean = after.values.sum.toDouble / after.size
    assert(after.values.max <= 4 * mean,
      s"stream left the index skewed: max=${after.values.max} mean=$mean")
    assert(Similarity.probeIvfIndex(spark, sf, path, 4, 5).count() == 50)
  }

  test("interrupted swap heals: marker present rolls forward, absent rolls back") {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    def fsOf(p: String) = new Path(p).getFileSystem(conf)

    // ROLL BACK: tmp dirs with no marker are a failed write — dropped.
    val p1 = Similarity.newIndexDir()
    Similarity.buildIvfIndex(spark, sf, 16, p1)
    val fs1 = fsOf(p1)
    fs1.mkdirs(new Path(s"$p1/.vectors_rebal_tmp"))
    fs1.create(new Path(s"$p1/.vectors_rebal_tmp/part-junk.parquet"), true).close()
    val beforeStats = Similarity.ivfCellStats(spark, p1)
    Similarity.recoverRebalance(spark, p1)
    assert(!fs1.exists(new Path(s"$p1/.vectors_rebal_tmp")))
    assert(Similarity.ivfCellStats(spark, p1) == beforeStats, "rollback touched the live index")

    // ROLL FORWARD: live dirs already set aside, tmps + marker present
    // (the state a crash right after the asides leaves). Recovery must
    // complete the swap and the index must keep working.
    val p2 = Similarity.newIndexDir()
    Similarity.buildIvfIndex(spark, sf, 16, p2)
    val fs2 = fsOf(p2)
    // Stage a "new" index in the tmps: here, a byte-copy of the live one.
    def copyDir(src: Path, dst: Path): Unit = {
      fs2.mkdirs(dst)
      fs2.listStatus(src).foreach { st =>
        if (st.isDirectory) copyDir(st.getPath, new Path(dst, st.getPath.getName))
        else org.apache.hadoop.fs.FileUtil.copy(fs2, st.getPath, fs2,
          new Path(dst, st.getPath.getName), false, conf): Unit
      }
    }
    copyDir(new Path(s"$p2/vectors"), new Path(s"$p2/.vectors_rebal_tmp"))
    copyDir(new Path(s"$p2/centroids"), new Path(s"$p2/.centroids_rebal_tmp"))
    val statsBefore = Similarity.ivfCellStats(spark, p2)
    require(fs2.rename(new Path(s"$p2/vectors"), new Path(s"$p2/.vectors_rebal_old")))
    require(fs2.rename(new Path(s"$p2/centroids"), new Path(s"$p2/.centroids_rebal_old")))
    fs2.create(new Path(s"$p2/.rebal_committed"), true).close()
    Similarity.recoverRebalance(spark, p2)
    Seq(".vectors_rebal_tmp", ".centroids_rebal_tmp", ".vectors_rebal_old",
      ".centroids_rebal_old", ".rebal_committed").foreach(d =>
      assert(!fs2.exists(new Path(s"$p2/$d")), s"leftover $d after roll-forward"))
    assert(Similarity.ivfCellStats(spark, p2) == statsBefore)
    assert(Similarity.probeIvfIndex(spark, sf, p2, 4, 5).count() == 50)
  }
}
