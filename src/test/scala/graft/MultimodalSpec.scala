package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("metadata-only catalog query never reads the payload column") {
    // The binary payload must be pruned out of the scan: the optimized
    // plan's parquet ReadSchema should not mention `text` (the payload
    // source column) — only doc_id/n_chars/source survive.
    val df = SparkEntry.queries("qm01_asset_catalog")(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("ReadSchema"), "expected a file scan leaf")
    assert(!scan.matches("(?s).*ReadSchema:[^\\n]*\\btext\\b.*"),
      s"payload source column not pruned from scan:\n$scan")
  }

  test("decode stage is deterministic and matches the kernel directly") {
    val decoded = Multimodal.decode(Multimodal.assets(spark, sf))
      .collect().map(d => d.asset_id -> (d.f0, d.f1, d.f2, d.f3)).toMap
    val direct = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val f = Multimodal.Codec.decodeFeatures(r.getString(1).getBytes("UTF-8"))
        r.getLong(0) -> (f(0), f(1), f(2), f(3))
      }.toMap
    assert(decoded == direct)
  }

  test("frame sampling fans out one row per second of video") {
    val n = SparkEntry.queries("qm03_frame_sample")(spark, sf).count()
    val expected = Multimodal.assets(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select(org.apache.spark.sql.functions.expr("meta.duration_ms div 1000"))
      .collect().map(_.getLong(0)).filter(_ >= 1).sum
    assert(n == expected)
  }

  test("batchInfer invokes the model once per batch, never over batch size") {
    val acc = spark.sparkContext.longAccumulator("batches")
    val a = Multimodal.assets(spark, sf)
    val n = a.count()
    val out = Multimodal.batchInfer(a.repartition(2), 64) { batch =>
      acc.add(1)
      assert(batch.nonEmpty && batch.size <= 64)
      Multimodal.stubModel(batch)
    }.collect()
    assert(out.length == n)
    // 2 partitions of sizes p1 + p2 = n: ceil(p1/64) + ceil(p2/64) batches.
    assert(acc.value >= (n + 63) / 64)
    assert(acc.value <= n / 64 + 2)
  }

  test("batch outputs are row-deterministic across batch sizes") {
    val a = Multimodal.assets(spark, sf)
    val b1 = Multimodal.batchInfer(a, 7)(Multimodal.stubModel).collect().toMap
    val b2 = Multimodal.batchInfer(a, 500)(Multimodal.stubModel).collect().toMap
    assert(b1 == b2)
  }
}
