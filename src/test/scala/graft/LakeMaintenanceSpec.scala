package graft

import graft.sources.LakeMaintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  test("compaction merges fragmented partitions, preserves data, and is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_lake_compact").toString + "/lake"
    // Fragmented lake: 8 files per lang partition.
    Tables.documents(spark, sf)
      .repartition(8)
      .write.partitionBy("lang").parquet(root)
    val before = spark.read.parquet(root)
    val beforeRows = before.count()
    val beforeSum = before.agg(sum("n_chars")).head.getLong(0)
    val beforeLangs = before.select("lang").distinct().count()

    val stats = LakeMaintenance.compact(spark, root) // target >> data -> 1 file each
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.filesBefore >= s.filesAfter)
      assert(s.filesAfter == 1, s) // tiny partitions -> single file
    }

    val after = spark.read.parquet(root)
    assert(after.count() == beforeRows)
    assert(after.agg(sum("n_chars")).head.getLong(0) == beforeSum)
    // lang partition column survives the rewrite
    assert(after.select("lang").distinct().count() == beforeLangs)

    // second run touches nothing
    val again = LakeMaintenance.compact(spark, root)
    again.foreach(s => assert(s.filesBefore == s.filesAfter))
  }

  test("schema evolution: appended columns merge, old rows read as null") {
    val root = java.nio.file.Files.createTempDirectory("graft_lake_evolve").toString + "/lake"
    val docs = Tables.documents(spark, sf)
    // v1 of the lake lacks the `source` column; a later ingest adds it.
    docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "n_chars")
      .write.partitionBy("lang").parquet(root)
    docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars", "source")
      .write.mode("append").partitionBy("lang").parquet(root)
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "source"))
    assert(merged.count() == docs.count())
    // v1 rows surface the evolved column as null; v2 rows keep values.
    assert(merged.filter(col("doc_id") % 2 === 0 && col("source").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") % 2 === 1 && col("source").isNull).count() == 0)
    // pushdown still reaches the scan through the merged schema
    val p = merged.filter(col("n_chars") > 100).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(n_chars,100"), p)
  }
}
