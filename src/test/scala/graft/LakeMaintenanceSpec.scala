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

  test("compaction preserves evolved columns on mixed-schema partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft_lake_evcompact").toString + "/lake"
    val docs = Tables.documents(spark, sf)
    // One partition dir holding v1 files (no `source`) and v2 files (with it).
    docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "n_chars")
      .repartition(4).write.partitionBy("lang").parquet(root)
    docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars", "source")
      .repartition(4).write.mode("append").partitionBy("lang").parquet(root)
    val before = spark.read.option("mergeSchema", "true").parquet(root)
    val beforeRows = before.count()
    val beforeWithSource = before.filter(col("source").isNotNull).count()
    assert(beforeWithSource > 0)

    LakeMaintenance.compact(spark, root)

    val after = spark.read.option("mergeSchema", "true").parquet(root)
    assert(after.columns.toSet == Set("doc_id", "lang", "n_chars", "source"))
    assert(after.count() == beforeRows)
    // the evolved column survives the rewrite with its values intact
    assert(after.filter(col("source").isNotNull).count() == beforeWithSource)
  }

  test("interrupted swap recovers: rollback before commit, roll-forward after") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft_lake_crash").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def freshLake(name: String): (String, Long) = {
      val root = s"$base/$name"
      Tables.documents(spark, sf).repartition(6)
        .write.partitionBy("lang").parquet(root)
      (root, spark.read.parquet(root).count())
    }

    // Crash state A: originals moved aside, NO commit marker (phase-2 never
    // ran). A rerun must roll back: restore originals, drop tmp.
    val (rootA, rowsA) = freshLake("rollback")
    val dirA = fs.listStatus(new Path(rootA))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".")).head.getPath
    val tmpA = new Path(dirA.getParent, s".${dirA.getName}_compact_tmp")
    val asideA = new Path(dirA.getParent, s".${dirA.getName}_compact_old")
    spark.read.parquet(dirA.toString).coalesce(1).write.parquet(tmpA.toString)
    fs.mkdirs(asideA)
    fs.listStatus(dirA).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new Path(asideA, f.getPath.getName)))
    assert(fs.listStatus(dirA).count(_.getPath.getName.endsWith(".parquet")) == 0)

    LakeMaintenance.compact(spark, rootA)
    assert(!fs.exists(asideA) && !fs.exists(tmpA))
    assert(spark.read.parquet(rootA).count() == rowsA)

    // Crash state B: marker written, some compacted files still stuck in tmp.
    // A rerun must roll forward: finish the move, drop originals.
    val (rootB, rowsB) = freshLake("rollfwd")
    val dirB = fs.listStatus(new Path(rootB))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".")).head.getPath
    val tmpB = new Path(dirB.getParent, s".${dirB.getName}_compact_tmp")
    val asideB = new Path(dirB.getParent, s".${dirB.getName}_compact_old")
    spark.read.parquet(dirB.toString).coalesce(1).write.parquet(tmpB.toString)
    fs.mkdirs(asideB)
    fs.listStatus(dirB).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new Path(asideB, f.getPath.getName)))
    fs.create(new Path(tmpB, "_committed")).close()

    LakeMaintenance.compact(spark, rootB)
    assert(!fs.exists(asideB) && !fs.exists(tmpB))
    assert(spark.read.parquet(rootB).count() == rowsB)
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

  test("compact refuses bucketed-table file layouts BEFORE touching any leaf") {
    // Bucket identity lives in the file NAME (_NNNNN before .c000); a
    // coalesce rewrite would silently unbucket the table and break
    // every zero-exchange join planned against it. The guard is a
    // pre-pass: a mixed root (plain fragmented leaf + bucketed leaf)
    // must fail with the PLAIN leaf untouched, never half-compacted.
    val root = java.nio.file.Files.createTempDirectory("graft_bucket_guard").toString + "/t"
    Tables.orders(spark, sf).limit(100).repartition(4).write.parquet(s"$root/k=plain")
    Tables.orders(spark, sf).limit(10).coalesce(1).write.parquet(s"$root/k=bucketed")
    val bf = new java.io.File(s"$root/k=bucketed").listFiles
      .find(_.getName.endsWith(".parquet")).get
    assert(bf.renameTo(new java.io.File(s"$root/k=bucketed",
      "part-00000-0a1b2c3d_00003.c000.snappy.parquet")))
    val plainBefore = new java.io.File(s"$root/k=plain").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val e = intercept[IllegalArgumentException] {
      graft.sources.LakeMaintenance.compact(spark, root)
    }
    assert(e.getMessage.contains("bucket"))
    val plainAfter = new java.io.File(s"$root/k=plain").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(plainAfter == plainBefore, "pre-pass guard must leave the plain leaf untouched")
  }
}
