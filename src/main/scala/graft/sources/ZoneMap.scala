package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a per-file min/max stats table enabling
  * data-skipping scans — the lakehouse planning trick (Delta/Iceberg
  * file stats) on plain parquet directories.
  *
  * Parquet already row-group-prunes WITHIN a file via footer statistics,
  * but at 100 TB a selective query still pays an open+footer-read per
  * file (millions of S3 GETs) before it can skip anything. A zone-map
  * table inverts that: planning reads ONE small parquet table (KBs per
  * million files), selects the files whose [min,max] intersects the
  * predicate, and hands only those to the scan. The driver-side collect
  * is O(file count) — the same class as a backfill manifest, not data.
  *
  * The pruned scan is semantically lossless by construction: candidate
  * files are a superset of matching files (zone overlap is necessary
  * for a row match), and the row predicate is re-applied after the scan
  * — so pruning can only skip I/O, never change results
  * (ZoneMapSpec proves pruned == full-scan-filtered).
  */
object ZoneMap {

  /** One scan pass computing per-file [min,max] for `cols`; the stats
    * table is written to `statsPath`. Re-run after appends/compaction
    * (stats are per-file, so a rewrite is a full refresh — at the lake,
    * refresh per-partition as partitions land). */
  def writeStats(spark: SparkSession, dataDir: String, statsPath: String,
                 cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // stats are KBs; one file keeps planning to one read
      .write.mode("overwrite").parquet(statsPath)
  }

  /** A scan result plus its pruning accounting. */
  final case class Pruned(df: DataFrame, nFilesTotal: Long, nFilesRead: Long)

  /** Scan only the files whose zone for `column` intersects [lo, hi].
    * The row-level predicate is re-applied, so the result is identical
    * to a full scan + filter; only the I/O differs. */
  def prunedScan(spark: SparkSession, dataDir: String, statsPath: String,
                 column: String, lo: Any, hi: Any): Pruned = {
    val stats = spark.read.parquet(statsPath)
    val nTotal = stats.count()
    val keep = stats
      .filter(col(s"min_$column") <= lit(hi) && col(s"max_$column") >= lit(lo))
      .select("file").collect().map(_.getString(0))
    val rowPred = col(column) >= lit(lo) && col(column) <= lit(hi)
    // basePath keeps Hive partition columns (year=/month=) bound when
    // reading an explicit file subset out of a partitioned lake —
    // without it, Spark drops the directory-derived columns.
    val df =
      if (keep.isEmpty) spark.read.parquet(dataDir).where(lit(false))
      else spark.read.option("basePath", dataDir)
        .parquet(keep.toIndexedSeq: _*).filter(rowPred)
    Pruned(df, nTotal, keep.length)
  }
}
