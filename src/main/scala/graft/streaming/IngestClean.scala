package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming clean-corpus ingest — the qp01 pipeline rearranged for a
  * stream: each micro-batch passes a quality gate, exact-dedups within
  * the batch and against the lake, near-dedups against a PERSISTENT LSH
  * BAND INDEX, and only survivors append to the lake (plus their band
  * rows to the index).
  *
  * The index is the piece that makes this incremental: the lake's LSH
  * band keys live in their own parquet table, so a batch's near-dup
  * check is `batch-bands ⋈ index` — an equi-join whose left side is one
  * micro-batch and whose right side is partition-prunable by band — not
  * a recompute over the whole corpus. This is how production ingest
  * keeps near-dup at O(batch), and it is exactly the state the
  * [[StreamDedup]] buckets hold, persisted instead of in the state
  * store (no horizon: the lake IS the history).
  *
  * Dedup rules (same spine as qp01/qn18): quality = >= minTokens
  * whitespace tokens; exact = normalized text seen before (in-batch:
  * keep lowest (us, doc_id)); near = shares any MinHash band with an
  * indexed doc (the LSH candidate rule — deliberately the recall-side
  * approximation; verification-grade J >= p/q runs in the batch engine
  * when the workload needs it).
  */
object IngestClean {

  final case class BatchStats(in: Long, quality: Long, exactNovel: Long, appended: Long)

  private def nrm(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Existence through the Hadoop FileSystem API (the same resolution
    * [[graft.sources.ZoneMap.refreshStats]] uses) — a `java.io.File`
    * check is always false on HDFS/S3, which would silently skip the
    * lake/index anti-joins and the zone refresh on a non-local lake. */
  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Clean one micro-batch (doc_id, text, us) into `lakeDir`, maintaining
    * `indexDir`. Returns the per-stage survivor counts. Call from
    * `foreachBatch`; idempotence across retries comes from the exact and
    * band checks themselves (a replayed doc is a dup of its own first
    * write).
    *
    * `zoneStatsPath` (optional) keeps a [[graft.sources.ZoneMap]] stats
    * table over the lake as part of the same batch commit: after the
    * append, [[graft.sources.ZoneMap.refreshStats]] scans ONLY the files
    * this batch added (O(batch), never a lake rescan), so selective
    * readers can data-skip a lake that is still ingesting. Refresh
    * crash-safety matches the stats contract: a missed refresh is
    * repaired by the next batch's call (refresh diffs the listing, not
    * the batch). */
  def cleanBatch(spark: SparkSession, batch: DataFrame,
      lakeDir: String, indexDir: String, minTokens: Int = 10,
      zoneStatsPath: Option[String] = None,
      zoneCols: Seq[String] = Seq("doc_id", "us"),
      quarantineDir: Option[String] = None,
      batchId: Long = -1L): BatchStats = {
    val in = batch.count()
    val qualityPred = size(split(trim(col("text")), "\\s+")) >= minTokens
    val quality = batch.filter(qualityPred).withColumn("nrm", nrm(col("text")))
    val nQuality = quality.count()

    // Exact: keep the first arrival per normalized text within the batch,
    // then drop texts the lake already holds. The in-batch dup frame and
    // the lake-nrm frame stay addressable for the quarantine tags; the
    // lake read materializes ONCE when a quarantine will re-consume it.
    val withRn = quality.withColumn("rn", row_number().over(
      Window.partitionBy("nrm").orderBy(col("us").asc, col("doc_id").asc)))
    val inBatchFirst = withRn.filter(col("rn") === 1).drop("rn")
    val lakeExists = pathExists(spark, lakeDir)
    val lakeNrm: Option[DataFrame] =
      if (!lakeExists) None
      else {
        val nrms = spark.read.parquet(lakeDir).select(col("nrm")).distinct()
        Some(if (quarantineDir.nonEmpty) nrms.localCheckpoint(true) else nrms)
      }
    val exactNovel = lakeNrm match {
      case None => inBatchFirst
      case Some(nrms) => inBatchFirst.join(nrms, Seq("nrm"), "left_anti")
    }
    val nExactNovel = exactNovel.count()

    // Near: any band collision with the persisted index. In-batch near
    // dups resolve by arrival order (earlier doc indexes first — here,
    // both sides of the in-batch check come from the same banded frame).
    val banded = StreamDedup.banded(exactNovel.select("doc_id", "text", "us"))
      .toDF().localCheckpoint(true) // read three times below
    val indexExists = pathExists(spark, indexDir)
    val vsLake =
      if (!indexExists) banded.limit(0).select(col("doc_id"))
      else banded.join(spark.read.parquet(indexDir).select(col("band")).distinct(),
        Seq("band"), "left_semi").select(col("doc_id"))
    val vsBatch = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band"))
      .filter(col("y.us") < col("x.us") ||
        (col("y.us") === col("x.us") && col("y.doc_id") < col("x.doc_id")))
      .select(col("x.doc_id").as("doc_id"))
    val nearDup = vsLake.unionByName(vsBatch).distinct()
    val survivors = exactNovel.join(nearDup, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // appended to two tables below

    // Audit trail: every dropped row lands in the quarantine with the
    // stage that rejected it — the answer to "why is doc X not in the
    // lake?" without re-running the pipeline. Stage tags are ROW-level
    // (the quality tag re-evaluates the predicate; the exact tags come
    // from the rn>1 frame and the materialized lake-nrm semi-join), so
    // two same-doc_id rows in one batch each get their own verdict.
    // With `batchId` set (the foreachBatch id), each attempt OVERWRITES
    // its own batch=<id> partition, so a replay after a partial failure
    // leaves one record per decision; the log then reflects the LAST
    // attempt's view — a doc both in the lake and logged exact_dup is a
    // replay artifact (a dup of its own first write; the lake row wins).
    // Without a batchId the log is append-only and replays re-append.
    quarantineDir.foreach { qd =>
      def tagged(df: DataFrame, reason: String) =
        df.select(col("doc_id"), col("text"), col("us"))
          .withColumn("reason", lit(reason))
      val droppedQuality = tagged(batch.filter(!qualityPred), "quality")
      val inBatchDups = tagged(withRn.filter(col("rn") > 1), "exact_dup")
      val lakeDups = lakeNrm match {
        case None => None
        case Some(nrms) =>
          Some(tagged(inBatchFirst.join(nrms, Seq("nrm"), "left_semi"), "exact_dup"))
      }
      val droppedNear = tagged(exactNovel.join(nearDup, Seq("doc_id"), "left_semi"), "near_dup")
      val log = Seq(Some(droppedQuality), Some(inBatchDups), lakeDups, Some(droppedNear))
        .flatten.reduce(_ unionByName _)
      if (batchId >= 0)
        log.write.mode(SaveMode.Overwrite).parquet(s"$qd/batch=$batchId")
      else log.write.mode(SaveMode.Append).parquet(qd)
    }

    survivors.write.mode(SaveMode.Append).parquet(lakeDir)
    StreamDedup.banded(survivors.select("doc_id", "text", "us")).toDF()
      .select("band", "doc_id")
      .write.mode(SaveMode.Append).parquet(indexDir)
    zoneStatsPath.foreach { sp =>
      if (pathExists(spark, lakeDir))
        graft.sources.ZoneMap.refreshStats(spark, lakeDir, sp, zoneCols): Unit
    }
    BatchStats(in, nQuality, nExactNovel, survivors.count())
  }
}
