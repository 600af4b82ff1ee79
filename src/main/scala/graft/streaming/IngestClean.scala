package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Observation, SaveMode, SparkSession}
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
  * whitespace tokens (NULL text fails the gate — predicates are
  * null-safe on BOTH sides, so a NULL-text row is dropped AND lands in
  * the quarantine tagged 'quality', never silently lost between two
  * three-valued filters); exact = normalized text seen before
  * (in-batch: keep lowest (us, doc_id)); near = shares any MinHash band
  * with an indexed doc (the LSH candidate rule — deliberately the
  * recall-side approximation; verification-grade J >= p/q runs in the
  * batch engine when the workload needs it).
  *
  * Job discipline: the per-stage counts ride the lake-write pass as
  * `observe` metrics — a micro-batch executes TWO actions (lake append +
  * index append; the optional quarantine and zone refresh each add their
  * own), never a `.count()` per stage. The in-batch near check is a
  * per-band window (min arrival per band), not a band self-join — linear
  * in a hot band's bucket size where the self-join was quadratic.
  */
object IngestClean {

  final case class BatchStats(in: Long, quality: Long, exactNovel: Long, appended: Long)

  private def nrm(c: Column) =
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
    // Null-safe on BOTH polarities: under ANSI semantics
    // size(split(trim(NULL))) is NULL, so filter(p) AND filter(!p) each
    // drop the row — it would vanish with no quarantine record.
    val qualityOk = coalesce(size(split(trim(col("text")), "\\s+")) >= minTokens, lit(false))

    // The exact-dedup spine, built twice from `batch`: once UNOBSERVED
    // (feeding the band/dup analysis and the quarantine tags, which run
    // as their own actions and must not re-fire the lake write's
    // observations) and once OBSERVED (the lake-write lineage, where one
    // pass collects every stage count for free).
    def spine(qualityRows: DataFrame): (DataFrame, DataFrame) = {
      val withRn = qualityRows.withColumn("nrm", nrm(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("nrm").orderBy(col("us").asc, col("doc_id").asc)))
      (withRn, withRn.filter(col("rn") === 1).drop("rn"))
    }

    val lakeExists = pathExists(spark, lakeDir)
    // cache(), not localCheckpoint: no eager job; the first pass through
    // job 1 materializes it, the quarantine pass (when enabled) reuses it
    // instead of re-scanning + re-distincting the whole lake.
    val lakeNrm: Option[DataFrame] =
      if (!lakeExists) None
      else Some(spark.read.parquet(lakeDir).select(col("nrm")).distinct().cache())
    def novel(firstPerNrm: DataFrame): DataFrame = lakeNrm match {
      case None => firstPerNrm
      case Some(nrms) => firstPerNrm.join(nrms, Seq("nrm"), "left_anti")
    }

    val (withRn, inBatchFirst) = spine(batch.filter(qualityOk))
    val exactNovel = novel(inBatchFirst)
    try {

    // Near-dup doc_ids, decided per band WITHOUT a self-join: a doc is an
    // in-batch near-dup iff some band it occupies saw an earlier arrival
    // (min (us, doc_id) over the band partition — linear where the
    // band⋈band join was quadratic in a hot bucket), and a lake near-dup
    // iff any of its bands is in the persisted index (left join a marker
    // on the distinct index bands). Same verdicts as the join
    // formulation: if any earlier y shares a band, that band's min ≤ y.
    val banded = StreamDedup.banded(exactNovel.select("doc_id", "text", "us")).toDF()
    val indexExists = pathExists(spark, indexDir)
    val withIdx =
      if (!indexExists) banded.withColumn("idx_hit", lit(0))
      else banded.join(
        spark.read.parquet(indexDir).select(col("band")).distinct()
          .withColumn("idx_hit", lit(1)),
        Seq("band"), "left")
    val arrival = struct(col("us"), col("doc_id"))
    val dupIds = withIdx
      .withColumn("band_first", min(arrival).over(Window.partitionBy("band")))
      .groupBy(col("doc_id"), col("us"))
      .agg(max(col("idx_hit")).as("lake_hit"), min(col("band_first")).as("earliest"))
      .filter(coalesce(col("lake_hit"), lit(0)) === 1 || col("earliest") < arrival)
      .select(col("doc_id"))

    // Audit trail FIRST — before the lake append: every dropped row
    // lands in the quarantine with the stage that rejected it — the
    // answer to "why is doc X not in the lake?" without re-running the
    // pipeline. Ordering matters: the append below fires Spark's
    // recacheByPath, refreshing every cached relation over lakeDir —
    // including lakeNrm — to a listing that CONTAINS this batch's own
    // survivors; a post-append quarantine would then mis-tag every
    // survivor as its own exact_dup. Stage tags are ROW-level (the
    // quality tag re-evaluates the null-safe predicate; the exact tags
    // come from the rn>1 frame and the cached lake-nrm semi-join), so
    // two same-doc_id rows in one batch each get their own verdict.
    // Layout is uniformly Hive-partitioned by batch: with `batchId` set
    // (the foreachBatch id) each attempt OVERWRITES its own batch=<id>
    // partition, so a replay after a partial failure leaves one record
    // per decision — the log reflects the LAST attempt's view (a doc
    // both in the lake and logged exact_dup is a replay artifact; the
    // lake row wins). Without a batchId, drops append under batch=-1 —
    // same directory shape, so the quarantine always reads as ONE
    // partitioned table (mixing bare files with batch= dirs would split
    // it into conflicting layouts Spark refuses to read together).
    quarantineDir.foreach { qd =>
      def tagged(df: DataFrame, reason: String) =
        df.select(col("doc_id"), col("text"), col("us"))
          .withColumn("reason", lit(reason))
      val droppedQuality = tagged(batch.filter(!qualityOk), "quality")
      val inBatchDups = tagged(withRn.filter(col("rn") > 1), "exact_dup")
      val lakeDups = lakeNrm.map(nrms =>
        tagged(inBatchFirst.join(nrms, Seq("nrm"), "left_semi"), "exact_dup"))
      val droppedNear = tagged(exactNovel.join(dupIds, Seq("doc_id"), "left_semi"), "near_dup")
      val log = Seq(Some(droppedQuality), Some(inBatchDups), lakeDups, Some(droppedNear))
        .flatten.reduce(_ unionByName _)
      val mode = if (batchId >= 0) SaveMode.Overwrite else SaveMode.Append
      log.write.mode(mode).parquet(s"$qd/batch=$batchId")
    }

    // The observed lake-write lineage: every stage count rides this ONE
    // pass as a CollectMetrics node (no per-stage .count() actions). The
    // dup analysis joins in UNOBSERVED, so each observation appears
    // exactly once in the plan.
    val obsIn = Observation(); val obsQuality = Observation()
    val obsNovel = Observation(); val obsApp = Observation()
    val (_, inBatchFirstObs) = spine(
      batch.observe(obsIn, count(lit(1)).as("n"))
        .filter(qualityOk).observe(obsQuality, count(lit(1)).as("n")))
    val survivors = novel(inBatchFirstObs).observe(obsNovel, count(lit(1)).as("n"))
      .join(dupIds, Seq("doc_id"), "left_anti")
      .observe(obsApp, count(lit(1)).as("n"))
    val hadoopConf = spark.sessionState.newHadoopConf()
    val lakePath = new org.apache.hadoop.fs.Path(lakeDir)
    def lakeFiles(): Set[String] =
      if (!pathExists(spark, lakeDir)) Set.empty
      else graft.sources.LakeListing.dataFiles(hadoopConf, lakePath).map(_.toString).toSet
    val preAppend = lakeFiles()
    survivors.write.mode(SaveMode.Append).parquet(lakeDir)

    // Index append — LAKE-FIRST for crash consistency (a crash here
    // leaves lake rows the next batch still exact-dedups; index-first
    // would leave phantom bands that suppress their own replay forever).
    // The band rows derive from the files THIS append added (an fs
    // listing diff — manifest-class, like the zone refresh), not from
    // the survivors frame: after the append, recacheByPath has refreshed
    // lakeNrm, so re-running the survivors lineage would anti-join the
    // batch against itself and index nothing.
    val newFiles = (lakeFiles() -- preAppend).toSeq.sorted
    if (newFiles.nonEmpty) {
      val appended = spark.read.option("basePath", lakeDir).parquet(newFiles: _*)
      StreamDedup.banded(appended.select("doc_id", "text", "us")).toDF()
        .select("band", "doc_id")
        .write.mode(SaveMode.Append).parquet(indexDir)
    }
    zoneStatsPath.foreach { sp =>
      if (pathExists(spark, lakeDir))
        graft.sources.ZoneMap.refreshStats(spark, lakeDir, sp, zoneCols): Unit
    }
    BatchStats(
      obsIn.get("n").asInstanceOf[Long],
      obsQuality.get("n").asInstanceOf[Long],
      obsNovel.get("n").asInstanceOf[Long],
      obsApp.get("n").asInstanceOf[Long])
    // The finally matters: a transient failure in any write above must
    // not leave the corpus-sized lake-nrm distinct pinned in storage
    // memory across foreachBatch retries.
    } finally lakeNrm.foreach(_.unpersist(): Unit)
  }

  /** Repair the band index after the one crash window [[cleanBatch]]
    * cannot self-heal: a failure BETWEEN the lake append and the index
    * append commits survivors to the lake whose bands never reach the
    * index — and the replay can't fill them in, because the replayed
    * rows are exact-dups of their own first write and never reach the
    * index append. Without repair, every future near-dup of those docs
    * passes the band check: silent, unbounded recall loss.
    *
    * The repair is the set difference the crashed batch lost: lake docs
    * absent from the index get their band rows appended. O(lake ⋈
    * index) on doc_id — a startup/periodic maintenance call (run it on
    * recovery before resuming the stream), NOT a per-batch cost.
    * Idempotent: a second call finds nothing missing. Docs that band to
    * nothing (empty token sets) are re-examined each call and re-append
    * nothing — harmless. Returns the number of docs re-indexed. */
  def repairIndex(spark: SparkSession, lakeDir: String, indexDir: String): Long = {
    if (!pathExists(spark, lakeDir)) return 0L
    val lake = spark.read.parquet(lakeDir).select("doc_id", "text", "us")
    val missing =
      if (!pathExists(spark, indexDir)) lake
      else lake.join(spark.read.parquet(indexDir).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    val bands = StreamDedup.banded(missing).toDF()
      .select("band", "doc_id").localCheckpoint(true)
    val n = bands.select("doc_id").distinct().count()
    if (n > 0) bands.write.mode(SaveMode.Append).parquet(indexDir)
    n
  }
}
