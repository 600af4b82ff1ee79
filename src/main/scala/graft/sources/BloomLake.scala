package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Parquet split-block bloom filters: the point-predicate complement to
  * [[ZoneMap]].
  *
  * Zone maps ([min,max] per file) prune RANGE predicates, but only on the
  * column the data is clustered by — on any other high-cardinality column
  * every zone spans nearly the full domain and min/max excludes nothing.
  * That is exactly the lookup a curation pipeline runs all day ("fetch
  * every order of ONE customer", "fetch ONE document lineage id") against
  * a lake clustered by time or by primary key. The parquet format's
  * split-block bloom filters (parquet-format BloomFilter.md; written by
  * parquet-mr when `parquet.bloom.filter.enabled#col` is set) answer
  * point membership per ROW GROUP with no false negatives: "definitely
  * absent" row groups are skipped without touching their pages.
  *
  * Spark wires both halves natively — the writer option flows through
  * `spark.write.option(...)`, and the vectorized reader's row-group
  * filtering (stats, dictionary, bloom) applies pushed equality
  * predicates before decoding — so this file only adds (a) the write
  * convention and (b) a footer-level probe that makes the pruning
  * decision OBSERVABLE, so specs and the correctness gate can assert
  * "bloom filters were written and they excluded row groups" instead of
  * trusting the reader silently.
  *
  * Scale shape: the probe reads footer metadata + one bloom bitset
  * (kilobytes) per row group — O(row groups), never data pages; the same
  * planning-cost class as the zone-map stats table. At 100 TB the driver
  * never does this per-query — the reader applies blooms inside each
  * task — the probe exists for evidence and for offline "would this key
  * hit?" tooling.
  */
object BloomLake {

  /** One point-probe over every row group's bloom filter.
    *
    * @param nRowGroups    row groups across all data files
    * @param nBloomPresent row groups that carry a bloom filter on the column
    * @param nMaybe        row groups the probe could NOT exclude ("might
    *                      contain" + any group without a bloom filter —
    *                      absence means no exclusion, never a skip)
    */
  final case class BloomProbe(nRowGroups: Int, nBloomPresent: Int, nMaybe: Int)

  /** Write `df` as parquet with a split-block bloom filter on `bloomCol`.
    * `expectedNdv` sizes the bitset (parquet-mr derives bytes from the
    * target false-positive rate at that cardinality); oversizing is
    * wasted kilobytes, undersizing inflates the false-positive rate —
    * both are safe, neither loses rows.
    *
    * Dictionary encoding is disabled for `bloomCol` only: parquet-mr
    * SKIPS the bloom when a column chunk ends up fully
    * dictionary-encoded (the dictionary already answers exact
    * membership), which is what happens to every column at
    * test-fixture row counts. At production row-group sizes a
    * high-cardinality key overflows the dictionary page and gets its
    * bloom regardless; pinning plain encoding makes the written
    * artifact the same shape at every scale.
    */
  def write(df: DataFrame, path: String, bloomCol: String, expectedNdv: Long): Unit =
    df.write.options(writerOptions(bloomCol, expectedNdv)).parquet(path)

  /** The writer options as a map — the ONE definition both ingest and
    * maintenance use. Bloom filters are write-time artifacts: any rewrite
    * of the lake (compaction, backfill) that omits these silently drops
    * them, so `LakeMaintenance.compact(..., writerOptions = ...)` takes
    * this map through the rewrite.
    */
  def writerOptions(bloomCol: String, expectedNdv: Long): Map[String, String] = Map(
    s"parquet.bloom.filter.enabled#$bloomCol" -> "true",
    s"parquet.bloom.filter.expected.ndv#$bloomCol" -> expectedNdv.toString,
    s"parquet.enable.dictionary#$bloomCol" -> "false")

  /** Probe every row group's bloom filter for a long `value`. Driver-side
    * footer metadata walk — O(row groups), no data pages (see class doc).
    */
  def probeLong(spark: SparkSession, path: String, colName: String, value: Long): BloomProbe =
    probe(spark, listParquet(spark, path), colName)(bf => bf.hash(value))

  /** String-key variant — the content-address lookup ("which row groups
    * could hold THIS sha?") over BINARY/UTF8 columns.
    */
  def probeString(spark: SparkSession, path: String, colName: String, value: String): BloomProbe =
    probe(spark, listParquet(spark, path), colName)(bf =>
      bf.hash(org.apache.parquet.io.api.Binary.fromString(value)))

  /** Explicit-file-list variant: the composition hook — a planner that
    * has already pruned to a candidate file set (partition dirs, zone
    * maps) probes ONLY the survivors, so the tiers multiply
    * (`ZoneMap.prunedScanThreeTier`).
    */
  def probeLongAt(spark: SparkSession, files: Seq[String], colName: String,
      value: Long): BloomProbe =
    probe(spark, files.map(new Path(_)), colName)(bf => bf.hash(value))

  /** Which of `files` might contain `colName = value` — the planning
    * filter of the three-tier scan. Small candidate sets (<= driverMax,
    * the common case once partitions and zones have pruned) walk
    * footers on the driver; larger sets fan the walk out as one Spark
    * job (a footer+bitset read per file, no data pages), so planning
    * cost scales with the CLUSTER, not the driver, when a predicate is
    * too weak for the earlier tiers. Executor-side filesystem access
    * uses `new Configuration()` — the standard deployment contract
    * (core-site.xml/hdfs-site.xml on the executor classpath, exactly
    * what spark-submit ships); input order is preserved either way.
    */
  def probeLongWhere(spark: SparkSession, files: Seq[String], colName: String,
      value: Long, driverMax: Int = 64): Seq[String] = {
    if (files.length <= driverMax)
      files.filter(f => probeLongAt(spark, Seq(f), colName, value).nMaybe > 0)
    else {
      val keep = spark.sparkContext
        .parallelize(files, math.min(files.length, 256))
        .mapPartitions { it =>
          val conf = new org.apache.hadoop.conf.Configuration()
          it.filter { f =>
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf))
            try {
              reader.getFooter.getBlocks.asScala.exists { block =>
                val cc = block.getColumns.asScala
                  .find(_.getPath.toDotString == colName)
                  .getOrElse(sys.error(s"column $colName not found in $f"))
                val bf = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
                bf == null || bf.findHash(bf.hash(value))
              }
            } finally reader.close()
          }
        }.collect().toSet
      files.filter(keep)
    }
  }

  private def listParquet(spark: SparkSession, path: String): Seq[Path] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_")).toSeq
  }

  private def probe(spark: SparkSession, files: Seq[Path], colName: String)(
      hashOf: org.apache.parquet.column.values.bloomfilter.BloomFilter => Long): BloomProbe = {
    val conf = spark.sessionState.newHadoopConf()
    var groups = 0; var present = 0; var maybe = 0
    files.foreach { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          groups += 1
          val cc = block.getColumns.asScala.find(_.getPath.toDotString == colName)
            .getOrElse(sys.error(s"column $colName not found in $p"))
          val bf = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
          if (bf == null) { maybe += 1 } // no bloom -> cannot exclude
          else {
            present += 1
            if (bf.findHash(hashOf(bf))) maybe += 1
          }
        }
      } finally reader.close()
    }
    BloomProbe(groups, present, maybe)
  }
}
