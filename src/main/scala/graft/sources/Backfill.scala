package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP2 — the yearly backfill driver (reference run.py:6-57): discover dump
  * files, organize them into a monthly manifest (latest file per type,
  * checksums joined), then ingest each dump into the lake chronologically.
  *
  * Discovery goes through the Hadoop FileSystem API, so the same code
  * lists `file:/`, `hdfs:/` or `s3a:/` (the reference's anonymous S3
  * listing, s3.py:251-290, is the s3a case with
  * `fs.s3a.aws.credentials.provider=...AnonymousAWSCredentialsProvider`).
  *
  * The manifest is a genuinely relational computation ([[Manifest]]), so
  * it runs as a Spark plan; the per-dump ingest loop is driver-side —
  * months are sequential like the reference, but each dump's parse/write
  * is a fully distributed job.
  */
object Backfill {

  /** Recursively list keys under `base` as a one-column DataFrame
    * (`path`, relative to base) — the FS-agnostic stand-in for the
    * reference's paginated list_objects_v2. */
  def listKeys(spark: SparkSession, base: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val keys = Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map(_.next().getPath.toUri.getPath)
      .toSeq
    val baseUri = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri.getPath
    import spark.implicits._
    keys.map(_.stripPrefix(baseUri).stripPrefix("/")).toDF("path")
  }

  /** Read every CHECKSUM.txt under `base` into (src, line) rows for
    * [[Manifest.organize]], `src` relative to `base` (matching the file
    * listing's key space). */
  def checksumLines(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val rels = listKeys(spark, base).as[String].collect()
      .filter(_.endsWith("CHECKSUM.txt"))
    val frames = rels.map { rel =>
      spark.read.textFile(s"${base.stripSuffix("/")}/$rel").toDF("line")
        .select(lit(rel).as("src"), col("line"))
    }
    frames.reduceOption(_.unionByName(_))
      .getOrElse(Seq.empty[(String, String)].toDF("src", "line"))
  }

  /** Organize + ingest every (month, type) dump under `inDir` into
    * `lakeDir`. Returns the manifest that was executed. Paths in the
    * manifest are relative to `inDir`. */
  def run(spark: SparkSession, inDir: String, lakeDir: String,
      verifyChecksums: Boolean = true): Seq[(String, String)] = {
    val files = listKeys(spark, inDir)
    val cs = checksumLines(spark, inDir)
    val manifest = Manifest.organize(files, cs, baseUrl = inDir.stripSuffix("/"))
      .collect()
    val done = manifest.map { row =>
      val url = row.getAs[String]("url")
      val dataType = row.getAs[String]("data_type")
      val checksum = row.getAs[String]("checksum")
      if (verifyChecksums && checksum.nonEmpty)
        require(Ingest.verifyChecksum(url, checksum), s"checksum mismatch: $url")
      val df = DiscogsXml.read(spark, url, dataType)
      val (year, month, _) = DiscogsLake.parseInputUrl(url)
      DiscogsLake.writeDump(df, lakeDir, dataType, year.toInt, month)
      (row.getAs[String]("year_month"), dataType)
    }
    done.toSeq
  }
}
