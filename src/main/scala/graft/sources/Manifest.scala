package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dump-manifest organization (reference s3.py:329-424) as a declarative
  * plan: regex-extract date/type from an S3 key listing, keep the latest
  * file per (year-month, type) and the latest CHECKSUM.txt per month,
  * parse checksum lines (both "<sum> *<file>" and "<sum> <file>" styles,
  * s3.py:292-327), left-join checksums by filename (missing => ''), and
  * sort months ascending (s3.py:397).
  *
  * The inputs are tiny relative to the lake (one row per dump file), so
  * every join here broadcasts; the windows are per-month partitions.
  */
object Manifest {

  private val datePattern = "discogs_(\\d{4})(\\d{2})(\\d{2})_"
  private val typePattern = "discogs_\\d{8}_(\\w+)\\.xml\\.gz"

  /** s3.py:392-397 type_mapping — plural dump names to entity names;
    * unmapped types are dropped.
    */
  private def simpleType(c: Column): Column =
    when(c === "artists", "artist")
      .when(c === "masters", "master")
      .when(c === "labels", "label")
      .when(c === "releases", "release")

  /** @param files one column `path` (S3-style key per dump file)
    * @param checksumContents columns `src` (checksum-file key) and `line`
    *        (one raw line of that file) — the relational stand-in for
    *        fetching each month's CHECKSUM.txt
    * @return (year_month, data_type, url, checksum, date) sorted
    */
  def organize(
      files: DataFrame,
      checksumContents: DataFrame,
      baseUrl: String = "https://discogs-data-dumps.s3.us-west-2.amazonaws.com"): DataFrame = {

    val dated = files
      .withColumn("y", regexp_extract(col("path"), datePattern, 1))
      .withColumn("m", regexp_extract(col("path"), datePattern, 2))
      .withColumn("d", regexp_extract(col("path"), datePattern, 3))
      .filter(col("y") =!= "")
      .withColumn("year_month", concat(col("y"), lit("-"), col("m")))
      .withColumn("full_date", concat(col("y"), col("m"), col("d")))

    // Latest CHECKSUM.txt per month (s3.py:364-369); ties keep the
    // lexicographically-first path, matching S3 listing order.
    val csWin = Window.partitionBy(col("year_month"))
      .orderBy(col("full_date").desc, col("path").asc)
    val latestChecksumFile = dated
      .filter(col("path").endsWith("CHECKSUM.txt"))
      .withColumn("rn", row_number().over(csWin))
      .filter(col("rn") === 1)
      .select(col("year_month"), col("path").as("cs_path"))

    // Parse that file's lines into (year_month, filename, checksum).
    val parts = split(trim(col("line")), "\\s+")
    val checksums = checksumContents
      .join(broadcast(latestChecksumFile), col("src") === col("cs_path"))
      .filter(trim(col("line")) =!= "")
      .filter(size(parts) >= 2)
      .select(col("year_month"),
        trim(regexp_replace(array_join(slice(parts, 2, 1000000), " "), "\\*", ""))
          .as("filename"),
        parts.getItem(0).as("checksum"))

    // Latest dump file per (month, type) (s3.py:384-386).
    val fileWin = Window.partitionBy(col("year_month"), col("data_type"))
      .orderBy(col("full_date").desc, col("path").asc)
    val latestFiles = dated
      .filter(!col("path").endsWith("CHECKSUM.txt"))
      .withColumn("data_type", simpleType(regexp_extract(col("path"), typePattern, 1)))
      .filter(col("data_type").isNotNull)
      .withColumn("rn", row_number().over(fileWin))
      .filter(col("rn") === 1)
      .withColumn("filename", element_at(split(col("path"), "/"), -1))

    latestFiles
      .join(broadcast(checksums), Seq("year_month", "filename"), "left")
      .select(
        col("year_month"),
        col("data_type"),
        concat(lit(baseUrl), lit("/"), col("path")).as("url"),
        coalesce(col("checksum"), lit("")).as("checksum"),
        date_format(to_date(col("full_date"), "yyyyMMdd"), "yyyy-MM-dd").as("date"))
      .orderBy(col("year_month"), col("data_type"))
  }
}
