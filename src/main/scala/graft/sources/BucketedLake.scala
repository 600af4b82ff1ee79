package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed fact layout — the shuffle-free co-located join story that
  * docs/SCALE.md specifies for 100 TB fact-fact joins (q08/q11 shape).
  *
  * `bucketBy(n, key)` + `sortBy(key)` hash-clusters rows into a fixed
  * number of per-key files at WRITE time; a join of two tables bucketed
  * on their join keys with the same bucket count then plans with ZERO
  * shuffle exchanges — each task zips bucket i with bucket i. The price
  * is paid once at layout time and amortized over every downstream join,
  * which is why it's a lake decision, not an operator decision: the query
  * code is identical either way.
  *
  * Spark constraint: bucketed tables must go through the catalog
  * (`saveAsTable`) — the bucket spec lives in table metadata, not in the
  * parquet files. `path` makes them external tables, so the data sits in
  * the lake like any other parquet and survives catalog resets (re-run
  * [[writeBucketed]] to re-register).
  */
object BucketedLake {

  /** Write `df` as an external bucketed+sorted table co-located on `key`.
    * Bucket count should be sized so a bucket of the LARGEST co-located
    * table fits a task comfortably (~128-512 MB). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** The registered bucketed table, ready to join shuffle-free. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
