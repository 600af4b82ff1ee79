package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY.md §2 registers one [[Q]]: a Spark
  * DataFrame implementation plus (when SQL-expressible) the DuckDB oracle
  * SQL the driver hash-compares against.
  */
object SparkEntry {

  /** The full declared query inventory. */
  val registry: Seq[Q] =
    operators.Relational.all ++ operators.Discogs.all ++
      operators.Dedup.all ++ operators.Similarity.all ++ operators.PQ.all ++
      operators.TextAnalysis.all ++ operators.Streaming.all ++
      operators.Multimodal.all ++ operators.Temporal.all ++
      operators.TrainPrep.all ++ operators.Curation.all ++ operators.Linkage.all ++
      operators.Skew.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
