package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming attribution: the unbounded twins of the batch temporal
  * joins (operators.Temporal). Works on bounded Datasets too — the same
  * code path is exercised by the batch tests and the MemoryStream specs.
  *
  * Scale/streaming design: a stream-stream join is only runnable
  * unbounded when BOTH sides are watermarked and the join condition
  * bounds event-time distance — that bound is what lets the state store
  * evict rows (clicks older than the attribution window + watermark are
  * dropped from state). State per key is O(events inside the window),
  * the same contract as the batch range join's per-key fan-out.
  */
object Attribution {

  case class Click(user_id: Long, click_id: Long, click_us: Long)
  case class Purchase(user_id: Long, purchase_id: Long, purchase_us: Long)

  /** Clicks attributed to purchases of the same user within the
    * `windowMinutes` before the purchase (inclusive of the purchase
    * instant). Emits one row per (purchase, click) pair — inner join, so
    * results stream out as soon as both sides arrive; aggregation is the
    * caller's choice (`groupBy(purchase_id).count` etc.).
    */
  def attributedClicks(purchases: Dataset[Purchase], clicks: Dataset[Click],
                       windowMinutes: Int = 30): DataFrame = {
    val p = purchases.toDF()
      .withColumn("pts", timestamp_micros(col("purchase_us")))
      .withWatermark("pts", "1 hour")
    val c = clicks.toDF()
      .withColumnRenamed("user_id", "c_user_id")
      .withColumn("cts", timestamp_micros(col("click_us")))
      .withWatermark("cts", "1 hour")
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("cts") >= col("pts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("click_id"), col("click_us"))
  }

  /** Watermarked streaming dedup on a business key: duplicates arriving
    * within the watermark horizon collapse to the first occurrence;
    * state for a key is dropped once the watermark passes its event
    * time (bounded state — the unbounded-safe form of dropDuplicates).
    */
  def dedupEvents(events: DataFrame, keyCol: String, tsUsCol: String): DataFrame =
    events
      .withColumn("__ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCol)
      .drop("__ts")
}
