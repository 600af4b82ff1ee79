package graft

import graft.streaming.Attribution
import graft.streaming.Attribution.{Click, Purchase}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join + watermarked dedup against their batch
  * equivalents on the real events table, fed through MemoryStream
  * micro-batches.
  */
class AttributionStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def typedEvents() = {
    import spark.implicits._
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("purchase_us"))
      .as[Purchase].collect().toSeq
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
      .as[Click].collect().toSeq
    (purchases, clicks)
  }

  test("stream-stream attribution join emits exactly the batch pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (purchases, clicks) = typedEvents()

    val mp = MemoryStream[Purchase]
    val mc = MemoryStream[Click]
    val q = Attribution.attributedClicks(mp.toDS(), mc.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // interleave the sides across micro-batches
      val (c1, c2) = clicks.sortBy(_.click_us).splitAt(clicks.length / 2)
      val (p1, p2) = purchases.sortBy(_.purchase_us).splitAt(purchases.length / 2)
      mc.addData(c1); q.processAllAvailable()
      mp.addData(p1); q.processAllAvailable()
      mc.addData(c2); mp.addData(p2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

    val batch = Attribution.attributedClicks(purchases.toDS(), clicks.toDS())
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("attribution pairs agree with the oracle-checked batch range join qr02") {
    import spark.implicits._
    val (purchases, clicks) = typedEvents()
    val pairCounts = Attribution.attributedClicks(purchases.toDS(), clicks.toDS())
      .groupBy(col("purchase_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    SparkEntry.queries("qr02_click_attribution_window")(spark, sf)
      .collect().foreach { r =>
        val got = pairCounts.getOrElse(r.getAs[Long]("event_id"), 0L)
        assert(got == r.getAs[Long]("n_clicks_30m"))
      }
  }

  test("streaming ingest pipeline: dedup -> partitioned lake -> compaction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft_stream_ingest").toString + "/lake"
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

    val ms = MemoryStream[(Long, Long, String)]
    val deduped = graft.streaming.Attribution.dedupEvents(
      ms.toDS().toDF("event_id", "us", "event_type"), "event_id", "us")
    val q = deduped.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").partitionBy("event_type").parquet(lake)
      }
      .start()
    try {
      // three micro-batches, the third replaying half of the first
      val (h1, h2) = evs.splitAt(evs.length / 2)
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
      ms.addData(h1.take(h1.length / 2)); q.processAllAvailable()
    } finally q.stop()

    val stats = graft.sources.LakeMaintenance.compact(spark, lake)
    assert(stats.forall(s => s.filesAfter <= s.filesBefore))
    val back = spark.read.parquet(lake)
    assert(back.count() == evs.length) // replays collapsed, nothing lost
    assert(back.select("event_id").distinct().count() == evs.length)
    assert(back.select("event_type").distinct().count() ==
      evs.map(_._3).distinct.length)
  }

  test("watermarked streaming dedup collapses replayed events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    case class Raw(event_id: Long, us: Long)
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ms = MemoryStream[(Long, Long)]
    val deduped = Attribution.dedupEvents(
      ms.toDS().toDF("event_id", "us"), "event_id", "us")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(evs)
      q.processAllAvailable()
      ms.addData(evs.take(50)) // replay a prefix — must be dropped
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.length == evs.length)
    assert(out.map(_.getLong(0)).toSet == evs.map(_._1).toSet)
  }
}
