package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the unbounded (Structured Streaming) paths that the batch
  * oracle gate can't reach: incremental sessionization with state +
  * event-time timeouts, and watermarked windowed aggregation, both fed
  * through MemoryStream micro-batches and checked against their batch
  * equivalents on the same data.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def eventsAsEv() = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").cast("double").as("value"))
      .as[Sessionize.Ev].collect().sortBy(e => (e.us, e.user_id)).toSeq
  }

  test("streaming sessionization emits exactly the batch sessions that closed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = eventsAsEv()
    val (h1, h2) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessionsStreaming(ms.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      ms.addData(h1)
      q.processAllAvailable()
      ms.addData(h2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_out").as[Sessionize.SessionOut]
      .collect().map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events, s.sum_value.toLong))
      .toSet

    val batch = Sessionize.sessions(
      evs.toDF().select(col("user_id"), col("us"), col("value")))
      .collect().map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events, s.sum_value.toLong))
      .toSet

    // Append-mode streaming can only have emitted CLOSED sessions (the
    // watermark never passes the final event), so streamed ⊆ batch, and
    // every batch session ending >30min before the max event time must
    // have been emitted.
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${(streamed -- batch).take(3)}")
    val maxUs = evs.map(_.us).max
    val mustClose = batch.filter(_._3 < maxUs - Sessionize.GapUs)
    assert(mustClose.subsetOf(streamed),
      s"closed sessions missing from stream: ${(mustClose -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("foreachBatch streams windowed aggregates into a parquet lake") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_lake").toString
    val evs = eventsAsEv()
    val ms = MemoryStream[Sessionize.Ev]
    val agg = ms.toDS()
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("start_us"), col("n"))
    val q = agg.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    try {
      ms.addData(evs)
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() > 0)
    // Finalized windows written to the lake must agree with batch counts.
    val batchCounts = evs.toDF()
      .groupBy((col("us") - col("us") % (3600L * 1000000L)).as("start_us"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    back.collect().foreach { r =>
      assert(batchCounts(r.getLong(0)) == r.getLong(1))
    }
  }

  test("watermarked tumbling window streaming agg matches batch for closed windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = eventsAsEv()
    val (h1, h2) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[Sessionize.Ev]
    val agg = ms.toDS()
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sum_cents"))
      .select(unix_micros(col("w.start")).as("start_us"), col("n"), col("sum_cents"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      ms.addData(h1)
      q.processAllAvailable()
      ms.addData(h2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("win_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = evs.toDF()
      .groupBy((col("us") - col("us") % (3600L * 1000000L)).as("start_us"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed.subsetOf(batch))
    // Every window that ended more than the watermark before the last
    // event must have been finalized and emitted.
    val maxUs = evs.map(_.us).max
    val mustEmit = batch.filter(_._1 + 2 * 3600L * 1000000L < maxUs - 3600L * 1000000L)
    assert(mustEmit.subsetOf(streamed))
    assert(streamed.nonEmpty)
  }

  test("streaming trending top-k matches batch qs04 on closed windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[TypedEv].collect().sortBy(_.us).toSeq
    val (h1, h2) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[TypedEv]
    // The streaming half of qs04: watermarked per-(window, type) counts in
    // append mode — a count row is emitted exactly once, when its window
    // closes. Ranking happens downstream over finalized counts (here
    // post-hoc; in production inside foreachBatch), because top-k is only
    // meaningful once the window's counts stop changing.
    val counts = ms.toDS()
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("start_us"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    try {
      ms.addData(h1)
      q.processAllAvailable()
      ms.addData(h2)
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("trend_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val streamedTop = emitted.groupBy(_._1).map { case (w, rows) =>
      w -> rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
        .map { case ((_, ty, n), i) => (i + 1L, ty, n) }.toSeq
    }

    val batchTop = SparkEntry.queries("qs04_trending_event_types")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("rnk"),
        r.getAs[String]("event_type"), r.getAs[Long]("n")))
      .groupBy(_._1).map { case (w, rows) =>
        w -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
      }

    // Windows safely closed by the final watermark must match batch
    // exactly; everything emitted must agree with batch where present.
    val maxUs = evs.map(_.us).max
    val closed = batchTop.keySet.filter(_ + 2 * 3600L * 1000000L < maxUs - 3600L * 1000000L)
    assert(closed.nonEmpty)
    closed.foreach { w =>
      assert(streamedTop.get(w).contains(batchTop(w)),
        s"window $w: streamed ${streamedTop.get(w)} != batch ${batchTop(w)}")
    }
  }
}

/** Top-level so the MemoryStream encoder resolves (spec-inner case
  * classes fail implicit derivation). */
case class TypedEv(event_type: String, us: Long)
