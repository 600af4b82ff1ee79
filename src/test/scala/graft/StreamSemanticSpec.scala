package graft

import graft.streaming.StreamSemantic
import graft.streaming.StreamSemantic.{Decision, VecIn}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic dedup vs its batch twin and vs the batch qn20
  * operator: same data, same centroids, same threshold — identical
  * decisions; plus horizon eviction semantics.
  */
class StreamSemanticSpec extends AnyFunSuite {
  import TestSpark._

  private val T = 350000L // qn20's threshold

  private def vecs(): Seq[VecIn] = {
    import spark.implicits._
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      // event time strictly follows vec_id; start at 1s (an event AT the
      // initial watermark epoch is dropped as late)
      .map { case (id, e) => VecIn(id, e, (id + 1) * 1000000L) }.toSeq
  }

  private def centroids(vs: Seq[VecIn]): IndexedSeq[(Long, Array[Float])] = {
    // qn20's seed rule, via the ONE shared definition (k = max(8,
    // ceil(sqrt(n))) stride seeds) — a hardcoded copy here went stale
    // once already when qn20 moved off the fixed-8 rule.
    val (stride, k) = graft.operators.Curation.centroidSeeds(vs.length.toLong)
    vs.filter(v => v.vec_id % stride == 0 && v.vec_id < stride * k)
      .map(v => (v.vec_id, v.embedding)).toIndexedSeq
  }

  test("streaming decisions equal the batch twin and qn20's per-cluster drop counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = vecs()
    val cents = centroids(vs)
    val (h1, h2) = vs.splitAt(vs.length / 2)

    val ms = MemoryStream[VecIn]
    val q = StreamSemantic.semanticDedupStreaming(ms.toDS(), cents, T, horizonMs = 1L << 50)
      .writeStream.format("memory").queryName("sem_out").outputMode("append").start()
    try {
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sem_out").as[Decision].collect()
      .map(d => (d.vec_id, d.cent_id, d.kept, d.dup_of)).toSet
    val batch = StreamSemantic.semanticDedupBatch(vs.toDS(), cents, T).collect()
      .map(d => (d.vec_id, d.cent_id, d.kept, d.dup_of)).toSet
    assert(streamed == batch)
    assert(streamed.size == vs.length, "exactly one decision per vector")

    // qn20's per-cluster accounting must agree (same centroids by
    // construction: stride seeds over the same table).
    val qn20 = SparkEntry.queries("qn20_semantic_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("cent_id") -> r.getAs[Long]("n_dropped")).toMap
    val streamedDropped = streamed.toSeq.filter(!_._3)
      .groupBy(_._2.toLong).view.mapValues(_.size.toLong).toMap
    qn20.foreach { case (cid, nDropped) =>
      assert(streamedDropped.getOrElse(cid, 0L) == nDropped,
        s"cluster $cid: streaming dropped ${streamedDropped.getOrElse(cid, 0L)} != qn20 $nDropped")
    }
  }

  test("vectors arriving beyond the horizon do not pair with evicted members") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Two identical vectors far apart in event time, tiny horizon: the
    // second must be KEPT (its twin's cluster was evicted), then a third
    // identical one right after must be dropped against the second.
    val e = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val evs1 = Seq(VecIn(1, e, 1000000L))
    val evs2 = Seq(VecIn(2, e, 3600L * 1000000L), VecIn(3, e, 3600L * 1000000L + 1000L))
    val cents = IndexedSeq((0L, e))
    val ms = MemoryStream[VecIn]
    val q = StreamSemantic.semanticDedupStreaming(ms.toDS(), cents, T, horizonMs = 1000L)
      .writeStream.format("memory").queryName("sem_evict").outputMode("append").start()
    try {
      ms.addData(evs1); q.processAllAvailable()
      ms.addData(evs2); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sem_evict").as[Decision].collect()
      .map(d => d.vec_id -> (d.kept, d.dup_of)).toMap
    assert(out(1L) == ((true, -1L)))
    assert(out(2L) == ((true, -1L)), "twin arrived after the horizon: state must be evicted")
    assert(out(3L) == ((false, 2L)), "same-window arrival must still be caught")
  }

  test("sharded semantic dedup: streaming shards equal the batch form; fine centroids never collect") {
    import spark.implicits._
    import graft.streaming.StreamSemantic.ShardIn
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = vecs()
    val cents = centroids(vs)
    val (stride, k) = graft.operators.Curation.centroidSeeds(vs.length.toLong)
    val (cstride, k2) = graft.operators.Curation.coarseSeeds(k)
    val coarse = cents
      .filter { case (cid, _) => (cid / stride) % cstride == 0 && (cid / stride) < cstride * k2 }
      .map { case (cid, e) => (cid / stride / cstride, e) }.sortBy(_._1).toIndexedSeq
    assert(coarse.size < cents.size, "coarse tier must be strictly smaller than the fine tier")
    // Batch form (qn20d's body): fine centroids ride a DISTRIBUTED
    // dataset into the shuffle — the sharding contract.
    val batch = StreamSemantic.semanticDedupSharded(
      vs.toDS(), cents.toDS(), coarse, T).collect()
      .map(d => d.vec_id -> (d.cent_id, d.kept, d.dup_of)).toMap
    // Streaming form: markers primed in micro-batch 1, vectors split
    // across two later batches (state must persist the shard's
    // centroids and members across batch boundaries).
    val markers = cents.map { case (cid, ce) =>
      ShardIn(StreamSemantic.assign(coarse, ce), is_cent = true, cid, ce, Long.MinValue) }
    val arrivals = vs.map(v =>
      ShardIn(StreamSemantic.assign(coarse, v.embedding), is_cent = false,
        v.vec_id, v.embedding, v.us))
    val (h1, h2) = arrivals.splitAt(arrivals.length / 2)
    val ms = MemoryStream[ShardIn]
    val q = StreamSemantic.semanticDedupShardedIn(ms.toDS(), T)
      .writeStream.format("memory").queryName("sem_shard").outputMode("append").start()
    try {
      ms.addData(markers); q.processAllAvailable()
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sem_shard").as[Decision].collect()
      .map(d => d.vec_id -> (d.cent_id, d.kept, d.dup_of)).toMap
    assert(streamed.size == vs.size, "one decision per arrival, markers emit nothing")
    assert(streamed == batch)
    StreamSemantic.releaseBroadcasts(spark)
  }

  test("sharded dedup: arrivals beating their cell's markers pass through unassigned") {
    import spark.implicits._
    import graft.streaming.StreamSemantic.ShardIn
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Array(1.0f, 0.0f)
    val ms = MemoryStream[ShardIn]
    val q = StreamSemantic.semanticDedupShardedIn(ms.toDS(), T)
      .writeStream.format("memory").queryName("sem_unprimed").outputMode("append").start()
    try {
      // Batch 1: data BEFORE markers (contract violation) -> unassigned.
      ms.addData(Seq(ShardIn(0L, is_cent = false, 1L, e, 1L))); q.processAllAvailable()
      // Batch 2: markers land; the same vector re-sent now assigns and,
      // because the unassigned arrival was NOT retained as a member,
      // it is kept (nothing to dup against).
      ms.addData(Seq(ShardIn(0L, is_cent = true, 0L, e, Long.MinValue),
        ShardIn(0L, is_cent = false, 2L, e, 2L))); q.processAllAvailable()
      // Batch 3: a twin now dups against vec 2 — state is healthy.
      ms.addData(Seq(ShardIn(0L, is_cent = false, 3L, e, 3L))); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sem_unprimed").as[Decision].collect()
      .map(d => d.vec_id -> (d.cent_id, d.kept, d.dup_of)).toMap
    assert(out(1L) == ((-1L, true, -1L)), "pre-marker arrival must pass through unassigned")
    assert(out(2L) == ((0L, true, -1L)))
    assert(out(3L) == ((0L, false, 2L)))
  }

  test("centroid broadcasts are tracked and eagerly destroyable at safe points") {
    import spark.implicits._
    // Repeated batch-twin builds used to accumulate centroid broadcasts
    // until a driver GC let the ContextCleaner notice (round-8 advice).
    // The registry makes the accumulation observable and releasable.
    StreamSemantic.releaseBroadcasts(spark)
    val e = Array(1.0f, 0.0f)
    val cents = IndexedSeq((0L, e))
    val before = StreamSemantic.trackedBroadcastCount(spark)
    assert(before == 0)
    (1 to 3).foreach { i =>
      val vin = Seq(VecIn(i.toLong, e, i.toLong)).toDS()
      StreamSemantic.semanticDedupBatch(vin, cents, T).collect(): Unit
    }
    assert(StreamSemantic.trackedBroadcastCount(spark) == 3,
      "each batch-twin build must register its centroid broadcast")
    StreamSemantic.releaseBroadcasts(spark)
    assert(StreamSemantic.trackedBroadcastCount(spark) == 0)
    // And a fresh build after a release still works end-to-end.
    val again = StreamSemantic.semanticDedupBatch(
      Seq(VecIn(9L, e, 1L)).toDS(), cents, T).collect()
    assert(again.length == 1 && again.head.kept)
    StreamSemantic.releaseBroadcasts(spark)
  }

  test("a probe stream over the persisted IVF index matches the batch probe") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = TestSpark.sf
    val path = graft.operators.Similarity.newIndexDir()
    graft.operators.Similarity.buildIvfIndex(spark, sf, 16, path)

    // The serving loop is plain foreachBatch over probeIvfIndexWith: a
    // standing index, probe batches as they arrive. Feed the declared
    // probe set in two micro-batches and compare with one batch probe.
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ms = MemoryStream[(Long, Array[Float])]
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val q = ms.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= graft.operators.Similarity
            .probeIvfIndexWith(spark, batch, path, 4, 5)
            .collect().map(_.toString)
        }: Unit
      }.start()
    try {
      ms.addData(probes.take(5).toSeq); q.processAllAvailable()
      ms.addData(probes.drop(5).toSeq); q.processAllAvailable()
    } finally q.stop()

    val batchRows = graft.operators.Similarity
      .probeIvfIndex(spark, sf, path, 4, 5).collect().map(_.toString)
    assert(batchRows.nonEmpty)
    assert(out.sorted.toSeq == batchRows.sorted.toSeq,
      s"stream/batch diverged: stream=${out.size} batch=${batchRows.length}")
  }

  test("state-store restart: cluster members survive a checkpoint stop/start") {
    // The semantic twin of StreamDedupSpec's restart pin: a vector
    // ingested BEFORE the stop must still suppress its semantic dup
    // arriving AFTER the restart — only possible if the cluster-member
    // state (mapGroupsWithState keyed by cent_id) was restored from the
    // state store; and the restarted run must emit exactly one decision
    // per vector.
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_sem_cp").toString
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("us", LongType, nullable = false)))
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val cents = IndexedSeq(1L -> e1, 2L -> e2)
    val files = Seq(
      Seq((1L, e1.toSeq, 1000000L), (2L, e2.toSeq, 2000000L)),
      Seq((3L, e1.toSeq, 3000000L)))  // semantic dup of vec 1, ACROSS the restart
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def addFile(i: Int): Unit = {
      val stage = s"$root/stage$i"
      val rows = files(i).map { case (id, e, us) => org.apache.spark.sql.Row(id, e, us) }
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, f"b$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    val (cp, out) = (s"$root/cp", s"$root/decisions")
    def runOnce(): Unit = {
      import spark.implicits._
      val q = StreamSemantic.semanticDedupStreaming(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src).as[VecIn],
        cents, T, horizonMs = 1000L * 3600 * 24 * 365)
        .writeStream.option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
    }
    addFile(0); runOnce()                  // vec 1 becomes cluster 1's member
    addFile(1); runOnce()                  // restart; vec 3 must hit restored state
    import spark.implicits._
    val decisions = spark.read.parquet(out).as[Decision].collect()
      .map(d => d.vec_id -> (d.kept, d.dup_of)).toMap
    assert(decisions.size == 3, s"expected one decision per vector, got $decisions")
    assert(decisions(1L) == (true, -1L) || decisions(1L)._1, s"vec 1 should be kept: $decisions")
    assert(decisions(3L) == (false, 1L),
      s"state lost across restart: vec 3 was not suppressed against pre-restart vec 1 ($decisions)")
  }
}
