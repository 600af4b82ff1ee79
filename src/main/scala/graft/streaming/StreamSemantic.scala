package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semantic dedup — the ingest-time twin of the batch qn20
  * pipeline (SemDeDup-shaped): vectors arrive on a stream, are assigned
  * to their nearest centroid map-side, and each arrival is compared ONLY
  * against its own cluster's recent members, exactly as the batch plan
  * bounds the quadratic cosine work per cluster with a cent_id
  * equi-join.
  *
  * Plan shape: assignment is a pure per-row function over a
  * BROADCAST centroid table (k rows — the exact analogue of the batch
  * plan's `broadcast(cents)`; shipped once per executor, never
  * per-task), so the only shuffle is the groupByKey on
  * cent_id into the state store. State per cluster = the members inside
  * the dedup horizon; an arrival is DROPPED iff some earlier member
  * (earlier event time, ties by vec_id — the streaming analogue of the
  * batch rule's vec_id order) has cosine >= the threshold. Decisions are
  * emitted exactly once, in the micro-batch where the vector arrives.
  *
  * Scale + state bound: state shards by cent_id (k ~ sqrt(N) keys at
  * corpus scale); the event-time timeout evicts clusters `horizonMs`
  * past their last arrival — "semantic-dup within the horizon" is the
  * declared streaming semantics, the same bound StreamDedup declares for
  * LSH buckets. Production additionally caps members per cluster
  * (dropping the oldest), trading recall for a hard memory bound.
  *
  * Float policy: scores are sequential double folds over the float
  * values, floored to e6 integers before the threshold compare —
  * bit-identical to the batch qn20 plan, so the two paths agree exactly
  * (StreamSemanticSpec pins streaming == batch on the same data).
  */
object StreamSemantic {

  /** Centroid broadcasts created by the two dedup entry points, per
    * session. A broadcast's blocks live until the ContextCleaner GCs the
    * last plan referencing it — correct, but LAZY: a bench sweep that
    * builds the batch twin repeatedly accumulates dead centroid tables
    * until a driver GC happens to run (round-8 advice). Callers that
    * know a safe point — every plan built since the last release is
    * fully materialized and discarded (Bench between measurements; a
    * spec after stopping its queries) — call [[releaseBroadcasts]] to
    * destroy them eagerly. Callers that don't are still safe: the
    * registry holds the only extra reference, and stopped sessions are
    * evicted on the next track/release. */
  private val liveBroadcasts = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.sql.SparkSession,
      List[org.apache.spark.broadcast.Broadcast[IndexedSeq[(Long, Array[Float])]]]]

  private def track(s: org.apache.spark.sql.SparkSession,
      bc: org.apache.spark.broadcast.Broadcast[IndexedSeq[(Long, Array[Float])]]): Unit = {
    liveBroadcasts.keySet.filter(_.sparkContext.isStopped).foreach(liveBroadcasts.remove)
    liveBroadcasts.updateWith(s) { prev => Some(bc :: prev.getOrElse(Nil)) }: Unit
  }

  /** Test probe: broadcasts currently tracked for a session. */
  private[graft] def trackedBroadcastCount(s: org.apache.spark.sql.SparkSession): Int =
    liveBroadcasts.get(s).map(_.size).getOrElse(0)

  /** Destroy every centroid broadcast this session has accumulated.
    * ONLY safe when no un-materialized plan still references one —
    * destroying under a live plan fails its tasks. */
  def releaseBroadcasts(s: org.apache.spark.sql.SparkSession): Unit = {
    liveBroadcasts.keySet.filter(_.sparkContext.isStopped).foreach(liveBroadcasts.remove)
    liveBroadcasts.remove(s).foreach(_.foreach { bc =>
      try bc.destroy() catch { case _: Exception => () } // already cleaned is fine
    })
  }

  case class VecIn(vec_id: Long, embedding: Array[Float], us: Long)
  case class AsgVec(cent_id: Long, vec_id: Long, us: Long, embedding: Array[Float],
      ts: java.sql.Timestamp)
  /** One decision per arrival: kept, or dropped as a semantic dup of
    * `dup_of` (the lowest-id qualifying earlier member). */
  case class Decision(vec_id: Long, cent_id: Long, kept: Boolean, dup_of: Long)
  case class Cluster(members: List[(Long, Long, Array[Float])]) // (vec_id, us, embedding)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length && i < b.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def nrm(a: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(acc)
  }
  /** Floor-scaled e6 cosine — the cross-path determinism contract. */
  private def cosE6(a: Array[Float], b: Array[Float]): Long =
    math.floor(dot(a, b) / (nrm(a) * nrm(b)) * 1000000).toLong

  /** Argmax-cosine centroid id (e6 score, ties to the lowest cent_id) —
    * the batch assignment rule as a per-row function. */
  def assign(centroids: IndexedSeq[(Long, Array[Float])], v: Array[Float]): Long = {
    var bestId = Long.MaxValue; var bestScore = Long.MinValue
    for ((cid, ce) <- centroids) {
      val s = cosE6(ce, v)
      if (s > bestScore || (s == bestScore && cid < bestId)) { bestScore = s; bestId = cid }
    }
    bestId
  }

  /** The horizon is enforced HERE, by member age relative to the
    * arrival's event time — not by state eviction. Timeout-based
    * eviction only fires on a batch boundary where the group gets no
    * data, so a cross-horizon arrival in the same batch would otherwise
    * still see stale members; age-filtering makes the declared
    * semantics ("dup iff an earlier member within the horizon
    * qualifies") hold regardless of micro-batch timing. Eviction then
    * only reclaims memory. `horizonUs < 0` means unbounded (the batch
    * twin). */
  private def decide(arrived: Seq[AsgVec], members0: List[(Long, Long, Array[Float])],
      thresholdE6: Long, horizonUs: Long): (Seq[Decision], List[(Long, Long, Array[Float])]) = {
    var members = members0
    val out = Seq.newBuilder[Decision]
    for (d <- arrived) {
      val live = if (horizonUs < 0) members
        else members.filter(m => m._2 + horizonUs > d.us)
      val hit = live.filter(m => m._1 != d.vec_id && cosE6(m._3, d.embedding) >= thresholdE6)
        .map(_._1).sorted.headOption
      out += Decision(d.vec_id, d.cent_id, hit.isEmpty, hit.getOrElse(-1L))
      members = (d.vec_id, d.us, d.embedding) :: members
    }
    (out.result(), members)
  }

  /** Streaming decisions with a bounded dedup horizon. `vecs` must be a
    * streaming frame typed as [[VecIn]]; decisions appear in the
    * micro-batch where the vector arrives.
    *
    * The centroid table rides a BROADCAST VARIABLE, not the task
    * closure: k grows ~sqrt(N), so closure capture would re-serialize
    * O(sqrt(N) * dim) bytes into every task binary; the broadcast ships
    * it once per executor (torrent blocks) and the assignment lambda
    * reads it by reference. The remaining ceiling is the DRIVER's one
    * copy (it must still build the table to broadcast it): at k ~ 1e6 x
    * 768 dims that is single-digit GBs — acceptable for a driver; past
    * it, use [[semanticDedupSharded]]: arrivals route by the N^(1/4)
    * coarse tier and each cell's state ingests only its shard of the
    * fine-centroid table, so no process ever holds all k. */
  def semanticDedupStreaming(vecs: Dataset[VecIn],
      centroids: IndexedSeq[(Long, Array[Float])], thresholdE6: Long,
      horizonMs: Long): Dataset[Decision] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(centroids)
    track(spark, bcCents)
    vecs
      .map(v => (assign(bcCents.value, v.embedding), v.vec_id, v.us, v.embedding))
      .toDF("cent_id", "vec_id", "us", "embedding")
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[AsgVec]
      .groupByKey(_.cent_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[AsgVec], state: GroupState[Cluster]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrived = it.toSeq.sortBy(d => (d.us, d.vec_id))
            val (decisions, members) =
              decide(arrived, state.getOption.map(_.members).getOrElse(Nil),
                thresholdE6, horizonMs * 1000L)
            // keep only members still reachable from future arrivals
            // (event time never regresses past the watermark)
            val floorUs = (state.getCurrentWatermarkMs() - horizonMs) * 1000L
            state.update(Cluster(members.filter(_._2 >= floorUs)))
            val newestMs = arrived.map(_.us).max / 1000L
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, newestMs + horizonMs))
            decisions.iterator
          }
        })
  }

  /** One row of the SHARDED pipeline's merged input: either a fine-
    * centroid definition (`is_cent`) or an arriving vector, both routed
    * map-side to their coarse cell. */
  case class ShardIn(coarse_id: Long, is_cent: Boolean, id: Long,
      embedding: Array[Float], us: Long)
  /** Per-coarse-cell state: this shard's fine centroids plus live
    * members keyed by fine cent_id (flat list — member rows are
    * (cent_id, vec_id, us, embedding)). */
  case class ShardState(cents: List[(Long, Array[Float])],
      members: List[(Long, Long, Long, Array[Float])])

  /** Shard group logic, shared by batch and streaming: ingest this
    * micro-batch's centroid markers (idempotent by id), then decide each
    * arrival in (us, id) order — fine assignment by argmax e6 cosine
    * over the SHARD's centroids (ties to the lowest cent_id, the
    * oracle's `ORDER BY aCos DESC, cent_idx` exactly), dup iff an
    * earlier member of that fine cluster scores >= the threshold. */
  private def shardGroup(thresholdE6: Long)(key: Long, it: Iterator[ShardIn],
      state: GroupState[ShardState]): Iterator[Decision] = {
    val rows = it.toSeq
    val st0 = state.getOption.getOrElse(ShardState(Nil, Nil))
    val fresh = rows.filter(_.is_cent).map(r => (r.id, r.embedding))
      .filterNot(c => st0.cents.exists(_._1 == c._1))
    val cents = st0.cents ++ fresh
    // Index the flat member list by fine cent_id ONCE per invocation: a
    // shard holds ~k/k2 whole clusters, so a per-arrival scan of the
    // flat list would pay O(shard members) instead of O(cluster
    // members) — a k2-fold regression the 500k battery exposed. Lists
    // are rebuilt newest-first, preserving the flat encoding in state.
    val byCluster = scala.collection.mutable.HashMap
      .empty[Long, List[(Long, Long, Long, Array[Float])]]
    st0.members.reverse.foreach(m => byCluster(m._1) = m :: byCluster.getOrElse(m._1, Nil))
    val out = Seq.newBuilder[Decision]
    for (d <- rows.filterNot(_.is_cent).sortBy(r => (r.us, r.id))) {
      if (cents.isEmpty) {
        // Unprimed cell: the arrival beat its shard's centroid markers.
        // Pass it through UNASSIGNED (cent_id -1, kept, not retained as
        // a member) rather than silently emitting a garbage cent_id —
        // the declared contract is that markers precede data; this makes
        // a violated contract visible in the output instead of wrong.
        out += Decision(d.id, -1L, kept = true, -1L)
      } else {
        var bestId = Long.MaxValue; var bestScore = Long.MinValue
        for ((cid, ce) <- cents) {
          val s = cosE6(ce, d.embedding)
          if (s > bestScore || (s == bestScore && cid < bestId)) { bestScore = s; bestId = cid }
        }
        val mine = byCluster.getOrElse(bestId, Nil)
        val hit = mine.filter(m => m._2 != d.id &&
          cosE6(m._4, d.embedding) >= thresholdE6).map(_._2).sorted.headOption
        out += Decision(d.id, bestId, hit.isEmpty, hit.getOrElse(-1L))
        byCluster(bestId) = (bestId, d.id, d.us, d.embedding) :: mine
      }
    }
    state.update(ShardState(cents, byCluster.valuesIterator.flatten.toList))
    out.result().iterator
  }

  /** EXECUTOR-SHARDED semantic dedup — the unbounded form of
    * [[semanticDedupStreaming]], closing its declared ceiling: there the
    * driver (and every executor) holds ALL k ~ sqrt(N) fine centroids.
    * Here NO process ever does. Only the k2 ~ N^(1/4) COARSE seeds are
    * driver-collected and broadcast (178 rows at N = 1e9 — the qn20c
    * bound, one tier smaller); the fine-centroid table stays a
    * DISTRIBUTED dataset whose rows flow through the same shuffle as
    * the data, each routed map-side to its coarse cell, and each
    * cell's state shard ingests only ITS centroids. An arrival routes
    * to its top-1 coarse cell (the oracle's nProbe=1 IVF form — an
    * arrival lives in exactly one shard, a DECLARED stronger
    * approximation than qn20c's 3-probe batch assignment) and is
    * deduped within the fine cluster it lands in. The only shuffle is
    * the groupByKey on coarse_id; per-shard state is ~k/k2 centroids
    * plus the live members of its clusters.
    *
    * Works identically over batch input (qn20d's registration — Spark
    * runs stateful operators over batch frames) and a MemoryStream
    * (StreamSemanticSpec primes the centroid markers in the first
    * micro-batch; state persists them for later arrivals). */
  def semanticDedupSharded(vecs: Dataset[VecIn],
      fineCents: Dataset[(Long, Array[Float])],
      coarse: IndexedSeq[(Long, Array[Float])], thresholdE6: Long): Dataset[Decision] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    track(spark, bcCoarse)
    val centIn = fineCents.map { case (cid, ce) =>
      ShardIn(assign(bcCoarse.value, ce), is_cent = true, cid, ce, Long.MinValue) }
    val vecIn = vecs.map(v =>
      ShardIn(assign(bcCoarse.value, v.embedding), is_cent = false, v.vec_id, v.embedding, v.us))
    semanticDedupShardedIn(centIn.unionByName(vecIn), thresholdE6)
  }

  /** The sharded pipeline over an already-routed merged input — the
    * entry a STREAMING caller uses (a stream cannot union a static
    * frame, so centroid markers must ride the same stream; prime them
    * in/before the first data micro-batch — state persists them). */
  def semanticDedupShardedIn(rows: Dataset[ShardIn], thresholdE6: Long): Dataset[Decision] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.coarse_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        shardGroup(thresholdE6))
  }

  /** Batch twin: same assignment, same decision code, full cluster at
    * once — the reference semantics the streaming path is tested
    * against (and the semantics of qn20's drop set, with arrival order
    * = vec_id). */
  def semanticDedupBatch(vecs: Dataset[VecIn],
      centroids: IndexedSeq[(Long, Array[Float])], thresholdE6: Long): Dataset[Decision] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bcCents = spark.sparkContext.broadcast(centroids)
    track(spark, bcCents)
    vecs
      .map(v => (assign(bcCents.value, v.embedding), v.vec_id, v.us, v.embedding))
      .toDF("cent_id", "vec_id", "us", "embedding")
      .withColumn("ts", timestamp_micros(col("us")))
      .as[AsgVec]
      .groupByKey(_.cent_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[AsgVec], _: GroupState[Cluster]) => {
          val arrived = it.toSeq.sortBy(d => (d.us, d.vec_id))
          decide(arrived, Nil, thresholdE6, -1L)._1.iterator
        })
  }
}
