package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators (SURVEY.md §2.K): sessionization and windowed
  * aggregation, written once and runnable in BOTH batch and Structured
  * Streaming mode.
  *
  * The custom-state path is `flatMapGroupsWithState` — the Spark-native
  * way to express "session with a 30-minute inactivity gap" when the
  * built-in `session_window` isn't enough (e.g. you need per-session
  * payloads, caps, or side outputs). In streaming mode the same function
  * runs incrementally with event-time timeouts against the state store;
  * in batch mode Spark invokes it once per key with the full group — the
  * semantics (and our DuckDB oracle) are identical.
  *
  * Scale: state is partitioned by `user_id` (the shuffle key), one
  * [[SessionAcc]] per live key, O(1) per event after the in-group sort;
  * watermark bounds state growth in streaming mode.
  */
object Sessionize {

  /** 30-minute inactivity gap, in microseconds. */
  val GapUs: Long = 1800L * 1000000L

  case class Ev(user_id: Long, us: Long, value: Double)

  case class SessionOut(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      sum_value: Double)

  case class SessionAcc(startUs: Long, endUs: Long, n: Long, sum: Double)

  /** Session assembly for one user's time-ordered events. Pure — shared
    * verbatim by the batch and streaming paths. */
  private def assemble(sorted: Iterator[Ev]): Iterator[SessionOut] = {
    val out = Seq.newBuilder[SessionOut]
    var cur: Option[SessionAcc] = None
    var uid = 0L
    for (e <- sorted) {
      uid = e.user_id
      cur match {
        case Some(a) if e.us - a.endUs <= GapUs =>
          cur = Some(SessionAcc(a.startUs, e.us, a.n + 1, a.sum + e.value))
        case Some(a) =>
          out += SessionOut(uid, a.startUs, a.endUs, a.n, a.sum)
          cur = Some(SessionAcc(e.us, e.us, 1L, e.value))
        case None =>
          cur = Some(SessionAcc(e.us, e.us, 1L, e.value))
      }
    }
    cur.foreach(a => out += SessionOut(uid, a.startUs, a.endUs, a.n, a.sum))
    out.result().iterator
  }

  /** Batch-mode sessionization via flatMapGroupsWithState. Input must
    * have columns (user_id, us, value); `us` is event-time micros. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("us"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[Ev], _: GroupState[SessionAcc]) =>
          // Batch mode: the full group arrives once; order is not
          // guaranteed, so sort by event time here. (The streaming path
          // below keeps running state instead.)
          assemble(it.toSeq.sortBy(_.us).iterator))
  }

  /** Streaming-mode sessionization for an unbounded source: same
    * [[assemble]] logic, with state carried across micro-batches and
    * closed by event-time timeout once the watermark passes the gap. */
  def sessionsStreaming(events: Dataset[Ev]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionAcc]) => {
          if (state.hasTimedOut) {
            val a = state.get
            state.remove()
            Iterator(SessionOut(uid, a.startUs, a.endUs, a.n, a.sum))
          } else {
            // Merge incoming micro-batch into running state; emit every
            // closed session, keep the open one in state.
            val evs = it.toSeq.sortBy(_.us)
            var acc = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- evs) acc match {
              case Some(a) if e.us - a.endUs <= GapUs =>
                acc = Some(SessionAcc(a.startUs, e.us, a.n + 1, a.sum + e.value))
              case Some(a) =>
                closed += SessionOut(uid, a.startUs, a.endUs, a.n, a.sum)
                acc = Some(SessionAcc(e.us, e.us, 1L, e.value))
              case None =>
                acc = Some(SessionAcc(e.us, e.us, 1L, e.value))
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.endUs / 1000L + GapUs / 1000L)
            }
            closed.result().iterator
          }
        })
  }
}
