package graft.operators

import graft.{Q, Tables}
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

/** Event-time windowing surface (SURVEY.md §2.K) in batch mode — each
  * query has a DuckDB oracle; the same operators run unbounded in
  * [[graft.streaming.Sessionize]] / StreamingSpec with watermarks.
  *
  * Money-like doubles are carried as integer cents (`round(value*100)`)
  * through stateful code so session sums are addition-order-independent
  * and exactly comparable.
  */
object Streaming {

  private val sqlEvents =
    "SELECT user_id, epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents FROM events"

  val all: Seq[Q] = Seq(

    // Custom-state sessionization (flatMapGroupsWithState): full session
    // rows. The oracle rebuilds sessions relationally: lag -> new-session
    // flag -> running-sum session id -> group.
    Q("qs01_sessions_stateful",
      s"""WITH e AS ($sqlEvents),
         |x AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
         |                       OR us - LAG(us) OVER w > ${Sessionize.GapUs} THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         |SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
         |       COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").cast("double").as("value"))
      val sess = Sessionize.sessions(ev)
      sess.toDF().select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"),
        col("sum_value").cast("long").as("sum_cents"))
        .orderBy("user_id", "session_start_us")
    },

    // Built-in session_window: same sessions from the declarative API —
    // Catalyst plans the merge, no user state. (Gap semantics differ from
    // qs01 only on exact-30-min gaps, which the testdata provably lacks.)
    Q("qs02_session_window",
      s"""WITH e AS ($sqlEvents),
         |x AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
         |                       OR us - LAG(us) OVER w >= ${Sessionize.GapUs} THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         |SELECT user_id, MIN(us) AS start_us, MAX(us) + ${Sessionize.GapUs} AS end_us,
         |       COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events"), col("sum_cents"))
        .orderBy("user_id", "start_us")
    },

    // Sliding windows (1 h length, 30 min slide): each event lands in two
    // grid-aligned windows; the oracle materializes both starts per event.
    Q("qs03_sliding_hourly",
      s"""WITH e AS ($sqlEvents),
         |w AS (SELECT user_id, cents, unnest([us - us % 1800000000,
         |                                     us - us % 1800000000 - 1800000000]) AS start_us
         |      FROM e)
         |SELECT start_us, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM w GROUP BY start_us ORDER BY start_us""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(round(col("value") * 100).cast("long").as("cents"),
          window(col("ts"), "1 hour", "30 minutes").as("w"))
        .groupBy(unix_micros(col("w.start")).as("start_us"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("start_us")
    },

    // Trending detection: top-2 event types per tumbling hour — the
    // windowed-agg + per-window top-k composition every monitoring
    // pipeline runs. Unbounded, the windowed count is a watermarked
    // streaming agg and the rank runs per micro-batch in foreachBatch
    // (ranking needs the window CLOSED, which is exactly what the
    // watermark emits); batch-mode here, where the row_number form plans
    // through TopKPerGroup.
    Q("qs04_trending_event_types",
      """WITH w AS (SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS start_us,
        |                  event_type
        |           FROM events),
        |c AS (SELECT start_us, event_type, COUNT(*) AS n FROM w GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY start_us
        |                 ORDER BY n DESC, event_type) AS rnk FROM c)
        |SELECT start_us, rnk, event_type, n FROM r WHERE rnk <= 2
        |ORDER BY start_us, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("start_us"))
        .orderBy(col("n").desc, col("event_type").asc)
      Tables.events(s, dir)
        .select(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .groupBy(unix_micros(col("w.start")).as("start_us"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("start_us"), col("rnk").cast("long").as("rnk"),
          col("event_type"), col("n"))
        .orderBy("start_us", "rnk")
    }
  )
}
