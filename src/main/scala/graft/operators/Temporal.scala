package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the `events` stream table: as-of join and
  * windowed attribution (range) join — the two joins every event pipeline
  * needs that plain equi-join doesn't give you.
  *
  * Scale design (100 TB): [[Temporal.asofJoin]] is the union+window
  * composition — tag both sides, union, and take the last right-side row
  * at-or-before each left row inside one `Window.partitionBy(keys)`.
  * That is ONE shuffle on the join keys, no range explosion, no
  * per-row probe; skewed keys split under AQE like any other window.
  * The alternative (equi-join on key + range filter + argmax) shuffles
  * the full M x N per-key cross product; the union form moves M + N rows.
  * The attribution join keeps the equi-join-plus-range-predicate form
  * because it genuinely wants ALL rows in the window, not the latest —
  * its per-key fan-out IS the result size.
  */
object Temporal {

  /** As-of join: for each `left` row, the single latest `right` row on the
    * same key with `right.tsCol <= left.tsCol` (inclusive). Left rows with
    * no prior right row keep nulls (left-outer semantics). Right rows must
    * be unique per (key, ts) for the match to be well-defined.
    *
    * Cited shape: DuckDB's `ASOF LEFT JOIN` (the oracle below) and the
    * classic sorted-merge as-of of time-series stores, re-expressed as a
    * Spark window over the tagged union.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(c => keys.contains(c))
    val rStruct = struct(rPayloadCols.map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType
    val lPayloadCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    // Every left column rides through the tagged union (right rows carry
    // nulls for them), so no post-window rejoin is needed — a rejoin on
    // (keys, ts) would duplicate rows on timestamp ties.
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"), rStruct.as("__r")) ++
        lPayloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rStructType).as("__r")) ++ lPayloadCols.map(col): _*)
    // Right rows sort before left rows at equal ts (__side 0 < 1), so a
    // right row AT the left row's timestamp is visible to it — inclusive
    // as-of, matching `ON right.ts <= left.ts`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        lPayloadCols.map(col) :+ col("__match"): _*)
  }

  private val sqlEvents =
    "SELECT event_id, user_id, epoch_us(ts) AS us, event_type, " +
      "CAST(round(value * 100) AS BIGINT) AS cents FROM events"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))

  val all: Seq[Q] = Seq(

    // For every purchase, the user's most recent click at-or-before it.
    Q("qr01_asof_last_click",
      s"""WITH e AS ($sqlEvents)
         |SELECT p.event_id, p.user_id, p.us AS purchase_us,
         |       c.event_id AS click_id, c.us AS click_us,
         |       p.us - c.us AS gap_us
         |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
         |ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON p.user_id = c.user_id AND c.us <= p.us
         |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
      asofJoin(purchases, clicks, Seq("user_id"), "us", "click_us")
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
          col("__match.click_id").as("click_id"),
          col("__match.click_us").as("click_us"),
          (col("us") - col("__match.click_us")).as("gap_us"))
        .orderBy("event_id")
    },

    // Attribution-window (range) join: every click within the 30 minutes
    // before each purchase, aggregated per purchase. Equi-join on user_id
    // + range predicate: the shuffle is on user_id, the range is a
    // partition-local filter, and the fan-out is the answer itself.
    Q("qr02_click_attribution_window",
      s"""WITH e AS ($sqlEvents)
         |SELECT p.event_id, p.user_id,
         |       COUNT(c.event_id) AS n_clicks_30m,
         |       CAST(COALESCE(SUM(c.cents), 0) AS BIGINT) AS sum_click_cents
         |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
         |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON p.user_id = c.user_id AND c.us > p.us - 1800000000 AND c.us <= p.us
         |GROUP BY p.event_id, p.user_id
         |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("us").as("click_us"), col("cents"))
      purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("click_us") > col("us") - 1800000000L && col("click_us") <= col("us"),
          "left")
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(col("click_id")).as("n_clicks_30m"),
          coalesce(sum(col("cents")), lit(0L)).as("sum_click_cents"))
        .orderBy("event_id")
    },

    // Ordered funnel conversion: view -> click (strictly after the first
    // view) -> purchase (strictly after that click). Each stage is a
    // per-user min-timestamp aggregation conditioned on the previous
    // stage — three shuffles on user_id, no self-cross-products, which
    // is the scalable funnel shape (per-stage aggregate, not per-path
    // enumeration).
    Q("qr03_funnel_conversion",
      s"""WITH e AS ($sqlEvents),
         |v AS (SELECT user_id, MIN(us) AS vus FROM e WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, MIN(us) AS cus FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND us > vus GROUP BY 1),
         |p AS (SELECT e.user_id, MIN(us) AS pus FROM e JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND us > cus GROUP BY 1)
         |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
         |       (SELECT COUNT(*) FROM v) AS n_viewed,
         |       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
         |       (SELECT COUNT(*) FROM p) AS n_purchased_after_click""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("vus"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("vus"))
        .groupBy("user_id").agg(min(col("us")).as("cus"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("cus"))
        .groupBy("user_id").agg(min(col("us")).as("pus"))
      e.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(v.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_after_click")))
    },

    // Retention cohorts: users grouped by first-activity week; for each
    // cohort, distinct users still active k weeks later. Two keyed aggs
    // plus a user_id join that reuses the first agg's partitioning (same
    // key, no extra exchange) — the analytics staple over the raw event
    // stream, shuffles sized by users not events.
    Q("qr04_retention_cohorts",
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
         |f AS (SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY 1)
         |SELECT f.cohort_week, e.wk - f.cohort_week AS week_offset,
         |       COUNT(DISTINCT e.user_id) AS n_users
         |FROM e JOIN f USING (user_id)
         |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val weekUs = 604800000000L
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("wk"))
      val f = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      e.join(f, "user_id")
        .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }
  )
}
