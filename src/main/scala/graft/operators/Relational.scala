package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.X Q7–Q25) over the TPC-H-ish
  * testdata star schema, declarative DataFrame plans only — Catalyst picks
  * join strategies (broadcast hints on the dimension tables), AQE handles
  * skew/coalescing at scale.
  *
  * Float determinism policy (SURVEY §7 risk 5): any SUM over a double column
  * casts each row to DECIMAL first, so partial aggregation order cannot
  * change the result; the exact decimal total is then cast back to DOUBLE,
  * which both Spark and DuckDB do identically. AVGs are computed as
  * exact-decimal-sum / count in double. Raw doubles are only carried through
  * per-row (order-independent) arithmetic.
  */
object Relational {

  /** Order-insensitive exact sum of a 2-dp double column, returned as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  val all: Seq[Q] = Seq(

    // ---- Joins (E2) -----------------------------------------------------

    Q("q07_region_revenue",
      """SELECT r_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    },

    Q("q08_left_join_nulls",
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_unmatched"))
    },

    Q("q09_semi_customers_with_orders",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q10_anti_parts_never_ordered",
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      // Filtered to a date slice so the anti join has a non-empty result at
      // every SF (unfiltered, every part appears in some lineitem).
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("2001-01-01")))
      Tables.part(s, dir)
        .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    Q("q11_theta_lineitem_pairs",
      """SELECT COUNT(*) AS n_pairs
        |FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val l1 = li.select(col("l_orderkey"), col("l_linenumber").as("ln1"))
      val l2 = li.select(col("l_orderkey"), col("l_linenumber").as("ln2"))
      // Equi-join on the order key carries the pairing; the < predicate is a
      // post-join filter, so this stays a shuffled hash/sort-merge join, not
      // a cartesian product.
      l1.join(l2, Seq("l_orderkey")).filter(col("ln1") < col("ln2"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // ---- Aggregations (F4) ---------------------------------------------

    Q("q12_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = discPrice * (lit(1.0) + col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice.cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
          sum(charge.cast("decimal(18,6)")).cast("double").as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    Q("q13_distinct_custkeys",
      """SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
    },

    // approx_count_distinct is engine-specific HLL, so the raw estimate has
    // no cross-engine oracle — but its CONTRACT does: the estimate must land
    // within a bound derived from the requested precision (rsd=1%, gate=5%
    // — a 5-sigma margin, and deterministic for a fixed input since HLL++
    // hashes are seedless). Emitting the exact count plus the bound-check
    // boolean makes the query hash-gateable: DuckDB computes the same exact
    // count and a literal TRUE, so a drifting estimator flips the hash.
    Q("q13b_approx_distinct",
      """SELECT COUNT(DISTINCT o_custkey) AS exact_cust, TRUE AS within_bound
        |FROM orders""".stripMargin) { (s, dir) =>
      // Both aggregates are functions of the DISTINCT key set alone
      // (HLL++ registers are maxes over element hashes — duplicates
      // cannot move them), so they run over one distinct() pass:
      // bit-identical outputs, and the pathological multi-distinct
      // rewrite is gone (countDistinct + an imperative HLL in ONE agg
      // forced an Expand + object-hash path — measured 2.8 s warm at
      // sf0.1 vs 0.2 s + 0.8 s for the same aggregates run separately;
      // this shape is ~0.5 s). count(col) skips NULLs exactly as
      // COUNT(DISTINCT col) does.
      Tables.orders(s, dir).select(col("o_custkey")).distinct()
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"),
          count(col("o_custkey")).as("exact_cust"))
        .select(col("exact_cust"),
          (abs(col("approx_cust") - col("exact_cust"))
            <= lit(0.05) * col("exact_cust")).as("within_bound"))
    },

    Q("q14_rollup_orders",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
        .orderBy(col("status"), col("priority"))
    },

    Q("q15_cube_orders",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    },

    Q("q16_agg_empty_input",
      """SELECT COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       MIN(l_quantity) AS min_qty,
        |       MAX(l_quantity) AS max_qty
        |FROM lineitem WHERE l_quantity < 0""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") < 0)
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"))
    },

    // Exact percentiles: both engines sort the group and linearly
    // interpolate (Spark `percentile` == DuckDB `quantile_cont`), so the
    // computation is order-independent; e6 floor-scaling removes any
    // final-ulp interpolation risk from the compare.
    Q("q26_percentiles",
      """SELECT o_orderpriority,
        |       CAST(floor(quantile_cont(o_totalprice, 0.5) * 1000000) AS BIGINT) AS p50_e6,
        |       CAST(floor(quantile_cont(o_totalprice, 0.9) * 1000000) AS BIGINT) AS p90_e6,
        |       COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          floor(percentile(col("o_totalprice"), lit(0.5)) * 1000000).cast("long").as("p50_e6"),
          floor(percentile(col("o_totalprice"), lit(0.9)) * 1000000).cast("long").as("p90_e6"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- Windows (G2) ---------------------------------------------------

    Q("q17_rownum_top_order_per_cust",
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date, o_totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },

    Q("q18_lag_price_delta",
      """SELECT o_custkey, o_orderkey,
        |       o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |                                              ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      // Per-row double subtraction of the same two operands is bit-exact in
      // both engines; no decimal laundering needed.
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    Q("q19_running_sum",
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- Sort / limit / top-k (H3) -------------------------------------

    Q("q20_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
      // then a k-row merge on the driver — no global sort at scale.
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // ---- Set operations (I) --------------------------------------------

    Q("q21_union_except_months",
      """SELECT * FROM (
        |  (SELECT o_orderkey, o_orderstatus FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
        |   UNION ALL
        |   SELECT o_orderkey, o_orderstatus FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-04')
        |  EXCEPT
        |  (SELECT o_orderkey, o_orderstatus FROM orders
        |   WHERE strftime(o_orderdate, '%Y-%m') = '1995-03' AND o_orderstatus = 'F')
        |) ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val ym = date_format(col("o_orderdate"), "yyyy-MM")
      val a = o.filter(ym === "1995-03").select("o_orderkey", "o_orderstatus")
      val b = o.filter(ym === "1995-04").select("o_orderkey", "o_orderstatus")
      val c = o.filter(ym === "1995-03" && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus")
      a.unionByName(b).except(c).orderBy(col("o_orderkey"))
    },

    // ---- JSON (J8) ------------------------------------------------------

    Q("q22_json_extract_events",
      """SELECT event_id, event_type,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      // Parse the JSON ONCE: two get_json_object calls in one projection
      // each run the full parse (no common-subexpression elimination
      // across JsonPath invocations — 2x the scan cost, measured at the
      // 10M-row battery). k_val derives from the extracted string, which
      // is exactly the oracle's CAST(json_extract_string(...)).
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").as("k_str"))
        .withColumn("k_val", col("k_str").cast("long"))
        .orderBy(col("event_id"))
    },

    // ---- Hash functions (J10) ------------------------------------------

    Q("q23_hash_digest_customers",
      """SELECT c_custkey, sha256(c_name) AS h_sha256, md5(c_name) AS h_md5
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), sha2(col("c_name"), 256).as("h_sha256"),
          md5(col("c_name")).as("h_md5"))
        .orderBy(col("c_custkey"))
    },

    // ---- Event-time windows, batch form (K) ----------------------------

    Q("q24_tumbling_hourly_events",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_start,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("hour_start"),
          col("n"), col("sum_value"))
        .orderBy(col("hour_start"))
    },

    Q("q25_session_counts",
      """SELECT user_id,
        |       CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       COUNT(*) AS n_events
        |FROM (SELECT user_id, epoch_us(ts) AS us,
        |             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
      val thirtyMinUs = 1800L * 1000000L
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(when(col("prev_us").isNull || col("us") - col("prev_us") > thirtyMinUs, 1L)
          .otherwise(0L)).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // PIVOT: order counts per year, one column per order status. The
    // Spark side is the declarative pivot with EXPLICIT values — an
    // unspecified value list would cost a distinct-scan job AND make the
    // output schema data-dependent, which a production pipeline can't
    // have. The oracle is the CASE-count expansion (the relational
    // definition of pivot), so column names/types pin exactly.
    Q("q27_pivot_status_by_year",
      """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_o,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_f,
        |       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_p
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(year(col("o_orderdate")).cast("long").as("o_year"), col("o_orderstatus"))
        .groupBy("o_year")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        // pivot emits NULL (not 0) for absent (year, status) cells —
        // COUNT(CASE ...) in the oracle emits 0; align.
        .select(col("o_year"),
          coalesce(col("O"), lit(0L)).as("st_o"),
          coalesce(col("F"), lit(0L)).as("st_f"),
          coalesce(col("P"), lit(0L)).as("st_p"))
        .orderBy("o_year")
    },

    // UNPIVOT (melt): q27's wide per-status columns folded back to tall
    // (year, status, cnt) rows — the inverse reshaping, via the
    // first-class Dataset.unpivot operator (ids/values/variable/value).
    // The oracle is the UNION ALL expansion (the relational definition).
    Q("q29_unpivot_status_counts",
      """WITH p AS (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |                  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_o,
        |                  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_f,
        |                  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_p
        |           FROM orders GROUP BY 1)
        |SELECT o_year, status, cnt FROM (
        |  SELECT o_year, 'st_o' AS status, st_o AS cnt FROM p
        |  UNION ALL SELECT o_year, 'st_f', st_f FROM p
        |  UNION ALL SELECT o_year, 'st_p', st_p FROM p
        |) ORDER BY o_year, status""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(year(col("o_orderdate")).cast("long").as("o_year"), col("o_orderstatus"))
        .groupBy("o_year")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_year"),
          coalesce(col("O"), lit(0L)).as("st_o"),
          coalesce(col("F"), lit(0L)).as("st_f"),
          coalesce(col("P"), lit(0L)).as("st_p"))
        .unpivot(Array(col("o_year")),
          Array(col("st_o"), col("st_f"), col("st_p")), "status", "cnt")
        .orderBy("o_year", "status")
    },

    // INTERSECT (set semantics) — the set operation q21 doesn't cover:
    // customers active in BOTH months.
    Q("q28_intersect_customers",
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1995-04'
        |) ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val ym = date_format(col("o_orderdate"), "yyyy-MM")
      o.filter(ym === "1995-03").select("o_custkey")
        .intersect(o.filter(ym === "1995-04").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // GROUPING SETS — the explicit multi-set form rollup/cube (q14/q15)
    // are sugar for: two independent one-column breakdowns plus the grand
    // total in ONE pass over orders (Expand + a single aggregate; no
    // union of three scans). grouping_id() disambiguates which set each
    // row came from — both engines define it as the same
    // most-significant-bit-first bitvector over the grouping columns.
    Q("q30_grouping_sets",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        // grouping_id() is only defined inside the grouping-sets
        // aggregate itself (it reads the Expand node's set id).
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("total"))
        .orderBy(col("gid"), col("status"), col("priority"))
    },

    // RANGE window frame — the value-based frame q19's ROWS frame doesn't
    // cover: per order, the customer's trailing-30-day order count and
    // exact spend. RANGE makes same-day orders peers (all included in
    // each other's frames), so the result is deterministic under tie
    // reordering — a ROWS frame here would be order-dependent and
    // un-oracle-able. The frame key is epoch DAYS of the (timezone-naive)
    // order date — tz-free in both engines, unlike epoch microseconds of
    // an NTZ timestamp, which Spark only exposes through a
    // session-timezone-dependent cast.
    Q("q31_range_frame",
      """SELECT o_orderkey, o_custkey,
        |       COUNT(*) OVER w AS n_30d,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_date(to_date(col("o_orderdate"))))
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_30d"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("spend_30d"))
        .orderBy(col("o_orderkey"))
    },

    // Correlated scalar subquery, through the SQL surface: orders priced
    // above 1.5x their customer's average. Catalyst DECORRELATES this
    // (RewriteCorrelatedScalarSubquery) into the aggregate + join we'd
    // write by hand — one orders scan aggregates per customer, one joins
    // back — so there is no per-row subquery execution anywhere in the
    // physical plan. The average is exact-decimal-sum / count, identical
    // in both engines.
    Q("q32_scalar_subquery",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM parquet.`$dir/orders.parquet` o
           |WHERE o_totalprice > 1.5 * (
           |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           |  FROM parquet.`$dir/orders.parquet` o2 WHERE o2.o_custkey = o.o_custkey)
           |ORDER BY o_orderkey""".stripMargin)
    },

    // The ranking-function family q17's row_number doesn't cover: rank
    // (gaps), dense_rank (no gaps), ntile (equal-depth quartiles),
    // percent_rank and cume_dist (relative positions). The ordering is
    // fully tie-broken by o_orderkey, so ntile's bucket assignment and
    // the rank family are all deterministic; the two rational-valued
    // functions are e6-floored doubles — (rank-1)/(n-1) and peers/n are
    // single divisions both engines round identically.
    Q("q33_rank_functions",
      """SELECT o_custkey, o_orderkey,
        |       CAST(RANK() OVER w AS BIGINT) AS rnk,
        |       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |       CAST(floor(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS prank_e6,
        |       CAST(floor(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_e6
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          floor(percent_rank().over(w) * 1000000).cast("long").as("prank_e6"),
          floor(cume_dist().over(w) * 1000000).cast("long").as("cume_e6"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // FULL OUTER join — the join type E2's inner/left/semi/anti/theta
    // set doesn't cover: monthly order activity vs monthly ship
    // activity, keeping months present on either side only (ship months
    // trail order months because l_shipdate = order date + lag).
    Q("q34_full_outer",
      """SELECT COALESCE(om.ym, lm.ym) AS ym, om.n_orders, lm.n_ships
        |FROM (SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n_orders
        |      FROM orders GROUP BY 1) om
        |FULL OUTER JOIN
        |     (SELECT strftime(l_shipdate, '%Y-%m') AS ym, COUNT(*) AS n_ships
        |      FROM lineitem GROUP BY 1) lm
        |ON om.ym = lm.ym
        |ORDER BY ym""".stripMargin) { (s, dir) =>
      val om = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .agg(count(lit(1)).as("n_orders"))
      val lm = Tables.lineitem(s, dir)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("l_ym"))
        .agg(count(lit(1)).as("n_ships"))
      om.join(lm, col("o_ym") === col("l_ym"), "full_outer")
        .select(coalesce(col("o_ym"), col("l_ym")).as("ym"),
          col("n_orders"), col("n_ships"))
        .orderBy("ym")
    },

    // Date-spine gap filling — densification: hourly purchase counts
    // over the COMPLETE hour spine of the events table, missing hours
    // materialized as zeros (trainers and forecasters need dense series;
    // a groupBy alone silently drops empty buckets — purchases cover
    // only ~93% of hours). The spine is sequence(min, max, 1 hour) from
    // one scalar aggregate — generated, never scanned; the left join is
    // a tiny broadcast of counts onto the spine.
    Q("q35_gap_fill",
      """WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
        |                  date_trunc('hour', MAX(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
        |c AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT strftime(spine.h, '%Y-%m-%d %H:00:00') AS hour_start,
        |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_purchases
        |FROM spine LEFT JOIN c ON spine.h = c.h
        |ORDER BY hour_start""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val spine = ev
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
      val c = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).as("ch"))
        .agg(count(lit(1)).as("n"))
      spine.join(c, col("h") === col("ch"), "left")
        .select(date_format(col("h"), "yyyy-MM-dd HH:00:00").as("hour_start"),
          coalesce(col("n"), lit(0L)).as("n_purchases"))
        .orderBy("hour_start")
    }
  )
}
