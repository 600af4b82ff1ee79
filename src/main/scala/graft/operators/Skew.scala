package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the static counterpart to the AQE
  * skew-join split pinned in SkewSpec.
  *
  * The `events` table joins and aggregates on `event_type`, a 5-value
  * column: hash-partitioned on that key alone, ~100 TB of fact rows land
  * on 5 reducers no matter how many executors the cluster has. AQE's
  * OptimizeSkewedJoin repairs this at runtime for sort-merge/shuffled-hash
  * JOIN partitions, but it cannot help
  *
  *  - non-algebraic AGGREGATION on the hot key (collect_set/collect_list:
  *    partial buffers still merge on one reducer per key),
  *  - stateful streaming keyed on the hot column (state shards by key), or
  *  - engines/paths where AQE is off or the skew is known ahead of time.
  *
  * Salting fixes the partition function instead of the plan: widen the key
  * to (key, salt) where salt = hash(uniform column) mod S, replicate the
  * small side S-fold (join) or re-merge the S partials (aggregation). The
  * result is byte-identical to the unsalted query — both forms here are
  * hash-checked against the same unsalted DuckDB oracle — while the hot
  * key's rows spread over S reducers. S trades replication/merge overhead
  * for parallelism; at 1000 executors S ~ a few x the per-key executor
  * deficit (here 16, plenty for 32 local cores and demonstrably >1 task
  * per hot key).
  *
  * Reference scope note: the reference engine has no skew handling (its
  * groupings — `organize_discogs_files`, s3.py:345-375 — are per-file
  * manifests); this module is part of the 100 TB training-pipeline surface
  * the survey's north-star section declares.
  */
object Skew {

  /** Deterministic per-type weights used as the join's dimension side.
    * VALUES-literal in the oracle; a tiny in-memory frame here. At scale
    * this stands in for a mid-size dim that is too big to broadcast —
    * the join is therefore FORCED to shuffle (shuffle_hash hint) so the
    * salting actually exercises the skewed-exchange path.
    */
  private val weights: Seq[(String, Double)] = Seq(
    "click" -> 0.10, "error" -> 0.00, "purchase" -> 5.00,
    "signup" -> 1.00, "view" -> 0.05)

  /** Salted equi-join of a skew-keyed fact against a dim on `key`.
    *
    * Fact rows get `salt = pmod(hash(saltSrc), s)` from a uniformly
    * distributed column (NOT the join key — the point is to split within
    * each key); dim rows are replicated once per salt value via a
    * `sequence`+`explode` (s rows per dim row, no shuffle). The join key
    * becomes (key, salt), so the exchange hash-partitions each hot key
    * into s independent reducers. Dropping the salt afterwards restores
    * the plain join's schema and multiset of rows exactly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, s: Int): DataFrame = {
    // s = 0 would be SILENT data loss, not an error: pmod(x, 0) is null
    // under non-ANSI eval and sequence(0, -1) descends, so no salt ever
    // matches and the join returns empty.
    require(s >= 1, s"saltedJoin: salt count must be >= 1, got $s")
    val sf = fact.withColumn("__salt", pmod(hash(saltSrc), lit(s)))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1)))).hint("shuffle_hash")
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }

  private val S = 16

  /** Below this expected DISTINCT-values-per-hot-key, hierarchical
    * salted distinct aggregation LOSES to the plain one-level form —
    * measured in the round-12 skew battery (20M rows, 90% hot key): the
    * S-fold shard pass plus the flatten merge cost more than the single
    * overloaded reducer saves until per-key distinct state is roughly
    * a million values. Salting fixes REDUCER-STATE skew, not small
    * aggregations. */
  val saltedDistinctMinPerKey = 1000000L

  /** Distinct-set aggregation on a skew-prone key with the measured
    * salt gate applied: above [[saltedDistinctMinPerKey]] expected
    * distinct values per key, the qk02 hierarchical shape (each of `s`
    * salt shards builds its own collect_set — a value always hashes to
    * the same shard, so shards PARTITION the distinct set — then the
    * per-key merge concatenates pre-deduplicated arrays); below it,
    * plain collect_set. Both branches return identical (key,
    * sorted-distinct array) rows; the estimate only picks the plan.
    * `est` comes from whatever the caller knows — an HLL sketch
    * (qn11's machinery), table stats, or the previous run. */
  def saltedDistinctAuto(df: DataFrame, key: String, value: String,
      s: Int, estDistinctPerKey: Long): DataFrame = {
    require(s >= 1, s"saltedDistinctAuto: salt count must be >= 1, got $s")
    if (estDistinctPerKey < saltedDistinctMinPerKey)
      df.groupBy(col(key)).agg(array_sort(collect_set(col(value))).as("values"))
    else
      df.groupBy(col(key), pmod(hash(col(value)), lit(s)).as("__salt"))
        .agg(collect_set(col(value)).as("vs"))
        .groupBy(col(key))
        .agg(array_sort(flatten(collect_list(col("vs")))).as("values"))
  }

  /** The dim side as a frame — shared with the Battery's at-scale rig so
    * the battery measures the REGISTERED query's exact join shape. */
  private[graft] def weightsDF(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    weights.toDF("event_type", "weight")
  }

  val all: Seq[Q] = Seq(

    // Salted shuffle join on the 5-value event_type key. The aggregate
    // after the join is decimal-exact (Relational's float policy), so the
    // salted plan is hash-identical to DuckDB's unsalted VALUES join.
    Q("qk01_salted_skew_join",
      """SELECT event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(weight AS DECIMAL(9,4))) AS DOUBLE) AS wvalue,
        |       COUNT(*) AS n
        |FROM events
        |JOIN (VALUES ('click', 0.10), ('error', 0.00), ('purchase', 5.00),
        |             ('signup', 1.00), ('view', 0.05)) AS d(event_type, weight)
        |USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dim = weights.toDF("event_type", "weight")
      saltedJoin(Tables.events(s, dir), dim, "event_type", col("event_id"), S)
        .groupBy(col("event_type"))
        .agg(
          sum(col("value").cast("decimal(18,2)") * col("weight").cast("decimal(9,4)"))
            .cast("double").as("wvalue"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Salted NON-ALGEBRAIC aggregation — the case AQE cannot repair. The
    // distinct-user set per hot key is assembled hierarchically: each of
    // the S salt shards builds its own collect_set (a given user_id always
    // hashes to the same shard, so the shards partition the distinct set),
    // then the final per-key merge concatenates S pre-deduplicated arrays
    // instead of re-scanning every raw row on one reducer. State per
    // reducer drops from |distinct(key)| to |distinct(key)|/S.
    Q("qk02_salted_distinct_users",
      """SELECT event_type,
        |       array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val shards = Tables.events(s, dir)
        .groupBy(col("event_type"), pmod(hash(col("user_id")), lit(S)).as("__salt"))
        .agg(collect_set(col("user_id")).as("us"))
      shards.groupBy(col("event_type"))
        .agg(
          array_join(
            transform(array_sort(flatten(collect_list(col("us")))), _.cast("string")),
            ",").as("users"),
          sum(size(col("us"))).cast("bigint").as("n_users"))
        .orderBy(col("event_type"))
    })
}
