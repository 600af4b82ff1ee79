package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) across heterogeneous tables —
  * the fuzzy-join shape every curation pipeline needs when two sources
  * describe the same entities with different surface forms.
  *
  * The canonical two-phase plan: (1) BLOCK on a cheap derived key so
  * candidate generation is an equi-join (shuffle on the block key, never
  * a cross join); (2) VERIFY each blocked pair with an exact string
  * distance. Levenshtein is unit-cost edit distance with identical
  * semantics in Spark (codegen'd built-in) and DuckDB, so the whole
  * pipeline — including the verification threshold — replays in the
  * oracle.
  *
  * Scale shape (100 TB): the block key bounds the join fan-out (bucket
  * sizes are the skew knob — a production blocker composes several weak
  * keys and unions the candidate sets); the verify filter is per-row
  * scalar work that whole-stage codegen keeps in the join's output
  * stage. Nothing broadcasts — both sides shuffle on the block key.
  */
object Linkage {

  val all: Seq[Q] = Seq(

    // Customer<->supplier linkage: block on the trailing-2-digit bucket
    // of the entity's numeric suffix (a deliberately weak key: ~N/100
    // per bucket), verify with levenshtein <= 6 — one digit of slack
    // over the 5 edits separating the "Customer"/"Supplier" prefixes,
    // so exact-id matches (lev 5) and one-digit-off near-ids (lev 6)
    // survive while the verifier rejects the rest of each block (at
    // sf0.01: 1100 of 1500 blocked pairs pass).
    Q("qn27_record_linkage",
      """WITH c AS (SELECT c_custkey, c_name,
        |                  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) % 100 AS blk
        |           FROM customer),
        |s AS (SELECT s_suppkey, s_name,
        |             CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT) % 100 AS blk
        |      FROM supplier)
        |SELECT c_custkey, s_suppkey, c_name, s_name,
        |       CAST(levenshtein(c_name, s_name) AS BIGINT) AS lev
        |FROM c JOIN s USING (blk)
        |WHERE levenshtein(c_name, s_name) <= 6
        |ORDER BY c_custkey, s_suppkey""".stripMargin) { (sp, dir) =>
      def blk(name: String) =
        regexp_extract(col(name), "([0-9]+)$", 1).cast("long") % 100
      val c = Tables.customer(sp, dir)
        .select(col("c_custkey"), col("c_name"), blk("c_name").as("blk"))
      val s = Tables.supplier(sp, dir)
        .select(col("s_suppkey"), col("s_name"), blk("s_name").as("blk"))
      // The THRESHOLDED levenshtein (returns -1 when distance > k) runs
      // the banded O(k*n) DP with early exit instead of the full O(n^2)
      // table — the verify step's per-pair cost is bounded by the
      // threshold, not the name length. Survivors carry their true
      // distance, so the emitted lev matches the oracle's full compute.
      c.join(s, "blk")
        .withColumn("lev", levenshtein(col("c_name"), col("s_name"), 6).cast("long"))
        .filter(col("lev") >= 0)
        .select(col("c_custkey"), col("s_suppkey"), col("c_name"), col("s_name"), col("lev"))
        .orderBy("c_custkey", "s_suppkey")
    }
  )
}
