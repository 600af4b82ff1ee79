package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the scale claims in the scaladocs are
  * pinned here so a regression (lost broadcast, lost pushdown, lost
  * partition pruning, codegen break) fails CI, not a 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q07 dimension joins are broadcast, fact scan prunes columns") {
    val p = planOf("q07_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(5).mkString("\n"))
    // orders scan must not read unused columns like o_comment-ish fields;
    // the projection needs only keys + totalprice.
    val scanLines = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(scanLines.contains("o_custkey") && scanLines.contains("o_totalprice"))
    assert(!scanLines.contains("o_clerk"))
  }

  test("filter on lineitem pushes down to the parquet scan") {
    val df = Tables.lineitem(spark, sf).filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"), p)
  }

  test("lake read with month predicate prunes partitions, month stays string") {
    val name = "q0l_lake_roundtrip"
    val df = SparkEntry.queries(name)(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // Partition filter on month must appear as a PartitionFilters entry,
    // not a post-scan Filter.
    assert(p.contains("PartitionFilters") && p.contains("month"), p)
    assert(df.schema("month").dataType == org.apache.spark.sql.types.StringType)
  }

  test("q20 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q20_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("native dot product runs inside whole-stage codegen") {
    val df = Tables.embeddings(spark, sf).select(
      graft.functions.VectorExprs.dotNative(col("embedding"), col("embedding")).as("d"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage.
    assert(p.contains("*(1) Project") && p.contains("dotproductff"), p)
    // And codegen actually compiles (would fall back silently otherwise):
    // force evaluation and check a value.
    val v = df.limit(1).collect()(0).getDouble(0)
    assert(v > 0.0)
  }

  test("qn07 probe join broadcasts the probes (no shuffle of the big side)") {
    val p = planOf("qn07_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("documents aggregations keep a single scan-side partial aggregate") {
    val p = planOf("qt05_lang_corpus_stats")
    // partial + final HashAggregate pair = map-side combine before shuffle.
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("as-of join shuffles once on the key (tagged union + window, no range join)") {
    val p = planOf("qr01_asof_last_click")
    assert(p.contains("Window"), p)
    // exactly two exchanges: the window's hash partitioning + the final
    // presentation sort's range partitioning — no join exchange at all.
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 2, s"expected window+sort exchanges only:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination check broadcasts the benchmark n-gram set") {
    val p = planOf("qn11_contamination_check")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bucketed fact tables join with zero shuffle exchanges") {
    import graft.sources.BucketedLake
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    BucketedLake.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "orders_bkt", s"$dir/orders", "o_orderkey", 4)
    BucketedLake.writeBucketed(Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_bkt", s"$dir/lineitem", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val j = BucketedLake.table(spark, "orders_bkt")
        .join(BucketedLake.table(spark, "lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
      // and the co-located join is the same join: row count matches the
      // plain-parquet plan
      val plain = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("qt08 broadcasts no corpus-derived side; the two doc windows share one exchange") {
    val p = planOf("qt08_tfidf_top_terms")
    // Every side is corpus-sized (tf, df, n_tok): the only broadcast
    // allowed is the single-row N scalar (a nested-loop with a 1-row
    // build), never a hash-join build side.
    assert(!p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("ShuffledHashJoin"), p.linesIterator.take(8).mkString("\n"))
    // n_tok cumsum window + rank window, one hashpartitioning(doc_id) exchange
    val docExchanges = "hashpartitioning\\(doc_id#\\d+L?, \\d+\\)".r
      .findAllIn(p.linesIterator.filter(_.contains("Exchange")).mkString("\n")).size
    assert(docExchanges == 1, s"expected 1 doc_id window exchange, got $docExchanges:\n$p")
  }

  test("pair-join strategy flips from broadcast to shuffled-hash over the size cap") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    // The pair joins run inside eager localCheckpoints, so the QUERY's
    // final plan never shows them — capture every executed plan instead.
    spark.listenerManager.register(listener)
    def capturedPlans[A](body: => A): (A, Seq[String]) = {
      plans.clear()
      val r = body
      // listener delivery is async; poll until the checkpoint plans land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      (r, scala.jdk.CollectionConverters.IteratorHasAsScala(plans.iterator()).asScala.toSeq)
    }
    // Trailing slash: same data, distinct memo key — an earlier suite may
    // already have memoized qn03's checkpointed pair frame for `sf`, which
    // would leave nothing for the listener to observe.
    val dir = sf + "/"
    try {
      val (big, bigPlans) = capturedPlans {
        SparkEntry.queries("qn03_jaccard_pairs")(spark, dir).collect()
      }
      assert(bigPlans.exists(_.contains("BroadcastHashJoin")),
        s"default cap should broadcast; saw:\n${bigPlans.map(_.linesIterator.take(3).mkString("|")).mkString("\n")}")

      spark.conf.set("spark.graft.pairJoin.broadcastMaxRows", "0")
      val (small, smallPlans) = capturedPlans {
        SparkEntry.queries("qn03_jaccard_pairs")(spark, dir).collect()
      }
      assert(smallPlans.exists(_.contains("ShuffledHashJoin")),
        s"cap=0 should shuffle-hash; saw:\n${smallPlans.map(_.linesIterator.take(3).mkString("|")).mkString("\n")}")
      assert(smallPlans.forall(!_.contains("BroadcastHashJoin")),
        "cap=0 must not broadcast any pair-plan side")
      // identical rows either way: the cap changes the physical strategy only
      assert(big.map(_.toString).toSeq == small.map(_.toString).toSeq)
    } finally {
      spark.conf.unset("spark.graft.pairJoin.broadcastMaxRows")
      spark.listenerManager.unregister(listener)
    }
  }

  test("qn19 assignment plans through TopKPerGroup with map-side partials") {
    val p = planOf("qn19_kmeans_step")
    // partial (true) heap before the exchange, final (false) after — the
    // argmin never sorts whole groups or shuffles full vectors twice
    assert(p.contains("TopKPerGroup true") && p.contains("TopKPerGroup false"), p)
    assert(!p.contains("BroadcastHashJoin"), p) // centroids ride a tiny BNLJ
  }

  test("q30 grouping sets is one Expand + one aggregate, not a scan union") {
    val p = planOf("q30_grouping_sets")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Union"), p)
    // One orders scan feeds all three grouping sets.
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q32 correlated scalar subquery decorrelates to aggregate + join") {
    val p = planOf("q32_scalar_subquery")
    // Decorrelation leaves a plain join against the per-customer
    // aggregate; a surviving subquery would plan as a Subquery node
    // re-executed per row.
    assert(!p.contains("Subquery"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("qn27 linkage joins on the block key, never a nested loop") {
    val p = planOf("qn27_record_linkage")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("qt10 LM model joins shuffled-hash; nothing corpus-derived broadcasts") {
    val p = planOf("qt10_lm_surprise")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("qn28 sketch joins broadcast only the 64-cell sides") {
    val p = planOf("qn28_countmin_hitters")
    // The candidate side is TakeOrdered-bounded (k=20), the cell sides
    // are width-bounded (64): every join input is O(1) in corpus size.
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pair dedup plans have no distinct over the candidate stream") {
    // The first-common / first-agreeing filters replaced the pair
    // distinct(): candidate streams must reach the output through
    // filters, not a HashAggregate over (doc_a, doc_b).
    Seq("qn03_jaccard_pairs", "qn04_minhash_lsh_pairs").foreach { name =>
      val p = planOf(name)
      val aggs = p.linesIterator.filter(l =>
        l.contains("HashAggregate") && l.contains("doc_a") && l.contains("doc_b")).toSeq
      assert(aggs.isEmpty, s"$name pair-level aggregate survived:\n${aggs.mkString("\n")}")
    }
  }

  test("no registered query plans a SortAggregate, CartesianProduct, or undocumented nested loop") {
    // The whole-registry sweep of the round-6 plan audit, pinned. A
    // SortAggregate means an aggregate fell off the hash path (round 5:
    // qn09's dropDuplicates over array payloads — first() on an array
    // column has no mutable hash buffer, so the FULL candidate stream got
    // sorted); a CartesianProduct means a join lost its keys. Both are
    // silent 100x hazards at scale, invisible to the value-level oracle.
    // BroadcastNestedLoopJoin is legitimate ONLY in the two documented
    // patterns — a broadcast O(1)-size probe/centroid side scored against
    // the corpus, or a single-row scalar-aggregate crossJoin — and those
    // queries are allowlisted by name so a new one must justify itself.
    val bnljAllowed = Set(
      "qn07_cosine_topk",     // broadcast 10-row probe side
      "qn10_ann_ivf_topk",    // broadcast centroid table (assignment + routing)
      "qn10b_ann_ivf_persisted", // same centroid routing over the persisted index
      "qn10c_ann_ivf_append",    // same centroid routing (build-half centroids)
      "qn10d_ann_ivf_probe_join", // same centroid routing; the INDEX join is an equi-join on cent_id
      "qn10e_ann_ivf_probe_join_coarse", // coarse tier: k2-row seed broadcast + 1-row cstride scalar; fine cells via coarse_id equi-join
      "qn19_kmeans_step",     // broadcast centroid table
      "qn30_pq_codebooks",    // single-row stride-scalar crossJoin (seed lattice)
      "qn34_ann_binary_hamming", // broadcast 10-row probe-signature side vs the sig column
      "qn34b_ann_binary_hamming_persisted", // broadcast 10-row probe-signature side vs the stored sig column
      "qn46_ann_binary_wide_persisted", // same probe-signature broadcast, 4-word sig at 256 dims
      "qn47_ann_sq8_wide_persisted", // broadcast 10-row probe-byte side vs the stored 256-dim codes
      "qn45_ann_ivf_sq8_persisted", // broadcast centroid routing + broadcast probe-byte side vs cell-scoped codes
      "qn48_ann_matryoshka_param", // broadcast 10-row probe-prefix side (64-of-256 prefix)
      "qn36_ann_ivfpq_residual", // stride scalar + broadcast centroid/probe/residual-table sides
      "qn35_ann_matryoshka_prefix", // broadcast 10-row probe-prefix side vs the prefix column
      "qn32_ann_pq_adc",      // broadcast 10-row ADC-table side scored against the codes
      "qn43_ann_pq_adc_opq",  // same ADC-table broadcast over the rotated space
      "qn38_ann_sq8",         // single-row per-dim-stats crossJoin + broadcast 10-row probe-byte side
      "qn38b_ann_sq8_persisted", // broadcast 10-row probe-byte side scored against the stored codes
      "qn64_ann_sq8_range", // broadcast 10-row probe-byte side vs the codes scan (surfaces in the over-cap distributed-refine branch; the fixture path collects survivors and point-reads)
      "qn65_hybrid_retrieval", // vector tier broadcasts the 5-probe side (qn07 shape); keyword tier is all equi-joins
      "qn68_hybrid_filtered", // same 5-probe broadcast; the lang filter adds only semi-joins
      "qn70_hybrid_persisted", // same 5-probe broadcast, scored against the stored float side
      "qn33_ann_ivfpq_refine", // stride scalar + broadcast centroid/probe/ADC-table sides
      "qn25_mixture_weights", // single-row scalar crossJoin
      "qn29_mixture_apply",   // single-row scalar crossJoin
      "qp01_clean_corpus",    // single-row stage-count crossJoins
      "qp03_training_manifest", // single-row scalar crossJoin
      "qr03_funnel_conversion", // single-row scalar crossJoin
      "qt08_tfidf_top_terms") // single-row corpus-size crossJoin
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = planOf(name)
      val flags = Seq("SortAggregate", "CartesianProduct").filter(p.contains) ++
        (if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
           Seq("BroadcastNestedLoopJoin") else Nil)
      if (flags.isEmpty) Nil else Seq(s"$name: ${flags.mkString(",")}")
    }
    assert(bad.isEmpty, s"heavy operators crept into:\n${bad.mkString("\n")}")
  }
}
