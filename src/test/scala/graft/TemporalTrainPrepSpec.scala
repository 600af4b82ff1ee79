package graft

import graft.functions.{FirstAgreeingBand, SortedFirstCommon, SortedIntersectCount}
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalTrainPrepSpec extends AnyFunSuite {
  import TestSpark._

  // ---- merge-walk expressions over non-string element types ------------

  test("sorted intersect count on int and long arrays") {
    import spark.implicits._
    val d = Seq(
      (Seq(1, 3, 5, 7), Seq(3, 4, 5, 6)),
      (Seq(1, 2), Seq(3, 4)),
      (Seq.empty[Int], Seq(1))
    ).toDF("a", "b")
    assert(d.select(SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq == Seq(2, 0, 0))
    val dl = Seq((Seq(1L, 9L), Seq(9L, 10L))).toDF("a", "b")
    assert(dl.select(SortedIntersectCount(col("a"), col("b")))
      .collect().head.getInt(0) == 1)
  }

  test("sorted first common returns the minimum shared element or null") {
    import spark.implicits._
    val d = Seq(
      (Seq(1, 4, 6), Seq(2, 4, 6)),  // first common 4
      (Seq(1, 2, 3), Seq(3)),        // first common 3
      (Seq(1, 2), Seq(5, 6))         // disjoint -> null
    ).toDF("a", "b")
    val got = d.select(SortedFirstCommon(col("a"), col("b"))).collect()
    assert(got(0).getInt(0) == 4)
    assert(got(1).getInt(0) == 3)
    assert(got(2).isNullAt(0))
    // string arrays too
    val ds = Seq((Seq("a", "c"), Seq("b", "c"))).toDF("a", "b")
    assert(ds.select(SortedFirstCommon(col("a"), col("b")))
      .collect().head.getString(0) == "c")
  }

  test("first agreeing band: index of first fully-equal band, -1 if none") {
    import spark.implicits._
    val d = Seq(
      (Seq(1L, 2L, 9L, 9L), Seq(1L, 2L, 8L, 8L)),  // band 0 agrees
      (Seq(1L, 2L, 9L, 9L), Seq(0L, 2L, 9L, 9L)),  // band 1 agrees
      (Seq(1L, 2L, 3L, 4L), Seq(9L, 9L, 9L, 9L))   // none
    ).toDF("a", "b")
    assert(d.select(FirstAgreeingBand(col("a"), col("b"), 2))
      .collect().map(_.getInt(0)).toSeq == Seq(0, 1, -1))
    // length mismatch -> null
    val m = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(m.select(FirstAgreeingBand(col("a"), col("b"), 1)).collect().head.isNullAt(0))
  }

  // ---- as-of join semantics -------------------------------------------

  test("asofJoin takes the latest right row at-or-before, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (3L, 10L, "r-other"))
      .toDF("k", "rts", "rtag")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select(col("tag"), col("__match.rtag").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1").contains("r@100")) // equal ts is visible (inclusive)
    assert(out("p2").contains("r@150")) // latest prior wins
    assert(out("p3").isEmpty)           // no right row for key 2 -> null
  }

  test("qr01 as-of output matches a per-row argmax recomputation") {
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("us").as("cus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("qr01_asof_last_click")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val user = r.getAs[Long]("user_id"); val pus = r.getAs[Long]("purchase_us")
      val best = clicks.filter(c => c._1 == user && c._3 <= pus)
        .sortBy(c => (-c._3, -c._2)).headOption
      if (r.isNullAt(r.fieldIndex("click_id"))) assert(best.isEmpty)
      else assert(best.exists(_._3 == r.getAs[Long]("click_us")))
    }
  }

  // ---- train-prep invariants ------------------------------------------

  test("stratified split covers every document exactly once") {
    val rows = SparkEntry.queries("qn12_stratified_split")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("sequence packing bins are contiguous and token-complete") {
    val rows = SparkEntry.queries("qn14_sequence_packing")(spark, sf).collect()
    val bins = rows.map(_.getAs[Long]("bin"))
    assert(bins.toSeq == bins.toSeq.sorted)
    assert(bins.toSeq == (bins.min to bins.max).toSeq) // no empty bin gaps
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(totalToks == expected)
  }

  test("qn14 cumsum dispatch (single window vs distributed) is result-invariant") {
    // The round-17 measured dispatch: under spark.graft.pack.
    // globalWindowMaxRows the zero-extra-jobs single window runs; past
    // it the range-partition + per-partition cumsum + offsets form. The
    // fixture sits far under the default cap, so without forcing cap=0
    // the distributed arm ships untested (round-17 ADVICE) — mirror the
    // allPairsMaxGroups=0 pattern and pin row-for-row equality.
    def rows() = SparkEntry.queries("qn14_sequence_packing")(spark, sf)
      .collect().map(_.toString).toSeq
    val single = rows() // default cap: the single-window arm
    try {
      spark.conf.set("spark.graft.pack.globalWindowMaxRows", "0")
      val distributed = rows()
      assert(distributed == single,
        "qn14 distributed-cumsum arm diverged from the single-window arm")
    } finally spark.conf.unset("spark.graft.pack.globalWindowMaxRows")
  }

  test("contamination check never flags benchmark members") {
    val rows = SparkEntry.queries("qn11_contamination_check")(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("doc_id") % 97 != 0))
  }

  test("balanced sample and tf-idf plan through the TopKPerGroup operator") {
    Seq("qn15_balanced_sample", "qt08_tfidf_top_terms").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"$name missing operator")
    }
    val sample = SparkEntry.queries("qn15_balanced_sample")(spark, sf).collect()
    sample.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      assert(rs.length <= 20)
    }
  }

  test("quantized embeddings stay inside int8 range") {
    SparkEntry.queries("qn16_quantize_embeddings")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("q_min") >= -128 && r.getAs[Long]("q_max") <= 127)
    }
  }

  test("dedup components: every near-dup edge lies inside one component") {
    val comp = SparkEntry.queries("qn17_dedup_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.nonEmpty)
    comp.foreach { case (doc, c) => assert(c <= doc) } // label = min reachable id
    SparkEntry.queries("qn06_simhash_near_pairs")(spark, sf).collect().foreach { r =>
      assert(comp(r.getAs[Long]("doc_a")) == comp(r.getAs[Long]("doc_b")))
    }
  }

  test("label centroids cover every (label, dimension) cell") {
    val rows = SparkEntry.queries("qn13_label_centroids")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length == labels * 64)
  }

  test("mixture weights normalize to ~1e6 and apportion the token budget") {
    val rows = SparkEntry.queries("qn25_mixture_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getAs[Long]("w_norm_e6")).sum
    // Each weight floors, so the sum undershoots 1e6 by < n_groups.
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length)
    val budget = rows.map(_.getAs[Long]("budget_tokens")).sum
    assert(budget <= 100000000L && budget > 100000000L - rows.length * 100L)
    // Temperature flattening: normalized weights are more uniform than
    // the raw token shares (max weight shrinks toward the mean).
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val maxShare = rows.map(_.getAs[Long]("n_tokens")).max / tot
    val maxW = rows.map(_.getAs[Long]("w_norm_e6")).max / 1e6
    assert(maxW < maxShare)
  }

  test("BPE merge step emits the top-10 two-char pairs, count-descending") {
    val rows = SparkEntry.queries("qn26_bpe_merge")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[String]("pair").length == 2))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("mixture apply genuinely subsamples and never selects more than exists") {
    val rows = SparkEntry.queries("qn29_mixture_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("rate_e6") <= 1000000L)
    }
    // When the corpus exceeds the 10k-token budget, at least one
    // language must be genuinely subsampled (rate < 1); a corpus
    // smaller than the budget caps every rate at exactly 1.
    import org.apache.spark.sql.functions._
    val totTok = Tables.documents(spark, sf)
      .agg(sum(size(split(trim(col("text")), "\\s+")))).collect()(0).getLong(0)
    if (totTok > 10000L)
      assert(rows.exists(_.getAs[Long]("rate_e6") < 1000000L))
    else
      assert(rows.forall(_.getAs[Long]("rate_e6") == 1000000L))
  }

  test("count-min estimates always dominate exact counts (one-sided error)") {
    val rows = SparkEntry.queries("qn28_countmin_hitters")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS underestimated ${r.getAs[String]("term")}")
    }
    // Ranked descending by exact count.
    val cnts = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("exact_cnt"))
    assert(cnts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("LM surprise is >= 1e6 (a bigram is never more frequent than its prefix)") {
    val rows = SparkEntry.queries("qt10_lm_surprise")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("avg_surprise_e6") >= 1000000L))
  }

  test("record linkage: blocked on suffix bucket, verified by levenshtein") {
    val rows = SparkEntry.queries("qn27_record_linkage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lev") <= 6L)
      val cId = r.getAs[String]("c_name").replaceAll("^[^0-9]+", "").toLong
      val sId = r.getAs[String]("s_name").replaceAll("^[^0-9]+", "").toLong
      assert(cId % 100 == sId % 100) // pair came through the block key
    }
  }
}
