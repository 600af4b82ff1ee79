package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** qn65 hybrid retrieval beyond the hash gate: the fusion must be a
  * real combination — both tiers contribute candidates, and the fused
  * ranking differs from each tier alone (a degenerate fixture where
  * one tier dominates would keep the oracle green while gutting the
  * operator's point).
  */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._

  test("hybrid fusion draws from BOTH tiers and differs from each alone") {
    val res = SparkEntry.queries("qn65_hybrid_retrieval")(spark, sf).collect()
    assert(res.length == 25, s"expected 5 queries x top-5, got ${res.length}")
    // RRF values decompose: a doc on both top-10 lists scores
    // 1e6/(60+k1) + 1e6/(60+k2) > 16666 = 1e6/60; a single-list doc
    // scores <= 1e6/61 = 16393. The fused top-5 must contain both
    // kinds — docs the tiers AGREE on and docs only one tier surfaced.
    val rrf = res.map(_.getLong(3))
    assert(rrf.exists(_ > 16666L), "no candidate was ranked by both tiers")
    assert(rrf.exists(_ <= 16393L), "every candidate came from both tiers — fusion vacuous")
    // And the fused winners are not simply either tier's top-5: at
    // least one query's fused top-5 must differ from its vector-only
    // top-5 (qn07's plan at k=5 over the same probes).
    val vecTop = SparkEntry.queries("qn07_cosine_topk")(spark, sf).collect()
      .filter(r => r.getLong(0) < 5 && r.getLong(1) <= 5)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val fused = res.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(fused.keySet.exists(q => fused(q) != vecTop.getOrElse(q, Set.empty[Long])),
      "fused top-5 equals the vector tier's for every query — keyword tier inert")
  }

  test("filtered hybrid retrieval admits only lang='en' docs and the filter visibly bites") {
    val en = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val res = SparkEntry.queries("qn68_hybrid_filtered")(spark, sf).collect()
    assert(res.length == 25, s"expected 5 queries x top-5, got ${res.length}")
    assert(res.forall(r => en.contains(r.getLong(2))), "a non-English doc surfaced")
    val unfiltered = SparkEntry.queries("qn65_hybrid_retrieval")(spark, sf).collect()
    assert(!unfiltered.forall(r => en.contains(r.getLong(2))),
      "fixture degenerate: the unfiltered fusion is already all-English")
  }
}
