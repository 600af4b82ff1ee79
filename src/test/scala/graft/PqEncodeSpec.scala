package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Expression-level pins for the native PQ encode (the VectorExprsSpec
  * discipline): codegen and interpreted eval both match a plain-Scala
  * reference argmin computed WITHOUT early exit — so the
  * partial-distance pruning is proven side-effect-free, including on
  * exact ties (which must resolve to the LOWEST code). The end-to-end
  * semantics are already oracle-gated (qn30/qn31/qn37); this spec
  * isolates the expression so a future codegen edit can't hide behind
  * the corpus fixtures.
  */
class PqEncodeSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.{PqEncode, PqExprs}

  private val m = 4
  private val subDim = 4
  private val k = 8

  // Deterministic codebook: codeword (sub, c) has values derived from
  // small integer arithmetic, with codes 6 and 7 of every subspace
  // IDENTICAL — a planted exact tie that must resolve to code 6.
  private val cb: Array[Long] = {
    val a = new Array[Long](m * k * subDim)
    for (sub <- 0 until m; c <- 0 until k; d <- 0 until subDim) {
      val cc = if (c == 7) 6 else c
      a((sub * k + c) * subDim + d) = (cc * 37 + sub * 11 + d * 3 - 40).toLong
    }
    a
  }

  /** Reference argmin: full distances, no pruning, first strict min. */
  private def reference(v: Array[Long]): Array[Long] = {
    val out = new Array[Long](2 * m)
    for (sub <- 0 until m) {
      var best = Long.MaxValue; var bestCode = 0
      for (c <- 0 until k) {
        var acc = 0L
        for (d <- 0 until subDim) {
          val diff = v(sub * subDim + d) - cb((sub * k + c) * subDim + d)
          acc += diff * diff
        }
        if (acc < best) { best = acc; bestCode = c }
      }
      out(sub) = bestCode.toLong; out(m + sub) = best
    }
    out
  }

  private val vectors: Seq[Array[Long]] =
    (0 until 200).map(i => Array.tabulate(m * subDim)(d =>
      ((i * 7919 + d * 104729) % 233 - 116).toLong))

  test("codegen output matches the no-early-exit reference argmin, ties to the lowest code") {
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "emb6")
    val got = df.select(col("vec_id"),
        PqExprs.pqEncodeNative(col("emb6"), cb, m, k, subDim).as("enc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong).toSeq == reference(v).toSeq, s"vector $i diverged")
    }
    // The planted tie is actually exercised: force a vector ONTO the
    // shared codeword 6/7 position so d2 is 0 for both — must pick 6.
    val onTie = Array.tabulate(m * subDim)(d =>
      cb(((d / subDim) * k + 6) * subDim + (d % subDim)))
    val tieRow = Seq((0L, onTie.toSeq)).toDF("vec_id", "emb6")
      .select(PqExprs.pqEncodeNative(col("emb6"), cb, m, k, subDim)).head().getSeq[Long](0)
    assert((0 until m).forall(s => tieRow(s) == 6L && tieRow(m + s) == 0L),
      s"tie did not resolve to the lowest code: $tieRow")
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    vectors.take(50).foreach { v =>
      val lit = Literal.create(v, ArrayType(LongType, containsNull = false))
      val got = PqEncode(lit, cb, m, k, subDim).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      assert(got.toSeq == reference(v).toSeq)
    }
  }

  test("width mismatch and null elements fail loudly, never truncate") {
    import spark.implicits._
    def rootMessages(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    }
    val short = Seq((0L, Seq(1L, 2L, 3L))).toDF("vec_id", "emb6")
    val e1 = intercept[Throwable] {
      short.select(PqExprs.pqEncodeNative(col("emb6"), cb, m, k, subDim)).collect()
    }
    assert(rootMessages(e1).contains("embedding width"), rootMessages(e1))
    val withNull = Seq((0L, (0 until m * subDim).map(d =>
      if (d == 5) null else java.lang.Long.valueOf(d.toLong)))).toDF("vec_id", "emb6")
    val e2 = intercept[Throwable] {
      withNull.select(PqExprs.pqEncodeNative(col("emb6"), cb, m, k, subDim)).collect()
    }
    assert(rootMessages(e2).contains("NULL embedding element"), rootMessages(e2))
  }
}
