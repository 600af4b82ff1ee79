package graft

import graft.functions.TextFns
import graft.functions.VectorExprs.dotNative
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprsSpec extends AnyFunSuite {
  import TestSpark._

  private def df = {
    import spark.implicits._
    Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("a", "b")
  }

  test("native dot matches the higher-order-function fold bit for bit") {
    val rows = df.select(
      dotNative(col("a"), col("b")).as("native"),
      TextFns.dot(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array, null element, and length mismatch all yield null") {
    import spark.implicits._
    val d = Seq(
      (Some(Seq(Some(1.0f))), None: Option[Seq[Option[Float]]]),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f))))
    ).toDF("a", "b")
    val got = d.select(dotNative(col("a"), col("b"))).collect().map(_.isNullAt(0))
    assert(got.forall(identity))
    // And the HOF form agrees on the same inputs.
    val hof = d.select(TextFns.dot(col("a"), col("b"))).collect().map(_.isNullAt(0))
    assert(hof.forall(identity))
  }

  test("native int_sqdist matches the zip_with/aggregate HOF bit for bit, including null semantics") {
    import spark.implicits._
    import graft.functions.VectorExprs.intSqDistNative
    val d = (0 until 100).map { i =>
      (Seq.tabulate(64)(j => ((i * 31 + j * 7) % 256).toLong),
       Seq.tabulate(64)(j => ((i * 17 + j * 13) % 256).toLong))
    }.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)
    val rows = d.select(intSqDistNative(col("a"), col("b")).as("n"), hof.as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // Width mismatch and NULL element: both forms yield NULL.
    val edge = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L))))
    ).toDF("a", "b")
    val hofE = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)
    val got = edge.select(intSqDistNative(col("a"), col("b")).as("n"), hofE.as("h")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // Interpreted eval agrees with codegen.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val la = Literal.create(new GenericArrayData(Array(3L, 250L)), ArrayType(LongType))
    val lb = Literal.create(new GenericArrayData(Array(7L, 1L)), ArrayType(LongType))
    assert(graft.functions.IntSqDistLL(la, lb).eval(null) == (16L + 249L * 249L))
  }

  test("native int_sqlb matches the HOF form bit for bit and LOWER-BOUNDS the exact distance") {
    import spark.implicits._
    import graft.functions.VectorExprs.{intSqLowerBoundNative, intSqDistNative}
    // Deterministic pseudo-corpus: e6 values, their floor-quantized
    // bytes against a shared envelope, and the spans — the exact shape
    // the range prescreen evaluates.
    val dims = 64
    val mn = -2000000L; val sp = 4000000L
    def e6s(seed: Int) = Seq.tabulate(dims)(j => mn + ((seed * 2654435761L + j * 40503L).abs % sp))
    def q8(v: Seq[Long]) = v.map(x => ((x - mn) * 255L / sp).min(255L).max(0L))
    val spans = Seq.fill(dims)(sp)
    val rows = (0 until 50).map { i =>
      (e6s(i), e6s(i + 1000), q8(e6s(i)), q8(e6s(i + 1000)), spans)
    }.toDF("a6", "b6", "qa", "qb", "sp")
    val hof = aggregate(
      zip_with(zip_with(col("qa"), col("qb"), (x, y) => abs(x - y)), col("sp"),
        (d, s) => {
          val t = greatest(d - 1, lit(0L)) * s
          val fl = (t - t % 255L) / 255L
          (fl * fl).cast("long")
        }),
      lit(0L), (acc, z) => acc + z)
    val got = rows.select(
      intSqLowerBoundNative(col("qa"), col("qb"), col("sp")).as("n"), hof.as("h"),
      intSqDistNative(col("a6"), col("b6")).as("exact")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"native ${r.getLong(0)} != HOF ${r.getLong(1)}")
      assert(r.getLong(0) <= r.getLong(2),
        s"bound ${r.getLong(0)} exceeds exact distance ${r.getLong(2)}")
    }
    assert(got.exists(_.getLong(0) > 0L), "degenerate: every bound collapsed to 0")
    // NULL semantics: width mismatch and NULL element yield NULL.
    val edge = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L))), Some(Seq(Some(5L), Some(5L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(5L), Some(5L)))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L))), Some(Seq(Some(5L))))
    ).toDF("qa", "qb", "sp")
    edge.select(intSqLowerBoundNative(col("qa"), col("qb"), col("sp")).as("n"))
      .collect().foreach(r => assert(r.isNullAt(0)))
  }

  test("native hamming_ll matches the per-word xor/bit_count HOF bit for bit, including null semantics") {
    import spark.implicits._
    import graft.functions.VectorExprs.hammingNative
    val d = (0 until 100).map { i =>
      (Seq.tabulate(4)(j => i.toLong * 2654435761L + j * 40503L),
       Seq.tabulate(4)(j => i.toLong * 40503L + j * 2654435761L))
    }.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, z) => acc + z)
    val rows = d.select(hammingNative(col("a"), col("b")).as("n"), hof.as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // Width mismatch, NULL element, NULL array: all NULL (zip_with parity).
    val edge = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L))))
    ).toDF("a", "b")
    val hofE = aggregate(zip_with(col("a"), col("b"),
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, z) => acc + z)
    val got = edge.select(hammingNative(col("a"), col("b")).as("n"), hofE.as("h")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // Interpreted eval agrees with codegen (Long.MinValue word included
    // — the bit-63 wrap the sig fold produces).
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val la = Literal.create(new GenericArrayData(Array(Long.MinValue, 0L)), ArrayType(LongType))
    val lb = Literal.create(new GenericArrayData(Array(0L, -1L)), ArrayType(LongType))
    assert(graft.functions.HammingLL(la, lb).eval(null) == 65L)
  }

  test("native matvec matches a driver-side matmul bit for bit; width mismatch fails loudly") {
    import spark.implicits._
    import graft.functions.VectorExprs.matVecNative
    val dim = 8
    val mat = Array.tabulate(dim * dim)(i => math.sin(0.37 * i) + (if (i / dim == i % dim) 1.5 else 0.0))
    val rows = (0 until 50).map(i => (i.toLong, Seq.tabulate(dim)(j => (0.1f * i + 0.01f * j))))
    val df = rows.toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<float>").as("emb"))
    val got = df.select(col("vec_id"), matVecNative(col("emb"), mat, dim).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, emb) =>
      val expect = Array.tabulate(dim)(r =>
        (0 until dim).map(c => mat(r * dim + c) * emb(c).toDouble).sum)
      // Exact: both sides are the same left-to-right double fold.
      assert(got(id).toArray.sameElements(expect), s"matvec diverged at vec_id=$id")
    }
    // Interpreted eval agrees with codegen.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val la = Literal.create(new GenericArrayData(Array.tabulate(dim)(_.toFloat)), ArrayType(FloatType))
    val interp = graft.functions.MatVecFD(la, mat, dim).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    val viaDf = df.filter(col("vec_id") === 10)
    assert(interp.length == dim && viaDf.count() == 1)
    // Width mismatch: loud, not zero-padded.
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<float>").as("emb"))
    val e = intercept[Throwable] {
      bad.select(matVecNative(col("emb"), mat, dim)).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs(e).contains("matrix dim"), msgs(e))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val la = Literal.create(new GenericArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType))
    val lb = Literal.create(new GenericArrayData(Array(3.0f, 4.0f)), ArrayType(FloatType))
    val interp = graft.functions.DotProductFF(la, lb).eval(null)
    assert(interp == 11.0)
    val viaDf = df.limit(1).select(dotNative(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(viaDf == 32.0)
  }

  test("sorted intersect count equals size(array_intersect) on real token sets") {
    val toks = Tables.documents(spark, sf).select(
      graft.functions.TextFns.tokenSet(col("text")).as("t"))
    val pairs = toks.limit(40).crossJoin(toks.limit(40).select(col("t").as("u")))
    val rows = pairs.select(
      graft.functions.SortedIntersectCount(col("t"), col("u")).as("merge"),
      size(array_intersect(col("t"), col("u"))).as("builtin")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("native minhash signature is bit-identical to the HOF stack (incl. edge shapes)") {
    import spark.implicits._
    import graft.functions.{TextFns, VectorExprs}
    // deterministic pseudo-random hash arrays of assorted lengths, plus
    // the edge shapes: empty array, array with nulls, all-null, null
    val base = (0 until 200).map { i =>
      Seq.tabulate(1 + i % 17)(j => ((i * 2654435761L + j * 40503L) % TextFns.P1): java.lang.Long)
    } ++ Seq(
      Seq.empty[java.lang.Long],
      Seq[java.lang.Long](7L, null, 11L),
      Seq[java.lang.Long](null, null),
      null)
    val df = base.toDF("hs")
    val rows = df.select(
      TextFns.minhashSig(col("hs"), 64).as("hof"),
      VectorExprs.minhashSigNative(col("hs"), 64).as("nat")).collect()
    rows.zip(base).foreach { case (r, in) =>
      def get(i: Int): Option[Seq[Any]] =
        if (r.isNullAt(i)) None
        else Some((0 until 64).map { k =>
          val a = r.getSeq[Any](i); a(k)
        })
      assert(get(0) == get(1), s"minhash divergence on input $in: ${get(0)} vs ${get(1)}")
    }
    // and the interpreted eval path agrees with codegen (filter forces a
    // non-codegen context for the expression inside a local relation)
    val interp = df.filter(col("hs").isNotNull)
      .select(VectorExprs.minhashSigNative(col("hs"), 8).as("n8"),
        TextFns.minhashSig(col("hs"), 8).as("h8"))
      .collect()
    interp.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)))
  }

  test("sorted intersect count edge cases") {
    import spark.implicits._
    val d = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("a"), Seq.empty[String])
    ).toDF("a", "b")
    val got = d.select(graft.functions.SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 0, 0))
    val n = d.select(graft.functions.SortedIntersectCount(lit(null).cast("array<string>"), col("b")))
      .collect().map(_.isNullAt(0)).toSeq
    assert(n.forall(identity))
  }
}
