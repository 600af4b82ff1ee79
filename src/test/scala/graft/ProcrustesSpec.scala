package graft

import org.scalatest.funsuite.AnyFunSuite

/** The learned-OPQ linear algebra: orthogonality of the Procrustes
  * solve, exact recovery of a planted rotation, and determinism (the
  * no-RNG rule — the learner must be bit-replayable).
  */
class ProcrustesSpec extends AnyFunSuite {
  import graft.functions.Procrustes

  private val d = 16

  /** A deterministic full-rank test matrix. */
  private def mat(seed: Int): Array[Double] =
    Array.tabulate(d * d) { i =>
      val r = i / d; val c = i % d
      math.sin(0.37 * r + 1.31 * c + seed) + (if (r == c) 2.0 else 0.0)
    }

  /** A planted orthogonal matrix: product of a few Givens rotations. */
  private def planted: Array[Double] = {
    val q = Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0)
    def rotate(p: Int, r: Int, theta: Double): Unit = {
      val c = math.cos(theta); val s = math.sin(theta)
      var row = 0
      while (row < d) {
        val a = q(row * d + p); val b = q(row * d + r)
        q(row * d + p) = c * a - s * b
        q(row * d + r) = s * a + c * b
        row += 1
      }
    }
    rotate(0, 5, 0.7); rotate(2, 9, -1.1); rotate(3, 14, 0.3); rotate(1, 7, 2.0)
    q
  }

  private def matmulT(a: Array[Double], b: Array[Double]): Array[Double] =
    Array.tabulate(d * d) { i =>
      val r = i / d; val c = i % d
      (0 until d).map(k => a(r * d + k) * b(c * d + k)).sum
    }

  test("orthogonalProcrustes returns an orthogonal matrix") {
    val r = Procrustes.orthogonalProcrustes(mat(3), d)
    val rrt = matmulT(r, r) // R R^T
    for (i <- 0 until d; j <- 0 until d) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(rrt(i * d + j) - expect) < 1e-9,
        s"R R^T[$i,$j] = ${rrt(i * d + j)}")
    }
  }

  test("recovers a planted rotation: M = Q X X^T with full-rank X gives R = Q") {
    // Y = Q X for a full-rank X: the Procrustes minimizer of
    // ||R X - Y|| is exactly Q, and M = Y X^T = Q (X X^T).
    val x = mat(1)
    val q = planted
    val xxT = matmulT(x, x)
    val m = Array.tabulate(d * d) { i =>
      val r = i / d; val c = i % d
      (0 until d).map(k => q(r * d + k) * xxT(k * d + c)).sum
    }
    val got = Procrustes.orthogonalProcrustes(m, d)
    for (i <- 0 until d * d)
      assert(math.abs(got(i) - q(i)) < 1e-8, s"R[$i] = ${got(i)} != ${q(i)}")
  }

  test("deterministic: identical inputs give bit-identical output") {
    val a = Procrustes.orthogonalProcrustes(mat(7), d)
    val b = Procrustes.orthogonalProcrustes(mat(7), d)
    assert(a.toSeq == b.toSeq)
  }

  test("rank-deficient input completes to an orthogonal R, deterministically; all-zero fails loudly") {
    // Rank-1 M: the OPQ cross-covariance is rank <= M x K by
    // construction, so completion is the normal path, not an edge.
    val m = Array.tabulate(d * d) { i =>
      val r = i / d; val c = i % d
      (1.0 + 0.1 * r) * (2.0 - 0.05 * c)
    }
    val r1 = Procrustes.orthogonalProcrustes(m, d)
    val r2 = Procrustes.orthogonalProcrustes(m, d)
    assert(r1.toSeq == r2.toSeq, "completion is not deterministic")
    val rrt = matmulT(r1, r1)
    for (i <- 0 until d; j <- 0 until d) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(rrt(i * d + j) - expect) < 1e-9,
        s"completed R not orthogonal at [$i,$j]: ${rrt(i * d + j)}")
    }
    val zero = new Array[Double](d * d)
    val e = intercept[IllegalArgumentException] {
      Procrustes.orthogonalProcrustes(zero, d)
    }
    assert(e.getMessage.contains("all-zero"), e.getMessage)
  }
}
