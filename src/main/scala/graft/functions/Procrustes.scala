package graft.functions

/** Deterministic driver-side linear algebra for the learned OPQ
  * rotation (Ge et al., "Optimized Product Quantization", CVPR 2013 —
  * public knowledge): a fixed-sweep one-sided Jacobi SVD and the
  * orthogonal Procrustes solve R = U V^T. Everything here is RNG-free
  * and iteration-fixed (the qn19 no-RNG rule): the same inputs produce
  * the same rotation on every run and every JVM, so a battery arm that
  * consumes it is replayable.
  *
  * Scale note: these run on the DRIVER over D x D matrices (D = the
  * embedding width, 64-1536) — microseconds-to-milliseconds, paid once
  * per index build, never per row. The per-row work is the
  * [[MatVecFD]] rotation apply, which is codegen'd.
  */
object Procrustes {

  /** One-sided Jacobi SVD of a square row-major `d x d` matrix:
    * returns (U, V) flat row-major with A = U diag(s) V^T, s >= 0.
    * Columns of A are orthogonalized by right-rotations (accumulated
    * into V); U is the normalized result. Fixed max sweep count with
    * early exit on convergence — both deterministic.
    *
    * Rank deficiency is EXPECTED here, not an error: the OPQ
    * cross-covariance M = Y_hat X^T has rank <= M x K by construction
    * (the reconstruction lives in the codebook span — e.g. 4x16x16
    * caps it at 64 only if every codeword is independent, and a
    * near-flat subspace collapses codewords toward collinearity). The
    * Procrustes minimizer is non-unique in the null directions; any
    * orthonormal completion minimizes equally, so U's zero columns are
    * completed DETERMINISTICALLY by modified Gram-Schmidt over the
    * canonical basis in index order — same inputs, same completion,
    * same R. */
  def svdUV(a0: Array[Double], d: Int, maxSweeps: Int = 40): (Array[Double], Array[Double]) = {
    require(a0.length == d * d, "svd: matrix is not d x d")
    val a = a0.clone()
    val v = Array.tabulate(d * d)(i => if (i / d == i % d) 1.0 else 0.0)
    var sweep = 0
    var converged = false
    while (sweep < maxSweeps && !converged) {
      var changed = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var al = 0.0; var be = 0.0; var ga = 0.0
          var r = 0
          while (r < d) {
            val ap = a(r * d + p); val aq = a(r * d + q)
            al += ap * ap; be += aq * aq; ga += ap * aq
            r += 1
          }
          if (math.abs(ga) > 1e-14 * math.sqrt(al * be)) {
            changed = true
            val zeta = (be - al) / (2.0 * ga)
            // zeta == 0 is the 45-degree rotation (t = 1), not t = 0 —
            // signum(0) would silently skip the pair forever.
            val t =
              if (zeta == 0.0) 1.0
              else math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            var r2 = 0
            while (r2 < d) {
              val ap = a(r2 * d + p); val aq = a(r2 * d + q)
              a(r2 * d + p) = c * ap - s * aq
              a(r2 * d + q) = s * ap + c * aq
              val vp = v(r2 * d + p); val vq = v(r2 * d + q)
              v(r2 * d + p) = c * vp - s * vq
              v(r2 * d + q) = s * vp + c * vq
              r2 += 1
            }
          }
          q += 1
        }
        p += 1
      }
      converged = !changed
      sweep += 1
    }
    val u = new Array[Double](d * d)
    // Scale-relative rank tolerance: a column whose singular value is
    // below maxNorm x 1e-10 is a null direction to complete, not data.
    val colNorm = new Array[Double](d)
    var c = 0
    var maxNorm = 0.0
    while (c < d) {
      var nn = 0.0
      var r = 0
      while (r < d) { val x = a(r * d + c); nn += x * x; r += 1 }
      colNorm(c) = math.sqrt(nn)
      if (colNorm(c) > maxNorm) maxNorm = colNorm(c)
      c += 1
    }
    require(maxNorm > 0.0, "Procrustes: all-zero cross-covariance")
    val tol = maxNorm * 1e-10
    val live = new Array[Boolean](d)
    c = 0
    while (c < d) {
      if (colNorm(c) > tol) {
        live(c) = true
        var r2 = 0
        while (r2 < d) { u(r2 * d + c) = a(r2 * d + c) / colNorm(c); r2 += 1 }
      }
      c += 1
    }
    // Deterministic orthonormal completion of the null columns:
    // canonical basis candidates in index order, modified Gram-Schmidt
    // against every already-set U column, accept when the residual
    // keeps >1e-6 of its mass (it always does for d-rank candidates).
    var cand = 0
    c = 0
    while (c < d) {
      if (!live(c)) {
        var placed = false
        while (!placed && cand < d) {
          val w = new Array[Double](d)
          w(cand) = 1.0
          var c2 = 0
          while (c2 < d) {
            if (live(c2)) { // every already-materialized column (SVD or completed)
              var dot = 0.0
              var r3 = 0
              while (r3 < d) { dot += w(r3) * u(r3 * d + c2); r3 += 1 }
              if (dot != 0.0) {
                var r4 = 0
                while (r4 < d) { w(r4) -= dot * u(r4 * d + c2); r4 += 1 }
              }
            }
            c2 += 1
          }
          var nn = 0.0
          var r5 = 0
          while (r5 < d) { nn += w(r5) * w(r5); r5 += 1 }
          val norm = math.sqrt(nn)
          if (norm > 1e-6) {
            var r6 = 0
            while (r6 < d) { u(r6 * d + c) = w(r6) / norm; r6 += 1 }
            live(c) = true
            placed = true
          }
          cand += 1
        }
        require(placed, "Procrustes: orthonormal completion exhausted the basis")
      }
      c += 1
    }
    (u, v)
  }

  /** The orthogonal Procrustes solve: given the cross-covariance
    * M = Y X^T (row-major d x d), the orthogonal R minimizing
    * ||R X - Y||_F is U V^T from M = U S V^T. */
  def orthogonalProcrustes(m: Array[Double], d: Int): Array[Double] = {
    val (u, v) = svdUV(m, d)
    val r = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += u(i * d + k) * v(j * d + k); k += 1 }
        r(i * d + j) = acc
        j += 1
      }
      i += 1
    }
    r
  }
}
