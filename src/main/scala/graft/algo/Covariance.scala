package graft.algo

import breeze.linalg.{diag, DenseMatrix, DenseVector}

/** L1-L4: factor-model covariance assembly Σ = B·F·Bᵀ + D²  (reference
  * `pipelines/utils/covariance_matrix.py:5-51`; note the reference squares
  * the idio-vol diagonal — D holds vols, D² variances).
  *
  * Matrices are per-date and small (N ≤ ~503 assets × K factors), so the
  * math is executor-local Breeze inside the per-date fan-out (L8) — never
  * a distributed matrix. At 100 TB the parallelism axis is dates/groups,
  * not the matrix itself.
  */
object Covariance {

  /** @param loadings  N×K loadings matrix B (rows sorted by ticker,
    *                  columns sorted by factor)
    * @param factorCov K×K factor covariance F
    * @param idioVol   length-N idiosyncratic vols σ
    */
  def assemble(
      loadings: DenseMatrix[Double],
      factorCov: DenseMatrix[Double],
      idioVol: DenseVector[Double]): DenseMatrix[Double] = {
    val d = diag(idioVol)
    loadings * factorCov * loadings.t + d * d
  }

  /** Build B from long-form (ticker, factor, loading) triples; tickers and
    * factors are sorted lexicographically like the reference's
    * `sort("ticker","factor").pivot(...)`.
    */
  def loadingsMatrix(
      tickers: Seq[String],
      factors: Seq[String],
      triples: Seq[(String, String, Double)]): DenseMatrix[Double] = {
    val ti = tickers.zipWithIndex.toMap
    val fi = factors.zipWithIndex.toMap
    val m = DenseMatrix.zeros[Double](tickers.size, factors.size)
    triples.foreach { case (t, f, v) =>
      for (r <- ti.get(t); c <- fi.get(f)) m(r, c) = v
    }
    m
  }

  /** Build F from long-form (factor_1, factor_2, covariance) triples. */
  def factorCovMatrix(
      factors: Seq[String],
      triples: Seq[(String, String, Double)]): DenseMatrix[Double] = {
    val fi = factors.zipWithIndex.toMap
    val m = DenseMatrix.zeros[Double](factors.size, factors.size)
    triples.foreach { case (a, b, v) =>
      for (r <- fi.get(a); c <- fi.get(b)) m(r, c) = v
    }
    m
  }
}
