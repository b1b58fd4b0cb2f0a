package graft.algo

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}

/** L5-L7: long-only mean-variance portfolio optimization (reference
  * `pipelines/utils/portfolio.py`).
  *
  *   maximize  wᵀα − ½·λ·wᵀΣw   s.t.  Σw = 1,  w ≥ 0
  *
  * The reference delegates to cvxpy; the problem is a convex QP with a
  * unique optimum for PD Σ, so any convergent solver matches it to
  * tolerance. This is FISTA-accelerated projected gradient with exact
  * Euclidean projection onto the simplex (Condat/Duchi algorithm) — a
  * few hundred O(N²) iterations for N ≤ ~500, executor-friendly (no
  * native deps beyond Breeze/BLAS).
  */
object Qp {

  /** Exact Euclidean projection of v onto {w : Σw = 1, w ≥ 0}. */
  def projectSimplex(v: DenseVector[Double]): DenseVector[Double] = {
    val n = v.length
    val u = v.toArray.sorted(Ordering[Double].reverse)
    var cssv = 0.0
    var rho = -1
    var theta = 0.0
    var i = 0
    while (i < n) {
      cssv += u(i)
      val t = (cssv - 1.0) / (i + 1)
      if (u(i) - t > 0) { rho = i; theta = t }
      i += 1
    }
    DenseVector.tabulate(n)(j => math.max(v(j) - theta, 0.0))
  }

  /** KKT stationarity gap of `w`: with g = λΣw − α, the max over HELD
    * assets (wᵢ > eps) of gᵢ − min(g). At the optimum every held asset's
    * gradient equals the shared equality multiplier (the minimum over
    * all assets, since non-held assets may only have larger gradients),
    * so the gap is the distance from stationarity in gradient units.
    *
    * Gate coupling: the `l5_qp_certificate` oracle pins `stat_resid` to
    * 0.0 after 6-d.p. rounding, which requires this gap < 5e-7 on every
    * date — see the convergence check in [[solve]].
    */
  def stationarityGap(
      w: DenseVector[Double],
      alphas: DenseVector[Double],
      sigma: DenseMatrix[Double],
      lambda: Double,
      eps: Double = 1e-9): Double = {
    val g = (sigma * w) * lambda - alphas
    val gMin = breeze.linalg.min(g)
    var gap = 0.0
    var i = 0
    while (i < w.length) {
      if (w(i) > eps && g(i) - gMin > gap) gap = g(i) - gMin
      i += 1
    }
    gap
  }

  /** When the post-solve stationarity gap exceeds this, [[solve]] logs a
    * warning: the `l5_qp_certificate` oracle gate needs < 5e-7 (6-d.p.
    * pin), so warning an order of magnitude earlier surfaces a drifting
    * solver BEFORE it becomes a cross-engine hash failure.
    */
  private val certGapWarn = 5e-8

  /** Solve the QP; returns the weight vector.
    *
    * Convergence contract: the `l5_qp_certificate` oracle pins the KKT
    * stationarity residual to 0.0 at 6 d.p., i.e. [[stationarityGap]]
    * must land below 5e-7 on every date. A weight-displacement rule
    * alone cannot promise that — a near-singular high-lambda problem
    * can stall the iterate while held-asset gradients still disagree at
    * ~1e-7 — so the stopping rule is two-stage: when ‖wₖ₊₁ − wₖ‖ ≤ tol,
    * the gap itself is checked (one extra O(N²) multiply, paid only at
    * candidate convergence) and iteration continues unless it is ≤
    * `gapTol`, two decades under the gate. QpSpec asserts < 5e-8 across
    * conditioning/lambda regimes; do NOT loosen these knobs without
    * re-running it. Convergence is guaranteed only down to the
    * production conditioning floor — sigma always carries diag(ivol²)
    * with idio vol >= 1%, a diagonal ridge >= 1e-4; QpSpec's sweep shows
    * a sub-floor rank-deficient sigma (ridge 1e-6, lambda 2000) can
    * exhaust maxIter at gap ~4e-3, where the contract degrades to the
    * warn funnel below. A date that exhausts maxIter above the warn
    * threshold logs to stderr rather than throwing — the certificate
    * gate is the hard check, this is its early warning.
    */
  def solve(
      alphas: DenseVector[Double],
      sigma: DenseMatrix[Double],
      lambda: Double,
      maxIter: Int = 2000,
      tol: Double = 1e-10,
      gapTol: Double = 5e-9): DenseVector[Double] =
    solveDiag(alphas, sigma, lambda, maxIter, tol, gapTol).w

  /** One [[solve]] run's exit-path diagnostics: which stopping rule fired
    * (gap convergence vs plateau vs maxIter exhaustion), the final KKT
    * gap, and whether the certificate early-warning printed. Exists so
    * QpSpec can assert the plateau exit's safety contract — an exit that
    * leaves the gap above [[certGapWarn]] must WARN, never return
    * silently — on problems built to hit that path, instead of inferring
    * the path from iteration counts.
    */
  private[algo] final case class SolveDiag(
      w: DenseVector[Double], iters: Int, converged: Boolean,
      plateaued: Boolean, gap: Double, warned: Boolean)

  private[algo] def solveDiag(
      alphas: DenseVector[Double],
      sigma: DenseMatrix[Double],
      lambda: Double,
      maxIter: Int = 2000,
      tol: Double = 1e-10,
      gapTol: Double = 5e-9): SolveDiag = {
    val n = alphas.length
    // gradient of (−objective): λΣw − α ; Lipschitz bound via inf-norm row sums
    var lip = 0.0
    var r = 0
    while (r < n) {
      var s = 0.0
      var c = 0
      while (c < n) { s += math.abs(sigma(r, c)); c += 1 }
      if (s > lip) lip = s
      r += 1
    }
    val step = 1.0 / math.max(lambda * lip, 1e-12)
    var w = DenseVector.fill(n)(1.0 / n)
    var y = w.copy
    var tPrev = 1.0
    var it = 0
    var diff = Double.MaxValue
    var converged = false
    // The O(n²) gap check runs at the FIRST stalled iterate (the happy
    // path: weight-diff and gap converge together), then every
    // gapCheckEvery stalled iterates — a near-singular date whose gap
    // stalls above gapTol while diff stays under tol would otherwise pay
    // a second Σw multiply on every remaining iteration for no accuracy
    // gain (the advisor's high-λ corner runs ~2000 such iterations).
    val gapCheckEvery = 10
    var sinceGap = gapCheckEvery
    // Plateau exit: a date whose gap stalls BETWEEN gapTol and the warn
    // gate would otherwise burn all maxIter iterations (plus periodic
    // O(n²) checks) after the gap has stopped improving — pure latency,
    // no accuracy. Track the best gap seen across checks and stop after
    // two consecutive checks with <0.1% relative improvement; the
    // post-loop warn still fires for the certificate-risk case.
    var bestGap = Double.MaxValue
    var stalledChecks = 0
    var plateaued = false
    while (it < maxIter && !converged && !plateaued) {
      val grad = (sigma * y) * lambda - alphas
      val wNext = projectSimplex(y - grad * step)
      // gradient restart (O'Donoghue–Candès): when the momentum direction
      // opposes the latest step, drop the momentum — stops the oscillation
      // that otherwise keeps accelerated methods from reaching tight tols
      if (((y - wNext) dot (wNext - w)) > 0) {
        tPrev = 1.0
        y = wNext.copy
      } else {
        val tNext = (1.0 + math.sqrt(1.0 + 4.0 * tPrev * tPrev)) / 2.0
        y = wNext + (wNext - w) * ((tPrev - 1.0) / tNext)
        tPrev = tNext
      }
      diff = breeze.linalg.norm(wNext - w)
      w = wNext
      it += 1
      if (diff <= tol) {
        sinceGap += 1
        if (sinceGap >= gapCheckEvery) {
          sinceGap = 0
          val g = stationarityGap(w, alphas, sigma, lambda)
          converged = g <= gapTol
          if (!converged) {
            if (g < bestGap * 0.999) { bestGap = g; stalledChecks = 0 }
            else { stalledChecks += 1; plateaued = stalledChecks >= 2 }
          }
        }
      } else sinceGap = gapCheckEvery // next stall checks immediately
    }
    val gap = stationarityGap(w, alphas, sigma, lambda)
    // the warn keys off the FINAL gap alone, deliberately not the exit
    // path: every way out of the loop (gap convergence, plateau, maxIter)
    // funnels through this check, so no exit can strand a date above the
    // warn gate silently — the property QpSpec's plateau case pins
    val warned = gap > certGapWarn
    if (warned) System.err.println(
      f"[qp] WARN stationarity gap $gap%.3e after $it iters (certificate " +
        "gate needs < 5e-7; an ill-conditioned or larger-universe date " +
        "may trip l5_qp_certificate's stat_resid pin)")
    SolveDiag(w, it, converged, plateaued, gap, warned)
  }

  /** Annualized active risk √(wₐᵀΣwₐ)·√252 (reference `portfolio.py:76-87`). */
  def activeRisk(active: DenseVector[Double], sigma: DenseMatrix[Double]): Double =
    math.sqrt(active.t * (sigma * active)) * math.sqrt(252.0)

  /** L6 λ-calibration fit: M = ⟨X,σ⟩/⟨X,X⟩ with X = 1/(2λ); next
    * λ = M / (2·target) (reference `portfolio.py:47-62`).
    */
  def predictLambda(pairs: Seq[(Double, Double)], target: Double): Double = {
    val x = pairs.map { case (l, _) => 1.0 / (2.0 * l) }
    val s = pairs.map(_._2)
    val m = x.zip(s).map { case (a, b) => a * b }.sum / x.map(a => a * a).sum
    m / (2.0 * target)
  }

  final case class Calibrated(
      weights: DenseVector[Double], lambda: Double, activeRisk: Double)

  /** L6: the reference's ≤5-iteration calibration loop targeting 5%
    * active risk ± 0.005 (reference `portfolio.py:90-121`).
    *
    * Degenerate dates guard: when every candidate portfolio has (near-)zero
    * active risk — e.g. a single-asset universe, where the only feasible w
    * IS the benchmark — the 1/(2λ) calibration fit degenerates to a
    * non-finite or non-positive next λ. The loop then stops and keeps the
    * current (feasible, optimal-for-current-λ) solution instead of
    * propagating NaN weights downstream.
    */
  def solveCalibrated(
      alphas: DenseVector[Double],
      sigma: DenseMatrix[Double],
      benchmark: DenseVector[Double],
      target: Double = 0.05,
      tol: Double = 0.005,
      maxIterations: Int = 5): Calibrated = {
    var lambda = Double.NaN
    var risk = Double.PositiveInfinity
    var w: DenseVector[Double] = null
    var data = List.empty[(Double, Double)]
    var iterations = 1
    var done = false
    while (!done && math.abs(risk - target) > tol) {
      val next = if (lambda.isNaN) 100.0 else predictLambda(data.reverse, target)
      if (!java.lang.Double.isFinite(next) || next <= 0.0) done = true
      else {
        lambda = next
        w = solve(alphas, sigma, lambda)
        risk = activeRisk(w - benchmark, sigma)
        data = (lambda, risk) :: data
        if (iterations >= maxIterations) done = true else iterations += 1
      }
    }
    Calibrated(w, lambda, risk)
  }
}
