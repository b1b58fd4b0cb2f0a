package graft.algo

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec

class QpSpec extends SparkSpec {
  import spark.implicits._

  test("projectSimplex: already-feasible vector unchanged; mass concentrates") {
    val w = Qp.projectSimplex(DenseVector(0.2, 0.3, 0.5))
    assert(breeze.linalg.norm(w - DenseVector(0.2, 0.3, 0.5)) < 1e-12)
    val far = Qp.projectSimplex(DenseVector(10.0, 0.0, 0.0))
    assert(breeze.linalg.norm(far - DenseVector(1.0, 0.0, 0.0)) < 1e-12)
    val mid = Qp.projectSimplex(DenseVector(0.9, 0.6, -1.0))
    assert(math.abs(breeze.linalg.sum(mid) - 1.0) < 1e-12 && breeze.linalg.min(mid) >= 0.0)
  }

  test("zero alpha + diagonal sigma: weights proportional to inverse variance") {
    val d = DenseVector(0.01, 0.04, 0.02)
    val sigma = breeze.linalg.diag(d)
    val w = Qp.solve(DenseVector.zeros[Double](3), sigma, 5.0)
    val inv = d.map(1.0 / _)
    val expect = inv / breeze.linalg.sum(inv)
    assert(breeze.linalg.norm(w - expect) < 1e-6, s"$w vs $expect")
  }

  test("tiny lambda concentrates weight on the best alpha") {
    val sigma = DenseMatrix.eye[Double](3) * 0.01
    val w = Qp.solve(DenseVector(0.01, 0.05, 0.02), sigma, 1e-6)
    assert(w(1) > 0.999)
  }

  test("KKT optimality on a random PSD problem") {
    val rnd = new scala.util.Random(3)
    val n = 20
    val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.05)
    val sigma = a * a.t + DenseMatrix.eye[Double](n) * 0.01
    val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
    val lambda = 50.0
    val w = Qp.solve(alphas, sigma, lambda)
    assert(math.abs(breeze.linalg.sum(w) - 1.0) < 1e-9)
    assert(breeze.linalg.min(w) >= -1e-12)
    // fixed-point optimality: projecting a gradient step moves nowhere
    val grad = (sigma * w) * lambda - alphas
    val moved = Qp.projectSimplex(w - grad * 0.1)
    assert(breeze.linalg.norm(moved - w) < 1e-5)
  }

  test("solver lands the stationarity gap far below the certificate pin") {
    // the l5_qp_certificate oracle pins stat_resid to 0.0 at 6 d.p.,
    // which needs a post-solve KKT gap < 5e-7 on EVERY date; this
    // asserts the default tol/maxIter keep an order of magnitude of
    // headroom (the solve-time warn threshold) across a spread of
    // conditioning and lambda regimes — gradient units scale with
    // lambda, so the high-lambda near-singular corner is the worst
    // case — and a future solver-knob change that erodes convergence
    // fails HERE instead of as a cross-engine hash mismatch in the
    // driver gate
    val rnd = new scala.util.Random(7)
    for (n <- Seq(5, 50, 200); lambda <- Seq(1.0, 50.0, 2000.0)) {
      val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.05)
      val sigma = a * a.t + DenseMatrix.eye[Double](n) * 1e-4 // near-singular
      val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
      val w = Qp.solve(alphas, sigma, lambda)
      val gap = Qp.stationarityGap(w, alphas, sigma, lambda)
      assert(gap < 5e-8, f"n=$n lambda=$lambda gap=$gap%.3e")
    }
  }

  test("plateau exit: stalled gap stops iterating, and a safe gap exits without warning") {
    // Drive the solver onto the plateau path deliberately: gapTol = -1
    // makes gap-convergence unreachable (the gap is a max of non-negative
    // terms), and a huge displacement tol makes every iterate count as
    // stalled so the periodic gap check runs from the start. The gap then
    // improves until it hits its numeric floor, stalls across two
    // consecutive checks, and the plateau exit MUST fire — well before
    // maxIter — with the floor gap far under the certificate warn gate,
    // so the exit is silent (warned = false). This is the latency half of
    // the plateau contract: a date whose gap has stopped improving does
    // not burn the remaining iteration budget.
    val rnd = new scala.util.Random(3)
    val n = 30
    val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.05)
    val sigma = a * a.t + DenseMatrix.eye[Double](n) * 0.01
    val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
    val d = Qp.solveDiag(alphas, sigma, 50.0,
      maxIter = 2000, tol = 1e3, gapTol = -1.0)
    assert(d.plateaued, s"expected the plateau exit, got $d")
    assert(!d.converged)
    assert(d.iters < 2000, s"plateau must fire before maxIter (${d.iters})")
    assert(d.gap < 5e-8, f"floor gap ${d.gap}%.3e should sit under the warn gate")
    assert(!d.warned, "a plateau exit with a safe gap must not warn")
    // the plateau iterate is still the right answer: feasible and at the
    // same optimum an unforced solve reaches
    assert(math.abs(breeze.linalg.sum(d.w) - 1.0) < 1e-9)
    assert(breeze.linalg.norm(d.w - Qp.solve(alphas, sigma, 50.0)) < 1e-6)
  }

  test("warn funnel: any exit that leaves the gap above the gate warns") {
    // The safety half of the plateau contract: the warn keys off the
    // FINAL gap, not the exit path, so no exit can strand a date above
    // the certificate gate silently. Exercised via the maxIter path —
    // 3 iterations from a cold start cannot reach stationarity — and
    // asserting warned tracks gap > 5e-8 exactly.
    val rnd = new scala.util.Random(3)
    val n = 30
    val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.05)
    val sigma = a * a.t + DenseMatrix.eye[Double](n) * 0.01
    val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
    val d = Qp.solveDiag(alphas, sigma, 50.0, maxIter = 3)
    assert(!d.converged && !d.plateaued)
    assert(d.gap > 5e-8, f"3 iterations should not reach the gate (${d.gap}%.3e)")
    assert(d.warned, "an exit above the warn gate must set warned")
  }

  test("conditioning sweep: production regimes converge clean; below the floor, warn — never silence") {
    // The round-9 plateau search, landed as a spec with its real result:
    // across rank-3 factor-model covariances and the lambda decades l8's
    // per-date fan-out visits, the default knobs reach clean gap
    // convergence down to the PRODUCTION conditioning floor — sigma
    // always carries diag(ivol^2) with idio vol >= 1%, i.e. a diagonal
    // ridge >= 1e-4. Below that floor (ridge 1e-6..1e-10, a regime no
    // real date produces) FISTA's O(sqrt(L/mu)) rate can exhaust maxIter
    // with the gap still above the gate — seed 1, ridge 1e-6,
    // lambda 2000 lands at ~4e-3 after 2000 iters — and there the
    // contract is the warn funnel: the exit must set `warned`, never
    // return silently. No combination in either regime may take the
    // plateau exit (it is a forced-knob latency guard, covered above,
    // not a route these problems reach). A future knob change that
    // erodes production convergence, or silences a bad sub-floor exit,
    // fails HERE instead of as a driver-gate hash mismatch.
    for (seed <- 1 to 6; ridge <- Seq(1e-2, 1e-4, 1e-6, 1e-8, 1e-10);
         lambda <- Seq(50.0, 2000.0, 1e5)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val a = DenseMatrix.tabulate(n, 3)((_, _) => rnd.nextGaussian() * 0.05)
      val sigma = a * a.t + DenseMatrix.eye[Double](n) * ridge
      val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
      val d = Qp.solveDiag(alphas, sigma, lambda)
      val tag = f"seed=$seed ridge=$ridge%.0e lambda=$lambda%.0e"
      assert(!d.plateaued, s"$tag -> unexpected plateau exit: $d")
      if (ridge >= 1e-4) {
        assert(d.converged && !d.warned, s"$tag -> $d")
        assert(d.gap <= 5e-9, f"$tag gap=${d.gap}%.3e")
      } else {
        assert(d.converged || d.warned,
          s"$tag -> non-converged exit without a warn: $d")
      }
    }
  }

  test("higher lambda gives lower active risk (monotonicity)") {
    val rnd = new scala.util.Random(11)
    val n = 10
    val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.03)
    val sigma = a * a.t + DenseMatrix.eye[Double](n) * 0.005
    val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.02)
    val bench = DenseVector.fill(n)(1.0 / n)
    val risks = Seq(1.0, 10.0, 100.0, 1000.0).map { l =>
      Qp.activeRisk(Qp.solve(alphas, sigma, l) - bench, sigma)
    }
    assert(risks.sliding(2).forall(p => p(1) <= p(0) + 1e-9), risks.toString)
  }

  test("calibration loop hits the target band when reachable") {
    val rnd = new scala.util.Random(5)
    val n = 15
    val a = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextGaussian() * 0.02)
    val sigma = a * a.t + DenseMatrix.eye[Double](n) * 0.003
    val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.02)
    val bench = DenseVector.fill(n)(1.0 / n)
    val res = Qp.solveCalibrated(alphas, sigma, bench, target = 0.05, tol = 0.005)
    // either in band, or the loop exhausted its 5 iterations (reference behavior)
    assert(math.abs(res.activeRisk - 0.05) <= 0.005 || res.lambda > 0)
    assert(math.abs(breeze.linalg.sum(res.weights) - 1.0) < 1e-9)
  }

  test("covariance assembly squares the idio-vol diagonal") {
    val b = DenseMatrix((1.0, 0.0), (0.0, 1.0))
    val f = DenseMatrix((0.04, 0.0), (0.0, 0.09))
    val sigma = Covariance.assemble(b, f, DenseVector(0.1, 0.2))
    assert(math.abs(sigma(0, 0) - (0.04 + 0.01)) < 1e-12)
    assert(math.abs(sigma(1, 1) - (0.09 + 0.04)) < 1e-12)
    assert(math.abs(sigma(0, 1)) < 1e-12)
  }

  test("degenerate single-asset date: calibration stops with the feasible weight") {
    // active risk is 0 for every candidate (w = bench is forced), so the
    // lambda fit degenerates; the guard must keep w = [1.0], never NaN
    val res = Qp.solveCalibrated(
      DenseVector(0.02), DenseMatrix((0.01)), DenseVector(1.0))
    assert(res.weights(0) == 1.0)
    assert(!res.weights(0).isNaN && !res.activeRisk.isNaN)
  }

  test("certificate: feasibility constants and zero risk residual per date") {
    val dates = Seq("2024-01-02", "2024-01-03").map(java.sql.Date.valueOf)
    val tickers = Seq("A", "B", "C")
    val alphas = for (d <- dates; (t, i) <- tickers.zipWithIndex)
      yield (d, t, 0.01 * (i + 1))
    val loadings = for (d <- dates; t <- tickers; f <- Seq("F1", "F2"))
      yield (d, t, f, if (f == "F1") 1.0 else 0.5)
    val fcov = for (d <- dates; f1 <- Seq("F1", "F2"); f2 <- Seq("F1", "F2"))
      yield (d, f1, f2, if (f1 == f2) 0.04 else 0.01)
    val ivol = for (d <- dates; t <- tickers) yield (d, t, 0.1)
    val bench = for (d <- dates; t <- tickers) yield (d, t, 1.0 / 3)
    val (aDf, lDf, fDf, iDf, bDf) = (
      alphas.toDF("date", "ticker", "alpha"),
      loadings.toDF("date", "ticker", "factor", "loading"),
      fcov.toDF("date", "factor_1", "factor_2", "covariance"),
      ivol.toDF("date", "ticker", "idio_vol"),
      bench.toDF("date", "ticker", "weight"))
    val w = PortfolioOpt.optimalWeights(aDf, lDf, fDf, iDf, bDf)
    val cert = PortfolioOpt.certificate(w, aDf, lDf, fDf, iDf, bDf).collect()
    assert(cert.length == dates.length)
    cert.foreach { r =>
      assert(r.getAs[Long]("n_assets") == 3)
      assert(r.getAs[String]("tickers") == "A,B,C")
      assert(r.getAs[Double]("sum_w") == 1.0)
      assert(r.getAs[Boolean]("min_w_nonneg"))
      assert(r.getAs[Double]("risk_resid") == 0.0)
      assert(r.getAs[Double]("stat_resid") == 0.0)
      assert(r.getAs[Boolean]("comp_ok"))
    }
    // adversarial: a FEASIBLE but suboptimal solution (the benchmark
    // itself, reported with a plausible lambda and its true active risk
    // of 0) passes every feasibility pin but must FAIL stationarity —
    // its held-asset reduced gradient g = α − λΣw is not constant when
    // the alphas differ. This is what makes the certificate an
    // optimality check, not just a feasibility check.
    val fake = bench.map { case (d, t, bw) => (d, t, bw, 50.0, 0.0) }
      .toDF("date", "ticker", "weight", "lambda", "active_risk")
    val cheat = PortfolioOpt.certificate(fake, aDf, lDf, fDf, iDf, bDf).collect()
    cheat.foreach { r =>
      assert(r.getAs[Double]("sum_w") == 1.0 && r.getAs[Boolean]("min_w_nonneg"))
      assert(r.getAs[Double]("risk_resid") == 0.0)
      assert(r.getAs[Double]("stat_resid") > 0.0,
        "a suboptimal feasible point must not certify as stationary")
    }
  }

  test("PortfolioOpt fan-out: per-date weights sum to 1, long-only") {
    val dates = Seq("2024-01-02", "2024-01-03").map(java.sql.Date.valueOf)
    val tickers = Seq("A", "B", "C")
    val alphas = for (d <- dates; (t, i) <- tickers.zipWithIndex)
      yield (d, t, 0.01 * (i + 1))
    val loadings = for (d <- dates; t <- tickers; f <- Seq("F1", "F2"))
      yield (d, t, f, if (f == "F1") 1.0 else 0.5)
    val fcov = for (d <- dates; f1 <- Seq("F1", "F2"); f2 <- Seq("F1", "F2"))
      yield (d, f1, f2, if (f1 == f2) 0.04 else 0.01)
    val ivol = for (d <- dates; t <- tickers) yield (d, t, 0.1)
    val bench = for (d <- dates; t <- tickers) yield (d, t, 1.0 / 3)
    val out = PortfolioOpt.optimalWeights(
      alphas.toDF("date", "ticker", "alpha"),
      loadings.toDF("date", "ticker", "factor", "loading"),
      fcov.toDF("date", "factor_1", "factor_2", "covariance"),
      ivol.toDF("date", "ticker", "idio_vol"),
      bench.toDF("date", "ticker", "weight")).collect()
    assert(out.length == 6)
    dates.foreach { d =>
      val ws = out.filter(_.getDate(0) == d).map(_.getDouble(2))
      assert(math.abs(ws.sum - 1.0) < 1e-9)
      assert(ws.forall(_ >= -1e-12))
    }
  }
}
