package graft.algo

import breeze.linalg.DenseVector
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L8: per-date parallel portfolio optimization fan-out (reference
  * `pipelines/portfolio_weights_flow.py:17-60,94-143`, which uses Ray
  * remote tasks + a shared object store).
  *
  * Spark-native shape: the five inputs are tagged and unioned into one
  * long frame, grouped ONCE by date (`collect_list(struct(...))`), and
  * each resulting row — one date's full problem — runs the QP on an
  * executor. One shuffle total (vs five groupBys + a 5-way join of the
  * per-date frames, whose sequential stage barriers dominate on small
  * dates×tickers and whose shuffles multiply at scale). Dates are the
  * parallelism axis; no driver-side loop, no shared object store (the
  * shuffle moves each date's slice to its task). Group state is bounded
  * by universe size (~503 tickers), not data volume.
  */
object PortfolioOpt {

  private val outSchema = StructType(Seq(
    StructField("date", DateType),
    StructField("ticker", StringType),
    StructField("weight", DoubleType),
    StructField("lambda", DoubleType),
    StructField("active_risk", DoubleType)))

  /** @param alphas     (date, ticker, alpha)
    * @param loadings   (date, ticker, factor, loading)
    * @param factorCov  (date, factor_1, factor_2, covariance)
    * @param idioVol    (date, ticker, idio_vol)
    * @param benchmark  (date, ticker, weight)
    * @return (date, ticker, weight, lambda, active_risk) — one row per
    *         held ticker; split metrics off with `.select(date, lambda,
    *         active_risk).distinct`. Dates missing any of the five inputs
    *         are skipped (the join semantics of the reference's per-date
    *         table slices).
    */
  def optimalWeights(
      alphas: DataFrame,
      loadings: DataFrame,
      factorCov: DataFrame,
      idioVol: DataFrame,
      benchmark: DataFrame,
      targetActiveRisk: Double = 0.05): DataFrame = {

    def tagged(df: DataFrame, tag: String, k1: String, k2: Option[String],
        v: String): DataFrame =
      df.filter(col(v).isNotNull) // null values carry no information for the QP
        .select(col("date"), lit(tag).as("src"), col(k1).cast("string").as("k1"),
          k2.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string")).as("k2"),
          col(v).cast("double").as("v"))

    val long = tagged(alphas, "a", "ticker", None, "alpha")
      .unionByName(tagged(loadings, "l", "ticker", Some("factor"), "loading"))
      .unionByName(tagged(factorCov, "f", "factor_1", Some("factor_2"), "covariance"))
      .unionByName(tagged(idioVol, "i", "ticker", None, "idio_vol"))
      .unionByName(tagged(benchmark, "b", "ticker", None, "weight"))

    val grouped = long.groupBy("date")
      .agg(collect_list(struct(col("src"), col("k1"), col("k2"), col("v"))).as("rows"))

    implicit val enc = Encoders.row(outSchema)
    grouped.flatMap { row =>
      val date = row.getAs[java.sql.Date]("date")
      val all = row.getAs[scala.collection.Seq[Row]]("rows")
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      val bySrc = all.groupBy(_._1)
      if (!Seq("a", "l", "f", "i", "b").forall(bySrc.contains)) Iterator.empty
      else {
        val alphaPairs = bySrc("a").map(t => t._2 -> t._4).sortBy(_._1).toSeq
        val tickers = alphaPairs.map(_._1)
        val ti = tickers.zipWithIndex.toMap
        val loadTriples = bySrc("l").map(t => (t._2, t._3, t._4)).toSeq
        val factors = loadTriples.map(_._2).distinct.sorted
        val fcovTriples = bySrc("f").map(t => (t._2, t._3, t._4)).toSeq
        val ivPairs = bySrc("i").map(t => t._2 -> t._4).toMap
        val benchPairs = bySrc("b").map(t => t._2 -> t._4).toMap

        val bMat = Covariance.loadingsMatrix(tickers, factors,
          loadTriples.filter(t => ti.contains(t._1)))
        val fMat = Covariance.factorCovMatrix(factors, fcovTriples)
        val ivVec = DenseVector(tickers.map(t => ivPairs.getOrElse(t, 0.0)).toArray)
        val sigma = Covariance.assemble(bMat, fMat, ivVec)
        val alphaVec = DenseVector(alphaPairs.map(_._2).toArray)
        val benchVec = DenseVector(tickers.map(t => benchPairs.getOrElse(t, 0.0)).toArray)

        val res = Qp.solveCalibrated(alphaVec, sigma, benchVec, targetActiveRisk)
        tickers.zipWithIndex.map { case (t, i) =>
          Row(date, t, res.weights(i), res.lambda, res.activeRisk)
        }.iterator
      }
    }
  }

  /** Per-date *solution certificate* for [[optimalWeights]] output — the
    * cross-engine-checkable half of the QP (the solve itself is not
    * SQL-expressible, its KKT/feasibility certificate is):
    *
    *   - `sum_w`        Σw rounded to 6 d.p. (simplex ⇒ exactly 1.0)
    *   - `min_w_nonneg` w ≥ 0 (simplex projection is exact)
    *   - `risk_resid`   |√(wₐᵀΣwₐ)·√252 − reported| rounded to 6 d.p.,
    *                    with Σ = B·F·Bᵀ + D² recomputed HERE from the raw
    *                    long-form inputs via pure join/sum algebra
    *                    (never touching [[Qp]] / Breeze): the quadratic
    *                    form factorizes as (Bᵀwₐ)ᵀF(Bᵀwₐ) + Σᵢ wₐᵢ²Dᵢ²
    *   - `stat_resid`   KKT STATIONARITY: with g = α − λΣw (Σw assembled
    *                    relationally as B·(F·(Bᵀw)) + D²w) and μ = wᵀg
    *                    (exact multiplier estimate, since Σw = 1), the
    *                    optimum has g_i = μ on every HELD asset — so
    *                    max over w_i>0 of |g_i − μ|, rounded to 6 d.p.,
    *                    is 0. A merely FEASIBLE solution (e.g. returning
    *                    the benchmark or equal weights) fails this: its
    *                    held-asset gradient is not constant.
    *   - `comp_ok`      complementary slackness for the w_i = 0 bound:
    *                    g_i ≤ μ + 1e−6 on every zero-weight asset
    *                    (vacuously true on dates with all-positive w)
    *   - `n_assets`, `tickers` — the per-date universe, independently
    *     derivable by the oracle from the source tables
    *
    * A DuckDB oracle reproduces `date/n_assets/tickers` from the inputs
    * and pins the constants (1.0, true, 0.0, 0.0, true); a hash match
    * certifies the solver emitted feasible simplex weights that are
    * KKT-STATIONARY for their reported λ and whose reported risk is
    * consistent with an independent Σ assembly on every date — a
    * feasible-but-suboptimal solver now fails the hash, not just the
    * JVM-side [[Qp]] specs.
    * Reference semantics: `pipelines/utils/portfolio.py:6-44,65-121`.
    */
  def certificate(
      weights: DataFrame,
      alphas: DataFrame,
      loadings: DataFrame,
      factorCov: DataFrame,
      idioVol: DataFrame,
      benchmark: DataFrame): DataFrame = {
    // two consumers below (factor exposure, per-date rollup) — a lazily
    // persisted frame race-computes the whole upstream QP fan-out (~2x),
    // and an eager count() barrier was measured slower still; the eager
    // localCheckpoint materializes the QP exactly once and truncates the
    // lineage both consumers re-plan over (same fix as minHashLsh's
    // candidate frame)
    val wa = weights
      .join(benchmark.select(col("date"), col("ticker"), col("weight").as("bw")),
        Seq("date", "ticker"), "left")
      .select(col("date"), col("ticker"), col("weight"), col("lambda"),
        col("active_risk"),
        (col("weight") - coalesce(col("bw"), lit(0.0))).as("wa"))
      .localCheckpoint(true)
    // x_f = Bᵀwₐ per (date, factor); absent loadings are zeros in B, so the
    // inner join dropping them reproduces Covariance.loadingsMatrix exactly
    val xf = wa.join(loadings, Seq("date", "ticker"))
      .groupBy("date", "factor")
      .agg(sum(col("wa") * col("loading")).as("x"),
        // the FULL-weight exposure Bᵀw rides the same aggregate — the
        // stationarity check needs Σw (not Σwₐ) and this costs no extra
        // shuffle
        sum(col("weight") * col("loading")).as("xw"))
    val q1 = factorCov
      .join(xf.select(col("date"), col("factor").as("factor_1"), col("x").as("x1")),
        Seq("date", "factor_1"))
      .join(xf.select(col("date"), col("factor").as("factor_2"), col("x").as("x2")),
        Seq("date", "factor_2"))
      .groupBy("date").agg(sum(col("x1") * col("covariance") * col("x2")).as("q1"))
    // systematic half of Σw per (date, ticker): (B·(F·(Bᵀw)))_i — two
    // joins and two bounded aggregations, all keyed by date (+factor /
    // +ticker); every intermediate is at most universe- or factor-sized
    // per date
    val yf = factorCov
      .join(xf.select(col("date"), col("factor").as("factor_2"), col("xw")),
        Seq("date", "factor_2"))
      .groupBy(col("date"), col("factor_1").as("factor"))
      .agg(sum(col("covariance") * col("xw")).as("y"))
    val sysw = loadings.join(yf, Seq("date", "factor"))
      .groupBy("date", "ticker")
      .agg(sum(col("loading") * col("y")).as("sw_sys"))
    // the idio quadratic Σ wₐᵢ²Dᵢ² folds into the same per-date rollup as
    // the feasibility stats (left join: a ticker without idio vol is a
    // zero diagonal entry, matching the loadings-matrix assembly), so wa
    // has two consumers instead of three; q1 — a few rows per date — is
    // broadcast into the final join rather than shuffled. idioVol is
    // max-aggregated first: unique per (date, ticker) is the QP input
    // contract, but a violating input must not inflate the FEASIBILITY
    // stats (n_assets/tickers/sum_w) through join duplication — with the
    // pre-aggregation only risk_resid can flag such input, as it should
    // per-row reduced gradient g = α − λ(Σw)_i; left joins + coalesce keep
    // the row set exactly the weights frame's (a ticker absent from
    // loadings/idioVol contributes zeros to Σ, matching the matrix
    // assembly; alphas cover the universe by construction). μ = wᵀg is a
    // per-date window — bounded by universe size (~503), never corpus-wide
    val wDate = org.apache.spark.sql.expressions.Window.partitionBy("date")
    val graded = wa
      .join(idioVol.groupBy("date", "ticker").agg(max(col("idio_vol")).as("idio_vol")),
        Seq("date", "ticker"), "left")
      .join(sysw, Seq("date", "ticker"), "left")
      // alphas pre-aggregated for the same reason as idioVol above: a
      // duplicate (date, ticker) alpha row must not inflate the
      // feasibility stats through join duplication
      .join(alphas.groupBy("date", "ticker")
        .agg(max(col("alpha").cast("double")).as("_alpha")),
        Seq("date", "ticker"), "left")
      .withColumn("g", coalesce(col("_alpha"), lit(0.0)) - col("lambda") *
        (coalesce(col("sw_sys"), lit(0.0)) +
          coalesce(col("idio_vol"), lit(0.0)) * coalesce(col("idio_vol"), lit(0.0))
            * col("weight")))
      .withColumn("mu", sum(col("weight") * col("g")).over(wDate))
    val rollup = graded
      .groupBy("date").agg(
        count(lit(1)).as("n_assets"),
        concat_ws(",", sort_array(collect_list(col("ticker")))).as("tickers"),
        sum(col("weight")).as("sum_w_raw"),
        min(col("weight")).as("min_w"),
        max(col("active_risk")).as("risk_reported"),
        sum(col("wa") * col("wa")
          * coalesce(col("idio_vol"), lit(0.0)) * coalesce(col("idio_vol"), lit(0.0))).as("q2"),
        max(when(col("weight") > 0.0, abs(col("g") - col("mu")))).as("stat_gap"),
        min(when(col("weight") === 0.0, col("mu") - col("g"))).as("slack_min"))
    rollup
      .join(broadcast(q1), Seq("date"), "left")
      .select(col("date"), col("n_assets"), col("tickers"),
        round(col("sum_w_raw"), 6).as("sum_w"),
        (col("min_w") >= 0.0).as("min_w_nonneg"),
        round(abs(
          sqrt(coalesce(col("q1"), lit(0.0)) + coalesce(col("q2"), lit(0.0)))
            * math.sqrt(252.0) - col("risk_reported")), 6).as("risk_resid"),
        round(coalesce(col("stat_gap"), lit(0.0)), 6).as("stat_resid"),
        coalesce(col("slack_min") >= -1e-6, lit(true)).as("comp_ok"))
  }
}
