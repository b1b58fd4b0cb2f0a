package graft.algo

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L8: per-date parallel portfolio optimization fan-out (reference
  * `pipelines/portfolio_weights_flow.py:17-60,94-143`, which uses Ray
  * remote tasks + a shared object store).
  *
  * Spark-native shape: each input table is grouped to one row per date
  * (`collect_list(struct(...))`), the five are joined on date, and each
  * resulting row — one date's full problem — runs the QP on an executor.
  * Dates are the parallelism axis; no driver-side loop, no shared object
  * store needed (the shuffle moves each date's slice to its task). Group
  * state is bounded by universe size (~503 tickers), not data volume.
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
    *         active_risk).distinct`.
    */
  def optimalWeights(
      alphas: DataFrame,
      loadings: DataFrame,
      factorCov: DataFrame,
      idioVol: DataFrame,
      benchmark: DataFrame,
      targetActiveRisk: Double = 0.05): DataFrame = {

    val a = alphas.groupBy("date")
      .agg(collect_list(struct(col("ticker"), col("alpha"))).as("alphas"))
    val b = loadings.groupBy("date")
      .agg(collect_list(struct(col("ticker"), col("factor"), col("loading"))).as("loadings"))
    val f = factorCov.groupBy("date")
      .agg(collect_list(struct(col("factor_1"), col("factor_2"), col("covariance"))).as("fcov"))
    val iv = idioVol.groupBy("date")
      .agg(collect_list(struct(col("ticker"), col("idio_vol"))).as("ivol"))
    val bw = benchmark.groupBy("date")
      .agg(collect_list(struct(col("ticker"), col("weight"))).as("bench"))

    val joined = a.join(b, "date").join(f, "date").join(iv, "date").join(bw, "date")

    implicit val enc = Encoders.row(outSchema)
    joined.flatMap { row =>
      val date = row.getAs[java.sql.Date]("date")
      val alphaPairs = row.getAs[scala.collection.Seq[Row]]("alphas")
        .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq
      val tickers = alphaPairs.map(_._1)
      val ti = tickers.zipWithIndex.toMap
      val loadTriples = row.getAs[scala.collection.Seq[Row]]("loadings")
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      val factors = loadTriples.map(_._2).distinct.sorted
      val fcovTriples = row.getAs[scala.collection.Seq[Row]]("fcov")
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      val ivPairs = row.getAs[scala.collection.Seq[Row]]("ivol")
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val benchPairs = row.getAs[scala.collection.Seq[Row]]("bench")
        .map(r => r.getString(0) -> r.getDouble(1)).toMap

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
      }
    }
  }
}
