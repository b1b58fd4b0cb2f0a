package graft.connect

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: broker state source — positions, filled orders, portfolio equity
  * history (reference `pipelines/utils/alpaca.py:8-45`,
  * `portfolio_history_flow.py:14-41`). Edge connector, not a query
  * operator: production plugs the broker HTTP client; the fixture below
  * is seeded and deterministic.
  */
trait BrokerSource {
  /** (ticker, qty, market_value) current positions. */
  def positions(spark: SparkSession): DataFrame
  /** (ticker, side, qty, price) orders filled on the date. */
  def filledOrders(spark: SparkSession, date: LocalDate): DataFrame
  /** (timestamp, equity) minute-granularity equity curve for the date
    * (reference writes this to the `portfolio_history` table).
    */
  def equityHistory(spark: SparkSession, date: LocalDate): DataFrame
}

class FixtureBrokerSource(seed: Long = 42L, tickers: Seq[String] = Seq("AAA", "BBB", "CCC"))
  extends BrokerSource {

  override def positions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    tickers.map(t => (t, (10 + rnd.nextInt(90)).toDouble,
        math.rint(rnd.nextDouble() * 5e6) / 100))
      .toDF("ticker", "qty", "market_value")
  }

  override def filledOrders(spark: SparkSession, date: LocalDate): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed ^ date.toEpochDay)
    tickers.filter(_ => rnd.nextBoolean())
      .map(t => (t, if (rnd.nextBoolean()) "buy" else "sell",
        (1 + rnd.nextInt(20)).toDouble, math.rint(rnd.nextDouble() * 2e4) / 100))
      .toDF("ticker", "side", "qty", "price")
  }

  override def equityHistory(spark: SparkSession, date: LocalDate): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed ^ date.toEpochDay ^ 0x5eedL)
    var equity = 1e6
    val start = java.time.LocalDateTime.of(date, java.time.LocalTime.of(14, 30))
    (0 until 390).map { m =>
      equity *= math.exp(rnd.nextGaussian() * 2e-4)
      (java.sql.Timestamp.valueOf(start.plusMinutes(m)), math.rint(equity * 100) / 100)
    }.toDF("timestamp", "equity")
  }
}
