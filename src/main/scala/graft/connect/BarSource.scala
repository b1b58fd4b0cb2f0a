package graft.connect

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7/S8: market-data bar source connector. The reference fetches
  * split-adjusted daily bars from a broker HTTP API on the driver
  * (`pipelines/stock_prices_flow.py:26-69`); the engine models that as a
  * trait so production can plug an HTTP client while tests and local runs
  * use the deterministic fixture below. Empty results must come back as a
  * TYPED empty frame (reference `stock_prices_flow.py:42-55`).
  */
trait BarSource {
  def dailyBars(spark: SparkSession, tickers: Seq[String],
      start: LocalDate, end: LocalDate): DataFrame

  /** S8: 1-minute bars over the 04:00–20:00 ET extended session of one
    * market date (reference `pipelines/history_flow.py:27-47`). Callers
    * iterate market dates and union — the reference's per-date batched
    * fetch (S12, `history_flow.py:63-71`).
    */
  def minuteBars(spark: SparkSession, tickers: Seq[String], date: LocalDate): DataFrame
}

/** Seeded geometric-random-walk fixture source (FIXTURES.md §B3). */
class FixtureBarSource(seed: Long = 42L) extends BarSource {

  override def dailyBars(spark: SparkSession, tickers: Seq[String],
      start: LocalDate, end: LocalDate): DataFrame = {
    import spark.implicits._
    val rows = tickers.flatMap { t =>
      val rnd = new scala.util.Random(seed ^ t.hashCode.toLong)
      var price = 50.0 + rnd.nextDouble() * 100
      Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
        .filter(d => d.getDayOfWeek.getValue <= 5)
        .map { d =>
          price *= math.exp(rnd.nextGaussian() * 0.015)
          val close = math.rint(price * 100) / 100
          val open = math.rint(close * (1 + rnd.nextGaussian() * 0.003) * 100) / 100
          val vol = 1e5 + rnd.nextInt(100000).toDouble
          (t, java.sql.Date.valueOf(d), open,
            math.max(open, close) * 1.005, math.min(open, close) * 0.995,
            close, vol, math.rint(vol / 50), (open + close) / 2)
        }.toSeq
    }
    rows.toDF("ticker", "date", "open", "high", "low", "close",
      "volume", "trade_count", "vwap")
  }

  override def minuteBars(spark: SparkSession, tickers: Seq[String],
      date: LocalDate): DataFrame = {
    import spark.implicits._
    // 04:00 ET wall clock resolved through America/New_York — EST dates
    // start at 09:00 UTC, EDT dates at 08:00 UTC, exactly like the
    // reference's zone-aware session window (history_flow.py:29-30); the
    // earlier fixed -5h offset shifted every EDT date by one hour
    val sessionStart = date
      .atTime(4, 0).atZone(java.time.ZoneId.of("America/New_York")).toInstant
    val rows = tickers.flatMap { t =>
      val rnd = new scala.util.Random(seed ^ t.hashCode.toLong ^ date.toEpochDay)
      var price = 50.0 + rnd.nextDouble() * 100
      (0 until 16 * 60).map { m =>
        price *= math.exp(rnd.nextGaussian() * 0.0005)
        val close = math.rint(price * 100) / 100
        val open = math.rint(close * (1 + rnd.nextGaussian() * 0.0002) * 100) / 100
        val vol = 100.0 + rnd.nextInt(1000)
        (t, java.sql.Timestamp.from(
            sessionStart.plus(java.time.Duration.ofMinutes(m))), open,
          math.max(open, close), math.min(open, close), close,
          vol, math.rint(vol / 10), (open + close) / 2)
      }
    }
    rows.toDF("ticker", "timestamp", "open", "high", "low", "close",
      "volume", "trade_count", "vwap")
  }
}
