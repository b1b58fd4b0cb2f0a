package graft.connect

import java.time.LocalDate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectSpec extends SparkSpec {

  private val fixtureHtml =
    """<html><body>
      |<table id="constituents"><tbody>
      |<tr><th>Symbol</th><th>Security</th><th>GICS Sector</th></tr>
      |<tr><td><a href="/wiki/AAA">AAA</a></td><td>Alpha &amp; Co</td><td>Tech</td></tr>
      |<tr><td>BBB</td><td>Beta Corp</td><td>Health</td></tr>
      |</tbody></table>
      |<table id="changes"><tbody>
      |<tr><th>Date</th><th>Added Ticker</th><th>Removed Ticker</th><th>Reason</th></tr>
      |<tr><td>January 5, 2024</td><td>AAA</td><td>ZZZ</td><td>Market cap</td></tr>
      |<tr><td>March 15, 2023</td><td>BBB</td><td></td><td>Listing</td></tr>
      |</tbody></table>
      |</body></html>""".stripMargin

  test("HTML table source parses headers, strips markup, unescapes entities") {
    val t0 = HtmlTableSource.table(spark, fixtureHtml, 0)
    assert(t0.columns.toSeq == Seq("symbol", "security", "gics_sector"))
    val rows = t0.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.contains(("AAA", "Alpha & Co"))) // <a> stripped, &amp; unescaped
    assert(rows.length == 2)
  }

  test("change-log table parses the reference's date format (F4 strptime)") {
    val t1 = HtmlTableSource.table(spark, fixtureHtml, 1)
    val parsed = t1.select(
      to_date(col("date"), "MMMM d, yyyy").as("effective_date"),
      col("added_ticker"))
      .collect().map(r => r.getDate(0).toString -> r.getString(1)).toMap
    assert(parsed("2024-01-05") == "AAA" && parsed("2023-03-15") == "BBB")
  }

  test("minute bars cover the 16-hour extended session at 1-min granularity") {
    val bars = new FixtureBarSource(42).minuteBars(spark, Seq("AAA", "BBB"),
      LocalDate.of(2024, 3, 4))
    assert(bars.count() == 2 * 16 * 60)
    // compare instants, not Timestamp.toString (which renders in the JVM
    // default zone and would make the assertion host-TZ-dependent);
    // 2024-03-04 is EST: 04:00 ET = 09:00 UTC
    val span = bars.agg(min("timestamp"), max("timestamp")).collect().head
    assert(span.getTimestamp(0).toInstant ==
      java.time.Instant.parse("2024-03-04T09:00:00Z"))
    assert(span.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-03-05T00:59:00Z"))
    // deterministic: same seed, same bars
    val again = new FixtureBarSource(42).minuteBars(spark, Seq("AAA"),
      LocalDate.of(2024, 3, 4)).agg(sum("close")).collect().head.getDouble(0)
    val first = bars.filter(col("ticker") === "AAA").agg(sum("close"))
      .collect().head.getDouble(0)
    assert(math.abs(again - first) < 1e-9)
  }

  test("minute bars respect DST: an EDT date starts at 08:00 UTC, not 09:00") {
    // 2024-07-01 is EDT (UTC-4): 04:00 ET = 08:00 UTC, session end
    // 19:59 ET = 23:59 UTC the SAME day (reference history_flow.py:29-30
    // resolves the window through America/New_York wall clock)
    val jul = new FixtureBarSource(42).minuteBars(spark, Seq("AAA"),
      LocalDate.of(2024, 7, 1))
    val span = jul.agg(min("timestamp"), max("timestamp")).collect().head
    assert(span.getTimestamp(0).toInstant ==
      java.time.Instant.parse("2024-07-01T08:00:00Z"),
      s"EDT session must start 08:00 UTC: ${span.getTimestamp(0)}")
    assert(span.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-07-01T23:59:00Z"),
      s"EDT session must end 23:59 UTC: ${span.getTimestamp(1)}")
  }

  test("daily trading summary renders the reference's Block Kit, golden-exact") {
    import Slack.Order
    // 4 buys (top-3 cut applies), 1 sell, 6 positions (top-5 cut),
    // previous value known (P&L field, not trade count)
    val orders = Seq(
      Order("AAA", "buy", 10.0, 150.25), Order("BBB", "buy", 5.0, 80.10),
      Order("CCC", "buy", 2.0, 30.0), Order("DDD", "buy", 1.0, 10.0),
      Order("EEE", "sell", 3.0, 200.0))
    val positions = Seq(("CCC", 345.5), ("AAA", 12345.67), ("BBB", 2345.0),
      ("DDD", 45.0), ("EEE", 5.0), ("FFF", 1.0))
    val golden =
      """{"blocks":[{"type":"header","text":{"type":"plain_text","text":"📊 Daily Trading Summary"}},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*Portfolio Value*\n$1,234,567.89"},""" +
      """{"type":"mrkdwn","text":"*Day P&L*\n$34,567.89 (+2.88%)"},""" +
      """{"type":"mrkdwn","text":"*Total Volume*\n$2,573.00"},""" +
      """{"type":"mrkdwn","text":"*Positions*\n6 open"}]},{"type":"divider"},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Buys:* 4 · $1,973.00\n*Sells:* 1 · $600.00"}},""" +
      """{"type":"divider"},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Top 3 Buys*\n1. 10.00 `AAA` @ $150.25 = $1,502.50\n2. 5.00 `BBB` @ $80.10 = $400.50\n3. 2.00 `CCC` @ $30.00 = $60.00"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Top 3 Sells*\n1. 3.00 `EEE` @ $200.00 = $600.00"}},""" +
      """{"type":"divider"},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Top 5 Positions*\n1. `AAA`: $12,345.67\n2. `BBB`: $2,345.00\n3. `CCC`: $345.50\n4. `DDD`: $45.00\n5. `EEE`: $5.00"}}]}"""
    assert(Slack.dailyTradingSummary(orders, positions, 1234567.89,
      Some(1200000.0)) == golden)
    // empty order list -> the reference's "no trades" message
    assert(Slack.dailyTradingSummary(Nil, positions, 1234567.89) ==
      """{"blocks":[{"type":"section","text":{"type":"mrkdwn","text":"✅ *No trades executed today*\n\nPortfolio value: $1,234,567.89"}}]}""")
    // without a previous value the P&L field becomes the trade count
    assert(Slack.dailyTradingSummary(orders.take(1), positions, 100.0)
      .contains("""*Trades Executed*\n1"""))
    // previous value 0.0 ALSO falls through to the trade count: Python's
    // `if previous_account_value` is falsy for 0 — a P&L branch here
    // would render Infinity%/NaN%, which the reference never emits
    val zeroPrev = Slack.dailyTradingSummary(orders.take(1), positions,
      100.0, Some(0.0))
    assert(zeroPrev.contains("""*Trades Executed*\n1"""))
    assert(!zeroPrev.contains("Infinity") && !zeroPrev.contains("NaN"))
    // frame-level wrapper renders from BrokerSource-shaped frames
    import spark.implicits._
    val payload = Slack.dailyTradingSummaryFrames(
      Seq(("AAA", "buy", 10.0, 150.25), ("EEE", "sell", 3.0, 200.0))
        .toDF("ticker", "side", "qty", "price"),
      Seq(("AAA", 2.0, 12345.67)).toDF("ticker", "qty", "market_value"),
      1234567.89, Some(1200000.0))
    assert(payload.contains("""*Top 3 Buys*\n1. 10.00 `AAA` @ $150.25 = $1,502.50"""))
    assert(payload.contains("""*Top 1 Positions*\n1. `AAA`: $12,345.67"""))
  }

  test("failure notification renders the reference's block sequence, golden-exact") {
    // block-for-block mirror of slack_failure_handler.py:52-90: header /
    // error section / context section / divider / traceback code block
    val golden =
      """{"blocks":[{"type":"header","text":{"type":"plain_text","text":"🚨 Flow Failed: stock_prices"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Error Type:* `ValueError`\n*Error Message:* bad bar row"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Run ID:* `run-42`\n*Parameters:* `{date: 2024-03-04}`"}},""" +
      """{"type":"divider"},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*Traceback:*\n```Traceback (most recent call last):\n  boom```"}}]}"""
    assert(Slack.failure("stock_prices", "ValueError", "bad bar row",
      "Traceback (most recent call last):\n  boom",
      Some("run-42"), Some("{date: 2024-03-04}")) == golden)
    // without context the section is omitted entirely (reference:
    // `if context_lines` — no empty block)
    val bare = Slack.failure("f", "E", "m", "tb")
    assert(!bare.contains("Run ID") && bare.contains(""""type":"divider""""))
    // long tracebacks keep the TAIL (the raising frame), not the head:
    // last 1950 chars + the truncation marker (handler lines 37-38)
    val longTb = ("x" * 3000) + "TAIL_MARKER"
    val truncated = Slack.failure("f", "E", "m", longTb)
    assert(truncated.contains("TAIL_MARKER"))
    assert(truncated.contains("""... (truncated)"""))
    assert(!truncated.contains("x" * 1960), "head must be dropped, not the tail")
    // parameters over 200 chars truncate to 197 + "..."
    val p = Slack.failure("f", "E", "m", "tb", None, Some("p" * 250))
    assert(p.contains("p" * 197 + "...") && !p.contains("p" * 198))
    // Throwable overload renders class name + message + JVM stack trace
    val fromEx = Slack.failure("f",
      new IllegalStateException("kaboom"), Some("r1"), None)
    assert(fromEx.contains("*Error Type:* `IllegalStateException`"))
    assert(fromEx.contains("kaboom"))
  }

  test("credential resolution fails fast listing EVERY unset variable") {
    // reference clients/alpaca.py:16-23: one RuntimeError interpolating
    // each missing env var — not first-missing-wins
    val env = Map("ALPACA_API_KEY" -> "k", "ALPACA_PAPER" -> "true")
    val e = intercept[Credentials.MissingCredentials] {
      Credentials.resolve(Map.empty[String, String].get,
        Seq("ALPACA_API_KEY", "ALPACA_SECRET_KEY"))
    }
    assert(e.missing == Seq("ALPACA_API_KEY", "ALPACA_SECRET_KEY"))
    assert(e.getMessage.contains("Environment variables not set"))
    assert(e.getMessage.contains("ALPACA_SECRET_KEY: null"))
    // only the truly-missing required key is reported
    val one = intercept[Credentials.MissingCredentials] {
      Credentials.resolve(env.get, Seq("ALPACA_API_KEY", "ALPACA_SECRET_KEY"))
    }
    assert(one.missing == Seq("ALPACA_SECRET_KEY"))
    // all present -> map; absent OPTIONAL key omitted without error
    // (alpaca.py:29-30 reads ALPACA_PAPER unvalidated)
    val full = env + ("ALPACA_SECRET_KEY" -> "s")
    assert(Credentials.resolve(full.get,
      Seq("ALPACA_API_KEY", "ALPACA_SECRET_KEY"), Seq("ALPACA_PAPER")) ==
      Map("ALPACA_API_KEY" -> "k", "ALPACA_SECRET_KEY" -> "s",
        "ALPACA_PAPER" -> "true"))
    assert(Credentials.resolve(env.get, Seq("ALPACA_API_KEY"),
      Seq("NOT_SET")) == Map("ALPACA_API_KEY" -> "k"))
    // empty string counts as missing — the reference gates on Python
    // truthiness (alpaca.py:24 `if not (api_key and secret_key)`), so
    // ALPACA_API_KEY="" must fail fast, not surface later in the transport
    val blank = intercept[Credentials.MissingCredentials] {
      Credentials.resolve((env + ("ALPACA_SECRET_KEY" -> "")).get,
        Seq("ALPACA_API_KEY", "ALPACA_SECRET_KEY"))
    }
    assert(blank.missing == Seq("ALPACA_SECRET_KEY"))
    // blank OPTIONAL values are likewise dropped, not forwarded
    assert(Credentials.resolve((env + ("ALPACA_PAPER" -> "")).get,
      Seq("ALPACA_API_KEY"), Seq("ALPACA_PAPER")) ==
      Map("ALPACA_API_KEY" -> "k"))
  }

  test("Slack payloads are well-formed JSON blocks") {
    val summary = Slack.dailySummary("2024-03-04", 1234567.89,
      Seq("AAA" -> 0.031, "BBB" -> 0.012), Seq("CCC" -> -0.02))
    // \r and other control chars ride in real tracebacks (CRLF-sourced
    // text echoed into errors) — the alert path must stay parseable JSON
    val failure = Slack.failure("daily_flow", "RuntimeError",
      "boom\r\n\"quoted\"\tend", "trace\r\n\"q\"\t\u0001line", Some("id\"x"), None)
    val trading = Slack.dailyTradingSummary(
      Seq(Slack.Order("A\"A", "buy", 1.0, 2.0)), Seq(("A\"A", 2.0)), 3.0,
      Some(2.5))
    // must survive a strict JSON parse (use Spark's parser as the oracle)
    import spark.implicits._
    val parsed = Seq(summary, failure, trading).toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("blocks ARRAY<STRUCT<type: STRING>>")).as("p"))
      .collect()
    assert(parsed(0).getStruct(0).getSeq[org.apache.spark.sql.Row](0).nonEmpty)
    assert(parsed(1).getStruct(0).getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      .contains("header"))
    assert(parsed(2).getStruct(0).getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      .count(_ == "section") >= 4, "quote-bearing tickers must stay valid JSON")
    var sent: String = null
    Slack.notify(summary, p => sent = p)
    assert(sent == summary)
  }
}
