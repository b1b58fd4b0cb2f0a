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
    val span = bars.agg(min("timestamp"), max("timestamp")).collect().head
    assert(span.getTimestamp(0).toString.startsWith("2024-03-04 09:00"))
    assert(span.getTimestamp(1).toString.startsWith("2024-03-05 00:59"))
    // deterministic: same seed, same bars
    val again = new FixtureBarSource(42).minuteBars(spark, Seq("AAA"),
      LocalDate.of(2024, 3, 4)).agg(sum("close")).collect().head.getDouble(0)
    val first = bars.filter(col("ticker") === "AAA").agg(sum("close"))
      .collect().head.getDouble(0)
    assert(math.abs(again - first) < 1e-9)
  }

  test("Slack payloads are well-formed JSON blocks") {
    val summary = Slack.dailySummary("2024-03-04", 1234567.89,
      Seq("AAA" -> 0.031, "BBB" -> 0.012), Seq("CCC" -> -0.02))
    val failure = Slack.failure("daily_flow", "boom\n\"quoted\"\tend")
    // must survive a strict JSON parse (use Spark's parser as the oracle)
    import spark.implicits._
    val parsed = Seq(summary, failure).toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("blocks ARRAY<STRUCT<type: STRING>>")).as("p"))
      .collect()
    assert(parsed(0).getStruct(0).getSeq[org.apache.spark.sql.Row](0).nonEmpty)
    assert(parsed(1).getStruct(0).getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      .contains("header"))
    var sent: String = null
    Slack.notify(summary, p => sent = p)
    assert(sent == summary)
  }
}
