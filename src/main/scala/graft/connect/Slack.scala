package graft.connect

/** S10: Slack notification sink — Block Kit message construction
  * (reference `pipelines/utils/slack.py:8-62`,
  * `slack_daily_summary.py:47-203`, `slack_failure_handler.py:11-103`).
  * The formatting is pure string building at the pipeline edge; the HTTP
  * POST is behind a function so tests capture payloads and production
  * plugs a webhook client. Not a query operator (SURVEY §1.1).
  */
object Slack {

  // ALL control chars must be escaped, not just \n\t: failure() funnels
  // arbitrary exception messages and tracebacks through here, and one raw
  // \r (CRLF-sourced text echoed into an error) would make the payload
  // illegal JSON — losing the alert on the alert path itself
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case '\n' => "\\n"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def header(text: String): String =
    s"""{"type":"header","text":{"type":"plain_text","text":"${esc(text)}"}}"""

  def section(markdown: String): String =
    s"""{"type":"section","text":{"type":"mrkdwn","text":"${esc(markdown)}"}}"""

  /** Two-column field grid section (the reference's summary stats row). */
  def fieldsSection(fields: Seq[String]): String =
    fields.map(f => s"""{"type":"mrkdwn","text":"${esc(f)}"}""")
      .mkString("""{"type":"section","fields":[""", ",", "]}")

  def divider: String = """{"type":"divider"}"""

  def blocks(bs: Seq[String]): String = bs.mkString("""{"blocks":[""", ",", "]}")

  /** Python-format-compatible money/number renderers (`{:,.2f}` etc.) —
    * the golden fixtures depend on grouping commas, so the locale is
    * pinned rather than inherited from the JVM.
    */
  private def money(v: Double): String =
    String.format(java.util.Locale.US, "%,.2f", Double.box(v))
  private def plain2(v: Double): String =
    String.format(java.util.Locale.US, "%.2f", Double.box(v))
  private def signed2(v: Double): String =
    String.format(java.util.Locale.US, "%+.2f", Double.box(v))

  /** Daily trade summary: top weight increases/decreases, equity line —
    * the shape of the reference's daily summary message.
    */
  def dailySummary(
      date: String,
      equity: Double,
      topBuys: Seq[(String, Double)],
      topSells: Seq[(String, Double)]): String = {
    def fmt(rows: Seq[(String, Double)]) =
      rows.map { case (t, w) => f"• $t%s  ${w * 100}%.2f%%" }.mkString("\n")
    blocks(Seq(
      header(s"Portfolio summary — $date"),
      section(f"*Equity:* $$$equity%,.2f"),
      divider,
      section(s"*Top buys*\n${fmt(topBuys)}"),
      section(s"*Top sells*\n${fmt(topSells)}")))
  }

  /** A filled order as the daily summary consumes it (the reference's
    * order dicts carry `filled_qty`/`filled_avg_price`/`notional`;
    * notional = qty x avg price).
    */
  final case class Order(ticker: String, side: String, filledQty: Double,
      filledAvgPrice: Double) {
    def notional: Double = filledQty * filledAvgPrice
  }

  /** Full-fidelity daily trading summary — section-for-section parity
    * with the reference renderer (`slack_daily_summary.py:47-203`):
    * header; a four-field stats grid (portfolio value, day P&L when the
    * previous value is known else trade count, total volume, open
    * positions); buy/sell totals; top-3 buys and sells by notional
    * (rank. qty `TICKER` @ price = notional); top-5 positions by value.
    * Empty order list renders the reference's "No trades executed
    * today" message instead. Pure string building at the pipeline edge;
    * inputs are driver-side lists because every section is a bounded
    * top-k (A9), never corpus data.
    *
    * @param positions (ticker, market value), any order — sorted here,
    *                  descending by value, like `get_current_positions`
    */
  def dailyTradingSummary(
      filledOrders: Seq[Order],
      positions: Seq[(String, Double)],
      accountValue: Double,
      previousAccountValue: Option[Double] = None): String = {
    if (filledOrders.isEmpty)
      return blocks(Seq(section(
        s"✅ *No trades executed today*\n\nPortfolio value: $$${money(accountValue)}")))

    val sortedPos = positions.sortBy(-_._2)
    val top5 = sortedPos.take(5)
    val buys = filledOrders.filter(_.side == "buy")
    val sells = filledOrders.filter(_.side == "sell")
    val topBuys = buys.sortBy(-_.notional).take(3)
    val topSells = sells.sortBy(-_.notional).take(3)
    val totalNotional = filledOrders.map(_.notional).sum

    val dayPnl = accountValue - previousAccountValue.getOrElse(accountValue)
    val pnlField = previousAccountValue match {
      // prev == 0.0 falls through to the trade count: the reference's
      // `if previous_account_value` is Python truthiness, where 0 is
      // falsy — matching on bare Some(0.0) would divide by zero and
      // render an 'Infinity%'/'NaN%' P&L field the reference never emits
      case Some(prev) if prev != 0.0 =>
        s"*Day P&L*\n$$${money(dayPnl)} (${signed2(dayPnl / prev * 100)}%)"
      case _ => s"*Trades Executed*\n${filledOrders.length}"
    }
    val stats = fieldsSection(Seq(
      s"*Portfolio Value*\n$$${money(accountValue)}",
      pnlField,
      s"*Total Volume*\n$$${money(totalNotional)}",
      s"*Positions*\n${positions.length} open"))

    val tradeLines =
      (if (buys.nonEmpty)
         Seq(s"*Buys:* ${buys.length} · $$${money(buys.map(_.notional).sum)}")
       else Nil) ++
      (if (sells.nonEmpty)
         Seq(s"*Sells:* ${sells.length} · $$${money(sells.map(_.notional).sum)}")
       else Nil)

    def tradeSection(title: String, rows: Seq[Order]): Seq[String] =
      if (rows.isEmpty) Nil
      else Seq(section((title +: rows.zipWithIndex.map { case (o, i) =>
        s"${i + 1}. ${plain2(o.filledQty)} `${o.ticker}` @ " +
          s"$$${plain2(o.filledAvgPrice)} = $$${money(o.notional)}"
      }).mkString("\n")))

    val positionBlocks =
      if (top5.isEmpty) Nil
      else Seq(divider, section(
        (s"*Top ${math.min(5, sortedPos.length)} Positions*" +:
          top5.zipWithIndex.map { case ((t, v), i) =>
            s"${i + 1}. `$t`: $$${money(v)}"
          }).mkString("\n")))

    blocks(Seq(header("📊 Daily Trading Summary"), stats, divider) ++
      (if (tradeLines.nonEmpty) Seq(section(tradeLines.mkString("\n")), divider)
       else Nil) ++
      tradeSection("*Top 3 Buys*", topBuys) ++
      tradeSection("*Top 3 Sells*", topSells) ++
      positionBlocks)
  }

  /** [[dailyTradingSummary]] over [[BrokerSource]] frames — collects the
    * (bounded: universe-sized positions, one day of fills) edge inputs
    * and renders; notional = qty x price as in the broker's fill records.
    */
  def dailyTradingSummaryFrames(
      filledOrders: org.apache.spark.sql.DataFrame,
      positions: org.apache.spark.sql.DataFrame,
      accountValue: Double,
      previousAccountValue: Option[Double] = None): String = {
    val orders = filledOrders.select("ticker", "side", "qty", "price")
      .collect()
      .map(r => Order(r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val pos = positions.select("ticker", "market_value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    dailyTradingSummary(orders, pos, accountValue, previousAccountValue)
  }

  /** Failure notification — block-for-block parity with the reference
    * handler (`slack_failure_handler.py:30-90`): header; an error-type +
    * message section; an optional run-id/parameters context section
    * (parameters truncated at 200 chars → first 197 + "..."); a divider;
    * and the traceback in a code block, TAIL-truncated when over 2000
    * chars (the LAST 1950 + "(truncated)" — the tail is where the
    * raising frame lives, so the reference keeps it and drops the head).
    */
  def failure(
      flow: String,
      errorType: String,
      errorMessage: String,
      traceback: String,
      runId: Option[String] = None,
      parameters: Option[String] = None): String = {
    val tb =
      if (traceback.length > 2000) traceback.takeRight(1950) + "\n... (truncated)"
      else traceback
    val contextLines =
      runId.map(id => s"*Run ID:* `$id`").toSeq ++
      parameters.map { p =>
        val ps = if (p.length > 200) p.take(197) + "..." else p
        s"*Parameters:* `$ps`"
      }
    blocks(Seq(
      header(s"🚨 Flow Failed: $flow"),
      section(s"*Error Type:* `$errorType`\n*Error Message:* $errorMessage")) ++
      (if (contextLines.nonEmpty) Seq(section(contextLines.mkString("\n"))) else Nil) ++
      Seq(divider, section("*Traceback:*\n```" + tb + "```")))
  }

  /** [[failure]] from a caught Throwable — renders the class name, the
    * message, and the JVM stack trace (the Scala analogue of the
    * reference's `traceback.format_exception`).
    */
  def failure(flow: String, error: Throwable, runId: Option[String],
      parameters: Option[String]): String = {
    val sw = new java.io.StringWriter()
    error.printStackTrace(new java.io.PrintWriter(sw))
    failure(flow, error.getClass.getSimpleName,
      Option(error.getMessage).getOrElse(""), sw.toString, runId, parameters)
  }

  /** Edge sink: sends via the supplied transport (tests pass a recorder). */
  def notify(payload: String, post: String => Unit): Unit = post(payload)
}
