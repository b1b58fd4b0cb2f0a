package graft.connect

/** S10: Slack notification sink — Block Kit message construction
  * (reference `pipelines/utils/slack.py:8-62`,
  * `slack_daily_summary.py:47-203`, `slack_failure_handler.py:11-103`).
  * The formatting is pure string building at the pipeline edge; the HTTP
  * POST is behind a function so tests capture payloads and production
  * plugs a webhook client. Not a query operator (SURVEY §1.1).
  */
object Slack {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t")

  def header(text: String): String =
    s"""{"type":"header","text":{"type":"plain_text","text":"${esc(text)}"}}"""

  def section(markdown: String): String =
    s"""{"type":"section","text":{"type":"mrkdwn","text":"${esc(markdown)}"}}"""

  def divider: String = """{"type":"divider"}"""

  def blocks(bs: Seq[String]): String = bs.mkString("""{"blocks":[""", ",", "]}")

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

  /** Failure notification (reference `slack_failure_handler.py`). */
  def failure(flow: String, error: String): String =
    blocks(Seq(
      header(s"Pipeline failure — $flow"),
      section(s"```${error.take(2000)}```")))

  /** Edge sink: sends via the supplied transport (tests pass a recorder). */
  def notify(payload: String, post: String => Unit): Unit = post(payload)
}
