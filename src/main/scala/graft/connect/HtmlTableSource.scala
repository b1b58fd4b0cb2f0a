package graft.connect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: HTML-table web source. The reference scrapes two Wikipedia tables
  * (current S&P 500 constituents + change log) with requests+pandas
  * (`pipelines/universe_flow.py:15-35`). The engine models this as a
  * driver-side fetch+parse that lands a DataFrame; production would plug
  * an HTTP client, tests parse fixture HTML (zero-egress environment).
  *
  * The parser is a small tag scanner covering the static-table subset the
  * reference consumes: `<table>`, `<tr>`, `<th>`/`<td>`, nested markup
  * stripped, entities unescaped. Multi-row headers collapse like the
  * reference's pandas `droplevel` + lowercase/underscore rename
  * (`universe_flow.py:59-75`, SURVEY §2.7 R6).
  */
object HtmlTableSource {

  private val TablePat = "(?s)<table[^>]*>(.*?)</table>".r
  private val RowPat = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val CellPat = "(?s)<t[hd][^>]*>(.*?)</t[hd]>".r

  private def clean(cell: String): String =
    cell.replaceAll("(?s)<[^>]*>", "")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&nbsp;", " ").replace("&#160;", " ")
      .trim

  /** All tables in the document as (header, rows). */
  def parseTables(html: String): Seq[(Seq[String], Seq[Seq[String]])] =
    TablePat.findAllMatchIn(html).map { t =>
      val rows = RowPat.findAllMatchIn(t.group(1))
        .map(r => CellPat.findAllMatchIn(r.group(1)).map(c => clean(c.group(1))).toSeq)
        .filter(_.nonEmpty).toSeq
      val header = rows.headOption.getOrElse(Seq.empty)
        .map(h => h.toLowerCase.replaceAll("[^a-z0-9]+", "_").stripSuffix("_"))
      (header, rows.drop(1).filter(_.size == header.size))
    }.toSeq

  /** n-th table as a string-typed DataFrame with normalized column names. */
  def table(spark: SparkSession, html: String, index: Int): DataFrame = {
    val (header, rows) = parseTables(html)(index)
    val schema = org.apache.spark.sql.types.StructType(
      header.map(h => org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
    val list = new java.util.ArrayList[org.apache.spark.sql.Row](rows.size)
    rows.foreach(r => list.add(org.apache.spark.sql.Row.fromSeq(r)))
    spark.createDataFrame(list, schema)
  }
}
