package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY.md §2 against
  * the driver testdata; `oracleSql` holds the equivalent DuckDB SQL.
  *
  * Cross-engine determinism policy (Spark vs DuckDB must hash-match):
  *  - Money/value doubles in the testdata are exactly 2-decimal. Sums are
  *    computed over integer cents (`round(x*100)::bigint`) so aggregation is
  *    exact and order-independent, then divided by 100.0 at the end.
  *  - Small-window (<=252 rows) floating aggregates are rounded to 6 d.p.
  *    on both sides; accumulated error is ~1e-12, far below the rounding.
  *  - Timestamps are emitted as epoch microseconds (BIGINT) to avoid
  *    tz/precision representation differences.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** sum over exact integer cents: order-independent, bit-equal to DuckDB. */
  private def sumCents(c: String): org.apache.spark.sql.Column =
    sum(round(col(c) * 100).cast("long"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A4-style grouped aggregation (SURVEY §2.4) — TPC-H Q1 shape.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sumCents("l_quantity") / 100.0).as("sum_qty"),
          (sumCents("l_extendedprice") / 100.0).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // S1/P1 scan + projection + cast + rename (SURVEY §2.1 S1, §2.2 P1).
    "s1_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey").as("okey"),
          col("l_linenumber").cast("long").as("line_no"),
          to_date(col("l_shipdate")).as("ship_date"))
        .orderBy("okey", "line_no")
    }),

    // J1 broadcast left equi-join big fact x small dim (SURVEY §2.3 J1).
    "j1_broadcast_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      orders
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"), "left")
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          (sumCents("o_totalprice") / 100.0).as("sum_total"))
        .orderBy("mktsegment")
    }),

    // Multi-join star aggregation (SURVEY §2.3 J3-J8 shape at scale).
    "q5_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(
          (sumCents("l_extendedprice") / 100.0).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("region_name", "nation_name")
    }),

    // W1 pct_change per key over time order (SURVEY §2.5 W1).
    "w1_pct_change" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          round(col("value") / lag("value", 1).over(w) - 1, 6).as("pct_change"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // A4/A5 global min/max aggregate (SURVEY §2.4 A4-A5).
    "a4_global_minmax" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        min(to_date(col("o_orderdate"))).as("min_date"),
        max(to_date(col("o_orderdate"))).as("max_date"),
        count(lit(1)).as("n"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(cast(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
        |  sum(cast(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s1_scan_project" ->
      """SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "j1_broadcast_join" ->
      """SELECT c_mktsegment AS mktsegment, count(*) AS n_orders,
        |  sum(cast(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_total
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_star_join" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  sum(cast(round(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w1_pct_change" ->
      """SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |  round(value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1, 6) AS pct_change
        |FROM events ORDER BY 1, 2, 3""".stripMargin,
    "a4_global_minmax" ->
      """SELECT CAST(min(o_orderdate) AS DATE) AS min_date,
        |  CAST(max(o_orderdate) AS DATE) AS max_date, count(*) AS n
        |FROM orders""".stripMargin
  )
}
