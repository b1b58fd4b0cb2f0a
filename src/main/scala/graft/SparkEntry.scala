package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.RollingOls
import graft.catalog.Tables
import graft.expr.{Ewma, Windows}

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
    }),

    // W2 masked rolling log1p-sum, negated — the reversal-signal shape.
    "w2_reversal_signal" -> ((s, dir) => {
      val w = Windows.series(Seq("user_id"), Seq("ts", "event_id"))
      t(s, dir, "events").select(
        col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(Windows.rollingLog1pSum("value", w, 21), 6).as("signal"))
    }),

    // W3 masked rolling sample stddev.
    "w3_rolling_std" -> ((s, dir) => {
      val w = Windows.series(Seq("user_id"), Seq("ts", "event_id"))
      t(s, dir, "events").select(
        col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(Windows.rollingStd("value", w, 21), 6).as("roll_std"))
    }),

    // W5 masked rolling pairwise sample covariance.
    "w5_rolling_covar" -> ((s, dir) => {
      val w = Windows.series(Seq("l_returnflag"),
        Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"))
      t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(Windows.rollingCovar("l_quantity", "l_extendedprice", w, 21), 4).as("roll_cov"))
    }),

    // W4 EWMA (half-life 60, adjust=true) — custom per-key streaming fold.
    "w4_ewma" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Ewma.ewmaMean(ev, Seq("user_id"), Seq("ts", "event_id"), "value", 60.0, "ewma")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          round(col("ewma"), 6).as("ewma"))
    }),

    // W7 rolling single-factor OLS (window 63) on integer-scaled values.
    "w7_rolling_beta" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      RollingOls.fit(li, Seq("l_suppkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber", "y", "x"), "y", Seq("x"), 63)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(col("alpha") / 100.0, 6).as("alpha"),
          round(col("beta_x") / 100.0, 6).as("beta"))
    }),

    // W6 rolling multivariate OLS (2 regressors + intercept, window 252).
    "w6_rolling_ols" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("z"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      RollingOls.fit(li, Seq("l_suppkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber", "y", "x"), "y", Seq("x", "z"), 252)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(col("alpha") / 100.0, 6).as("alpha"),
          round(col("beta_x") / 100.0, 6).as("beta_x"),
          round(col("beta_z") / 100.0, 6).as("beta_z"))
    }),

    // A6 global (whole-frame) z-score, exact integer-cents moments.
    "a6_global_zscore" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("decimal(19,0)"))
      val stats = o.agg(
        sum(col("cents")).cast("double").as("_s"),
        sum(col("cents") * col("cents")).cast("double").as("_ss"),
        count(lit(1)).cast("double").as("_n"))
      o.crossJoin(broadcast(stats))
        .select(col("o_orderkey"),
          round((col("cents").cast("double") - col("_s") / col("_n")) /
            sqrt((col("_ss") - col("_s") * col("_s") / col("_n")) / (col("_n") - 1)), 6)
            .as("zscore"))
    }),

    // A7/W9 cross-sectional equal weight 1/N per date partition.
    "a7_equal_weight" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"), to_date(col("o_orderdate")).as("odate"),
        Windows.equalWeight(Seq("o_orderdate")).as("weight"))
    }),

    // W11/O2 sort desc + head(n) with deterministic tie-breaks.
    "w11_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
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
        |FROM orders""".stripMargin,
    "w2_reversal_signal" ->
      """SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |  round((CASE WHEN count(*) OVER win >= 21 THEN sum(ln(1+value)) OVER win END) * -1, 6) AS signal
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w3_rolling_std" ->
      """SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |  round(CASE WHEN count(*) OVER win >= 21 THEN stddev_samp(value) OVER win END, 6) AS roll_std
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w5_rolling_covar" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  round(CASE WHEN count(*) OVER win >= 21 THEN covar_samp(l_quantity, l_extendedprice) OVER win END, 4) AS roll_cov
        |FROM lineitem
        |WINDOW win AS (PARTITION BY l_returnflag ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w4_ewma" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS DOUBLE) AS rn
        |  FROM events)
        |SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |  round(sum(value * power(0.9885140203528962, -rn)) OVER win
        |        / sum(power(0.9885140203528962, -rn)) OVER win, 6) AS ewma
        |FROM s
        |WINDOW win AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "w7_rolling_beta" ->
      """WITH s AS (
        |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |    CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS y
        |  FROM lineitem),
        |w AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    count(*) OVER win AS cnt,
        |    CAST(sum(x) OVER win AS DOUBLE) AS sx,
        |    CAST(sum(y) OVER win AS DOUBLE) AS sy,
        |    CAST(sum(x*x) OVER win AS DOUBLE) AS sxx,
        |    CAST(sum(x*y) OVER win AS DOUBLE) AS sxy
        |  FROM s
        |  WINDOW win AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, y, x ROWS BETWEEN 62 PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, cnt, sx, sy,
        |    (63.0*sxy - sx*sy) / (63.0*sxx - sx*sx) AS beta
        |  FROM w)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CASE WHEN cnt = 63 THEN round(((sy - beta*sx)/63.0)/100.0, 6) END AS alpha,
        |  CASE WHEN cnt = 63 THEN round(beta/100.0, 6) END AS beta
        |FROM c""".stripMargin,
    "w6_rolling_ols" ->
      """WITH s AS (
        |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |    CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_discount*100) AS BIGINT) AS z,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS y
        |  FROM lineitem),
        |w AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    count(*) OVER win AS cnt,
        |    CAST(sum(x) OVER win AS DOUBLE) AS sx0,
        |    CAST(sum(z) OVER win AS DOUBLE) AS sx1,
        |    CAST(sum(y) OVER win AS DOUBLE) AS b0,
        |    CAST(sum(x*x) OVER win AS DOUBLE) AS s00,
        |    CAST(sum(x*z) OVER win AS DOUBLE) AS s01,
        |    CAST(sum(z*z) OVER win AS DOUBLE) AS s11,
        |    CAST(sum(x*y) OVER win AS DOUBLE) AS b1,
        |    CAST(sum(z*y) OVER win AS DOUBLE) AS b2
        |  FROM s
        |  WINDOW win AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, y, x ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, cnt,
        |    252.0*(s00*s11 - s01*s01) - sx0*(sx0*s11 - s01*sx1) + sx1*(sx0*s01 - s00*sx1) AS det,
        |    b0*(s00*s11 - s01*s01) - sx0*(b1*s11 - s01*b2) + sx1*(b1*s01 - s00*b2) AS det0,
        |    252.0*(b1*s11 - s01*b2) - b0*(sx0*s11 - s01*sx1) + sx1*(sx0*b2 - b1*sx1) AS det1,
        |    252.0*(s00*b2 - b1*s01) - sx0*(sx0*b2 - b1*sx1) + b0*(sx0*s01 - s00*sx1) AS det2
        |  FROM w)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CASE WHEN cnt = 252 THEN round((det0/det)/100.0, 6) END AS alpha,
        |  CASE WHEN cnt = 252 THEN round((det1/det)/100.0, 6) END AS beta_x,
        |  CASE WHEN cnt = 252 THEN round((det2/det)/100.0, 6) END AS beta_z
        |FROM c""".stripMargin,
    "a6_global_zscore" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice*100) AS HUGEINT) AS cents FROM orders),
        |st AS (
        |  SELECT CAST(sum(cents) AS DOUBLE) AS s, CAST(sum(cents*cents) AS DOUBLE) AS ss,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM o)
        |SELECT o_orderkey,
        |  round((CAST(cents AS DOUBLE) - s/n) / sqrt((ss - s*s/n)/(n - 1)), 6) AS zscore
        |FROM o, st""".stripMargin,
    "a7_equal_weight" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  1.0/count(*) OVER (PARTITION BY o_orderdate) AS weight
        |FROM orders""".stripMargin,
    "w11_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  )
}
