package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window / time-series helpers re-expressing the reference's polars
  * `.over()` idioms (SURVEY.md §2.5) on Catalyst window functions.
  *
  * Everything here stays inside whole-stage codegen: no UDFs, plain
  * built-in window aggregates composed with a null-mask. At 100 TB a
  * window over `partitionBy(key).orderBy(time)` shuffles once by key and
  * sorts within partitions — the same plan shape Spark would pick for any
  * per-key series op; no driver-side iteration anywhere.
  */
object Windows {

  /** Per-key time series window: the reference's `.over("ticker")` with
    * date order (e.g. reference `pipelines/returns_flow.py:14-24`).
    */
  def series(partCols: Seq[String], orderCols: Seq[String]): WindowSpec =
    Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)

  /** polars-style `min_samples = window_size` masking: rolling aggregates
    * emit null until the frame holds `minN` rows (reference
    * `pipelines/reversal_flow.py:20-25`, `factor_model_flow.py:99-101`).
    * Spark windows happily aggregate partial frames, so wrap any windowed
    * aggregate with a row-count mask over the same frame.
    */
  def masked(aggOverFrame: Column, frame: WindowSpec, minN: Int): Column =
    when(count(lit(1)).over(frame) >= minN, aggOverFrame)

  /** A trailing row frame of exactly `n` rows ending at the current row. */
  def trailing(w: WindowSpec, n: Int): WindowSpec = w.rowsBetween(-(n - 1), 0)

  /** Distinct-VALUE spine — the shared core of the round-12 rank
    * decompositions (a13 trimmed stats, w13 ranking suite,
    * `Sampling.capPerGroup`): per (group, value) row counts with the
    * cumulative count of strictly-earlier values in the given order and
    * the group total. A row's global rank within its group then splits
    * into `cum_prev(value) + rank-within-value` — the heavy phase is a
    * map-side-combinable aggregate ∝ rows, the spine window runs over
    * the VALUE DOMAIN (distinct values per group, near-constant as rows
    * grow), and only value-sized tie groups ever sort together. This is
    * what removes the "row_number over a low-cardinality partition"
    * shape, whose parallelism is capped at the group count regardless
    * of cluster size (measured: a13's 3-task sort was 1.2-superlinear
    * and 36× slower at the probe's 100× point — docs/SCALING.md).
    *
    * Output: groupCols ++ (valueCol, cnt, cum_prev, n) ++ one column
    * per `extraAggs` (name, aggregate) entry — e.g. w13 carries each
    * value group's min/max key for lead/lag stitching.
    */
  def valueSpine(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      valueCol: String, ascending: Boolean,
      extraAggs: Seq[(String, Column)] = Seq.empty): org.apache.spark.sql.DataFrame = {
    val ord = if (ascending) col(valueCol).asc else col(valueCol).desc
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val aggs = count(lit(1)).as("cnt") +:
      extraAggs.map { case (nm, c) => c.as(nm) }
    df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(aggs.head, aggs.drop(1): _*)
      .select((groupCols :+ valueCol).map(col) ++ Seq(
        col("cnt"),
        (sum("cnt").over(wCum) - col("cnt")).as("cum_prev"),
        sum("cnt").over(wAll).as("n")) ++
        extraAggs.map { case (nm, _) => col(nm) }: _*)
  }

  /** W1: `pct_change().over(keys)` — null on each key's first row
    * (reference `pipelines/returns_flow.py:14-24`). `try_divide` so a zero
    * previous value yields null (the engine's DuckDB-aligned policy)
    * instead of an ANSI runtime error.
    */
  def pctChange(valueCol: String, w: WindowSpec): Column =
    try_divide(col(valueCol), lag(valueCol, 1).over(w)) - 1

  /** W2: the reversal-signal shape — masked trailing rolling sum of
    * log1p(x), negated (reference `pipelines/reversal_flow.py:20-25`).
    */
  def rollingLog1pSum(valueCol: String, w: WindowSpec, n: Int): Column = {
    val f = trailing(w, n)
    masked(sum(log1p(col(valueCol))).over(f), f, n) * -1
  }

  /** W3: masked trailing rolling sample stddev (reference
    * `pipelines/factor_model_flow.py:99-101`).
    */
  def rollingStd(valueCol: String, w: WindowSpec, n: Int): Column = {
    val f = trailing(w, n)
    masked(stddev_samp(col(valueCol)).over(f), f, n)
  }

  /** W5: masked trailing rolling pairwise sample covariance (reference
    * `pipelines/factor_covariances_flow.py:11-29`).
    */
  def rollingCovar(xCol: String, yCol: String, w: WindowSpec, n: Int): Column = {
    val f = trailing(w, n)
    masked(covar_samp(col(xCol), col(yCol)).over(f), f, n)
  }

  /** Trailing-window aggregation parallelized by OVERLAPPING CHUNKS — the
    * scale path for rolling aggregates over low-cardinality keys (e.g. 25
    * factor pairs, 3 return flags), where `partitionBy(key)` caps
    * parallelism at the key count no matter the cluster size.
    *
    * Rows are numbered per key (cheap serial pass), split into chunks of
    * `chunkRows`, and the last `n-1` rows of each chunk are replicated
    * into the next so every chunk computes its trailing frames
    * independently; replicas are dropped after aggregating. Output is
    * row-identical to the single-partition form (the min-samples mask
    * composes: a chunk's first kept row always sees a full frame except in
    * chunk 0, where chunk-local position equals global position).
    *
    * `agg` receives the chunk-scoped trailing frame and must build the
    * (masked) aggregate over it, e.g.
    * `f => Windows.masked(covar_samp(col("x"), col("y")).over(f), f, n)`.
    */
  def chunkedRolling(
      df: org.apache.spark.sql.DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String],
      n: Int,
      chunkRows: Int,
      outCol: String)(agg: WindowSpec => Column): org.apache.spark.sql.DataFrame = {
    require(chunkRows >= n, "chunkRows must be at least the window size")
    require(!Seq("_rn", "_a", "_c", "_keep", outCol).exists(df.columns.contains),
      "input must not already contain _rn/_a/_c/_keep or the output column")
    // single numbering pass (the serial per-key bottleneck this function
    // mitigates — do not run it twice): each row explodes into its own
    // chunk plus, for the trailing n-1 rows of a chunk, a replica in the
    // next chunk
    val c = ((col("_rn") - 1) / chunkRows).cast("long")
    val isOverlap = (col("_rn") - 1) % chunkRows >= chunkRows - (n - 1)
    val assignments = when(isOverlap,
        array(struct(c.as("_c"), lit(true).as("_keep")),
          struct((c + 1).as("_c"), lit(false).as("_keep"))))
      .otherwise(array(struct(c.as("_c"), lit(true).as("_keep"))))
    val chunked = df
      .withColumn("_rn", row_number().over(series(partCols, orderCols)))
      .withColumn("_a", explode(assignments))
      .withColumn("_c", col("_a._c"))
      .withColumn("_keep", col("_a._keep"))
      .drop("_a")
    val wChunk = Window
      .partitionBy((partCols :+ "_c").map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), 0)
    chunked
      .withColumn(outCol, agg(wChunk))
      .filter(col("_keep"))
      .drop("_rn", "_c", "_keep")
  }

  /** A6: global (whole-frame) z-score — the reference's cross-sectional
    * score (`pipelines/reversal_flow.py:39-42`; deliberately NOT per-date,
    * see SURVEY.md §2.4 A6). Mean/std come in exactly over integer-scaled
    * values when `scale` is set, keeping the result engine-deterministic.
    *
    * Implemented as an unpartitioned window rather than a crossJoin with
    * an agg: Catalyst compiles both to a two-pass plan; at scale prefer
    * computing the two scalars once and broadcasting, which is what a
    * single-partition window over an already-aggregated frame does.
    */
  def zscoreGlobal(df: org.apache.spark.sql.DataFrame, valueCol: String, outCol: String)
      : org.apache.spark.sql.DataFrame = {
    val stats = df.agg(
      avg(col(valueCol)).as("_mu"),
      stddev_samp(col(valueCol)).as("_sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, try_divide(col(valueCol) - col("_mu"), col("_sigma")))
      .drop("_mu", "_sigma")
  }

  /** A7/W9: cross-sectional equal weight 1/N per partition (reference
    * `pipelines/benchmark_flow.py:16`).
    */
  def equalWeight(partCols: Seq[String]): Column =
    lit(1.0) / count(lit(1)).over(Window.partitionBy(partCols.map(col): _*))
}
