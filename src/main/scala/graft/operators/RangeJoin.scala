package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi interval joins re-expressed as bin-bucketed equi-joins.
  *
  * A naive point-in-interval join is a cross product with a range filter
  * (BroadcastNestedLoopJoin at best) — O(|points| x |intervals|) and
  * unshardable. Bucketing by fixed-width time bins turns it into a hash
  * join: each point lands in exactly one bin, each interval replicates to
  * the bins it overlaps, and the bin equi-join plus an exact containment
  * filter reproduces the pair set with no cross product. Work scales with
  * |points| + |intervals| x (avg interval span / bin width) + true match
  * count, every stage a linear scan or hash shuffle — the standard
  * 100 TB-safe shape for temporal containment. Pick `binDays` near the
  * median interval length: wider bins inflate the filter's false-candidate
  * rate, narrower bins inflate interval replication.
  *
  * ==Which growth regime are you in? (read before scaling this up)==
  * The plan above is linear in INPUT — but the OUTPUT is the true match
  * count, and that is a property of the workload, measured both ways at
  * 1x-100x in docs/SCALING.md:
  *   - '''Date-extended growth''' (new data arrives with new dates, the
  *     time axis stretches; per-point interval multiplicity constant):
  *     this plan is flat-to-linear end to end (measured top segment
  *     0.80 at 100x). Time-series data at 100 TB grows this way; no
  *     action needed.
  *   - '''Densification''' (interval COUNT grows inside a fixed time
  *     window): every point matches ~N intervals, so output pairs grow
  *     ~N^2 — no join plan can beat the size of its own output
  *     (measured: 217s at 100x, exponent 2.09 over the top segment —
  *     the same class as an all-pairs similarity join). Diagnose by
  *     trending `output rows / points`: if it grows with volume, you
  *     are here, and the cure is to shrink the OUTPUT, not the join:
  *     (a) if downstream only needs per-point aggregates over matching
  *     intervals, aggregate per (`_bin`-granularity) group before the
  *     containment filter fans out — reduction below the pair blowup;
  *     (b) bound matches per point — [[pointInIntervalTopK]], output
  *     ≤ k·points by construction (top-k by recency/priority via a
  *     point-keyed window AFTER the bin equi-join — the per-group sort
  *     is bounded by a single point's candidates, not the corpus);
  *     (c) coalesce overlapping same-key intervals first —
  *     [[coalesceIntervals]] (densifying intervals usually overlap;
  *     the join then sees O(distinct spans)).
  */
object RangeJoin {

  private val epoch = to_date(lit("1970-01-01"))

  /** Join `points` (date column `ptCol`) to `intervals` (date columns
    * `loCol`..`hiCol`, inclusive) on containment. Column names of the two
    * inputs must be disjoint; `_bin` is reserved.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, binDays: Int): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"point/interval column names collide: $overlap")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "_bin is reserved by pointInInterval")
    val pb = points.withColumn("_bin",
      floor(datediff(col(ptCol), epoch) / binDays))
    val ib = intervals
      .filter(col(hiCol) >= col(loCol)) // empty intervals match nothing
      .withColumn("_bin", explode(sequence(
        floor(datediff(col(loCol), epoch) / binDays),
        floor(datediff(col(hiCol), epoch) / binDays))))
    pb.join(ib, Seq("_bin"))
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("_bin")
  }

  /** Densification cure (b), executable: the containment join capped at
    * the `k` best-ranked intervals per point (ordered by `rank`
    * ascending, interval start/end as deterministic tie-breaks), so
    * OUTPUT is ≤ k·|points| no matter how densely intervals pile into
    * the window — the bound that keeps the ×N-intervals regime from
    * handing a quadratic row count to everything downstream (measured
    * in docs/SCALING.md).
    *
    * Scale shape: points are REPARTITIONED by the point key BEFORE the
    * bin equi-join (the interval side broadcasts, so the join preserves
    * that partitioning), and the `row_number ≤ k` window then reuses it
    * — no exchange of the joined candidate stream, ever, and the
    * per-task window sort is the candidate stream ÷ shuffle partitions
    * rather than ÷ input splits. That division is the load-bearing
    * part: a scaled corpus packed into few parquet splits would
    * otherwise funnel the whole candidate enumeration through a
    * handful of pre-exchange sorts (measured: 12.7 GB of sort spill and
    * an executor OOM at 30× before this repartition; `PlanAuditSpec`
    * pins the exchange-free join→window span). Per-task sort input
    * still grows with per-point match density — inherent to
    * enumerate-then-cap; [[pointInIntervalTopKSweep]] is the
    * densification-regime path that never materializes the enumeration.
    *
    * `idCols` must uniquely key `points` rows (the per-point cap is
    * per KEY; duplicate keys would share one budget).
    */
  def pointInIntervalTopK(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, binDays: Int,
      idCols: Seq[String], rank: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(idCols.nonEmpty, "idCols must name the point key")
    // broadcast is the premise of the exchange-free shape: a shuffled
    // bin join would partition by _bin (few groups under a fixed date
    // window) AND break the point-key partitioning the window reuses
    val joined = pointInInterval(points.repartition(idCols.map(col): _*),
      broadcast(intervals), ptCol, loCol, hiCol, binDays)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCols.map(col): _*)
      .orderBy(rank.asc, col(loCol).asc, col(hiCol).asc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Densification cure (c), executable: collapse overlapping (or
    * `gapDays`-adjacent) same-key intervals to their merged spans —
    * densifying intervals usually overlap, and feeding the containment
    * join O(distinct spans) instead of O(intervals) removes the pile-up
    * at the source. Classic sweep: per key, sort by start, a new span
    * starts where `lo` exceeds the running max of `hi` (+gap), then
    * group to (min lo, max hi, count).
    *
    * Scale shape: one shuffle by key, per-key sort windows (key
    * cardinality = the join key — users/instruments — so group counts
    * scale with data while each group's sort stays bounded by that
    * key's interval count; a single-key corpus would serialize, which
    * is the inherent shape of merging ONE key's overlapping spans).
    *
    * @return `keyCols` + (`loCol`, `hiCol`, `n_merged`), one row per
    *         merged span.
    */
  def coalesceIntervals(intervals: DataFrame, keyCols: Seq[String],
      loCol: String, hiCol: String, gapDays: Int = 0): DataFrame = {
    require(gapDays >= 0, "gapDays must be non-negative")
    require(keyCols.nonEmpty, "keyCols must name the merge key")
    val keyed = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val byStart = keyed.orderBy(col(loCol).asc, col(hiCol).asc)
    intervals
      .filter(col(hiCol) >= col(loCol))
      // running max of hi over PRECEDING rows only: a row opens a new
      // span iff its lo clears every earlier interval's reach (+gap)
      .withColumn("_reach", max(col(hiCol)).over(
        byStart.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .withColumn("_new", when(col("_reach").isNull or
        (datediff(col(loCol), col("_reach")) > gapDays), 1L).otherwise(0L))
      .withColumn("_span", sum(col("_new")).over(
        byStart.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("_span")): _*)
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol),
        count(lit(1)).as("n_merged"))
      .drop("_span")
  }
}
