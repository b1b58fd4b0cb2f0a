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
  *     (b) bound matches per point (top-k by recency/priority via a
  *     point-keyed window AFTER the bin equi-join — the per-group sort
  *     is bounded by a single point's candidates, not the corpus);
  *     (c) coalesce overlapping same-key intervals first (densifying
  *     intervals usually overlap; a sort + merge per key collapses
  *     them to O(distinct spans)).
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
}
