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
