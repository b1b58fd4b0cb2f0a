package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right value
  * whose time is <= the left row's time, per key — the standard way to
  * attach slowly-changing state (prices, loadings, universe membership)
  * to an event stream without lookahead.
  *
  * Union-and-window form, not a join: right rows are tagged and unioned
  * with the left rows, sorted per key by (time, side, tie), and
  * `last(value, ignoreNulls)` over the unbounded-preceding frame carries
  * each right value forward to the left rows that follow it. ONE shuffle
  * by key, no range-join explosion, works at any key cardinality — the
  * plan a range join would need quadratic candidate pruning to match.
  * Right rows sort BEFORE left rows at equal times, so a same-instant
  * observation is visible (inclusive <=).
  */
object AsOf {

  /** @param left      event frame
    * @param right     state frame; must be deduplicated to one row per
    *                  (keys, rightTime) — pass e.g. the max-tie row —
    *                  so "the" latest value is well-defined
    * @param keys      equi-join keys
    * @param leftTime  left event-time column name
    * @param rightTime right observation-time column name
    * @param valueCols right columns to carry onto left rows
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      "right value columns must not collide with left columns")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val lPadded = valueCols.foldLeft(l)((d, c) => d.withColumn(c, lit(null)))
    val r0 = right.select((keys.map(col) :+ col(rightTime).as("_t")) ++
      valueCols.map(col): _*)
      .withColumn("_side", lit(0))
    val rPadded = leftCols.filterNot(c => keys.contains(c))
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null)))

    val unioned = lPadded.unionByName(rPadded.select(lPadded.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).select(leftCols.map(col) ++ valueCols.map(col): _*)
  }
}
