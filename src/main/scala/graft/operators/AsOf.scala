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
    require(!Seq("_t", "_side", "_vals").exists(c =>
      leftCols.contains(c) || valueCols.contains(c)),
      "input must not already contain the internal _t/_side/_vals columns")
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)

    // the right row travels as ONE struct, so (a) a null field in the
    // latest observation is carried as that null (never replaced by an
    // older non-null — ignoreNulls applies to the struct, which is
    // non-null for every right row), and (b) one output row can never mix
    // fields from different right rows
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_vals",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(valueCols.map(col): _*).schema.fields)))
    val r0 = right
      // equi-join semantics: null keys never match, so null-key state rows
      // contribute nothing
      .filter(keyNotNull)
      .select((keys.map(col) :+ col(rightTime).as("_t")) ++
        Seq(struct(valueCols.map(col): _*).as("_vals")): _*)
      .withColumn("_side", lit(0))
    val rPadded = leftCols.filterNot(c => keys.contains(c))
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null)))

    val unioned = l.unionByName(rPadded.select(l.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("_vals",
        // null-key left rows match nothing, as in an equi-join
        when(keyNotNull, last(col("_vals"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
    valueCols.foldLeft(carried)((d, c) => d.withColumn(c, col(s"_vals.$c")))
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }
}
