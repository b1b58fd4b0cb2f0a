package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W10: point-in-time universe reconstruction (reference
  * `pipelines/universe_flow.py:82-134`).
  *
  * The reference walks calendar dates *backward* from the current
  * constituent set, snapshotting membership and then un-applying that
  * date's Added/Removed changes. The sequential walk has a clean
  * relational equivalent — for each (key, date):
  *
  *   - next change strictly after `date` is Added   → NOT a member
  *     (the backward walk discarded it before reaching `date`)
  *   - next change strictly after `date` is Removed → member
  *   - no later change                              → member iff in the
  *     current set
  *
  * Implemented as one union + one window per key (a single shuffle, no
  * driver-side iteration): probe rows (every calendar date × key) and
  * change rows share a per-key sequence ordered so that a probe at date d
  * is followed exactly by the changes with date > d; `first(action)
  * ignoreNulls` over the following frame finds the next change. Scales to
  * arbitrarily many keys/dates — contrast with the reference's in-memory
  * python set walk.
  */
object Universe {

  /** @param changes  (key, date, seq..., action) change log; action values
    *                 "Added"/"Removed"; `seqCols` break ties within a date.
    * @param current  single-column frame of keys in the current set.
    * @param dates    single-column calendar frame of probe dates.
    * @return (date, key) membership rows.
    */
  def pointInTime(
      changes: DataFrame,
      keyCol: String,
      dateCol: String,
      seqCols: Seq[String],
      actionCol: String,
      current: DataFrame,
      dates: DataFrame): DataFrame = {
    val spark = changes.sparkSession

    val chg = changes.select(
      col(keyCol).as("k"), col(dateCol).as("d"), lit(0).as("is_probe"),
      struct(seqCols.map(col): _*).as("seq"), col(actionCol).as("action"))

    val keys = changes.select(col(keyCol).as("k"))
      .unionByName(current.select(col(current.columns.head).as("k")))
      .distinct()
    val probes = dates.select(col(dates.columns.head).as("d"))
      .crossJoin(keys)
      .select(col("k"), col("d"), lit(1).as("is_probe"),
        lit(null).cast(chg.schema("seq").dataType).as("seq"),
        lit(null).cast("string").as("action"))

    // changes of date d sort BEFORE the probe of date d, so a probe's
    // following frame holds only strictly-later changes.
    val w = Window.partitionBy("k")
      .orderBy(col("d"), col("is_probe"), col("seq"))
      .rowsBetween(1, Window.unboundedFollowing)

    val cur = current.select(col(current.columns.head).as("k"))
      .withColumn("is_current", lit(true))

    chg.unionByName(probes)
      .withColumn("next_action", first(col("action"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .join(broadcast(cur), Seq("k"), "left")
      .filter(
        (col("next_action") === "Removed") ||
          (col("next_action").isNull && col("is_current")))
      .select(col("d").as(dateCol), col("k").as(keyCol))
  }
}
