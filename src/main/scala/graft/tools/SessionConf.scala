package graft.tools

import org.apache.spark.sql.SparkSession

/** Runtime-SQL-conf hygiene for multi-query harnesses.
  *
  * Some operators carry an executable sizing rule that SETS a session
  * conf (e.g. [[graft.operators.RangeJoin.sizeSweepFold]] sizing the
  * object-hash-aggregate fallback threshold to the point count) — the
  * Spark-idiomatic way to tune a plan, but session confs outlive the
  * query that set them. A sweep harness timing 100+ queries in one
  * session must not let one query's tuning silently re-plan its
  * neighbors, so Bench / Verify / ScaleProbe run every query inside
  * [[restoring]]: any runtime conf the query added is unset and any it
  * changed is set back, leaving the session exactly as found.
  */
object SessionConf {

  /** Runs `f`, then restores every runtime SQL conf `f` changed or
    * added. Only MUTATED keys are touched (a changed key proved itself
    * modifiable, so the restore cannot hit a static-conf error).
    */
  def restoring[T](spark: SparkSession)(f: => T): T = {
    val before = spark.conf.getAll
    try f
    finally {
      val after = spark.conf.getAll
      after.keysIterator.filterNot(before.contains).foreach(spark.conf.unset)
      before.foreach { case (k, v) =>
        if (!after.get(k).contains(v)) spark.conf.set(k, v)
      }
    }
  }
}
