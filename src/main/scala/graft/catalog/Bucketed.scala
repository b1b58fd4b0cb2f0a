package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * A recurring big×big equi-join (e.g. universe ⟕ facts on (date,ticker),
  * reference `utils/data.py:23-29`) shuffles both sides every run. Writing
  * both sides bucketed and sorted by the join key pays that shuffle once
  * at write time; every later join between them plans as an Exchange-less
  * SortMergeJoin — the standard way to amortize a 100 TB fact-fact join
  * across the queries that reuse it. Bucket counts must match on both
  * sides (Spark requires it to line partitions up).
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted table at `path`,
    * replacing any previous layout. Two-phase: the frame is fully
    * materialized into a staging directory BEFORE the old files are
    * touched, so `df` may itself read from `path` (re-bucketing a table
    * from its own files) and a failed write never destroys the previous
    * layout. Afterwards the staging dir moves into place and the final
    * table metadata is recreated via CREATE TABLE LIKE (which copies the
    * bucket spec).
    *
    * Crash recovery: if the process dies between the final DROP and
    * CREATE, the data files are intact at `path` (or `path + "__old"`)
    * but the `table` catalog entry is missing — re-running `write`, or a
    * manual `CREATE TABLE table LIKE table__staging LOCATION path`,
    * restores it. A swap failure that raises instead of crashing
    * self-heals in the catch below when the new files reached `path`;
    * when the old files were restored the table entry is intentionally
    * left absent (their bucket spec may not match this call's), so
    * recovery is the same re-run or manual CREATE.
    */
  def write(df: DataFrame, table: String, path: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val staging = table + "__staging"
    val stagingPath = path + "__staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    Fs.deleteRecursively(java.nio.file.Paths.get(stagingPath))

    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", stagingPath)
      .saveAsTable(staging) // materializes df — the old layout is still intact

    // swap: move the old layout ASIDE (not delete) so a failure mid-swap
    // can restore it; only after the new layout is in place do the old
    // files go away
    val p = java.nio.file.Paths.get(path)
    val old = java.nio.file.Paths.get(path + "__old")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Fs.deleteRecursively(old)
    val hadOld = java.nio.file.Files.exists(p)
    if (hadOld) java.nio.file.Files.move(p, old)
    try {
      java.nio.file.Files.move(java.nio.file.Paths.get(stagingPath), p)
      spark.sql(s"CREATE TABLE $table LIKE $staging LOCATION '$path'")
    } catch {
      case e: Throwable =>
        val restoredOld = hadOld && !java.nio.file.Files.exists(p)
        if (restoredOld) java.nio.file.Files.move(old, p)
        // the DROP above already removed $table's catalog entry. Recreate
        // it ONLY when the NEW files landed at `path` (the staging spec
        // is exactly their spec); if the OLD files were restored, their
        // bucket spec may differ from staging's, and a wrong spec over
        // restored files would silently corrupt Exchange-less joins —
        // fail loud (table absent) instead, recovery per the scaladoc.
        if (!restoredOld && java.nio.file.Files.exists(p)) {
          try spark.sql(s"CREATE TABLE IF NOT EXISTS $table LIKE $staging LOCATION '$path'")
          catch { case _: Throwable => () }
        }
        throw e
    }
    spark.sql(s"DROP TABLE $staging")
    Fs.deleteRecursively(old)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
