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
    * replacing any previous layout: DROP TABLE removes only the metadata
    * of an external table, and CTAS refuses a non-empty location, so the
    * old files must be deleted too for the write to be re-runnable.
    */
  def write(df: DataFrame, table: String, path: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
