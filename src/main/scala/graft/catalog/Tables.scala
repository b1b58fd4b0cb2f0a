package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → DataFrame loader over the driver-generated testdata directory
  * (TESTDATA.md). One parquet file per table; schemas come from parquet
  * footers (written by the driver, stable).
  *
  * Mirrors the reference's lakehouse table-scan entry point
  * (`bear_lake_client.table(name)` — reference `pipelines/utils/data.py:13`):
  * a lazy scan that Catalyst then prunes/pushes into. At 100 TB the same
  * call pattern works unchanged — `spark.read.parquet` over a partitioned
  * directory; filters on partition columns prune directories, predicates
  * reach parquet row groups.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as a nanos long and truncate to micros
      // (identical to DuckDB's CAST(ts AS TIMESTAMP) behavior).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
