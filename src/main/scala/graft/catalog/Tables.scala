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
      // events.ts has been written two ways across driver generations:
      // TIMESTAMP(NANOS), which Spark's vectorized reader rejects (read
      // as a nanos long and truncate to micros — identical to DuckDB's
      // CAST(ts AS TIMESTAMP)), and plain TIMESTAMP(MICROS) with no
      // timezone, which Spark reads as TIMESTAMP_NTZ. Normalize BOTH to
      // session-tz TimestampType (session is pinned UTC, so the NTZ cast
      // is value-identity) so every downstream consumer — window specs,
      // the streaming Event encoder's java.sql.Timestamp field, oracle
      // comparisons — sees one stable type regardless of data vintage.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
