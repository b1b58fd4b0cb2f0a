package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * Range-partitioning a table on ONE column gives parquet min/max footers
  * that prune scans filtered on that column — and nothing else. Sorting by
  * the interleaved bits of SEVERAL columns places rows so that every file
  * covers a small hyper-rectangle of the combined key space: filters on
  * ANY of the z-columns skip most files (each file spans roughly
  * range^(1/d) of each dimension for d columns). This is the layout trick
  * behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark
  * primitives: an affine [min,max] -> [0, 2^bits) quantization per column
  * (one tiny agg job for the bounds), a bit-interleave expression, and a
  * repartitionByRange + sortWithinPartitions write — everything codegen'd
  * Column algebra, no UDFs.
  *
  * Skew caveat: affine quantization assumes roughly uniform value spread;
  * a heavily skewed column wastes z-resolution on empty ranges (the
  * equi-depth fix is quantizing by rank instead — at the cost of a
  * global sort to learn the quantiles). The TPC-H-ish keys here are
  * uniform, so affine is the right default.
  */
object ZOrder {

  /** Morton value: interleave the low `bits` of each quantized column.
    * `ranges` supplies (min, max) per column — pass precomputed bounds
    * (model state) so the expression stays pure Column algebra.
    */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == ranges.size, "one (min,max) per column")
    require(bits * cols.size <= 63, s"${cols.size} cols x $bits bits exceeds a long")
    val maxQ = (1L << bits) - 1
    val quantized = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val unit = if (hi > lo) (c.cast("double") - lo) / (hi - lo) else lit(0.0)
      // clamp: values outside the sampled range saturate at the ends;
      // a NULL value quantizes to the minimum corner (greatest(null,0)=0)
      // — acceptable for a layout hint, but nulls cluster in bucket 0
      least(greatest(round(unit * maxQ).cast("long"), lit(0L)), lit(maxQ))
    }
    // bit b of column i lands at position b * d + i
    val d = cols.size
    (0 until bits).flatMap { b =>
      quantized.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, b).bitwiseAND(1L), b * d + i)
      }
    }.reduce(_ + _)
  }

  /** Compute bounds and write `df` z-ordered by `zCols` into `numFiles`
    * range-partitioned parquet files at `path`.
    */
  def write(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit = {
    require(!df.columns.contains("_z"),
      "input already has a _z column; rename it before z-ordering")
    val aggCols = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head
    zCols.indices.foreach(i => require(!bounds.isNullAt(2 * i),
      s"cannot z-order: column ${zCols(i)} is empty or all-null"))
    val ranges = zCols.indices.map(i => (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1)))
    val z = zValue(zCols.map(col), ranges, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
