package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: interleaves bits; orders 2-d space locally") {
    // 2 cols x 2 bits: quantized corners map to distinct interleaves
    val ranges = Seq((0.0, 3.0), (0.0, 3.0))
    val df = Seq((0, 0), (3, 0), (0, 3), (3, 3)).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), ranges, 2))
    val z = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(z((0, 0)) == 0L)
    assert(z((3, 0)) == 5L)  // x bits at positions 0,2 -> 0b0101
    assert(z((0, 3)) == 10L) // y bits at positions 1,3 -> 0b1010
    assert(z((3, 3)) == 15L)
  }

  test("z-ordered layout bounds per-file ranges in BOTH dimensions") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val n = 1 << 14
    // uniform 2-d grid in shuffled-by-hash order (no natural clustering)
    val df = (0 until n).map { i =>
      val h = Integer.reverse(i) >>> 18 // deterministic scramble
      (h % 128, (i % 128), i.toLong)
    }.toDF("x", "y", "id")
    ZOrder.write(df, s"$dir/z", Seq("x", "y"), numFiles = 16)

    // per-FILE min/max spread of both z-columns, exactly what parquet
    // footer pruning sees
    val spreads = spark.read.parquet(s"$dir/z")
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg(((max(col("x")) - min(col("x"))) / 127.0).as("sx"),
        ((max(col("y")) - min(col("y"))) / 127.0).as("sy"))
      .collect()
    assert(spreads.length == 16)
    val avgX = spreads.map(_.getDouble(1)).sum / spreads.length
    val avgY = spreads.map(_.getDouble(2)).sum / spreads.length
    // 16 files over a 2-d morton curve -> each covers ~1/16 of the area,
    // i.e. ~1/4 of each side; allow slack but both must be well under the
    // full-width 1.0 a single-column sort would leave on the other dim
    assert(avgX < 0.6, s"x spread $avgX")
    assert(avgY < 0.6, s"y spread $avgY")
    // and rows within a file really are morton-contiguous: a point filter
    // on both dims touches few files
    val hit = spark.read.parquet(s"$dir/z")
      .filter(col("x") === 5 && col("y") === 7)
      .select(input_file_name()).distinct().count()
    assert(hit <= 4, s"point filter touched $hit of 16 files")
  }
}
