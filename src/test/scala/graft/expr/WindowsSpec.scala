package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("pctChange: null on first row per key, ratio-1 after") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 110.0), ("a", 3, 99.0), ("b", 1, 50.0))
      .toDF("key", "i", "close")
    val w = Windows.series(Seq("key"), Seq("i"))
    val out = df.select(col("key"), col("i"), Windows.pctChange("close", w).as("r"))
      .orderBy("key", "i").collect()
    assert(out(0).isNullAt(2))
    assert(math.abs(out(1).getDouble(2) - 0.10) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - (99.0 / 110.0 - 1)) < 1e-12)
    assert(out(3).isNullAt(2))
  }

  test("masked rolling: null until the frame holds n rows (polars min_samples)") {
    val df = (1 to 6).map(i => ("k", i, 1.0)).toDF("key", "i", "x")
    val w = Windows.series(Seq("key"), Seq("i"))
    val f = Windows.trailing(w, 3)
    val out = df.select(col("i"), Windows.masked(sum("x").over(f), f, 3).as("s"))
      .orderBy("i").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    (2 until 6).foreach(i => assert(out(i).getDouble(1) == 3.0))
  }

  test("rollingStd matches sample std (ddof=1)") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("key", "i", "x")
    val w = Windows.series(Seq("key"), Seq("i"))
    val out = df.select(col("i"), Windows.rollingStd("x", w, 8).as("s"))
      .orderBy("i").collect()
    (0 until 7).foreach(i => assert(out(i).isNullAt(1)))
    val mean = xs.sum / 8
    val expect = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / 7)
    assert(math.abs(out(7).getDouble(1) - expect) < 1e-12)
  }

  test("zscoreGlobal standardizes over the WHOLE frame, not per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "x")
    val out = Windows.zscoreGlobal(df, "x", "z").orderBy("x").collect()
    val mu = 2.5
    val sd = math.sqrt(Seq(1.0, 2, 3, 4).map(x => (x - mu) * (x - mu)).sum / 3)
    Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(out(i).getDouble(2) - (x - mu) / sd) < 1e-12)
    }
  }

  test("equalWeight: 1/N per partition, sums to 1") {
    val df = Seq(("d1", "t1"), ("d1", "t2"), ("d1", "t3"), ("d2", "t1"))
      .toDF("date", "ticker")
    val out = df.select(col("date"), Windows.equalWeight(Seq("date")).as("w"))
    val sums = out.groupBy("date").agg(sum("w").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(sums("d1") - 1.0) < 1e-12 && math.abs(sums("d2") - 1.0) < 1e-12)
  }

  test("chunkedRolling equals the single-partition rolling form exactly") {
    val rnd = new scala.util.Random(23)
    val df = (for (k <- Seq("a", "b", "c"); i <- 0 until 100)
      yield (k, i, rnd.nextDouble() * 10, rnd.nextDouble() * 100))
      .toDF("k", "i", "x", "y")
    val n = 5
    val w = Windows.series(Seq("k"), Seq("i"))
    val plain = df
      .withColumn("v", round(Windows.rollingCovar("x", "y", w, n), 9))
      .select("k", "i", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    // chunkRows = 7 stresses many chunk boundaries incl. a partial tail
    val chunked = Windows.chunkedRolling(df, Seq("k"), Seq("i"), n, 7, "v")(f =>
        round(Windows.masked(covar_samp(col("x"), col("y")).over(f), f, n), 9))
      .select("k", "i", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2))).toMap
    assert(chunked.size == plain.size)
    plain.foreach { case (key, v) => assert(chunked(key) == v, s"$key") }
  }
}
