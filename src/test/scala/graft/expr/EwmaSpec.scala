package graft.expr

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def runEwma(xs: Seq[java.lang.Double], halfLife: Double): Seq[Option[Double]] = {
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("key", "i", "x")
    Ewma.ewmaMean(df, Seq("key"), Seq("i"), "x", halfLife, "ewma")
      .orderBy("i").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3))).toSeq
  }

  test("ewma of a constant series is the constant") {
    val out = runEwma(Seq[java.lang.Double](5.0, 5.0, 5.0, 5.0), 60.0)
    out.foreach(v => assert(math.abs(v.get - 5.0) < 1e-12))
  }

  test("ewma matches the adjust=true closed form (polars semantics)") {
    // y_t = sum_i (1-a)^i x_{t-i} / sum_i (1-a)^i,  a = 1-exp(-ln2/h)
    val h = 2.0
    val d = 1.0 - Ewma.alphaFromHalfLife(h) // decay
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val expected = xs.indices.map { t =>
      val ws = (0 to t).map(i => math.pow(d, i))
      (0 to t).map(i => ws(i) * xs(t - i)).sum / ws.sum
    }
    val out = runEwma(xs.map(java.lang.Double.valueOf), h)
    out.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got.get - exp) < 1e-12, s"got $got expected $exp")
    }
  }

  test("half-life semantics: weight at lag h is half the weight at lag 0") {
    val d = 1.0 - Ewma.alphaFromHalfLife(60.0)
    assert(math.abs(math.pow(d, 60.0) - 0.5) < 1e-12)
  }

  test("nulls are ignored: output null, accumulators unchanged") {
    val out = runEwma(Seq[java.lang.Double](2.0, null, 4.0), 1.0)
    assert(out(1).isEmpty)
    // with h=1 (decay .5): after skipping null, y = (4 + .5*2)/(1 + .5)
    assert(math.abs(out(2).get - (4.0 + 0.5 * 2.0) / 1.5) < 1e-12)
  }

  test("multiple keys fold independently") {
    val df = Seq(("a", 0, 1.0), ("b", 0, 100.0), ("a", 1, 3.0), ("b", 1, 200.0))
      .toDF("key", "i", "x")
    val out = Ewma.ewmaMean(df, Seq("key"), Seq("i"), "x", 1.0, "ewma")
      .orderBy("key", "i").collect().map(_.getDouble(3))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) - (3.0 + 0.5 * 1.0) / 1.5) < 1e-12)
    assert(math.abs(out(2) - 100.0) < 1e-12)
    assert(math.abs(out(3) - (200.0 + 0.5 * 100.0) / 1.5) < 1e-12)
  }
}
