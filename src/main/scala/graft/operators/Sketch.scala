package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching (HyperLogLog) with a fully
  * deterministic, cross-engine-reproducible construction.
  *
  * Differences from `approx_count_distinct` (Spark's built-in HLL++):
  * the register construction here is pure Column algebra over an
  * md5-derived hash — every intermediate (bucket, rho, register table,
  * estimate) is a plain DataFrame an independent engine can recompute
  * bit-for-bit, which is what the DuckDB oracle does. At scale the shape
  * is the same as any HLL: one narrow pass to (group, bucket, rho), one
  * map-side-combinable max per register, one tiny per-group rollup —
  * registers are mergeable, so partial aggregation works and the shuffle
  * carries at most `m` rows per group.
  *
  * Sketch mathematics follow Flajolet et al. (2007): m=256 registers,
  * alpha_m = 0.7213/(1+1.079/m), raw = alpha_m * m^2 / sum(2^-M_b),
  * linear counting below 2.5m when empty registers remain.
  */
object Sketch {

  /** Register count (2^8 buckets: low 8 bits of the 60-bit hash). */
  val M: Int = 256

  /** alpha_256 * m^2 * 2^53 — the numerator of the raw estimate with the
    * register sum kept as the exact integer sum(2^(53-M_b)). Computed
    * once on the driver; [[alphaNumeratorRepr]] embeds the same double in
    * the oracle SQL via its shortest decimal repr (round-trips exactly).
    */
  val alphaNumerator: Double =
    0.7213 / (1 + 1.079 / M) * M * M * 9007199254740992.0 // 2^53

  def alphaNumeratorRepr: String = alphaNumerator.toString

  /** Rank of the highest set bit (1-based from the MSB of the 52-bit
    * field), i.e. the count of leading zeros + 1; r = 0 maps to 53.
    * Pure integer comparisons — no floating log2 whose rounding could
    * disagree across engines at exact powers of two.
    */
  def rho52(r: Column): Column = {
    val first = when(r >= lit(1L << 51), lit(1))
    (2 to 52).foldLeft(first) { (acc, k) =>
      acc.when(r >= lit(1L << (52 - k)), lit(k))
    }.otherwise(lit(53))
  }

  /** The same rho as [[rho52]] rendered as SQL CASE text over `varName` —
    * interpolated into the DuckDB oracle so both engines evaluate the
    * identical integer comparison ladder.
    */
  def rho52Sql(varName: String): String = {
    val whens = (1 to 52).map { k =>
      s"WHEN $varName >= ${1L << (52 - k)} THEN $k"
    }.mkString(" ")
    s"CASE $whens ELSE 53 END"
  }

  /** Per-group HLL cardinality estimate of `valueCol`.
    *
    * @return one row per group: groupCols, `n_present` (non-empty
    *         registers), `hll_est` (the estimate, rounded to 4 d.p. —
    *         the only non-integer step is the final division and the
    *         linear-counting ln, so 4 d.p. absorbs any last-ulp libm
    *         difference between engines).
    */
  def hllCardinality(df: DataFrame, groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val reserved = Set("bucket", "rho", "m_b", "n_present", "s_present", "hll_est")
    val clash = groupCols.toSet.intersect(reserved)
    require(clash.isEmpty, s"group columns collide with internal names: $clash")
    val h = Dedup.hash60("hll", valueCol)
    val gc = groupCols.map(col)
    val reg = df
      .select(gc :+ pmod(h, lit(256L)).as("bucket") :+
        rho52(shiftright(h, 8)).as("rho"): _*)
      .groupBy(gc :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m_b"))
    // sum(2^(53-M_b)) stays an exact integer (<= 256 * 2^53 = 2^61), so
    // the register sum is order-independent; the absent registers (M=0)
    // contribute 2^53 each and double as the linear-counting zero count
    val g = reg.groupBy(gc: _*).agg(
      count(lit(1)).as("n_present"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_b AS INT))")).as("s_present"))
    val zeros = lit(256L) - col("n_present")
    val sTotal = col("s_present") + zeros * lit(1L << 53)
    val raw = lit(alphaNumerator) / sTotal.cast("double")
    val est = when(raw <= lit(2.5 * 256) && zeros > 0,
      lit(256.0) * log(lit(256.0) / zeros)).otherwise(raw)
    g.select(gc :+ col("n_present") :+ round(est, 4).as("hll_est"): _*)
  }

  /** The (row, bucket) pair stream for a count-min sketch: each input
    * value lands in one bucket per hash row, tags `cm0..cm{d-1}` keeping
    * the rows independent. Plan-time unrolled so the same md5 family can
    * be mirrored literally in oracle SQL.
    */
  private def cmPairs(valueCol: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        pmod(Dedup.hash60(s"cm$r", valueCol), lit(width.toLong)).as("b"))): _*))

  /** A built count-min sketch: the (r, b, cnt) bucket table plus the
    * depth/width it was hashed with. Carrying the parameters prevents a
    * query-time mismatch — estimating with a different hash family than
    * the build silently UNDER-estimates (absent buckets read as 0),
    * which breaks the one guarantee CMS makes.
    */
  final case class CmSketch(table: DataFrame, depth: Int, width: Int)

  /** Count-min sketch of the frequency of `valueCol` occurrences
    * (Cormode & Muthukrishnan 2005): `depth` hash rows x `width` buckets
    * of exact integer counts. Mergeable sums — map-side combine works,
    * the shuffle carries at most depth·width rows, and two sketches add
    * bucket-wise — so the build is one narrow pass at any scale.
    */
  def countMin(df: DataFrame, valueCol: Column, depth: Int = 4,
      width: Int = 1024): CmSketch = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    CmSketch(
      df.select(cmPairs(valueCol, depth, width).as("e"))
        .select(col("e.r").as("r"), col("e.b").as("b"))
        .groupBy("r", "b").agg(count(lit(1)).as("cnt")),
      depth, width)
  }

  /** Point-query the sketch: estimated occurrence count per item —
    * min over the item's `depth` buckets, the classic CMS upper bound
    * (est >= true count always; over-estimates come only from bucket
    * collisions). Items absent from every bucket estimate 0.
    */
  def countMinEstimate(items: DataFrame, itemCol: String,
      sketch: CmSketch): DataFrame =
    items
      .select(col(itemCol),
        cmPairs(col(itemCol), sketch.depth, sketch.width).as("e"))
      .select(col(itemCol), col("e.r").as("r"), col("e.b").as("b"))
      .join(sketch.table, Seq("r", "b"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Approximate per-group quantiles from a fixed-width histogram sketch:
    * bin counts are a plain mergeable groupBy (ONE narrow map-side-
    * combined shuffle over the corpus, at most #groups · #bins output
    * rows), then each requested quantile interpolates linearly inside the
    * bin where the cumulative count crosses q·N. Error is bounded by
    * `binWidth` — the classic streaming-histogram trade: unlike exact
    * percentile (see t6), nothing about this pass holds per-group data in
    * one task, so it survives any corpus size.
    *
    * @return (g, q, est) — one row per group x requested quantile.
    */
  def histQuantile(df: DataFrame, groupCol: Column, valueCol: Column,
      binWidth: Double, qs: Seq[Double]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
    val h = df
      .groupBy(groupCol.as("g"),
        floor(valueCol / binWidth).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
    // running cum and the group total as two windows over the SAME
    // partition key: one exchange, one scan of the histogram (a
    // groupBy-total + join back would build the histogram twice)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("b")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val cum = h.withColumn("cum", sum("cnt").over(wOrd))
      .withColumn("n", sum("cnt").over(wAll))
    // exactly one bin per (g, q) satisfies the crossing predicate: cum is
    // strictly increasing over the group's present bins (cnt > 0)
    cum
      .select(col("g"), col("b"), col("cnt"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("_tgt", col("q") * col("n"))
      .filter(col("cum") >= col("_tgt") && (col("cum") - col("cnt")) < col("_tgt"))
      .select(col("g"), col("q"),
        round(col("b") * lit(binWidth) +
          lit(binWidth) * (col("_tgt") - (col("cum") - col("cnt"))) / col("cnt"),
          6).as("est"))
  }
}
