package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (O(|Q|·|C|·d), right
  * whenever |Q| is small or as the per-bucket step); the SRP-LSH variant
  * buckets vectors by random-hyperplane sign codes so candidate sets
  * shrink to one bucket — the 100 TB path (bucket join replaces the
  * cross join; same idea as IVF coarse quantization).
  *
  * Dot products use the codegen'd [[graft.expr.catalyst.DotProduct]]
  * expression (`graft_dot`) — no UDFs, whole-stage-codegen friendly,
  * deterministic left-to-right fold. The session must register
  * [[graft.expr.catalyst.GraftExtensions]] (via `spark.sql.extensions`
  * or `GraftExtensions.register`) for these operators to resolve.
  */
object Similarity {

  /** Elementwise double cast. */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Top-k rows per qid under (order, tie-broken by `tieCol`), with the
    * rank emitted as `rankName` — the shared ranking tail of every
    * searcher here.
    *
    * Query panels are LOW-cardinality by design (tens of qids over the
    * whole corpus), so a per-qid window looks like the
    * row_number-over-few-groups defect class (a13/w13/x4/t6,
    * docs/SCALING.md). It is NOT, because of the `row_number <= k`
    * filter pattern: Catalyst's `InferWindowGroupLimit` rewrites it to
    * a PARTIAL per-input-partition top-k before the qid shuffle plus a
    * FINAL one after, so every sort stays partition-local and at most
    * partitions·k rows per qid ever meet — the two-phase decomposition,
    * for free. `PlanAuditSpec` pins the `WindowGroupLimit … Partial`
    * node in all four ANN plans so a pattern change that silently
    * disengages the rewrite (e.g. ranking without the limit filter)
    * fails the suite instead of re-opening the class.
    */
  private[operators] def topKPerGroup(df: DataFrame, order: Seq[Column],
      tieCol: Column, k: Int, rankName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(order :+ tieCol.asc: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }

  /** The shared (qid, cid, cos) → top-k tail: rank on (cos desc, cid). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    topKPerGroup(scored, Seq(col("cos").desc), col("cid"), k, "rn")
      .select(col("qid"), col("cid"), col("cos"), col("rn").cast("long").as("rank"))

  /** Dot product of two equal-length array columns —
    * [[graft.expr.catalyst.DotProduct]], a whole-stage-codegen'd loop with
    * the same left-to-right summation order (bit-identical results) as the
    * `aggregate(zip_with(...))` higher-order form it replaces, which was
    * `CodegenFallback` (interpreted lambdas + an intermediate array per
    * row) in every similarity/verification hot loop.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact top-k cosine neighbors of each query vector over the corpus.
    * Ranks on a 6-d.p.-rounded cosine with id tie-break (deterministic
    * across engines and summation orders).
    *
    * @param queries (qid, qv) frame; @param corpus (cid, cv) frame.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // zero-norm vectors: cosine is 0/0 = NaN, and NaN orders above every
    // real cosine in a desc sort — drop them from both sides up front
    // (same guard in lshTopK/ivfTopK and Dedup.embCosinePairs)
    val q = queries.toDF("qid", "qv").withColumn("qn", l2Norm(col("qv")))
      .filter(col("qn") > 0)
    val c = corpus.toDF("cid", "cv").withColumn("cn", l2Norm(col("cv")))
      .filter(col("cn") > 0)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    rankTopK(scored, k)
  }

  /** Deterministic ±1 hyperplane component for (plane p, dim d): the low
    * bit of md5 — a Rademacher sign-random-projection family.
    */
  private def planeSign(p: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
    if ((hex.last & 1) == 1) 1 else -1
  }

  /** The full sign vector of plane `p` — embedded as literals in both the
    * Spark plan and the DuckDB oracle mirror (same pattern as
    * [[Dedup.hashParams]]).
    */
  def planeSigns(p: Int, dim: Int): Seq[Int] = (0 until dim).map(d => planeSign(p, d))

  /** SRP-LSH bucket code: `numPlanes` sign bits of dot(v, hyperplane_p).
    * The projection is rounded to 9 d.p. before the sign test so bucket
    * assignment cannot flip on sub-rounding summation-order differences
    * between engines.
    */
  def srpCode(v: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      // same left-to-right fold as dot(): the sign-literal array promotes
      // ±1 to ±1.0 exactly, so the projection is bit-identical to the
      // previous zip_with/aggregate form (whose CodegenFallback lambdas
      // this replaces) and to the oracle's list_dot_product mirror
      val proj = dot(v, typedlit(planeSigns(p, dim).map(_.toDouble)))
      when(round(proj, 9) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One BAND's SRP key: `bits` sign bits from the globally-indexed
    * plane family starting at `planeOffset`. For planeOffset = b·bits
    * this is exactly bits [b·bits, (b+1)·bits) of [[srpCode]]'s packed
    * long — same planes, same rounding — so band keys computed per band
    * (the wide-band path, where bands·bits no longer fits one long)
    * bucket identically to slices of the packed code wherever both are
    * representable.
    */
  def srpBandCode(v: Column, dim: Int, planeOffset: Int, bits: Int): Column =
    (0 until bits).map { j =>
      val proj = dot(v, typedlit(planeSigns(planeOffset + j, dim).map(_.toDouble)))
      when(round(proj, 9) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style approximate top-k (coarse quantization): every corpus
    * vector is assigned to its nearest centroid; each query probes its
    * `nprobe` nearest centroids and ranks exact cosine only within those
    * inverted lists. At 100 TB the corpus pass is one broadcast join +
    * one shuffle by centroid id, and query cost scales with list size ×
    * nprobe instead of corpus size. All rankings order by 6-d.p.-rounded
    * cosine with centroid/candidate-id tie-breaks, so assignment and
    * probing are engine-deterministic.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val cen = centroids.toDF("cenid", "cenv").withColumn("cenn", l2Norm(col("cenv")))
      .filter(col("cenn") > 0)
    def rankedCentroids(vecs: DataFrame, rankCol: String): DataFrame = {
      val v = vecs.withColumn("n", l2Norm(col("vec"))).filter(col("n") > 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("cos").desc, col("cenid").asc)
      v.crossJoin(broadcast(cen))
        .select(col("id"), col("vec"), col("cenid"),
          round(dot(col("vec"), col("cenv")) / (col("n") * col("cenn")), 6).as("cos"))
        .withColumn(rankCol, row_number().over(w))
    }
    val assigned = rankedCentroids(corpus.toDF("id", "vec"), "arn")
      .filter(col("arn") === 1)
      .select(col("id").as("cid"), col("vec").as("cv"), col("cenid"))
      .withColumn("cn", l2Norm(col("cv")))
    val probes = rankedCentroids(queries.toDF("id", "vec"), "prn")
      .filter(col("prn") <= nprobe)
      .select(col("id").as("qid"), col("vec").as("qv"), col("cenid"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = probes.join(assigned, Seq("cenid"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    // (qid, cid) pairs are already unique: each corpus vector lives in
    // exactly one inverted list and probed centroids are distinct
    rankTopK(scored, k)
  }

  /** Approximate top-k: candidates limited to the query's SRP bucket,
    * exact cosine rank within. Vectors in sparse buckets may return fewer
    * than k neighbors — the recall/speed trade LSH makes by design.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, numPlanes: Int,
      k: Int): DataFrame = {
    val q = queries.toDF("qid", "qv")
      .withColumn("code", srpCode(col("qv"), dim, numPlanes))
      .withColumn("qn", l2Norm(col("qv")))
      .filter(col("qn") > 0)
    val c = corpus.toDF("cid", "cv")
      .withColumn("code", srpCode(col("cv"), dim, numPlanes))
      .withColumn("cn", l2Norm(col("cv")))
      .filter(col("cn") > 0)
    val scored = c.join(q, Seq("code"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    rankTopK(scored, k)
  }
}
