package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor at scale —
  * the compressed-index path when even IVF lists are too large to hold
  * raw vectors (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011).
  *
  * The vector space is split into `m` contiguous subspaces; each subspace
  * gets its own k-codeword codebook (Lloyd-trained); a database vector is
  * stored as `m` small codes (m·log2(k) bits — 4 bytes/vector here vs 256
  * for raw floats). Query-time asymmetric distance (ADC) rebuilds an
  * approximate squared L2 distance as the sum of per-subspace distances
  * from the REAL query sub-vectors to the stored codewords, via an
  * m·k-entry lookup table per query.
  *
  * Everything is relational and deterministic (DuckDB-oracle-able):
  *  - init = the k vectors with the smallest ids, codebook id = vector id
  *    (same convention as [[KMeans.lloyd]]);
  *  - per-subspace distances are `round(sum((x-c)^2), 9)` with codeword id
  *    as the argmin tie-break; ADC sums are rounded to 6 d.p. with
  *    database id as the ranking tie-break;
  *  - codebooks are model state: k·dim doubles collected to the driver
  *    and re-shipped as a broadcast literal frame — never a data collect.
  *
  * Scale shape: train/encode are one narrow component explode joined to
  * the broadcast codebook (k multiplies per component — the standard PQ
  * encode cost) plus one map-side-combinable argmin/mean aggregation; ADC
  * BROADCASTS the per-query LUT (queries · m · k rows — the panel is the
  * small side by contract) against the encoded database, so corpus codes
  * never shuffle for the scan and the m·k-key join cannot skew; the scan
  * is Θ(panel · corpus) code lookups — the PQ paper's own cost model,
  * linear in the corpus at fixed panel — and the final ranking's
  * `row_number <= k` pattern engages Catalyst's InferWindowGroupLimit
  * (partial per-partition top-k before the qid shuffle, plan-pinned), so
  * no task ever sorts one query's whole scored corpus.
  */
object Pq {

  /** Train per-subspace codebooks with `iters` Lloyd rounds.
    * @return (sub, cid, j, c) rows, k·dim total — the model.
    */
  def codebooks(df: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val comp = components(df, idCol, vecCol, m)
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"m=$m must divide the vector dimension $dim")
    // init: sub-vectors of the k smallest ids (k rows of model state)
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("v")).collect()
      .flatMap { r =>
        val cid = r.getLong(0)
        r.getSeq[Double](1).zipWithIndex.map { case (x, pos) =>
          (pos / (dim / m), cid, pos % (dim / m), x)
        }
      }.toSeq
    require(init.map(_._2).distinct.size == k, s"need at least $k vectors")
    var cb = init
    for (_ <- 0 until iters) {
      val asg = assign(comp, litCodebook(spark, cb))
      val updated = comp.join(asg, Seq("id", "sub"))
        .groupBy("sub", "cid", "j")
        .agg(round(sum(col("x")) / count(lit(1)), 9).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      // a codeword that won no sub-vectors keeps its init value (standard
      // Lloyd treatment; happens when two init ids share a sub-vector)
      val have = updated.map(u => (u._1, u._2)).toSet
      cb = updated.toSeq ++ cb.filterNot(c => have((c._1, c._2)))
    }
    litCodebook(spark, cb)
  }

  /** Encode each vector as its nearest codeword per subspace:
    * (id, sub, cid). */
  def encode(df: DataFrame, idCol: String, vecCol: String, m: Int,
      cb: DataFrame): DataFrame =
    assign(components(df, idCol, vecCol, m), cb)

  /** ADC top-k: for each query vector (rows of `queries`), the `topK`
    * nearest database vectors by PQ-approximated squared L2 distance.
    * Self-matches (same id) are excluded.
    */
  def adcTopK(db: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, topK: Int, iters: Int = 1): DataFrame = {
    val cb = codebooks(db, idCol, vecCol, m, k, iters)
    val codes = encode(db, idCol, vecCol, m, cb)
    // per-query lookup table: distance from the query's sub-vector to
    // EVERY codeword — queries · m · k rows, the classic ADC table
    val lut = components(queries, idCol, vecCol, m)
      .withColumnRenamed("id", "qid")
      .join(broadcast(cb), Seq("sub", "j"))
      .groupBy("qid", "sub", "cid")
      .agg(round(sum((col("x") - col("c")) * (col("x") - col("c"))), 9).as("d"))
    // the LUT is model-state-sized (queries · m · k rows — the panel is
    // the small side by contract), so it ships BROADCAST: the corpus
    // codes never shuffle for the scan, and the (sub, cid) join — whose
    // key space is only m·k values, a guaranteed-skew disaster as a
    // shuffle join — stays map-side. The scan itself is the PQ paper's
    // own cost model: Θ(panel · corpus) code lookups, linear in the
    // corpus at fixed panel (measured, docs/SCALING.md).
    val adist = codes.join(broadcast(lut), Seq("sub", "cid"))
      .groupBy("qid", "id")
      .agg(round(sum(col("d")), 6).as("adist"))
      .filter(col("qid") =!= col("id"))
    // ranking tail: the row_number <= k pattern engages Catalyst's
    // InferWindowGroupLimit (partial per-partition top-k before the qid
    // shuffle — see Similarity.topKPerGroup's doc; pinned in
    // PlanAuditSpec), so the low-cardinality qid panel never means a
    // corpus-sized single-task sort
    Similarity.topKPerGroup(adist, Seq(col("adist")), col("id"), topK, "rank")
      .select(col("qid").as("query_id"), col("id").as("vec_id"),
        col("adist"), col("rank").cast("long").as("rank"))
  }

  /** (id, sub, j, x) component stream: one narrow explode; subspace and
    * in-subspace index derive from the row's own vector width, so no
    * extra driver job is needed to learn the dimension. */
  private def components(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    val subDim = (size(col(vecCol)) / m).cast("int")
    df.select(col(idCol).cast("long").as("id"), subDim.as("_sd"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("id"), (col("pos") / col("_sd")).cast("int").as("sub"),
        pmod(col("pos"), col("_sd")).as("j"), col("x"))
  }

  /** Nearest codeword per (id, sub): join components to the broadcast
    * codebook, one argmin aggregation. */
  private def assign(comp: DataFrame, cb: DataFrame): DataFrame = {
    val d = comp.join(broadcast(cb), Seq("sub", "j"))
      .groupBy("id", "sub", "cid")
      .agg(round(sum((col("x") - col("c")) * (col("x") - col("c"))), 9).as("d"))
    val w = Window.partitionBy("id", "sub").orderBy(col("d"), col("cid"))
    d.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select("id", "sub", "cid")
  }

  private def litCodebook(spark: SparkSession,
      cb: Seq[(Int, Long, Int, Double)]): DataFrame = {
    import spark.implicits._
    cb.toDF("sub", "cid", "j", "c")
  }
}
