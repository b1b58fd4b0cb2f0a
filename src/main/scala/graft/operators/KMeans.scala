package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the clustering
  * step a training-data pipeline runs before IVF indexing or
  * cluster-balanced sampling ([[Similarity.ivfTopK]] consumes exactly
  * this kind of centroid set).
  *
  * Determinism contract (cross-engine reproducible, DuckDB-oracle-able):
  *  - init = the k vectors with the smallest ids (no seeded sampling);
  *  - assignment minimizes squared L2 distance computed as
  *    vv - 2·v·c + c·c and ROUNDED to 9 d.p. before the argmin, with
  *    centroid id as tie-break — sub-rounding summation-order noise
  *    between engines cannot flip an assignment (same policy as
  *    [[Similarity.srpCode]]'s projections);
  *  - updated centroid components are means rounded to 9 d.p.
  *
  * Scale shape: each assignment is one narrow broadcast pass (centroids
  * ship as literals — model state, k·dim doubles, bounded by the model
  * not the data); each update is one map-side-combinable aggregation of
  * (cluster, dim) sums. The driver holds only k·dim doubles per
  * iteration — never data rows.
  */
object KMeans {

  /** @return final assignment after `iters` update rounds:
    *         (idCol, cluster, dist2) — dist2 is the 9-d.p.-rounded
    *         squared L2 distance to the winning centroid.
    */
  def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))

    // deterministic init: k smallest ids (k rows to the driver — model
    // state, not a data collect)
    val init: Seq[(Long, Array[Double])] = v.orderBy("id").limit(k).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray)).toSeq
    require(init.size == k, s"need at least $k vectors, found ${init.size}")
    val dim = init.head._2.length
    require(init.forall(_._2.length == dim),
      s"inconsistent vector dimensions among init vectors (expected $dim); " +
        "lloyd requires a fixed-dimension embedding column")

    def assigned(cens: Seq[(Long, Array[Double])]): DataFrame = {
      val vv = Similarity.dot(col("v"), col("v"))
      val best = cens.map { case (cid, c) =>
        val cc = c.foldLeft(0.0)((s, x) => s + x * x) // same L2R fold as dot
        struct(
          round(vv - lit(2.0) * Similarity.dot(col("v"), typedlit(c.toSeq))
            + lit(cc), 9).as("d"),
          lit(cid).as("cid"))
      }.reduce[Column]((a, b) => least(a, b)) // struct order = (d, cid) asc
      v.select(col("id"), col("v"), best.getField("cid").as("cluster"),
        best.getField("d").as("dist2"))
    }

    var cens = init
    for (_ <- 0 until iters) {
      // one shuffle of (cluster, dim) partial sums; k·dim rows back
      val comps = assigned(cens)
        .select(col("cluster"), posexplode(col("v")))
        .groupBy("cluster", "pos")
        .agg(round(sum(col("col")) / count(lit(1)), 9).as("c"))
        .collect()
      val updated = comps.groupBy(_.getLong(0)).map { case (cid, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach { r =>
          val pos = r.getInt(1)
          require(pos < dim,
            s"vector wider than the $dim-dim init vectors (component $pos); " +
              "lloyd requires a fixed-dimension embedding column")
          arr(pos) = r.getDouble(2)
        }
        cid -> arr
      }
      // a cluster that won no points keeps its previous centroid (standard
      // Lloyd treatment) — silently dropping it would return fewer than k
      // clusters whenever two init vectors coincide
      cens = cens.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    assigned(cens).select(col("id").as(idCol), col("cluster"), col("dist2"))
  }
}
