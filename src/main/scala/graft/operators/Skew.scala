package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins whose key distribution is dominated by a
  * few hot values (AQE's skew-join split handles sort-merge joins at
  * runtime; salting is the plan-level form that also works for grouped
  * pre-aggregation and when AQE statistics miss).
  *
  * The big (skewed) side gets a salt derived by hashing the whole row —
  * deterministic (no rand(), so retries and both engines agree) while still
  * spreading a hot key's rows across `salts` sub-partitions, since rows
  * sharing a join key differ in their other columns. The small side is
  * replicated once per salt. The join key becomes (keys, salt), so one hot
  * key occupies `salts` shuffle partitions instead of one.
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full-outer would emit one row PER SALT REPLICA for unmatched
    // small-side keys — not equivalent to the plain join; flip the sides
    // and use "left" instead
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "semi", "leftanti", "left_anti", "anti", "cross").contains(
      joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-flavored joins, not $joinType")
    val l = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, (keys :+ "_salt").toIndexedSeq, joinType).drop("_salt")
  }
}
