package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching — the entity-resolution primitive a
  * curation pipeline needs for joining noisy identifiers (near-identical
  * titles, URLs, author names) that exact keys miss.
  *
  * An all-pairs Levenshtein scan is quadratic; the standard scale shape
  * is *blocking* + *verification*. Blocking here is the length band: two
  * strings within edit distance `d` cannot differ in length by more than
  * `d`, so only pairs whose lengths fall in the same ±d band are
  * candidates. The left side replicates to its 2d+1 candidate length
  * buckets (a narrow explode), both sides hash-shuffle on the bucket,
  * and candidates verify with Spark's banded three-argument
  * `levenshtein` (O(d·n) with early exit, not O(n²)).
  *
  * Length is a coarse key on uniform corpora — one popular length
  * serializes its bucket's verification. The operator accepts extra
  * `blockCols` (e.g. a source/domain column, a first-token key, a
  * q-gram-count band) that compose into the bucket key; at 100 TB you
  * block on (length band, cheap content key) exactly like the LSH band
  * joins, and [[Skew.saltedJoin]] handles residual hot buckets.
  */
object Fuzzy {

  /** Self-join: pairs `(a, b, dist)` with `a < b` on the key and
    * `levenshtein(text_a, text_b) <= maxDist`. `blockCols` optionally
    * tighten the blocking key (pairs must then agree on them exactly).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, blockCols: Seq[String] = Nil): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(!Seq("_len", "_blk").exists(df.columns.contains),
      "input must not already contain _len/_blk")
    val base = df.select((col(idCol).as("_fid") +: col(textCol).as("_ftx") +:
      blockCols.map(col)): _*).withColumn("_len", length(col("_ftx")))
    // left replicates to every length bucket a match could live in;
    // right keeps its exact length -> every qualifying pair meets in
    // exactly one bucket (the right row's length), so no dedup is needed
    val lhs = base.withColumn("_blk",
      explode(sequence(col("_len") - maxDist, col("_len") + maxDist)))
    val rhs = base.withColumn("_blk", col("_len"))
    val joinKeys = "_blk" +: blockCols
    val cand = lhs.select(
        (col("_fid").as("a") +: col("_ftx").as("_ta") +: joinKeys.map(col)): _*)
      .join(rhs.select(
        (col("_fid").as("b") +: col("_ftx").as("_tb") +: joinKeys.map(col)): _*),
        joinKeys)
      .filter(col("a") < col("b"))
    cand.select(col("a"), col("b"),
        levenshtein(col("_ta"), col("_tb"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // -1 = early-exited above the threshold
  }
}
