package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `sample(fraction)` with a seed is NOT reproducible across engines (and
  * changes with partitioning); these operators decide membership from the
  * md5-derived hash of a key column instead — the same
  * [[Dedup.hash60]] family, so a DuckDB oracle reproduces the exact row
  * set, reruns are stable, and adding/removing other rows never flips a
  * row's membership (the property that makes hash sampling the standard
  * at corpus scale: samples are consistent across pipeline versions).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Membership bucket in [0, 1e6): uniform over the key's hash. */
  def bucket(key: Column): Column = Dedup.hash60("sample", key.cast("string")) % Buckets

  /** Keep rows whose key hashes below `fraction` of the bucket space —
    * a deterministic, engine-portable Bernoulli sample. Narrow (no
    * shuffle): the filter sits on the scan and prunes at full scan speed.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(bucket(col(keyCol)) < (fraction * Buckets).toLong)
  }

  /** Per-stratum rates: rows keep membership by their stratum's fraction
    * (strata absent from `rates` get `defaultFraction`). The rates map is
    * a literal CASE expression — no join, still a narrow scan-side filter.
    */
  /** Deterministic weighted sample WITHOUT replacement of `n` rows
    * (Efraimidis & Spirakis 2006, A-Res): each row draws a reproducible
    * uniform u from its key's hash and ranks by u^(1/weight) — rows with
    * twice the weight are twice as likely to make the cut. Ranking uses
    * the monotone-equivalent ln(u)/weight, ROUNDED to 9 d.p. with the key
    * as tie-break, so an independent engine reproduces the exact row set.
    *
    * Scale shape: the sort key is a narrow per-row expression and the
    * top-n runs as TakeOrderedAndProject (per-partition heads, one merge
    * of n·partitions rows) — no global sort, no shuffle of the corpus.
    * Zero/negative weights are excluded (they can never win a draw).
    *
    * `keyCol` MUST be unique: rows sharing a key draw the same u (their
    * selection correlates perfectly) and tie identically in the final
    * order, so the cut among them is arbitrary — both the A-Res
    * independence assumption and the cross-engine reproducibility
    * guarantee hold only for unique keys.
    *
    * @return the sampled rows plus (`_wskey`, `rank`).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
      n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    // u = (h+1)/2^60 in (0, 1]; the long->double cast rounds identically
    // under IEEE on any engine
    val u = (Dedup.hash60("ws", col(keyCol).cast("string")).cast("double") + 1.0) /
      lit((1L << 60).toDouble)
    val key = round(log(u) / weightCol.cast("double"), 9)
    val top = df.filter(weightCol > 0)
      .withColumn("_wskey", key)
      .orderBy(col("_wskey").desc, col(keyCol).asc)
      .limit(n)
    // rank assigned after the top-n cut: the window spans n rows, not df
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("_wskey").desc, col(keyCol).asc)).cast("long"))
  }

  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: Column,
      rates: Map[String, Double], defaultFraction: Double): DataFrame = {
    require((defaultFraction +: rates.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Buckets).toLong)) { case (acc, (s, f)) =>
      when(stratumCol === s, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < threshold)
  }
}
