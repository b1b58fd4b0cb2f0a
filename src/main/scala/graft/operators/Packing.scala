package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the corpus in id
  * order and cut it into fixed-length token blocks ("concat-and-chunk",
  * the standard GPT-style packing — every block is exactly `seqLen`
  * tokens, documents spanning a boundary are split across blocks).
  *
  * The core primitive is a corpus-wide prefix sum of per-document token
  * counts. A naive `sum().over(Window.orderBy(id))` computes it on ONE
  * partition — a non-starter at 100 TB — so this runs the classic
  * two-phase distributed scan instead:
  *
  *   1. documents are range-bucketed on the id (a pure per-row
  *      expression — no sampling job, no skew on dense ids);
  *   2. a windowed cumsum runs WITHIN each bucket (shuffle on bucket,
  *      each partition sees only its slice);
  *   3. per-bucket totals (one tiny row per bucket) get their own
  *      cumsum — `buckets` rows on one partition, microseconds — and
  *      come back as broadcast offsets.
  *
  * Every per-document operation is a narrow expression; the only
  * corpus-size shuffles are the bucket exchange and the final per-block
  * aggregation, both on keys with bounded cardinality.
  */
object Packing {

  /** Pack documents into `seqLen`-token blocks and report one row per
    * block: how many documents contribute to it, how many tokens it
    * holds (the last block may be ragged), and the first/last
    * contributing document ids.
    *
    * `tokensCol` is the per-document token count (any integer
    * expression, e.g. [[TextAnalysis.tokenCount]]). Zero/null-token
    * documents contribute nothing and are dropped from block membership
    * (they still occupy their place in the concatenation order, at zero
    * width). Output: `(seq_id, n_docs, n_tokens, first_doc, last_doc)`
    * ordered by `seq_id`.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Int, buckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(buckets > 0, "buckets must be positive")
    require(!Seq("_id", "_n", "_b", "_cum", "_off", "_seq").exists(df.columns.contains),
      "input must not already contain _id/_n/_b/_cum/_off/_seq")

    val tok = df.select(col(idCol).cast("long").as("_id"),
      coalesce(tokensCol.cast("long"), lit(0L)).as("_n"))

    // range-bucket on the id without a sampling pass: bounds come from a
    // broadcast 1-row aggregate, so the whole assignment stays lazy and
    // order-preserving (bucket is monotone in id)
    val bounds = tok.agg(min("_id").as("_mn"), max("_id").as("_mx"))
    val width = greatest(lit(1L),
      ceil((col("_mx") - col("_mn") + 1).cast("double") / buckets).cast("long"))
    val bucketed = tok.crossJoin(broadcast(bounds))
      .withColumn("_b", ((col("_id") - col("_mn")) / width).cast("long"))
      .drop("_mn", "_mx")

    // phase 1: cumsum within each bucket (shuffle on _b only)
    val local = bucketed.withColumn("_cum",
      sum("_n").over(Window.partitionBy("_b").orderBy("_id")))

    // phase 2: bucket totals -> exclusive prefix offsets (`buckets` rows;
    // the single-partition window here is over a frame that fits in a
    // cache line, not the corpus)
    val offsets = bucketed.groupBy("_b").agg(sum("_n").as("_bt"))
      .withColumn("_off",
        coalesce(sum("_bt").over(
          Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_b", "_off")

    val cum = local.join(broadcast(offsets), "_b")
      .withColumn("_cum", col("_cum") + col("_off"))

    // a document occupying tokens [_cum - _n, _cum) spans blocks
    // floor((_cum-_n)/L) .. floor((_cum-1)/L)
    val L = lit(seqLen.toLong)
    val spans = cum.filter(col("_n") > 0)
      .withColumn("_seq", explode(sequence(
        floor((col("_cum") - col("_n")) / L).cast("long"),
        floor((col("_cum") - 1) / L).cast("long"))))

    spans.groupBy(col("_seq").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("_cum"), (col("_seq") + 1) * L) -
          greatest(col("_cum") - col("_n"), col("_seq") * L)).as("n_tokens"),
        min("_id").as("first_doc"), max("_id").as("last_doc"))
      .orderBy("seq_id")
  }
}
