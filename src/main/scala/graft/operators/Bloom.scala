package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning: the semi-join reduction that makes selective
  * fact-to-dim joins cheap at 100 TB.
  *
  * A big-big equi-join shuffles BOTH sides on the key, even when only a
  * tiny fraction of fact rows have a dim match. Building a bloom filter
  * over the (already-filtered) dim keys and applying it to the fact side
  * BEFORE the shuffle prunes definite non-matches at the scan, so the
  * shuffle carries only probable matches plus the filter's false-positive
  * leak (~`fpp`). False positives are then removed by the exact join, so
  * the result is bit-identical to the plain join — the bloom changes the
  * plan's cost, never its answer. This is the manual form of Spark's own
  * AQE runtime row-level filtering, exposed as an operator so a pipeline
  * can apply it where the optimizer's heuristics don't fire.
  *
  * Uses Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (registered as `bloom_agg` / `bloom_might_contain` by
  * `GraftExtensions`): build and probe both run as codegen'd expressions
  * over xxhash64 keys, no UDF. The built filter is evaluated once on the
  * dim side (one small aggregation job — dim is the SMALL side by
  * assumption) and shipped to fact tasks as a binary literal, exactly how
  * a broadcast hash relation would travel; `might_contain` requires a
  * foldable filter side, so the literal is also what makes the expression
  * analyzable.
  *
  * Scale: the filter costs `optimalNumOfBits(n, fpp)` bits regardless of
  * fact size (~1.2 MB per million dim keys at 1% fpp); the fact side is
  * one narrow scan+filter, no extra shuffle or pass.
  *
  * Reference's analogue: selective dim-filtered joins in its reporting
  * queries (pipelines/universe_flow.py joins a filtered universe onto the
  * full bar table).
  */
object Bloom {

  /** Inner equi-join of `fact` to `dim`, bloom-pruning fact first.
    * Result is identical to `fact.join(dim, factKey === dimKey)`.
    *
    * `expectedItems` sizes the filter: pass (an upper bound on) the dim
    * key count; over-sizing wastes filter bytes, under-sizing raises the
    * false-positive leak but never loses rows.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = prune(fact, dim, factKey, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Just the pruning filter: fact rows whose key MIGHT be in dim's key
    * set (all matches survive; non-matches survive only at ~fpp rate).
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    // xxhash64 dispatches on input TYPE: the same numeric value hashes
    // differently as int vs bigint, so an int fact key probed against a
    // filter built from a bigint dim key would prune every true match.
    // Hash both sides through the tightest common type, like the join's
    // own coercion would.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    val common =
      if (ft == dt) ft
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findTightestCommonType(ft, dt)
        .getOrElse(throw new IllegalArgumentException(
          s"bloom keys have incompatible types: $factKey is ${ft.sql}, " +
            s"$dimKey is ${dt.sql}"))
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // one aggregation job over the dim side builds the filter eagerly;
    // a null result means the dim is EMPTY — the join is empty, short-
    // circuit rather than probing a null filter
    val bf = dim
      .select(call_function("bloom_agg", xxhash64(col(dimKey).cast(common)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head.getAs[Array[Byte]](0)
    if (bf == null) fact.limit(0)
    else fact.filter(call_function("bloom_might_contain", lit(bf),
      xxhash64(col(factKey).cast(common))))
  }
}
