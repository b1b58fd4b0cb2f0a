package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard (quadratic ground truth), MinHash+LSH (the 100 TB path), and
  * SimHash with banded Hamming blocking.
  *
  * All hashing is derived from md5 so results are deterministic across
  * engines and runs (no JVM `hashCode`, no seeds to drift): a 60-bit
  * integer is taken from the first 15 hex chars of `md5(tag || value)`.
  */
object Dedup {

  /** 60-bit deterministic hash of a string column under a namespace tag. */
  def hash60(tag: String, c: Column): Column =
    conv(substring(md5(concat(lit(tag + ":"), c)), 1, 15), 16, 10).cast("long")

  /** MinHash universal-hash family h_i(x) = (a_i·x + b_i) mod P over a
    * 31-bit base hash: one md5 per shingle instead of `numHashes` — the
    * md5 work drops 64× while the family stays engine-deterministic (the
    * a/b constants derive from md5 of the index and are embedded as
    * literals in both the Spark plan and the DuckDB oracle).
    */
  val P: Long = 2147483647L

  def hashParams(i: Int): (Long, Long) = {
    def h(tag: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag:$i".getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    ((h("a") % (P - 1)) + 1, h("b") % P)
  }

  /** 31-bit base hash of a shingle (one md5). */
  def baseHash(c: Column): Column = hash60("mh", c) % P

  /** Exact dedup: canonical id = min id among identical texts.
    * One hash-shuffle on the text digest; last/first-wins is deterministic.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col(textCol)))
    df.select(col(idCol), min(col(idCol)).over(w).as("canon_id"))
      .withColumn("is_dup", (col(idCol) =!= col("canon_id")).cast("boolean"))
  }

  /** Word k-gram shingle stream per document, duplicates included —
    * narrow (no shuffle); min-based signatures are multiset-invariant so
    * they can consume this directly.
    */
  def shinglesRaw(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val idxs = when(size(toks) >= k, sequence(lit(0), size(toks) - k))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"),
      explode(transform(idxs, j => concat_ws(" ", slice(toks, j + 1, lit(k))))).as("s"))
  }

  /** Distinct word k-gram shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    shinglesRaw(df, idCol, textCol, k).distinct()

  /** Exact all-pairs n-gram Jaccard >= threshold. Quadratic in corpus size
    * (shingle-join blowup) — this is the oracle/ground-truth variant; use
    * [[minHashLsh]] at scale.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("c"))
    jaccardOf(inter, sizes, threshold)
  }

  private def jaccardOf(inter: DataFrame, sizes: DataFrame, threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** MinHash signature columns mh0..mh{n-1}: per-doc min over shingles of
    * the universal-hash family applied to one shared base hash. One md5
    * per shingle, one shuffle (groupBy id).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    def mh(i: Int): Column = {
      val (a, b) = hashParams(i)
      min((col("base") * a + b) % P).as(s"mh$i")
    }
    sh.withColumn("base", baseHash(col("s")))
      .groupBy("id").agg(mh(0), (1 until numHashes).map(mh): _*)
  }

  /** MinHash + banded LSH near-dup pairs, exact-verified.
    *
    * Pipeline: shingle → signature (numHashes) → band keys (md5 of each
    * r-hash slice) → candidate pairs sharing any band → exact Jaccard
    * verification on the candidates only. At 100 TB each stage is a
    * linear scan + one hash shuffle; the quadratic blowup of
    * [[jaccardPairs]] is replaced by per-bucket joins whose size the
    * band/row parameters control.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // signatures read the raw shingle stream (min is multiset-invariant,
    // so the distinct's extra shuffle is skipped); the distinct set is
    // still needed 3x below for exact verification, hence cached
    val sh = shingles(df, idCol, textCol, k).cache()
    val sig = minHashSignatures(shinglesRaw(df, idCol, textCol, k), numHashes)
    val bandKeys = sig.select(col("id") +:
      (0 until bands).map { b =>
        md5(concat_ws(",", (0 until r).map(j => col(s"mh${b * r + j}").cast("string")): _*))
          .as(s"band$b")
      }: _*)
    val long = bandKeys.selectExpr("id",
      s"stack(${bands}, ${(0 until bands).map(b => s"$b, band$b").mkString(", ")}) as (band, bkey)")
    val cand = long.as("x").join(long.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    // exact verification restricted to candidates: count shared shingles
    val interCnt = cand
      .join(sh.withColumnRenamed("id", "a"), "a")
      .join(sh.withColumnRenamed("id", "b").withColumnRenamed("s", "s2"),
        Seq("b"), "inner")
      .filter(col("s") === col("s2"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    jaccardOf(interCnt, sizes, threshold)
  }

  /** 60-bit SimHash over the document's distinct words.
    *
    * Bit counters are SWAR-packed: each aggregate sums `(wh >> t) & M`
    * where M = 0x0000000100000001 keeps two 32-bit lanes per long, so 32
    * sums (plus a count) replace 60 per-bit sums over the word stream —
    * the same signature (`bit_j = [2·ones_j > n]` ⇔ `Σ(±1) > 0`) at ~2×
    * less aggregation work. 32-bit lanes hold exact counts up to ~4.3e9
    * distinct words per document, so no realistic input can overflow a
    * lane into its neighbor.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .distinct()
      .withColumn("wh", hash60("w", col("w")))
    val M = 0x0000000100000001L
    val packed = words.groupBy("id").agg(
      count(lit(1)).as("n"),
      (0 until 32).map(t => sum(expr(s"(wh >> $t) & $M")).as(s"s$t")): _*)
    def ones(j: Int) =
      shiftright(col(s"s${j % 32}"), 32 * (j / 32)).bitwiseAND(lit(0xFFFFFFFFL))
    packed.select(col("id"),
      (0 until 60).map(j =>
        when(ones(j) * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** Embedding-cosine near-dup pairs: SRP-LSH banded candidate generation
    * (`bands` chunks of `bitsPerBand` hyperplane sign bits; pairs sharing
    * any chunk are candidates), then exact cosine verification against
    * `threshold` on the candidates only.
    *
    * Same scale shape as [[minHashLsh]]: linear scans + hash-shuffle band
    * joins instead of the all-pairs cross join; band width trades recall
    * for candidate-set size. Real near-dup deployments run high thresholds
    * (≥0.9) where narrow bands keep recall near 1.
    */
  def embCosinePairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int, bitsPerBand: Int, threshold: Double): DataFrame = {
    require(bands * bitsPerBand <= 63, "code must fit a long")
    // cache only (id, code) — a few bytes per vector — for the band
    // self-join; the verification joins re-read vectors from the source
    // (a cached copy of every embedding would not fit at corpus scale)
    val coded = df.select(col(idCol).as("id"),
        Similarity.srpCode(col(vecCol), dim, bands * bitsPerBand).as("code"))
      .cache()
    val mask = (1L << bitsPerBand) - 1
    val chunks = coded.selectExpr("id",
      s"stack($bands, ${(0 until bands).map(b => s"$b, (code >> ${bitsPerBand * b}) & $mask").mkString(", ")}) as (band, ckey)")
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.ckey") === col("y.ckey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", Similarity.l2Norm(col("vec")))
    cand
      .join(vecs.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na")), "a")
      .join(vecs.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SimHash near-dup pairs: band the 60 bits into 4 chunks of 15; pairs
    * sharing any chunk are candidates; verify Hamming distance <= maxDist.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val sig = simHash(df, idCol, textCol)
    val chunks = sig.selectExpr("id", "simhash",
      s"stack(4, ${(0 until 4).map(c => s"$c, (simhash >> ${15 * c}) & 32767").mkString(", ")}) as (chunk, ckey)")
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("x.simhash").as("ha"),
        col("y.id").as("b"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }
}
