package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is pure `Column` algebra (split / higher-order functions /
  * regex / md5) — no UDFs, so the whole pipeline stays inside Catalyst
  * and scales linearly with input: per-row work only, no shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Array of word k-grams over a token-array column — the native
    * [[graft.expr.catalyst.WordKGrams]] walk (one pass, direct
    * `UTF8String` joins). The earlier higher-order-function form
    * (`transform(sequence(...), j => concat_ws(" ", slice(toks, j+1, k)))`)
    * is bit-identical but evaluates interpreted per gram — lambda
    * binding, a sliced intermediate array, and generic concat dispatch
    * made gram construction the constant-factor floor of the whole
    * dedup/decontamination/repetition family.
    *
    * Requires [[graft.expr.catalyst.GraftExtensions]] on the session
    * (as [[Dedup.minHashSignatures]] and [[Dedup.simHash]] already do).
    */
  private[operators] def gramArray(toks: Column, k: Int): Column =
    call_function("word_kgrams", toks, lit(k))

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(tokens(textCol)).cast("long")

  /** BPE-ish subword proxy count: alpha runs, single digits, punctuation. */
  def bpeishTokenCount(textCol: Column): Column =
    size(regexp_extract_all(lower(textCol), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Small per-language stopword dictionaries (deterministic heuristic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for"),
    "es" -> Seq("el", "los", "las", "y", "es", "para", "con", "una"),
    "fr" -> Seq("le", "les", "et", "est", "pour", "avec", "dans", "une"))

  /** Count of tokens present in `dict`. */
  def dictHits(toks: Column, dict: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(dict))).cast("long")

  /** N-gram/stopword-based language ID over {de,en,es,fr,zh}: argmax of
    * dictionary hits (CJK character count for zh), alphabetical tie-break.
    */
  def langId(textCol: Column): Column = {
    val toks = tokens(lower(textCol))
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, dict) =>
      lang -> dictHits(toks, dict)
    } :+ ("zh" -> size(regexp_extract_all(textCol, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long"))
    val g = greatest(scores.map(_._2): _*)
    // first alphabetical language reaching the max (zh sorts last)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === g && g > 0, lang).otherwise(acc)
    }
  }

  /** Quality features: char/word counts, mean word length, punctuation
    * ratio, stopword ratio, and a simple composite score.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
    val nPunct = size(regexp_extract_all(col(textCol), lit("[.,;:!?]"), lit(0))).cast("long")
    val enHits = dictHits(transform(toks, t => lower(t)), stopwords("en"))
    df.withColumn("n_chars", nChars)
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len", sumLen.cast("double") / nWords)
      .withColumn("punct_ratio", nPunct.cast("double") / nChars)
      .withColumn("stopword_ratio", enHits.cast("double") / nWords)
      .withColumn("quality_score",
        col("stopword_ratio") * 0.5 + when(nWords >= 20, 0.5).otherwise(0.0))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), "\\s+", " ")))

  /** Per-document mean token log-probability under the corpus's own
    * add-one-smoothed unigram model — the cheap LM-quality score used to
    * filter gibberish/boilerplate before expensive model-based scoring
    * (documents far below the corpus-typical logprob are outliers).
    *
    * p(w) = (count(w)+1) / (T+V) over the whole input corpus; score =
    * mean ln p(w_i) over the document's token MULTISET. Scale shape: one
    * token-frequency aggregation (vocabulary-sized, map-side combined),
    * one scalar (T, V) broadcast, one vocabulary hash join back to the
    * token stream, one per-doc average — all linear.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val freq = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val global = freq.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    toks.join(freq, "w")
      .crossJoin(broadcast(global))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(log((col("c") + lit(1L)).cast("double") / (col("t") + col("v"))))
          / count(lit(1)), 6).as("avg_logprob"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_logprob"))
  }

  /** Repetition metrics per document, after the Gopher data-quality
    * filters (Rae et al. 2021, table A1): excessively repetitious text is
    * boilerplate/spam and gets filtered before training. The corpus here
    * has no line structure, so the line-based variants are expressed over
    * token n-grams instead:
    *
    *  - `dup_word_frac`: fraction of word occurrences that are repeats of
    *    an earlier word (1 - distinct/total);
    *  - `top_bigram_frac`: fraction of bigram occurrences taken by the
    *    single most frequent bigram;
    *  - `dup_trigram_frac`: fraction of trigram occurrences whose trigram
    *    occurs more than once;
    *  - `repetitive`: the filter verdict at Gopher-ish thresholds.
    *
    * Scale shape: every metric is per-document, so the whole computation
    * lives inside the scan projection — ONE native expression
    * ([[graft.expr.catalyst.RepetitionStats]]: all 1/2/3-gram counters in
    * a single pass over the token array) per row. Zero shuffles, zero
    * data movement, corpus read exactly once; the earlier relational form
    * (exploded 3x-corpus gram stream, count per (doc, n, gram), per-doc
    * roll-up) shuffled the gram stream twice for no cross-document
    * information. Grams are counted under the same 60-bit md5 family
    * ([[Dedup.hash60]]), so collisions — and results — are bit-identical
    * to that form and to the DuckDB oracle mirroring it.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        call_function("repetition_stats", tokens(col(textCol))).as("_r"))
      // docs with no tokens emitted no gram rows in the relational form;
      // keep that contract (they carry no signal for the gate either way)
      .filter(col("_r.nw") > 0)
      .select(col(idCol),
        col("_r.nw").as("n_words"),
        round((col("_r.nw") - col("_r.ndw")).cast("double") / col("_r.nw"), 6)
          .as("dup_word_frac"),
        // guard, don't coalesce: the counters are 0 (not null) for docs
        // too short to have bi/trigrams, and 0.0/0 THROWS under Spark's
        // default ANSI mode where the relational form's null/null was null
        round(when(col("_r.nbg") > 0,
          col("_r.maxbg").cast("double") / col("_r.nbg")).otherwise(0.0), 6)
          .as("top_bigram_frac"),
        round(when(col("_r.ntg") > 0,
          col("_r.duptg").cast("double") / col("_r.ntg")).otherwise(0.0), 6)
          .as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > 0.8 || col("top_bigram_frac") > 0.18 ||
          col("dup_trigram_frac") > 0.3)

  /** Top-k salient terms per document by TF-IDF, with BM25 alongside —
    * the relevance/keyword-extraction primitive of corpus curation.
    *
    * Scale shape: one narrow explode, then three map-side-combinable
    * aggregations (term freq per (doc, term), doc freq per term, doc
    * length); the global (N, avg length) pair is a scalar broadcast. The
    * doc-frequency join shuffles by term — vocabulary-sized, not
    * corpus-sized, and never collected.
    *
    * Determinism: counts are exact longs; idf/bm25 are double formulas
    * evaluated with the same association on both engines and rounded to
    * 6 d.p.; ranking orders by the ROUNDED score with term tie-break.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val docLen = tf.groupBy("id").agg(sum(col("tf")).as("len"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val global = docLen.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen"))
    val scored = tf
      .join(docLen, "id")
      .join(docFreq, "term")
      .crossJoin(broadcast(global))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf") * (log((col("n") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0)), 6).as("score"),
        round(log(lit(1.0) + (col("n") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * ((col("tf") * lit(k1 + 1.0))
            / (col("tf") + lit(k1) * (lit(1.0 - b)
              + lit(b) * (col("len") / col("avglen"))))), 6).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("term"), col("tf"), col("score"),
        col("bm25"), col("rank"))
  }

  /** Inverted index over whitespace terms: one row per term with its
    * document frequency and the sorted posting list of documents
    * containing it. `maxDfFrac` drops stopword-class terms (ones
    * appearing in more than that fraction of the corpus — their lists
    * would be corpus-sized and are useless for retrieval, so real
    * indexes drop or tier them); `minDf` drops hapax noise. The corpus
    * size enters as a one-row broadcast, so the cut scales with the
    * input instead of hard-coding a row count.
    *
    * Scale shape: explode + distinct + one groupBy — linear scans and
    * hash shuffles keyed by term. The df-filter is applied BEFORE
    * collect_list, so over-cap terms never materialize their lists; a
    * surviving list is bounded by `maxDfFrac x corpus`, which a retrieval
    * deployment would further tier/shard per term.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDfFrac: Double): DataFrame = {
    require(minDf >= 1 && maxDfFrac > 0 && maxDfFrac <= 1,
      "need minDf >= 1 and maxDfFrac in (0,1]")
    val posting = df
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val n = df.select(col(idCol)).distinct().agg(count(lit(1)).as("n_docs"))
    val dfreq = posting.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df") >= minDf && col("df") <= col("n_docs") * maxDfFrac)
      .select("term", "df")
    posting.join(dfreq, "term")
      .groupBy("term", "df")
      .agg(sort_array(collect_list(col("id"))).as("postings"))
      .select(col("term"), col("df"), col("postings"))
  }
}
