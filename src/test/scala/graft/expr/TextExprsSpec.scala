package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Direct edge-case coverage for the native `repetition_stats` walk (the
  * t12 oracle exercises it corpus-wide; these pin the per-row contract).
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = Seq(text).toDF("text")
      .select(call_function("repetition_stats", split($"text", " ")).as("r"))
      .select("r.nw", "r.ndw", "r.nbg", "r.maxbg", "r.ntg", "r.duptg")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("repetition_stats: hand-computed counters") {
    // "a b a b a": words 5, distinct 2; bigrams [a b, b a, a b, b a] ->
    // max multiplicity 2; trigrams [a b a, b a b, a b a] -> "a b a" twice
    assert(stats("a b a b a") == ((5L, 2L, 4L, 2L, 3L, 2L)))
    // all-unique text: no repetition anywhere
    assert(stats("w x y z") == ((4L, 4L, 3L, 1L, 2L, 0L)))
    // constant text: every gram identical
    assert(stats("q q q q") == ((4L, 1L, 3L, 3L, 2L, 2L)))
  }

  test("repetition_stats: short and degenerate inputs") {
    assert(stats("solo") == ((1L, 1L, 0L, 0L, 0L, 0L)))
    assert(stats("two words") == ((2L, 2L, 1L, 1L, 0L, 0L)))
    // split("", " ") -> [""], one (empty) token — mirrors the relational
    // form, which hashed that empty 1-gram too
    assert(stats("") == ((1L, 1L, 0L, 0L, 0L, 0L)))
    // consecutive spaces make empty tokens; they count like any word
    assert(stats("a  a") == ((3L, 2L, 2L, 1L, 1L, 0L)))
    // null token array -> all-zero counters (callers filter nw > 0)
    val nullRow = Seq("x").toDF("text")
      .select(call_function("repetition_stats",
        lit(null).cast("array<string>")).as("r"))
      .select("r.nw").collect().head
    assert(nullRow.getLong(0) == 0L)
  }

  test("repetition_stats: multi-byte UTF-8 grams count correctly") {
    // repeated CJK bigram: md5 runs over UTF-8 bytes, not chars
    assert(stats("你好 世界 你好 世界") == ((4L, 2L, 3L, 2L, 2L, 0L)))
  }

  test("repetitionMetrics survives 1-2 word docs under ANSI mode") {
    // regression: nbg/ntg are 0 (not null) for docs too short to have
    // bi/trigrams, and an unguarded 0.0/0 division throws DIVIDE_BY_ZERO
    // under Spark's default ANSI mode
    val out = graft.operators.TextAnalysis.repetitionMetrics(
        Seq((1L, "solo"), (2L, "two words"), (3L, "a b c d")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    // "solo": no bigrams or trigrams at all -> guarded 0.0s;
    // "two words": its single bigram is trivially the top one (1.0)
    assert(out(1L) == ((0.0, 0.0)) && out(2L) == ((1.0, 0.0)))
  }

  test("repetitionMetrics flags constant spam and passes normal text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(1L) && !out(2L))
  }
}
