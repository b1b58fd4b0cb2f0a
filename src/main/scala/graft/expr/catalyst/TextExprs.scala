package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_kgrams(tokens, k)` / `word_chunks(tokens, k)` — word n-gram /
  * fixed-segment construction over a token array, as ONE native
  * expression instead of the higher-order-function chain
  * `transform(sequence(...), j => concat_ws(" ", slice(toks, j+1, k)))`.
  *
  * The HOF form is semantically identical but `ArraySequence`/`Transform`/
  * `Slice`/`ConcatWs` all evaluate interpreted, per element, per row:
  * every gram pays lambda-variable binding, a sliced intermediate array,
  * and a generic concat dispatch. This expression walks the token array
  * once with direct `UTF8String` joins — the gram-construction hot path
  * of the whole dedup/decontamination/repetition family
  * ([[graft.operators.Dedup.shinglesRaw]], `Dedup.segmentDedup`,
  * [[graft.operators.TextAnalysis.repetitionMetrics]]).
  *
  * Modes (fixed at construction by the registered alias):
  *  - sliding (`step = 1`, `tail = false`): the `n-k+1` full windows,
  *    empty when `n < k` — `word_kgrams` semantics;
  *  - chunked (`step = k`, `tail = true`): `ceil(n/k)` non-overlapping
  *    segments including the short tail — `word_chunks` semantics.
  *
  * Null/edge semantics mirror the HOF form: a null token array yields an
  * EMPTY array (the `when(size(toks) >= k, ...)` guard's otherwise
  * branch), never null; element order is document order. Results are
  * bit-identical to the HOF form, so existing DuckDB oracles
  * (string_split + list_slice mirrors) are unaffected.
  *
  * Evaluation is `CodegenFallback` by design: every consumer feeds an
  * `explode`/`posexplode` (a `Generate` node), which already terminates
  * whole-stage codegen — an interpreted-eval expression costs nothing
  * extra there, and the eval itself is a tight primitive loop.
  */
case class WordKGrams(tokens: Expression, k: Expression,
    step: Expression, tail: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, k, step, tail)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && k.dataType == IntegerType && step.dataType == IntegerType &&
      tail.dataType == BooleanType && k.foldable && step.foldable && tail.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal, int literal, " +
        s"boolean literal), got ${children.map(_.dataType.sql).mkString(", ")}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_kgrams"

  private lazy val kV: Int = k.eval().asInstanceOf[Int]
  private lazy val stepV: Int = step.eval().asInstanceOf[Int]
  private lazy val tailV: Boolean = tail.eval().asInstanceOf[Boolean]
  private val sep = UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    require(kV >= 1 && stepV >= 1, s"$prettyName needs k >= 1 and step >= 1")
    val t = tokens.eval(input)
    if (t == null) return empty
    val arr = t.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nOut =
      if (tailV) (n + stepV - 1) / stepV
      else if (n < kV) 0
      else (n - kV) / stepV + 1
    if (nOut == 0) return empty
    val out = new Array[Any](nOut)
    var o = 0
    var i = 0
    while (o < nOut) {
      val len = math.min(kV, n - i)
      if (len == 1) {
        // concat_ws semantics: a (theoretically) null token joins as ""
        val s = arr.getUTF8String(i)
        out(o) = if (s == null) UTF8String.EMPTY_UTF8 else s
      } else {
        val parts = new Array[UTF8String](len)
        var j = 0
        while (j < len) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(o) = UTF8String.concatWs(sep, parts: _*)
      }
      i += stepV
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordKGrams =
    copy(tokens = newChildren(0), k = newChildren(1),
      step = newChildren(2), tail = newChildren(3))
}

/** `repetition_stats(tokens)` — every per-document repetition counter of
  * [[graft.operators.TextAnalysis.repetitionMetrics]] in ONE pass over
  * the token array, per row:
  *
  *   struct(nw, ndw, nbg, maxbg, ntg, duptg)
  *   = (1-gram total & distinct, 2-gram total & max multiplicity,
  *      3-gram total & Σ count where count > 1)
  *
  * The earlier relational form exploded the 1+2+3-gram stream (3× the
  * corpus token count) and shuffled it twice (count per (doc, gram),
  * then roll up per doc). Every metric is per-document, so the shuffles
  * bought nothing — this expression keeps the whole computation inside
  * the scan projection: embarrassingly parallel, zero movement, and the
  * corpus is read exactly once.
  *
  * Grams are counted under the same 60-bit md5 family as the relational
  * form (`Dedup.hash60("rep", gram)` = first 15 hex chars of
  * md5("rep:" + gram), i.e. the first 8 big-endian digest bytes >>> 4),
  * so hash collisions — and therefore results — are bit-identical to the
  * exploded pipeline and to the DuckDB oracle that mirrors it.
  *
  * A null/empty token array yields all-zero counters (the relational
  * form emitted no rows for such docs; callers filter `nw > 0` to keep
  * that contract). CodegenFallback: one eval per ROW (not per gram), the
  * interpreted-dispatch cost is amortized over the internal loop.
  */
case class RepetitionStats(tokens: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens)

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("ndw", LongType, nullable = false),
    StructField("nbg", LongType, nullable = false),
    StructField("maxbg", LongType, nullable = false),
    StructField("ntg", LongType, nullable = false),
    StructField("duptg", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "repetition_stats"

  private val sep = UTF8String.fromString(" ")
  private val tag = "rep:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val zero = () => new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L))
    val t = tokens.eval(input)
    if (t == null) return zero()
    val arr = t.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return zero()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i) // concat_ws semantics: null joins as ""
      toks(i) = if (s == null) UTF8String.EMPTY_UTF8 else s
      i += 1
    }
    val counts = new java.util.HashMap[Long, Long]()
    def countGrams(k: Int): Long = {
      counts.clear()
      val m = n - k + 1
      var j = 0
      while (j < m) {
        val g = if (k == 1) toks(j)
          else UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, j, j + k): _*)
        counts.merge(Hash60(tag, g), 1L, (a, b) => a + b)
        j += 1
      }
      math.max(m, 0).toLong
    }
    val nw = countGrams(1)
    val ndw = counts.size().toLong
    val nbg = countGrams(2)
    var maxbg = 0L
    counts.forEach((_, c) => maxbg = math.max(maxbg, c))
    val ntg = countGrams(3)
    var duptg = 0L
    counts.forEach((_, c) => if (c > 1) duptg += c)
    new GenericInternalRow(Array[Any](nw, ndw, nbg, maxbg, ntg, duptg))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RepetitionStats =
    copy(tokens = newChildren(0))
}
