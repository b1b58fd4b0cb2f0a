package graft.expr.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native aggregates for the dedup family.
  *
  * The SQL-expression forms of SimHash/MinHash signatures (32 `sum` /
  * 64 `min` aggregate columns plus a 60-term signature select) are
  * semantically fine but generate an enormous codegen surface: first-run
  * cost is dominated by janino/JIT compiling the generated class, and the
  * driver's bench measures exactly that first run (BENCH_r02: d4 24.9s).
  * One typed buffer per signature keeps the plan to a single small
  * aggregate expression; both aggregates are MERGEABLE (elementwise
  * add / min), so partial aggregation (map-side combine) still applies —
  * the property that makes the groupBy shuffle carry one buffer per doc
  * instead of the word/shingle stream at 100 TB.
  *
  * Hash math is bit-identical to the expression forms (and to the DuckDB
  * oracle mirrors): inputs are the same md5-derived 60/31-bit hashes, and
  * the per-slot update is the same integer arithmetic.
  */

/** `simhash_agg(wh)` — 60-bit SimHash signature from 60-bit word hashes:
  * counts ones per bit position; bit j of the result is set iff strictly
  * more than half the inputs have bit j set (`2·ones_j > n`, matching the
  * reference's sign-of-sum-of-±1 semantics,
  * `/root/reference/pipelines` has no simhash — this is the LLM-data
  * extension documented in SURVEY §2).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // slots 0..59: per-bit ones counters; slot 60: row count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](61)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val wh = v.asInstanceOf[Long]
      var j = 0
      while (j < 60) { buf(j) += (wh >>> j) & 1L; j += 1 }
      buf(60) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 61) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2L * buf(j) > buf(60)) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(61 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(61)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

/** The `Dedup.hash60` family for native expressions: first 15 hex chars
  * of md5(tag ++ utf8), i.e. the first 8 digest bytes big-endian >>> 4.
  * ONE shared implementation — [[SimHashRow]], [[MinHashRow]],
  * [[GramHashes]] and [[RepetitionStats]] all hash through here, so the
  * bit-compatibility contract with `Dedup.hash60` (and every DuckDB
  * oracle mirror) lives in one place.
  */
private[catalyst] object Hash60 {
  // MessageDigest is stateful; expressions evaluate concurrently across
  // partition threads
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def apply(tagBytes: Array[Byte],
      s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get()
    d.reset()
    d.update(tagBytes)
    d.update(s.getBytes)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** `simhash_row(tokens)` — the whole 60-bit SimHash signature per ROW.
  *
  * Same math as [[SimHashAgg]] fed by the relational pipeline (distinct
  * words by STRING, so hash collisions contribute twice exactly as two
  * distinct (id, word) rows did; word hash = first 15 md5 hex chars of
  * "w:" + word, i.e. `Dedup.hash60("w", ...)`; bit j set iff strictly
  * more than half the distinct words have bit j set) — results are
  * bit-identical to the exploded `distinct → simhash_agg` form and to
  * the DuckDB oracle mirroring it.
  *
  * The signature is per-document, so the explode + distinct shuffle +
  * groupBy shuffle of the relational form bought no cross-document
  * information; this keeps signature construction inside the scan
  * projection (see README "per-document metrics never shuffle"). It is
  * also what a STREAMING dedup needs: signatures computable on unbounded
  * rows without a blocking aggregation before the keyed state.
  */
case class SimHashRow(tokens: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    tokens.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${t.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null tokens -> null (the
  // relational form emitted no signature row for such docs)
  override def prettyName: String = "simhash_row"

  private val tag = "w:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return null
    val arr = t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val ones = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // a NULL word is skipped, matching the relational form this must be
      // bit-identical to (hash60(null) is null and simhash_agg drops null
      // inputs); split() never produces null tokens, so this only matters
      // for hand-built arrays. The GRAM expressions (MinHashRow,
      // GramHashes) follow WordKGrams' concatWs semantics for the same
      // reason: null tokens are skipped inside a multi-token join, and a
      // lone null token joins as "".
      if (s != null && seen.add(s)) {
        val wh = Hash60(tag, s)
        var j = 0
        while (j < 60) { ones(j) += (wh >>> j) & 1L; j += 1 }
        total += 1L
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2L * ones(j) > total) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashRow =
    copy(tokens = newChildren(0))
}

/** `minhash_row(tokens, k, numHashes)` — the whole MinHash signature per
  * ROW: word k-grams built in place (same construction as
  * [[WordKGrams]]), each hashed to the 31-bit base
  * (`Dedup.baseHash` = first 15 md5 hex chars of "mh:" + gram, mod P),
  * then `numHashes` universal-hash minima ([[graft.operators.Dedup.hashParams]]
  * constants — identical to [[MinHashAgg]] fed by the exploded raw
  * shingle stream, since minima are multiset-invariant). Bit-identical
  * signatures, but the corpus-wide explode + groupBy shuffle disappears:
  * signature construction stays inside the scan projection, and the
  * expression is usable on unbounded streams.
  *
  * Docs with fewer than `k` words have no k-grams and produced no
  * signature row in the aggregated form — this returns null there;
  * callers filter it.
  */
case class MinHashRow(tokens: Expression, k: Expression, num: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, k, num)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }) && k.dataType == IntegerType && num.dataType == IntegerType &&
      k.foldable && num.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal, int literal), " +
        s"got ${children.map(_.dataType.sql).mkString(", ")}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_row"

  private lazy val kV: Int = k.eval().asInstanceOf[Int]
  private lazy val numV: Int = num.eval().asInstanceOf[Int]
  private lazy val params: Array[(Long, Long)] =
    (0 until numV).map(graft.operators.Dedup.hashParams).toArray
  private val P = graft.operators.Dedup.P
  private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val tag = "mh:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    require(kV >= 1 && numV >= 1, s"$prettyName needs k >= 1 and numHashes >= 1")
    val t = tokens.eval(input)
    if (t == null) return null
    val arr = t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val m = n - kV + 1
    if (m <= 0) return null
    // nulls stay null here: concatWs SKIPS them (no separator), exactly
    // like WordKGrams' multi-token branch — so hand-built arrays with
    // null tokens produce the same grams as the relational form. A
    // 1-gram of a null token joins as "" (WordKGrams' len == 1 branch).
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sig = Array.fill(numV)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val gram =
        if (kV == 1) {
          val s = toks(j)
          if (s == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else s
        } else org.apache.spark.unsafe.types.UTF8String.concatWs(
          sep, java.util.Arrays.copyOfRange(toks, j, j + kV): _*)
      val base = Hash60(tag, gram) % P // 60-bit hash, then the 31-bit fold
      var x = 0
      while (x < numV) {
        val hv = (base * params(x)._1 + params(x)._2) % P
        if (hv < sig(x)) sig(x) = hv
        x += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashRow =
    copy(tokens = newChildren(0), k = newChildren(1), num = newChildren(2))
}

/** `gram_hashes(tokens, k, tag)` — the 60-bit md5 hashes of a document's
  * word k-grams as one `array<long>` per row (same family as
  * `Dedup.hash60(tag, gram)`; gram construction as in [[WordKGrams]]).
  * Pairs with `array_distinct` to get each doc's distinct gram-hash set
  * without any explode or shuffle — the per-row front half of
  * gram-membership operators like `Dedup.contamination`, whose relational
  * form paid a corpus-wide (id, hash) distinct shuffle per side.
  * Duplicate handling matches the exploded form exactly: dedupe happens
  * on the HASH value, so a within-doc collision counts once either way.
  * Docs with fewer than `k` words yield an empty array.
  */
case class GramHashes(tokens: Expression, k: Expression, tag: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, k, tag)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }) && k.dataType == IntegerType &&
      k.foldable && tag.foldable &&
      tag.dataType == org.apache.spark.sql.types.StringType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal, string literal), " +
        s"got ${children.map(_.dataType.sql).mkString(", ")}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_hashes"

  private lazy val kV: Int = k.eval().asInstanceOf[Int]
  private lazy val tagBytes: Array[Byte] =
    (tag.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    require(kV >= 1, s"$prettyName needs k >= 1")
    val t = tokens.eval(input)
    if (t == null) return empty
    val arr = t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val m = n - kV + 1
    if (m <= 0) return empty
    // null tokens: see MinHashRow — concatWs skips them like WordKGrams;
    // a 1-gram of a null token joins as ""
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val gram =
        if (kV == 1) {
          val s = toks(j)
          if (s == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else s
        } else org.apache.spark.unsafe.types.UTF8String.concatWs(
          sep, java.util.Arrays.copyOfRange(toks, j, j + kV): _*)
      out(j) = Hash60(tagBytes, gram)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramHashes =
    copy(tokens = newChildren(0), k = newChildren(1), tag = newChildren(2))
}

/** `minhash_agg(base, numHashes)` — MinHash signature as one
  * `array<long>` of `numHashes` minima of the universal-hash family
  * `h_i(x) = (a_i·x + b_i) mod P` over the shared 31-bit base hash
  * (constants from [[graft.operators.Dedup.hashParams]], md5-derived and
  * mirrored as literals into the DuckDB oracle). `base·a < 2^62` so the
  * products never overflow a signed long.
  */
case class MinHashAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private lazy val numHashes: Int = right match {
    case Literal(n, IntegerType) => n.asInstanceOf[Int]
    case _ => throw new IllegalArgumentException(
      "minhash_agg numHashes must be an integer literal")
  }
  private lazy val params: Array[(Long, Long)] =
    (0 until numHashes).map(graft.operators.Dedup.hashParams).toArray
  private val P = graft.operators.Dedup.P

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = (base * params(i)._1 + params(i)._2) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashAgg =
    copy(left = l, right = r)
}
