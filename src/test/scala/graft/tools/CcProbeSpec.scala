package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins CcProbe's synthetic-graph generators against brute force: the
  * probe VERIFIES the component operators against the generators'
  * closed-form label formulas, so a generator and its formula drifting
  * together (e.g. an off-by-one turning chains into forests of shorter
  * chains) would make every probe check green while measuring the
  * wrong graph shape. Here an independent in-test union-find recomputes
  * the components of the generated edge lists and must agree with the
  * formula exactly.
  */
class CcProbeSpec extends SparkSpec {

  private def bruteLabels(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("star generator: closed-form labels match brute-force components") {
    val e = 40L // 10 hubs of 4 leaves
    val edges = CcProbe.starEdges(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = CcProbe.starNodes(spark, e).collect().map(_.getLong(0)).toSeq
    assert(edges.size == e && nodes.size == e / 4 * 5)
    val brute = bruteLabels(edges, nodes)
    val formula = CcProbe.starNodes(spark, e)
      .select(col("doc_id"), expr(CcProbe.starExpected).as("lbl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute == formula)
  }

  test("chain generator: closed-form labels match brute force at several lengths") {
    for (len <- Seq(3, 5, 8)) {
      val e = len * 6L // 6 chains
      val edges = CcProbe.chainEdges(spark, e, len)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val nodes = CcProbe.chainNodes(spark, e, len).collect().map(_.getLong(0)).toSeq
      assert(edges.size == e && nodes.size == e / len * (len + 1), s"len=$len")
      // every chain must really have diameter len: max hop distance from
      // the head equals len within each component
      val brute = bruteLabels(edges, nodes)
      val formula = CcProbe.chainNodes(spark, e, len)
        .select(col("doc_id"), expr(CcProbe.chainExpected(len)).as("lbl"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(brute == formula, s"len=$len")
      val spans = brute.groupBy(_._2).values.map(c => c.keys.max - c.keys.min)
      assert(spans.forall(_ == len.toLong), s"len=$len: a chain is broken")
    }
  }

  test("permuted-chain generator: same components and PATH shape as the monotone chains, different id ordering") {
    for (len <- Seq(3, 7, 16)) { // len+1 coprime with the stride 3
      val e = len * 6L
      val edges = CcProbe.chainEdgesPermuted(spark, e, len)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val nodes = CcProbe.chainNodes(spark, e, len).collect().map(_.getLong(0)).toSeq
      assert(edges.size == e && edges.distinct.size == e, s"len=$len")
      val brute = bruteLabels(edges, nodes)
      val formula = CcProbe.chainNodes(spark, e, len)
        .select(col("doc_id"), expr(CcProbe.chainExpected(len)).as("lbl"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(brute == formula, s"len=$len")
      // each component must still be a simple PATH of diameter len:
      // len+1 nodes, len edges, exactly two degree-1 endpoints
      val deg = edges.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      brute.groupBy(_._2).foreach { case (lbl, comp) =>
        assert(comp.size == len + 1, s"len=$len comp=$lbl")
        val degs = comp.keys.toSeq.map(deg).sorted
        assert(degs.count(_ == 1) == 2 && degs.forall(_ <= 2),
          s"len=$len comp=$lbl is not a simple path: $degs")
      }
      // ...and the generator must actually permute: the edge SET must
      // differ from the monotone generator's (else the axis re-measures
      // the graphs the ordering-sensitive proxy is already exact on)
      val monotone = CcProbe.chainEdges(spark, e, len)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toSet != monotone, s"len=$len: permutation is the identity")
    }
  }

  test("off-center star generator: min-label components unchanged, hub mid-block") {
    val e = 40L
    val edges = CcProbe.starEdgesOffcenter(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = CcProbe.starNodes(spark, e).collect().map(_.getLong(0)).toSeq
    assert(edges.size == e)
    val brute = bruteLabels(edges, nodes)
    val formula = CcProbe.starNodes(spark, e)
      .select(col("doc_id"), expr(CcProbe.starExpected).as("lbl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute == formula)
    // the hub really is 5g+2 (degree 4), so the canonical a < b edge
    // form has the hub on BOTH sides and the forest read-off cannot fire
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
    (0L until e / 4).foreach { g =>
      assert(deg(5 * g + 2) == 4, s"group $g hub degree")
      assert(!deg.contains(5 * g) || deg(5 * g) == 1, s"group $g min is a leaf")
    }
  }

  test("mixture generator: one deep chain diluted by 2-edge paths, closed form matches brute force") {
    val deepLen = 6
    val e = 20L // 7 shallow paths + the 6-edge chain
    val edges = CcProbe.mixtureEdges(spark, e, deepLen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = CcProbe.mixtureNodes(spark, e, deepLen)
      .collect().map(_.getLong(0)).toSeq
    assert(edges.size == e && nodes.size == (deepLen + 1) + 3 * 7)
    val brute = bruteLabels(edges, nodes)
    val formula = CcProbe.mixtureNodes(spark, e, deepLen)
      .select(col("doc_id"), expr(CcProbe.mixtureExpected(deepLen)).as("lbl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute == formula)
    // shape: exactly one component of deepLen+1 nodes, the rest size 3
    val sizes = brute.groupBy(_._2).values.map(_.size).toSeq.sorted
    assert(sizes == (Seq.fill(7)(3) :+ (deepLen + 1)).sorted)
  }
}
