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
}
