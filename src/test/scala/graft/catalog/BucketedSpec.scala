package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans without a shuffle exchange") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val dims = (0 until 50).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    Bucketed.write(facts, "b_facts", s"$dir/facts", 8, Seq("k"))
    Bucketed.write(dims, "b_dims", s"$dir/dims", 8, Seq("k"))

    // force SMJ (no broadcast) to show the bucket layout is what removes
    // the shuffle, then check the executed plan has no Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.table(spark, "b_facts")
        .join(Bucketed.table(spark, "b_dims"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rewriting a layout at the same path works, even reading its own files") {
    val dir = Files.createTempDirectory("graft_bucketed3").toString
    val facts = (1 to 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "id")
    Bucketed.write(facts, "b_rw", s"$dir/t", 4, Seq("k"))
    // re-bucket FROM its own files: staging materializes before the old
    // layout is deleted, so this must not lose data
    val fromSelf = Bucketed.table(spark, "b_rw").filter($"id" % 2 === 0)
    Bucketed.write(fromSelf, "b_rw", s"$dir/t", 4, Seq("k"))
    assert(Bucketed.table(spark, "b_rw").count() == 50)
    // the recreated metadata still carries the bucket spec: a self-join
    // plans without any shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketed.table(spark, "b_rw").join(
        Bucketed.table(spark, "b_rw").groupBy("k").count(), "k")
      j.count()
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("joining a bucketed with an unbucketed side shuffles only that side") {
    val dir = Files.createTempDirectory("graft_bucketed2").toString
    val facts = (1 to 400).map(i => (i.toLong % 20, i.toLong)).toDF("k", "id")
    Bucketed.write(facts, "b_facts2", s"$dir/facts", 4, Seq("k"))
    val other = (0 until 20).map(i => (i.toLong, s"x_$i")).toDF("k", "x")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.table(spark, "b_facts2").join(other, "k")
      assert(joined.count() == 400)
      val plan = joined.queryExecution.executedPlan.toString
      // exactly one side shuffles: one hashpartitioning exchange, not two
      val n = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(n == 1, s"expected 1 exchange, got $n\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
