package graft.pipeline

import graft.SparkSpec
import graft.catalog.Lake
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("corpus pipeline: annotate -> dedup -> sample -> stats funnel is consistent") {
    val root = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val lake = new Lake(spark, root)
    import spark.implicits._
    // plant a repetitious spam doc: the Gopher-style gate must drop it
    val spam = Seq((800001L, Array.fill(30)("buy now").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(spam)
    val nDocs = docs.count()

    // plant a leaked eval doc (verbatim copy of a corpus doc) plus a
    // clearly novel one
    val firstText = docs.orderBy("doc_id").first().getString(1)
    val evalDocs = Seq(
      (900001L, firstText),
      (900002L, "zx qv wk jh pq mn bt cd ef gh")).toDF("doc_id", "text")

    new CorpusPipeline(spark, lake)
      .run(docs, Map("en" -> 0.5, "de" -> 0.5), defaultRate = 0.9,
        evalDocs = Some(evalDocs))

    val ann = lake.table("doc_annotations")
    val clusters = lake.table("doc_clusters")
    val sample = lake.table("corpus_sample")
    val stats = lake.table("corpus_stats")

    assert(ann.count() == nDocs && clusters.count() == nDocs)

    // cluster sanity: every canonical id is kept, dups point at kept docs
    val kept = clusters.filter(!col("is_dup"))
    val canonOfDups = clusters.filter(col("is_dup")).select(col("canon_id").as("doc_id")).distinct()
    assert(canonOfDups.join(kept, "doc_id").count() == canonOfDups.count())

    // the sample only contains kept docs
    assert(sample.join(kept.select("doc_id"), "doc_id").count() == sample.count())

    // funnel per language: sampled <= kept <= docs; totals add up
    val bad = stats.filter(col("n_sampled") > col("n_kept") ||
      col("n_kept") > col("n_docs")).count()
    assert(bad == 0)
    assert(stats.agg(sum("n_docs")).first().getLong(0) == nDocs)
    assert(stats.agg(sum("n_sampled")).first().getLong(0) == sample.count())

    // annotations carry a finite LM score for every doc
    assert(ann.filter(col("lm_score").isNull || isnan(col("lm_score"))).count() == 0)

    // segment scrub: no 10-word segment appears twice across the sampled
    // corpus (the scrub guarantees this for the kept corpus; the sample
    // is a subset)
    val dupSegs = sample
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(posexplode(expr(
        "transform(sequence(0, cast(ceil(size(ws)/10.0) as int) - 1)," +
          " i -> array_join(slice(ws, i*10 + 1, 10), ' '))")))
      .groupBy("col").count().filter(col("count") > 1).count()
    assert(dupSegs == 0, "sampled corpus still contains duplicated segments")

    // the planted spam doc is flagged repetitive and filtered before
    // sampling; the organic corpus (random-word docs) is not flagged
    assert(ann.filter(col("doc_id") === 800001L).first().getAs[Boolean]("repetitive"))
    assert(sample.filter(col("doc_id") === 800001L).count() == 0)
    assert(ann.filter(col("repetitive")).count() < nDocs / 2)

    // decontamination: the verbatim copy is fully leaked, the novel doc not
    val cont = lake.table("eval_contamination").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cont.size == 2)
    assert(cont(900001L)._1 > 0 && cont(900001L)._2 == cont(900001L)._1)
    assert(cont(900002L)._2 == 0L)

    // deterministic: a rerun into a fresh lake produces the same sample
    val root2 = java.nio.file.Files.createTempDirectory("graft_corpus2").toString
    val lake2 = new Lake(spark, root2)
    new CorpusPipeline(spark, lake2)
      .run(docs, Map("en" -> 0.5, "de" -> 0.5), defaultRate = 0.9)
    val ids1 = sample.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = lake2.table("corpus_sample").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(ids1.toSeq == ids2.toSeq)
  }
}
