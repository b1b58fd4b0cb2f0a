package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Diagnostic main for the streaming bench entries: replays one StreamOps
  * operator exactly the way `graft.Bench` does (bounded MemoryStream,
  * ~10 real micro-batches, noop sink) and prints the per-batch
  * `StreamingQueryProgress` duration breakdown plus the state operator's
  * custom metrics — the data needed to attribute wall-clock between query
  * planning, state-store load/commit, and the actual work.
  *
  * Knobs (env): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_STATE_STORE
  * (rocksdb|hdfs), SPARK_GRAFT_CPUS (threads), SPARK_GRAFT_PARTS
  * (shuffle/state partitions; default = cpus), SPARK_GRAFT_PROBE_OP
  * (rollup|sessionize|neardedup), SPARK_GRAFT_BATCHES (default 10).
  *
  * Not part of any pipeline or bench artifact — a profiling tool only.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb")
    val op = sys.env.getOrElse("SPARK_GRAFT_PROBE_OP", "rollup")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.expr.catalyst.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (stateStore == "rocksdb") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    }

    implicit val eventEnc: Encoder[graft.streaming.StreamOps.Event] =
      Encoders.product[graft.streaming.StreamOps.Event]
    implicit val docEnc: Encoder[graft.streaming.StreamOps.Doc] =
      Encoders.product[graft.streaming.StreamOps.Doc]
    implicit val sc = spark.sqlContext

    def replay[T](rows: IndexedSeq[T], mk: Dataset[T] => Dataset[_])(
        implicit enc: Encoder[T]): Unit = {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_ckpt")
      val q = mk(in.toDS()).writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        rows.grouped(math.max(1, rows.length / nBatches)).foreach { b =>
          val tb = System.nanoTime()
          in.addData(b)
          q.processAllAvailable()
          val batchSec = (System.nanoTime() - tb) / 1e9
          val p = q.lastProgress
          if (p != null) {
            val dur = p.durationMs
            val so = p.stateOperators.headOption
            val custom = so.map(_.customMetrics).map { m =>
              import scala.jdk.CollectionConverters._
              m.asScala.filter(_._2 != 0L).map { case (k, v) => s"$k=$v" }
                .toSeq.sorted.mkString(" ")
            }.getOrElse("")
            println(f"batch=${p.batchId}%3d wall=${batchSec}%6.2fs " +
              s"durationMs=${dur} rows=${p.numInputRows} " +
              so.map(s => s"stateRows=${s.numRowsTotal} commitMs=${s.commitTimeMs} " +
                s"custom[$custom]").getOrElse(""))
          }
        }
      } finally {
        q.stop()
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(ckpt.toFile)
      }
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"op=$op store=$stateStore parts=$parts cpus=$cpus batches=$nBatches")
    }

    val eventRows: IndexedSeq[graft.streaming.StreamOps.Event] =
      graft.catalog.Tables.load(spark, sfDir, "events")
        .select("user_id", "event_id", "ts", "value").collect().map { r =>
          graft.streaming.StreamOps.Event(
            r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))
        }.toIndexedSeq
    lazy val docRows: IndexedSeq[graft.streaming.StreamOps.Doc] =
      graft.catalog.Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text").collect().zipWithIndex.map { case (r, i) =>
          graft.streaming.StreamOps.Doc(r.getLong(0),
            new java.sql.Timestamp(1700000000000L + i * 1000L),
            if (r.isNullAt(1)) null else r.getString(1))
        }.toIndexedSeq

    op match {
      case "rollup" =>
        replay(eventRows,
          (ds: Dataset[graft.streaming.StreamOps.Event]) =>
            graft.streaming.StreamOps.hourlyRollup(ds.toDF()))
      case "sessionize" =>
        replay(eventRows,
          (ds: Dataset[graft.streaming.StreamOps.Event]) =>
            graft.streaming.StreamOps.sessionize(ds))
      case "neardedup" =>
        replay(docRows,
          (ds: Dataset[graft.streaming.StreamOps.Doc]) =>
            graft.streaming.StreamOps.streamingNearDedup(ds))
      case other => sys.error(s"unknown SPARK_GRAFT_PROBE_OP $other")
    }
    spark.stop()
  }
}
