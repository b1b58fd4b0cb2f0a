package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Single definition site for the replay inputs and query parameters
  * shared by `graft.Bench`'s streaming entries and
  * `graft.tools.StreamProbe`. The probe exists to attribute per-batch
  * cost for EXACTLY the query the bench wall-clocks; that attribution is
  * only trustworthy while both derive inputs and parameters here — two
  * hand-kept copies (the pre-round-9 state) could drift silently, leaving
  * the probe explaining a different query than the bench times.
  *
  * All loaders `.collect()` to driver rows by design: the replays feed a
  * bounded `MemoryStream`, and both callers force the collect OUTSIDE
  * their timed regions.
  */
object StreamBenchShapes {

  /** Buys are the click stream shifted forward by this lag (a
    * click→purchase attribution shape for the e6 interval join).
    */
  val buyShiftMs: Long = 600000L

  /** e6 interval-join event-time bounds: a buy matches a click from up
    * to `joinLookback` before it, and a click matches a buy up to
    * `joinLookahead` after it (see `StreamOps.intervalJoin`).
    */
  val joinLookback = "30 minutes"
  val joinLookahead = "10 minutes"

  def loadEvents(spark: SparkSession, sfDir: String): IndexedSeq[StreamOps.Event] =
    graft.catalog.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value").collect().map { r =>
        StreamOps.Event(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))
      }.toIndexedSeq

  /** The documents table carries no timestamp — the near-dup replay
    * synthesizes a deterministic 1-second event-time spacing so the
    * 1-hour state horizon and watermark advance realistically.
    */
  def loadDocs(spark: SparkSession, sfDir: String): IndexedSeq[StreamOps.Doc] =
    graft.catalog.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect().zipWithIndex.map { case (r, i) =>
        StreamOps.Doc(r.getLong(0),
          new java.sql.Timestamp(1700000000000L + i * 1000L),
          if (r.isNullAt(1)) null else r.getString(1))
      }.toIndexedSeq

  /** e6 left input: events as "clicks". Sorted by event time — arrival
    * order drives the watermark, and time-ordered arrival is what
    * exercises steady-state growth AND expiry; random arrival would slam
    * the watermark to near-max in chunk 1 and drop the rest as late
    * rows, measuring nothing.
    */
  def clicksOf(events: IndexedSeq[StreamOps.Event]): IndexedSeq[(Long, java.sql.Timestamp)] =
    events.map(e => (e.user_id, e.ts)).sortBy(_._2.getTime)

  /** e6 right input: the same events shifted +[[buyShiftMs]] with their
    * value as the purchase amount, event-time-sorted (same rationale as
    * [[clicksOf]]).
    */
  def buysOf(events: IndexedSeq[StreamOps.Event]): IndexedSeq[(Long, java.sql.Timestamp, Double)] =
    events.map(e =>
        (e.user_id, new java.sql.Timestamp(e.ts.getTime + buyShiftMs), e.value))
      .sortBy(_._2.getTime)

  /** The e6 stream-stream interval-join query over the two replay inputs. */
  def intervalJoinQuery(
      clicks: Dataset[(Long, java.sql.Timestamp)],
      buys: Dataset[(Long, java.sql.Timestamp, Double)]): DataFrame =
    StreamOps.intervalJoin(
      clicks.toDF("c_user", "c_ts"),
      buys.toDF("b_user", "b_ts", "amount"),
      "c_user", "b_user", "c_ts", "b_ts",
      joinLookback, joinLookahead)
}
