package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Pins the sessionize state-size contract as OBSERVED state rows in a
  * real streaming query (the TestGroupState specs in StreamOpsSpec pin
  * the per-key transition; this pins the aggregate the 100 TB claim is
  * about): with event-time eviction and timestamp ids, state is bounded
  * by concurrent-active users — users-ever-seen can grow without the
  * store growing — while counter mode (dense ids) retains one dormant
  * marker per user ever seen. `StreamScaleProbe`'s `session_churn` axis
  * measures the same contrast at scale; this spec is its sync pin.
  */
class StreamStateBoundSpec extends SparkSpec {
  import StreamOps._

  private val cohortUsers = 20
  private val gapMin = 30L

  /** W cohorts of K users, each cohort active in its own 90-minute-apart
    * window (> gap + watermark delay): users-ever-seen = W*K, while at
    * most one cohort's sessions are ever open together.
    */
  private def cohortEvents(w: Int, k: Int): Seq[Seq[Event]] = {
    val t0 = 1700000000000L
    (0 until w).map { c =>
      (0 until k).flatMap { u =>
        (0 until 4).map { e =>
          Event(c.toLong * k + u, (c.toLong * k + u) * 8 + e,
            new Timestamp(t0 + c * 90L * 60000L + e * 60000L + u % 7),
            u / 10.0)
        }
      }
    }
  }

  /** Replays one cohort per micro-batch; returns (per-batch state rows,
    * emitted session count).
    */
  private def run(batches: Seq[Seq[Event]],
      mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session],
      name: String): (Seq[Long], Long) = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q: StreamingQuery = mk(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val rowsPerBatch = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        rowsPerBatch += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    (rowsPerBatch.toSeq, spark.table(name).count())
  }

  test("bounded mode: state rows track the cohort, not users-ever-seen") {
    val boundedOp = (ds: org.apache.spark.sql.Dataset[Event]) =>
      sessionize(ds, gapMin, timestampIds = true,
        eventTimeWatermark = Some("1 minute"))
    val (rows2, emitted2) = run(cohortEvents(2, cohortUsers), boundedOp, "sb2")
    val (rows6, emitted6) = run(cohortEvents(6, cohortUsers), boundedOp, "sb6")
    // steady state after each cohort's drain: exactly the live cohort's
    // open sessions — evicted cohorts are REMOVED, not marked
    assert(rows2.last == cohortUsers, s"rows2=$rows2")
    assert(rows6.last == cohortUsers, s"rows6=$rows6")
    // the claim itself: users-ever-seen tripled, state did not grow
    assert(rows6.max <= 2L * cohortUsers,
      s"state must stay within one live + one draining cohort, got ${rows6.max}")
    // every evicted cohort's sessions were flushed downstream (one
    // session per user per cohort), only the final cohort stays open
    assert(emitted2 == (2 - 1).toLong * cohortUsers)
    assert(emitted6 == (6 - 1).toLong * cohortUsers)
  }

  test("counter mode: dormant markers grow with users-ever-seen (the documented trade)") {
    val counterOp = (ds: org.apache.spark.sql.Dataset[Event]) =>
      sessionize(ds, gapMin) // NoTimeout counter mode: nothing evicts
    val (rows6, _) = run(cohortEvents(6, cohortUsers), counterOp, "sc6")
    assert(rows6.last == 6L * cohortUsers,
      s"counter mode retains one record per user ever seen, got ${rows6.last}")
  }

  test("counter mode + event-time eviction: dormant marker survives the flush, ids stay dense") {
    import spark.implicits._
    // the counter-mode contract under the event-time clock: a watermark
    // flush emits the open session but KEEPS the counter as a dormant
    // marker (state rows do not drop), so a user returning after
    // eviction continues 1,2,3... instead of restarting at 1 and
    // colliding with an already-emitted (user, session_id) key
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, min: Long): Event =
      Event(user, id, new Timestamp(t0 + min * 60000L), 1.0)
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMin,
        eventTimeWatermark = Some("1 minute"))
      .writeStream.format("memory").queryName("scnt").outputMode("append")
      .start()
    try {
      input.addData(ev(1, 7, 0), ev(2, 7, 5))
      q.processAllAvailable()
      input.addData(ev(3, 9, 200)) // watermark -> flush user 7's session 1
      q.processAllAvailable()
      val afterFlush = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      input.addData(ev(4, 7, 400)) // user 7 returns after eviction
      input.addData(ev(5, 9, 800)) // watermark far past user 7's return
      q.processAllAvailable()
      val out = spark.table("scnt").as[Session].collect()
        .filter(_.user_id == 7L).sortBy(_.start_us)
      assert(out.map(_.session_id).toSeq == Seq(1L, 2L),
        s"dense ids must continue across the flush, got ${out.toSeq}")
      // the marker holds state for user 7 even though its session closed
      assert(afterFlush >= 2, s"dormant marker must persist, state=$afterFlush")
    } finally q.stop()
  }

  test("event-time eviction emits exactly the gap-rule sessions with monotonic ids") {
    import spark.implicits._
    // one user, two sessions split by a > gap quiet period, then a third
    // user-2 session driving the watermark past both
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, min: Long): Event =
      Event(user, id, new Timestamp(t0 + min * 60000L), 1.0)
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMin, timestampIds = true,
        eventTimeWatermark = Some("1 minute"))
      .writeStream.format("memory").queryName("sevt").outputMode("append")
      .start()
    try {
      input.addData(ev(1, 7, 0), ev(2, 7, 10))
      q.processAllAvailable()
      input.addData(ev(3, 7, 100)) // 90-min gap: new session for user 7
      q.processAllAvailable()
      input.addData(ev(4, 9, 300)) // watermark passes 100+30+1 -> flush user 7
      q.processAllAvailable()
      val out = spark.table("sevt").as[Session].collect().sortBy(_.start_us)
      // session 1 closed by the gap rule when ev(3) arrived; session 2
      // flushed by the WATERMARK passing its end+gap (no later user-7
      // event exists); user 9 still open
      assert(out.map(_.user_id).toSeq == Seq(7L, 7L))
      assert(out(0).n_events == 2 && out(1).n_events == 1)
      assert(out(0).session_id < out(1).session_id, "start-us ids stay monotonic")
      assert(out(0).session_id == (t0 + 0L) * 1000L) // start-us of the first event
    } finally q.stop()
  }
}
