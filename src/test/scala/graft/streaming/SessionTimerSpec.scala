package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{TTLConfig, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import Stateful.{Event, UserSession}

/** transformWithState TIMERS ([[Stateful.SessionTimeoutProcessor]]):
  * the closed session is emitted only from `handleExpiredTimer`, so
  * these tests pin (a) the batch degenerate form (gap 0 → every timer
  * processed at end-of-batch → per-user aggregate THROUGH the timer
  * path; gap > 0 → nothing emitted in batch), (b) the streaming flush:
  * a key with NO further input is flushed by its expired timer alone,
  * and its state cleared, and (c) the TTL×timer corner: state that
  * TTL-expires under a still-armed timer fires the timer on an empty
  * key and emits nothing.
  *
  * Harness note: with `TimeMode.ProcessingTime` the micro-batch engine
  * ALWAYS "requires another batch" (each batch advances the timer
  * clock), so `noNewData` is never set and `processAllAvailable()`
  * never returns — these tests pace the engine with a 200 ms
  * processing-time trigger and POLL the memory sink under a deadline
  * instead. That is also the stronger pin: the flush batch has no
  * input at all — the timer alone produces it.
  */
class SessionTimerSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, tsMs: Long, value: Double) =
    Event(id, user, new java.sql.Timestamp(tsMs), "click", value)

  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Poll until `cond` holds (deadline-bounded busy wait — the engine
    * triggers every 200 ms, so 100 ms polling oversamples enough).
    */
  private def awaitCond(what: String, timeoutMs: Long = 30000L)
      (cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(cond, s"not within ${timeoutMs} ms: $what")
  }

  test("batch gap=0: every session closes through handleExpiredTimer and " +
      "equals the per-user aggregate; gap>0 emits nothing in batch") {
    val events = Seq(ev(1, 7, 1000, 1.5), ev(2, 7, 2000, 2.25),
      ev(3, 8, 1500, 10.0)).toDS()
    val got = Stateful.userSessions(events, gapMs = 0L)
      .collect().map(r => (r.user_id, r.n_events, r.total, r.first_ms, r.last_ms))
      .toSet
    assert(got == Set((7L, 2L, 3.75, 1000L, 2000L), (8L, 1L, 10.0, 1500L, 1500L)))
    // a real gap: the flush moment is after the single batch ends — the
    // batch run emits nothing (sessions are still "open")
    assert(Stateful.userSessions(events, gapMs = 3600000L).collect().isEmpty)
  }

  test("streaming: an idle key is flushed BY THE TIMER (no input in the " +
      "flush batch), state cleared so the next event starts a fresh session") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val prev = conf.get(RocksKey, "")
    conf.set(RocksKey, RocksProvider)
    val input = MemoryStream[Event]
    val gapMs = 1000L
    val q = Stateful.userSessions(input.toDS(), gapMs)
      .writeStream.outputMode("update")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .format("memory").queryName("sessions_out").start()
    try {
      def table() = spark.table("sessions_out").as[UserSession].collect()

      // two events for user 7 — processed, but input NEVER emits
      input.addData(ev(1, 7, 1000, 1.5), ev(2, 7, 2000, 2.25))
      awaitCond("batch 1 processed") {
        q.recentProgress.map(_.numInputRows).sum >= 2
      }
      assert(table().isEmpty,
        "input batches must not emit — the timer is the only emission path")

      // NO further input: after the gap, user 7's session must be
      // flushed by its expired timer alone (the engine keeps running
      // timer-service batches with zero input rows)
      awaitCond("timer flushed user 7") {
        table().exists(_.user_id == 7L)
      }
      val flushed = table()
      assert(flushed.map(_.user_id).toSeq == Seq(7L), s"got: ${flushed.toSeq}")
      assert(flushed.head.n_events == 2L && flushed.head.total == 3.75 &&
        flushed.head.first_ms == 1000L && flushed.head.last_ms == 2000L)

      // user 7 returns: state was cleared at flush, so the next flush
      // is a fresh single-event session, not an accumulation
      input.addData(ev(4, 7, 9000, 0.25))
      awaitCond("fresh session flushed") {
        table().exists(r => r.user_id == 7L && r.last_ms == 9000L)
      }
      val again = table().filter(r => r.user_id == 7L && r.last_ms == 9000L)
      assert(again.length == 1 && again.head.n_events == 1L &&
        again.head.total == 0.25,
        s"fresh session after flush, not accumulation: ${again.toSeq}")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(RocksKey) else conf.set(RocksKey, prev)
    }
  }

  test("TTL x timer: state that TTL-expires under a still-armed timer fires " +
      "the timer on an empty key and emits nothing (no zero-session rows)") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val prev = conf.get(RocksKey, "")
    conf.set(RocksKey, RocksProvider)
    val input = MemoryStream[Event]
    // TTL (200 ms) < gap (1 s): by flush time the session state is gone
    val q = Stateful.userSessions(input.toDS(), gapMs = 1000L,
        ttl = TTLConfig(java.time.Duration.ofMillis(200)))
      .writeStream.outputMode("update")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .format("memory").queryName("sessions_ttl_out").start()
    try {
      val t0 = System.currentTimeMillis
      input.addData(ev(1, 7, 1000, 1.5))
      awaitCond("batch 1 processed") {
        q.recentProgress.map(_.numInputRows).sum >= 1
      }
      // wait well past the flush moment (same schedule as the non-TTL
      // test, which DOES emit): several timer-service batches must have
      // run after the 1 s expiry
      awaitCond("timer-service batches ran past the flush moment") {
        System.currentTimeMillis > t0 + 3000 && q.recentProgress.nonEmpty
      }
      val rows = spark.table("sessions_ttl_out").as[UserSession].collect()
      assert(rows.isEmpty,
        s"TTL-expired state must not produce a session: ${rows.toSeq}")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(RocksKey) else conf.set(RocksKey, prev)
    }
  }
}
