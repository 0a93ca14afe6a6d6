package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import Stateful.{Event, UserSession}

/** EVENT-TIME timers ([[Stateful.SessionEventTimeProcessor]]): the
  * flush timer lives on the DATA's clock — sessions close when the
  * watermark passes `lastEvent + gap`, which makes every assertion here
  * fully deterministic (the watermark advances only with input; no
  * wall-clock sleeps).
  *
  * Batch note: batch transformWithState rejects TimeMode.EventTime
  * (no watermark exists), pinned below — this surface is streaming-only
  * by the engine's own contract.
  */
class EventTimeSessionSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, tsMs: Long, value: Double) =
    Event(id, user, new java.sql.Timestamp(tsMs), "click", value)

  private val RocksKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("watermark-driven flush: sessions close when the watermark passes " +
      "lastEvent + gap; an active key's timer is re-armed, not fired") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val prev = conf.get(RocksKey, "")
    conf.set(RocksKey, RocksProvider)
    val input = MemoryStream[Event]
    // gap 5 s, watermark delay 2 s — all in EVENT time
    val q = Stateful.userSessionsEventTime(input.toDS(), gapMs = 5000L,
        watermarkDelay = "2 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("et_sessions_out").start()
    try {
      def table() = spark.table("et_sessions_out").as[UserSession].collect()

      // batch 1: user 7 at t=10s,12s; user 8 at t=11s.
      // watermark after batch 1 = 12s - 2s = 10s < all expiries -> nothing
      input.addData(ev(1, 7, 10000, 1.5), ev(2, 7, 12000, 2.25),
        ev(3, 8, 11000, 10.0))
      q.processAllAvailable()
      assert(table().isEmpty, "no expiry below the watermark yet")

      // batch 2: user 9 at t=30s -> watermark advances to 28s, passing
      // user 7's expiry (12s+5s=17s) and user 8's (16s): both flushed
      // BY THEIR TIMERS; user 9's own session stays open (35s > 28s)
      input.addData(ev(4, 9, 30000, 1.0))
      q.processAllAvailable()
      val flushed = table().map(r => r.user_id -> r).toMap
      assert(flushed.keySet == Set(7L, 8L), s"got: ${table().toSeq}")
      assert(flushed(7L).n_events == 2L && flushed(7L).total == 3.75 &&
        flushed(7L).first_ms == 10000L && flushed(7L).last_ms == 12000L)
      assert(flushed(8L).n_events == 1L && flushed(8L).total == 10.0)

      // batch 3: user 7 returns at t=40s (fresh session — state was
      // cleared) then t=60s advances the watermark past 40s+5s: the
      // NEW session flushes with only the post-flush event
      input.addData(ev(5, 7, 40000, 0.25))
      q.processAllAvailable()
      input.addData(ev(6, 9, 60000, 1.0))
      q.processAllAvailable()
      val again = table().filter(r => r.user_id == 7L && r.last_ms == 40000L)
      assert(again.length == 1 && again.head.n_events == 1L &&
        again.head.total == 0.25,
        s"fresh event-time session after flush: ${table().toSeq}")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(RocksKey) else conf.set(RocksKey, prev)
    }
  }

  test("late events below the watermark cannot reopen a flushed session") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val prev = conf.get(RocksKey, "")
    conf.set(RocksKey, RocksProvider)
    val input = MemoryStream[Event]
    val q = Stateful.userSessionsEventTime(input.toDS(), gapMs = 5000L,
        watermarkDelay = "2 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("et_sessions_late_out").start()
    try {
      input.addData(ev(1, 7, 10000, 1.5))
      q.processAllAvailable()
      input.addData(ev(2, 9, 30000, 1.0)) // watermark -> 28s: flushes user 7
      q.processAllAvailable()
      val n1 = spark.table("et_sessions_late_out").count()
      assert(n1 == 1, "user 7 flushed")
      // a LATE user-7 event at t=11s (< watermark 28s) is dropped by the
      // watermark filter — no resurrected session, no second flush row
      input.addData(ev(3, 7, 11000, 99.0))
      q.processAllAvailable()
      input.addData(ev(4, 9, 60000, 1.0)) // advance watermark again
      q.processAllAvailable()
      val rows = spark.table("et_sessions_late_out").as[UserSession].collect()
      assert(rows.count(_.user_id == 7L) == 1,
        s"late data must not reopen the session: ${rows.toSeq}")
      assert(!rows.exists(r => r.user_id == 7L && r.total == 99.0))
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(RocksKey) else conf.set(RocksKey, prev)
    }
  }

  test("batch invocation rejects event-time mode (no watermark in batch) — " +
      "the engine contract this surface documents") {
    val events = Seq(ev(1, 7, 1000, 1.0)).toDS()
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get, spark.sessionState.conf)
    val ex = intercept[Exception](
      Stateful.userSessionsEventTime(events, gapMs = 1000L).collect())
    assert(String.valueOf(ex.getMessage).contains("EventTime") ||
      String.valueOf(ex.getCause).contains("EventTime"), String.valueOf(ex))
  }
}
