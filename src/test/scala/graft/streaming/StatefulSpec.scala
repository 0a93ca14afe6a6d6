package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import Stateful.{Event, UserLastEvents, UserRunning, UserTypeCount}

/** flatMapGroupsWithState: cross-micro-batch accumulation and
  * stream/batch parity of the per-user running aggregate.
  */
class StatefulSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, tsMs: Long, value: Double) =
    Event(id, user, new java.sql.Timestamp(tsMs), "click", value)

  private def evT(id: Long, user: Long, typ: String) =
    Event(id, user, new java.sql.Timestamp(1000L * id), typ, 1.0)

  test("ListState last-N events: bounded recency buffer, newer events " +
      "displace older across micro-batches; batch equals a top-N window") {
    // batch parity: arbitrary iterator order, deterministic top-3
    val events = Seq(
      evT(5, 7, "view"), evT(1, 7, "view"), evT(9, 7, "click"),
      evT(3, 7, "view"), evT(2, 8, "view")).toDS()
    val batch = Stateful.userLastEvents(events, n = 3)
      .collect().map(r => (r.user_id, r.rank, r.event_id)).toSet
    // user 7 has ts = id*1000: top-3 by ts desc = ids 9, 5, 3
    assert(batch == Set((7L, 1, 9L), (7L, 2, 5L), (7L, 3, 3L), (8L, 1, 2L)))

    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Stateful.userLastEvents(input.toDS(), n = 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("last_events_out").start()
    try {
      input.addData(evT(1, 7, "view"), evT(5, 7, "view"), evT(3, 7, "view"))
      q.processAllAvailable()
      input.addData(evT(9, 7, "click"), evT(2, 7, "view"))
      q.processAllAvailable()
      val rows = spark.table("last_events_out").as[UserLastEvents].collect()
      // the refreshed batch-2 emission: 9 displaced 1; 2 is too old to enter
      val latest = rows.groupBy(_.rank).map { case (rk, rs) =>
        rk -> rs.maxBy(_.ts_ms).event_id
      }
      assert(latest == Map(1 -> 9L, 2 -> 5L, 3 -> 3L),
        s"state must keep exactly the newest 3: $rows")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("MapState type counts: per-(user, type) accumulation across " +
      "micro-batches; batch invocation equals a plain groupBy count") {
    // batch parity: one invocation per user -> exactly the groupBy count
    val events = Seq(
      evT(1, 7, "view"), evT(2, 7, "view"), evT(3, 7, "click"),
      evT(4, 8, "view")).toDS()
    val batch = Stateful.userTypeCounts(events)
      .collect().map(r => (r.user_id, r.event_type, r.n)).toSet
    assert(batch == Set((7L, "view", 2L), (7L, "click", 1L), (8L, "view", 1L)))

    // streaming: the map accumulates point-wise across batches (RocksDB
    // store — transformWithState requires it for streaming)
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Stateful.userTypeCounts(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("type_counts_out").start()
    try {
      input.addData(evT(1, 7, "view"), evT(2, 7, "view"), evT(3, 8, "click"))
      q.processAllAvailable()
      val b1 = spark.table("type_counts_out").as[UserTypeCount]
        .collect().map(r => (r.user_id, r.event_type) -> r.n).toMap
      assert(b1((7L, "view")) == 2L && b1((8L, "click")) == 1L)

      input.addData(evT(4, 7, "view"), evT(5, 7, "click"))
      q.processAllAvailable()
      val rows = spark.table("type_counts_out").as[UserTypeCount].collect()
      // batch 2 refreshes only the types it touched: view -> 3, click -> 1
      val latest = rows.groupBy(r => (r.user_id, r.event_type))
        .map { case (k, rs) => k -> rs.map(_.n).max }
      assert(latest((7L, "view")) == 3L, "view count must accumulate across batches")
      assert(latest((7L, "click")) == 1L)
      assert(latest((8L, "click")) == 1L)
      // user 8 untouched in batch 2: no new row
      assert(rows.count(_.user_id == 8L) == 1)
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("windowed top-k: incremental MapState leaderboard across THREE " +
      "RocksDB micro-batches; latest-wins equals batch on the union") {
    val winMs = 15L * 60L * 1000L
    def evW(id: Long, tsMs: Long, typ: String) =
      Event(id, 1L, new java.sql.Timestamp(tsMs), typ, 1.0)
    // two windows; type ranks CHANGE across batches (view leads, then
    // click overtakes, then scroll enters) — the case a per-batch
    // re-rank gets for free and incremental state must earn
    val b1 = Seq(evW(1, 0, "view"), evW(2, 10, "view"), evW(3, 20, "click"),
      evW(4, winMs + 1, "view"))
    val b2 = Seq(evW(5, 30, "click"), evW(6, 40, "click"),
      evW(7, winMs + 2, "scroll"), evW(8, winMs + 3, "scroll"))
    val b3 = Seq(evW(9, 50, "scroll"), evW(10, 60, "scroll"),
      evW(11, 70, "scroll"), evW(12, winMs + 4, "view"))
    val all = b1 ++ b2 ++ b3

    // batch invocation on the union (the oracle's shape)
    val batch = Stateful.windowedTopKState(all.toDS(), winMs, k = 2)
      .collect().map(r => (r.ws_ms, r.rnk) -> (r.event_type, r.n)).toMap

    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Stateful.windowedTopKState(input.toDS(), winMs, k = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("win_topk_out").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val rows = spark.table("win_topk_out")
        .as[Stateful.WindowTopK].collect()
      // every touched window re-emits with a bumped version: window 0
      // was touched in all three batches
      assert(rows.filter(_.ws_ms == 0L).map(_.version).max == 3L)
      // latest-wins view: max version per window, then its rows
      val latestVersion = rows.groupBy(_.ws_ms)
        .map { case (ws, rs) => ws -> rs.map(_.version).max }
      val latest = rows
        .filter(r => r.version == latestVersion(r.ws_ms))
        .map(r => (r.ws_ms, r.rnk) -> (r.event_type, r.n)).toMap
      assert(latest == batch,
        s"incremental leaderboard must equal the batch one:\n$latest\nvs\n$batch")
      // and the final window-0 leaderboard reflects the overtakes:
      // scroll 3 > click 3? counts: view 2, click 3, scroll 3 ->
      // (click, 3) rank 1 by type tie-break, (scroll, 3) rank 2
      assert(latest((0L, 1)) == ("click", 3L) &&
        latest((0L, 2)) == ("scroll", 3L))
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("state accumulates across micro-batches, update-mode emits per batch") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Stateful.runningUserTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running_out").start()
    try {
      input.addData(ev(1, 7, 1000, 1.5), ev(2, 7, 2000, 2.25), ev(3, 8, 1500, 10.0))
      q.processAllAvailable()
      val afterB1 = spark.table("running_out").as[UserRunning]
        .collect().map(r => r.user_id -> r).toMap
      assert(afterB1(7).n_events == 2 && afterB1(7).total == 3.75)
      assert(afterB1(8).n_events == 1 && afterB1(8).total == 10.0)

      input.addData(ev(4, 7, 3000, 0.25))
      q.processAllAvailable()
      val rows = spark.table("running_out").as[UserRunning].collect()
      // update mode appends a NEW row for user 7 with the accumulated state
      val latest7 = rows.filter(_.user_id == 7).maxBy(_.n_events)
      assert(latest7.n_events == 3 && latest7.total == 4.0)
      assert(latest7.last_event_ms == 3000)
      // user 8 untouched in batch 2: no new row
      assert(rows.count(_.user_id == 8) == 1)
    } finally q.stop()
  }

  test("batch invocation equals a plain groupBy aggregate (parity)") {
    val events = Seq(
      ev(1, 1, 1000, 1.0), ev(2, 1, 2000, 2.0), ev(3, 2, 500, 5.5)).toDS()
    val got = Stateful.runningUserTotals(events)
      .collect().map(r => (r.user_id, r.n_events, r.total, r.last_event_ms)).toSet
    assert(got == Set((1L, 2L, 3.0, 2000L), (2L, 1L, 5.5, 500L)))
  }

  test("transformWithState twin: batch output equals the flatMapGroupsWithState " +
      "form on the full events table") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "user_id", "ts", "event_type", "value")
      .as[Event]
    val v1 = Stateful.runningUserTotals(events)
      .collect().map(r => r.user_id -> ((r.n_events, r.total, r.last_event_ms))).toMap
    val v2 = Stateful.runningUserTotalsV2(events)
      .collect().map(r => r.user_id -> ((r.n_events, r.total, r.last_event_ms))).toMap
    assert(v2 == v1, "the two stateful APIs must agree row-for-row")
  }

  test("flatMapGroupsWithState on the RocksDB state-store provider matches " +
      "the default-store run (both production backends exercised)") {
    // the first test pins the default (HDFS-backed) provider; this one
    // pins that the SAME operator accumulates identically on the RocksDB
    // store — the provider a production deployment runs for large state
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Stateful.runningUserTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running_rocks_out").start()
    try {
      input.addData(ev(1, 7, 1000, 1.5), ev(2, 7, 2000, 2.25), ev(3, 8, 1500, 10.0))
      q.processAllAvailable()
      input.addData(ev(4, 7, 3000, 0.25))
      q.processAllAvailable()
      val rows = spark.table("running_rocks_out").as[UserRunning].collect()
      val latest7 = rows.filter(_.user_id == 7).maxBy(_.n_events)
      assert(latest7.n_events == 3 && latest7.total == 4.0 &&
        latest7.last_event_ms == 3000,
        s"RocksDB-store accumulation drifted from the default-store run: $latest7")
      assert(rows.count(_.user_id == 8) == 1, "user 8 untouched in batch 2")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("initial-state warm start: snapshot seeds per-key state before any " +
      "input; snapshot-only keys stay silent until their first event (RocksDB)") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val snapshot = Seq(
      UserRunning(7L, 2L, 3.0, 2000L),
      UserRunning(9L, 5L, 50.0, 1500L)).toDS()
    val input = MemoryStream[Event]
    val q = Stateful.runningUserTotalsWarmStart(input.toDS(), snapshot)
      .writeStream.outputMode("update")
      .format("memory").queryName("warm_out").start()
    try {
      // batch 1: only user 7 — continues FROM THE SNAPSHOT (2+1 events),
      // user 9's seeded state exists but emits nothing without input
      input.addData(ev(10, 7, 5000, 0.5))
      q.processAllAvailable()
      val b1 = spark.table("warm_out").as[UserRunning].collect()
      assert(b1.map(_.user_id).toSeq == Seq(7L), s"got ${b1.toSeq}")
      assert(b1.head.n_events == 3L && b1.head.total == 3.5 &&
        b1.head.last_event_ms == 5000L)

      // batch 2: user 9's first event — its SNAPSHOT state (not zero)
      // must be what the increment lands on, proving seeded state
      // survived a batch with no input for that key
      input.addData(ev(11, 9, 6000, 1.0))
      q.processAllAvailable()
      val u9 = spark.table("warm_out").as[UserRunning].collect()
        .filter(_.user_id == 9L)
      assert(u9.length == 1 && u9.head.n_events == 6L &&
        u9.head.total == 51.0 && u9.head.last_event_ms == 6000L,
        s"warm-started user 9: ${u9.toSeq}")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("transformWithState twin: streaming accumulation across micro-batches " +
      "equals v1 (RocksDB state store)") {
    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = Stateful.runningUserTotalsV2(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running_v2_out").start()
    try {
      input.addData(ev(1, 7, 1000, 1.5), ev(2, 7, 2000, 2.25), ev(3, 8, 1500, 10.0))
      q.processAllAvailable()
      input.addData(ev(4, 7, 3000, 0.25))
      q.processAllAvailable()
      val rows = spark.table("running_v2_out").as[UserRunning].collect()
      val latest7 = rows.filter(_.user_id == 7).maxBy(_.n_events)
      assert(latest7.n_events == 3 && latest7.total == 4.0 &&
        latest7.last_event_ms == 3000, s"v2 accumulation drifted: $latest7")
      assert(rows.count(_.user_id == 8) == 1, "user 8 untouched in batch 2")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("CDC latest-wins: out-of-order delivery ignored, tombstones " +
      "block resurrection, idempotent re-delivery emits nothing") {
    import Stateful.{CdcChange, CdcCurrent}
    def ch(k: Long, seq: Long, cid: Long, op: String, st: String) =
      CdcChange(k, seq, cid, op, st, seq * 1.0)
    // batch parity: one invocation per key = the winner pick
    val batch = Stateful.cdcLatest(Seq(
        ch(1, 1, 11, "U", "a"), ch(1, 2, 12, "U", "b"),
        ch(2, 1, 21, "U", "c"), ch(2, 2, 22, "D", "c"),
        ch(3, 2, 31, "U", "x"), ch(3, 2, 32, "U", "y") // same-seq tie
      ).toDS()).collect().map(c => c.key -> ((c.status, c.deleted))).toMap
    assert(batch == Map(1L -> (("b", false)), 2L -> (("c", true)),
      3L -> (("y", false))))

    implicit val sq = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = conf.get(key, "")
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[CdcChange]
    val q = Stateful.cdcLatest(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_latest_out").start()
    try {
      input.addData(ch(1, 3, 13, "U", "v3"), ch(2, 5, 25, "D", "gone"))
      q.processAllAvailable()
      // batch 2: stale update for key 1 (seq 2 < held 3) must be
      // IGNORED; late lower-seq upsert for key 2 must NOT resurrect
      // the tombstone; exact re-delivery of key 1's winner emits
      // nothing new
      input.addData(ch(1, 2, 12, "U", "stale"), ch(2, 4, 24, "U", "zombie"),
        ch(1, 3, 13, "U", "v3"))
      q.processAllAvailable()
      // batch 3: a genuinely newer version for key 1 does update
      input.addData(ch(1, 4, 14, "U", "v4"))
      q.processAllAvailable()
      val rows = spark.table("cdc_latest_out").as[CdcCurrent].collect()
      val k1 = rows.filter(_.key == 1).sortBy(_.seq).map(_.status).toSeq
      assert(k1 == Seq("v3", "v4"),
        s"key 1 must emit v3 then v4, nothing from the stale batch: $rows")
      val k2 = rows.filter(_.key == 2)
      assert(k2.length == 1 && k2.head.deleted && k2.head.seq == 5,
        s"key 2's tombstone must stand — no zombie emission: $rows")
    } finally {
      q.stop()
      if (prev.isEmpty) conf.unset(key) else conf.set(key, prev)
    }
  }
}
