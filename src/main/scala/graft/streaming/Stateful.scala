package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state via `flatMapGroupsWithState` (the engine's
  * stateful-extension point, SURVEY §2.7/§2.8): a per-user running
  * aggregate that survives across micro-batches and times out after a
  * configurable inactivity period (PROCESSING-time / wall-clock — the
  * right bound for live streams; replays of historical event time keep
  * state until the wall clock moves on), so state size is bounded no
  * matter how many keys flow past — the 100 TB-safe shape for custom
  * streaming state.
  *
  * Works identically on a batch Dataset (single invocation per key, no
  * state carried) — stream/batch parity is pinned by StatefulSpec.
  */
object Stateful {

  /** Input row shape (the events table). */
  final case class Event(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, event_type: String, value: Double)

  /** Running per-user aggregate. `total` is kept in micros (long) inside
    * the state so cross-batch accumulation is exact, surfaced as double.
    */
  final case class UserRunning(user_id: Long, n_events: Long, total: Double,
      last_event_ms: Long)

  /** Internal accumulator state (public: encoder codegen needs an
    * accessible constructor).
    */
  final case class St(n: Long, totalMicros: Long, lastMs: Long)

  /** One updated [[UserRunning]] row per user per micro-batch (update
    * output mode). Pass `inactivityMs` to evict a user's state that long
    * after its last activity (processing-time timeout) — that bounds
    * state at production scale but keeps the query triggering between
    * data arrivals, so tests that rely on `processAllAvailable`
    * quiescing use the default (no timeout).
    */
  def runningUserTotals(events: Dataset[Event],
      inactivityMs: Option[Long] = None): Dataset[UserRunning] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = if (inactivityMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[St, UserRunning](OutputMode.Update, timeoutConf) {
        case (userId, rows, state: GroupState[St]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(St(0L, 0L, 0L))
            var n = prev.n
            var total = prev.totalMicros
            var last = prev.lastMs
            rows.foreach { e =>
              n += 1
              total += math.round(e.value * 1e6)
              last = math.max(last, e.ts.getTime)
            }
            val next = St(n, total, last)
            state.update(next)
            inactivityMs.foreach(state.setTimeoutDuration)
            Iterator.single(UserRunning(userId, n, total / 1e6, last))
          }
      }
  }

  /** The same running aggregate on Spark 4's `transformWithState` API —
    * the arbitrary-state successor to `flatMapGroupsWithState`: typed
    * [[ValueState]] handles from a [[StatefulProcessor]], per-state TTL
    * instead of a per-key timeout conf, and (unlike GroupState) support
    * for several independent state variables per key. Kept
    * arithmetic-identical to [[runningUserTotals]] so the two APIs are
    * differential twins: StatefulSpec asserts both produce the same
    * rows on batch AND that the v2 streaming run accumulates across
    * micro-batches exactly like v1.
    *
    * State-store note: streaming `transformWithState` requires the
    * RocksDB state-store provider (set
    * `spark.sql.streaming.stateStore.providerClass` before starting the
    * query); batch invocation needs no store. TTL (`ttl`) bounds state
    * at 100 TB the way v1's processing-time timeout does.
    */
  class RunningTotalsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("running", Encoders.product[St], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (st.exists()) st.get() else St(0L, 0L, 0L)
      var n = prev.n
      var total = prev.totalMicros
      var last = prev.lastMs
      rows.foreach { e =>
        n += 1
        total += math.round(e.value * 1e6)
        last = math.max(last, e.ts.getTime)
      }
      val next = St(n, total, last)
      st.update(next)
      Iterator.single(UserRunning(userId, n, total / 1e6, last))
    }
  }

  /** Per-(user, event_type) running counts on `transformWithState`'s
    * MAP state — the state shape [[RunningTotalsProcessor]]'s single
    * ValueState can't express: one keyed sub-map per user, updated
    * point-wise (a hot user's state grows with its TYPE vocabulary,
    * not its event count, and RocksDB stores each map entry as its own
    * key — no read-modify-write of a monolithic blob per event batch).
    * Emits, per micro-batch, one refreshed row per (user, type) seen
    * in that batch. Batch invocation (one call per user) degenerates
    * to a plain groupBy count — the oracle-checkable twin.
    */
  final case class UserTypeCount(user_id: Long, event_type: String, n: Long)

  class TypeCountsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, UserTypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, ttl)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserTypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val t = e.event_type
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + 1L)
        touched += t
      }
      touched.iterator.map(t => UserTypeCount(userId, t, counts.getValue(t)))
    }
  }

  def userTypeCounts(events: Dataset[Event],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTypeCount] = {
    implicit val outEnc = Encoders.product[UserTypeCount]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user LAST-N event retention on `transformWithState`'s LIST
    * state — the third and last state primitive (ValueState
    * `st_user_totals_v2`, MapState `st_type_counts`, ListState here):
    * a bounded recency buffer per key, the "recent context" shape a
    * session-aware pipeline keeps per user. State is CAPPED at `n`
    * entries regardless of how many events flow past — the
    * bounded-state discipline every stateful op in this engine holds.
    * Order is total ((ts, event_id) descending), so batch invocation —
    * one call per key over arbitrarily-ordered rows — is deterministic
    * and degenerates to a per-user top-N window, the oracle.
    */
  final case class RecentEvent(ts_ms: Long, event_id: Long)
  final case class UserLastEvents(user_id: Long, event_id: Long,
      ts_ms: Long, rank: Int)

  class LastEventsProcessor(n: Int)
      extends StatefulProcessor[Long, Event, UserLastEvents] {
    require(n > 0, "n must be positive")
    @transient private var recent: ListState[RecentEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[RecentEvent]("recent",
        Encoders.product[RecentEvent], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserLastEvents] = {
      val prev = if (recent.exists()) recent.get().toArray else Array.empty[RecentEvent]
      val merged = (prev.iterator ++
          rows.map(e => RecentEvent(e.ts.getTime, e.event_id)))
        .toArray
        .sortBy(r => (-r.ts_ms, -r.event_id))
        .take(n)
      recent.put(merged)
      merged.iterator.zipWithIndex.map { case (r, i) =>
        UserLastEvents(userId, r.event_id, r.ts_ms, i + 1)
      }
    }
  }

  def userLastEvents(events: Dataset[Event], n: Int): Dataset[UserLastEvents] = {
    implicit val outEnc = Encoders.product[UserLastEvents]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events.groupByKey(_.user_id)
      .transformWithState(new LastEventsProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }

  /** Incrementally-maintained per-window top-k leaderboard on
    * `transformWithState` — the in-place successor to the foreachBatch
    * re-rank of `tw_windowed_topk` (documented there as not
    * incrementally maintainable): state is keyed by WINDOW START, a
    * `MapState` holds that window's per-type running counts (RocksDB
    * stores each type as its own key — an update touches one entry,
    * never a monolithic blob), and each micro-batch emits the window's
    * REFRESHED top-k with a bumped `version`, so a latest-wins consumer
    * (max version per window) always holds the current leaderboard.
    *
    * Bounded state: per window, the map is bounded by the event-TYPE
    * vocabulary (constant-ish), not the event count — exact top-k
    * genuinely requires all type counts (a type outside today's top-k
    * can climb in tomorrow), so "MapState of the full type histogram,
    * emit k" is the smallest exact design. Window keys are bounded by
    * retention (pair with a TTL at 100 TB).
    *
    * Order is total (count desc, type asc), so batch invocation — one
    * call per window over all its rows — emits version-1 rows equal to
    * the batch `windowedTopK`, the oracle.
    */
  final case class WinTypeEvent(ws_ms: Long, event_type: String)
  final case class WindowTopK(ws_ms: Long, we_ms: Long, rnk: Int,
      event_type: String, n: Long, version: Long)

  class WindowedTopKProcessor(windowMs: Long, k: Int,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, WinTypeEvent, WindowTopK] {
    require(k >= 1 && k <= 1000, s"k in 1..1000, got $k")
    require(windowMs > 0, "windowMs must be positive")
    @transient private var counts: MapState[String, Long] = _
    @transient private var version: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, ttl)
      version = getHandle.getValueState[Long]("version",
        Encoders.scalaLong, ttl)
    }

    override def handleInputRows(wsMs: Long, rows: Iterator[WinTypeEvent],
        timers: TimerValues): Iterator[WindowTopK] = {
      rows.foreach { e =>
        val prev = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, prev + 1L)
      }
      val v = (if (version.exists()) version.get() else 0L) + 1L
      version.update(v)
      val top = counts.iterator().toArray
        .sortBy { case (t, n) => (-n, t) }
        .take(k)
      top.iterator.zipWithIndex.map { case ((t, n), i) =>
        WindowTopK(wsMs, wsMs + windowMs, i + 1, t, n, v)
      }
    }
  }

  def windowedTopKState(events: Dataset[Event], windowMs: Long,
      k: Int, ttl: TTLConfig = TTLConfig.NONE): Dataset[WindowTopK] = {
    implicit val inEnc = Encoders.product[WinTypeEvent]
    implicit val outEnc = Encoders.product[WindowTopK]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events
      .map(e => WinTypeEvent(
        Math.floorDiv(e.ts.getTime, windowMs) * windowMs, e.event_type))
      .groupByKey(_.ws_ms)
      .transformWithState(new WindowedTopKProcessor(windowMs, k, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Session flush driven by TIMERS — the last piece of the
    * `transformWithState` API surface (state: `st_user_totals_v2` /
    * `st_type_counts` / `st_last_events`; timers: here): accumulate a
    * per-user session (count, exact micros total, first/last event ms)
    * and emit NOTHING on input — the closed session is emitted only
    * from [[StatefulProcessor.handleExpiredTimer]] when the
    * processing-time flush timer fires, `gapMs` after the key's last
    * activity. Each input batch re-arms the timer (delete stale,
    * register `now + gapMs`), so exactly one live timer per key — the
    * production sessionizer shape: state AND timer count are both
    * O(active keys), and an idle key is flushed and cleared by the
    * engine without any further input.
    *
    * Batch invocation: every key's input arrives in the single batch,
    * the registered timer (expiry `now + gapMs`) is processed at the
    * end of that batch against the fixed batch timestamp, so with
    * `gapMs <= 0` every session closes THROUGH THE TIMER PATH and the
    * result degenerates to a plain per-user aggregate — the
    * DuckDB-checkable oracle (`st_session_timeout`). With `gapMs > 0`
    * a batch run emits nothing (the flush moment is after the batch
    * ends — exactly the streaming semantics restricted to one batch).
    */
  final case class SessSt(n: Long, totalMicros: Long, firstMs: Long, lastMs: Long)
  final case class UserSession(user_id: Long, n_events: Long, total: Double,
      first_ms: Long, last_ms: Long)

  class SessionTimeoutProcessor(gapMs: Long, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, UserSession] {
    @transient private var sess: ValueState[SessSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessSt]("session",
        Encoders.product[SessSt], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserSession] = {
      val prev = if (sess.exists()) sess.get()
        else SessSt(0L, 0L, Long.MaxValue, Long.MinValue)
      var n = prev.n
      var total = prev.totalMicros
      var first = prev.firstMs
      var last = prev.lastMs
      rows.foreach { e =>
        n += 1
        total += math.round(e.value * 1e6)
        first = math.min(first, e.ts.getTime)
        last = math.max(last, e.ts.getTime)
      }
      sess.update(SessSt(n, total, first, last))
      // one live flush timer per key: drop the stale one, re-arm at
      // now + gap (activity extends the session)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
      // TTL interplay: state may have expired underneath a still-armed
      // timer (TTL < gap, or a late re-arm) — the timer then fires on
      // an empty key and must emit nothing, not a zero session
      if (!sess.exists()) Iterator.empty
      else {
        val s = sess.get()
        sess.clear()
        Iterator.single(UserSession(userId, s.n, s.totalMicros / 1e6,
          s.firstMs, s.lastMs))
      }
    }
  }

  /** [[SessionTimeoutProcessor]] wired up: processing-time mode (timers
    * require it), update output. `gapMs <= 0` is the batch-oracle form;
    * a streaming run uses a real inactivity gap.
    */
  def userSessions(events: Dataset[Event], gapMs: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs, ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** EVENT-TIME twin of [[SessionTimeoutProcessor]]: the flush timer is
    * registered at `lastEventTs + gapMs` in EVENT time and fires when
    * the WATERMARK passes it — the replay-safe sessionizer (a backfill
    * over historical data closes sessions by the data's own clock, not
    * the wall clock; the processing-time form would hold every session
    * open until real time moved on). Same state shape, same
    * one-live-timer-per-key re-arm discipline.
    *
    * No batch twin: batch `transformWithState` has no watermark and
    * rejects `TimeMode.EventTime` outright (INTERNAL_ERROR_TWS "failed
    * to find time values") — so this surface is pinned by the
    * deterministic two-batch streaming spec alone
    * (EventTimeSessionSpec: the watermark advances with DATA, no
    * wall-clock sleeps anywhere).
    */
  class SessionEventTimeProcessor(gapMs: Long, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, UserSession] {
    @transient private var sess: ValueState[SessSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessSt]("session",
        Encoders.product[SessSt], ttl)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserSession] = {
      val prev = if (sess.exists()) sess.get()
        else SessSt(0L, 0L, Long.MaxValue, Long.MinValue)
      var n = prev.n
      var total = prev.totalMicros
      var first = prev.firstMs
      var last = prev.lastMs
      rows.foreach { e =>
        n += 1
        total += math.round(e.value * 1e6)
        first = math.min(first, e.ts.getTime)
        last = math.max(last, e.ts.getTime)
      }
      sess.update(SessSt(n, total, first, last))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(last + gapMs) // event-time expiry
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
      if (!sess.exists()) Iterator.empty
      else {
        val s = sess.get()
        sess.clear()
        Iterator.single(UserSession(userId, s.n, s.totalMicros / 1e6,
          s.firstMs, s.lastMs))
      }
    }
  }

  /** [[SessionEventTimeProcessor]] wired up: watermark on `ts` (the
    * event-time column), `TimeMode.EventTime`, append output (the
    * mode event-time transformWithState supports).
    */
  def userSessionsEventTime(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "2 seconds",
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionEventTimeProcessor(gapMs, ttl),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** WARM-START form of [[RunningTotalsProcessor]]
    * ([[org.apache.spark.sql.streaming.StatefulProcessorWithInitialState]]):
    * state is seeded per key from a PRIOR SNAPSHOT Dataset before any
    * input is processed — the production bootstrap shape (a batch
    * backfill computes the historical aggregate once; the stream
    * continues from it instead of replaying history through the
    * stream). `handleInitialState` converts the snapshot row back to
    * the internal accumulator exactly (micros round-trip), so
    * warm-start + increments ≡ one cold run over the union — the law
    * `st_warm_start`'s oracle checks (snapshot = even-event-id half,
    * input = odd half, output must equal the FULL per-user aggregate
    * for every user with stream input; snapshot-only keys emit nothing
    * until new input arrives, as in production).
    */
  class RunningTotalsWithInitProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, UserRunning, UserRunning] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("running", Encoders.product[St], ttl)

    override def handleInitialState(userId: Long, snapshot: UserRunning,
        timers: TimerValues): Unit =
      st.update(St(snapshot.n_events, math.round(snapshot.total * 1e6),
        snapshot.last_event_ms))

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (st.exists()) st.get() else St(0L, 0L, 0L)
      var n = prev.n
      var total = prev.totalMicros
      var last = prev.lastMs
      rows.foreach { e =>
        n += 1
        total += math.round(e.value * 1e6)
        last = math.max(last, e.ts.getTime)
      }
      val next = St(n, total, last)
      st.update(next)
      Iterator.single(UserRunning(userId, n, total / 1e6, last))
    }
  }

  def runningUserTotalsWarmStart(events: Dataset[Event],
      snapshot: Dataset[UserRunning],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserRunning] = {
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsWithInitProcessor(ttl),
        TimeMode.None(), OutputMode.Update(),
        snapshot.groupByKey(_.user_id))
  }

  /** One CDC change-log row (the streaming sibling of
    * [[graft.relational.RelationalOps.cdcApply]]'s input).
    */
  final case class CdcChange(key: Long, seq: Long, change_id: Long,
      op: String, status: String, price: Double)

  /** The maintained current version of a key. Deletes surface as
    * `deleted = true` rows — TOMBSTONES, not absences: downstream
    * sinks need the delete event to remove the row, and the state
    * keeps the tombstone so a LATE lower-sequence upsert can never
    * resurrect a deleted key (the CDC correctness trap).
    */
  final case class CdcCurrent(key: Long, seq: Long, change_id: Long,
      deleted: Boolean, status: String, price: Double)

  /** Latest-wins CDC snapshot maintenance: per key, keep the row with
    * the highest (seq, change_id) across ALL micro-batches and emit the
    * new current version whenever it changes (update mode). Out-of-order
    * delivery is the point: a batch-2 row older than the held state is
    * ignored, a delete is held as a tombstone, and re-delivered rows
    * (same seq+change_id) are idempotent. TTL bounds tombstone
    * retention at 100 TB (after the CDC source's max replay lag, a
    * tombstone can expire — the standard compaction contract).
    */
  class CdcLatestProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, CdcChange, CdcCurrent] {
    @transient private var cur: ValueState[CdcCurrent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CdcCurrent]("current",
        Encoders.product[CdcCurrent], ttl)

    override def handleInputRows(key: Long, rows: Iterator[CdcChange],
        timers: TimerValues): Iterator[CdcCurrent] = {
      val prev = if (cur.exists()) Some(cur.get()) else None
      var best = prev
      rows.foreach { c =>
        val win = best.forall(b =>
          c.seq > b.seq || (c.seq == b.seq && c.change_id > b.change_id))
        if (win) best = Some(CdcCurrent(key, c.seq, c.change_id,
          c.op == "D", c.status, c.price))
      }
      best match {
        case Some(b) if !prev.contains(b) =>
          cur.update(b)
          Iterator.single(b)
        case _ => Iterator.empty // batch only carried stale/duplicate rows
      }
    }
  }

  def cdcLatest(changes: Dataset[CdcChange],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CdcCurrent] = {
    implicit val outEnc = Encoders.product[CdcCurrent]
    implicit val keyEnc = Encoders.scalaLong
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        changes.sparkSession.sessionState.conf)
    changes.groupByKey(_.key)
      .transformWithState(new CdcLatestProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  def runningUserTotalsV2(events: Dataset[Event],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserRunning] = {
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    // Batch invocation runs TransformWithStateExec over an ephemeral
    // RocksDB store whose snapshot telemetry calls the driver's
    // StateStoreCoordinator endpoint — an endpoint only registered once
    // a STREAMING query has started in the session, so a fresh batch
    // session dies with CANNOT_LOAD_STATE_STORE. Register it up front
    // (forDriver is idempotent: it returns the existing endpoint if one
    // is already live).
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        events.sparkSession.sessionState.conf)
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
