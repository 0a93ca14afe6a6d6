package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState,
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

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
