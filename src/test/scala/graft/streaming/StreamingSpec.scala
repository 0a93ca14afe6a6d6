package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.etl.SparkTestSession

/** Stream/batch parity: the same transforms over a file-source stream
  * (memory sink, processAllAvailable) must equal the batch results.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  // file streaming source needs a DIRECTORY of files
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def eventStream() = {
    val batch = Tables.events(spark, dir)
    // stream the same parquet through a file source; Tables applies the
    // same schema-adaptive ts normalization as the batch loader
    val stream = Tables.eventsStream(spark, streamDir, dir)
    (batch, stream)
  }

  test("windowed counts: streaming result equals batch result") {
    val (batch, stream) = eventStream()
    val expected = Streaming.windowedCounts(batch, "5 minutes")
      .collect().map(_.toString).sorted
    val q = Streaming.streamingWindowedCounts(stream, "5 minutes", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out").collect().map(_.toString).sorted
      assert(got.length == expected.length)
      assert(got.sameElements(expected))
    } finally q.stop()
  }

  test("windowed top-k: the foreachBatch ranking over the streaming " +
      "aggregate equals the batch leaderboard") {
    val (batch, stream) = eventStream()
    val expected = Streaming.windowedTopK(batch, "15 minutes", k = 3)
      .collect().map(_.toString).sorted
    // the deployment pattern: stream the watermark-bounded aggregate,
    // apply the (non-incremental) rank per micro-batch in foreachBatch
    val sink = scala.collection.mutable.ArrayBuffer.empty[String]
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = Streaming.streamingWindowedCounts(stream, "15 minutes", "10 minutes")
      .writeStream.outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = Window.partitionBy(col("ws"))
          .orderBy(col("n").desc, col("event_type"))
        val ranked = df.withColumn("rnk", row_number().over(w).cast("int"))
          .where(col("rnk") <= 3)
          .select(col("ws"), col("we"), col("rnk"), col("event_type"), col("n"))
          .collect().map(_.toString)
        sink.synchronized { sink.clear(); sink ++= ranked } // complete mode: latest wins
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val got = sink.synchronized(sink.toArray.sorted)
      assert(got.sameElements(expected),
        s"streaming leaderboard diverged: ${got.length} vs ${expected.length}")
    } finally q.stop()
  }

  test("sliding windowed counts: streaming result equals batch result") {
    val (batch, stream) = eventStream()
    val expected = Streaming.windowedCounts(batch, "10 minutes", Some("5 minutes"))
      .collect().map(_.toString).sorted
    val q = Streaming.streamingWindowedCounts(
        stream, "10 minutes", "10 minutes", Some("5 minutes"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("slide_out").collect().map(_.toString).sorted
      assert(got.length == expected.length)
      assert(got.sameElements(expected))
    } finally q.stop()
  }

  test("session windows: streaming result equals batch result") {
    val (batch, stream) = eventStream()
    val expected = Streaming.sessionStats(batch, "30 minutes")
      .collect().map(_.toString).sorted
    val q = Streaming.streamingSessionStats(stream, "30 minutes", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_out").collect().map(_.toString).sorted
      assert(got.length == expected.length)
      assert(got.sameElements(expected))
    } finally q.stop()
  }

  test("AvailableNow incremental run processes only files new since the checkpoint") {
    val in = java.nio.file.Files.createTempDirectory("an-in")
    val ckpt = java.nio.file.Files.createTempDirectory("an-ckpt").toString
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val perFile = spark.read.parquet(src.toString).count()
    java.nio.file.Files.copy(src, in.resolve("part1.parquet"))

    var processed = 0L
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src.toString).schema)
        .parquet(in.toString)
        .select("event_id")
      Streaming.runAvailableNow(stream, ckpt) { (df, _) =>
        processed += df.count()
      }
    }
    run()
    assert(processed == perFile, "first run processes the initial file")
    run()
    assert(processed == perFile, "no new files -> second run processes nothing")
    java.nio.file.Files.copy(src, in.resolve("part2.parquet"))
    run()
    assert(processed == 2 * perFile,
      "third run processes exactly the one new file")
  }

  test("incremental stream load into a live database is exactly-once " +
      "across restarts (AvailableNow checkpoint + keyed upsert)") {
    import graft.sinks.JdbcUpsertSink
    // the production periodic-ingest shape: file checkpointing gives
    // at-least-once batches, the keyed upsert makes the landing
    // idempotent — together exactly-once in the database
    Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val url = "jdbc:derby:memory:streamload;create=true"
    val setup = java.sql.DriverManager.getConnection(url)
    setup.createStatement().execute(
      """CREATE TABLE events_landed ("key" VARCHAR(64) PRIMARY KEY,
        |  "resource_type" VARCHAR(32), "resource_json" VARCHAR(4096))""".stripMargin)
    setup.close()
    val cfg = JdbcUpsertSink.Config(url = url, table = "events_landed",
      dialect = JdbcUpsertSink.AnsiMergeDialect)

    val in = java.nio.file.Files.createTempDirectory("sl-in")
    val ckpt = java.nio.file.Files.createTempDirectory("sl-ckpt").toString
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    java.nio.file.Files.copy(src, in.resolve("part1.parquet"))
    val distinctIds = spark.read.parquet(src.toString)
      .select("event_id").distinct().count()

    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src.toString).schema)
        .parquet(in.toString)
        .selectExpr("CAST(event_id AS STRING) AS key",
          "'Event' AS resource_type", "CAST(value AS STRING) AS resource_json")
      Streaming.runAvailableNow(stream, ckpt) { (df, _) =>
        JdbcUpsertSink.upsert(df, cfg)
      }
    }
    def landed(): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT count(*) FROM events_landed")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }

    run()
    assert(landed() == distinctIds, "first run lands every distinct event once")
    run()
    assert(landed() == distinctIds, "restart with no new files lands nothing new")
    // the same file again under a new name: reprocessed by the file
    // source, but the keyed upsert keeps the table exactly-once
    java.nio.file.Files.copy(src, in.resolve("part2.parquet"))
    run()
    assert(landed() == distinctIds, "replayed data upserts in place, no duplicates")
  }

  test("stream-stream time-bound join equals the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // base away from epoch 0: the initial watermark is 0, and state-
    // eviction bounds computed against it misbehave at the origin
    val base = 36000000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m)
    val imps = Seq( // (k, lts)
      (1L, ts(0L)), (1L, ts(60000L)), (2L, ts(0L)))
    val clicks = Seq( // (k, rts)
      (1L, ts(30000L)),  // within 1 min of imp@0, of imp@60000? before it -> no
      (1L, ts(90000L)),  // within of imp@60000 only
      (2L, ts(600000L)), // too late
      (3L, ts(1000L)))   // no impression
    val expected = Streaming.timeBoundJoin(
        imps.toDF("k", "lts"), clicks.toDF("k", "rts"), "1 MINUTE")
      .collect().map(_.toString).sorted
    assert(expected.length == 2)

    val li = MemoryStream[(Long, java.sql.Timestamp)]
    val ri = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.streamingTimeBoundJoin(
        li.toDS().toDF("k", "lts"), ri.toDS().toDF("k", "rts"),
        lateness = "10 minutes", maxDelay = "1 MINUTE")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      li.addData(imps)
      ri.addData(clicks)
      q.processAllAvailable()
      // advance both watermarks far past every event so bounded rows
      // emit; disjoint sentinel keys so the probes can't join
      li.addData(Seq((98L, ts(7200000L))))
      ri.addData(Seq((99L, ts(7200000L))))
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }

  test("stream-stream left-outer time-bound join equals the batch left join, " +
      "incl. null-padded unmatched-left rows after watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 36000000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m)
    val imps = Seq( // (k, lts)
      (1L, ts(0L)), (1L, ts(60000L)), (2L, ts(0L)))
    val clicks = Seq( // (k, rts)
      (1L, ts(30000L)),  // matches imp@0 only
      (1L, ts(90000L)),  // matches imp@60000 only
      (2L, ts(600000L)), // outside the 1-minute bound -> imp 2 unmatched
      (3L, ts(1000L)))   // click with no impression: dropped by left join
    val expected = Streaming.timeBoundLeftJoin(
        imps.toDF("k", "lts"), clicks.toDF("k", "rts"), "1 MINUTE")
      .collect().map(_.toString).sorted
    // 2 matches + the null-padded unmatched imp for k=2
    assert(expected.length == 3)
    assert(expected.count(_.contains("null")) == 1)

    val li = MemoryStream[(Long, java.sql.Timestamp)]
    val ri = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.streamingTimeBoundLeftJoin(
        li.toDS().toDF("k", "lts"), ri.toDS().toDF("k", "rts"),
        lateness = "10 minutes", maxDelay = "1 MINUTE")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssoj_out").start()
    try {
      li.addData(imps)
      ri.addData(clicks)
      q.processAllAvailable()
      // push both watermarks far past lts+maxDelay for every real event so
      // the unmatched-left rows emit; the left sentinel itself stays in
      // state (its own expiry never passes) — filter sentinels out
      li.addData(Seq((98L, ts(7200000L))))
      ri.addData(Seq((99L, ts(7200000L))))
      q.processAllAvailable()
      val got = spark.table("ssoj_out").where("k < 90")
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }

  test("stream-stream full-outer time-bound join equals the batch full join, " +
      "incl. null-padded unmatched rows on BOTH sides after watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 36000000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m)
    val imps = Seq( // (k, lts)
      (1L, ts(0L)), (1L, ts(60000L)), (2L, ts(0L)))
    val clicks = Seq( // (k, rts)
      (1L, ts(30000L)),  // matches imp@0 only
      (1L, ts(90000L)),  // matches imp@60000 only
      (2L, ts(600000L)), // outside the 1-minute bound -> BOTH sides unmatched
      (3L, ts(1000L)))   // click with no impression -> unmatched right
    val expected = Streaming.timeBoundFullJoin(
        imps.toDF("k", "lts"), clicks.toDF("k", "rts"), "1 MINUTE")
      .collect().map(_.toString).sorted
    // 2 matches + unmatched imp (k=2) + unmatched clicks (k=2 late, k=3)
    assert(expected.length == 5)
    assert(expected.count(_.contains("null")) == 3)

    val li = MemoryStream[(Long, java.sql.Timestamp)]
    val ri = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.streamingTimeBoundFullJoin(
        li.toDS().toDF("k", "lts"), ri.toDS().toDF("k", "rts"),
        lateness = "10 minutes", maxDelay = "1 MINUTE")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssfj_out").start()
    try {
      li.addData(imps)
      ri.addData(clicks)
      q.processAllAvailable()
      // push both watermarks far past every real event's decision point
      // so the unmatched rows on BOTH sides emit; the sentinels
      // themselves stay in state — filter them out
      li.addData(Seq((98L, ts(7200000L))))
      ri.addData(Seq((99L, ts(7200000L))))
      q.processAllAvailable()
      val got = spark.table("ssfj_out").where("k < 90")
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension by broadcast, batch-parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq(("SC_1", "Center One"), ("SC_2", "Center Two"))
      .toDF("center_id", "center_name")
    val events = Seq((1L, "SC_1"), (2L, "SC_2"), (3L, "SC_9"))
    val expected = Streaming.enrich(
        events.toDF("id", "center_id"), dim, "center_id")
      .collect().map(_.toString).sorted
    assert(expected.length == 3) // left join: unmatched SC_9 survives

    val in = MemoryStream[(Long, String)]
    val enriched = Streaming.enrich(in.toDS().toDF("id", "center_id"), dim, "center_id")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
    // dimension side must be broadcast — no shuffle per micro-batch
    val plan = Streaming.enrich(events.toDF("id", "center_id"), dim, "center_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
  }

  test("watermarked dedup equals the batch twin on the projected key set " +
      "(the tw_dedup_watermark battery query)") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val (batch, stream) = eventStream()
    val keys = Seq("user_id", "event_type", "ts")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("ts"))
    val expected = Streaming.dedupKeys(proj(batch), keys)
      .collect().map(_.toString).sorted
    val q = Streaming.streamingDedup(proj(stream), "10 minutes", keys)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_twin_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_twin_out").collect().map(_.toString).sorted
      assert(got.length == expected.length,
        s"stream ${got.length} rows vs batch ${expected.length}")
      assert(got.sameElements(expected))
    } finally q.stop()
  }

  test("append-mode windowed counts emit exactly the windows the watermark " +
      "has closed — the emission-timing boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // 5-minute tumbling windows, 10-minute lateness. Batch 1 spans 3
    // windows; batch 2 is one sentinel far ahead. processAllAvailable
    // drains through the watermark-advance trigger, so after batch 1
    // the watermark is W1 = max(batch-1 ts) - 10min and EXACTLY the
    // windows with end <= W1 have emitted; the sentinel advances it to
    // W2 and flushes the rest of batch 1, while the sentinel's own
    // window (end > W2) stays in state. Complete-mode parity tests
    // can't see this; the emission TIMING is the append-mode contract.
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    val ts = (m: Long) => new java.sql.Timestamp(base + m * 60000L)
    val batch1 = Seq( // (ts minutes, event_type, value)
      (ts(1), "a", 1.0), (ts(2), "b", 1.0),   // window [0,5)
      (ts(6), "a", 1.0),                      // window [5,10)
      (ts(16), "a", 1.0))                     // window [15,20) -> max ts = 16min
    val sentinel = Seq((ts(120), "z", 0.0))
    // W1 = 16min - 10min = 6min: only window [0,5) has end <= W1
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streaming.streamingWindowedCounts(
        in.toDS().toDF("ts", "event_type", "value"), "5 minutes", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("append_win_out").start()
    def emitted(): Set[(Long, String, Long)] = spark.table("append_win_out")
      .select("ws", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    val m = 60000L
    try {
      in.addData(batch1); q.processAllAvailable()
      // W1 = 16min - 10min = 6min: only window [0,5) has end <= W1 —
      // [5,10) and [15,20) hold their rows in state
      assert(emitted() == Set((base, "a", 1L), (base, "b", 1L)),
        s"after batch 1 exactly the closed window [0,5) emits: ${emitted()}")
      in.addData(sentinel); q.processAllAvailable()
      // W2 = 120min - 10min: the remaining batch-1 windows flush; the
      // sentinel's own window [120,125) is still open and must NOT emit
      assert(emitted() == Set(
        (base, "a", 1L), (base, "b", 1L),
        (base + 5 * m, "a", 1L), (base + 15 * m, "a", 1L)),
        s"after the sentinel all batch-1 windows and nothing else: ${emitted()}")
    } finally q.stop()
  }

  test("append-mode session windows merge across batches and emit only when " +
      "the watermark closes the session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // gap 5min, lateness 10min. Batch 1: A's two-event session closes
    // under W1 = max(ts)-10min and emits; B's and D's stay open. Batch
    // 2 extends D's session with an on-time event (>= W1, so admitted
    // and MERGED into state) and a far sentinel that closes everything
    // but itself.
    val base = 1704067200000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m * 60000L)
    val m = 60000L
    val ev = (u: Long, tm: Long, v: Double) => (u, ts(tm), v)
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Streaming.streamingSessionStats(
        in.toDS().toDF("user_id", "ts", "value"), "5 minutes", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("append_sess_out").start()
    def emitted(): Set[(Long, Long, Long, Long, Double)] =
      spark.table("append_sess_out").collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getDouble(4))).toSet
    try {
      in.addData(Seq(ev(1, 0, 1.0), ev(1, 1, 2.0), ev(2, 50, 4.0), ev(4, 45, 8.0)))
      q.processAllAvailable()
      // W1 = 50min-10min = 40min: only A's session (end 1min+5min=6min) closed
      assert(emitted() == Set((1L, base, base + 6 * m, 2L, 3.0)),
        s"after batch 1 only A's session has closed: ${emitted()}")
      in.addData(Seq(ev(4, 47, 16.0), ev(9, 200, 0.0)))
      q.processAllAvailable()
      // D@47min >= W1: admitted and merged -> one session [45,52) n=2.
      // W2 = 190min closes B and the merged D; the sentinel stays open.
      assert(emitted() == Set(
        (1L, base, base + 6 * m, 2L, 3.0),
        (2L, base + 50 * m, base + 55 * m, 1L, 4.0),
        (4L, base + 45 * m, base + 52 * m, 2L, 24.0)),
        s"after the sentinel B and the MERGED D emit, sentinel held: ${emitted()}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark late-arrival boundary: the real two-batch " +
      "replay equals the tw_dedup_late_boundary closed form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // fixture: batch 1 = each (user_id, event_type) key's arg-min-ts row
    // (tie-break event_id, so the stored state ts is deterministic),
    // batch 2 = everything else. Watermarks advance only at the batch
    // boundary, so all of batch 2 sees W1 = max(per-key min ts) - 1h.
    val rows = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)].collect()
    val argmin = rows.groupBy(r => (r._1, r._2)).map { case (_, rs) =>
      rs.minBy(r => (r._3.getTime, r._4))
    }.toSet
    val strip = (r: (Long, String, java.sql.Timestamp, Long)) => (r._1, r._2, r._3)
    val batch1 = argmin.toSeq.map(strip)
    val batch2 = rows.filterNot(argmin).map(strip).toSeq
    assert(batch2.nonEmpty, "fixture needs duplicate keys to exercise the boundary")

    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streaming.streamingDedup(
        in.toDS().toDF("user_id", "event_type", "ts"),
        "1 hour", Seq("user_id", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("late_bound_out").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val got = spark.table("late_bound_out")
        .groupBy("user_id", "event_type")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = graft.SparkEntry.queries("tw_dedup_late_boundary")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.size == want.size, s"key count ${got.size} vs ${want.size}")
      val diffs = want.collect { case (k, n) if got.getOrElse(k, 0L) != n =>
        s"$k: stream ${got.getOrElse(k, 0L)} vs closed-form $n" }
      assert(diffs.isEmpty, diffs.take(5).mkString("; "))
      assert(want.values.exists(_ == 2L) && want.values.exists(_ == 1L),
        "fixture must exercise BOTH sides of the boundary")
    } finally q.stop()
  }

  test("watermarked dedup emits each event_id once") {
    val (_, stream) = eventStream()
    val q = Streaming.streamingDedup(stream, "10 minutes", Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      val distinct = spark.table("dedup_out").select("event_id").distinct().count()
      assert(n == distinct)
      assert(n == Tables.events(spark, dir).count())
    } finally q.stop()
  }

  test("streaming corpus gate equals the batch gate and keeps NO state") {
    val docsDir = {
      val d = java.nio.file.Files.createTempDirectory("graft_docstream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        d.resolve("documents.parquet"))
      d.toString
    }
    val batch = Streaming.corpusGate(Tables.documents(spark, dir))
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty, "gate must pass some documents at sf0.001")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
      .parquet(docsDir)
    val q = Streaming.corpusGate(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gate_out").collect().map(_.toString).sorted
      assert(got.sameElements(batch), "stream/batch gate parity")
      // both kernels are stateless narrow expressions: the query must
      // run with zero state stores (no watermark, nothing to expire)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"gate must be stateless, found ${q.lastProgress.stateOperators.length}")
    } finally q.stop()
  }

  test("chained stateful aggregations: two window levels in ONE query " +
      "equal the batch two-level rollup once the watermark closes the hours") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    val ts = (m: Long) => new java.sql.Timestamp(base + m * 60000L)
    val batch1 = Seq( // (ts, user_id): hour 0 has 3 slots / 2 users
      (ts(1), 1L), (ts(2), 1L),   // user 1, slot [0,10)
      (ts(11), 1L),               // user 1, slot [10,20)
      (ts(5), 2L),                // user 2, slot [0,10)
      (ts(65), 2L))               // hour 1, slot [60,70)
    val sentinel = Seq((ts(600), 99L)) // closes both real hours
    val expected = Streaming.chainedWindowCounts(
        batch1.toDF("ts", "user_id"))
      .collect().map(_.toString).sorted
    assert(expected.length == 2, s"two hours expected: ${expected.toSeq}")

    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val q = Streaming.streamingChainedWindowCounts(
        in.toDS().toDF("ts", "user_id"), lateness = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("chained_out").start()
    try {
      // both chained state stores must be present in the SAME query
      in.addData(batch1); q.processAllAvailable()
      in.addData(sentinel); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.length >= 2,
        s"expected two stateful operators, got ${q.lastProgress.stateOperators.length}")
      // the sentinel's own hour is still open and must not emit
      val got = spark.table("chained_out").collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }

  test("stream-stream left-semi time-bound join equals the batch semi join: " +
      "multi-match views emit ONCE, unmatched and out-of-bound views never") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 36000000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m)
    val imps = Seq( // (k, lts)
      (1L, ts(0L)), // TWO clicks inside the bound -> exactly one row
      (2L, ts(0L)), // click outside the bound -> no row
      (3L, ts(0L))) // no click at all -> no row
    val clicks = Seq( // (k, rts)
      (1L, ts(10000L)), (1L, ts(30000L)),
      (2L, ts(600000L)))
    val expected = Streaming.timeBoundSemiJoin(
        imps.toDF("k", "lts"), clicks.toDF("k", "rts"), "1 MINUTE")
      .collect().map(_.toString).sorted
    assert(expected.length == 1, s"semi join must not fan out: ${expected.toSeq}")

    val li = MemoryStream[(Long, java.sql.Timestamp)]
    val ri = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.streamingTimeBoundSemiJoin(
        li.toDS().toDF("k", "lts"), ri.toDS().toDF("k", "rts"),
        lateness = "10 minutes", maxDelay = "1 MINUTE")
      .writeStream.outputMode("append")
      .format("memory").queryName("sssj_out").start()
    try {
      // batch 1: both matching clicks arrive with the views — the k=1
      // view must emit once, not twice
      li.addData(imps)
      ri.addData(clicks)
      q.processAllAvailable()
      // batch 2: advance both watermarks past every decision point so
      // any wrongly-buffered unmatched view would be flushed now
      li.addData(Seq((98L, ts(7200000L))))
      ri.addData(Seq((99L, ts(7200000L))))
      q.processAllAvailable()
      val got = spark.table("sssj_out").where("k < 90")
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }

  test("stream-stream right-outer time-bound join equals the batch right join, " +
      "incl. null-padded unmatched-right rows after watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 36000000L
    val ts = (m: Long) => new java.sql.Timestamp(base + m)
    val imps = Seq( // (k, lts)
      (1L, ts(0L)),      // matches the k=1 click at +30s
      (2L, ts(600000L)), // AFTER the k=2 click -> that click unmatched
      (3L, ts(0L)))      // impression with no click: dropped by right join
    val clicks = Seq( // (k, rts)
      (1L, ts(30000L)),  // matched
      (2L, ts(0L)),      // no preceding imp within bound -> null-padded
      (4L, ts(1000L)))   // no imp at all -> null-padded
    val expected = Streaming.timeBoundRightJoin(
        imps.toDF("k", "lts"), clicks.toDF("k", "rts"), "1 MINUTE")
      .collect().map(_.toString).sorted
    // 1 match + 2 null-padded unmatched clicks
    assert(expected.length == 3)
    assert(expected.count(_.contains("null")) == 2)

    val li = MemoryStream[(Long, java.sql.Timestamp)]
    val ri = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.streamingTimeBoundRightJoin(
        li.toDS().toDF("k", "lts"), ri.toDS().toDF("k", "rts"),
        lateness = "10 minutes", maxDelay = "1 MINUTE")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssrj_out").start()
    try {
      li.addData(imps)
      ri.addData(clicks)
      q.processAllAvailable()
      // advance both watermarks past every decision point so the
      // unmatched-right rows emit; sentinels filtered below
      li.addData(Seq((98L, ts(7200000L))))
      ri.addData(Seq((99L, ts(7200000L))))
      q.processAllAvailable()
      val got = spark.table("ssrj_out").where("k < 90")
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"stream ${got.toSeq} vs batch ${expected.toSeq}")
    } finally q.stop()
  }
}
