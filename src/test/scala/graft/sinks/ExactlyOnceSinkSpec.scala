package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import graft.streaming.Streaming

/** Exactly-once landing contract, against live embedded Derby:
  * replayed batch ids are skipped by the driver ledger, plain appends
  * land exactly once per (sink, batch) under replay AND under a
  * re-invocation with the same batch id, and a checkpointed stream that
  * is restarted lands the same table as a one-shot run.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def conn(url: String) = java.sql.DriverManager.getConnection(url)

  private def count(url: String, table: String): Long = {
    val c = conn(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("ledgered: a replayed batch id is skipped without touching the data") {
    import spark.implicits._
    val url = "jdbc:derby:memory:eo1;create=true"
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "ledger1")
    var applies = 0
    val writer = ExactlyOnceSink.ledgered(ledger, "sink-a") { (df, _) =>
      applies += 1
      df.count(): Unit
    }
    val batch = Seq(("k1", "v1"), ("k2", "v2")).toDF("k", "v")
    writer(batch, 0L)
    assert(applies == 1)
    // replay of the SAME batch id — even with different content (the
    // engine never does that; this proves the gate is the ledger, not
    // the data) — must be a no-op
    writer(Seq(("zz", "zz")).toDF("k", "v"), 0L)
    assert(applies == 1, "replayed batch id must be skipped")
    writer(batch, 1L)
    assert(applies == 2, "a new batch id applies")
    // a different sink id has its own ledger rows
    var other = 0
    val writer2 = ExactlyOnceSink.ledgered(ledger, "sink-b") { (_, _) => other += 1 }
    writer2(batch, 0L)
    assert(other == 1, "ledger is keyed by (sink_id, batch_id)")
  }

  test("appendOnce: plain appends land exactly once under batch replay") {
    import spark.implicits._
    val url = "jdbc:derby:memory:eo2;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE landed ("k" VARCHAR(64), "v" VARCHAR(64))""")
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "plaidger")
    val rows = (1 to 100).map(i => (s"k$i", s"v$i"))
    val df = rows.toDF("k", "v")
    ExactlyOnceSink.appendOnce(df, 7L, "s", "landed", Seq("k", "v"), ledger,
      batchSize = 16, partitions = 8)
    assert(count(url, "landed") == 100)
    // full replay of the same (sink, batch): every partition finds its
    // ledger row and skips — an append is NOT idempotent, so this is
    // the real exactly-once proof
    ExactlyOnceSink.appendOnce(df, 7L, "s", "landed", Seq("k", "v"), ledger,
      batchSize = 16, partitions = 8)
    assert(count(url, "landed") == 100, "replayed batch must not re-append")
    // next batch id appends normally
    ExactlyOnceSink.appendOnce(df, 8L, "s", "landed", Seq("k", "v"), ledger,
      batchSize = 16, partitions = 8)
    assert(count(url, "landed") == 200)
    // ledger carries one row per (batch, non-empty-or-not partition)
    assert(count(url, "plaidger") == 16)
  }

  test("appendOnce spreads low-entropy columns across partitions " +
      "(multi-arg hash, no separator-collision funneling)") {
    import spark.implicits._
    // values drawn from a tiny alphabet whose concatenations collide
    // under any separator-joined scheme: ("ab","c") vs ("a","bc") etc.
    val rows = for { i <- 1 to 512 } yield {
      val a = Seq("a", "ab", "abc")(i % 3)
      val b = Seq("b", "bc", "c")(i % 3) + (i / 3).toString
      (a, b)
    }
    val pidSizes = rows.toDF("k", "v")
      .repartition(8, org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("v")))
      .rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(pidSizes.count(_ > 0) >= 7,
      s"512 distinct rows must spread over nearly all 8 partitions, " +
        s"got sizes ${pidSizes.mkString(",")}")
    assert(pidSizes.max <= 512 / 8 * 3,
      s"no partition may absorb a funneled share: ${pidSizes.mkString(",")}")
    // and the landing path itself stays exactly-once with these columns
    val url = "jdbc:derby:memory:eo4;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE skewland ("k" VARCHAR(64), "v" VARCHAR(64))""")
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "skewledger")
    val df = rows.toDF("k", "v")
    ExactlyOnceSink.appendOnce(df, 1L, "s", "skewland", Seq("k", "v"), ledger,
      batchSize = 64, partitions = 8)
    ExactlyOnceSink.appendOnce(df, 1L, "s", "skewland", Seq("k", "v"), ledger,
      batchSize = 64, partitions = 8)
    assert(count(url, "skewland") == 512, "exactly-once under replay holds")
  }

  test("appendOnce refuses to resume a batch partially committed under " +
      "a different partitioning scheme") {
    import spark.implicits._
    val url = "jdbc:derby:memory:eo5;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE schland ("k" VARCHAR(64), "v" VARCHAR(64))""")
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "schledger")
    val df = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    // land batch 0 normally — creates the ledger under the current scheme
    ExactlyOnceSink.appendOnce(df, 0L, "s", "schland", Seq("k", "v"), ledger,
      partitions = 4)
    assert(count(url, "schland") == 3)
    // simulate a partial commit of batch 1 by an OLDER build: one
    // partition-ledger row under a foreign scheme version
    val c = conn(url)
    try c.createStatement().execute(
      """INSERT INTO schledger ("sink_id", "batch_id", "partition_id", """ +
        """"scheme", "applied_at") VALUES ('s', 1, 0, 1, CURRENT_TIMESTAMP)""")
    finally c.close()
    val e = intercept[IllegalStateException] {
      ExactlyOnceSink.appendOnce(df, 1L, "s", "schland", Seq("k", "v"),
        ledger, partitions = 4)
    }
    assert(e.getMessage.contains("partitioning scheme"))
    assert(count(url, "schland") == 3, "the refused batch wrote nothing")
    // an untouched NEW batch id still lands, and replay skips it
    ExactlyOnceSink.appendOnce(df, 2L, "s", "schland", Seq("k", "v"), ledger,
      partitions = 4)
    ExactlyOnceSink.appendOnce(df, 2L, "s", "schland", Seq("k", "v"), ledger,
      partitions = 4)
    assert(count(url, "schland") == 6)
  }

  test("pre-versioning ledger migrates in place (ALTER adds scheme 0), " +
      "conflicts conservatively, and the documented UPDATE unblocks a " +
      "verified fully-landed batch") {
    import spark.implicits._
    val url = "jdbc:derby:memory:eo6;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE migland ("k" VARCHAR(64), "v" VARCHAR(64))""")
    // the EXACT pre-versioning DDL: no scheme column
    setup.createStatement().execute(
      """CREATE TABLE migledger ("sink_id" VARCHAR(128) NOT NULL, """ +
        """"batch_id" BIGINT NOT NULL, "partition_id" INT NOT NULL, """ +
        """"applied_at" TIMESTAMP, """ +
        """PRIMARY KEY ("sink_id", "batch_id", "partition_id"))""")
    // an old build committed batch 0's partitions 0..3 (all of them)
    (0 until 4).foreach(p => setup.createStatement().execute(
      """INSERT INTO migledger ("sink_id", "batch_id", "partition_id", """ +
        s""""applied_at") VALUES ('s', 0, $p, CURRENT_TIMESTAMP)"""))
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "migledger")
    val df = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    // replaying batch 0 through the NEW build: ensureLedger must ALTER
    // the live ledger (scheme INT NOT NULL DEFAULT 0) and the scheme-0
    // rows must then conflict instead of being silently trusted
    val e = intercept[IllegalStateException] {
      ExactlyOnceSink.appendOnce(df, 0L, "s", "migland", Seq("k", "v"),
        ledger, partitions = 4)
    }
    assert(e.getMessage.contains("scheme 0"))
    val c = conn(url)
    val rs = c.createStatement().executeQuery(
      """SELECT count(*) FROM migledger WHERE "scheme" = 0""")
    rs.next()
    assert(rs.getInt(1) == 4, "migrated rows default to scheme 0")
    rs.close()
    // the operator verified batch 0 fully landed under the old build
    // and applies the escape hatch the error message prescribes
    c.createStatement().execute(
      s"""UPDATE migledger SET "scheme" = """ +
        s"""${ExactlyOnceSink.PartitionSchemeVersion} WHERE """ +
        """"sink_id" = 's' AND "batch_id" = 0""")
    c.close()
    ExactlyOnceSink.appendOnce(df, 0L, "s", "migland", Seq("k", "v"),
      ledger, partitions = 4)
    assert(count(url, "migland") == 0,
      "unblocked replay of the fully-landed batch skips every partition")
    // and NEW batches land normally on the migrated ledger
    ExactlyOnceSink.appendOnce(df, 1L, "s", "migland", Seq("k", "v"),
      ledger, partitions = 4)
    assert(count(url, "migland") == 3)
  }

  test("a driver-ledger-shaped table (no partition_id) is refused with " +
      "a descriptive shape error, not a confusing INSERT column error") {
    import spark.implicits._
    val url = "jdbc:derby:memory:eo7;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE shland ("k" VARCHAR(64), "v" VARCHAR(64))""")
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "shledger")
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    // the driver ledger creates the no-partition_id shape
    var applied = 0
    ExactlyOnceSink.ledgered(ledger, "s") { (_, _) => applied += 1 }(df, 0L)
    assert(applied == 1)
    // reusing the same TABLE for the per-partition sink must fail at
    // ensureLedger with the shape diagnosis
    val e = intercept[IllegalStateException] {
      ExactlyOnceSink.appendOnce(df, 1L, "s", "shland", Seq("k", "v"),
        ledger, partitions = 2)
    }
    assert(e.getMessage.contains("driver-ledger shape"))
    assert(count(url, "shland") == 0, "the refused batch wrote nothing")
  }

  test("checkpointed stream restart lands the one-shot batch table") {
    val url = "jdbc:derby:memory:eo3;create=true"
    val setup = conn(url)
    setup.createStatement().execute(
      """CREATE TABLE stream_landed ("k" VARCHAR(64), "v" VARCHAR(256))""")
    setup.close()
    val ledger = ExactlyOnceSink.Ledger(url = url, table = "slidger")

    val dir = "/root/testdata/sf0.001"
    val in = java.nio.file.Files.createTempDirectory("eo-in")
    val ckpt = java.nio.file.Files.createTempDirectory("eo-ckpt").toString
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    java.nio.file.Files.copy(src, in.resolve("part1.parquet"))
    val expected = spark.read.parquet(src.toString).count()

    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src.toString).schema)
        .parquet(in.toString)
        .selectExpr("CAST(event_id AS STRING) AS k", "CAST(value AS STRING) AS v")
      Streaming.runAvailableNow(stream, ckpt) { (df, bid) =>
        ExactlyOnceSink.appendOnce(df, bid, "events", "stream_landed",
          Seq("k", "v"), ledger, partitions = 8)
      }
    }
    run()
    assert(count(url, "stream_landed") == expected,
      "first run appends every event exactly once")
    // restart against the same checkpoint: no new files -> no new
    // batches -> the table must be untouched (appends would duplicate
    // if anything replayed without the ledger)
    run()
    assert(count(url, "stream_landed") == expected,
      "restarted stream must not re-append")
  }
}
