package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events`' schema adaptivity: the test corpus has shipped
  * `ts` both as TIMESTAMP(NANOS) (readable only as a long) and as
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). The loader must return the
  * same TimestampType rows for either physical form, so a regenerated
  * corpus can't silently break the events family again.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = graft.etl.SparkTestSession.spark

  test("events loader yields identical rows for nanos-as-long and micros parquet") {
    import spark.implicits._
    val dirLong   = Files.createTempDirectory("evt-long").toString
    val dirMicros = Files.createTempDirectory("evt-micros").toString

    // 2024-01-01T00:00:00Z .. +4s, plus a sub-second offset to exercise truncation
    val baseMicros = 1704067200000000L
    val micros = (0 until 5).map(i => baseMicros + i * 1000000L + 123456L)

    // Form 1: nanos stored as BIGINT — what Spark sees for TIMESTAMP(NANOS)
    // under spark.sql.legacy.parquet.nanosAsLong (plus 789 sub-micro nanos
    // that must truncate away, matching DuckDB).
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L + 789L) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dirLong/events.parquet")

    // Form 2: native TIMESTAMP(MICROS) without tz metadata → TIMESTAMP_NTZ.
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dirMicros/events.parquet")

    val a = Tables.events(spark, dirLong)
    val b = Tables.events(spark, dirMicros)

    assert(a.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)

    val rowsA = a.orderBy("event_id").select($"event_id", $"ts").as[(Long, Timestamp)].collect().toSeq
    val rowsB = b.orderBy("event_id").select($"event_id", $"ts").as[(Long, Timestamp)].collect().toSeq
    assert(rowsA === rowsB)
    assert(rowsA.head._2 === Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L, 123456000L)))
  }

  test("events loader refuses an unrecognized ts type loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evt-bad").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("events loader reads the driver corpus with a TimestampType ts") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
