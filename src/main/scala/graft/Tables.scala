package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale note: `spark.read.parquet` gives splittable columnar scans with
  * predicate pushdown + column pruning; at 100 TB the same call fans out
  * over all executors, one task per row-group split. Nothing here collects
  * to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Schema-adaptive events loader. Generations of the test corpus have
    * stored `ts` two ways:
    *   - TIMESTAMP(NANOS), which Spark 4 only reads as a long (with
    *     `nanosAsLong`) — truncate integrally to micros (no double
    *     round-trip at 1e18 magnitudes), matching DuckDB's nanos→micros
    *     truncation;
    *   - TIMESTAMP(MICROS) without tz metadata, which Spark reads as
    *     TIMESTAMP_NTZ — cast to session-tz TimestampType (session is
    *     UTC, so the instant is unchanged and typed `Dataset[Event]`
    *     encoders, which expect TimestampType, keep working).
    * Sniffing `schema("ts").dataType` instead of hard-assuming one form
    * means a regenerated corpus can't silently break every events query.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Streaming twin of [[events]]: a file-source stream over a directory of
    * events parquet files, with the same schema-adaptive ts normalization.
    * `schemaFrom` is the batch path used to sniff the physical schema
    * (file streams require an explicit schema).
    */
  def eventsStream(s: SparkSession, streamDir: String, schemaFrom: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$schemaFrom/events.parquet").schema
    normalizeEventTs(s.readStream.schema(schema).parquet(streamDir))
  }

  /** Map either physical `ts` form to session-tz TimestampType (see
    * [[events]]). Works on batch and streaming frames alike.
    */
  private def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType | TimestampType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other; expected nanos-as-long or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
