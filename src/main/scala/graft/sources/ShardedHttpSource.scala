package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 SHARDED HTTP source — the distributed form of the S5
  * REST pattern ([[RestSource]] documents why its next-link loop is
  * driver-sequential): bulk-export APIs (FHIR `$export`, Elasticsearch
  * sliced scroll, any `?shard=i&offset=o` range endpoint) hand out
  * independent per-shard cursors, and this connector plans ONE
  * `InputPartition` per shard so each EXECUTOR pages through its own
  * slice in parallel — the shape that ingests a 100 TB export instead
  * of pulling it through one driver socket.
  *
  * Spark-first integration, not a driver loop landed in a DataFrame:
  *  - column pruning (`SupportsPushDownRequiredColumns`) travels to the
  *    server as `fields=a,b` — unrequested columns never cross the
  *    wire;
  *  - equality predicates (`SupportsPushDownFilters` on string/number
  *    literals) become query parameters — filtered rows never leave
  *    the server; non-equality predicates stay post-scan in Spark;
  *  - the scan is lazily paged (`limit` rows per request) so a shard
  *    never materializes in executor memory.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.ShardedHttpSource")
  *   .schema("id LONG, lang STRING, score DOUBLE")
  *   .option("url", "http://host/data").option("shards", 8)
  *   .load()
  * }}}
  * Wire contract: `GET url?shard=i&offset=o&limit=n[&fields=..][&k=v..]`
  * returns JSON-lines; a response with no rows ends the shard.
  */
class ShardedHttpSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft sharded-http source requires an explicit .schema(...) " +
        "(remote row shape is not discoverable)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val url = properties.get("url")
    require(url != null && url.nonEmpty, "option 'url' is required")
    val shards = Option(properties.get("shards")).map(_.toInt).getOrElse(4)
    require(shards > 0, "option 'shards' must be positive")
    val limit = Option(properties.get("limit")).map(_.toInt).getOrElse(1000)
    require(limit > 0, "option 'limit' must be positive")
    new ShardedHttpTable(schema, url, shards, limit)
  }
}

private[sources] class ShardedHttpTable(tableSchema: StructType, url: String,
    shards: Int, limit: Int) extends Table with SupportsRead {
  override def name(): String = s"sharded_http($url)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardedHttpScanBuilder(tableSchema, url, shards, limit)
}

private[sources] class ShardedHttpScanBuilder(tableSchema: StructType,
    url: String, shards: Int, limit: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a subset of the table schema in table order
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // only equality on a plain literal becomes a query parameter; the
    // rest stays in Spark (returned = "evaluate these post-scan")
    val (ok, rest) = filters.partition {
      case EqualTo(_, v) =>
        v.isInstanceOf[String] || v.isInstanceOf[java.lang.Number] ||
          v.isInstanceOf[java.lang.Boolean]
      case _ => false
    }
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ShardedHttpScan(required, url, shards, limit,
      pushed.collect { case EqualTo(a, v) => (a, v.toString) })
}

private[sources] class ShardedHttpScan(readSchema: StructType, url: String,
    shards: Int, limit: Int, params: Array[(String, String)])
  extends Scan with Batch {

  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"sharded_http shards=$shards pushed=[" +
      params.map { case (a, v) => s"EqualTo($a,$v)" }.mkString(", ") + "]"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until shards).map(i => HttpShardPartition(i): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardedHttpReaderFactory(readSchema, url, limit, params)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedHttpMicroBatchStream(readSchema, url, shards, limit, params)
}

private[sources] case class HttpShardPartition(shard: Int,
    start: Long = 0L, maxRows: Long = Long.MaxValue) extends InputPartition

/** Per-shard row-count offsets for the micro-batch form. The counts
  * index the FILTERED, projected stream (the `counts=true` probe
  * carries the same pushed parameters as data requests), so a resumed
  * query sees exactly the rows that arrived since its checkpoint —
  * append-only servers keep them monotonic.
  */
private[sources] case class ShardOffsets(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
}

/** Streaming twin of the batch scan: each trigger asks the server for
  * its current per-shard (filtered) row counts, and the micro-batch is
  * the per-shard range [committed, latest) — one InputPartition per
  * shard with a start offset and row cap, executed by the same paged
  * reader as the batch path. Offsets checkpoint as JSON, so a
  * restarted query resumes exactly where it stopped (exactly-once with
  * a replayable sink) — the AvailableNow incremental-ingest pattern on
  * a CUSTOM source instead of a file listing.
  */
private[sources] class ShardedHttpMicroBatchStream(readSchema: StructType,
    url: String, shards: Int, limit: Int, params: Array[(String, String)])
  extends MicroBatchStream {

  private val mapper = new ObjectMapper

  override def initialOffset(): Offset =
    ShardOffsets((0 until shards).map(_ -> 0L).toMap)

  override def latestOffset(): Offset = {
    val extra = params.map { case (k, v) =>
      s"&${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
    }.mkString
    val conn = new java.net.URL(s"$url?counts=true&shards=$shards$extra")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    // same timeouts as the data reader: a stalled server must error the
    // trigger thread, not hang the streaming driver forever
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    try {
      require(conn.getResponseCode == 200,
        s"sharded-http counts probe -> ${conn.getResponseCode}")
      val node = mapper.readTree(conn.getInputStream.readAllBytes())
      ShardOffsets((0 until shards).map { s =>
        s -> Option(node.get(s.toString)).map(_.asLong()).getOrElse(0L)
      }.toMap)
    } finally conn.disconnect()
  }

  override def deserializeOffset(json: String): Offset = {
    val node = mapper.readTree(json)
    val counts = node.properties().asScala
      .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
    ShardOffsets(counts)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].counts
    val e = end.asInstanceOf[ShardOffsets].counts
    (0 until shards).flatMap { i =>
      val lo = s.getOrElse(i, 0L)
      val hi = e.getOrElse(i, 0L)
      if (hi > lo) Some(HttpShardPartition(i, lo, hi - lo): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardedHttpReaderFactory(readSchema, url, limit, params)

  override def commit(end: Offset): Unit = () // server-side state: none
  override def stop(): Unit = ()
}

private[sources] class ShardedHttpReaderFactory(readSchema: StructType,
    url: String, limit: Int, params: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[HttpShardPartition]
    new ShardedHttpReader(readSchema, url, limit, params, sp.shard,
      sp.start, sp.maxRows)
  }
}

/** Executor-side paged reader for one shard: fetch `limit` rows, parse
  * JSON-lines, convert to InternalRow against the PRUNED schema, fetch
  * the next page when exhausted; an empty page — or reaching `maxRows`
  * (the micro-batch range bound) — ends the shard. Holds one page in
  * memory at a time.
  */
private[sources] class ShardedHttpReader(readSchema: StructType, url: String,
    limit: Int, params: Array[(String, String)], shard: Int,
    start: Long = 0L, maxRows: Long = Long.MaxValue)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper
  private var offset = start
  private var consumed = 0L
  private var page: Iterator[String] = Iterator.empty
  private var exhausted = false
  private var current: InternalRow = _

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def fetchPage(): Unit = {
    val remaining = maxRows - consumed
    if (remaining <= 0) { exhausted = true; page = Iterator.empty; return }
    val pageSize = math.min(limit.toLong, remaining)
    val fields =
      if (readSchema.isEmpty) "" // count(*) pushes an empty projection
      else s"&fields=${enc(readSchema.fieldNames.mkString(","))}"
    val extra = params.map { case (k, v) => s"&${enc(k)}=${enc(v)}" }.mkString
    val full = s"$url?shard=$shard&offset=$offset&limit=$pageSize$fields$extra"
    val conn = new java.net.URL(full).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    try {
      require(conn.getResponseCode == 200,
        s"sharded-http GET $full -> ${conn.getResponseCode}")
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      val lines = body.linesIterator.filter(_.nonEmpty).toSeq
      offset += lines.size
      if (lines.isEmpty) exhausted = true
      page = lines.iterator
    } finally conn.disconnect()
  }

  private def toRow(node: JsonNode): InternalRow = {
    val values = readSchema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case StringType => UTF8String.fromString(
          if (v.isTextual) v.asText() else v.toString)
        case LongType => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType => v.asDouble()
        case FloatType => v.asDouble().toFloat
        case BooleanType => v.asBoolean()
        case dt => throw new IllegalArgumentException(
          s"sharded-http: unsupported field type $dt for ${f.name}")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def next(): Boolean = {
    // the consumed check also guards against a server that ignores the
    // limit parameter: a micro-batch must never overrun its row cap
    while (!page.hasNext && !exhausted) fetchPage()
    if (page.hasNext && consumed < maxRows) {
      current = toRow(mapper.readTree(page.next()))
      consumed += 1
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
