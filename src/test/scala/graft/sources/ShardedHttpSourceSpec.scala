package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

/** End-to-end harness for the DSv2 sharded HTTP connector: a live local
  * server owns a deterministic 100-row dataset sharded by `id % shards`
  * and answers the connector's range protocol, RECORDING every request
  * URL — so the tests assert not just result correctness but that
  * pruning/pushdown actually changed what crossed the wire.
  */
class ShardedHttpSourceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  // (id, lang, score) — langs cycle en/fr/de
  private val data = (0 until 100).map { i =>
    (i.toLong, Seq("en", "fr", "de")(i % 3), i / 100.0)
  }

  /** Serve the range protocol over `rows` (a mutable buffer, so tests
    * can append "live" data for the streaming form); supports the
    * `counts=true` offset probe. Returns (baseUrl, requestLog, stop).
    */
  private def serveRows(shards: Int,
      rows: collection.mutable.Buffer[(Long, String, Double)])
    : (String, collection.mutable.Buffer[String], () => Unit) = {
    val log = collection.mutable.Buffer[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/data", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        log.synchronized { log += q }
        val params = q.split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
        val snapshot = rows.synchronized { rows.toVector }
        def filtered(shard: Int) = snapshot
          .filter(_._1 % shards == shard)
          .filter(r => params.get("lang").forall(_ == r._2))
          .filter(r => params.get("id").forall(_.toLong == r._1))
        val body = (if (params.contains("counts")) {
          (0 until shards)
            .map(s => s""""$s":${filtered(s).size}""").mkString("{", ",", "}")
        } else {
          val shard = params("shard").toInt
          val offset = params("offset").toInt
          val limit = params("limit").toInt
          val fields = params.get("fields").map(_.split(",").toSeq)
            .getOrElse(Seq("id", "lang", "score"))
          filtered(shard).slice(offset, offset + limit)
            .map { case (id, lang, score) =>
              fields.flatMap {
                case "id" => Some(s""""id":$id""")
                case "lang" => Some(s""""lang":"$lang"""")
                case "score" => Some(s""""score":$score""")
                case _ => None // unknown requested field: omit, like a real API
              }.mkString("{", ",", "}")
            }.mkString("\n")
        }).getBytes("UTF-8")
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    (s"http://localhost:${server.getAddress.getPort}/data", log,
      () => server.stop(0))
  }

  private def serve(shards: Int)
    : (String, collection.mutable.Buffer[String], () => Unit) =
    serveRows(shards, collection.mutable.Buffer(data: _*))

  private def read(url: String, shards: Int, limit: Int = 10) =
    spark.read.format("graft.sources.ShardedHttpSource")
      .schema("id LONG, lang STRING, score DOUBLE")
      .option("url", url).option("shards", shards).option("limit", limit)
      .load()

  test("reads every shard in parallel partitions with paged fetches") {
    val (url, log, stop) = serve(shards = 4)
    try {
      val df = read(url, shards = 4)
      assert(df.rdd.getNumPartitions == 4, "one partition per shard")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(got.sorted.sameElements(data.sorted), "full dataset round-trips")
      // every shard was queried, and shard 0 (25 rows, limit 10) paged:
      // offsets 0, 10, 20, and the empty 25 terminator
      val shardsSeen = log.map(_.split("&").head).distinct.sorted
      assert(shardsSeen == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
      assert(log.count(_.startsWith("shard=0")) == 4,
        s"shard 0 should take 4 paged requests: ${log.filter(_.startsWith("shard=0"))}")
    } finally stop()
  }

  test("column pruning travels to the server: unrequested columns never " +
      "cross the wire") {
    val (url, log, stop) = serve(shards = 2)
    try {
      val langs = read(url, shards = 2).select("lang")
        .collect().map(_.getString(0))
      assert(langs.count(_ == "en") == 34 && langs.length == 100)
      assert(log.nonEmpty && log.forall(_.contains("fields=lang")),
        s"server must only be asked for 'lang': ${log.take(3)}")
      assert(log.forall(q => !q.contains("score")), "score requested despite pruning")
    } finally stop()
  }

  test("equality filters push into the query string; non-equality stays " +
      "post-scan; results correct either way") {
    val (url, log, stop) = serve(shards = 2)
    try {
      val df = read(url, shards = 2)
        .where(col("lang") === "en" && col("score") > 0.5)
      val scans = df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty, "no DSv2 scan in plan")
      assert(scans.head.scan.description().contains("EqualTo(lang,en)"),
        s"lang equality should be a pushed filter: ${scans.head.scan.description()}")
      val got = df.collect().map(_.getLong(0)).sorted
      val expected = data.filter(r => r._2 == "en" && r._3 > 0.5).map(_._1).sorted
      assert(got.sameElements(expected))
      // the server saw the lang parameter (and so never shipped fr/de
      // rows); the range predicate is NOT a parameter
      assert(log.forall(_.contains("lang=en")), s"unpushed lang: ${log.take(3)}")
      assert(log.forall(q => !q.contains("score=")), "range filter wrongly pushed")
    } finally stop()
  }

  test("micro-batch streaming: AvailableNow ingests exactly the rows that " +
      "arrived since the checkpoint, across restarts, per shard") {
    val live = collection.mutable.Buffer(data.take(30): _*)
    val (url, _, stop) = serveRows(shards = 3, live)
    val ckpt = java.nio.file.Files.createTempDirectory("http_stream_ckpt").toString
    val got = collection.mutable.Buffer[Long]()
    def runOnce(): Seq[Long] = {
      val batchRows = collection.mutable.Buffer[Long]()
      val stream = spark.readStream.format("graft.sources.ShardedHttpSource")
        .schema("id LONG, lang STRING, score DOUBLE")
        .option("url", url).option("shards", 3).option("limit", 7)
        .load()
      graft.streaming.Streaming.runAvailableNow(stream, ckpt) { (df, _) =>
        val ids = df.select("id").collect().map(_.getLong(0))
        batchRows ++= ids
      }
      got ++= batchRows
      batchRows.toSeq
    }
    try {
      val first = runOnce()
      assert(first.sorted.sameElements((0L until 30L)),
        s"first run must ingest the initial 30 rows: ${first.sorted.toSeq}")
      // live appends while the query is DOWN; the restarted query must
      // pick up exactly the delta from the checkpointed offsets
      live.synchronized { live ++= data.slice(30, 42) }
      val second = runOnce()
      assert(second.sorted.sameElements((30L until 42L)),
        s"second run must ingest exactly the 12 new rows: ${second.sorted.toSeq}")
      assert(got.distinct.size == got.size, "a row was ingested twice")
      // a third run with nothing new ingests nothing
      assert(runOnce().isEmpty, "idle restart re-ingested data")
    } finally stop()
  }

  test("missing fields surface as nulls; schema is required") {
    val (url, _, stop) = serve(shards = 1)
    try {
      // ask for a column the server never returns -> null, not a crash
      val df = spark.read.format("graft.sources.ShardedHttpSource")
        .schema("id LONG, nope STRING")
        .option("url", url).option("shards", 1).load()
      val rows = df.collect()
      assert(rows.length == 100 && rows.forall(_.isNullAt(1)))
      val ex = intercept[IllegalArgumentException] {
        spark.read.format("graft.sources.ShardedHttpSource")
          .option("url", url).load().collect()
      }
      assert(ex.getMessage.contains("schema"))
    } finally stop()
  }
}
