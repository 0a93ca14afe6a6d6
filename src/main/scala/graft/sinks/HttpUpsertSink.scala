package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Idempotent keyed HTTP upsert sink
  * (target_api_plugins/kf_api_fhir_service.py:37-94 + the async
  * LoadStage submit, etl/ingest.py:505-515).
  *
  * Scale design: `foreachPartition` gives one HTTP client per partition
  * (connection reuse), partition-parallel submits across all executors —
  * the distributed generalization of the reference's use_async thread
  * pool. Retries with exponential backoff reproduce the retrying
  * Session (common/utils.py:58). Cross-entity ordering stays in the
  * driver: call once per builder in `Transform.Result.targets` order.
  */
object HttpUpsertSink {

  final case class Config(
      baseUrl: String,
      maxRetries: Int = 3,
      initialBackoffMs: Long = 200,
      timeout: Duration = Duration.ofSeconds(30))

  /** PUT /{type}/{id}; on 404-ish "no resource with this ID exists" or
    * missing id, POST /{type} (kf_api_fhir_service.py:53-76). Non-2xx
    * after retries → exception fails the task (Spark retries the
    * partition — idempotent because upserts are keyed).
    * Returns (submitted, failed) accumulator values.
    */
  def upsert(docs: DataFrame, config: Config,
      idCol: String = "key", typeCol: String = "resource_type",
      jsonCol: String = "resource_json"): (Long, Long) = {
    val spark = docs.sparkSession
    val ok: LongAccumulator = spark.sparkContext.longAccumulator("upsert_ok")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("upsert_failed")
    val base = config.baseUrl.stripSuffix("/")
    val (retries, backoff, timeout) =
      (config.maxRetries, config.initialBackoffMs, config.timeout)

    docs.select(col(idCol), col(typeCol), col(jsonCol)).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = HttpClient.newBuilder().connectTimeout(timeout).build()
        rows.foreach { row =>
          val (id, tpe, body) = (row.getString(0), row.getString(1), row.getString(2))
          def send(req: HttpRequest): HttpResponse[String] = {
            var attempt = 0
            var last: HttpResponse[String] = null
            var ex: Throwable = null
            while (attempt <= retries &&
                (last == null || last.statusCode >= 500)) {
              if (attempt > 0) Thread.sleep(backoff << (attempt - 1))
              try { last = client.send(req, HttpResponse.BodyHandlers.ofString()); ex = null }
              catch { case t: Throwable => ex = t }
              attempt += 1
            }
            if (ex != null) throw new RuntimeException(s"upsert failed after retries", ex)
            last
          }
          def jsonReq(method: String, url: String): HttpRequest =
            HttpRequest.newBuilder(URI.create(url))
              .header("Content-Type", "application/json")
              .method(method, HttpRequest.BodyPublishers.ofString(body))
              .timeout(timeout).build()
          val putResp =
            if (id != null && id.nonEmpty) send(jsonReq("PUT", s"$base/$tpe/$id")) else null
          val resp =
            if (putResp != null && putResp.statusCode < 300) putResp
            else send(jsonReq("POST", s"$base/$tpe"))
          if (resp.statusCode < 300) ok.add(1)
          else {
            failed.add(1)
            throw new RuntimeException(
              s"upsert $tpe/$id -> HTTP ${resp.statusCode}: ${resp.body.take(500)}")
          }
        }
    }
    (ok.value, failed.value)
  }
}
