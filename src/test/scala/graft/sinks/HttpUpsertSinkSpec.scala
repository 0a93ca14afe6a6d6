package graft.sinks

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

/** End-to-end sink test against an embedded JDK HTTP server: PUT-then-
  * POST-fallback upsert semantics, retry on 5xx, partition-parallel
  * submits.
  */
class HttpUpsertSinkSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private class Target extends HttpHandler {
    val store = new ConcurrentHashMap[String, String]()
    val putCount = new java.util.concurrent.atomic.AtomicInteger()
    val postCount = new java.util.concurrent.atomic.AtomicInteger()
    val flaky = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var failFirstN = 0

    override def handle(t: HttpExchange): Unit = {
      val body = new String(t.getRequestBody.readAllBytes(), "UTF-8")
      val path = t.getRequestURI.getPath
      val (status, response): (Int, String) =
        if (failFirstN > 0 && flaky.incrementAndGet() <= failFirstN) (503, "ko")
        else t.getRequestMethod match {
          case "PUT" =>
            putCount.incrementAndGet()
            val id = path.split("/").last
            // unknown ids are rejected to force the POST fallback
            if (store.containsKey(id) || id.startsWith("known")) {
              store.put(id, body); (200, "ok")
            } else (400, "no resource with this ID exists")
          case "POST" =>
            postCount.incrementAndGet()
            store.put("posted-" + store.size, body)
            (201, "created")
        }
      val bytes = response.getBytes("UTF-8")
      t.sendResponseHeaders(status, bytes.length)
      t.getResponseBody.write(bytes); t.close()
    }
  }

  private def withServer(f: (Target, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val target = new Target
    server.createContext("/", target)
    server.start()
    try f(target, s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("PUT for known ids, POST fallback for unknown, all rows land") {
    withServer { (target, url) =>
      val docs = Seq(
        ("known-1", "Patient", """{"id":"known-1"}"""),
        ("known-2", "Patient", """{"id":"known-2"}"""),
        ("new-1", "Patient", """{"id":"new-1"}""")
      ).toDF("key", "resource_type", "resource_json")
      val (ok, failed) = HttpUpsertSink.upsert(docs, HttpUpsertSink.Config(url))
      assert(ok == 3 && failed == 0)
      assert(target.store.size == 3)
      assert(target.postCount.get == 1, "exactly one POST fallback")
    }
  }

  test("5xx responses are retried and eventually succeed") {
    withServer { (target, url) =>
      target.failFirstN = 2
      val docs = Seq(("known-9", "Patient", """{"id":"known-9"}"""))
        .toDF("key", "resource_type", "resource_json")
      val (ok, failed) = HttpUpsertSink.upsert(docs,
        HttpUpsertSink.Config(url, maxRetries = 3, initialBackoffMs = 10))
      assert(ok == 1 && failed == 0)
    }
  }

  test("retry exhaustion fails the job loudly with a bounded request count") {
    withServer { (target, url) =>
      target.failFirstN = Int.MaxValue // permanent 503
      val docs = Seq(("known-x", "Patient", """{"id":"known-x"}"""))
        .toDF("key", "resource_type", "resource_json")
      val thrown = intercept[Exception] {
        HttpUpsertSink.upsert(docs,
          HttpUpsertSink.Config(url, maxRetries = 2, initialBackoffMs = 1))
      }
      // the task failure must carry the HTTP status, not vanish into a
      // silent skip — surfacing is the contract
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(thrown).exists(_.contains("503")),
        s"status not surfaced: ${messages(thrown)}")
      assert(target.store.isEmpty, "nothing may be recorded as stored")
      // bounded attempts: (maxRetries+1) PUTs then (maxRetries+1) POSTs
      // per task attempt — never an unbounded loop
      assert(target.flaky.get <= 2 * 3 * 4,
        s"unbounded retries: ${target.flaky.get} requests")
    }
  }
}
