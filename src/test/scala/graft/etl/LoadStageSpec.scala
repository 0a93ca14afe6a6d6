package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.IdCache

/** LoadStage orchestration: topological submit order, id-cache
  * resolution per entity class, cross-run memoization.
  */
class LoadStageSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def result: Transform.Result = Transform(Map(
    "studies" -> Seq(
      ("SD_X", "phs1", "Study X", "SX", "SDX", "v1", "attr", "dbGaP",
        "CANCER", "Kids First", "Pending", "True", null)
    ).toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
      "attribution", "data_access_authority", "domain", "program",
      "release_status", "visible", "investigator_id"),
    "participants" -> Seq(
      ("PT_1", "p1", "SD_X", "FM_1", "True", "True", "Cancer", "Female",
        "Not Hispanic or Latino", "White", "Homo sapiens", "True"),
      ("PT_2", "p2", "SD_X", "FM_1", "False", "False", "Cancer", "Male",
        "Unknown", "Asian", "Homo sapiens", "True")
    ).toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
      "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
      "species", "visible")))

  test("submits every enabled builder in the reference's load order, " +
      "with a resolved_id column even without a cache") {
    val submitted = scala.collection.mutable.ArrayBuffer.empty[String]
    LoadStage.run(result, (name, df) => {
      assert(df.columns.contains("resolved_id"))
      assert(df.where("resolved_id IS NOT NULL").count() == 0)
      submitted += name
    })
    assert(submitted.toSeq ==
      Seq("patient", "proband_status", "research_study", "research_subject"))
  }

  test("id cache: known keys resolve, misses fetch once per class, " +
      "second run resolves from cache without refetching") {
    val dir = Files.createTempDirectory("loadstage-idcache").toString
    // server knows PT_1 as a patient; nothing else
    val server = Map(("patient", "PT_1") -> "srv-pat-1")
    val fetched = scala.collection.mutable.ArrayBuffer.empty[(String, Set[String])]
    val fetch: (String, DataFrame) => DataFrame = (cls, miss) => {
      val keys = miss.collect().map(_.getString(0)).toSet
      fetched += ((cls, keys))
      keys.flatMap(k => server.get((cls, k)).map(k -> _)).toSeq
        .toDF("key", "resolved_id")
    }

    def patients(): Map[String, Option[String]] = {
      var out: Map[String, Option[String]] = null
      LoadStage.run(result, (name, df) => if (name == "patient") {
        out = df.select("key", "resolved_id").collect()
          .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      }, cache = Some(new IdCache(spark, dir)), fetch = fetch)
      out
    }

    val first = patients()
    assert(first == Map("PT_1" -> Some("srv-pat-1"), "PT_2" -> None))
    // every class fetched once on the cold cache, each with its own keys
    assert(fetched.map(_._1).toSet ==
      Set("patient", "proband_status", "research_study", "research_subject"))
    assert(fetched.collect { case ("patient", ks) => ks } == Seq(Set("PT_1", "PT_2")))

    fetched.clear()
    val second = patients()
    assert(second == Map("PT_1" -> Some("srv-pat-1"), "PT_2" -> None))
    // PT_1 came from the cache; only the unresolved PT_2 re-queries
    assert(fetched.collect { case ("patient", ks) => ks } == Seq(Set("PT_2")))
  }

  test("end-to-end load: resolved ids PUT to the server id, the rest POST") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.net.InetSocketAddress
    import java.util.concurrent.ConcurrentLinkedQueue
    val requests = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(t: HttpExchange): Unit = {
        requests.add(t.getRequestMethod + " " + t.getRequestURI.getPath)
        t.getRequestBody.readAllBytes()
        val ok = "{}".getBytes("UTF-8")
        t.sendResponseHeaders(if (t.getRequestMethod == "POST") 201 else 200, ok.length)
        t.getResponseBody.write(ok); t.close()
      }
    })
    server.start()
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      val dir = Files.createTempDirectory("loadstage-e2e").toString
      val server2 = Map(("patient", "PT_1") -> "srv-pat-1")
      val fetch: (String, DataFrame) => DataFrame = (cls, miss) => {
        val keys = miss.collect().map(_.getString(0))
        keys.flatMap(k => server2.get((cls, k)).map(k -> _)).toSeq
          .toDF("key", "resolved_id")
      }
      LoadStage.run(result,
        (_, df) => graft.sinks.HttpUpsertSink.upsert(df,
          graft.sinks.HttpUpsertSink.Config(base), idCol = "resolved_id"),
        cache = Some(new IdCache(spark, dir)), fetch = fetch)
      val reqs = requests.toArray(Array.empty[String]).toSeq
      // 2 patients + 2 proband observations + 1 study + 2 subjects = 7 rows;
      // exactly the one resolved patient PUTs to its server id
      assert(reqs.count(_.startsWith("PUT ")) == 1, reqs)
      assert(reqs.contains("PUT /Patient/srv-pat-1"), reqs)
      assert(reqs.count(_.startsWith("POST ")) == 6, reqs)
    } finally server.stop(0)
  }
}
