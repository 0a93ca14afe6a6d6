package graft.sinks

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class IdCacheSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(keys: String*): DataFrame =
    keys.map((_, "{}")).toDF("key", "resource_json")

  test("second run resolves from cache without refetching") {
    val dir = Files.createTempDirectory("idcache").toString
    val calls = new AtomicInteger(0)
    // "server" knows PT_1 and PT_2, not PT_3
    val server = Map("PT_1" -> "srv-001", "PT_2" -> "srv-002")
    val fetch: DataFrame => DataFrame = miss => {
      calls.incrementAndGet()
      val known = miss.collect().map(_.getString(0)).filter(server.contains)
      known.map(k => (k, server(k))).toSeq.toDF("key", "resolved_id")
    }

    val run1 = new IdCache(spark, dir)
      .resolve("patient", docs("PT_1", "PT_2"), fetch)
      .select("key", "resolved_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run1 == Map("PT_1" -> "srv-001", "PT_2" -> "srv-002"))
    assert(calls.get() == 1)

    // fresh instance, same dir — every key cached, fetch never consulted
    val run2 = new IdCache(spark, dir)
      .resolve("patient", docs("PT_1", "PT_2"), fetch)
      .select("key", "resolved_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run2 == Map("PT_1" -> "srv-001", "PT_2" -> "srv-002"))
    assert(calls.get() == 1)
  }

  test("only cache-miss keys reach the fetch; unknown keys stay null and re-query") {
    val dir = Files.createTempDirectory("idcache").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    val server = Map("A" -> "id-a", "B" -> "id-b", "D" -> "id-d")
    val fetch: DataFrame => DataFrame = miss => {
      val keys = miss.collect().map(_.getString(0)).toSet
      seen += keys
      keys.filter(server.contains).map(k => (k, server(k))).toSeq
        .toDF("key", "resolved_id")
    }

    val cache = new IdCache(spark, dir)
    val r1 = cache.resolve("specimen", docs("A", "B", "C"), fetch)
      .select("key", "resolved_id").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(r1 == Map("A" -> Some("id-a"), "B" -> Some("id-b"), "C" -> None))
    assert(seen == Seq(Set("A", "B", "C")))

    // A and B resolve locally; C is an unresolved miss again (no negative
    // caching), D is new — fetch sees exactly {C, D}
    val r2 = cache.resolve("specimen", docs("A", "B", "C", "D"), fetch)
      .select("key", "resolved_id").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(r2 == Map("A" -> Some("id-a"), "B" -> Some("id-b"),
      "C" -> None, "D" -> Some("id-d")))
    assert(seen == Seq(Set("A", "B", "C"), Set("C", "D")))
  }

  test("a fetch that resolves nothing appends no batch (unknown keys don't grow the store)") {
    val dir = Files.createTempDirectory("idcache").toString
    val cache = new IdCache(spark, dir)
    val noResolve: DataFrame => DataFrame = miss =>
      miss.limit(0).select(miss("key"), miss("key").as("resolved_id"))
    def storeFiles(): Int = {
      val d = new java.io.File(s"$dir/patient")
      if (d.exists()) d.listFiles().length else 0
    }
    cache.resolve("patient", docs("U1", "U2"), noResolve).collect()
    val after1 = storeFiles()
    cache.resolve("patient", docs("U1", "U2"), noResolve).collect()
    assert(storeFiles() == after1,
      "second all-unknown run must not add parquet batches")
    assert(after1 == 0, "an all-unknown fetch should never create the store")
  }

  test("compaction collapses appended batches without changing resolution") {
    val dir = Files.createTempDirectory("idcache").toString
    val cache = new IdCache(spark, dir)
    cache.append("patient", Seq(("A", "id-a"), ("B", "id-b")).toDF("key", "resolved_id"))
    cache.append("patient", Seq(("B", "id-b"), ("C", "id-c")).toDF("key", "resolved_id"))
    val before = cache.read("patient").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cache.compact("patient")
    val after = cache.read("patient").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after == before)
    assert(after == Map("A" -> "id-a", "B" -> "id-b", "C" -> "id-c"))
    // compacting a never-written class is a no-op, not an error
    cache.compact("specimen")
  }

  test("compaction crash states recover: stranded snapshot adopted, retired rolled back") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    def mapOf(c: IdCache) = c.read("patient").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expect = Map("A" -> "id-a", "B" -> "id-b")

    // crash BETWEEN the two renames: live gone, complete snapshot stranded
    val d1 = Files.createTempDirectory("idcache").toString
    val c1 = new IdCache(spark, d1)
    c1.append("patient", Seq(("A", "id-a"), ("B", "id-b")).toDF("key", "resolved_id"))
    c1.compact("patient") // produce a snapshot-shaped store (has _SUCCESS)
    JFiles.move(Paths.get(s"$d1/patient"), Paths.get(s"$d1/patient__compacting"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(mapOf(new IdCache(spark, d1)) == expect, "stranded snapshot not adopted")
    assert(!JFiles.exists(Paths.get(s"$d1/patient__compacting")))

    // crash DURING the snapshot write (no _SUCCESS): roll back to retired
    val d2 = Files.createTempDirectory("idcache").toString
    val c2 = new IdCache(spark, d2)
    c2.append("patient", Seq(("A", "id-a"), ("B", "id-b")).toDF("key", "resolved_id"))
    JFiles.move(Paths.get(s"$d2/patient"), Paths.get(s"$d2/patient__retired"),
      StandardCopyOption.ATOMIC_MOVE)
    JFiles.createDirectory(Paths.get(s"$d2/patient__compacting")) // incomplete: no _SUCCESS
    assert(mapOf(new IdCache(spark, d2)) == expect, "retired store not rolled back")
    assert(!JFiles.exists(Paths.get(s"$d2/patient__compacting")))

    // live store present + stale leftovers: a READER must not touch
    // them (it could be racing an out-of-band compaction); the next
    // compact() sweeps them and still swaps in the right content
    val d3 = Files.createTempDirectory("idcache").toString
    val c3 = new IdCache(spark, d3)
    c3.append("patient", Seq(("A", "id-a"), ("B", "id-b")).toDF("key", "resolved_id"))
    JFiles.createDirectory(Paths.get(s"$d3/patient__compacting"))
    JFiles.createDirectory(Paths.get(s"$d3/patient__retired"))
    assert(mapOf(new IdCache(spark, d3)) == expect)
    assert(JFiles.exists(Paths.get(s"$d3/patient__compacting")) &&
      JFiles.exists(Paths.get(s"$d3/patient__retired")),
      "a reader must leave maintenance leftovers alone while live exists")
    c3.compact("patient")
    assert(mapOf(c3) == expect)
    assert(!JFiles.exists(Paths.get(s"$d3/patient__compacting")) &&
      !JFiles.exists(Paths.get(s"$d3/patient__retired")),
      "compact() sweeps stale leftovers")
  }

  test("entity classes are cached independently") {
    val dir = Files.createTempDirectory("idcache").toString
    val calls = new AtomicInteger(0)
    val fetch: DataFrame => DataFrame = miss => {
      calls.incrementAndGet()
      miss.collect().map(r => (r.getString(0), "x-" + r.getString(0))).toSeq
        .toDF("key", "resolved_id")
    }
    val cache = new IdCache(spark, dir)
    cache.resolve("patient", docs("K1"), fetch).collect()
    // same key, different class — its own store, so it must fetch again
    cache.resolve("specimen", docs("K1"), fetch).collect()
    assert(calls.get() == 2)
  }
}
