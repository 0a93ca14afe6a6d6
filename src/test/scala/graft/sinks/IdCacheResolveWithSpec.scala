package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class IdCacheResolveWithSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("resolve joins server ids; unresolved keys keep a null resolved_id") {
    val docs = Seq(("PT_1", "{}"), ("PT_2", "{}"), ("PT_3", "{}"))
      .toDF("key", "resource_json")
    val idMap = Seq(("PT_1", "srv-001"), ("PT_3", "srv-003"))
      .toDF("key", "resolved_id")
    val got = IdCache.resolveWith(docs, idMap)
      .select("key", "resolved_id")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "PT_1" -> Some("srv-001"),
      "PT_2" -> None,
      "PT_3" -> Some("srv-003")))
  }

  test("resolve never drops or duplicates rows (left join on unique keys)") {
    val docs = (1 to 100).map(i => (s"K_$i", "{}")).toDF("key", "resource_json")
    val idMap = (1 to 50).map(i => (s"K_$i", s"id-$i")).toDF("key", "resolved_id")
    assert(IdCache.resolveWith(docs, idMap).count() == 100)
  }
}
