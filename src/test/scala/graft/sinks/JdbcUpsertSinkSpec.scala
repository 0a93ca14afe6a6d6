package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class JdbcUpsertSinkSpec extends AnyFunSuite {

  test("upsert statement is a keyed ON CONFLICT upsert over all non-key columns") {
    val sql = JdbcUpsertSink.upsertSql("fhir_resources", "key",
      Seq("key", "resource_type", "resource_json"))
    assert(sql ==
      "INSERT INTO fhir_resources (key, resource_type, resource_json) " +
        "VALUES (?, ?, ?) " +
        "ON CONFLICT (key) DO UPDATE SET " +
        "resource_type = EXCLUDED.resource_type, " +
        "resource_json = EXCLUDED.resource_json")
  }

  test("key column must be present") {
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", "missing", Seq("a", "b"))
    }
  }

  test("key-only column list is rejected (empty DO UPDATE SET is invalid SQL)") {
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", "key", Seq("key"))
    }
  }
}
