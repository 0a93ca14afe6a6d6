package graft

import org.scalatest.funsuite.AnyFunSuite

/** The battery reached 100% oracle coverage in round 7 (every query
  * hash-compared against DuckDB, zero rows-only checks) — freeze that
  * property so a future query can't silently ship without one. A
  * genuinely non-SQL-expressible op must be added to the allowlist
  * HERE, making the exception a reviewed decision instead of an
  * accident.
  */
class BatteryCoverageSpec extends AnyFunSuite {

  private val allowedWithoutOracle: Set[String] = Set.empty

  test("every battery query has a DuckDB oracle (or a reviewed exemption)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      allowedWithoutOracle
    assert(missing.isEmpty,
      s"queries without an oracle and not exempted: ${missing.toSeq.sorted.mkString(", ")}")
    val stale = allowedWithoutOracle -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"exemptions for queries that no longer exist: $stale")
  }

  test("oracles never reference queries that do not exist") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("driver smoke contract: entry() yields rows at sf0.001") {
    // the driver's own gate is rows > 0; Bench's warmup swallows entry()
    // failures, so pin it here where a break is loud
    val n = SparkEntry.entry(graft.etl.SparkTestSession.spark).count()
    assert(n > 0, "entry() must produce rows for the driver smoke check")
  }
}
