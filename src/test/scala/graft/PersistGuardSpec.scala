package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing persist-lifecycle guard: every battery query must leave the
  * session cache-clean after materializing. An unreleased persist is
  * the one defect class that has already corrupted recorded history
  * (the d10 warm-cache benchmark artifact, root-caused in
  * BENCH_NOTES.md): it silently turns later repeats into warm-cache
  * runs and accumulates blocks per call in a long-lived session.
  *
  * Two leak surfaces are checked after each query:
  *  - `getPersistentRDDs` minus locally-checkpointed entries
  *    (localCheckpoint is cleaner-managed — the ContextCleaner
  *    releases its blocks when the RDD is garbage-collected, so those
  *    entries are lifecycle-sound by construction);
  *  - the session `CacheManager` (a `DataFrame.persist` that never
  *    materialized leaves no blocks but still rewrites every later
  *    overlapping plan to read the stale cache).
  *
  * A query whose plan NEEDS an in-path persist must either release it
  * before returning (the contaminationHitsBloom eager-release shape) or
  * design it away (the d10 one-pass shape); an allowlist entry here is
  * a reviewed decision, not an escape hatch.
  */
class PersistGuardSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val allowlisted: Set[String] = Set.empty

  test("no battery query leaves a persisted RDD or CacheManager entry behind") {
    val failures = Seq.newBuilder[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      fn(spark, dir).count()
      val leaked = spark.sparkContext.getPersistentRDDs
        .filter { case (_, r) =>
          !org.apache.spark.sql.GraftColumnBridge.isLocallyCheckpointed(r) }
      val cacheDirty =
        !org.apache.spark.sql.GraftColumnBridge.cacheManagerEmpty(spark)
      if ((leaked.nonEmpty || cacheDirty) && !allowlisted(name)) {
        failures += s"$name: ${leaked.size} persisted RDD(s) " +
          s"[${leaked.values.map(_.name).mkString("; ")}], " +
          s"cacheManagerDirty=$cacheDirty"
        // reset so one leak doesn't cascade into every later query's check
        leaked.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty,
      s"persist leaks in ${bad.size} queries:\n${bad.mkString("\n")}")
    val stale = allowlisted -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries for dead queries: $stale")
  }
}
