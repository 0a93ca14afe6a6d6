package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.IdCache

/** The load-stage orchestrator proper (etl/ingest.py:495-517 +
  * kf-lib-data-ingest LoadStage semantics): run every entity builder in
  * the reference's topological target order, resolve each class's
  * natural keys against the persistent id cache (S8) so documents that
  * already exist on the server submit to their existing ids, then hand
  * the resolved frame to the sink.
  *
  * Division of labor: [[Pipeline]] builds (pure transform),
  * [[graft.sinks.IdCache]] memoizes key→id across runs (cache_dir
  * parity), the `submit` callback is the sink boundary
  * ([[graft.sinks.HttpUpsertSink]] PUTs rows with a resolved id and
  * POSTs the rest, exactly the reference's target-id-or-create flow;
  * [[graft.sinks.JdbcUpsertSink]] for the Postgres variant). Cross-class
  * ordering is driver-side sequencing — within a class the submit is
  * partition-parallel, the distributed form of use_async.
  */
object LoadStage {

  /** `fetch` default: a server that resolves nothing (every id comes
    * from the deterministic surrogate embedded in the document).
    */
  private def noResolve(miss: DataFrame): DataFrame =
    miss.select(col("key"), lit(null).cast("string").as("resolved_id")).limit(0)

  /** Build + resolve + submit each target class in load order. `fetch`
    * receives (entity class, one-column `key` frame of cache misses)
    * and returns (key, resolved_id) rows for keys the server knows.
    * Without a cache, every frame carries a null `resolved_id` column
    * (same schema either way, so sinks don't branch).
    */
  def run(result: Transform.Result,
      submit: (String, DataFrame) => Unit,
      cache: Option[IdCache] = None,
      fetch: (String, DataFrame) => DataFrame = (_, m) => noResolve(m),
      indexd: Option[DataFrame] = None,
      centerNames: Map[String, String] = Map.empty): Unit =
    Pipeline.buildAll(result, indexd, centerNames).foreach { case (name, docs) =>
      val resolved = cache match {
        case Some(c) => c.resolve(name, docs, miss => fetch(name, miss))
        case None => docs.withColumn("resolved_id", lit(null).cast("string"))
      }
      submit(name, resolved)
    }
}
