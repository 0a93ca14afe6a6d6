package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Natural-key → target-id resolution as a JOIN (S8): the distributed
  * replacement for the reference's per-row `get_target_id_from_record`
  * RPC + on-disk cache (etl/ingest.py:508-515).
  *
  * Fetch (or read from a registry table) one id-map DataFrame per
  * resource type BEFORE building documents, broadcast-join it against
  * the records, and fall back to the deterministic surrogate for keys
  * the server has never seen. Refresh between entity stages so
  * cross-stage references resolve (SURVEY §7.4 risk 4).
  */
object IdMap {

  /** Left-join resolved server ids onto docs; unresolved keys keep their
    * surrogate id (already embedded in the document JSON).
    */
  def resolve(docs: DataFrame, idMap: DataFrame,
      keyCol: String = "key", idCol: String = "resolved_id"): DataFrame =
    docs.join(broadcast(idMap.select(col(keyCol), col(idCol))), Seq(keyCol), "left")

  /** An id-map from a JDBC registry (e.g. the Postgres sink variant). */
  def fromJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
}
