package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** JDBC extract stage (S1–S3).
  *
  * The reference extracts with hand-written SQL over one connection
  * (etl/ingest.py:61-100). Here every scan is a Spark JDBC relation:
  * Catalyst pushes the `kf_id = …` predicate into the database (S1's
  * WHERE clause comes for free), and large tables read in parallel via
  * partitionColumn ranges — the 100 TB extract path.
  */
object Jdbc {

  final case class Conn(url: String, properties: java.util.Properties)

  /** S1/S2 — point scan with pushed-down predicate. */
  def pointScan(spark: SparkSession, conn: Conn, table: String, keyCol: String,
      keyValue: String): DataFrame =
    spark.read.jdbc(conn.url, table, conn.properties)
      .filter(org.apache.spark.sql.functions.col(keyCol) === keyValue)

  /** Parallel range-partitioned scan for big tables. */
  def partitionedScan(spark: SparkSession, conn: Conn, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(conn.url, table, partitionColumn, lower, upper,
      numPartitions, conn.properties)

  /** S3 — the recursive FK descendant crawl as a fixed-depth semi-join
    * pipeline over the static table-dependency DAG
    * (kf-utils-python's find_descendants_by_kfids re-expressed;
    * etl/ingest.py:83-89). Each level's table is scanned once and
    * filtered to rows reachable from the already-selected parents with
    * a left-semi join — never widening rows, never collecting to the
    * driver.
    *
    * `levels`: (childTable, joinCondition against the parent's columns),
    * in DAG order. Returns every endpoint's reachable rows keyed by
    * table name, mirroring `endpoint -> rows`.
    */
  def descendantCrawl(spark: SparkSession, conn: Conn, root: DataFrame,
      levels: Seq[(String, DataFrame => (DataFrame, Column))]): Map[String, DataFrame] = {
    val acc = scala.collection.mutable.Map[String, DataFrame]()
    var frontier = root
    levels.foreach { case (table, condFor) =>
      val child = spark.read.jdbc(conn.url, table, conn.properties)
      val (parents, cond) = condFor(frontier)
      val reached = child.join(parents, cond, "left_semi")
      acc(table) = reached
      frontier = reached
    }
    acc.toMap
  }
}
