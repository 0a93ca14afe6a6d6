package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared machinery of the batch-partitioned parquet state pattern
  * (`<stateDir>/<table>/batch=<k>/`) behind [[IncrementalCurateOps]],
  * [[IncrementalDedupOps]] and [[IncrementalIndexOps]]: idempotent
  * per-batch OVERWRITE gated on `_SUCCESS` markers, all-or-nothing
  * batch visibility (a batch counts only when EVERY table carries its
  * marker — per-table visibility would let a crash between two table
  * writes expose half a batch), and constant-RPC batch listing (ONE
  * `globStatus` per table, never O(batches) `exists` probes — on an
  * object store the latter dominates a many-thousand-batch corpus's
  * planning time).
  */
private[ops] object BatchState {

  /** Batch ids visible as state: present with `_SUCCESS` in EVERY
    * table, optionally restricted to ids below `below`. Sorted.
    */
  def landedBatchIds(spark: SparkSession, stateDir: String,
      tables: Seq[String], below: Option[Long]): Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val perTable = tables.map { t =>
      val glob = new Path(s"$stateDir/$t/batch=*/_SUCCESS")
      val found = glob.getFileSystem(conf).globStatus(glob)
      if (found == null) Set.empty[Long]
      else found.toSeq.flatMap { st =>
        scala.util.Try(
          st.getPath.getParent.getName.stripPrefix("batch=").toLong).toOption
      }.toSet
    }
    perTable.reduce(_ intersect _).toSeq
      .filter(k => below.forall(k < _)).sorted
  }

  /** True iff every listed table has a committed `batch=k` directory. */
  def allLanded(spark: SparkSession, stateDir: String, tables: Seq[String],
      batchId: Long): Boolean = {
    val fs = new Path(stateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    tables.forall(t =>
      fs.exists(new Path(s"$stateDir/$t/batch=$batchId/_SUCCESS")))
  }

  /** Enforce ascending-id ingestion LOUDLY — for operators whose
    * cross-batch work (new∕old edges, frozen codebooks) would silently
    * diverge from the one-shot union if a batch arrived after a later
    * one already landed.
    */
  def requireInOrder(landed: Seq[Long], batchId: Long): Unit =
    require(landed.forall(_ < batchId),
      s"out-of-order ingest: batch $batchId arrived after batch(es) " +
        s"${landed.filter(_ > batchId).mkString(",")} already landed; " +
        "batches must be ingested in ascending id order")

  /** Idempotent overwrite of one table's `batch=k` directory. */
  def land(df: DataFrame, stateDir: String, table: String,
      batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/$table/batch=$batchId")

  /** Union-read of one table across the given batch ids. */
  def readBatches(spark: SparkSession, stateDir: String, table: String,
      ids: Seq[Long]): Option[DataFrame] = {
    val paths = ids.map(k => s"$stateDir/$table/batch=$k")
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }
}
