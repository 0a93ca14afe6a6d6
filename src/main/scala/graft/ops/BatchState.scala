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
private[graft] object BatchState {

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

  /** Enforce that every batch of a state directory was ingested under
    * the SAME operator parameters. Cross-batch state is parameter-
    * dependent (band widths on maxDist, prefix indexes on the Jaccard
    * threshold, cell postings on the codebook size): a batch ingested
    * with different knobs would silently join mismatched state and
    * diverge from the one-shot contract without erroring — the same
    * class of hazard the in-order guard closes, so it gets the same
    * loud treatment. First call records the fingerprint (one tiny
    * parquet row under `_params/`); later calls require equality.
    */
  def ensureParams(spark: SparkSession, stateDir: String,
      params: Map[String, String]): Unit = {
    val dir = s"$stateDir/_params"
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$dir/_SUCCESS"))) {
      val stored = spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      require(stored == params,
        s"state at $stateDir was ingested with parameters $stored, " +
          s"but this ingest uses $params; mixed-parameter state would " +
          "silently diverge from the one-shot operator — use a new " +
          "state directory (or re-ingest everything) to change knobs")
    } else {
      import spark.implicits._
      params.toSeq.sortBy(_._1).toDF("k", "v")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    }
  }

  /** The frozen per-corpus codebook (k-means centroids): fit EXACTLY
    * once per state directory — by whichever batch first finds no
    * committed codebook — and reused by every later batch. Keying the
    * fit decision on the CODEBOOK's own existence (not on whether any
    * batch fully landed) closes a silent-corruption window: a fit
    * batch that crashed after committing its codebook but before its
    * tables must NOT cause the next batch to fit a SECOND codebook —
    * two interleaved codebooks would corrupt every later assignment.
    * If multiple committed codebooks are ever found (a manually mangled
    * state dir), reading throws rather than interleaving.
    */
  def ensureCodebook(spark: SparkSession, stateDir: String, batchId: Long)(
      fit: => Seq[Seq[Double]]): Seq[Seq[Double]] = {
    if (!hasCodebook(spark, stateDir)) {
      import spark.implicits._
      land(fit.zipWithIndex.map { case (cv, ci) => (ci, cv) }
        .toDF("ci", "cv"), stateDir, "centroids", batchId)
    }
    readCodebook(spark, stateDir)
  }

  def hasCodebook(spark: SparkSession, stateDir: String): Boolean =
    codebookDirs(spark, stateDir).nonEmpty

  private def codebookDirs(spark: SparkSession,
      stateDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val glob = new Path(s"$stateDir/centroids/batch=*/_SUCCESS")
    val found = glob.getFileSystem(conf).globStatus(glob)
    if (found == null) Seq.empty
    else found.toSeq.map(_.getPath.getParent.toString).sorted
  }

  def readCodebook(spark: SparkSession,
      stateDir: String): Seq[Seq[Double]] = {
    val dirs = codebookDirs(spark, stateDir)
    require(dirs.nonEmpty, s"no committed codebook under $stateDir")
    require(dirs.size == 1,
      s"multiple committed codebooks under $stateDir (${dirs.size}); " +
        "refusing to interleave them — remove all but the fit batch's")
    spark.read.parquet(dirs.head)
      .orderBy("ci").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
  }
}
