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
    * table, optionally restricted to ids below `below`. Sorted. When
    * the directory carries a compaction manifest, ids below its
    * watermark are visible ONLY if the manifest lists them (the
    * compacted replacement batch) — which is what lets [[compactState]]
    * retire thousands of small per-batch directories without a window
    * where a reader could double-count or see nothing.
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
    val globbed = perTable.reduce(_ intersect _)
    val visible = readManifest(spark, stateDir) match {
      case Some((wm, listed)) =>
        // listed ids are visible UNCONDITIONALLY (their dirs are fully
        // written before the manifest lands; their markers may arrive
        // after it — see the compaction protocol), glob ids only at or
        // above the watermark
        listed.toSet ++ globbed.filter(_ >= wm)
      case None => globbed
    }
    visible.toSeq.filter(k => below.forall(k < _)).sorted
  }

  /** Highest-version compaction manifest: (watermark, listed ids). */
  private def readManifest(spark: SparkSession,
      stateDir: String): Option[(Long, Seq[Long])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(s"$stateDir/_manifest")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("v").toLong -> st.getPath).toOption)
    if (versions.isEmpty) return None
    val latest = versions.maxBy(_._1)._2
    val in = fs.open(latest)
    val line = try scala.io.Source.fromInputStream(in).mkString.trim
    finally in.close()
    val parts = line.split(";")
    Some((parts(0).toLong,
      if (parts.length < 2 || parts(1).isEmpty) Seq.empty
      else parts(1).split(",").map(_.toLong).toSeq))
  }

  private def writeManifest(spark: SparkSession, stateDir: String,
      watermark: Long, listed: Seq[Long]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(s"$stateDir/_manifest")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val next = readManifestVersion(fs, dir) + 1
    // create(overwrite = false) is the atomic publish: a racing writer
    // loses with an exception instead of clobbering
    val out = fs.create(new Path(dir, s"v$next"), false)
    try out.write(s"$watermark;${listed.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifestVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Long =
    fs.listStatus(dir).toSeq.flatMap(st =>
      scala.util.Try(st.getPath.getName.stripPrefix("v").toLong).toOption)
      .sorted.lastOption.getOrElse(0L)

  /** Compact every landed batch of a state directory into ONE batch —
    * the answer to the small-file problem a years-long shard-by-shard
    * ingest accumulates (thousands of `batch=k` directories, each a
    * handful of parquet files, dominate listing and open() time long
    * before data volume matters). `additiveTables` are concatenated
    * (their rows are per-batch-disjoint facts: postings, edges, docs);
    * `snapshotTables` keep only the NEWEST batch's content (cluster
    * maps — already the folded view of all history). The compacted
    * batch lands under id `max(landed) + 1`, so the ascending-id ingest
    * contract continues untouched on top.
    *
    * Crash-safe by ordering, never by luck:
    *  1. every table's union is written to a dot-prefixed staging dir
    *     (hidden from globs AND Spark listings) and its `_SUCCESS`
    *     marker is stripped;
    *  2. staging dirs are renamed to `batch=<C>` — still invisible (the
    *     glob intersection requires markers);
    *  3. the manifest version file is CREATED atomically: watermark C,
    *     listed [C] — the one instant the view flips, old batches out,
    *     C in (listed ids do not need markers, their data is complete
    *     by construction);
    *  4. markers are recreated (tool compatibility) and old batch dirs
    *     plus stale manifests are garbage-collected — all invisible
    *     work; a crash anywhere retries idempotently.
    *
    * A crash between 1 and 3 leaves the OLD view fully intact; a crash
    * after 3 leaves the NEW view fully intact with invisible garbage a
    * re-run sweeps. Do not run concurrently with ingest (same
    * single-writer contract as the batches themselves).
    */
  def compactState(spark: SparkSession, stateDir: String,
      additiveTables: Seq[String], snapshotTables: Seq[String] = Seq.empty):
      Unit = {
    val tables = additiveTables ++ snapshotTables
    val landed = landedBatchIds(spark, stateDir, tables, None)
    if (landed.size <= 1) {
      // heal the step-3/step-4 crash window of a PRIOR run: the
      // manifest flipped but markers were never restored — a bare
      // retry must finish the protocol, not just garbage-collect
      restoreListedMarkers(spark, stateDir, tables)
      gcBelowWatermark(spark, stateDir, tables)
      return
    }
    val c = landed.max + 1
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(stateDir).getFileSystem(conf)

    for (t <- tables) {
      val staged = new Path(s"$stateDir/$t/.compact_$c")
      val src =
        if (additiveTables.contains(t)) landed
        else Seq(landed.max) // snapshot: newest already folds all history
      spark.read.parquet(src.map(k => s"$stateDir/$t/batch=$k"): _*)
        .write.mode(SaveMode.Overwrite).parquet(staged.toString)
      fs.delete(new Path(staged, "_SUCCESS"), false)
      val dest = new Path(s"$stateDir/$t/batch=$c")
      if (fs.exists(dest)) fs.delete(dest, true) // a crashed prior attempt
      require(fs.rename(staged, dest), s"rename failed for $dest")
    }
    writeManifest(spark, stateDir, watermark = c, listed = Seq(c))
    restoreListedMarkers(spark, stateDir, tables)
    gcBelowWatermark(spark, stateDir, tables)
  }

  /** Recreate `_SUCCESS` markers for every manifest-listed batch dir
    * (step 4 of the compaction protocol — cosmetic for manifest-aware
    * readers, load-bearing for marker-globbing tools and `allLanded`).
    */
  private def restoreListedMarkers(spark: SparkSession, stateDir: String,
      tables: Seq[String]): Unit =
    readManifest(spark, stateDir).foreach { case (_, listed) =>
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(stateDir).getFileSystem(conf)
      for (t <- tables; k <- listed) {
        val dir = new Path(s"$stateDir/$t/batch=$k")
        if (fs.exists(dir))
          fs.create(new Path(dir, "_SUCCESS"), true).close()
      }
    }

  /** Delete batch directories the manifest has retired (id below the
    * watermark and not listed) and all but the newest manifest version
    * — invisible garbage, safe to sweep any time.
    */
  private def gcBelowWatermark(spark: SparkSession, stateDir: String,
      tables: Seq[String]): Unit = {
    readManifest(spark, stateDir).foreach { case (wm, listed) =>
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(stateDir).getFileSystem(conf)
      for (t <- tables) {
        val dirs = fs.globStatus(new Path(s"$stateDir/$t/batch=*"))
        if (dirs != null) dirs.foreach { st =>
          scala.util.Try(
            st.getPath.getName.stripPrefix("batch=").toLong).toOption
            .filter(k => k < wm && !listed.contains(k))
            .foreach(_ => fs.delete(st.getPath, true))
        }
      }
      val mdir = new Path(s"$stateDir/_manifest")
      val latest = readManifestVersion(fs, mdir)
      fs.listStatus(mdir).foreach { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("v").toLong).toOption
          .filter(_ < latest)
          .foreach(_ => fs.delete(st.getPath, false))
      }
    }
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
