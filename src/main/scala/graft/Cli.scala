package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.etl.{Pipeline, Transform}
import graft.relational.RelationalOps
import graft.sinks.ParquetSink

/** The `kidsfirst fhir-etl SD_X SD_Y …` equivalent (SURVEY §7.1.8,
  * mirroring app/cli.py:17-29): select the requested studies, prune
  * every endpoint to their descendants with the S3 semi-join crawl,
  * run the transform + all 16 entity builders, and write the FHIR
  * resources as parquet partitioned by resource type.
  *
  * Usage: graft.Cli <endpointsDir> <outDir> SD_X [SD_Y …]
  * `endpointsDir` holds one `<endpoint>.parquet` per extracted
  * Dataservice endpoint (absent files = absent endpoints, the
  * presence-driven contract).
  */
object Cli {

  val EndpointNames: Seq[String] = Seq(
    "studies", "investigators", "participants", "families",
    "family-relationships", "diagnoses", "phenotypes", "outcomes",
    "biospecimen-diagnoses", "biospecimens", "biospecimen-genomic-files",
    "genomic-files", "sequencing-experiment-genomic-files",
    "sequencing-experiments")

  /** Load present endpoints and prune each to the chosen studies'
    * descendant closure — per-level `left_semi` joins over the FK DAG
    * (the distributed form of find_descendants_by_kfids, SURVEY S3).
    * Semi-joins never widen rows, so this is pure pruning ahead of the
    * transform's outer-join chain.
    */
  def extract(spark: SparkSession, dir: String, studyIds: Seq[String]): Map[String, DataFrame] = {
    def read(name: String): Option[DataFrame] = {
      // Hadoop FS check, not java.io.File — endpoints may live on
      // hdfs:// or s3a:// in the deployment this targets
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
    }
    val all = EndpointNames.flatMap(n => read(n).map(n -> _)).toMap
    val studies = all.get("studies")
      .map(_.filter(col("kf_id").isin(studyIds.map(x => x: Any): _*)))
      .getOrElse(throw new IllegalArgumentException(s"no studies.parquet in $dir"))
    // Fail fast when a requested study id matches nothing (ingest.py:71,98
    // "{kf_study_id} not found" / "Found {found} study(ies) but expected
    // {expected}") — a typo'd SD_x must not silently produce an empty
    // pipeline. One action over a study-count-sized frame; negligible.
    val found = studies.select("kf_id").distinct()
      .collect().map(_.getString(0)).toSet
    val missing = studyIds.filterNot(found)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"${missing.mkString(", ")} not found: " +
        s"found ${found.size} study(ies) but expected ${studyIds.size}")

    // child endpoint → (child FK column, parent endpoint, parent column)
    val fkDag: Seq[(String, String, String, String)] = Seq(
      ("investigators", "kf_id", "studies", "investigator_id"),
      ("participants", "study_id", "studies", "kf_id"),
      ("families", "kf_id", "participants", "family_id"),
      ("diagnoses", "participant_id", "participants", "kf_id"),
      ("phenotypes", "participant_id", "participants", "kf_id"),
      ("outcomes", "participant_id", "participants", "kf_id"),
      ("biospecimens", "participant_id", "participants", "kf_id"),
      ("biospecimen-diagnoses", "diagnosis_id", "diagnoses", "kf_id"),
      ("biospecimen-genomic-files", "biospecimen_id", "biospecimens", "kf_id"),
      ("genomic-files", "kf_id", "biospecimen-genomic-files", "genomic_file_id"),
      ("sequencing-experiment-genomic-files", "genomic_file_id", "genomic-files", "kf_id"),
      ("sequencing-experiments", "kf_id", "sequencing-experiment-genomic-files",
        "sequencing_experiment_id"))

    val pruned = fkDag.foldLeft(all.updated("studies", studies)) {
      case (acc, (child, fk, parent, parentCol)) =>
        (acc.get(child), acc.get(parent)) match {
          case (Some(c), Some(p)) =>
            acc.updated(child, RelationalOps.descendantCrawl(
              p.select(col(parentCol).as(s"__p")), Seq((c, col(fk) === col("__p")))))
          case _ => acc
        }
    }
    // family-relationships belong to the study if EITHER member does; an
    // OR-condition semi-join would degrade to nested-loop, so semi-join
    // per side and union-dedup by the relationship's own key
    (pruned.get("family-relationships"), pruned.get("participants")) match {
      case (Some(fr), Some(p)) =>
        val keys = p.select(col("kf_id").as("__p"))
        val either = RelationalOps.descendantCrawl(
            keys, Seq((fr, col("participant1_id") === col("__p"))))
          .union(RelationalOps.descendantCrawl(
            keys, Seq((fr, col("participant2_id") === col("__p")))))
          .dropDuplicates("kf_id")
        pruned.updated("family-relationships", either)
      case _ => pruned
    }
  }

  /** A3's count assertions collected IN-FLIGHT by the `Observation`
    * API: the metrics ride the write action itself, where a `.count()`
    * before the write would re-run the whole 16-builder cascade a
    * second time (the pipeline deliberately persists nothing — see
    * Pipeline's do-not-redo notes). The write goes to a STAGING
    * directory and is promoted to `outDir` only after the metrics
    * validate — a failed load never publishes a dataset a
    * presence-of-output consumer could mistake for success. Fails fast
    * on an empty load or a null natural key; returns the metrics.
    */
  def writeObserved(resources: DataFrame, outDir: String): Map[String, Long] = {
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    val obs = org.apache.spark.sql.Observation()
    val observed = resources.observe(obs,
      count(lit(1)).as("n_resources"),
      sum(when(col("key").isNull, 1L).otherwise(0L)).as("null_keys"))
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(resources.sparkSession.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(outDir + ".staging")
    fs.delete(staging, true)
    try {
      ParquetSink.writePartitioned(observed, staging.toString, Seq("resource_type"))
      // a provably-empty plan folds the CollectMetrics node away and the
      // observation row comes back empty — read defensively, so that case
      // lands in the zero-resources failure below instead of a lookup error
      val m = obs.get
      def metric(name: String): Long = m.get(name) match {
        case Some(x: Long) => x
        case _ => 0L
      }
      val metrics = Map(
        "n_resources" -> metric("n_resources"),
        "null_keys" -> metric("null_keys"))
      require(metrics("n_resources") > 0, "load produced zero resources")
      require(metrics("null_keys") == 0,
        s"${metrics("null_keys")} resources with a null natural key")
      // Same atomic-swap discipline as ParquetSink.compact: stage the
      // previously-published output ASIDE (never delete it before the
      // promote lands), and on a failed promote restore it — a failed
      // rename must lose neither the old dataset nor the validated
      // staged copy.
      val old = new org.apache.hadoop.fs.Path(outDir + ".old")
      fs.delete(old, true)
      if (fs.exists(out))
        require(fs.rename(out, old), s"could not stage $outDir aside")
      if (!fs.rename(staging, out)) {
        val rolledBack = !fs.exists(old) || fs.rename(old, out)
        throw new IllegalStateException(
          s"could not promote validated load into $outDir" +
            (if (rolledBack) " (previous output restored; staging kept at " +
              s"$staging)"
             else s" AND rollback failed — previous output is at $old, " +
               s"validated load at $staging"))
      }
      fs.delete(old, true)
      fs.delete(staging, true) // no-op after the successful promote
      metrics
    } catch {
      // a failed PROMOTE deliberately keeps the validated staged copy
      // (the IllegalStateException above says where everything is)
      case e: IllegalStateException => throw e
      // anything earlier (write error, zero rows, null keys) never
      // touched the old output and the staged copy is invalid — drop it
      case e: Throwable =>
        fs.delete(staging, true)
        throw e
    }
  }

  def run(spark: SparkSession, endpointsDir: String, outDir: String,
      studyIds: Seq[String],
      indexd: Option[DataFrame] = None,
      centerNames: Map[String, String] = Map.empty): Unit = {
    val endpoints = extract(spark, endpointsDir, studyIds)
    val result = Transform(endpoints)
    val resources = Pipeline.buildAllUnion(result, indexd, centerNames)
    writeObserved(resources, outDir)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: graft.Cli <endpointsDir> <outDir> SD_X [SD_Y ...]")
    val Array(endpointsDir, outDir, studyIds @ _*) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, endpointsDir, outDir, studyIds)
    spark.stop()
  }
}
