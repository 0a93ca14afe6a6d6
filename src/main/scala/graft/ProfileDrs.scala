package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for the DRS builder path (not part of the
  * driver contract): times the slice chain, the regroup, and the full
  * builder so hotspot work is measured, not guessed.
  */
object ProfileDrs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val endpoints = graft.queries.KfShaped.endpoints(spark, sfDir)
    val result = graft.etl.Transform(endpoints)
    val required = Set("studies", "participants", "biospecimens",
      "biospecimen-genomic-files", "genomic-files",
      "sequencing-experiment-genomic-files", "sequencing-experiments")
    val indexd = graft.queries.KfShaped.indexd(spark, sfDir)

    import org.apache.spark.sql.functions._
    def pruned() = {
      val w = result.slice(required)
      import graft.etl.Concepts._
      w.select(
        col(s"`${Study.TargetServiceId}`").as("study_id"),
        col(s"`${GenomicFile.TargetServiceId}`").as("gf_id"),
        col(s"`${Participant.TargetServiceId}`").as("pid"),
        col(s"`${Biospecimen.TargetServiceId}`").as("bs_id"),
        col(s"`${Sequencing.TargetServiceId}`").as("seq_id"))
    }
    // warm the li persist + JIT once
    time("warmup pruned slice")(noop(pruned()))
    time("pruned slice")(noop(pruned()))
    time("pruned slice count")(println("rows=" + pruned().count()))
    time("decomposed builder+indexd")(noop(
      graft.documents.DrsBuilder.drsDocumentReference(result, Some(indexd))))
    // per-builder cost inside the full pipeline
    for ((name, df) <- graft.etl.Pipeline.buildAll(result, Some(indexd)))
      time(s"builder $name")(noop(df))
    spark.stop()
  }
}
