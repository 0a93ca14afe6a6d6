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

    // warm the li persist + JIT once
    time("warmup slice")(noop(result.slice(required)))
    time("slice only")(noop(result.slice(required)))
    time("regroup")(noop(graft.documents.DrsBuilder.regroup(result.slice(required))))
    time("builder no indexd")(noop(
      graft.documents.DrsBuilder.drsDocumentReference(result.slice(required), None)))
    time("builder with indexd")(noop(
      graft.documents.DrsBuilder.drsDocumentReference(result.slice(required), Some(indexd))))
    time("builder with indexd again")(noop(
      graft.documents.DrsBuilder.drsDocumentReference(result.slice(required), Some(indexd))))
    spark.stop()
  }
}
