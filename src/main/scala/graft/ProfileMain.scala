package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for the KF pipeline (not part of the driver
  * contract): times every entity builder and the one-shot union at
  * SPARK_GRAFT_SF_DIR.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ", "0"))
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

    val endpoints = graft.queries.KfShaped.endpoints(spark, sfDir)
    val result = graft.etl.Transform(endpoints)
    val parts = graft.etl.Pipeline.buildAll(result,
      indexd = Some(graft.queries.KfShaped.indexd(spark, sfDir)),
      centerNames = Map("SC_1" -> "Center One", "SC_2" -> "Center Two"))
    parts.foreach { case (name, df) =>
      time(s"builder $name") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    def union() = graft.etl.Pipeline.buildAllUnion(result,
      indexd = Some(graft.queries.KfShaped.indexd(spark, sfDir)),
      centerNames = Map("SC_1" -> "Center One", "SC_2" -> "Center Two"))
    time("full union one-shot") {
      union().write.format("noop").mode("overwrite").save()
    }

    // kf_full_pipeline / kf_counts_by_type overlap: is recomputing the
    // union for the counts cheaper than persisting it once and serving
    // both? (a) the independent-plans pair as the bench runs it;
    // (b) persist -> noop write materializes the cache -> counts off it.
    time("(a) counts recompute, independent plan") {
      union().groupBy("builder").count().collect()
    }
    val cached = union().persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("(b) full union WITH persist (materialize)") {
      cached.write.format("noop").mode("overwrite").save()
    }
    time("(b) counts off the persisted union") {
      cached.groupBy("builder").count().collect()
    }
    cached.unpersist()
    spark.stop()
  }
}
