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
    time("full union one-shot") {
      graft.etl.Pipeline.buildAllUnion(result,
        indexd = Some(graft.queries.KfShaped.indexd(spark, sfDir)),
        centerNames = Map("SC_1" -> "Center One", "SC_2" -> "Center Two"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
