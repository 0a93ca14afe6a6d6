package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class ParquetSinkSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("partitioned write: one file per partition value, prunable on read") {
    val out = Files.createTempDirectory("psink").toString
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    ParquetSink.writePartitioned(orders, out, Seq("o_orderstatus"))

    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("o_orderstatus=")).map(_.getName).sorted
    assert(dirs.nonEmpty, "no partition directories written")
    // pre-write repartition on the partition column ⇒ single file per dir
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files (small-file explosion)")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    // partition pruning visible in the scan
    val p = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning:\n$p")
  }
}
