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

  test("co-bucketed tables join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    // a crashed previous run can leave the managed location behind with
    // no catalog entry — clear both
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    ParquetSink.writeBucketed(
      graft.Tables.orders(spark, dir), "b_orders", Seq("o_orderkey"), 4,
      sortCols = Seq("o_orderkey"))
    ParquetSink.writeBucketed(
      graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity"),
      "b_lineitem", Seq("l_orderkey"), 4, sortCols = Seq("l_orderkey"))
    // force the sort-merge path (broadcast would mask bucketing)
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("q", col("l_quantity") + 1)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"co-bucketed join still shuffles:\n$p")
    assert(p.contains("Bucketed: true"), s"bucketed read not used:\n$p")
    assert(joined.count() ==
      graft.Tables.lineitem(spark, dir).count())
  }
}
