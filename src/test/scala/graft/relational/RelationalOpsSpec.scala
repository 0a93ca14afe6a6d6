package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class RelationalOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join for inner and left joins") {
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y"), (4, "Z")).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val expected = left.join(right, Seq("k"), jt)
        .collect().map(_.toSeq).toSet
      val got = RelationalOps.saltedJoin(left, right, Seq("k"), buckets = 4, jt)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"salted $jt join diverges")
    }
  }

  test("saltedJoin rejects full_outer (replication would duplicate unmatched rows)") {
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      RelationalOps.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }

  test("approx_count_distinct stays within 5% of exact on the orders table") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    val row = orders.agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx"),
      countDistinct(col("o_custkey")).as("exact")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }
}
