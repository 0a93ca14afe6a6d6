package graft.functions

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

/** The MinHash-merge Aggregator: signature of a union of chunks equals
  * the elementwise min of chunk signatures — verified against signing
  * the concatenated text directly.
  */
class MinhashMergeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sig(c: org.apache.spark.sql.Column, n: Int, k: Int) =
    GraftColumnBridge.column(MinhashText(GraftColumnBridge.expression(c), n, k))

  test("merged chunk signatures equal the whole-document signature") {
    // shingle width 1 so chunk boundaries don't create or destroy
    // shingles (the union-of-sets property holds exactly)
    val chunks = Seq(
      (1L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta"),
      (2L, "one two three four five six")).toDF("doc_id", "chunk")

    val merged = chunks
      .select(col("doc_id"), sig(col("chunk"), 1, 8).as("sig"))
      .as[(Long, Seq[String])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinhashMerge.toColumn.name("sig"))
      .toDF("doc_id", "sig")

    val whole = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
      .select(col("doc_id"), sig(col("text"), 1, 8).as("sig"))

    val m = merged.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val w = whole.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m == w)
  }

  test("width mismatch is rejected") {
    val bad = Seq((1L, Seq("aaaa", "bbbb")), (1L, Seq("cccc"))).toDF("doc_id", "sig")
    val ex = intercept[Exception] {
      bad.as[(Long, Seq[String])].groupByKey(_._1).mapValues(_._2)
        .agg(MinhashMerge.toColumn.name("sig")).collect()
    }
    assert(ex.getMessage != null)
  }
}
