package graft.functions

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import graft.ops.{DedupOps, TextOps}

class MinhashSlicesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sigCol(k: Int) = GraftColumnBridge.column(
    MinhashSlices(GraftColumnBridge.expression(col("sh")), k))

  test("native expression equals the composed array_min/transform/md5 form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m",
      "one two three").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh"))
    val composed = DedupOps.minhashSignature(col("sh"), 8)
    val rows = docs.select(
      sigCol(8).as("native"),
      array(composed: _*).as("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("null and empty arrays yield null; null elements are skipped") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String])).toDF("id", "sh")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "sh"))
    val got = df.select(col("id"), sigCol(4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isDefined)
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("fused MinhashText equals MinhashSlices over the shingle transform") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and   irregular   whitespace here  ",
      "exactly three tokens",
      "two tokens", // fewer than the shingle width → null signature
      "").toDF("text")
    val fused = GraftColumnBridge.column(MinhashText(
      GraftColumnBridge.expression(col("text")), 3, 8))
    val composed = GraftColumnBridge.column(MinhashSlices(
      GraftColumnBridge.expression(TextOps.shingles(col("text"), 3)), 8))
    docs.select(fused.as("f"), composed.as("c")).collect().foreach { r =>
      assert(Option(r.get(0)) == Option(r.get(1)),
        s"fused=${r.get(0)} composed=${r.get(1)}")
    }
  }

  test("native SimhashText equals the composed 16-fold form on real docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100)
    val rows = docs.select(
      DedupOps.simhash16(col("text")).as("native"),
      DedupOps.simhash16Composed(col("text")).as("composed")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("SQL surface via GraftExtensions session injection") {
    // the shared test session has the extension only if configured; use a
    // fresh function registration path through the extension class
    val ext = new graft.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext(exts)
    // direct builder check: expression built from SQL-ish children
    val e = MinhashSlices(GraftColumnBridge.expression(
      split(lit("x y z w"), " ")), 2)
    val out = Seq(1).toDF("i")
      .select(GraftColumnBridge.column(e).as("sig")).head().getSeq[String](0)
    assert(out.length == 2)
  }
}
