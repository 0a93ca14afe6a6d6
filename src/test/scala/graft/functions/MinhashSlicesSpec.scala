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

  test("SQL surface: injected functions run via spark.sql and match the DSL") {
    // SparkTestSession is built withExtensions(GraftExtensions), so the
    // registrations (and their argument order) are exercised end-to-end
    val viaSql = spark.sql(
      "SELECT minhash_text('a b c d e', 3, 8) AS mt, " +
        "minhash_slices(array('a b c', 'b c d', 'c d e'), 8) AS ms, " +
        "simhash_text('a b c d e', 16) AS sh").head()
    val viaDsl = Seq("a b c d e").toDF("text").select(
      GraftColumnBridge.column(MinhashText(
        GraftColumnBridge.expression(col("text")), 3, 8)).as("mt"),
      graft.ops.DedupOps.simhash16(col("text")).as("sh")).head()
    assert(viaSql.getSeq[String](0) == viaDsl.getSeq[String](0))
    assert(viaSql.getSeq[String](1) == viaDsl.getSeq[String](0),
      "slices over the same shingles must equal the fused signature")
    assert(viaSql.getInt(2) == viaDsl.getInt(1))
  }

  test("fused tokenizer uses SQL trim semantics (tabs/newlines are tokens' business)") {
    // leading tab: SQL trim keeps it → an empty first token, like the
    // composed split(trim(text)) form; Java's String.trim would strip it
    val docs = Seq("\talpha beta gamma delta", "alpha beta gamma delta\n")
      .toDF("text")
    val rows = docs.select(
      GraftColumnBridge.column(MinhashText(
        GraftColumnBridge.expression(col("text")), 3, 8)).as("fused"),
      GraftColumnBridge.column(MinhashSlices(GraftColumnBridge.expression(
        TextOps.shingles(col("text"), 3)), 8)).as("composed"),
      graft.ops.DedupOps.simhash16(col("text")).as("sh_fused"),
      graft.ops.DedupOps.simhash16Composed(col("text")).as("sh_composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getInt(2) == r.getInt(3))
    }
  }
}
