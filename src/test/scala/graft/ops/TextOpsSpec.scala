package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class TextOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Int =
    Seq(text).toDF("t").select(c.as("v")).head().getInt(0)

  test("subwordCount splits on whitespace AND letter/digit boundaries") {
    val c = TextOps.subwordCount(col("t"))
    assert(one(c, "hello world") == 2)
    assert(one(c, "gpt4 turbo") == 3, "gpt|4|turbo")
    assert(one(c, "a1b2") == 4)
    assert(one(c, "v2 model 3x") == 5, "v|2|model|3|x")
  }

  test("shingles: sliding word n-grams; short docs yield an empty array") {
    val got = Seq("a b c d", "a b", "").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("native shingles equal the composed twin on varied inputs") {
    val docs = Seq("a b c d e", "  padded   spaces  here now ", "one",
      "", "exactly three toks") ++
      (1 to 30).map(i => (0 to i % 7).map(j => s"w$j").mkString(" "))
    for (n <- Seq(2, 3, 4)) {
      val rows = docs.toDF("t").select(
        TextOps.shingles(col("t"), n).as("native"),
        TextOps.shinglesComposed(col("t"), n).as("composed")).collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"n=$n drift: $r"))
    }
  }

  test("langId picks the profile with the most stopword hits, ties lexicographic") {
    val got = Seq(
      "the cat sat on the mat and the dog",
      "le chat est sur le tapis et les chiens",
      "der hund ist nicht mit der katze und das haus").toDF("t")
      .select(TextOps.langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "fr", "de"))
  }

  test("native langId equals the composed-builtin twin (incl. ties and empties)") {
    val docs = Seq(
      "the cat sat on the mat and the dog",
      "le chat est sur le tapis et les chiens",
      "der hund ist nicht mit der katze und das haus",
      "el perro y el gato en la casa es que los",
      "de la", // shared stopwords across profiles -> tie-break
      "no stopwords here whatsoever",
      "   ", "", "a",
      "the the the le le le de de de") ++
      (1 to 50).map(i => s"w$i the le der el en ${i % 7}")
    val rows = docs.toDF("t").select(
      TextOps.langId(col("t")).as("native"),
      TextOps.langIdComposed(col("t")).as("composed")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }
  test("repetitionRatio: 1 - distinct/total 3-grams; short docs are 0") {
    val got = Seq(
      ("a b c d e", 0.0),          // 3 distinct 3-grams of 3
      ("a b c a b c a b c", 4.0 / 7.0), // 7 grams, 3 distinct
      ("x y", 0.0),                // < 3 tokens -> no grams -> 0
      ("", 0.0))
      .map(_._1).toDF("t")
      .select(TextOps.repetitionRatio(col("t"), 3).as("r"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 4.0 / 7.0) < 1e-12)
    assert(got(2) == 0.0 && got(3) == 0.0)
  }

  test("repetitionMillionths: exact half-up integer form") {
    val got = Seq("a b c d e", "a b c a b c a b c", "x y", "")
      .toDF("t")
      .select(TextOps.repetitionMillionths(col("t"), 3).as("r"))
      .collect().map(_.getLong(0))
    // 4/7 in millionths = 571428.571... -> half-up 571429
    assert(got.toSeq == Seq(0L, 571429L, 0L, 0L))
  }
}
