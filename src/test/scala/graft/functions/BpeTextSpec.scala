package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

/** Merge-driven greedy BPE ([[BpeModel]] / the BpeCountText and
  * BpeTokensText expressions): hand-checked encodes, the differential
  * law against an INDEPENDENT reference implementation (the oracle's
  * rank-order fixpoint replacement over separator-joined characters,
  * implemented here from scratch), learned-shape table validation, and
  * the Spark expression surface.
  */
class BpeTextSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val model = BpeVocab.Default

  /** INDEPENDENT reference: the DuckDB oracle's algorithm — apply
    * merges in RANK ORDER, each to fixpoint, as string replacement over
    * ' '-joined characters with sentinel spaces. For a learned-shape
    * table this equals textbook greedy (BpeModel's scaladoc proof);
    * holding the two implementations equal here is what licenses the
    * oracle SQL in x22/x9b.
    */
  private def rankOrderReference(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var s = " " + word.map(_.toString).mkString(" ") + " "
    BpeVocab.DefaultMerges.foreach { case (l, r) =>
      val from = s" $l $r "
      val to = s" ${l + r} "
      var prev = ""
      while (prev != s) { prev = s; s = s.replace(from, to) }
    }
    s.trim.split(" ").toSeq
  }

  test("hand-checked encodes on the fixture vocabulary") {
    assert(model.encode("spark").toSeq == Seq("spark"))
    assert(model.encode("window").toSeq == Seq("window"))
    assert(model.encode("merger").toSeq == Seq("mer", "g", "er"))
    assert(model.encode("aaaa").toSeq == Seq("a", "a", "a", "a"))
    assert(model.encode("xyzzy").toSeq == Seq("x", "y", "z", "z", "y"))
    assert(model.encode("a").toSeq == Seq("a"))
    assert(model.encode("").toSeq == Seq.empty)
    // left-to-right non-overlapping within one merge: "stst" pairs (s,t)
    // at 0 and 2 both merge in one pass
    assert(model.encode("stst").toSeq == Seq("st", "st"))
    assert(model.encodeText("  stream   value ").toSeq == Seq("stream", "value"))
    assert(model.countText("stream value merger") == 5L)
  }

  test("differential: greedy equals the rank-order fixpoint reference on " +
      "the corpus vocabulary, fixtures, and word products") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().as[String].collect()
    assert(corpus.length > 20, s"expected a real vocabulary: ${corpus.length}")
    val fixtures = Seq("aaaa", "stst", "sparkspark", "windowwindow",
      "xyzzy", "a", "valuevalue", "merger", "datadata", "ststst",
      "tableau", "streamer", "vectorvalue")
    // concatenated word pairs exercise cross-boundary merges hard
    val products = for (a <- corpus.take(8); b <- corpus.take(8)) yield a + b
    (corpus ++ fixtures ++ products).foreach { w =>
      assert(model.encode(w).toSeq == rankOrderReference(w),
        s"greedy vs rank-order diverged on '$w'")
    }
  }

  test("pathological word length: a multi-hundred-KB 'word' encodes in " +
      "bounded time via segmentation, deterministically") {
    // 400k chars of a mergeable pattern: unsegmented greedy would be
    // ~1.6e11 char ops (minutes); segmented it is linear in segments
    val huge = "st" * 200000
    val t0 = System.nanoTime()
    val toks = model.encode(huge)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"pathological word took ${sec}s")
    // semantics: each 8192-char segment is "st"*4096 -> 4096 "st" tokens
    assert(toks.length == 200000, s"got ${toks.length}")
    assert(toks.forall(_ == "st"))
    // deterministic across calls (memo not involved above the cap)
    assert(model.encode(huge).toSeq == toks.toSeq)
    // boundary: a word exactly at the cap is NOT segmented
    val atCap = "ab" * (BpeModel.MaxWordChars / 2)
    assert(model.encode(atCap).length > 0)
  }

  test("learned-shape validation: a table whose pair component is not a " +
      "prior merge output is rejected") {
    val bad = Seq(("a", "b"), ("xy", "z")) // 'xy' never created
    val ex = intercept[IllegalArgumentException](new BpeModel(bad))
    assert(ex.getMessage.contains("learned-shape"), ex.getMessage)
    // chained outputs ARE fine
    new BpeModel(Seq(("x", "y"), ("xy", "z"), ("a", "xyz")))
  }

  test("Spark expressions: count equals token-stream size, order pinned, " +
      "null-safe, stable across partitionings") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      col("doc_id"),
      graft.ops.TextOps.bpeCount(col("text")).as("n"),
      graft.ops.TextOps.bpeTokens(col("text")).as("toks"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getSeq[String](2).length.toLong, s"doc ${r.getLong(0)}")
    }
    // token stream matches a driver-side encode of the same text
    val sample = docs.limit(5).select("doc_id", "text").collect()
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    sample.foreach { r =>
      assert(byId(r.getLong(0)) == model.encodeText(r.getString(1)).toSeq)
    }
    // nulls propagate (not crash, not zero)
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS t")
      .select(graft.ops.TextOps.bpeCount(col("t"))).collect()
    assert(n.head.isNullAt(0))
    // repartitioned run agrees (per-JVM memo is invisible to results)
    val again = docs.repartition(7)
      .select(col("doc_id"), graft.ops.TextOps.bpeCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getLong(1)))
    // SQL surface (GraftExtensions registration)
    val sql = spark.sql(
      "SELECT bpe_count_text('stream value merger'), " +
        "bpe_tokens_text('merger')").head
    assert(sql.getLong(0) == 5L)
    assert(sql.getSeq[String](1) == Seq("mer", "g", "er"))
    // compression ratio: "stream value" = 12 chars / 2 tokens -> 6.0e6;
    // half-up at a .5 boundary: "abc" = 3 chars / 3 tokens -> 1e6;
    // 7 chars / 2 tokens -> 3.5e6 exactly
    val cr = Seq("stream value", "abc", "of gaps").toDF("t")
      .select(graft.ops.TextOps.bpeCompressionMillionths(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(cr(0) == 6000000L && cr(1) == 1000000L, s"got $cr")
    val crEmpty = Seq("", "   ").toDF("t")
      .select(graft.ops.TextOps.bpeCompressionMillionths(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(crEmpty == Seq(0L, 0L), s"zero-token texts gate to 0: $crEmpty")
  }
}
