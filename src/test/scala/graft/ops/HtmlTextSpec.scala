package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.etl.SparkTestSession

/** HTML→text extraction: semantics pins (decode order, tag-before-
  * entity, block stripping), the native/composed differential, and the
  * c1 curation pipeline running end-to-end from raw HTML.
  */
class HtmlTextSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def extract(html: String): String = {
    val v = graft.functions.HtmlText.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(html))
    v.toString
  }

  test("tags, comments, script and style blocks strip; text survives") {
    assert(extract("<html><body><p>hello <b>world</b></p></body></html>")
      == "hello world")
    assert(extract("a<!-- secret -->b") == "a b")
    assert(extract("<script>var x = '<p>not text</p>';</script>visible")
      == "visible")
    assert(extract("<style>p { color: red; }</style>visible") == "visible")
    assert(extract("<SCRIPT src=\"x.js\">body</SCRIPT>after") == "after",
      "case-insensitive block match")
    assert(extract("<script>\nmulti\nline\n</script>ok") == "ok",
      "dotall block match")
  }

  test("entity decode order: tags strip BEFORE entities, &amp; decodes last") {
    // entity-encoded markup is TEXT, not markup
    assert(extract("&lt;b&gt;bold&lt;/b&gt;") == "<b>bold</b>")
    // double-encoded: &amp;lt; is the literal text "&lt;", never "<"
    assert(extract("x &amp;lt; y") == "x &lt; y")
    assert(extract("a &amp;&amp; b") == "a && b")
    assert(extract("&quot;q&quot; &apos;a&apos; &#39;n&#39;") == "\"q\" 'a' 'n'")
    assert(extract("a&nbsp;b") == "a b")
  }

  test("whitespace collapses; unclosed blocks degrade to tag-stripping") {
    assert(extract("  a \n\n b\t c  ") == "a b c")
    // unclosed script: the block regex can't match, the generic tag
    // strip removes only the open tag — deterministic on both engines
    assert(extract("<script>orphan body") == "orphan body")
  }

  test("native kernel equals the composed regexp_replace twin on the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val wrapped = docs.select(col("doc_id"), concat(
      lit("<html><!-- c --><style>p{}</style><script>s<t</script><p>"),
      col("text"),
      lit(" &amp;lt; &lt;i&gt;x&lt;/i&gt;</p></html>")).as("html"))
    val diff = wrapped.select(
        graft.ops.TextOps.htmlToText(col("html")).as("a"),
        graft.ops.TextOps.htmlToTextComposed(col("html")).as("b"))
      .where(col("a") =!= col("b") ||
        col("a").isNull =!= col("b").isNull)
    assert(diff.count() == 0, "native and composed forms must agree")
  }

  test("c1 curation runs end-to-end from raw HTML: extract-then-curate " +
      "equals curate on the clean corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // the corpus is single-spaced and markup-free (pinned here), so
    // wrapping in HTML and extracting round-trips the text exactly and
    // the curation outputs must be byte-identical
    assert(docs.where(col("text").rlike("[<>&]") ||
      col("text").rlike("\\s\\s")).count() == 0, "fixture precondition")
    val htmlCorpus = docs.select(col("doc_id"), concat(
      lit("<html><head><script>var x=1;</script></head><body><p>"),
      col("text"), lit("</p></body></html>")).as("html"))
    val extracted = htmlCorpus.select(col("doc_id"),
      graft.ops.TextOps.htmlToText(col("html")).as("text"))
    val fromHtml = CorpusOps.curate(extracted, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.mkString("|")).toSeq
    val fromClean = CorpusOps.curate(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.mkString("|")).toSeq
    assert(fromHtml == fromClean)
  }
}
