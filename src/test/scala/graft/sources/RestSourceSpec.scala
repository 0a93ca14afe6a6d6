package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class RestSourceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def pager(pages: Map[String, RestSource.Page]): String => RestSource.Page =
    url => pages(url)

  test("follows next links, dedups by id keeping first, checks total") {
    val pages = Map(
      "p1" -> RestSource.Page(
        Seq("""{"id":"a","v":1}""", """{"id":"b","v":2}"""), Some("p2"), Some(3L)),
      "p2" -> RestSource.Page(
        Seq("""{"id":"b","v":99}""", """{"id":"c","v":3}"""), None, Some(3L)))
    def idOf(r: String) = r.split("\"id\":\"")(1).takeWhile(_ != '"')
    val rows = RestSource.fetchAll("p1", pager(pages), idOf)
    assert(rows.size == 3)
    assert(rows.exists(_.contains(""""b","v":2""")), "first occurrence of b wins")

    val df = RestSource.fetchDf(spark, "p1", pager(pages), idOf)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("id", "v"))
  }

  test("cyclic next-link fails fast instead of spinning") {
    val pages = Map(
      "p1" -> RestSource.Page(Seq("""{"id":"a"}"""), Some("p2"), None),
      "p2" -> RestSource.Page(Seq("""{"id":"b"}"""), Some("p1"), None))
    val ex = intercept[IllegalArgumentException] {
      RestSource.fetchAll("p1", pager(pages), _ => "x")
    }
    assert(ex.getMessage.contains("pagination cycle"))
  }

  test("declared-total mismatch raises (bundle.total assertion)") {
    val pages = Map(
      "p1" -> RestSource.Page(Seq("""{"id":"a"}"""), None, Some(2L)))
    val ex = intercept[IllegalArgumentException] {
      RestSource.fetchAll("p1", pager(pages), _ => "a")
    }
    assert(ex.getMessage.contains("declared 2, found 1"))
  }
}
