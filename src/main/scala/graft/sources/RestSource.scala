package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S5 — paginated REST source (common/utils.py:27-92): follow
  * `link[relation=next]` pages, de-duplicate by resource id, and assert
  * the server's declared `total` matches what was yielded. The page
  * fetcher is injectable (tests run against a fake pager; production
  * passes an HTTP closure).
  *
  * Scale design: REST pagination is inherently sequential (each page
  * carries the next link), so the paging loop runs on the driver and
  * lands in a DataFrame via `spark.read.json` over a Dataset[String] —
  * appropriate for the reference's use (id resolution: result sets are
  * keys, not bulk data). Bulk per-key enrichment belongs to the
  * equi-join path (IdCache/S6 bulk prefetch), NOT to a bigger REST
  * loop.
  */
object RestSource {

  /** One page: raw resource JSON strings, the next-page token (None =
    * last page), and the server's declared total (checked when present).
    */
  final case class Page(rows: Seq[String], next: Option[String], total: Option[Long])

  /** Follow pages from `first`, de-duplicating by `idOf` (the reference
    * keeps the FIRST occurrence) and asserting declared-vs-found totals.
    */
  def fetchAll(first: String, fetch: String => Page,
      idOf: String => String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, String]()
    val visited = scala.collection.mutable.Set[String]()
    var declared: Option[Long] = None
    var cursor: Option[String] = Some(first)
    while (cursor.isDefined) {
      val url = cursor.get
      // repeated/cyclic next-links (stale caches, buggy servers) must
      // fail fast, not spin the driver forever
      require(visited.add(url), s"pagination cycle: $url seen twice")
      val page = fetch(url)
      declared = page.total.orElse(declared)
      page.rows.foreach { r =>
        val id = idOf(r)
        if (!seen.contains(id)) seen(id) = r
      }
      cursor = page.next
    }
    declared.foreach { t =>
      require(t == seen.size,
        s"paginated fetch incomplete: server declared $t, found ${seen.size}")
    }
    seen.values.toSeq
  }

  /** Fetch and parse into a DataFrame (schema inferred or enforced by
    * the caller via `.schema` on the returned frame's reader pattern).
    */
  def fetchDf(spark: SparkSession, first: String, fetch: String => Page,
      idOf: String => String): DataFrame = {
    import spark.implicits._
    val rows: Dataset[String] = spark.createDataset(fetchAll(first, fetch, idOf))
    spark.read.json(rows)
  }
}
