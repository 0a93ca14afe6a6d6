package graft.streaming

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.SparkTestSession
import graft.ops.{IncrementalIndexOps, RetrievalOps}

/** The composed curate → index stream's RETRACTION path, exercised on
  * a crafted cross-shard cluster merge (the case random test data may
  * or may not contain): shard 2's document is a near-dup of TWO
  * separate shard-1 clusters, merging them — the higher-id shard-1 rep
  * is demoted after it was already indexed, and the composition must
  * tombstone it so search equals one-shot curate-then-index.
  */
class ComposedCurateIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // 20 distinct English stopwords: every doc passes the language gate,
  // and word windows give precisely controllable 3-gram Jaccard
  private val w = Seq("the", "and", "of", "to", "in", "is", "it", "you",
    "that", "he", "was", "for", "on", "are", "with", "his", "they",
    "at", "be", "this")

  private def text(from: Int, until: Int): String =
    w.slice(from, until).mkString(" ")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect()
      .map(_.mkString("|")).toSeq

  test("a shard-2 doc merges two shard-1 clusters: the demoted shard-1 " +
      "rep is retracted from the index; search equals one-shot " +
      "curate-then-index") {
    import spark.implicits._
    // jaccard(A, B) = 6/18 = 0.33 < 0.5  -> two clusters after shard 1
    // jaccard(A, C) = jaccard(B, C) = 12/18 = 0.67 >= 0.5 -> merged by C
    val docA = (1L, text(0, 14))
    val docB = (5L, text(6, 20))
    val docC = (7L, text(0, 20))
    val shard1 = Seq(docA, docB).toDF("doc_id", "text")
    val shard2 = Seq(docC).toDF("doc_id", "text")
    val queries = Seq((100L, text(0, 20))).toDF("qid", "text")
    val cfg = graft.ops.IncrementalCurateOps.CurateConfig(minQualityE6 = 0L)

    val base = java.nio.file.Files
      .createTempDirectory("graft_composed").toString
    val (watch, ckpt, state) = (s"$base/in", s"$base/ckpt", s"$base/state")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(watch))
    def landShard(df: DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
      assert(fs.rename(part, new Path(s"$watch/$name.parquet")))
    }
    def drain(): Unit = Streaming.curateAndIndexIngest(
      spark, watch, shard1.schema, ckpt, state, "doc_id", "text", cfg)
    def hits(): Set[Long] = IncrementalIndexOps
      .bm25Search(spark, s"$state/index", queries, "qid", "text", 10)
      .select("id").collect().map(_.getLong(0)).toSet

    landShard(shard1, "s1")
    drain()
    assert(hits() == Set(1L, 5L),
      "after shard 1, both cluster reps are indexed and searchable")

    landShard(shard2, "s2")
    drain()
    // doc 7 merges {1} and {5}: component min 1 stays; 5 is DEMOTED
    // after having been indexed; 7 is never indexed
    assert(hits() == Set(1L),
      "the demoted earlier rep must be tombstoned, the merger never added")
    val tombstoned = spark.read
      .parquet(s"$state/index/_deletes/del_ids/batch=1")
      .collect().map(_.getLong(0)).toSet
    assert(tombstoned == Set(5L),
      s"expected exactly doc 5 retracted, got $tombstoned")

    // full parity: one-shot curate over the union, then one-shot BM25
    // over its kept set
    val union = shard1.unionAll(shard2)
    val kept = graft.ops.CorpusOps.curate(union, "doc_id", "text",
        minQualityE6 = 0L).select("doc_id")
    val oneShot = RetrievalOps.bm25TopK(
      union.join(kept, Seq("doc_id"), "left_semi"), queries,
      "doc_id", "text", "qid", "text", 10).withColumnRenamed("doc_id", "id")
    assert(sortedRows(IncrementalIndexOps.bm25Search(
        spark, s"$state/index", queries, "qid", "text", 10)) ==
      sortedRows(oneShot))
  }

  test("composed auto-compaction (compactEvery = 1): both roots are " +
      "compacted after every drain and the stream still equals " +
      "one-shot curate-then-index over a three-shard corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
    val queries = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id").as("qid"), col("text"))
    val r = corpus.agg(min(col("doc_id")), max(col("doc_id"))).head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    val base = java.nio.file.Files
      .createTempDirectory("graft_composed_ac").toString
    val (watch, ckpt, state) = (s"$base/in", s"$base/ckpt", s"$base/state")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(watch))
    def landShard(df: DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
      assert(fs.rename(part, new Path(s"$watch/$name.parquet")))
    }
    def drain(): Unit = Streaming.curateAndIndexIngest(
      spark, watch, corpus.schema, ckpt, state, "doc_id", "text",
      compactEvery = 1)
    landShard(corpus.where(col("doc_id") <= cut1), "s1")
    drain()
    landShard(corpus.where(
      col("doc_id") > cut1 && col("doc_id") <= cut2), "s2")
    drain()
    landShard(corpus.where(col("doc_id") > cut2), "s3")
    drain()
    // the curate root really was compacted (single merged batch)
    assert(graft.ops.BatchState.landedBatchIds(spark, s"$state/curate",
      graft.ops.IncrementalCurateOps.CoreTables, None).size == 1)
    val kept = graft.ops.CorpusOps.curate(corpus, "doc_id", "text")
      .select("doc_id")
    val oneShot = RetrievalOps.bm25TopK(
      corpus.join(kept, Seq("doc_id"), "left_semi"), queries,
      "doc_id", "text", "qid", "text", 10).withColumnRenamed("doc_id", "id")
    assert(sortedRows(IncrementalIndexOps.bm25Search(
        spark, s"$state/index", queries, "qid", "text", 10)) ==
      sortedRows(oneShot),
      "per-drain compaction of both roots must not change the search")
  }

  test("stream restart after a history-floor RAISE (purge / operator " +
      "GC) must not wedge on the default keepHistory declaration") {
    import spark.implicits._
    val shard1 = Seq((1L, text(0, 14)), (5L, text(6, 20)))
      .toDF("doc_id", "text")
    val shard2 = Seq((9L, text(2, 16))).toDF("doc_id", "text")
    val cfg = graft.ops.IncrementalCurateOps.CurateConfig(minQualityE6 = 0L)
    val base = java.nio.file.Files
      .createTempDirectory("graft_composed_hist").toString
    val (watch, ckpt, state) = (s"$base/in", s"$base/ckpt", s"$base/state")
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(watch))
    def landShard(df: DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
      assert(fs.rename(part, new Path(s"$watch/$name.parquet")))
    }
    def drain(): Unit = Streaming.curateAndIndexIngest(
      spark, watch, shard1.schema, ckpt, state, "doc_id", "text", cfg)
    landShard(shard1, "s1")
    drain()
    assert(graft.ops.BatchState.historyFloor(
      spark, s"$state/curate").contains(0L),
      "the default declares floor 0 on a fresh root")
    // an operator raises the floor (the history-GC verb) between drains
    graft.ops.BatchState.setHistoryFloor(spark, s"$state/index", 5L)
    landShard(shard2, "s2")
    drain() // must not throw on the monotonic guard
    assert(graft.ops.BatchState.historyFloor(
      spark, s"$state/index").contains(5L),
      "the restart must keep the raised floor, never re-lower it")
  }
}
