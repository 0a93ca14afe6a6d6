package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.SparkTestSession

/** Codebook-evolution contract of the frozen-quantizer families
  * ([[IncrementalIndexOps.reindexVectors]],
  * [[IncrementalDedupOps.reindexEmbeddings]]): an offline refit +
  * state-only reindex into a fresh directory —
  *
  *  - at sampleFraction 1 the new index/dedup state is ROW-IDENTICAL
  *    to a fresh one-shot ingest of all stored vectors under a
  *    from-scratch fit (the strongest parity available: the refit
  *    really is the from-scratch codebook);
  *  - ingestion resumes on top of the reindexed directory and stays
  *    union-identical;
  *  - a sampled refit re-assigns EVERYTHING exactly (only the fit is
  *    sampled) and records the bumped generation;
  *  - reindex never lands into a directory that already holds state.
  */
class ReindexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val srcDir = "/root/testdata/sf0.001"

  private def emb: DataFrame = graft.Tables.embeddings(spark, srcDir)

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_reindex").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect()
      .map(_.mkString("|")).toSeq

  private def midId: Long = {
    val r = emb.agg(min(col("vec_id")), max(col("vec_id"))).head
    (r.getLong(0) + r.getLong(1)) / 2
  }

  private def qset: DataFrame = emb.where(col("vec_id") < 10)
    .select(col("vec_id").as("qid"),
      SimilarityOps.asDouble(col("embedding")).as("qv"))

  test("IVF reindex at sampleFraction 1 equals a fresh one-shot ingest " +
      "under the from-scratch codebook; generation is recorded and " +
      "bumps on a second reindex") {
    val I = IncrementalIndexOps
    val (old, next, oneShot) = (fresh(), fresh(), fresh())
    val mid = midId
    I.ingestVectorShard(spark, emb.where(col("vec_id") <= mid),
      "vec_id", "embedding", old, 0L, nCells = 4, iters = 2)
    I.ingestVectorShard(spark, emb.where(col("vec_id") > mid),
      "vec_id", "embedding", old, 1L, nCells = 4, iters = 2)
    I.reindexVectors(spark, old, next, nCells = 4, iters = 2)
    // the from-scratch twin: everything as ONE shard, codebook fit on it
    I.ingestVectorShard(spark, emb, "vec_id", "embedding", oneShot, 0L,
      nCells = 4, iters = 2)
    assert(BatchState.readCodebook(spark, next) ==
      BatchState.readCodebook(spark, oneShot),
      "full-fraction refit must reproduce the from-scratch codebook")
    assert(sortedRows(I.ivfSearch(spark, next, qset, nProbe = 2, k = 10)) ==
      sortedRows(I.ivfSearch(spark, oneShot, qset, nProbe = 2, k = 10)))
    assert(BatchState.readParams(spark, next).get("generation")
      .contains("1"))
    val gen2 = fresh()
    I.reindexVectors(spark, next, gen2, nCells = 4, iters = 2)
    assert(BatchState.readParams(spark, gen2).get("generation")
      .contains("2"))
    // old directory untouched by the refit
    assert(BatchState.landedBatchIds(spark, old, Seq("cells"), None) ==
      Seq(0L, 1L))
  }

  test("ingestion resumes on top of a reindexed IVF directory: the " +
      "param guard accepts it (generation is provenance, not a knob) " +
      "and search equals the one-shot twin over the grown union") {
    val I = IncrementalIndexOps
    val (old, next, oneShot) = (fresh(), fresh(), fresh())
    val mid = midId
    val (sAB, sC) = (emb.where(col("vec_id") <= mid),
      emb.where(col("vec_id") > mid))
    I.ingestVectorShard(spark, sAB, "vec_id", "embedding", old, 0L,
      nCells = 4, iters = 2)
    I.reindexVectors(spark, old, next, nCells = 4, iters = 2)
    I.ingestVectorShard(spark, sC, "vec_id", "embedding", next, 1L,
      nCells = 4, iters = 2)
    I.ingestVectorShard(spark, sAB, "vec_id", "embedding", oneShot, 0L,
      nCells = 4, iters = 2)
    I.ingestVectorShard(spark, sC, "vec_id", "embedding", oneShot, 1L,
      nCells = 4, iters = 2)
    assert(sortedRows(I.ivfSearch(spark, next, qset, nProbe = 2, k = 10)) ==
      sortedRows(I.ivfSearch(spark, oneShot, qset, nProbe = 2, k = 10)))
    // changing the knobs themselves still fails loudly
    val e = intercept[IllegalArgumentException] {
      I.ingestVectorShard(spark, sC, "vec_id", "embedding", next, 2L,
        nCells = 8, iters = 2)
    }
    assert(e.getMessage.contains("parameters"))
  }

  test("sampled refit: the fit sees a subset but EVERY stored vector is " +
      "re-assigned; the codebook has nCells centroids") {
    val I = IncrementalIndexOps
    val (old, next) = (fresh(), fresh())
    val mid = midId
    I.ingestVectorShard(spark, emb.where(col("vec_id") <= mid),
      "vec_id", "embedding", old, 0L, nCells = 4, iters = 2)
    I.ingestVectorShard(spark, emb.where(col("vec_id") > mid),
      "vec_id", "embedding", old, 1L, nCells = 4, iters = 2)
    I.reindexVectors(spark, old, next, nCells = 4, iters = 2,
      sampleFraction = 0.5)
    assert(BatchState.readCodebook(spark, next).size == 4)
    val oldIds = spark.read.parquet(s"$old/cells/batch=0", s"$old/cells/batch=1")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    val newIds = spark.read.parquet(s"$next/cells/batch=0")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(newIds == oldIds, "re-assignment must cover every stored vector")
    assert(I.ivfSearch(spark, next, qset, nProbe = 2, k = 10).count() > 0)
  }

  test("SemDeDup reindex at sampleFraction 1 equals a fresh one-shot " +
      "ingest: assignments, edges, and the folded component view") {
    val I = IncrementalDedupOps
    val (old, next, oneShot) = (fresh(), fresh(), fresh())
    val mid = midId
    I.ingestEmbeddingShard(spark, emb.where(col("vec_id") <= mid),
      "vec_id", "embedding", old, 0L, k = 4, iters = 2, threshold = 0.35)
    I.ingestEmbeddingShard(spark, emb.where(col("vec_id") > mid),
      "vec_id", "embedding", old, 1L, k = 4, iters = 2, threshold = 0.35)
    I.reindexEmbeddings(spark, old, next, k = 4, iters = 2,
      threshold = 0.35)
    I.ingestEmbeddingShard(spark, emb, "vec_id", "embedding", oneShot, 0L,
      k = 4, iters = 2, threshold = 0.35)
    assert(sortedRows(I.semanticDedupView(spark, next, "vec_id")) ==
      sortedRows(I.semanticDedupView(spark, oneShot, "vec_id")))
    assert(sortedRows(spark.read.parquet(s"$next/edges/batch=0")) ==
      sortedRows(spark.read.parquet(s"$oneShot/edges/batch=0")))
    assert(BatchState.readParams(spark, next).get("generation")
      .contains("1"))
    // ingestion resumes on top with the original knobs
    I.ingestEmbeddingShard(spark, emb.limit(0), "vec_id", "embedding",
      next, 1L, k = 4, iters = 2, threshold = 0.35)
  }

  test("reindex refuses a directory that already holds state") {
    val I = IncrementalIndexOps
    val (old, next) = (fresh(), fresh())
    I.ingestVectorShard(spark, emb, "vec_id", "embedding", old, 0L,
      nCells = 4, iters = 2)
    I.ingestVectorShard(spark, emb, "vec_id", "embedding", next, 0L,
      nCells = 4, iters = 2)
    val e = intercept[IllegalArgumentException] {
      I.reindexVectors(spark, old, next, nCells = 4, iters = 2)
    }
    assert(e.getMessage.contains("FRESH"))
  }
}
