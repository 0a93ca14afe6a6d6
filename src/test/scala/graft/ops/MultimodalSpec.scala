package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.etl.SparkTestSession

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("media table schema and deterministic fake features") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = MultimodalOps.mediaFromDocuments(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = MultimodalOps.extractFeatures(media, shards = 4)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.feature.length == 8))
    // deterministic: same input → same features
    val again = MultimodalOps.extractFeatures(media, shards = 2).collect()
    val byId = again.map(r => r.asset_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => byId(r.asset_id) == r.feature.toSeq))
    // byte_len matches utf-8 length of the source text
    val lens = docs.selectExpr("doc_id", "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(20).foreach { r => assert(r.byte_len == lens(r.asset_id)) }
  }
}
