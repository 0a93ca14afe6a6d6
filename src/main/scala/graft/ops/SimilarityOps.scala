package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): exact
  * brute-force cosine top-k as the correctness baseline, and an
  * LSH-bucketed variant as the scale path (bucket equi-join instead of
  * cross join — the 100 TB answer; buckets co-partition, so the join
  * shuffles each side once on the bucket key).
  */
object SimilarityOps {

  /** Strict left-fold dot product in doubles (deterministic bits;
    * matches a sequential oracle loop).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cast a float embedding to double once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Exact top-k neighbors for each query vector (brute force: broadcast
    * the small query side, never the corpus).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries).join(corpus, col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Random-hyperplane LSH bucket from fixed deterministic hyperplanes
    * (e_j − e_{j+half}): bit_j = [v_j > v_{j+half}], packed into an int.
    * Deterministic and oracle-expressible, unlike RNG-seeded planes.
    */
  def lshBucket(v: Column, nBits: Int, half: Int): Column =
    (1 to nBits).map { j =>
      when(element_at(v, j) - element_at(v, j + half) > 0, lit(1 << (j - 1)))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed ANN: join only within matching buckets, then rank. Recall
    * trades off with bucket count; candidates shrink by ~2^nBits.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = queries.join(corpus,
        col("qbucket") === col("cbucket") && col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: candidates from an
    * LSH-bucket self-equi-join (each side shuffles once on the bucket
    * key — never a cross join), exact cosine only on candidates, keep
    * pairs ≥ threshold. The embedding-space sibling of the MinHash
    * near-dup pipeline; same shape at 100 TB.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, half: Int, threshold: Double): DataFrame = {
    val b = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nBits, half))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
