package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), MinHash+LSH, SimHash,
  * n-gram Jaccard verification.
  *
  * Scale design: signatures/bands are per-row array expressions (narrow,
  * no shuffle). Candidate generation shuffles once on (band, bucket) —
  * the classic LSH trick that replaces the O(n²) cross join with a
  * co-partitioned equi-join, which is exactly what survives 100 TB.
  * Jaccard verification then runs only on candidate pairs.
  */
object DedupOps {

  /** Exact dedup key (see also [[TextOps.fingerprint]]). */
  def contentHash(text: Column): Column = md5(text)

  /** MinHash signature: k permutation-approximating hash functions
    * h_j(s) = md5("j:" ++ s); sig_j = min over shingles. min of hex
    * strings is byte-lexicographic in both Spark and the oracle.
    */
  def minhashSignature(shingles: Column, k: Int): Seq[Column] =
    (0 until k).map { j =>
      array_min(transform(shingles, s => md5(concat(lit(s"$j:"), s))))
    }

  /** LSH band keys: adjacent signature pairs hashed together
    * (bands of rows=2). Equal band key ⇒ candidate pair.
    */
  def bandKeys(sig: Seq[Column], rowsPerBand: Int): Seq[Column] =
    sig.grouped(rowsPerBand).map(g => md5(concat(g: _*))).toSeq

  /** Documents → (id, shingleSet, band_0..band_{b-1}) in one narrow pass. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sh = TextOps.shingles(col(textCol), shingleN)
    val sig = minhashSignature(sh, k)
    val bands = bandKeys(sig, rowsPerBand)
    df.select(
      Seq(col(idCol).as("id"), array_distinct(sh).as("shingle_set")) ++
        sig.zipWithIndex.map { case (s, i) => s.as(s"sig_$i") } ++
        bands.zipWithIndex.map { case (b, i) => b.as(s"band_$i") }: _*)
  }

  /** Candidate pairs from any shared band bucket, verified with exact
    * shingle-set Jaccard; keeps pairs ≥ threshold. One shuffle on the
    * bucket key + one distinct on pairs; the verify join ships only
    * candidate rows.
    */
  def nearDupPairs(bands: DataFrame, nBands: Int, threshold: Double): DataFrame = {
    val exploded = bands.select(col("id"),
      explode(array((0 until nBands).map(i =>
        struct(lit(i).as("bi"), col(s"band_$i").as("bucket"))): _*)).as("b"))
      .select(col("id"), col("b.bi").as("bi"), col("b.bucket").as("bucket"))
      .where(col("bucket").isNotNull)
    val l = exploded.select(col("bi"), col("bucket"), col("id").as("doc_a"))
    val r = exploded.select(col("bi"), col("bucket"), col("id").as("doc_b"))
    val cand = l.join(r, Seq("bi", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = bands.select(col("id"), col("shingle_set"))
    cand
      .join(sets.select(col("id").as("doc_a"), col("shingle_set").as("sa")), Seq("doc_a"))
      .join(sets.select(col("id").as("doc_b"), col("shingle_set").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash over token md5s: per bit b, majority vote of
    * (hash bit ? +1 : -1) across all token occurrences; bit set iff the
    * sum is positive. Pure array fold — no explode, no shuffle.
    */
  def simhash16(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => md5(t))
    // bit b lives in hex char (b / 4), position (3 - b % 4) of its nibble
    def bitOf(h: Column, b: Int): Column =
      shiftright(conv(substring(h, 1 + b / 4, 1), 16, 10).cast("int"), 3 - (b % 4))
        .bitwiseAND(1)
    val terms = (0 until 16).map { b =>
      val s = aggregate(hashes, lit(0),
        (acc, h) => acc + when(bitOf(h, b) === 1, 1).otherwise(-1))
      when(s > 0, lit(1 << b)).otherwise(lit(0))
    }
    terms.reduce(_ + _)
  }
}
