package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-aggregatable distinct-count sketches — the pre-aggregated cube
  * pattern that makes interactive "how many distinct users?" queries
  * possible at 100 TB: build small HLL sketches once at a fine grain
  * (e.g. per day × dimension), persist them, and answer any coarser
  * rollup by MERGING sketches instead of re-scanning the fact table.
  * Spark 4 ships Apache DataSketches HLL natively (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`), so the whole flow stays
  * inside codegen'd aggregates — no UDAF, no driver state.
  *
  * What IS and is NOT invariant (measured, not assumed): a merged
  * estimate is NOT bit-identical to a direct single-pass sketch
  * (DataSketches serves the HIP estimator on a streamed sketch but
  * the composite estimator after a union), and two rollups from
  * DIFFERENT cell granularities are bit-identical only in narrow
  * regimes (sparse→dense mode promotion and HLL_4 packing happen at
  * different points on each path — equality held at sf0.01 and broke
  * at sf0.1 in testing). The contract the cube DOES guarantee — and
  * the one [[hllRollupLaw]] pins — is the accuracy envelope: every
  * rollup, from any granularity, lands within the sketch's standard
  * error of the true distinct count.
  */
object SketchOps {

  /** Fine-grain sketch table: one HLL sketch of `valueCol` per
    * distinct (cellKeys) cell. One shuffle on the cell key; sketch
    * size is bounded by lgK (2^lgK registers ≈ 2.5 KB at the default
    * 12), so the output is cells × KB no matter how many raw rows
    * feed it — the table a warehouse would persist nightly.
    */
  def hllCube(df: DataFrame, cellKeys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(cellKeys.nonEmpty, "hllCube needs cell key columns")
    require(lgK >= 4 && lgK <= 21, s"lgK in 4..21, got $lgK")
    df.groupBy(cellKeys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
  }

  /** Roll a sketch table up to coarser keys by merging sketches —
    * the query-time half of the pattern. Input rows are cells × KB,
    * so this aggregate is broadcast-small even when the raw fact
    * table was 100 TB.
    */
  def hllRollup(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "hllRollup needs rollup key columns")
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as("approx_distinct"))
  }

  /** HLL set algebra by inclusion–exclusion: |A ∩ B| ≈
    * est(A) + est(B) − est(A ∪ B), the standard (and only) HLL
    * intersection — unions merge losslessly in register space, so the
    * sketch table answers ANY pairwise overlap question ("how many
    * customers do segments A and B share?") without re-scanning raw
    * data. Error grows as the intersection shrinks relative to the
    * sets (three ±σ estimates stack), so `relTol` here is looser than
    * the rollup law's; for tiny intersections use the exact path (or
    * theta sketches, which Spark does not ship).
    *
    * Returns one row per unordered key pair: both keys, the exact
    * intersection size, and the tolerance verdict — the cross-engine
    * law shape (an oracle can't replay registers but CAN verify the
    * exact count and the envelope).
    *
    * Scale: sketches aggregate once (map-side partial); the pairwise
    * stage self-joins the KEY-count-sized sketch table (segments, not
    * rows); the exact check distincts (key, value) once and equi-joins
    * on value — corpus-scale data crosses the wire twice total, never
    * pairwise.
    */
  def hllIntersectLaw(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12, relTol: Double = 0.1): DataFrame = {
    require(relTol > 0 && relTol < 1, s"relTol in (0,1), got $relTol")
    val sk = df.groupBy(col(s"`$keyCol`"))
      .agg(hll_sketch_agg(col(s"`$valueCol`"), lit(lgK)).as("sk"))
    val pairsEst = sk.select(col(s"`$keyCol`").as("key_a"), col("sk").as("ska"))
      .join(sk.select(col(s"`$keyCol`").as("key_b"), col("sk").as("skb")),
        col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        (hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb")) -
          hll_sketch_estimate(hll_union(col("ska"), col("skb"))))
          .as("__est"))
    val kv = df.select(col(s"`$keyCol`").as("k"), col(s"`$valueCol`").as("v"))
      .distinct()
    val exact = kv.select(col("k").as("key_a"), col("v"))
      .join(kv.select(col("k").as("key_b"), col("v")), Seq("v"))
      .where(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    pairsEst.join(exact, Seq("key_a", "key_b"), "left")
      .withColumn("exact_intersect",
        coalesce(col("exact_intersect"), lit(0L)))
      .select(col("key_a"), col("key_b"), col("exact_intersect"),
        (abs(col("__est") - col("exact_intersect")) <=
          greatest(lit(relTol) * col("exact_intersect"), lit(8.0)))
          .as("within_tol"))
  }

  /** The rollup accuracy law as data: per rollup key, the exact
    * distinct count and two verdicts — `coarse_ok` (the rollup merged
    * from the COARSE `cellKeys` cube lands within `relTol` of exact)
    * and `fine_ok` (same from the FINE `fineKeys` cube). relTol
    * defaults to 3σ-ish headroom over the sketch's standard error
    * (lgK 12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%). Exists so correctness gates
    * can assert the cube's contract cross-engine: an oracle can't
    * replay DataSketches registers, but it CAN verify the exact count
    * and that every granularity's rollup stays inside the envelope.
    */
  def hllRollupLaw(df: DataFrame, rollupKeys: Seq[String],
      cellKeys: Seq[String], fineKeys: Seq[String], valueCol: String,
      lgK: Int = 12, relTol: Double = 0.05): DataFrame = {
    require(relTol > 0 && relTol < 1, s"relTol in (0,1), got $relTol")
    val merged = hllRollup(hllCube(df, cellKeys, valueCol, lgK), rollupKeys)
      .withColumnRenamed("approx_distinct", "__est_merged")
    val fine = hllRollup(hllCube(df, fineKeys, valueCol, lgK), rollupKeys)
      .withColumnRenamed("approx_distinct", "__est_fine")
    val exact = df.groupBy(rollupKeys.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_distinct"))
    def ok(est: Column): Column =
      abs(est - col("exact_distinct")) <= lit(relTol) * col("exact_distinct")
    exact.join(merged, rollupKeys).join(fine, rollupKeys)
      .select(rollupKeys.map(col) ++ Seq(
        col("exact_distinct"),
        ok(col("__est_merged")).as("coarse_ok"),
        ok(col("__est_fine")).as("fine_ok")): _*)
  }
}
