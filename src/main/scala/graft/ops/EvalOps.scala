package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed model-evaluation metrics — the scoring side of a
  * training-data pipeline (how good is the quality classifier / the
  * reranker / the filter we just trained?), computed exactly over
  * arbitrarily large eval sets.
  *
  * Everything here is INTEGER-EXACT (the x16/g4 fixed-point
  * discipline): AUC is the Mann–Whitney U statistic in doubled counts
  * (ties contribute half, so ×2 clears the fraction) floor-divided to
  * millionths, so partial-aggregation order cannot perturb a bit and a
  * SQL oracle replays the number verbatim.
  */
object EvalOps {

  /** Tie-aware ROC-AUC per group, in millionths. AUC = P(random
    * positive scores above random negative) + ½·P(tie) — the
    * Mann–Whitney form: per distinct score s (ascending),
    * pos(s) · (2·negBelow(s) + neg(s)) summed, over 2·n₊·n₋.
    *
    * Scale: ONE aggregate to (group, score) granularity (map-side
    * partial collapses the eval set to distinct scores), then a
    * running-sum window and the final per-group fold on the
    * distinct-score table — corpus-scale data crosses the wire once.
    * Degenerate groups (no positives or no negatives) report null.
    */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "aucByGroup needs group columns")
    val byScore = df.groupBy((groupCols :+ scoreCol).map(c => col(s"`$c`")): _*)
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("__pos"),
        sum(when(labelCol, 0L).otherwise(1L)).as("__neg"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(s"`$scoreCol`"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // U2 is quadratic in row counts (u2s <= 2*n_pos*n_neg), so every
    // step that multiplies it runs in decimal(38,0): a Long multiply
    // would silently wrap once n_pos*n_neg passes ~4.6e12 (a few
    // million positives x negatives in one group — realistic at 100 TB).
    // decimal(38,0) is exact to n_pos*n_neg ~ 1e31 — beyond any corpus.
    val stepped = byScore
      .withColumn("__negBelow", coalesce(sum(col("__neg")).over(w), lit(0L)))
      .withColumn("__u2",
        col("__pos").cast("decimal(19,0)") *
          (lit(2L) * col("__negBelow") + col("__neg")).cast("decimal(19,0)"))
    stepped.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum(col("__u2")).as("__u2s"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("""(cast(__u2s as decimal(38,0)) * 500000) div
                  (cast(n_pos as decimal(38,0)) * n_neg)""")))
      .drop("__u2s")
  }

  /** Precision / recall / F1 (millionths) per group at each score
    * threshold in `thresholds` — predicted positive ⟺ score ≥ t. One
    * pass: the thresholds ride a literal-array explode (narrow), so
    * the eval set is read once for ALL thresholds and the aggregate is
    * groups × thresholds-bounded. Empty denominators report null.
    */
  def prAtThresholds(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, labelCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "prAtThresholds needs group columns")
    require(thresholds.nonEmpty && thresholds.size <= 1000,
      s"1..1000 thresholds, got ${thresholds.size}")
    val t = explode(array(thresholds.map(lit): _*)).as("threshold")
    val pred = col(s"`$scoreCol`") >= col("threshold")
    df.select(groupCols.map(col) :+ col(s"`$scoreCol`") :+
        labelCol.as("__y") :+ t: _*)
      .groupBy((groupCols :+ "threshold").map(col): _*)
      .agg(sum(when(col("__y") && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(!col("__y") && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(col("__y") && !pred, 1L).otherwise(0L)).as("fn"))
      .withColumn("precision_ppm", when(col("tp") + col("fp") > 0,
        expr("(tp * 1000000L) div (tp + fp)")))
      .withColumn("recall_ppm", when(col("tp") + col("fn") > 0,
        expr("(tp * 1000000L) div (tp + fn)")))
      .withColumn("f1_ppm", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        expr("(2L * tp * 1000000L) div (2L * tp + fp + fn)")))
  }
}
