package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the iterative join+aggregate
  * (Pregel-style) family. Connected components lives in
  * [[DedupOps.connectedComponents]] (alternating-star); this hosts the
  * score-propagation side.
  *
  * Scale design: an iteration is ONE equi-join of the edge table
  * against the k-row-per-node rank table plus one map-side-partial sum
  * — the shape GraphX/Pregel lowers to, expressed directly in Catalyst
  * so AQE handles skewed hubs (a hot dst key is just a skewed
  * aggregation key). Nothing collects to the driver; ranks stay
  * (node, long) rows.
  */
object GraphOps {

  /** Fixed-iteration PageRank in integer micro-units (score × 10⁶),
    * damping 0.85 — INTEGER-EXACT: contributions are `pr div outdeg`
    * and the damped update is `150000 + (850000·Σ) div 10⁶`, all floor
    * divisions on longs, so partial-aggregation order cannot perturb a
    * single bit and any engine replays the scores exactly (the x16/x25
    * integer-arithmetic parity pattern — same ranking physics as the
    * float form, none of its non-determinism). Dangling nodes (no
    * out-edges) keep the teleport share only — the standard
    * simplification; their mass is not redistributed.
    *
    * Fixed `iters` (bounded, the caller's convergence budget — ranking
    * typically stabilizes in a handful of rounds). Each iteration adds
    * one join+agg to the plan; beyond 3 iterations the rank table is
    * `localCheckpoint`ed per round (the [[DedupOps]] CC pattern) so the
    * lineage — and with it task-retry recompute cost — stays O(1) per
    * round instead of compounding.
    *
    * Returns (node, pr) for every node in the edge set.
    */
  def pagerankMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters in 1..10, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // pre-divide nothing: (pr div od) must happen per-iteration, but
    // the out-degree rides the edge table ONCE so each round is a
    // single join against the rank table
    val eWithOd = e.join(
      e.groupBy("src").agg(count(lit(1)).as("od")), "src")
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = eWithOd.join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("pr div od").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(850000 * coalesce(m, 0L)) div 1000000"))
            .as("pr"))
      if (iters > 3) pr = pr.localCheckpoint()
    }
    pr
  }
}
