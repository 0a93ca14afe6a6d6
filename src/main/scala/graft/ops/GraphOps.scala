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
  /** Per-node triangle counts over an undirected simple graph —
    * degree-ordered orientation (the node-iterator / compact-forward
    * algorithm): orient every edge from its (degree, id)-smaller
    * endpoint to the larger, generate wedges only from each node's
    * OUT-neighbourhood, and close them with one equi-join back against
    * the oriented edge set. Because orientation respects a total order,
    * every triangle is generated exactly once (at its smallest vertex)
    * and the closing edge is always oriented low→high, so the closing
    * probe is a plain two-column equi-join — no `least/greatest`
    * re-canonicalization on the hot path and no double counting.
    *
    * Scale design: wedge fan-out is Σ_u C(outdeg(u), 2), and the
    * degree orientation bounds outdeg by O(√m) on any graph (the
    * arboricity argument behind the classic O(m^{3/2}) bound) — a
    * hub's quadratic neighbourhood never materializes because hubs
    * sit on the RECEIVING end of their edges. Every step is an
    * equi-join or hash aggregate on a long key; nothing touches the
    * driver. The oriented edge set is persisted: it feeds both wedge
    * sides and the closing probe, and Catalyst does not share
    * subtrees across self-join inputs (the d10 discipline).
    * Integer-exact by construction, so any engine replays the counts
    * bit-for-bit.
    *
    * Returns (node, tri) for every node on ≥1 triangle.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = e0.select(col("a").as("n"))
      .unionAll(e0.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // carry the dst endpoint's (deg, id) so wedge pairs can be ordered
    // without a third join
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val o1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val o2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = o1.join(o2, Seq("u"))
      .where(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tris = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    // node-bounded output: materialize it so `oriented` can be released
    // before returning (cached blocks must not outlive the call)
    val out = tris.select(col("u").as("node"))
      .unionAll(tris.select(col("x").as("node")))
      .unionAll(tris.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
      .localCheckpoint()
    oriented.unpersist(blocking = false)
    out
  }

  def pagerankMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters in 1..10, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // The working set is referenced INSIDE the loop: without a pin,
    // every one of the k iterations re-scans the edge source and
    // re-runs the degree aggregate (k extra scans + k degree shuffles
    // at 100 TB). Persist once, iterate against the cache, release
    // after the final rank table is materialized.
    val (nodes, eWithOd) = pagerankWorking(e)
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      pr = pagerankStep(nodes, eWithOd, pr)
      if (iters > 3) pr = pr.localCheckpoint()
    }
    // node-bounded output: force it so the cached working set can be
    // dropped before returning
    val out = pr.localCheckpoint()
    eWithOd.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** The persisted iteration working set: the distinct node table and
    * the edge table carrying its source's out-degree. Both are read by
    * EVERY iteration — the persist is what keeps iteration k from
    * re-scanning the edge source and re-running the degree shuffle
    * (plan-gated in PlanQualitySpec).
    */
  private[graft] def pagerankWorking(e: DataFrame): (DataFrame, DataFrame) = {
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pre-divide nothing: (pr div od) must happen per-iteration, but
    // the out-degree rides the edge table ONCE so each round is a
    // single join against the rank table
    val eWithOd = e.join(
        e.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (nodes, eWithOd)
  }

  /** One damped integer-micro-unit rank update against the cached
    * working set: a single join + aggregate per round.
    */
  private[graft] def pagerankStep(nodes: DataFrame, eWithOd: DataFrame,
      pr: DataFrame): DataFrame = {
    val contrib = eWithOd.join(pr.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("pr div od").as("c"))
      .groupBy("node").agg(sum(col("c")).as("m"))
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(150000L) + expr("(850000 * coalesce(m, 0L)) div 1000000"))
          .as("pr"))
  }

  /** Personalized PageRank (integer micro-units, damping 0.85): the
    * teleport mass lands ONLY on the `sources` set, so scores measure
    * proximity to the seeds rather than global centrality — the
    * "related items / local influence" ranker. Same integer-exact
    * arithmetic as [[pagerankMicro]] (seed base 150000, contributions
    * `pr div outdeg`, damped update by floor division), same persisted
    * working set, same per-round `localCheckpoint` lineage cap; seeds
    * start at 10⁶, everything else at 0, so round k's mass is exactly
    * the ≤k-hop neighbourhood. Non-seed nodes unreachable from the
    * seeds stay at 0 and ARE returned (callers filter).
    *
    * Scale: identical to pagerankMicro plus one broadcastable
    * seed-membership left join folded into the working set (seeds are
    * query-sized, never corpus-sized).
    */
  def personalizedPagerankMicro(edges: DataFrame, srcCol: String,
      dstCol: String, sources: DataFrame, sourceCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters in 1..10, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val seeds = sources.select(col(sourceCol).cast("long").as("node"))
      .distinct()
    val (nodes0, eWithOd) = pagerankWorking(e)
    // fold seed membership into the cached node table (one broadcast
    // join, paid once — every iteration reads it from the cache)
    val nodes = nodes0.join(broadcast(seeds.withColumn("__seed", lit(true))),
        Seq("node"), "left")
      .withColumn("__base", when(col("__seed"), lit(150000L)).otherwise(lit(0L)))
      .select("node", "__base")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    var pr = nodes.select(col("node"),
      when(col("__base") > 0, lit(1000000L)).otherwise(lit(0L)).as("pr"))
    for (i <- 1 to iters) {
      val contrib = eWithOd.join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("pr div od").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("__base") + expr("(850000 * coalesce(m, 0L)) div 1000000"))
            .as("pr"))
      if (iters > 3) pr = pr.localCheckpoint()
    }
    val out = pr.localCheckpoint()
    eWithOd.unpersist(blocking = false)
    nodes0.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS: minimum hop distance from ANY source node,
    * capped at `maxHops` — the reachability/blast-radius operator
    * (descendantCrawl's general-graph sibling: that one walks a known
    * fixed-depth DAG of typed tables; this one walks an arbitrary —
    * possibly cyclic — homogeneous edge set and RETURNS the
    * distances). Returns (node, dist) for every node within reach;
    * unreachable nodes are absent.
    *
    * Frontier iteration: round h joins the hop-(h−1) frontier against
    * the edge table and anti-joins the visited set, so each edge is
    * expanded at most once per incident frontier appearance and a
    * cyclic graph terminates because the frontier can only shrink to
    * empty or the cap is hit. The edge table is persisted across
    * rounds (the [[pagerankMicro]] working-set discipline); frontier
    * and visited are `localCheckpoint`ed per round so lineage — and
    * task-retry recompute — stays O(1) per round. The per-round empty
    * check reads the checkpointed frontier's cached `isEmpty`, not a
    * recompute.
    *
    * Scale: each round is one equi-join (frontier ⋈ edges — AQE
    * broadcasts a narrow frontier) + one distinct + one anti-join,
    * all on the long node key. Visited grows monotonically but stays
    * (node, dist)-narrow; 100 TB graphs bound rounds by the cap, and
    * real blast-radius queries use small caps.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 20, s"maxHops in 1..20, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col(sourceCol).cast("long").as("node"))
      .distinct().withColumn("dist", lit(0))
      .localCheckpoint()
    var frontier = visited
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      frontier = frontier.select(col("node").as("src"))
        .join(e, "src").select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint()
      visited = visited.unionAll(frontier).localCheckpoint()
      h += 1
    }
    e.unpersist(blocking = false)
    visited
  }
}
