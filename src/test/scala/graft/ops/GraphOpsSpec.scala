package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class GraphOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerankMicro matches hand-derived integer rounds on a cycle graph") {
    // 1 -> {2,3}, 2 -> 3, 3 -> 1; outdeg 1:2, 2:1, 3:1; pr0 = 10^6 each.
    // round 1: m = (1e6, 5e5, 1.5e6) -> pr = (1000000, 575000, 1425000)
    // round 2: m = (1425000, 500000, 1075000)
    //          -> pr = (1361250, 575000, 1063750)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got1 = GraphOps.pagerankMicro(edges, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    val got2 = GraphOps.pagerankMicro(edges, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("dangling nodes keep only the teleport share") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val got = GraphOps.pagerankMicro(edges, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 receives nothing (150000); node 2 receives 1's full rank
    assert(got == Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("the localCheckpoint path (iters > 3) is deterministic and " +
      "node-preserving") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)).toDF("s", "d")
    val a = GraphOps.pagerankMicro(edges, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pagerankMicro(edges, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "checkpointed iteration must be run-to-run identical")
    val nodes = edges.select("s").union(edges.select("d")).distinct().count()
    assert(a.size == nodes)
    assert(a.values.forall(_ >= 150000L), "every node keeps the teleport floor")
    intercept[IllegalArgumentException] {
      GraphOps.pagerankMicro(edges, "s", "d", iters = 0)
    }
  }

  test("triangleCounts: K4 has 4 triangles, 3 per node; an added " +
      "pendant edge changes nothing") {
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b)
      yield (a.toLong, b.toLong)) :+ (4L, 5L)
    val got = GraphOps.triangleCounts(k4.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // C(4,3) = 4 triangles; each K4 node sits on C(3,2) = 3 of them;
    // the pendant node 5 is on none and must be absent
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts normalizes direction, duplicates, and self-loops") {
    // same triangle {1,2,3} given as mixed directions with a repeat
    // and a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 3L))
      .toDF("s", "d")
    val got = GraphOps.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts matches brute-force triple enumeration on a " +
      "random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = GraphOps.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side brute force over all C(n,3) vertex triples
    val adj = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = adj.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if adj((a, b)) && adj((a, c)) && adj((b, c))
    } Seq(a, b, c).foreach(n => expect(n) = expect.getOrElse(n, 0L) + 1L)
    assert(got == expect.toMap)
  }

  test("personalizedPagerankMicro matches a sequential integer replay; " +
      "teleport mass stays on the seed side") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L),
      (5L, 6L)).toDF("s", "d") // 5-6 disconnected from the seed
    val seeds = Seq(1L).toDF("n")
    val iters = 3
    val got = GraphOps.personalizedPagerankMicro(edges, "s", "d",
        seeds, "n", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential replay of the same integer arithmetic
    val e = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 5L -> 6L)
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def base(n: Long) = if (n == 1L) 150000L else 0L
    var pr = nodes.map(n => n -> (if (n == 1L) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val m = e.groupBy(_._2).view.mapValues(_.map(t =>
        pr(t._1) / od(t._1)).sum).toMap
      pr = nodes.map(n => n -> (base(n) + 850000L * m.getOrElse(n, 0L) / 1000000L)).toMap
    }
    assert(got == pr)
    assert(got(5L) == 0L && got(6L) == 0L,
      "nodes unreachable from the seeds must hold zero mass")
    assert(got(1L) >= 150000L, "the seed keeps its teleport share")
  }

  test("bfsHops labels min hop distance from any source, caps at maxHops") {
    // path 1-2-3-4-5-6 plus a cycle 2-7-8-2 and an unreachable 99-100;
    // undirected via both directions
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 7L), (7L, 8L), (8L, 2L), (99L, 100L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val sources = Seq(1L).toDF("n")
    val got = GraphOps.bfsHops(edges, "s", "d", sources, "n", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 8 is 2 hops away (1-2-8 via the undirected 8→2 edge), not 3 via 7
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 7L -> 2, 8L -> 2, 4L -> 3))
  }

  test("bfsHops multi-source takes the nearer source; isolated source " +
      "appears at dist 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 4L)).toDF("s", "d")
    val sources = Seq(1L, 10L, 42L).toDF("n") // 42 has no edges at all
    val got = GraphOps.bfsHops(edges, "s", "d", sources, "n", maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // directed here: 4 is 1 hop from source 10, not 3 hops from source 1
    assert(got == Map(1L -> 0, 10L -> 0, 42L -> 0,
      2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfsHops terminates on a pure cycle and rejects bad caps") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = GraphOps.bfsHops(cyc, "s", "d", Seq(1L).toDF("n"), "n", 20)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
    intercept[IllegalArgumentException] {
      GraphOps.bfsHops(cyc, "s", "d", Seq(1L).toDF("n"), "n", 0)
    }
  }
}
