package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class EvalOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aucByGroup matches a sequential tie-aware Mann-Whitney reference " +
      "on random data with heavy ties") {
    val rnd = new scala.util.Random(17)
    // small score domain forces ties, incl. pos/neg ties at one score
    val rows = (1 to 800).map(_ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(12).toDouble, rnd.nextBoolean()))
    val got = EvalOps.aucByGroup(rows.toDF("g", "score", "y"),
        Seq("g"), "score", col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      // U2 = Σ over (p, n) of 2·[p>n] + 1·[p==n]
      val u2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      g -> ((pos.size.toLong, neg.size.toLong,
        u2 * 1000000L / (2L * pos.size * neg.size)))
    }
    assert(got == expect)
  }

  test("aucByGroup: perfect separation = 1e6, reversed = 0, " +
      "all-tied = 500000, degenerate groups null") {
    val rows = Seq(
      ("sep", 1.0, false), ("sep", 2.0, false), ("sep", 3.0, true),
      ("rev", 3.0, false), ("rev", 1.0, true),
      ("tie", 5.0, true), ("tie", 5.0, false),
      ("onlypos", 1.0, true)
    ).toDF("g", "score", "y")
    val got = EvalOps.aucByGroup(rows, Seq("g"), "score", col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map("sep" -> Some(1000000L), "rev" -> Some(0L),
      "tie" -> Some(500000L), "onlypos" -> None))
  }

  test("prAtThresholds: confusion counts and exact ppm ratios per " +
      "threshold; >= is inclusive") {
    val rows = Seq(
      ("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true), ("g", 4.0, true)
    ).toDF("g", "score", "y")
    val got = EvalOps.prAtThresholds(rows, Seq("g"), "score", col("y"),
        Seq(2.0, 5.0))
      .collect().map(r => r.getDouble(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // t=2: pred = {2,3,4}: tp=2 (3,4), fp=1 (2), fn=1 (1)
    assert(got(2.0) == ((2L, 1L, 1L, 666666L, 666666L)))
    // t=5: nothing predicted: tp=0, fp=0 -> precision null, recall 0
    assert(got(5.0) == ((0L, 0L, 3L, -1L, 0L)))
    intercept[IllegalArgumentException] {
      EvalOps.prAtThresholds(rows, Seq("g"), "score", col("y"), Seq.empty)
    }
  }
}
