package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class SketchOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 groups × 40 cells × skewed member counts, with heavy cross-cell
  // overlap so the rollup can't just sum cell counts
  private def fixture = (1 to 20000).map { i =>
    (i % 3, i % 40, (i * 2654435761L) % 5000)
  }.toDF("g", "cell", "member")

  test("hllRollup of hllCube lands within the sketch error of the " +
      "exact distinct count") {
    val df = fixture
    val got = SketchOps.hllRollup(
        SketchOps.hllCube(df, Seq("g", "cell"), "member", lgK = 12), Seq("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(count_distinct(col("member")).as("x"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for ((g, est) <- got)
      assert(math.abs(est - exact(g)) <= 0.05 * exact(g),
        s"group $g: est $est vs exact ${exact(g)}")
  }

  test("hllCube output is cells-sized regardless of input rows") {
    val df = fixture
    assert(SketchOps.hllCube(df, Seq("g", "cell"), "member").count() == 120)
  }

  test("hllRollupLaw verdicts hold from both granularities") {
    val rows = SketchOps.hllRollupLaw(fixture, Seq("g"), Seq("g", "cell"),
        Seq("g", "cell", "member"), "member").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      assert(r.getAs[Boolean]("coarse_ok"), s"coarse_ok false: $r")
      assert(r.getAs[Boolean]("fine_ok"), s"fine_ok false: $r")
    }
  }

  test("hllIntersectLaw: inclusion-exclusion lands inside the envelope " +
      "on known overlaps, including a near-disjoint pair") {
    // A: 0..3999, B: 2000..5999 (overlap 2000), C: 100000..100049
    // (tiny, disjoint from A except nothing — truly disjoint)
    val rows = (0 until 4000).map(v => ("A", v.toLong)) ++
      (2000 until 6000).map(v => ("B", v.toLong)) ++
      (100000 until 100050).map(v => ("C", v.toLong))
    val got = SketchOps.hllIntersectLaw(rows.toDF("k", "v"), "k", "v",
        relTol = 0.1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("A", "B"))._1 == 2000L && got(("A", "B"))._2,
      s"A-B overlap: ${got(("A", "B"))}")
    // disjoint pairs: exact 0, verdict via the absolute-floor arm
    assert(got(("A", "C")) == ((0L, true)) && got(("B", "C")) == ((0L, true)))
  }

  test("parameter validation") {
    val df = fixture
    intercept[IllegalArgumentException] {
      SketchOps.hllCube(df, Seq.empty, "member")
    }
    intercept[IllegalArgumentException] {
      SketchOps.hllCube(df, Seq("g"), "member", lgK = 2)
    }
    intercept[IllegalArgumentException] {
      SketchOps.hllRollupLaw(df, Seq("g"), Seq("g"), Seq("g"), "member",
        relTol = 0.0)
    }
  }
}
