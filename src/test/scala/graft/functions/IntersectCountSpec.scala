package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.etl.SparkTestSession

/** [[IntersectCount]] — the native `size(array_intersect(a, b))` the
  * set-similarity verify stages run per candidate pair: differential
  * equality against the built-in composition on adversarial fixtures
  * (duplicates, null elements, empties, null arrays) plus a randomized
  * sweep, both through the expression evaluator AND the whole-stage
  * codegen path (a DataFrame projection).
  */
class IntersectCountSpec extends AnyFunSuite with TableDrivenPropertyChecks {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixtures: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq("a", "b", "c"), Seq("x", "y")),
    (Seq(), Seq("a")),
    (Seq(), Seq()),
    (Seq("a", "a", "b"), Seq("a")), // dup on probe side: counts once
    (Seq("a"), Seq("a", "a", "b")), // dup on set side: counts once
    (Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")),
    (Seq(null, "a"), Seq("a", "b")), // null elem one side only
    (Seq(null, "a"), Seq(null, "b")), // null elem both sides: counts once
    (Seq(null, null, "a"), Seq(null, null)),
    (Seq("", "a"), Seq("", "b")), // empty string is a real value
    ((1 to 500).map(i => s"t$i"), (250 to 750).map(i => s"t$i")))

  test("differential: equals size(array_intersect) on fixtures, " +
      "codegen path") {
    val df = fixtures.toDF("a", "b")
      .select(
        graft.ops.DedupOps.intersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    df.collect().zip(fixtures).foreach { case (r, f) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on $f")
    }
  }

  test("differential: randomized sweep (seeded)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300) {
      def arr() = Seq.fill(rnd.nextInt(40))(
        if (rnd.nextInt(20) == 0) null else s"s${rnd.nextInt(25)}")
      (arr(), arr())
    }
    val df = rows.toDF("a", "b").select(
      graft.ops.DedupOps.intersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    df.collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("null array yields null (both sides)") {
    val df = Seq((Some(Seq("a")), None: Option[Seq[String]]),
        (None: Option[Seq[String]], Some(Seq("a"))),
        (None: Option[Seq[String]], None: Option[Seq[String]]))
      .toDF("a", "b")
      .select(graft.ops.DedupOps.intersectCount(col("a"), col("b")).as("n"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("interpreted eval agrees with compute()") {
    // direct unit check of the remove-on-hit algorithm
    assert(IntersectCount.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("a", "b", "b", null).map(
          org.apache.spark.unsafe.types.UTF8String.fromString)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("b", null, "c", "b").map(
          org.apache.spark.unsafe.types.UTF8String.fromString))) == 2)
  }

  test("registered SQL function") {
    assert(spark.sql(
      "SELECT intersect_count(array('a','b'), array('b','c'))")
      .head.getInt(0) == 1)
  }
}
