package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.CleanOps
import graft.etl.SparkTestSession

/** Property-style pinning of the relational invariants the ETL relies
  * on (pandas outer-merge semantics, clean normalization, salting):
  * seeded randomized frames, structural assertions computed by an
  * independent in-memory model.
  */
class RelationalPropertiesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randTable(n: Int): Seq[(String, String)] =
    Seq.fill(n) {
      val k = rng.nextInt(6) match {
        case 0 => null
        case i => i.toString
      }
      (k, rng.alphanumeric.take(4).mkString)
    }

  test("full-outer join retains every row of both sides (null keys never match)") {
    (1 to 8).foreach { _ =>
      val l = randTable(8)
      val r = randTable(8)
      val joined = RelationalOps.outerJoinChain(
        l.toDF("k", "lv"), Seq((r.toDF("k", "rv"), Seq("k"))))
      // independent model: matched multiplicities + unmatched from both
      // sides (null keys always unmatched but retained)
      val lKeys = l.map(_._1).filter(_ != null).groupBy(identity).view.mapValues(_.size)
      val rKeys = r.map(_._1).filter(_ != null).groupBy(identity).view.mapValues(_.size)
      val matched = lKeys.keySet.intersect(rKeys.keySet.toSet)
        .toSeq.map(k => lKeys(k).toLong * rKeys(k)).sum
      val lUnmatched = l.count { case (k, _) => k == null || !rKeys.contains(k) }
      val rUnmatched = r.count { case (k, _) => k == null || !lKeys.contains(k) }
      assert(joined.count() == matched + lUnmatched + rUnmatched)
      // and the coalesced key column preserves each side's own values
      val keys = joined.select("k").collect().map(_.getString(0))
      assert(keys.count(_ == null) == l.count(_._1 == null) + r.count(_._1 == null))
    }
  }

  test("cleanString is idempotent and sentinel-closed on adversarial values") {
    val values = CleanOps.MissingDataValues.toSeq ++
      CleanOps.MissingDataValues.toSeq.map(s => s"  $s  ") ++
      Seq("", "  padded  ", "ok", "N/A extra", null) ++
      Seq.fill(10)(rng.alphanumeric.take(6).mkString)
    val df = values.toDF("v")
    val once = df.select(CleanOps.cleanString(col("v")).as("c"))
    val twice = once.select(CleanOps.cleanString(col("c")).as("c"))
    assert(once.collect().map(r => Option(r.getString(0))).toSeq ==
      twice.collect().map(r => Option(r.getString(0))).toSeq)
    once.collect().flatMap(r => Option(r.getString(0))).foreach { s =>
      assert(!CleanOps.MissingDataValues.contains(s), s"sentinel survived: '$s'")
      assert(s == s.trim, s"padding survived: '$s'")
    }
    // trimmed sentinels normalize to null too (trim happens first)
    val trimmedSentinels = df.where(col("v").isNotNull &&
      trim(col("v")).isin(CleanOps.MissingDataValues.toSeq: _*))
    assert(trimmedSentinels.select(CleanOps.cleanString(col("v")).as("c"))
      .where(col("c").isNotNull).count() == 0)
  }

  test("rename is bijective: applying the inverse map restores the schema") {
    val renames = Map("a" -> "X|A", "b" -> "X|B", "c" -> "X|C")
    val df = Seq(("1", "2", "3")).toDF("a", "b", "c")
    val there = RelationalOps.renameColumns(df, renames)
    assert(there.columns.toSet == renames.values.toSet)
    val back = RelationalOps.renameColumns(there, renames.map(_.swap))
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("code-map lookup: null/missing → null; with-default → default") {
    val m = Map("x" -> "X", "y" -> "Y")
    val df = Seq(Some("x"), Some("zzz"), None).toDF("k")
    val got = df.select(
      RelationalOps.codeLookup(col("k"), m).as("plain"),
      RelationalOps.codeLookupWithDefault(col("k"), m, "D").as("dflt"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)))
    assert(got.toSeq == Seq((Some("X"), "X"), (None, "D"), (None, "D")))
  }

  test("cast failure ⇒ field omission: tolerantCast null + to_json drops the key") {
    val df = Seq("123", "bogus", null).toDF("v")
    val jsons = df.select(to_json(struct(
      RelationalOps.tolerantCast(col("v"), "int").as("n"),
      lit("k").as("tag"))).as("j")).collect().map(_.getString(0))
    assert(jsons(0).contains("\"n\":123"))
    assert(!jsons(1).contains("\"n\""), s"failed cast must omit the field: ${jsons(1)}")
    assert(!jsons(2).contains("\"n\""))
  }

  test("saltedJoin multiset-equals the plain join on random frames") {
    (1 to 5).foreach { _ =>
      val l = randTable(10).toDF("k", "lv")
      val r = randTable(6).toDF("k", "rv")
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      assert(multiset(RelationalOps.saltedJoin(l, r, Seq("k"), 3, "left")) ==
        multiset(l.join(r, Seq("k"), "left")))
    }
  }
}
