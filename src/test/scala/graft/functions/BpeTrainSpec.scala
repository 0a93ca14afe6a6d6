package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import graft.ops.BpeTrainOps
import graft.ops.BpeTrainOps.MergeRound

/** Differential gate for the distributed BPE vocabulary trainer: the
  * Spark implementation must equal a straight-line sequential trainer
  * (same conventions: overlap pair counting weighted by word frequency,
  * max count with lexicographic tie-break, left-to-right non-overlap
  * merge) on the corpus and on adversarial fixtures, and must reproduce
  * the engine's built-in fixture vocabulary
  * ([[BpeVocab.DefaultMerges]] was learned offline by this algorithm
  * over the sf0.1 documents).
  */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  /** Sequential reference: the textbook trainer, no Spark. */
  private def seqTrain(texts: Seq[String], nMerges: Int): Seq[MergeRound] = {
    val wf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach(_.trim.split("\\s+").filter(_.nonEmpty)
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L))
    var state: Seq[(Array[String], Long)] =
      wf.toSeq.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val out = Seq.newBuilder[MergeRound]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (toks, f) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += MergeRound(rank, l, r, cnt)
        state = state.map { case (toks, f) => (mergeOnce(toks, l, r), f) }
        rank += 1
      }
    }
    out.result()
  }

  /** Left-to-right non-overlapping single-pair merge — the same pass
    * [[BpeModel.encode]] runs per greedy iteration.
    */
  private def mergeOnce(toks: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
        out += l + r; j += 2
      } else { out += toks(j); j += 1 }
    }
    out.toArray
  }

  private def texts(dir: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("text").as[String].collect().toSeq
  }

  test("distributed trainer equals the sequential reference on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = BpeTrainOps.bpeTrain(docs, "text", 25)
    val ref = seqTrain(texts("/root/testdata/sf0.001"), 25)
    assert(dist == ref, s"\ndist=$dist\nref =$ref")
  }

  test("distributed trainer equals the reference on adversarial fixtures " +
      "(repeated-char runs pin the non-overlap merge + overlap count conventions)") {
    import spark.implicits._
    val fixture = Seq(
      "aaaaa aaaa aaa aa",            // runs: overlap counting + L2R merge
      "abab ababab abababab",         // alternation
      "xxyy xyxy yxyx",
      "aaaaa",                        // the shared-delimiter trap word
      "zzzzzz zz z",
      "banana bandana ananas")
    val docs = fixture.toDF("text")
    val dist = BpeTrainOps.bpeTrain(docs, "text", 12)
    val ref = seqTrain(fixture, 12)
    assert(dist == ref, s"\ndist=$dist\nref =$ref")
  }

  test("trainer reproduces the engine's fixture vocabulary: 40 merges " +
      "over the sf0.1 documents = BpeVocab.DefaultMerges") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val learned = BpeTrainOps.bpeTrain(docs, "text", 40).map(m => (m.l, m.r))
    assert(learned == BpeVocab.DefaultMerges,
      s"\nlearned=$learned\nfixture=${BpeVocab.DefaultMerges}")
  }

  test("learned table feeds BpeModel directly (learned-shape by construction) " +
      "and the trained encoder round-trips corpus words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rounds = BpeTrainOps.bpeTrain(docs, "text", 25)
    val model = new BpeModel(rounds.map(m => (m.l, m.r))) // validates shape
    texts("/root/testdata/sf0.001").take(50).foreach { t =>
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
        assert(model.encode(w).mkString == w, s"lossy encode of '$w'")
      }
    }
  }

  test("early exhaustion: a corpus whose every word fully merges stops " +
      "before nMerges and the model still validates") {
    import spark.implicits._
    val docs = Seq("ab ab ab", "ab ab").toDF("text")
    val rounds = BpeTrainOps.bpeTrain(docs, "text", 10)
    assert(rounds.map(m => (m.l, m.r)) == Seq(("a", "b")))
    assert(rounds.head.cnt == 5L)
  }
}
