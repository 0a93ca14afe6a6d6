package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class RetrievalOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential reference: the same integer-rational BM25 formula
    * evaluated doc-by-doc — exact equality expected, not approximate.
    */
  private def ref(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Set[(Long, Int, Long, Long, Long)] = {
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val postings = corpus
      .flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val dl = postings.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val df = postings.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val n = dl.size.toLong
    val totlen = dl.values.sum
    queries.flatMap { case (qid, qt) =>
      val terms = toks(qt).distinct
      val scores = corpus.map(_._1).distinct.flatMap { id =>
        val contribs = terms.flatMap { w =>
          postings.get((id, w)).map { tf =>
            (n * 88L * tf * totlen * 1000L) /
              (df(w) * (40L * tf * totlen + 12L * totlen + 36L * dl(id) * n))
          }
        }
        if (contribs.isEmpty) None
        else Some((id, contribs.sum, contribs.size.toLong))
      }
      scores.sortBy { case (id, s, _) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s, m), i) => (qid, i + 1, id, s, m) }
    }.toSet
  }

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Set[(Long, Int, Long, Long, Long)] =
    RetrievalOps.bm25TopK(
        corpus.toDF("doc_id", "text"), queries.toDF("qid", "text"),
        "doc_id", "text", "qid", "text", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("bm25TopK: rarity, tf saturation, and length normalization order " +
      "a hand-built corpus as expected") {
    val corpus = Seq(
      1L -> "spark spark spark engine",   // high tf on the rare term
      2L -> "spark engine engine engine", // one spark, long on common
      3L -> "engine engine",              // no rare term at all
      4L -> "spark")                      // short doc, one rare term
    val queries = Seq(100L -> "spark")
    val got = run(corpus, queries, 10)
    // docs 1, 2, 4 match; doc 3 must NOT appear (inverted index, not a scan)
    assert(got.map(_._3) == Set(1L, 2L, 4L))
    assert(got == ref(corpus, queries, 10))
    // the short doc with the term beats the long doc that mentions it once
    val rankOf = got.map(t => t._3 -> t._2).toMap
    assert(rankOf(4L) < rankOf(2L),
      "length normalization must favor the short matching doc")
    assert(rankOf(1L) < rankOf(2L), "higher tf must outrank a single mention")
  }

  test("bm25TopK matches the sequential reference exactly on random corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def text() = Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    val corpus = (1L to 60L).map(id => id -> text())
    val queries = (101L to 110L).map(id => id -> text())
    assert(run(corpus, queries, 5) == ref(corpus, queries, 5))
  }

  test("bm25TopK: scores are invariant under uniform corpus replication — " +
      "every clone inherits its original's score and the top hit is " +
      "score-identical") {
    // every factor pair (N, df) and (totlen, dl·N) inflates together, so
    // the cleared-fraction score is provably unchanged per document;
    // clones therefore TIE their originals and interleave into the
    // ranking (big top-k = base top-⌈k/3⌉ expanded), which is exactly
    // the volume-probe law: check per-clone score inheritance, top-score
    // equality, and the exact differential on the replicated corpus
    val rnd = new scala.util.Random(47)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g")
    def text() = Seq.fill(rnd.nextInt(8) + 1)(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    val corpus = (1L to 40L).map(id => id -> text())
    val queries = (101L to 105L).map(id => id -> text())
    val tripled = (0 to 2).flatMap(rep =>
      corpus.map { case (id, t) => (id + rep * 1000L) -> t })
    val big = run(tripled, queries, 5)
    assert(big == ref(tripled, queries, 5), "exact differential at x3")
    // full base ranking (k covers the whole corpus) for the laws
    val baseAll = ref(corpus, queries, 100)
      .map(t => (t._1, t._3) -> ((t._4, t._5))).toMap
    for ((qid, _, id, score, m) <- big)
      assert(baseAll((qid, id % 1000L)) == ((score, m)),
        s"clone $id drifted from its original's score under replication")
    val baseTop = run(corpus, queries, 5).filter(_._2 == 1)
      .map(t => t._1 -> t._4).toMap
    for ((qid, rank, _, score, _) <- big if rank == 1)
      assert(score == baseTop(qid),
        s"query $qid top score changed under replication")
  }

  test("bm25TopK rejects out-of-range k") {
    intercept[IllegalArgumentException] {
      RetrievalOps.bm25TopK(Seq((1L, "x")).toDF("doc_id", "text"),
        Seq((2L, "x")).toDF("qid", "text"), "doc_id", "text", "qid", "text", 0)
    }
  }

  test("rrfFuse sums integer reciprocal-rank contributions per (q, doc)") {
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("qid", "doc_id", "rank")
    val den = Seq((1L, 20L, 1L), (1L, 10L, 2L), (1L, 40L, 3L))
      .toDF("qid", "doc_id", "rank")
    val got = RetrievalOps.rrfFuse(Seq(lex, den), "qid", "doc_id", "rank",
        k0 = 60, k = 10, depth = 10)
      .collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getLong(3), r.getLong(4)))
      .toSet
    def c(rank: Long) = 1000000L / (60L + rank)
    // 10: lex r1 + den r2; 20: lex r2 + den r1 (same sum, id tiebreak);
    // 30: lex only; 40: den only
    assert(got == Set(
      (10L, 1, c(1) + c(2), 2L), (20L, 2, c(1) + c(2), 2L),
      (30L, 3, c(3), 1L), (40L, 4, c(3), 1L)))
  }

  test("rrfFuse ignores ranks past depth and rejects a single list") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 5L)).toDF("qid", "doc_id", "rank")
    val b = Seq((1L, 30L, 2L)).toDF("qid", "doc_id", "rank")
    val got = RetrievalOps.rrfFuse(Seq(a, b), "qid", "doc_id", "rank",
        k0 = 60, k = 3, depth = 3)
      .collect().map(_.getLong(2)).toSet // doc ids kept
    assert(got == Set(10L, 30L), "rank 5 > depth 3 must be dropped")
    intercept[IllegalArgumentException] {
      RetrievalOps.rrfFuse(Seq(a), "qid", "doc_id", "rank")
    }
  }
}
