package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.etl.SparkTestSession

class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir).select(
    col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))

  test("IVF top-k achieves usable recall against brute force") {
    val centroids = SimilarityOps.seedCentroids(
      Tables.embeddings(spark, dir), "vec_id", "embedding", nCells = 16)
    assert(centroids.size == 16)

    val q = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("v").as("cv"))

    val exact = SimilarityOps.bruteForceTopK(q, c, k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(q, c, centroids, nProbe = 4, k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
    // and probing ALL cells must recover brute force exactly
    val full = SimilarityOps.ivfTopK(q, c, centroids, nProbe = 16, k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "probing every cell must equal brute force")
  }

  test("native dot product is bit-identical to the composed left fold") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = spark.createDataFrame(rows).toDF("id", "a", "b")
    val diff = df.select(
        SimilarityOps.dot(col("a"), col("b")).as("native"),
        SimilarityOps.dotComposed(col("a"), col("b")).as("composed"))
      .collect()
    diff.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"bit drift: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    // null semantics: mismatched lengths and null arrays -> null
    val edge = spark.createDataFrame(Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0)),
      (2L, null, Seq(1.0))).asInstanceOf[Seq[(Long, Seq[Double], Seq[Double])]])
      .toDF("id", "a", "b")
      .select(SimilarityOps.dot(col("a"), col("b")).as("d")).collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("native PQ encoder equals the composed argmin form") {
    val emb = Tables.embeddings(spark, dir).select(
      col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))
    val books = SimilarityOps.seedSubCentroids(emb, "vec_id", "v", m = 8, k = 16)
    val rows = emb.select(
        SimilarityOps.pqEncode(col("v"), books).as("native"),
        SimilarityOps.pqEncodeComposed(col("v"), books).as("composed"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"code drift: $r"))
  }

  test("PQ round-trip: codes in range, reconstruction beats the zero vector") {
    val emb = Tables.embeddings(spark, dir).select(
      col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))
    val books = SimilarityOps.seedSubCentroids(emb, "vec_id", "v", m = 8, k = 16)
    assert(books.size == 8 && books.forall(_.size == 16))
    assert(books.forall(_.forall(_.size == books.head.head.size)))
    val withCode = emb.select(col("vec_id"), col("v"),
      SimilarityOps.pqEncode(col("v"), books).as("code"))
    val codes = withCode.select("code").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == 8 && c.forall(i => i >= 0 && i < 16)))
    // a sampled-codebook quantizer must on average reconstruct closer
    // than the zero vector (rel err < 1)
    val recon = SimilarityOps.pqDecode(col("code"), books)
    def diff(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.zip_with(a, b, (x, y) => x - y)
    val avgErr = withCode.select(
        (SimilarityOps.dot(diff(col("v"), recon), diff(col("v"), recon)) /
          SimilarityOps.dot(col("v"), col("v"))).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    assert(avgErr < 0.9, s"avg relative quantization error $avgErr")
  }

  test("ivfCell assigns each vector to its nearest centroid") {
    val centroids = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val df = spark.createDataFrame(Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(9.0, 8.0)))).toDF("id", "v")
    val cells = df.select(col("id"),
        SimilarityOps.ivfCell(col("v"), centroids).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == Map(1L -> 0, 2L -> 1))
  }

  test("kmeansFit separates well-separated clusters and recovers their means") {
    // two tight clusters far apart; seeds (ids 1,2) both start in the
    // left cluster, so only a real Lloyd's update can pull centroid 1
    // across to the right cluster
    val df = spark.createDataFrame(Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(100.0, 100.0)), (5L, Seq(101.0, 100.0)), (6L, Seq(100.0, 101.0))))
      .toDF("id", "v")
    val (cents, assign) = SimilarityOps.kmeansFit(df, "id", "v", k = 2, iters = 3)
    val byId = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId.filter(_._1 <= 3L).values.toSet.size == 1, "left cluster together")
    assert(byId.filter(_._1 >= 4L).values.toSet.size == 1, "right cluster together")
    assert(byId(1L) != byId(4L), "clusters separated")
    // exact expected doubles: (decimal member sum → double) / count
    val sorted = cents.sortBy(_.head)
    assert(sorted(0) == Seq(1.0 / 3, 1.0 / 3), s"left mean: ${sorted(0)}")
    assert(sorted(1) == Seq(301.0 / 3, 301.0 / 3), s"right mean: ${sorted(1)}")
  }

  test("semanticDedup: within-cluster near-dups collapse to min-id reps") {
    // two direction-aligned families far apart; both seeds (ids 1,2)
    // start in the right family, so the fit must first separate the
    // space before the within-cluster pair search can find the dups
    val df = spark.createDataFrame(Seq(
      (1L, Seq(10.0, 0.0)), (2L, Seq(10.1, 0.0)), (3L, Seq(9.9, 0.0)),
      (4L, Seq(0.0, 10.0)), (5L, Seq(0.1, 10.0)), (6L, Seq(-0.1, 10.0))))
      .toDF("id", "v")
    val out = SimilarityOps.semanticDedup(df, "id", "v",
        k = 2, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out.map { case (id, (_, rep)) => id -> rep } ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
    assert(Set(1L, 2L, 3L).map(out(_)._1).size == 1, "right family one cluster")
    assert(Set(4L, 5L, 6L).map(out(_)._1).size == 1, "left family one cluster")
    assert(out(1L)._1 != out(4L)._1, "families in different clusters")
  }

  test("kmeansFit refuses to return a fit with an empty cluster") {
    // both seeds identical: every point ties to index 0, cell 1 empties
    val df = spark.createDataFrame(Seq(
      (1L, Seq(5.0, 5.0)), (2L, Seq(5.0, 5.0)), (3L, Seq(6.0, 5.0))))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      SimilarityOps.kmeansFit(df, "id", "v", k = 2, iters = 1)
    }
  }

  test("sqEncode: hand-pinned codes at range edges, midpoints, and a " +
      "degenerate dimension; encode is narrow (zero exchanges)") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(0.0, 10.0, 7.0)), (2L, Seq(5.0, 20.0, 7.0)),
      (3L, Seq(2.5, 15.0, 7.0))))
      .toDF("id", "v")
    val stats = SimilarityOps.sqStats(df, "v")
    assert(stats == Seq((0.0, 5.0), (10.0, 20.0), (7.0, 7.0)))
    val out = df.select(col("id"), SimilarityOps.sqEncode(col("v"), stats).as("c"))
    val byId = out.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // min -> 0, max -> 255, exact midpoint -> floor(127.5) = 127,
    // degenerate dim -> 0
    assert(byId(1L) == Seq(0, 0, 0))
    assert(byId(2L) == Seq(255, 255, 0))
    assert(byId(3L) == Seq(127, 127, 0))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sq encode must be a narrow map:\n$p")
  }

  test("bqEncode packs exactly the sign bits (driver-decoded words vs " +
      "per-dimension threshold comparison)") {
    val thr = SimilarityOps.bqThresholds(emb, "v")
    assert(thr.size == 64)
    val rows = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("v"),
        SimilarityOps.bqEncode(col("v"), thr).as("w"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val words = r.getSeq[Long](2)
      assert(words.size == 2)
      for (i <- 0 until 64) {
        val expected = if (v(i) > thr(i)) 1L else 0L
        val got = (words(i / 32) >> (31 - i % 32)) & 1L
        assert(got == expected, s"vec ${r.getLong(0)} dim $i: bit $got, want $expected")
      }
    }
  }

  test("bqTopK with full oversample degenerates to exact brute-force top-k " +
      "(the re-rank stage is lossless once the shortlist covers the corpus)") {
    val thr = SimilarityOps.bqThresholds(emb, "v")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("v").as("cv"))
    // 5 * 100 = 500 >= 499 candidates per query: shortlist == corpus
    val bq = SimilarityOps.bqTopK(q, c, thr, k = 5, oversample = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = SimilarityOps.bruteForceTopK(q, c, k = 5)
      .select(col("qid"), col("cid"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bq == brute, "full-oversample BQ must equal brute force")
    // and at a realistic oversample the result is k rows per query with
    // contiguous ranks (recall may differ; the SHAPE must not)
    val tight = SimilarityOps.bqTopK(q, c, thr, k = 5, oversample = 3)
      .collect().groupBy(_.getLong(0))
    assert(tight.size == 3 &&
      tight.values.forall(_.map(_.getInt(2)).sorted.sameElements(1 to 5)))
  }

  test("sqDecode bounds per-dimension reconstruction error at half a " +
      "quantization step over the real embeddings") {
    val stats = SimilarityOps.sqStats(emb, "v")
    val recon = SimilarityOps.sqDecode(
      SimilarityOps.sqEncode(col("v"), stats), stats)
    val worstRel = emb.select(
      aggregate(
        zip_with(SimilarityOps.asDouble(col("v")), recon,
          (x, y) => abs(x - y)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("worst"))
      .agg(max(col("worst"))).head.getDouble(0)
    val maxStep = stats.map { case (mn, mx) => (mx - mn) / 510.0 }.max
    assert(worstRel <= maxStep * (1 + 1e-9) + 1e-12,
      s"reconstruction error $worstRel exceeds half-step bound $maxStep")
  }

  test("mmrRerank matches a sequential greedy reference on random " +
      "shortlists (integer-exact scores, id tiebreak)") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // 6 queries × 15 candidates of 8-dim vectors, some near-duplicates
    // so the diversity term actually bites
    val shortlists = (1 to 6).flatMap { q =>
      val seeds = Array.fill(3)(Array.fill(8)(rnd.nextDouble()))
      (1 to 15).map { i =>
        val base = seeds(i % 3)
        val vec = base.map(x => x + rnd.nextDouble() * (if (i < 6) 0.01 else 1.0))
        (q.toLong, (q * 100 + i).toLong, rnd.nextInt(1000000).toLong, vec)
      }
    }
    val df = shortlists.toDF("qid", "id", "rel", "vec")
    val k = 4
    val lam = 700000L
    val got = SimilarityOps.mmrRerank(df, "qid", "id", "rel", "vec", k, lam)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("id"), r.getAs[Long]("mmr_score")))).toMap
    // sequential reference
    def simMicro(a: Array[Double], b: Array[Double]): Long = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      math.floor(1e6 * (dot(a, b) /
        (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))).toLong
    }
    val expect = shortlists.groupBy(_._1).flatMap { case (q, cs) =>
      var remaining = cs.map(c => (c._2, c._3, c._4)).toList
      var selected = List.empty[(Long, Long, Array[Double])]
      (1 to k).map { rank =>
        val scored = remaining.map { case (id, rel, vec) =>
          val score =
            if (selected.isEmpty) lam * rel
            else lam * rel - (1000000L - lam) *
              selected.map(s => simMicro(vec, s._3)).max
          (id, rel, vec, score)
        }
        val pick = scored.minBy(c => (-c._4, c._1))
        remaining = remaining.filterNot(_._1 == pick._1)
        selected = (pick._1, pick._2, pick._3) :: selected
        (q, rank) -> ((pick._1, pick._4))
      }
    }
    assert(got == expect)
  }

  test("mmrRerank: rank 1 is pure argmax relevance; short shortlists " +
      "yield fewer than k rows rather than repeats") {
    import spark.implicits._
    val df = Seq(
      (1L, 11L, 500L, Array(1.0, 0.0)),
      (1L, 12L, 900L, Array(0.0, 1.0)),
      (2L, 21L, 700L, Array(1.0, 1.0)) // only one candidate
    ).toDF("qid", "id", "rel", "vec")
    val got = SimilarityOps.mmrRerank(df, "qid", "id", "rel", "vec", k = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1L, 1, 12L), (1L, 2, 11L), (2L, 1, 21L)))
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrRerank(df, "qid", "id", "rel", "vec", k = 0)
    }
  }
}
