package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SparkTestSession, Transform}

/** Synthetic scale/skew stress for the three headline 100 TB design
  * claims, which the sf-gated battery can't exercise directly:
  *
  *  (a) LSH candidate generation stays NEAR-LINEAR on a chained
  *      near-dup corpus (a doc is similar only to its neighbors —
  *      banding must surface ~O(L) pairs, not the O(L²) all-pairs), and
  *      a pathological hot bucket (h identical docs) yields exactly its
  *      own C(h,2) true pairs without leaking cross-family junk.
  *  (b) Connected components (alternating star) converges in
  *      ~log₂(n) rounds on a long chain — the worst-case graph for
  *      plain label propagation (which needs O(diameter)). This spec
  *      CAUGHT the previous implementation's flaw: its stale pointer
  *      jump was only logarithmic when ids were assigned along the
  *      chain, and degenerated to ~n/2 rounds on arbitrary ids.
  *  (c) The decomposed DRS regroup aggregates each chain side at its
  *      own cardinality (B + S rows) instead of shuffling the fanned
  *      B×S product, while producing identical output.
  *
  * All corpora are deterministic (no RNG), so the asserted bounds are
  * exact properties of the fixed inputs, not flaky statistics.
  */
class ScaleStressSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------- (a) LSH

  test("nearDupPairs: chained corpus yields near-linear pairs; hot bucket only its own") {
    val L = 400 // chain: doc i = 20-token window at offset i => similar only to neighbors
    val chain = (0 until L).map { i =>
      (i.toLong, (i until i + 20).map(j => s"w$j").mkString(" "))
    }
    val h = 300 // hot bucket: h byte-identical docs => one band bucket of size h
    val hot = (0 until h).map { i =>
      (10000L + i, "the exact same hot document body repeated verbatim for every row")
    }
    val docs = (chain ++ hot).toDF("doc_id", "text")

    val bands = DedupOps.minhashBands(docs, "doc_id", "text")
    val pairs = DedupOps.nearDupPairs(bands, nBands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))

    val (hotPairs, chainSide) = pairs.partition { case (a, b) => a >= 10000L && b >= 10000L }
    val crossFamily = chainSide.filter { case (a, b) => b >= 10000L || a >= 10000L }

    // hot bucket: exactly its own true pairs — quadratic IN THE BUCKET
    // because every pair is a real dup, never beyond it
    assert(hotPairs.length == h * (h - 1) / 2,
      s"hot bucket must yield exactly C($h,2) pairs, got ${hotPairs.length}")
    assert(crossFamily.isEmpty,
      s"no chain-to-hot pair shares any shingle: ${crossFamily.take(5).mkString(",")}")

    // chain: each doc overlaps only a ±bounded neighborhood at t=0.5,
    // so the pair count is c·L — the near-linear claim. The all-pairs
    // degenerate would be L²/2 = 80k.
    val chainPairs = chainSide.length
    assert(chainPairs >= L / 2, s"banding lost the chain's adjacent pairs: $chainPairs")
    assert(chainPairs <= 10 * L,
      s"chain pair count must stay near-linear (≤ ${10 * L}), got $chainPairs")
    // and every surfaced pair really is a neighborhood pair
    assert(chainSide.forall { case (a, b) => math.abs(a - b) <= 20 },
      "a verified chain pair can only span overlapping windows")
  }

  test("simhashPairs: hot fingerprint yields exactly its own pairs; " +
      "unrelated corpus contributes none") {
    // h byte-identical docs share one 64-bit fingerprint — every block
    // bucket is hot, but every surfaced pair is a TRUE dup (Hamming 0):
    // quadratic inside the clone family because the answer is
    // quadratic, never beyond it. The unrelated background (distinct
    // token vocabularies per doc) must produce zero pairs at
    // maxDist=3 — 64-bit fingerprints keep random docs ~32 bits apart,
    // and banding must not manufacture candidates that verify falsely.
    val h = 200
    val hot = (0 until h).map(i =>
      (10000L + i, "the exact same hot document body repeated verbatim"))
    val bg = (0 until 300).map { i =>
      (i.toLong, (0 until 25).map(j => s"bg${i}w$j").mkString(" "))
    }
    val pairs = DedupOps
      .simhashPairs((hot ++ bg).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == h * (h - 1) / 2,
      s"hot fingerprint must yield exactly C($h,2) pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, d) => a >= 10000L && b >= 10000L && d == 0 },
      "only Hamming-0 clone pairs may surface")
  }

  // ----------------------------------------------- (b) CC convergence

  test("connectedComponents converges in O(log diameter) rounds on a 1024-chain") {
    val n = 1024
    val nodes = (0 until n).map(i => Tuple1(s"D_$i")).toDF("id")
    val edges = (0 until n - 1).map(i => (s"D_$i", s"D_${i + 1}")).toDF("a", "b")
    val (labels, rounds) = DedupOps.connectedComponentsWithStats(
      nodes, "id", edges, "a", "b", maxIter = 25)
    val clusters = labels.select("cluster").distinct().collect().map(_.getString(0))
    assert(clusters.toSeq == Seq("D_0"), "one giant component labeled by its min id")
    // alternating star contracts the chain by ~half per round
    // regardless of id placement: log2(1024) = 10 plus small slack for
    // the final fixpoint-detection round
    assert(rounds <= 14,
      s"alternating star must converge in ~log2($n)=10 (+slack) rounds, took $rounds")
  }

  // ------------------------------------------ (c) DRS decomposed regroup

  private def skewedEndpoints(b: Int, s: Int): Map[String, DataFrame] = {
    val studies = Seq(("SD_1", "phs1", "S", "S", "S1", "v1", null: String,
      "dbGaP", "CANCER", "Kids First", "Pending", "True", "IV_1"))
      .toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
        "attribution", "data_access_authority", "domain", "program",
        "release_status", "visible", "investigator_id")
    val participants = Seq(("PT_1", "p1", "SD_1", "FM_1", "True", "True",
      "Cancer", "Female", "Not Hispanic or Latino", "White", "Homo sapiens", "True"))
      .toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
        "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
        "species", "visible")
    val biospecimens = (0 until b).map(i =>
      (s"BS_$i", "PT_1", s"SC_1", "100", "DNA", "Blood", "GRU", "phs1.c1",
        s"aliquot-$i", "sample-1", "Blood Draw", "NCIT:C1", "NCIT:C2",
        "Chest wall", "Tumor", "Primary", null: String, "UBERON:001", "1.0", "True"))
      .toDF("kf_id", "participant_id", "sequencing_center_id", "age_at_event_days",
        "analyte_type", "composition", "consent_type", "dbgap_consent_code",
        "external_aliquot_id", "external_sample_id", "method_of_smaple_procurement",
        "ncit_id_anatomical_site", "ncit_id_tissue_type", "source_text_anatomical_site",
        "source_text_tissue_type", "source_text_tumor_descriptor", "spatial_descriptor",
        "uberon_id_anatomical_site", "volume_ul", "visible")
    val bsGf = (0 until b).map(i =>
      (s"BGF_$i", s"bgf-$i", s"BS_$i", "GF_HOT", "True"))
      .toDF("kf_id", "external_id", "biospecimen_id", "genomic_file_id", "visible")
    val genomicFiles = Seq(("GF_HOT", "gf-hot", "did-hot", "Aligned Reads", "cram",
      "True", "GRCh38", "True", null: String, "True"))
      .toDF("kf_id", "external_id", "latest_did", "data_type", "file_format",
        "is_harmonized", "reference_genome", "controlled_access", "availability",
        "visible")
    val seqGf = (0 until s).map(j =>
      (s"SGF_$j", s"sgf-$j", s"SE_$j", "GF_HOT", "True"))
      .toDF("kf_id", "external_id", "sequencing_experiment_id", "genomic_file_id",
        "visible")
    val seqExps = (0 until s).map(j => (s"SE_$j", s"se-$j", "WGS", "True"))
      .toDF("kf_id", "external_id", "experiment_strategy", "visible")
    Map(
      "studies" -> studies, "participants" -> participants,
      "biospecimens" -> biospecimens, "biospecimen-genomic-files" -> bsGf,
      "genomic-files" -> genomicFiles,
      "sequencing-experiment-genomic-files" -> seqGf,
      "sequencing-experiments" -> seqExps)
  }

  test("DRS decomposed regroup shuffles B+S rows where the fanned slice is B×S") {
    val (b, s) = (300, 300)
    val result = Transform(skewedEndpoints(b, s))

    // the reference's one-wide-frame path: the hot file fans to B×S rows
    val allNames = Set("studies", "participants", "biospecimens",
      "biospecimen-genomic-files", "genomic-files",
      "sequencing-experiment-genomic-files", "sequencing-experiments")
    val fanned = result.slice(allNames)
    assert(fanned.count() == b.toLong * s,
      s"fanned slice must be the B×S product (${b.toLong * s})")

    // the decomposed inputs stay at their own cardinality — this is the
    // frame each side AGGREGATES (and therefore shuffles): 600 rows vs 90k
    val bsSide = result.slice(Set("studies", "participants", "genomic-files"))
    val seqSide = result.slice(Set("sequencing-experiment-genomic-files",
      "sequencing-experiments"))
    assert(bsSide.count() == b, s"bs-path side must be B rows, got ${bsSide.count()}")
    assert(seqSide.count() == s, s"seq-link side must be S rows, got ${seqSide.count()}")

    // and the cheap path computes the SAME result as the fanned regroup
    val viaChain = graft.documents.DrsBuilder.regroupFromChain(result)
    val viaWide = graft.documents.DrsBuilder.regroup(fanned)
    def canon(df: DataFrame) = df
      .select(col("study_id"), col("gf_id"), col("seq_id"), col("strategy"),
        col("pids"), col("bs_ids"), col("data_type"), col("file_format"),
        col("latest_did"), col("controlled_access"))
      .collect().map(_.toString).sorted
    val (a1, a2) = (canon(viaChain), canon(viaWide))
    assert(a1.length == s, s"one regrouped row per seq-exp, got ${a1.length}")
    assert(a1.sameElements(a2), "decomposed and fanned regroups must agree")
  }

  // ------------------------------------------------- (d) salted skew join

  test("saltedJoin balances a hot key over buckets tasks where the plain " +
      "shuffle join concentrates it in one") {
    import graft.relational.RelationalOps
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSp = conf.get("spark.sql.shuffle.partitions")
    // the documented use case: AQE skew-split unavailable and the dim not
    // broadcastable — force the raw sort-merge shuffle shape. Reducer
    // count must exceed `buckets` for salting to spread at all (true on
    // any real cluster; the test session's default of 4 is not).
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val nHot = 40000
      val left = spark.range(0, nHot + 4000).select(
        when(col("id") < nHot, lit("hot"))
          .otherwise(concat(lit("k"), col("id"))).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 64).select(
        when(col("id") === 0, lit("hot"))
          .otherwise(concat(lit("k"), col("id") + nHot)).as("k"),
        col("id").as("w"))

      def partSizes(df: DataFrame): Seq[Int] =
        df.select("k").rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq

      val plain = left.join(right, Seq("k"))
      val salted = RelationalOps.saltedJoin(left, right, Seq("k"), buckets = 16)
      assert(salted.count() == plain.count(), "salting must not change the multiset")

      // plain: the join output is partitioned by k, so ONE task owns every
      // hot-key row — the straggler that stalls the 1000-executor stage
      assert(partSizes(plain).max >= nHot,
        "expected the whole hot key in a single plain-join partition")

      // salted: partitioned by (k, __salt) — the hot key spreads over up
      // to `buckets` tasks. Several salt values can hash into the same
      // shuffle partition (16 values into 64 partitions), but the max
      // task must sit far below the full hot key and the spread be real.
      val ss = partSizes(salted)
      assert(ss.max <= nHot / 2,
        s"hot key not spread: max salted partition ${ss.max} of $nHot " +
          s"(sizes ${ss.filter(_ > 0).sorted.reverse.mkString(",")})")
      assert(ss.count(_ > 1000) >= 4,
        s"expected >=4 non-trivial salted partitions, got ${ss.filter(_ > 1000)}")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      conf.set("spark.sql.shuffle.partitions", prevSp)
    }
  }

  test("semanticDedup k-scaling: one cell holding a large clone family stays " +
      "cell-quadratic in candidates, family-quadratic in true pairs, and the " +
      "labeling is k-invariant down to the k=1 degenerate") {
    // corpus: a 400-clone family (identical one-hot vectors — identical
    // vectors get identical k-means assignments, so the whole family
    // ALWAYS lands in one cell, whatever k) + 300 background vectors
    // that are distinct one-hots (pairwise cosine exactly 0 — never a
    // near-dup pair, in any cell). This is the n7 shape a 100 TB run
    // could regret: shrinking k grows the family's cell, and candidate
    // pairs grow cell-quadratically — the published SemDeDup trade.
    val nFam = 400; val nBg = 300; val dim = nBg + 1
    def oneHot(j: Int): Array[Float] = {
      val a = new Array[Float](dim); a(j) = 1f; a
    }
    val rows =
      (0 until nBg).map(i => (i.toLong, oneHot(i))) ++
      (0 until nFam).map(i => ((nBg + i).toLong, oneHot(nBg)))
    val emb = rows.toDF("vec_id", "embedding")
    val famIds = (nBg until nBg + nFam).map(_.toLong).toSet

    for (k <- Seq(8, 2, 1)) {
      // candidate count is EXACTLY Σ C(cell,2) over the fit's cells —
      // the equi-join on the cluster id can't produce more (and at k=1
      // degenerates to C(700,2): the corpus-quadratic ceiling the k
      // knob exists to stay far under)
      val (_, assign) = SimilarityOps.kmeansFit(emb, "vec_id", "embedding", k, 2)
      val cellSizes = assign.groupBy("cluster").count()
        .collect().map(_.getLong(1))
      val candidates = cellSizes.map(n => n * (n - 1) / 2).sum
      val famCell = assign.where(col("vec_id").isin(famIds.toSeq: _*))
        .select("cluster").distinct().count()
      assert(famCell == 1L, s"k=$k: clone family must share one cell")
      assert(candidates >= nFam.toLong * (nFam - 1) / 2,
        s"k=$k: the family's cell alone is C($nFam,2)")
      if (k == 1)
        assert(candidates == (nFam + nBg).toLong * (nFam + nBg - 1) / 2)

      // ...but the OUTPUT stays family-quadratic and k-invariant:
      // every family member labels with the family min id, every
      // background vector stays a singleton — even at k=1, where the
      // verifier scanned all 244 650 candidates
      val out = SimilarityOps
        .semanticDedup(emb, "vec_id", "embedding", k, iters = 2, threshold = 0.5)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(out.size == nFam + nBg)
      famIds.foreach { id =>
        assert(out(id) == nBg.toLong, s"k=$k: clone $id must label with the family min")
      }
      (0 until nBg).foreach { i =>
        assert(out(i.toLong) == i.toLong, s"k=$k: background $i must stay a singleton")
      }
    }
  }
}
