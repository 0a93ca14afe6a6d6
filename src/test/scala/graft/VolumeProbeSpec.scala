package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** In-suite form of the volume probe (see SCALE_PROBE.md for the
  * recorded 10× sf0.1 bounded-heap run): replicate sf0.001 ×3 with the
  * key-offset remap and assert the scaling INVARIANTS — per-replica-
  * closed plans scale exactly ×N, the token histogram returns identical
  * ranked rows with counts ×N. These hold only if replication preserves
  * both FK consistency and the fixture's modular entity derivations,
  * and the plans themselves neither drop nor duplicate rows at volume.
  */
class VolumeProbeSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.SparkTestSession.spark
  private val srcDir = "/root/testdata/sf0.001"
  private val factor = 3

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_volspec").toString
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      VolumeProbe.multiply(spark.read.parquet(s"$srcDir/$t.parquet"), factor, offset)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("multiply: xN rows, disjoint replica key ranges, modular classes preserved") {
    val base = spark.read.parquet(s"$srcDir/orders.parquet")
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    val big = VolumeProbe.multiply(base, factor, offset)
    assert(big.count() == base.count() * factor)
    assert(big.select("o_orderkey").distinct().count() ==
      base.count() * factor, "replica keys must not collide")
    // the fixture derives outcomes from o_orderkey % 7 and ages from
    // % 6000 — replication must not move keys across those classes
    for (m <- Seq(7, 6000)) {
      val baseHist = base.groupBy(col("o_orderkey") % m).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bigHist = big.groupBy(col("o_orderkey") % m).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bigHist == baseHist.map { case (k, v) => k -> v * factor },
        s"mod-$m class sizes must scale uniformly")
    }
  }

  test("kf_full_pipeline scales exactly xN on replicated volume") {
    val fn = SparkEntry.queries("kf_full_pipeline")
    assert(fn(spark, outDir).count() == fn(spark, srcDir).count() * factor)
  }

  test("j_outer_chain scales exactly xN; x5 histogram contents scale xN") {
    val j = SparkEntry.queries("j_outer_chain")
    assert(j(spark, outDir).count() == j(spark, srcDir).count() * factor)
    val x5 = SparkEntry.queries("x5_token_freq")
    val base = x5(spark, srcDir).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val big = x5(spark, outDir).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(big == base.map { case (t, n) => (t, n * factor) },
      "identical ranked top tokens with counts xN")
  }

  test("events family scales exactly xN: as-of join and time-bound join " +
      "stay replica-local under the ts-offset rule") {
    // user ids AND decades are disjoint across replicas, so no as-of
    // lookup or 2h-bound pair can cross replicas: j14 emits one row per
    // left event (xN), tw pair counts scale xN — never quadratically in
    // the clone count
    for (name <- Seq("j14_asof_join", "tw_timebound_join")) {
      val fn = SparkEntry.queries(name)
      assert(fn(spark, outDir).count() == fn(spark, srcDir).count() * factor,
        s"$name must scale exactly x$factor")
    }
    // the shift is a whole number of days, so per-replica window
    // bucketing is identical: tumbling-window rows also scale exactly
    val tw = SparkEntry.queries("tw_tumbling_window")
    assert(tw(spark, outDir).count() == tw(spark, srcDir).count() * factor)
  }

  test("token-stream family at xN: epoch-shuffle bijection and chunk " +
      "prefix-sum contiguity survive cross-replica hash interleaving") {
    // the seeded permutation INTERLEAVES replicas (md5 of remapped ids
    // scatters them), so per-position content can't be compared to the
    // base — these are the laws that survive: pos is a bijection onto
    // 1..3N; token mass scales x3 and the concatenated stream stays
    // contiguous from offset 0; chunk ids satisfy the div arithmetic
    // row-by-row
    val x17 = SparkEntry.queries("x17_epoch_shuffle")
    val base17 = x17(spark, srcDir).count()
    val a = x17(spark, outDir).agg(count(lit(1)), min(col("pos")),
      max(col("pos")), countDistinct(col("pos"))).head
    assert(a.getLong(0) == base17 * factor, "row count must scale xN")
    assert(a.getLong(1) == 1L && a.getLong(2) == a.getLong(0) &&
      a.getLong(3) == a.getLong(0), "pos must be a bijection onto 1..N")

    val x19 = SparkEntry.queries("x19_token_chunks")
    val baseAgg = x19(spark, srcDir)
      .agg(count(lit(1)), sum(col("n_tokens"))).head
    val b = x19(spark, outDir).agg(count(lit(1)), sum(col("n_tokens")),
      min(col("tok_start")), max(col("tok_start") + col("n_tokens")),
      sum(when(expr("first_chunk != (tok_start div 512) OR " +
          "last_chunk != ((tok_start + n_tokens - 1) div 512)"), 1L)
        .otherwise(0L))).head
    assert(b.getLong(0) == baseAgg.getLong(0) * factor)
    assert(b.getLong(1) == baseAgg.getLong(1) * factor,
      "total token mass must scale xN")
    assert(b.getLong(2) == 0L && b.getLong(3) == b.getLong(1),
      "the concatenated stream must stay contiguous from offset 0")
    assert(b.getLong(4) == 0L, "chunk-id arithmetic must hold row-by-row")
  }

  test("curation is INVARIANT under replication: N byte-identical copies " +
      "curate to exactly the 1x output") {
    // replicas carry identical text under remapped ids, so the exact-
    // fingerprint stage collapses every clone set to its min-id
    // (replica-0) member — the rest of the pipeline then sees exactly
    // the original corpus. Content equality, not just count.
    val c1 = SparkEntry.queries("c1_corpus_curation")
    val base = c1(spark, srcDir).collect().map(_.toSeq).toSet
    val big = c1(spark, outDir).collect().map(_.toSeq).toSet
    assert(big == base, "curated output must be byte-identical at xN")
  }

  test("k-means fit at xN: centroids unchanged, every clone inherits " +
      "its original's cluster") {
    // identical copies leave every cell mean unchanged (seeds are the
    // k lowest ids = replica 0's originals), so the ENTIRE iterative
    // fit is invariant and assignments replicate exactly
    val n6 = SparkEntry.queries("n6_kmeans_fit")
    val base = n6(spark, srcDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val big = n6(spark, outDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(big.size == base.size * factor)
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    for (rep <- 0 until factor; (id, c) <- base)
      assert(big(id + rep * offset) == c,
        s"replica $rep of vec $id changed cluster")
  }

  test("semantic dedup at xN: every clone adopts a replica-0 representative") {
    // a clone has cosine 1.0 with its original, lands in the same
    // k-means cell (fit invariance), and therefore joins its
    // original's component — whose min id is always the replica-0
    // member. So replica-0 vectors keep their base reps verbatim and
    // the distinct-rep set does not grow at all under xN replication.
    val n7 = SparkEntry.queries("n7_semantic_dedup")
    val base = n7(spark, srcDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val big = n7(spark, outDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(big.size == base.size * factor)
    for ((id, rep) <- base)
      assert(big(id) == rep, s"replica-0 vec $id changed representative")
    assert(big.values.toSet == base.values.toSet,
      "replication must not mint new representatives")
  }

  test("timer-driven sessions at xN: rows scale exactly, replica-0 users " +
      "keep identical sessions") {
    // user ids are disjoint across replicas and replica 0 is unshifted,
    // so the batch gap-0 form (one timer-flushed session per user) adds
    // exactly one session per clone user and leaves replica-0 sessions
    // byte-identical
    val st = SparkEntry.queries("st_session_timeout")
    val base = st(spark, srcDir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val big = st(spark, outDir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(big.size == base.size * factor, "one session per user, xN users")
    for ((uid, row) <- base)
      assert(big(uid) == row, s"replica-0 user $uid session changed at xN")
  }

  test("BPE packing at xN: clones keep their original's token count, " +
      "replica-0 pack assignment unchanged") {
    // the key offset is a multiple of 8, so clones land in their
    // original's shard; clone ids are strictly larger than every
    // replica-0 id, so replica-0 prefix sums (and pack_ids) are
    // untouched; clone text is byte-identical, so n_tok is inherited
    val x9b = SparkEntry.queries("x9b_pack_bpe")
    val base = x9b(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val big = x9b(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(big.size == base.size * factor)
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    for ((id, (shard, nTok, packId)) <- base) {
      assert(big(id) == ((shard, nTok, packId)), s"replica-0 doc $id changed")
      for (rep <- 1 until factor)
        assert(big(id + rep * offset)._2 == nTok,
          s"clone of doc $id must inherit its BPE token count")
    }
  }

  test("image resize at xN: rows scale exactly (mod-3 media classes " +
      "preserved), replica-0 resized stats unchanged") {
    // m6 selects doc_id % 3 == 0 and the offset preserves mod-3
    // classes, so each replica contributes exactly the base image set;
    // replica-0 payloads are identical, so their resized channel sums
    // are byte-identical (clones differ — their synthetic pixels are
    // analytic in the remapped id — so only the count law binds them)
    val m6 = SparkEntry.queries("m6_resize")
    val base = m6(spark, srcDir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val big = m6(spark, outDir).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(big.size == base.size * factor, "xN images resized")
    for ((id, row) <- base)
      assert(big(id) == row, s"replica-0 image $id resized differently at xN")
  }

  test("LM score is INVARIANT under replication: every clone scores " +
      "byte-identically to its original (floor(Na/Nb) = floor(a/b))") {
    // replication multiplies every unigram count, bigram count, AND the
    // training total by the same factor, and the integer score is a
    // floor of count ratios — so the trained model is provably
    // unchanged and clone documents (byte-identical text) must receive
    // exactly their original's (n_bigrams, lm_score, lm_avg)
    val x25 = SparkEntry.queries("x25_lm_score")
    val base = x25(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val big = x25(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(big.size == base.size * factor)
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    for ((id, scores) <- base; rep <- 0 until factor)
      assert(big(id + rep * offset) == scores,
        s"replica $rep of doc $id scored differently under the xN model")
  }

  test("duplicate spans at xN cover every window-bearing doc end-to-end") {
    // with N >= 2 byte-identical replicas, EVERY 8-token window repeats
    // corpus-wide, so each doc with >= 8 tokens yields exactly ONE
    // whole-doc span — rows = N x (docs with >= 8 tokens), an exact
    // law, and every span must start at 0 and span all windows.
    val d8 = SparkEntry.queries("d8_dup_spans")
    val big = d8(spark, outDir).collect()
    val docsWith8 = spark.read.parquet(s"$srcDir/documents.parquet")
      .where(size(split(trim(col("text")), "\\s+")) >= 8).count()
    assert(big.length == factor * docsWith8)
    assert(big.forall(_.getLong(1) == 0L), "whole-doc spans start at 0")
  }

  test("fourth wave at xN: sessionization and SCD2 merge scale exactly; " +
      "edit-distance pairs land on the closed form") {
    // g2: user ids AND decades replica-disjoint -> sessions replica-local
    val g2 = SparkEntry.queries("g2_sessionize")
    assert(g2(spark, outDir).count() == g2(spark, srcDir).count() * factor)
    // j19: delta membership (%7) and the no-op split (%14) divide the
    // key offset, so each replica re-derives identical merge legs
    val j19 = SparkEntry.queries("j19_scd2_merge")
    assert(j19(spark, outDir).count() == j19(spark, srcDir).count() * factor)
    // d10: clone prefixes byte-identical -> EXACTLY factor^2 x base
    // cross-replica pairs plus C(factor,2) dist-0 pairs per document
    val d10 = SparkEntry.queries("d10_edit_distance_join")
    val basePairs = d10(spark, srcDir).count()
    val nDocs = spark.read.parquet(s"$srcDir/documents.parquet")
      .where(col("text").isNotNull).count()
    val expect = factor.toLong * factor * basePairs +
      factor.toLong * (factor - 1) / 2 * nDocs
    assert(d10(spark, outDir).count() == expect,
      s"closed form: $factor^2*$basePairs + C($factor,2)*$nDocs = $expect")
  }

  test("eighth wave at xN: the journey histogram returns identical ranked " +
      "paths with counts xN; streaks are replica-local") {
    // sessions and runs are replica-local (users + decades disjoint) and
    // clone users replay identical event-type sequences
    val g9 = SparkEntry.queries("g9_session_paths")
    val base9 = g9(spark, srcDir).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val big9 = g9(spark, outDir).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(big9 == base9.map { case (p, n) => (p, n * factor) },
      "identical ranked paths with counts xN")
    val g10 = SparkEntry.queries("g10_streaks")
    val base10 = g10(spark, srcDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.toSeq).toMap
    val big10 = g10(spark, outDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.toSeq).toMap
    assert(big10.size == base10.size * factor, "runs must scale exactly xN")
    for ((k, row) <- base10)
      assert(big10(k) == row, s"replica-0 streak $k changed at xN")
    // g11: the value column is untouched by replication, so every clone
    // user folds the identical cent sequence — one row per user, xN
    // rows, and every clone inherits its original's smoothed state
    val g11 = SparkEntry.queries("g11_ewma")
    val base11 = g11(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val big11 = g11(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(big11.size == base11.size * factor)
    val off = VolumeProbe.keyOffsetFor(spark, srcDir)
    for ((uid, st) <- base11; rep <- 0 until factor)
      assert(big11(uid + rep * off) == st,
        s"replica $rep of user $uid drifted from its smoothed state")
  }

  test("ninth wave at xN: interpolation, co-occurrence ranks, TWAP, and " +
      "peak concurrency are all clone-inherited") {
    val off = VolumeProbe.keyOffsetFor(spark, srcDir)
    val shift = VolumeProbe.TsShiftDays
    // g12: clone users replay identical (day, cents) sequences shifted
    // by rep·3650 days — normalize each clone day back to its replica-0
    // date and every interpolated value must match the original's
    val g12 = SparkEntry.queries("g12_interpolate")
    val base12 = g12(spark, srcDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.get(3)).toMap
    val big12 = g12(spark, outDir)
      .select(pmod(col("user_id"), lit(off)).as("bid"),
        expr(s"date_sub(day, CAST((user_id div $off) * $shift AS INT))").as("bday"),
        col("units_interp"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.get(2))
    assert(big12.length == base12.size * factor, "spine rows must scale exactly xN")
    for ((k, v) <- big12)
      assert(base12(k) == v, s"interpolated value at $k drifted at xN")
    // g13: pairs are replica-local and the additive key remap preserves
    // the (n_co desc, other asc) neighbor order — every clone pair
    // inherits its original's (n_co, rnk)
    val g13 = SparkEntry.queries("g13_cooccurrence")
    val base13hist = g13(spark, srcDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val big13 = g13(spark, outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(big13.forall(t => t._1 / off == t._2 / off),
      "co-occurrence pairs must never cross replicas")
    val big13hist = big13.map(t => (t._1 % off, t._2 % off, t._3, t._4))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(big13hist == base13hist.map { case (k, n) => k -> n * factor },
      "every clone pair must inherit its original's (n_co, rnk)")
    // g14: hold durations are shift-invariant, cents untouched — one
    // row per user, twap inherited verbatim
    val g14 = SparkEntry.queries("g14_twap")
    val base14 = g14(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val big14 = g14(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(big14.size == base14.size * factor)
    for ((uid, st) <- base14; rep <- 0 until factor)
      assert(big14(uid + rep * off) == st,
        s"replica $rep of user $uid drifted from its TWAP")
    // g15: lineitem dates are NOT ts-shifted, so clone suppliers sweep
    // the identical interval multiset — peak AND peak_at inherited
    val g15 = SparkEntry.queries("g15_peak_concurrency")
    val base15 = g15(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDate(2).toString))).toMap
    val big15 = g15(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDate(2).toString))).toMap
    assert(big15.size == base15.size * factor)
    for ((sk, st) <- base15; rep <- 0 until factor)
      assert(big15(sk + rep * off) == st,
        s"replica $rep of supplier $sk drifted from its peak")
  }

  test("seventh wave at xN: retention curve scales exactly; transition " +
      "ppm is invariant; BM25 clones inherit their original's score") {
    // g7: cohort labels shift across replicas (3650 days is not a whole
    // number of weeks) but week_k is a pure difference, so the CURVE
    // (Σ n_active per week_k) scales exactly ×N
    val g7 = SparkEntry.queries("g7_retention")
    def curve(dir: String) = g7(spark, dir).groupBy("week_k")
      .agg(sum(col("n_active")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(curve(outDir) == curve(srcDir).map { case (k, n) => k -> n * factor })
    // g8: the matrix is |states|²-bounded — identical (from, to) rows
    // with n ×N and p_ppm byte-identical (floor(Nn·10⁶ div NT) = floor)
    val g8 = SparkEntry.queries("g8_transitions")
    def matrix(dir: String) = g8(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    val baseM = matrix(srcDir)
    assert(matrix(outDir) == baseM.map { case (k, (n, ppm)) => k -> ((n * factor, ppm)) })
    // x30: scoring fractions inflate uniformly, so every clone doc's
    // score equals its original's against the clone query set; rows =
    // queries × k scale exactly ×N
    val x30 = SparkEntry.queries("x30_bm25_retrieval")
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    val baseDocs = spark.read.parquet(s"$srcDir/documents.parquet")
    val baseFull = graft.ops.RetrievalOps.bm25TopK(
        baseDocs.where(pmod(col("doc_id"), lit(97)) =!= 0),
        baseDocs.where(pmod(col("doc_id"), lit(97)) === 0)
          .select(col("doc_id").as("qid"), col("text")),
        "doc_id", "text", "qid", "text", k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val big = x30(spark, outDir).collect()
    assert(big.length == x30(spark, srcDir).count() * factor,
      "queries x k rows must scale exactly xN")
    for (r <- big) {
      val key = (r.getLong(0) % offset, r.getLong(2) % offset)
      assert(baseFull(key) == ((r.getLong(3), r.getLong(4))),
        s"clone pair $key drifted from its original's BM25 score at xN")
    }
  }

  test("sixth wave at xN: funnel depths are replica-invariant per clone " +
      "user; triangle counts inflate to N disjoint isomorphic graphs") {
    // g6: one row per user; users AND decades are replica-disjoint, so
    // each clone user replays its original's event sequence shifted by
    // whole decades — depth (and replica-0's full row) must be inherited
    val g6 = SparkEntry.queries("g6_funnel")
    val base6 = g6(spark, srcDir).collect()
      .map(r => r.getLong(0) -> ((r.toSeq, r.getInt(4)))).toMap
    val big6 = g6(spark, outDir).collect()
      .map(r => r.getLong(0) -> ((r.toSeq, r.getInt(4)))).toMap
    assert(big6.size == base6.size * factor, "one funnel row per user, xN users")
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    for ((uid, (row, depth)) <- base6) {
      assert(big6(uid)._1 == row, s"replica-0 user $uid funnel changed at xN")
      for (rep <- 1 until factor)
        assert(big6(uid + rep * offset)._2 == depth,
          s"clone of user $uid must inherit funnel depth $depth")
    }
    // g5 (the UNLIMITED operator — the battery row's top-100 truncates):
    // l_orderkey and l_partkey shift together and o_orderdate is a
    // non-key attribute, so the 1995 co-purchase graph inflates to N
    // disjoint isomorphic copies — node rows and triangle incidences
    // scale exactly xN and every clone node inherits its base count
    import graft.queries.Battery.coPurchaseEdges1995
    val baseTri = graft.ops.GraphOps
      .triangleCounts(coPurchaseEdges1995(spark, srcDir), "l_partkey", "l_partkey2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigTri = graft.ops.GraphOps
      .triangleCounts(coPurchaseEdges1995(spark, outDir), "l_partkey", "l_partkey2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bigTri.size == baseTri.size * factor)
    assert(bigTri.values.sum == baseTri.values.sum * factor,
      "total triangle incidences must scale exactly xN")
    for ((node, tri) <- bigTri)
      assert(baseTri(node % offset) == tri,
        s"clone node $node drifted from its base triangle count")
  }

  test("fifth wave at xN: LOCF fill scales exactly; MAD stats are " +
      "replication-INVARIANT; PageRank clones inherit their base score") {
    // g3: per-user spans are base spans shifted by whole days
    val g3 = SparkEntry.queries("g3_locf_fill")
    assert(g3(spark, outDir).count() == g3(spark, srcDir).count() * factor)
    // a16: the group key is SHARED across replicas — each group sees
    // the same value multiset xN, so median, MAD, and every clone's
    // flag must be IDENTICAL to the base row's
    val a16 = SparkEntry.queries("a16_mad_outliers")
    val base16 = a16(spark, srcDir).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_outlier")))).toMap
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    val big16 = a16(spark, outDir).collect()
    assert(big16.length == base16.size * factor)
    big16.foreach { r =>
      val baseKey = r.getAs[Long]("o_orderkey") % offset
      assert(base16(baseKey) == ((r.getAs[Double]("med"),
        r.getAs[Double]("mad"), r.getAs[Boolean]("is_outlier"))),
        s"clone of order $baseKey drifted from its base stats")
    }
    // g4: each replica's subgraph is the base graph under an id remap,
    // so every clone node's integer PR equals its base node's exactly
    import org.apache.spark.sql.functions._
    def edges(dir: String) = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    val basePr = graft.ops.GraphOps.pagerankMicro(edges(srcDir), "src", "dst", 2)
      .select(col("node").as("bnode"), col("pr").as("bpr"))
    val bigPr = graft.ops.GraphOps.pagerankMicro(
      spark.read.parquet(s"$outDir/lineitem.parquet")
        .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst")),
      "src", "dst", 2)
    // node = key*2 (+1 for parts); base key = key mod offset
    // `/` on longs is double division in Spark — keep the id arithmetic
    // integral with `div`
    val mapped = bigPr.withColumn("bnode",
      when(col("node") % 2 === 0, pmod(expr("node div 2"), lit(offset)) * 2)
        .otherwise(pmod(expr("(node - 1) div 2"), lit(offset)) * 2 + 1)
        .cast("long"))
    val drift = mapped.join(basePr, "bnode")
      .where(col("pr") =!= col("bpr")).count()
    assert(drift == 0L, s"$drift clone nodes drifted from their base PageRank")
    assert(bigPr.count() == basePr.count() * factor)
  }

  test("round-12 waves at xN: CDC snapshot and attribution replica-0 rows " +
      "are byte-identical; interval unions and BFS distances inherit " +
      "per clone; AUC is replication-invariant") {
    import org.apache.spark.sql.functions._
    val offset = VolumeProbe.keyOffsetFor(spark, srcDir)
    // j20: replica-0 rows (|key| < offset) == the base run verbatim
    val j20 = SparkEntry.queries("j20_cdc_apply")
    val j20base = j20(spark, srcDir).collect().map(_.toSeq).toSet
    val j20big = j20(spark, outDir)
      .where(abs(col("o_orderkey")) < offset).collect().map(_.toSeq).toSet
    assert(j20big == j20base, "CDC replica-0 snapshot drifted")
    assert(j20(spark, outDir).count() == j20base.size.toLong * factor)
    // g18: replica-0 purchases attribute identically
    val g18 = SparkEntry.queries("g18_attribution")
    val g18base = g18(spark, srcDir)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val g18big = g18(spark, outDir).where(col("user_id") < offset)
      .select("event_id", "channel").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(g18big == g18base, "replica-0 attribution drifted")
    // g16: every clone supplier inherits (n_spans, covered, hull) —
    // lineitem dates are not shifted, so the interval multiset is
    // identical per clone
    val g16 = SparkEntry.queries("g16_interval_union")
    val g16base = g16(spark, srcDir).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val g16bigRows = g16(spark, outDir).collect()
    assert(g16bigRows.length == g16base.size * factor)
    g16bigRows.foreach { r =>
      assert(g16base(r.getLong(0) % offset) == r.toSeq.tail,
        s"clone supplier ${r.getLong(0)} drifted")
    }
    // g17: every clone node inherits its base hop distance (replicas
    // are disjoint isomorphic components with the same %500 sources)
    val g17 = SparkEntry.queries("g17_bfs_hops")
    val g17base = g17(spark, srcDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val g17big = g17(spark, outDir).collect()
    assert(g17big.length == g17base.size * factor)
    g17big.foreach { r =>
      val node = r.getLong(0)
      val bnode = if (node % 2 == 0) (node / 2) % offset * 2
                  else ((node - 1) / 2) % offset * 2 + 1
      assert(g17base(bnode) == r.getInt(1),
        s"clone node $node drifted from base dist")
    }
    // a19: the Mann-Whitney ratio is provably replication-invariant
    val a19 = SparkEntry.queries("a19_auc")
    def aucMap(d: String) = a19(spark, d).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(aucMap(outDir) == aucMap(srcDir), "AUC drifted under replication")
  }

  test("incremental BM25 index at xN equals the one-shot rebuild at " +
      "the same volume (index maintenance is volume-indistinguishable)") {
    // x36 shares x30's math; at xN the claim under test is the STATE
    // machinery — two xN-sized shards land postings/df/globals parquet
    // and the search union-reads + re-aggregates them — against the
    // from-scratch x30 rebuild over the identical corpus
    val x30 = SparkEntry.queries("x30_bm25_retrieval")
    val x36 = SparkEntry.queries("x36_incremental_bm25")
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*)
        .collect().map(_.mkString("|")).toSeq.sorted
    }
    assert(sorted(x36(spark, outDir)) == sorted(x30(spark, outDir)))
  }
}
