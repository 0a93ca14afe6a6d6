package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("contaminationHits: brute-force parity, zero-hit docs retained, no cartesian") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma zeta"), // shares 'alpha beta gamma'
      (2L, "beta gamma delta eta theta"), // shares 'beta gamma delta'
      (3L, "iota kappa lambda"), // clean
      (4L, "xy")) // < n tokens: no shingles, must still appear
      .toDF("doc_id", "text")
    val out = CorpusOps.contaminationHits(corpus, bench, "doc_id", "text", n = 3)
    val byId = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId == Map(
      1L -> ((1L, true)), 2L -> ((1L, true)),
      3L -> ((0L, false)), 4L -> ((0L, false))))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"contamination join must be an equi-join:\n$p")
  }

  test("packSequences: greedy fill respects budget boundaries per shard") {
    // one shard (shards=1) with known token counts: 3,4,4,2,5
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g"), (2L, "h i j k"),
      (3L, "l m"), (4L, "n o p q r"))
      .toDF("doc_id", "text")
    val out = CorpusOps.packSequences(docs, "doc_id", "text", budget = 8, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // before: 0,3,7,11,13 → pack = before div 8 = 0,0,0,1,1
    assert(out.toSeq == Seq((0L, 3L, 0L), (1L, 4L, 0L), (2L, 4L, 0L),
      (3L, 2L, 1L), (4L, 5L, 1L)))
    // an over-budget doc occupies its own pack and shifts the next one
    val big = Seq((0L, ("w " * 20).trim), (1L, "x y")).toDF("doc_id", "text")
    val out2 = CorpusOps.packSequences(big, "doc_id", "text", budget = 8, shards = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out2.toSeq == Seq((0L, 0L), (1L, 2L))) // before=20 → pack 2
  }

  test("packSequences: shards pack independently (no global sort)") {
    val docs = (0L until 20L).map(i => (i, "t " * (i % 5 + 1).toInt)).toDF("doc_id", "text")
    val out = CorpusOps.packSequences(docs, "doc_id", "text", budget = 6, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall { case (id, shard, _, _) => shard == id % 4 })
    // within each shard, pack_id must be non-decreasing in id order and
    // equal the prefix-sum definition
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var before = 0L
      sorted.foreach { case (id, _, nTok, packId) =>
        assert(packId == before / 6, s"doc $id: pack $packId, before $before")
        before += nTok
      }
    }
  }

  test("heavyHitters: exact top-k on a skewed stream, CMS bound honored") {
    // 'hot' appears sum(i%5+1) = 600 times; every other token once.
    // Ties rank lexicographically, so the result is fully pinned. The
    // CMS gate runs inside heavyHitters (require throws on violation)
    // with a tight-ish eps so the sketch actually has collisions to
    // absorb at this vocab size.
    val docs = (0 until 200).map(i =>
      (i.toLong, ("hot " * (i % 5 + 1)) + s"w$i unique$i"))
      .toDF("doc_id", "text")
    val got = CorpusOps.heavyHitters(docs, "text", k = 5, eps = 0.05, seed = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("hot" -> 600L, "unique0" -> 1L, "unique1" -> 1L,
      "unique10" -> 1L, "unique100" -> 1L))
  }

  test("rareTokenStats: hand-checked df rollup; min_df=1 flags unique-token docs") {
    // df: a→{1,2}=2, b→{1,3}=2, c→{2}=1 (token multiplicity inside a
    // doc must not inflate df, but DOES count in n_tokens/sum_df)
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    val got = CorpusOps.rareTokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      1L -> ((3L, 6L, 2L)),
      2L -> ((2L, 3L, 1L)),
      3L -> ((3L, 6L, 2L))))
  }

  test("stratifiedSample: per-stratum rates, key-consistency, 0/1 edge fractions") {
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    val df = rows.toDF("doc_id", "lang")
    val got = CorpusOps.stratifiedSample(df, "lang", "doc_id",
        Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.25)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    // fraction 1.0 keeps the WHOLE stratum (the "10000" threshold bug
    // kept ~1/16); 0.0 keeps none; the default lands near its rate
    assert(byLang.getOrElse("en", 0) == rows.count(_._2 == "en"))
    assert(byLang.getOrElse("de", 0) == 0)
    val frTotal = rows.count(_._2 == "fr")
    val frKept = byLang.getOrElse("fr", 0)
    assert(math.abs(frKept.toDouble / frTotal - 0.25) < 0.08,
      s"fr kept $frKept of $frTotal")
    // key-consistency: a stratum sampled at f keeps EXACTLY the keys
    // plain hashSample at f keeps — mixture tuning can't reshuffle
    // which documents survive
    val frDirect = graft.relational.RelationalOps
      .hashSample(df.where($"lang" === "fr"), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_._2 == "fr").map(_._1).toSet == frDirect)
  }

  test("domainCap: two-phase salted cap equals single-window rank on a hot domain") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one domain holds 90% of the rows (the skew case the two-phase
    // shape exists for), two small domains, one domain under the cap
    val rows = (1L to 2000L).map(i => (i,
      if (i <= 1800) "hot.example" else if (i <= 1900) "a.example"
      else if (i <= 1995) "b.example" else "tiny.example"))
    val df = rows.toDF("doc_id", "domain").repartition(7)
    val got = CorpusOps.domainCap(df, "domain", "doc_id", k = 10, salts = 8)
      .select("doc_id", "domain").as[(Long, String)].collect().toSet
    // naive single-window reference: k smallest (md5(id), id) per domain
    val w = Window.partitionBy($"domain").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val want = df.withColumn("r", row_number().over(w)).where($"r" <= 10)
      .select("doc_id", "domain").as[(Long, String)].collect().toSet
    assert(got == want)
    val byDomain = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byDomain == Map("hot.example" -> 10, "a.example" -> 10,
      "b.example" -> 10, "tiny.example" -> 5)) // under-cap domain kept whole
    // determinism across partitionings — the selection is a function of
    // the data, not of the physical layout
    val again = CorpusOps.domainCap(df.repartition(31), "domain", "doc_id",
      k = 10, salts = 8).select("doc_id", "domain").as[(Long, String)].collect().toSet
    assert(again == got)
    // no helper columns leak into the result schema
    assert(CorpusOps.domainCap(df, "domain", "doc_id", k = 10).columns.toSeq ==
      Seq("doc_id", "domain"))
  }

  test("domainCap: phase-1 survivors are bounded by salts*k per domain") {
    import org.apache.spark.sql.functions._
    // The scale claim: after the (domain, salt) rank, a domain
    // contributes at most salts*k rows to the phase-2 sort no matter
    // how large it is. Reproduce phase 1 exactly and measure.
    val df = (1L to 5000L).map(i => (i, "hot")).toDF("doc_id", "domain")
    val salts = 4
    val k = 3
    import org.apache.spark.sql.expressions.Window
    val salted = df
      .withColumn("h", md5($"doc_id".cast("string")))
      .withColumn("s", pmod(xxhash64($"doc_id"), lit(salts.toLong)))
    val w1 = Window.partitionBy($"domain", $"s").orderBy($"h", $"doc_id")
    val phase1 = salted.withColumn("r", row_number().over(w1)).where($"r" <= k)
    val n = phase1.count()
    assert(n <= salts.toLong * k, s"phase-1 frame $n exceeds salts*k=${salts * k}")
    // and the final cap still returns exactly k
    assert(CorpusOps.domainCap(df, "domain", "doc_id", k, salts).count() == k)
  }

  test("redactPii: typed placeholders, fixed order, no false hits") {
    val rows = Seq(
      "mail me at jane.doe@site.org today",
      "call 555-0199 or visit 10.1.2.3 now",
      "plain text with no pii at all",
      "edge: a@b.c and 555-12345 and 999.999.999.999")
      .toDF("text")
    val got = rows.select(CorpusOps.redactPii(org.apache.spark.sql.functions.col("text")))
      .as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> or visit <IP> now")
    assert(got(2) == "plain text with no pii at all")
    // 555-12345: the pattern takes its 4 digits, the 5th survives;
    // 999.999.999.999 is shape-valid for the RE2-safe pattern (no
    // range check — documented simplification)
    assert(got(3) == "edge: <EMAIL> and <PHONE>5 and <IP>")
  }

  test("topDistinctTerm: integer tf/df argmax, lexicographic tie-break") {
    // df: apple=1, banana=2, cherry=1, the=3, alpha=1, zeta=1
    val docs = Seq(
      (1L, "apple apple banana the"), // apple: 2e6/1, beats banana 5e5, the 333333
      (2L, "banana cherry the the"),  // cherry: 1e6/1 beats the 666666
      (3L, "the the the the"),        // the: 4e6//3 = 1333333
      (4L, "zeta alpha"))             // both score 1e6 → tie → alpha
      .toDF("doc_id", "text")
    val got = CorpusOps.topDistinctTerm(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(
      1L -> (("apple", 2L, 1L, 2000000L)),
      2L -> (("cherry", 1L, 1L, 1000000L)),
      3L -> (("the", 4L, 3L, 1333333L)),
      4L -> (("alpha", 1L, 1L, 1000000L))))
  }

  test("curate: each stage drops exactly its targets; packing rides along") {
    // 1: english survivor; 2: exact dup of 1 up to whitespace
    // normalization (fingerprint collapses it, min id 1 kept);
    // 3: near-dup of 1 (9 of 11 distinct 3-grams shared = 0.82 ≥ 0.5,
    // clustered under rep 1); 4: french (language gate); 5: distinct
    // english survivor.
    val docs = Seq(
      1L -> "the cat sat on the mat and the dog is here today",
      2L -> "the  cat sat on the mat  and the dog is here today",
      3L -> "the cat sat on the mat and the dog is here tonight",
      4L -> "le chat de la maison est sur le tapis et le chien",
      5L -> "this is a story of a fox and a hound in the woods that run")
      .toDF("doc_id", "text")
    val out = CorpusOps.curate(docs, "doc_id", "text", minQualityE6 = 0L)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(rows.keySet == Set(1L, 5L))
    // survivors pack alone in their shards: pack 0, n_tok = token count
    val (sh1, nt1, pk1, lang1) = rows(1L)
    val (sh5, nt5, pk5, lang5) = rows(5L)
    assert((sh1, nt1, pk1, lang1) == ((1L, 12L, 0L, "en")))
    assert((sh5, nt5, pk5, lang5) == ((5L, 15L, 0L, "en")))
    // the quality gate is live: an unreachable threshold empties the set
    assert(CorpusOps.curate(docs, "doc_id", "text",
      minQualityE6 = 2000000L).isEmpty)
  }

  test("epochShuffle: a seeded bijection onto 1..n, stable across partition " +
      "counts, different seeds produce different orders") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val out = CorpusOps.epochShuffle(docs, "doc_id", seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n, "one position per document")
    assert(out.values.toSeq.sorted == (1L to n).toSeq, "positions are exactly 1..n")
    // partition count must not change the permutation (the global
    // numbering is a property of the ORDER KEY, not the physical split)
    val again = CorpusOps.epochShuffle(docs, "doc_id", seed = 42L, partitions = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out, "permutation must be partitioning-invariant")
    val other = CorpusOps.epochShuffle(docs, "doc_id", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != out, "different seed, different permutation")
  }

  test("temperatureMixture: smaller domains sampled at higher rates, target " +
      "fraction approximated, capped domains kept whole") {
    import spark.implicits._
    // skewed fixture: a dominant domain, a mid one, and a tiny one
    val docs = ((0 until 900).map(i => (i.toLong, s"t $i", "big")) ++
      (900 until 996).map(i => (i.toLong, s"t $i", "mid")) ++
      (996 until 1000).map(i => (i.toLong, s"t $i", "tiny")))
      .toDF("doc_id", "text", "source")
    val kept = CorpusOps.temperatureMixture(docs, "source", "doc_id", 0.3)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Map("big" -> 900.0, "mid" -> 96.0, "tiny" -> 4.0)
    val c = 0.3 * 1000 / (math.sqrt(900.0) + math.sqrt(96.0) + math.sqrt(4.0))
    val rate = n.map { case (d, nd) => d -> math.min(1.0, c / math.sqrt(nd)) }
    // α=0.5 inverts the skew: the tiny domain's rate caps at 1 (kept
    // whole), the dominant one is sampled hardest
    assert(rate("tiny") == 1.0 && kept("tiny") == 4L, "capped domain kept whole")
    assert(rate("big") < rate("mid") && rate("mid") < 1.0)
    // hash selection tracks the analytic rate within binomial noise
    n.foreach { case (d, nd) =>
      val got = kept.getOrElse(d, 0L).toDouble
      val expect = rate(d) * nd
      assert(math.abs(got - expect) <= math.max(4.0, 3 * math.sqrt(expect)),
        s"$d: kept $got, analytic ${expect.round}")
    }
    // deterministic: same rows every run
    val again = CorpusOps.temperatureMixture(docs, "source", "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val first = CorpusOps.temperatureMixture(docs, "source", "doc_id", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == first)
  }

  test("chunkAssignments: contiguous token stream in shuffle order, " +
      "partitioning-invariant, chunk spans consistent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = CorpusOps.chunkAssignments(docs, "doc_id", "text",
        seed = 42L, chunkTokens = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == docs.count())
    // offsets tile the token stream exactly: sorted by tok_start, each
    // doc starts where the previous ended
    val byStart = out.sortBy(_._3)
    byStart.sliding(2).foreach {
      case Array((_, n1, s1, _, _), (_, _, s2, _, _)) =>
        assert(s1 + n1 == s2, "token stream must be contiguous")
      case _ => ()
    }
    assert(byStart.head._3 == 0L)
    // chunk spans match the offsets
    out.foreach { case (id, n, s, first, last) =>
      assert(first == s / 64 && last == (s + n - 1) / 64, s"doc $id span")
    }
    // the same permutation as epochShuffle: tok_start order == pos order
    val pos = CorpusOps.epochShuffle(docs, "doc_id", seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStart.map(_._1).toSeq == pos.toSeq.sortBy(_._2).map(_._1).toSeq,
      "chunk order must be the epoch-shuffle order")
    // physical partitioning must not change the assignment
    val again = CorpusOps.chunkAssignments(docs, "doc_id", "text",
        seed = 42L, chunkTokens = 64, partitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq,
      "prefix sum must be partitioning-invariant")
    // more partitions than rows: empty partitions contribute zero to
    // the cumulative starts and the numbering stays a perfect tiling
    val tiny = docs.limit(10)
    val sparse = CorpusOps.chunkAssignments(tiny, "doc_id", "text",
        seed = 42L, chunkTokens = 64, partitions = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    sparse.sliding(2).foreach {
      case Array((n1, s1), (_, s2)) => assert(s1 + n1 == s2)
      case _ => ()
    }
    assert(sparse.head._2 == 0L)
    val sparsePos = CorpusOps.epochShuffle(tiny, "doc_id", seed = 42L, partitions = 64)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sparsePos == (1L to 10L).toSeq,
      "zipWithIndex numbering must survive empty partitions")
  }

  test("lengthBucketBatches: bucket routing by bounds, batches full except " +
      "the last per bucket, co-batched lengths adjacent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = CorpusOps.lengthBucketBatches(docs, "doc_id", "text",
        bounds = Seq(20, 40, 80), batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length == docs.count())
    out.foreach { case (_, nTok, bucket, _) =>
      val expect = if (nTok >= 80) 3 else if (nTok >= 40) 2 else if (nTok >= 20) 1 else 0
      assert(bucket == expect, s"n_tokens $nTok routed to bucket $bucket")
    }
    out.groupBy(t => (t._3, t._4)).foreach { case ((bucket, batchIdx), rows) =>
      val maxIdx = out.filter(_._3 == bucket).map(_._4).max
      if (batchIdx < maxIdx)
        assert(rows.length == 16, s"bucket $bucket batch $batchIdx not full: ${rows.length}")
      else assert(rows.length <= 16)
    }
    // within a bucket, batch index is monotone in token count: a batch
    // never contains a longer doc than a later batch's shortest
    out.groupBy(_._3).foreach { case (bucket, rows) =>
      val byBatch = rows.groupBy(_._4).toSeq.sortBy(_._1)
        .map { case (i, rs) => (i, rs.map(_._2).min, rs.map(_._2).max) }
      byBatch.sliding(2).foreach {
        case Seq((_, _, maxPrev), (_, minNext, _)) =>
          assert(maxPrev <= minNext, s"bucket $bucket batches out of length order")
        case _ => ()
      }
    }
  }

  test("contaminationHitsBloom: identical to the exact form (no false " +
      "negatives survive the sketch), empty benchmark short-circuits") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.where("doc_id % 7 != 0")
    val bench = docs.where("doc_id % 7 = 0")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getBoolean(2))
    val exact = CorpusOps.contaminationHits(corpus, bench, "doc_id", "text", 3)
      .collect().map(key).toSet
    val bloom = CorpusOps.contaminationHitsBloom(corpus, bench, "doc_id", "text", 3)
      .collect().map(key).toSet
    assert(bloom == exact, "bloom pre-filter must not change the exact result")
    assert(exact.exists(_._3), "fixture sanity: some contamination exists")
    // a tight fpp changes nothing either (only the verify-join row count)
    val tight = CorpusOps
      .contaminationHitsBloom(corpus, bench, "doc_id", "text", 3, fpp = 0.5)
      .collect().map(key).toSet
    assert(tight == exact, "fpp is a cost knob, never a correctness knob")
    // empty benchmark: every corpus doc comes back clean, no bloom built
    val none = CorpusOps.contaminationHitsBloom(
        corpus, bench.where("doc_id < 0"), "doc_id", "text", 3)
      .collect().map(key)
    assert(none.length == corpus.select("doc_id").distinct().count())
    assert(none.forall(t => t._2 == 0L && !t._3))
  }

  test("lengthBucketBatchesScalable: row-for-row equal to the single-window " +
      "form at every partitioning (the 100 TB production knob)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
    val simple = CorpusOps.lengthBucketBatches(docs, "doc_id", "text",
        bounds = Seq(20, 40, 80), batchSize = 16)
      .collect().map(key).toSet
    // partition counts below, at, and above the bucket count — including
    // one that guarantees several partitions per bucket AND partitions
    // spanning bucket boundaries
    for (parts <- Seq(1, 3, 7, 16)) {
      val scalable = CorpusOps.lengthBucketBatchesScalable(docs, "doc_id",
          "text", bounds = Seq(20, 40, 80), batchSize = 16, partitions = parts)
        .collect().map(key).toSet
      assert(scalable == simple, s"scalable form diverged at partitions=$parts")
    }
  }

  test("lmBackoffScore: hand-derived conditional and backoff scores; " +
      "short and out-of-vocabulary docs handled") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b a b", "en"), // train: bigrams ab ab ba
      (2L, "a c", "en"), // train: bigram ac
      (3L, "a b x", "fr"), // scored only: ab seen, bx backs off to unseen x
      (4L, "z", "en")) // train unigram only; no bigrams to score
      .toDF("doc_id", "text", "lang")
    val out = CorpusOps.lmBackoffScore(docs, "doc_id", "text",
        trainFilter = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // train: uni a=3 b=2 c=1 z=1, N=7; big ab=2 ba=1 ac=1
    // cond: ab=2e6 div 3=666666, ba=1e6 div 2=500000, ac=1e6 div 3=333333
    assert(out(1L) == ((3L, 666666L + 500000L + 666666L, 1833332L / 3)))
    assert(out(2L) == ((1L, 333333L, 333333L)))
    // doc 3: ab=666666 (seen), bx unseen and x not in train vocab -> 0
    assert(out(3L) == ((2L, 666666L, 333333L)))
    assert(out(4L) == ((0L, 0L, 0L)))
    // plan shape: equi-joins only, nothing corpus-quadratic
    val p = CorpusOps.lmBackoffScore(docs, "doc_id", "text",
      trainFilter = col("lang") === "en").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in LM scoring:\n$p")
  }

  test("lmBackoffScore: backoff fires for unseen bigrams of seen words") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "p q", "en"), (2L, "q p", "fr"))
      .toDF("doc_id", "text", "lang")
    // train = doc 1 only: uni p=1 q=1 N=2; big pq=1
    // doc 2's bigram qp is unseen -> backoff on w2=p: 400000*1 div 2 = 200000
    val out = CorpusOps.lmBackoffScore(docs, "doc_id", "text",
        trainFilter = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1000000L) // pq: 1e6 div 1
    assert(out(2L) == 200000L)
  }

  test("hashedImportanceScore: matches a pure-Scala BigInt replay of the " +
      "formula; target-heavy docs outscore raw-typical docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "wiki wiki science wiki", "en"),
      (2L, "spam spam spam casino", "fr"),
      (3L, "science wiki spam", "en"),
      (4L, "casino casino", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusOps.hashedImportanceScore(docs, "doc_id", "text",
        targetFilter = col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    // independent replay: md5-prefix buckets, add-one ratios, BigInt
    def bucket(tok: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      d.take(1).map(b => f"$b%02x").mkString
    }
    val rows = Seq(
      (1L, "wiki wiki science wiki", true), (2L, "spam spam spam casino", false),
      (3L, "science wiki spam", true), (4L, "casino casino", false))
    val rawToks = rows.flatMap { case (id, t, _) =>
      t.trim.split("\\s+").toSeq.map(id -> _) }
    val tgtToks = rows.filter(_._3).flatMap(_._2.trim.split("\\s+").toSeq)
    val cr = rawToks.groupBy(p => bucket(p._2)).view.mapValues(_.size.toLong).toMap
    val ct = tgtToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (rawToks.size.toLong, tgtToks.size.toLong)
    def ratio(b: String): Long =
      (BigInt(1000000) * (ct.getOrElse(b, 0L) + 1) * (nr + 256) /
        (BigInt(cr(b) + 1) * (nt + 256))).toLong
    val expect = rows.map { case (id, t, _) =>
      val toks = t.trim.split("\\s+").toSeq
      (id, toks.size.toLong, toks.map(tok => ratio(bucket(tok))).sum)
    }
    assert(out.toSeq == expect)
    // the target-looking doc must outscore the raw-typical one per token
    val scoreOf = out.map(r => r._1 -> r._3.toDouble / r._2).toMap
    assert(scoreOf(1L) > scoreOf(2L), s"importance ordering inverted: $scoreOf")
    // weight table joins broadcast; nothing corpus-quadratic
    val p = CorpusOps.hashedImportanceScore(docs, "doc_id", "text",
      targetFilter = col("lang") === "en").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in DSIR scoring:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"weight join should broadcast:\n$p")
  }

  test("slidingChunks: geometry (starts, lengths, counts), full coverage " +
      "with exact overlap, content md5s, short docs, zero exchanges") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 toks: 3 chunks
      (2L, (0 until 11).map(i => s"u$i").mkString(" ")), // 11 toks: 4 chunks
      (3L, "a b"), // shorter than the window: one short chunk
      (4L, "solo"))
      .toDF("doc_id", "text")
    val outDf = CorpusOps.slidingChunks(docs, "doc_id", "text",
      window = 4, stride = 3)
    val out = outDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 4L)))
    assert(byDoc(2L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 2L)))
    assert(byDoc(3L).map(t => (t._3, t._4)).toSeq == Seq((0L, 2L)))
    assert(byDoc(4L).map(t => (t._3, t._4)).toSeq == Seq((0L, 1L)))
    // content: the md5 is over the exact token slice
    assert(byDoc(1L)(1)._5 == md5("t3 t4 t5 t6"))
    assert(byDoc(2L)(3)._5 == md5("u9 u10"))
    assert(byDoc(4L).head._5 == md5("solo"))
    // every token position of doc 2 is covered by some chunk
    val covered = byDoc(2L).flatMap(t => t._3 until (t._3 + t._4)).toSet
    assert(covered == (0L until 11L).toSet)
    val p = outDf.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must be narrow:\n$p")
  }

  test("leakageFreeSplits: near-dup components land whole in one split; " +
      "singletons spread; ZERO pairs straddle splits on real data") {
    import org.apache.spark.sql.functions.col
    // family A: three mutual near-dups; family B: two; plus singletons
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta"),
      (10L, "one two three four five"),
      (11L, "one two three four six"),
      (20L, "totally different content here now"),
      (21L, "unrelated words in this document"))
      .toDF("doc_id", "text")
    val out = CorpusOps.leakageFreeSplits(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.4, testFrac = 0.3, valFrac = 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size == 7)
    // families share a cluster AND a split
    assert(Set(1L, 2L, 3L).map(out(_)).size == 1, s"family A split: $out")
    assert(Set(10L, 11L).map(out(_)).size == 1, s"family B split: $out")
    assert(out.values.map(_._2).forall(Set("train", "val", "test")))

    // the real-data law: no near-dup pair may straddle splits
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val splits = CorpusOps.leakageFreeSplits(real, "doc_id", "text",
      shingleN = 3, threshold = 0.5, testFrac = 0.1, valFrac = 0.1)
    val pairs = DedupOps.ngramJaccardPairs(real, "doc_id", "text", 3, 0.5)
    val straddling = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0L, s"$straddling near-dup pairs straddle splits")
    // and all three splits are actually populated at sf0.001
    val bySplit = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits: $bySplit")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("leakageFreeSplits(minhash): leakage-free against its OWN pair graph, " +
      "and identical to the ppjoin splits on the real corpus") {
    import org.apache.spark.sql.functions.col
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val mh = CorpusOps.leakageFreeSplits(real, "doc_id", "text",
      shingleN = 3, threshold = 0.5, testFrac = 0.1, valFrac = 0.1,
      pairGen = "minhash")
    // the law the generator must uphold regardless of recall: no pair
    // IT found may straddle splits
    val mhPairs = DedupOps.nearDupPairs(
      DedupOps.minhashBands(real, "doc_id", "text", 3, k = 8, rowsPerBand = 2),
      nBands = 4, threshold = 0.5)
    val straddling = mhPairs
      .join(mh.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(mh.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0L, s"$straddling minhash pairs straddle splits")
    // on this corpus the banded-LSH graph recovers the same components,
    // so the split assignment is byte-identical to the exact generator
    val pp = CorpusOps.leakageFreeSplits(real, "doc_id", "text",
      shingleN = 3, threshold = 0.5, testFrac = 0.1, valFrac = 0.1)
    val diff = mh.select(col("doc_id"), col("cluster"), col("split"))
      .exceptAll(pp.select(col("doc_id"), col("cluster"), col("split"))).count()
    assert(diff == 0L, s"$diff rows differ between minhash and ppjoin splits")
    intercept[IllegalArgumentException] {
      CorpusOps.leakageFreeSplits(real, "doc_id", "text", 3, 0.5, 0.1, 0.1,
        pairGen = "simhash")
    }
  }

  test("pmiCollocations: hand-derived integer scores, minCount filter, " +
      "deterministic top-k order") {
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "the cat the dog"))
      .toDF("doc_id", "text")
    val out = CorpusOps.pmiCollocations(docs, "text", k = 5, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // N = 10; uni: new 3, york 3, the 2, cat 1, dog 1
    // bigrams >= 2: (new york) 3, (york new) 2
    // scores: 1e6*3*10 div 9 = 3333333; 1e6*2*10 div 9 = 2222222
    assert(out.toSeq == Seq(
      ("new", "york", 3L, 3333333L),
      ("york", "new", 2L, 2222222L)))
  }

  test("curationReport: one row per input doc, 'kept' ids are exactly " +
      "curate's output, every reference points at a kept doc, and " +
      "precedence matches the stage cascade") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // sf0.001 has no gate-passing exact duplicates, so re-add one kept
    // doc's text verbatim under two fresh (higher) ids — both must
    // come back exact_duplicate of the original
    val donor = CorpusOps.curate(base, "doc_id", "text")
      .orderBy("doc_id").select("doc_id").limit(1).head.getLong(0)
    val donorText = base.where(col("doc_id") === donor)
      .select("text").head.getString(0)
    val maxId = base.agg(max(col("doc_id"))).head.getLong(0)
    import spark.implicits._
    val docs = base.unionAll(
      Seq((maxId + 1, donorText), (maxId + 2, donorText))
        .toDF("doc_id", "text"))
    val report = CorpusOps.curationReport(docs, "doc_id", "text")
      .persist()
    try {
      assert(report.count() == docs.count(), "one row per input document")
      val kept = report.where(col("disposition") === "kept")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val curated = CorpusOps.curate(docs, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == curated,
        "the audit's kept set must BE curate's output id set")
      // reference resolution: a near-dup's rep is its component MINIMUM
      // and therefore kept; an exact-dup's keeper won its fingerprint
      // but may itself lose near-dup clustering — so ref chains
      // terminate at a kept doc in at most two hops
      val dispOf = report.select(col("doc_id").as("ref_id"),
        col("disposition").as("ref_disp"))
      val nearRefs = report.where(col("disposition") === "near_duplicate")
        .join(dispOf, Seq("ref_id"))
      assert(nearRefs.where(col("ref_disp") =!= "kept").count() == 0,
        "a component representative must be kept")
      val exactRefs = report.where(col("disposition") === "exact_duplicate")
        .join(dispOf, Seq("ref_id"))
      assert(exactRefs.where(!col("ref_disp")
          .isin("kept", "near_duplicate")).count() == 0,
        "a fingerprint keeper passed both gates and won its fingerprint")
      // gate drops carry no reference; duplicate drops always do
      assert(report.where(col("disposition").startsWith("dropped") &&
        col("ref_id").isNotNull).count() == 0)
      assert(report.where(col("disposition").endsWith("duplicate") &&
        col("ref_id").isNull).count() == 0)
      // the corpus genuinely exercises every disposition
      val seen = report.select("disposition").distinct()
        .collect().map(_.getString(0)).toSet
      assert(seen == Set("kept", "dropped_language", "dropped_quality",
        "exact_duplicate", "near_duplicate"),
        s"fixture should exercise all dispositions, saw $seen")
      // the crafted clones lost to their donor specifically
      assert(report.where(col("doc_id").isin(maxId + 1, maxId + 2))
        .collect().forall(r => r.getString(1) == "exact_duplicate" &&
          r.getLong(2) == donor))
    } finally report.unpersist(blocking = false)
  }
}
