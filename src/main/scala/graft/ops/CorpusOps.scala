package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operations beyond per-document scoring:
  * benchmark decontamination, token-budget sequence packing, and PII
  * redaction — the standard steps between "raw filtered corpus" and
  * "training batches" in an LLM data pipeline.
  */
object CorpusOps {

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a held-out benchmark set (the GPT-3-style overlap
    * check, word-shingle form). Returns one row per corpus document:
    * (id, n_hits = DISTINCT overlapping shingles, contaminated).
    *
    * Scale shape: candidate generation is an EQUI-JOIN on the shingle
    * string — never a cross join. Both sides are shingle-DISTINCTed
    * BEFORE the join (the per-doc distinct caps a pathological doc's
    * contribution at its vocabulary, and the benchmark side collapses
    * to its shingle set, typically small enough that AQE broadcasts
    * it). The final left join restores zero-hit documents without a
    * second pass over the text.
    */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusShingles = corpus
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()
    val benchShingles = benchmark
      .select(explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()
    val hits = corpusShingles.join(benchShingles, Seq("sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-pre-filtered decontamination — the 100 TB form of
    * [[contaminationHits]], with IDENTICAL output: Bloom filters have
    * no false negatives, and every candidate that passes the filter is
    * still exact-verified by the same shingle equi-join (false
    * positives only add a few verify rows — the `fpp` knob). The
    * benchmark's distinct shingle set is aggregated into ONE
    * fixed-size Bloom blob (partial-merged `BloomFilterAggregate`,
    * ~1.2 MB per million shingles at 1% fpp — bounded by the BENCHMARK,
    * which is small by definition; the blob and one count are the only
    * driver-side state) and shipped as a literal into a codegen'd
    * `might_contain` pre-filter over the corpus shingle stream.
    *
    * Scale shape: at 100 TB the corpus side drops to ~the true-hit
    * rate AT THE SCAN, before the join shuffle — [[contaminationHits]]
    * shuffles every distinct corpus shingle to meet the benchmark;
    * this form shuffles only probable hits. Same sketch+exact-gate
    * discipline as `heavyHitters` (CMS): the sketch accelerates, the
    * exact operator decides.
    */
  def contaminationHitsBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => exprCol}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(fpp > 0 && fpp < 1, s"fpp $fpp outside (0, 1)")
    // the benchmark shingle set is read three times (count, Bloom
    // aggregate, verify join) — persist it across the two EAGER reads
    // (count + blob) and unpersist before returning: the lazy verify
    // join below recomputes the explode+distinct from source when the
    // caller materializes the result (benchmark-sized — cheap), which
    // keeps repeated invocations in one long session from accumulating
    // cached copies until the ContextCleaner happens to run
    val benchShingles = benchmark
      .select(explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusIds = corpus.select(col(idCol)).distinct()
    val nBench = benchShingles.count()
    if (nBench == 0L) {
      benchShingles.unpersist()
      return corpusIds.select(col(idCol), lit(0L).as("n_hits"),
        lit(false).as("contaminated"))
    }
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nBench, fpp)
    val hash = (c: org.apache.spark.sql.Column) =>
      new XxHash64(Seq(org.apache.spark.sql.GraftColumnBridge.expression(c)))
    val blob = benchShingles
      .select(exprCol(new BloomFilterAggregate(hash(col("sh")),
          Literal(nBench), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    // both eager consumers are done: release the cache now (the verify
    // join recomputes the benchmark shingles from source when it runs)
    benchShingles.unpersist(blocking = false)
    val prefiltered = corpus
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()
      .where(exprCol(BloomFilterMightContain(
        Literal(blob, org.apache.spark.sql.types.BinaryType), hash(col("sh")))))
    val hits = prefiltered.join(benchShingles, Seq("sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpusIds.join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Token-budget sequence packing: assign each document to a pack of
    * ~`budget` tokens by contiguous greedy fill — pack_id = (tokens
    * before this doc in its shard) div budget, i.e. a doc starts a new
    * pack when the running total crosses the budget, and an over-budget
    * doc spills into its own pack(s). The deterministic, associative
    * form of what a packing worker does before concatenating sequences
    * for training.
    *
    * Scale shape: packing is PER SHARD (`id % shards`), matching how
    * distributed packing actually runs (each worker packs its own
    * partition) — the window sort is within a shard, never global, so
    * no single-partition bottleneck. One shuffle on the shard key.
    * `carry` columns (evaluated against `docs`) ride that same shuffle
    * into the output, so a composed pipeline (see [[curate]]) attaches
    * per-document annotations without a second corpus-sized join.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int, carry: Seq[Column] = Nil,
      tokenCount: Option[Column] = None): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    // the budget unit is pluggable: default whitespace tokens; pass
    // e.g. TextOps.bpeCount(col(textCol)) to pack by REAL tokenizer
    // counts (what training actually bills by)
    val nTok = tokenCount.getOrElse(size(TextOps.tokens(col(textCol))).cast("long"))
    val t = docs.select(col(idCol) +:
      pmod(col(idCol), lit(shards.toLong)).as("shard") +:
      nTok.cast("long").as("n_tok") +:
      carry: _*)
    val carryNames = t.columns.drop(3)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col(idCol) +: col("shard") +: col("n_tok") +:
        (col("before") - pmod(col("before"), lit(budget.toLong)))
          .divide(lit(budget.toLong)).cast("long").as("pack_id") +:
        carryNames.map(col): _*)
  }

  /** Corpus document-frequency statistics per document — the exact
    * integer core of frequency-based quality scoring (a KenLM-style
    * perplexity filter's cheap cousin): for each document, its token
    * count, the SUM of the corpus document frequencies of its tokens
    * (low mean df ⇒ unusual vocabulary), and the MINIMUM df (1 ⇒ the
    * doc contains a token found nowhere else — a strong junk/PII
    * signal). All-integer output so any engine reproduces it
    * byte-exactly; a real pipeline turns these into -log-frequency
    * scores downstream.
    *
    * Scale shape: the token stream feeds (a) the vocabulary df
    * aggregate (map-side partial countDistinct) and (b) the
    * token-keyed join back, then one regroup on the doc id. The
    * scan+tokenize runs TWICE (once per consumer) — deliberately:
    * it is narrow and pipelined, while caching the exploded stream
    * would materialize something larger than the input corpus, the
    * wrong trade at 100 TB. The df side is vocabulary-sized — orders
    * smaller than the token stream — so AQE broadcasts it when it fits
    * and skew-splits the hot stopword keys when it does not; nothing
    * is ever corpus × corpus.
    */
  def rareTokenStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val dfreq = toks.groupBy("token")
      .agg(countDistinct(col(idCol)).as("df"))
    toks.join(dfreq, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum("df").as("sum_df"),
        min("df").as("min_df"))
  }

  /** Per-document most-DISTINGUISHING term: the token maximizing
    * tf/df — highest in-document frequency relative to how many
    * documents contain it (the argmax of the classic tf-idf weight
    * under a monotone idf transform). EXACTNESS is integer arithmetic
    * end to end: score = tf·10⁶ floor-div df (integral division, on
    * which both engines agree for positives), ties broken by the
    * lexicographically smallest token — no floating idf logs whose
    * last ulp could flip an argmax between engines.
    *
    * Scale shape: tf is one (doc, token) hash aggregate; df is one
    * vocabulary aggregate OVER THE TF FRAME (counting rows, not
    * re-scanning text); the join back is vocabulary-keyed (AQE
    * broadcasts a small vocabulary, skew-splits hot stopwords); and
    * the per-doc argmax is a partially-aggregable `min(struct)` —
    * never a corpus-wide window. Returns (id, top_term, tf, df,
    * score).
    */
  def topDistinctTerm(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("score", expr("tf * CAST(1000000 AS BIGINT) div df"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("score")).as("ns"), col("token").as("t"),
        col("tf").as("f"), col("df").as("d"))).as("b"))
      .select(col(idCol), col("b.t").as("top_term"), col("b.f").as("tf"),
        col("b.d").as("df"), (-col("b.ns")).as("score"))
  }

  /** Exact corpus heavy hitters, cross-checked against a Count-Min
    * Sketch — the last classic sketch in the engine's family (HLL++
    * `a8`, approx-percentile `a12`, MinHash `d2`, SimHash `d3`, PQ
    * `n5`): the top-k tokens by exact count, with an in-query gate (the
    * `a12`/`n4` discipline) on the sketch's guarantees:
    * `est ≥ exact` hard (deterministic), `est ≤ exact + eps·N` within a
    * small violator budget (that bound is per-lookup probabilistic at
    * `confidence`). The sketch is built by Spark's
    * partial-merged `count_min_sketch` aggregate — one pass, map-side
    * partials, a fixed-size blob on the driver regardless of corpus
    * size — which is the 100 TB shape: at scale the sketch REPLACES
    * the exact aggregate; here the exact side doubles as its oracle.
    *
    * Driver-side work is bounded: k result rows + one eps⁻¹-sized
    * sketch blob (the [[graft.ops.SimilarityOps]] centroid-seeding
    * exception). The returned frame is the collected top-k as a local
    * relation, so downstream consumers re-read k rows, not the corpus.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
      eps: Double = 0.001, seed: Int = 42): DataFrame = {
    val confidence = 0.99
    val spark = docs.sparkSession
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rows = exact.orderBy(col("n").desc, col("token")).limit(k).collect()
        val total = exact.agg(sum(col("n"))).head.getLong(0)
        val skBytes = toks
          .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed)).as("sk"))
          .head.getAs[Array[Byte]]("sk")
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(skBytes))
        val bound = math.ceil(eps * total).toLong
        // The lower bound is a DETERMINISTIC CMS guarantee (min over
        // rows of non-negative counters can never undercount) — any
        // violation is a broken sketch, so it stays a hard failure. The
        // upper bound holds only with probability `confidence` PER
        // LOOKUP, so across k lookups a healthy sketch may exceed it on
        // a few tokens for some dataset+seed (deterministically, not as
        // a flake); gate on a budget of ceil(k·(1−confidence)) + 1
        // violators instead of any single one.
        val overBudget = math.ceil(rows.length * (1 - confidence)).toLong + 1
        val over = rows.flatMap { r =>
          val (tok, n) = (r.getString(0), r.getLong(1))
          val est = cms.estimateCount(tok)
          require(est >= n, s"CMS underestimated '$tok': $est < $n")
          if (est > n + bound) Some(s"'$tok': $est vs $n + $bound") else None
        }
        require(over.length <= overBudget,
          s"CMS exceeded eps*N on ${over.length} of ${rows.length} top-k tokens " +
            s"(budget $overBudget): ${over.mkString("; ")}")
        import spark.implicits._
        rows.map(r => (r.getString(0), r.getLong(1))).toSeq
          .toDF("token", "n")
      } finally exact.unpersist()
    } finally toks.unpersist()
  }

  /** Deterministic stratified sampling to a target corpus mixture
    * (domain/language reweighting — the "20% code, 5% each low-resource
    * language" step): each stratum keeps its own fraction, applied with
    * the keyed md5-prefix rule of
    * [[graft.relational.RelationalOps.hashSample]], so membership is
    * stable across runs, engines, partitionings AND strata definitions
    * — the same key survives at fraction f regardless of which stratum
    * it lands in, so tightening one stratum's rate never reshuffles
    * another's sample. Strata absent from `fractions` keep
    * `defaultFraction`.
    *
    * Scale shape: the per-stratum threshold is a literal CASE chain
    * (broadcast nothing, join nothing), the whole filter is narrow and
    * codegen'd, and rows drop at the scan.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    import graft.relational.RelationalOps.{hashDigest, hashThreshold}
    // keys are distinct, so fold order cannot change the result
    val threshold = fractions.foldLeft(lit(hashThreshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(hashThreshold(f))).otherwise(acc)
    }
    df.where(hashDigest(keyCol) < threshold)
  }

  /** Temperature-scaled mixture sampling (the mT5/XLM-R `p ∝ n^α`
    * rebalancing): sample each domain at a rate proportional to
    * `n_d^(α-1)` so smaller domains are over-represented relative to
    * their raw share, with `targetFraction` of the corpus kept overall
    * (rates cap at 1; capped domains surrender their excess rather than
    * redistributing it — deterministic and closed-form, documented
    * trade). Selection reuses [[stratifiedSample]]'s deterministic
    * hash-threshold rule, so the sample is reproducible across engines
    * and partitionings.
    *
    * Scale shape: one tiny aggregate collects ONE count per domain to
    * the driver (bounded by the domain vocabulary, the same pattern as
    * `heavyHitters`); the filter itself is a narrow literal-CASE scan.
    * Rates are computed in domain-sorted order with `sqrt`/`/` only
    * (both IEEE-correctly-rounded), so an engine recomputing them —
    * the DuckDB oracle does — lands on bit-identical thresholds; α is
    * fixed at 0.5, the published default, to stay inside that
    * correctly-rounded arithmetic (pow is not exactly reproducible
    * across libms).
    */
  def temperatureMixture(df: DataFrame, domainCol: String, keyCol: String,
      targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction $targetFraction outside (0, 1]")
    // NULL domains carry no rate: they fall to stratifiedSample's
    // defaultFraction = 0.0 path (dropped) rather than NPE-ing the
    // driver-side rate computation below.
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .where(col(domainCol).isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "empty corpus (or all domains NULL)")
    val total = counts.map(_._2).sum
    var powSum = 0.0
    counts.foreach { case (_, n) => powSum += math.sqrt(n.toDouble) }
    val c = targetFraction * total / powSum
    val rates = counts.map { case (d, n) =>
      d -> math.min(1.0, c / math.sqrt(n.toDouble))
    }.toMap
    stratifiedSample(df, domainCol, keyCol, rates, defaultFraction = 0.0)
  }

  /** Per-domain document cap (the "at most k pages per site" step of
    * web-corpus curation): keep, for each value of `domainCol`, the `k`
    * rows with the smallest `(md5(key), key)` — a deterministic,
    * engine- and partitioning-stable selection (same rule family as
    * [[stratifiedSample]]), equivalent to a per-domain
    * `row_number() ≤ k` under that ordering.
    *
    * Scale shape: a single window over the domain sorts EACH domain in
    * one task — a hot domain (one crawl source dominating the corpus)
    * becomes a straggler sort at 100 TB. This runs the cap in two
    * bounded phases instead: phase 1 ranks within (domain, salt) where
    * the salt is derived from the KEY (deterministic, so the result
    * stays reproducible), cutting every sort to ~1/`salts` of the
    * domain; phase 2 re-ranks only the ≤ salts·k per-bucket survivors —
    * a frame bounded by salts·k rows PER DOMAIN regardless of corpus
    * size. The global k smallest of a domain are each among the k
    * smallest of their own salt bucket, so the two-phase result is
    * identical to the single-window form (pinned by the spec).
    */
  def domainCap(df: DataFrame, domainCol: String, keyCol: String, k: Int,
      salts: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(salts > 0, s"salts must be positive, got $salts")
    val ord = md5(col(keyCol).cast("string"))
    val salted = df
      .withColumn("__cap_h", ord)
      .withColumn("__cap_salt", pmod(xxhash64(col(keyCol)), lit(salts.toLong)))
    val w1 = Window.partitionBy(col(domainCol), col("__cap_salt"))
      .orderBy(col("__cap_h"), col(keyCol))
    val survivors = salted
      .withColumn("__cap_r", row_number().over(w1))
      .where(col("__cap_r") <= k)
      .drop("__cap_r", "__cap_salt")
    val w2 = Window.partitionBy(col(domainCol))
      .orderBy(col("__cap_h"), col(keyCol))
    survivors
      .withColumn("__cap_r", row_number().over(w2))
      .where(col("__cap_r") <= k)
      .drop("__cap_r", "__cap_h")
  }

  /** PII redaction: replace emails, NANP-style phone fragments, and
    * IPv4 addresses with typed placeholder tags. Pure
    * `regexp_replace` — narrow, codegen'd, no UDF. Patterns are kept
    * RE2-compatible (no backreferences or lookarounds) so the same
    * regexes run on engines with either regex dialect; replacement
    * order is part of the contract (emails first, so an address inside
    * a redacted email can't double-fire).
    */
  val EmailPattern = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]"
  val PhonePattern = "555-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }

  /** End-to-end corpus curation — the flagship composition of the
    * operator families a training-data pipeline chains in practice:
    *
    *   1. language gate: stopword-profile argmax == `lang`
    *   2. quality gate: integer-exact composite score ≥ `minQualityE6`
    *   3. exact dedup: normalized-text fingerprint, min-id survivor
    *   4. near-dup dedup: n-gram Jaccard candidate pairs →
    *      alternating-star connected components → keep each cluster's
    *      min-id representative
    *   5. PII redaction: md5 of the redacted body rides to the output
    *   6. token-budget sequence packing over the survivors
    *
    * One row per SURVIVING document:
    * (id, shard, n_tok, pack_id, pred_lang, quality_e6, red_md5).
    *
    * Scale shape: stages 1–2 are narrow fused kernels (no shuffle);
    * stage 3 is one fingerprint groupBy + semi-join back; stage 4 is
    * [[DedupOps]]'s prefix-filtered candidate equi-join + O(log²) CC;
    * stages 5–6 ride ONE shard shuffle (redaction is narrow and the
    * packing window carries its hash via `carry`, so no corpus-sized
    * post-join). Nothing is quadratic in the corpus and every join is
    * an equi-join. The stage-3 survivor frame feeds THREE consumers
    * whose lineage includes the gate kernels and the fingerprint
    * semi-join (the pair generator, the CC node set, and the packing
    * input), so it is pinned once with a LAZY `RDD.localCheckpoint`
    * (cleaner-managed — no unreleased cache; the x17/x19 shape) rather
    * than recomputed per consumer: one materialization of the
    * gate-survivor rows beats re-running the fingerprint shuffle three
    * times at any scale.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQualityE6: Long = 550000L,
      shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      budget: Int = 512, shards: Int = 8): DataFrame = {
    val scored = docs.select(col(idCol), col(textCol),
        TextOps.langId(col(textCol)).as("pred_lang"),
        TextOps.qualityScoreMillionths(col(textCol)).as("quality_e6"))
      .where(col("pred_lang") === lang &&
        col("quality_e6") >= minQualityE6)
    val exactKeep = scored
      .groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // lazy Dataset-level checkpoint: cleaner-managed, no Row-encoder
    // boundary (see ngramJaccardPairs)
    val s1 = scored.join(exactKeep, Seq(idCol), "left_semi")
      .localCheckpoint(false)
    val pairs = DedupOps.ngramJaccardPairs(
      s1, idCol, textCol, shingleN, jaccardThreshold)
    val reps = DedupOps.connectedComponents(
        s1.select(col(idCol)), idCol, pairs, "doc_a", "doc_b")
      .where(col(idCol) === col("cluster"))
      .select(idCol)
    val s2 = s1.join(reps, Seq(idCol), "left_semi")
    packSequences(s2, idCol, textCol, budget, shards,
      carry = Seq(col("pred_lang"), col("quality_e6"),
        md5(redactPii(col(textCol))).as("red_md5")))
  }

  /** Per-document curation AUDIT: the disposition every input document
    * received from [[curate]]'s stage cascade, with the document it
    * lost to where one exists — the explainability layer a production
    * pipeline needs ("why is doc X not in the training set?") and the
    * removal ledger a takedown/compliance process starts from. One row
    * per INPUT document:
    *
    *  - `dropped_language` — language gate (ref_id null);
    *  - `dropped_quality`  — quality gate (ref_id null);
    *  - `exact_duplicate`  — lost stage-1 fingerprint dedup to
    *    `ref_id` (the min-id keeper of its fingerprint);
    *  - `near_duplicate`   — lost near-dup clustering to `ref_id`
    *    (its connected component's min-id representative);
    *  - `kept`             — survives into [[curate]]'s output.
    *
    * Stage precedence matches [[curate]] exactly (a non-English doc is
    * `dropped_language` even if it is also a duplicate — later stages
    * never see it), and the `kept` set is BY CONSTRUCTION the id set of
    * [[curate]]'s output: both derive from the same gates, the same
    * fingerprint keeper choice, and the same component representatives
    * (pinned by spec and by the c3 oracle row).
    *
    * Scale shape: identical to [[curate]] through stage 2 (narrow gate
    * kernels, one fingerprint aggregate, the banded near-dup pair join,
    * alternating-star CC), plus two broadcast-sized left joins to
    * attach keeper/rep labels back onto the full input — no new
    * shuffle class. Checkpoint storage is bounded deliberately: the
    * corpus-wide lazily-checkpointed frame pins METADATA only (id,
    * gates, fingerprint — a few narrow columns), never the text; the
    * text is re-attached for the one stage that needs it (stage-2
    * shingling) by a second column-pruned id+text scan semi-joined to
    * the stage-1 keepers, itself lazily checkpointed at the KEPT-subset
    * bound [[curate]] already pays. Pinning the full corpus text to
    * non-reliable executor-local checkpoint storage would trade one
    * re-scan for corpus-sized local-disk pressure and an
    * unrecoverable-lineage failure on any executor loss — the wrong
    * side of the trade at 100 TB. Catalyst re-expansion of either
    * frame under its multiple consumers is still impossible (both are
    * plan-level RDD boundaries; plan-gated in PlanQualitySpec).
    */
  def curationReport(docs: DataFrame, idCol: String, textCol: String,
      lang: String = "en", minQualityE6: Long = 550000L,
      shingleN: Int = 3, jaccardThreshold: Double = 0.5): DataFrame = {
    val scored = docs.select(col(idCol),
        TextOps.langId(col(textCol)).as("pred_lang"),
        TextOps.qualityScoreMillionths(col(textCol)).as("quality_e6"),
        TextOps.fingerprint(col(textCol)).as("fp"))
      .localCheckpoint(false)
    val gatePass = scored.where(col("pred_lang") === lang &&
      col("quality_e6") >= minQualityE6)
    // every gate-passing doc -> its fingerprint's min-id keeper
    val keepers = gatePass.groupBy(col("fp"))
      .agg(min(col(idCol)).as("keeper"))
    val keeperOf = gatePass.select(col(idCol), col("fp"))
      .join(keepers, Seq("fp"))
      .select(col(idCol), col("keeper"))
    // re-attach text for the shingling stage only: one id+text scan
    // pruned to the stage-1 keepers, pinned at the kept-subset bound
    val s1 = docs.select(col(idCol), col(textCol)).join(
        keeperOf.where(col(idCol) === col("keeper")).select(idCol),
        Seq(idCol), "left_semi")
      .localCheckpoint(false)
    val pairs = DedupOps.ngramJaccardPairs(
      s1, idCol, textCol, shingleN, jaccardThreshold)
    val repOf = DedupOps.connectedComponents(
      s1.select(col(idCol)), idCol, pairs, "doc_a", "doc_b")
    scored.select(col(idCol), col("pred_lang"), col("quality_e6"))
      .join(keeperOf, Seq(idCol), "left")
      .join(repOf, Seq(idCol), "left")
      .select(col(idCol),
        when(col("pred_lang") =!= lang, lit("dropped_language"))
          .when(col("quality_e6") < minQualityE6, lit("dropped_quality"))
          .when(col("keeper") =!= col(idCol), lit("exact_duplicate"))
          .when(col("cluster") =!= col(idCol), lit("near_duplicate"))
          .otherwise(lit("kept")).as("disposition"),
        when(col("pred_lang") =!= lang, lit(null).cast("long"))
          .when(col("quality_e6") < minQualityE6, lit(null).cast("long"))
          .when(col("keeper") =!= col(idCol), col("keeper"))
          .when(col("cluster") =!= col(idCol), col("cluster"))
          .as("ref_id"),
        col("pred_lang"), col("quality_e6"))
  }

  /** Deterministic epoch shuffle: assign every document a global
    * position in a seeded pseudo-random permutation — the "shuffle the
    * corpus each epoch" step of a training run, reproducible across
    * engines and re-runs (same seed → same order, so a resumed job
    * skips to the right offset).
    *
    * Scale shape: order key = md5(seed:id) (uniform, engine-portable);
    * the global position comes from a RANGE-partitioned sort followed
    * by `zipWithIndex`'s two-pass per-partition offset trick — the
    * scalable global-numbering shape. A `row_number()` window with no
    * partition spec would funnel 100 TB through ONE task; this sorts in
    * parallel and runs one extra tiny job to collect partition counts.
    */
  /** The parallel-sort stage of [[epochShuffle]], exposed so the plan
    * gate can assert the range partitioning (the zipWithIndex step that
    * follows hides the sort behind an ExistingRDD plan boundary).
    */
  private[graft] def epochSorted(docs: DataFrame, idCol: String, seed: Long,
      partitions: Int): DataFrame = {
    val keyed = docs.select(col(idCol),
      md5(concat_ws(":", lit(seed), col(idCol))).as("__h"))
    val n = if (partitions > 0) partitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
  }

  /** Like [[epochSorted]] but carrying each document's token count —
    * the input ordering for [[chunkAssignments]]' prefix sum.
    */
  private[graft] def chunkSorted(docs: DataFrame, idCol: String, textCol: String,
      seed: Long, partitions: Int): DataFrame = {
    val keyed = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
      md5(concat_ws(":", lit(seed), col(idCol))).as("__h"))
    val n = if (partitions > 0) partitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
  }

  /** Fixed-context-window chunk assignment: concatenate the whole
    * corpus in seeded epoch-shuffle order and cut it into training
    * examples of `chunkTokens` tokens, examples crossing document
    * boundaries (the GPT-style "pack the token stream" regime —
    * the boundary-respecting alternative is [[packSequences]]). Returns
    * one row per document: its global token offset and the first/last
    * chunk ids it contributes to.
    *
    * Scale shape: the global token offset is a DISTRIBUTED PREFIX SUM —
    * range-partition + sort by the shuffle key, one tiny job to collect
    * per-partition token totals (ONE Long per partition reaches the
    * driver), broadcast the cumulative starts, then a narrow
    * per-partition running sum. A window `sum() OVER (ORDER BY ...)`
    * with no partition spec — the single-node SQL form the oracle uses —
    * would funnel the corpus through one task; this never does.
    *
    * The sorted stage is `localCheckpoint`ed before the two passes: the
    * numbering's CORRECTNESS (not just its cost) depends on both passes
    * seeing identical partition contents, and re-deriving the stage from
    * lineage would let a task retry with different upstream locality —
    * or a future nondeterministic source — misnumber rows with no error.
    * With the checkpoint, a lost block fails the job loudly instead
    * (the same discipline as [[graft.ops.DedupOps.connectedComponents]]).
    */
  def chunkAssignments(docs: DataFrame, idCol: String, textCol: String,
      seed: Long, chunkTokens: Int, partitions: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val spark = docs.sparkSession
    val sorted = chunkSorted(docs, idCol, textCol, seed, partitions)
    val rdd = sorted.rdd.localCheckpoint()
    val partTotals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.map(_.getLong(1)).sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val starts = partTotals.scanLeft(0L)(_ + _)  // starts(i) = tokens before partition i
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("tok_start",
          org.apache.spark.sql.types.LongType, nullable = false))
    val withOffsets = rdd.mapPartitionsWithIndex { (i, it) =>
      var off = starts(i)
      it.map { row =>
        val start = off
        off += row.getLong(1)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ start)
      }
    }
    spark.createDataFrame(withOffsets, schema)
      .select(col(idCol), col("n_tokens"), col("tok_start"),
        (col("tok_start") / chunkTokens).cast("long").as("first_chunk"),
        ((col("tok_start") + col("n_tokens") - 1) / chunkTokens)
          .cast("long").as("last_chunk"))
  }

  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
      partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val sorted = epochSorted(docs, idCol, seed, partitions)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false))
    // zipWithIndex runs its own two jobs (per-partition counts, then the
    // indexed map) — pin the sorted stage between them for the same
    // reason chunkAssignments does: both jobs must see identical
    // partition contents or positions silently misnumber.
    val withPos = sorted.rdd.localCheckpoint().zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(withPos, schema).drop("__h")
  }

  /** Length-bucketed batch assignment: route each document to a length
    * bucket (fewer pad tokens per batch when co-batched lengths are
    * close) and number fixed-size batches within each bucket. `bounds`
    * are explicit token-count lower bounds for buckets 1..n (bucket 0
    * catches the rest) — explicit, not quantile-derived, so the
    * assignment is deterministic and engines agree bit-for-bit.
    *
    * Scale shape: bucketing is a narrow literal comparison chain; batch
    * numbering shuffles once, partitioned by bucket. With a handful of
    * buckets those partitions are wide at 100 TB — the production knob
    * is the same two-phase (bucket, salt) split domainCap uses; the
    * within-bucket order (token count, then id) is what keeps co-batched
    * lengths adjacent, which is the point of the operator.
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String, textCol: String,
      bounds: Seq[Int], batchSize: Int): DataFrame = {
    require(bounds == bounds.sorted && bounds.nonEmpty, "bounds must ascend")
    require(batchSize > 0, "batchSize must be positive")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens"), col(idCol))
    bucketed(docs, idCol, textCol, bounds)
      .withColumn("batch_idx",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** The shared (id, n_tokens, bucket) projection of the two
    * length-bucketing forms: bucket = index of the highest bound ≤
    * n_tokens (bucket 0 below every bound), a narrow literal CASE chain.
    */
  private def bucketed(docs: DataFrame, idCol: String, textCol: String,
      bounds: Seq[Int]): DataFrame = {
    val bucket = bounds.zipWithIndex.foldLeft(lit(0)) { case (acc, (b, i)) =>
      when(col("n_tokens") >= b, lit(i + 1)).otherwise(acc)
    }
    docs.select(col(idCol), size(TextOps.tokens(col(textCol))).as("n_tokens"))
      .withColumn("bucket", bucket)
  }

  /** The parallel-sort stage of [[lengthBucketBatchesScalable]], exposed
    * so the plan gate can assert the range partitioning (the prefix-count
    * step that follows hides the sort behind an ExistingRDD boundary).
    */
  private[graft] def lengthBucketSorted(docs: DataFrame, idCol: String,
      textCol: String, bounds: Seq[Int], partitions: Int): DataFrame = {
    val n = if (partitions > 0) partitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    bucketed(docs, idCol, textCol, bounds)
      .repartitionByRange(n, col("bucket"), col("n_tokens"), col(idCol))
      .sortWithinPartitions(col("bucket"), col("n_tokens"), col(idCol))
  }

  /** Scalable twin of [[lengthBucketBatches]] — IDENTICAL output (the
    * spec pins row-for-row equality), but the within-bucket batch
    * numbering is a distributed PER-BUCKET PREFIX COUNT instead of one
    * window task per bucket: with a handful of buckets, the single-window
    * form sorts each bucket's entire share of a 100 TB corpus in one
    * task. Here the frame is RANGE-partitioned on (bucket, n_tokens, id)
    * — so every partition holds a contiguous slice of some bucket's
    * global order — one tiny job collects per-(partition, bucket) row
    * counts (≤ partitions × buckets pairs reach the driver), cumulative
    * per-bucket starts are broadcast back, and a narrow per-partition
    * pass assigns each row its global within-bucket rank. The
    * [[chunkAssignments]] prefix-sum machinery, generalized from one
    * global group to one group per bucket; `localCheckpoint` pins the
    * two passes to identical partition contents for the same reason.
    */
  def lengthBucketBatchesScalable(docs: DataFrame, idCol: String,
      textCol: String, bounds: Seq[Int], batchSize: Int,
      partitions: Int = 0): DataFrame = {
    require(bounds == bounds.sorted && bounds.nonEmpty, "bounds must ascend")
    require(batchSize > 0, "batchSize must be positive")
    val spark = docs.sparkSession
    val sorted = lengthBucketSorted(docs, idCol, textCol, bounds, partitions)
    val rdd = sorted.rdd.localCheckpoint()
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.Map.empty[Int, Long]
      it.foreach { r =>
        val b = r.getInt(2)
        m(b) = m.getOrElse(b, 0L) + 1L
      }
      Iterator((i, m.toMap))
    }.collect().sortBy(_._1)
    // starts(i)(b) = rows of bucket b in partitions before i
    val running = scala.collection.mutable.Map.empty[Int, Long]
    val starts: Array[Map[Int, Long]] = counts.map { case (_, m) =>
      val snap = running.toMap
      m.foreach { case (b, c) => running(b) = running.getOrElse(b, 0L) + c }
      snap
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("batch_idx",
          org.apache.spark.sql.types.LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val local = scala.collection.mutable.Map.empty[Int, Long]
      it.map { r =>
        val b = r.getInt(2)
        val rank = starts(i).getOrElse(b, 0L) + local.getOrElse(b, 0L)
        local(b) = local.getOrElse(b, 0L) + 1L
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rank / batchSize)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-document language-model fluency score under a bigram
    * Stupid-Backoff model (Brants et al. 2007, "Large Language Models
    * in Machine Translation") trained on the `trainFilter` slice of the
    * corpus — the classic CCNet/KenLM-style "does this read like the
    * reference distribution" curation gate, in a form every engine
    * reproduces bit-for-bit.
    *
    * Scoring is INTEGER-EXACT millionths, no logs: each adjacent token
    * pair (w1, w2) contributes
    *  - `C(w1 w2)·10⁶ div C(w1)` when the training slice saw the bigram
    *    (conditional probability mass, floored),
    *  - else the backoff `α·10⁶·C(w2) div N` with α = 0.4 (unseen w2
    *    scores 0 — no smoothing constant to disagree on).
    * Summing probability mass instead of log-probability keeps every
    * intermediate an integer floor-division both engines define
    * identically; the resulting score is monotone in fluency for the
    * filtering use (higher = more in-distribution) even though it is
    * not a perplexity.
    *
    * Scale shape: the two model tables are VOCABULARY-sized aggregates
    * (bigram and unigram counts over the training slice — map-side
    * partials, one shuffle each), pre-joined into a bigram→score table
    * and a w2→backoff table BEFORE touching the scoring stream, so the
    * corpus-sized pair stream takes exactly two vocabulary-keyed left
    * joins (AQE broadcasts them when the vocabulary fits, skew-splits
    * hot stopword keys when it does not) and one per-doc regroup.
    * Nothing is ever corpus × corpus; the training total N is a 1-row
    * broadcast. Documents with < 2 tokens survive via the final left
    * join with n_bigrams = 0.
    */
  def lmBackoffScore(docs: DataFrame, idCol: String, textCol: String,
      trainFilter: Column, alphaMillionths: Long = 400000L): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val train = docs.filter(trainFilter)
    val trainToks = train.select(explode(toks).as("token"))
    val uni = trainToks.groupBy("token").agg(count(lit(1)).as("c1"))
    val total = trainToks.agg(count(lit(1)).as("n"))

    def pairsOf(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.select(extra :+ explode(TextOps.adjacentPairs(col(textCol))).as("p"): _*)
        .select(extra.map(c => c) :+ col("p.w1") :+ col("p.w2"): _*)

    // vocabulary-sized model tables, fully pre-joined
    val big = pairsOf(train, Nil)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cond = big.join(uni.withColumnRenamed("token", "w1"), "w1")
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        expr("cb * CAST(1000000 AS BIGINT) div c1").as("sc_cond"))
    val back = uni.crossJoin(broadcast(total))
      .select(col("token").as("w2"),
        expr(s"$alphaMillionths * c1 div n").as("sc_back"))

    val scored = pairsOf(docs, Seq(col(idCol)))
      .withColumn("bigram", concat_ws(" ", col("w1"), col("w2")))
      .join(cond, Seq("bigram"), "left")
      .join(back, Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nb"),
        sum(coalesce(col("sc_cond"), col("sc_back"), lit(0L))).as("s"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("s"), lit(0L)).as("lm_score"),
        when(col("nb").isNotNull && col("nb") > 0,
          expr("s div nb")).otherwise(lit(0L)).as("lm_avg"))
  }

  /** DSIR-style hashed n-gram importance score (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * each document by how much its hashed-unigram feature profile looks
    * like a TARGET slice of the corpus versus the raw corpus — the
    * standard "select web data that resembles wikipedia" move.
    *
    * Tokens hash into 16^hexChars buckets via an md5 prefix (a string
    * key both engines compute identically — no hex→int conversion to
    * disagree on). Each bucket carries an integer-millionths importance
    * ratio with add-one smoothing,
    * `r_b = 10⁶·(Ct(b)+1)·(Nr+B) div ((Cr(b)+1)·(Nt+B))`,
    * and a document's score is the sum of its tokens' bucket ratios —
    * a LINEAR surrogate of the DSIR log-ratio (sums of per-token
    * ratios, not log-products) chosen so every intermediate is exact
    * integer arithmetic; the numerator is routed through decimal(38,0)
    * because 10⁶·Ct·Nr overflows a long at real corpus sizes.
    *
    * Scale shape: the two distribution sweeps are fixed-width B-row
    * aggregates (map-side partials), the weight table is B rows and is
    * broadcast into the token stream's only join, and the per-doc
    * regroup is the single corpus-keyed shuffle. Driver-side state is
    * the B-row weight table — constant in the corpus size.
    */
  def hashedImportanceScore(docs: DataFrame, idCol: String,
      textCol: String, targetFilter: Column,
      hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 7, "hexChars in [1, 7]")
    val nBuckets = math.pow(16, hexChars).toLong
    val bucket = substring(md5(col("token")), 1, hexChars)
    val tokOf = (df: DataFrame) =>
      df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
    val raw = tokOf(docs).select(col(idCol), bucket.as("b"))
    val tgt = tokOf(docs.filter(targetFilter)).select(bucket.as("b"))
    val cr = raw.groupBy("b").agg(count(lit(1)).as("cr"))
    val ct = tgt.groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = cr.agg(sum("cr").as("nr"))
      .crossJoin(tgt.agg(count(lit(1)).as("nt")))
    // raw covers every observed bucket, so a left join is total here
    val weights = cr.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"), expr(
        s"""CAST(CAST(1000000 AS DECIMAL(38,0))
           |  * (coalesce(ct, CAST(0 AS BIGINT)) + 1L) * (nr + ${nBuckets}L)
           |  div (CAST(cr + 1L AS DECIMAL(38,0)) * (nt + ${nBuckets}L))
           |  AS BIGINT)""".stripMargin
          .replaceAll("\\s+", " ")).as("r"))
    raw.join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("r").as("dsir_score"))
  }

  /** Overlapping sliding-window chunking — the RAG/retrieval-indexing
    * twin of [[chunkAssignments]]' GPT-style disjoint packing: each
    * document yields windows of `window` tokens every `stride` tokens
    * (the last window may be short but never empty; a doc shorter than
    * `window` yields exactly one chunk), so consecutive chunks overlap
    * by `window − stride` tokens of context. Emits (id, chunk_idx,
    * tok_start, chunk_len, chunk_md5) — the md5 of the space-joined
    * token slice pins chunk CONTENT, not just its geometry.
    *
    * Scale shape: tokenize once, explode `n_chunks` offsets per row,
    * slice inside the array — a narrow, zero-shuffle map whose output
    * is ~`1/stride × token-mass` rows; nothing leaves the partition.
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window (stride > window would drop tokens)")
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        when(col("__n") <= window, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(__n - $window + $stride - 1) div $stride")) - 1)))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("chunk_len",
        least(lit(window.toLong), col("__n") - col("tok_start")))
      .withColumn("chunk_md5", md5(concat_ws(" ",
        slice(col("__toks"), (col("tok_start") + 1).cast("int"),
          col("chunk_len").cast("int")))))
      .drop("__toks", "__n")
  }

  /** Train/val/test assignment with NO near-duplicate leakage — the
    * split a model evaluation can actually trust: a near-dup of a
    * training document in the test set inflates eval scores, so splits
    * are assigned per CONNECTED COMPONENT of the near-dup graph
    * ([[DedupOps.ngramJaccardPairs]] candidates →
    * [[DedupOps.connectedComponents]]), keyed by the component
    * REPRESENTATIVE's hash — two documents that are near-dups of each
    * other (even transitively) land in the same split by construction.
    * Thresholding is the x11 keyed-md5-prefix rule (deterministic,
    * engine-portable, 4-hex granularity ≈ 1/65536).
    *
    * Scale shape: inherits the dedup pipeline's (prefix-filtered
    * inverted-index candidates, alternating-star components); the split
    * itself is one narrow hash expression over the component table.
    * Returns (id, cluster, split).
    */
  def leakageFreeSplits(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      testFrac: Double, valFrac: Double,
      pairGen: String = "ppjoin"): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac < 1,
      "need testFrac, valFrac >= 0 with testFrac + valFrac < 1")
    require(Set("ppjoin", "minhash")(pairGen),
      s"pairGen must be 'ppjoin' or 'minhash', got '$pairGen'")
    def thr(f: Double): String = {
      val t = math.round(f * 65536)
      if (t >= 65536) "g" else f"$t%04x"
    }
    // Both generators emit exact-Jaccard-verified (doc_a, doc_b) pairs;
    // they differ only in CANDIDATE generation. 'ppjoin' (default, the
    // oracle-pinned form) verifies every prefix-bucket candidate —
    // exhaustive, but clone-quadratic on heavily duplicated corpora.
    // 'minhash' verifies only banded-LSH collisions — the 100 TB
    // posture: recall < 1 on pairs barely above threshold, but the
    // clusters that MATTER for leakage (high-overlap families) collide
    // in some band with overwhelming probability, at a fraction of the
    // candidate volume (see SCALE_PROBE.md, x29 note).
    val pairs =
      if (pairGen == "minhash")
        DedupOps.nearDupPairs(
          DedupOps.minhashBands(docs, idCol, textCol, shingleN,
            k = 8, rowsPerBand = 2),
          nBands = 4, threshold = threshold)
        .select(col("doc_a"), col("doc_b"))
      else DedupOps.ngramJaccardPairs(
        docs, idCol, textCol, shingleN, threshold)
    val comps = DedupOps.connectedComponents(
      docs.select(col(idCol)), idCol, pairs, "doc_a", "doc_b")
    val h = substring(md5(col("cluster").cast("string")), 1, 4)
    comps.select(col(idCol), col("cluster"),
      when(h < thr(testFrac), lit("test"))
        .when(h < thr(testFrac + valFrac), lit("val"))
        .otherwise(lit("train")).as("split"))
  }

  /** Corpus collocations by pointwise mutual information over bigrams —
    * the phrase-mining / tokenizer-vocabulary-candidate sweep ("New
    * York" scores high because its parts co-occur far above chance).
    * INTEGER-EXACT: score = `10⁶·C(w1w2)·N div (C(w1)·C(w2))` (10⁶·the
    * likelihood ratio inside the PMI log — same argmax, no float log),
    * routed through decimal(38,0) because `10⁶·cb·N` overflows a long
    * at real corpus sizes. `minCount` drops the hapax noise PMI is
    * notorious for; top-k by (score, w1, w2) is a distributed
    * TakeOrdered, never a global sort.
    *
    * Scale shape: one unigram aggregate, one bigram aggregate (both
    * map-side partial), two vocabulary-keyed joins onto the
    * BIGRAM-count table (already aggregated — orders smaller than the
    * token stream), a 1-row total broadcast, and the top-k. */
  def pmiCollocations(docs: DataFrame, textCol: String, k: Int,
      minCount: Long = 5L): DataFrame = {
    val a = TextOps.tokens(col(textCol))
    val toks = docs.select(explode(a).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("n"))
    val big = docs.select(explode(TextOps.adjacentPairs(col(textCol))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .where(col("cb") >= minCount)
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("cb"),
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) * cb * n
               |  div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"""
          .stripMargin.replaceAll("\\s+", " ")).as("pmi_score"))
      .orderBy(col("pmi_score").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
