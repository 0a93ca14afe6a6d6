package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalOps

/** Incremental (cross-batch) corpus curation — the production shape of
  * [[CorpusOps.curate]]: a corpus that grows by shards, where each new
  * shard is curated against everything ingested so far WITHOUT
  * re-scanning any old shard's text. The reference pipeline is
  * single-corpus (its ETL re-extracts a full study per run,
  * `/root/reference/kf_task_fhir_etl/etl/ingest.py:519-542`); this is
  * the engine extension a continuously-ingested 100 TB corpus needs —
  * re-running near-dup clustering from scratch per shard is the one
  * quadratic-in-history cost left in the batch form.
  *
  * == State (parquet, batch-partitioned: `<table>/batch=<k>/`) ==
  *
  *  - `docs`   — per-doc curation metadata for every STAGE-1 survivor
  *               (lang/quality gates + exact dedup): id, pred_lang,
  *               quality_e6, n_tok, red_md5, fp, and the distinct
  *               shingle set `sh`. Everything the final output and the
  *               near-dup verify ever need — text is read exactly once,
  *               at its own shard's ingest.
  *  - `prefix` — the PPJoin prefix index (shingle → doc) under the md5
  *               order ([[DedupOps.hashPrefixArray]]). The md5 order is
  *               content-determined, so stored prefixes stay valid as
  *               the corpus grows (a doc-frequency order would not).
  *  - `edges`  — verified near-dup pairs (Jaccard ≥ t). Old∕old edges
  *               never change (Jaccard is a function of the two docs
  *               alone), so each batch appends only new∕new + new∕old.
  *  - `stats`  — per-batch aggregate STATE (count/sum/min/max by
  *               pred_lang), folded with [[RelationalOps.mergeAggStates]]
  *               so corpus totals never rescan anything.
  *
  * == Exactly-once ==
  *
  * Every state table for batch k is written by idempotent OVERWRITE of
  * its own `batch=k` directory, gated on the `_SUCCESS` markers: a
  * replayed `ingestShard` whose batch is fully landed returns without
  * reading anything; a crash mid-shard leaves some tables unmarked and
  * the restart recomputes the batch from batches < k (untouched by the
  * crash) and overwrites — the computation is deterministic, so the
  * landed bytes are the same ones the crashed attempt would have
  * written. (Same contract as the (sink, batch) ledger of
  * [[graft.sinks.ExactlyOnceSink]], with the parquet directory itself
  * as the ledger row.)
  *
  * == Parity contract ==
  *
  * After ingesting shards S₁…Sₙ (in ascending doc-id order — the
  * natural "new data gets new ids" ingestion), [[curated]] is
  * row-for-row identical to the one-shot `CorpusOps.curate(S₁ ∪ … ∪ Sₙ)`
  * — pinned by the c2 battery row, which shares c1's DuckDB oracle.
  * Ascending ids are what make stage-1 exact dedup monotone (a new doc
  * can never displace an old fingerprint's min-id keeper); everything
  * downstream (edge set, connected components, packing) is derived
  * from state alone and is order-free.
  *
  * == Scale shape ==
  *
  * Per shard: the shard's text is scanned once (narrow kernels); the
  * fp check is one column-pruned anti-join against the stored fp
  * column; new∕old candidates are ONE equi-join of the shard's prefix
  * explode against the stored prefix index (bucket the state dir by
  * shingle via [[graft.sinks.ParquetSink.writeBucketed]] to make it
  * exchange-free at 100 TB); the verify fetch joins ship shingle sets
  * only for candidate ids. [[curated]] reads metadata columns only —
  * parquet pruning never touches `sh`.
  */
object IncrementalCurateOps {

  final case class CurateConfig(lang: String = "en",
      minQualityE6: Long = 550000L, shingleN: Int = 3,
      jaccardThreshold: Double = 0.5, budget: Int = 512, shards: Int = 8)

  private val Tables = Seq("docs", "prefix", "edges", "stats")

  /** True iff every state table has a committed `batch=k` directory. */
  def batchLanded(spark: SparkSession, stateDir: String, batchId: Long): Boolean = {
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Tables.forall(t =>
      fs.exists(new Path(s"$stateDir/$t/batch=$batchId/_SUCCESS")))
  }

  /** Batch ids that are visible as state: a batch counts only when ALL
    * of its tables carry `_SUCCESS` — per-table visibility would let a
    * crash between two table writes expose docs without their edges
    * (silently un-deduplicated survivors). The all-or-nothing check is
    * what makes the per-table overwrites compose into an atomic batch.
    */
  private def landedBatchIds(spark: SparkSession, stateDir: String,
      below: Option[Long]): Seq[Long] = {
    val dir = new Path(s"$stateDir/${Tables.head}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("batch=")) None
        else scala.util.Try(name.stripPrefix("batch=").toLong).toOption
      }
      .filter(k => below.forall(k < _))
      .filter(k => batchLanded(spark, stateDir, k))
      .sorted
  }

  private def readState(spark: SparkSession, stateDir: String,
      table: String, below: Option[Long] = None): Option[DataFrame] = {
    val paths = landedBatchIds(spark, stateDir, below)
      .map(k => s"$stateDir/$table/batch=$k")
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Curate one new shard against the state at `stateDir`, landing its
    * stage-1 survivors, prefix-index rows, new near-dup edges, and
    * aggregate-stats state under `batch=<batchId>`. Idempotent per
    * (stateDir, batchId): a replay of a landed batch is a no-op; a
    * restart after a mid-shard crash recomputes and overwrites.
    */
  def ingestShard(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, stateDir: String, batchId: Long,
      cfg: CurateConfig = CurateConfig()): Unit = {
    if (batchLanded(spark, stateDir, batchId)) return

    val scored = newDocs.select(col(idCol).as("doc_id"),
        col(textCol).as("text"),
        TextOps.langId(col(textCol)).as("pred_lang"),
        TextOps.qualityScoreMillionths(col(textCol)).as("quality_e6"))
      .where(col("pred_lang") === cfg.lang &&
        col("quality_e6") >= cfg.minQualityE6)
      .withColumn("fp", TextOps.fingerprint(col("text")))

    // stage-1 exact dedup: min-id per fingerprint WITHIN the shard,
    // then drop any fingerprint the corpus has already kept (old ids
    // precede new ids under the ascending-shard contract, so the old
    // keeper IS the union's min)
    val keepNew = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val withinNew = scored.join(keepNew, Seq("doc_id"), "left_semi")
    val s1New = readState(spark, stateDir, "docs", Some(batchId)) match {
      case Some(old) =>
        withinNew.join(old.select(col("fp")), Seq("fp"), "left_anti")
      case None => withinNew
    }

    // Every downstream consumer (four landed tables + both edge legs)
    // derives from this one frame, whose lineage includes the gate
    // kernels and the fingerprint semi-join — persist it for the
    // duration of the shard's EAGER writes and release before
    // returning (the contaminationHitsBloom owner-release shape: this
    // method has a real owner scope, unlike the lazy query paths).
    val docsNew = s1New.select(col("doc_id"), col("pred_lang"),
      col("quality_e6"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
      md5(CorpusOps.redactPii(col("text"))).as("red_md5"),
      col("fp"),
      array_distinct(TextOps.shingles(col("text"), cfg.shingleN)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // near-dup edges gained by this shard: new/new over the persisted
      // sets, new/old via the persisted prefix index — old text is
      // never re-shingled; only the stored sets of candidate ids ship
      val newNew = DedupOps.ngramJaccardPairsFromSets(
          docsNew.select(col("doc_id").as("id"), col("sh")),
          cfg.jaccardThreshold)
        .select(col("doc_a"), col("doc_b"))
      val newOld = readState(spark, stateDir, "docs", Some(batchId)) match {
        case Some(old) =>
          val oldPrefix = readState(spark, stateDir, "prefix", Some(batchId)).get
          val newPrefix = docsNew.select(col("doc_id"),
            explode(DedupOps.hashPrefixArray(col("sh"), cfg.jaccardThreshold)).as("s"))
          val cand = newPrefix
            .join(oldPrefix.select(col("s"), col("doc_id").as("old_id")), Seq("s"))
            .select(col("doc_id").as("new_id"), col("old_id")).distinct()
          cand
            .join(docsNew.select(col("doc_id").as("new_id"), col("sh").as("sa")),
              Seq("new_id"))
            .join(old.select(col("doc_id").as("old_id"), col("sh").as("sb")),
              Seq("old_id"))
            .select(col("new_id"), col("old_id"),
              size(array_intersect(col("sa"), col("sb"))).as("c"),
              size(col("sa")).as("na"), size(col("sb")).as("nb"))
            .where(col("c").cast("double") / (col("na") + col("nb") - col("c"))
              >= cfg.jaccardThreshold)
            .select(least(col("new_id"), col("old_id")).as("doc_a"),
              greatest(col("new_id"), col("old_id")).as("doc_b"))
        case None => newNew.limit(0)
      }

      val statsNew = docsNew.groupBy(col("pred_lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        min(col("quality_e6")).as("min_quality_e6"),
        max(col("quality_e6")).as("max_quality_e6"))

      def land(df: DataFrame, table: String): Unit =
        df.write.mode(SaveMode.Overwrite)
          .parquet(s"$stateDir/$table/batch=$batchId")
      land(docsNew, "docs")
      land(docsNew.select(col("doc_id"),
        explode(DedupOps.hashPrefixArray(col("sh"), cfg.jaccardThreshold)).as("s"))
        .select(col("s"), col("doc_id")), "prefix")
      land(newNew.unionAll(newOld), "edges")
      land(statsNew, "stats")
    } finally docsNew.unpersist(blocking = false)
  }

  /** The curated corpus after every landed batch: near-dup
    * connected-components representatives with their token-budget pack
    * assignment — the same output shape (and bytes) as one-shot
    * [[CorpusOps.curate]] over the union. Reads state METADATA only:
    * parquet column pruning drops `sh`, edges are pair-sized, and the
    * pack window runs per shard key, never globally.
    */
  def curated(spark: SparkSession, stateDir: String,
      cfg: CurateConfig = CurateConfig()): DataFrame = {
    val docs = readState(spark, stateDir, "docs").getOrElse(
      throw new IllegalStateException(s"no landed batches under $stateDir"))
      .select("doc_id", "pred_lang", "quality_e6", "n_tok", "red_md5")
    val edges = readState(spark, stateDir, "edges").get
    val reps = DedupOps.connectedComponents(
        docs.select(col("doc_id")), "doc_id", edges, "doc_a", "doc_b")
      .where(col("doc_id") === col("cluster"))
      .select("doc_id")
    val s2 = docs.join(reps, Seq("doc_id"), "left_semi")
    CorpusOps.packSequences(s2, "doc_id", "__unused_text",
      cfg.budget, cfg.shards,
      carry = Seq(col("pred_lang"), col("quality_e6"), col("red_md5")),
      tokenCount = Some(col("n_tok")))
  }

  /** Corpus-level aggregate stats by language, folded across batches
    * with [[RelationalOps.mergeAggStates]] — bit-equal to a recompute
    * over the union (counts/sums add, extrema combine; batches are
    * disjoint doc sets).
    */
  def corpusStats(spark: SparkSession, stateDir: String): DataFrame = {
    val parts = landedBatchIds(spark, stateDir, None)
      .map(k => spark.read.parquet(s"$stateDir/stats/batch=$k"))
    require(parts.nonEmpty, s"no landed batches under $stateDir")
    parts.reduce((base, delta) => RelationalOps.mergeAggStates(
      base, delta, keys = Seq("pred_lang"),
      countCols = Seq("n_docs"), sumCols = Seq("sum_tok"),
      minCols = Seq("min_quality_e6"), maxCols = Seq("max_quality_e6")))
  }
}
