package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) SEARCH-INDEX state — the index-maintenance
  * counterpart of the incremental dedup family: a corpus that grows by
  * shards, where searching never re-tokenizes a document or re-assigns
  * a vector that an earlier shard already processed. The one-shot
  * operators ([[RetrievalOps.bm25TopK]], [[SimilarityOps.ivfTopK]])
  * rebuild their index on every call — the per-query
  * O(corpus-tokenize/assign) cost this module moves to ingest time,
  * paid once per shard.
  *
  * == BM25 state (parquet, batch-partitioned: `<table>/batch=<k>/`) ==
  *
  *  - `postings` — (id, token, tf): the shard's inverted-index rows.
  *  - `doclen`   — (id, dl).
  *  - `tokstats` — (token, df): the shard's document frequencies.
  *  - `globals`  — ONE row (n_docs, totlen).
  *
  * Every BM25 statistic is ADDITIVE over disjoint doc sets: corpus df
  * is the sum of per-batch dfs, (N, totlen) the sums of the per-batch
  * globals — so [[bm25Search]] re-aggregates vocabulary-sized /
  * 1-row-sized state and union-reads postings, never text. Because no
  * state row depends on any other batch, BM25 ingestion has NO
  * ordering precondition — shards may land in any order and even
  * concurrently (distinct batch dirs), unlike the edge-producing
  * operators.
  *
  * == IVF state ==
  *
  *  - `centroids` — (ci, cv): the coarse quantizer, k-means-fit ONCE on
  *    the first batch and frozen (the [[IncrementalDedupOps]] codebook
  *    contract — production IVF never refits per insert; it re-trains
  *    offline and reindexes). Landed only under the fit batch.
  *  - `cells` — (cell, cid, cv): each shard's vectors under their
  *    frozen-codebook cell. Bucket by `cell` via
  *    `ParquetSink.writeBucketed` at 100 TB to make the probe join
  *    exchange-free on the corpus side.
  *
  * IVF ingestion requires ascending batch order (the fit batch must be
  * first; a batch landing before it would have no codebook to assign
  * against) — out-of-order ingest throws.
  *
  * == Exactly-once ==
  *
  * Same contract as the rest of the family ([[BatchState]]): idempotent
  * OVERWRITE of `batch=k` gated on all-or-nothing `_SUCCESS` markers;
  * replay of a landed batch is a no-op; a crash mid-shard recomputes
  * deterministically.
  *
  * == Parity contracts (battery-pinned) ==
  *
  *  - [[bm25Search]] after ingesting S₁…Sₙ ≡ one-shot
  *    `bm25TopK(S₁ ∪ … ∪ Sₙ, queries)` row-for-row (x36 shares x30's
  *    oracle) — integer-exact scoring makes this hash-equality, not
  *    approximate parity.
  *  - [[ivfSearch]] ≡ one-shot `ivfTopK` over the union with the
  *    codebook fit on shard 1 (n12's oracle replays the fit with the
  *    generalized k-means CTE chain and the probe ranking).
  *
  * == Scale shape ==
  *
  * Per text shard: one tokenize pass, three shard-local aggregates.
  * Per search: query terms equi-join the accumulated postings ON TOKEN
  * (bounded by the query terms' postings lists, never corpus × queries)
  * — identical to the one-shot plan minus the index build. Per vector
  * shard: one broadcast-literal argmin. Per vector search: probes
  * equi-join the accumulated cells ON CELL — candidates are
  * (nProbe/nCells)·corpus, never corpus × queries.
  */
object IncrementalIndexOps {

  import BatchState.{landedBatchIds, requireInOrder, land, readBatches}

  // ------------------------------------------------------------- BM25

  private[graft] val Bm25Tables =
    Seq("postings", "doclen", "tokstats", "globals")

  /** True iff every BM25 state table has a committed `batch=k` dir. */
  def textBatchLanded(spark: SparkSession, stateDir: String,
      batchId: Long): Boolean =
    BatchState.allLanded(spark, stateDir, Bm25Tables, batchId)

  /** Tokenize one new document shard into the inverted-index state.
    * Idempotent per (stateDir, batchId); order-free (see object doc).
    */
  def ingestTextShard(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, root: String, batchId: Long): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      ingestTextShardBody(spark, docs, idCol, textCol, stateDir, batchId)
    }
  }

  private def ingestTextShardBody(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, stateDir: String,
      batchId: Long): Unit = {
    if (textBatchLanded(spark, stateDir, batchId)) return
    val postings = docs
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docLen = postings.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
      // all four state tables derive from the one persisted frame and
      // land independently — overlapped ([[BatchState.inParallel]])
      BatchState.inParallel(Seq(
        () => land(postings, stateDir, "postings", batchId),
        () => land(docLen, stateDir, "doclen", batchId),
        () => land(postings.groupBy(col("token")).agg(count(lit(1)).as("df")),
          stateDir, "tokstats", batchId),
        () => land(docLen.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("totlen")), stateDir, "globals", batchId)))
    } finally postings.unpersist(blocking = false)
  }

  // ---- tombstones: the deletion ledger lives under its own BatchState
  // root (`<stateDir>/_deletes`) so its batch ids and compaction
  // manifest never interfere with the ingest tables' — one shared
  // manifest would let a postings compaction watermark silently hide
  // the deletion history (or vice versa)

  private[graft] val DelTables =
    Seq("del_ids", "del_tokstats", "del_globals")

  /** The deletion ledger's own BatchState root. */
  private[graft] def deletionRoot(stateDir: String): String =
    s"$stateDir/_deletes"

  private def delDir(stateDir: String): String = deletionRoot(stateDir)

  /** Retract documents from the inverted-index state — the curation
    * composition (dedup losers, takedowns) that an append-only index
    * cannot express without a rebuild. BM25's statistics are additive,
    * so a deletion is a NEGATIVE-delta batch: per-token −df for the
    * deleted docs' vocabularies and one −(n_docs, totlen) row, both
    * derived from the STORED postings/doclen (text is never re-read);
    * the doc ids land in a tombstone set that [[bm25Search]] anti-joins
    * against postings and doclen. Deletion batches carry their own
    * ascending id space under `<stateDir>/_deletes` — idempotent per
    * (stateDir, batchId), in-order enforced, and ids not currently
    * indexed (or already tombstoned) contribute nothing, so a replay or
    * an over-broad deletion set can never push a statistic negative.
    *
    * Contract note: deletion is by id and permanent for that id —
    * corpus ids are unique and never reused (the family's standing
    * ascending-id assumption); re-introducing a deleted document means
    * ingesting it under a fresh id.
    *
    * IO shape: computing the deltas is one column-pruned scan of the
    * accumulated postings semi-joined by the (tiny, broadcast) deletion
    * set — per DELETION BATCH, not per search. At 100 TB bucket the
    * postings by id ([[graft.sinks.ParquetSink.writeBucketed]]) so the
    * semi-join prunes to the deleted ids' buckets; deletions being rare
    * relative to searches is what makes scan-at-delete the right side
    * of the trade (the search path pays only the tombstone anti-join,
    * and [[purgeText]] retires even that).
    */
  /** [[deleteTextDocs]] with the batch id chosen INSIDE the writer
    * leases (above everything landed or promised) — the form concurrent
    * callers should use: an id chosen outside the lease can be raced to
    * by another deletion, whose idempotency check then silently absorbs
    * the loser's ids.
    */
  def deleteTextDocs(spark: SparkSession, dels: DataFrame, idCol: String,
      root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    // the MAIN lease alone protects the id choice (every deletion
    // writer takes it first) without creating the deletion root on a
    // directory where this call turns out to be a no-op
    BatchState.withLease(spark, stateDir) {
      deleteTextDocs(spark, dels, idCol, stateDir,
        BatchState.nextTombstoneBatchId(spark, stateDir, DelTables))
    }
  }

  def deleteTextDocs(spark: SparkSession, dels: DataFrame, idCol: String,
      root: String, batchId: Long): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    // BOTH leases: the parent's (mutual exclusion with ingest and with
    // the main-table compaction) and the deletion root's own (mutual
    // exclusion with compactState(delDir), which holds only that one —
    // without it a landing tombstone batch could be destroyed as a
    // "crashed prior attempt" by a concurrent delete-ledger compaction)
    BatchState.withLease(spark, stateDir) {
      val landed = landedBatchIds(spark, stateDir, Bm25Tables, None)
      require(landed.nonEmpty,
        s"no landed batches under $stateDir — nothing to delete from")
      val asked = dels.select(col(idCol).as("id")).distinct()
      // only ids that are indexed AND not already tombstoned produce
      // deltas — double-deletes and unknown ids are exact no-ops. On a
      // bucketed directory ([[bucketTextState]]) both probes scan only
      // the asked ids' buckets
      val indexed = asked.join(
        BatchState.readBatchesPrunedBy(spark, stateDir, "doclen", landed,
          asked, "id").get, Seq("id"),
        "left_semi")
      // a deletion that would be a COMPLETE no-op must not create the
      // deletion root on a pristine directory (whose searches would pay
      // the deletion listing forever after)
      if (hasDeletions(spark, stateDir) || !indexed.isEmpty)
        BatchState.withLease(spark, delDir(stateDir)) {
        healPurge(spark, stateDir)
        if (!BatchState.allLanded(spark, delDir(stateDir), DelTables,
            batchId)) {
          val delLanded =
            landedBatchIds(spark, delDir(stateDir), DelTables, None)
          requireInOrder(delLanded, batchId)
          val newDel = readBatches(spark, delDir(stateDir), "del_ids",
              delLanded) match {
            case Some(prev) => indexed.join(prev, Seq("id"), "left_anti")
            case None => indexed
          }
          // pruned by `asked` (a superset of newDel's buckets): the
          // bucket set comes from the caller's tiny id frame, never
          // from re-evaluating the newDel join
          val delPostings = BatchState.readBatchesPrunedBy(spark,
              stateDir, "postings", landed, asked, "id")
            .get.join(newDel, Seq("id"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // `ceiling` records the max MAIN batch id this delta was
            // derived against: an as-of cut at or above every landed
            // ceiling is consistent with the interleaved (ingest,
            // delete) ledger order — the deltas only reference docs in
            // batches ≤ ceiling — which is what lets the audit verb
            // serve tombstoned-but-unpurged directories for ALIGNED
            // cuts instead of refusing outright.
            // The three delta tables derive from the one persisted
            // probe and land independently — overlapped
            // ([[BatchState.inParallel]])
            BatchState.inParallel(Seq(
              () => land(newDel, delDir(stateDir), "del_ids", batchId),
              () => land(delPostings.groupBy(col("token"))
                .agg((-count(lit(1))).as("df")),
                delDir(stateDir), "del_tokstats", batchId),
              () => land(delPostings.groupBy(col("id"))
                .agg(sum(col("tf")).as("dl"))
                .agg((-count(lit(1))).as("n_docs"),
                  (-coalesce(sum(col("dl")), lit(0L))).as("totlen"))
                .withColumn("ceiling", lit(landed.max)),
                delDir(stateDir), "del_globals", batchId)))
          } finally delPostings.unpersist(blocking = false)
        }
        }
    }
  }

  /** BM25 top-k over the accumulated index — row-identical to
    * [[RetrievalOps.bm25TopK]] on the union of every ingested shard
    * MINUS every tombstoned document (same integer-rational scoring,
    * same tie-break), with the index build amortized away: df and the
    * (N, totlen) pair are ONE re-aggregate of vocabulary-sized /
    * single-row state (deletion deltas sum right in), candidates one
    * equi-join of query terms against the accumulated postings
    * anti-joined by the tombstone set (deleted-id-count-sized — tiny
    * next to the postings it filters).
    */
  def bm25Search(spark: SparkSession, root: String, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int = 10): DataFrame =
    bm25Search(spark, root, queries, qidCol, qtextCol, k, None)

  /** [[bm25Search]] AS OF a batch id: the index as it stood when
    * `asOfBatch` was the newest landed batch — the audit/debug verb
    * ("what did this query return before shard N landed?"). Only
    * batches with id ≤ `asOfBatch` participate, statistics included,
    * so the result is row-identical to a search taken at that moment.
    *
    * Honest bounds, loudly enforced: history exists only until
    * compaction folds it (a merged batch is one id — asking for a cut
    * below the watermark throws via the emptiness require) unless a
    * history floor retains it ([[retainTextHistory]] — folded cuts
    * then resolve through the pre-fold manifests). Tombstoned
    * directories serve ALIGNED cuts only: each deletion batch records
    * the max main batch id its delta was derived against (`ceiling`),
    * and a cut at or above every landed ceiling is consistent with
    * the interleaved (ingest, delete) ledger order — the deltas only
    * touch batches inside the cut. A cut below any ceiling refuses
    * (applying those deltas would corrupt df/globals): purge first,
    * or pick an aligned cut.
    */
  def bm25Search(spark: SparkSession, root: String, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int,
      asOfBatch: Option[Long]): DataFrame = {
    require(k >= 1 && k <= 1000, s"k in 1..1000, got $k")
    val stateDir = BatchState.resolveGeneration(spark, root)
    val delLanded =
      if (!hasDeletions(spark, stateDir)) Seq.empty[Long]
      // a committed-but-unretired purge already folded every delta into
      // the merged tables — the surviving tombstones must NOT re-apply
      else if (purgeCommitted(spark, stateDir)) Seq.empty[Long]
      else landedBatchIds(spark, delDir(stateDir), DelTables, None)
    asOfBatch.foreach { c =>
      // tombstone deltas are derived against the postings AT DELETE
      // TIME, so an arbitrary cut cannot apply them consistently — but
      // a cut at or above EVERY landed deletion's recorded ceiling (the
      // max main batch id its delta referenced) IS consistent with the
      // interleaved (ingest, delete) ledger order: every delta touches
      // only batches inside the cut. Aligned cuts serve; others refuse.
      // (delLanded is shared with the search body below; readTombstones
      // supplies the memoized effective-emptiness verdict, so an
      // all-no-op deletion history never refuses a cut.)
      if (delLanded.nonEmpty &&
          BatchState.readTombstones(spark, stateDir, DelTables).nonEmpty) {
        val g = readBatches(spark, delDir(stateDir), "del_globals",
          delLanded).get
        val maxCeil =
          if (!g.columns.contains("ceiling")) Long.MaxValue
          else {
            val r = g.agg(max(col("ceiling"))).head
            if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
          }
        require(maxCeil <= c,
          s"$stateDir holds live tombstones derived against batches " +
            s"up to $maxCeil — cut $c is not aligned with the " +
            "interleaved ingest/delete order; cut at or above every " +
            "deletion's ceiling, or purge first")
      }
    }
    val landed = asOfBatch match {
      case Some(c) =>
        BatchState.landedBatchIdsAsOf(spark, stateDir, Bm25Tables, c)
      case None => landedBatchIds(spark, stateDir, Bm25Tables, None)
    }
    require(landed.nonEmpty,
      s"no landed batches under $stateDir" + asOfBatch.map(b =>
        s" at or below batch $b (compaction may have folded the " +
          "history you are asking for)").getOrElse(""))
    val deleted = readBatches(spark, delDir(stateDir), "del_ids", delLanded)
    def live(df: DataFrame): DataFrame = deleted match {
      case Some(d) => df.join(d, Seq("id"), "left_anti")
      case None => df
    }
    val postings = live(readBatches(spark, stateDir, "postings", landed).get)
    val docLen = live(readBatches(spark, stateDir, "doclen", landed).get)
    val withDl = postings.join(docLen, Seq("id"))
    // df adds across disjoint batches, deletion deltas subtract; a
    // token whose postings are all tombstoned sums to 0 and drops —
    // the exact dfTab a from-scratch build over the survivors produces
    val tokAll = readBatches(spark, stateDir, "tokstats", landed).get
    val dfTab = (readBatches(spark, delDir(stateDir), "del_tokstats",
        delLanded) match {
      case Some(d) => tokAll.unionAll(d)
      case None => tokAll
    }).groupBy(col("token")).agg(sum(col("df")).as("df"))
      .where(col("df") > 0)
    val globAll = readBatches(spark, stateDir, "globals", landed).get
    val globals = (readBatches(spark, delDir(stateDir), "del_globals",
        delLanded) match {
      // project: the delta rows also carry the alignment `ceiling`
      case Some(d) => globAll.unionAll(d.select("n_docs", "totlen"))
      case None => globAll
    }).agg(sum(col("n_docs")).as("n_docs"), sum(col("totlen")).as("totlen"))
    // the SAME scoring tail as the one-shot build — parity by shared
    // code, not by a copy that can drift
    RetrievalOps.rankCandidates(withDl, dfTab, globals, queries,
      "id", qidCol, qtextCol, k)
  }

  /** Compact the inverted-index state into one batch — postings,
    * doclen, per-batch df and globals all concatenate (every BM25
    * statistic is additive, so [[bm25Search]]'s re-aggregation is
    * untouched); see [[BatchState.compactState]] for the crash-safe
    * manifest protocol and [[IncrementalCurateOps.compact]] for when to
    * run it.
    */
  def compactText(spark: SparkSession, root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.compactWithDeletions(spark, stateDir,
      additiveTables = Bm25Tables, snapshotTables = Seq.empty,
      delTables = DelTables)
  }

  // the shared tombstone/purge machinery lives in [[BatchState]] —
  // these keep the family-local names readable
  private def hasDeletions(spark: SparkSession, stateDir: String): Boolean =
    BatchState.hasDeletionRoot(spark, stateDir)
  private def purgeCommitted(spark: SparkSession,
      stateDir: String): Boolean =
    BatchState.purgeCommitted(spark, stateDir)
  private def healPurge(spark: SparkSession, stateDir: String,
      delTables: Seq[String] = DelTables): Unit =
    BatchState.healPurge(spark, stateDir, delTables)

  /** PHYSICALLY reclaim tombstoned documents: one transformed
    * compaction that anti-joins the tombstone set out of
    * postings/doclen and RECOMPUTES tokstats/globals from the
    * survivors, then retires the whole deletion root — after which
    * searches pay neither the anti-join nor the delta re-aggregation,
    * and the bytes are actually gone (the logical tombstones of
    * [[deleteTextDocs]] retract correctness-wise but keep paying
    * storage and one anti-join per search forever).
    *
    * Crash-safe across the two roots via a commit ARBITER: the purge
    * records the main manifest version its flip will create in
    * `_deletes/.purged_at` BEFORE compacting; readers and writers then
    * decide "deltas live" vs "deltas folded" by comparing the current
    * main version against the marker ([[purgeCommitted]] — version
    * read first, see there). A crash before the flip leaves the marker
    * stale (discarded by the next writer); a crash after the flip
    * leaves tombstones that every reader ignores and the next writer
    * retires ([[healPurge]]). Use [[compactText]]/[[deleteTextDocs]]/
    * this — never raw `BatchState.compactState` — on a BM25 state
    * directory that has ever had deletions, so the healing always runs
    * under the leases first.
    */
  def purgeText(spark: SparkSession, root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.purgeState(spark, stateDir, additiveTables = Bm25Tables,
      snapshotTables = Seq.empty, delTables = DelTables) { deleted =>
      val landed = landedBatchIds(spark, stateDir, Bm25Tables, None)
      def survivors(table: String) =
        readBatches(spark, stateDir, table, landed).get
          .join(deleted, Seq("id"), "left_anti")
      val t: (String, DataFrame) => DataFrame = {
        case ("postings", df) => df.join(deleted, Seq("id"), "left_anti")
        case ("doclen", df) => df.join(deleted, Seq("id"), "left_anti")
        case ("tokstats", _) => survivors("postings")
          .groupBy(col("token")).agg(count(lit(1)).as("df"))
        case ("globals", _) => survivors("doclen")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("totlen"))
        case (_, df) => df
      }
      t
    }
  }

  /** `DESCRIBE` for a BM25 state root ([[BatchState.describeState]]):
    * batches, manifest/watermark, TTL floor, deletion state, params —
    * metadata-only, generation-resolved.
    */
  def describeTextState(spark: SparkSession, root: String): DataFrame =
    BatchState.describeState(spark, root, Bm25Tables, DelTables)

  /** `DESCRIBE` for an IVF state root. */
  def describeVectorState(spark: SparkSession, root: String): DataFrame =
    BatchState.describeState(spark, root, IvfTables, VecDelTables)

  /** Age-based retention for the BM25 family
    * ([[BatchState.setRetention]]): retire every index batch below
    * `minActiveBatchId` from the active view — the TTL verb ("drop
    * shards older than the training-data cutoff") completing the
    * family's operational set (ingest/delete/purge/compact/reindex).
    * Exact by construction: every BM25 statistic is additive over
    * per-batch-disjoint doc sets, so the TTL'd view IS the index of
    * the surviving batches. Requires a tombstone-free directory (purge
    * first): a live deletion delta references the whole pre-TTL corpus
    * — its negative df/globals rows for docs in retired batches would
    * undercount the surviving statistics.
    *
    * TTL granularity is the PRE-compaction batch id space: compaction
    * folds every active batch into ONE merged id at the top of the id
    * space, after which a floor can only keep everything (floor ≤
    * merged id) or retire everything — "drop shards older than X"
    * stops being expressible once the shards are folded. Expire BEFORE
    * compacting, or run compaction on a cadence coarser than the TTL.
    */
  def expireTextBatches(spark: SparkSession, root: String,
      minActiveBatchId: Long): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      require(BatchState.readTombstones(spark, stateDir, DelTables).isEmpty,
        s"$stateDir holds live tombstones; purge before expiring — " +
          "deletion deltas reference retired batches' statistics")
      BatchState.setRetention(spark, stateDir, minActiveBatchId)
    }
  }

  /** Age-based retention for the IVF family — exact for the same
    * reason (cells are per-batch-disjoint postings; the frozen
    * codebook lives outside batch visibility and survives the TTL).
    * Same granularity caveat as [[expireTextBatches]]: compaction
    * folds the batch id space, so expire before compacting.
    */
  def expireVectorBatches(spark: SparkSession, root: String,
      minActiveBatchId: Long): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      require(BatchState.readTombstones(spark, stateDir,
        VecDelTables).isEmpty,
        s"$stateDir holds live tombstones; purge before expiring")
      BatchState.setRetention(spark, stateDir, minActiveBatchId)
    }
  }

  /** Opt-in bucketed layout for the scan-heavy BM25 tables
    * ([[BatchState.setBucketing]]): postings and doclen land as
    * `batch=k/gbkt=hash(id)%n` partitions, so a deletion's delta
    * derivation — the per-batch cost of the streaming deletion twin —
    * scans only the deleted ids' buckets instead of the whole table
    * (partition pruning at planning time). Declare BEFORE the first
    * ingest; search results are bit-identical either way.
    */
  def bucketTextState(spark: SparkSession, root: String,
      nBuckets: Int): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.setBucketing(spark, stateDir, "postings", "id", nBuckets)
    BatchState.setBucketing(spark, stateDir, "doclen", "id", nBuckets)
  }

  /** [[bucketTextState]] for the IVF family: cell postings bucketed by
    * the vector id, pruning the deletion probe's scan.
    */
  def bucketVectorState(spark: SparkSession, root: String,
      nBuckets: Int): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.setBucketing(spark, stateDir, "cells", "cid", nBuckets)
  }

  /** Declare audit-history retention for a BM25 root
    * ([[BatchState.setHistoryFloor]]): compaction keeps folded batch
    * directories at or above `floor` on disk (invisible to the live
    * view), so [[bm25Search]] with `asOfBatch` can resolve cuts BELOW
    * a fold through the pre-fold manifest — the audit verb survives
    * routine compaction. Raising the floor is the history-GC verb;
    * cuts below it refuse loudly. A purge overrides retention
    * (compliance beats audit).
    */
  def retainTextHistory(spark: SparkSession, root: String,
      floor: Long = 0L): Unit =
    BatchState.setHistoryFloor(spark,
      BatchState.resolveGeneration(spark, root), floor)

  /** [[retainTextHistory]] for an IVF root. */
  def retainVectorHistory(spark: SparkSession, root: String,
      floor: Long = 0L): Unit =
    BatchState.setHistoryFloor(spark,
      BatchState.resolveGeneration(spark, root), floor)

  /** Reclaim superseded BM25 generations after a cutover
    * ([[BatchState.retireGenerations]]): reindex → cutover → retire
    * leaves exactly ONE generation on disk — without it every cutover
    * doubles the index's storage footprint forever. Crash-safe and
    * re-runnable; searches through the root are untouched.
    */
  def retireTextGenerations(spark: SparkSession, root: String): Unit =
    BatchState.retireGenerations(spark, root, Bm25Tables)

  /** [[retireTextGenerations]] for the IVF family (the frozen
    * codebook's `centroids` table is part of each generation's inline
    * state).
    */
  def retireVectorGenerations(spark: SparkSession, root: String): Unit =
    BatchState.retireGenerations(spark, root, IvfTables :+ "centroids")

  // -------------------------------------------------------------- IVF

  private[graft] val IvfTables = Seq("cells")

  /** True iff the batch's cells landed and a committed codebook exists. */
  def vectorBatchLanded(spark: SparkSession, stateDir: String,
      batchId: Long): Boolean =
    BatchState.allLanded(spark, stateDir, IvfTables, batchId) &&
      BatchState.hasCodebook(spark, stateDir)

  /** Assign one new vector shard under the frozen codebook and land its
    * cell postings. Whichever batch first finds no committed codebook
    * fits it ([[SimilarityOps.kmeansFit]], nCells/iters) on its own
    * vectors and freezes it ([[BatchState.ensureCodebook]]).
    * Idempotent per (stateDir, batchId); out-of-order ingest and
    * parameter drift throw.
    */
  def ingestVectorShard(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, root: String, batchId: Long,
      nCells: Int, iters: Int): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      ingestVectorShardBody(spark, emb, idCol, vecCol, stateDir, batchId,
        nCells, iters)
    }
  }

  private def ingestVectorShardBody(spark: SparkSession, emb: DataFrame,
      idCol: String, vecCol: String, stateDir: String, batchId: Long,
      nCells: Int, iters: Int): Unit = {
    if (vectorBatchLanded(spark, stateDir, batchId)) return
    BatchState.ensureParams(spark, stateDir,
      Map("nCells" -> nCells.toString, "iters" -> iters.toString))
    val landed = landedBatchIds(spark, stateDir, IvfTables, None)
    requireInOrder(landed, batchId)
    val cents = BatchState.ensureCodebook(spark, stateDir, batchId) {
      SimilarityOps.kmeansFit(emb, idCol, vecCol, nCells, iters)._1
    }
    land(emb.select(col(idCol).as("cid"),
        SimilarityOps.asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", SimilarityOps.ivfCell(col("cv"), cents))
      .select(col("cell"), col("cid"), col("cv")),
      stateDir, "cells", batchId)
  }

  // IVF deletions carry no statistics (search is pure candidate
  // ranking), so the tombstone root holds only the id set
  private[graft] val VecDelTables = Seq("del_ids")

  /** Retract vectors from the IVF index — the tombstone counterpart of
    * [[deleteTextDocs]] for the vector modality, simpler because IVF
    * search carries no corpus statistics: the deletion batch is just
    * the id set, anti-joined against the accumulated cells at search.
    * Same contracts: own BatchState root (`<stateDir>/_deletes`), own
    * ascending batch ids, idempotent per (stateDir, batchId), unknown
    * and already-tombstoned ids are exact no-ops, deletion is by id and
    * permanent (ids are never reused).
    */
  /** [[deleteVectors]] with the batch id chosen inside the main lease —
    * see the [[deleteTextDocs]] overload for why.
    */
  def deleteVectors(spark: SparkSession, dels: DataFrame, idCol: String,
      root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      deleteVectors(spark, dels, idCol, stateDir,
        BatchState.nextTombstoneBatchId(spark, stateDir, VecDelTables))
    }
  }

  def deleteVectors(spark: SparkSession, dels: DataFrame, idCol: String,
      root: String, batchId: Long): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.withLease(spark, stateDir) {
      val landed = landedBatchIds(spark, stateDir, IvfTables, None)
      require(landed.nonEmpty,
        s"no landed batches under $stateDir — nothing to delete from")
      val asked = dels.select(col(idCol).as("id")).distinct()
      // bucketed directories ([[bucketVectorState]]) scan only the
      // asked ids' buckets of the cell postings
      val indexed = asked.join(
        BatchState.readBatchesPrunedBy(spark, stateDir, "cells", landed,
          asked, "id").get
          .select(col("cid").as("id")), Seq("id"), "left_semi")
      // never create the deletion root for a complete no-op
      if (hasDeletions(spark, stateDir) || !indexed.isEmpty)
        BatchState.withLease(spark, delDir(stateDir)) {
          healPurge(spark, stateDir, VecDelTables)
          if (!BatchState.allLanded(spark, delDir(stateDir), VecDelTables,
              batchId)) {
            val delLanded =
              landedBatchIds(spark, delDir(stateDir), VecDelTables, None)
            requireInOrder(delLanded, batchId)
            val newDel = readBatches(spark, delDir(stateDir), "del_ids",
                delLanded) match {
              case Some(prev) => indexed.join(prev, Seq("id"), "left_anti")
              case None => indexed
            }
            land(newDel, delDir(stateDir), "del_ids", batchId)
          }
        }
    }
  }

  /** Physically reclaim tombstoned vectors — [[purgeText]]'s vector
    * twin (same commit-arbiter protocol, same healing), one transformed
    * compaction that anti-joins the tombstone set out of `cells`.
    */
  def purgeVectors(spark: SparkSession, root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.purgeState(spark, stateDir, additiveTables = IvfTables,
      snapshotTables = Seq.empty, delTables = VecDelTables) { deleted0 =>
      val deleted = deleted0.select(col("id").as("cid"))
      val t: (String, DataFrame) => DataFrame = {
        case ("cells", df) => df.join(deleted, Seq("cid"), "left_anti")
        case (_, df) => df
      }
      t
    }
  }

  /** Compact the IVF cell postings into one batch (additive facts;
    * the frozen codebook lives outside batch visibility and is
    * untouched). Heals crashed purges first — see [[compactText]].
    */
  def compactVectors(spark: SparkSession, root: String): Unit = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    BatchState.compactWithDeletions(spark, stateDir,
      additiveTables = IvfTables, snapshotTables = Seq.empty,
      delTables = VecDelTables)
  }

  /** Offline codebook REFIT + state-only reindex — the operator the
    * frozen-codebook contract points at when the embedding distribution
    * drifts ("production IVF re-trains offline and reindexes"): refit
    * the coarse quantizer on a deterministic hash-sample of the STORED
    * vectors and re-assign every stored vector under the new codebook,
    * landing the result as batch 0 of a FRESH `newStateDir` whose
    * params record the bumped `generation`. Source embeddings are never
    * re-read — the state's `cells` table carries the vectors, so the
    * cost is one scan of the index itself (at `sampleFraction` < 1 the
    * k-means fit sees only the hash-selected subset; the re-assignment
    * always covers everything). The old directory is untouched: cut
    * searches over to `newStateDir`, resume [[ingestVectorShard]] on
    * top of it (batch ids restart above 0), and retire the old one.
    *
    * With `sampleFraction` = 1 the new index is row-identical to a
    * fresh ingest of all stored vectors under a from-scratch fit
    * (equality-spec'd); a sampled refit is the 100 TB path — the fit
    * cost is bounded while assignment stays exact.
    */
  def reindexVectors(spark: SparkSession, oldRoot: String,
      newStateDir: String, nCells: Int, iters: Int,
      sampleFraction: Double = 1.0): Unit = {
    val oldStateDir = BatchState.resolveGeneration(spark, oldRoot)
    BatchState.withLease(spark, oldStateDir) {
      BatchState.withLease(spark, newStateDir) {
        require(sampleFraction > 0 && sampleFraction <= 1.0,
          s"sampleFraction in (0, 1], got $sampleFraction")
        val landedOld = landedBatchIds(spark, oldStateDir, IvfTables, None)
        require(landedOld.nonEmpty, s"no landed batches under $oldStateDir")
        // FRESH means no landed batches — a codebook/params remnant of a
        // CRASHED prior reindex is fine to retry over (the fit is
        // deterministic on the same stored vectors, so the committed
        // codebook is the one this run would produce), as long as the
        // retry's sample matches the one that fit it
        require(landedBatchIds(spark, newStateDir, IvfTables, None).isEmpty,
          s"$newStateDir already holds landed batches; reindex lands " +
            "into a FRESH directory so readers cut over atomically")
        val prior = BatchState.readParams(spark, newStateDir)
        require(prior.get("refit_sample")
            .forall(_ == sampleFraction.toString),
          s"$newStateDir holds a crashed prior reindex fit on " +
            s"sampleFraction ${prior.get("refit_sample").get}, but this " +
            s"retry uses $sampleFraction — its committed codebook would " +
            "be silently reused; delete the directory to change the " +
            "sample")
        // survivors only: a reindex that re-assigned tombstoned vectors
        // would resurrect them into the new generation (which starts
        // with a clean, empty deletion root)
        val allStored = readBatches(spark, oldStateDir, "cells", landedOld)
          .get.select(col("cid"), col("cv"))
        val stored = BatchState.readTombstones(spark, oldStateDir,
            VecDelTables) match {
          case Some(d) => allStored.join(d.select(col("id").as("cid")),
            Seq("cid"), "left_anti")
          case None => allStored
        }
        val fitSet =
          if (sampleFraction >= 1.0) stored
          else stored.where(
            pmod(abs(xxhash64(col("cid").cast("string"))), lit(1000000L))
              < lit(math.round(sampleFraction * 1000000L)))
        val generation = BatchState.readParams(spark, oldStateDir)
          .get("generation").map(_.toLong).getOrElse(0L) + 1
        BatchState.ensureParams(spark, newStateDir, Map(
          "nCells" -> nCells.toString, "iters" -> iters.toString,
          "generation" -> generation.toString,
          "refit_sample" -> sampleFraction.toString))
        val cents = BatchState.ensureCodebook(spark, newStateDir, 0L) {
          SimilarityOps.kmeansFit(fitSet, "cid", "cv", nCells, iters)._1
        }
        land(stored
          .withColumn("cell", SimilarityOps.ivfCell(col("cv"), cents))
          .select(col("cell"), col("cid"), col("cv")),
          newStateDir, "cells", 0L)
      }
    }
  }

  /** IVF top-k over the accumulated index — row-identical to
    * [[SimilarityOps.ivfTopK]] on the union with the frozen codebook:
    * each query probes its `nProbe` nearest cells (broadcast-literal
    * distances), candidates are one equi-join against the accumulated
    * cell postings, exact cosine ranks them.
    */
  def ivfSearch(spark: SparkSession, root: String, queries: DataFrame,
      nProbe: Int, k: Int): DataFrame =
    ivfSearch(spark, root, queries, nProbe, k, None)

  /** [[ivfSearch]] AS OF a batch id — same contract as the BM25 twin:
    * only cells with batch id ≤ `asOfBatch` are candidates (the frozen
    * codebook is outside batch visibility and serves every cut),
    * history lives until compaction folds it, and live tombstones
    * refuse the cut (purge first).
    */
  def ivfSearch(spark: SparkSession, root: String, queries: DataFrame,
      nProbe: Int, k: Int, asOfBatch: Option[Long]): DataFrame = {
    val stateDir = BatchState.resolveGeneration(spark, root)
    asOfBatch.foreach { _ =>
      require(BatchState.readTombstones(spark, stateDir,
        VecDelTables).isEmpty,
        s"$stateDir holds live tombstones; as-of reads cannot cut " +
          "deletion history consistently — purge first")
    }
    val landed = asOfBatch match {
      case Some(c) =>
        BatchState.landedBatchIdsAsOf(spark, stateDir, IvfTables, c)
      case None => landedBatchIds(spark, stateDir, IvfTables, None)
    }
    require(landed.nonEmpty,
      s"no landed batches under $stateDir" + asOfBatch.map(b =>
        s" at or below batch $b (compaction may have folded the " +
          "history you are asking for)").getOrElse(""))
    val cents = BatchState.readCodebook(spark, stateDir)
    val allCells = readBatches(spark, stateDir, "cells", landed).get
    // tombstones ([[deleteVectors]]): anti-join the effective set (None
    // when absent, all-no-op, or already folded by a committed purge)
    val cells = BatchState.readTombstones(spark, stateDir,
        VecDelTables) match {
      case Some(d) => allCells.join(d.select(col("id").as("cid")),
        Seq("cid"), "left_anti")
      case None => allCells
    }
    val q = queries.withColumn("cell",
      explode(SimilarityOps.ivfProbes(col("qv"), cents, nProbe)))
    val scored = q.join(cells, Seq("cell"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        SimilarityOps.cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("qid", "cid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
