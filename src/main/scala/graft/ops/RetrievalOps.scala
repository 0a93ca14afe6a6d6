package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus — the operator behind
  * retrieval-based decontamination and RAG-curation sweeps ("for each
  * benchmark question, which training documents would a BM25 searcher
  * surface?"), which score documents against a QUERY SET rather than
  * joining document-to-document like the dedup family.
  *
  * Scale shape: classic distributed inverted-index retrieval. The
  * corpus is tokenized once into a postings table (one shuffle keyed
  * by doc); document frequency and the (N, total-length) pair are
  * vocabulary-sized / 1-row aggregates; query terms equi-join the
  * postings ON TOKEN, so candidates are bounded by the postings lists
  * of the query's terms — never corpus × queries. The per-(query, doc)
  * regroup and the per-query top-k window are the only corpus-scale
  * shuffles. Driver-side state: none (the two global scalars ride a
  * 1-row broadcast crossJoin, the lmBackoffScore pattern).
  */
object RetrievalOps {

  /** BM25 top-k retrieval with EXACT integer-rational scoring.
    *
    * Classic BM25 (Robertson–Spärck Jones) is log- and float-valued,
    * which cannot hash-match a cross-engine oracle under reordered
    * partial aggregation. This variant keeps BM25's two saturation
    * ideas — term-frequency damping and length normalization — but
    * replaces the log-idf with the raw rarity ratio N/df and evaluates
    * the whole per-term contribution as ONE long floor-division, so
    * every intermediate is exact integer arithmetic (the x16/x25/g4
    * integer-parity pattern):
    *
    *   contrib(q,d,t) = ⌊ SCALE · (N/df(t)) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) ⌋
    *
    * with k1 = 1.2, b = 0.75, SCALE = 1000 (milli-points). Multiplying
    * through by 40·totlen (avgdl = totlen/N) clears every fraction:
    *
    *   contrib = (N · 88 · tf · totlen · 1000)
    *             div (df · (40·tf·totlen + 12·totlen + 36·dl·N))
    *
    * A document's score is the Long SUM of its matched terms'
    * contributions — a sum of integers, bit-exact under any partial-agg
    * order. Under uniform corpus replication every factor pair (N,df),
    * (totlen, dl·N) inflates together, so scores are provably
    * replication-invariant — the volume-probe law.
    *
    * Overflow: the numerator is bounded by N·88000·tf·totlen; ANSI mode
    * turns an overflow into a loud error rather than a wrong score. At
    * 10⁸ docs × 10⁴ avg tokens, switch SCALE to 1 or route the product
    * through decimal(38,0) (the x26 move) — documented, not silent.
    *
    * Output: one row per (query, rank ≤ k): qid, rank, doc id, integer
    * score, n_match (terms matched). Ties break on ascending doc id —
    * deterministic, and under replication the clone ids are strictly
    * larger, so base queries return their base top-k verbatim at any
    * replication factor.
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      qidCol: String, qtextCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"k in 1..1000, got $k")
    val postings = corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // dl = Σ tf per doc; the join back rides the postings' existing
    // doc-key partitioning (no second tokenize pass, no extra shuffle)
    val docLen = postings.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val withDl = postings.join(docLen, Seq(idCol))
    val dfTab = postings.groupBy("token").agg(count(lit(1)).as("df"))
    // N counts docs with ≥1 token (the only docs an inverted index
    // can ever surface); totlen is the matching token mass
    val globals = docLen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("totlen"))
    rankCandidates(withDl, dfTab, globals, queries,
      idCol, qidCol, qtextCol, k)
  }

  /** The shared BM25 scoring tail — query-term explode → postings
    * equi-join → integer-rational contribution → per-(query, doc) sum →
    * per-query top-k. ONE definition serves the one-shot index build
    * above and [[IncrementalIndexOps.bm25Search]]'s accumulated-state
    * path, which is what makes their hash-exact parity contract (x36 ≡
    * x30) a structural property instead of a copy that can drift.
    * `withDl` = (idCol, token, tf, dl); `dfTab` = (token, df);
    * `globals` = one row (n_docs, totlen).
    */
  private[graft] def rankCandidates(withDl: DataFrame, dfTab: DataFrame,
      globals: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, qtextCol: String, k: Int): DataFrame = {
    val qTerms = queries
      .select(col(qidCol), explode(TextOps.tokens(col(qtextCol))).as("token"))
      .distinct()
    val cand = qTerms
      .join(withDl, Seq("token"))
      .join(dfTab, Seq("token"))
      .crossJoin(broadcast(globals))
      .withColumn("contrib",
        expr("(n_docs * 88L * tf * totlen * 1000L) div " +
          "(df * (40L*tf*totlen + 12L*totlen + 36L*dl*n_docs))"))
    val scored = cand.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_match"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("score"), col("n_match"))
  }

  /** Reciprocal-rank fusion (RRF): merge N per-query rank lists —
    * typically a lexical (BM25) and a dense (embedding-cosine) ranking
    * — into one hybrid list, the standard ensemble for retrieval
    * curation. Each list contributes ⌊10⁶ / (k0 + rank)⌋ per (query,
    * doc) it ranks; the fused score is the Long sum of those integer
    * contributions (Cormack et al.'s 1/(k0+r) in fixed-point, so the
    * fusion is bit-exact under any partial-agg order — the x16/g4
    * integer-parity pattern). Ties break on ascending doc id.
    *
    * Input lists carry (qidCol, idCol, rankCol); ranks beyond `depth`
    * are ignored so one over-deep list cannot drown the others.
    * Output: (qid, rank ≤ k, id, rrf_score, n_lists).
    *
    * Scale: the union of rank lists is tiny — Q queries × depth × N
    * lists, NOT corpus-sized (each upstream ranker already reduced
    * corpus → top-depth). One hash aggregate on (qid, id) and one
    * per-qid top-k window; both exchanges move only the fused
    * candidate set. The expensive work stays in the upstream rankers,
    * which this op never re-runs.
    */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
      rankCol: String, k0: Int = 60, k: Int = 10,
      depth: Int = 1000): DataFrame = {
    require(rankings.size >= 2, "rrfFuse wants at least two rank lists")
    require(k0 >= 1 && k >= 1 && depth >= k,
      s"need k0>=1, k>=1, depth>=k; got k0=$k0 k=$k depth=$depth")
    val slim = rankings.map(_.select(col(qidCol), col(idCol),
      col(rankCol).cast("long").as("__r")).where(col("__r") <= depth))
    val contribs = slim.reduce(_ unionAll _)
      .withColumn("__c", expr(s"1000000L div (${k0}L + __r)"))
    val fused = contribs.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c")).as("rrf_score"), count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("rrf_score"),
        col("n_lists"))
  }
}
