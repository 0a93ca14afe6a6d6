package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): exact
  * brute-force cosine top-k as the correctness baseline, and an
  * LSH-bucketed variant as the scale path (bucket equi-join instead of
  * cross join — the 100 TB answer; buckets co-partition, so the join
  * shuffles each side once on the bucket key).
  */
object SimilarityOps {

  /** Strict left-fold dot product in doubles (deterministic bits;
    * matches a sequential oracle loop). Native codegen'd expression —
    * the composed `aggregate(zip_with(...))` twin below is interpreted
    * and re-evaluated per reference.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Composed-builtin twin of [[dot]] (differential test anchor). */
  private[graft] def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cast a float embedding to double once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Exact top-k neighbors for each query vector (brute force: broadcast
    * the small query side, never the corpus).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries).join(corpus, col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Random-hyperplane LSH bucket from fixed deterministic hyperplanes
    * (e_j − e_{j+half}): bit_j = [v_j > v_{j+half}], packed into an int.
    * Deterministic and oracle-expressible, unlike RNG-seeded planes.
    */
  def lshBucket(v: Column, nBits: Int, half: Int): Column =
    (1 to nBits).map { j =>
      when(element_at(v, j) - element_at(v, j + half) > 0, lit(1 << (j - 1)))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed ANN: join only within matching buckets, then rank. Recall
    * trades off with bucket count; candidates shrink by ~2^nBits.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = queries.join(corpus,
        col("qbucket") === col("cbucket") && col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: assign
    * every vector to its nearest of `centroids` (broadcast literals, a
    * narrow codegen'd argmin), then answer queries by probing only the
    * `nProbe` nearest cells — an equi-join on cell id instead of a
    * cross join, shrinking candidates by ~nCells/nProbe. Train the
    * centroids however you like (k-means, sampling); they're data here,
    * not code.
    */
  def ivfCell(v: Column, centroids: Seq[Seq[Double]]): Column =
    // argmin as array_min over (dist, idx) structs — struct ordering is
    // field-by-field, so ties break on the lower index. Linear-size
    // expression tree (a when-chain fold doubles per centroid and blows
    // up the plan exponentially).
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(v, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  private def sqDist(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** The `nProbe` nearest cells of a query vector, as an array column. */
  def ivfProbes(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(v, c).as("d"), lit(i).as("i"))
    }
    slice(transform(sort_array(array(dists: _*)), s => s.getField("i")), 1, nProbe)
  }

  /** IVF top-k: probe-cell equi-join + exact cosine + rank. `corpus`
    * must carry (cid, cv); `queries` (qid, qv).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      centroids: Seq[Seq[Double]], nProbe: Int, k: Int): DataFrame = {
    val c = corpus.withColumn("cell", ivfCell(col("cv"), centroids))
    val q = queries.withColumn("cell",
      explode(ivfProbes(col("qv"), centroids, nProbe)))
    val scored = q.join(c, Seq("cell"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("qid", "cid") // a pair can meet in several probes
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Deterministic centroid seeding for IVF without an iterative
    * trainer: the nCells lowest id-HASHES — a deterministic pseudo-
    * random sample, fetched with a distributed top-k
    * (TakeOrderedAndProject), never a global single-partition window.
    * (k-means|| would refine these; for bucketing purposes a uniform
    * sample already partitions the space usefully and reproducibly.)
    */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Seq[Seq[Double]] = {
    emb.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(hash(col(idCol)), col(idCol))
      .limit(nCells)
      .select("v").collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
  }

  /** Distributed Lloyd's k-means FIT — the trainer that turns
    * [[seedCentroids]]' uniform sample into a real coarse quantizer
    * for [[ivfTopK]] / [[pqEncode]]. Each iteration: (1) assign every
    * vector to its nearest centroid with [[ivfCell]] (centroids are
    * k×d broadcast literals, a narrow codegen'd argmin — never a
    * join); (2) recompute each centroid as the mean of its members
    * with ONE hash aggregate (d decimal sums + a count per cell,
    * map-side partial combine); (3) collect the k aggregate rows to
    * the driver for the next iteration's literals — the same
    * k-rows-per-iteration driver loop Spark MLlib's KMeans runs, and
    * the only `.collect()` in the operator (bounded by k, not data).
    *
    * DETERMINISM is the design constraint (it is what makes the fit
    * oracle-checkable): seeds are the k lowest ids; per-dimension
    * member sums use DECIMAL(38,20) — exact and order-independent
    * where a double sum varies with partial-aggregation order — and
    * the mean is (exact decimal → nearest double) / count, two IEEE
    * operations any engine reproduces; argmin ties break on the lower
    * centroid index. Empty cells throw (k too large for the data —
    * production k-means re-seeds; silently shrinking k would make the
    * result depend on which cell died).
    *
    * Returns (final centroids after `iters` updates, assignment of
    * every vector against those final centroids) — `(id, cluster)`.
    */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (Seq[Seq[Double]], DataFrame) = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val e = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    var cents: Seq[Seq[Double]] = e.orderBy(col("id")).limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(cents.size == k, s"need at least $k vectors to seed, got ${cents.size}")
    val d = cents.head.size
    for (_ <- 0 until iters) {
      val assigned = e.withColumn("cell", ivfCell(col("v"), cents))
      val sums = (0 until d).map(j =>
        sum(element_at(col("v"), j + 1).cast("decimal(38,20)")).as(s"s$j"))
      val rows = assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      require(rows.length == k,
        s"${k - rows.length} empty cluster(s) — k=$k too large for this data")
      cents = rows.sortBy(_.getInt(0)).map { r =>
        val n = r.getLong(1)
        (0 until d).map(j => r.getDecimal(2 + j).doubleValue() / n)
      }.toSeq
    }
    (cents, e.select(col("id").as(idCol),
      ivfCell(col("v"), cents).as("cluster")))
  }

  /** Product quantization (PQ) — the embedding-compression path for
    * 100 TB-scale similarity search: split each d-dim vector into
    * `m = subCentroids.size` contiguous blocks and store, per block,
    * only the index of its nearest sub-centroid — d doubles become m
    * small ints (with k=16 centroids/block, a 64-dim vector compresses
    * 128× to 8 nibbles). Codes are narrow per-row expressions; the
    * codebooks ship as broadcast literals like IVF centroids.
    */
  def pqEncode(v: Column, subCentroids: Seq[Seq[Seq[Double]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.PqEncode(
      GraftColumnBridge.expression(v),
      subCentroids.map(_.map(_.toArray).toArray).toArray))
  }

  /** Composed-builtin twin of [[pqEncode]] (differential test anchor) —
    * m×k interpreted folds per row; the native expression is one pass.
    */
  private[graft] def pqEncodeComposed(v: Column, subCentroids: Seq[Seq[Seq[Double]]]): Column = {
    val blockLen = subCentroids.head.head.size
    array(subCentroids.zipWithIndex.map { case (cents, b) =>
      val block = slice(v, b * blockLen + 1, blockLen)
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        struct(sqDistTo(block, c).as("d"), lit(i).as("i"))
      }: _*)).getField("i")
    }: _*)
  }

  /** Reconstruct the quantized vector from its PQ code (block-wise
    * codebook lookup + concat) — used for asymmetric distance and for
    * bounding the quantization error.
    */
  def pqDecode(code: Column, subCentroids: Seq[Seq[Seq[Double]]]): Column =
    flatten(array(subCentroids.zipWithIndex.map { case (cents, b) =>
      element_at(typedLit(cents), element_at(code, b + 1) + 1)
    }: _*))

  /** Per-block codebooks from the same deterministic id-hash sample as
    * [[seedCentroids]] — k-means would refine; a reproducible uniform
    * sample already quantizes usefully.
    */
  def seedSubCentroids(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val sample = seedCentroids(emb, idCol, vecCol, k)
    val d = sample.head.size
    require(d % m == 0, s"dim $d not divisible into $m blocks")
    val blockLen = d / m
    (0 until m).map(b => sample.map(v => v.slice(b * blockLen, (b + 1) * blockLen)))
  }

  private def sqDistTo(block: Column, c: Seq[Double]): Column =
    aggregate(zip_with(block, typedLit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Embedding-cosine near-duplicate pairs: candidates from an
    * LSH-bucket self-equi-join (each side shuffles once on the bucket
    * key — never a cross join), exact cosine only on candidates, keep
    * pairs ≥ threshold. The embedding-space sibling of the MinHash
    * near-dup pipeline; same shape at 100 TB.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, half: Int, threshold: Double): DataFrame = {
    val b = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nBits, half))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** SEMANTIC dedup (the SemDeDup construction — Abbas et al. 2023,
    * arXiv:2303.09540): k-means cluster the embedding space with
    * [[kmeansFit]], search cosine near-duplicates WITHIN each cluster
    * only, connect the pair graph, keep each component's min-id
    * representative. Returns one row per vector: (id, cluster, rep) —
    * `rep == id` marks the survivors a curation pass would keep.
    *
    * Scale shape: the candidate join is an equi-join on the cluster id
    * — candidates are cluster-quadratic, never corpus-quadratic, and k
    * is the knob that bounds cluster size as the corpus grows (SemDeDup
    * runs k ≈ n/10⁴ at web scale for exactly this reason). Pair
    * verification is the exact cosine on candidates only; components
    * use [[DedupOps.connectedComponents]]' alternating-star loop
    * (near-dup graphs are overwhelmingly small stars, so it converges
    * in ~2 rounds). Cross-cluster near-dups are missed BY DESIGN —
    * that approximation is the published trade the operator models.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    val (cents, _) = kmeansFit(emb, idCol, vecCol, k, iters)
    semanticDedupAssigned(emb, idCol, vecCol, cents, threshold)
  }

  /** [[semanticDedup]] against a FROZEN codebook: assign every vector
    * to its nearest given centroid (broadcast-literal argmin, no fit),
    * then the same within-cluster pair graph → connected components →
    * min-id representative. This is the production decomposition at
    * corpus scale — SemDeDup fits its k-means on a bounded sample and
    * freezes the codebook, so clustering new data never refits (the
    * contract [[IncrementalDedupOps.ingestEmbeddingShard]] builds on).
    */
  def semanticDedupAssigned(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cluster", ivfCell(col("v"), centroids))
    val l = e.select(col("cluster"), col("id").as("id_a"), col("v").as("va"))
    val r = e.select(col("cluster"), col("id").as("id_b"), col("v").as("vb"))
    val pairs = l.join(r, Seq("cluster")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b")
    DedupOps.connectedComponents(
        e.select(col("id")), "id", pairs, "id_a", "id_b")
      .withColumnRenamed("cluster", "rep")
      .join(e.select(col("id"), col("cluster")), Seq("id"))
      .select(col("id").as(idCol), col("cluster"), col("rep"))
  }

  /** Per-dimension [min, max] over the corpus — the training stats of
    * int8 SCALAR quantization (the third codec in the family: LSH signs
    * → 1 bit/projection, PQ → log₂k bits/block, SQ → 8 bits/dim with no
    * codebook). One posexplode aggregate, map-side partials; the
    * collect is bounded by the DIMENSION count (the
    * [[seedCentroids]]/[[graft.ops.CorpusOps.heavyHitters]] exception
    * class), never the corpus.
    */
  def sqStats(emb: DataFrame, vecCol: String): Seq[(Double, Double)] = {
    emb.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSeq
  }

  /** int8 scalar-quantization encode: per dimension,
    * `code = clamp₀₋₂₅₅(floor((v−min)·255 / (max−min)))`, degenerate
    * dimensions (max == min) encode 0. The stats ship as broadcast
    * array literals, so encoding is a narrow codegen'd map — zero
    * shuffle, zero join. Every step ((v−min), ·255.0, ÷(max−min),
    * floor) is a single IEEE-754 double operation in a pinned
    * association order, so any engine reproduces the codes bit-exactly
    * — which is what makes the encoder CONTENT-oracle-checkable, unlike
    * a rounding-mode-dependent `round` form.
    */
  def sqEncode(v: Column, stats: Seq[(Double, Double)]): Column = {
    val mns = array(stats.map(s => lit(s._1)): _*)
    val mxs = array(stats.map(s => lit(s._2)): _*)
    transform(v, (x, i) => {
      val mn = element_at(mns, i + 1)
      val mx = element_at(mxs, i + 1)
      when(mx > mn,
        least(lit(255), greatest(lit(0),
          floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)).cast("int"))))
        .otherwise(lit(0))
    })
  }

  /** Per-dimension decimal-exact means — the centering thresholds of
    * BINARY quantization ([[bqEncode]]). Same determinism discipline as
    * [[kmeansFit]]: the sum goes through DECIMAL(38,20) (exact,
    * order-independent), the mean is (exact decimal → nearest double)
    * / count — two IEEE operations any engine replays. Collect bounded
    * by dimension count.
    */
  def bqThresholds(emb: DataFrame, vecCol: String): Seq[Double] = {
    emb.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(col("x").cast("decimal(38,20)")).as("s"),
        count(lit(1)).as("n"))
      .orderBy("i").collect()
      .map(r => r.getDecimal(1).doubleValue / r.getLong(2)).toSeq
  }

  /** Binary quantization: bit_i = (v_i > threshold_i), packed
    * big-endian into HALF-WORD (32-bit) longs so the fold `acc·2 + bit`
    * can never overflow a signed 64-bit accumulator — a d-dim vector
    * becomes d/32 longs (64 dims → 16 bytes, a 32× compression), and
    * Hamming distance is a handful of codegen'd `bit_count(xor)` ops
    * ([[bqHamming]]). Thresholds ship as broadcast literals; encoding
    * is narrow and zero-shuffle. The modern re-rank retrieval codec:
    * scan the tiny codes, then exact-score only the shortlist
    * ([[bqTopK]]).
    */
  def bqEncode(v: Column, thr: Seq[Double]): Column = {
    val d = thr.size
    require(d % 32 == 0, s"dimension $d must pack whole 32-bit words")
    val t = array(thr.map(lit): _*)
    def word(lo: Int): Column =
      aggregate(sequence(lit(lo), lit(lo + 31)), lit(0L),
        (acc, i) => acc * 2 + when(
          element_at(v, i + 1).cast("double") > element_at(t, i + 1),
          lit(1L)).otherwise(lit(0L)))
    array((0 until d by 32).map(word): _*)
  }

  /** Hamming distance between two [[bqEncode]] code arrays. */
  def bqHamming(a: Column, b: Column, d: Int): Column =
    (0 until d by 32).map(lo => bit_count(
        element_at(a, lo / 32 + 1).bitwiseXOR(element_at(b, lo / 32 + 1))))
      .reduce(_ + _)

  /** Binary-quantized top-k with exact re-rank: Hamming-shortlist
    * `k·oversample` candidates on the packed codes, then exact cosine
    * on the shortlist only — at scale the first stage reads d/32 longs
    * per comparison instead of d doubles (the memory-bandwidth win the
    * codec exists for), and the expensive scoring touches `k·oversample`
    * rows per query, not the corpus. Queries are a bounded set
    * (broadcast side), so the candidate join is linear in the corpus
    * like [[bruteForceTopK]]; both window ranks are per-query top-k,
    * deterministic via (distance, id) ordering.
    */
  def bqTopK(queries: DataFrame, corpus: DataFrame, thr: Seq[Double],
      k: Int, oversample: Int): DataFrame = {
    val d = thr.size
    val q = queries.select(col("qid"), col("qv"),
      bqEncode(col("qv"), thr).as("qw"))
    val c = corpus.select(col("cid"), col("cv"),
      bqEncode(col("cv"), thr).as("cw"))
    val ham = q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qv"), col("cv"),
        bqHamming(col("qw"), col("cw"), d).as("ham"))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("ham"), col("cid"))
    val w2 = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    ham.withColumn("hrnk", row_number().over(w1))
      .where(col("hrnk") <= k * oversample)
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
          .as("cos"))
      .withColumn("rnk", row_number().over(w2)).where(col("rnk") <= k)
      .select(col("qid"), col("cid").as("neighbor_id"), col("rnk"))
  }

  /** MMR (maximal marginal relevance) diversified re-rank: from each
    * query's relevance-ranked SHORTLIST, greedily pick k results that
    * balance relevance against redundancy —
    * score(c) = λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s) — the
    * standard diversity re-ranker for RAG context assembly (don't
    * retrieve five near-copies of the same paragraph).
    *
    * Integer-exact: `relCol` is micro-scaled (the caller's floor of
    * 10⁶·cosine or any integer relevance), pairwise sim is
    * ⌊10⁶·cosine⌋, λ is micro-scaled, and the score is the Long
    * λμ·rel − (10⁶−λμ)·maxSim — bit-stable under any agg order, so a
    * SQL oracle can replay the greedy exactly. Ties break on
    * ascending id; pick 1 is pure argmax-relevance (no penalty term).
    *
    * Scale: the greedy unrolls into k−1 Catalyst rounds over the
    * SHORTLIST table (queries × depth rows — the upstream ranker
    * already reduced the corpus), each round one anti-join + one
    * qid equi-join + one per-qid argmax window, all on the qid key.
    * Work is O(k · Q · depth), never corpus-scale, and distributes
    * across queries; k is bounded ≤ 20 (a context window, not a
    * result page).
    */
  def mmrRerank(shortlist: DataFrame, qidCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int,
      lambdaMicro: Long = 700000L): DataFrame = {
    require(k >= 1 && k <= 20, s"k in 1..20, got $k")
    require(lambdaMicro >= 0 && lambdaMicro <= 1000000L,
      s"lambdaMicro in 0..10^6, got $lambdaMicro")
    val base = shortlist.select(col(qidCol).as("qid"), col(idCol).as("id"),
      col(relCol).cast("long").as("rel"), col(vecCol).as("vec"))
    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id"))
    var picked = base.withColumn("__rn", row_number().over(wRel))
      .where(col("__rn") === 1).drop("__rn")
      .withColumn("rank", lit(1))
      .withColumn("mmr_score", lit(lambdaMicro) * col("rel"))
    for (i <- 2 to k) {
      val sel = picked.select(col("qid"), col("id").as("__sid"),
        col("vec").as("__svec"))
      val remaining = base.join(
        picked.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
      // association pinned as 10⁶ · (dot/denominator): floating-point
      // multiplication is not associative, and the oracle must replay
      // the identical double before the floor
      val simMicro = floor(lit(1e6) * (dot(col("vec"), col("__svec")) /
        (sqrt(dot(col("vec"), col("vec"))) *
          sqrt(dot(col("__svec"), col("__svec")))))).cast("long")
      val msim = remaining.join(sel, "qid")
        .select(col("qid"), col("id"), simMicro.as("__sim"))
        .groupBy(col("qid"), col("id")).agg(max(col("__sim")).as("__msim"))
      val scored = remaining.join(msim, Seq("qid", "id"))
        .withColumn("mmr_score", lit(lambdaMicro) * col("rel") -
          lit(1000000L - lambdaMicro) * col("__msim"))
      val wPick = Window.partitionBy(col("qid"))
        .orderBy(col("mmr_score").desc, col("id"))
      val pick = scored.withColumn("__rn", row_number().over(wPick))
        .where(col("__rn") === 1)
        .select(col("qid"), col("id"), col("rel"), col("vec"),
          lit(i).as("rank"), col("mmr_score"))
      picked = picked.unionByName(pick)
      // k-1 unrolled rounds each append a join+window to the plan;
      // checkpoint the small picked set so round i's plan doesn't
      // re-run rounds 1..i-1 (the g4/bfs lineage-cap discipline)
      if (i < k) picked = picked.localCheckpoint()
    }
    picked.select(col("qid"), col("rank"), col("id"), col("mmr_score"))
  }

  /** Mid-rise SQ decode (`min + (code + 0.5)·(max−min)/255`) — bounds
    * the per-dimension reconstruction error at (max−min)/510 + 1 ulp,
    * the gate [[graft.SimilaritySpec]] pins.
    */
  def sqDecode(code: Column, stats: Seq[(Double, Double)]): Column = {
    val mns = array(stats.map(s => lit(s._1)): _*)
    val mxs = array(stats.map(s => lit(s._2)): _*)
    transform(code, (c, i) => {
      val mn = element_at(mns, i + 1)
      val mx = element_at(mxs, i + 1)
      mn + (c.cast("double") + lit(0.5)) * (mx - mn) / lit(255.0)
    })
  }
}
