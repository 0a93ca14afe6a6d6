package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler (not part of the driver contract): runs
  * the named battery queries best-of-2 under the same session config as
  * Bench, so a single operator can be iterated on without paying the
  * full battery. Usage: runMain graft.ProfileQuery q1_agg d4_ngram_jaccard
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Codegen cache sized to the battery: kf_full_pipeline alone emits
      // >100 distinct whole-stage-codegen units (16 builders x several
      // stages), so the default 100-entry driver-wide cache thrashes and
      // every repeat run recompiles the same classes — profiled as the
      // kf family's top driver+executor frames. 2000 entries keeps one
      // battery's worth of generated classes resident (static conf; the
      // compile itself is unchanged, it just stops repeating).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED_REPARTITION", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // experiment variants not in the driver battery
    val extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "kf_drs_fanned" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        val result = graft.etl.Transform(graft.queries.KfShaped.endpoints(s, d))
        val drs = graft.documents.DrsBuilder.drsDocumentReference(
          result.slice(Set("studies", "participants", "biospecimens",
            "biospecimen-genomic-files", "genomic-files",
            "sequencing-experiment-genomic-files", "sequencing-experiments")),
          Some(graft.queries.KfShaped.indexd(s, d)))
        val uniq = Tables.lineitem(s, d)
          .groupBy(concat(lit("GF_"), col("l_orderkey"), lit("_"),
            col("l_linenumber")).as("key"))
          .count().where(col("count") === 1).select("key")
        drs.join(uniq, Seq("key"))
      }),
      "d4_hash_order" -> ((s, d) => graft.ops.DedupOps.ngramJaccardPairs(
        Tables.documents(s, d), "doc_id", "text", 3, 0.5, orderByDocFreq = false)),
      "debug_drs_keys" -> ((s, d) => {
        val result = graft.etl.Transform(graft.queries.KfShaped.endpoints(s, d))
        val required = Set("studies", "participants", "biospecimens",
          "biospecimen-genomic-files", "genomic-files",
          "sequencing-experiment-genomic-files", "sequencing-experiments")
        val grouped = graft.documents.DrsBuilder.regroup(result.slice(required))
        import org.apache.spark.sql.functions._
        val agg = grouped.agg(
          count(lit(1)).as("n_groups"),
          countDistinct(col("gf_id")).as("n_gf"),
          countDistinct(col("gf_id"), col("seq_id")).as("n_gf_seq"),
          countDistinct(col("study_id"), col("gf_id"), col("seq_id")).as("n_sgs"))
        println("[debug] " + agg.collect().mkString)
        agg
      }),
      "d10_sigs_only" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        val base = Tables.documents(s, d).select(col("doc_id").as("id"),
          substring(col("text"), 1, 40).as("p")).where(col("p").isNotNull)
        base.select(col("id"), length(col("p")).as("plen"),
            explode(graft.ops.DedupOps.deletionNeighborhood(col("p"), 2)).as("v"))
          .select(col("id"), col("plen"), xxhash64(col("v")).as("h"))
      }),
      "d10_explode_only" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        val base = Tables.documents(s, d).select(col("doc_id").as("id"),
          substring(col("text"), 1, 40).as("p")).where(col("p").isNotNull)
        base.select(col("id"),
          explode(graft.ops.DedupOps.deletionNeighborhood(col("p"), 2)).as("v"))
      }),
      "d10_buckets_only" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        val base = Tables.documents(s, d).select(col("doc_id").as("id"),
          substring(col("text"), 1, 40).as("p")).where(col("p").isNotNull)
        graft.ops.DedupOps.editDistanceCandidates(base, 2)
      }),
      "kf_bcast_indexd" -> ((s, d) => {
        val result = graft.etl.Transform(graft.queries.KfShaped.endpoints(s, d))
        graft.etl.Pipeline.buildAllUnion(result,
          indexd = Some(org.apache.spark.sql.functions.broadcast(
            graft.queries.KfShaped.indexd(s, d))),
          centerNames = Map("SC_1" -> "Center One", "SC_2" -> "Center Two"))
      }))
    args.foreach { name =>
      val fn = extra.getOrElse(name, SparkEntry.queries(name))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      spark.catalog.clearCache()
      println(f"[profile] $name: $best%.2f s (best of 2)")
    }
    spark.stop()
  }
}
