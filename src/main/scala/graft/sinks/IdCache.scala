package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Parquet-backed persistent id cache — the LoadStage `cache_dir`
  * parity (etl/ingest.py:513, backed by kf-lib-data-ingest's on-disk
  * target-id memo): resolved (natural key → server id) pairs survive
  * across runs, so a re-run only asks the target service about keys it
  * has never resolved before.
  *
  * Layout: one parquet directory per entity class under `dir`,
  * append-only. A refresh APPENDS the newly fetched pairs instead of
  * rewriting the store — at 100 TB-scale id maps a full rewrite per
  * entity stage would dominate the load, while an append is one small
  * parquet batch; readers dedup by key (resolved ids are stable, so any
  * surviving duplicate is equal and the pick is immaterial). Compaction
  * = read + dropDuplicates + write-elsewhere + swap, when batch count
  * grows — deliberately out of band, like any log-structured store.
  *
  * Unresolved keys are NOT negatively cached, matching the reference:
  * a key the server didn't know yesterday may exist today (another
  * loader created it), so misses re-query every run.
  */
final class IdCache(spark: SparkSession, dir: String) {

  private val schema = StructType(Seq(
    StructField("key", StringType), StructField("resolved_id", StringType)))

  private def path(entityClass: String) = s"$dir/$entityClass"

  /** Cached (key, resolved_id) pairs for an entity class; empty frame
    * when the class has never been cached. Deduped by key.
    */
  def read(entityClass: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path(entityClass))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(schema).parquet(path(entityClass)).dropDuplicates("key")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Append newly resolved pairs for an entity class. */
  def append(entityClass: String, resolved: DataFrame): Unit =
    resolved.select(col("key").cast("string"), col("resolved_id").cast("string"))
      .write.mode("append").parquet(path(entityClass))

  /** Compact one entity class's append-only store: rewrite the deduped
    * pairs as a single snapshot and swap it in (write-elsewhere +
    * Hadoop FS rename — atomic on HDFS/local, best-effort on object
    * stores, where a committer-backed overwrite is the production
    * variant). Out-of-band maintenance for when the batch count grows;
    * resolution correctness never depends on it.
    */
  def compact(entityClass: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(entityClass))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val tmp = new org.apache.hadoop.fs.Path(path(entityClass) + "__compacting")
      read(entityClass).write.mode("overwrite").parquet(tmp.toString)
      // failures must THROW, not fall through: a false from delete means
      // rename would nest the snapshot inside the live dir (invisible to
      // the reader), and a false from rename means the cache vanished
      require(fs.delete(p, true),
        s"idcache compact: could not delete $p; snapshot left at $tmp")
      require(fs.rename(tmp, p),
        s"idcache compact: could not swap in $tmp; store deleted, snapshot intact")
    }
  }

  /** Resolve `docs` (must carry a `key` column) against the cache;
    * `fetch` is consulted ONLY for cache-miss keys (it receives a
    * one-column `key` DataFrame and returns (key, resolved_id) rows for
    * the keys the server knows — the bulk form of the reference's
    * per-record query_target_ids). Newly fetched pairs are appended to
    * the cache before joining, so the next run resolves them locally.
    *
    * Scale shape: the miss set is a distinct-key anti-join (one
    * shuffle over keys, not rows); the final resolution join is a plain
    * equi-join — NOT forced broadcast, because an id map is 1:1 with
    * the entity universe and collecting it to the driver is an OOM at
    * scale (AQE still broadcasts small ones on its own).
    */
  def resolve(entityClass: String, docs: DataFrame,
      fetch: DataFrame => DataFrame): DataFrame = {
    val cached = read(entityClass)
    val missKeys = docs.select(col("key")).distinct()
      .join(cached, Seq("key"), "left_anti")
      .persist() // read twice: the emptiness probe and the fetch input
    // limit-1 probe, not a count: we only need "any miss at all?"
    val anyMiss = !missKeys.isEmpty
    val idMap =
      if (anyMiss) {
        val fetched = fetch(missKeys).select(col("key"), col("resolved_id"))
        // a fetch that resolved nothing (all misses unknown server-side)
        // must not append: permanently-unknown keys would otherwise grow
        // one empty parquet batch per run, forever
        if (fetched.isEmpty) cached
        else {
          append(entityClass, fetched)
          // re-read instead of unioning the fetched plan: the appended
          // files are on disk now, and one scan keeps the join single-source
          read(entityClass)
        }
      } else cached
    missKeys.unpersist()
    docs.join(idMap, Seq("key"), "left")
  }
}
