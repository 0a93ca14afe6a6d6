package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Partition-aware parquet writer — the batch sink shape that survives
  * 100 TB:
  *
  *  - `partitionBy` on low-cardinality columns gives readers partition
  *    pruning (a filtered read scans only matching directories);
  *  - a pre-write `repartition` on the same columns sends each output
  *    partition to ONE task, avoiding the files = tasks × partitions
  *    small-file explosion;
  *  - `maxRecordsPerFile` bounds individual file size so a skewed
  *    partition splits instead of producing one multi-GB file.
  */
object ParquetSink {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val writer =
      (if (partitionCols.nonEmpty)
         df.repartition(partitionCols.map(c => col(s"`$c`")): _*)
       else df)
        .write
        .mode(mode)
        .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }

  /** Bucketed parquet table — the co-located-join path: two tables
    * bucketed on the same key into the same bucket count join with NO
    * exchange on either side (hash(key) % n fixed at write time), the
    * classic pre-shuffle for a fact table that is joined on the same
    * key by many downstream queries. `sortCols` additionally pre-sorts
    * within each bucket file for sort-merge reuse. Registered through
    * the session catalog (`saveAsTable`) because bucket metadata lives
    * there, not in the files.
    */
  def writeBucketed(df: DataFrame, table: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    require(nBuckets > 0, "nBuckets must be positive")
    val w = df
      // one file per bucket per partition-write: co-located reads stay
      // narrow even for skewed buckets
      .repartition(nBuckets, bucketCols.map(c => col(s"`$c`")): _*)
      .write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
