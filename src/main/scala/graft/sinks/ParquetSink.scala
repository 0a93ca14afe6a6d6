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
}
