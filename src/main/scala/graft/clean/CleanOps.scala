package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Spark equivalent of the reference's `clean_up_df`
  * (kf_task_fhir_etl/etl/ingest.py:256,485 calling
  * kf_lib_data_ingest.common.misc.clean_up_df): trim every string cell,
  * normalize missing-data sentinels and empty strings to null, and drop
  * exact duplicate rows.
  *
  * All projections here are narrow (no shuffle); `dropDuplicates` is the
  * only shuffle and Catalyst plans it as a hash aggregate with map-side
  * partial dedup, so at 100 TB it scales as a single exchange on the
  * row hash rather than a global sort.
  */
object CleanOps {

  /** Default sentinel set mirroring the reference's missing_data_values
    * (entity_builders/disease.py:26-35, phenotype.py:26-35,
    * histopathology.py:19-25, drs_document_reference.py:151-160).
    */
  val MissingDataValues: Set[String] = Set(
    "Not Reported", "Not reported", "not reported",
    "Not Applicable", "Not applicable",
    "Not Available", "Not available",
    "Unknown", "unknown", "NA", "N/A", "")

  /** Trim a string column and map sentinel values (and "") to null —
    * one `when` chain, fully codegen'd.
    */
  def cleanString(c: Column, sentinels: Set[String] = MissingDataValues): Column = {
    val t = trim(c)
    when(t.isin(sentinels.toSeq: _*), lit(null).cast(StringType)).otherwise(t)
  }

  /** clean_up_df equivalent: apply [[cleanString]] to every StringType
    * column, then drop exact duplicate rows.
    */
  def cleanUp(df: DataFrame, sentinels: Set[String] = MissingDataValues): DataFrame = {
    val cleaned = df.schema.fields.foldLeft(df) {
      case (acc, f) if f.dataType == StringType =>
        acc.withColumn(f.name, cleanString(col(f.name), sentinels))
      case (acc, _) => acc
    }
    cleaned.dropDuplicates()
  }

  /** Drop the Dataservice system columns (etl/ingest.py:121). */
  def dropSystemColumns(df: DataFrame): DataFrame =
    df.drop("uuid", "created_at", "modified_at")
}
