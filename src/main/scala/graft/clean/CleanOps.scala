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

  /** The trim/sentinel half of clean_up_df: [[cleanString]] over every
    * StringType column as ONE Project node (no shuffle, one codegen
    * stage even at 100+ columns).
    */
  def cleanStrings(df: DataFrame, sentinels: Set[String] = MissingDataValues): DataFrame = {
    val cleaned = df.schema.fields.collect {
      case f if f.dataType == StringType =>
        f.name -> cleanString(col(s"`${f.name}`"), sentinels)
    }.toMap
    if (cleaned.isEmpty) df else df.withColumns(cleaned)
  }

  /** clean_up_df equivalent: apply [[cleanString]] to every StringType
    * column, then drop exact duplicate rows.
    *
    * Scale note: the dropDuplicates here is a full-row shuffle — apply it
    * to endpoint-sized tables (the reference's ingest.py:256 use), NOT to
    * the wide merged frame. Downstream entity builders dedup by natural
    * key anyway, so exact-duplicate rows in the wide frame are a no-op
    * for every distinct projection; the pipeline uses [[cleanStrings]]
    * there instead.
    */
  def cleanUp(df: DataFrame, sentinels: Set[String] = MissingDataValues): DataFrame =
    cleanStrings(df, sentinels).dropDuplicates()

  /** Drop the Dataservice system columns (etl/ingest.py:121). */
  def dropSystemColumns(df: DataFrame): DataFrame =
    df.drop("uuid", "created_at", "modified_at")

  /** Deterministic single-survivor dedup: keep, per key, the row whose
    * remaining-column tuple is MINIMAL in column order (nulls first, as
    * Spark orders struct fields ascending).
    *
    * `dropDuplicates(key)` keeps an ARBITRARY survivor — at cluster
    * scale the winner can change across task retries and speculative
    * duplicates, so two runs of the same job over the same input may
    * emit different bytes. This variant pins the survivor with a total
    * order while keeping the scale-right plan shape: `min(struct(...))`
    * is a hash aggregate with map-side partial merge (one exchange on
    * the key, no per-partition sort — cheaper than a window
    * `row_number`).
    *
    * Rows that tie on every column are exact duplicates, so any
    * survivor is byte-identical; ordering is total for dedup purposes.
    */
  def dedupMinByKey(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filter(_ != key).toSeq
    df.groupBy(col(s"`$key`"))
      .agg(min(struct(others.map(n => col(s"`$n`")): _*)).as("__min"))
      .select(col(s"`$key`") +: others.map(n => col(s"__min.`$n`").as(n)): _*)
  }

  /** k-anonymity audit: for each quasi-identifier equivalence class,
    * its population and whether it violates k — the privacy screen a
    * training-data release runs before publishing (a class smaller
    * than k re-identifies its members by the quasi-identifiers alone).
    * Returns one row per class: the quasi-identifier values,
    * `class_size`, and `violates_k`; feed the violating classes back
    * through a semi-join to suppress or generalize the rows.
    *
    * Scale: one hash aggregate on the quasi-identifier key (map-side
    * partial) — class count is bounded by the quasi-id domain, not the
    * row count. Null quasi-identifier values form their own class
    * (SQL GROUP BY semantics) — deliberate: "unknown" is itself a
    * quasi-identifier value.
    */
  def kAnonymityAudit(df: DataFrame, quasiIdCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "kAnonymityAudit needs quasi-id columns")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIdCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates_k", col("class_size") < k)
  }

  /** One-pass column profile: per profiled column its null count,
    * exact distinct count, and min/max (as strings, so one schema
    * covers every input type) — the data-quality expectation report a
    * pipeline lands next to each batch. One aggregate row per column,
    * unpivoted to (column, n_nulls, n_distinct, min_s, max_s) rows.
    *
    * Scale: a SINGLE aggregation pass over the input computes every
    * column's stats at once (no per-column scans); the unpivot is a
    * narrow expand of the 1-row result. Exact distinct per column adds
    * a count_distinct expand (one shuffle); at 100 TB swap
    * `approx_count_distinct` in via `exactDistinct = false` — same
    * flow, sketch-sized state, documented trade.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs columns to profile")
    val aggs = cols.flatMap { c =>
      val cc = col(s"`$c`")
      Seq(
        sum(when(cc.isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (exactDistinct) count_distinct(cc)
         else approx_count_distinct(cc)).as(s"__nd_$c"),
        min(cc).cast("string").as(s"__mn_$c"),
        max(cc).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(lit(c).as("column"),
      col(s"`__nn_$c`").as("n_nulls"), col(s"`__nd_$c`").as("n_distinct"),
      col(s"`__mn_$c`").as("min_s"), col(s"`__mx_$c`").as("max_s")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
