package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic KF-Dataservice-shaped endpoint tables derived from the
  * TPC-H test data, so the whole reference pipeline (extract-shape →
  * transform → 16 builders) runs end-to-end against driver-provided
  * input at any scale factor. Mapping: region→study, customer→
  * participant, orders→diagnosis/phenotype/outcome, lineitem→
  * biospecimen/genomic-file, supplier→sequencing-experiment.
  */
object KfShaped {

  def endpoints(s: SparkSession, d: String): Map[String, DataFrame] = {
    val region = Tables.region(s, d)
    val nation = Tables.nation(s, d)
    val customer = Tables.customer(s, d)
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)

    val studies = region.select(
      concat(lit("SD_"), col("r_regionkey")).as("kf_id"),
      concat(lit("phs00000"), col("r_regionkey"), lit(".v1.p1")).as("external_id"),
      col("r_name").as("name"),
      col("r_name").as("short_name"),
      concat(lit("S"), col("r_regionkey")).as("short_code"),
      lit("v1").as("version"),
      lit(null).cast("string").as("attribution"),
      lit("dbGaP").as("data_access_authority"),
      lit("CANCER").as("domain"),
      lit("Kids First").as("program"),
      lit("Pending").as("release_status"),
      lit("True").as("visible"),
      concat(lit("IV_"), col("r_regionkey")).as("investigator_id"))

    val investigators = region.select(
      concat(lit("IV_"), col("r_regionkey")).as("kf_id"),
      concat(lit("inv-"), col("r_name")).as("external_id"),
      concat(lit("PI of "), col("r_name")).as("name"),
      concat(col("r_name"), lit(" University")).as("institution"),
      lit("True").as("visible"))

    val genderBySeg = typedLit(Map(
      "BUILDING" -> "Male", "AUTOMOBILE" -> "Female", "MACHINERY" -> "Male",
      "HOUSEHOLD" -> "Female", "FURNITURE" -> "Other"))
    val raceByMod = typedLit(Map(
      0 -> "White", 1 -> "Asian", 2 -> "Black or African American",
      3 -> "Unknown", 4 -> "Not Reported"))
    val participants = customer
      .join(nation, customer("c_nationkey") === nation("n_nationkey"))
      .select(
        concat(lit("PT_"), col("c_custkey")).as("kf_id"),
        col("c_name").as("external_id"),
        concat(lit("SD_"), col("n_regionkey")).as("study_id"),
        concat(lit("FM_"), col("c_nationkey")).as("family_id"),
        when(col("c_custkey") % 2 === 0, "True").otherwise("False").as("is_proband"),
        when(col("c_custkey") % 3 === 0, "True").otherwise("False").as("affected_status"),
        lit("Cancer").as("diagnosis_category"),
        element_at(genderBySeg, col("c_mktsegment")).as("gender"),
        lit("Not Hispanic or Latino").as("ethnicity"),
        element_at(raceByMod, (col("c_custkey") % 5).cast("int")).as("race"),
        lit("Homo sapiens").as("species"),
        lit("True").as("visible"))

    val families = participants.select(col("family_id").as("kf_id")).distinct()
      .withColumn("external_id", concat(lit("fam-"), col("kf_id")))
      .withColumn("visible", lit("True"))

    val relations = typedLit(Map(0 -> "Mother", 1 -> "Father", 2 -> "Sibling",
      3 -> "Paternal uncle", 4 -> "Some unmapped relation"))
    val familyRelationships = customer.where(col("c_custkey") % 2 === 1).select(
      concat(lit("FR_"), col("c_custkey")).as("kf_id"),
      concat(lit("fr-"), col("c_custkey")).as("external_id"),
      concat(lit("PT_"), col("c_custkey")).as("participant1_id"),
      concat(lit("PT_"), col("c_custkey") - 1).as("participant2_id"),
      element_at(relations, (col("c_custkey") % 5).cast("int"))
        .as("participant1_to_participant2_relation"),
      lit("True").as("visible"))

    val diagnoses = orders.select(
      concat(lit("DG_"), col("o_orderkey")).as("kf_id"),
      concat(lit("dx-"), col("o_orderkey")).as("external_id"),
      concat(lit("PT_"), col("o_custkey")).as("participant_id"),
      col("o_orderpriority").as("source_text_diagnosis"),
      lit("Cancer").as("diagnosis_category"),
      when(col("o_orderkey") % 4 === 0, "Not Reported").otherwise("Chest wall")
        .as("source_text_tumor_location"),
      when(col("o_orderkey") % 10 === 9, "bogus")
        .otherwise((col("o_orderkey") % 5000).cast("string")).as("age_at_event_days"),
      when(col("o_orderkey") % 3 === 0, concat(lit("MONDO:00"), col("o_orderkey") % 100))
        .otherwise("Unknown").as("mondo_id_diagnosis"),
      concat(lit("C"), col("o_orderkey") % 90).as("icd_id_diagnosis"),
      concat(lit("NCIT:C"), col("o_orderkey") % 900).as("ncit_id_diagnosis"),
      when(col("o_orderkey") % 2 === 0, concat(lit("UBERON:00"), col("o_orderkey") % 100))
        .otherwise(lit(null).cast("string")).as("uberon_id_tumor_location"),
      lit(null).cast("string").as("spatial_descriptor"),
      lit("True").as("visible"))

    val phenotypes = orders.where(col("o_orderkey") % 3 === 0).select(
      concat(lit("PH_"), col("o_orderkey")).as("kf_id"),
      concat(lit("ph-"), col("o_orderkey")).as("external_id"),
      concat(lit("PT_"), col("o_custkey")).as("participant_id"),
      col("o_orderstatus").as("source_text_phenotype"),
      concat(lit("HP:000"), col("o_orderkey") % 1000).as("hpo_id_phenotype"),
      when(col("o_orderkey") % 6 === 0, concat(lit("1234"), col("o_orderkey") % 10))
        .otherwise("Not Reported").as("snomed_id_phenotype"),
      when(col("o_orderkey") % 2 === 0, "Positive").otherwise("Negative").as("observed"),
      (col("o_orderkey") % 6000).cast("string").as("age_at_event_days"),
      lit("True").as("visible"))

    val outcomes = orders.where(col("o_orderkey") % 7 === 0).select(
      concat(lit("OC_"), col("o_orderkey")).as("kf_id"),
      concat(lit("oc-"), col("o_orderkey")).as("external_id"),
      concat(lit("PT_"), col("o_custkey")).as("participant_id"),
      when(col("o_orderkey") % 2 === 0, "Alive").otherwise("Deceased").as("vital_status"),
      when(col("o_orderkey") % 3 === 0, "True").otherwise("False").as("disease_related"),
      (col("o_orderkey") % 7000).cast("string").as("age_at_event_days"),
      lit("True").as("visible"))

    // The five biospecimen-chain endpoints all derive from this join.
    // Deliberately NOT persisted: endpoints() hands lazy plans to
    // callers, so a persist here has no owner that could ever release
    // it — each call in a long-lived session leaked one cached copy of
    // the full-width join (the d10 warm-cache defect class). Unpersisted,
    // each endpoint re-plans the join COLUMN-PRUNED to just the columns
    // it projects (e.g. biospecimenDiagnoses reads only the two keys),
    // which at 100 TB moves far fewer bytes than one materialized
    // all-columns cache ever would.
    val li = lineitem
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .withColumn("bs_key", concat(col("l_orderkey"), lit("_"), col("l_linenumber")))

    val biospecimens = li.select(
      concat(lit("BS_"), col("bs_key")).as("kf_id"),
      concat(lit("PT_"), col("o_custkey")).as("participant_id"),
      concat(lit("SC_"), col("l_suppkey")).as("sequencing_center_id"),
      (col("l_orderkey") % 4000).cast("string").as("age_at_event_days"),
      when(col("l_linenumber") % 2 === 0, "DNA").otherwise("RNA").as("analyte_type"),
      when(col("l_linenumber") % 3 === 0, "Blood")
        .when(col("l_linenumber") % 3 === 1, "Saliva")
        .otherwise("Unmapped composition").as("composition"),
      when(col("l_linenumber") % 2 === 0, "GRU").otherwise(lit(null).cast("string"))
        .as("consent_type"),
      concat(lit("phs00000"), col("l_suppkey") % 5, lit(".c"), col("l_linenumber"))
        .as("dbgap_consent_code"),
      concat(lit("aliquot-"), col("bs_key")).as("external_aliquot_id"),
      concat(lit("sample-"), col("l_orderkey")).as("external_sample_id"),
      when(col("l_linenumber") % 2 === 0, "Blood Draw").otherwise("Biopsy")
        .as("method_of_smaple_procurement"),
      concat(lit("NCIT:C"), col("l_suppkey") % 100).as("ncit_id_anatomical_site"),
      when(col("l_linenumber") % 2 === 0, concat(lit("NCIT:C"), col("l_partkey") % 100))
        .otherwise("no-prefix").as("ncit_id_tissue_type"),
      lit("Chest wall").as("source_text_anatomical_site"),
      when(col("l_linenumber") % 2 === 0, "Tumor").otherwise(lit(null).cast("string"))
        .as("source_text_tissue_type"),
      when(col("l_linenumber") % 2 === 0, "Primary").otherwise("N/A")
        .as("source_text_tumor_descriptor"),
      lit(null).cast("string").as("spatial_descriptor"),
      when(col("l_linenumber") % 3 === 0, concat(lit("UBERON:00"), col("l_partkey") % 100))
        .when(col("l_linenumber") % 3 === 1, concat(lit("EFO:"), col("l_partkey") % 100))
        .otherwise("bare-code").as("uberon_id_anatomical_site"),
      col("l_quantity").cast("string").as("volume_ul"),
      lit("True").as("visible"))

    val biospecimenDiagnoses = li.select(
      concat(lit("BD_"), col("bs_key")).as("kf_id"),
      concat(lit("bd-"), col("bs_key")).as("external_id"),
      concat(lit("BS_"), col("bs_key")).as("biospecimen_id"),
      concat(lit("DG_"), col("l_orderkey")).as("diagnosis_id"),
      lit("True").as("visible"))

    val dataTypes = typedLit(Map(
      0 -> "Aligned Reads", 1 -> "Variant Calls", 2 -> "gVCF",
      3 -> "Simple Nucleotide Variations", 4 -> "Somatic Structural Variations"))
    val genomicFiles = li.select(
      concat(lit("GF_"), col("bs_key")).as("kf_id"),
      concat(lit("gf-"), col("bs_key")).as("external_id"),
      md5(concat(lit("did:"), col("bs_key"))).as("latest_did"),
      element_at(dataTypes, (col("l_partkey") % 5).cast("int")).as("data_type"),
      when(col("l_partkey") % 5 >= 3, "tbi").otherwise("cram").as("file_format"),
      lit("True").as("is_harmonized"),
      lit("GRCh38").as("reference_genome"),
      when(col("l_orderkey") % 2 === 0, "True").otherwise("False").as("controlled_access"),
      lit(null).cast("string").as("availability"),
      lit("True").as("visible"))

    val biospecimenGenomicFiles = li.select(
      concat(lit("BGF_"), col("bs_key")).as("kf_id"),
      concat(lit("bgf-"), col("bs_key")).as("external_id"),
      concat(lit("BS_"), col("bs_key")).as("biospecimen_id"),
      concat(lit("GF_"), col("bs_key")).as("genomic_file_id"),
      lit("True").as("visible"))

    val seqExpGenomicFiles = li.select(
      concat(lit("SGF_"), col("bs_key")).as("kf_id"),
      concat(lit("sgf-"), col("bs_key")).as("external_id"),
      concat(lit("SE_"), col("l_suppkey")).as("sequencing_experiment_id"),
      concat(lit("GF_"), col("bs_key")).as("genomic_file_id"),
      lit("True").as("visible"))

    val sequencingExperiments = Tables.supplier(s, d).select(
      concat(lit("SE_"), col("s_suppkey")).as("kf_id"),
      concat(lit("se-"), col("s_suppkey")).as("external_id"),
      when(col("s_suppkey") % 2 === 0, "WGS").otherwise("RNA-Seq")
        .as("experiment_strategy"),
      lit("True").as("visible"))

    Map(
      "studies" -> studies,
      "investigators" -> investigators,
      "participants" -> participants,
      "families" -> families,
      "family-relationships" -> familyRelationships,
      "diagnoses" -> diagnoses,
      "phenotypes" -> phenotypes,
      "outcomes" -> outcomes,
      "biospecimen-diagnoses" -> biospecimenDiagnoses,
      "biospecimens" -> biospecimens,
      "biospecimen-genomic-files" -> biospecimenGenomicFiles,
      "genomic-files" -> genomicFiles,
      "sequencing-experiment-genomic-files" -> seqExpGenomicFiles,
      "sequencing-experiments" -> sequencingExperiments)
  }

  /** Synthetic Indexd dimension for the DRS builder's bulk-prefetch path
    * (replaces the reference's per-row REST GET, S6). Exactly ONE row
    * per genomic file — the Indexd GET returns one document per file —
    * so the synthetic data's duplicate (orderkey, linenumber) pairs
    * must be deduped deterministically or the DRS left join fans out.
    */
  def indexd(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // narrow derivation (no orders join needed), kept independent of the
    // endpoints() cache
    val li = Tables.lineitem(s, d)
      .withColumn("bs_key", concat(col("l_orderkey"), lit("_"), col("l_linenumber")))
    val rows = li.select(
      concat(lit("GF_"), col("bs_key")).as("gf_id"),
      when(col("l_orderkey") % 3 === 0,
        array(concat(lit("phs00000"), col("l_suppkey") % 5, lit(".c1")), lit("open")))
        .otherwise(array(lit("nocode"))).as("acl"),
      (col("l_extendedprice") * 100).cast("long").as("size"),
      map(lit("md5"), md5(concat(lit("content:"), col("bs_key"))),
        lit("sha256"), sha2(concat(lit("content:"), col("bs_key")), 256)).as("hashes"),
      concat(lit("s3://bucket/prefix/file_"), col("bs_key"), lit(".cram"))
        .as("file_name"))
    rows.withColumn("__rk", row_number().over(
        Window.partitionBy(col("gf_id")).orderBy(col("size").desc,
          coalesce(get(col("acl"), lit(0)), lit("")))))
      .where(col("__rk") === 1).drop("__rk")
  }
}
