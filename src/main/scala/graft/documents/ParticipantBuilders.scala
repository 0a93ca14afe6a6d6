package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** Participant-derived Observation/ResearchSubject resources plus the
  * sequencing-center Organization.
  */
object ParticipantBuilders {

  private val c = (n: String) => col(s"`$n`")

  private def emit(df: DataFrame, key: Column, resourceType: String, entity: Column): DataFrame =
    df.select(key.as("key"), lit(resourceType).as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))

  /** proband_status.py:30-99. The reference's identifier value is
    * `bool(proband_status)` — Python truthiness makes that True for ANY
    * non-empty string including "False" (SURVEY §7.4 quirk 3); we
    * reproduce it deliberately: true iff the cleaned value is non-null.
    */
  def probandStatus(wide: DataFrame): DataFrame = {
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Participant.IsProband).as("proband"))
      .where(col("pid").isNotNull && col("proband").isNotNull)
      .dropDuplicates("pid")
    val entity = struct(
      lit("Observation").as("resourceType"),
      surrogateId("Observation/proband", col("pid")).as("id"),
      meta("Observation", col("study_id")).as("meta"),
      array(struct(lit("official").as("use"),
        lit(s"$KfDataserviceBase/participants?is_proband=").as("system"),
        present(col("proband")).as("value"))).as("identifier"),
      lit("final").as("status"),
      codeableConcept(lit("Proband status"),
        codingLit(Codes.Coding("http://snomed.info/sct", "85900004", "Proband (finding)")))
        .as("code"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      codeableConcept(col("proband"),
        Codes.codingLookup(Codes.probandValueCoding, col("proband")))
        .as("valueCodeableConcept"))
    emit(rows, col("pid"), "Observation", entity)
  }

  /** research_subject.py:18-76. */
  def researchSubject(wide: DataFrame): DataFrame = {
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Participant.Id).as("external_id"))
      .where(col("pid").isNotNull && col("study_id").isNotNull)
      .dropDuplicates("pid")
    val entity = struct(
      lit("ResearchSubject").as("resourceType"),
      surrogateId("ResearchSubject", col("pid")).as("id"),
      meta("ResearchSubject", col("study_id")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/participants/", col("pid")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      lit("off-study").as("status"),
      reference("ResearchStudy", surrogateId("ResearchStudy", col("study_id"))).as("study"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("individual"))
    emit(rows, col("pid"), "ResearchSubject", entity)
  }

  /** vital_status.py:29-134 — NCPI vital-status profile, relative-date
    * on _effectiveDateTime, text+optional-coding value.
    */
  def vitalStatus(wide: DataFrame): DataFrame = {
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Outcome.TargetServiceId).as("outcome_id"),
      c(Outcome.VitalStatus).as("vital_status"),
      c(Outcome.EventAgeDays).as("age_days"))
      .where(col("outcome_id").isNotNull)
      .dropDuplicates("outcome_id")
    val entity = struct(
      lit("Observation").as("resourceType"),
      surrogateId("Observation/vital", col("outcome_id")).as("id"),
      struct(
        array(lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/vital-status"))
          .as("profile"),
        array(struct(col("study_id").as("code"))).as("tag")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/outcomes/", col("outcome_id")))
        .as("identifier"),
      lit("final").as("status"),
      codeableConcept(lit("Clinical status"),
        codingLit(Codes.Coding("http://snomed.info/sct", "263493007",
          "Clinical status (attribute)"))).as("code"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      relativeDateExtension(col("age_days")).as("_effectiveDateTime"),
      optional(col("vital_status"),
        codeableConcept(col("vital_status"),
          Codes.codingLookup(Codes.vitalStatusCoding, col("vital_status"))))
        .as("valueCodeableConcept"))
    emit(rows, col("outcome_id"), "Observation", entity)
  }

  /** sequencing_center.py:12-69. Center display names come from the
    * public kf-lib-data-ingest sequencing-center constants; injectable
    * here, name omitted on miss (same `if name:` behavior).
    */
  def sequencingCenter(wide: DataFrame,
      centerNames: Map[String, String] = Map.empty): DataFrame = {
    val rows = wide.select(c(Sequencing.CenterTargetServiceId).as("sc_id"))
      .where(col("sc_id").isNotNull)
      .dropDuplicates("sc_id")
    val name =
      if (centerNames.isEmpty) lit(null).cast("string")
      else Codes.stringLookup(centerNames, col("sc_id"))
    val entity = struct(
      lit("Organization").as("resourceType"),
      surrogateId("Organization/sc", col("sc_id")).as("id"),
      struct(array(lit("http://hl7.org/fhir/StructureDefinition/Organization"))
        .as("profile")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/sequencing-centers/", col("sc_id")))
        .as("identifier"),
      name.as("name"))
    emit(rows, col("sc_id"), "Organization", entity)
  }
}
