package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** Condition resources (disease, phenotype) and the histopathology
  * Observation linking specimen + diagnosis.
  */
object ConditionBuilders {

  private val c = (n: String) => col(s"`$n`")

  private def emit(df: DataFrame, key: Column, resourceType: String, entity: Column): DataFrame =
    df.select(key.as("key"), lit(resourceType).as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))

  /** A coding with system+code only (ontology ids), added when the value
    * is truthy and not a sentinel (disease.py:123-143).
    */
  private def ontologyCoding(system: String, value: Column, sentinels: Set[String]): Column =
    when(present(value) && !value.isin(sentinels.toSeq: _*),
      struct(lit(system).as("system"), value.as("code"),
        lit(null).cast("string").as("display")))

  /** disease.py:38-200. */
  def disease(wide: DataFrame): DataFrame = {
    val S = Codes.conditionMissingDataValues
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Diagnosis.TargetServiceId).as("dx_id"),
      c(Participant.IsAffectedUnderStudy).as("affected"),
      c(Diagnosis.Name).as("name"),
      c(Diagnosis.MondoId).as("mondo_id"),
      c(Diagnosis.IcdId).as("icd_id"),
      c(Diagnosis.NcitId).as("ncit_id"),
      c(Diagnosis.TumorLocation).as("tumor_location"),
      c(Diagnosis.UberonTumorLocationId).as("uberon_id"),
      c(Diagnosis.EventAgeDays).as("age_days"))
      .where(col("dx_id").isNotNull)
      .dropDuplicates("dx_id")
    val bodySite = {
      val coding = ontologyCoding("http://purl.obolibrary.org/obo/uberon.owl",
        col("uberon_id"), S)
      val site = struct(
        when(size(filter(array(coding), x => x.isNotNull)) > 0,
          filter(array(coding), x => x.isNotNull)).as("coding"),
        optional(col("tumor_location"), col("tumor_location")).as("text"))
      when(present(col("tumor_location")) || coding.isNotNull, array(site))
    }
    val entity = struct(
      lit("Condition").as("resourceType"),
      surrogateId("Condition/disease", col("dx_id")).as("id"),
      struct(
        array(lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/disease"))
          .as("profile"),
        array(struct(col("study_id").as("code"))).as("tag")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/diagnoses/", col("dx_id")))
        .as("identifier"),
      codeableConcept(lit("Active"),
        codingLit(Codes.Coding("http://terminology.hl7.org/CodeSystem/condition-clinical",
          "active", "Active"))).as("clinicalStatus"),
      array(struct(array(codingLit(Codes.Coding(
        "http://terminology.hl7.org/CodeSystem/condition-category",
        "encounter-diagnosis", "Encounter Diagnosis"))).as("coding"))).as("category"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      optional(col("affected"),
        codeableConcept(col("affected"),
          Codes.codingLookup(Codes.affectedVerificationCoding, col("affected"))))
        .as("verificationStatus"),
      codeableConcept(col("name"),
        ontologyCoding("http://purl.obolibrary.org/obo/mondo.owl", col("mondo_id"), S),
        ontologyCoding("https://www.who.int/classifications/classification-of-diseases",
          col("icd_id"), S),
        ontologyCoding("http://purl.obolibrary.org/obo/ncit.owl", col("ncit_id"), S))
        .as("code"),
      bodySite.as("bodySite"),
      relativeDateExtension(col("age_days")).as("_recordedDate"))
    emit(rows, col("dx_id"), "Condition", entity)
  }

  /** phenotype.py:38-154. */
  def phenotype(wide: DataFrame): DataFrame = {
    val S = Codes.conditionMissingDataValues
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Phenotype.TargetServiceId).as("ph_id"),
      c(Phenotype.Observed).as("observed"),
      c(Phenotype.Name).as("name"),
      c(Phenotype.HpoId).as("hpo_id"),
      c(Phenotype.SnomedId).as("snomed_id"),
      c(Phenotype.EventAgeDays).as("age_days"))
      .where(col("ph_id").isNotNull)
      .dropDuplicates("ph_id")
    val entity = struct(
      lit("Condition").as("resourceType"),
      surrogateId("Condition/phenotype", col("ph_id")).as("id"),
      struct(
        array(lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/phenotype"))
          .as("profile"),
        array(struct(col("study_id").as("code"))).as("tag")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/phenotypes/", col("ph_id")))
        .as("identifier"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      codeableConcept(col("observed"),
        Codes.codingLookup(Codes.observedVerificationCoding, col("observed")))
        .as("verificationStatus"),
      codeableConcept(col("name"),
        ontologyCoding("http://purl.obolibrary.org/obo/hp.owl", col("hpo_id"), S),
        ontologyCoding("http://snomed.info/sct", col("snomed_id"), S))
        .as("code"),
      relativeDateExtension(col("age_days")).as("_recordedDate"))
    emit(rows, col("ph_id"), "Condition", entity)
  }

  /** histopathology.py:28-126 — subject/focus/specimen references with
    * its own sentinel set for the tumor-descriptor value.
    */
  def histopathology(wide: DataFrame): DataFrame = {
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(BiospecimenDiagnosis.TargetServiceId).as("bd_id"),
      c(Diagnosis.TargetServiceId).as("dx_id"),
      c(Biospecimen.TargetServiceId).as("bs_id"),
      c(Biospecimen.TumorDescriptor).as("tumor_descriptor"))
      .where(col("bd_id").isNotNull)
      .dropDuplicates("bd_id")
    val entity = struct(
      lit("Observation").as("resourceType"),
      surrogateId("Observation/histo", col("bd_id")).as("id"),
      meta("Observation", col("study_id")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/biospecimen-diagnoses/", col("bd_id")))
        .as("identifier"),
      lit("final").as("status"),
      array(codeableConcept(lit("Histopathology"),
        codingLit(Codes.Coding("http://terminology.hl7.org/CodeSystem/observation-category",
          "laboratory", "Laboratory")))).as("category"),
      codeableConcept(lit("Histopathology"),
        codingLit(Codes.Coding("http://snomed.info/sct", "250537006",
          "Histopathology finding (finding)"))).as("code"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      array(reference("Condition", surrogateId("Condition/disease", col("dx_id"))))
        .as("focus"),
      reference("Specimen", surrogateId("Specimen", col("bs_id"))).as("specimen"),
      when(present(col("tumor_descriptor")) &&
          !col("tumor_descriptor").isin(Codes.histopathologyMissingDataValues.toSeq: _*),
        struct(col("tumor_descriptor").as("text"))).as("valueCodeableConcept"))
    emit(rows, col("bd_id"), "Observation", entity)
  }
}
