package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** Investigator-derived resources: Practitioner, Organization,
  * PractitionerRole (entity_builders/practitioner.py:11-63,
  * organization.py:11-53, practitioner_role.py:15-82).
  */
object InvestigatorBuilders {

  private val IdSystem = s"$KfDataserviceBase/investigators/"

  private def invRows(wide: DataFrame): DataFrame = {
    val c = (n: String) => col(s"`$n`")
    wide.select(
      c(Investigator.TargetServiceId).as("inv_id"),
      c(Investigator.Id).as("external_id"),
      c(Investigator.Name).as("inv_name"),
      c(Investigator.Institution).as("institution"))
      .where(col("inv_id").isNotNull)
      .dropDuplicates("inv_id")
  }

  private def emit(df: DataFrame, resourceType: String, entity: Column): DataFrame =
    df.select(col("inv_id").as("key"), lit(resourceType).as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))

  /** practitioner.py:11-63 — no study tag on meta. */
  def practitioner(wide: DataFrame): DataFrame = {
    val entity = struct(
      lit("Practitioner").as("resourceType"),
      surrogateId("Practitioner", col("inv_id")).as("id"),
      struct(array(lit("http://hl7.org/fhir/StructureDefinition/Practitioner"))
        .as("profile")).as("meta"),
      compactArray(
        officialIdentifier(IdSystem, col("inv_id")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      lit(true).as("active"),
      optional(col("inv_name"),
        array(struct(col("inv_name").as("text")))).as("name"))
    emit(invRows(wide), "Practitioner", entity)
  }

  /** organization.py:11-53. */
  def organization(wide: DataFrame): DataFrame = {
    val entity = struct(
      lit("Organization").as("resourceType"),
      surrogateId("Organization", col("inv_id")).as("id"),
      struct(array(lit("http://hl7.org/fhir/StructureDefinition/Organization"))
        .as("profile")).as("meta"),
      array(officialIdentifier(IdSystem, col("inv_id"))).as("identifier"),
      lit(true).as("active"),
      optional(col("institution"), col("institution")).as("name"))
    emit(invRows(wide), "Organization", entity)
  }

  /** practitioner_role.py:15-82 — references the Practitioner and
    * Organization surrogates for the same investigator.
    */
  def practitionerRole(wide: DataFrame): DataFrame = {
    val entity = struct(
      lit("PractitionerRole").as("resourceType"),
      surrogateId("PractitionerRole", col("inv_id")).as("id"),
      struct(array(lit("http://hl7.org/fhir/StructureDefinition/PractitionerRole"))
        .as("profile")).as("meta"),
      compactArray(
        officialIdentifier(IdSystem, col("inv_id")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      lit(true).as("active"),
      reference("Practitioner", surrogateId("Practitioner", col("inv_id")))
        .as("practitioner"),
      reference("Organization", surrogateId("Organization", col("inv_id")))
        .as("organization"),
      array(struct(array(codingLit(graft.codes.Codes.Coding(
        "http://terminology.hl7.org/CodeSystem/practitioner-role",
        "researcher", "Researcher"))).as("coding"))).as("code"))
    emit(invRows(wide), "PractitionerRole", entity)
  }
}
