package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** FamilyRelationship Observation over the standalone cleaned
  * family-relationship table (family_relationship.py:310-404).
  */
object RelationshipBuilders {

  private val c = (n: String) => col(s"`$n`")

  /** Note: the reference reads `record[CONCEPT.PROJECT.ID]` for the study
    * tag (family_relationship.py:329) — a column the family-relationship
    * table never carries. We accept the study id from the driver (which
    * knows which study is being processed) instead; `lit(null)` mirrors
    * the reference's missing-column behavior.
    */
  def familyRelationship(frTable: DataFrame,
      studyId: Column = lit(null).cast("string")): DataFrame = {
    val rows = frTable.select(
      c(FamilyRelationship.TargetServiceId).as("fr_id"),
      c(FamilyRelationship.Id).as("external_id"),
      c(FamilyRelationship.Person1).as("p1"),
      c(FamilyRelationship.Person2).as("p2"),
      c(FamilyRelationship.RelationFrom1To2).as("relation"))
      .where(col("fr_id").isNotNull)
      .dropDuplicates("fr_id")
    val entity = struct(
      lit("Observation").as("resourceType"),
      surrogateId("Observation/famrel", col("fr_id")).as("id"),
      struct(
        array(lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/family-relationship"))
          .as("profile"),
        array(struct(studyId.as("code"))).as("tag")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/family-relationships/", col("fr_id")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      lit("final").as("status"),
      codeableConcept(lit("Family Relationship"),
        codingLit(Codes.Coding("http://terminology.hl7.org/CodeSystem/v3-RoleCode",
          "FAMMEMB", "family member"))).as("code"),
      reference("Patient", surrogateId("Patient", col("p1"))).as("subject"),
      array(reference("Patient", surrogateId("Patient", col("p2")))).as("focus"),
      optional(col("relation"),
        codeableConcept(col("relation"),
          Codes.codingLookup(Codes.familyRelationshipCoding, col("relation"))))
        .as("valueCodeableConcept"))
    rows.select(col("fr_id").as("key"), lit("Observation").as("resource_type"),
      to_json(entity).as("resource_json"))
  }
}
