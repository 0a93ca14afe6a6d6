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
    * tag (family_relationship.py:329-343) — in its per-study run the
    * record's study is ambient. Distributed over many studies at once,
    * we derive it per row from the participants table: each member's
    * `study_id`, person1 first (both members share a study in practice;
    * coalesce covers an orphan person1). `studyByParticipant` is the
    * 2-column (participant kf_id, study kf_id) projection — an equi-join
    * either way, broadcastable when small, shuffle-safe at scale.
    * `None` mirrors the missing-column behavior (null tag).
    */
  def familyRelationship(frTable: DataFrame,
      studyByParticipant: Option[DataFrame] = None): DataFrame = {
    val base = frTable.select(
      c(FamilyRelationship.TargetServiceId).as("fr_id"),
      c(FamilyRelationship.Id).as("external_id"),
      c(FamilyRelationship.Person1).as("p1"),
      c(FamilyRelationship.Person2).as("p2"),
      c(FamilyRelationship.RelationFrom1To2).as("relation"))
      .where(col("fr_id").isNotNull)
      .dropDuplicates("fr_id")
    val rows = studyByParticipant match {
      case Some(sbp) =>
        // dedup the map side so a duplicated participant row can never
        // multiply relationship rows through the join
        val m = sbp.toDF("__pid", "__study")
          .where(col("__pid").isNotNull).dropDuplicates("__pid")
        base
          .join(m.toDF("p1", "__study1"), Seq("p1"), "left")
          .join(m.toDF("p2", "__study2"), Seq("p2"), "left")
          .withColumn("__study", coalesce(col("__study1"), col("__study2")))
          .drop("__study1", "__study2")
      case None => base.withColumn("__study", lit(null).cast("string"))
    }
    val studyId = col("__study")
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
      FhirJson.entityJson(entity).as("resource_json"))
  }
}
