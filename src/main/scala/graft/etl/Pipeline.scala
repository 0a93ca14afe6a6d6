package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.storage.StorageLevel

import graft.documents._

/** The load-stage orchestrator: runs every registered entity builder over
  * the transformed study (etl/ingest.py:495-517 + LoadStage semantics),
  * in the reference's topological order (kf_api_fhir_service.py:115-132)
  * so cross-resource surrogate references resolve.
  *
  * Scale notes: the wide DataFrame feeds up to 16 builder pipelines —
  * persist it once (spillable, not RAM-pinned like the reference's
  * pandas frame). Each builder prunes to its own concept columns, so
  * the persisted columnar batches are scanned, not recomputed.
  */
object Pipeline {

  /** builder name → DataFrame of (key, resource_type, resource_json). */
  def buildAll(result: Transform.Result,
      indexd: Option[DataFrame] = None,
      centerNames: Map[String, String] = Map.empty): Seq[(String, DataFrame)] = {
    val wide = result.wide
    val has = (col: String) => wide.columns.contains(col)
    val C = Concepts
    val builders: Map[String, () => DataFrame] = Map(
      "practitioner" -> (() => InvestigatorBuilders.practitioner(wide)),
      "organization" -> (() => InvestigatorBuilders.organization(wide)),
      "practitioner_role" -> (() => InvestigatorBuilders.practitionerRole(wide)),
      "patient" -> (() => FhirBuilders.patient(wide)),
      "proband_status" -> (() => ParticipantBuilders.probandStatus(wide)),
      "family_relationship" -> (() => RelationshipBuilders.familyRelationship(
        result.familyRelationship.get)),
      "family" -> (() => FhirBuilders.family(wide)),
      "research_study" -> (() => FhirBuilders.researchStudy(wide)),
      "research_subject" -> (() => ParticipantBuilders.researchSubject(wide)),
      "disease" -> (() => ConditionBuilders.disease(wide)),
      "phenotype" -> (() => ConditionBuilders.phenotype(wide)),
      "vital_status" -> (() => ParticipantBuilders.vitalStatus(wide)),
      "sequencing_center" -> (() => ParticipantBuilders.sequencingCenter(wide, centerNames)),
      "specimen" -> (() => SpecimenBuilder.specimen(wide)),
      "histopathology" -> (() => ConditionBuilders.histopathology(wide)),
      "drs_document_reference" -> (() => DrsBuilder.drsDocumentReference(wide, indexd)))
    result.targets.map(name => name -> builders(name)())
  }

  /** All resources of a study as one DataFrame, builders sequenced in
    * load order (driver-side ordering; within Spark each is independent).
    */
  def buildAllUnion(result: Transform.Result,
      indexd: Option[DataFrame] = None,
      centerNames: Map[String, String] = Map.empty): DataFrame = {
    val wide = result.wide.persist(StorageLevel.MEMORY_AND_DISK)
    val parts = buildAll(result.copy(wide = wide), indexd, centerNames)
    parts.map { case (name, df) => df.withColumn("builder", lit(name)) }
      .reduce(_ unionByName _)
  }
}
