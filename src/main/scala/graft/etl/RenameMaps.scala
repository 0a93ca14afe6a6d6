package graft.etl

import Concepts._

/** Physical → concept-namespace rename maps, one per Dataservice endpoint
  * (the 13+1 rename blocks at kf_task_fhir_etl/etl/ingest.py:147-483).
  * Pure metadata consumed by `RelationalOps.renameColumns` (a Project —
  * zero runtime cost).
  */
object RenameMaps {

  /** etl/ingest.py:147-163 */
  val studies: Map[String, String] = Map(
    "investigator_id"       -> Investigator.TargetServiceId,
    "attribution"           -> Study.Attribution,
    "data_access_authority" -> Study.Authority,
    "domain"                -> Study.Domain,
    "external_id"           -> Study.Id,
    "kf_id"                 -> Study.TargetServiceId,
    "name"                  -> Study.Name,
    "program"               -> Study.Program,
    "release_status"        -> Study.ReleaseStatus,
    "short_code"            -> Study.ShortCode,
    "short_name"            -> Study.ShortName,
    "version"               -> Study.Version,
    "visible"               -> Study.Visible)

  /** etl/ingest.py:169-177 */
  val investigators: Map[String, String] = Map(
    "external_id" -> Investigator.Id,
    "institution" -> Investigator.Institution,
    "kf_id"       -> Investigator.TargetServiceId,
    "name"        -> Investigator.Name,
    "visible"     -> Investigator.Visible)

  /** etl/ingest.py:195-210 */
  val participants: Map[String, String] = Map(
    "family_id"          -> Family.TargetServiceId,
    "study_id"           -> Study.TargetServiceId,
    "affected_status"    -> Participant.IsAffectedUnderStudy,
    "diagnosis_category" -> Study.Category,
    "ethnicity"          -> Participant.Ethnicity,
    "external_id"        -> Participant.Id,
    "gender"             -> Participant.Gender,
    "is_proband"         -> Participant.IsProband,
    "kf_id"              -> Participant.TargetServiceId,
    "race"               -> Participant.Race,
    "species"            -> Participant.Species,
    "visible"            -> Participant.Visible)

  /** etl/ingest.py:228-234 */
  val families: Map[String, String] = Map(
    "external_id" -> Family.Id,
    "kf_id"       -> Family.TargetServiceId,
    "visible"     -> Family.Visible)

  /** etl/ingest.py:246-255 */
  val familyRelationships: Map[String, String] = Map(
    "participant1_id" -> FamilyRelationship.Person1,
    "participant2_id" -> FamilyRelationship.Person2,
    "external_id"     -> FamilyRelationship.Id,
    "kf_id"           -> FamilyRelationship.TargetServiceId,
    "participant1_to_participant2_relation" -> FamilyRelationship.RelationFrom1To2,
    "visible"         -> FamilyRelationship.Visible)

  /** etl/ingest.py:264-280 */
  val diagnoses: Map[String, String] = Map(
    "external_id"               -> Diagnosis.Id,
    "source_text_diagnosis"     -> Diagnosis.Name,
    "diagnosis_category"        -> Diagnosis.Category,
    "source_text_tumor_location" -> Diagnosis.TumorLocation,
    "age_at_event_days"         -> Diagnosis.EventAgeDays,
    "mondo_id_diagnosis"        -> Diagnosis.MondoId,
    "icd_id_diagnosis"          -> Diagnosis.IcdId,
    "uberon_id_tumor_location"  -> Diagnosis.UberonTumorLocationId,
    "ncit_id_diagnosis"         -> Diagnosis.NcitId,
    "spatial_descriptor"        -> Diagnosis.SpatialDescriptor,
    "participant_id"            -> Participant.TargetServiceId,
    "kf_id"                     -> Diagnosis.TargetServiceId,
    "visible"                   -> Diagnosis.Visible)

  /** etl/ingest.py:292-304 */
  val phenotypes: Map[String, String] = Map(
    "external_id"           -> Phenotype.Id,
    "source_text_phenotype" -> Phenotype.Name,
    "hpo_id_phenotype"      -> Phenotype.HpoId,
    "snomed_id_phenotype"   -> Phenotype.SnomedId,
    "observed"              -> Phenotype.Observed,
    "age_at_event_days"     -> Phenotype.EventAgeDays,
    "participant_id"        -> Participant.TargetServiceId,
    "kf_id"                 -> Phenotype.TargetServiceId,
    "visible"               -> Phenotype.Visible)

  /** etl/ingest.py:316-326 */
  val outcomes: Map[String, String] = Map(
    "participant_id"    -> Participant.TargetServiceId,
    "age_at_event_days" -> Outcome.EventAgeDays,
    "disease_related"   -> Outcome.DiseaseRelated,
    "external_id"       -> Outcome.Id,
    "kf_id"             -> Outcome.TargetServiceId,
    "visible"           -> Outcome.Visible,
    "vital_status"      -> Outcome.VitalStatus)

  /** etl/ingest.py:338-346 */
  val biospecimenDiagnoses: Map[String, String] = Map(
    "biospecimen_id" -> Biospecimen.TargetServiceId,
    "diagnosis_id"   -> Diagnosis.TargetServiceId,
    "external_id"    -> BiospecimenDiagnosis.Id,
    "kf_id"          -> BiospecimenDiagnosis.TargetServiceId,
    "visible"        -> BiospecimenDiagnosis.Visible)

  /** etl/ingest.py:357-380 (incl. the reference's "smaple" typo key) */
  val biospecimens: Map[String, String] = Map(
    "participant_id"              -> Participant.TargetServiceId,
    "sequencing_center_id"        -> Sequencing.CenterTargetServiceId,
    "age_at_event_days"           -> Biospecimen.EventAgeDays,
    "analyte_type"                -> Biospecimen.Analyte,
    "composition"                 -> Biospecimen.Composition,
    "consent_type"                -> Biospecimen.ConsentShortName,
    "dbgap_consent_code"          -> Biospecimen.DbgapStyleConsentCode,
    "external_aliquot_id"         -> Biospecimen.Id,
    "external_sample_id"          -> Biospecimen.GroupId,
    "kf_id"                       -> Biospecimen.TargetServiceId,
    "method_of_smaple_procurement" -> Biospecimen.SampleProcurement,
    "ncit_id_anatomical_site"     -> Biospecimen.NcitAnatomySiteId,
    "ncit_id_tissue_type"         -> Biospecimen.NcitTissueTypeId,
    "source_text_anatomical_site" -> Biospecimen.AnatomySite,
    "source_text_tissue_type"     -> Biospecimen.TissueType,
    "source_text_tumor_descriptor" -> Biospecimen.TumorDescriptor,
    "spatial_descriptor"          -> Biospecimen.SpatialDescriptor,
    "uberon_id_anatomical_site"   -> Biospecimen.UberonAnatomySiteId,
    "visible"                     -> Biospecimen.Visible,
    "volume_ul"                   -> Biospecimen.VolumeUl)

  /** etl/ingest.py:402-410 */
  val biospecimenGenomicFiles: Map[String, String] = Map(
    "genomic_file_id" -> GenomicFile.TargetServiceId,
    "biospecimen_id"  -> Biospecimen.TargetServiceId,
    "kf_id"           -> BiospecimenGenomicFile.TargetServiceId,
    "visible"         -> BiospecimenGenomicFile.Visible,
    "external_id"     -> BiospecimenGenomicFile.Id)

  /** etl/ingest.py:421-434 */
  val genomicFiles: Map[String, String] = Map(
    "latest_did"        -> GenomicFile.LatestDid,
    "external_id"       -> GenomicFile.Id,
    "data_type"         -> GenomicFile.DataType,
    "file_format"       -> GenomicFile.FileFormat,
    "is_harmonized"     -> GenomicFile.Harmonized,
    "reference_genome"  -> GenomicFile.ReferenceGenome,
    "controlled_access" -> GenomicFile.ControlledAccess,
    "availability"      -> GenomicFile.Availability,
    "kf_id"             -> GenomicFile.TargetServiceId,
    "visible"           -> GenomicFile.Visible)

  /** etl/ingest.py:448-456 */
  val sequencingExperimentGenomicFiles: Map[String, String] = Map(
    "external_id"              -> SequencingGenomicFile.Id,
    "sequencing_experiment_id" -> Sequencing.TargetServiceId,
    "genomic_file_id"          -> GenomicFile.TargetServiceId,
    "kf_id"                    -> SequencingGenomicFile.TargetServiceId,
    "visible"                  -> SequencingGenomicFile.Visible)

  /** etl/ingest.py:470-477 */
  val sequencingExperiments: Map[String, String] = Map(
    "experiment_strategy" -> Sequencing.Strategy,
    "external_id"         -> Sequencing.Id,
    "kf_id"               -> Sequencing.TargetServiceId,
    "visible"             -> Sequencing.Visible)

  /** Endpoint name → rename map, keyed as the extract stage keys its
    * snapshot (etl/ingest.py:111-123).
    */
  val byEndpoint: Map[String, Map[String, String]] = Map(
    "studies"               -> studies,
    "investigators"         -> investigators,
    "participants"          -> participants,
    "families"              -> families,
    "family-relationships"  -> familyRelationships,
    "diagnoses"             -> diagnoses,
    "phenotypes"            -> phenotypes,
    "outcomes"              -> outcomes,
    "biospecimen-diagnoses" -> biospecimenDiagnoses,
    "biospecimens"          -> biospecimens,
    "biospecimen-genomic-files" -> biospecimenGenomicFiles,
    "genomic-files"         -> genomicFiles,
    "sequencing-experiment-genomic-files" -> sequencingExperimentGenomicFiles,
    "sequencing-experiments" -> sequencingExperiments)
}
