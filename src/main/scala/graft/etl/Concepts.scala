package graft.etl

/** The pipe-delimited concept namespace the reference's transform stage
  * renames every physical column into (kf_task_fhir_etl/etl/ingest.py:147-483;
  * `CONCEPT.X.Y` constants from the public kf-lib-data-ingest
  * concept_schema render as "X|Y" strings — in-repo evidence that the
  * rendered form is used directly: literal "STUDY|DOMAIN" and
  * "GENOMIC_FILE|LATEST_DID" at ingest.py:152,423).
  */
object Concepts {
  object Study {
    val TargetServiceId = "STUDY|TARGET_SERVICE_ID"
    val Id              = "STUDY|ID"
    val Name            = "STUDY|NAME"
    val ShortName       = "STUDY|SHORT_NAME"
    val ShortCode       = "STUDY|SHORT_CODE"
    val Version         = "STUDY|VERSION"
    val Attribution     = "STUDY|ATTRIBUTION"
    val Authority       = "STUDY|AUTHORITY"
    val Domain          = "STUDY|DOMAIN"
    val Program         = "STUDY|PROGRAM"
    val ReleaseStatus   = "STUDY|RELEASE_STATUS"
    val Category        = "STUDY|CATEGORY"
    val Visible         = "STUDY|VISIBLE"
  }
  object Investigator {
    val TargetServiceId = "INVESTIGATOR|TARGET_SERVICE_ID"
    val Id              = "INVESTIGATOR|ID"
    val Name            = "INVESTIGATOR|NAME"
    val Institution     = "INVESTIGATOR|INSTITUTION"
    val Visible         = "INVESTIGATOR|VISIBLE"
  }
  object Participant {
    val TargetServiceId      = "PARTICIPANT|TARGET_SERVICE_ID"
    val Id                   = "PARTICIPANT|ID"
    val IsProband            = "PARTICIPANT|IS_PROBAND"
    val IsAffectedUnderStudy = "PARTICIPANT|IS_AFFECTED_UNDER_STUDY"
    val Gender               = "PARTICIPANT|GENDER"
    val Ethnicity            = "PARTICIPANT|ETHNICITY"
    val Race                 = "PARTICIPANT|RACE"
    val Species              = "PARTICIPANT|SPECIES"
    val Visible              = "PARTICIPANT|VISIBLE"
  }
  object Family {
    val TargetServiceId = "FAMILY|TARGET_SERVICE_ID"
    val Id              = "FAMILY|ID"
    val Visible         = "FAMILY|VISIBLE"
  }
  object FamilyRelationship {
    val TargetServiceId  = "FAMILY_RELATIONSHIP|TARGET_SERVICE_ID"
    val Id               = "FAMILY_RELATIONSHIP|ID"
    val Person1          = "FAMILY_RELATIONSHIP|PERSON1|TARGET_SERVICE_ID"
    val Person2          = "FAMILY_RELATIONSHIP|PERSON2|TARGET_SERVICE_ID"
    val RelationFrom1To2 = "FAMILY_RELATIONSHIP|RELATION_FROM_1_TO_2"
    val Visible          = "FAMILY_RELATIONSHIP|VISIBLE"
  }
  object Diagnosis {
    val TargetServiceId       = "DIAGNOSIS|TARGET_SERVICE_ID"
    val Id                    = "DIAGNOSIS|ID"
    val Name                  = "DIAGNOSIS|NAME"
    val Category              = "DIAGNOSIS|CATEGORY"
    val TumorLocation         = "DIAGNOSIS|TUMOR_LOCATION"
    val EventAgeDays          = "DIAGNOSIS|EVENT_AGE_DAYS"
    val MondoId               = "DIAGNOSIS|MONDO_ID"
    val IcdId                 = "DIAGNOSIS|ICD_ID"
    val NcitId                = "DIAGNOSIS|NCIT_ID"
    val UberonTumorLocationId = "DIAGNOSIS|UBERON_TUMOR_LOCATION_ID"
    val SpatialDescriptor     = "DIAGNOSIS|SPATIAL_DESCRIPTOR"
    val Visible               = "DIAGNOSIS|VISIBLE"
  }
  object Phenotype {
    val TargetServiceId = "PHENOTYPE|TARGET_SERVICE_ID"
    val Id              = "PHENOTYPE|ID"
    val Name            = "PHENOTYPE|NAME"
    val HpoId           = "PHENOTYPE|HPO_ID"
    val SnomedId        = "PHENOTYPE|SNOMED_ID"
    val Observed        = "PHENOTYPE|OBSERVED"
    val EventAgeDays    = "PHENOTYPE|EVENT_AGE_DAYS"
    val Visible         = "PHENOTYPE|VISIBLE"
  }
  object Outcome {
    val TargetServiceId = "OUTCOME|TARGET_SERVICE_ID"
    val Id              = "OUTCOME|ID"
    val VitalStatus     = "OUTCOME|VITAL_STATUS"
    val DiseaseRelated  = "OUTCOME|DISEASE_RELATED"
    val EventAgeDays    = "OUTCOME|EVENT_AGE_DAYS"
    val Visible         = "OUTCOME|VISIBLE"
  }
  object Biospecimen {
    val TargetServiceId        = "BIOSPECIMEN|TARGET_SERVICE_ID"
    val Id                     = "BIOSPECIMEN|ID"
    val GroupId                = "BIOSPECIMEN_GROUP|ID"
    val EventAgeDays           = "BIOSPECIMEN|EVENT_AGE_DAYS"
    val Analyte                = "BIOSPECIMEN|ANALYTE"
    val Composition            = "BIOSPECIMEN|COMPOSITION"
    val ConsentShortName       = "BIOSPECIMEN|CONSENT_SHORT_NAME"
    val DbgapStyleConsentCode  = "BIOSPECIMEN|DBGAP_STYLE_CONSENT_CODE"
    val SampleProcurement      = "BIOSPECIMEN|SAMPLE_PROCUREMENT"
    val NcitAnatomySiteId      = "BIOSPECIMEN|NCIT_ANATOMY_SITE_ID"
    val NcitTissueTypeId       = "BIOSPECIMEN|NCIT_TISSUE_TYPE_ID"
    val AnatomySite            = "BIOSPECIMEN|ANATOMY_SITE"
    val TissueType             = "BIOSPECIMEN|TISSUE_TYPE"
    val TumorDescriptor        = "BIOSPECIMEN|TUMOR_DESCRIPTOR"
    val SpatialDescriptor      = "BIOSPECIMEN|SPATIAL_DESCRIPTOR"
    val UberonAnatomySiteId    = "BIOSPECIMEN|UBERON_ANATOMY_SITE_ID"
    val VolumeUl               = "BIOSPECIMEN|VOLUME_UL"
    val Visible                = "BIOSPECIMEN|VISIBLE"
  }
  object BiospecimenDiagnosis {
    val TargetServiceId = "BIOSPECIMEN_DIAGNOSIS|TARGET_SERVICE_ID"
    val Id              = "BIOSPECIMEN_DIAGNOSIS|ID"
    val Visible         = "BIOSPECIMEN_DIAGNOSIS|VISIBLE"
  }
  object BiospecimenGenomicFile {
    val TargetServiceId = "BIOSPECIMEN_GENOMIC_FILE|TARGET_SERVICE_ID"
    val Id              = "BIOSPECIMEN_GENOMIC_FILE|ID"
    val Visible         = "BIOSPECIMEN_GENOMIC_FILE|VISIBLE"
  }
  object GenomicFile {
    val TargetServiceId  = "GENOMIC_FILE|TARGET_SERVICE_ID"
    val Id               = "GENOMIC_FILE|ID"
    val LatestDid        = "GENOMIC_FILE|LATEST_DID"
    val DataType         = "GENOMIC_FILE|DATA_TYPE"
    val FileFormat       = "GENOMIC_FILE|FILE_FORMAT"
    val Harmonized       = "GENOMIC_FILE|HARMONIZED"
    val ReferenceGenome  = "GENOMIC_FILE|REFERENCE_GENOME"
    val ControlledAccess = "GENOMIC_FILE|CONTROLLED_ACCESS"
    val Availability     = "GENOMIC_FILE|AVAILABILITY"
    val Visible          = "GENOMIC_FILE|VISIBLE"
  }
  object SequencingGenomicFile {
    val TargetServiceId = "SEQUENCING_GENOMIC_FILE|TARGET_SERVICE_ID"
    val Id              = "SEQUENCING_GENOMIC_FILE|ID"
    val Visible         = "SEQUENCING_GENOMIC_FILE|VISIBLE"
  }
  object Sequencing {
    val TargetServiceId       = "SEQUENCING|TARGET_SERVICE_ID"
    val Id                    = "SEQUENCING|ID"
    val Strategy              = "SEQUENCING|STRATEGY"
    val Visible               = "SEQUENCING|VISIBLE"
    val CenterTargetServiceId = "SEQUENCING|CENTER|TARGET_SERVICE_ID"
  }
}
