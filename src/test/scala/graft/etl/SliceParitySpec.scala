package graft.etl

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.documents._

/** Proof-by-test of the sub-chain equivalence argument (Transform §slice
  * scaladoc): every entity builder produces the SAME rows whether fed
  * the reference's full wide frame or its minimal ancestor-path slice.
  * Runs on a fixture with deliberate outer-join misses (orphan rows,
  * unmatched links) so padded-null behavior is exercised.
  */
class SliceParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Fixture with every orphan case: an investigator id with no
  // investigator row, a participant with an unknown study, a diagnosis
  // for a missing participant, a biospecimen whose biospecimen-diagnosis
  // link is absent, a genomic file with no link rows.
  private def endpoints: Map[String, DataFrame] = Map(
    "studies" -> Seq(
      ("SD_1", "phs1.v1.p1", "S One", "S1", "SO", "v1", null, "dbGaP",
        "CANCER", "KF", "Pending", "True", "IV_1"),
      ("SD_2", "phs2.v1.p1", "S Two", "S2", "ST", "v1", null, "dbGaP",
        "BIRTHDEFECT", "KF", "Pending", "True", "IV_MISSING")
    ).toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
      "attribution", "data_access_authority", "domain", "program",
      "release_status", "visible", "investigator_id"),
    "investigators" -> Seq(
      ("IV_1", "inv1", "PI One", "Uni One", "True"),
      ("IV_ORPHAN", "inv9", "PI Nine", "Uni Nine", "True")
    ).toDF("kf_id", "external_id", "name", "institution", "visible"),
    "participants" -> Seq(
      ("PT_1", "p1", "SD_1", "FM_1", "True", "True", "Cancer", "Female",
        "Not Hispanic or Latino", "White", "Homo sapiens", "True"),
      ("PT_2", "p2", "SD_1", "FM_1", "False", "False", "Cancer", "Male",
        "Unknown", "Asian", "Homo sapiens", "True"),
      ("PT_ORPHAN", "p3", "SD_MISSING", "FM_2", "True", "True", "Cancer", "Other",
        "Unknown", "Unknown", "Homo sapiens", "True")
    ).toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
      "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
      "species", "visible"),
    "families" -> Seq(
      ("FM_1", "f1", "True"), ("FM_ORPHAN", "f9", "True")
    ).toDF("kf_id", "external_id", "visible"),
    "family-relationships" -> Seq(
      ("FR_1", "fr1", "PT_2", "PT_1", "Mother", "True")
    ).toDF("kf_id", "external_id", "participant1_id", "participant2_id",
      "participant1_to_participant2_relation", "visible"),
    "diagnoses" -> Seq(
      ("DG_1", "d1", "PT_1", "Dx One", "Cancer", "Chest wall", "365",
        "MONDO:1", "C1", "NCIT:C1", "UBERON:1", null, "True"),
      ("DG_2", "d2", "PT_2", "Dx Two", "Cancer", null, "100",
        null, null, null, null, null, "True"),
      ("DG_ORPHAN", "d9", "PT_MISSING", "Dx Nine", "Cancer", null, "1",
        null, null, null, null, null, "True")
    ).toDF("kf_id", "external_id", "participant_id", "source_text_diagnosis",
      "diagnosis_category", "source_text_tumor_location", "age_at_event_days",
      "mondo_id_diagnosis", "icd_id_diagnosis", "ncit_id_diagnosis",
      "uberon_id_tumor_location", "spatial_descriptor", "visible"),
    "phenotypes" -> Seq(
      ("PH_1", "ph1", "PT_1", "Phe One", "HP:1", null, "Positive", "400", "True"),
      ("PH_ORPHAN", "ph9", "PT_MISSING2", "Phe Nine", null, null, "Negative", "1", "True")
    ).toDF("kf_id", "external_id", "participant_id", "source_text_phenotype",
      "hpo_id_phenotype", "snomed_id_phenotype", "observed", "age_at_event_days", "visible"),
    "outcomes" -> Seq(
      ("OC_1", "oc1", "PT_2", "Alive", "False", "900", "True")
    ).toDF("kf_id", "external_id", "participant_id", "vital_status",
      "disease_related", "age_at_event_days", "visible"),
    "biospecimen-diagnoses" -> Seq(
      ("BD_1", "bd1", "BS_1", "DG_1", "True"),
      ("BD_ORPHAN", "bd9", "BS_MISSING", "DG_MISSING", "True")
    ).toDF("kf_id", "external_id", "biospecimen_id", "diagnosis_id", "visible"),
    "biospecimens" -> Seq(
      ("BS_1", "PT_1", "SC_1", "365", "DNA", "Blood", "GRU", "phs1.c1",
        "al1", "sm1", "Blood Draw", "NCIT:C1", "NCIT:C2", "Chest", "Tumor",
        "Primary", null, "UBERON:1", "250.5", "True"),
      ("BS_UNLINKED", "PT_2", "SC_2", "10", "RNA", "Saliva", null, null,
        "al2", "sm2", null, null, null, null, null, null, null, null, "1", "True")
    ).toDF("kf_id", "participant_id", "sequencing_center_id", "age_at_event_days",
      "analyte_type", "composition", "consent_type", "dbgap_consent_code",
      "external_aliquot_id", "external_sample_id", "method_of_smaple_procurement",
      "ncit_id_anatomical_site", "ncit_id_tissue_type", "source_text_anatomical_site",
      "source_text_tissue_type", "source_text_tumor_descriptor", "spatial_descriptor",
      "uberon_id_anatomical_site", "volume_ul", "visible"),
    "biospecimen-genomic-files" -> Seq(
      ("BGF_1", "bgf1", "BS_1", "GF_1", "True"),
      ("BGF_2", "bgf2", "BS_UNLINKED", "GF_2", "True")
    ).toDF("kf_id", "external_id", "biospecimen_id", "genomic_file_id", "visible"),
    "genomic-files" -> Seq(
      ("GF_1", "gf1", "did-1", "Aligned Reads", "cram", "True",
        "GRCh38", "True", null, "True"),
      ("GF_2", "gf2", "did-2", "gVCF", "gvcf", "True",
        "GRCh38", "False", null, "True"),
      ("GF_ORPHAN", "gf9", "did-9", "Variant Calls", "vcf", "True",
        "GRCh38", "False", null, "True")
    ).toDF("kf_id", "external_id", "latest_did", "data_type", "file_format",
      "is_harmonized", "reference_genome", "controlled_access", "availability", "visible"),
    "sequencing-experiment-genomic-files" -> Seq(
      ("SGF_1", "sgf1", "SE_1", "GF_1", "True")
    ).toDF("kf_id", "external_id", "sequencing_experiment_id", "genomic_file_id", "visible"),
    "sequencing-experiments" -> Seq(
      ("SE_1", "se1", "WGS", "True"),
      ("SE_ORPHAN", "se9", "RNA-Seq", "True")
    ).toDF("kf_id", "external_id", "experiment_strategy", "visible"))

  // wide-fed builders = the reference's literal dataflow (lazy: only
  // construct the builders the endpoint presence enables)
  private def wideFed(result: Transform.Result): Map[String, () => DataFrame] = {
    lazy val wide = result.wide
    Map(
      "practitioner" -> (() => InvestigatorBuilders.practitioner(wide)),
      "organization" -> (() => InvestigatorBuilders.organization(wide)),
      "practitioner_role" -> (() => InvestigatorBuilders.practitionerRole(wide)),
      "patient" -> (() => FhirBuilders.patient(wide)),
      "proband_status" -> (() => ParticipantBuilders.probandStatus(wide)),
      "family" -> (() => FhirBuilders.family(wide)),
      "research_study" -> (() => FhirBuilders.researchStudy(wide)),
      "research_subject" -> (() => ParticipantBuilders.researchSubject(wide)),
      "disease" -> (() => ConditionBuilders.disease(wide)),
      "phenotype" -> (() => ConditionBuilders.phenotype(wide)),
      "vital_status" -> (() => ParticipantBuilders.vitalStatus(wide)),
      "sequencing_center" -> (() => ParticipantBuilders.sequencingCenter(wide)),
      "specimen" -> (() => SpecimenBuilder.specimen(wide)),
      "histopathology" -> (() => ConditionBuilders.histopathology(wide)),
      "drs_document_reference" -> (() => DrsBuilder.drsDocumentReference(wide)))
  }

  private def assertParity(eps: Map[String, DataFrame]): Unit = {
    val result = Transform(eps)
    val slices = Pipeline.buildAll(result).toMap
    val wides = wideFed(result)
    for (name <- result.targets if name != "family_relationship") {
      val expected = wides(name)().collect().map(_.toSeq).toSet
      val actual = slices(name).collect().map(_.toSeq).toSet
      assert(actual == expected, s"builder $name diverges between slice and wide")
    }
  }

  test("each builder over its minimal slice equals the builder over the full wide frame") {
    assertParity(endpoints)
  }

  test("closure terminates when a dep names an absent endpoint") {
    // biospecimens' deps always include participants; with participants
    // absent the closure must converge (not loop) and exclude it
    val result = Transform(endpoints - "participants")
    val closed = result.closure(Set("studies", "participants", "biospecimens"))
    assert(closed.contains("biospecimens") && !closed.contains("participants"))
  }

  test("slice equivalence holds when optional endpoints are absent") {
    // drop the link tables: biospecimens joins on participant only and
    // the seq-exp chain disappears — the presence-driven keys change
    assertParity(endpoints -- Seq(
      "biospecimen-diagnoses", "sequencing-experiment-genomic-files",
      "sequencing-experiments", "investigators", "outcomes"))
  }
}
