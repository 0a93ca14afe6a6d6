package graft.documents

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SparkTestSession, Transform, Pipeline}

/** End-to-end pipeline spec on the FIXTURES.md minimal parity fixture:
  * all 16 builders, referential integrity, reference quirks.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def endpoints: Map[String, DataFrame] = Map(
    "studies" -> Seq(
      ("SD_X", "phs001138.v3.p2", "Study X", "SX", "SDX", "v3", "attr", "dbGaP",
        "CANCERANDBIRTHDEFECT", "Kids First", "Pending", "True", "IV_1")
    ).toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
      "attribution", "data_access_authority", "domain", "program",
      "release_status", "visible", "investigator_id"),
    "investigators" -> Seq(
      ("IV_1", "inv1", "Dr. Who", "Gallifrey University", "True")
    ).toDF("kf_id", "external_id", "name", "institution", "visible"),
    "participants" -> Seq(
      ("PT_1", "p1", "SD_X", "FM_1", "True", "True", "Cancer", "Female",
        "Not Hispanic or Latino", "White", "Homo sapiens", "True"),
      ("PT_2", "p2", "SD_X", "FM_1", "False", "False", "Cancer", "Male",
        "Unknown", "Asian", "Homo sapiens", "True")
    ).toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
      "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
      "species", "visible"),
    "families" -> Seq(("FM_1", "f1", "True")).toDF("kf_id", "external_id", "visible"),
    "family-relationships" -> Seq(
      ("FR_1", "fr1", "PT_2", "PT_1", "Mother", "True"),
      ("FR_2", "fr2", "PT_1", "PT_2", "Weird cousin thing", "True")
    ).toDF("kf_id", "external_id", "participant1_id", "participant2_id",
      "participant1_to_participant2_relation", "visible"),
    "diagnoses" -> Seq(
      ("DG_1", "d1", "PT_1", "Ewing Sarcoma", "Cancer", "Chest wall", "365",
        "MONDO:0012817", "C49.3", "NCIT:C121938", "UBERON:0016416", null, "True"),
      ("DG_2", "d2", "PT_2", "Neuroblastoma", "Cancer", "Not Reported", "bogus",
        "Not Reported", "Unknown", null, null, null, "True")
    ).toDF("kf_id", "external_id", "participant_id", "source_text_diagnosis",
      "diagnosis_category", "source_text_tumor_location", "age_at_event_days",
      "mondo_id_diagnosis", "icd_id_diagnosis", "ncit_id_diagnosis",
      "uberon_id_tumor_location", "spatial_descriptor", "visible"),
    "phenotypes" -> Seq(
      ("PH_1", "ph1", "PT_1", "Scoliosis", "HP:0002650", "1234", "Positive", "400", "True")
    ).toDF("kf_id", "external_id", "participant_id", "source_text_phenotype",
      "hpo_id_phenotype", "snomed_id_phenotype", "observed", "age_at_event_days", "visible"),
    "outcomes" -> Seq(
      ("OC_1", "oc1", "PT_1", "Alive", "False", "900", "True")
    ).toDF("kf_id", "external_id", "participant_id", "vital_status",
      "disease_related", "age_at_event_days", "visible"),
    "biospecimen-diagnoses" -> Seq(
      ("BD_1", "bd1", "BS_1", "DG_1", "True"),
      ("BD_2", "bd2", "BS_2", "DG_2", "True")
    ).toDF("kf_id", "external_id", "biospecimen_id", "diagnosis_id", "visible"),
    "biospecimens" -> Seq(
      ("BS_1", "PT_1", "SC_1", "365", "DNA", "Blood", "GRU", "phs001138.c1",
        "al1", "sm1", "Blood Draw", "NCIT:C12439", "NCIT:C33563", "Chest", "Tumor",
        "Primary", null, "UBERON:0016416", "250.5", "True"),
      ("BS_2", "PT_2", "SC_1", "unparsable", "RNA", "Unmapped Comp", null, null,
        "al2", "sm2", null, "no-prefix", null, null, null, "N/A", null,
        "EFO:123", "junk", "True")
    ).toDF("kf_id", "participant_id", "sequencing_center_id", "age_at_event_days",
      "analyte_type", "composition", "consent_type", "dbgap_consent_code",
      "external_aliquot_id", "external_sample_id", "method_of_smaple_procurement",
      "ncit_id_anatomical_site", "ncit_id_tissue_type", "source_text_anatomical_site",
      "source_text_tissue_type", "source_text_tumor_descriptor", "spatial_descriptor",
      "uberon_id_anatomical_site", "volume_ul", "visible"),
    "biospecimen-genomic-files" -> Seq(
      ("BGF_1", "bgf1", "BS_1", "GF_1", "True"),
      ("BGF_2", "bgf2", "BS_2", "GF_2", "True")
    ).toDF("kf_id", "external_id", "biospecimen_id", "genomic_file_id", "visible"),
    "genomic-files" -> Seq(
      ("GF_1", "gf1", "did-1", "Simple Nucleotide Variations", "tbi", "True",
        "GRCh38", "True", null, "True"),
      ("GF_2", "gf2", "did-2", "Aligned Reads", "cram", "True",
        "GRCh38", "False", null, "True")
    ).toDF("kf_id", "external_id", "latest_did", "data_type", "file_format",
      "is_harmonized", "reference_genome", "controlled_access", "availability", "visible"),
    "sequencing-experiment-genomic-files" -> Seq(
      ("SGF_1", "sgf1", "SE_1", "GF_1", "True"),
      ("SGF_2", "sgf2", "SE_1", "GF_2", "True")
    ).toDF("kf_id", "external_id", "sequencing_experiment_id", "genomic_file_id", "visible"),
    "sequencing-experiments" -> Seq(
      ("SE_1", "se1", "WGS", "True")
    ).toDF("kf_id", "external_id", "experiment_strategy", "visible"))

  private lazy val result = Transform(endpoints)
  private lazy val built: Map[String, DataFrame] = Pipeline.buildAll(result,
    indexd = Some(Seq(
      ("GF_1", Seq("phs001138.c1", "open"), 123456L, Map("md5" -> "abc", "etag" -> "xyz"), "s3://b/p/f1.tbi"),
      ("GF_2", Seq("nocode"), 99L, Map("md5" -> "def"), "s3://b/p/f2.cram")
    ).toDF("gf_id", "acl", "size", "hashes", "file_name")),
    centerNames = Map("SC_1" -> "Broadest Institute")).toMap

  private def docs(builder: String): Map[String, com.fasterxml.jackson.databind.JsonNode] = {
    built(builder).collect().map { r =>
      r.getAs[String]("key") -> mapper.readTree(r.getAs[String]("resource_json"))
    }.toMap
  }

  test("all 16 targets registered in load order") {
    assert(result.targets == Transform.AllTargets)
  }

  test("practitioner / organization / practitioner_role triangle") {
    val pr = docs("practitioner")("IV_1")
    val org = docs("organization")("IV_1")
    val role = docs("practitioner_role")("IV_1")
    assert(pr.get("name").get(0).get("text").asText == "Dr. Who")
    assert(org.get("name").asText == "Gallifrey University")
    assert(role.get("practitioner").get("reference").asText == s"Practitioner/${pr.get("id").asText}")
    assert(role.get("organization").get("reference").asText == s"Organization/${org.get("id").asText}")
    assert(role.get("code").get(0).get("coding").get(0).get("code").asText == "researcher")
  }

  test("research_study: CANCERANDBIRTHDEFECT composite category + PI ref") {
    val rs = docs("research_study")("SD_X")
    val codings = rs.get("category").get(0).get("coding")
    assert(codings.size == 2)
    assert(codings.get(0).get("code").asText == "86049000")
    assert(codings.get(1).get("code").asText == "276720006")
    val role = docs("practitioner_role")("IV_1")
    assert(rs.get("principalInvestigator").get("reference").asText ==
      s"PractitionerRole/${role.get("id").asText}")
  }

  test("proband_status: Python bool('False') quirk and v2-0136 coding") {
    val ps = docs("proband_status")
    assert(ps("PT_2").get("identifier").get(0).get("value").asBoolean,
      "bool('False') is True in the reference — identifier value must be true")
    assert(ps("PT_2").get("valueCodeableConcept").get("coding").get(0).get("code").asText == "N")
    assert(ps("PT_1").get("valueCodeableConcept").get("coding").get(0).get("code").asText == "Y")
  }

  test("family_relationship: mapped + unmapped relations; refs to both patients") {
    val fr = docs("family_relationship")
    val mother = fr("FR_1")
    assert(mother.get("valueCodeableConcept").get("coding").get(0).get("code").asText == "MTH")
    val weird = fr("FR_2")
    assert(weird.get("valueCodeableConcept").get("coding") == null, "unmapped relation has text only")
    assert(weird.get("valueCodeableConcept").get("text").asText == "Weird cousin thing")
    val patientId = docs("patient")("PT_2").get("id").asText
    assert(mother.get("subject").get("reference").asText == s"Patient/$patientId")
    // study tag derived from the members' participant rows
    // (family_relationship.py:329,343: meta.tag = [{"code": study_id}])
    assert(mother.get("meta").get("tag").get(0).get("code").asText == "SD_X")
    assert(weird.get("meta").get("tag").get(0).get("code").asText == "SD_X")
  }

  test("disease: ontology codings with sentinels skipped, relative date, unparsable age omitted") {
    val dx = docs("disease")
    val d1 = dx("DG_1")
    val codes = d1.get("code").get("coding")
    assert(codes.size == 3, "MONDO+ICD+NCIT all coded")
    assert(d1.get("bodySite").get(0).get("coding").get(0).get("code").asText == "UBERON:0016416")
    assert(d1.get("_recordedDate").get("extension").get(0).get("extension").get(2)
      .get("valueDuration").get("value").asInt == 365)
    val d2 = dx("DG_2")
    assert(d2.get("code").get("coding") == null, "all sentinel ids skipped")
    assert(d2.get("_recordedDate") == null, "unparsable age omits the block")
    assert(d2.get("bodySite") == null, "sentinel tumor location cleaned to null")
  }

  test("vital_status + phenotype verification") {
    val vs = docs("vital_status")("OC_1")
    assert(vs.get("valueCodeableConcept").get("coding").get(0).get("code").asText == "438949009")
    assert(vs.get("_effectiveDateTime").get("extension").get(0).get("extension").get(2)
      .get("valueDuration").get("value").asInt == 900)
    val ph = docs("phenotype")("PH_1")
    assert(ph.get("verificationStatus").get("coding").get(0).get("code").asText == "confirmed")
    assert(ph.get("code").get("coding").size == 2)
  }

  test("specimen: security labels, three identifiers, type codings, collection") {
    val sp = docs("specimen")
    val s1 = sp("BS_1")
    assert(s1.get("meta").get("security").size == 2)
    assert(s1.get("identifier").size == 3)
    val typeCodes = (0 until s1.get("type").get("coding").size)
      .map(i => s1.get("type").get("coding").get(i).get("code").asText).toSet
    assert(typeCodes == Set("NCIT:C33563", "C17610", "OBI:0001051"),
      "tissue NCIT + composition + analyte")
    val coll = s1.get("collection")
    assert(coll.get("quantity").get("value").asDouble == 250.5)
    assert(coll.get("method").get("coding").get(0).get("code").asText == "396540005")
    assert(coll.get("bodySite").get("coding").size == 2)
    val s2 = sp("BS_2")
    assert(s2.get("meta").get("security") == null)
    assert(s2.get("collection").get("quantity") == null, "junk volume omitted")
    val bs2Coding = s2.get("collection").get("bodySite").get("coding").get(0)
    assert(bs2Coding.get("system").asText.contains("efo"), "EFO prefix system")
    assert(s2.get("type").get("coding").get(0).get("code").asText == "OBI:0000880",
      "no-prefix tissue skipped, unmapped composition skipped, RNA analyte coded")
  }

  test("histopathology: subject/focus/specimen refs + sentinel tumor descriptor") {
    val h = docs("histopathology")("BD_1")
    assert(h.get("specimen").get("reference").asText ==
      s"Specimen/${docs("specimen")("BS_1").get("id").asText}")
    assert(h.get("focus").get(0).get("reference").asText ==
      s"Condition/${docs("disease")("DG_1").get("id").asText}")
    assert(h.get("valueCodeableConcept").get("text").asText == "Primary")
  }

  test("drs: tbi imputation to Index type, no context.related for index files, indexd enrichment") {
    val dr = docs("drs_document_reference")
    val f1 = dr("GF_1")
    assert(f1.get("type").get("text").asText == "Simple Nucleotide Variations Index",
      "tbi over SNV imputes Index type")
    assert(f1.get("context") == null, "index files carry no specimen context")
    val exts = f1.get("content").get(0).get("attachment").get("extension")
    assert(exts.get(0).get("valueDecimal").asLong == 123456L)
    assert(exts.size == 3, "size + 2 hashes")
    assert(f1.get("content").get(0).get("attachment").get("url").asText ==
      "drs://data.kidsfirstdrc.org/did-1")
    assert(f1.get("content").get(0).get("attachment").get("title").asText == "f1.tbi")
    val f2 = dr("GF_2")
    assert(f2.get("context").get("related").get(0).get("reference").asText ==
      s"Specimen/${docs("specimen")("BS_2").get("id").asText}")
    assert(f2.get("securityLabel").get(0).get("coding").get(0).get("code").asText == "registered")
    assert(f2.get("category").get(0).get("coding").get(0).get("code").asText == "WGS")
  }

  test("pandas-groupby dropna parity: null-study rows silently dropped from DRS regroup") {
    // Without a biospecimen-diagnosis link, a biospecimen's wide row has
    // a null study id (composite-key outer join miss), and the
    // reference's pandas groupby (dropna=True) silently drops its file.
    val eps = endpoints.updated("biospecimen-diagnoses",
      endpoints("biospecimen-diagnoses").where($"kf_id" === "BD_1"))
    val r2 = Transform(eps)
    val dr = Pipeline.buildAll(r2).toMap.apply("drs_document_reference")
    val keys = dr.select("key").collect().map(_.getString(0)).toSet
    assert(keys == Set("GF_1"), s"GF_2 must be dropped (got $keys)")
  }

  test("sequencing_center: name from injected map") {
    val sc = docs("sequencing_center")("SC_1")
    assert(sc.get("name").asText == "Broadest Institute")
  }
}
