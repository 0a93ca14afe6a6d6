package graft.documents

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SparkTestSession, Transform}

/** Golden-JSON tests for the document builders (structural compare via
  * Jackson so struct-field order can't cause false failures).
  */
class FhirBuildersSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def studies: DataFrame = Seq(
    ("SD_X", "phs001138.v3.p2", "Study X", "SX", "SDX", "v3", "attr", "dbGaP",
      "CANCER", "Kids First", "Pending", "True", null.asInstanceOf[String])
  ).toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
    "attribution", "data_access_authority", "domain", "program",
    "release_status", "visible", "investigator_id")

  private def participants: DataFrame = Seq(
    ("PT_1", "p1", "SD_X", "FM_1", "True", "True", "Cancer", "Female",
      "Not Hispanic or Latino", "White", "Homo sapiens", "True"),
    ("PT_2", "", "SD_X", "FM_1", "False", "False", "Cancer", "Weird",
      null, "Martian", "Homo sapiens", "True")
  ).toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
    "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
    "species", "visible")

  private def families: DataFrame = Seq(
    ("FM_1", "f1", "True")
  ).toDF("kf_id", "external_id", "visible")

  private lazy val wide = Transform(Map(
    "studies" -> studies, "participants" -> participants,
    "families" -> families)).wide

  private def docFor(df: DataFrame, key: String): com.fasterxml.jackson.databind.JsonNode = {
    val rows = df.filter(df("key") === key).select("resource_json").collect()
    assert(rows.length == 1, s"expected one doc for $key")
    mapper.readTree(rows(0).getString(0))
  }

  test("Patient: full row builds identifiers, race/ethnicity extensions, gender") {
    val doc = docFor(FhirBuilders.patient(wide), "PT_1")
    assert(doc.get("resourceType").asText == "Patient")
    assert(doc.get("meta").get("tag").get(0).get("code").asText == "SD_X")
    val ids = doc.get("identifier")
    assert(ids.size == 2)
    assert(ids.get(0).get("use").asText == "official")
    assert(ids.get(0).get("value").asText == "PT_1")
    assert(ids.get(1).get("use").asText == "secondary")
    assert(ids.get(1).get("value").asText == "p1")
    val exts = doc.get("extension")
    assert(exts.size == 2)
    val race = exts.get(0)
    assert(race.get("url").asText.endsWith("us-core-race"))
    assert(race.get("extension").get(0).get("valueString").asText == "White")
    assert(race.get("extension").get(1).get("valueCoding").get("code").asText == "2106-3")
    val eth = exts.get(1)
    assert(eth.get("extension").get(1).get("valueCoding").get("code").asText == "2186-5")
    assert(doc.get("gender").asText == "female")
  }

  test("Patient: empty external_id omitted (Python truthiness), unmapped race keeps text, no omb coding, unmapped gender dropped") {
    val doc = docFor(FhirBuilders.patient(wide), "PT_2")
    assert(doc.get("identifier").size == 1, "empty external_id must not add secondary identifier")
    val race = doc.get("extension").get(0)
    assert(race.get("extension").size == 1, "unmapped race has text only")
    assert(race.get("extension").get(0).get("valueString").asText == "Martian")
    assert(doc.get("gender") == null, "unmapped gender key must be absent")
    assert(doc.get("extension").size == 1, "null ethnicity adds no extension")
  }

  test("Group/Family: members collected, sorted, quantity set, type person") {
    val doc = docFor(FhirBuilders.family(wide), "FM_1")
    assert(doc.get("resourceType").asText == "Group")
    assert(doc.get("type").asText == "person")
    assert(doc.get("actual").asBoolean)
    assert(doc.get("quantity").asInt == 2)
    assert(doc.get("member").size == 2)
    val ref = doc.get("member").get(0).get("entity").get("reference").asText
    assert(ref.startsWith("Patient/"))
    assert(doc.get("code").get("coding").get(0).get("code").asText == "FAMMEMB")
  }

  test("ResearchStudy: dbGaP accession root + version, category coding, keywords") {
    val doc = docFor(FhirBuilders.researchStudy(wide), "SD_X")
    val ids = doc.get("identifier")
    assert(ids.size == 2)
    assert(ids.get(1).get("value").asText == "phs001138.v3", "accession = root + version")
    assert(doc.get("status").asText == "completed")
    assert(doc.get("title").asText == "Study X")
    assert(doc.get("category").get(0).get("text").asText == "CANCER")
    assert(doc.get("category").get(0).get("coding").get(0).get("code").asText == "86049000")
    assert(doc.get("keyword").size == 2)
    assert(doc.get("principalInvestigator") == null)
  }
}
