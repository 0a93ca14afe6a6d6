package graft.codes

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-system / value-set dictionaries used by the document builders,
  * re-expressed as Scala constants + broadcast-literal lookups (J13/F7,
  * SURVEY §2.3). Each map ships to executors once inside the serialized
  * plan — no join, no shuffle, codegen-friendly.
  *
  * Source-value keys come from the public kf-lib-data-ingest
  * `common.constants` module (the reference imports them; FIXTURES.md §A
  * documents the rendered strings).
  */
object Codes {

  /** A FHIR Coding triple. */
  final case class Coding(system: String, code: String, display: String)

  private val OmbSystem = "urn:oid:2.16.840.1.113883.6.238"
  private val NullFlavorSystem = "http://terminology.hl7.org/CodeSystem/v3-NullFlavor"
  private val Snomed = "http://snomed.info/sct"

  /** OMB race category (entity_builders/patient.py:12-77). */
  val ombRaceCategory: Map[String, Coding] = Map(
    "American Indian or Alaska Native" ->
      Coding(OmbSystem, "1002-5", "American Indian or Alaska Native"),
    "Asian" -> Coding(OmbSystem, "2028-9", "Asian"),
    "Black or African American" ->
      Coding(OmbSystem, "2054-5", "Black or African American"),
    "Native Hawaiian or Other Pacific Islander" ->
      Coding(OmbSystem, "2076-8", "Native Hawaiian or Other Pacific Islander"),
    "White" -> Coding(OmbSystem, "2106-3", "White"),
    "Other" -> Coding(NullFlavorSystem, "OTH", "other"),
    "Not Available" -> Coding(NullFlavorSystem, "NAVU", "not available"),
    "Unknown" -> Coding(NullFlavorSystem, "UNK", "unknown"))

  /** OMB ethnicity category (patient.py:80-103). */
  val ombEthnicityCategory: Map[String, Coding] = Map(
    "Hispanic or Latino" -> Coding(OmbSystem, "2135-2", "Hispanic or Latino"),
    "Not Hispanic or Latino" -> Coding(OmbSystem, "2186-5", "Not Hispanic or Latino"),
    "Unknown" -> Coding(NullFlavorSystem, "UNK", "unknown"))

  /** FHIR administrative gender (patient.py:106-113). */
  val administrativeGender: Map[String, String] = Map(
    "Male" -> "male", "Female" -> "female",
    "Unknown" -> "unknown", "Other" -> "other")

  /** Group type by species (family.py:14-19). */
  val groupTypeBySpecies: Map[String, String] = Map(
    "Canis lupus familiaris" -> "animal",
    "Drosophila melanogaster" -> "animal",
    "Homo sapiens" -> "person",
    "Mus musculus" -> "animal")

  /** ResearchStudy category coding by study domain
    * (research_study.py:14-30).
    */
  val studyCategoryCoding: Map[String, Coding] = Map(
    "BIRTHDEFECT" -> Coding(Snomed, "276720006", "Dysmorphism (disorder)"),
    "CANCER" -> Coding(Snomed, "86049000",
      "Malignant neoplasm, primary (morphologic abnormality)"),
    "COVID19" -> Coding(Snomed, "840539006",
      "Disease caused by Severe acute respiratory syndrome coronavirus 2"))

  /** A Coding map as a literal map-of-structs column: lookup yields a
    * struct(system, code, display) or null on miss.
    */
  def codingLookup(codeMap: Map[String, Coding], key: Column): Column = {
    val entries = codeMap.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), struct(
        lit(v.system).as("system"), lit(v.code).as("code"),
        lit(v.display).as("display")))
    }
    element_at(map(entries: _*), key)
  }

  /** A plain string→string map lookup (null on miss). */
  def stringLookup(codeMap: Map[String, String], key: Column): Column =
    element_at(typedLit(codeMap), key)
}
