package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.CleanOps

/** Fixture-driven tests for the transform stage: rename + presence-driven
  * outer-join chain + clean (FIXTURES.md §A minimal parity fixture).
  */
class TransformSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def studies: DataFrame = Seq(
    ("SD_X", "phs001138.v3.p2", "Study X", "SX", "SDX", "v3", "attr", "dbGaP",
      "CANCER", "Kids First", "Pending", "True", "IV_1")
  ).toDF("kf_id", "external_id", "name", "short_name", "short_code", "version",
    "attribution", "data_access_authority", "domain", "program",
    "release_status", "visible", "investigator_id")

  private def participants: DataFrame = Seq(
    ("PT_1", "p1", "SD_X", "FM_1", "True", "True", "Cancer", "Female",
      "Not Hispanic or Latino", "White", "Homo sapiens", "True"),
    ("PT_2", "p2", "SD_X", "FM_1", "False", "False", "Cancer", "Male",
      "Unknown", "Asian", "Homo sapiens", "True"),
    ("PT_3", "p3", "SD_X", null, "False", "Not Reported", "Cancer", "Male",
      "", "Unknown", "Homo sapiens", "True")
  ).toDF("kf_id", "external_id", "study_id", "family_id", "is_proband",
    "affected_status", "diagnosis_category", "gender", "ethnicity", "race",
    "species", "visible")

  private def diagnoses: DataFrame = Seq(
    ("DG_1", "d1", "PT_1", "Ewing Sarcoma", "Cancer", "Chest wall", "365",
      "MONDO:0012817", "C49.3", "NCIT:C121938", "UBERON:0016416", null, "True"),
    ("DG_2", "d2", "PT_2", "Neuroblastoma", "Cancer", "Not Reported", "bogus",
      "Not Reported", "Unknown", null, null, null, "True")
  ).toDF("kf_id", "external_id", "participant_id", "source_text_diagnosis",
    "diagnosis_category", "source_text_tumor_location", "age_at_event_days",
    "mondo_id_diagnosis", "icd_id_diagnosis", "ncit_id_diagnosis",
    "uberon_id_tumor_location", "spatial_descriptor", "visible")

  private def familyRelationships: DataFrame = Seq(
    ("FR_1", "fr1", "PT_2", "PT_1", "Mother", "True")
  ).toDF("kf_id", "external_id", "participant1_id", "participant2_id",
    "participant1_to_participant2_relation", "visible")

  test("studies-only input yields research_study target and wide=studies") {
    val r = Transform(Map("studies" -> studies))
    assert(r.targets == Seq("research_study"))
    assert(r.wide.count() == 1)
    assert(r.wide.columns.contains(Concepts.Study.TargetServiceId))
    assert(r.familyRelationship.isEmpty)
  }

  test("participants fan-out joins on STUDY|TARGET_SERVICE_ID") {
    val r = Transform(Map("studies" -> studies, "participants" -> participants))
    assert(r.wide.count() == 3)
    assert(r.targets == Seq("patient", "proband_status", "research_study", "research_subject"))
    val names = r.wide.select(Concepts.Participant.TargetServiceId)
      .collect().map(_.getString(0)).toSet
    assert(names == Set("PT_1", "PT_2", "PT_3"))
  }

  test("diagnoses 1→N fan-out keeps participants without diagnoses (outer)") {
    val r = Transform(Map(
      "studies" -> studies, "participants" -> participants,
      "diagnoses" -> diagnoses))
    // PT_1→DG_1, PT_2→DG_2, PT_3→no diagnosis: 3 rows total, outer keeps PT_3
    assert(r.wide.count() == 3)
    val pt3 = r.wide.filter(r.wide(s"`${Concepts.Participant.TargetServiceId}`") === "PT_3")
    assert(pt3.count() == 1)
    assert(pt3.select(Concepts.Diagnosis.TargetServiceId).collect()(0).isNullAt(0))
  }

  test("clean_up_df semantics: sentinels → null, trim applied") {
    val r = Transform(Map(
      "studies" -> studies, "participants" -> participants,
      "diagnoses" -> diagnoses))
    val dg2 = r.wide.filter(r.wide(s"`${Concepts.Diagnosis.TargetServiceId}`") === "DG_2")
      .select(Concepts.Diagnosis.MondoId, Concepts.Diagnosis.TumorLocation)
      .collect()(0)
    assert(dg2.isNullAt(0), "MONDO sentinel should clean to null")
    assert(dg2.isNullAt(1), "tumor-location sentinel should clean to null")
  }

  test("family-relationships are a standalone cleaned table, not joined") {
    val r = Transform(Map(
      "studies" -> studies, "participants" -> participants,
      "family-relationships" -> familyRelationships))
    assert(r.familyRelationship.isDefined)
    assert(r.familyRelationship.get.count() == 1)
    assert(!r.wide.columns.contains(Concepts.FamilyRelationship.TargetServiceId))
    assert(r.targets.contains("family_relationship"))
    // reference load order preserved
    assert(r.targets == Seq("patient", "proband_status", "family_relationship",
      "research_study", "research_subject"))
  }

  test("cleanUp is idempotent and dedups exact rows") {
    val df = Seq(("  a ", "Not Reported"), ("  a ", "Not Reported"), ("b", "x"))
      .toDF("c1", "c2")
    val once = CleanOps.cleanUp(df)
    assert(once.count() == 2)
    val twice = CleanOps.cleanUp(once)
    assert(twice.collect().toSet == once.collect().toSet)
    val aRow = once.filter(once("c1") === "a").collect()(0)
    assert(aRow.isNullAt(1))
  }

  test("kAnonymityAudit: class sizes, violations under k, nulls form " +
      "their own class") {
    val df = Seq(
      ("US", "a"), ("US", "a"), ("US", "a"),
      ("DE", "b"),
      (null, "c"), (null, "c")
    ).toDF("country", "seg")
    val got = CleanOps.kAnonymityAudit(df, Seq("country", "seg"), k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      (Some("US"), "a") -> ((3L, false)),
      (Some("DE"), "b") -> ((1L, true)),
      (None, "c") -> ((2L, true))))
    intercept[IllegalArgumentException] {
      CleanOps.kAnonymityAudit(df, Seq("country"), k = 1)
    }
  }

  test("columnProfile: one row per column with null/distinct/min/max; " +
      "approx mode stays near exact") {
    val df = Seq(
      (1L, Some("b"), 2.5), (2L, None, 1.5), (3L, Some("a"), 2.5),
      (3L, Some("a"), 9.0)
    ).toDF("id", "s", "v")
    val got = CleanOps.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got("id") == ((0L, 3L, "1", "3")))
    assert(got("s") == ((1L, 2L, "a", "b")))
    assert(got("v") == ((0L, 3L, "1.5", "9.0")))
    val approx = CleanOps.columnProfile(df, Seq("id"), exactDistinct = false)
      .collect().head
    assert(math.abs(approx.getLong(2) - 3L) <= 1)
  }
}
