package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._

/** FHIR R4 entity builders re-expressed as Catalyst expression trees over
  * the wide merged DataFrame (SURVEY §2.9). Each builder:
  *   1. restricts to its concept columns (column pruning does the rest),
  *   2. dedups by the entity's natural key (reproducing LoadStage's
  *      unique-key iteration — SURVEY §7.4 risk 1),
  *   3. builds the nested document as one struct expression,
  *   4. emits (key, resource_type, resource_json).
  *
  * Resource ids: the reference resolves pre-existing server ids per row
  * (S8). Here id resolution is a join against an id-map DataFrame;
  * `resolveId` defaults to a deterministic surrogate (md5 of the natural
  * key) so pipelines are runnable and idempotent without a live server.
  */
object FhirBuilders {

  val KfDataserviceBase = "https://kf-api-dataservice.kidsfirstdrc.org"

  /** Deterministic surrogate FHIR id from resource type + natural key
    * (stands in for the reference's query_target_ids round-trip, S8);
    * type-prefixed so distinct resources over the same natural key get
    * distinct ids.
    */
  def surrogateId(apiPath: String, naturalKey: Column): Column =
    md5(concat(lit(s"$apiPath/"), naturalKey))

  private def emit(df: DataFrame, key: Column, resourceType: String, entity: Column): DataFrame =
    df.select(key.as("key"), lit(resourceType).as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))

  // ------------------------------------------------------------- Patient

  /** patient.py:118-202. Mixed-shape extension elements share one struct
    * shape with nullable branches (to_json drops the nulls).
    */
  def patient(wide: DataFrame): DataFrame = {
    val c = (n: String) => col(s"`$n`")
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Participant.Id).as("external_id"),
      c(Participant.Race).as("race"),
      c(Participant.Ethnicity).as("ethnicity"),
      c(Participant.Gender).as("gender"))
      .where(col("pid").isNotNull)
      .dropDuplicates("pid")

    val codingType = "struct<system:string,code:string,display:string>"
    def extElem(url: Column, valueString: Column, valueCoding: Column): Column =
      struct(url.as("url"), valueString.as("valueString"), valueCoding.as("valueCoding"))
    def usCore(url: String, value: Column, omb: Map[String, Codes.Coding]): Column = {
      val coding = Codes.codingLookup(omb, value)
      optional(value, struct(
        lit(url).as("url"),
        compactArray(
          extElem(lit("text"), value, lit(null).cast(codingType)),
          when(coding.isNotNull,
            extElem(lit("ombCategory"), lit(null).cast("string"), coding))
        ).as("extension")))
    }

    val entity = struct(
      lit("Patient").as("resourceType"),
      surrogateId("Patient", col("pid")).as("id"),
      meta("Patient", col("study_id")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/participants/", col("pid")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      compactArray(
        usCore("http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
          col("race"), Codes.ombRaceCategory),
        usCore("http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
          col("ethnicity"), Codes.ombEthnicityCategory)).as("extension"),
      Codes.stringLookup(Codes.administrativeGender, col("gender")).as("gender"))

    emit(rows, col("pid"), "Patient", entity)
  }

  // -------------------------------------------------------- Group/Family

  /** family.py:22-122 — regroup (A1) then build; member refs use the
    * surrogate Patient ids (same derivation ⇒ referential integrity).
    * Non-determinism pinned: species = min distinct, members sorted.
    */
  def family(wide: DataFrame): DataFrame = {
    val c = (n: String) => col(s"`$n`")
    // pandas groupby drops null group keys (dropna=True default) — the
    // reference's A1 regroup therefore silently drops rows with a null
    // study or family id; reproduce by filtering every key.
    val grouped = wide
      .where(c(Study.TargetServiceId).isNotNull &&
        c(Family.TargetServiceId).isNotNull && c(Participant.TargetServiceId).isNotNull)
      .groupBy(
        c(Study.TargetServiceId).as("study_id"),
        c(Family.TargetServiceId).as("family_id"))
      .agg(
        // get() not getItem(): all-null species yields an empty set and
        // ANSI mode would throw on the out-of-bounds index
        get(sort_array(collect_set(c(Participant.Species))), lit(0)).as("species"),
        sort_array(collect_set(c(Participant.TargetServiceId))).as("members"),
        min(c(Family.Id)).as("external_id"))

    val memberStructs = transform(col("members"), pid => struct(
      reference("Patient", surrogateId("Patient", pid)).as("entity"),
      lit(false).as("inactive")))

    val entity = struct(
      lit("Group").as("resourceType"),
      surrogateId("Group", col("family_id")).as("id"),
      meta("Group", col("study_id")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/families/", col("family_id")),
        secondaryIdentifier(col("external_id"))).as("identifier"),
      coalesce(Codes.stringLookup(Codes.groupTypeBySpecies, col("species")), lit("person")).as("type"),
      lit(true).as("actual"),
      struct(array(codingLit(Codes.Coding(
        "http://terminology.hl7.org/CodeSystem/v3-RoleCode", "FAMMEMB", "family member")))
        .as("coding")).as("code"),
      when(size(col("members")) > 0, size(col("members"))).as("quantity"),
      when(size(col("members")) > 0, memberStructs).as("member"))

    emit(grouped, col("family_id"), "Group", entity)
  }

  // ------------------------------------------------------- ResearchStudy

  /** research_study.py:33-125 — dbGaP accession string logic (F1–F4),
    * domain category with the CANCERANDBIRTHDEFECT composite, keywords,
    * PI reference.
    */
  def researchStudy(wide: DataFrame): DataFrame = {
    val c = (n: String) => col(s"`$n`")
    val hasInvestigator = wide.columns.contains(Investigator.TargetServiceId)
    val rows = wide.select(Seq(
      c(Study.TargetServiceId).as("study_id"),
      c(Study.Id).as("external_id"),
      c(Study.Version).as("version"),
      c(Study.Name).as("study_name"),
      c(Study.Domain).as("domain"),
      c(Study.Program).as("program"),
      c(Study.ShortCode).as("short_code")) ++
      (if (hasInvestigator) Seq(c(Investigator.TargetServiceId).as("investigator_id"))
       else Seq(lit(null).cast("string").as("investigator_id"))): _*)
      .where(col("study_id").isNotNull)
      .dropDuplicates("study_id")

    val accessionRoot = trim(split(col("external_id"), "\\.").getItem(0))
    val accession = when(
      present(col("version")) && col("version").startsWith("v"),
      concat_ws(".", accessionRoot, trim(col("version")))).otherwise(accessionRoot)
    val dbgapIdentifier = when(
      present(col("external_id")) && col("external_id").startsWith("phs"),
      struct(lit("secondary").as("use"),
        lit("https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi?study_id=").as("system"),
        accession.as("value")))

    val domainCoding = Codes.codingLookup(Codes.studyCategoryCoding, col("domain"))
    val categoryCodings = when(domainCoding.isNotNull, array(domainCoding))
      .when(col("domain") === "CANCERANDBIRTHDEFECT", array(
        codingLit(Codes.studyCategoryCoding("CANCER")),
        codingLit(Codes.studyCategoryCoding("BIRTHDEFECT"))))
    val category = optional(col("domain"),
      struct(col("domain").as("text"), categoryCodings.as("coding")))

    val keywords = compactArray(
      optional(col("program"), struct(array(struct(col("program").as("code"))).as("coding"))),
      optional(col("short_code"), struct(array(struct(col("short_code").as("code"))).as("coding"))))

    val entity = struct(
      lit("ResearchStudy").as("resourceType"),
      surrogateId("ResearchStudy", col("study_id")).as("id"),
      meta("ResearchStudy", col("study_id")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/studies/", col("study_id")),
        dbgapIdentifier).as("identifier"),
      lit("completed").as("status"),
      optional(col("study_name"), col("study_name")).as("title"),
      when(category.isNotNull, array(category)).as("category"),
      keywords.as("keyword"),
      optional(col("investigator_id"),
        reference("PractitionerRole", surrogateId("PractitionerRole", col("investigator_id"))))
        .as("principalInvestigator"))

    emit(rows, col("study_id"), "ResearchStudy", entity)
  }
}
