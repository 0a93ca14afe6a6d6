package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** Specimen resource (specimen.py:438-638): consent security labels on
  * meta, sample/aliquot identifiers, type codings (NCIT tissue +
  * composition + analyte), collection block with relative-date,
  * volume quantity, procurement method, prefix-sensitive body site.
  */
object SpecimenBuilder {

  private val c = (n: String) => col(s"`$n`")

  def specimen(wide: DataFrame): DataFrame = {
    val rows = wide.select(
      c(Study.TargetServiceId).as("study_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Biospecimen.TargetServiceId).as("bs_id"),
      c(Biospecimen.ConsentShortName).as("consent_type"),
      c(Biospecimen.DbgapStyleConsentCode).as("dbgap_code"),
      c(Biospecimen.GroupId).as("sample_id"),
      c(Biospecimen.Id).as("aliquot_id"),
      c(Biospecimen.TissueType).as("tissue_type"),
      c(Biospecimen.Composition).as("composition"),
      c(Biospecimen.Analyte).as("analyte"),
      c(Biospecimen.NcitTissueTypeId).as("ncit_tissue"),
      c(Biospecimen.EventAgeDays).as("age_days"),
      c(Biospecimen.VolumeUl).as("volume_ul"),
      c(Biospecimen.SampleProcurement).as("procurement"),
      c(Biospecimen.AnatomySite).as("anatomy_site"),
      c(Biospecimen.UberonAnatomySiteId).as("uberon_site"),
      c(Biospecimen.NcitAnatomySiteId).as("ncit_site"))
      .where(col("bs_id").isNotNull)
    // deterministic survivor (not dropDuplicates): output bytes must be
    // stable under task retries/speculation — see CleanOps.dedupMinByKey
    val deduped = graft.clean.CleanOps.dedupMinByKey(rows, "bs_id")

    val security = compactArray(
      optional(col("consent_type"), struct(
        lit(s"$KfDataserviceBase/biospecimens?consent_type=").as("system"),
        col("consent_type").as("code"))),
      optional(col("dbgap_code"), struct(
        lit(s"$KfDataserviceBase/biospecimens?dbgap_consent_code=").as("system"),
        col("dbgap_code").as("code"))))

    def secondaryWithSystem(param: String, value: Column): Column =
      optional(value, struct(lit("secondary").as("use"),
        lit(s"$KfDataserviceBase/biospecimens?$param=").as("system"),
        value.as("value")))

    // type: text + NCIT-prefixed tissue coding + composition + analyte
    val tissueCoding = when(
      present(col("ncit_tissue")) && col("ncit_tissue").startsWith("NCIT:"),
      struct(lit("http://purl.obolibrary.org/obo/ncit.owl").as("system"),
        col("ncit_tissue").as("code"), lit(null).cast("string").as("display")))
    val compCoding = Codes.codingLookup(Codes.specimenComposition, col("composition"))
    val analyteCoding = Codes.codingLookup(Codes.analyteType, col("analyte"))
    val typeCodings = filter(array(tissueCoding, compCoding, analyteCoding), x => x.isNotNull)
    val specimenType = when(present(col("tissue_type")) || size(typeCodings) > 0,
      struct(
        when(size(typeCodings) > 0, typeCodings).as("coding"),
        optional(col("tissue_type"), col("tissue_type")).as("text")))

    // collection block
    val quantity = {
      val v = col("volume_ul").try_cast("double")
      when(v.isNotNull, struct(v.as("value"), lit("microliters").as("unit"),
        lit("http://unitsofmeasure.org").as("system"), lit("uL").as("code")))
    }
    val method = optional(col("procurement"),
      codeableConcept(col("procurement"),
        Codes.codingLookup(Codes.collectionMethod, col("procurement"))))
    val bodySite = {
      // uberon-site coding keeps the code even with no recognized prefix
      // (specimen.py:612-621); system varies by prefix
      val uberonCoding = optional(col("uberon_site"), struct(
        when(col("uberon_site").startsWith("UBERON:"),
          lit("http://purl.obolibrary.org/obo/uberon.owl"))
          .when(col("uberon_site").startsWith("EFO:"),
            lit("http://www.ebi.ac.uk/efo/efo.owl")).as("system"),
        col("uberon_site").as("code")))
      val ncitCoding = when(
        present(col("ncit_site")) && col("ncit_site").startsWith("NCIT:"),
        struct(lit("http://purl.obolibrary.org/obo/ncit.owl").as("system"),
          col("ncit_site").as("code")))
      val codings = filter(array(uberonCoding, ncitCoding), x => x.isNotNull)
      when(present(col("anatomy_site")) || size(codings) > 0, struct(
        optional(col("anatomy_site"), col("anatomy_site")).as("text"),
        when(size(codings) > 0, codings).as("coding")))
    }
    val collectedDateTime = relativeDateExtension(col("age_days"))
    val collection = when(
      collectedDateTime.isNotNull || quantity.isNotNull ||
        method.isNotNull || bodySite.isNotNull,
      struct(
        collectedDateTime.as("_collectedDateTime"),
        quantity.as("quantity"),
        method.as("method"),
        bodySite.as("bodySite")))

    val entity = struct(
      lit("Specimen").as("resourceType"),
      surrogateId("Specimen", col("bs_id")).as("id"),
      struct(
        array(lit("http://hl7.org/fhir/StructureDefinition/Specimen")).as("profile"),
        array(struct(col("study_id").as("code"))).as("tag"),
        security.as("security")).as("meta"),
      compactArray(
        officialIdentifier(s"$KfDataserviceBase/biospecimens/", col("bs_id")),
        secondaryWithSystem("external_sample_id", col("sample_id")),
        secondaryWithSystem("external_aliquot_id", col("aliquot_id"))).as("identifier"),
      lit("unavailable").as("status"),
      reference("Patient", surrogateId("Patient", col("pid"))).as("subject"),
      specimenType.as("type"),
      collection.as("collection"))

    deduped.select(col("bs_id").as("key"), lit("Specimen").as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))
  }
}
