package graft.documents

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for building FHIR R4 resources as nested Catalyst expression
  * trees (SURVEY §2.8: `build_entity` as expressions, not UDFs, so
  * pruning + whole-stage codegen apply). Serialization relies on
  * `to_json` dropping null fields — which reproduces the reference's
  * "add the key only when the value is present" builder style (P7).
  */
object FhirJson {

  /** The builders' serialization kernel: `to_json` semantics (null
    * fields dropped, Jackson-default escaping) as one codegen'd static
    * call — see [[graft.functions.StructToJsonNative]]. Byte-exactness
    * vs `to_json` is pinned by `NativeJsonSpec` (differential over the
    * full corpus, every builder) and the 16 hash-checked kf oracles.
    * Unsupported leaf types fail ANALYSIS, never fall back silently.
    */
  def entityJson(entity: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.StructToJsonNative(
      GraftColumnBridge.expression(entity)))
  }

  /** Python-truthiness presence test for strings (`if external_id:`,
    * patient.py:157): null and "" are both missing.
    */
  def present(c: Column): Column = c.isNotNull && c =!= ""

  /** `when(present(gate), value)` — null (⇒ dropped by to_json) otherwise. */
  def optional(gate: Column, value: Column): Column = when(present(gate), value)

  /** An array keeping only non-null elements; null (dropped) when empty,
    * matching builders that only set a list key once non-empty
    * (e.g. family.py:113-116).
    */
  def compactArray(elems: Column*): Column = {
    val arr = filter(array(elems: _*), x => x.isNotNull)
    when(size(arr) > 0, arr)
  }

  /** meta block: profile + study-id tag (patient.py:144-148 et al.). */
  def meta(apiPath: String, studyId: Column): Column = struct(
    array(lit(s"http://hl7.org/fhir/StructureDefinition/$apiPath")).as("profile"),
    array(struct(studyId.as("code"))).as("tag"))

  /** Official identifier entry (system + value). */
  def officialIdentifier(system: String, value: Column): Column = struct(
    lit("official").as("use"), lit(system).as("system"), value.as("value"))

  /** Secondary identifier added only when the source value is "truthy".
    * Carries a null `system` field so it shares the official identifier's
    * struct shape inside one array (to_json drops the null).
    */
  def secondaryIdentifier(value: Column): Column =
    optional(value, struct(lit("secondary").as("use"),
      lit(null).cast("string").as("system"), value.as("value")))

  /** A FHIR reference struct `{"reference": "Type/id"}`. */
  def reference(apiPath: String, id: Column): Column =
    struct(concat_ws("/", lit(apiPath), id).as("reference"))

  /** The relative-date primitive extension shared by disease/phenotype/
    * vital-status/specimen builders (disease.py:161-194 etc.): age in
    * days after Birth. The whole block is omitted when the age fails to
    * parse as int (the reference's silent try/except-omit, F5 —
    * reproduced by try_cast null + null-dropping to_json). The three
    * inner elements have different value keys, so they share one struct
    * shape with nullable branches.
    */
  def relativeDateExtension(eventAgeDays: Column): Column = {
    val days = eventAgeDays.try_cast("int")
    def inner(url: String, vcc: Column, vcode: Column, vdur: Column): Column =
      struct(lit(url).as("url"), vcc.as("valueCodeableConcept"),
        vcode.as("valueCode"), vdur.as("valueDuration"))
    val codingT = "struct<coding:array<struct<system:string,code:string,display:string>>>"
    val durT = "struct<value:int,unit:string,system:string,code:string>"
    val birth = struct(array(struct(
      lit("http://snomed.info/sct").as("system"),
      lit("3950001").as("code"), lit("Birth").as("display"))).as("coding"))
    val dur = struct(days.as("value"), lit("day").as("unit"),
      lit("http://unitsofmeasure.org").as("system"), lit("d").as("code"))
    when(days.isNotNull, struct(
      array(struct(
        array(
          inner("event", birth, lit(null).cast("string"), lit(null).cast(durT)),
          inner("relationship", lit(null).cast(codingT), lit("after"), lit(null).cast(durT)),
          inner("offset", lit(null).cast(codingT), lit(null).cast("string"), dur)
        ).as("extension"),
        lit("http://hl7.org/fhir/StructureDefinition/relative-date").as("url")
      )).as("extension")))
  }

  /** CodeableConcept with a text and an optional coding list that is
    * only present when non-empty (`setdefault("coding", []).append`).
    */
  def codeableConcept(text: Column, codings: Column*): Column = {
    val arr = filter(array(codings: _*), x => x.isNotNull)
    struct(when(size(arr) > 0, arr).as("coding"), text.as("text"))
  }

  /** Coding struct literal from a [[graft.codes.Codes.Coding]]. */
  def codingLit(c: graft.codes.Codes.Coding): Column = struct(
    lit(c.system).as("system"), lit(c.code).as("code"), lit(c.display).as("display"))
}
