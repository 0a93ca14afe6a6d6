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

  /** Coding struct literal from a [[graft.codes.Codes.Coding]]. */
  def codingLit(c: graft.codes.Codes.Coding): Column = struct(
    lit(c.system).as("system"), lit(c.code).as("code"), lit(c.display).as("display"))
}
