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

  /** Proband-status value coding (proband_status.py:16-27). */
  val probandValueCoding: Map[String, Coding] = Map(
    "True" -> Coding("http://terminology.hl7.org/CodeSystem/v2-0136", "Y", "Yes"),
    "False" -> Coding("http://terminology.hl7.org/CodeSystem/v2-0136", "N", "No"))

  /** Vital-status code coding (vital_status.py:15-26). */
  val vitalStatusCoding: Map[String, Coding] = Map(
    "Alive" -> Coding(Snomed, "438949009", "Alive (finding)"),
    "Deceased" -> Coding(Snomed, "419099009", "Dead (finding)"))

  private val VerStatus = "http://terminology.hl7.org/CodeSystem/condition-ver-status"

  /** Disease verification status by affected_status (disease.py:13-24). */
  val affectedVerificationCoding: Map[String, Coding] = Map(
    "True" -> Coding(VerStatus, "confirmed", "Confirmed"),
    "False" -> Coding(VerStatus, "refuted", "Refuted"))

  /** Phenotype verification status by observed (phenotype.py:13-24). */
  val observedVerificationCoding: Map[String, Coding] = Map(
    "Positive" -> Coding(VerStatus, "confirmed", "Confirmed"),
    "Negative" -> Coding(VerStatus, "refuted", "Refuted"))

  /** missing_data_values shared by disease.py:26-35 / phenotype.py:26-35. */
  val conditionMissingDataValues: Set[String] = Set(
    "Cannot Collect", "No Match", "Not Able to Provide", "Not Available",
    "Not Applicable", "Not Reported", "Other", "Unknown")

  /** Histopathology's own sentinel set (histopathology.py:19-25). */
  val histopathologyMissingDataValues: Set[String] = Set(
    "N/A", "Not Applicable", "Not Available", "Not Reported", "Unavailable")

  private val Ncit = "http://purl.obolibrary.org/obo/ncit.owl"
  private val Obi = "http://purl.obolibrary.org/obo/obi.owl"
  private def ncit(code: String, display: String) = Coding(Ncit, code, display)

  /** Specimen composition → NCIT coding (specimen.py:16-…, 69 entries;
    * constant keys resolved from the public kf-lib-data-ingest SPECIMEN
    * constants).
    */
  val specimenComposition: Map[String, Coding] = Map(
    "Amniocytes" -> ncit("C118138", "Reactive Amniocyte"),
    "amniotic fluid" -> ncit("C13188", " Amniotic Fluid"),
    "blood" -> ncit("C17610", "Blood Sample"),
    "Blood" -> ncit("C17610", "Blood Sample"),
    "Blood Derived Cancer - Bone Marrow, Post-treatment" -> ncit("C164009", "Bone Marrow Sample"),
    "Blood Derived Cancer - Peripheral Blood, Post-treatment" -> ncit("C173496", "Peripheral Blood"),
    "Blood EDTA" -> ncit("C158462", "EDTA Blood Cell Fraction"),
    "Blood-Lymphocyte" -> ncit("C12535", "Lymphocyte"),
    "bone" -> ncit("C12366", "Bone"),
    "Bone" -> ncit("C12366", "Bone"),
    "Bone marrow" -> ncit("C164009", "Bone Marrow Sample"),
    "Bone Marrow" -> ncit("C164009", "Bone Marrow Sample"),
    "brain" -> ncit("C12439", "Brain"),
    "Brain Tissue" -> ncit("C12439", "Brain"),
    "Buccal" -> ncit("C172264", "Buccal Cell Sample"),
    "Buccal Cell Normal" -> ncit("C172264", "Buccal Cell Sample"),
    "Buccal Cell Swab" -> ncit("C113747", "Buccal Swab"),
    "Buccal Mucosa" -> ncit("C12505", "Buccal Mucosa"),
    "Buffy Coat" -> ncit("C84507", "Buffy Coat"),
    "Cartilage" -> ncit("C12373", "Cartilage"),
    "Cell Freeze" -> ncit("C12508", "Cell"),
    "Cells" -> ncit("C12508", "Cell"),
    "Cerebral Spinal Fluid" -> ncit("C185194", "Cerebrospinal Fluid Sample"),
    "Cheek Swab" -> ncit("C113747", "Buccal Swab"),
    "chest wall" -> ncit("C62484", "Chest Wall"),
    "Cyst Fluid" -> ncit("C2978", "Cyst"),
    "DNA" -> Coding(Obi, "OBI:0001051", "DNA extract"),
    "dura" -> ncit("C32488", "Dura Mater"),
    "Epstein-Barr Virus Immortalized Cells" -> ncit("C163993", "EBV Immortalized Lymphocytes"),
    "Fetal Tissue Liver" -> ncit("C34169", "Fetal Liver"),
    "Fetal Tissue Unspecified" -> ncit("C17730", "Fetal Tissue"),
    "Fibroblast" -> ncit("C12482", "Fibroblast"),
    "Fibroblasts" -> ncit("C12482", "Fibroblast"),
    "Fibroblasts from Bone Marrow Normal" -> ncit("C12482", "Fibroblast"),
    "groin" -> ncit("C12726", "Inguinal Region"),
    "Hair" -> ncit("C32705", "Hair"),
    "Derived Cell Line" -> ncit("C156445", "Derived Cell Line"),
    "LCL" -> ncit("C32941", "Lateral Ligament"),
    "Leukocyte" -> ncit("C12529", "Leukocyte"),
    "lung" -> ncit("C33024", "Lung Tissue"),
    "lymph node" -> ncit("C12745", "Lymph Node"),
    "Lymphocytes" -> ncit("C12535", "Lymphocyte"),
    "marrow" -> ncit("C164009", "Bone Marrow Sample"),
    "mediastinum" -> ncit("C12748", "Mediastinum"),
    "Mononuclear Cells" -> ncit("C178965", "Peripheral Blood Mononuclear Cell Sample"),
    "muscle" -> ncit("C12435", "Muscle Tissue"),
    "Muscle" -> ncit("C12435", "Muscle Tissue"),
    "Myocyte" -> ncit("C12612", "Muscle Cell"),
    "Negative Lymph Node" -> ncit("C36174", "Negative Lymph Node"),
    "Patient Derived Xenograft" -> ncit("C122936", "Patient Derived Xenograft"),
    "PBMC" -> ncit("C178965", "Peripheral Blood Mononuclear Cell Sample"),
    "Peripheral blood" -> ncit("C173496", "Peripheral Blood"),
    "Peripheral Whole Blood" -> ncit("C173496", "Peripheral Blood"),
    "Plasma" -> ncit("C185204", "Plasma Sample"),
    "Primary Blood Derived Cancer - Bone Marrow" -> ncit("C164009", "Bone Marrow Sample"),
    "Primary Blood Derived Cancer - Peripheral Blood" -> ncit("C173496", "Peripheral Blood"),
    "Recurrent Blood Derived Cancer - Peripheral Blood" -> ncit("C173496", "Peripheral Blood"),
    "saliva" -> ncit("C174119", "Saliva Sample"),
    "Saliva" -> ncit("C174119", "Saliva Sample"),
    "Serum" -> ncit("C178987", "Serum Sample"),
    "skin" -> ncit("C33563", "Skin Tissue"),
    "Solid Tissue" -> ncit("C164014", "Solid Tissue Specimen"),
    "Tissue Cell Culture" -> ncit("C17201", "Tissue Culture"),
    "Tissue FFPE" -> ncit("C172265", "Formalin-Fixed Paraffin-Embedded Tissue Sample"),
    "Tissue Flash Frozen" -> ncit("C158417", "Frozen Tissue"),
    "Tissue Freezing Media" -> ncit("C158417", "Frozen Tissue"),
    "Tissue Perineum" -> ncit("C33301", "Perineum"),
    "Tumor" -> ncit("C18009", "Tumor Tissue"),
    "Vascular tissue" -> ncit("C33853", "Vascular Smooth Muscle Tissue"))

  /** Analyte → OBI coding (specimen.py analyte_type_dict). */
  val analyteType: Map[String, Coding] = Map(
    "DNA" -> Coding(Obi, "OBI:0001051", "DNA extract"),
    "RNA" -> Coding(Obi, "OBI:0000880", "RNA extract"))

  /** Sample procurement → SNOMED procedure (specimen.py
    * collection_method_coding).
    */
  val collectionMethod: Map[String, Coding] = Map(
    "Autopsy" -> Coding(Snomed, "29240004", "Autopsy examination (procedure)"),
    "Biopsy" -> Coding(Snomed, "86273004", "Biopsy (procedure)"),
    "Blood Collection - Maternal" -> Coding(Snomed, "396540005", "Phlebotomy (procedure)"),
    "Blood Collection - Paternal" -> Coding(Snomed, "396540005", "Phlebotomy (procedure)"),
    "Blood Collection - Proband" -> Coding(Snomed, "396540005", "Phlebotomy (procedure)"),
    "Blood Draw" -> Coding(Snomed, "396540005", "Phlebotomy (procedure)"),
    "Bone Marrow Aspiration" -> Coding(Snomed, "49401003",
      "Bone marrow aspiration procedure (procedure)"),
    "Saliva Collection - Maternal" -> Coding(Snomed, "225098009",
      "Collection of sample of saliva (procedure)"),
    "Saliva Collection - Paternal" -> Coding(Snomed, "225098009",
      "Collection of sample of saliva (procedure)"),
    "Saliva Collection - Proband" -> Coding(Snomed, "225098009",
      "Collection of sample of saliva (procedure)"),
    "Surgical Resections" -> Coding(Snomed, "65801008", "Excision (procedure)"))

  private val RoleCode = "http://terminology.hl7.org/CodeSystem/v3-RoleCode"
  private def role(code: String, display: String) = Coding(RoleCode, code, display)

  /** Family-relationship role codes (family_relationship.py:16-307);
    * constant keys resolved from the public kf-lib-data-ingest
    * RELATIONSHIP constants (title-case strings).
    */
  val familyRelationshipCoding: Map[String, Coding] = Map(
    "Aunt" -> role("AUNT", "aunt"),
    "Brother" -> role("BRO", "brother"),
    "Brother-in-law" -> role("BROINLAW", "brother-in-law"),
    "Brother-Monozygotic Twin" -> role("TWINBRO", "twin brother"),
    "Child" -> role("CHILD", "child"),
    "Cousin" -> role("COUSN", "cousin"),
    "Daughter" -> role("DAUC", "daughter"),
    "father" -> role("FTH", "father"),
    "Father" -> role("FTH", "father"),
    "First cousin once removed" -> role("EXT", "extended family member"),
    "Grandchild" -> role("GRNDCHILD", "grandchild"),
    "Granddaughter" -> role("GRNDDAU", "granddaughter"),
    "Grandfather" -> role("GRFTH", "grandfather"),
    "Grandmother" -> role("GRMTH", "grandmother"),
    "Grandson" -> role("GRNDSON", "grandson"),
    "Great Nephew" -> role("EXT", "extended family member"),
    "Husband" -> role("HUSB", "husband"),
    "Married in aunt" -> role("EXT", "extended family member"),
    "Married in Husband" -> role("HUSB", "husband"),
    "Married in-Spouse" -> role("SPS", "spouse"),
    "Maternal aunt" -> role("MAUNT", "maternal aunt"),
    "Maternal Aunt" -> role("MAUNT", "maternal aunt"),
    "Maternal cousin" -> role("MCOUSN", "maternal cousin"),
    "Maternal Cousin" -> role("MCOUSN", "maternal cousin"),
    "Maternal grandfather" -> role("MGRFTH", "maternal grandfather"),
    "Maternal Granddaughter" -> role("GRNDDAU", "granddaughter"),
    "Maternal Grandfather" -> role("MGRFTH", "maternal grandfather"),
    "Maternal grandmother" -> role("MGRMTH", "maternal grandmother"),
    "Maternal Grandmother" -> role("MGRMTH", "maternal grandmother"),
    "Maternal great aunt" -> role("EXT", "extended family member"),
    "Maternal Great Aunt" -> role("EXT", "extended family member"),
    "Maternal Great Grandmother" -> role("MGGRMTH", "maternal great-grandmother"),
    "Maternal Great Uncle" -> role("EXT", "extended family member"),
    "Maternal half-sister" -> role("EXT", "extended family member"),
    "Maternal Relation" -> role("EXT", "extended family member"),
    "Maternal uncle" -> role("MUNCLE", "maternal uncle"),
    "mother" -> role("MTH", "mother"),
    "Mother" -> role("MTH", "mother"),
    "Nephew" -> role("NEPHEW", "nephew"),
    "Niece" -> role("NIECE", "niece"),
    "Paternal aunt" -> role("PAUNT", "paternal aunt"),
    "Paternal cousin" -> role("PCOUSN", "paternal cousin"),
    "Paternal Cousin" -> role("PCOUSN", "paternal cousin"),
    "Paternal grandfather" -> role("PGRFTH", "paternal grandfather"),
    "Paternal grandmother" -> role("PGRMTH", "paternal grandmother"),
    "Paternal Grandmother" -> role("PGRMTH", "paternal grandmother"),
    "Paternal uncle" -> role("PUNCLE", "paternal uncle"),
    "Proband" -> role("CHILD", "child"),
    "Sibling" -> role("SIB", "sibling"),
    "Sister" -> role("SIS", "sister"),
    "Son" -> role("SONC", "son"),
    "Spouse" -> role("SPS", "spouse"),
    "Twin Brother" -> role("TWINBRO", "twin brother"),
    "Twin Sister" -> role("TWINSIS", "twin sister"),
    "Uncle" -> role("UNCLE", "uncle"),
    "Uncle-married in" -> role("EXT", "extended family member"),
    "Wife" -> role("WIFE", "wife"))

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
