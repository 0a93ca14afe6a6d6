package graft.documents

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codes.Codes
import graft.etl.Concepts._
import FhirJson._
import FhirBuilders.{KfDataserviceBase, surrogateId}

/** DRS DocumentReference (drs_document_reference.py:163-412).
  *
  * The reference issues ONE synchronous REST GET per genomic file for
  * Indexd metadata (S6, drs_document_reference.py:224-243) — the
  * headline anti-pattern at scale. Here that becomes a bulk-prefetched
  * `indexd` dimension DataFrame (gf_id, acl array, size, hashes map,
  * file_name) equi-joined against the regrouped rows (SURVEY §7.4
  * risk 5) — shuffle-joined, since indexd is 1:1 with genomic files. Pass None when no Indexd source exists: those fields are
  * simply omitted, like the reference's None-valued payload keys.
  */
object DrsBuilder {

  private val c = (n: String) => col(s"`$n`")
  private val DrsHost = "drs://data.kidsfirstdrc.org"
  private val DataTypes = "https://includedcc.org/fhir/code-systems/data_types"
  private val ExpStrategies = "https://includedcc.org/fhir/code-systems/experimental_strategies"
  private val DataCategories = "https://includedcc.org/fhir/code-systems/data_categories"
  private val DataAccess = "https://includedcc.org/fhir/code-systems/data_access_types"

  /** type coding map (drs_document_reference.py:31-108); constant keys
    * from the public kf-lib-data-ingest GENOMIC_FILE.DATA_TYPE.
    */
  val typeCoding: Map[String, Codes.Coding] = Map(
    "Aligned Reads" -> Codes.Coding(DataTypes, "Aligned-Reads", "Aligned Reads"),
    "Aligned Reads Index" -> Codes.Coding(DataTypes, "Aligned-Reads-Index", "Aligned Reads Index"),
    "Annotated Gene Fusion" -> Codes.Coding(DataTypes, "Annotated-Gene-Fusion", "Annotated Gene Fusion"),
    "Gene Expression Quantification" -> Codes.Coding(DataTypes, "Gene-Expression-Quantifications", "Gene Expression Quantifications"),
    "Gene Fusions" -> Codes.Coding(DataTypes, "Gene-Fusions", "Gene Fusions"),
    "Isoform Expression Quantifications" -> Codes.Coding(DataTypes, "Isoform-Expression-Quantifications", "Isoform Expression Quantifications"),
    "gVCF" -> Codes.Coding(DataTypes, "gVCF", "gVCF"),
    "gVCF Index" -> Codes.Coding(DataTypes, "gVCF-Index", "gVCF Index"),
    "Raw Gene Fusion" -> Codes.Coding(DataTypes, "Raw-Gene-Fusions", "Raw Gene Fusions"),
    "Simple Nucleotide Variations" -> Codes.Coding(DataTypes, "Simple-Nucleotide-Variations", "Simple Nucleotide Variations"),
    "Somatic Copy Number Variation" -> Codes.Coding(DataTypes, "Somatic-Copy-Number-Variations", "Somatic Copy Number Variations"),
    "Somatic Copy Number Variations" -> Codes.Coding(DataTypes, "Somatic-Copy-Number-Variations", "Somatic Copy Number Variations"),
    "Somatic Structural Variations" -> Codes.Coding(DataTypes, "Somatic-Structural-Variations", "Somatic Structural Variations"),
    "Variant Calls" -> Codes.Coding(DataTypes, "Variant-Calls", "Variant Calls"),
    "Variant Calls Index" -> Codes.Coding(DataTypes, "Variant-Calls-Index", "Variant Calls Index"))

  val strategyCoding: Map[String, Codes.Coding] = Map(
    "RNA-Seq" -> Codes.Coding(ExpStrategies, "RNA-Seq", "RNA-Seq"),
    "WGS" -> Codes.Coding(ExpStrategies, "WGS", "Whole Genome Sequencing"))

  val categoryCoding: Map[String, Codes.Coding] = Map(
    "RNA-Seq" -> Codes.Coding(DataCategories, "Transcriptomics", "Transcriptomics"),
    "WGS" -> Codes.Coding(DataCategories, "Genomics", "Genomics"))

  private val IndexDataTypes = Seq(
    "Aligned Reads Index", "gVCF Index", "Simple Nucleotide Variations Index",
    "Somatic Structural Variations Index", "Variant Calls Index")

  /** A2-style regroup: one row per (study, genomic file [, seq-exp]) with
    * collected participant/biospecimen sets and min-distinct strategy
    * (drs_document_reference.py:170-206) — pinned deterministic with
    * sorted sets (SURVEY §7.4 risk 6).
    */
  def regroup(wide: DataFrame): DataFrame = {
    val hasSeq = wide.columns.contains(Sequencing.TargetServiceId)
    val baseKeys = Seq(col("study_id"), col("gf_id"))
    val pre = wide.select(Seq(
      c(Study.TargetServiceId).as("study_id"),
      c(GenomicFile.TargetServiceId).as("gf_id"),
      c(Participant.TargetServiceId).as("pid"),
      c(Biospecimen.TargetServiceId).as("bs_id"),
      c(GenomicFile.DataType).as("data_type"),
      c(GenomicFile.FileFormat).as("file_format"),
      c(GenomicFile.LatestDid).as("latest_did"),
      c(GenomicFile.ControlledAccess).as("controlled_access")) ++
      (if (hasSeq) Seq(c(Sequencing.TargetServiceId).as("seq_id"),
        c(Sequencing.Strategy).as("strategy"))
       else Seq(lit(null).cast("string").as("seq_id"),
         lit(null).cast("string").as("strategy"))): _*)
      .where(col("gf_id").isNotNull)
    // pandas groupby drops null group keys (dropna=True): rows with a
    // null study — and, when the seq-exp column exists, null seq id —
    // are silently dropped by the reference's regroup
    // (drs_document_reference.py:172-202); reproduce that.
    val withNullKeyRule =
      if (hasSeq) pre.where(col("study_id").isNotNull && col("seq_id").isNotNull)
      else pre.where(col("study_id").isNotNull)
    withNullKeyRule.groupBy(baseKeys :+ col("seq_id"): _*)
      .agg(
        sort_array(collect_set(col("pid"))).as("pids"),
        sort_array(collect_set(col("bs_id"))).as("bs_ids"),
        // get() not getItem(): the set is empty when every strategy is
        // null and ANSI mode would throw on the out-of-bounds index
        get(sort_array(collect_set(col("strategy"))), lit(0)).as("strategy"),
        // min, not first(ignoreNulls): same pick-one-non-null-per-column
        // semantics as the reference's head(1)-after-groupby, but
        // DETERMINISTIC — first() can change winners across task
        // retries/speculation when a group holds conflicting duplicates
        min(col("data_type")).as("data_type"),
        min(col("file_format")).as("file_format"),
        min(col("latest_did")).as("latest_did"),
        min(col("controlled_access")).as("controlled_access"))
  }

  /** Regroup computed WITHOUT materializing the biospecimen-path ×
    * sequencing-link row product. The 7-endpoint slice fans out to
    * B×S rows per genomic file (≈20× lineitem at sf0.1 — 11.9M rows),
    * yet the collected sets are separable: `pids`/`bs_ids` depend only
    * on (study, gf) and `strategy` only on (gf, seq-exp). So aggregate
    * each side of the chain FIRST and inner-join the far smaller
    * aggregates on the coalesced gf key. Equivalent to
    * [[regroup]]-on-the-full-slice because (a) every bs-path row is
    * crossed with every seq link of its gf in the fanned frame, so the
    * per-(study,gf,seq) sets equal the per-(study,gf) sets; (b) outer
    * key coalescing means orphan seq links and link-only gf ids surface
    * identically on both sides; (c) the fanned regroup drops
    * null-study/null-seq rows exactly where the two filters below do.
    * At 100 TB this is the difference between shuffling the join
    * product and shuffling two table-sized aggregates.
    */
  def regroupFromChain(result: graft.etl.Transform.Result): DataFrame = {
    // only gf NON-key columns are read on this side — biospecimens and
    // the bs-gf link contribute key values alone, so naming just
    // {studies, participants, genomic-files} lets slice() pull them as
    // key-projected DISTINCT sets (closure still replays the exact join
    // chain, composite biospecimen key included)
    val bsWide = result.slice(Set("studies", "participants", "genomic-files"))
    val bsAgg = bsWide
      .where(c(GenomicFile.TargetServiceId).isNotNull &&
        c(Study.TargetServiceId).isNotNull)
      .groupBy(
        c(Study.TargetServiceId).as("study_id"),
        c(GenomicFile.TargetServiceId).as("gf_id"))
      .agg(
        sort_array(collect_set(c(Participant.TargetServiceId))).as("pids"),
        sort_array(collect_set(c(Biospecimen.TargetServiceId))).as("bs_ids"),
        // min for determinism under retries — see regroup's note
        min(c(GenomicFile.DataType)).as("data_type"),
        min(c(GenomicFile.FileFormat)).as("file_format"),
        min(c(GenomicFile.LatestDid)).as("latest_did"),
        min(c(GenomicFile.ControlledAccess)).as("controlled_access"))
    val hasLink =
      result.steps.exists(_.endpoint == "sequencing-experiment-genomic-files")
    if (!hasLink)
      bsAgg
        .withColumn("seq_id", lit(null).cast("string"))
        .withColumn("strategy", lit(null).cast("string"))
    else {
      // the pairs need only the link (⟗ seq-exps for strategy when
      // present): gf-table-only ids have no link row and are filtered by
      // the null-seq rule either way, and link-side gf ids coalesce to
      // the same values the gf-rooted fold would produce — so joining
      // the full-size gf table here would contribute nothing but its
      // duplicate-row multiplicity. No strategy column when seq-exps is
      // absent (reference joins it only when the link exists,
      // ingest.py:465-483).
      val seqExpPresent =
        result.steps.exists(_.endpoint == "sequencing-experiments")
      val seqWide =
        if (seqExpPresent)
          result.slice(Set("sequencing-experiment-genomic-files",
            "sequencing-experiments"))
        else
          result.slice(Set("sequencing-experiment-genomic-files"))
      val strat =
        if (seqWide.columns.contains(Sequencing.Strategy)) c(Sequencing.Strategy)
        else lit(null).cast("string")
      val seqPairs = seqWide
        .where(c(GenomicFile.TargetServiceId).isNotNull &&
          c(Sequencing.TargetServiceId).isNotNull)
        .groupBy(
          c(GenomicFile.TargetServiceId).as("gf_id"),
          c(Sequencing.TargetServiceId).as("seq_id"))
        .agg(get(sort_array(collect_set(strat)), lit(0)).as("strategy"))
      bsAgg.join(seqPairs, Seq("gf_id"), "inner")
    }
  }

  /** Build from the transform chain via the decomposed regroup — the
    * scale path; [[drsDocumentReference(wide:*]] keeps the reference's
    * one-wide-frame API for parity testing.
    */
  def drsDocumentReference(result: graft.etl.Transform.Result,
      indexd: Option[DataFrame]): DataFrame =
    build(regroupFromChain(result), indexd)

  /** Build DocumentReference docs. `indexd` columns: gf_id, acl
    * (array&lt;string&gt;), size (long), hashes (map&lt;string,string&gt;),
    * file_name.
    */
  def drsDocumentReference(wide: DataFrame, indexd: Option[DataFrame] = None): DataFrame =
    build(regroup(wide), indexd)

  private def build(grouped: DataFrame, indexd: Option[DataFrame]): DataFrame = {
    // NO broadcast hint: indexd is 1:1 with genomic files (NOT a small
    // dim — at 100 TB it's a full-size table), so a forced broadcast
    // collects the whole thing to the driver; measured +5s at sf0.1.
    // AQE still auto-broadcasts when a filtered study slice is tiny.
    val rows = indexd match {
      case Some(ix) => grouped.join(
        ix.select(col("gf_id"), col("acl"), col("size"), col("hashes"), col("file_name")),
        Seq("gf_id"), "left")
      case None => grouped
        .withColumn("acl", lit(null).cast("array<string>"))
        .withColumn("size", lit(null).cast("long"))
        .withColumn("hashes", lit(null).cast("map<string,string>"))
        .withColumn("file_name", lit(null).cast("string"))
    }

    // TEMPORARY imputation from the reference (:246-254): tbi over
    // (simple-nucleotide|somatic-structural) variations ⇒ "… Index"
    val dataType = when(
      col("data_type").isin("Simple Nucleotide Variations", "Somatic Structural Variations") &&
        col("file_format") === "tbi",
      concat(col("data_type"), lit(" Index"))).otherwise(col("data_type"))

    val docType = optional(dataType, codeableConcept(dataType,
      Codes.codingLookup(typeCoding, dataType)))

    val category = optional(col("strategy"), array(
      codeableConcept(col("strategy"), Codes.codingLookup(strategyCoding, col("strategy"))),
      codeableConcept(col("strategy"), Codes.codingLookup(categoryCoding, col("strategy")))))

    // subject only for single-participant files (:305-313)
    val subject = when(size(col("pids")) === 1,
      reference("Patient", surrogateId("Patient", element_at(col("pids"), 1))))

    // securityLabel: controlled-access entry + one entry per acl
    // (:315-333). The reference's first text is the raw REST boolean
    // while acl texts are strings — JSON tolerates the mix, one Spark
    // struct array can't; we emit the cleaned source string ("True"/
    // "False") as the access text, coding unchanged.
    val accessCoding = when(col("controlled_access") === "True",
      codingLit(Codes.Coding(DataAccess, "controlled", "Controlled")))
      .when(col("controlled_access") === "False",
        codingLit(Codes.Coding(DataAccess, "registered", "Registered")))
    val securityLabel = concat(
      array(struct(
        when(accessCoding.isNotNull, array(accessCoding)).as("coding"),
        col("controlled_access").as("text"))),
      transform(coalesce(col("acl"), array().cast("array<string>")),
        acl => struct(
          when(size(split(acl, "\\.")) > 1,
            array(struct(
              lit(null).cast("string").as("system"),
              split(acl, "\\.").getItem(1).as("code"),
              lit(null).cast("string").as("display")))).as("coding"),
          acl.as("text"))))

    // content.attachment (:336-391)
    val sizeExt = when(col("size").isNotNull, struct(
      lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/file-size").as("url"),
      col("size").as("valueDecimal"),
      lit(null).cast("struct<coding:array<struct<display:string>>,text:string>")
        .as("valueCodeableConcept")))
    val hashExts = transform(map_entries(coalesce(col("hashes"),
        map().cast("map<string,string>"))),
      e => struct(
        lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/hashes").as("url"),
        lit(null).cast("long").as("valueDecimal"),
        struct(array(struct(e.getField("key").as("display"))).as("coding"),
          e.getField("value").as("text")).as("valueCodeableConcept")))
    val attachExts = concat(filter(array(sizeExt), x => x.isNotNull), hashExts)
    val attachment = {
      val url = optional(col("latest_did"), concat(lit(s"$DrsHost/"), col("latest_did")))
      val title = optional(col("file_name"), element_at(split(col("file_name"), "/"), -1))
      when(size(attachExts) > 0 || url.isNotNull || title.isNotNull, struct(
        when(size(attachExts) > 0, attachExts).as("extension"),
        url.as("url"), title.as("title")))
    }
    val format = when(
      present(col("file_format")) &&
        !col("file_format").isin(Codes.conditionMissingDataValues.toSeq: _*),
      struct(col("file_format").as("display")))
    val content = when(format.isNotNull || attachment.isNotNull,
      array(struct(format.as("format"), attachment.as("attachment"))))

    // context.related: specimen refs, skipped for index files (:393-410)
    val related = transform(col("bs_ids"),
      bs => reference("Specimen", surrogateId("Specimen", bs)))
    val context = when(!dataType.isin(IndexDataTypes.map(x => x: Any): _*) || dataType.isNull,
      when(size(col("bs_ids")) > 0, struct(related.as("related"))))

    val entity = struct(
      lit("DocumentReference").as("resourceType"),
      surrogateId("DocumentReference", col("gf_id")).as("id"),
      struct(
        array(lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/drs-document-reference"))
          .as("profile"),
        array(struct(col("study_id").as("code"))).as("tag")).as("meta"),
      array(officialIdentifier(s"$KfDataserviceBase/genomic-files/", col("gf_id")))
        .as("identifier"),
      lit("current").as("status"),
      lit("final").as("docStatus"),
      docType.as("type"),
      category.as("category"),
      subject.as("subject"),
      securityLabel.as("securityLabel"),
      content.as("content"),
      context.as("context"))

    rows.select(col("gf_id").as("key"), lit("DocumentReference").as("resource_type"),
      FhirJson.entityJson(entity).as("resource_json"))
  }
}
