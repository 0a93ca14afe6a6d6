package graft.etl

import org.apache.spark.sql.DataFrame

import graft.clean.CleanOps
import graft.relational.RelationalOps

/** The transform stage: rename every endpoint table into the concept
  * namespace, then build the presence-driven left-to-right full outer
  * join chain into one wide denormalized DataFrame per study, plus the
  * standalone family-relationship table
  * (kf_task_fhir_etl/etl/ingest.py:129-493).
  *
  * The whole assembly is driver-side conditionals over lazy DataFrames:
  * Catalyst only ever sees the joins that actually exist. The wide plan
  * is reused by all 16 entity pipelines, so callers should
  * `.persist(MEMORY_AND_DISK)` the result before fanning out (mirrors
  * the reference's one-materialization-per-study,
  * but spillable instead of RAM-bound — the headline 100 TB fix,
  * SURVEY §4).
  */
object Transform {

  /** Entity-builder names in load order (the reference's `all_targets`,
    * target_api_plugins/kf_api_fhir_service.py:115-132) — a topological
    * order of cross-resource references.
    */
  val AllTargets: Seq[String] = Seq(
    "practitioner", "organization", "practitioner_role",
    "patient", "proband_status", "family_relationship", "family",
    "research_study", "research_subject",
    "disease", "phenotype", "vital_status",
    "sequencing_center", "specimen", "histopathology",
    "drs_document_reference")

  final case class Result(
      wide: DataFrame,
      familyRelationship: Option[DataFrame],
      targets: Seq[String])

  /** Presence-driven assembly over whatever endpoints the extract stage
    * returned. Each block mirrors one `if <endpoint> is not None:` in
    * ingest.py:145-489: rename (P2), join into the accumulator with the
    * reference's key(s), and register the target builders it enables.
    */
  def apply(endpoints: Map[String, DataFrame]): Result = {
    val C = Concepts
    def renamed(name: String): Option[DataFrame] =
      endpoints.get(name).map { df =>
        RelationalOps.renameColumns(CleanOps.dropSystemColumns(df), RenameMaps.byEndpoint(name))
      }

    var targets = Set.empty[String]
    var acc: Option[DataFrame] = None
    def merge(next: DataFrame, on: Seq[String]): Unit =
      acc = Some(RelationalOps.outerJoinChain(acc.get, Seq((next, on))))

    val studies = renamed("studies")
    if (studies.isDefined) { acc = studies; targets += "research_study" }

    renamed("investigators").foreach { inv =>
      merge(inv, Seq(C.Investigator.TargetServiceId))
      targets ++= Set("practitioner", "organization", "practitioner_role")
    }

    renamed("participants").foreach { p =>
      merge(p, Seq(C.Study.TargetServiceId))
      targets ++= Set("patient", "proband_status", "research_subject")
    }

    renamed("families").foreach { f =>
      merge(f, Seq(C.Family.TargetServiceId))
      targets += "family"
    }

    // family-relationships: cleaned standalone table, not joined into the
    // wide frame (ingest.py:246-258)
    val familyRel = renamed("family-relationships").map { fr =>
      targets += "family_relationship"
      CleanOps.cleanUp(fr)
    }

    renamed("diagnoses").foreach { d =>
      merge(d, Seq(C.Participant.TargetServiceId))
      targets += "disease"
    }

    renamed("phenotypes").foreach { p =>
      merge(p, Seq(C.Participant.TargetServiceId))
      targets += "phenotype"
    }

    renamed("outcomes").foreach { o =>
      merge(o, Seq(C.Participant.TargetServiceId))
      targets += "vital_status"
    }

    val bioDx = renamed("biospecimen-diagnoses")
    bioDx.foreach { bd => merge(bd, Seq(C.Diagnosis.TargetServiceId)) }

    renamed("biospecimens").foreach { b =>
      // composite key iff biospecimen-diagnoses joined first
      // (ingest.py:381-395)
      val on =
        if (bioDx.isDefined) { targets += "histopathology"
          Seq(C.Participant.TargetServiceId, C.Biospecimen.TargetServiceId) }
        else Seq(C.Participant.TargetServiceId)
      merge(b, on)
      targets ++= Set("sequencing_center", "specimen")
    }

    renamed("biospecimen-genomic-files").foreach { bgf =>
      merge(bgf, Seq(C.Biospecimen.TargetServiceId))
    }

    renamed("genomic-files").foreach { gf =>
      merge(gf, Seq(C.GenomicFile.TargetServiceId))
      targets += "drs_document_reference"
    }

    val seqGf = renamed("sequencing-experiment-genomic-files")
    seqGf.foreach { s => merge(s, Seq(C.GenomicFile.TargetServiceId)) }

    // sequencing-experiments joins only if the link table was present
    // (ingest.py:465-483)
    if (seqGf.isDefined)
      renamed("sequencing-experiments").foreach { se =>
        merge(se, Seq(C.Sequencing.TargetServiceId))
      }

    Result(
      wide = CleanOps.cleanUp(acc.getOrElse(
        throw new IllegalArgumentException("no 'studies' endpoint present"))),
      familyRelationship = familyRel,
      targets = AllTargets.filter(targets.contains))
  }
}
