package graft.transcript

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.TableSource

/** Resumable partition-wise validation (north rule): iterates the source's
  * partitions, skips any recorded in the manifest under the same
  * (snapshot-id, constraint-set hash) lineage, validates the rest, and
  * commits a manifest entry per completed partition — so a killed and
  * restarted run does no repeated work.
  *
  * '''Partitioning contract''': conversations must not span source
  * partitions (partition by a conversation-derived key — conv hash, or a
  * bucketing that closes conversations before the partition seals, e.g.
  * day-of-conversation-END). Per-partition sequence/duplicate checks are
  * only complete within one partition: a conversation split across two
  * partitions would see false gap verdicts on the later slice and miss
  * cross-partition duplicates. The same contract is what makes the
  * incremental skip sound — Iceberg-style engines impose it identically
  * for partition-local maintenance. [[graft.gen.TranscriptGen]] and the
  * CLI's hive layout both partition by conversation hash.
  *
  * @param sink optional callback receiving each validated partition's
  *   violations (e.g. parquet writer); runs before the manifest commit so a
  *   crash between the two re-validates (at-least-once, idempotent by
  *   overwrite).
  */
class ResumableRunner(
    source: TableSource,
    manifest: CheckpointManifest,
    validator: TranscriptValidator,
    convKeys: Option[DataFrame] = None,
    sink: Option[(Int, TranscriptReport) => Unit] = None) {

  final case class RunSummary(
      validated: Seq[PartitionEntry],
      skipped: Seq[Int],
      totalRows: Long,
      totalViolations: Long)

  def constraintHash: String = CheckpointManifest.constraintHash(
    Constraints.all.filterNot(_ == Constraints.OrphanConv) ++
      convKeys.map(_ => Constraints.OrphanConv).toSeq)

  def run(): RunSummary = {
    val cHash = constraintHash
    // lineage is checked at the PARTITION grain: an append or rewrite of
    // one partition must not force re-validation of every other; the skip
    // predicate lives in the manifest (isComplete) so it can't drift from
    // what record() wrote. Snapshots are computed ONCE here — before any
    // scan, so data landing mid-validation invalidates the entry on the
    // next run — and reused for the manifest entry (in contentDigest mode
    // a second call would repeat the per-file edge-block IO)
    val snaps = source.partitionIds().map(p => p -> source.partitionSnapshotId(p))
    val (skipped, todo) = snaps.partition { case (p, snap) =>
      manifest.isComplete(p, snap, cHash)
    }
    val skip = skipped.map(_._1)
    val validated = todo.map { case (p, snap) =>
      val t0 = System.nanoTime()
      val report = validator.validate(source.readPartition(p), convKeys)
      // one action materializes the partition verdict (rows + violations)
      val verdict = report.partitionVerdicts
        .agg(sum(col("rows_scanned")), sum(col("violations"))).collect()(0)
      sink.foreach(_(p, report))
      val entry = PartitionEntry(
        partitionId = p, snapshotId = snap, constraintHash = cHash,
        rowsScanned = if (verdict.isNullAt(0)) 0L else verdict.getLong(0),
        violations = if (verdict.isNullAt(1)) 0L else verdict.getLong(1),
        wallMs = (System.nanoTime() - t0) / 1000000L)
      manifest.record(entry)
      // release this partition's persisted seq/violations before moving on
      // — over thousands of partitions the leaked caches would crowd out
      // executor storage
      report.cleanup()
      entry
    }
    RunSummary(validated, skip,
      validated.map(_.rowsScanned).sum, validated.map(_.violations).sum)
  }
}
