package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-table abstraction standing in for an Iceberg catalog (no
  * Iceberg runtime jar ships in this sandbox — SURVEY §7.1.8). A source
  * exposes a snapshot id (lineage for the checkpoint manifest), the
  * partition ids, and per-partition reads. The trait boundary makes the
  * swap to a real Iceberg `snapshot_id()`/`partitions` metadata-table
  * implementation mechanical.
  */
trait TableSource {
  def snapshotId: String
  /** Lineage at the PARTITION grain: an append or rewrite must only
    * invalidate the partitions it touched, not force re-validation of the
    * whole table (Iceberg tracks data files per partition the same way).
    * Default = table-level snapshot for sources without partition
    * metadata. */
  def partitionSnapshotId(p: Int): String = snapshotId
  def partitionIds(): Seq[Int]
  /** Read one partition. MUST prune at the scan (partition directory /
    * file-level), never filter a full-table scan. */
  def readPartition(p: Int): DataFrame
  /** Full-table read (all partitions). */
  def read(): DataFrame
}

/** Parquet directory partitioned by an explicit `partition_id=N`
  * subdirectory (hive-style), emulating Iceberg identity/bucket
  * partitioning. Partition pruning comes free from the directory layout:
  * `readPartition` opens only that subdirectory.
  *
  * @param contentDigest snapshot-id mode. `false` (default): listing +
  *   size + mtime — zero IO, but a rewrite that preserves length AND mtime
  *   (coarse-granularity filesystems, object-store copies with preserved
  *   timestamps) keeps the id, so the resumable runner would falsely skip
  *   the partition. `true`: additionally digests each file's first/last
  *   64 KiB (Digests.fileContentDigest) — O(128 KiB) IO per file, catches
  *   same-mtime rewrites. */
class ParquetPartitionedSource(spark: SparkSession, root: String,
                               contentDigest: Boolean = false) extends TableSource {

  /** Snapshot id = stable digest of the partition directory listing +
    * file sizes + modification times (+ edge-block content digests in
    * contentDigest mode). mtime matters: a file rewritten in place with
    * same-length content would otherwise keep its snapshot id and the
    * resumable runner would skip re-validating changed data — a false
    * "already validated" is strictly worse than the false re-validation an
    * mtime-only touch causes. (A real Iceberg catalog supplies real
    * snapshot ids; this is the stand-in.) */
  private def fingerprintFiles(files: Seq[java.io.File]): String =
    graft.io.Digests.sha8(files
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val content = if (contentDigest) ":" + graft.io.Digests.fileContentDigest(f) else ""
        s"${f.getParentFile.getName}/${f.getName}:${f.length()}:${f.lastModified()}$content"
      }
      .sorted.mkString("\n"))

  override def snapshotId: String = {
    val dir = new java.io.File(root)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq else Seq(f)
      }
    fingerprintFiles(files.toSeq)
  }

  /** Partition-grain lineage: only this partition's files participate, so
    * appends/rewrites elsewhere don't invalidate it. */
  override def partitionSnapshotId(p: Int): String = {
    val dir = new java.io.File(s"$root/partition_id=$p")
    fingerprintFiles(Option(dir.listFiles()).getOrElse(Array.empty).toSeq)
  }

  override def partitionIds(): Seq[Int] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("partition_id="))
      .map { f =>
        // fail with an ACTIONABLE message, not a NumberFormatException: a
        // null partition_id write lands in __HIVE_DEFAULT_PARTITION__, and
        // silently skipping it would leave rows unvalidated
        f.getName.stripPrefix("partition_id=").toIntOption.getOrElse(
          throw new IllegalArgumentException(
            s"non-numeric partition directory '${f.getName}' under $root " +
              "(null partition_id rows land in __HIVE_DEFAULT_PARTITION__) — " +
              "clean or re-partition the table before validating"))
      }
      .sorted.toSeq
  }

  override def readPartition(p: Int): DataFrame = {
    val dir = new java.io.File(s"$root/partition_id=$p")
    val hasData = Option(dir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith(".parquet"))
    if (hasData)
      spark.read.parquet(dir.toString).withColumn("partition_id", lit(p))
    else
      // a partition directory emptied by maintenance still lists as a
      // partition: borrow the table schema and prune to the (empty) dir
      // instead of crashing schema inference on zero files
      read().where(col("partition_id") === p)
  }

  override def read(): DataFrame =
    spark.read.option("basePath", root).parquet(root)
}

object ParquetPartitionedSource {
  /** Write a DataFrame carrying `partition_id` as a hive-partitioned
    * parquet table. Repartitions by partition_id first so each hive
    * directory gets O(1) files instead of one per upstream task
    * (small-file avalanche at scale). */
  def write(df: DataFrame, root: String): Unit =
    df.repartition(col("partition_id"))
      .write.mode("overwrite").partitionBy("partition_id").parquet(root)
}
