package graft.transcript

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Per-partition completion record with lineage: a partition is skippable
  * on resume only when BOTH the data snapshot and the constraint set are
  * unchanged (north rule: "checkpoint manifest records completed partition
  * IDs with lineage (snapshot-id, constraint-set hash) and per-partition
  * metrics"). */
final case class PartitionEntry(
    partitionId: Int,
    snapshotId: String,
    constraintHash: String,
    rowsScanned: Long,
    violations: Long,
    wallMs: Long)

/** JSON manifest with atomic commit (write-temp + rename — the sandbox
  * stand-in for an object-store conditional put; the TableSource trait
  * boundary keeps the swap to a real catalog mechanical). Idempotent:
  * re-recording a partition overwrites its entry. */
class CheckpointManifest(path: String) {
  private val mapper = new ObjectMapper()
  private val file: Path = Paths.get(path)

  def load(): Map[Int, PartitionEntry] = {
    if (!Files.exists(file)) return Map.empty
    val root = mapper.readTree(Files.readString(file))
    val arr = root.get("partitions")
    if (arr == null) return Map.empty
    arr.elements().asScala.map { n =>
      val e = PartitionEntry(
        n.get("partitionId").asInt(),
        n.get("snapshotId").asText(),
        n.get("constraintHash").asText(),
        n.get("rowsScanned").asLong(),
        n.get("violations").asLong(),
        n.get("wallMs").asLong())
      e.partitionId -> e
    }.toMap
  }

  /** True when `p` was already validated under the same lineage. */
  def isComplete(p: Int, snapshotId: String, constraintHash: String): Boolean =
    load().get(p).exists(e => e.snapshotId == snapshotId && e.constraintHash == constraintHash)

  def record(entry: PartitionEntry): Unit = synchronized {
    val all = load() + (entry.partitionId -> entry)
    val root = mapper.createObjectNode()
    val arr = root.putArray("partitions")
    for (e <- all.values.toSeq.sortBy(_.partitionId)) {
      val n = arr.addObject()
      n.put("partitionId", e.partitionId)
      n.put("snapshotId", e.snapshotId)
      n.put("constraintHash", e.constraintHash)
      n.put("rowsScanned", e.rowsScanned)
      n.put("violations", e.violations)
      n.put("wallMs", e.wallMs)
    }
    if (file.getParent != null) Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object CheckpointManifest {
  /** Stable hash of the active constraint set — changing the suite
    * invalidates prior completions. */
  def constraintHash(constraintIds: Seq[String]): String =
    graft.io.Digests.sha8(constraintIds.sorted.mkString("\n"))
}
