package graft.io

/** Shared short-digest helper (lineage fingerprints in the checkpoint
  * manifest and the parquet snapshot stand-in use the same encoding). */
object Digests {
  /** First 8 bytes of SHA-256, hex. */
  def sha8(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(s.getBytes("UTF-8"))
    md.digest().take(8).map("%02x".format(_)).mkString
  }
}
