package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nFailed = 0
    // the stale-output guard must FAIL LOUD: a silently-failed delete
    // (ignored boolean, null listFiles on I/O error) would leave the
    // previous round's parquet for the driver to compare — a false green
    def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) {
        val children = f.listFiles()
        if (children == null && f.exists())
          throw new java.io.IOException(s"cannot list $f — stale-output guard bypassed")
        Option(children).getOrElse(Array.empty).foreach(deleteRecursively)
      }
      if (f.exists() && !f.delete())
        throw new java.io.IOException(s"failed to delete $f — stale output would survive")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      // stale-output guard: a query failing BEFORE its overwrite executes
      // must not leave the previous run's parquet in place — the driver
      // would compare stale results and report a false green
      deleteRecursively(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        nFailed += 1
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = graft.io.JsonText.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (nFailed > 0) {
      System.err.println(s"[verify] $nFailed quer${if (nFailed == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
