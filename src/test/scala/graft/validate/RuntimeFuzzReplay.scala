package graft.validate

import com.fasterxml.jackson.databind.ObjectMapper
import graft.schema.CompiledSchema
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Campaign driver for the runtime differential fuzzer: replays every
  * block of a tools/fuzz_runtime_ref.py output file against the Spark
  * validator and prints one line per divergence plus a summary line.
  *
  * Usage: sbt "Test/runMain graft.validate.RuntimeFuzzReplay /tmp/rtfuzz.json"
  *
  * Exit 0 = full parity (crash-cases assert only that we complete
  * cleanly), exit 1 = divergences found (minimize by case id, fix, and
  * promote the minimized case into src/test/resources/runtime_fuzz/).
  */
object RuntimeFuzzReplay {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RuntimeFuzzReplay <fuzz.json> [maxReport]")
    val maxReport = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-runtime-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the generator is python json.dump, which emits bare NaN literals
    // for float('nan') data values — those are deliberate fixture values
    // (NaN==missing semantics), not malformed JSON
    val mapper = new ObjectMapper()
    mapper.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    val blocks = mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(args(0))))
      .elements().asScala.toList

    var nOk = 0
    var nCrashOk = 0
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[String]
    val ourCrashes = scala.collection.mutable.ArrayBuffer.empty[String]
    for (block <- blocks) {
      val schema = CompiledSchema.load(
        mapper.writeValueAsString(block.get("artifactInline")))
      for (t <- block.get("tests").elements().asScala) {
        val name = t.get("test").asText()
        val refCrashed = t.hasNonNull("crash")
        try {
          val out = CorpusReplay.runCase(spark, schema, t)
          if (refCrashed) nCrashOk += 1 // we completed where the reference crashed
          else if (out.ok) nOk += 1
          else mismatches += s"$name\n  ${out.describe}"
        } catch {
          case e: Exception =>
            // our engine must never crash on VALID artifacts over typed
            // data, even where the reference does
            ourCrashes += s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }
    }
    println(s"runtime-fuzz: ${nOk} parity-ok, ${nCrashOk} ref-crash-we-complete, " +
      s"${mismatches.size} mismatches, ${ourCrashes.size} our-crashes / ${blocks.size} cases")
    (mismatches.take(maxReport) ++ ourCrashes.take(maxReport)).foreach { m =>
      println(s"DIVERGE $m")
    }
    if (mismatches.nonEmpty || ourCrashes.nonEmpty) sys.exit(1)
  }
}
