package graft.parse

import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Differential-fuzz driver (our side). Generates seeded schemas, compiles
  * each with [[KyeParser]], and writes per-case artifacts:
  *
  *   NNNN.kye        — the generated source
  *   NNNN.ours.json  — CompiledSchema.toJson (on success)
  *   NNNN.ours.yaml  — CompiledSchema.toYaml (on success)
  *   NNNN.ours.err   — first compile error (on rejection)
  *
  * `tools/fuzz_ref.py` then runs the reference compiler over the same
  * sources and byte-compares. Usage:
  *   sbt "Test/runMain graft.parse.FuzzHarness <seed> <count> <outDir>"
  */
object FuzzHarness {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: FuzzHarness <seed> <count> <outDir>")
    val seed = args(0).toLong
    val count = args(1).toInt
    val dir = Paths.get(args(2))
    Files.createDirectories(dir)
    val schemas = SchemaFuzzer.generate(seed, count)
    var ok = 0; var rejected = 0; var crashed = 0
    schemas.zipWithIndex.foreach { case (src, i) =>
      val base = f"$i%04d"
      write(dir.resolve(s"$base.kye"), src)
      try {
        KyeParser.compileEither(src) match {
          case Right(schema) =>
            write(dir.resolve(s"$base.ours.json"), schema.toJson)
            write(dir.resolve(s"$base.ours.yaml"), schema.toYaml)
            ok += 1
          case Left(errs) =>
            write(dir.resolve(s"$base.ours.err"), errs.head.msg)
            rejected += 1
        }
      } catch {
        case e: Throwable =>
          write(dir.resolve(s"$base.ours.err"), s"CRASH ${e.getClass.getSimpleName}: ${e.getMessage}")
          crashed += 1
      }
    }
    println(s"[fuzz-ours] $count cases -> ok=$ok rejected=$rejected CRASHED=$crashed in $dir")
  }

  private def write(p: Path, text: String): Unit =
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
}
