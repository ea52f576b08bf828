package graft.parse

import graft.schema.CompiledSchema
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Differential-fuzz regression gate (offline replay).
  *
  * The live campaign byte-compared `KyeParser.compile(...).toJson/toYaml`
  * against the reference compiler (`kye -c`, via tools/fuzz_ref.py) over
  * 2,464 seeded schemas to zero divergences; this spec pins a 96-case
  * corpus of reference outputs (src/test/resources/fuzz, seed 20260817;
  * regenerated r6 after the late-alias generator extension — 18 cases
  * exercise the accumulated-refs reject path)
  * so the parity holds without the reference being present.
  */
class KyeParserFuzzSpec extends AnyFunSuite {

  private val PinnedSeed = 20260817L
  private val PinnedCount = 96

  private def resource(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/fuzz/$name")
    if (in == null) None
    else Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
  }

  private lazy val pinned: IndexedSeq[String] =
    SchemaFuzzer.generate(PinnedSeed, PinnedCount)

  test("generator is stable: pinned seed reproduces the checked-in corpus") {
    pinned.zipWithIndex.foreach { case (src, i) =>
      val base = f"$i%04d"
      val kye = resource(s"$base.kye").getOrElse(fail(s"missing $base.kye"))
      assert(src == kye,
        s"SchemaFuzzer output for case $base drifted from the checked-in corpus — " +
          "if the generator changed intentionally, regenerate src/test/resources/fuzz " +
          "(FuzzHarness + tools/fuzz_ref.py, see its README)")
    }
  }

  test("pinned corpus: compile output is byte-identical to the reference (JSON + YAML)") {
    pinned.indices.foreach { i =>
      val base = f"$i%04d"
      val src = pinned(i)
      resource(s"$base.ref.err") match {
        case Some(_) =>
          assert(KyeParser.compileEither(src).isLeft, s"$base: reference rejected, we accepted")
        case None =>
          val schema = KyeParser.compileEither(src).fold(
            errs => fail(s"$base: we rejected what the reference compiled: ${errs.head.msg}"),
            identity)
          val refJson = resource(s"$base.ref.json").getOrElse(fail(s"missing $base.ref.json"))
          val refYaml = resource(s"$base.ref.yaml").getOrElse(fail(s"missing $base.ref.yaml"))
          assert(schema.toJson == refJson, s"$base: JSON byte divergence")
          assert(schema.toYaml == refYaml, s"$base: YAML byte divergence")
      }
    }
  }

  test("500-case sweep: no crashes, and loadable artifacts round-trip byte-exactly") {
    val cases = SchemaFuzzer.generate(987654321L, 500)
    var ok = 0; var rejected = 0; var unreloadable = 0
    cases.zipWithIndex.foreach { case (src, i) =>
      KyeParser.compileEither(src) match { // any Throwable other than a clean Either = failure
        case Left(_) => rejected += 1
        case Right(schema) =>
          ok += 1
          val json = schema.toJson
          // the reference compiler can emit artifacts its own loader
          // rejects (e.g. {"not": true} — signature checks run on LOAD
          // only); where the artifact IS loadable, the round-trip must be
          // a byte fixpoint
          scala.util.Try(CompiledSchema.fromJson(json)).toOption match {
            case Some(re) => assert(re.toJson == json, s"case $i: round-trip not a fixpoint")
            case None => unreloadable += 1
          }
      }
    }
    assert(ok > 400, s"generator envelope collapsed: ok=$ok rejected=$rejected")
    info(s"500-case sweep: ok=$ok rejected=$rejected unreloadable-by-design=$unreloadable")
  }
}
