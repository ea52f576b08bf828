package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSuite
import graft.schema.CompiledSchema

import scala.jdk.CollectionConverters._

/** Runtime differential-fuzz parity: replays reference-produced fixtures
  * (tools/fuzz_runtime_ref.py driving the kyepy pandas Loader over
  * generated (artifact, table) pairs) under `strictReferenceParity` and
  * requires the exact violation multiset + survivor count.
  *
  * Two checked-in corpora:
  *   - `regressions.json` — the minimized divergence cases the fuzz
  *     campaigns found (seeds 5001/5002, ~800 generated cases): the
  *     asymmetric pandas OR null rule (0037/0239), bool-is-int operands
  *     on arithmetic/comparisons (0154/0168), MOD-by-zero NaN
  *     (0156/0259), IEEE division by zero (0283), and dual-side
  *     index-conflict multiplicity (0198).
  *   - `corpus_seed5003.json` — a pinned-seed random corpus (60 cases)
  *     regenerable with
  *     `python3 tools/fuzz_runtime_ref.py gen <out> --n 60 --seed 5003`.
  *
  * Cases where the reference itself crashed (`crash` field) assert only
  * that our engine completes cleanly — the documented deviation class
  * (e.g. misaligned-label Series comparisons, mixed per-element array
  * verdicts).
  */
class RuntimeFuzzSpec extends SparkSuite {

  // the generator is python json.dump, which emits bare NaN literals for
  // float('nan') fixture values (deliberate NaN==missing probes)
  private val mapper = {
    val m = new ObjectMapper()
    m.enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
    m
  }

  private def resource(path: String): JsonNode = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try mapper.readTree(in) finally in.close()
  }

  private def replayFile(name: String): Unit = {
    val blocks = resource(s"/runtime_fuzz/$name").elements().asScala.toList
    for (block <- blocks; t <- block.get("tests").elements().asScala) {
      val testName = t.get("test").asText()
      test(s"$name :: $testName") {
        val schema = CompiledSchema.load(
          mapper.writeValueAsString(block.get("artifactInline")))
        val refCrashed = t.hasNonNull("crash")
        val out = CorpusReplay.runCase(spark, schema, t)
        // reference crash -> we must merely complete (runCase not throwing
        // IS the assertion); otherwise exact multiset parity
        if (!refCrashed) assert(out.ok, out.describe)
      }
    }
  }

  replayFile("regressions.json")
  replayFile("corpus_seed5003.json")
  // the hand-probe suite (r5 + r6): one case per empirically-verified
  // semantic (inline-vs-stacked logical args, bool-is-int dispatch, IEEE
  // div/mod zero paths, int64 literal typing, cross-type comparisons,
  // r6 int64-meets-int64 bitwise &/| incl. derived-int operands and raw
  // non-bool verdicts), goldens regenerable with
  // `python3 tools/fuzz_runtime_ref.py probes <out>`
  replayFile("probes_r6.json")
  // pinned-seed corpus from the EXTENDED generator (inline logical args,
  // bool arithmetic, cast-str round-trips, cross-type comparisons,
  // integer-typed columns): `gen <out> --n 60 --seed 6003`
  replayFile("corpus_seed6003.json")
  // pinned-seed corpus from the r6 UN-MASKED generator (int64-meets-int64
  // stacked &/| incl. derived-int operands and raw int verdicts):
  // `gen <out> --n 60 --seed 7003`; campaign seeds 7001/7002 (600 cases)
  // ran at full parity before pinning
  replayFile("corpus_seed7003.json")
  // pinned-seed corpus from the r6 shape-BROADENED generator (multi-model
  // artifacts with name-shadowing second models, 15% per-element list
  // assertions, title-renamed implicit-cast columns): `gen <out> --n 60
  // --seed 7103`. Campaign seeds 7101/7102 (600 cases) found ONE real
  // divergence (null list cells under stacked-VAL alignment — promoted to
  // regressions.json as case 0213) and run at full parity after the fix.
  replayFile("corpus_seed7103.json")
}
