package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSuite
import graft.schema.CompiledSchema

import scala.jdk.CollectionConverters._

/** Ports the reference's YAML golden-error corpus
  * (kyepy `tests/validation_tests.yaml`, 12 unique feature blocks / 19
  * cases). The fixtures in `src/test/resources/corpus/` were produced by
  * running the reference's own pandas Loader over hand-authored compiled
  * artifacts and recording its exact flattened error rows + surviving row
  * counts (see tests.json provenance). Here each case is re-run on Spark
  * under `strictReferenceParity` and must reproduce the violation multiset
  * and survivor count exactly (replay machinery shared with the runtime
  * differential fuzzer in [[CorpusReplay]]).
  */
class GoldenCorpusSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private def resource(path: String): JsonNode = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try mapper.readTree(in) finally in.close()
  }

  private val blocks = resource("/corpus/tests.json").elements().asScala.toList

  for (block <- blocks) {
    val feature = block.get("feature").asText()
    val artifact = block.get("artifact").asText()
    val schema = CompiledSchema.load(
      scala.io.Source.fromInputStream(
        getClass.getResourceAsStream(s"/corpus/$artifact")).mkString)

    for (t <- block.get("tests").elements().asScala.toList) {
      val testName = t.get("test").asText()
      test(s"$feature :: $testName") {
        val out = CorpusReplay.runCase(spark, schema, t)
        assert(out.violationsMatch,
          s"violations mismatch\n got: ${out.got}\n exp: ${out.expected}")
        assert(out.aborted == out.expectedAborted,
          s"aborted=${out.aborted} expected=${out.expectedAborted}")
        assert(out.survivors == out.expectedSurvivors,
          s"survivors=${out.survivors} expected=${out.expectedSurvivors}")
      }
    }
  }
}
