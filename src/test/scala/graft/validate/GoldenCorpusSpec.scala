package graft.validate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSuite
import graft.schema.CompiledSchema
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

import scala.jdk.CollectionConverters._

/** Ports the reference's YAML golden-error corpus
  * (kyepy `tests/validation_tests.yaml`, 12 unique feature blocks / 19
  * cases). The fixtures in `src/test/resources/corpus/` were produced by
  * running the reference's own pandas Loader over hand-authored compiled
  * artifacts and recording its exact flattened error rows + surviving row
  * counts (see tests.json provenance). Here each case is re-run on Spark
  * under `strictReferenceParity` and must reproduce the violation multiset
  * and survivor count exactly.
  */
class GoldenCorpusSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private def resource(path: String): JsonNode = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try mapper.readTree(in) finally in.close()
  }

  private def buildFixture(columns: JsonNode): DataFrame = {
    val specs = columns.elements().asScala.toList
    val fields = specs.map { c =>
      val kind = c.get("kind").asText()
      val base: DataType = kind match {
        case "number"  => DoubleType
        case "boolean" => BooleanType
        case _         => StringType
      }
      val dt = if (c.get("isList").asBoolean()) ArrayType(base) else base
      StructField(c.get("name").asText(), dt, nullable = true)
    }
    def conv(kind: String, v: JsonNode): Any = kind match {
      case "number"  => v.asDouble()
      case "boolean" => v.asBoolean()
      case _         => v.asText()
    }
    val nRows = specs.head.get("values").size()
    val rows = (0 until nRows).map { i =>
      Row.fromSeq(specs.map { c =>
        val kind = c.get("kind").asText()
        val v = c.get("values").get(i)
        if (v == null || v.isNull) null
        else if (c.get("isList").asBoolean()) {
          if (v.isArray) v.elements().asScala.map(conv(kind, _)).toSeq
          else Seq(conv(kind, v))
        } else conv(kind, v)
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), StructType(fields))
  }

  private case class Vio(err: String, row: Option[Long], col: Option[String])

  private def sortedVios(vs: Seq[Vio]): Seq[(String, Long, String)] =
    vs.map(v => (v.err, v.row.getOrElse(-1L), v.col.getOrElse(""))).sorted

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
        val modelName = t.get("model").asText()
        val df = Validator.withRowIds(buildFixture(t.get("columns")))
        val validator = new Validator(schema, ValidatorConfig(strictReferenceParity = true))
        val result = validator.validate(modelName, df)

        val got = result.violations.collect().map { r =>
          Vio(r.getString(0),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getString(3)))
        }.toSeq
        val expected = t.get("goldenViolations").elements().asScala.map { g =>
          Vio(g.get("err").asText(),
            Option(g.get("row")).filterNot(_.isNull).map(_.asLong()),
            Option(g.get("col")).filterNot(_.isNull).map(_.asText()))
        }.toSeq

        assert(sortedVios(got) == sortedVios(expected),
          s"violations mismatch\n got: ${sortedVios(got)}\n exp: ${sortedVios(expected)}")

        val expectAborted = t.get("aborted").asBoolean()
        assert(result.survivors.isEmpty == expectAborted,
          s"aborted=${result.survivors.isEmpty} expected=$expectAborted")
        val expectSurvivors = t.get("survivorCount").asLong()
        val gotSurvivors = result.survivors.map(_.count()).getOrElse(0L)
        assert(gotSurvivors == expectSurvivors,
          s"survivors=$gotSurvivors expected=$expectSurvivors")
      }
    }
  }
}
