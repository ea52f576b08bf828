package graft.validate

import com.fasterxml.jackson.databind.JsonNode
import graft.schema.CompiledSchema
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Shared replay machinery for reference-produced validation fixtures:
  * the hand-curated golden corpus (GoldenCorpusSpec, from the
  * reference's validation_tests.yaml) and the runtime differential-fuzz
  * corpus (RuntimeFuzzSpec / RuntimeFuzzReplay, produced by
  * tools/fuzz_runtime_ref.py driving the reference pandas Loader over
  * generated cases). Both encode a case as (compiled artifact, typed
  * column data, golden flattened error rows, survivor count, aborted
  * flag) and must reproduce the reference's violation MULTISET and
  * survivor count exactly under `strictReferenceParity`. */
object CorpusReplay {

  final case class Vio(err: String, row: Option[Long], col: Option[String])

  final case class CaseOutcome(
      got: Seq[(String, Long, String)],
      expected: Seq[(String, Long, String)],
      aborted: Boolean,
      expectedAborted: Boolean,
      survivors: Long,
      expectedSurvivors: Long) {
    def violationsMatch: Boolean = got == expected
    def ok: Boolean = violationsMatch && aborted == expectedAborted &&
      survivors == expectedSurvivors
    def describe: String =
      s"violations got=${got.mkString(",")}\n  exp=${expected.mkString(",")}\n" +
        s"  aborted=$aborted/$expectedAborted survivors=$survivors/$expectedSurvivors"
  }

  /** Builds the fixture DataFrame from the corpus `columns` encoding:
    * kind (number -> double, boolean, else string), isList, values
    * (nulls allowed; scalar in a list cell wraps to a 1-element array,
    * matching the reference's pandas construction). One partition so
    * `withRowIds` assigns 0..n-1 in row order — the reference's
    * RangeIndex identity. */
  def buildFixture(spark: SparkSession, columns: JsonNode): DataFrame = {
    val specs = columns.elements().asScala.toList
    val fields = specs.map { c =>
      val kind = c.get("kind").asText()
      val base: DataType = kind match {
        case "number"  => DoubleType
        case "integer" => LongType // pandas int64 (generator emits no nulls)
        case "boolean" => BooleanType
        case _         => StringType
      }
      val dt = if (c.get("isList").asBoolean()) ArrayType(base) else base
      StructField(c.get("name").asText(), dt, nullable = true)
    }
    def conv(kind: String, v: JsonNode): Any = kind match {
      case "number"  => v.asDouble()
      case "integer" => v.asLong()
      case "boolean" => v.asBoolean()
      case _         => v.asText()
    }
    val nRows = if (specs.isEmpty) 0 else specs.head.get("values").size()
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

  private def sortedVios(vs: Seq[Vio]): Seq[(String, Long, String)] =
    vs.map(v => (v.err, v.row.getOrElse(-1L), v.col.getOrElse(""))).sorted

  /** Runs one corpus test block entry against the Spark validator and
    * returns both sides, sorted for multiset comparison. Throws whatever
    * the validator throws — callers decide whether a crash is expected
    * (fuzz cases where the reference itself crashed assert only that WE
    * complete cleanly). */
  def runCase(spark: SparkSession, schema: CompiledSchema, t: JsonNode): CaseOutcome = {
    val modelName = t.get("model").asText()
    val df = Validator.withRowIds(buildFixture(spark, t.get("columns")))
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

    CaseOutcome(
      got = sortedVios(got),
      expected = sortedVios(expected),
      aborted = result.survivors.isEmpty,
      expectedAborted = t.get("aborted").asBoolean(),
      survivors = result.survivors.map(_.count()).getOrElse(0L),
      expectedSurvivors = t.get("survivorCount").asLong())
  }
}
