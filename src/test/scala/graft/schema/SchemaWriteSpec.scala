package graft.schema

import graft.SparkSuite
import scala.jdk.CollectionConverters._

/** Artifact write-out parity (`compiled.py:278-324` `to_dict` +
  * `kye.py:100-113` `write_compiled`): every corpus fixture artifact must
  * survive load -> write -> re-load with full structural equality, in both
  * JSON and YAML, and the written JSON must use the reference's collapsed
  * forms (singular `index`, bare-string single-edge keys, single-arg
  * command unwrapping).
  */
class SchemaWriteSpec extends SparkSuite {

  private def corpusArtifacts: Seq[(String, String)] = {
    val dir = new java.io.File(getClass.getResource("/corpus").toURI)
    dir.listFiles().filter(_.getName.endsWith(".kye.json")).toSeq.map { f =>
      f.getName -> java.nio.file.Files.readString(f.toPath)
    }
  }

  test("every corpus artifact round-trips through toJson and toYaml") {
    val artifacts = corpusArtifacts
    assert(artifacts.nonEmpty)
    for ((name, text) <- artifacts) {
      val original = CompiledSchema.fromJson(text)
      val viaJson = CompiledSchema.fromJson(original.toJson)
      assert(viaJson === original, s"$name: JSON round-trip drifted")
      val viaYaml = CompiledSchema.fromYaml(original.toYaml)
      assert(viaYaml === original, s"$name: YAML round-trip drifted")
    }
  }

  test("native types and compiled .kye artifacts round-trip too") {
    val native = CompiledSchema.nativeTypes
    assert(CompiledSchema.fromJson(native.toJson) === native)
    val schema = graft.parse.KyeParser.compile(
      """User {
        |  id: Number
        |  name: String
        |}""".stripMargin)
    assert(CompiledSchema.fromJson(schema.toJson) === schema)
  }

  test("written JSON uses the reference collapsed forms") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val single = CompiledSchema.fromJson(
      """{"models": {"M": {"index": "id", "edges": {
        |  "id": {"type": "Number"},
        |  "v": {"type": "String", "expr": [{"col": "v"}, {"len": null}], "many": true}}}}}""".stripMargin)
    val node = mapper.readTree(single.toJson)
    val m = node.get("models").get("M")
    assert(m.get("index").isTextual && m.get("index").asText() == "id",
      "one single-edge index collapses to a bare string under `index`")
    assert(!m.has("indexes"))
    val expr = m.get("edges").get("v").get("expr")
    assert(expr.get(0).get("col").isTextual, "single command arg unwraps from the array")
    assert(m.get("edges").get("v").get("many").asBoolean())
    assert(!m.get("edges").get("id").has("many") && !m.get("edges").get("id").has("none"),
      "false cardinality flags are omitted")
    assert(!node.has("types"), "empty types map omitted")

    val multi = CompiledSchema.fromJson(
      """{"models": {"M": {"indexes": ["a", ["b", "c"]], "edges": {
        |  "a": {"type": "Number"}, "b": {"type": "Number"}, "c": {"type": "Number"}}}}}""".stripMargin)
    val mm = mapper.readTree(multi.toJson).get("models").get("M")
    assert(!mm.has("index") && mm.has("indexes"))
    val idxs = mm.get("indexes").elements().asScala.toList
    assert(idxs.head.isTextual && idxs.head.asText() == "a")
    assert(idxs(1).isArray && idxs(1).size() == 2)
  }

  test("serialization preserves declaration order above the Map4 threshold") {
    // >4 entries: scala's Map1-Map4 preserve insertion incidentally, HashMap
    // does not — the regression the VectorMap change guards (the reference
    // writes declaration order: json.dumps with sort_keys=False,
    // kye.py:100-113)
    val edgeNames = Seq("zeta", "alpha", "mmm", "beta", "q7", "aaa", "omega")
    val edgesJson = edgeNames.map(n => s""""$n": {"type": "Number"}""").mkString(",\n")
    val modelNames = Seq("M9", "M1", "M5", "M3", "M7", "M2")
    val modelsJson = modelNames.map(m =>
      s""""$m": {"index": "zeta", "edges": {$edgesJson}}""").mkString(",")
    val schema = CompiledSchema.fromJson(s"""{"models": {$modelsJson}}""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(schema.toJson)
    assert(node.get("models").fieldNames().asScala.toSeq === modelNames,
      "model order must be declaration order")
    for (m <- modelNames)
      assert(node.get("models").get(m).get("edges").fieldNames().asScala.toSeq
        === edgeNames, s"edge order in $m must be declaration order")
    // and byte-stable across a full round-trip
    assert(CompiledSchema.fromJson(schema.toJson).toJson === schema.toJson)
  }

  test("YAML writer matches PyYAML byte-for-byte: '' empties, quoted numeric strings") {
    // reference-generated expectation (yaml.dump(raw, sort_keys=False) on
    // this exact artifact, PyYAML 6.0.3 in-sandbox): empty msg renders as
    // '' (not \"\"), the numeric-looking string constant \"123\" is
    // single-quoted so a YAML 1.1 reader keeps it a STRING, loc \"1:1\"
    // quotes (sexagesimal int) while \"-1:-1\" stays plain
    val schema = CompiledSchema.fromJson(
      """{"models": {"Modx": {"index": "id", "edges": {
        |  "id": {"type": "Number"},
        |  "e": {"type": "String", "none": true}},
        |  "assertions": [{"msg": "", "expr": [{"col": "e"}, {"eq": "123"}],
        |    "loc": "-1:-1"}], "loc": "1:1"}}}""".stripMargin)
    val expected =
      "models:\n  Modx:\n    index: id\n    edges:\n      id:\n        type: Number\n" +
        "      e:\n        type: String\n        none: true\n    assertions:\n" +
        "    - msg: ''\n      expr:\n      - col: e\n      - eq: '123'\n      loc: -1:-1\n" +
        "    loc: '1:1'\n"
    assert(schema.toYaml == expected)
    // round-trip keeps the quoted numeric string a STRING (the advice-item
    // regression: MINIMIZE_QUOTES used to emit 123 bare and reparse a Long)
    val re = CompiledSchema.fromYaml(schema.toYaml)
    assert(re.models("Modx").assertions.head.expr.exists(c => c.args == List("123")),
      re.toJson)
    assert(re.toYaml == expected)
  }
}
