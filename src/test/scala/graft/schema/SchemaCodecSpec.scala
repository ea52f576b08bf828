package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class SchemaCodecSpec extends AnyFunSuite {

  test("parses the native-types coercion table") {
    val s = CompiledSchema.nativeTypes
    assert(s.types.keySet == Set("String", "Number", "Boolean"))
    val cast = s.types("String").edges("Number")
    assert(cast.expr.contains(List(Cmd(Op.CAST, List("float")))))
    assert(s.types("String").edges("length").expr.contains(List(Cmd(Op.LEN, Nil))))
  }

  test("parses index vs indexes, string vs list entries") {
    val s = CompiledSchema.fromJson(
      """{"models": {
        |  "A": {"index": "id", "edges": {"id": {"type": "Number"}}},
        |  "B": {"indexes": ["id", ["y", "m"]],
        |        "edges": {"id": {"type": "Number"}, "y": {"type": "Number"}, "m": {"type": "Number"}}}
        |}}""".stripMargin)
    assert(s.models("A").indexes == List(List("id")))
    assert(s.models("B").indexes == List(List("id"), List("y", "m")))
    assert(s.models("B").index == List("id", "y", "m"))
  }

  test("parses command shorthands: bare op, {op: arg}, {op: [args]}, {op: null}") {
    val s = CompiledSchema.fromJson(
      """{"models": {"M": {"index": "id",
        |  "edges": {"id": {"type": "Number"}, "b": {"type": "Boolean"}},
        |  "assertions": [{"msg": "", "expr": [
        |     {"col": "b"}, "not", {"eq": ["x"]}, {"and": null}]}]}}}""".stripMargin)
    val expr = s.models("M").assertions.head.expr
    assert(expr == List(
      Cmd(Op.COL, List("b")), Cmd(Op.NOT, Nil), Cmd(Op.EQ, List("x")), Cmd(Op.AND, Nil)))
    assert(expr.map(_.numStackArgs) == List(0, 1, 1, 2))
  }

  test("edge cardinality encoding") {
    val s = CompiledSchema.fromJson(
      """{"models": {"M": {"index": "id", "edges": {
        |  "id": {"type": "Number"},
        |  "a": {"type": "Number", "none": true},
        |  "b": {"type": "Number", "many": true},
        |  "c": {"type": "Number", "none": true, "many": true}}}}}""".stripMargin)
    val m = s.models("M")
    assert(m.edges("id").cardinality == "one")
    assert(m.edges("a").cardinality == "maybe")
    assert(m.edges("b").cardinality == "more")
    assert(m.edges("c").cardinality == "many")
  }

  test("assertion edge extraction (COL scan, first-occurrence distinct)") {
    val a = Assertion("M", "", List(
      Cmd(Op.COL, List("x")), Cmd(Op.COL, List("y")), Cmd(Op.GT, Nil),
      Cmd(Op.COL, List("x")), Cmd(Op.DEF, Nil), Cmd(Op.AND, Nil)), None)
    assert(a.edges == List("x", "y"))
  }

  test("yaml artifacts parse too") {
    val s = CompiledSchema.fromYaml(
      """models:
        |  M:
        |    index: id
        |    edges:
        |      id: {type: Number}
        |""".stripMargin)
    assert(s.models("M").edges("id").tpe == "Number")
  }
}
