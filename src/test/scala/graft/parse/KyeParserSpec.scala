package graft.parse

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** The DSL front-end must compile every corpus schema to EXACTLY the
  * artifact the reference compiler produces (the hand-authored artifacts in
  * src/test/resources/corpus were verified by running the reference's own
  * loader against the golden expectations — see tests.json provenance). */
class KyeParserSpec extends AnyFunSuite {

  private def artifact(slug: String): CompiledSchema =
    CompiledSchema.fromJson(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/corpus/$slug.kye.json")).mkString)

  // corpus schemas verbatim from the reference tests/validation_tests.yaml
  private val schemas: Map[String, String] = Map(
    "multiindex" ->
      """User(id)(username) {
        |  id: Number
        |  username: String
        |}""".stripMargin,
    "composite_index" ->
      """Date(id)(year, month, day) {
        |  id: Number
        |  year: Number
        |  month: Number
        |  day: Number
        |}""".stripMargin,
    "conflicting_index_detection" ->
      """Employee(id1)(id2)(other) {
        |  id1: Number
        |  id2: Number
        |  other: String
        |}""".stripMargin,
    "conflicting_composite_index_detection" ->
      """Foo(ax,ay)(bx,by) {
        |  ax: Number
        |  ay: Number
        |  bx: Number
        |  by: Number
        |}""".stripMargin,
    "basic_schema_checks" ->
      """User(id) {
        |  id: Number
        |  admin: Boolean
        |  name?: String
        |}""".stripMargin,
    "required_columns" ->
      """User(id)(name) {
        |  id: Number
        |  name: String
        |  required: Boolean
        |}""".stripMargin,
    "optional_columns" ->
      """User(id) {
        |  id: Number
        |  optional?: Number
        |  many*: Number
        |}""".stripMargin,
    "multi_value_columns" ->
      """Post(id) {
        |  id: Number
        |  title: String
        |  author: String
        |  tags*: String
        |}""".stripMargin,
    "constant_type_aliases" ->
      """Alias1: "ALIAS_CONST"
        |Alias2: Alias1
        |Model(id) {
        |  id: Number
        |  direct_const?: "DIRECT_CONST"
        |  alias_const?: Alias2
        |}""".stripMargin,
    "logical_constants" ->
      """Model(id) {
        |  id: Number
        |  inline_enum: ("ENUM1" | "ENUM2") & !"ENUM3"
        |}""".stripMargin,
    "boolean_assertion" ->
      """Model(id) {
        |  id: Number
        |  bool: Boolean
        |  assert bool
        |  assert !!bool
        |}""".stripMargin,
    "regex" ->
      """Model(id) {
        |  id: Number
        |  regex: /a+/
        |}""".stripMargin)

  private def normalize(s: CompiledSchema): Map[String, (List[List[String]], Map[String, (Boolean, Boolean, String, Option[String])], Set[List[Cmd]])] =
    s.models.map { case (n, m) =>
      n -> ((m.indexes,
        m.edges.map { case (en, e) => en -> ((e.none, e.many, e.tpe, e.title)) },
        m.assertions.map(_.expr).toSet))
    }

  for ((slug, src) <- schemas.toSeq.sortBy(_._1)) {
    test(s"compiles $slug to the reference artifact") {
      val got = KyeParser.compile(src)
      val expected = artifact(slug)
      assert(normalize(got) == normalize(expected),
        s"\n got: ${normalize(got)}\n exp: ${normalize(expected)}")
    }
  }

  test("titles, comments, numbers, operator precedence, % superset") {
    val s = KyeParser.compile(
      """# a comment
        |User(id) {
        |  id "User Id": Number   # trailing comment
        |  assert id % 2.0 >= 0 & id * 2 - 1 < 100
        |}""".stripMargin)
    val m = s.models("User")
    assert(m.edges("id").title.contains("User Id"))
    val a = m.assertions.head.expr
    // the reference grammar nests add_exp INSIDE mult_exp, so +/- bind
    // TIGHTER than * and / [verified by execution]: `id * 2 - 1` is
    // `id * (2 - 1)`, whose literal SUB stays unfolded (the enclosing MUL
    // cannot fold, so only its view — discarded — saw the fold)
    assert(a == List(
      Cmd.one(Op.COL, "id"), Cmd(Op.MOD, List(2.0)), Cmd(Op.GE, List(0.0)),
      Cmd.one(Op.COL, "id"), Cmd(Op.SUB, List(2.0, 1.0)), Cmd(Op.MUL),
      Cmd(Op.LT, List(100.0)), Cmd(Op.AND)))
  }

  test("literal-left comparison inlines like the reference compiler (operand flip wart)") {
    val s = KyeParser.compile(
      """Mx(id) {
        |  id: Number
        |  assert 5 < id
        |}""".stripMargin)
    // compile_expr inlines EVERY VAL child regardless of position
    // (compiler.py:65-75), so `5 < id` and `id < 5` produce the SAME
    // artifact [verified by execution] — the artifact, which both VMs
    // then evaluate as id < 5, is the contract
    val a = s.models("Mx").assertions.head.expr
    assert(a == List(Cmd.one(Op.COL, "id"), Cmd(Op.LT, List(5.0))))
  }

  test("constant folding is visible only at fold-chain roots") {
    // (2+3)*1 folds in the VIEW, but visit_binary discards child results,
    // so a non-folding root keeps the ORIGINAL subtree [verified by
    // execution]: {add:[2,3]},{mul:1},{eq:[]}
    val s = KyeParser.compile(
      """Mx(id) {
        |  id: Number
        |  assert id == 2 + 3 * 1
        |}""".stripMargin)
    assert(s.models("Mx").assertions.head.expr ==
      List(Cmd.one(Op.COL, "id"), Cmd(Op.ADD, List(2.0, 3.0)),
        Cmd(Op.MUL, List(1.0)), Cmd(Op.EQ)))
    // ...while a root-level all-literal chain folds to a single VAL
    val s2 = KyeParser.compile(
      """Mx(id) {
        |  id: Number
        |  assert 2 + 3 * 1 == 5
        |}""".stripMargin)
    assert(s2.models("Mx").assertions.head.expr == List(Cmd(Op.VAL, List(true))))
  }

  test("unsupported constructs rejected like the reference") {
    intercept[Exception](KyeParser.compile("Mx(id) { id: Number\n if id { } }"))
    intercept[Exception](KyeParser.compile("Mx(id) { id: Number\n assert id.length }"))
    intercept[Exception](KyeParser.compile("Mx(id) { id: Number\n assert foo(id) }"))
  }

  test("compiled schema validates end-to-end (parser -> validator parity)") {
    // same schema via DSL and via artifact must behave identically
    val viaDsl = CompiledSchema.nativeTypes.merge(KyeParser.compile(
      """Model(id) {
        |  id: Number
        |  regex: /a+/
        |}""".stripMargin))
    val viaJson = CompiledSchema.load(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/corpus/regex.kye.json")).mkString)
    assert(viaDsl.models("Model").assertions.map(_.expr) ==
      viaJson.models("Model").assertions.map(_.expr))
  }

  test("multi-error recovery: one bad schema reports every syntax error with spans") {
    val src = """User(id) {
                |  id: Number
                |  name String
                |  age: ::
                |}
                |Order(oid) {
                |  oid @ Number
                |}""".stripMargin
    val errs = KyeParser.compileEither(src).left.getOrElse(Nil)
    assert(errs.length >= 3, s"expected >=3 errors, got: $errs")
    // spans point at the offending line/column
    val lines = errs.map(_.loc.line)
    assert(lines.contains(3), s"missing error on line 3 (name String): $lines")
    assert(lines.contains(4), s"missing error on line 4 (age: ::): $lines")
    assert(lines.contains(7), s"missing error on line 7 (oid @ Number): $lines")
    errs.foreach { e =>
      assert(e.loc.start >= 0 && e.loc.end >= e.loc.start)
      // column check: the span starts within its reported line
      val lineStart = src.lastIndexOf('\n', math.max(e.loc.start - 1, 0)) + 1
      assert(src.substring(0, lineStart).count(_ == '\n') + 1 == e.loc.line)
    }
    // rendered report carries the reference highlight format
    val rendered = KyeParser.renderErrors(src, errs)
    assert(rendered.contains("Error: "))
    assert(rendered.contains(" 3 | "), rendered)
    assert(rendered.linesIterator.exists(_.trim.matches("\\^+")), rendered)
    // compile() surfaces the same thing as one exception
    val ex = intercept[KyeParser.CompileException](KyeParser.compile(src))
    assert(ex.errors == errs)
  }

  test("multi-error recovery: lexer errors collected alongside parse errors") {
    val errs = KyeParser.compileEither("User(id) {\n  id\u00a7: Number\n  x: \u00b6\n}").left.getOrElse(Nil)
    assert(errs.exists(_.msg == "Unexpected character"), errs.toString)
    assert(errs.length >= 2, errs.toString)
  }

  test("valid schemas still compile after the recovery refactor") {
    assert(KyeParser.compileEither("User(id) { id: Number }").isRight)
  }

  test("errors at end-of-file report cleanly instead of walking off the token array") {
    // each of these used to IndexOutOfBounds when err() fired after next()
    // had consumed the final TEof
    for (src <- Seq("User { id:", "assert", "User (id", "User { id: Number")) {
      val errs = KyeParser.compileEither(src).left.getOrElse(Nil)
      assert(errs.nonEmpty, s"'$src' must report a CompileError, not crash")
      assert(errs.forall(e => e.loc.start >= 0 && e.loc.end <= src.length + 1))
    }
  }

  test("explicit matches() calls are rejected (reference Desugar has no visit_call)") {
    // the reference CRASHES on any user-written call — even `matches` —
    // because Desugar.visit_call is missing and the resulting None
    // dereferences [verified by execution]; matches() is reachable ONLY
    // via the regex edge-expr desugar. The regex argument must still LEX
    // as a regex (not division) so the error is about the call itself.
    val errs = KyeParser.compileEither(
      """Mx(id) {
        |  id: Number
        |  name: String
        |  assert matches(name, /a+b/)
        |}""".stripMargin).left.getOrElse(Nil)
    assert(errs.exists(_.msg.contains("call")), errs.map(_.msg).mkString("; "))
    assert(!errs.exists(_.msg.contains("Unterminated")), errs.map(_.msg).mkString("; "))
  }

  test("malformed number literals report instead of crashing the lexer") {
    val errs = KyeParser.compileEither("Mx(id) { id: Number\n assert id > 1.2.3 }")
      .left.getOrElse(Nil)
    assert(errs.exists(_.msg.contains("Invalid number literal")), errs.toString)
  }

  test("builder errors surface as CompileException, not raw stack traces") {
    val ex = intercept[KyeParser.CompileException](
      KyeParser.compile("Mx(id) { id: Undefined }"))
    assert(ex.errors.head.msg.contains("Undefined"))
    val ex2 = intercept[KyeParser.CompileException](
      KyeParser.compile("name: String"))
    assert(ex2.errors.head.msg.contains("outside a model"))
    assert(ex2.errors.head.loc.line == 1)
  }

  test("cyclic type aliases are a clean compile error, not an infinite loop") {
    // the reference asserts 'Type X not defined.' — a self/forward alias
    // records itself as a ref, survives desugar, and TypeBuilder's
    // visit_type_identifier rejects it [verified by execution]
    val self = KyeParser.compileEither("Ax: Ax\nMx(id) { id: Ax }").left.getOrElse(Nil)
    assert(self.exists(_.msg.contains("Type Ax not defined")), s"got $self")
    val mutual = KyeParser.compileEither("Ax: Bx\nBx: Ax\nMx(id) { id: Ax }").left.getOrElse(Nil)
    assert(mutual.exists(_.msg.contains("Type Bx not defined")), s"got $mutual")
  }

  test("strings cannot span a real newline (reference ESCAPED_STRING has no DOTALL)") {
    // lark's _STRING_INNER /.*?/ never matches a newline, so a string
    // containing one — shielded or not — is a lex error in the reference;
    // consuming past it here would mis-anchor every later error line
    val src = "Mx(id) {\n  id \"a\\\nb\": Number\n  assert id > 1.2.3\n}"
    val errs = KyeParser.compileEither(src).left.getOrElse(Nil)
    assert(errs.exists(_.msg.contains("Unterminated string")),
      errs.map(_.msg).mkString("; "))
  }

  test("hostile BLOCK nesting is also a clean compile error") {
    val deep = "Ab{" * 5000
    val e = intercept[KyeParser.CompileException](KyeParser.compile(deep))
    assert(e.errors.nonEmpty)
  }

  test("self-referential model edges resolve (model defined before its body)") {
    val c = KyeParser.compile("Category(id) {\n  id: Number\n  parent: Category\n}\n")
    assert(c.models("Category").edges("parent").tpe == "Category")
  }

  test("redefinition semantics match the reference [all verified by execution]") {
    // ALIAS redefinition is LAST-WINS (desugar macro map is a plain dict)
    val lastWins = KyeParser.compile(
      "Ca: \"X\"\nCa: \"Y\"\nModel(id) {\n  id: Number\n  e: Ca\n}\n")
    assert(lastWins.models("Model").assertions.head.expr
      .contains(Cmd(Op.EQ, List("Y"))), lastWins.toJson)
    // ALIASES shadow even the native types (visit_type_identifier consults
    // the macro map BEFORE the native table)
    val shadow = KyeParser.compile(
      "Number: \"x\"\nModel(id) {\n  id: Number\n}\n")
    assert(shadow.models("Model").edges("id").tpe == "String", shadow.toJson)
    assert(shadow.models("Model").assertions.head.expr
      .contains(Cmd(Op.EQ, List("x"))), shadow.toJson)
    // duplicate MODEL names raise (TypeBuilder.define asserts), and a
    // MODEL named after a preloaded native raises too
    val e1 = intercept[KyeParser.CompileException](KyeParser.compile(
      "Moda(id) {\n  id: Number\n}\nModa(id) {\n  id: String\n}\n"))
    assert(e1.errors.exists(_.msg.contains("already defined")), e1.rendered)
    val e2 = intercept[KyeParser.CompileException](KyeParser.compile(
      "Number(id) {\n  id: String\n}\n"))
    assert(e2.errors.exists(_.msg.contains("already defined")),
      "a model shadowing a preloaded native must raise: " + e2.rendered)
  }

  test("a logical-operator alias crashes the reference on its SECOND edge use") {
    // the desugar macro map shares ONE mutable tree; create_assertion
    // mutates logical Binary nodes in place, so the second edge re-runs it
    // over already-converted children and fails [verified by execution]
    val one = KyeParser.compile(
      "Ca: (\"A\" | \"B\")\nModel(id) {\n  id: Number\n  e: Ca\n}\n")
    assert(one.models("Model").assertions.nonEmpty)
    val e = intercept[KyeParser.CompileException](KyeParser.compile(
      "Ca: (\"A\" | \"B\")\nModel(id) {\n  id: Number\n  e: Ca\n  f: Ca\n}\n"))
    assert(e.errors.exists(_.msg.contains("Unable to resolve assertion")), e.rendered)
  }

  test("!(!(compound)) keeps the mutation visible through the discarded wrapper") {
    val c = KyeParser.compile(
      "Mx(id) {\n  id: Number\n  x: String\n  x: !(!(\"a\"|\"b\"))\n}\n")
    val ops = c.models("Mx").assertions.head.expr.map(_.op)
    import graft.schema.Op._
    // x != !((x=="a") | (x=="b")) — the inner binary is mutated in place
    // and stays visible through the reused unary wrapper
    assert(ops == List(COL, COL, EQ, COL, EQ, OR, NOT, NE),
      s"nested-mutation shape expected, got $ops")
  }

  // ---- r4 front-end sweep parity regressions --------------------------------

  test("model-typed edges compile to the model name (foreign-key style)") {
    val c = KyeParser.compile(
      "User(id) {\n  id: Number\n}\nPost(pid) {\n  pid: Number\n  author: User\n}\n")
    assert(c.models("Post").edges("author").tpe == "User",
      "reference compile_edge emits the model name verbatim")
  }

  test("Integer edges compile to Number (ancestors[-1] walk)") {
    val c = KyeParser.compile("Mx(id) {\n  id: Integer\n}\n")
    assert(c.models("Mx").edges("id").tpe == "Number",
      "native subtypes walk to the root ancestor like type/compiler.py:43-45")
    val via = KyeParser.compile("Foo: Integer\nMx(id) {\n  id: Foo\n}\n")
    assert(via.models("Mx").edges("id").tpe == "Number")
  }

  test("duplicate model names are a compile error, not last-wins") {
    val e = intercept[KyeParser.CompileException](
      KyeParser.compile("User(id) {\n  id: Number\n}\nUser(id) {\n  id: String\n}\n"))
    assert(e.errors.exists(_.msg.contains("already defined")), e.rendered)
  }

  test("!(compound) desugars through the reference's in-place mutation") {
    // desugar.py's create_assertion mutates a LOGICAL operand before
    // reusing it: x: !("a"|"b") => x != ((x=="a") | (x=="b"))
    val c = KyeParser.compile("Mx(id) {\n  id: Number\n  x: String\n  x: !(\"a\"|\"b\")\n}\n")
    val expr = c.models("Mx").assertions.head.expr
    val ops = expr.map(_.op)
    import graft.schema.Op._
    assert(ops == List(COL, COL, EQ, COL, EQ, OR, NE),
      s"mutated-operand shape expected, got $ops")
  }

  test("string literals keep escape sequences raw (reference lexeme[1:-1])") {
    val c = KyeParser.compile("Mx(id) {\n  id: Number\n  x: String\n  x: \"a\\nb\"\n}\n")
    val v = c.models("Mx").assertions.head.expr.collectFirst {
      case Cmd(Op.EQ, List(s: String)) => s
    }
    assert(v.contains("a\\nb"),
      s"4-char raw string a,backslash,n,b expected, got $v")
  }

  test("constant folding uses Python semantics") {
    // "a" + "b" folds to "ab" (string concat)
    val cat = KyeParser.compile("Mx(id) {\n  id: Number\n  x: String\n  x: \"a\" + \"b\"\n}\n")
    assert(cat.models("Mx").assertions.head.expr.exists {
      case Cmd(Op.EQ, List("ab")) => true; case _ => false
    }, "string concat must fold")
    // TRUE == 1 folds to true (Python bools are ints) — Scala Any-equality
    // would fold false, a silently different artifact
    val b = KyeParser.compile("Mx(id) {\n  id: Number\n  x: Boolean\n  x: TRUE == 1\n}\n")
    assert(b.models("Mx").assertions.head.expr.exists {
      case Cmd(Op.EQ, List(true)) => true; case _ => false
    }, s"TRUE == 1 must fold true: ${b.models("Mx").assertions.head.expr}")
    // division by a zero literal: clean compile error (reference crashes)
    val e = intercept[KyeParser.CompileException](
      KyeParser.compile("Mx(id) {\n  id: Number\n  x: Number\n  x: 1 / 0\n}\n"))
    assert(e.errors.exists(_.msg.contains("division by zero")), e.rendered)
  }

  test("hostile nesting is a clean compile error, not a StackOverflowError") {
    val deep = "Mx(id) {\n  id: Number\n  assert " + "(" * 5000 + "1" + ")" * 5000 + " == 1\n}\n"
    val e = intercept[KyeParser.CompileException](KyeParser.compile(deep))
    assert(e.errors.exists(_.msg.contains("nesting too deep")), e.rendered.take(500))
  }

  test("a regex cannot span lines; the unterminated slash reports, later statements survive") {
    val e = intercept[KyeParser.CompileException](KyeParser.compile(
      "Mx(id) {\n  id: Number\n  x: String\n  x: /ab\n  y: Number\n}\n"))
    assert(e.errors.exists(_.msg.contains("Unterminated regex")), e.rendered)
  }

  test("alias detection uses ACCUMULATED refs (desugar.py:88-94) [all verified by execution]") {
    // collect_refs returns `previous | collected`: once ANY statement has
    // introduced a ref, later ref-free type statements are NOT inlined —
    // they survive to the TypeBuilder, which crashes on literal bodies
    // (reference: bare AssertionError). Probed live 2026-08-17.
    val after = KyeParser.compileEither(
      "Mx(id) {\n  id: Number\n  assert id > 0\n}\nFoo: \"abc\"\nNx(k) {\n  k: Foo\n}")
    assert(after.isLeft, s"reference rejects (accumulated refs nonempty): $after")
    // ...but BEFORE any refs it is a macro, inlined into an edge assertion
    val before = KyeParser.compile(
      "Foo: \"abc\"\nMx(id) {\n  id: Number\n  assert id > 0\n}\nNx(k) {\n  k: Foo\n}")
    assert(before.models("Nx").edges("k").tpe == "String")
    assert(before.models("Nx").assertions.nonEmpty)
    // a model with ONLY native-typed edges introduces NO refs (the
    // reference's visit_type_identifier skips natives) — alias still works
    val plain = KyeParser.compile(
      "Mx(id) {\n  id: Number\n}\nFoo: \"abc\"\nNx(k) {\n  k: Foo\n}")
    assert(plain.models("Nx").edges("k").tpe == "String")
  }
}

