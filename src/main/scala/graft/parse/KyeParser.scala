package graft.parse

import graft.schema._

/** `.kye` DSL front-end: text → [[CompiledSchema]].
  *
  * Re-implements the reference compile chain (kyepy: lark grammar
  * `kye/parse/grammar.lark`, AST transformer `kye/parse/parser.py`,
  * `kye/parse/desugar.py`, `kye/type/type_builder.py`,
  * `kye/type/compiler.py`) as a hand-rolled lexer + recursive-descent
  * parser producing the same compiled-artifact structures. Scope matches
  * what the reference actually executes: model defs with indexes, typed /
  * const / enum / regex edges with cardinality and titles, type aliases,
  * `assert` statements, and the expression operators wired in
  * `TOKEN_TO_OP` (`type_builder.py:10-24`). Constructs the reference
  * parses but raises `NotImplementedError` on (`.edge` access, calls other
  * than `matches`, edge blocks, `if`/`operation`) are rejected here with
  * the same intent (SURVEY §2.4-W5).
  */
object KyeParser {

  /** Character-span location: 1-based line plus [start, end) offsets into
    * the source (the reference tracks token positions the same way,
    * `compilation_errors.py:12-27`). */
  final case class Loc(line: Int, start: Int, end: Int, col: Int = -1) {
    /** Reference `str(loc)` form ("line:col", 1-based; desugar-synthesized
      * nodes carry the NULL_LOCATION "-1:-1", kyepy expressions.py). */
    def ref: String = s"$line:$col"
  }

  /** Reference NULL_LOCATION: locs of desugar-synthesized assertions. */
  val NullLoc: Loc = Loc(-1, 0, 0, -1)

  final case class ParseError(message: String, line: Int)
    extends RuntimeException(s"line $line: $message")

  /** One collected compile error. */
  final case class CompileError(msg: String, loc: Loc)

  /** All errors from one compile, message pre-rendered with
    * source-highlighted spans (parity with the reference's
    * `CompilationErrorReporter.report`, `compilation_errors.py:24-67`). */
  final case class CompileException(errors: List[CompileError], rendered: String)
    extends RuntimeException(rendered)

  /** Reference `highlight()` format:
    * {{{
    * Error: <msg>
    *  <line> | <source line>
    *           ^^^^
    * }}} */
  def renderErrors(source: String, errors: Seq[CompileError]): String =
    errors.map { e =>
      val start = math.min(math.max(e.loc.start, 0), math.max(source.length - 1, 0))
      val lineStart = source.lastIndexOf('\n', math.max(start - 1, 0)) + 1
      val lineEnd0 = source.indexOf('\n', lineStart)
      val lineEnd = if (lineEnd0 == -1) source.length else lineEnd0
      val prefix = s" ${e.loc.line} | "
      val errLen = math.max(math.min(e.loc.end - start, lineEnd - start), 1)
      s"Error: ${e.msg}\n" +
        prefix + source.substring(lineStart, lineEnd) + "\n" +
        " " * (prefix.length + (start - lineStart)) + "^" * errLen
    }.mkString("\n")

  /** Compile with multi-error collection: the parser recovers at statement
    * boundaries (panic-mode sync) so one bad schema reports every syntax
    * error, like the reference's lark `on_error` path
    * (`parser.py:234-269`). */
  def compileEither(source: String): Either[List[CompileError], CompiledSchema] = {
    val reporter = new Reporter
    val toks = Lexer.tokenize(source, reporter)
    val stmts = new Parser(toks, reporter).parseStatements()
    if (reporter.errors.nonEmpty) Left(reporter.errors.toList)
    else
      // semantic (desugar/builder) failures surface as reported compile
      // errors too — a user typo must never escape as a raw stack trace
      try Right(Builder.build(Desugar.run(stmts)))
      catch {
        case ParseError(msg, line) =>
          Left(List(CompileError(msg, locOfLine(source, line))))
        case e: IllegalArgumentException =>
          Left(List(CompileError(e.getMessage, Loc(1, 0, 0))))
      }
  }

  /** Loc spanning the whole given 1-based source line (for errors that
    * only carry a line number). */
  private def locOfLine(source: String, line: Int): Loc = {
    var start = 0
    var l = 1
    while (l < line && start < source.length) {
      val nl = source.indexOf('\n', start)
      if (nl == -1) l = line else { start = nl + 1; l += 1 }
    }
    val end0 = source.indexOf('\n', start)
    Loc(line, start, if (end0 == -1) source.length else end0)
  }

  def compile(source: String): CompiledSchema =
    compileEither(source) match {
      case Right(s) => s
      case Left(errs) => throw CompileException(errs, renderErrors(source, errs))
    }

  /** Collects errors; adjacent same-message spans merge
    * (`compilation_errors.py:46-52`). Our Loc ends are EXCLUSIVE while the
    * reference's are inclusive, so its `last.end >= start - 1` translates
    * to `last.loc.end >= loc.start` — with `- 1` two same-message errors
    * separated by one good character would merge here but report as two in
    * the reference. */
  final class Reporter {
    val errors = scala.collection.mutable.ListBuffer.empty[CompileError]
    def report(msg: String, loc: Loc): Unit =
      errors.lastOption match {
        case Some(last) if last.msg == msg && last.loc.end >= loc.start =>
          errors(errors.length - 1) = last.copy(loc = last.loc.copy(end = loc.end))
        case _ => errors += CompileError(msg, loc)
      }
  }

  // ---- tokens ---------------------------------------------------------------

  sealed trait Tok { def loc: Loc; def line: Int = loc.line }
  final case class TType(name: String, loc: Loc) extends Tok
  final case class TEdge(name: String, loc: Loc) extends Tok
  final case class TNum(value: Double, loc: Loc) extends Tok
  final case class TStr(value: String, loc: Loc) extends Tok
  final case class TBool(value: Boolean, loc: Loc) extends Tok
  final case class TRegex(pattern: String, loc: Loc) extends Tok
  final case class TPunct(text: String, loc: Loc) extends Tok
  final case class TEof(loc: Loc) extends Tok

  object Lexer {
    def tokenize(src: String, reporter: Reporter): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      var line = 1
      var lineStart = 0 // offset of the current line's first char (col = 1-based)
      var tokStart = 0
      var tokLine = 1
      var tokCol = 1
      var prev: Tok = TEof(Loc(0, 0, 0)) // previous significant token (sign disambiguation)
      def loc(): Loc = Loc(tokLine, tokStart, i, tokCol)
      def push(t: Tok): Unit = { out += t; prev = t }
      def isValueEnd(t: Tok): Boolean = t match {
        // `assert` is the reference's ASSERT keyword terminal, after which
        // the LALR state expects an expression — so a directly-attached
        // sign starts a NUMBER there (`assert +489 == x`), never a binary op
        case TEdge("assert", _) => false
        case _: TNum | _: TStr | _: TBool | _: TRegex | _: TEdge | _: TType => true
        case TPunct(")" | "]" | "}", _) => true
        case _ => false
      }
      while (i < src.length) {
        val c = src(i)
        tokStart = i; tokLine = line; tokCol = i - lineStart + 1
        if (c == '\n') { line += 1; i += 1; lineStart = i }
        else if (c == ',') {
          // comma is a soft delimiter but DOES end the previous value, so a
          // following `/…/` lexes as a regex (e.g. `matches(name, /a+/)`),
          // not as division
          i += 1; prev = TPunct(",", Loc(line, i - 1, i))
        }
        else if (c.isWhitespace) i += 1
        else if (c == '#') { while (i < src.length && src(i) != '\n') i += 1 }
        else if (c == '"') {
          // escapes keep the lexeme RAW (reference parser.py:128 takes
          // token.lexeme[1:-1] with no unescaping, so "a\nb" is the
          // 4-char string a,backslash,n,b); a backslash still shields the
          // following char from terminating the string (lark
          // ESCAPED_STRING) — but the terminal's inner /.*?/ has no
          // DOTALL, so a string can never span a real newline: stop there
          // and report, exactly like the regex terminal
          val sb = new StringBuilder; i += 1
          while (i < src.length && src(i) != '"' && src(i) != '\n') {
            if (src(i) == '\\' && i + 1 < src.length && src(i + 1) != '\n') {
              sb.append(src(i)); sb.append(src(i + 1)); i += 2
            } else { sb.append(src(i)); i += 1 }
          }
          if (i >= src.length || src(i) != '"') reporter.report("Unterminated string", loc())
          else i += 1
          push(TStr(sb.toString, loc()))
        }
        else if (c == '/' && !isValueEnd(prev)) { // regex (never after a value)
          // no escape handling BY PARITY: the reference terminal is
          // `"/" /.*?/ "/"` (grammar.lark:96) — lazy up to the first
          // slash, so `\/` is not expressible there either
          // the reference terminal's `.` cannot match a newline, so a
          // regex never spans lines — consuming past \n here would
          // silently swallow the next statement and shift every later
          // error's line number
          val sb = new StringBuilder; i += 1
          while (i < src.length && src(i) != '/' && src(i) != '\n') { sb.append(src(i)); i += 1 }
          if (i >= src.length || src(i) != '/') reporter.report("Unterminated regex", loc())
          else i += 1
          push(TRegex(sb.toString, loc()))
        }
        else if (c.isDigit ||
            ((c == '-' || c == '+') && i + 1 < src.length && src(i + 1).isDigit &&
              !isValueEnd(prev))) {
          val start = i
          if (c == '-' || c == '+') i += 1
          while (i < src.length && (src(i).isDigit || src(i) == '.')) i += 1
          if (i < src.length && (src(i) == 'e' || src(i) == 'E')) {
            i += 1
            if (i < src.length && (src(i) == '+' || src(i) == '-')) i += 1
            while (i < src.length && src(i).isDigit) i += 1
          }
          // NUMBER literals always become floats (kyepy parser.py:123-124)
          val text = src.substring(start, i)
          val value =
            try text.toDouble
            catch { case _: NumberFormatException =>
              reporter.report(s"Invalid number literal '$text'", loc()); 0.0
            }
          push(TNum(value, loc()))
        }
        else if (c.isUpper) {
          // reference TYPE terminal: /[A-Z]+[a-z][a-zA-Z0-9]*/ — NO
          // underscore, and at least one lowercase letter is REQUIRED
          // (`M` or `ABC` alone is 'Unexpected character' in the
          // reference lexer [verified by execution: `M(id)` fails]).
          // lark prefix-matches, so `Abc_x` lexes TYPE(Abc) + EDGE(_x).
          val start = i
          while (i < src.length && src(i).isLetterOrDigit) i += 1
          val w = src.substring(start, i)
          if (w == "TRUE") push(TBool(true, loc()))
          else if (w == "FALSE") push(TBool(false, loc()))
          else {
            // longest valid TYPE prefix: [A-Z]+ then [a-z] then [a-zA-Z0-9]*
            var caps = 0
            while (caps < w.length && w(caps).isUpper) caps += 1
            if (caps < w.length && w(caps).isLower) push(TType(w, loc()))
            else {
              i = start + 1 // resync one char in, like the reference lexer
              reporter.report("Unexpected character", Loc(tokLine, start, start + 1, tokCol))
            }
          }
        }
        else if (c.isLower || c == '_') {
          val start = i
          while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
          push(TEdge(src.substring(start, i), loc()))
        }
        else {
          val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
          if (Set("!=", "==", ">=", "<=").contains(two)) { i += 2; push(TPunct(two, loc())) }
          else if ("(){}[]:|&^!~<>+-*/?%.".contains(c)) { i += 1; push(TPunct(c.toString, loc())) }
          else {
            // record and skip — keep lexing so later errors surface too
            i += 1
            reporter.report("Unexpected character", loc())
          }
        }
      }
      tokStart = math.max(src.length - 1, 0); tokLine = line
      out += TEof(Loc(line, math.max(src.length - 1, 0), src.length))
      out.result()
    }
  }

  // ---- AST ------------------------------------------------------------------

  sealed trait Expr
  final case class ELit(value: Any) extends Expr                       // Double | String | Boolean
  final case class ERegex(pattern: String) extends Expr
  final case class ETypeId(name: String) extends Expr
  final case class EEdgeId(name: String) extends Expr
  final case class EBinary(op: String, left: Expr, right: Expr) extends Expr
  final case class EUnary(op: String, right: Expr) extends Expr
  final case class ECall(callee: String, args: List[Expr]) extends Expr

  sealed trait Stmt
  final case class SModel(name: String, indexes: List[List[String]],
                          body: List[Stmt], loc: Loc) extends Stmt
  final case class SType(name: String, expr: Expr, loc: Loc) extends Stmt
  final case class SEdge(name: String, title: Option[String], cardinality: Option[Char],
                         expr: Expr, loc: Loc) extends Stmt
  final case class SAssert(expr: Expr, loc: Loc) extends Stmt

  // ---- parser ----------------------------------------------------------------

  /** Recursive-descent parser with panic-mode recovery: a syntax error is
    * recorded in the [[Reporter]] and the parser re-synchronizes at the
    * next plausible statement boundary, so one pass reports every error in
    * the schema (reference behavior: lark error callback + reporter,
    * `parser.py:250-269`). */
  final class Parser(toks: Vector[Tok], reporter: Reporter) {
    private var pos = 0
    // cursor clamps at TEof: an err() fired after next() consumed the
    // final token must still read a location, not walk off the array
    private def peek: Tok = toks(math.min(pos, toks.length - 1))
    private def next(): Tok = { val t = peek; pos += 1; t }
    private object Bail extends RuntimeException { override def fillInStackTrace(): Throwable = this }
    private def describe(t: Tok): String = t match {
      case TType(n, _) => s"type name '$n'"
      case TEdge(n, _) => s"'$n'"
      case TNum(v, _) => s"number $v"
      case TStr(v, _) => s"string \"$v\""
      case TBool(v, _) => s"$v"
      case TRegex(p, _) => s"regex /$p/"
      case TPunct(p, _) => s"'$p'"
      case _: TEof => "end of file"
    }
    private def err(msg: String): Nothing = {
      reporter.report(msg, peek.loc)
      throw Bail
    }
    /** Report at a specific (already-consumed) token — err() would point
      * at the FOLLOWING token and underline the wrong source position. */
    private def errAt(t: Tok, msg: String): Nothing = {
      reporter.report(msg, t.loc)
      throw Bail
    }
    // recursive-descent depth bound: hostile/generated input like
    // "("*50000 would otherwise StackOverflowError straight past the
    // CompileError machinery (the reference's LALR parser is iterative)
    private var depth = 0
    private def guarded[A](body: => A): A = {
      depth += 1
      try {
        if (depth > 200) err("expression nesting too deep (max 200)")
        body
      } finally depth -= 1
    }
    private def expect(p: String): Unit = peek match {
      case TPunct(`p`, _) => pos += 1
      case other => err(s"Expected '$p', found ${describe(other)}")
    }
    private def at(p: String): Boolean = peek match {
      case TPunct(`p`, _) => true; case _ => false
    }

    /** Skip to the next statement-ish token (always consuming >= 1). */
    private def synchronize(): Unit = {
      if (!peek.isInstanceOf[TEof]) pos += 1
      var go = true
      while (go) peek match {
        case _: TEof | _: TType | _: TEdge | TPunct("}", _) => go = false
        case _ => pos += 1
      }
    }

    def parseStatements(): List[Stmt] = {
      val out = List.newBuilder[Stmt]
      while (!peek.isInstanceOf[TEof])
        try out += parseStatement()
        catch { case Bail => synchronize() }
      out.result()
    }

    private def parseBlock(): List[Stmt] = guarded {
      // same depth bound as expressions: hostile "A{"*50000 block nesting
      // recurses parseStatement -> parseBlock -> parseStatement unguarded
      // otherwise and StackOverflowErrors past the CompileError machinery
      expect("{")
      val out = List.newBuilder[Stmt]
      while (!at("}") && !peek.isInstanceOf[TEof])
        try out += parseStatement()
        catch { case Bail => synchronize() }
      expect("}")
      out.result()
    }

    private def parseIndex(): List[String] = {
      expect("(")
      val out = List.newBuilder[String]
      while (!at(")")) next() match {
        case TEdge(n, _) => out += n
        case other => errAt(other, s"expected edge name in index, found ${describe(other)}")
      }
      expect(")")
      out.result()
    }

    private def parseStatement(): Stmt = peek match {
      case TType(name, line) =>
        pos += 1
        if (at(":")) { pos += 1; SType(name, parseExpr(), line) }
        else {
          val indexes = List.newBuilder[List[String]]
          while (at("(")) indexes += parseIndex()
          SModel(name, indexes.result(), parseBlock(), line)
        }
      case TEdge("assert", line) =>
        pos += 1; SAssert(parseExpr(), line)
      case TEdge("if" | "operation" | "null", _) =>
        err("if/operation/null statements are not supported (reference raises NotImplementedError too)")
      case TEdge(name, line) =>
        pos += 1
        val title = peek match {
          case TStr(s, _) => pos += 1; Some(s)
          case _ => None
        }
        // grammar allows indexes on edge defs (`edge_def: EDGE STRING?
        // index* CARDINALITY? …`, grammar.lark:23) — the reference parses
        // and silently DISCARDS them [verified by execution: `id(zz):
        // Number` compiles identically to `id: Number`]
        while (at("(")) parseIndex()
        val card = peek match {
          case TPunct(c @ ("*" | "?" | "+" | "!"), _) => pos += 1; Some(c.head)
          case _ => None
        }
        expect(":")
        SEdge(name, title, card, parseExpr(), line)
      case other => err(s"expected statement, found ${describe(other)}")
    }

    // precedence (loosest→tightest): | then ^ then & then comparison then
    // */% then +- then unary — NOTE the reference grammar nests add_exp
    // INSIDE mult_exp (grammar.lark:47-52), so +/- bind TIGHTER than '*'
    // and '/': `2 + 3 * 4` parses as `(2 + 3) * 4` [verified by execution]
    def parseExpr(): Expr = guarded(parseOr())
    private def parseOr(): Expr = binL(parseXor _, Set("|"))
    private def parseXor(): Expr = binL(parseAnd _, Set("^"))
    private def parseAnd(): Expr = binL(parseComp _, Set("&"))
    private def parseComp(): Expr = binL(parseMult _, Set("!=", "==", ">=", "<=", ">", "<"))
    private def parseMult(): Expr = binL(parseAdd _, Set("*", "/", "%"))
    private def parseAdd(): Expr = binL(parseUnary _, Set("+", "-"))

    private def binL(child: () => Expr, ops: Set[String]): Expr = {
      var left = child()
      var go = true
      while (go) peek match {
        case TPunct(op, _) if ops.contains(op) => pos += 1; left = EBinary(op, left, child())
        case _ => go = false
      }
      left
    }

    private def parseUnary(): Expr = peek match {
      case TPunct(op @ ("!" | "~"), _) => pos += 1; EUnary(op, guarded(parseUnary()))
      case _ => parseAtom()
    }

    private def parseAtom(): Expr = {
      val base: Expr = next() match {
        case TNum(v, _) => ELit(v)
        case TStr(v, _) => ELit(v)
        case TBool(v, _) => ELit(v)
        case TRegex(p, _) => ERegex(p)
        case TType(n, _) => ETypeId(n)
        case TEdge(n, _) => EEdgeId(n)
        case TPunct("(", _) => val e = parseExpr(); expect(")"); e
        case other => errAt(other, s"expected expression, found ${describe(other)}")
      }
      peek match {
        case TPunct("(", _) =>
          base match {
            case EEdgeId(callee) =>
              pos += 1
              val args = List.newBuilder[Expr]
              while (!at(")")) args += parseExpr()
              expect(")")
              ECall(callee, args.result())
            case _ => err("cannot call an expression")
          }
        case TPunct("." | "[" | "{", _) =>
          err(".edge access / filters / selects are not supported (reference raises NotImplementedError too)")
        case _ => base
      }
    }
  }

  // ---- desugar (kyepy desugar.py) ---------------------------------------------

  object Desugar {
    private val natives = Set("Boolean", "Number", "Integer", "String")

    def run(stmts: List[Stmt]): List[Stmt] = {
      // reference alias map (desugar.py visit_type): plain dict, LAST WINS
      // on redefinition [verified by execution: `Ca: "X"` then `Ca: "Y"`
      // compiles with "Y"]; native names ARE shadowable (`Number: "x"`
      // silently rewrites every later `: Number` edge — visit_type_identifier
      // consults the alias map BEFORE the native table)
      val aliases = scala.collection.mutable.Map[String, Expr]()
      var refs = scala.collection.mutable.Set.empty[String]

      /** The reference `Desugar.visit` value semantics, replicated exactly
        * [verified by execution]: visit RETURNS the substituted/folded view
        * of a node, but `visit_binary` never assigns the visited children
        * back — so a child's fold/substitution result is DISCARDED unless
        * an ANCESTOR materializes it: the root assignment (edge/assert/
        * alias), an unbroken literal-fold chain up to that root, or a
        * `visit_unary` in-place assignment (`unary_ast.right = visit(...)`
        * MUTATES the shared node, so `!!(\"a\" != \"b\") | x` compiles the
        * inner NOT to {not: true} even though the enclosing OR discards its
        * visited children). Modeled immutably as (view, mutated) pairs:
        * `view` is the visit return value, `mutated` is the node as the
        * reference's in-place mutations leave it. */
      def visit2(e: Expr): (Expr, Expr) = e match {
        case ETypeId(n) =>
          if (aliases.contains(n)) (aliases(n), e)
          else { if (!natives(n)) refs += n; (e, e) }
        case EEdgeId(n) => refs += n; (e, e)
        case EBinary(op, l, r) =>
          val (vl, ml) = visit2(l); val (vr, mr) = visit2(r)
          val mutated =
            if ((ml eq l) && (mr eq r)) e else EBinary(op, ml, mr)
          (vl, vr) match {
            case (ELit(a), ELit(b)) if FoldOps(op) => (ELit(pyFold(op, a, b)), mutated)
            case _ => (mutated, mutated)
          }
        case EUnary(op, r) =>
          val (vr, _) = visit2(r) // the VIEW is assigned in place
          val node = EUnary(op, vr)
          (node, node)
        case ECall(c, _) =>
          // no visit_call handler in the reference: the visit returns None
          // and the caller crashes on it (AttributeError) — clean error here
          throw new IllegalArgumentException(s"call '$c' is not supported in expressions")
        case lit => (lit, lit)
      }
      def visit(e: Expr): Expr = visit2(e)._1

      /** visit + ref collection (reference collect_refs, desugar.py:88-94).
        * PARITY: the reference returns the ACCUMULATED union
        * `previous | collected`, and visit_type aliases only when THAT is
        * empty — so a ref-free type statement appearing after any
        * ref-introducing statement (e.g. a model with edges) is NOT
        * inlined; it survives to the TypeBuilder, which rejects it (crash
        * class: `assert isinstance(value, typ.Type)` on literal bodies). */
      def collect(e: Expr): (Expr, Boolean) = {
        val saved = refs
        refs = scala.collection.mutable.Set.empty[String]
        val out = visit(e)
        refs = saved ++ refs
        (out, refs.nonEmpty)
      }

      val out = List.newBuilder[Stmt]
      val mutations = new Mutations
      for (s <- stmts) s match {
        case SType(name, expr0, line) =>
          val (expr, hasRefs) = collect(expr0)
          // ref-free expressions become macros (LAST wins); anything still
          // carrying refs (a model name, an edge name) survives to the
          // Builder, which rejects it like the reference TypeBuilder
          // (AssertionError/NotImplementedError — reject class)
          if (!hasRefs) aliases(name) = expr
          else out += SType(name, expr, line)
        case SModel(name, indexes, body, line) =>
          val newBody = List.newBuilder[Stmt]
          val extraAsserts = List.newBuilder[Stmt]
          for (b <- body) b match {
            case e @ SEdge(en, title, card, expr0, eline) =>
              val expr = visit(expr0)
              expr match {
                case ETypeId(_) => newBody += e.copy(expr = expr)
                case _ =>
                  // edge-expr → assertion + inferred type
                  // (desugar.py:37-71,121-129); synthesized assertions
                  // carry the reference NULL_LOCATION ("-1:-1")
                  val (assertExpr, tpe) = createAssertion(expr, en, mutations)
                  extraAsserts += SAssert(assertExpr, NullLoc)
                  newBody += SEdge(en, title, card, ETypeId(tpe), eline)
              }
            case SAssert(expr, aline) => newBody += SAssert(visit(expr), aline)
            case other => newBody += other
          }
          out += SModel(name, indexes, newBody.result() ++ extraAsserts.result(), line)
        case other => out += other
      }
      out.result()
    }

    // literal⊕literal constant folding with PYTHON operator semantics
    // (desugar.py:142-155 folds with the host language's operators,
    // verified by execution): only + - * / == != fold (comparisons and
    // logicals never do); strings concatenate under +, `str * bool`
    // repeats (bool is int), bools are ints (TRUE == 1 folds true,
    // TRUE + TRUE folds to the Python INT 2 — serialized "2", not "2.0");
    // mixed-type arithmetic raises like Python TypeError (reject class);
    // literal /0 is the reference's ZeroDivisionError (reject class).
    private val FoldOps = Set("+", "-", "*", "/", "==", "!=")

    private def pyNum(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case b: Boolean => Some(if (b) 1.0 else 0.0)
      case _ => None
    }
    private def isIntLike(v: Any): Boolean = v.isInstanceOf[Boolean]

    private def pyEq(a: Any, b: Any): Boolean = (pyNum(a), pyNum(b)) match {
      case (Some(x), Some(y)) => x == y
      case _ => (a, b) match {
        case (x: String, y: String) => x == y
        case _ => false // mixed str/number or str/bool: Python == is False
      }
    }

    private def pyFold(op: String, a: Any, b: Any): Any = {
      def typeErr(pyOp: String): Nothing = throw new IllegalArgumentException(
        s"unsupported operand types for $pyOp: $a, $b")
      def arith(f: (Double, Double) => Double, pyOp: String): Any =
        (pyNum(a), pyNum(b)) match {
          case (Some(x), Some(y)) =>
            val r = f(x, y)
            // Python int op int stays int (only bools are int-typed here)
            if (isIntLike(a) && isIntLike(b) && pyOp != "/") r.toLong else r
          case _ => typeErr(pyOp)
        }
      op match {
        case "==" => pyEq(a, b)
        case "!=" => !pyEq(a, b)
        case "+" => (a, b) match {
          case (x: String, y: String) => x + y
          case _ => arith(_ + _, "+")
        }
        case "-" => arith(_ - _, "-")
        case "*" => (a, b) match {
          case (x: String, y: Boolean) => if (y) x else "" // str * bool repeats
          case (x: Boolean, y: String) => if (x) y else ""
          case (_: String, _) | (_, _: String) => typeErr("*")
          case _ => arith(_ * _, "*")
        }
        case "/" =>
          (pyNum(a), pyNum(b)) match {
            case (Some(_), Some(y)) if y == 0.0 =>
              throw new IllegalArgumentException("division by zero in constant expression")
            case (Some(x), Some(y)) => x / y // Python 3 true division: always float
            case _ => typeErr("/")
          }
        case other => throw new IllegalStateException(s"unfoldable op $other")
      }
    }

    /** Per-compile store of create_assertion's IN-PLACE mutations of
      * logical Binary nodes, keyed by node IDENTITY (the reference
      * reassigns `expr.left`/`expr.right` on the shared AST objects,
      * desugar.py:53-56). Consequences replicated here [all verified by
      * execution]:
      *  - `!("a"|"b")` compiles to `edge != ((edge=="a")|(edge=="b"))` —
      *    the NOT branch reuses the already-mutated tree;
      *  - an ALIAS whose body contains a logical operator CRASHES the
      *    reference when used as the expr of a SECOND edge (or twice in
      *    one expr): the desugar macro map shares one tree, the first use
      *    mutates it, and re-running create_assertion on converted
      *    children hits 'Unable to resolve assertion' — reject class here.
      */
    private final class Mutations {
      private val m = new java.util.IdentityHashMap[AnyRef, (Expr, Expr)]()
      def get(b: EBinary): Option[(Expr, Expr)] = Option(m.get(b))
      def put(b: EBinary, l: Expr, r: Expr): Unit = m.put(b, (l, r))
      /** The node as the reference's mutations leave it. */
      def cur(e: Expr): Expr = e match {
        case b @ EBinary(op, l, r) => get(b) match {
          case Some((ml, mr)) => EBinary(op, ml, mr)
          case None =>
            val cl = cur(l); val cr = cur(r)
            if ((cl eq l) && (cr eq r)) b else EBinary(op, cl, cr)
        }
        case u @ EUnary(op, r) =>
          val cr = cur(r)
          if (cr eq r) u else EUnary(op, cr)
        case other => other
      }
    }

    /** `"a"` ⇒ `edge == "a"`; `/re/` ⇒ `matches(edge, re)`; `!x` ⇒
      * `edge != x`; logical ops distribute (desugar.py:37-71). */
    private def createAssertion(e: Expr, edge: String, mut: Mutations): (Expr, String) = e match {
      case ERegex(p) => (ECall("matches", List(EEdgeId(edge), ELit(p))), "String")
      case b @ EBinary(op @ ("|" | "&" | "^"), l0, r0) =>
        // operate on the CURRENT (possibly already-mutated) children —
        // a second pass over a mutated node recurses into conversion
        // results and raises, exactly like the reference
        val (l, r) = mut.get(b).getOrElse((l0, r0))
        val (le, lt) = createAssertion(l, edge, mut)
        val (re, rt) = createAssertion(r, edge, mut)
        require(lt == rt, s"mixed types in edge expression for $edge")
        mut.put(b, le, re)
        (EBinary(op, le, re), lt)
      case EUnary("!", r) =>
        val (_, rt) = createAssertion(r, edge, mut)
        (EBinary("!=", EEdgeId(edge), mut.cur(r)), rt)
      case ELit(v) =>
        (EBinary("==", EEdgeId(edge), e), litType(v))
      case other => throw new IllegalArgumentException(
        s"Unable to resolve assertion for $other")
    }

    def litType(v: Any): String = v match {
      case _: Boolean => "Boolean"
      case _: Double | _: Long => "Number" // Long: bool-arith fold results (Python ints)
      case _: String => "String"
      case o => throw new IllegalArgumentException(s"unknown literal $o")
    }
  }

  // ---- builder (type_builder.py + compiler.py) ----------------------------------

  object Builder {
    private val binOps = Map(
      "+" -> Op.ADD, "-" -> Op.SUB, "*" -> Op.MUL, "/" -> Op.DIV,
      "&" -> Op.AND, "|" -> Op.OR, "==" -> Op.EQ, "!=" -> Op.NE,
      ">" -> Op.GT, ">=" -> Op.GE, "<" -> Op.LT, "<=" -> Op.LE,
      // %/^ are grammar-only in the reference (no TokenType members,
      // SURVEY §2.4-W4); we wire them properly as a documented superset
      "%" -> Op.MOD)

    def build(stmts: List[Stmt]): CompiledSchema = {
      val natives = Set("Boolean", "Number", "Integer", "String")
      val models = scala.collection.mutable.LinkedHashMap[String, Model]()
      // duplicate MODEL names raise (reference TypeBuilder.define asserts,
      // type_builder.py:40-42 — models are the only statements that still
      // reach define(): desugar turned every ref-free type statement into
      // a macro, with LAST-wins redefinition [verified by execution]); a
      // model is DEFINED BEFORE its body is visited, so self-referential
      // edges (parent: Category) resolve. Natives ARE preloaded into the
      // reference's types dict, so a MODEL named `Number` asserts there —
      // while an ALIAS `Number: "x"` shadows freely in the desugar macro map
      val defined = scala.collection.mutable.Set[String]() ++ natives
      def define(name: String): Unit = {
        if (defined(name))
          throw new IllegalArgumentException(s"Model $name already defined")
        defined += name
      }
      // compile_edge emits ancestors[-1] (type/compiler.py:43-45): every
      // native subtype walks to its ROOT (Integer's parent is Number, so a
      // DSL `: Integer` edge compiles to type "Number" — integer-strict
      // validation is reachable only from hand-written artifacts, like the
      // reference). Model-typed edges (foreign-key style `author: User`)
      // resolve to the MODEL NAME verbatim — models are parentless types —
      // and, like the reference's in-order TypeBuilder, only models
      // already defined above the use site are visible.
      def rootType(name: String): String =
        if (natives(name)) (if (name == "Integer") "Number" else name)
        else if (defined(name)) name // model-typed (FK) edge — visible from its own body too
        else throw new IllegalArgumentException(s"Type $name not defined")
      for (s <- stmts) s match {
        // only type statements still carrying refs reach the Builder
        // (desugar macro-inlined the rest); the reference rejects them all
        // [verified by execution]: an unresolved/cyclic alias asserts
        // 'Type X not defined.' and an alias to a model name crashes
        // compile — reject class either way
        case SType(_, ETypeId(n), _) =>
          throw new IllegalArgumentException(s"Type $n not defined.")
        case SType(name, other, _) =>
          throw new IllegalArgumentException(s"unsupported type def $name: $other")
        case SModel(name, indexes, body, mloc) =>
          define(name) // raises on duplicates; visible to its own body
          val edges = scala.collection.mutable.LinkedHashMap[String, Edge]()
          val assertions = List.newBuilder[Assertion]
          for (b <- body) b match {
            // duplicate edge names are last-wins BY PARITY (the reference
            // Types.define is a plain dict assignment, types.py:108-113 —
            // it even appends a duplicate edge_order entry); duplicate
            // MODEL names, by contrast, raise — see above
            case SEdge(en, title, card, ETypeId(tn), eloc) =>
              val (none, many) = card match {
                case Some('!') => (false, false)
                case Some('?') => (true, false)
                case Some('+') => (false, true)
                case Some('*') => (true, true)
                case None => (false, false)
              }
              // empty titles are dropped on serialization anyway
              // (reference `if self.title:`, compiled.py:100) — keep the
              // raw Option here, the writer filters
              edges(en) = Edge(model = name, name = en, none = none, many = many,
                tpe = rootType(tn), title = title, expr = None, loc = Some(eloc.ref))
            case SEdge(en, _, _, other, _) =>
              throw new IllegalArgumentException(s"unsupported edge expr $en: $other")
            case SAssert(expr, aloc) =>
              // msg = "" BY PARITY: the reference compiler also emits
              // empty messages for DSL assertions (compiler.py:60
              // `msg=''`); non-empty msgs exist only in hand-written
              // artifacts. Desugar-synthesized assertions carry "-1:-1".
              assertions += Assertion(model = name, msg = "",
                expr = toPostfix(expr), loc = Some(aloc.ref))
            case other =>
              throw new IllegalArgumentException(s"unsupported model statement $other")
          }
          for (ix <- indexes.flatten)
            require(edges.contains(ix), s"Index $ix not defined in model $name")
          models(name) = Model(name, indexes,
            scala.collection.immutable.VectorMap.from(edges), assertions.result(),
            Some(mloc.ref))
        case SEdge(n, _, _, _, line) =>
          throw ParseError(s"edge '$n' outside a model", line.line)
        case SAssert(_, line) =>
          throw ParseError("assert outside a model", line.line)
      }
      CompiledSchema(Map.empty, scala.collection.immutable.VectorMap.from(models))
    }

    /** Intermediate Cmd TREE mirroring the reference TypeBuilder output
      * (typ.Cmd with child Cmds and plain literal args interleaved,
      * type_builder.py:131-186). */
    private final case class CTree(op: Op, kids: List[Any]) // Any = CTree | raw literal

    private def tree(e: Expr): CTree = e match {
      case ELit(v) => CTree(Op.VAL, List(v))
      case EEdgeId(n) => CTree(Op.COL, List(n))
      case ERegex(_) =>
        // TypeBuilder has no visit_regex: the visit returns None and the
        // parent crashes on it — reject class
        throw new IllegalArgumentException("bare regex in assertion")
      case ETypeId(n) => throw new IllegalArgumentException(s"type $n in expression")
      case EUnary("!", r) => CTree(Op.NOT, List(tree(r)))
      case EUnary(op, _) => throw new IllegalArgumentException(s"unary $op unsupported")
      case ECall("matches", List(obj, pat)) =>
        // desugar-synthesized matches(edge, "pat"): both arguments are
        // Cmd children; the VAL pattern inlines during flattening
        CTree(Op.MATCHES, List(tree(obj), tree(pat)))
      case ECall(c, _) => throw new IllegalArgumentException(s"call $c unsupported")
      case EBinary("^", l, r) =>
        // xor as (l | r) & !(l & r) — superset; the reference crashes on ^
        // (TOKEN_TO_OP has no XOR, type_builder.py:10-24 — SURVEY §2.4-W4)
        tree(EBinary("&", EBinary("|", l, r), EUnary("!", EBinary("&", l, r))))
      case EBinary(op, l, r) =>
        val opc = binOps.getOrElse(op,
          throw new IllegalArgumentException(s"operator $op unsupported"))
        CTree(opc, List(tree(l), tree(r)))
    }

    /** Exact port of the reference flattener (`compiler.py:65-75`,
      * compile_expr): every VAL child inlines into the parent's args —
      * REGARDLESS of position, so `5 < id` compiles to the same
      * [{col:id},{lt:5.0}] the reference emits (and both VMs then evaluate
      * id < 5: the artifact, not the source, is the contract) — plain
      * literal args (COL names) keep their place, and non-VAL children
      * flatten depth-first in child order. */
    private def flatten(t: CTree, out: scala.collection.mutable.ListBuffer[Cmd]): Unit = {
      val args = List.newBuilder[Any]
      for (k <- t.kids) k match {
        case c: CTree if c.op == Op.VAL => args += c.kids.head
        case c: CTree => flatten(c, out)
        case raw => args += raw
      }
      out += Cmd(t.op, args.result())
    }

    private def toPostfix(e: Expr): List[Cmd] = {
      val out = scala.collection.mutable.ListBuffer.empty[Cmd]
      flatten(tree(e), out)
      out.toList
    }
  }
}
