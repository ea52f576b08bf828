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
  final case class Loc(line: Int, start: Int, end: Int)

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
      var tokStart = 0
      var tokLine = 1
      var prev: Tok = TEof(Loc(0, 0, 0)) // previous significant token (sign disambiguation)
      def loc(): Loc = Loc(tokLine, tokStart, i)
      def push(t: Tok): Unit = { out += t; prev = t }
      def isValueEnd(t: Tok): Boolean = t match {
        case _: TNum | _: TStr | _: TBool | _: TRegex | _: TEdge | _: TType => true
        case TPunct(")" | "]" | "}", _) => true
        case _ => false
      }
      while (i < src.length) {
        val c = src(i)
        tokStart = i; tokLine = line
        if (c == '\n') { line += 1; i += 1 }
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
          val start = i
          while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
          val w = src.substring(start, i)
          if (w == "TRUE") push(TBool(true, loc()))
          else if (w == "FALSE") push(TBool(false, loc()))
          else push(TType(w, loc()))
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
        val card = peek match {
          case TPunct(c @ ("*" | "?" | "+" | "!"), _) => pos += 1; Some(c.head)
          case _ => None
        }
        expect(":")
        SEdge(name, title, card, parseExpr(), line)
      case other => err(s"expected statement, found ${describe(other)}")
    }

    // precedence: | then ^ then & then comparison then +- then */% then unary
    def parseExpr(): Expr = guarded(parseOr())
    private def parseOr(): Expr = binL(parseXor _, Set("|"))
    private def parseXor(): Expr = binL(parseAnd _, Set("^"))
    private def parseAnd(): Expr = binL(parseComp _, Set("&"))
    private def parseComp(): Expr = binL(parseAdd _, Set("!=", "==", ">=", "<=", ">", "<"))
    private def parseAdd(): Expr = binL(parseMult _, Set("+", "-"))
    private def parseMult(): Expr = binL(parseUnary _, Set("*", "/", "%"))

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
    def run(stmts: List[Stmt]): List[Stmt] = {
      val aliases = scala.collection.mutable.Map[String, Expr]()

      def substitute(e: Expr): Expr = e match {
        case ETypeId(n) if aliases.contains(n) => aliases(n)
        case EBinary(op, l, r) => fold(EBinary(op, substitute(l), substitute(r)))
        case EUnary(op, r) => EUnary(op, substitute(r))
        case ECall(c, args) => ECall(c, args.map(substitute))
        case other => other
      }

      // literal⊕literal constant folding with PYTHON operator semantics
      // (desugar.py:142-155 folds with the host language's operators):
      // strings concatenate under +, bools are ints (TRUE == 1 folds
      // true), cross-type ==/!= compares numerically when both sides are
      // numeric and is False otherwise — Scala's Any-equality would fold
      // TRUE == 1 to false, a silently different artifact. Division by a
      // zero literal is a clean compile error (the reference crashes with
      // ZeroDivisionError); folds Python would TypeError on are left
      // unfolded and surface as "Unable to resolve assertion".
      def pyNum(v: Any): Option[Double] = v match {
        case d: Double => Some(d)
        case b: Boolean => Some(if (b) 1.0 else 0.0)
        case _ => None
      }
      def pyEq(a: Any, b: Any): Boolean = (pyNum(a), pyNum(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => (a, b) match {
          case (x: String, y: String) => x == y
          case _ => false // mixed str/number or str/bool: Python == is False
        }
      }
      def fold(e: EBinary): Expr = (e.left, e.right) match {
        case (ELit(a), ELit(b)) => e.op match {
          case "==" => ELit(pyEq(a, b))
          case "!=" => ELit(!pyEq(a, b))
          case "+" => (a, b) match {
            case (x: String, y: String) => ELit(x + y)
            case _ => (pyNum(a), pyNum(b)) match {
              case (Some(x), Some(y)) => ELit(x + y); case _ => e
            }
          }
          case "-" => (pyNum(a), pyNum(b)) match {
            case (Some(x), Some(y)) => ELit(x - y); case _ => e
          }
          case "*" => (pyNum(a), pyNum(b)) match {
            case (Some(x), Some(y)) => ELit(x * y); case _ => e
          }
          case "/" => (pyNum(a), pyNum(b)) match {
            case (Some(_), Some(y)) if y == 0.0 =>
              throw new IllegalArgumentException(
                "division by zero in constant expression")
            case (Some(x), Some(y)) => ELit(x / y); case _ => e
          }
          case _ => e
        }
        case _ => e
      }

      def hasRefs(e: Expr): Boolean = e match {
        case ETypeId(n) => !Set("Boolean", "Number", "Integer", "String").contains(n)
        case EEdgeId(_) => true
        case EBinary(_, l, r) => hasRefs(l) || hasRefs(r)
        case EUnary(_, r) => hasRefs(r)
        case ECall(_, args) => args.exists(hasRefs)
        case _ => false
      }

      val out = List.newBuilder[Stmt]
      for (s <- stmts) s match {
        case SType(name, expr0, line) =>
          val expr = substitute(expr0)
          // ref-free non-alias expressions are inlined (aliases map); a
          // plain alias (ETypeId) or anything still carrying refs
          // survives to the Builder
          if (!hasRefs(expr) && !expr.isInstanceOf[ETypeId]) aliases(name) = expr
          else out += SType(name, expr, line)
        case SModel(name, indexes, body, line) =>
          val newBody = List.newBuilder[Stmt]
          val extraAsserts = List.newBuilder[Stmt]
          for (b <- body) b match {
            case e @ SEdge(en, title, card, expr0, eline) =>
              val expr = substitute(expr0)
              expr match {
                case ETypeId(_) => newBody += e.copy(expr = expr)
                case _ =>
                  // edge-expr → assertion + inferred type (desugar.py:37-71,121-129)
                  val (assertExpr, tpe) = createAssertion(expr, en)
                  extraAsserts += SAssert(assertExpr, eline)
                  newBody += SEdge(en, title, card, ETypeId(tpe), eline)
              }
            case SAssert(expr, aline) => newBody += SAssert(substitute(expr), aline)
            case other => newBody += other
          }
          out += SModel(name, indexes, newBody.result() ++ extraAsserts.result(), line)
        case other => out += other
      }
      out.result()
    }

    /** `"a"` ⇒ `edge == "a"`; `/re/` ⇒ `matches(edge, re)`; `!x` ⇒
      * `edge != x`; logical ops distribute (desugar.py:37-71). */
    private def createAssertion(e: Expr, edge: String): (Expr, String) = e match {
      case ERegex(p) => (ECall("matches", List(EEdgeId(edge), ELit(p))), "String")
      case EBinary(op @ ("|" | "&" | "^"), l, r) =>
        val (le, lt) = createAssertion(l, edge)
        val (re, rt) = createAssertion(r, edge)
        require(lt == rt, s"mixed types in edge expression for $edge")
        (EBinary(op, le, re), lt)
      case EUnary("!", r) =>
        // reference parity (desugar.py:57-64, verified empirically): the
        // recursive create_assertion call MUTATES logical Binary nodes in
        // place (their left/right are reassigned) before `right=expr.right`
        // reuses the tree — so !("a"|"b") becomes
        // edge != ((edge=="a") | (edge=="b")). Fresh nodes built for
        // literal/regex operands ARE discarded, but a mutation nested
        // under a discarded wrapper (e.g. !(!("a"|"b"))) remains VISIBLE
        // through the reused tree — mutatedView mirrors exactly the nodes
        // the reference rewrites in place.
        val (_, rt) = createAssertion(r, edge)
        def mutatedView(e: Expr): Expr = e match {
          case b @ EBinary("|" | "&" | "^", _, _) => createAssertion(b, edge)._1
          case EUnary(op, inner) => EUnary(op, mutatedView(inner))
          case other => other
        }
        (EBinary("!=", EEdgeId(edge), mutatedView(r)), rt)
      case ELit(v) =>
        (EBinary("==", EEdgeId(edge), e), litType(v))
      case other => throw new IllegalArgumentException(
        s"Unable to resolve assertion for $other")
    }

    def litType(v: Any): String = v match {
      case _: Boolean => "Boolean"
      case _: Double => "Number"
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
      // alias-to-type statements surviving desugar: X: Number clones
      val typeAliases = scala.collection.mutable.Map[String, String]()
      val natives = Set("Boolean", "Number", "Integer", "String")
      // cycle-guarded: `A: A` (or A: B / B: A) must be a clean compile
      // error, not an infinite loop. (The reference terminates on cycles
      // by construction — visit_type resolves the parent BEFORE defining
      // the alias, so a self-reference is 'Type A not defined.',
      // type_builder.py:92-97,126-128; our two-pass alias map needs the
      // explicit guard.)
      val models = scala.collection.mutable.LinkedHashMap[String, Model]()
      // reference define() (type_builder.py:40-42) asserts on ANY
      // redefinition — alias/alias, alias/model, model/model, and names
      // shadowing the preloaded natives all raise; and a model is DEFINED
      // BEFORE its body is visited, so self-referential edges
      // (parent: Category) resolve
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
      def rootType(name: String): String = {
        @annotation.tailrec
        def resolve(n: String, seen: Set[String]): String =
          if (natives(n)) (if (n == "Integer") "Number" else n)
          else if (seen(n))
            throw new IllegalArgumentException(s"Circular type alias '$name'")
          else typeAliases.get(n) match {
            case Some(p) => resolve(p, seen + n) // alias chains resolve FIRST
            case None if models.contains(n) || defined(n) =>
              n // model-typed (FK) edge — visible from its own body too
            case None => throw new IllegalArgumentException(s"Type $n not defined")
          }
        resolve(name, Set.empty)
      }
      for (s <- stmts) s match {
        case SType(name, ETypeId(parent), _) =>
          define(name); typeAliases(name) = parent
        case SType(name, other, _) =>
          throw new IllegalArgumentException(s"unsupported type def $name: $other")
        case SModel(name, indexes, body, _) =>
          define(name) // raises on duplicates; visible to its own body
          val edges = scala.collection.mutable.LinkedHashMap[String, Edge]()
          val assertions = List.newBuilder[Assertion]
          for (b <- body) b match {
            // duplicate edge names are last-wins BY PARITY (the reference
            // Types.define is a plain dict assignment, types.py:108-113 —
            // it even appends a duplicate edge_order entry); duplicate
            // MODEL names, by contrast, raise — see above
            case SEdge(en, title, card, ETypeId(tn), _) =>
              val (none, many) = card match {
                case Some('!') => (false, false)
                case Some('?') => (true, false)
                case Some('+') => (false, true)
                case Some('*') => (true, true)
                case None => (false, false)
              }
              edges(en) = Edge(model = name, name = en, none = none, many = many,
                tpe = rootType(tn), title = title, expr = None, loc = None)
            case SEdge(en, _, _, other, _) =>
              throw new IllegalArgumentException(s"unsupported edge expr $en: $other")
            case SAssert(expr, _) =>
              // msg = "" BY PARITY: the reference compiler also emits
              // empty messages for DSL assertions (compiler.py:60
              // `msg=''`); non-empty msgs exist only in hand-written
              // artifacts
              assertions += Assertion(model = name, msg = "",
                expr = toPostfix(expr), loc = None)
            case other =>
              throw new IllegalArgumentException(s"unsupported model statement $other")
          }
          for (ix <- indexes.flatten)
            require(edges.contains(ix), s"Index $ix not defined in model $name")
          models(name) = Model(name, indexes,
            scala.collection.immutable.VectorMap.from(edges), assertions.result(), None)
        case SEdge(n, _, _, _, line) =>
          throw ParseError(s"edge '$n' outside a model", line.line)
        case SAssert(_, line) =>
          throw ParseError("assert outside a model", line.line)
      }
      CompiledSchema(Map.empty, scala.collection.immutable.VectorMap.from(models))
    }

    /** Expr tree → flat postfix with literal inlining. The reference
      * inlines every VAL child into the parent's args regardless of
      * position (`compiler.py:65-75`), which reorders operands of
      * non-commutative ops when a literal appears on the LEFT (e.g.
      * `5 < col` compiles to `col < 5`). We inline only suffix literals —
      * identical artifacts for everything the corpus exercises, correct
      * for literal-left comparisons (documented deviation). */
    private def toPostfix(e: Expr): List[Cmd] = {
      def litVal(x: Expr): Option[Any] = x match {
        case ELit(v) => Some(v)
        case _ => None
      }
      // a regex literal lowers to its pattern string ONLY as a matches()
      // argument (the reference grammar accepts `matches(col, /re/)`);
      // inlining it for arbitrary operators would silently turn
      // `name != /re/` into a plain string comparison
      def patVal(x: Expr): Option[Any] = x match {
        case ERegex(p) => Some(p)
        case other => litVal(other)
      }
      e match {
        case ELit(v) => List(Cmd(Op.VAL, List(v)))
        case ERegex(p) => throw new IllegalArgumentException("bare regex in assertion")
        case EEdgeId(n) => List(Cmd.one(Op.COL, n))
        case ETypeId(n) => throw new IllegalArgumentException(s"type $n in expression")
        case EUnary("!", r) => toPostfix(r) :+ Cmd(Op.NOT)
        case EUnary(op, _) => throw new IllegalArgumentException(s"unary $op unsupported")
        case ECall("matches", List(obj, pat)) =>
          patVal(pat) match {
            case Some(p) => toPostfix(obj) :+ Cmd(Op.MATCHES, List(p))
            case None => toPostfix(obj) ++ toPostfix(pat) :+ Cmd(Op.MATCHES)
          }
        case ECall(c, _) => throw new IllegalArgumentException(s"call $c unsupported")
        case EBinary("^", l, r) =>
          // xor as (l | r) & !(l & r) — superset; reference cannot compile ^
          toPostfix(EBinary("&",
            EBinary("|", l, r), EUnary("!", EBinary("&", l, r))))
        case EBinary(op, l, r) =>
          val opc = binOps.getOrElse(op,
            throw new IllegalArgumentException(s"operator $op unsupported"))
          litVal(r) match {
            case Some(v) if opc.matchesSignature(List(v)) =>
              toPostfix(l) :+ Cmd(opc, List(v))
            case _ => toPostfix(l) ++ toPostfix(r) :+ Cmd(opc)
          }
      }
    }
  }
}
