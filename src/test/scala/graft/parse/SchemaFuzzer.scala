package graft.parse

import scala.collection.mutable
import scala.util.Random

/** Seeded random generator of `.kye` schemas for differential fuzzing
  * against the reference compiler (`kye/kye.py:70-76` `compile` →
  * `kye/compiled.py` `to_dict`).
  *
  * The generated surface is the INTERSECTION both compilers accept,
  * established empirically by probing the reference (see
  * fuzz corpus provenance in src/test/resources/fuzz/README.md):
  *
  *  - models with 1..3 index sets of 1..3 edges; composite indexes
  *  - edges: native types (Number/Integer/String/Boolean), alias refs,
  *    model-typed (FK, incl. self-FK), titles, cardinality (! ? + *),
  *    const exprs (string/number/boolean/regex) and logical string/regex
  *    enums with NOT over string consts only (NOT over a regex leaf
  *    raises NotImplementedError in the reference)
  *  - type aliases: consts, regexes, native refs, alias chains, logical
  *    string enums; redefinition (reference semantics: last wins)
  *  - assertions: arithmetic/comparison/logical expression trees over
  *    (possibly undefined) edges and literals; `!` unary; paren nesting
  *  - numbers: ints (incl. > 2^53 — artifact floats exercise Python
  *    `repr` parity), decimals, exponent forms, leading sign
  *  - excluded because the reference CRASHES (not a clean compile error):
  *    `%` `^` `~` `is` (W4), calls (even `matches` — Desugar.visit_call
  *    missing), dot/filter/select exprs, edge blocks, `null` statements,
  *    top-level asserts, forward alias/model refs, mixed-type logical
  *    edge exprs, models without indexes, index edges never defined
  */
object SchemaFuzzer {

  def generate(seed: Long, n: Int): IndexedSeq[String] = {
    val rnd = new Random(seed)
    (0 until n).map(_ => genSchema(rnd))
  }

  // ---- naming ------------------------------------------------------------

  private def typeName(rnd: Random, taken: mutable.Set[String]): String = {
    val bases = Seq("Mod", "User", "Acct", "Item", "Evt", "Conv", "Turn", "Doc", "Tag", "Ref")
    var name = ""
    do {
      val b = bases(rnd.nextInt(bases.length))
      name = if (rnd.nextBoolean()) b + (('a' + rnd.nextInt(26)).toChar) else b + rnd.nextInt(90)
      // TYPE token: [A-Z]+[a-z][a-zA-Z0-9]* — all bases carry a lowercase
    } while (taken.contains(name))
    taken += name
    name
  }

  private def edgeName(rnd: Random, taken: mutable.Set[String]): String = {
    val bases = Seq("id", "key", "name", "val", "num", "flag", "txt", "ts_s", "rank", "code",
      "state", "note", "z", "x_1", "grp", "owner_ref", "alt")
    var name = ""
    do {
      val b = bases(rnd.nextInt(bases.length))
      name = if (rnd.nextBoolean()) b else b + "_" + rnd.nextInt(50)
    } while (taken.contains(name))
    taken += name
    name
  }

  // ---- literals ----------------------------------------------------------

  private def numberLit(rnd: Random): String = rnd.nextInt(9) match {
    case 0 => rnd.nextInt(10).toString
    case 1 => rnd.nextInt(100000).toString
    case 2 => (rnd.nextLong() % 1000000000000000000L).abs.toString // may exceed 2^53
    case 3 => s"${rnd.nextInt(1000)}.${rnd.nextInt(1000)}"
    case 4 => s"${rnd.nextInt(10)}e${rnd.nextInt(40)}"
    case 5 => s"${rnd.nextInt(100)}.${rnd.nextInt(100)}e${if (rnd.nextBoolean()) "-" else "+"}${rnd.nextInt(30)}"
    case 6 => s"-${rnd.nextInt(1000)}"
    case 7 => s"+${rnd.nextInt(1000)}"
    case _ => s"${rnd.nextInt(10)}E-${rnd.nextInt(320)}" // tiny magnitudes
  }

  /** String literal CONTENT (raw lexeme between the quotes — escapes stay
    * raw on both sides). Biased toward YAML-emitter edge cases: numeric /
    * boolean / null lookalikes, ':', ' #', quotes, long space-separated
    * runs that exercise 80-column folding. */
  private def stringContent(rnd: Random): String = rnd.nextInt(14) match {
    case 0 => ""
    case 1 => Seq("yes", "No", "TRUE", "false", "null", "~", "on", "Off")(rnd.nextInt(8))
    case 2 => rnd.nextInt(100000).toString                      // numeric-looking
    case 3 => Seq("1.5", "-3", "+7", "0x1f", "1_000", "1e5", "2.5e+3", ".inf", "3:2", "12:30")(rnd.nextInt(10))
    case 4 => "word" + rnd.nextInt(100)
    case 5 => ("tok" + rnd.nextInt(10) + " ") * (5 + rnd.nextInt(30)) + "end" // folding
    case 6 => Seq("a: b", "a #b", " lead", "trail ", "it's", "he said \\\"hi\\\"",
      "- dash", "[brack", "{brace", "*star", "&amp", "!bang", "|pipe", ">gt",
      "%pct", "@at", "?q", "a,b", "ends:", "#lead", "mid#hash", "---", "...doc",
      "=", "<<")(rnd.nextInt(24))
    case 7 => "esc\\\\mid"                                       // raw backslash escape
    case 8 => "tab\\there"                                       // raw \t sequence (NOT a real tab)
    case 9 => Seq("2001-12-14", "2001-12-14 21:59:43", "2020-1-2")(rnd.nextInt(3)) // timestamp-looking
    case 10 => ("x" * (60 + rnd.nextInt(60)))                    // long unbreakable
    case 11 => Seq("'single'", "''", "a''b")(rnd.nextInt(3))     // single quotes inside
    case 12 => (1 to (3 + rnd.nextInt(25))).map(_ => Seq("alpha", "beta", "gamma", "percent%", "colon:x")(rnd.nextInt(5))).mkString(" ")
    case _ => "plain"
  }

  private def stringLit(rnd: Random): String = "\"" + stringContent(rnd) + "\""

  private def regexLit(rnd: Random): String = {
    val bodies = Seq("a+", "ab*", "[a-z]+", "x?y", "\\d+", "(ab)+c", "^st", "end$", "a{2,3}",
      "[0-9]{2}", "\\w+", "p|q")
    "/" + bodies(rnd.nextInt(bodies.length)) + "/"
  }

  // ---- expressions (assert bodies) --------------------------------------

  /** Random expression tree. `edges` may be empty → literals only.
    * Kinds: 0=numeric, 1=string, 2=bool-ish. The reference compiles
    * without semantic type checks, so mixing comparison operands is fine;
    * we avoid regex leaves (TypeBuilder.visit_regex missing) and `%`/`^`. */
  private def expr(rnd: Random, edges: Seq[String], depth: Int): String = {
    def numAtom(): String =
      if (edges.nonEmpty && rnd.nextBoolean()) pick(rnd, edges) else numberLit(rnd)
    def strAtom(): String =
      if (edges.nonEmpty && rnd.nextInt(3) == 0) pick(rnd, edges) else stringLit(rnd)
    def arith(d: Int): String =
      if (d <= 0) numAtom()
      else rnd.nextInt(6) match {
        case 0 | 1 => numAtom()
        case 2 => s"${arith(d - 1)} ${pick(rnd, Seq("+", "-", "*", "/"))} ${arith(d - 1)}"
        case 3 => s"(${arith(d - 1)})"
        case 4 => s"(${arith(d - 1)}) ${pick(rnd, Seq("+", "*"))} ${numAtom()}"
        case _ => s"${numAtom()} ${pick(rnd, Seq("-", "/"))} ${numAtom()}"
      }
    def cmp(d: Int): String = rnd.nextInt(7) match {
      case 0 => s"${arith(d)} ${pick(rnd, Seq("==", "!=", "<", ">", "<=", ">="))} ${arith(d)}"
      case 1 => s"${strAtom()} ${pick(rnd, Seq("==", "!="))} ${strAtom()}"
      case 2 => s"${strAtom()} ${pick(rnd, Seq("<", ">", "<=", ">="))} ${strAtom()}"
      case 3 if edges.nonEmpty => pick(rnd, edges)                  // bare edge
      case 4 => pick(rnd, Seq("TRUE", "FALSE"))
      case 5 if edges.nonEmpty => s"${pick(rnd, edges)} == ${pick(rnd, Seq("TRUE", "FALSE"))}"
      case _ => s"${arith(d)} == ${numAtom()}"
    }
    def bool(d: Int): String =
      if (d <= 0) cmp(0)
      else rnd.nextInt(6) match {
        case 0 | 1 => cmp(d - 1)
        case 2 => s"${bool(d - 1)} ${pick(rnd, Seq("&", "|"))} ${bool(d - 1)}"
        case 3 => s"!${parenIfNeeded(rnd, bool(d - 1))}"
        case 4 => s"(${bool(d - 1)})"
        case _ => s"!!${parenIfNeeded(rnd, cmp(d - 1))}"
      }
    bool(depth)
  }

  private def parenIfNeeded(rnd: Random, e: String): String =
    if (e.exists(c => c == ' ')) s"($e)" else e

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  // ---- edge const-exprs (desugar-rewritable) -----------------------------

  /** Logical enum over string/regex leaves; NOT only over string consts or
    * compound string-only subtrees (reference crashes on NOT-regex). */
  private def stringEnum(rnd: Random, depth: Int, allowRegex: Boolean): String =
    if (depth <= 0) {
      if (allowRegex && rnd.nextInt(4) == 0) regexLit(rnd) else stringLit(rnd)
    } else rnd.nextInt(5) match {
      case 0 => stringEnum(rnd, 0, allowRegex)
      case 1 => s"(${stringEnum(rnd, depth - 1, allowRegex)} | ${stringEnum(rnd, depth - 1, allowRegex)})"
      case 2 => s"${stringEnum(rnd, depth - 1, allowRegex)} & ${stringEnum(rnd, depth - 1, allowRegex)}"
      case 3 => s"!${stringLit(rnd)}"
      case _ => s"!(${stringEnum(rnd, depth - 1, allowRegex = false)})" // compound NOT: strings only
    }

  private def constExpr(rnd: Random): String = rnd.nextInt(6) match {
    case 0 => stringLit(rnd)
    case 1 => numberLit(rnd)
    case 2 => pick(rnd, Seq("TRUE", "FALSE"))
    case 3 => regexLit(rnd)
    case 4 => s"(${numberLit(rnd)} | ${numberLit(rnd)})"
    case _ => stringEnum(rnd, 1 + rnd.nextInt(2), allowRegex = true)
  }

  // ---- schema assembly ---------------------------------------------------

  private final case class AliasDef(name: String, rhs: String)

  private def genSchema(rnd: Random): String = {
    val sb = new StringBuilder
    val typeNames = mutable.Set.empty[String]
    val aliases = mutable.ArrayBuffer.empty[String]
    val models = mutable.ArrayBuffer.empty[String]

    def sep(): Unit = {
      // statement separators: newline, comma-newline, or inline comma
      rnd.nextInt(6) match {
        case 0 => sb.append(",\n")
        case 1 => sb.append(", ")
        case 2 => sb.append("\n\n")
        case _ => sb.append("\n")
      }
    }
    def maybeComment(): Unit =
      if (rnd.nextInt(8) == 0) sb.append("# ").append(pick(rnd,
        Seq("fuzz case", "generated", "edge note: tricky", "TODO review"))).append("\n")

    // aliases (reference: must be defined before use; redefinition = last wins)
    val nAliases = rnd.nextInt(4)
    for (_ <- 0 until nAliases) {
      val name = typeName(rnd, typeNames)
      val rhs = rnd.nextInt(7) match {
        case 0 => stringLit(rnd)
        case 1 => numberLit(rnd)
        case 2 => regexLit(rnd)
        case 3 => pick(rnd, Seq("Number", "String", "Boolean", "Integer"))
        case 4 if aliases.nonEmpty => pick(rnd, aliases.toSeq)
        case 5 => stringEnum(rnd, 1, allowRegex = true)
        case _ => pick(rnd, Seq("TRUE", "FALSE"))
      }
      maybeComment()
      sb.append(name).append(": ").append(rhs)
      sep()
      aliases += name
      // occasional redefinition (last wins in the reference)
      if (rnd.nextInt(10) == 0) {
        sb.append(name).append(": ").append(stringLit(rnd))
        sep()
      }
    }

    val nModels = 1 + rnd.nextInt(3)
    for (_ <- 0 until nModels) {
      val mName = typeName(rnd, typeNames)
      val edgeNames = mutable.Set.empty[String]
      val nEdges = 1 + rnd.nextInt(6)
      val edges = (0 until nEdges).map(_ => edgeName(rnd, edgeNames)).toIndexedSeq

      // index sets reference defined edges only (undefined index edge = crash)
      val nIdx = 1 + rnd.nextInt(3)
      val idxSets = (0 until nIdx).map { _ =>
        val k = 1 + rnd.nextInt(math.min(3, edges.length))
        rnd.shuffle(edges.toList).take(k)
      }.distinct

      maybeComment()
      sb.append(mName)
      idxSets.foreach(s => sb.append("(").append(s.mkString(if (rnd.nextBoolean()) ", " else ",")).append(")"))
      sb.append(" {")
      sb.append("\n")

      for (e <- edges) {
        val card = rnd.nextInt(10) match {
          case 0 => "!"
          case 1 | 2 => "?"
          case 3 => "*"
          case 4 => "+"
          case _ => ""
        }
        val title = if (rnd.nextInt(6) == 0) " \"" + stringContent(rnd) + "\"" else ""
        val rhs = rnd.nextInt(10) match {
          case 0 | 1 | 2 | 3 => pick(rnd, Seq("Number", "String", "Boolean", "Integer", "Number", "String"))
          case 4 if aliases.nonEmpty => pick(rnd, aliases.toSeq)
          case 5 if models.nonEmpty => pick(rnd, models.toSeq) // FK to earlier model
          case 6 if rnd.nextInt(3) == 0 => mName               // self-FK
          case 7 => constExpr(rnd)
          case _ => pick(rnd, Seq("Number", "String", "Boolean"))
        }
        if (rnd.nextInt(6) == 0) sb.append("\t") else sb.append("  ")
        sb.append(e).append(title).append(card).append(": ").append(rhs)
        sep()
      }

      // assertions over this model's edges (sometimes an undefined edge —
      // the reference compiles those fine)
      val nAsserts = rnd.nextInt(3)
      for (_ <- 0 until nAsserts) {
        val pool = if (rnd.nextInt(12) == 0) edges :+ "undefined_edge" else edges
        sb.append("  assert ").append(expr(rnd, pool, 1 + rnd.nextInt(3)))
        sep()
      }

      sb.append("}")
      sep()
      models += mName
    }

    // r6: a ref-free type statement AFTER the models — the reference's
    // collect_refs accumulates across statements (desugar.py:88-94), so
    // this aliases ONLY when no earlier statement introduced a ref
    // (assertions/edge-exprs/FK edges all do); otherwise it survives to
    // the TypeBuilder and is rejected. Both outcomes must match the
    // reference byte-for-byte / status-for-status.
    if (rnd.nextInt(6) == 0) {
      val late = typeName(rnd, typeNames)
      maybeComment()
      sb.append(late).append(": ").append(stringLit(rnd))
      sep()
      if (rnd.nextBoolean()) {
        // a trailing model USING the late alias: compiles only on the
        // no-prior-refs path (the alias inlines to an edge assertion)
        val lm = typeName(rnd, typeNames)
        sb.append(lm).append("(lid) {\n  lid: Number\n  lv: ").append(late).append("\n}")
        sep()
      }
    }
    sb.toString
  }
}
