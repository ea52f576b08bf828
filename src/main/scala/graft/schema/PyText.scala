package graft.schema

import com.fasterxml.jackson.databind.JsonNode

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import scala.jdk.CollectionConverters._

/** Byte-parity re-implementations of the Python text codecs the reference
  * uses to write compiled artifacts (`kye/kye.py:100-113`):
  * `json.dumps(raw, sort_keys=False, indent=2)` and
  * `yaml.dump(raw, sort_keys=False)` (PyYAML defaults: block style,
  * width 80, indent 2, allow_unicode=False).
  *
  * The behaviors re-expressed here come from the PUBLIC CPython/PyYAML
  * semantics (float `repr`, `json` escaping, the YAML 1.1 implicit
  * resolver, and PyYAML's emitter scalar analysis / folding rules), probed
  * empirically in this sandbox so `--compile` artifacts byte-match the
  * reference's `kye -c` output in BOTH formats.
  */
object PyText {

  // ---- CPython float repr ------------------------------------------------

  /** `repr(float)`: the shortest decimal string that round-trips, fixed
    * notation for decimal exponents in [-4, 15], scientific (`1e+16`,
    * exponent always signed, >= 2 digits) outside.
    */
  def floatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    // shortest digit string: smallest precision whose correctly-rounded
    // decimal round-trips to the exact double
    val exact = new JBigDecimal(a)
    var bd: JBigDecimal = null
    var n = 1
    while (bd == null && n <= 17) {
      val cand = exact.round(new MathContext(n, RoundingMode.HALF_EVEN))
      if (cand.doubleValue() == a) bd = cand.stripTrailingZeros()
      n += 1
    }
    require(bd != null, s"no 17-digit round-trip for $d")
    val digits = bd.unscaledValue().toString
    val decExp = (digits.length - 1) - bd.scale()
    val body =
      if (decExp >= -4 && decExp <= 15) {
        // fixed, always at least one fractional digit
        if (decExp >= digits.length - 1)
          digits + "0" * (decExp - digits.length + 1) + ".0"
        else if (decExp >= 0)
          digits.substring(0, decExp + 1) + "." + digits.substring(decExp + 1)
        else
          "0." + "0" * (-decExp - 1) + digits
      } else {
        val mant =
          if (digits.length == 1) digits
          else digits.substring(0, 1) + "." + digits.substring(1)
        val sign = if (decExp < 0) "-" else "+"
        val e = math.abs(decExp)
        val ed = if (e < 10) "0" + e else e.toString
        s"${mant}e$sign$ed"
      }
    if (neg) "-" + body else body
  }

  /** PyYAML's float representer: `repr(x)` with `e`-but-no-`.` patched to
    * `.0e`, and `.inf`/`.nan` spellings. */
  def yamlFloatRepr(d: Double): String = {
    if (d.isNaN) return ".nan"
    if (d == Double.PositiveInfinity) return ".inf"
    if (d == Double.NegativeInfinity) return "-.inf"
    val v = floatRepr(d)
    if (!v.contains('.') && v.contains('e')) v.replaceFirst("e", ".0e") else v
  }

  // ---- YAML 1.1 implicit resolver (PyYAML resolver.py) -------------------

  private val Yaml11Implicit: List[java.util.regex.Pattern] = List(
    "^(?:yes|Yes|YES|no|No|NO|true|True|TRUE|false|False|FALSE|on|On|ON|off|Off|OFF)$",
    "^(?:[-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+][0-9]+)?" +
      "|\\.[0-9][0-9_]*(?:[eE][-+][0-9]+)?" +
      "|[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*" +
      "|[-+]?\\.(?:inf|Inf|INF)" +
      "|\\.(?:nan|NaN|NAN))$",
    "^(?:[-+]?0b[0-1_]+" +
      "|[-+]?0[0-7_]+" +
      "|[-+]?(?:0|[1-9][0-9_]*)" +
      "|[-+]?0x[0-9a-fA-F_]+" +
      "|[-+]?[1-9][0-9_]*(?::[0-5]?[0-9])+)$",
    "^(?:<<)$",
    "^(?:~|null|Null|NULL|)$",
    "^(?:[0-9][0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9]" +
      "|[0-9][0-9][0-9][0-9]-[0-9][0-9]?-[0-9][0-9]?" +
      "(?:[Tt]|[ \\t]+)[0-9][0-9]?" +
      ":[0-9][0-9]:[0-9][0-9](?:\\.[0-9]*)?" +
      "(?:[ \\t]*(?:Z|[-+][0-9][0-9]?(?::[0-9][0-9])?))?)$",
    "^(?:=)$"
  ).map(java.util.regex.Pattern.compile)

  /** True when a plain (unquoted) emission of `s` would be re-read by a
    * YAML 1.1 parser as a non-string (bool/int/float/null/timestamp/
    * merge/value) — PyYAML then forces quotes. */
  def yaml11ResolvesNonString(s: String): Boolean =
    Yaml11Implicit.exists(_.matcher(s).matches())

  // ---- json.dumps(indent=2, sort_keys=False) parity ----------------------

  object Json {
    def dumps(root: JsonNode): String = {
      val sb = new java.lang.StringBuilder
      write(root, 0, sb)
      sb.toString
    }

    private def write(node: JsonNode, indent: Int, sb: java.lang.StringBuilder): Unit = {
      val pad = " " * indent
      val pad2 = " " * (indent + 2)
      if (node.isObject) {
        if (node.size() == 0) { sb.append("{}"); return }
        sb.append("{\n")
        val fields = node.fields().asScala.toList
        var first = true
        for (e <- fields) {
          if (!first) sb.append(",\n")
          first = false
          sb.append(pad2).append(escape(e.getKey)).append(": ")
          write(e.getValue, indent + 2, sb)
        }
        sb.append("\n").append(pad).append("}")
      } else if (node.isArray) {
        if (node.size() == 0) { sb.append("[]"); return }
        sb.append("[\n")
        var first = true
        node.elements().asScala.foreach { el =>
          if (!first) sb.append(",\n")
          first = false
          sb.append(pad2)
          write(el, indent + 2, sb)
        }
        sb.append("\n").append(pad).append("]")
      } else sb.append(scalar(node))
    }

    private def scalar(node: JsonNode): String =
      if (node.isTextual) escape(node.asText())
      else if (node.isBoolean) { if (node.asBoolean()) "true" else "false" }
      else if (node.isNull) "null"
      else if (node.isIntegralNumber) node.asText()
      else if (node.isNumber) {
        val d = node.asDouble()
        // json.dumps spells non-finite floats as JS literals
        if (d.isNaN) "NaN"
        else if (d == Double.PositiveInfinity) "Infinity"
        else if (d == Double.NegativeInfinity) "-Infinity"
        else floatRepr(d)
      } else throw new IllegalArgumentException(s"Unsupported JSON scalar: $node")

    /** json.dumps default escaping: ensure_ascii=True, shorthand escapes,
      * lowercase \\uXXXX, surrogate pairs for astral code points. */
    def escape(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 2)
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '"'  => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case '\b' => sb.append("\\b")
          case '\f' => sb.append("\\f")
          case _ =>
            if (c >= 0x20 && c <= 0x7e) sb.append(c)
            else sb.append(f"\\u${c.toInt}%04x") // surrogate halves escape individually = pairs
        }
        i += 1
      }
      sb.append('"')
      sb.toString
    }
  }

  // ---- yaml.dump(sort_keys=False) parity (PyYAML emitter subset) ---------

  /** Emits the block-style YAML PyYAML produces for plain data (nested
    * dicts/lists/scalars): plain/single/double scalar style selection via
    * PyYAML's scalar analysis, 80-column folding, indentless block
    * sequences, `{}`/`[]` flow for empty collections. Faithful port of the
    * public PyYAML emitter algorithm for the subset reachable from compiled
    * artifacts (no anchors, tags, multi-docs, or block literal styles).
    */
  object Yaml {
    def dump(root: JsonNode): String = {
      val e = new Emitter
      e.emitNode(root, mappingContext = false)
      e.finishDocument()
      e.result
    }

    private final val BestIndent = 2
    private final val BestWidth = 80

    private final class Emitter {
      private val out = new java.lang.StringBuilder
      private var column = 0
      private var whitespace = true
      private var indention = true
      private var indent: Int = -1 // PyYAML `None`
      private var indents: List[Int] = Nil

      def result: String = out.toString

      def finishDocument(): Unit = writeIndent() // trailing line break

      private def increaseIndent(flow: Boolean, indentless: Boolean = false): Unit = {
        indents ::= indent
        if (indent < 0) indent = if (flow) BestIndent else 0
        else if (!indentless) indent += BestIndent
      }
      private def popIndent(): Unit = { indent = indents.head; indents = indents.tail }

      private def writeIndicator(s: String, needWhitespace: Boolean,
          ws: Boolean = false, ind: Boolean = false): Unit = {
        val data = if (whitespace || !needWhitespace) s else " " + s
        whitespace = ws
        indention = indention && ind
        column += data.length
        out.append(data)
      }

      private def writeLineBreak(): Unit = {
        whitespace = true; indention = true; column = 0; out.append('\n')
      }

      private def writeIndent(): Unit = {
        val ind = math.max(indent, 0)
        if (!indention || column > ind || (column == ind && !whitespace)) writeLineBreak()
        if (column < ind) {
          whitespace = true
          var i = column
          while (i < ind) { out.append(' '); i += 1 }
          column = ind
        }
      }

      def emitNode(node: JsonNode, mappingContext: Boolean): Unit = {
        if (node.isObject) {
          if (node.size() == 0) { writeIndicator("{", needWhitespace = true, ws = true); writeIndicator("}", needWhitespace = false) }
          else emitBlockMapping(node)
        } else if (node.isArray) {
          if (node.size() == 0) { writeIndicator("[", needWhitespace = true, ws = true); writeIndicator("]", needWhitespace = false) }
          else emitBlockSequence(node, mappingContext)
        } else emitScalar(node, simpleKey = false)
      }

      private def emitBlockMapping(node: JsonNode): Unit = {
        increaseIndent(flow = false)
        node.fields().asScala.foreach { e =>
          writeIndent()
          emitScalarString(e.getKey, simpleKey = true)
          writeIndicator(":", needWhitespace = false)
          emitNode(e.getValue, mappingContext = true)
        }
        popIndent()
      }

      private def emitBlockSequence(node: JsonNode, mappingContext: Boolean): Unit = {
        increaseIndent(flow = false, indentless = mappingContext && !indention)
        node.elements().asScala.foreach { el =>
          writeIndent()
          writeIndicator("-", needWhitespace = true, ind = true)
          emitNode(el, mappingContext = false)
        }
        popIndent()
      }

      private def emitScalar(node: JsonNode, simpleKey: Boolean): Unit = {
        if (node.isTextual) emitScalarString(node.asText(), simpleKey)
        else {
          // expect_scalar: increase_indent(flow=True) → folded continuation
          // lines sit at the parent indent + 2
          increaseIndent(flow = true)
          // non-string scalars: plain style, always resolver-implicit
          val text =
            if (node.isBoolean) { if (node.asBoolean()) "true" else "false" }
            else if (node.isNull) "null"
            else if (node.isIntegralNumber) node.asText()
            else if (node.isNumber) yamlFloatRepr(node.asDouble())
            else throw new IllegalArgumentException(s"Unsupported YAML scalar: $node")
          writePlain(text, split = !simpleKey)
          popIndent()
        }
      }

      private def emitScalarString(s: String, simpleKey: Boolean): Unit = {
        increaseIndent(flow = true) // expect_scalar indent bump
        try emitScalarString0(s, simpleKey)
        finally popIndent()
      }

      private def emitScalarString0(s: String, simpleKey: Boolean): Unit = {
        val a = analyze(s)
        val split = !simpleKey
        // choose_scalar_style for style=None string events:
        // implicit[0] == "a plain parse reads back a string"
        val implicitStr = s.nonEmpty && !yaml11ResolvesNonString(s)
        if (implicitStr && !(simpleKey && (a.empty || a.multiline)) && a.allowBlockPlain)
          writePlain(s, split)
        else if (a.allowSingleQuoted && !(simpleKey && a.multiline))
          writeSingleQuoted(s, split)
        else
          writeDoubleQuoted(s, split)
      }

      // -- scalar analysis (Emitter.analyze_scalar, block context) ---------

      private final case class Analysis(
          empty: Boolean, multiline: Boolean,
          allowBlockPlain: Boolean, allowSingleQuoted: Boolean)

      private def isBreak(cp: Int): Boolean =
        cp == '\n' || cp == 0x85 || cp == 0x2028 || cp == 0x2029
      private def isWsOrNul(cp: Int): Boolean =
        cp == 0 || cp == ' ' || cp == '\t' || cp == '\r' || isBreak(cp)

      private def analyze(scalar: String): Analysis = {
        if (scalar.isEmpty)
          return Analysis(empty = true, multiline = false,
            allowBlockPlain = true, allowSingleQuoted = true)
        var blockIndicators = false
        var lineBreaks = false
        var specialCharacters = false
        var leadingSpace = false; var leadingBreak = false
        var trailingSpace = false; var trailingBreak = false
        var breakSpace = false; var spaceBreak = false
        if (scalar.startsWith("---") || scalar.startsWith("...")) blockIndicators = true
        val cps = scalar.codePoints().toArray
        var precededByWs = true
        var followedByWs = cps.length == 1 || isWsOrNul(cps(1))
        var prevSpace = false; var prevBreak = false
        var index = 0
        while (index < cps.length) {
          val cp = cps(index)
          if (index == 0) {
            if ("#,[]{}&*!|>'\"%@`".indexOf(cp) >= 0) blockIndicators = true
            if ((cp == '?' || cp == ':') && followedByWs) blockIndicators = true
            if (cp == '-' && followedByWs) blockIndicators = true
          } else {
            if (cp == ':' && followedByWs) blockIndicators = true
            if (cp == '#' && precededByWs) blockIndicators = true
          }
          if (isBreak(cp)) lineBreaks = true
          if (!(cp == '\n' || (cp >= 0x20 && cp <= 0x7e))) {
            // allow_unicode=False: every non-ASCII-printable is special
            specialCharacters = true
          }
          if (cp == ' ') {
            if (index == 0) leadingSpace = true
            if (index == cps.length - 1) trailingSpace = true
            if (prevBreak) breakSpace = true
            prevSpace = true; prevBreak = false
          } else if (isBreak(cp)) {
            if (index == 0) leadingBreak = true
            if (index == cps.length - 1) trailingBreak = true
            if (prevSpace) spaceBreak = true
            prevSpace = false; prevBreak = true
          } else { prevSpace = false; prevBreak = false }
          index += 1
          precededByWs = isWsOrNul(cp)
          followedByWs = index + 1 >= cps.length || isWsOrNul(cps(index + 1))
        }
        var allowBlockPlain = true
        var allowSingleQuoted = true
        if (leadingSpace || leadingBreak || trailingSpace || trailingBreak) allowBlockPlain = false
        if (breakSpace) { allowBlockPlain = false; allowSingleQuoted = false }
        if (spaceBreak || specialCharacters) { allowBlockPlain = false; allowSingleQuoted = false }
        if (lineBreaks) allowBlockPlain = false
        if (blockIndicators) allowBlockPlain = false
        Analysis(empty = false, multiline = lineBreaks, allowBlockPlain, allowSingleQuoted)
      }

      // -- scalar writers (Emitter.write_plain/_single_quoted/_double_quoted)

      private def writePlain(text: String, split: Boolean): Unit = {
        if (text.isEmpty) return
        if (!whitespace) { column += 1; out.append(' ') }
        whitespace = false; indention = false
        var spaces = false; var breaks = false
        var start = 0; var end = 0
        while (end <= text.length) {
          val ch: Int = if (end < text.length) text.charAt(end) else -1
          if (spaces) {
            if (ch != ' ') {
              if (start + 1 == end && column > BestWidth && split) {
                writeIndent(); whitespace = false; indention = false
              } else {
                column += end - start; out.append(text, start, end)
              }
              start = end
            }
          } else if (breaks) {
            if (!(ch >= 0 && isBreak(ch))) {
              if (text.charAt(start) == '\n') writeLineBreak()
              var i = start
              while (i < end) { writeLineBreak(); i += 1 }
              writeIndent(); whitespace = false; indention = false
              start = end
            }
          } else {
            if (ch < 0 || ch == ' ' || isBreak(ch)) {
              column += end - start; out.append(text, start, end)
              start = end
            }
          }
          if (ch >= 0) { spaces = ch == ' '; breaks = isBreak(ch) }
          end += 1
        }
      }

      private def writeSingleQuoted(text: String, split: Boolean): Unit = {
        writeIndicator("'", needWhitespace = true)
        var spaces = false; var breaks = false
        var start = 0; var end = 0
        while (end <= text.length) {
          val ch: Int = if (end < text.length) text.charAt(end) else -1
          if (spaces) {
            if (ch != ' ') {
              if (start + 1 == end && column > BestWidth && split
                  && start != 0 && end != text.length) writeIndent()
              else { column += end - start; out.append(text, start, end) }
              start = end
            }
          } else if (breaks) {
            if (!(ch >= 0 && isBreak(ch))) {
              if (text.charAt(start) == '\n') writeLineBreak()
              var i = start
              while (i < end) { writeLineBreak(); i += 1 }
              writeIndent()
              start = end
            }
          } else {
            if (ch < 0 || ch == ' ' || isBreak(ch) || ch == '\'') {
              if (start < end) { column += end - start; out.append(text, start, end); start = end }
            }
          }
          if (ch == '\'') { column += 2; out.append("''"); start = end + 1 }
          if (ch >= 0) { spaces = ch == ' '; breaks = isBreak(ch) }
          end += 1
        }
        writeIndicator("'", needWhitespace = false)
      }

      private val EscapeReplacements: Map[Int, String] = Map(
        0x00 -> "0", 0x07 -> "a", 0x08 -> "b", 0x09 -> "t", 0x0a -> "n",
        0x0b -> "v", 0x0c -> "f", 0x0d -> "r", 0x1b -> "e",
        '"'.toInt -> "\"", '\\'.toInt -> "\\", 0x85 -> "N", 0xa0 -> "_",
        0x2028 -> "L", 0x2029 -> "P")

      private def writeDoubleQuoted(text: String, split: Boolean): Unit = {
        // operates on code points so astral characters get \UXXXXXXXX like
        // Python, not two surrogate escapes
        val cps = text.codePoints().toArray
        def cpString(from: Int, until: Int): String = {
          val sb = new java.lang.StringBuilder
          var i = from
          while (i < until) { sb.appendCodePoint(cps(i)); i += 1 }
          sb.toString
        }
        writeIndicator("\"", needWhitespace = true)
        var start = 0; var end = 0
        while (end <= cps.length) {
          val ch: Int = if (end < cps.length) cps(end) else -1
          val needsEscape = ch < 0 || ch == '"' || ch == '\\' || ch == 0x85 ||
            ch == 0x2028 || ch == 0x2029 || ch == 0xfeff ||
            !(ch >= 0x20 && ch <= 0x7e) // allow_unicode=False
          if (needsEscape) {
            if (start < end) {
              val data = cpString(start, end)
              column += data.length; out.append(data)
              start = end
            }
            if (ch >= 0) {
              val data = EscapeReplacements.get(ch) match {
                case Some(r) => "\\" + r
                case None =>
                  if (ch <= 0xff) f"\\x$ch%02X"
                  else if (ch <= 0xffff) f"\\u$ch%04X"
                  else f"\\U$ch%08X"
              }
              column += data.length; out.append(data)
              start = end + 1
            }
          }
          if (end > 0 && end < cps.length - 1 && (ch == ' ' || start >= end)
              && column + (end - start) > BestWidth && split) {
            val data = cpString(start, end) + "\\"
            if (start < end) start = end
            column += data.length; out.append(data)
            writeIndent()
            whitespace = false; indention = false
            if (cps(start) == ' ') { column += 1; out.append('\\') }
          }
          end += 1
        }
        writeIndicator("\"", needWhitespace = false)
      }
    }
  }
}
