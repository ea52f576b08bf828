package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{NullType, StringType}

/** Analysis-time input check for the string-consuming natives: a
  * wrong-typed child must fail AT ANALYSIS with a readable message, not
  * as a mid-job executor ClassCastException after the scan has started.
  * `isInstanceOf`, not `==`: Spark 4 StringType equality compares
  * collation and constraint, and a collated/char-backed text column is
  * still a valid UTF8String input here. A NullType child (a bare null
  * literal) stays accepted — nullIntolerant eval returns NULL for it. */
trait StringArgExpression { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires a string column, got $other")
    }
}

/** Shared 64-bit hash kernel for the native text/vector expressions:
  * FNV-1a accumulation constants + the splitmix64 finalizer, plus the one
  * whitespace classifier every native must agree on. One copy — the
  * per-file duplicates had already drifted semantically (review finding:
  * three tokenizer loops, four mix() copies).
  */
private[graft] object HashKernel {
  final val FNV_OFFSET = 0xcbf29ce484222325L
  final val FNV_PRIME = 0x100000001b3L
  final val GOLDEN = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — the per-function mixer of the hash family. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over a char range, splitmix-finalized — the token/shingle
    * hash shared by the stopword profiles and the shingle operators
    * (their values must stay bit-identical). */
  @inline def hashChars(s: String, from: Int, until: Int): Long = {
    var h = FNV_OFFSET
    var i = from
    while (i < until) { h = (h ^ s.charAt(i).toLong) * FNV_PRIME; i += 1 }
    mix(h)
  }

  /** Java-regex `\s` (space, \t, \n, \x0B, \f, \r) — the natives'
    * documented contract is `split(text, "\\s+")` parity. NOT
    * `Character.isWhitespace`, which additionally matches the ASCII
    * separators U+001C..U+001F and Unicode spaces and would silently
    * diverge from the regex formulations on such input. (RE2/DuckDB `\s`
    * excludes \x0B; the oracle corpus contains none.) */
  @inline def isWs(cp: Int): Boolean =
    cp == ' '.toInt || (cp >= '\t'.toInt && cp <= '\r'.toInt)
}
