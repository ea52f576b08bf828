package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash as one native Catalyst expression: tokenize → per-token
  * 64-bit hash → per-bit vote → packed fingerprint, in a single JVM loop
  * per row (same rationale as [[ShingleMinHash]]: the pure-Catalyst
  * formulation needs 64 interpreted `aggregate` lambdas per row). */
case class SimHash64(child: Expression) extends UnaryExpression with StringArgExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // token-free text yields NULL even for a non-null child (see
  // ShingleMinHash.nullable)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    // NULL for token-free text: every such doc would otherwise share
    // fingerprint 0 and be declared a near-duplicate of all the others
    val fp = SimHash64.fingerprintBoxed(input.asInstanceOf[UTF8String])
    if (fp == null) null else fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fp = ctx.freshName("fp")
      s"""
         |java.lang.Long $fp = graft.functions.SimHash64$$.MODULE$$.fingerprintBoxed($c);
         |if ($fp == null) { ${ev.isNull} = true; } else { ${ev.value} = $fp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import HashKernel.{FNV_OFFSET, FNV_PRIME, mix}
  // no unboxed convenience method: a null-to-0L fallback would give every
  // token-free doc fingerprint 0L — exactly the degenerate shared
  // fingerprint the NULL contract exists to prevent

  /** Codegen/eval entry point. */
  def fingerprintBoxed(text: UTF8String): java.lang.Long = fingerprintOrNull(text.toString)

  /** null when the text has no letter/digit tokens. */
  def fingerprintOrNull(text: String): java.lang.Long = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val votes = new Array[Int](64)
    var nTok = 0
    var i = 0
    val len = lower.length
    while (i < len) {
      while (i < len && !Character.isLetterOrDigit(lower.charAt(i))) i += 1
      val start = i
      var h = FNV_OFFSET
      while (i < len && Character.isLetterOrDigit(lower.charAt(i))) {
        h = (h ^ lower.charAt(i).toLong) * FNV_PRIME; i += 1
      }
      if (i > start) {
        nTok += 1
        val th = mix(h)
        var j = 0
        while (j < 64) {
          if (((th >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    if (nTok == 0) return null
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SimHash64(org.apache.spark.sql.GraftExpressionBridge.expression(c)))
}
