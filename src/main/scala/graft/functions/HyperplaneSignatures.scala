package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane sign signatures for `tables` independent LSH hash
  * tables as ONE native Catalyst expression: one pass over the vector
  * computes all `tables x planes` projections in a tight JVM loop.
  *
  * The pure-Catalyst formulation
  * ([[graft.ops.Similarity.hyperplaneSignature]], round 1) evaluated
  * `tables x planes` interpreted `aggregate(zip_with(...))` lambda trees
  * per row — with an xxhash64 call per (plane, element) — because
  * higher-order functions don't participate in whole-stage codegen. Same
  * lesson as [[ShingleMinHash]]: those two queries were the slowest in the
  * round-1 bench (8.3 s + 6.9 s at sf0.1).
  *
  * Plane components are deterministic pseudo-random values in [-1, 1)
  * derived from a splitmix64 mix of (planeId, dim) — the plane family is
  * fixed by construction, so signatures are reproducible across runs,
  * sessions, and cluster sizes (required for incremental dedup at scale).
  */
/** Mixin for vector-consuming unary natives: caches the float/double
  * `ArrayData => double[]` dispatch once per expression instance, so
  * interpreted eval (codegen disabled or fallen back) never re-branches
  * on the DataType — or allocates a closure — per row, and rejects
  * non-vector children AT ANALYSIS (not as a mid-job executor cast
  * error). New vector expressions mix this in instead of re-deriving
  * the dispatch. */
trait VectorArgExpression { self: UnaryExpression =>
  @transient protected final lazy val convert: ArrayData => Array[Double] =
    HyperplaneSignatures.toDoubles(child.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${getClass.getSimpleName} requires array<float|double>, got $other")
    }
}

case class HyperplaneSignatures(child: Expression, planes: Int, tables: Int)
  extends UnaryExpression with VectorArgExpression {

  require(planes >= 1 && planes <= 48, "planes must be in [1, 48] (table id packs above bit 48)")
  require(tables >= 1 && tables <= 128)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneSignatures.signatures(convert(input.asInstanceOf[ArrayData]), planes, tables))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSignatures$$.MODULE$$.signaturesData(" +
        s"${HyperplaneSignatures.toDoublesJava(child.dataType, c)}, $planes, $tables)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

object HyperplaneSignatures {
  import HashKernel.{GOLDEN, mix}
  private final val PRIME2 = 0xc2b2ae3d27d4eb4fL

  /** Deterministic component of hyperplane `plane` at dimension `dim`,
    * roughly uniform in [-1, 1). */
  @inline def component(plane: Int, dim: Int): Double =
    (mix(plane.toLong * GOLDEN + dim.toLong * PRIME2) >>> 11) * (2.0 / (1L << 53)) - 1.0

  /** Codegen helpers — the float/double vector-conversion dispatch, shared
    * by every vector-consuming native expression (also [[NearestCentroids]]):
    * the branch happens at PLAN time, not per row. */
  def floatsToDoubles(a: ArrayData): Array[Double] = {
    val f = a.toFloatArray()
    val d = new Array[Double](f.length)
    var i = 0
    while (i < f.length) { d(i) = f(i); i += 1 }
    d
  }

  /** Java fragment converting an ArrayData expression to double[]. */
  def toDoublesJava(dt: DataType, c: String): String = dt match {
    case ArrayType(FloatType, _) =>
      s"graft.functions.HyperplaneSignatures$$.MODULE$$.floatsToDoubles($c)"
    case ArrayType(DoubleType, _) => s"$c.toDoubleArray()"
    case other =>
      throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  /** Interpreted-eval twin of [[toDoublesJava]]. */
  def toDoubles(dt: DataType): ArrayData => Array[Double] = dt match {
    case ArrayType(FloatType, _) => floatsToDoubles(_)
    case ArrayType(DoubleType, _) => _.toDoubleArray()
    case other =>
      throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  def signaturesData(v: Array[Double], planes: Int, tables: Int): GenericArrayData =
    new GenericArrayData(signatures(v, planes, tables))

  /** `tables` packed sign signatures; table t uses planes
    * [t*planes, (t+1)*planes). */
  def signatures(v: Array[Double], planes: Int, tables: Int): Array[Long] = {
    val nPlanes = planes * tables
    val proj = new Array[Double](nPlanes)
    var i = 0
    while (i < v.length) {
      val vi = v(i)
      if (vi != 0.0) {
        var p = 0
        while (p < nPlanes) { proj(p) += vi * component(p, i); p += 1 }
      }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      val base = t * planes
      var b = 0
      while (b < planes) { if (proj(base + b) > 0) sig |= (1L << b); b += 1 }
      out(t) = sig
      t += 1
    }
    out
  }

  /** Column API: array of `tables` signature longs. */
  def hyperplane_signatures(c: Column, planes: Int, tables: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      HyperplaneSignatures(org.apache.spark.sql.GraftExpressionBridge.expression(c), planes, tables))
}
