package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** IVF coarse-quantizer assignment as one native expression: the `m`
  * centroid ids nearest to the input vector by cosine similarity, in one
  * pass over `centroids x dim` (ties break to the lower centroid id, so
  * assignment is fully deterministic). Items use m=1 (their cell); queries
  * use m=nProbe (the probed cells). Centroids are a plan-time constant —
  * they ship inside the serialized expression, the executor-side analogue
  * of a broadcast. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], m: Int)
  extends UnaryExpression with VectorArgExpression {
  // Seq (structural equality), NOT Array (reference equality): a case
  // class holding arrays breaks Catalyst semantic equality, so two
  // expressions built from equal-but-distinct centroid matrices (items
  // leg vs queries leg) could never share subexpressions or exchanges

  require(centroids.nonEmpty && m >= 1 && m <= centroids.length)
  // the per-row dim guard in nearest() checks against row 0 — a ragged
  // matrix would silently prefix-truncate longer rows or AIOOBE on
  // shorter ones, so reject it at construction
  require(centroids.forall(_.length == centroids.head.length),
    "all centroid rows must share one dimension")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // pre-normalized once per (deserialized) expression instance
  @transient private lazy val unit: Array[Array[Double]] = centroids.map { c0 =>
    val c = c0.toArray
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0) c else c.map(_ / n)
  }.toArray

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      NearestCentroids.nearest(convert(input.asInstanceOf[ArrayData]), unit, m))

  /** The normalized centroid matrix rides the generated class as a
    * reference object (the codegen analogue of the serialized-expression
    * "broadcast" the interpreted path used). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("unitCentroids", unit, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroids$$.MODULE$$.nearestData(" +
        s"${HyperplaneSignatures.toDoublesJava(child.dataType, c)}, $cents, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  /** Codegen/eval entry point. */
  def nearestData(v: Array[Double], unitCentroids: Array[Array[Double]], m: Int): GenericArrayData =
    new GenericArrayData(nearest(v, unitCentroids, m))

  /** Indices of the `m` unit-centroids with the largest dot product against
    * `v` (cosine order — `v`'s own norm is rank-invariant). A
    * dimension-mismatched vector is an ERROR, not a silent prefix dot
    * product: a corrupt row would otherwise be filed into a meaningless
    * cell and become unfindable with no diagnostic anywhere (the training
    * path crashes on the same defect — the policies must agree). */
  def nearest(v: Array[Double], unitCentroids: Array[Array[Double]], m: Int): Array[Int] = {
    val k = unitCentroids.length
    val dim = unitCentroids(0).length
    if (v.length != dim)
      throw new IllegalArgumentException(
        s"embedding dimension ${v.length} does not match the centroid dimension $dim")
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = unitCentroids(c)
      var s = 0.0
      var i = 0
      while (i < dim) { s += v(i) * cent(i); i += 1 }
      // NaN scores (e.g. NaN elements from upstream zero-vector
      // normalization) clamp to -inf ONCE at fill time: the row still
      // deterministically lands in the lowest-id untaken cells instead of
      // crashing the stage, and the selection loop stays branch-light
      scores(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && (best == -1 || scores(i) > bestS)) { best = i; bestS = scores(i) }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  def nearest_centroids(c: Column, centroids: Array[Array[Double]], m: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      NearestCentroids(org.apache.spark.sql.GraftExpressionBridge.expression(c),
        centroids.map(_.toSeq).toSeq, m))
}
