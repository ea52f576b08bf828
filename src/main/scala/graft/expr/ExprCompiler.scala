package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.schema.{Cmd, Op}

/** Folds a postfix expression program into a single Catalyst `Column` tree.
  *
  * The reference executes programs on a columnar stack machine over pandas
  * Series (kyepy `kye/vm/vm.py:62-128`); here evaluation happens at *plan*
  * time — the stack holds unevaluated `Column`s and the resulting tree is
  * whole-stage-codegen'd by Catalyst. No data moves, no index alignment is
  * needed (the pandas outer-merge machinery of `vm.py:22-45` disappears).
  *
  * Null semantics — verified EMPIRICALLY against the reference VM on
  * null-bearing inputs (r4 sweep), not just by reading it. The reference
  * drops null/NaN values at column load (`vm.py:57-60` explode().dropna())
  * and at every stack push/pop (`vm.py:22-29`), so a row whose value is
  * missing is ABSENT from evaluation. Spark NULL models "absent":
  *   - comparisons/arithmetic/string ops: Spark null propagation = absent
  *     stays absent (identical);
  *   - NA/DEF see only PRESENT values (always false/true respectively) and
  *     stay absent on absent input — `isNull`/`isNotNull` alone would
  *     return a NON-null verdict on a null row and fire violations the
  *     reference can never produce;
  *   - AND/OR: pandas logical ops treat an absent (NaN-aligned) operand as
  *     FALSE, and the row is absent only when BOTH operands are absent —
  *     NOT Spark's Kleene 3VL (`null && true` is null in Spark but False
  *     in the reference; `null || true` is true in Spark but... also
  *     FALSE-coerced there: `coalesce(a,false) || coalesce(b,false)`).
  * Callers treat a null verdict as a vacuous pass
  * ([[graft.validate.Validator]] wraps predicates in `coalesce(p, true)`).
  *
  * Conscious deviation: comparing two COLUMNS with different null patterns
  * CRASHES the reference ("Can only compare identically-labeled Series"
  * — stack-vs-stack binop after pop-side dropna); here the null rows are
  * simply vacuous. Strictly more useful, never less correct.
  */
object ExprCompiler {

  /** NaN → NULL for a numeric Column — the single shared "NaN is missing"
    * mapping (pandas treats NaN exactly like null; Spark treats it as a
    * value that compares greater than everything, groups with itself, and
    * matches itself in joins). Apply only to float/double-typed inputs —
    * `isnan` rejects non-numeric types at analysis. */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Compile a program to a row-scalar Column. `colRef` resolves COL names
    * (lets callers redirect to renamed/cast columns).
    *
    * @param nanAbsent reference-assertion semantics: the VM drops NaN at
    *   EVERY stack push/pop (vm.py:22-29), so NaN produced MID-expression
    *   (a float cast of "NaN", Infinity*0) makes the row absent — wrap
    *   arithmetic and float-cast outputs in [[nanToNull]]. Off by default:
    *   the S3 cast path must NOT count a parsed NaN as a cast failure in
    *   its null-delta guard (the reference stores it as a NaN value whose
    *   missing-ness downstream stages apply themselves), and plain
    *   expression evaluation (q_expr_opcodes) keeps raw Spark arithmetic. */
  def compile(expr: Seq[Cmd], colRef: String => Column = col(_),
              nanAbsent: Boolean = false): Column = {
    var stack: List[Column] = Nil

    def pop(): Column = stack match {
      case h :: t => stack = t; h
      case Nil    => throw new IllegalStateException("Expression stack underflow")
    }

    for (cmd <- expr) {
      val stackArgs = List.fill(cmd.numStackArgs)(pop()).reverse
      val out = eval(cmd, stackArgs, colRef)
      val guarded =
        if (nanAbsent && NanProducingOps(cmd.op) &&
            !(cmd.op == Op.CAST && cmd.args.lastOption.contains("str")))
          nanToNull(out)
        else out
      stack = guarded :: stack
    }
    stack match {
      case res :: Nil => res
      case s          => throw new IllegalStateException(s"Program left ${s.size} values on stack")
    }
  }

  /** Ops whose output can be NaN when inputs are NaN-free: float casts and
    * float arithmetic (0/0, Inf*0, Inf-Inf, parsed "NaN"). */
  private val NanProducingOps: Set[Op] =
    Set(Op.CAST, Op.ADD, Op.SUB, Op.MUL, Op.DIV, Op.MOD, Op.NEG)

  /** Literal inline arg → Column. DSL NUMBER literals arrive as Double
    * (KyeParser mirrors kyepy parser.py:123-124, which parses them as
    * Python floats); integral values only reach here from hand-written
    * ARTIFACTS, where the reference keeps Python ints exact (int64 ops in
    * pandas) — so Long/Int stay exact lits. Converting them to double
    * would silently round inline integers above 2^53 (a 9007199254740993
    * literal would equal a ...992 column value). */
  private def litArg(a: Any): Column = a match {
    case i: Int    => lit(i)
    case l: Long   => lit(l)
    case d: Double => lit(d)
    case s: String => lit(s)
    case b: Boolean => lit(b)
    case other     => throw new IllegalArgumentException(s"Unsupported literal $other")
  }

  private def eval(cmd: Cmd, stackArgs: List[Column], colRef: String => Column): Column = {
    import Op._
    def operands: List[Column] = stackArgs ++ cmd.args.map(litArg)
    (cmd.op, cmd.args, stackArgs) match {
      case (COL, List(name: String), Nil) => colRef(name)
      case (VAL, List(v), Nil)            => litArg(v)
      case (CAST, _, _) =>
        // inline arg is the target type name ("float" | "str"); operand from
        // stack or args (kyepy vm.py:67-71). Spark cast is try-semantics
        // (null on failure); the column-level all-or-nothing verdict of the
        // reference is enforced by the validator's null-delta guard.
        val target = cmd.args.lastOption.getOrElse(
          throw new IllegalArgumentException(
            "CAST requires an inline target-type argument (e.g. {\"cast\": \"float\"})"))
        val src = (stackArgs ++ cmd.args.dropRight(1).map(litArg)).headOption.getOrElse(
          throw new IllegalArgumentException("CAST has no operand on the stack or in args"))
        // try_cast: null on failure even under ANSI mode; the reference's
        // column-level all-or-nothing rejection is enforced by the
        // validator's null-delta guard, not by a runtime exception.
        target match {
          case "float" => src.try_cast("double")
          case "str"   => src.try_cast("string")
          case t       => throw new IllegalArgumentException(s"Unsupported cast target '$t'")
        }
      // NA/DEF evaluate over PRESENT values only (reference column loads
      // dropna first): absent input stays absent (NULL verdict -> vacuous
      // pass), so na(x)/def(x) can never fire a violation on a null row —
      // exactly the reference, where such rows are missing from the series
      case (NA, _, _)  => { val e = operands.head; when(e.isNotNull, e.isNull) }
      case (DEF, _, _) => { val e = operands.head; when(e.isNotNull, lit(true)) }
      case (NOT, _, _) => !operands.head
      case (NEG, _, _) => negate(operands.head)
      case (LEN, _, _) => length(operands.head)
      case (NE, _, _)  => binop(cmd, stackArgs)(_ =!= _)
      case (EQ, _, _)  => binop(cmd, stackArgs)(_ === _)
      // pandas logical ops coerce an absent operand to FALSE and the row
      // is absent only when BOTH sides are (verified empirically against
      // the reference VM) — NOT Spark Kleene 3VL, where null&&true=null
      // and null||true=true
      case (OR, _, _)  => binop(cmd, stackArgs)((a, b) =>
        when(a.isNull && b.isNull, lit(null).cast("boolean"))
          .otherwise(coalesce(a, lit(false)) || coalesce(b, lit(false))))
      case (AND, _, _) => binop(cmd, stackArgs)((a, b) =>
        when(a.isNull && b.isNull, lit(null).cast("boolean"))
          .otherwise(coalesce(a, lit(false)) && coalesce(b, lit(false))))
      case (LT, _, _)  => binop(cmd, stackArgs)(_ < _)
      case (GT, _, _)  => binop(cmd, stackArgs)(_ > _)
      case (LE, _, _)  => binop(cmd, stackArgs)(_ <= _)
      case (GE, _, _)  => binop(cmd, stackArgs)(_ >= _)
      case (ADD, _, _) => binop(cmd, stackArgs)(_ + _)
      case (SUB, _, _) => binop(cmd, stackArgs)(_ - _)
      case (MUL, _, _) => binop(cmd, stackArgs)(_ * _)
      case (DIV, _, _) => binop(cmd, stackArgs)(_ / _)
      // pandas % is floor-mod (sign of divisor); Java % truncates. Use
      // floor-mod for parity (kyepy vm.py:106-107; unreachable from the DSL
      // but reachable from artifacts).
      case (MOD, _, _)     => binop(cmd, stackArgs)((a, b) => ((a % b) + b) % b)
      case (CONCAT, _, _)  => binop(cmd, stackArgs)(concat(_, _))
      // unanchored regex *search*, not fullmatch (verified against the
      // reference: pandas str.contains, kyepy vm.py:110-111). Dialect is
      // Java regex here vs Python re — identical for the corpus subset.
      case (MATCHES, _, _) => binop(cmd, stackArgs)(regexp_like(_, _))
      case (COUNT, _, _) =>
        throw new IllegalArgumentException(
          "COUNT is an aggregate op — use ExprCompiler.compileAggregate within a groupBy")
      case other => throw new IllegalArgumentException(s"Cannot compile $other")
    }
  }

  private def binop(cmd: Cmd, stackArgs: List[Column])(f: (Column, Column) => Column): Column = {
    // Boolean inline args coerce to 0/1 for the numeric-signature ops:
    // Python bools are ints, so the reference loads {"add": true} (num
    // signature admits bool) and its VM computes col + 1 — an uncoerced
    // lit(true) here would throw DATATYPE_MISMATCH mid-validation instead
    val arith = NanProducingOps.contains(cmd.op) // ADD SUB MUL DIV MOD (+CAST/NEG, argless)
    def argCol(a: Any): Column = a match {
      case b: Boolean if arith => lit(if (b) 1 else 0)
      case other => litArg(other)
    }
    val ops = stackArgs ++ cmd.args.map(argCol)
    require(ops.size == 2, s"${cmd.op.opName} needs 2 operands, got ${ops.size}")
    f(ops(0), ops(1))
  }

  /** Aggregate-context compile: supports trailing COUNT (per-group distinct
    * count, kyepy vm.py:112-113 — reachable only from hand-written
    * artifacts, never from the DSL). The scalar prefix compiles as usual and
    * the COUNT becomes `count_distinct` for use inside `groupBy().agg`. */
  def compileAggregate(expr: Seq[Cmd], colRef: String => Column = col(_)): Column =
    expr.lastOption match {
      case Some(Cmd(Op.COUNT, _)) => count_distinct(compile(expr.dropRight(1), colRef))
      case _                      => compile(expr, colRef)
    }
}
