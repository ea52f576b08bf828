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

  /** Static type tag tracked through the compile stack — the minimum
    * knowledge needed to reproduce Python's bool-is-int coercion: the
    * reference VM happily computes `series - True` (numpy upcasts bool to
    * 1.0) where an uncoerced Spark `lit(true)` operand would throw
    * DATATYPE_MISMATCH at analysis. Literals and op outputs have known
    * tags; COL resolves through `colTag` (the validator passes declared
    * edge types; raw callers default to Unknown). */
  sealed trait Tag
  object Tag {
    case object Bool extends Tag
    case object Num extends Tag
    case object Str extends Tag
    case object Unknown extends Tag
    def ofLiteral(a: Any): Tag = a match {
      case _: Boolean             => Bool
      case _: Int | _: Long | _: Double => Num
      case _: String              => Str
      case _                      => Unknown
    }
  }

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
    *   expression evaluation (q_expr_opcodes) keeps raw Spark arithmetic.
    * @param colTag declared type of a COL reference ([[Tag.Unknown]] when
    *   the caller has no schema knowledge) — drives bool-is-int coercion. */
  def compile(expr: Seq[Cmd], colRef: String => Column = col(_),
              nanAbsent: Boolean = false,
              colTag: String => Tag = _ => Tag.Unknown): Column = {
    var stack: List[(Column, Tag)] = Nil

    def pop(): (Column, Tag) = stack match {
      case h :: t => stack = t; h
      case Nil    => throw new IllegalStateException("Expression stack underflow")
    }

    for (cmd <- expr) {
      val stackArgs = List.fill(cmd.numStackArgs)(pop()).reverse
      val out = eval(cmd, stackArgs, colRef, colTag)
      val guarded =
        if (nanAbsent && NanProducingOps(cmd.op) &&
            !(cmd.op == Op.CAST && cmd.args.lastOption.contains("str")))
          nanToNull(out)
        else out
      stack = (guarded, outTag(cmd, colTag)) :: stack
    }
    stack match {
      case (res, _) :: Nil => res
      case s => throw new IllegalStateException(s"Program left ${s.size} values on stack")
    }
  }

  /** Output tag per op (independent of operand tags). */
  private def outTag(cmd: Cmd, colTag: String => Tag): Tag = {
    import Op._
    cmd.op match {
      case COL => cmd.args match {
        case List(name: String) => colTag(name)
        case _                  => Tag.Unknown
      }
      case VAL => cmd.args.headOption.map(Tag.ofLiteral).getOrElse(Tag.Unknown)
      case CAST => if (cmd.args.lastOption.contains("str")) Tag.Str else Tag.Num
      case NA | DEF | NOT | OR | AND | LT | GT | LE | GE | EQ | NE | MATCHES => Tag.Bool
      case LEN | NEG | ADD | SUB | MUL | DIV | MOD | COUNT => Tag.Num
      case CONCAT => Tag.Str
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

  private def eval(cmd: Cmd, stackArgs: List[(Column, Tag)],
                   colRef: String => Column, colTag: String => Tag): Column = {
    import Op._
    def operands: List[Column] = stackArgs.map(_._1) ++ cmd.args.map(litArg)
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
        val src = (stackArgs.map(_._1) ++ cmd.args.dropRight(1).map(litArg)).headOption.getOrElse(
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
      case (NE, _, _)  => binop(cmd, stackArgs, colTag)(_ =!= _)
      case (EQ, _, _)  => binop(cmd, stackArgs, colTag)(_ === _)
      // pandas logical-op null semantics, verified EMPIRICALLY against the
      // VM (runtime-fuzz cases 0037/0239) — NOT Spark Kleene 3VL and NOT a
      // symmetric absent->FALSE coercion. pandas fills the RIGHT operand's
      // missing rows with False BEFORE the op, but a missing LEFT operand
      // NaN-poisons the row and the result NaN is filled False AFTER — so
      // `absent | true` is False (a reported violation!) while
      // `true | absent` is True. The row is absent only when BOTH sides are
      // (then it is outside the union index entirely).
      case (OR, _, _)  => binop(cmd, stackArgs, colTag)((a, b) =>
        when(a.isNull && b.isNull, lit(null).cast("boolean"))
          .when(a.isNull, lit(false))
          .otherwise(a || coalesce(b, lit(false))))
      // AND under the same rules: any single absent side yields False
      // (left-absent via the result-NaN fill, right-absent via the pre-op
      // fill making `x && false`), identical to a symmetric coercion.
      case (AND, _, _) => binop(cmd, stackArgs, colTag)((a, b) =>
        when(a.isNull && b.isNull, lit(null).cast("boolean"))
          .when(a.isNull, lit(false))
          .otherwise(a && coalesce(b, lit(false))))
      case (LT, _, _)  => binop(cmd, stackArgs, colTag)(_ < _)
      case (GT, _, _)  => binop(cmd, stackArgs, colTag)(_ > _)
      case (LE, _, _)  => binop(cmd, stackArgs, colTag)(_ <= _)
      case (GE, _, _)  => binop(cmd, stackArgs, colTag)(_ >= _)
      case (ADD, _, _) => binop(cmd, stackArgs, colTag)(_ + _)
      case (SUB, _, _) => binop(cmd, stackArgs, colTag)(_ - _)
      case (MUL, _, _) => binop(cmd, stackArgs, colTag)(_ * _)
      // pandas float division by zero is IEEE (x/0 = ±inf, 0/0 = NaN,
      // runtime-fuzz class: vm.py:104-105) where Spark's Divide checks the
      // divisor and throws under ANSI — reproduce IEEE explicitly.
      case (DIV, _, _) => binop(cmd, stackArgs, colTag)((a, b) =>
        when(b === 0,
          when(a.isNull, lit(null).cast("double"))
            .when(a > 0, lit(Double.PositiveInfinity))
            .when(a < 0, lit(Double.NegativeInfinity))
            .otherwise(lit(Double.NaN)))
          .otherwise(a / b))
      // pandas % is floor-mod (sign of divisor); Java % truncates. Use
      // floor-mod for parity (kyepy vm.py:106-107; unreachable from the DSL
      // but reachable from artifacts). x % 0 is NaN in pandas (== missing
      // under assertion semantics) where Spark ANSI throws REMAINDER_BY_ZERO
      // (runtime-fuzz cases 0156/0259).
      case (MOD, _, _)     => binop(cmd, stackArgs, colTag)((a, b) =>
        when(b === 0, when(a.isNull, lit(null).cast("double")).otherwise(lit(Double.NaN)))
          .otherwise(((a % b) + b) % b))
      case (CONCAT, _, _)  => binop(cmd, stackArgs, colTag)(concat(_, _))
      // unanchored regex *search*, not fullmatch (verified against the
      // reference: pandas str.contains, kyepy vm.py:110-111). Dialect is
      // Java regex here vs Python re — identical for the corpus subset.
      case (MATCHES, _, _) => binop(cmd, stackArgs, colTag)(regexp_like(_, _))
      case (COUNT, _, _) =>
        throw new IllegalArgumentException(
          "COUNT is an aggregate op — use ExprCompiler.compileAggregate within a groupBy")
      case other => throw new IllegalArgumentException(s"Cannot compile $other")
    }
  }

  private val ComparisonOps: Set[Op] =
    Set(Op.LT, Op.GT, Op.LE, Op.GE, Op.EQ, Op.NE)

  private def binop(cmd: Cmd, stackArgs: List[(Column, Tag)],
                    colTag: String => Tag)(f: (Column, Column) => Column): Column = {
    // Python bool-is-int: the reference VM computes `col - True` as col - 1
    // and `col < True` as col < 1.0 (numpy upcasts bool), so a Boolean
    // operand — inline arg OR stacked VAL/subexpression (runtime-fuzz cases
    // 0154/0168) — must coerce to double wherever it meets a number. On the
    // num-signature arithmetic ops every bool coerces; on comparisons only
    // a bool meeting a known-Number other side does (bool-vs-bool equality
    // must stay boolean: `flag == true` is a legitimate any-signature use).
    val arith = NanProducingOps.contains(cmd.op) // ADD SUB MUL DIV MOD (+CAST/NEG, argless)
    val cmp = ComparisonOps.contains(cmd.op)
    val tagged: List[(Column, Tag)] =
      stackArgs ++ cmd.args.map(a => (litArg(a), Tag.ofLiteral(a)))
    require(tagged.size == 2, s"${cmd.op.opName} needs 2 operands, got ${tagged.size}")
    def coerce(self: (Column, Tag), other: (Column, Tag)): Column = self match {
      case (c, Tag.Bool) if arith => c.cast("double")
      case (c, Tag.Bool) if cmp && other._2 == Tag.Num => c.cast("double")
      case (c, _) => c
    }
    f(coerce(tagged(0), tagged(1)), coerce(tagged(1), tagged(0)))
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
