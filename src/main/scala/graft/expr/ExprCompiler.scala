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
  * Null semantics: Spark's 3-valued logic propagates nulls through every
  * operator below, matching the reference's behavior of dropping NA rows
  * before evaluation (`vm.py:57-60`) *when the caller treats a null verdict
  * as a vacuous pass* — see [[graft.validate.Validator]], which wraps
  * assertion predicates in `coalesce(p, true)`.
  */
object ExprCompiler {

  /** Compile a program to a row-scalar Column. `colRef` resolves COL names
    * (lets callers redirect to renamed/cast columns). */
  def compile(expr: Seq[Cmd], colRef: String => Column = col(_)): Column = {
    var stack: List[Column] = Nil

    def pop(): Column = stack match {
      case h :: t => stack = t; h
      case Nil    => throw new IllegalStateException("Expression stack underflow")
    }

    for (cmd <- expr) {
      val stackArgs = List.fill(cmd.numStackArgs)(pop()).reverse
      stack = eval(cmd, stackArgs, colRef) :: stack
    }
    stack match {
      case res :: Nil => res
      case s          => throw new IllegalStateException(s"Program left ${s.size} values on stack")
    }
  }

  /** Literal inline arg → Column. */
  private def litArg(a: Any): Column = a match {
    case i: Int    => lit(i.toDouble) // reference NUMBER literals are floats (kyepy parser.py:123-124)
    case l: Long   => lit(l.toDouble)
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
      case (NA, _, _)  => operands.head.isNull
      case (DEF, _, _) => operands.head.isNotNull
      case (NOT, _, _) => !operands.head
      case (NEG, _, _) => negate(operands.head)
      case (LEN, _, _) => length(operands.head)
      case (NE, _, _)  => binop(cmd, stackArgs)(_ =!= _)
      case (EQ, _, _)  => binop(cmd, stackArgs)(_ === _)
      case (OR, _, _)  => binop(cmd, stackArgs)(_ || _)
      case (AND, _, _) => binop(cmd, stackArgs)(_ && _)
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
    val ops = stackArgs ++ cmd.args.map(litArg)
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
