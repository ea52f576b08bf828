package graft.schema

/** Opcode set of the portable compiled-schema expression programs.
  *
  * Mirrors the reference VM's instruction set (kyepy `kye/vm/op.py:5-40`):
  * each op has an arity and a signature restricting which operands may be
  * inlined as literal args in the artifact (the rest pop from the stack,
  * `num_stack_args = arity - len(args)`, `kye/compiled.py:24-26`).
  *
  * In this engine programs never execute on a stack machine at runtime —
  * they fold into a Catalyst `Column` tree at plan time (see
  * [[graft.expr.ExprCompiler]]); this enum only defines the artifact
  * contract.
  */
sealed abstract class Op(val opName: String, val arity: Int, val sig: List[String]) {
  /** True when `args` is a legal inline-literal prefix for this op
    * (reference: `op.py:54-72` matches_signature). */
  def matchesSignature(args: List[Any]): Boolean = {
    if (args.length > sig.length) return false
    args.zip(sig).forall {
      case (a, "any")  => a.isInstanceOf[Int] || a.isInstanceOf[Long] || a.isInstanceOf[Double] || a.isInstanceOf[String] || a.isInstanceOf[Boolean]
      // Boolean accepted: Python `isinstance(True, int)` is True, so the
      // reference's 'num' signature admits bools (op.py:61-62)
      case (a, "num")  => a.isInstanceOf[Int] || a.isInstanceOf[Long] || a.isInstanceOf[Double] || a.isInstanceOf[Boolean]
      case (a, "bool") => a.isInstanceOf[Boolean]
      case (a, "str")  => a.isInstanceOf[String]
      case _           => false
    }
  }
}

object Op {
  // Load
  case object COL     extends Op("col", 1, List("str"))
  case object VAL     extends Op("val", 1, List("any"))
  // Type conversion
  case object CAST    extends Op("cast", 2, List("str"))
  // Unary
  case object NA      extends Op("na", 1, Nil)
  case object DEF     extends Op("def", 1, Nil)
  case object NOT     extends Op("not", 1, Nil)
  case object NEG     extends Op("neg", 1, Nil)
  case object LEN     extends Op("len", 1, Nil)
  // Binary
  case object NE      extends Op("ne", 2, List("any"))
  case object EQ      extends Op("eq", 2, List("any"))
  case object OR      extends Op("or", 2, List("bool"))
  case object AND     extends Op("and", 2, List("bool"))
  case object LT      extends Op("lt", 2, List("any"))
  case object GT      extends Op("gt", 2, List("any"))
  case object LE      extends Op("le", 2, List("any"))
  case object GE      extends Op("ge", 2, List("any"))
  case object ADD     extends Op("add", 2, List("num"))
  case object SUB     extends Op("sub", 2, List("num"))
  case object MUL     extends Op("mul", 2, List("num"))
  case object DIV     extends Op("div", 2, List("num"))
  case object MOD     extends Op("mod", 2, List("num"))
  // String
  case object MATCHES extends Op("matches", 2, List("str"))
  case object CONCAT  extends Op("concat", 2, List("str"))
  // Aggregate (artifact-reachable only; no DSL syntax produces it)
  case object COUNT   extends Op("count", 1, Nil)

  val all: List[Op] = List(COL, VAL, CAST, NA, DEF, NOT, NEG, LEN, NE, EQ,
    OR, AND, LT, GT, LE, GE, ADD, SUB, MUL, DIV, MOD, MATCHES, CONCAT, COUNT)

  private val byName: Map[String, Op] = all.map(o => o.opName -> o).toMap

  def forName(name: String): Op =
    byName.getOrElse(name.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(s"Unknown op: $name"))
}
