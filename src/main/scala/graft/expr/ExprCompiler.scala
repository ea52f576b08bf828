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
  * null-bearing inputs (r4 sweep + r5 runtime-fuzz campaigns), not just by
  * reading it. The reference drops null/NaN values at column load
  * (`vm.py:57-60` explode().dropna()) and at every stack push/pop
  * (`vm.py:22-29`), so a row whose value is missing is ABSENT from
  * evaluation. Spark NULL models "absent":
  *   - comparisons/arithmetic/string ops: Spark null propagation = absent
  *     stays absent (identical);
  *   - NA/DEF see only PRESENT values (always false/true respectively) and
  *     stay absent on absent input;
  *   - AND/OR between two STACKED series: pandas fills the RIGHT operand's
  *     missing rows with False BEFORE the op, but a missing LEFT operand
  *     NaN-poisons the row and the result NaN is filled False AFTER — so
  *     `absent | true` is False (a reported violation!) while
  *     `true | absent` is True; absent only when BOTH sides are;
  *   - AND/OR with an INLINE literal arg: the raw Python scalar is applied
  *     to the left series VALUE-wise (`series | True`), so the result keeps
  *     the LEFT operand's index — an absent left row stays ABSENT (vacuous),
  *     with no False-poisoning (r5 probes 1a-1d vs 1e-1f).
  * Callers treat a null verdict as a vacuous pass
  * ([[graft.validate.Validator]] wraps predicates in `coalesce(p, true)`).
  *
  * Python dynamic typing — the VM runs whatever numpy/pandas does for the
  * operand dtypes, so several ops are TYPE-DIRECTED (all probed on the
  * reference VM, r5):
  *   - ADD and CONCAT are literally the same `+` (vm.py:97-98, 108-109):
  *     str+str concatenates, bool+bool is LOGICAL OR (numpy bool add),
  *     bool meeting a number upcasts to 1.0/0.0, str meeting a non-str
  *     crashes the reference (we go vacuous);
  *   - MUL: bool*bool is logical AND; str * int-literal REPEATS the string
  *     (Python `'ab' * 3`); str * float crashes;
  *   - int64 stays int64 through arithmetic with int literals (5 % 3 casts
  *     to "2", not "2.0") — a float literal or float column promotes.
  * Static [[Tag]]s tracked through the compile stack reproduce this.
  *
  * Conscious deviations (all crash-or-pathological classes in the
  * reference, each asserted complete-cleanly by RuntimeFuzzSpec):
  *   - comparing two COLUMNS with different null patterns CRASHES the
  *     reference ("Can only compare identically-labeled Series"); here the
  *     null rows are simply vacuous.
  *   - bool+bool over a column CONTAINING nulls switches pandas to object
  *     dtype and Python semantics (True+True == 2, not logical True); the
  *     no-null numpy semantics (logical) are compiled for both.
  *   - ordered comparisons / LEN / MATCHES / NOT / NEG / AND / OR on a
  *     type they crash on in Python evaluate to null (vacuous) here.
  *     `~`/`&`/`|` over a KNOWN-int64 operand set compile to numpy
  *     bitwise (Tag.NumInt, incl. through int-preserving ADD/SUB/MUL/MOD
  *     derivations — r6); over float64 the reference TypeErrors (vacuous
  *     here), and over a Tag.Num (float-or-unknown-kind) operand the
  *     static tag cannot prove int-ness, so it is vacuous too — the
  *     residual deviation class is exactly "int64 logical op behind a
  *     dynamically-int-valued Num slot", value-dependent by nature.
  *   - a non-bool FINAL assertion verdict: all-truthy passes silently
  *     (exact parity via [[asVerdict]]); any falsy row crashes the
  *     reference (label-indexing in result[~result]) where this engine
  *     fails those rows cleanly.
  *   - int-typed MOD/DIV with a RUNTIME (column) divisor forces a double
  *     result (pandas' result dtype is value-dependent: any zero divisor
  *     promotes int64 to float64 — not statically reproducible).
  */
object ExprCompiler {

  /** NaN → NULL for a numeric Column — the single shared "NaN is missing"
    * mapping (pandas treats NaN exactly like null; Spark treats it as a
    * value that compares greater than everything, groups with itself, and
    * matches itself in joins). Apply only to float/double-typed inputs —
    * `isnan` rejects non-numeric types at analysis. */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Static type tag tracked through the compile stack — the minimum
    * knowledge needed to reproduce Python's dynamic operator dispatch
    * (bool-is-int coercion, str `+` = concat, bool `+` = logical or).
    * Literals and op outputs have known tags; COL resolves through
    * `colTag` (the validator passes declared edge types; raw callers
    * default to Unknown, which keeps the legacy numeric/concat forms). */
  sealed trait Tag
  object Tag {
    case object Bool extends Tag
    /** Float-or-unknown-kind numeric. */
    case object Num extends Tag
    /** KNOWN-integral numeric (int64 column / int literal): Python defines
      * `&`/`|`/`~` on it (bitwise) where float crashes — the only dispatch
      * decisions that read the int/float split; everywhere else NumInt
      * [[widen]]s to Num. */
    case object NumInt extends Tag
    case object Str extends Tag
    case object Unknown extends Tag
    def ofLiteral(a: Any): Tag = a match {
      case _: Boolean       => Bool
      case _: Int | _: Long => NumInt
      case _: Double        => Num
      case _: String        => Str
      case _                => Unknown
    }
    /** The one Spark-schema -> Tag mapping (S3 cast programs and S4
      * assertions must agree on it). */
    def ofDataType(dt: org.apache.spark.sql.types.DataType): Tag = {
      import org.apache.spark.sql.types._
      dt match {
        case BooleanType => Bool
        // IntegralType itself is private[sql]
        case ByteType | ShortType | IntegerType | LongType => NumInt
        case _: NumericType => Num
        case _: StringType  => Str
        case _              => Unknown
      }
    }
    /** Collapse the int/float split for the int-blind dispatch sites. */
    def widen(t: Tag): Tag = if (t == NumInt) Num else t
  }

  /** A stack slot: the compiled Column, its static type tag, and — when the
    * slot is a direct literal (VAL or inline arg) — the literal value, which
    * lets MOD/DIV specialize on a plan-time-known divisor. */
  private case class TV(col: Column, tag: Tag, litVal: Option[Any] = None)

  /** Compile a program to a row-scalar Column. `colRef` resolves COL names
    * (lets callers redirect to renamed/cast columns).
    *
    * @param nanAbsent reference-assertion semantics: the VM drops NaN at
    *   EVERY stack push/pop (vm.py:22-29), so NaN produced MID-expression
    *   (a float cast of "NaN", Infinity*0) makes the row absent — wrap
    *   numeric-tagged arithmetic and float-cast outputs in [[nanToNull]].
    *   Off by default: the S3 cast path must NOT count a parsed NaN as a
    *   cast failure in its null-delta guard (the reference stores it as a
    *   NaN value whose missing-ness downstream stages apply themselves), and
    *   plain expression evaluation (q_expr_opcodes) keeps raw Spark
    *   arithmetic.
    * @param colTag declared type of a COL reference ([[Tag.Unknown]] when
    *   the caller has no schema knowledge) — drives the type-directed
    *   compiles above. */
  def compile(expr: Seq[Cmd], colRef: String => Column = col(_),
              nanAbsent: Boolean = false,
              colTag: String => Tag = _ => Tag.Unknown): Column =
    compileWithTag(expr, colRef, nanAbsent, colTag)._1

  /** [[compile]] plus the program's static output [[Tag]] — callers that
    * consume the result as an assertion VERDICT need the tag to apply the
    * reference loader's non-bool truthiness (see [[asVerdict]]). */
  def compileWithTag(expr: Seq[Cmd], colRef: String => Column = col(_),
              nanAbsent: Boolean = false,
              colTag: String => Tag = _ => Tag.Unknown): (Column, Tag) = {
    var stack: List[TV] = Nil

    def pop(): TV = stack match {
      case h :: t => stack = t; h
      case Nil    => throw new IllegalStateException("Expression stack underflow")
    }

    for (cmd <- expr) {
      val stackArgs = List.fill(cmd.numStackArgs)(pop()).reverse
      val out = eval(cmd, stackArgs, colRef)
      val tag = outTag(cmd, stackArgs, colTag)
      // NaN-as-missing applies to numeric outputs only (isnan rejects
      // boolean/string at analysis; a bool-tagged ADD is a logical op)
      val guarded =
        if (nanAbsent && NanProducingOps(cmd.op) && tag == Tag.Num) nanToNull(out)
        else out
      val litVal = cmd.op match {
        case Op.VAL => cmd.args.headOption
        case _      => None
      }
      stack = TV(guarded, tag, litVal) :: stack
    }
    stack match {
      case TV(res, t, _) :: Nil => (res, t)
      case s => throw new IllegalStateException(s"Program left ${s.size} values on stack")
    }
  }

  /** Convert a compiled program to the boolean the reference loader's
    * `result.all()` truthiness implies when the final value is NOT a bool
    * series (loader.py:123): nonzero numbers and non-empty strings are
    * truthy. When every row is truthy the reference passes silently —
    * matched exactly here. When ANY row is falsy the reference walks into
    * `result[~result]`, which on a non-bool series is label indexing /
    * a TypeError — a CRASH class, so the row-wise falsy-fails completion
    * below is a valid clean completion (documented deviation). */
  def asVerdict(c: Column, t: Tag): Column = t match {
    case Tag.Num | Tag.NumInt => c =!= lit(0)
    case Tag.Str              => c =!= lit("")
    case _                    => c
  }

  /** Output tag per op, given the popped operand slots (inline literal args
    * are appended, mirroring the VM's arg order; MOD reads the divisor
    * slot's literal value to split the int64-preserving literal path from
    * the forced-double runtime path). */
  private def outTag(cmd: Cmd, stackArgs: List[TV], colTag: String => Tag): Tag = {
    import Op._
    val argTags = stackArgs.map(_.tag) ++ cmd.args.map(Tag.ofLiteral)
    cmd.op match {
      case COL => cmd.args match {
        case List(name: String) => colTag(name)
        case _                  => Tag.Unknown
      }
      case VAL => cmd.args.headOption.map(Tag.ofLiteral).getOrElse(Tag.Unknown)
      case CAST => if (cmd.args.lastOption.contains("str")) Tag.Str else Tag.Num
      // ~int64 is bitwise invert with an int64 result (probed live)
      case NOT => if (argTags == List(Tag.NumInt)) Tag.NumInt else Tag.Bool
      // int64 `&`/`|` int64 is numpy BITWISE with an int64 result (r6
      // probes: mid-expression it feeds comparisons; as a final verdict
      // the loader's truthiness applies — see asVerdict)
      case OR | AND =>
        if (argTags == List(Tag.NumInt, Tag.NumInt)) Tag.NumInt else Tag.Bool
      case NA | DEF | LT | GT | LE | GE | EQ | NE | MATCHES => Tag.Bool
      // `+`/`*` are type-directed: str wins (concat / repeat), two bools
      // stay bool (logical), anything else is numeric — and numpy keeps
      // int64 through int/bool-only operand sets (5 + True casts to "6",
      // (a+1)&1 dispatches bitwise — r5 probe h1, r6 derived probes)
      case ADD | CONCAT | MUL =>
        if (argTags.contains(Tag.Str)) Tag.Str
        else if (argTags.length == 2 && argTags.forall(_ == Tag.Bool)) Tag.Bool
        else if (cmd.op == CONCAT && argTags.forall(_ == Tag.Unknown)) Tag.Str
        else if (argTags.length == 2 &&
                 argTags.forall(t => t == Tag.NumInt || t == Tag.Bool)) Tag.NumInt
        else Tag.Num
      // int64 - int64/bool stays int64 (probed: (5 - True) casts to "4");
      // bool - bool is a reference TypeError (vacuous) so its tag is moot
      case SUB =>
        if (argTags.length == 2 && argTags.contains(Tag.NumInt) &&
            argTags.forall(t => t == Tag.NumInt || t == Tag.Bool)) Tag.NumInt
        else Tag.Num
      // numpy -int64 is int64; pandas __neg__ on a BOOL series is LOGICAL
      // NOT with a bool result (-True == False, probed live r6)
      case NEG =>
        if (argTags == List(Tag.NumInt)) Tag.NumInt
        else if (argTags == List(Tag.Bool)) Tag.Bool
        else Tag.Num
      // MOD result dtype follows compileMod's branches: int64 % literal
      // int/bool divisor (NON-zero numeric — zero is the NaN fold) and
      // int64 % bool divisor (literal or runtime; numpy integer
      // mod-by-zero is 0) stay int64; a numeric-literal ZERO divisor or a
      // runtime numeric divisor force double (NaN path / documented
      // value-dependent deviation)
      case MOD =>
        val divisorLit: Option[Any] =
          cmd.args.lastOption.orElse(stackArgs.lastOption.flatMap(_.litVal))
        argTags match {
          // bool dividends are ints here too (bool % 3 -> int64, probed r6)
          case List(Tag.NumInt | Tag.Bool, Tag.Bool) => Tag.NumInt
          case List(Tag.NumInt | Tag.Bool, Tag.NumInt) => divisorLit match {
            case Some(n) if isNumLit(n) && !isZeroNum(n) => Tag.NumInt
            case _ => Tag.Num
          }
          case _ => Tag.Num
        }
      case LEN | DIV | COUNT => Tag.Num
    }
  }

  /** Ops whose output can be NaN when inputs are NaN-free: float casts and
    * float arithmetic (0/0, Inf*0, Inf-Inf, parsed "NaN"). */
  private val NanProducingOps: Set[Op] =
    Set(Op.CAST, Op.ADD, Op.SUB, Op.MUL, Op.DIV, Op.MOD, Op.NEG, Op.CONCAT)

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

  /** Python bool-is-int where a bool meets a number: numpy upcasts the
    * bool to the OTHER operand's dtype (int64 + True stays int64 and
    * casts to "6", float64 + True is 6.0 — probed live), so the bool side
    * becomes a bigint 1/0 and Spark's ordinary numeric promotion does the
    * rest (long+long=long, double+long=double). (r4 empirics;
    * runtime-fuzz cases 0154/0168 + r5 probes 2a-2d/h1/i1). */
  private def numOf(t: TV): Column =
    if (t.tag == Tag.Bool) t.col.cast("bigint") else t.col

  /** Upper bound on string-repeat multiplicity: above it the reference
    * MemoryErrors (crash-class), so a truncated completion is valid — and
    * an uncapped repeat would OOM the executor instead of completing. */
  private val RepeatCap = 1 << 20
  /** Literal repeat count, mirroring the runtime path's completions:
    * negative -> 0 (''), beyond Int range -> 0 (the runtime try_cast
    * yields null -> 0), else capped. */
  private def clampRepeat(l: Long): Int =
    if (l < 0L || l > Int.MaxValue.toLong) 0 else math.min(l, RepeatCap.toLong).toInt

  private def nullBool: Column = lit(null).cast("boolean")
  private def nullDouble: Column = lit(null).cast("double")
  private def nullString: Column = lit(null).cast("string")

  // Python bools are ints for the divisor specialization too: x / True is
  // x / 1 (no guard needed) and x % False is x % 0 (the NaN fold)
  private def isZeroNum(a: Any): Boolean = a match {
    case i: Int     => i == 0
    case l: Long    => l == 0L
    case d: Double  => d == 0.0 // matches -0.0 too
    case b: Boolean => !b
    case _          => false
  }
  private def isNumLit(a: Any): Boolean = a match {
    case _: Int | _: Long | _: Double | _: Boolean => true
    case _                                         => false
  }

  private def eval(cmd: Cmd, stackArgs: List[TV],
                   colRef: String => Column): Column = {
    import Op._
    def operands: List[TV] =
      stackArgs ++ cmd.args.map(a => TV(litArg(a), Tag.ofLiteral(a), Some(a)))
    def unary: TV = {
      val ops = operands
      require(ops.size == 1, s"${cmd.op.opName} needs 1 operand, got ${ops.size}")
      ops.head
    }
    def bin: (TV, TV) = {
      val ops = operands
      require(ops.size == 2, s"${cmd.op.opName} needs 2 operands, got ${ops.size}")
      (ops(0), ops(1))
    }
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
        val srcs = stackArgs ++ cmd.args.dropRight(1).map(a =>
          TV(litArg(a), Tag.ofLiteral(a), Some(a)))
        val src = srcs.headOption.getOrElse(
          throw new IllegalArgumentException("CAST has no operand on the stack or in args"))
        target match {
          case "float" => src.col.try_cast("double")
          // Python str(): booleans render "True"/"False" (pandas
          // astype(str) on a bool series; r5 probe g1) where Spark's cast
          // would lowercase them; numbers keep their natural Spark
          // rendering, which matches str() per dtype ("2" for int64,
          // "2.0" for float64)
          case "str" if src.tag == Tag.Bool =>
            when(src.col, lit("True")).when(!src.col, lit("False"))
          case "str"   => src.col.try_cast("string")
          case t       => throw new IllegalArgumentException(s"Unsupported cast target '$t'")
        }
      // NA/DEF evaluate over PRESENT values only (reference column loads
      // dropna first): absent input stays absent (NULL verdict -> vacuous
      // pass), so na(x)/def(x) can never fire a violation on a null row —
      // exactly the reference, where such rows are missing from the series
      case (NA, _, _)  => { val e = unary.col; when(e.isNotNull, e.isNull) }
      case (DEF, _, _) => { val e = unary.col; when(e.isNotNull, lit(true)) }
      // Python ~: logical not on bools, BITWISE invert on int64
      // (~n == -n-1, probed live), TypeError on float/str series
      // (crash-class -> vacuous; Spark's ! refuses those at analysis)
      case (NOT, _, _) => unary match {
        case TV(c, Tag.Bool | Tag.Unknown, _) => !c
        case TV(c, Tag.NumInt, _)             => negate(c + lit(1L))
        case _                                => nullBool
      }
      // pandas __neg__: numeric negate on numbers, LOGICAL NOT on a bool
      // series (-True == False, bool dtype — probed live r6); -str
      // crashes — vacuous
      case (NEG, _, _) => unary match {
        case TV(_, Tag.Str, _)  => nullDouble
        case TV(c, Tag.Bool, _) => !c
        case t                  => negate(numOf(t))
      }
      // .str.len on a non-string series crashes the reference (r5 probe j1)
      case (LEN, _, _) => unary match {
        case TV(c, Tag.Str | Tag.Unknown, _) => length(c)
        case _                               => nullDouble
      }
      case (EQ, _, _)  => compileEquality(bin, negated = false)
      case (NE, _, _)  => compileEquality(bin, negated = true)
      case (OR, _, _)  => compileLogical(cmd, bin)(_ || _)
      case (AND, _, _) => compileLogical(cmd, bin)(_ && _)
      case (LT, _, _)  => compileOrdered(bin)(_ < _)
      case (GT, _, _)  => compileOrdered(bin)(_ > _)
      case (LE, _, _)  => compileOrdered(bin)(_ <= _)
      case (GE, _, _)  => compileOrdered(bin)(_ >= _)
      // ADD and CONCAT are the same VM op (`+`, vm.py:97-98/108-109) —
      // fully type-directed, see compilePlus
      case (ADD, _, _) | (CONCAT, _, _) => compilePlus(cmd.op, bin)
      case (MUL, _, _) => bin match {
        // bool * bool is numpy logical AND (r5 probe 2c); null handling as
        // compilePlus (NaN propagates through `*`, then drops)
        case (a, b) if a.tag == Tag.Bool && b.tag == Tag.Bool =>
          when(a.col.isNull || b.col.isNull, nullBool).otherwise(a.col && b.col)
        // Python str * int repeats ('ab' * 3 = 'ababab', negative -> "",
        // a whole int64 SERIES repeats elementwise, and bools are ints
        // here too: 'ab' * True = 'ab', * False = '' — all probed live);
        // str * float-literal / str * str crash the reference
        case (a, b) if a.tag == Tag.Str || b.tag == Tag.Str =>
          val (s, n) = if (a.tag == Tag.Str) (a, b) else (b, a)
          n.litVal match {
            case Some(i: Int)  => repeat(s.col, clampRepeat(i.toLong))
            case Some(l: Long) => repeat(s.col, clampRepeat(l))
            case Some(bl: Boolean) => repeat(s.col, if (bl) 1 else 0)
            case Some(_)       => nullString // float/str literal: TypeError
            case None if n.tag != Tag.Str =>
              // runtime multiplier: int64 and bool series repeat in the
              // reference, float crashes (crash-class, so truncating is a
              // valid completion); try_cast so an out-of-int-range or NaN
              // multiplier completes (null -> 0 -> "", matching the
              // literal clamp) instead of throwing the ANSI cast error;
              // the RepeatCap keeps an absurd multiplier from OOMing the
              // executor where the reference would MemoryError (both
              // crash-class completions); pandas '' on negatives
              when(s.col.isNull || n.col.isNull, nullString)
                .otherwise(repeat(s.col,
                  least(greatest(numOf(n).try_cast("int"), lit(0)), lit(RepeatCap))))
            case None          => nullString // str series: TypeError
          }
        case (a, b) => numOf(a) * numOf(b)
      }
      case (SUB, _, _) => bin match {
        // str - anything crashes the reference; bool - bool crashes too
        // ("numpy boolean subtract is not supported", probed live) —
        // vacuous completion like the other crash classes
        case (a, b) if a.tag == Tag.Str || b.tag == Tag.Str => nullDouble
        case (a, b) if a.tag == Tag.Bool && b.tag == Tag.Bool => nullDouble
        case (a, b) => numOf(a) - numOf(b)
      }
      case (DIV, _, _) => compileDiv(bin)
      case (MOD, _, _) => compileMod(bin)
      // unanchored regex *search*, not fullmatch (verified against the
      // reference: pandas str.contains, kyepy vm.py:110-111). Dialect is
      // Java regex here vs Python re — identical for the corpus subset.
      // On a non-string series the reference crashes (.str accessor).
      case (MATCHES, _, _) => bin match {
        case (a, b) if a.tag == Tag.Str || a.tag == Tag.Unknown =>
          regexp_like(a.col, b.col)
        case _ => nullBool
      }
      case (COUNT, _, _) =>
        throw new IllegalArgumentException(
          "COUNT is an aggregate op — use ExprCompiler.compileAggregate within a groupBy")
      case other => throw new IllegalArgumentException(s"Cannot compile $other")
    }
  }

  /** Is this (Tag, Tag) pair a cross-type pair Python evaluates elementwise
    * to False on `==` and crashes on ordered comparison: str vs num/bool. */
  private def strVsNonStr(a0: Tag, b0: Tag): Boolean = {
    val (a, b) = (Tag.widen(a0), Tag.widen(b0))
    (a == Tag.Str && (b == Tag.Num || b == Tag.Bool)) ||
    (b == Tag.Str && (a == Tag.Num || a == Tag.Bool))
  }

  /** EQ/NE. Bool-vs-num compares as 1/0 (True == 1.0 is True, True == 2.0
    * is False — r5 probes i1/2d); str-vs-num/bool is elementwise False in
    * Python (never a crash for `==`/`!=`; r5 probes 5a-5d) — compiled as a
    * constant verdict over present rows. */
  private def compileEquality(ops: (TV, TV), negated: Boolean): Column = ops match {
    case (a, b) if strVsNonStr(a.tag, b.tag) =>
      when(a.col.isNull || b.col.isNull, nullBool).otherwise(lit(negated))
    case (a, b) if (a.tag == Tag.Bool && Tag.widen(b.tag) == Tag.Num) ||
                   (b.tag == Tag.Bool && Tag.widen(a.tag) == Tag.Num) =>
      if (negated) numOf(a) =!= numOf(b) else numOf(a) === numOf(b)
    case (a, b) =>
      if (negated) a.col =!= b.col else a.col === b.col
  }

  /** LT/GT/LE/GE. Bool meeting a number coerces (numpy upcast); str meeting
    * num/bool CRASHES the reference (r5 probes 5e/5f) — vacuous here. */
  private def compileOrdered(ops: (TV, TV))(f: (Column, Column) => Column): Column =
    ops match {
      case (a, b) if strVsNonStr(a.tag, b.tag) => nullBool
      case (a, b) if (a.tag == Tag.Bool && Tag.widen(b.tag) == Tag.Num) ||
                     (b.tag == Tag.Bool && Tag.widen(a.tag) == Tag.Num) =>
        f(numOf(a), numOf(b))
      case (a, b) => f(a.col, b.col)
    }

  /** AND/OR. Two STACKED operands follow the asymmetric pandas alignment
    * rule (left-NaN poisons to False, right-NaN pre-fills to False, both
    * absent -> absent). An INLINE literal arg is a raw Python scalar — the
    * result keeps the LEFT series' index, so absent-left rows stay ABSENT
    * (r5 probes 1a-1f; the two forms are NOT equivalent). */
  private def compileLogical(cmd: Cmd, ops: (TV, TV))
                            (f: (Column, Column) => Column): Column = {
    val (a, b) = ops
    // `|`/`&` on non-bool operands, Python semantics probed live:
    //  - int64 meets bool: numpy bitwise against 0/1 with a BOOLEAN
    //    result (Series([5,2,0]) & True -> [True,False,False]) —
    //    reproduced exactly below;
    //  - int64 meets int64: raw numpy bitwise with an INT64 result (r6
    //    probes: 5&4=4 flows into downstream comparisons; as a FINAL
    //    verdict the loader truthiness applies — see asVerdict). Both
    //    operands are necessarily STACKED (the artifact signature rejects
    //    non-bool inline args on and/or, op.py:24 + schema.Op). A null
    //    int row is vacuous — the reference's int64 column would have
    //    been float64 dtype there and `&` a TypeError (crash class);
    //  - float or str series: TypeError (crash-class -> vacuous; Spark's
    //    `||` would refuse the type at ANALYSIS and abort the whole job).
    (a.tag, b.tag) match {
      case (Tag.NumInt, Tag.Bool) | (Tag.Bool, Tag.NumInt) =>
        val (n, bb) = if (a.tag == Tag.NumInt) (a, b) else (b, a)
        val nInt = n.col.cast("bigint")
        val bInt = bb.col.cast("bigint")
        val bits =
          if (cmd.op == Op.AND) nInt.bitwiseAND(bInt) else nInt.bitwiseOR(bInt)
        return when(a.col.isNull || b.col.isNull, nullBool).otherwise(bits =!= 0)
      case (Tag.NumInt, Tag.NumInt) =>
        val x = a.col.cast("bigint")
        val y = b.col.cast("bigint")
        val bits = if (cmd.op == Op.AND) x.bitwiseAND(y) else x.bitwiseOR(y)
        return when(a.col.isNull || b.col.isNull, lit(null).cast("bigint"))
          .otherwise(bits)
      case (ta, tb)
        if Seq(ta, tb).exists(t => t == Tag.Num || t == Tag.NumInt || t == Tag.Str) =>
        return nullBool
      case _ => // bool/unknown operands: the pandas alignment rules below
    }
    if (cmd.args.nonEmpty) {
      // inline right operand: a non-null literal, so Kleene == pandas on
      // present rows; preserve the left's absence
      when(a.col.isNull, nullBool).otherwise(f(a.col, b.col))
    } else {
      when(a.col.isNull && b.col.isNull, nullBool)
        .when(a.col.isNull, lit(false))
        .otherwise(f(a.col, coalesce(b.col, lit(false))))
    }
  }

  /** The VM's `+` (ADD and CONCAT alike), type-directed like Python:
    *   - str + str -> concat (absent propagates);
    *   - str + num/bool -> reference TypeError -> vacuous;
    *   - bool + bool -> numpy logical OR (r5 probes 2a/2b; NaN propagates
    *     through `+` then drops, so absent-either -> absent — unlike OR's
    *     asymmetric fill);
    *   - otherwise numeric, bools upcast to 1.0/0.0. */
  private def compilePlus(op: Op, ops: (TV, TV)): Column = ops match {
    case (a, b) if strVsNonStr(a.tag, b.tag) => nullString
    // both Str, or Unknown beside a Str: string concat (the DSL's only
    // `+` on strings; a runtime number there would have crashed the
    // reference)
    case (a, b) if a.tag == Tag.Str || b.tag == Tag.Str => concat(a.col, b.col)
    case (a, b) if a.tag == Tag.Bool && b.tag == Tag.Bool =>
      when(a.col.isNull || b.col.isNull, nullBool).otherwise(a.col || b.col)
    // no tag information at all: fall back to the opcode's DSL provenance
    // (the DSL emits CONCAT only for strings, ADD only for numbers)
    case (a, b) if op == Op.CONCAT && a.tag == Tag.Unknown && b.tag == Tag.Unknown =>
      concat(a.col, b.col)
    case (a, b) => numOf(a) + numOf(b)
  }

  /** Pandas float division is IEEE (x/0 = ±inf with the divisor's ZERO SIGN
    * honored, 0/0 = NaN/0 = NaN — r5 probes 3a/3b) where Spark throws under
    * ANSI. A plan-time-known non-zero literal divisor needs no guard; a
    * known zero divisor resolves the sign statically; a runtime divisor
    * detects negative zero through its string rendering (only inside the
    * rarely-taken zero branch). Both operands run as double (pandas `/` is
    * always float64). */
  private def compileDiv(ops: (TV, TV)): Column = {
    val (a0, b0) = ops
    if (a0.tag == Tag.Str || b0.tag == Tag.Str) return nullDouble // ref TypeError
    val a = numOf(a0).cast("double")
    val b = numOf(b0).cast("double")
    def zeroBranch(negZero: Column): Column =
      when(a.isNull, nullDouble)
        .when(isnan(a) || a === 0, lit(Double.NaN))
        .when((a > 0) =!= negZero, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity))
    b0.litVal match {
      case Some(n) if isNumLit(n) && !isZeroNum(n) => a / b
      case Some(n) if isNumLit(n) =>
        val negZ = n match {
          case d: Double => java.lang.Double.compare(d, -0.0d) == 0
          case _         => false
        }
        zeroBranch(lit(negZ))
      case _ =>
        when(b === 0, zeroBranch(b.cast("string").startsWith("-")))
          .otherwise(a / b)
    }
  }

  /** Pandas % is floor-mod (sign of divisor; Java % truncates) and x % 0 is
    * NaN — for ANY dtype (int64 % 0 promotes to float64 NaN) — where Spark
    * ANSI throws REMAINDER_BY_ZERO. A plan-time non-zero literal divisor
    * skips the guard entirely, PRESERVING int64 typing (5 % 3 must cast to
    * "2", not "2.0" — r5 probes 4c/4d/k1); a runtime divisor forces a
    * double result (documented deviation: pandas' dtype there is
    * value-dependent). */
  private def compileMod(ops: (TV, TV)): Column = {
    val (a0, b0) = ops
    if (a0.tag == Tag.Str || b0.tag == Tag.Str) return nullDouble // ref TypeError
    val a = numOf(a0)
    val b = numOf(b0)
    def floorMod(x: Column, y: Column): Column = ((x % y) + y) % y
    // int64 % BOOL-False is numpy integer mod-by-zero: 0 with an integer
    // dtype (probed live) — pandas only intercepts NUMERIC zero divisors
    // to NaN (int64 % 0 and any float % 0/False are NaN). Same for a
    // runtime bool-series divisor over an int column, and for a BOOL
    // dividend (bool % False == 0, integer-typed — int8 in pandas, probed
    // r6; only the cast-str rendering '0' is observable, which the bigint
    // completion here matches).
    val intModBoolZero =
      (a0.tag == Tag.NumInt || a0.tag == Tag.Bool) && b0.tag == Tag.Bool
    def intZero: Column = when(a.isNull, lit(null).cast("bigint")).otherwise(lit(0L))
    b0.litVal match {
      case Some(false) if intModBoolZero => intZero
      case Some(n) if isNumLit(n) && !isZeroNum(n) => floorMod(a, b)
      case Some(n) if isNumLit(n) =>
        when(a.isNull, nullDouble).otherwise(lit(Double.NaN))
      case _ if intModBoolZero =>
        when(a.isNull || b.isNull, lit(null).cast("bigint"))
          .otherwise(when(b === 0, lit(0L)).otherwise(floorMod(a, b)))
      case _ =>
        when(b === 0, when(a.isNull, nullDouble).otherwise(lit(Double.NaN)))
          .otherwise(floorMod(a, b))
    }
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
