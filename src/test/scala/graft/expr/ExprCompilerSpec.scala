package graft.expr

import graft.SparkSuite
import graft.schema.{Cmd, Op}
import org.apache.spark.sql.functions._

class ExprCompilerSpec extends SparkSuite {
  import Op._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1.0, 4.0, "abc", true),
      (-2.0, 3.0, "xxaxx", false),
      (7.0, -3.0, "b", true)
    ).toDF("a", "b", "s", "f")
  }

  private def evalD(expr: List[Cmd]): Seq[Any] =
    df.select(ExprCompiler.compile(expr).as("r")).collect().map(_.get(0)).toSeq

  test("arithmetic: add/sub/mul/div/neg") {
    assert(evalD(List(Cmd.one(COL, "a"), Cmd.one(COL, "b"), Cmd(ADD))) == Seq(5.0, 1.0, 4.0))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd.one(COL, "b"), Cmd(SUB))) == Seq(-3.0, -5.0, 10.0))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(VAL, List(2.0)), Cmd(MUL))) == Seq(2.0, -4.0, 14.0))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(VAL, List(2.0)), Cmd(DIV))) == Seq(0.5, -1.0, 3.5))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(NEG))) == Seq(-1.0, 2.0, -7.0))
  }

  test("boolean inline args coerce to 0/1 in arithmetic ops (Python bool-is-int)") {
    // the reference compiles `x + TRUE` to {"add": true} (bools pass the
    // 'num' signature) and its VM computes col + 1; an uncoerced
    // lit(true) here threw DATATYPE_MISMATCH at evaluation
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(ADD, List(true)))) == Seq(2.0, -1.0, 8.0))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(MUL, List(false)))) == Seq(0.0, -0.0, 0.0))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(SUB, List(true)))) == Seq(0.0, -3.0, 6.0))
  }

  test("floor-mod parity with pandas on negatives") {
    // pandas: -2 % 3 == 1 (sign of divisor); Java % would give -2
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(VAL, List(3.0)), Cmd(MOD))) == Seq(1.0, 1.0, 1.0))
  }

  test("comparisons and logic") {
    assert(evalD(List(Cmd.one(COL, "a"), Cmd.one(COL, "b"), Cmd(LT))) == Seq(true, true, false))
    assert(evalD(List(Cmd.one(COL, "a"), Cmd(VAL, List(1.0)), Cmd(GE))) == Seq(true, false, true))
    assert(evalD(List(Cmd.one(COL, "f"), Cmd(NOT))) == Seq(false, true, false))
    assert(evalD(List(Cmd.one(COL, "f"), Cmd.one(COL, "f"), Cmd(AND))) == Seq(true, false, true))
  }

  test("string ops: len, concat, matches (unanchored search like the reference)") {
    assert(evalD(List(Cmd.one(COL, "s"), Cmd(LEN))) == Seq(3, 5, 1))
    assert(evalD(List(Cmd.one(COL, "s"), Cmd(VAL, List("!")), Cmd(CONCAT))) == Seq("abc!", "xxaxx!", "b!"))
    // verified reference behavior: "xxaxx" matches /a+/ (contains, not fullmatch)
    assert(evalD(List(Cmd.one(COL, "s"), Cmd.one(MATCHES, "a+"))) == Seq(true, true, false))
  }

  test("null ops: NA/DEF evaluate over PRESENT values only (reference dropna)") {
    // verified EMPIRICALLY against the reference VM (r4 sweep): column
    // loads dropna first, so na(x)/def(x) never see a null row — that row
    // is ABSENT (here: NULL verdict -> vacuous pass), and na(x) can never
    // fire a violation. The old isNull/isNotNull compile returned non-null
    // verdicts on null rows the reference never evaluates.
    import spark.implicits._
    val d = Seq(Some(1.0), None).toDF("x")
    val na = d.select(ExprCompiler.compile(List(Cmd.one(COL, "x"), Cmd(NA)))).collect().map(_.get(0)).toSeq
    val de = d.select(ExprCompiler.compile(List(Cmd.one(COL, "x"), Cmd(DEF)))).collect().map(_.get(0)).toSeq
    assert(na == Seq(false, null), s"na: present->false, absent->absent, got $na")
    assert(de == Seq(true, null), s"def: present->true, absent->absent, got $de")
  }

  test("AND/OR null semantics are ASYMMETRIC (pandas left-NaN-poison rule)") {
    // reference (pandas logical ops), verified empirically incl. the
    // runtime fuzz campaign (cases 0037/0239): a missing LEFT operand
    // NaN-poisons the row and the result NaN is filled FALSE — so
    // `absent | true` is False (a REPORTED violation), while a missing
    // RIGHT operand is filled False BEFORE the op (`true | absent` = True).
    // Absent (null) only when BOTH sides are. NOT Spark Kleene 3VL.
    import spark.implicits._
    val d = Seq((Some(3.0), Some(5.0)), (None, Some(5.0)), (Some(7.0), Some(9.0)),
      (None, None), (Some(200.0), Some(1.0)), (None, Some(9.0))).toDF("x", "y")
    val andP = ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(GT, 5.0),
      Cmd.one(COL, "y"), Cmd(DEF), Cmd(AND)))
    assert(d.select(andP).collect().map(_.get(0)).toSeq ==
      Seq(false, false, true, null, true, false))
    val orP = ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(NA),
      Cmd.one(COL, "y"), Cmd.one(GT, 5.0), Cmd(OR)))
    // row 2 (x=null, y=5): left absent, right false -> false
    // row 6 (x=null, y=9): left absent, right TRUE -> still false
    assert(d.select(orP).collect().map(_.get(0)).toSeq ==
      Seq(false, false, true, null, false, false))
    // right-absent with left TRUE stays true (right pre-filled False)
    val orR = ExprCompiler.compile(List(
      Cmd.one(COL, "y"), Cmd(DEF),
      Cmd.one(COL, "x"), Cmd.one(GT, 5.0), Cmd(OR)))
    assert(d.select(orR).collect().map(_.get(0)).toSeq ==
      Seq(true, true, true, null, true, true))
  }

  test("MOD and DIV by zero follow pandas (NaN / IEEE inf), not ANSI errors") {
    import spark.implicits._
    val d = Seq(Some(7.0), Some(-7.0), Some(0.0), None).toDF("x")
    val mod0 = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(MOD, 0.0)))).collect().map(_.get(0)).toSeq
    assert(mod0.take(3).forall(v => v.asInstanceOf[Double].isNaN), s"x % 0 must be NaN, got $mod0")
    assert(mod0(3) == null, "null % 0 stays null")
    // nanAbsent (assertion) mode: the NaN is dropped -> NULL -> vacuous
    val mod0a = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(MOD, 0.0)), nanAbsent = true)).collect().map(_.get(0)).toSeq
    assert(mod0a == Seq(null, null, null, null), s"assertion mode: x % 0 absent, got $mod0a")
    val div0 = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(DIV, 0.0)))).collect().map(_.get(0)).toSeq
    assert(div0(0) == Double.PositiveInfinity && div0(1) == Double.NegativeInfinity,
      s"x/0 IEEE inf, got $div0")
    assert(div0(2).asInstanceOf[Double].isNaN && div0(3) == null, s"0/0 NaN, null/0 null, got $div0")
  }

  test("boolean operands coerce to numbers on arith and numeric comparisons") {
    // Python bool-is-int: the reference VM computes `x - True` as x - 1
    // and `x < True` as x < 1.0 (runtime-fuzz crash cases 0154/0168)
    import spark.implicits._
    val d = Seq(0.5, 2.0).toDF("x")
    val sub = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(VAL, List(true)), Cmd(SUB)))).collect().map(_.getDouble(0)).toSeq
    assert(sub == Seq(-0.5, 1.0), s"x - true = x - 1, got $sub")
    val lt = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(VAL, List(true)), Cmd(LT)),
      colTag = _ => ExprCompiler.Tag.Num)).collect().map(_.getBoolean(0)).toSeq
    assert(lt == Seq(true, false), s"x < true = x < 1.0, got $lt")
    // inline form on a comparison coerces the same way
    val ge = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(GE, List(true))),
      colTag = _ => ExprCompiler.Tag.Num)).collect().map(_.getBoolean(0)).toSeq
    assert(ge == Seq(false, true), s"x >= true = x >= 1.0, got $ge")
    // bool-vs-bool equality stays boolean (any-signature `flag == true`)
    val fd = Seq(true, false).toDF("flag")
    val eqB = fd.select(ExprCompiler.compile(List(
      Cmd.one(COL, "flag"), Cmd(EQ, List(true))),
      colTag = _ => ExprCompiler.Tag.Bool)).collect().map(_.getBoolean(0)).toSeq
    assert(eqB == Seq(true, false))
  }

  test("integral inline literals stay exact above 2^53") {
    import spark.implicits._
    val big = 9007199254740993L // 2^53 + 1: rounds to ...992 as a double
    val d = Seq(big, big - 1).toDF("id")
    val eq = d.select(ExprCompiler.compile(List(Cmd.one(COL, "id"), Cmd(EQ, List(big)))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(eq == Seq(true, false),
      s"artifact int literals must compare exactly (reference int64), got $eq")
  }

  test("cast: string->float and float->str") {
    import spark.implicits._
    val d = Seq("1", "2.5").toDF("x")
    val c = d.select(ExprCompiler.compile(List(Cmd.one(COL, "x"), Cmd.one(CAST, "float")))).collect().map(_.get(0)).toSeq
    assert(c == Seq(1.0, 2.5))
    val s = df.select(ExprCompiler.compile(List(Cmd.one(COL, "a"), Cmd.one(CAST, "str")))).collect().map(_.get(0)).toSeq
    assert(s == Seq("1.0", "-2.0", "7.0"))
  }

  test("inlined literal args equal stacked VAL form") {
    val inlined = List(Cmd.one(COL, "a"), Cmd.one(GT, 0))
    val stacked = List(Cmd.one(COL, "a"), Cmd(VAL, List(0)), Cmd(GT))
    assert(evalD(inlined) == evalD(stacked))
  }

  test("INLINE logical args keep the left operand's index (no False-poison)") {
    // r5 probes 1a-1f: `{"or": true}` applies a raw Python scalar to the
    // left series VALUE-wise — an absent left row stays ABSENT (vacuous),
    // unlike the stacked form where a full-index VAL right operand aligns
    // and the absent left poisons to False. The two forms are NOT
    // equivalent for AND/OR.
    import spark.implicits._
    val d = Seq(Some(10.0), Some(1.0), None).toDF("x")
    def run(cmds: List[Cmd]): Seq[Any] =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Num))
        .collect().map(_.get(0)).toSeq
    val base = List(Cmd.one(COL, "x"), Cmd.one(GT, 5.0))
    assert(run(base :+ Cmd(OR, List(true)))  == Seq(true, true, null))
    assert(run(base :+ Cmd(OR, List(false))) == Seq(true, false, null))
    assert(run(base :+ Cmd(AND, List(true))) == Seq(true, false, null))
    assert(run(base :+ Cmd(AND, List(false))) == Seq(false, false, null))
    // stacked VAL form: absent left -> False (the asymmetric rule)
    assert(run(base ++ List(Cmd(VAL, List(true)), Cmd(OR))) == Seq(true, true, false))
  }

  test("bool+bool is logical OR, bool*bool logical AND (numpy, r5 probes 2a-2c)") {
    import spark.implicits._
    val d = Seq(true, false).toDF("flag")
    def run(cmds: List[Cmd]): Seq[Any] =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Bool))
        .collect().map(_.get(0)).toSeq
    val f = Cmd.one(COL, "flag")
    // stacked and inline both logical
    assert(run(List(f, Cmd(VAL, List(true)), Cmd(ADD))) == Seq(true, true))
    assert(run(List(f, Cmd(ADD, List(true)))) == Seq(true, true))
    assert(run(List(f, Cmd(VAL, List(true)), Cmd(MUL))) == Seq(true, false))
    // the logical result feeds comparisons as 1/0 (True == 1.0 is True,
    // True == 2.0 is False — probes 2a/2d/f1)
    assert(run(List(f, Cmd(ADD, List(true)), Cmd.one(EQ, 1.0))) == Seq(true, true))
    assert(run(List(f, Cmd(ADD, List(true)), Cmd.one(EQ, 2.0))) == Seq(false, false))
    // ...and casts to str Python-style (probe g1)
    assert(run(List(f, Cmd(ADD, List(true)), Cmd.one(CAST, "str"))) == Seq("True", "True"))
    assert(run(List(f, Cmd.one(CAST, "str"))) == Seq("True", "False"))
  }

  test("cross-type EQ/NE is elementwise False/True; ordered comparisons vacuous") {
    // r5 probes 5a-5f: pandas str==bool / str==num completes all-False
    // (every present row a violation), str<num CRASHES the reference —
    // vacuous here, never an ANSI analysis error
    import spark.implicits._
    val d = Seq(Some("x"), Some("y"), None).toDF("s")
    def run(cmds: List[Cmd]): Seq[Any] =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Str))
        .collect().map(_.get(0)).toSeq
    val s = Cmd.one(COL, "s")
    assert(run(List(s, Cmd(EQ, List(true)))) == Seq(false, false, null))
    assert(run(List(s, Cmd(EQ, List(5.0)))) == Seq(false, false, null))
    assert(run(List(s, Cmd(VAL, List(true)), Cmd(EQ))) == Seq(false, false, null))
    assert(run(List(s, Cmd(NE, List(true)))) == Seq(true, true, null))
    assert(run(List(s, Cmd(LT, List(5.0)))) == Seq(null, null, null))
    // crash-classes on typed operands complete as vacuous/numeric
    assert(run(List(s, Cmd(MATCHES, List("x")))) == Seq(true, false, null)) // str ok
    val dn = Seq(1.0).toDF("n")
    def runN(cmds: List[Cmd]): Seq[Any] =
      dn.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Num))
        .collect().map(_.get(0)).toSeq
    assert(runN(List(Cmd.one(COL, "n"), Cmd(LEN))) == Seq(null))          // .str.len crash
    assert(runN(List(Cmd.one(COL, "n"), Cmd(MATCHES, List("x")))) == Seq(null))
    assert(runN(List(Cmd.one(COL, "n"), Cmd(NOT))) == Seq(null))          // ~float crash
  }

  test("DIV honors IEEE negative-zero divisors and NaN numerators (r5 probes 3a/3b)") {
    import spark.implicits._
    val d = Seq(7.0, -7.0).toDF("x")
    // 7 / neg(0) = -Inf: the divisor's zero SIGN matters
    val negz = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(VAL, List(0.0)), Cmd(NEG), Cmd(DIV))))
      .collect().map(_.getDouble(0)).toSeq
    assert(negz == Seq(Double.NegativeInfinity, Double.PositiveInfinity),
      s"x / -0.0 flips the infinity sign, got $negz")
    // NaN numerator over a zero divisor is NaN, not +Inf (Spark's NaN > 0
    // is true — the zero branch must check isnan first)
    val dn = Seq((0.0, 0.0)).toDF("x", "y")
    val nanNum = dn.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(COL, "y"), Cmd(DIV), // 0/0 = NaN
      Cmd.one(COL, "y"), Cmd(DIV))))                  // NaN/0
      .collect().map(_.getDouble(0)).toSeq
    assert(nanNum.head.isNaN, s"NaN/0 must be NaN, got $nanNum")
  }

  test("MOD with a non-zero int literal preserves int64 typing (r5 probes 4c/k1)") {
    import spark.implicits._
    val d = Seq(5L).toDF("x")
    // pandas int64 % 3 = int64 2 -> str "2"; % 3.0 promotes -> "2.0"
    val intMod = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(MOD, List(3)), Cmd.one(CAST, "str"))))
      .collect().map(_.getString(0)).toSeq
    assert(intMod == Seq("2"), s"int %% int stays int64, got $intMod")
    val fltMod = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(MOD, List(3.0)), Cmd.one(CAST, "str"))))
      .collect().map(_.getString(0)).toSeq
    assert(fltMod == Seq("2.0"), s"int %% float promotes, got $fltMod")
    // floor-mod sign with negative int divisors stays exact: 5 % -3 = -1
    val negMod = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(MOD, List(-3)), Cmd.one(CAST, "str"))))
      .collect().map(_.getString(0)).toSeq
    assert(negMod == Seq("-1"), s"5 %% -3 = -1 (pandas), got $negMod")
  }

  test("bool upcasts to the OTHER operand's dtype (int64 + True stays int64)") {
    // probed live: (pd.Series([5], dtype=int64) + True).astype(str) == "6"
    // (not "6.0"); int64 % True stays int64 0. The bool coerces to a
    // bigint 1/0 and ordinary numeric promotion picks the result type.
    import spark.implicits._
    val d = Seq(5L).toDF("x")
    def run(cmds: List[Cmd]): Seq[Any] =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Num))
        .collect().map(_.get(0)).toSeq
    assert(run(List(Cmd.one(COL, "x"), Cmd(ADD, List(true)), Cmd.one(CAST, "str"))) == Seq("6"))
    assert(run(List(Cmd.one(COL, "x"), Cmd(MOD, List(true)), Cmd.one(CAST, "str"))) == Seq("0"))
    // float keeps float: 5.0 + True = 6.0
    val df2 = Seq(5.0).toDF("x")
    val f = df2.select(ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(ADD, List(true)), Cmd.one(CAST, "str"))))
      .collect().map(_.get(0)).toSeq
    assert(f == Seq("6.0"))
    // x / False = x / 0 (IEEE), x / True = x / 1
    assert(run(List(Cmd.one(COL, "x"), Cmd(DIV, List(false)))) == Seq(Double.PositiveInfinity))
    assert(run(List(Cmd.one(COL, "x"), Cmd(DIV, List(true)))) == Seq(5.0))
  }

  test("DIV/MOD on a string operand are vacuous (reference TypeError), never ANSI casts") {
    import spark.implicits._
    val d = Seq("5", "x").toDF("s")
    def run(cmds: List[Cmd]): Seq[Any] =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Str))
        .collect().map(_.get(0)).toSeq
    // an unguarded cast would CRASH on "x" under ANSI and silently divide "5"
    assert(run(List(Cmd.one(COL, "s"), Cmd(DIV, List(2.0)))) == Seq(null, null))
    assert(run(List(Cmd.one(COL, "s"), Cmd(MOD, List(2.0)))) == Seq(null, null))
  }

  test("str * int COLUMN repeats elementwise (pandas str-series * int64-series)") {
    import spark.implicits._
    val d = Seq(("ab", 2L), ("cd", 3L), ("ef", -1L)).toDF("s", "n")
    val tags = Map("s" -> ExprCompiler.Tag.Str, "n" -> ExprCompiler.Tag.Num)
    val rep = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "s"), Cmd.one(COL, "n"), Cmd(MUL)),
      colTag = tags.apply)).collect().map(_.get(0)).toSeq
    assert(rep == Seq("abab", "cdcdcd", ""), s"negative multiplier -> empty, got $rep")
    // the single-edge-reachable form: s * len(s)
    val selfRep = d.select(ExprCompiler.compile(List(
      Cmd.one(COL, "s"), Cmd.one(COL, "s"), Cmd(LEN), Cmd(MUL)),
      colTag = tags.apply)).collect().map(_.get(0)).toSeq
    assert(selfRep == Seq("abab", "cdcd", "efef"))
  }

  test("str * int literal repeats the string (Python `'ab' * 3`)") {
    import spark.implicits._
    val d = Seq("ab").toDF("s")
    def one(cmds: List[Cmd]): Any =
      d.select(ExprCompiler.compile(cmds, colTag = _ => ExprCompiler.Tag.Str))
        .collect().map(_.get(0)).head
    assert(one(List(Cmd.one(COL, "s"), Cmd(MUL, List(3)))) == "ababab")
    // float multiplier crashes the reference -> vacuous here
    assert(one(List(Cmd.one(COL, "s"), Cmd(MUL, List(3.0)))) == null)
    // bools are ints: 'ab' * True = 'ab', * False = '' (probed live)
    assert(one(List(Cmd.one(COL, "s"), Cmd(MUL, List(true)))) == "ab")
    assert(one(List(Cmd.one(COL, "s"), Cmd(MUL, List(false)))) == "")
    // a stacked bool multiplier repeats elementwise too
    assert(one(List(Cmd.one(COL, "s"), Cmd(VAL, List(false)), Cmd(MUL))) == "")
    // an out-of-int-range runtime multiplier COMPLETES (crash-class:
    // the reference MemoryErrors; an ANSI cast would kill the job)
    val big = Seq(("ab", 5e9)).toDF("s", "n")
    val tags = Map("s" -> ExprCompiler.Tag.Str, "n" -> ExprCompiler.Tag.Num)
    val r = big.select(ExprCompiler.compile(List(
      Cmd.one(COL, "s"), Cmd.one(COL, "n"), Cmd(MUL)), colTag = tags.apply))
      .collect().map(_.get(0)).head
    assert(r == "", s"overflow multiplier completes as empty, got '$r'")
  }

  test("AND/OR on a known non-bool operand are vacuous, never analysis errors") {
    // Python: float|True / str|True raise TypeError (crash-class);
    // int64|True is numpy bitwise — both land on the documented vacuous
    // deviation; an unguarded Spark `||` would refuse the type at
    // ANALYSIS and abort the whole job
    import spark.implicits._
    val d = Seq(5.0).toDF("n")
    def run(tag: ExprCompiler.Tag, cmds: List[Cmd]): Any =
      d.select(ExprCompiler.compile(cmds, colTag = _ => tag))
        .collect().map(_.get(0)).head
    assert(run(ExprCompiler.Tag.Num, List(Cmd.one(COL, "n"), Cmd(OR, List(true)))) == null)
    assert(run(ExprCompiler.Tag.Num, List(Cmd.one(COL, "n"), Cmd(VAL, List(true)), Cmd(AND))) == null)
    val s = Seq("x").toDF("n")
    val r = s.select(ExprCompiler.compile(
      List(Cmd.one(COL, "n"), Cmd(OR, List(false))),
      colTag = _ => ExprCompiler.Tag.Str)).collect().map(_.get(0)).head
    assert(r == null)
  }

  test("COUNT compiles in aggregate context as distinct count") {
    val c = ExprCompiler.compileAggregate(List(Cmd.one(COL, "s"), Cmd(COUNT)))
    val n = df.agg(c).collect()(0).getLong(0)
    assert(n == 3)
    intercept[IllegalArgumentException] {
      ExprCompiler.compile(List(Cmd.one(COL, "s"), Cmd(COUNT)))
    }
  }
}
