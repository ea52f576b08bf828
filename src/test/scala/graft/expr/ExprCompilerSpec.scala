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

  test("AND/OR coerce an absent operand to false; absent only when both absent") {
    // reference (pandas logical ops): NaN-aligned operand acts as False —
    // NOT Spark Kleene 3VL (null&&true=null, null||true=true). Verified
    // empirically: (x>5)&def(y) on (x=null,y=5) is False (a REPORTED
    // violation), not vacuous; on (null,null) the row is absent.
    import spark.implicits._
    val d = Seq((Some(3.0), Some(5.0)), (None, Some(5.0)), (Some(7.0), Some(9.0)),
      (None, None), (Some(200.0), Some(1.0))).toDF("x", "y")
    val andP = ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd.one(GT, 5.0),
      Cmd.one(COL, "y"), Cmd(DEF), Cmd(AND)))
    assert(d.select(andP).collect().map(_.get(0)).toSeq ==
      Seq(false, false, true, null, true))
    val orP = ExprCompiler.compile(List(
      Cmd.one(COL, "x"), Cmd(NA),
      Cmd.one(COL, "y"), Cmd.one(GT, 5.0), Cmd(OR)))
    assert(d.select(orP).collect().map(_.get(0)).toSeq ==
      Seq(false, false, true, null, false))
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

  test("COUNT compiles in aggregate context as distinct count") {
    val c = ExprCompiler.compileAggregate(List(Cmd.one(COL, "s"), Cmd(COUNT)))
    val n = df.agg(c).collect()(0).getLong(0)
    assert(n == 3)
    intercept[IllegalArgumentException] {
      ExprCompiler.compile(List(Cmd.one(COL, "s"), Cmd(COUNT)))
    }
  }
}
