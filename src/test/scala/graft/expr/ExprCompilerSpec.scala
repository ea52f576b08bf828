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

  test("null ops") {
    import spark.implicits._
    val d = Seq(Some(1.0), None).toDF("x")
    val na = d.select(ExprCompiler.compile(List(Cmd.one(COL, "x"), Cmd(NA)))).collect().map(_.get(0)).toSeq
    val de = d.select(ExprCompiler.compile(List(Cmd.one(COL, "x"), Cmd(DEF)))).collect().map(_.get(0)).toSeq
    assert(na == Seq(false, true))
    assert(de == Seq(true, false))
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
