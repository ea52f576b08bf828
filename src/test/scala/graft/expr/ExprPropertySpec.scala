package graft.expr

import graft.SparkSuite
import graft.schema.{Cmd, Op}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based parity checks for the expression VM's arithmetic
  * semantics vs the reference's Python/pandas behavior — especially MOD,
  * which is floor-mod in Python but truncation-mod in Java/SQL (reference
  * wart handled in ExprCompiler). Randomized over seeded scalacheck draws
  * (same explicit-draw pattern as transcript/PropertySpec — the
  * scalatestplus bridge is not on the offline classpath). */
class ExprPropertySpec extends SparkSuite {
  import Op._

  private def draw[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).map(i => g(params, rng.Seed(1234L + i)).get)
  }

  private val operands: Gen[(Double, Double)] = for {
    a <- Gen.choose(-1000.0, 1000.0)
    b <- Gen.oneOf(Gen.choose(-50.0, -0.5), Gen.choose(0.5, 50.0))
  } yield (a, b)

  /** Python's float % semantics (result carries the divisor's sign). */
  private def pythonMod(a: Double, b: Double): Double = {
    val r = a % b
    if (r != 0 && ((r < 0) != (b < 0))) r + b else r
  }

  test("MOD matches Python floor-mod for random operands of every sign mix") {
    import spark.implicits._
    val cases = draw(operands, 40)
    val df = cases.toDF("a", "b")
    val got = df.select(
      ExprCompiler.compile(List(Cmd.one(COL, "a"), Cmd.one(COL, "b"), Cmd(MOD))).as("m"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), m) =>
      val exp = pythonMod(a, b)
      assert(math.abs(m - exp) < 1e-9, s"$a % $b: got $m expected $exp")
      assert(m == 0 || (m < 0) == (b < 0), s"$a % $b: sign must follow divisor")
    }
  }

  test("NEG/ADD/SUB/MUL/DIV compose like plain arithmetic") {
    import spark.implicits._
    val cases = draw(operands, 25)
    val df = cases.toDF("a", "b")
    val got = df.select(
      ExprCompiler.compile(List(
        Cmd.one(COL, "a"), Cmd(NEG), Cmd.one(COL, "b"), Cmd(MUL),
        Cmd.one(COL, "a"), Cmd(ADD),
        Cmd.one(COL, "b"), Cmd(SUB))).as("v"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), v) =>
      assert(math.abs(v - (((-a) * b + a) - b)) < 1e-9)
    }
  }

  test("CAST str/float round-trips for representative numerics") {
    import spark.implicits._
    val vals = draw(Gen.choose(-100000.0, 100000.0), 20)
    val df = vals.toDF("a")
    val rt = df.select(ExprCompiler.compile(List(
      Cmd.one(COL, "a"), Cmd.one(CAST, "str"), Cmd.one(CAST, "float"))).as("v"))
      .collect().map(_.getDouble(0))
    vals.zip(rt).foreach { case (a, v) => assert(v == a, s"cast round-trip broke $a -> $v") }
  }
}
