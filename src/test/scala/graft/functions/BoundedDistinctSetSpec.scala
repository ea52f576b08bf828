package graft.functions

import graft.SparkSuite
import graft.functions.BoundedDistinctSet.bounded_distinct_set
import org.apache.spark.sql.functions._

/** The bounded aggregate must be bit-identical to
  * `sort_array(collect_set(c))` whenever groups hold ≤ limit distinct
  * values, across partial aggregation + shuffle merges (which exercise
  * serialize/deserialize), and must keep exactly the limit+1 smallest
  * distinct values when a group overflows. */
class BoundedDistinctSetSpec extends SparkSuite {

  test("parity with sort_array(collect_set) under the cap, across merges") {
    import spark.implicits._
    val df = spark.range(0, 5000)
      .select(
        (col("id") % 37).as("k"),
        // ~135 rows/key but only ~20 distinct values/key (dup-heavy)
        (col("id") % 20 * 977 % 101).as("v"),
        concat(lit("s"), col("id") % 13).as("s"))
      .repartition(7) // force partial → shuffle → final merge path
    val got = df.groupBy("k")
      .agg(
        bounded_distinct_set(col("v"), 1000).as("bv"),
        bounded_distinct_set(col("s"), 1000).as("bs"),
        sort_array(collect_set(col("v"))).as("cv"),
        sort_array(collect_set(col("s"))).as("cs"))
    val bad = got.filter(col("bv") =!= col("cv") || col("bs") =!= col("cs")).count()
    assert(bad === 0, "bounded aggregate diverged from sort_array(collect_set)")
  }

  test("overflow keeps the limit+1 smallest distinct values, sorted") {
    val out = spark.range(0, 10000)
      .select(lit(1).as("k"), (lit(9999) - col("id")).as("v")) // descending arrival
      .groupBy("k").agg(bounded_distinct_set(col("v"), 50).as("v"))
      .collect()(0).getSeq[Long](1)
    assert(out === (0L to 50L), "51 = limit+1 smallest values, ascending")
  }

  test("array child flattens per element and skips nulls") {
    import spark.implicits._
    val df = Seq(
      (1, Seq[Integer](3, 1, null)),
      (1, Seq[Integer](2, 1)),
      (1, null)).toDF("k", "v")
    val out = df.groupBy("k").agg(bounded_distinct_set(col("v"), 10).as("v"))
      .collect()(0).getSeq[Int](1)
    assert(out === Seq(1, 2, 3))
  }

  test("strings: binary ordering matches sort_array; empty group of nulls yields []") {
    import spark.implicits._
    val df = Seq((1, null: String), (1, null: String)).toDF("k", "v")
    val out = df.groupBy("k").agg(bounded_distinct_set(col("v"), 10).as("v"))
      .collect()(0).getSeq[String](1)
    assert(out === Seq.empty)
  }
}
