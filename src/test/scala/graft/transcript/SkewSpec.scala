package graft.transcript

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Skew stress: one conversation 1000× larger than the rest (the "agent
  * loop with 10^5 turns" case of SURVEY §7.4). The key aggregation must
  * absorb it map-side and the window stage must stay correct. */
class SkewSpec extends SparkSuite {

  test("one 200k-turn conversation among 200 small ones validates correctly") {
    import spark.implicits._
    val giant = spark.range(0, 200000).select(
      lit("giant").as("conv_id"), col("id").cast("int").as("turn_idx"),
      lit("user").as("role"), concat(lit("m"), col("id")).as("text"),
      lit(null).cast("string").as("tool"),
      (lit(1704067200L) + col("id")).cast("timestamp").as("ts"))
    val small = spark.range(0, 200).select(explode(sequence(lit(0), lit(9))).as("t"), col("id"))
      .select(concat(lit("c"), col("id")).as("conv_id"), col("t").cast("int").as("turn_idx"),
        lit("assistant").as("role"), lit("x").as("text"),
        lit(null).cast("string").as("tool"),
        (lit(1704067200L) + col("t")).cast("timestamp").as("ts"))
    // inject: drop one mid turn from the giant (gap) and duplicate another
    val data = giant.filter(col("turn_idx") =!= 100000)
      .union(giant.filter(col("turn_idx") === 50000))
      .union(small)
      .repartition(8)

    val report = new TranscriptValidator().validate(data)
    val v = report.violations.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(v == Set(
      (Constraints.SeqGap, "giant", 100001),
      (Constraints.DupKey, "giant", 50000)))
    val verdicts = report.convVerdicts.collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Boolean]("pass")).toMap
    assert(!verdicts("giant"))
    assert(verdicts("c0") && verdicts("c199"))
    report.cleanup()
  }
}
