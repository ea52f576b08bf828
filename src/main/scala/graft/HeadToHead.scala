package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.schema.CompiledSchema
import graft.validate.{Validator, ValidatorConfig}
object HeadToHead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = CompiledSchema.load(
      """{"models": {"Event": {"index": "event_id",
        |  "edges": {"event_id": {"type": "Number"}, "event_type": {"type": "String"}, "value": {"type": "Number"}},
        |  "assertions": [{"msg": "value <= 300", "expr": [{"col": "value"}, {"le": 300}]}]}}}""".stripMargin)
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val ev = spark.read.parquet("/tmp/events10m.parquet")
        .withColumn("_row", col("event_id")).repartition(64)
      val t0 = System.nanoTime()
      val r = new Validator(schema, ValidatorConfig(abortOnEmpty = false)).validate("Event", ev)
      val nv = r.violations.count(); val ns = r.survivors.get.count()
      val dt = (System.nanoTime()-t0)/1e9
      println(f"[h2h] run $i: $dt%.1f s, ${(1e7/dt).round} rows/s, violations=$nv survivors=$ns")
    }
    spark.stop()
  }
}
