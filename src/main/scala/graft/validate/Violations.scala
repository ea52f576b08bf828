package graft.validate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Violation row shape — the flattened error table of the reference
  * (kyepy `kye/errors/validation_errors.py:117-124`: one row per
  * (row, column) after double-explode; column-level errors carry a null
  * `row`). */
object Violations {
  val schema: StructType = StructType(Seq(
    StructField("err", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("row", LongType, nullable = true),
    StructField("col", StringType, nullable = true),
    StructField("loc", StringType, nullable = true),
    StructField("expected", StringType, nullable = true)))

  /** Small driver-side violation set (column-level errors: MissingIndex,
    * InvalidType). */
  def local(spark: SparkSession,
            rows: Seq[(String, String, Option[Long], Option[String], Option[String], Option[String])]): DataFrame = {
    val data = rows.map { case (err, model, row, c, loc, exp) =>
      Row(err, model, row.map(Long.box).orNull, c.orNull, loc.orNull, exp.orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  def empty(spark: SparkSession): DataFrame = local(spark, Nil)
}
