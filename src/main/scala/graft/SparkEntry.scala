package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.CompiledSchema
import graft.validate.{Validator, ValidatorConfig}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent oracle in [[oracleSql]].
  *
  * The transcript-shaped input mandated by BASELINE.json `input_hint` is
  * derived deterministically from the `events` table (same derivation in
  * Spark and in the oracle SQL), with error injection (duplicate keys,
  * sequence gaps) keyed off `event_id` arithmetic so both engines inject
  * identically.
  */
object SparkEntry {

  /** Kye compiled artifact used by the engine-path queries: an Event model
    * keyed by event_id with a row assertion. Same JSON format as the
    * reference compiler output (kyepy kye/compiled.py:296-308). */
  private val eventArtifact: String =
    """{"models": {"Event": {
      |  "index": "event_id",
      |  "edges": {
      |    "event_id": {"type": "Number"},
      |    "event_type": {"type": "String"},
      |    "value": {"type": "Number"}
      |  },
      |  "assertions": [
      |    {"msg": "value <= 300", "expr": [{"col": "value"}, {"le": 300}]}
      |  ]}}}""".stripMargin

  private def eventSchema = CompiledSchema.load(eventArtifact)

  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** Transcript table derived from events: conv = user, turns ordered by
    * (ts, event_id); `turn_idx` gets a deterministic +1 gap injection at
    * event_id % 97 == 0. */
  def transcripts(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      col("user_id").cast("string").as("conv_id"),
      (row_number().over(w) - 1 +
        when(col("event_id") % 97 === 0, 1).otherwise(0)).cast("int").as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      col("ts"),
      col("event_id"))
  }

  /** Transcripts with duplicate-(conv_id, turn_idx) injection: rows with
    * event_id % 101 == 0 appear twice. */
  def transcriptsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val t = transcripts(spark, dir)
    t.union(t.filter(col("event_id") % 101 === 0))
  }

  /** Flagship: full Kye validation pipeline over sf0.001 events —
    * violations of `value <= 300` exist at every SF. */
  def entry(spark: SparkSession): DataFrame =
    validateEvents(spark, "/root/testdata/sf0.001")

  private def validateEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("_row", col("event_id")) // natural key as violation anchor
    val result = new Validator(eventSchema, ValidatorConfig(abortOnEmpty = false))
      .validate("Event", ev)
    result.violations
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4 assertions through the real pipeline: violation rows anchored on
    // the natural key
    "q_assert_violations" -> ((s, dir) =>
      validateEvents(s, dir).select(
        col("err"), col("row").as("row_id"), col("col").as("col_name"))),

    // S6 cardinality+group through the real pipeline: survivors of a clean
    // model = the index-grouped table
    "q_kye_survivors" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_id"), col("event_type"))
        .withColumn("_row", col("event_id"))
      val schema = CompiledSchema.load(
        """{"models": {"Event": {"index": "event_id", "edges": {
          |  "event_id": {"type": "Number"}, "event_type": {"type": "String"}}}}}""".stripMargin)
      new Validator(schema, ValidatorConfig(abortOnEmpty = false))
        .validate("Event", ev).survivors.get
    }),

    // uniqueness of (conv_id, turn_idx) — dup-injected transcripts
    "q_transcript_uniqueness" -> ((s, dir) =>
      transcriptsWithDups(s, dir)
        .groupBy(col("conv_id"), col("turn_idx"))
        .agg(count(lit(1)).as("n_dup"))
        .filter(col("n_dup") > 1)),

    // gap-free 0..n sequence per conversation (aggregate formulation: no
    // per-conv sort; count/min/max are mergeable → skew-safe)
    "q_transcript_seq_gaps" -> ((s, dir) =>
      transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          countDistinct(col("turn_idx")).as("n_distinct"),
          min(col("turn_idx")).as("min_turn"),
          max(col("turn_idx")).as("max_turn"))
        .filter(!(col("min_turn") === 0 && col("max_turn") === col("n_distinct") - 1))),

    // single-pass column stats profile (exact variants for the oracle)
    "q_stats_profile" -> ((s, dir) =>
      events(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props")))
  )

  def oracleSql: Map[String, String] = {
    val tSql =
      """SELECT CAST(user_id AS VARCHAR) AS conv_id,
        | CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
        |      + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END AS INTEGER) AS turn_idx,
        | event_type AS role, props AS text, ts, event_id
        |FROM events""".stripMargin
    Map(
      "q_assert_violations" ->
        """SELECT 'AssertionFailed' AS err, event_id AS row_id, 'value' AS col_name
          |FROM events WHERE NOT (value <= 300)""".stripMargin,
      "q_kye_survivors" ->
        "SELECT event_id, event_type FROM events",
      "q_transcript_uniqueness" ->
        s"""WITH t AS ($tSql),
           | d AS (SELECT * FROM t UNION ALL SELECT * FROM t WHERE event_id % 101 = 0)
           |SELECT conv_id, turn_idx, count(*) AS n_dup
           |FROM d GROUP BY conv_id, turn_idx HAVING count(*) > 1""".stripMargin,
      "q_transcript_seq_gaps" ->
        s"""WITH t AS ($tSql)
           |SELECT conv_id, count(DISTINCT turn_idx) AS n_distinct,
           |       min(turn_idx) AS min_turn, max(turn_idx) AS max_turn
           |FROM t GROUP BY conv_id
           |HAVING NOT (min(turn_idx) = 0 AND max(turn_idx) = count(DISTINCT turn_idx) - 1)""".stripMargin,
      "q_stats_profile" ->
        """SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
          |       min(value) AS min_value, max(value) AS max_value,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
          |       count(*) FILTER (WHERE props IS NULL) AS null_props
          |FROM events""".stripMargin
    )
  }
}
