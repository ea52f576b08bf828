package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.transcript.{TranscriptSuiteConfig, TranscriptValidator}

/** Structured Streaming leg of the engine: continuous validation of a
  * transcript stream. The reference is batch-only (SURVEY §2.5 —
  * "Streaming: none"); this is the documented extension for pipelines that
  * validate transcripts as they land.
  *
  * Two layers:
  *  - '''row predicates''' — the same Catalyst predicate columns as the
  *    batch path ([[TranscriptValidator.rowViolations]] is stateless, so
  *    it lifts onto a streaming DataFrame unchanged), emitted in append
  *    mode;
  *  - '''windowed violation counts''' — watermarked tumbling-window counts
  *    per constraint for monitoring/alerting;
  *  - '''stateful sequence check''' — per-conversation
  *    `flatMapGroupsWithState` tracking the max turn_idx seen: emits a
  *    violation when a turn arrives at or below the watermark-committed
  *    max (duplicate) — the streaming analogue of the batch dup-key check
  *    with bounded state (one int per live conversation).
  */
object StreamingValidator {

  /** Row-level violations on a streaming transcript DataFrame — reuses the
    * batch predicate compiler verbatim (stateless, append-safe). */
  def rowViolations(stream: DataFrame,
                    cfg: TranscriptSuiteConfig = TranscriptSuiteConfig()): DataFrame =
    new TranscriptValidator(cfg).rowViolations(stream)

  /** Watermarked tumbling-window violation counts per constraint
    * (append-mode monitoring stream). */
  def windowedViolationCounts(stream: DataFrame, tsCol: String = "ts",
                              watermark: String = "10 minutes",
                              windowLen: String = "5 minutes",
                              cfg: TranscriptSuiteConfig = TranscriptSuiteConfig()): DataFrame =
    new TranscriptValidator(cfg)
      .rowViolations(stream.withColumn("_event_ts", col(tsCol)), extraCols = Seq("_event_ts"))
      .withWatermark("_event_ts", watermark)
      .groupBy(window(col("_event_ts"), windowLen), col("constraint_id"))
      .agg(count(lit(1)).as("n"))

  final case class TurnEvent(conv_id: String, turn_idx: Int)
  final case class DupViolation(conv_id: String, turn_idx: Int, kind: String)

  /** Stateful duplicate/regression detector: state = max turn_idx per
    * conversation. Emits `dup_or_regression` when a turn arrives that is
    * <= the max already seen (exact dups and out-of-order replays).
    * State is one Int per live conversation; `idleTimeoutMs > 0` retires
    * conversations idle longer than that (pass 0 for bounded backfills
    * driven by `Trigger.AvailableNow`). */
  def statefulSequenceCheck(turns: Dataset[TurnEvent],
                            idleTimeoutMs: Long = 3600000L): Dataset[DupViolation] = {
    import turns.sparkSession.implicits._
    val timeoutMode =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[Int, DupViolation](OutputMode.Append, timeoutMode) {
        (convId: String, events: Iterator[TurnEvent], state: GroupState[Int]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var maxSeen = state.getOption.getOrElse(-1)
            val out = events.flatMap { e =>
              if (e.turn_idx <= maxSeen)
                Some(DupViolation(convId, e.turn_idx, "dup_or_regression"))
              else { maxSeen = e.turn_idx; None }
            }.toList
            state.update(maxSeen)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** Convenience: run row-violation validation from a parquet directory
    * stream to an in-memory sink (used by tests; swap format/path for
    * production sinks). Returns the started query. */
  def startMemorySink(spark: SparkSession, sourceDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      queryName: String): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    rowViolations(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
