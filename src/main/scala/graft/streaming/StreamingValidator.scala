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
  * Three layers:
  *  - '''row predicates''' — the same Catalyst predicate columns as the
  *    batch path ([[TranscriptValidator.rowViolations]] is stateless, so
  *    it lifts onto a streaming DataFrame unchanged), emitted in append
  *    mode;
  *  - '''windowed violation counts''' — watermarked tumbling-window counts
  *    per constraint for monitoring/alerting;
  *  - '''stateful sequence check''' — per-conversation
  *    `flatMapGroupsWithState` tracking the max turn_idx committed by
  *    EARLIER micro-batches: emits a violation for a turn at or below
  *    that max (cross-batch replay/regression) or duplicated within its
  *    own batch — the streaming analogue of the batch dup-key check with
  *    bounded state (one int per live conversation).
  */
object StreamingValidator {

  /** Row-level violations on a streaming transcript DataFrame — reuses the
    * batch predicate compiler verbatim (stateless, append-safe). */
  def rowViolations(stream: DataFrame,
                    cfg: TranscriptSuiteConfig = TranscriptSuiteConfig()): DataFrame =
    new TranscriptValidator(cfg).rowViolations(stream)

  /** Watermarked tumbling-window violation counts per constraint
    * (append-mode monitoring stream). Rows with a NULL event time are
    * EXCLUDED BY DEFINITION: event-time windowing cannot place them (an
    * epoch-sentinel window would surface them only until the watermark
    * passed it once, then silently discard every later one — a monitor
    * that quietly stops monitoring). Their detection belongs to the
    * unwindowed [[rowViolations]] append stream, which is stateless, has
    * no watermark, and always emits the NullTs violation. */
  def windowedViolationCounts(stream: DataFrame, tsCol: String = "ts",
                              watermark: String = "10 minutes",
                              windowLen: String = "5 minutes",
                              cfg: TranscriptSuiteConfig = TranscriptSuiteConfig()): DataFrame =
    new TranscriptValidator(cfg)
      .rowViolations(
        stream.filter(col(tsCol).isNotNull).withColumn("_event_ts", col(tsCol)),
        extraCols = Seq("_event_ts"))
      .withWatermark("_event_ts", watermark)
      .groupBy(window(col("_event_ts"), windowLen), col("constraint_id"))
      .agg(count(lit(1)).as("n"))

  final case class TurnEvent(conv_id: String, turn_idx: Int)
  final case class DupViolation(conv_id: String, turn_idx: Int, kind: String)

  /** Stateful duplicate/regression detector: state = max turn_idx per
    * conversation, carried ACROSS micro-batches. Emits `dup_or_regression`
    * for a turn at or below the max committed by earlier batches
    * (cross-batch replays/regressions) and for turns duplicated within
    * the current batch. Events are sorted per batch first: the group
    * iterator's order after the shuffle is nondeterministic, so in-batch
    * arrival order carries no signal — treating it as meaningful flagged
    * spurious regressions that varied run to run. State starts EMPTY
    * (Option, no -1 sentinel): a legitimate negative turn_idx must not
    * collide with an "already seen" marker on first contact.
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
            var maxSeen: Option[Int] = state.getOption
            val out = events.toList.sortBy(_.turn_idx).flatMap { e =>
              if (maxSeen.exists(e.turn_idx <= _))
                Some(DupViolation(convId, e.turn_idx, "dup_or_regression"))
              else { maxSeen = Some(e.turn_idx); None }
            }
            maxSeen.foreach(state.update)
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

  // ---- streaming drift ------------------------------------------------------

  /** Windowed categorical counts for drift monitoring: (window, _value, n)
    * rows emitted as the watermark closes each window (append mode —
    * state is bounded by live windows x distinct values). NULL values
    * take the `<null>` label [[graft.transcript.Drift.collect]] uses, so
    * streaming and batch histograms bin identical VALUES. NULL event
    * times are excluded by definition (see [[windowedViolationCounts]]) —
    * a batch histogram over data containing null-ts rows includes them,
    * this per-window one cannot; monitor null-ts prevalence via the
    * NullTs constraint on the unwindowed violation stream. */
  def windowedValueCounts(stream: DataFrame, tsCol: String, valueCol: org.apache.spark.sql.Column,
                          watermark: String = "10 minutes",
                          windowLen: String = "5 minutes"): DataFrame =
    stream
      .filter(col(tsCol).isNotNull)
      .withColumn("_event_ts", col(tsCol))
      .withColumn("_value", coalesce(valueCol.cast("string"), lit("<null>")))
      .withWatermark("_event_ts", watermark)
      .groupBy(window(col("_event_ts"), windowLen), col("_value"))
      .agg(count(lit(1)).as("n"))

  /** Per-closed-window drift verdicts against a baseline histogram; runs
    * inside `foreachBatch`, where `batch` holds the closed-window count
    * rows of one micro-batch. Histograms are tiny (distinct categorical
    * values per window), so the PSI/KS math is driver-side — the same
    * division of labor as the batch drift leg (distributed counting,
    * local statistics). Returns (window start, verdict) in window order. */
  def driftVerdicts(batch: DataFrame, name: String,
                    baseline: graft.transcript.Drift.Histogram,
                    psiThreshold: Double = 0.25): Seq[(java.sql.Timestamp, graft.transcript.Drift.DriftVerdict)] =
    batch.collect()
      .groupBy(_.getStruct(0).getTimestamp(0))
      .toSeq.sortBy(_._1.getTime)
      .map { case (start, rows) =>
        val h: graft.transcript.Drift.Histogram = rows
          .map(r => r.getString(1) -> r.getLong(2))
          .groupMapReduce(_._1)(_._2)(_ + _)
        start -> graft.transcript.Drift.verdict(name, baseline, h, psiThreshold)
      }

  /** Continuous distribution-drift monitor — the streaming face of the
    * north rule's drift leg: as each event-time window closes, its
    * categorical histogram is PSI/KS-compared against the baseline
    * snapshot and the verdict is delivered to `onVerdict` (alerting
    * callback, verdict-table writer, ...).
    *
    * @param checkpointLocation REQUIRED for restartable deployments: the
    *   watermarked aggregation is stateful, and without a durable
    *   checkpoint a restarted monitor re-reads the source from scratch —
    *   duplicate alerts for already-closed windows or missed in-flight
    *   ones. None (tests, ad-hoc backfills) uses a temp checkpoint that
    *   dies with the JVM. */
  def startWindowedDriftMonitor(stream: DataFrame, tsCol: String,
      valueCol: org.apache.spark.sql.Column, name: String,
      baseline: graft.transcript.Drift.Histogram,
      onVerdict: (java.sql.Timestamp, graft.transcript.Drift.DriftVerdict) => Unit,
      watermark: String = "10 minutes", windowLen: String = "5 minutes",
      psiThreshold: Double = 0.25,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = windowedValueCounts(stream, tsCol, valueCol, watermark, windowLen)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        driftVerdicts(batch.toDF(), name, baseline, psiThreshold)
          .foreach { case (w, v) => onVerdict(w, v) }
      }
    checkpointLocation.fold(writer)(p => writer.option("checkpointLocation", p)).start()
  }
}
