package graft.streaming

import graft.SparkSuite
import graft.gen.TranscriptGen
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

class StreamingValidatorSpec extends SparkSuite {

  test("streaming row violations from a parquet stream match the batch result") {
    val dir = Files.createTempDirectory("stream-in").toString
    val cfg = TranscriptGen.GenConfig(numConvs = 100, seed = 21,
      nullRoleRate = 0.02, badRoleRate = 0.02, negTurnRate = 0.01)
    val data = TranscriptGen.transcripts(spark, cfg)
    data.write.mode("overwrite").parquet(dir)

    val q = StreamingValidator.startMemorySink(spark, dir, data.schema, "stream_v")
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql("SELECT constraint_id, count(*) n FROM stream_v GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = new graft.transcript.TranscriptValidator()
      .rowViolations(spark.read.parquet(dir))
      .groupBy("constraint_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.sum > 0)
  }

  test("windowed violation counts aggregate by event-time window") {
    val dir = Files.createTempDirectory("stream-win").toString
    val data = TranscriptGen.transcripts(spark,
      TranscriptGen.GenConfig(numConvs = 50, seed = 22, badRoleRate = 0.05))
    data.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(data.schema).parquet(dir)
    // complete mode for the test sink: append only emits watermark-closed
    // windows, which a bounded AvailableNow backfill never closes
    val q = StreamingValidator.windowedViolationCounts(stream, windowLen = "10 minutes")
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_win")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val total = spark.sql("SELECT sum(n) FROM stream_win").collect()(0).getLong(0)
    val batchTotal = new graft.transcript.TranscriptValidator()
      .rowViolations(spark.read.parquet(dir)).count()
    assert(total == batchTotal && total > 0)
  }

  test("stateful sequence check: in-batch dups and cross-batch regressions, order-free") {
    import spark.implicits._
    import StreamingValidator.TurnEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[TurnEvent]
    val q = StreamingValidator.statefulSequenceCheck(input.toDS(), idleTimeoutMs = 0)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_state")
      .start()
    try {
      // batch 1: c1 duplicates turn 1 in-batch; c2 is clean; c3's FIRST
      // contact is a negative turn — it must NOT be flagged (regression:
      // a -1 "already seen" sentinel used to collide with legal negative
      // indices). In-batch arrival order carries no signal post-shuffle,
      // so only equality flags within a batch.
      input.addData(TurnEvent("c1", 0), TurnEvent("c1", 1), TurnEvent("c1", 1),
        TurnEvent("c1", 2), TurnEvent("c2", 0), TurnEvent("c2", 5), TurnEvent("c3", -2))
      q.processAllAvailable()
      // batch 2: c2 turn 3 arrives after turn 5 was committed by batch 1
      // -> cross-batch regression; c3 continues above its negative start
      input.addData(TurnEvent("c2", 3), TurnEvent("c3", 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_state").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("c1", 1), ("c2", 3)))
  }
}
