package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.TranscriptGen
import graft.io.ParquetPartitionedSource
import graft.transcript.{StatsProfiler, TranscriptSuiteConfig, TranscriptValidator}
import java.nio.file.{Files, Paths}

/** Two-cluster-size scaling evidence (BASELINE.md protocol): the transcript
  * constraint suite over one fixed Zipf-skewed dataset at local[8] vs
  * local[32], reporting `efficiency = throughput32 / (4 × throughput8)`.
  *
  * Two legs are measured per the north rule's wording ("the per-column
  * stats + predicate-eval stage must sustain ≥0.8"):
  *   - `e2e`: full suite from parquet — includes single-disk I/O, which a
  *     real 4N-executor cluster scales (more spindles) but one sandbox box
  *     cannot; reported for context.
  *   - `stats_pred`: per-column stats profile + all row-predicate
  *     violations over memory-resident input — the stage the ≥0.8
  *     criterion governs.
  *
  * Usage: runMain graft.ScalingBench [numConvs] [outMd]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val numConvs = if (args.length > 0) args(0).toLong else 4000000L
    val outMd = if (args.length > 1) args(1) else "BENCH/BASELINE.md"
    val dataDir = sys.env.getOrElse("GRAFT_BENCH_DIR", "/tmp/graft-bench/transcripts")
    val runsPerConfig = 3

    // ---- one-time dataset materialization (seeded, reused across configs)
    val gen = session(8)
    val cfg = TranscriptGen.GenConfig(
      numConvs = numConvs, seed = 42, numPartitions = 64,
      dupRate = 1e-3, gapRate = 1e-3, nullRoleRate = 5e-4, badRoleRate = 5e-4,
      negTurnRate = 2e-4, nullTextRate = 5e-4, tsRegressRate = 5e-4,
      orphanConvRate = 2e-4)
    if (!Files.exists(Paths.get(dataDir))) {
      println(s"[bench] generating $numConvs convs -> $dataDir")
      ParquetPartitionedSource.write(TranscriptGen.transcripts(gen, cfg), dataDir)
    }
    val convKeysPath = s"${dataDir}-convkeys"
    if (!Files.exists(Paths.get(convKeysPath)))
      TranscriptGen.conversations(gen, cfg).select("conv_id")
        .write.mode("overwrite").parquet(convKeysPath)
    val totalRows = gen.read.option("basePath", dataDir).parquet(dataDir).count()
    gen.stop()

    def e2e(spark: SparkSession): Double = {
      val data = spark.read.option("basePath", dataDir).parquet(dataDir)
      val keys = spark.read.parquet(convKeysPath)
      val t0 = System.nanoTime()
      val report = new TranscriptValidator(TranscriptSuiteConfig())
        .validate(data, Some(keys))
      val nV = report.violations.count()
      val nP = report.partitionVerdicts.count()
      val dt = (System.nanoTime() - t0) / 1e9
      report.cleanup()
      require(nV > 0 && nP > 0)
      dt
    }

    def statsPred(spark: SparkSession, cached: DataFrame): Double = {
      val t0 = System.nanoTime()
      val v = new TranscriptValidator(TranscriptSuiteConfig(persistSeq = false))
      val nV = v.rowViolations(cached).count()
      val prof = StatsProfiler.profile(cached,
        Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      require(nV > 0 && prof == 6)
      dt
    }

    final case class Leg(t: Double, thr: Double)
    def measure(cores: Int): (Leg, Leg) = {
      val spark = session(cores)
      // end-to-end leg
      e2e(spark) // warm-up
      val e2eTimes = (1 to runsPerConfig).map(_ => e2e(spark)).sorted
      // stats+predicate leg over memory-resident input
      val cached = spark.read.option("basePath", dataDir).parquet(dataDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count() // materialize cache
      statsPred(spark, cached) // warm-up
      val spTimes = (1 to runsPerConfig).map(_ => statsPred(spark, cached)).sorted
      cached.unpersist()
      spark.stop()
      def leg(ts: Seq[Double]) = { val m = ts(ts.size / 2); Leg(m, totalRows / m) }
      (leg(e2eTimes), leg(spTimes))
    }

    val (e2e8, sp8) = measure(8)
    val (e2e32, sp32) = measure(32)
    val effE2e = e2e32.thr / (4.0 * e2e8.thr)
    val effSp = sp32.thr / (4.0 * sp8.thr)

    val json =
      s"""{"metric":"turns/sec validated (full constraint suite)","unit":"turns/sec",
         |"rows":$totalRows,
         |"e2e":{"local8_sec":${e2e8.t},"local32_sec":${e2e32.t},
         |"throughput8":${e2e8.thr.round},"throughput32":${e2e32.thr.round},
         |"scaling_efficiency":${"%.3f".format(effE2e)}},
         |"stats_pred":{"local8_sec":${sp8.t},"local32_sec":${sp32.t},
         |"throughput8":${sp8.thr.round},"throughput32":${sp32.thr.round},
         |"scaling_efficiency":${"%.3f".format(effSp)}}}""".stripMargin.replace("\n", "")
    println(json)

    val md =
      s"""# BENCH — two-cluster-size scaling evidence
         |
         |One fixed Zipf-skewed transcript dataset ($totalRows turns, seed 42,
         |injected error rates ~1e-3), hive-partitioned parquet, generated once.
         |Each figure = median of $runsPerConfig runs after one warm-up, same JVM heap
         |(`SPARK_DRIVER_MEM`), `spark.sql.shuffle.partitions` = 2 x cores.
         |
         |## Full constraint suite, end-to-end from parquet
         |
         |Includes single-disk I/O that a real 4N-executor cluster scales with
         |added spindles but one sandbox box cannot — context figure.
         |
         || config | wall (s) | throughput (turns/s) |
         || --- | --- | --- |
         || local[8]  | ${"%.2f".format(e2e8.t)} | ${e2e8.thr.round} |
         || local[32] | ${"%.2f".format(e2e32.t)} | ${e2e32.thr.round} |
         |
         |efficiency = throughput32 / (4 x throughput8) = **${"%.3f".format(effE2e)}**
         |
         |## Per-column stats + predicate-eval stage (the north-rule criterion)
         |
         |Row-predicate violations (one codegen pass) + 6-column stats profile
         |(count/nulls/min/max/HLL) over memory-resident input — the stage
         |BASELINE.json's ">= 0.8 from N to 4N executors" governs.
         |
         || config | wall (s) | throughput (turns/s) |
         || --- | --- | --- |
         || local[8]  | ${"%.2f".format(sp8.t)} | ${sp8.thr.round} |
         || local[32] | ${"%.2f".format(sp32.t)} | ${sp32.thr.round} |
         |
         |efficiency = **${"%.3f".format(effSp)}** (target >= 0.8)
         |""".stripMargin
    Files.createDirectories(Paths.get(outMd).toAbsolutePath.getParent)
    Files.writeString(Paths.get(outMd), md)
    println(s"[bench] wrote $outMd")
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
