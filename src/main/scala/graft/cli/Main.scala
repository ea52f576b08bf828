package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.CompiledSchema
import graft.validate.{Validator, ValidatorConfig}
import graft.io.ParquetPartitionedSource
import graft.transcript._
import java.nio.file.{Files, Paths}

/** CLI mirroring the reference's entry points (kyepy kye/cli.py):
  *
  * Kye-model validation (E2 — precompiled artifact path):
  *   graft.cli.Main kye --schema s.kye.json --data t.parquet --model M
  *     [--violations outDir] [--parity]
  *
  * Transcript suite (north rule):
  *   graft.cli.Main transcripts --table dir --conv-keys path
  *     [--checkpoint manifest.json] [--violations outDir]
  *     [--baseline hist.json] [--write-baseline hist.json]
  *
  * Exit code 65 when violations were found (like the reference CLI,
  * kye/cli.py:80-83).
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val mode = args.head
    // validate BEFORE paying SparkSession startup: an unknown mode or a
    // malformed option must not spin up a local cluster just to print usage
    if (mode != "kye" && mode != "transcripts" && mode != "ann") {
      System.err.println(s"unknown mode $mode"); usage(); sys.exit(2)
    }
    val opts = parseOpts(args.tail)
    // value-shape validation also belongs BEFORE Spark startup (and before
    // the full-table row-key scan): a typo'd numeric option must cost a
    // usage line, not a cluster spin-up plus a 10^12-row pass
    val maxGroupValues = parsePositiveInt(opts, "max-group-values")
    val maxConcurrent = parsePositiveInt(opts, "max-concurrent").getOrElse(1)
    // per-partition wall-clock budget for the checkpointed path (0 = no
    // watcher); generous default in ResumableRunner
    val partitionTimeoutMs: Long = opts.get("partition-timeout-ms").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          System.err.println(s"--partition-timeout-ms must be a non-negative integer, got '$v'")
          usage(); sys.exit(2)
      }
      if (n < 0) {
        System.err.println(s"--partition-timeout-ms must be >= 0, got $n")
        usage(); sys.exit(2)
      }
      n
    }.getOrElse(graft.transcript.ResumableRunner.DefaultPartitionTimeoutMs)
    // a silently-ignored option is a lie to the operator: concurrency and
    // the partition wall-clock watcher only exist on the checkpointed
    // transcripts path
    if (maxConcurrent > 1 && (mode != "transcripts" || !opts.contains("checkpoint"))) {
      System.err.println("--max-concurrent requires transcripts mode with --checkpoint " +
        "(partition-wise validation); it has no effect elsewhere")
      usage(); sys.exit(2)
    }
    if (opts.contains("partition-timeout-ms") &&
        (mode != "transcripts" || !opts.contains("checkpoint"))) {
      System.err.println("--partition-timeout-ms requires transcripts mode with " +
        "--checkpoint (partition-wise validation); it has no effect elsewhere")
      usage(); sys.exit(2)
    }
    // ann-mode option shapes, validated BEFORE Spark startup like every
    // other mode's (a typo'd --n-lists must cost a usage line, not a
    // cluster spin-up; --n-lists 0 would reach a divide-by-zero in
    // trainCentroids)
    if (mode == "ann") {
      for (req <- Seq("table", "centroids") if !opts.contains(req)) {
        System.err.println(s"ann requires --$req"); usage(); sys.exit(2)
      }
      Seq("n-lists", "k", "n-probe").foreach(parsePositiveInt(opts, _))
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tuning(spark) // engine-wide session tuning (env-overridable)
    val hadViolations =
      try {
        if (mode == "kye") runKye(spark, opts, maxGroupValues)
        else if (mode == "ann") runAnn(spark, opts)
        else runTranscripts(spark, opts, maxConcurrent, partitionTimeoutMs)
      } catch {
        // error-exit paths must still stop the session (not lean on JVM
        // exit cleanup); re-throw after stopping
        case e: Throwable => spark.stop(); throw e
      }
    spark.stop()
    if (hadViolations) sys.exit(65)
  }

  /** IVF ANN with the digest-guarded persisted centroid artifact
    * (ops.Similarity.trainOrLoadCentroids): the first run over a corpus
    * trains k-means and commits the artifact; later runs over the
    * UNCHANGED corpus load it (one small read, no training); a corpus
    * content change flips the digest and retrains. Prints
    * `ann centroids: trained|loaded` so operators (and the e2e spec) can
    * see which path ran. */
  private def runAnn(spark: SparkSession, opts: Map[String, String]): Boolean = {
    // presence + shape already validated pre-startup in main()
    val table = opts("table")
    val artifact = opts("centroids")
    val idCol = opts.getOrElse("id", "vec_id")
    val vecCol = opts.getOrElse("vec", "embedding")
    val nLists = parsePositiveInt(opts, "n-lists").getOrElse(32)
    val k = parsePositiveInt(opts, "k").getOrElse(5)
    val nProbe = parsePositiveInt(opts, "n-probe").getOrElse(4)
    val items = spark.read.parquet(table)
    val (cents, trained) = graft.ops.Similarity.trainOrLoadCentroids(
      items, idCol, vecCol, nLists, artifact)
    println(s"ann centroids: ${if (trained) "trained" else "loaded"} ($artifact, " +
      s"nLists=${cents.length})")
    val queries = opts.get("queries") match {
      case Some(qp) => spark.read.parquet(qp)
        .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      case None => // deterministic smoke default: the 3 lowest-id items
        items.orderBy(col(idCol)).limit(3)
          .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    }
    val topk = graft.ops.Similarity.ivfTopK(
      items, idCol, vecCol, queries, "q_id", "q_vec", k, cents, nProbe)
      .select(col("query_id"), col("item_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
    opts.get("out") match {
      case Some(outDir) =>
        topk.write.mode("overwrite").parquet(outDir)
        println(s"ann top-$k written to $outDir")
      case None =>
        topk.collect().foreach(r => println(s"ann ${r.mkString(" ")}"))
    }
    false
  }

  private def runKye(spark: SparkSession, opts: Map[String, String],
                     maxGroupValues: Option[Int]): Boolean = {
    val schemaPath = opts("schema")
    val text = Files.readString(Paths.get(schemaPath))
    // E1 path: `.kye` source compiles through the DSL front-end; E2 path:
    // precompiled JSON/YAML artifacts load directly (kyepy kye.py:60-63)
    // the pure compile result (no native-type merge) is what --compile
    // writes, mirroring the reference (kye.py:100-113 writes self.compiled;
    // the loader merges native types separately, loader.py:30)
    val compiledOnly =
      if (schemaPath.endsWith(".kye"))
        // multi-error compile: print every source-highlighted error and
        // exit 65, like the reference reporter (compilation_errors.py:64-67
        // + cli.py:67-70)
        try graft.parse.KyeParser.compile(text)
        catch {
          case e: graft.parse.KyeParser.CompileException =>
            System.err.println(e.rendered)
            System.err.println(s"${e.errors.length} compile error(s)")
            spark.stop() // exit path must not lean on JVM shutdown cleanup
            sys.exit(65)
        }
      else if (schemaPath.endsWith(".yaml") || schemaPath.endsWith(".yml"))
        CompiledSchema.fromYaml(text) // normalize precompiled input too
      else CompiledSchema.fromJson(text)
    // CompiledSchema.load(text) is exactly fromX + nativeTypes.merge —
    // merging the already-parsed artifact avoids a second Jackson parse
    // and a branch that could drift from the compiledOnly one above
    val schema = CompiledSchema.nativeTypes.merge(compiledOnly)
    // --compile out.(json|yaml|yml): write the compiled artifact
    // (kye/cli.py:75-76 `-c`); compile-only runs need no --model/--data
    opts.get("compile").foreach { out =>
      val artifact =
        if (out.endsWith(".yaml") || out.endsWith(".yml")) compiledOnly.toYaml
        else compiledOnly.toJson
      Files.writeString(Paths.get(out), artifact)
      println(s"wrote compiled artifact $out")
    }
    if (!opts.contains("model")) {
      require(opts.contains("compile"), "kye mode needs --model (or --compile for compile-only)")
      return false
    }
    val model = opts("model")
    val dataPath = opts("data")
    // --row-key <col>: anchor violations on a natural key column (stays
    // columnar/codegen, no RDD round-trip). Without it, parquet ingress
    // derives columnar positional ids from _metadata.row_index;
    // zipWithIndex remains only for CSV/JSON fixtures. readAny happens
    // INSIDE each branch: the parquet default path must not list files /
    // resolve footers twice (withParquetRowIds does its own read)
    lazy val data = readAny(spark, dataPath)
    val withIds = opts.get("row-key") match {
      case Some(k) =>
        // fail fast on keys whose long-cast could NULL or truncate row
        // anchors: only integral types are loss-free. Resolve through
        // Spark's own analyzer (case-insensitive, nested paths) rather
        // than case-sensitive StructType lookup.
        import org.apache.spark.sql.types._
        val dt = data.select(col(k)).schema.head.dataType
        require(
          dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType,
          s"--row-key column '$k' must be an integral type (found $dt): " +
            "floats truncate and wide decimals overflow to NULL, which would " +
            "corrupt the report's row anchors; omit --row-key for positional ids")
        // duplicate or NULL key values would conflate violations from
        // different rows and corrupt the highlighted-slice isin lookup.
        // The guard is one aggregate job but a FULL extra pass over the
        // input (count + exact count_distinct) — the right default for
        // correctness; callers who already guarantee a unique non-null key
        // (e.g. it IS the table's primary key) skip the pass with
        // --skip-row-key-check at 10^12-row scale.
        if (!opts.contains("skip-row-key-check")) {
          val kc = data.agg(
            count(lit(1)).as("n"),
            count_distinct(col(k)).as("d"),
            count(when(col(k).isNull, 1)).as("nulls")).collect()(0)
          require(kc.getLong(2) == 0,
            s"--row-key column '$k' contains ${kc.getLong(2)} NULLs — row " +
              "anchors must be non-null; omit --row-key for positional ids")
          require(kc.getLong(0) == kc.getLong(1),
            s"--row-key column '$k' is not unique (${kc.getLong(0)} rows, " +
              s"${kc.getLong(1)} distinct values) — duplicate anchors would " +
              "conflate violations from different rows")
        }
        data.withColumn("_row", col(k).cast("long"))
      case None if isParquet(dataPath) => Validator.withParquetRowIds(spark, dataPath)
      case None => Validator.withRowIds(data)
    }
    val result = new Validator(schema,
      ValidatorConfig(
        strictReferenceParity = opts.contains("parity"),
        maxGroupValues = maxGroupValues.getOrElse(ValidatorConfig().maxGroupValues)))
      .validate(model, withIds)
    val violations = result.violations.cache()
    opts.get("violations").foreach(out =>
      violations.write.mode("overwrite").parquet(out))
    // driver fetch is bounded: total via count(), report via limit(50) —
    // never collect the full violation set (10^12 rows x 1e-3 error rate
    // would be 10^9 driver-side rows)
    val totalViolations = violations.count()
    val rows = violations.orderBy("err", "row", "col").limit(50).collect()
    rows.foreach { r =>
      println(s"${r.getAs[String]("err")}: ${r.getAs[String]("model")}" +
        s" row=${Option(r.get(2)).getOrElse("-")} col=${Option(r.get(3)).getOrElse("-")}" +
        Option(r.getAs[String]("expected")).map(e => s" expected=$e").getOrElse(""))
    }
    if (totalViolations > 50) println(s"... and ${totalViolations - 50} more")
    // highlighted slice of offending data, like the reference report
    // (kyepy validation_errors.py:126-154: <=10 rows, offending columns)
    val vioRowIds = rows.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Long]))
      .distinct.sorted.take(10)
    val vioCols = rows.flatMap(r => Option(r.getAs[String]("col"))).distinct
    if (vioRowIds.nonEmpty && vioCols.nonEmpty) {
      // violation col values are post-rename edge NAMES; the source data
      // may carry the edges' TITLES — map back so titled schemas still get
      // a populated slice
      val srcColOf: Map[String, String] = schema.models.get(model)
        .map(_.edges.values.map(e => e.name -> e.title.getOrElse(e.name)).toMap)
        .getOrElse(Map.empty)
      val keepSrc = vioCols.flatMap(srcColOf.get).toSet
      val keep = withIds.columns.filter(c =>
        c == "_row" || vioCols.contains(c) || keepSrc.contains(c))
      withIds.filter(col("_row").isin(vioRowIds: _*))
        .select(keep.map(col): _*).orderBy("_row").show(10, truncate = false)
      // compare distinct violation ROWS to rows shown — one row failing
      // three assertions is still one row, not "2 more rows" (violations
      // is cached, so the distinct count is cheap)
      val distinctVioRows = violations.filter(col("row").isNotNull)
        .select("row").distinct().count()
      if (distinctVioRows > vioRowIds.length)
        println(s"... and ${distinctVioRows - vioRowIds.length} more violation rows")
    }
    println(s"$totalViolations violations; survivors=" +
      result.survivors.map(_.count().toString).getOrElse("<aborted>"))
    violations.unpersist()
    result.cleanup()
    totalViolations > 0
  }

  private def runTranscripts(spark: SparkSession, opts: Map[String, String],
                             maxConcurrent: Int,
                             partitionTimeoutMs: Long): Boolean = {
    // --content-digest: snapshot ids additionally hash each file's edge
    // blocks, so a same-length same-mtime rewrite (object-store copy with
    // preserved timestamps) still invalidates the partition's checkpoint
    val source = new ParquetPartitionedSource(spark, opts("table"),
      contentDigest = opts.contains("content-digest"))
    val convKeys = opts.get("conv-keys").map(p => spark.read.parquet(p))
    val validator = new TranscriptValidator()

    // parse the baseline ONCE and share it between the per-partition and
    // table-level legs: two reads of the same path could silently compare
    // against different baselines if the file is replaced mid-run (e.g. a
    // concurrent --write-baseline). LAZY so the non-checkpoint path keeps
    // its contract of failing on an unreadable baseline only AFTER
    // validation completed and violations were written; the checkpointed
    // path forces it up front by necessity (the per-partition leg needs
    // it before the loop), which loses nothing — the manifest is intact.
    lazy val baselineSnap: Option[Map[String, Drift.Histogram]] =
      opts.get("baseline").map(p => Drift.snapshotFromJson(Files.readString(Paths.get(p))))
    def histogramsOf(df: DataFrame): Map[String, Drift.Histogram] = Map(
      "role" -> Drift.collect(StatsProfiler.categoricalHistogram(df, col("role"))),
      "text_len" -> Drift.collect(
        StatsProfiler.numericHistogram(df, length(col("text")), 0, 20, 20)))

    // per-partition histograms are additive: when the checkpointed run
    // validated EVERY partition, their sum IS the table histogram and the
    // table-level drift leg below reuses it instead of a third full scan
    val partHistSums = scala.collection.mutable.Map[String, Drift.Histogram]()
    var allPartitionsValidated = false

    val totalViolations: Long = opts.get("checkpoint") match {
      case Some(manifestPath) =>
        val manifest = new CheckpointManifest(manifestPath)
        val sink = opts.get("violations").map { out => (p: Int, r: TranscriptReport) =>
          r.violations.write.mode("overwrite").parquet(s"$out/partition_id=$p")
        }
        // --baseline under --checkpoint additionally localizes drift to
        // the partition grain: each VALIDATED partition's role/text_len
        // histograms PSI/KS-compare against the (table-level) baseline —
        // "the corpus drifted" becomes "partitions 3 and 7 drifted",
        // riding the same checkpointed loop. The table-level verdict
        // below is unchanged.
        // metric-set mismatches are invariant across partitions (baseline
        // keys vs the fixed histogramsOf keys): warn ONCE, not once per
        // partition — 5000 identical stderr lines bury real signal
        val warnedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        val driftCheck = baselineSnap.map { base =>
          ResumableRunner.DriftCheck(
            baseline = base,
            histograms = histogramsOf,
            columns = Seq("role", "text"),
            onVerdicts = pd => {
              pd.verdicts.foreach(v => println(
                // formatLocal(Locale.ROOT): the f"" interpolator is
                // locale-sensitive — a comma-decimal default locale would
                // print psi=0,1234 and break parsers of this line
                "drift p=%s %s: psi=%.4f ks=%.4f drifted=%s".formatLocal(
                  java.util.Locale.ROOT, pd.partitionId, v.name, v.psi, v.ks, v.drifted)))
              if ((pd.producedNotInBaseline.nonEmpty || pd.baselineNotProduced.nonEmpty)
                  && warnedOnce.compareAndSet(false, true)) {
                pd.producedNotInBaseline.foreach(n => System.err.println(
                  s"warning: metric '$n' missing from the baseline — NOT drift-checked (any partition)"))
                pd.baselineNotProduced.foreach(n => System.err.println(
                  s"warning: baseline metric '$n' not produced by this build — skipped (any partition)"))
              }
              partHistSums.synchronized {
                for ((k, h) <- pd.histograms)
                  partHistSums(k) = Drift.merge(partHistSums.getOrElse(k, Map.empty), h)
              }
            })
        }
        // --max-concurrent N: validate N partitions simultaneously (Spark
        // accepts multi-threaded job submission; manifest commits stay
        // atomic per partition); validated in main() before Spark startup
        val summary = new ResumableRunner(source, manifest, validator, convKeys, sink,
          maxConcurrent, driftCheck, partitionTimeoutMs).run()
        allPartitionsValidated = summary.skipped.isEmpty
        // skipped partitions were NOT drift-checked — say so, or the
        // absence of drift lines reads as "no partition drifted"
        if (driftCheck.isDefined && summary.skipped.nonEmpty)
          println(s"drift: partitions ${summary.skipped.mkString(",")} skipped " +
            "(already validated under this lineage) — not re-drift-checked")
        println(s"validated=${summary.validated.map(_.partitionId).mkString(",")}" +
          s" skipped=${summary.skipped.mkString(",")} rows=${summary.totalRows}" +
          s" violations=${summary.totalViolations}")
        summary.totalViolations +
          summary.skipped.flatMap(manifest.load().get(_)).map(_.violations).sum
      case None =>
        val report = validator.validate(source.read(), convKeys)
        opts.get("violations").foreach(out =>
          report.violations.write.mode("overwrite").parquet(out))
        report.partitionVerdicts.orderBy("partition_id").show(100, truncate = false)
        val n = report.violations.count()
        report.cleanup()
        println(s"violations=$n")
        n
    }

    // drift leg: compare against (or write) a baseline histogram snapshot.
    // lazy + shared: --baseline AND --write-baseline together must scan
    // the table once for the histograms, not twice, and a run using
    // neither flag must not read the table here at all. When the
    // checkpointed loop just validated EVERY partition, the summed
    // per-partition histograms ARE the table histograms — no extra scan.
    lazy val cur: Map[String, Drift.Histogram] =
      if (allPartitionsValidated && partHistSums.synchronized(partHistSums.nonEmpty))
        partHistSums.synchronized(partHistSums.toMap)
      else histogramsOf(source.read())
    opts.get("write-baseline").foreach { p =>
      Files.writeString(Paths.get(p), Drift.snapshotToJson(cur))
      println(s"wrote baseline snapshot $p")
    }
    val drifted = baselineSnap.exists { base =>
      // a baseline from a different build may carry metrics this build
      // doesn't produce (or miss ones it does): warn SYMMETRICALLY and
      // skip, never crash after validation already completed — a silent
      // intersect would let the operator believe every produced metric
      // was drift-checked
      (base.keySet diff cur.keySet).toSeq.sorted.foreach(k =>
        System.err.println(s"warning: baseline metric '$k' not produced by this build — skipped"))
      (cur.keySet diff base.keySet).toSeq.sorted.foreach(k =>
        System.err.println(s"warning: metric '$k' missing from the baseline — NOT drift-checked (refresh with --write-baseline)"))
      val verdicts = (base.keySet intersect cur.keySet).toSeq.sorted
        .map(k => Drift.verdict(k, base(k), cur(k)))
      verdicts.foreach(v => println(
        // formatLocal(Locale.ROOT) like the per-partition path above: the
        // f"" interpolator is default-locale-sensitive (psi=0,1234)
        "drift %s: psi=%.4f ks=%.4f drifted=%s".formatLocal(
          java.util.Locale.ROOT, v.name, v.psi, v.ks, v.drifted)))
      verdicts.exists(_.drifted)
    }
    totalViolations > 0 || drifted
  }

  private def isParquet(path: String): Boolean =
    !(path.endsWith(".csv") || path.endsWith(".json") || path.endsWith(".jsonl"))

  private def readAny(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (path.endsWith(".json") || path.endsWith(".jsonl"))
      spark.read.json(path)
    else spark.read.parquet(path)

  /** Options that are bare flags; every other option REQUIRES a value. */
  private val boolFlags = Set("parity", "skip-row-key-check", "content-digest")

  /** usage error, not a raw NumberFormatException / a deferred job-time
    * require deep inside the engine; called from main() so the failure
    * lands before SparkSession startup. */
  private def parsePositiveInt(opts: Map[String, String], key: String): Option[Int] =
    opts.get(key).map { v =>
      v.toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(s"--$key requires a positive integer, got '$v'")
        usage(); sys.exit(2)
      }
    }

  private def parseOpts(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val key = a.stripPrefix("--")
        if (boolFlags(key)) { m(key) = "true"; i += 1 }
        else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          m(key) = args(i + 1); i += 2
        } else {
          // a silent "true" here produced misleading downstream failures
          // (--data with a forgotten value -> "Path does not exist: .../true")
          System.err.println(s"option --$key requires a value")
          usage(); sys.exit(2)
        }
      } else i += 1
    }
    m.toMap
  }

  private def usage(): Unit = System.err.println(
    """usage:
      |  graft.cli.Main kye --schema s.kye[.json|.yaml] [--data table.parquet --model M]
      |                 [--violations out] [--parity] [--row-key col] [--compile out.json]
      |                 [--max-group-values K] [--skip-row-key-check]
      |  graft.cli.Main transcripts --table dir [--conv-keys path] [--checkpoint m.json]
      |                 [--violations out] [--baseline h.json] [--write-baseline h.json]
      |                 [--content-digest] [--max-concurrent N] [--partition-timeout-ms MS]
      |  graft.cli.Main ann --table items.parquet --centroids artifact.json
      |                 [--id vec_id] [--vec embedding] [--n-lists 32] [--k 5]
      |                 [--n-probe 4] [--queries q.parquet] [--out dir]
      |
      |  ann trains IVF centroids on first run and persists them to
      |  --centroids; an unchanged corpus loads the artifact (no retrain),
      |  a content change retrains (digest guard).
      |
      |  --partition-timeout-ms default is 21600000 (6 h): any partition task
      |  exceeding it FAILS the cohort loudly (committed partitions stay
      |  resumable). Pass 0 for the pre-r4 unbounded-wait behavior.""".stripMargin)
}
