package graft.transcript

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-column statistics + drift-input histograms over the transcript
  * table. One aggregate job produces every column's profile (count,
  * null-rate, min/max, HLL approx-distinct); numeric moment profiles use a
  * typed [[Aggregator]]; histograms are groupBy over deterministic bins.
  */
object StatsProfiler {

  // ---- typed Aggregator: streaming numeric moments -------------------------

  /** Mergeable moments buffer (Chan et al. parallel variance — associative
    * merge, safe for partial aggregation across executors). */
  final case class MomentsBuf(n: Long, mean: Double, m2: Double, min: Double,
                              max: Double, nonFinite: Long)
  final case class Moments(n: Long, mean: Double, variance: Double, min: Double,
                           max: Double, n_non_finite: Long)

  class NumericMomentsAgg extends Aggregator[java.lang.Double, MomentsBuf, Moments] {
    def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0L)
    def reduce(b: MomentsBuf, x: java.lang.Double): MomentsBuf =
      // non-finite values are EXCLUDED from the moments but COUNTED: one
      // NaN row (a 0/0 ratio upstream) would otherwise poison
      // mean/m2/min/max for the entire profile (math.min(x, NaN) is NaN
      // and the merge spreads it to every buffer), while silently
      // dropping them would let a column that is 99% Infinity profile as
      // a small clean distribution — n_non_finite is the signal
      if (x == null) b
      else if (x.isNaN || x.isInfinite) b.copy(nonFinite = b.nonFinite + 1)
      else {
        val v = x.doubleValue()
        val n = b.n + 1
        val d = v - b.mean
        val mean = b.mean + d / n
        MomentsBuf(n, mean, b.m2 + d * (v - mean), math.min(b.min, v), math.max(b.max, v), b.nonFinite)
      }
    def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
      if (a.n == 0) b.copy(nonFinite = a.nonFinite + b.nonFinite)
      else if (b.n == 0) a.copy(nonFinite = a.nonFinite + b.nonFinite)
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentsBuf(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n,
          math.min(a.min, b.min), math.max(a.max, b.max),
          a.nonFinite + b.nonFinite)
      }
    def finish(b: MomentsBuf): Moments =
      if (b.n == 0) Moments(0, Double.NaN, Double.NaN, Double.NaN, Double.NaN, b.nonFinite)
      else Moments(b.n, b.mean, if (b.n > 1) b.m2 / (b.n - 1) else 0.0, b.min, b.max, b.nonFinite)
    def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Column expression form of the typed aggregator, usable inside
    * `df.agg(...)` alongside built-ins. */
  def numericMoments(c: Column): Column = udaf(new NumericMomentsAgg).apply(c)

  // ---- one-pass column profile ---------------------------------------------

  /** The shared per-column stat aggregates (non-null count, HLL
    * approx-distinct, min/max as strings) — the SINGLE source used by both
    * [[profile]] and `TranscriptValidator.healthCheck`. A re-implemented
    * predicate list drifted once in healthCheck (ToolRole undercount);
    * duplicated stat definitions can drift the same way (e.g. one side
    * changing the approx_count_distinct rsd). `alias` maps the stat key
    * (`count`/`distinct`/`min`/`max`) to each caller's naming scheme. */
  def colStatAggs(c: String, alias: String => String): Seq[Column] = Seq(
    count(col(c)).as(alias("count")),
    approx_count_distinct(col(c)).as(alias("distinct")),
    min(col(c)).cast("string").as(alias("min")),
    max(col(c)).cast("string").as(alias("max")))

  /** (column, count, nulls, null_rate, approx_distinct, min, max) — one row
    * per profiled column, computed in a single aggregate job. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      colStatAggs(c, k => s"_${k}_$c") :+
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c")
    }
    val total = count(lit(1)).as("_total")
    // ONE aggregate job; the single wide row is collected and re-shaped
    // driver-side (N tiny local rows). The previous union-of-N-selects
    // relied on runtime exchange reuse to avoid N full re-aggregations —
    // plan-fragile for zero benefit on a 1-row result.
    val r = df.agg(total, aggs: _*).collect()(0)
    val tot = r.getAs[Long]("_total")
    val rows = cols.map { c =>
      val nulls = r.getAs[Long](s"_null_$c")
      org.apache.spark.sql.Row(
        c, r.getAs[Long](s"_count_$c"), nulls,
        if (tot == 0) 0.0 else nulls.toDouble / tot,
        r.getAs[Long](s"_distinct_$c"),
        r.getAs[String](s"_min_$c"), r.getAs[String](s"_max_$c"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("nulls", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("null_rate", org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("approx_distinct", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("min", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("max", org.apache.spark.sql.types.StringType, nullable = true)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  // ---- histograms (drift inputs) -------------------------------------------

  /** Fixed-width bin id for a numeric expression: 0..nBins-1, under/overflow
    * clamped; NULL and NaN inputs produce a NULL bin (which
    * [[Drift.collect]] labels `<null>`). Two hazards this formulation
    * avoids (r4 review findings):
    *   - Spark's `greatest`/`least` SKIP null arguments, so clamping a
    *     NULL directly would silently count missing values in bin 0 and
    *     the NULL bin the drift legs align on would never appear;
    *   - `floor` returns LongType and a non-ANSI `cast("int")` WRAPS, so
    *     clamping after the cast would land far-out outliers in arbitrary
    *     interior bins (2^32+5 -> bin 5) — clamp on the long FIRST.
    * Same arithmetic is expressible in any SQL engine (guard NULL
    * explicitly there too). */
  def bin(c: Column, lo: Double, width: Double, nBins: Int): Column = {
    val clamped = least(lit((nBins - 1).toLong),
      greatest(lit(0L), floor((c - lit(lo)) / lit(width)))).cast("int")
    when(c.isNotNull && !isnan(c.cast("double")), clamped)
  }

  /** Categorical histogram, e.g. role frequencies. */
  def categoricalHistogram(df: DataFrame, c: Column): DataFrame =
    df.groupBy(c.cast("string").as("bin")).agg(count(lit(1)).as("n"))

  /** Numeric histogram over fixed-width bins, e.g. length(text). */
  def numericHistogram(df: DataFrame, c: Column, lo: Double, width: Double, nBins: Int): DataFrame =
    df.groupBy(bin(c, lo, width, nBins).cast("string").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Salted two-phase per-conversation row count: phase 1 pre-aggregates on
    * (conv_id, salt) so a hot conversation's rows spread over `buckets`
    * reducers, phase 2 merges by conv_id. Use when a groupBy(conv_id) over
    * the RAW table is needed and conversation sizes are Zipf-skewed
    * (SURVEY §4 skew strategy). */
  def saltedConvCounts(df: DataFrame, buckets: Int,
                       saltSource: Option[Column] = None): DataFrame = {
    // The salt must be RETRY-DETERMINISTIC: an indeterminate per-row value
    // (monotonically_increasing_id, rand) as a shuffle key means a partial
    // map-stage retry after a fetch failure can re-route rows while some
    // reducers keep partials under the old routing — rows double-counted
    // or dropped with no error (the SPARK-23207 hazard class). Default
    // salt = hash of (turn_idx, ts): deterministic, spreads normal hot
    // conversations. Its known limit: EXACT duplicate rows share the salt,
    // so a duplication-flood hot spot collapses onto one bucket — callers
    // with stable row identity (parquet `_metadata.row_index`, a row-id
    // column) should pass it as `saltSource` to spread even exact dups
    // deterministically.
    val salt = saltSource.getOrElse(xxhash64(col("turn_idx"), col("ts")))
    df.groupBy(col("conv_id"), pmod(xxhash64(salt), lit(buckets)).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("conv_id"))
      .agg(sum(col("_partial")).as("n_rows"))
  }
}
