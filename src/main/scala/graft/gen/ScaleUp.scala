package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver-generated testdata (events /
  * documents / embeddings) by an integer factor — the sf1 bench input the
  * round-2 verdict asked for (item 4), derived from sf0.1 rather than
  * synthesized fresh so the data distribution (text shapes, value ranges,
  * conversation sizes) is exactly the driver's.
  *
  * Replication is id-shifted and content-perturbed per replica:
  *   - ids shift by `replica * stride` (strides chosen so scaled ids stay
  *     far below the 10^7 dup-injection offset the queries rely on);
  *   - document text gets a per-replica suffix token (otherwise every doc
  *     would be an exact duplicate of its 9 replicas and dedup outputs
  *     would grow quadratically instead of linearly — unrepresentative);
  *   - embeddings get deterministic per-(replica, id, dim) noise of ~0.3
  *     amplitude, keeping replica cosine ≈ 0.95 — well under the 0.999
  *     near-dup threshold, so the injected-dup invariants stay linear.
  *
  * Usage: graft.gen.ScaleUp <srcDir> <destDir> <factor>
  */
object ScaleUp {

  private val DOC_STRIDE = 100000L // sf0.1 has 5k docs; 10x stays << 10^7
  private val VEC_STRIDE = 100000L
  private val EVENT_STRIDE = 10000000L // events carry no dup-offset trick
  private val USER_STRIDE = 10000000L

  def replicate(df: DataFrame, factor: Int)(per: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => per(df, r)).reduce(_ union _)

  def scaleEvents(df: DataFrame, factor: Int): DataFrame =
    replicate(df, factor) { (d, r) =>
      d.select(
        (col("event_id") + lit(r * EVENT_STRIDE)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r * USER_STRIDE)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

  def scaleDocuments(df: DataFrame, factor: Int): DataFrame =
    replicate(df, factor) { (d, r) =>
      val text =
        if (r == 0) col("text")
        else {
          // ~1/4 of replica docs also gain a deterministic multilingual
          // phrase (r6): the scaled sf1/sf10 corpus exercises the text
          // kernels on non-ASCII content at bench scale
          val mlArr = array(MultilingualSlice.docs.map(d => lit(d._3)): _*)
          val mlHash = xxhash64(col("doc_id"), lit(r), lit("ml"))
          // independent index hash — see TranscriptGen (a shared hash
          // would make only indices ≡ 0 mod 4 reachable)
          val mlIdx = xxhash64(col("doc_id"), lit(r), lit("ml-idx"))
          val mlSuffix = when(pmod(mlHash, lit(4)) === 0,
            concat(lit(" "),
              element_at(mlArr,
                (pmod(mlIdx, lit(MultilingualSlice.docs.size)) + 1).cast("int"))))
            .otherwise(lit(""))
          concat(col("text"), lit(s" replica$r marker"), col("doc_id").cast("string"),
            mlSuffix)
        }
      d.select(
        (col("doc_id") + lit(r * DOC_STRIDE)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        // recompute: the replica suffix changed the length, and a stored
        // n_chars that disagrees with length(text) would silently corrupt
        // any consumer that trusts the column
        length(text).cast("long").as("n_chars"))
    }

  def scaleEmbeddings(df: DataFrame, factor: Int): DataFrame =
    replicate(df, factor) { (d, r) =>
      val vec =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1000)).cast("double")
            / lit(1000.0) - lit(0.5)) * lit(0.6)).cast("float"))
      d.select(
        (col("vec_id") + lit(r * VEC_STRIDE)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <destDir> <factor>")
    val Array(src, dest, fs) = args
    val factor = fs.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"factor must be an integer, got '$fs'"))
    // upper bound: replica ids shift by r * 10^5; at factor 101 the shift
    // reaches the 10^7 dup-injection offset the dedup oracles reserve
    // (SparkEntry docsWithDups), so scaled ids would collide with injected
    // duplicates and silently break the oracle slices. The per-table
    // source-range checks in w() below enforce the same invariant against
    // the ACTUAL ids (e.g. re-scaling an already-scaled directory).
    require(factor >= 1 && factor <= 100,
      s"factor must be in [1, 100] (got $factor): replica id shifts must stay below the 10^7 dup-injection offset")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def w(name: String, f: (DataFrame, Int) => DataFrame, parts: Int,
          idCol: String, stride: Long, dupOffsetCap: Option[Long]): Unit = {
      val in = spark.read.parquet(s"$src/$name.parquet")
      // guard the REAL invariants, not just the factor: replica ranges
      // [r*stride, r*stride + maxId] must not overlap each other, and for
      // dup-oracle tables the top scaled id must stay below the injection
      // offset — a previously-scaled source directory fails both here
      // instead of silently corrupting the scaled corpus
      val maxRow = in.agg(max(col(idCol)).cast("long")).collect()(0)
      require(!maxRow.isNullAt(0), s"$name: source table at '$src' is empty")
      val maxId = maxRow.getLong(0)
      require(maxId < stride,
        s"$name: max $idCol = $maxId >= replica stride $stride — replica id ranges would overlap (is '$src' already scaled?)")
      dupOffsetCap.foreach { cap =>
        val top = maxId + (factor - 1).toLong * stride
        require(top < cap,
          s"$name: top scaled $idCol = $top would reach the $cap dup-injection offset")
      }
      val out = f(in, factor)
      out.repartition(parts).write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }
    w("events", scaleEvents, 32, "event_id", EVENT_STRIDE, None)
    w("documents", scaleDocuments, 8, "doc_id", DOC_STRIDE, Some(10000000L))
    w("embeddings", scaleEmbeddings, 4, "vec_id", VEC_STRIDE, Some(10000000L))
    spark.stop()
  }
}
