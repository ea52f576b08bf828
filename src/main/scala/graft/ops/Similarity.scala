package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * variant as the scale path (candidates from random-hyperplane buckets,
  * exact re-rank inside). All vector math is `zip_with`/`aggregate`
  * expressions — codegen-friendly, no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL (never NaN, never an error) when either side
    * has zero norm or NaN elements. Under ANSI mode a zero divisor is a
    * runtime DIVIDE_BY_ZERO that would kill the whole job on one
    * degenerate vector (`try_divide` → NULL); and a NaN from NaN elements
    * would sort ABOVE every real value in `desc` rankings and pass
    * `>= threshold` filters (`nanvl` → NULL). NULL sorts last under desc
    * and fails every filter. */
  def cosine(a: Column, b: Column): Column =
    nanvl(try_divide(dot(a, b), norm(a) * norm(b)), lit(null).cast("double"))

  /** Sign-bit signature of `planes` random hyperplanes, packed into a
    * long — buckets for approximate cosine search (SimHash for vectors).
    * Delegates to the native single-pass expression
    * ([[graft.functions.HyperplaneSignatures]]); the round-1 HOF
    * formulation evaluated planes x dim interpreted lambdas per row. */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    get(graft.functions.HyperplaneSignatures.hyperplane_signatures(vec, planes, 1), lit(0))

  /** Exact brute-force top-k: every (query, item) cosine, keep k best per
    * query. Queries are broadcast (small side); items stream once. This is
    * the correctness baseline and the right plan when queries are few. */
  def bruteForceTopK(items: DataFrame, itemId: String, itemVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    // rename each side before the cross join: items and queries routinely
    // share column names (both are embedding tables), which would make the
    // post-join references ambiguous
    val i = items.select(col(itemId).as("item_id"), col(itemVec).as("_iv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"))
    val scored = i.crossJoin(broadcast(q))
      .select(
        col("query_id"), col("item_id"),
        cosine(col("_iv"), col("_qv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: items and queries bucketed by
    * hyperplane signatures in `tables` independent hash tables (the
    * standard recall lever), exact cosine re-rank within candidate
    * buckets; `probeBits=1` additionally probes all single-bit-flip
    * neighbor buckets (multiprobe), `probeBits=2` also every 2-bit flip —
    * the recall lever when bucket granularity rises at scale (probe cost
    * per query per table: 1, 1+planes, 1+planes+C(planes,2) buckets;
    * at planes=16 that is 1 / 17 / 137 — still far below scanning the
    * corpus, and only the QUERY side fans out). All `tables x planes`
    * projections come from ONE native expression pass per row
    * ([[graft.functions.HyperplaneSignatures]]).
    *
    * planes defaults to 16 (2^16 buckets per table): round 1 shipped 4 —
    * 16 buckets per table means every bucket holds n/16 of the corpus,
    * which is brute force with extra shuffles at scale. Recall lost to
    * narrower buckets is recovered by `tables` and multiprobe.
    *
    * @param maxBucketSize hot-bucket candidate cap: buckets larger than
    *   this are deterministically hash-sampled down to ~maxBucketSize
    *   items (a skew guard — candidate cost is bounded by
    *   queries x maxBucketSize instead of queries x bucket). */
  def lshTopK(items: DataFrame, itemId: String, itemVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 16, tables: Int = 8, probeBits: Int = 1,
              maxBucketSize: Int = 10000): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2,
      s"probeBits=$probeBits: multiprobe supports 0 (off), 1 (single-bit " +
        "flips), or 2 (+ all 2-bit flips); higher orders cost " +
        "C(planes, j) probes per extra bit for vanishing recall gain")
    // (table_id, signature) packed into one long: table in high bits
    def buckets(vecCol: String): Column =
      transform(
        graft.functions.HyperplaneSignatures.hyperplane_signatures(col(vecCol), planes, tables),
        (s, t) => s.bitwiseOR(shiftleft(t.cast("long"), 56)))
    val itemsB0 = items
      .select(col(itemId).as("item_id"), col(itemVec).as("_iv"),
        explode(buckets(itemVec)).as("_bucket"))
    val bucketSizes = itemsB0.groupBy(col("_bucket")).agg(count(lit(1)).as("_bn"))
    val itemsB = itemsB0.join(bucketSizes, "_bucket")
      .filter(col("_bn") <= maxBucketSize ||
        pmod(xxhash64(col("item_id"), col("_bucket")), col("_bn")) < maxBucketSize)
      .drop("_bn")
    val q0 = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"),
      buckets(queryVec).as("_qbs"))
    // multiprobe: per table, original bucket + all <=probeBits-bit flips.
    // Flip masks only touch the low `planes` bits, never the table id in
    // bits 56+. The mask list is built once at plan time (driver), so the
    // per-row work is explode over a literal-XOR array — codegen-friendly.
    val flipMasks: Seq[Long] =
      (if (probeBits >= 1) (0 until planes).map(p => 1L << p) else Nil) ++
      (if (probeBits >= 2)
        for { p <- 0 until planes; q <- p + 1 until planes } yield (1L << p) | (1L << q)
      else Nil)
    val probes =
      if (flipMasks.isEmpty)
        q0.select(col("query_id"), col("_qv"), explode(col("_qbs")).as("_bucket"))
      else q0.select(col("query_id"), col("_qv"),
        explode(flatten(transform(col("_qbs"), b =>
          array(b +: flipMasks.map(m => b.bitwiseXOR(lit(m))): _*)))).as("_bucket"))
    val cands = probes.join(itemsB, "_bucket")
      .select(col("query_id"), col("item_id"),
        cosine(col("_iv"), col("_qv")).as("score"))
      // ONE query_id exchange for both keyed steps (guide §2.4): the
      // explicit repartition's HashPartitioning(query_id) satisfies the
      // pair-dedup groupBy (query_id ⊂ its keys) AND the rank window, so
      // neither adds an exchange — previously the groupBy shuffled on
      // (query_id, item_id) and the window re-shuffled on query_id. Skew
      // exposure is unchanged: the window already clustered per query, and
      // per-query candidates are bounded by maxBucketSize x tables x probes.
      .repartition(col("query_id"))
      // a pair can surface via several probes
      .groupBy(col("query_id"), col("item_id")).agg(max(col("score")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- IVF (inverted-file) ANN -------------------------------------------------

  /** Spherical k-means coarse quantizer trained on a bounded, deterministic
    * sample (`orderBy(xxhash64(id), id).limit(n)` = distributed
    * TakeOrdered — no full sort, no unbounded collect). Hash-ordering
    * instead of id-ordering keeps the sample unbiased when ids correlate
    * with content (time-ordered ids at 100 TB would otherwise train
    * centroids on the oldest slice of the corpus only); the id tiebreak
    * keeps it deterministic under hash collisions. Strided init over the
    * ordered sample + Lloyd iterations with cosine assignment; empty cells
    * keep their old centroid. Fully deterministic: same data -> same
    * centroids. */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     nLists: Int, maxSamples: Int = 8192, iters: Int = 8): Array[Array[Double]] = {
    // double-cast in the plan so float AND double vector columns both
    // work; NULL/empty vectors are excluded before sampling
    val rows = df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(maxSamples)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.length >= nLists, s"need >= $nLists sample vectors, got ${rows.length}")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample = rows.map(normalize)
    val dim = sample.head.length
    val stride = sample.length / nLists
    var centroids = Array.tabulate(nLists)(i => sample(i * stride).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Int](nLists)
      for (v <- sample) {
        val c = graft.functions.NearestCentroids.nearest(v, centroids, 1)(0)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nLists)(c =>
        if (counts(c) == 0) centroids(c)
        else normalize(sums(c).map(_ / counts(c))))
    }
    centroids
  }

  /** Persisted coarse quantizer: centroids + the digest of the corpus they
    * were trained on. At 100 TB the operational pattern is many ANN
    * invocations over an unchanged corpus — training is deterministic but
    * not free (a bounded sample scan + driver k-means), so the artifact
    * makes re-runs skip it, and the digest makes a stale artifact
    * impossible to use silently. */
  final case class CentroidIndex(corpusDigest: String, centroids: Array[Array[Double]])

  /** Order-insensitive corpus digest over (id, vector) pairs: one small
    * aggregate job over per-row hashes. count + bit_xor alone is NOT
    * enough — xor cancels duplicate rows pairwise, so {A,A} and {B,B}
    * would collide — so a decimal(38,0) SUM of the hashes rides along
    * (1e12 rows × 2^63 ≈ 1e31 « 1e38, no ANSI overflow, still
    * order-insensitive). Excludes null/empty vectors, mirroring
    * [[trainCentroids]]'s sample universe.
    *
    * COST NOTE: this scans the full (id, vector) projection — about the
    * same I/O as the bounded training scan it lets you skip. When cheap
    * lineage exists (e.g. partition content digests from the lineage
    * layer), pass it to the `digest`-taking [[trainOrLoadCentroids]]
    * overload instead of calling this. */
  def corpusDigest(df: DataFrame, idCol: String, vecCol: String): String = {
    val r = df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(xxhash64(col(idCol), col(vecCol).cast("array<double>")).as("_h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(_h)").as("x"),
           sum(col("_h").cast("decimal(38,0)")).as("s"))
      .collect()(0)
    val x = java.lang.Long.toHexString(if (r.isNullAt(1)) 0L else r.getLong(1))
    val s = if (r.isNullAt(2)) "0" else r.getDecimal(2).toBigInteger.toString(16)
    s"${r.getLong(0)}:$x:$s"
  }

  /** Write the centroid artifact (JSON) through the Hadoop FileSystem of
    * the path's scheme — file:, hdfs:// and s3a:// all work, like the
    * lineage layer. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession, path: String,
                    index: CentroidIndex): Unit = {
    val sb = new java.lang.StringBuilder
    sb.append("{\"_format\":1,\"corpusDigest\":")
      .append(graft.io.JsonText.quote(index.corpusDigest))
      .append(",\"nLists\":").append(index.centroids.length)
      .append(",\"dim\":").append(if (index.centroids.isEmpty) 0 else index.centroids.head.length)
      .append(",\"centroids\":[")
    var i = 0
    while (i < index.centroids.length) {
      if (i > 0) sb.append(',')
      sb.append(index.centroids(i).mkString("[", ",", "]"))
      i += 1
    }
    sb.append("]}")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // temp-sibling + rename commit. NOT fully atomic: between the
    // pre-delete and the rename (and on object stores where rename is
    // copy+delete) a crash can leave NO artifact at the final path — that
    // is safe-by-recovery, not lossless: absent triggers a retrain on the
    // next run. What the pattern DOES guarantee is that the final path is
    // never truncated/partial JSON, which loadCentroids would (by design)
    // treat as corrupt and RAISE on every subsequent run (same pattern as
    // the checkpoint manifest). On filesystems with overwriting rename
    // (HDFS/local) we skip the pre-delete so the final path is old-or-new
    // throughout.
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val renamedOver =
      try {
        // FileContext exposes the public overwriting rename (FileSystem's
        // 3-arg variant is protected); HDFS/local implement it as a single
        // metadata op — no no-artifact window
        org.apache.hadoop.fs.FileContext
          .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!renamedOver) {
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p), s"failed to commit centroid artifact to $path")
    }
  }

  /** Load a centroid artifact; None when the path does not exist. A
    * malformed artifact raises (corrupt != absent). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession, path: String): Option[CentroidIndex] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
      require(root.get("_format") != null && root.get("_format").asInt() == 1,
        s"unsupported centroid artifact format in $path")
      val cents = root.get("centroids")
      val digestNode = root.get("corpusDigest")
      val dimNode = root.get("dim")
      require(cents != null && cents.isArray && digestNode != null && dimNode != null,
        s"malformed centroid artifact in $path (missing centroids/corpusDigest/dim)")
      val arr = Array.tabulate(cents.size()) { i =>
        val row = cents.get(i)
        Array.tabulate(row.size())(j => row.get(j).asDouble())
      }
      val dim = dimNode.asInt()
      require(arr.forall(_.length == dim), s"ragged centroid artifact in $path")
      Some(CentroidIndex(digestNode.asText(), arr))
    }
  }

  /** Train-or-load: reuse the persisted centroids when their corpus digest
    * matches the current corpus, retrain (and overwrite the artifact)
    * otherwise. Returns the centroids plus whether training ran.
    *
    * This overload computes [[corpusDigest]] itself — a full scan of the
    * (id, vector) projection, roughly the cost of the bounded training
    * scan it can skip. It buys change DETECTION, not scan avoidance; when
    * the caller already has cheap lineage (partition content digests, a
    * table snapshot id), use the explicit-`digest` overload below and the
    * cache hit costs no row I/O at all. */
  def trainOrLoadCentroids(df: DataFrame, idCol: String, vecCol: String,
                           nLists: Int, artifactPath: String,
                           maxSamples: Int = 8192, iters: Int = 8): (Array[Array[Double]], Boolean) =
    trainOrLoadCentroids(df, idCol, vecCol, nLists, artifactPath,
      corpusDigest(df, idCol, vecCol), maxSamples, iters)

  /** Train-or-load keyed by a CALLER-SUPPLIED corpus digest (e.g. the
    * lineage layer's partition content digest) — the 100 TB pattern: a
    * cache hit is one small artifact read, zero row scans. The caller owns
    * digest fidelity: a key that does not change when the corpus does will
    * serve stale centroids. */
  def trainOrLoadCentroids(df: DataFrame, idCol: String, vecCol: String,
                           nLists: Int, artifactPath: String, digest: String,
                           maxSamples: Int, iters: Int): (Array[Array[Double]], Boolean) = {
    val spark = df.sparkSession
    loadCentroids(spark, artifactPath) match {
      case Some(idx) if idx.corpusDigest == digest => (idx.centroids, false)
      case _ =>
        val cents = trainCentroids(df, idCol, vecCol, nLists, maxSamples, iters)
        saveCentroids(spark, artifactPath, CentroidIndex(digest, cents))
        (cents, true)
    }
  }

  /** IVF approximate top-k: items live in their nearest-centroid cell
    * (ONE cell per item — the inverted file), queries probe their `nProbe`
    * nearest cells, exact cosine re-rank inside. The standard ANN scale
    * path when buckets must be balanced: candidate cost ~=
    * queries x nProbe x (n / nLists), and k-means cells don't degenerate
    * the way hash buckets can. Assignment and probing are one native
    * expression pass per row ([[graft.functions.NearestCentroids]]). */
  def ivfTopK(items: DataFrame, itemId: String, itemVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, centroids: Array[Array[Double]], nProbe: Int = 4): DataFrame = {
    import graft.functions.NearestCentroids.nearest_centroids
    val itemsC = items.select(col(itemId).as("item_id"), col(itemVec).as("_iv"),
      get(nearest_centroids(col(itemVec), centroids, 1), lit(0)).as("_cell"))
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"),
      explode(nearest_centroids(col(queryVec), centroids, nProbe)).as("_cell"))
    val cands = probes.join(itemsC, "_cell")
      .select(col("query_id"), col("item_id"),
        cosine(col("_iv"), col("_qv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
