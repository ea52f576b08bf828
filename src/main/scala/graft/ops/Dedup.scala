package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, over a
  * documents table (id + text). All candidate generation is expression-only
  * (no UDFs) so the scan stays in whole-stage codegen; the only shuffles
  * are the bucket joins, which is the canonical MinHash/LSH layout at
  * 100 TB: signatures are O(docs), bucket join fans out only colliding
  * candidates.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------

  /** Exact duplicate groups by full-text hash (xxhash64 for grouping, which
    * is collision-tolerable for dedup; use `sha2` for audit-grade ids).
    * Returns (keep_id, dup_id) pairs, keep = min id of the group. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val groups = df
      .select(col(idCol).as("doc_id"), xxhash64(col(textCol)).as("_h"))
      .groupBy(col("_h"))
      .agg(min(col("doc_id")).as("keep_id"), collect_list(col("doc_id")).as("_ids"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    groups.select(col("keep_id"), explode(col("_ids")).as("dup_id"))
      .filter(col("dup_id") =!= col("keep_id"))
  }

  // ---- shingling + MinHash ---------------------------------------------------

  /** Normalized word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Word k-shingles as strings ("a b c"). Expression-only. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k), i =>
        array_join(slice(toks, i + 1, lit(k)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature: H independent hash functions, each the min of
    * `xxhash64(shingle, i)` over the shingle set. Pure expression — no
    * explode, no shuffle. */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingleArr, s => xxhash64(s, i))))

  /** LSH banding: (doc_id, band_id, band_hash) — one row per band. Docs
    * sharing any band hash are near-dup candidates. */
  def lshBuckets(df: DataFrame, idCol: String, sigCol: String,
                 bands: Int, rowsPerBand: Int): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand), lit(b))): _*)))
      .withColumnsRenamed(Map("pos" -> "band_id", "col" -> "band_hash"))

  /** Estimated Jaccard from two signatures: matching-minhash fraction. */
  def sigJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)).cast("double") / size(a)

  /** Full MinHash+LSH near-duplicate pipeline:
    * shingle → signature (map-only) → band buckets → within-bucket
    * self-join (the only shuffle) → signature-estimated Jaccard filter.
    * Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    *
    * @param maxBucketSize guard against degenerate buckets (boilerplate
    *   text): buckets larger than this are dropped — at web scale a single
    *   hot bucket otherwise produces O(n²) candidate pairs.
    */
  def minHashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    // native fused expression: ~500x the throughput of the HOF formulation
    // (interpreted lambdas), see graft.functions.ShingleMinHash
    val sigs = df.select(
      col(idCol).as("doc_id"),
      graft.functions.ShingleMinHash.shingle_minhash(
        col(textCol), shingleK, numHashes).as("_sig"))
    val buckets = lshBuckets(sigs, "doc_id", "_sig", bands, rowsPerBand)
    val sized = buckets
      .groupBy(col("band_id"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("_ids"), count(lit(1)).as("_n"))
      .filter(col("_n") > 1 && col("_n") <= maxBucketSize)
    // pairs within a bucket, deduped across buckets
    val pairs = sized
      .select(explode(col("_ids")).as("doc_a"), col("_ids"))
      .select(col("doc_a"), explode(col("_ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val a = sigs.select(col("doc_id").as("doc_a"), col("_sig").as("_sig_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("_sig").as("_sig_b"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        sigJaccard(col("_sig_a"), col("_sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // ---- exact n-gram Jaccard ---------------------------------------------------

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle
    * (inverted-index join). `maxDocFreq` prunes stop-shingles before the
    * self-join — the standard guard against quadratic blowup on common
    * n-grams. Returns (doc_a, doc_b, jaccard). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("_sh"))
    val sizes = sh.select(col("doc_id"), size(col("_sh")).as("_sz"))
    val inv = sh.select(col("doc_id"), explode(col("_sh")).as("shingle"))
    val pruned = inv.withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("_df") <= maxDocFreq).drop("_df")
    val inter = pruned.as("x").join(pruned.as("y"), "shingle")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "_sz" -> "_sza")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "_sz" -> "_szb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("_inter").cast("double") /
          (col("_sza") + col("_szb") - col("_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -----------------------------------------------------------------

  /** 64-bit SimHash over word tokens, expression-only: bit j of the
    * fingerprint is the sign of Σ_tokens (bit j of xxhash64(token) ? +1 : -1).
    * Bit loop unrolled at plan-build time (Spark's shift functions take
    * literal amounts only); 64 aggregates over the token-hash array fuse
    * into one projection. Candidate for a custom codegen Expression if it
    * ever dominates a profile. */
  def simHash(text: Column): Column = {
    val toks = tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0),
        (a, h) => a + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicates with Hamming distance ≤ maxHamming, candidate
    * generation by the 4-chunk pigeonhole (any identical 16-bit chunk →
    * candidate; complete for maxHamming ≤ 3). */
  def simHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(col(textCol)).as("_fp"))
    val chunks = fp.select(col("doc_id"), col("_fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("_fp"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "chunk_id", "col" -> "chunk"))
    val cands = chunks.as("x").join(chunks.as("y"), Seq("chunk_id", "chunk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x._fp").as("_fpa"), col("y._fp").as("_fpb"))
      .distinct()
    cands.select(col("doc_a"), col("doc_b"),
        hammingDistance(col("_fpa"), col("_fpb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding near-dup ---------------------------------------------------

  /** Embedding-cosine near-duplicates: candidates from random-hyperplane
    * sign buckets (deterministic pseudo-planes from hashes), verified with
    * exact cosine. Returns (id_a, id_b, cosine). */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double = 0.95, planes: Int = 16): DataFrame = {
    val sig = Similarity.hyperplaneSignature(col(vecCol), planes)
    val withSig = df.select(col(idCol).as("doc_id"), col(vecCol).as("_v"), sig.as("_b"))
    val cands = withSig.as("x").join(withSig.as("y"), "_b")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        Similarity.cosine(col("x._v"), col("y._v")).as("cosine"))
    cands.filter(col("cosine") >= threshold)
  }
}
