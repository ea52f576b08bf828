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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * maps a hash to roughly-uniform [-1, 1]. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim, lit("plane")), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0

  /** Sign-bit signature of `planes` random hyperplanes, packed into a
    * long — buckets for approximate cosine search (SimHash for vectors).
    * Plane loop unrolled at plan-build time. */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * planeComponent(lit(p), i)),
        lit(0.0d), (a, v) => a + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Exact brute-force top-k: every (query, item) cosine, keep k best per
    * query. Queries are broadcast (small side); items stream once. This is
    * the correctness baseline and the right plan when queries are few. */
  def bruteForceTopK(items: DataFrame, itemId: String, itemVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val scored = items.crossJoin(broadcast(queries))
      .select(
        col(queryId).as("query_id"), col(itemId).as("item_id"),
        cosine(col(itemVec), col(queryVec)).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Signature for hash table `t` — planes are disjoint per table. */
  def hyperplaneSignatureTable(vec: Column, planes: Int, table: Int): Column =
    (0 until planes).map { p =>
      val planeId = table * planes + p
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * planeComponent(lit(planeId), i)),
        lit(0.0d), (a, v) => a + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: items and queries bucketed by
    * hyperplane signatures in `tables` independent hash tables (the
    * standard recall lever), exact cosine re-rank within candidate
    * buckets; `probeBits=1` additionally probes all single-bit-flip
    * neighbor buckets (multiprobe). */
  def lshTopK(items: DataFrame, itemId: String, itemVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 10, tables: Int = 4, probeBits: Int = 1): DataFrame = {
    def buckets(df: DataFrame, vecCol: String): Column =
      // (table_id, signature) pairs packed: table in high bits
      array((0 until tables).map(t =>
        hyperplaneSignatureTable(col(vecCol), planes, t)
          .bitwiseOR(lit(t.toLong << 56))): _*)
    val itemsB = items
      .select(col(itemId).as("item_id"), col(itemVec).as("_iv"),
        explode(buckets(items, itemVec)).as("_bucket"))
    val q0 = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv"),
      buckets(queries, queryVec).as("_qbs"))
    // multiprobe: per table, original bucket + optional 1-bit flips
    val probes =
      if (probeBits <= 0) q0.select(col("query_id"), col("_qv"), explode(col("_qbs")).as("_bucket"))
      else q0.select(col("query_id"), col("_qv"),
        explode(flatten(transform(col("_qbs"), b =>
          array(b +: (0 until planes).map(p => b.bitwiseXOR(lit(1L << p))): _*)))).as("_bucket"))
    val cands = probes.join(itemsB, "_bucket")
      .select(col("query_id"), col("item_id"),
        cosine(col("_iv"), col("_qv")).as("score"))
      // a pair can surface via several probes
      .groupBy(col("query_id"), col("item_id")).agg(max(col("score")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
