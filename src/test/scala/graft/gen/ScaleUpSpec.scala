package graft.gen

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The sf1 bench corpus derives from sf0.1 through [[ScaleUp]]; these pin
  * the properties the bench evidence relies on: linear growth, id
  * disjointness under the dup-injection offset, per-replica content
  * perturbation (no cross-replica exact dups), n_chars consistency, and
  * determinism.
  */
class ScaleUpSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alpha beta gamma", "en", "web", 16L),
    (1L, "delta epsilon zeta eta", "en", "web", 22L),
    (17L, "theta iota kappa", "de", "book", 16L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.5f, -0.25f), "a"),
    (5L, Array(0.0f, 1.0f, -0.5f, 0.25f), "b")
  ).toDF("vec_id", "embedding", "label")

  test("documents scale linearly with disjoint ids below the dup offset") {
    val out = ScaleUp.scaleDocuments(docs, 10).cache()
    assert(out.count() == 30)
    assert(out.select("doc_id").distinct().count() == 30)
    val maxId = out.agg(max("doc_id")).as[Long].collect()(0)
    assert(maxId == 9L * 100000L + 17L)
    assert(maxId < 10000000L, "scaled ids must stay below the dup-injection offset")
    out.unpersist()
  }

  test("replica 0 is byte-identical to the source; replicas are perturbed per doc") {
    val out = ScaleUp.scaleDocuments(docs, 3).cache()
    val r0 = out.filter(col("doc_id") < 100000L)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(r0.except(docs).isEmpty && docs.except(r0).isEmpty)
    // no cross-replica exact duplicates: dedup outputs must grow linearly,
    // not quadratically, in the scaled corpus
    assert(out.groupBy("text").count().filter(col("count") > 1).isEmpty)
    out.unpersist()
  }

  test("n_chars always equals length(text) after scaling") {
    val out = ScaleUp.scaleDocuments(docs, 4)
    assert(out.filter(col("n_chars") =!= length(col("text")).cast("long")).isEmpty)
  }

  test("embeddings: replicas stay near their source vector but are not identical") {
    val out = ScaleUp.scaleEmbeddings(vecs, 3).cache()
    assert(out.count() == 6)
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.filter(col("vec_id") >= 100000L).collect().foreach { r =>
      val base = orig(r.getLong(0) % 100000L)
      val v = r.getSeq[Float](1).toArray
      assert(!v.sameElements(base), "replica embedding must be perturbed")
      val dot = base.zip(v).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(base.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
      assert(cos > 0.5, s"replica should stay near its source (cos=$cos)")
    }
    out.unpersist()
  }

  test("multilingual phrase coverage is decorrelated from the gate (r6 regression)") {
    // the r6 bug: gate and index shared one hash, so gated rows could only
    // reach indices ≡ 0 (mod gate-modulus) — 8 of 32 phrases, none of them
    // CJK/RTL/emoji. Pin BOTH generators: enough distinct phrases appear,
    // and at least one CJK phrase lands in generated text.
    val manyDocs = spark.range(2000).select(
      col("id").as("doc_id"), lit("base text").as("text"),
      lit("en").as("lang"), lit("web").as("source"), lit(9L).as("n_chars"))
    val scaled = ScaleUp.scaleDocuments(manyDocs, 2)
      .filter(col("doc_id") >= 100000L) // replica 1 rows carry suffixes
    val phrases = MultilingualSlice.docs.map(_._3)
    val hit = scaled.select(col("text")).as[String].collect()
    val distinctPhrases = phrases.count(p => hit.exists(_.contains(p)))
    assert(distinctPhrases > 8,
      s"gate/index correlation regressed: only $distinctPhrases/32 phrases reachable")
    assert(hit.exists(_.exists(c => c >= '一' && c <= '鿿')),
      "no CJK phrase reached the scaled corpus")

    val t = TranscriptGen.transcripts(spark,
      TranscriptGen.GenConfig(numConvs = 600, seed = 7, numPartitions = 2))
    val texts = t.select(col("text")).as[String].filter(_ != null).collect()
    val distinctT = phrases.count(p => texts.exists(_.contains(p)))
    assert(distinctT > 8,
      s"TranscriptGen gate/index correlation regressed: $distinctT/32 phrases")
    assert(texts.exists(_.exists(c => c >= '一' && c <= '鿿')),
      "no CJK phrase reached the transcript corpus")
  }

  test("scaling is deterministic") {
    val a = ScaleUp.scaleDocuments(docs, 5).orderBy("doc_id").collect()
    val b = ScaleUp.scaleDocuments(docs, 5).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val va = ScaleUp.scaleEmbeddings(vecs, 5).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val vb = ScaleUp.scaleEmbeddings(vecs, 5).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(va.sameElements(vb))
  }
}
