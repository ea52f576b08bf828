package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The native expressions must (a) produce identical results under forced
  * codegen and forced interpretation — a Janino error would otherwise be
  * masked by Spark's silent fallback — and (b) keep their enclosing stage
  * inside WholeStageCodegen (the round-2 verdict's item 2: a
  * CodegenFallback expression forces the whole scan stage interpreted). */
class CodegenSpec extends SparkSuite {

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog and the dog sleeps",
    "el rápido zorro marrón salta sobre el perro perezoso y la casa",
    "!!! ... ###", // token-free: NULL minhash/simhash
    "", // empty
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "word " * 50 + "tail")

  private def allNatives(df: org.apache.spark.sql.DataFrame) = df.select(
    col("text"),
    ShingleMinHash.shingle_minhash(col("text"), 3, 16).as("mh"),
    ShingleHashes.shingle_hashes(col("text"), 2).as("sh"),
    SimHash64.simhash64(col("text")).as("fp"),
    TextStats.text_stats(col("text")).as("ts"),
    LangId.lang_id(col("text")).as("lang"),
    QualityScore.quality_score(col("text")).as("q"))

  test("codegen == interpreted for every native text expression") {
    import spark.implicits._
    // repartition: without it ConvertToLocalRelation folds the projection
    // at plan time and the factory mode under test never runs
    val df = texts.toDF("text").repartition(2)
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try allNatives(df).collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("codegen == interpreted for the vector natives") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f, 0.0f)),
      (2L, Array(-1.0f, 2.0f, -3.0f, 0.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec").repartition(2)
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    def run(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try vecs.select(
          col("id"),
          HyperplaneSignatures.hyperplane_signatures(col("vec"), 8, 3).as("sig"),
          NearestCentroids.nearest_centroids(col("vec"), cents, 2).as("cells"),
          // double-typed input exercises the other conversion branch
          HyperplaneSignatures.hyperplane_signatures(
            col("vec").cast("array<double>"), 8, 2).as("sigd"))
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("native text scan stays inside WholeStageCodegen") {
    import spark.implicits._
    // repartition: keep the child non-local, else ConvertToLocalRelation
    // evaluates the whole projection at plan time and there is no stage
    val df = allNatives(texts.toDF("text").repartition(2))
    df.collect() // materialize: AQE only finalizes the plan at runtime
    // string check: AQE wraps stages in leaf QueryStageExec nodes that
    // plan.collect can't descend into; a `*(n)`-prefixed Project line IS
    // the WholeStageCodegen marker (a CodegenFallback expression would
    // print an unstarred Project)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE dump repeats the pre-runtime plan
    val projLines = plan.linesIterator.filter(_.contains("Project")).toSeq
    assert(projLines.nonEmpty && projLines.forall(_.contains("*(")),
      s"the native projection fell out of WholeStageCodegen:\n$plan")
  }
}
