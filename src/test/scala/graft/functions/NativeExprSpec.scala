package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextAnalysis}

/** Unit tests for the round-2 native Catalyst expressions:
  * [[HyperplaneSignatures]], [[LangId]], [[QualityScore]].
  */
class NativeExprSpec extends SparkSuite {
  import spark.implicits._

  test("hyperplane signatures: deterministic, float/double parity, table layout") {
    // double values derived FROM the floats so both inputs are bit-identical
    // after widening (0.3f != 0.3d)
    val vf = Array(0.3f, -1.2f, 0.8f, 0.05f, -0.4f)
    val v = vf.map(_.toDouble)
    val s1 = HyperplaneSignatures.signatures(v, planes = 16, tables = 4)
    val s2 = HyperplaneSignatures.signatures(v, planes = 16, tables = 4)
    assert(s1.toSeq == s2.toSeq, "must be deterministic")
    assert(s1.length == 4)
    // table 0 of a multi-table call uses planes [0, planes) — identical to
    // a single-table call (plane family is positional, not table-relative)
    val single = HyperplaneSignatures.signatures(v, planes = 16, tables = 1)
    assert(s1(0) == single(0))
    // float input must produce the same signature as the widened double
    val df = Seq((vf, v)).toDF("f", "d")
    val row = df.select(
      HyperplaneSignatures.hyperplane_signatures(col("f"), 16, 4).as("sf"),
      HyperplaneSignatures.hyperplane_signatures(col("d"), 16, 4).as("sd")).collect()(0)
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    assert(row.getSeq[Long](0) == s1.toSeq)
  }

  test("hyperplane signatures: close vectors share most sign bits, far ones don't") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7))
    val near = base.map(_ * 1.01 + 0.001)
    val far = Array.tabulate(64)(i => math.cos(i * 2.3))
    def bits(v: Array[Double]) = HyperplaneSignatures.signatures(v, 48, 1)(0)
    val dNear = java.lang.Long.bitCount(bits(base) ^ bits(near))
    val dFar = java.lang.Long.bitCount(bits(base) ^ bits(far))
    assert(dNear <= 2, s"near vector flipped $dNear of 48 planes")
    assert(dFar >= 10, s"far vector flipped only $dFar of 48 planes")
  }

  test("langId native matches the per-language HOF score formulation") {
    val texts = Seq(
      "the cat sat on the mat and it was happy with the dog",
      "der hund und die katze sind nicht in der wohnung mit dem kind",
      "le chien et le chat sont dans la maison avec une souris pour le", // fr
      "el perro y el gato en la casa con una comida para el",
      "zzz qqq xxx yyy www",
      "", "the el le und e di il 123 456")
    val langs = TextProfile.langs
    val df = texts.toDF("text")
    // reference semantics: argmax over (score, lang), strict 0.05 threshold
    val scored = df.select(col("text"), TextAnalysis.langId(col("text")).as("native"),
      array(langs.map(l => struct(TextAnalysis.langScore(col("text"), l).as("s"),
        lit(l).as("l"))): _*).as("scores"))
    scored.collect().foreach { r =>
      val best = r.getSeq[org.apache.spark.sql.Row](2).maxBy(x => (x.getDouble(0), x.getString(1)))
      val expected = if (best.getDouble(0) > 0.05) best.getString(1) else "und"
      assert(r.getString(1) == expected,
        s"text='${r.getString(0)}': native=${r.getString(1)} hof=$expected")
    }
  }

  test("langId agrees with the HOF formulation across the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val langs = TextProfile.langs
    val mismatches = docs.select(
        TextAnalysis.langId(col("text")).as("native"),
        array(langs.map(l => struct(TextAnalysis.langScore(col("text"), l).as("s"),
          lit(l).as("l"))): _*).as("sc"))
      .withColumn("best", array_max(col("sc")))
      .withColumn("hof", when(col("best.s") > 0.05, col("best.l")).otherwise(lit("und")))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("qualityScore native: spot values for the scoring bands") {
    // short text: lenScore 0, punct 1.0, sw 0.4 ("hi": 0 stopwords), word 0.5
    assert(TextProfile.qualityScore("hi") === 0.0 * 0.4 + 1.0 * 0.2 + 0.4 * 0.2 + 0.5 * 0.2)
    // clean English prose in [200, 20000] chars scores 1.0
    val prose = ("the quick brown fox jumps over the lazy dog and it was " +
      "a sunny day in the field with animals playing near the river ") * 2
    assert(prose.length >= 200)
    assert(TextProfile.qualityScore(prose) === 1.0)
    // punctuation soup: punct ratio > 0.2 drops punctScore to 0.3
    val junk = "!!! ??? *** ### @@@ $$$ %%% ^^^ &&& ((( )))" * 3
    val q = TextProfile.qualityScore(junk)
    assert(q < 0.6, s"junk scored $q")
  }

  test("TextStats matches the HOF/regex formulation across the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatch = docs.select(
        TextStats.text_stats(col("text")).as("_ts"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws"),
        length(col("text")).as("nc"),
        coalesce(regexp_count(col("text"), lit("[^\\s\\p{L}\\p{N}]")), lit(0)).as("np"),
        TextAnalysis.approxBpeTokenCountReference(col("text")).as("bpe"))
      .filter(col("_ts.ws_tokens") =!= col("ws") || col("_ts.n_chars") =!= col("nc") ||
        col("_ts.n_punct") =!= col("np") || col("_ts.bpe_tokens") =!= col("bpe"))
      .count()
    assert(mismatch === 0)
    val edge = Seq(("  a  b.c! ", 1), ("", 2), ("extraordinarily big numbers 12345!", 3))
      .toDF("text", "i")
      .select(TextStats.text_stats(col("text")).as("s")).collect()
    // runs "a","b.c!"; punct '.','!'; bpe: a,b,c letters + '.' + '!' = 5
    assert(edge(0).getStruct(0).toSeq == Seq(2, 10, 2, 5))
    assert(edge(1).getStruct(0).toSeq == Seq(0, 0, 0, 0))
    // "extraordinarily"(15) -> 1 + (15-1)/6 = 3; big=1; numbers(7) -> 1 +
    // (7-1)/6 = 2; five digits = 5; '!' = 1 -> bpe 12
    assert(edge(2).getStruct(0).toSeq == Seq(4, 34, 1, 12))
  }

  test("text natives agree with the HOF formulations on the multilingual slice") {
    // the non-ASCII leg of the corpus-agreement tests above: CJK, RTL,
    // combining marks, emoji/non-BMP, fullwidth forms, NBSP/thin-space,
    // Arabic-Indic digits (graft.gen.MultilingualSlice — the same rows the
    // DuckDB oracle gate runs over). The HOF formulations use \p{L}\p{N}
    // regexes and split("\\s+"), so agreement here pins the natives'
    // codepoint iteration, isLetterOrDigit runs, and isWs set on content
    // where charAt-vs-codePointAt and ASCII-vs-unicode classes actually
    // differ. (The slice deliberately avoids the KNOWN class splits:
    // \x0B, Nl/No number forms, context-sensitive case mappings.)
    val docs = graft.gen.MultilingualSlice.df(spark)
    val statsMismatch = docs.select(
        TextStats.text_stats(col("text")).as("_ts"),
        TextAnalysis.whitespaceTokenCount(col("text")).as("ws"),
        length(col("text")).as("nc"),
        coalesce(regexp_count(col("text"), lit("[^\\s\\p{L}\\p{N}]")), lit(0)).as("np"),
        TextAnalysis.approxBpeTokenCountReference(col("text")).as("bpe"))
      .filter(col("_ts.ws_tokens") =!= col("ws") || col("_ts.n_chars") =!= col("nc") ||
        col("_ts.n_punct") =!= col("np") || col("_ts.bpe_tokens") =!= col("bpe"))
      .count()
    assert(statsMismatch === 0)
    val langs = TextProfile.langs
    val langMismatch = docs.select(
        TextAnalysis.langId(col("text")).as("native"),
        array(langs.map(l => struct(TextAnalysis.langScore(col("text"), l).as("s"),
          lit(l).as("l"))): _*).as("sc"))
      .withColumn("best", array_max(col("sc")))
      .withColumn("hof", when(col("best.s") > 0.05, col("best.l")).otherwise(lit("und")))
      .filter(col("native") =!= col("hof")).count()
    assert(langMismatch === 0)
    // codepoint spot values: emoji are single chars, surrogate halves are
    // NOT double-counted, the emoji-only doc is token-free
    val emojiOnly = docs.filter(col("doc_id") === (graft.gen.MultilingualSlice.IdBase + 28L))
      .select(TextStats.text_stats(col("text")).as("s")).collect()(0).getStruct(0)
    assert(emojiOnly.toSeq == Seq(2, 6, 5, 5), s"emoji-only stats: ${emojiOnly.toSeq}")
  }

  test("NearestCentroids: NaN vectors assign deterministically, no crash") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val nan = Array(Double.NaN, Double.NaN)
    assert(NearestCentroids.nearest(nan, centroids, 2).toSeq == Seq(0, 1),
      "NaN scores fall back to lowest-id untaken cells")
    // a NaN score must never beat a real one
    val mixed = Array(Array(Double.NaN, Double.NaN), Array(0.0, 1.0))
    assert(NearestCentroids.nearest(Array(0.0, 1.0), mixed, 1).toSeq == Seq(1))
  }

  test("trainCentroids accepts double vector columns too") {
    val df = spark.range(40).selectExpr("id",
      "array(cast(id as double), cast(id % 7 as double)) as v")
    val c = graft.ops.Similarity.trainCentroids(df, "id", "v", nLists = 4, maxSamples = 40)
    assert(c.length == 4 && c.forall(_.length == 2))
  }

  test("hyperplaneSignature column API (single table) matches native call") {
    val df = Seq((Array(1.0f, -2.0f, 0.5f))).toDF("v")
    val sig = df.select(Similarity.hyperplaneSignature(col("v"), 16)).collect()(0).getLong(0)
    assert(sig === HyperplaneSignatures.signatures(Array(1.0, -2.0, 0.5), 16, 1)(0))
  }

  test("wrong-typed children fail at analysis with a readable message, not mid-job") {
    val df = Seq((1L, Array(1.0f, 2.0f), "txt")).toDF("id", "vec", "text")
    val eStr = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.ShingleMinHash.shingle_minhash(col("id"), 3, 16)).collect())
    assert(eStr.getMessage.contains("requires a string column"), eStr.getMessage)
    val eVec = intercept[org.apache.spark.sql.AnalysisException](
      df.select(HyperplaneSignatures.hyperplane_signatures(col("text"), 4, 1)).collect())
    assert(eVec.getMessage.contains("array<float|double>"), eVec.getMessage)
    // valid inputs still analyze: string natives on strings, vector on vecs,
    // and a bare null literal stays a legal (NULL-returning) child
    assert(df.select(graft.functions.SimHash64.simhash64(lit(null).cast("string"))).collect()(0).isNullAt(0))
  }
}
