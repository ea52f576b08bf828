package graft.transcript

import graft.SparkSuite
import graft.gen.TranscriptGen
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants for the transcript suite — SURVEY §5:
  * "property-based tests for index/cardinality invariants". Uses
  * scalacheck generators with a fixed outer seed (scalatestplus bridge is
  * not on the offline classpath, so cases are drawn explicitly). */
class PropertySpec extends SparkSuite {

  private def draw[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).map(i => g(params, rng.Seed(42L + i)).get)
  }
  private def forAll[A](g: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    draw(g, n).foreach(f)
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(f: (A, B) => Unit): Unit =
    draw(ga, n).zip(draw(gb, n)).foreach { case (a, b) => f(a, b) }

  private val seeds = Gen.choose(1L, 10000L)
  private val sizes = Gen.choose(20L, 300L)

  test("clean generated transcripts produce ZERO violations (any seed/size)") {
    forAll2(seeds, sizes) { (seed: Long, n: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = n, seed = seed)
      val data = TranscriptGen.transcripts(spark, cfg)
      val keys = TranscriptGen.conversations(spark, cfg).select("conv_id")
      val report = new TranscriptValidator().validate(data, Some(keys))
      val v = report.violations.count()
      report.cleanup()
      assert(v == 0L, s"seed=$seed n=$n produced $v violations")
    }
  }

  test("dup-key violations equal independently counted duplicate keys") {
    forAll(seeds) { (seed: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = 150, seed = seed, dupRate = 0.02)
      val data = TranscriptGen.transcripts(spark, cfg).cache()
      val report = new TranscriptValidator().validate(data)
      val got = report.violations
        .filter(col("constraint_id") === Constraints.DupKey).count()
      val expected = data.groupBy("conv_id", "turn_idx").count()
        .filter(col("count") > 1).count()
      report.cleanup(); data.unpersist()
      assert(got == expected)
    }
  }

  test("validation is deterministic: same input, same violation multiset") {
    forAll(seeds) { (seed: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = 100, seed = seed,
        gapRate = 0.02, badRoleRate = 0.02)
      val data = TranscriptGen.transcripts(spark, cfg)
      def run(): Map[String, Long] = {
        val r = new TranscriptValidator().validate(data)
        val m = r.violations.groupBy("constraint_id").count()
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
        r.cleanup(); m
      }
      assert(run() == run())
    }
  }

  test("partition verdict counts sum to total rows and total violations") {
    forAll(seeds) { (seed: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = 120, seed = seed,
        nullRoleRate = 0.02, negTurnRate = 0.01)
      val data = TranscriptGen.transcripts(spark, cfg).cache()
      val report = new TranscriptValidator().validate(data)
      val parts = report.partitionVerdicts.collect()
      assert(parts.map(_.getAs[Long]("rows_scanned")).sum == data.count())
      assert(parts.map(_.getAs[Long]("violations")).sum == report.violations.count())
      report.cleanup(); data.unpersist()
    }
  }

  test("gap injection is pure: gapRate > 0 with dupRate = 0 produces NO dup-key violations") {
    forAll(seeds, n = 3) { (seed: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = 200, seed = seed,
        gapRate = 0.05, dupRate = 0.0)
      val data = TranscriptGen.transcripts(spark, cfg)
      val report = new TranscriptValidator().validate(data)
      val byKind = report.violations.groupBy("constraint_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      report.cleanup()
      assert(byKind.getOrElse(Constraints.DupKey, 0L) == 0L,
        s"seed=$seed: gap injection leaked duplicate keys: $byKind")
      assert(byKind.getOrElse(Constraints.TsMonotone, 0L) == 0L,
        s"seed=$seed: gap injection leaked ts regressions: $byKind")
      assert(byKind.getOrElse(Constraints.SeqGap, 0L) > 0L,
        s"seed=$seed: expected gaps, got $byKind")
    }
  }

  test("neg-turn injection is pure: high negTurnRate + gapRate with tsRegressRate = 0 " +
    "leaks NO ts regressions and NO dup keys") {
    // round-3 review: a negative-turn row sorts FIRST in the conversation,
    // so its ts must be below every non-negative row's — deriving ts from
    // the unshifted turn0 (or, worse, the gap-shifted index) leaks
    // TsMonotone violations that tsRegressRate never injected. And the neg
    // index must be unique per row: a constant -1 collides two neg-gated
    // rows of one conversation into a duplicate key that dupRate never
    // injected. Rates are set high so neg, gap, and neg∧gap rows all
    // occur, and multi-neg conversations are near-certain.
    forAll(seeds, n = 3) { (seed: Long) =>
      val cfg = TranscriptGen.GenConfig(numConvs = 300, seed = seed,
        negTurnRate = 0.05, gapRate = 0.05, tsRegressRate = 0.0, dupRate = 0.0)
      val data = TranscriptGen.transcripts(spark, cfg)
      val report = new TranscriptValidator().validate(data)
      val byKind = report.violations.groupBy("constraint_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      report.cleanup()
      assert(byKind.getOrElse(Constraints.TsMonotone, 0L) == 0L,
        s"seed=$seed: neg/gap injection leaked ts regressions: $byKind")
      assert(byKind.getOrElse(Constraints.DupKey, 0L) == 0L,
        s"seed=$seed: neg injection leaked duplicate keys: $byKind")
      assert(byKind.getOrElse(Constraints.NegTurnIdx, 0L) > 0L,
        s"seed=$seed: expected neg-turn violations, got $byKind")
      assert(byKind.getOrElse(Constraints.SeqGap, 0L) > 0L,
        s"seed=$seed: expected seq violations, got $byKind")
    }
  }
}
