package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript generator (BASELINE.json
  * `input_hint` shape): pure function of (seed, params) — every value
  * derives from `xxhash64(conv_id, turn_idx, salt)`, no RNG state, so any
  * partition can be regenerated independently at any parallelism.
  *
  * Conversation lengths are Zipf/Pareto-skewed (hot agent loops with 10^4+
  * turns next to 2-turn chats) so the skew handling of the validation
  * aggregations is actually exercised, per SURVEY §7.4.
  *
  * Error injection (each rate independently gated on its own hash salt):
  * duplicate (conv_id, turn_idx); turn gaps; null/invalid role; null text;
  * negative turn_idx; orphan conv_ids (absent from the conversation key
  * table); ts regressions. Injected counts are themselves deterministic,
  * so tests can compute the expected violation set independently.
  */
object TranscriptGen {

  /** Bump on ANY change to the generated data semantics (not just the
    * config surface): dataset caches keyed on the config digest
    * (ScalingBench) must regenerate when the generator itself changes.
    * The cache tag ALSO digests the canonicalized generation plan, so a
    * forgotten bump is caught mechanically; this constant documents
    * intent and survives plan-string changes across Spark versions.
    * v3: unique per-row negative turn indices (was a constant -1).
    * v4: conversation-relative ts-regression sentinel (was EPOCH0-3600,
    * which sat above deep-negative neg-row timestamps).
    * v5: ~1/8 of turns carry a deterministic multilingual phrase
    * (MultilingualSlice) — the scaling corpus is non-ASCII-bearing like
    * real training data.
    * v6: phrase INDEX decorrelated from the gate hash (v5's shared hash
    * made only indices ≡ 0 mod 8 reachable — 4 ASCII-heavy phrases, no
    * CJK/RTL/emoji). */
  val GenVersion = 6

  final case class GenConfig(
      numConvs: Long,
      seed: Long = 42L,
      zipfAlpha: Double = 1.3,
      minLen: Int = 2,
      maxLen: Int = 4096,
      numPartitions: Int = 8,
      dupRate: Double = 0.0,
      gapRate: Double = 0.0,
      nullRoleRate: Double = 0.0,
      badRoleRate: Double = 0.0,
      negTurnRate: Double = 0.0,
      nullTextRate: Double = 0.0,
      tsRegressRate: Double = 0.0,
      orphanConvRate: Double = 0.0,
      /** shift role/text-length distributions (drift-test fixture) */
      drifted: Boolean = false)

  private val EPOCH0 = 1704067200L // 2024-01-01T00:00:00Z

  /** uniform [0,1) from a salted hash of the given columns */
  private def u(salt: String, cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64((cols :+ lit(salt)): _*), lit(1000000L)).cast("double") / 1000000.0

  /** Conversation key table: (conv_id, conv_len, partition_id). */
  def conversations(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val base = spark.range(0L, cfg.numConvs, 1L, cfg.numPartitions)
      .withColumn("conv_id", concat(lit("conv-"), lpad(col("id").cast("string"), 8, "0")))
    val uu = u(s"len-${cfg.seed}", col("id"))
    // Pareto via inverse CDF: len = minLen * (1-u)^(-1/alpha), capped
    val len = least(
      lit(cfg.maxLen),
      floor(lit(cfg.minLen) * pow(lit(1.0) - uu, lit(-1.0 / cfg.zipfAlpha)))).cast("int")
    base.select(
      col("conv_id"),
      len.as("conv_len"),
      pmod(xxhash64(col("conv_id")), lit(cfg.numPartitions)).cast("int").as("partition_id"))
  }

  /** The transcript table (conv_id, turn_idx, role, text, tool, ts
    * [+ partition_id]) with deterministic error injection. */
  def transcripts(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val convs = conversations(spark, cfg)
    val seed = cfg.seed

    val exploded = convs
      .select(col("conv_id"), col("partition_id"), col("conv_len"),
        explode(sequence(lit(0), col("conv_len") - 1)).as("turn0"))

    def gate(rate: Double, salt: String) =
      if (rate <= 0) lit(false)
      else u(s"$salt-$seed", col("conv_id"), col("turn0")) < lit(rate)

    // base roles: turn0=system, then user/assistant alternating with a tool
    // interleave; drifted config shifts the tool share (role-frequency PSI)
    val toolGate =
      if (cfg.drifted) pmod(xxhash64(col("conv_id"), col("turn0"), lit("tool")), lit(4)) === 0
      else pmod(xxhash64(col("conv_id"), col("turn0"), lit("tool")), lit(12)) === 0
    val baseRole = when(col("turn0") === 0, lit("system"))
      .when(toolGate, lit("tool"))
      .when(pmod(col("turn0"), lit(2)) === 1, lit("user"))
      .otherwise(lit("assistant"))

    // deterministic text: repeated token, drifted config doubles lengths;
    // ~1/8 of turns append a multilingual phrase (CJK/RTL/emoji/diacritics
    // — GenVersion 5) so every text kernel in the scaling path sees
    // non-ASCII at corpus scale, not just in the oracle slice
    val rep = (pmod(xxhash64(col("conv_id"), col("turn0"), lit("txt")), lit(20)) + 1) *
      lit(if (cfg.drifted) 2 else 1)
    val mlArr = array(MultilingualSlice.docs.map(d => lit(d._3)): _*)
    val mlHash = xxhash64(col("conv_id"), col("turn0"), lit("ml"))
    // INDEPENDENT hash for the phrase index: reusing the gate hash would
    // restrict gated rows to indices ≡ 0 (mod 8) — 4 of 32 phrases, none
    // of them CJK/RTL/emoji (r6 review finding)
    val mlIdx = xxhash64(col("conv_id"), col("turn0"), lit("ml-idx"))
    val mlSuffix = when(pmod(mlHash, lit(8)) === 0,
      concat(lit(" "),
        element_at(mlArr, (pmod(mlIdx, lit(MultilingualSlice.docs.size)) + 1).cast("int"))))
      .otherwise(lit(""))
    val baseText = concat(
      lit("t:"), col("conv_id"), lit(":"), col("turn0").cast("string"), lit(" "),
      repeat(lit("lorem "), rep.cast("int")), mlSuffix)

    // ts derives from the FINAL turn index (the same when-chain as
    // turn_idx below), so a row's ts always matches its position in the
    // turn_idx sort order: gap-shifted rows carry a beyond-the-end ts, and
    // neg-gated rows (turn_idx = -(turn0+1), sorted first) carry
    // EPOCH0 - (turn0+1)*60 + jit(<30) — strictly below every
    // non-negative row's ts and mutually monotone (60 s step > 30 s
    // jitter). Any other choice leaks a spurious TsMonotone violation
    // under tsRegressRate=0 (first via conv-max ts on a neg row, then —
    // round-3 review — via an unshifted turn0 ts that still exceeds turn
    // 0's). The neg index is UNIQUE per row (not a constant -1): two
    // neg-gated rows in one conversation must not collide into a
    // duplicate (conv_id, turn_idx) key that dupRate never injected.
    val effTurn = when(gate(cfg.negTurnRate, "neg"), -(col("turn0") + 1))
      .when(gate(cfg.gapRate, "gap"), col("turn0") + col("conv_len"))
      .otherwise(col("turn0"))
    val baseTs = (lit(EPOCH0) + effTurn.cast("long") * 60L +
      pmod(xxhash64(col("conv_id"), col("turn0"), lit("jit")), lit(30L))).cast("timestamp")

    val withErrors = exploded.select(
      when(gate(cfg.orphanConvRate, "orphan-conv"), concat(lit("orphan-"), col("conv_id")))
        .otherwise(col("conv_id")).as("conv_id"),
      // gap = shift BEYOND the conversation's last turn: shifting to
      // turn0+1 would collide with the genuine next turn and inject an
      // unasked-for duplicate key alongside the gap (each rate must gate
      // exactly its own violation kind). Same expression as effTurn above
      // BY CONSTRUCTION — ts and turn_idx must never disagree.
      effTurn.cast("int").as("turn_idx"),
      when(gate(cfg.nullRoleRate, "null-role"), lit(null: String))
        .when(gate(cfg.badRoleRate, "bad-role"), lit("robot"))
        .otherwise(baseRole).as("role"),
      when(gate(cfg.nullTextRate, "null-text"), lit(null: String))
        .otherwise(baseText).as("text"),
      when(baseRole === "tool", lit("search")).otherwise(lit(null: String)).as("tool"),
      // regression sentinel BELOW every legitimate ts this conversation
      // can produce (neg rows go down to EPOCH0 - conv_len*60): a fixed
      // EPOCH0 - 3600 would sit ABOVE a deep-negative neg row's ts and
      // the injected regression would never manifest as a TsMonotone
      // break. Sentinels strictly DECREASE along the turn_idx sort order
      // (the - effTurn term; effTurn spans [-conv_len, 2*conv_len-1], so
      // the offset stays in (0, 4*conv_len+1]*60) — a turn0-keyed
      // sentinel would invert on neg-gated rows and a stacked regression
      // preceded by a neg-row sentinel would be silent. A regression on
      // the conversation's sort-FIRST row has no predecessor and is
      // undetectable by construction — the per-kind guarantee is "no
      // OTHER kind leaks", not "every first-row injection is detectable".
      when(gate(cfg.tsRegressRate, "ts-reg"),
        (lit(EPOCH0) - (col("conv_len") * 2 + 2 + effTurn.cast("long")) * 60L)
          .cast("timestamp"))
        .otherwise(baseTs).as("ts"),
      col("partition_id"),
      col("turn0"))

    val dups =
      if (cfg.dupRate <= 0) None
      else Some(withErrors.filter(gate(cfg.dupRate, "dup")))
    val out = dups.map(withErrors.union).getOrElse(withErrors)
    out.drop("turn0")
  }
}
