package graft.gen

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic multilingual document slice — puts the text kernels'
  * codepoint-exact claims (graft.functions.TextProfile / TextStats /
  * HashKernel, ops.TextAnalysis) under the DuckDB oracle gate on NON-ASCII
  * input: Latin diacritics (precomposed AND decomposed), CJK, Hangul,
  * Cyrillic, Greek, Arabic/Hebrew (RTL), Devanagari (combining matras),
  * emoji and non-BMP letters (surrogate pairs), fullwidth forms,
  * Arabic-Indic digits, NBSP/thin-space (non-breaking in BOTH regex
  * dialects), and control whitespace.
  *
  * The SAME Seq feeds both sides of the differential gate:
  * [[df]] (Spark union input) and [[valuesSql]] (a DuckDB VALUES relation
  * embedded in the oracle SQL), so the bytes are identical by
  * construction and the compare exercises ONLY the kernels.
  *
  * Characters deliberately EXCLUDED, because the two engines' primitives
  * disagree on them by spec (documented, not hidden):
  *   - U+000B vertical tab: Java-regex `\s` (= HashKernel.isWs) matches
  *     it, RE2/DuckDB `\s` does not;
  *   - Nl/No number forms (Ⅷ ² ½): `\p{N}` matches, Character.isDigit
  *     does not — TextStats counts them punct;
  *   - uppercase İ/Σ/ẞ-class letters whose Java String.toLowerCase is
  *     context- or length-changing while DuckDB's utf8proc applies the
  *     simple 1:1 mapping. All case-carrying slice chars (ASCII, Latin-1,
  *     Cyrillic, fullwidth) lower identically under both.
  */
object MultilingualSlice {

  /** Base for slice doc_ids — far above the corpus (10^5) and the
    * dedup-injection offset (+10^7), so ids never collide even after
    * docsWithDups re-injection (3*10^7 + 10^7 < 10^8). */
  val IdBase = 30000000L

  /** (doc_id, lang label, text). The lang column is metadata (like the
    * corpus' random `lang`), NOT the langId oracle — langId is computed
    * by both engines. */
  val docs: Seq[(Long, String, String)] = Seq(
    // Latin-script languages with diacritics + their stopword profiles
    (IdBase + 1L, "fr", "Le café est déjà prêt et la journée est belle, que demander pour les amis."),
    (IdBase + 2L, "de", "Der Überblick ist schön und die Mühe ist nicht groß, das wäre ein Anfang mit Straße."),
    (IdBase + 3L, "es", "El niño pequeño y la niña están en el jardín con su mamá por una mañana."),
    (IdBase + 4L, "it", "Il gatto è sulla sedia e non vuole scendere, che bella giornata per un caffè."),
    (IdBase + 5L, "en", "The naïve résumé of the café owner was très chic and it is for you."),
    // CJK: no spaces — whitespace tokenization vs letter-run tokenization
    (IdBase + 6L, "zh", "今天天气很好，我们一起去公园散步吧。"),
    (IdBase + 7L, "ja", "これはテストです。日本語のテキストを処理します。"),
    (IdBase + 8L, "ko", "안녕하세요 세계 여러분 반갑습니다."),
    // Cyrillic / Greek (lowercase incl. final sigma as data) / RTL
    (IdBase + 9L, "ru", "Быстрая коричневая лиса прыгает через ленивую собаку."),
    (IdBase + 10L, "el", "αβγ δέλτα και το μικρό γράμμα σίγμα τελικός."),
    (IdBase + 11L, "ar", "مرحبا بالعالم هذا نص عربي قصير."),
    (IdBase + 12L, "he", "שלום עולם זה טקסט קצר בעברית."),
    // decomposed (e + U+0301) vs precomposed: NOT normalized anywhere —
    // combining marks are Mn: token-BREAKING and punct-counted in both
    (IdBase + 13L, "xx", "re\u0301sume\u0301 cafe\u0301 decomposed accents here"),
    (IdBase + 14L, "xx", "résumé café precomposed accents here"),
    // non-BMP: emoji (So) and Gothic LETTERS (Lo, surrogate pairs in runs)
    (IdBase + 15L, "xx", "I love 🍕 pizza and 🎉 parties 😀 a lot"),
    (IdBase + 16L, "xx", "𐌰𐌱𐌲𐌳 𐌴𐌵 gothic script letters"),
    // fullwidth forms: Lu/Ll with 1:1 case maps, Nd digits
    (IdBase + 17L, "xx", "ＨＥＬＬＯ ｗｏｒｌｄ １２３ ｔｅｓｔ"),
    // NBSP + thin space: Zs — non-\s in BOTH dialects, token-breaking
    (IdBase + 18L, "xx", "words\u00A0joined\u00A0nbsp and\u2009thin\u2009spaces here"),
    // control whitespace (\n, \t — shared by Java and RE2 \s)
    (IdBase + 19L, "xx", "line one\nline two\ttabbed  double  spaced end."),
    // script-mixing inside one token run
    (IdBase + 20L, "xx", "English中文mix日本語test한국어end done"),
    // more Latin diacritic coverage
    (IdBase + 21L, "tr", "türkçe metin çok güzel ve kısa şey burada"),
    (IdBase + 22L, "vi", "tiếng việt rất đẹp và phong phú lắm nha"),
    (IdBase + 23L, "pl", "zażółć gęślą jaźń pchnąć w tę łódź"),
    // case+whitespace variants normalizing EQUAL (fingerprint group):
    // É→é and А→а are 1:1 in Java AND utf8proc
    (IdBase + 24L, "xx", "  CAFÉ   RÉSUMÉ   МОСКВА  "),
    (IdBase + 25L, "xx", "café résumé москва"),
    // byte-identical CJK pair (exact-dedup group)
    (IdBase + 26L, "zh", "重复的文本内容完全相同。"),
    (IdBase + 27L, "zh", "重复的文本内容完全相同。"),
    // token-free doc (emoji + spaces only): n_tokens == 0 paths
    (IdBase + 28L, "xx", "😀😃😄 🎉🎊"),
    // Arabic-Indic digits (Nd: digits in BOTH \p{Nd} and isDigit)
    (IdBase + 29L, "ar", "٠١٢٣ أرقام عربية ٤٥٦"),
    // Devanagari with combining matras (Mn/Mc break token runs in both)
    (IdBase + 30L, "hi", "नमस्ते दुनिया यह हिंदी है"),
    // long single letter runs (bpe long-run surcharge, Latin and CJK)
    (IdBase + 31L, "de", "Donaudampfschifffahrtsgesellschaftskapitän fuhr gestern los"),
    (IdBase + 32L, "zh", "这是一段没有标点符号的很长的中文文本用来测试长字母串"))

  private def codepoints(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Spark relation with the documents.parquet schema
    * (doc_id, text, lang, source, n_chars). */
  def df(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val rows = docs.map { case (id, lang, text) =>
      Row(id, text, lang, "multilingual_slice", codepoints(text))
    }
    // LocalRelation (list overload), NOT parallelize: an RDD-backed scan
    // would add a stage and block pushdown/codegen fusion around the union.
    // coalesce(1): LocalTableScan otherwise slices by
    // leafNodeDefaultParallelism — 32 tasks for 32 rows on a 32-core box
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema).coalesce(1)
  }

  /** The same rows as a DuckDB VALUES relation (columns doc_id, text,
    * lang, source, n_chars) — generated from [[docs]], so the bytes are
    * identical to the Spark side by construction. Control characters are
    * emitted via chr() (a raw newline inside a SQL literal is legal but
    * json-fragile). */
  def valuesSql: String = {
    def esc(s: String): String = {
      val sb = new StringBuilder
      sb.append('\'')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '\'' => sb.append("''")
          case '\n' => sb.append("' || chr(10) || '")
          case '\t' => sb.append("' || chr(9) || '")
          case o    => sb.append(o)
        }
        i += 1
      }
      sb.append('\'')
      sb.toString
    }
    docs.map { case (id, lang, text) =>
      s"($id, ${esc(text)}, '$lang', 'multilingual_slice', ${codepoints(text)})"
    }.mkString(
      "(VALUES ", ", ", ") ml(doc_id, text, lang, source, n_chars)")
  }
}
