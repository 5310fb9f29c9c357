package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID (stopword-profile
  * heuristic), BPE-ish token counting, and document fingerprinting. All
  * built-in expressions — per-doc work, no shuffle, linear scans that
  * parallelize trivially at 100 TB.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (public linguistic knowledge). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "en", "los", "que", "un", "una", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "en", "que", "un", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  /** Heuristic language ID: argmax over per-language stopword hit ratios.
    * Emits (predicted_lang, lang_score); score 0 → "und". Deterministic
    * tie-break by reverse lang code via sort_array on (score, lang) structs.
    */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val scored = array(langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(toks, t => t.isin(words: _*))).cast("double") /
          greatest(size(toks), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = element_at(sort_array(scored, asc = false), 1)
    Par.fanOut(docs)
      .withColumn("lang_score", round(best.getField("score"), 4))
      .withColumn("predicted_lang",
        when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")))
  }

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (regex shared verbatim with the DuckDB
    * oracle — both engines treat this pattern identically).
    */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(textCol: Column): Column =
    size(expr(s"regexp_extract_all(lower(text), '$bpePattern', 0)")).cast("long")

  /** Order-sensitive 64-bit-safe document fingerprint: polynomial rolling
    * hash over unicode code points, mod 1e15 (keeps acc*31 within int64 in
    * every engine — DuckDB BIGINT overflow throws rather than wraps).
    * fp = fold(chars, 0, (acc, c) -> (acc*31 + code(c)) % 1e15).
    */
  def fingerprint(textCol: Column): Column =
    aggregate(
      transform(split(textCol, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000000000000L)

  /** Winnowing-style sketch: the `k` smallest n-gram rolling hashes of the
    * doc — a compact, order-robust near-dup signature (rows-only operator;
    * the hash is engine-specific xxhash64).
    */
  def withSketch(docs: DataFrame, n: Int = 4, k: Int = 8): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => xxhash64(concat_ws("_", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
    Par.fanOut(docs).withColumn("sketch", slice(array_sort(array_distinct(grams)), 1, k))
  }
}
