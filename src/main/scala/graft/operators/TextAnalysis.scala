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
    // NB the repeated `toks` / `best` references here are all at the SAME
    // projection level (arguments of filter/size/getField, not inside a
    // lambda body), so runtime subexpression elimination dedupes them —
    // measured neutral vs explicit staging. Contrast withSketch, where
    // lambda-INTERIOR references defeat CSE and staging won 5.3x.
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

  /** Per-code-point counts of a string column as array<long>, sorted by
    * code point — the native codegen'd [[graft.functions.CharCounts]]
    * expression (one primitive pass per row; the HOF split/sort/run-length
    * chain gives identical counts ~2.5x slower, q135's measured history).
    */
  def charCounts(textCol: Column): Column =
    org.apache.spark.sql.graft.bridge.toColumn(graft.functions.CharCounts(
      org.apache.spark.sql.graft.bridge.toExpression(textCol)))

  /** Distinct winnowing fingerprints of a token-array column (sorted
    * array<long>): rolling-hash w-token windows, monotonic-deque minima
    * per v-hash winnow window — the native O(len)
    * [[graft.functions.WinnowFingerprints]] expression (the HOF chain
    * assembles every window as a string first, O(len·w) bytes per doc).
    */
  def winnowFingerprints(tokensCol: Column, w: Int, v: Int): Column =
    org.apache.spark.sql.graft.bridge.toColumn(graft.functions.WinnowFingerprints(
      org.apache.spark.sql.graft.bridge.toExpression(tokensCol), w, v))

  /** PII patterns (public formats), deliberately backslash-free so the same
    * literal works in Java regex (Spark) and RE2 (DuckDB oracle): email,
    * dotted-quad IP, international phone.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val phoneRe = "[+][0-9]{7,15}"

  /** Redact PII in place with typed placeholders — the standard scrub pass
    * of a training-data pipeline. Email first (its local part could
    * otherwise be chewed up by the IP pattern), then IP, then phone.
    * Pure per-row expression work: no shuffle, codegen'd, linear at 100 TB.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  /** Count matches of `re` in `text` (for scrub audits / DQ on PII). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Word-bigram array from a TOKEN-ARRAY column. Single-token docs get
    * zero bigrams (the `when` guard matters: an unguarded
    * element_at(t, size+1) throws under Spark 4's default ANSI mode).
    *
    * Callers should materialize this in its own projection and derive
    * scalars from the materialized column: transform(...) is a non-cheap
    * expression Catalyst will NOT common-subexpression-eliminate across
    * multiple references, so inlining it into several output columns
    * re-builds the whole array per reference (measured 6x on q75).
    */
  def bigramArray(tokens: Column): Column =
    when(size(tokens) >= 2,
      transform(
        sequence(lit(1), size(tokens) - 1),
        i => concat_ws("_", element_at(tokens, i), element_at(tokens, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Duplicate word-bigram stats as (n_2grams, n_dup_2grams) over a raw
    * text column — convenience form; see [[bigramArray]] for the staging
    * rule when more than one output derives from the grams.
    */
  def bigramStats(text: Column): (Column, Column) = {
    val grams = bigramArray(split(text, " "))
    val n = size(grams).cast("long")
    (n, (size(grams) - size(array_distinct(grams))).cast("long"))
  }

  /** Winnowing-style sketch: the `k` smallest n-gram rolling hashes of the
    * doc — a compact, order-robust near-dup signature (rows-only operator;
    * the hash is engine-specific xxhash64).
    */
  def withSketch(docs: DataFrame, n: Int = 4, k: Int = 8): DataFrame = {
    // STAGE the token array: inlined, `split` re-tokenizes the whole text
    // inside every element_at of the n-gram lambda — n splits per gram
    // position = O(len²) per doc, and runtime subexpression elimination
    // cannot reach INSIDE higher-order-function lambda bodies (measured
    // 5.3x on q41 at sf0.1; same-level repeats, as in withLangId, are
    // CSE'd fine). Referenced many times, so CollapseProject keeps it.
    val toks = col("__toks")
    // guard: docs shorter than n tokens get an empty sketch (unguarded
    // element_at past the array end throws under ANSI mode)
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64(concat_ws("_", (0 until n).map(o => element_at(toks, i + lit(o))): _*))))
      .otherwise(array().cast("array<bigint>"))
    Par.fanOut(docs)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("sketch", slice(array_sort(array_distinct(grams)), 1, k))
      .drop("__toks")
  }
}
