package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** LLM-training-data text operators over the `documents` table (driver
  * mandate, BASELINE.json north_star): exact dedup, token statistics,
  * per-language profiling, and quality scoring. All built-in expressions
  * (split / array higher-order functions) so the whole thing stays inside
  * whole-stage codegen; at 100 TB these are embarrassingly parallel scans
  * except the dedup groupBy, which shuffles on the text hash only.
  */
object DocQueries {

  /** Tokens of the space-separated `text` column. */
  private val toks = split(col("text"), " ")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  val all: Seq[Q] = Seq(
    Q(
      "q24_docs_dedup_exact",
      (s, d) =>
        documents(s, d)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col("text"))
          .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
             |FROM documents
             |GROUP BY text
             |ORDER BY keep_id""".stripMargin),
      "exact dedup: keep lowest doc_id per identical text (hash-groupBy on text)"),

    Q(
      "q25_docs_token_stats",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
            length(col("text")).cast("long").as("n_chars_actual"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
             |  length(text) AS n_chars_actual
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "token counting: whitespace tokenizer + distinct vocabulary per doc"),

    Q(
      "q26_docs_lang_profile",
      (s, d) =>
        documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 2).as("avg_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents
             |GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "corpus profile per language tag"),

    Q(
      "q61_tfidf_top_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        // df_ is vocabulary-sized — unhinted join (AQE decides); the corpus
        // size for idf is a 1-row agg cross-joined in (always broadcastable,
        // no driver-side count() action per invocation).
        val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))
        tf.join(df_, "token")
          .crossJoin(broadcast(nDocs))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
            round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tfc AS (SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY doc_id, token),
             |dfc AS (SELECT token, count(*) AS df FROM tfc GROUP BY token),
             |n AS (SELECT count(*) AS n FROM documents),
             |ranked AS (
             |  SELECT doc_id, token, tf, df,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf DESC, df ASC, token) AS rank
             |  FROM tfc JOIN dfc USING (token))
             |SELECT doc_id, rank, token, tf, df,
             |  round(tf * ln(CAST((SELECT n FROM n) AS DOUBLE) / df), 6) AS tfidf
             |FROM ranked
             |WHERE rank <= 3
             |ORDER BY doc_id, rank""".stripMargin),
      "TF-IDF top-3 terms per doc; ranking on integer keys (tf,df,token) so cross-engine float ulps can't reorder"),

    Q(
      "q27_docs_quality",
      (s, d) => {
        val nTok  = size(toks).cast("long")
        val nLong = size(filter(toks, t => length(t) > 5)).cast("long")
        val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
        documents(s, d)
          .select(
            col("doc_id"),
            nTok.as("n_tokens"),
            round(nLong.cast("double") / nTok.cast("double"), 4).as("frac_long"),
            round(nStop.cast("double") / nTok.cast("double"), 4).as("frac_stop"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  len(string_split(text, ' ')) AS n_tokens,
              |  round(CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS DOUBLE)
              |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS frac_long,
              |  round(CAST(len(list_filter(string_split(text, ' '), x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
              |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS frac_stop
              |FROM documents
              |ORDER BY doc_id""".stripMargin),
      "quality scoring: long-word and stopword ratios via array higher-order fns"))
}
