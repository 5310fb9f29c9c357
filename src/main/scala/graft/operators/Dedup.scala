package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training corpora (driver mandate,
  * BASELINE.json north_star) — four families, all pure built-in expressions
  * so every step stays inside whole-stage codegen:
  *
  *  - exact:    hash-groupBy on text (see `queries.DocQueries` q24)
  *  - n-gram Jaccard: inverted-index join on shingles — the exact method;
  *  - MinHash + LSH banding: the at-scale approximation whose candidates
  *    are verified with the exact measure;
  *  - SimHash: 64-bit fingerprints + banded Hamming join.
  *
  * 100 TB notes: the shingle inverted index shuffles |corpus|×|shingles per
  * doc| rows hashed by shingle — AQE's skew-join split handles hot shingles;
  * a df-cap (drop shingles appearing in > N docs) is the standard extra
  * lever, left off here because it changes exact Jaccard results. MinHash
  * replaces that blowup with k hashes per doc and a band-key shuffle of
  * |corpus|×bands tiny rows, which is the method of record at web scale;
  * candidate verification then touches only the candidate pairs.
  */
object Dedup {

  /** Distinct word n-gram shingles of `text` (space-tokenized). */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws("_", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    docs.select(
      col("doc_id"),
      when(size(toks) >= n, array_distinct(grams))
        .otherwise(array().cast("array<string>")).as("shingles"))
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join: only doc
    * pairs sharing ≥1 shingle are ever materialized (complete for any
    * threshold > 0), vs the naive |docs|² cross join.
    */
  def shingleJaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh  = shingleSets(docs, n).withColumn("n_sh", size(col("shingles")))
    val inv = sh.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val a = inv.toDF("doc_a", "na", "sh")
    val b = inv.toDF("doc_b", "nb", "sh_b")
    a.join(b, col("sh") === col("sh_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signatures over shingle sets: sig[j] = min over shingles of
    * xxhash64(j, shingle) — k independent hash families by seeding with j.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 128, n: Int = 3): DataFrame =
    shingleSets(docs, n)
      .withColumn("n_sh", size(col("shingles")))
      .withColumn("sig",
        transform(sequence(lit(0), lit(k - 1)),
          j => array_min(transform(col("shingles"), s => xxhash64(j, s)))))

  /** Near-dup pairs via LSH banding + exact-Jaccard verification. Bands of
    * r = k/bands rows; two docs collide if any band hashes equal. Collision
    * probability 1-(1-J^r)^bands — with k=128, bands=32 (r=4) a J=0.8 pair
    * is caught with p ≈ 1-2e-7.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
      k: Int = 128, bands: Int = 32, n: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(docs, k, n)
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * lit(r) + 1, lit(r))).as("key"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.toDF("doc_a", "band", "key")
      .join(banded.toDF("doc_b", "band_b", "key_b"),
        col("band") === col("band_b") && col("key") === col("key_b") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // verify candidates with the exact measure (join shingle sets back in)
    val sh = shingleSets(docs, n)
    cand
      .join(sh.toDF("doc_a", "sh_a"), "doc_a")
      .join(sh.toDF("doc_b", "sh_b"), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: bit i is the sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : -1). Nested HOF fold — no
    * per-row Scala, no shuffle.
    */
  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash", expr(
      s"""aggregate(
         |  sequence(0, 63), 0L,
         |  (acc, i) -> acc + if(
         |    aggregate(split($textCol, ' '), 0L,
         |      (a, t) -> a + if((shiftright(xxhash64(t), i) & 1) = 1, 1L, -1L)) > 0,
         |    shiftleft(1L, i), 0L))""".stripMargin))

  /** Near-dup pairs by SimHash: 4×16-bit band join (pigeonhole: any pair at
    * Hamming distance ≤ 3 agrees exactly on ≥1 of 4 bands), then exact
    * `bit_count(xor) ≤ maxHamming` on the candidates.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band scheme guarantees recall only for distance <= 3")
    val sims = withSimhash(docs).select(col("doc_id"), col("simhash"))
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS key))"))
        .as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.toDF("doc_a", "sim_a", "band", "key")
      .join(banded.toDF("doc_b", "sim_b", "band_b", "key_b"),
        col("band") === col("band_b") && col("key") === col("key_b") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a") bitwiseXOR col("sim_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
