package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Training-data ASSEMBLY operators — the steps that turn a curated corpus
  * (q80–q83) into model-ready inputs, plus the diagnostics that run beside
  * them:
  *
  *  - q98 fixed-window token chunking with overlap (RAG / embedding prep);
  *  - q99 concat-and-chunk sequence packing into a fixed token budget,
  *    shard-local so no global sort exists at any scale;
  *  - q100 per-dimension embedding statistics in exact fixed point
  *    (feature-drift / dead-dimension diagnostics);
  *  - q101 banded range join: every event within ±1 h of an error by the
  *    same user (incident-context assembly), via [[graft.operators.RangeJoin]];
  *  - q102 passage-level exact dedup (RefinedWeb-style): non-overlapping
  *    64-token passages deduped corpus-wide by content hash;
  *  - q103 per-vector mean-centering diagnostics: the 64-row dim-stats
  *    aggregate broadcast back against the full table (two-pass shape).
  *
  * Scale shapes: q98/q100 are scan+explode+(optional agg) with no
  * data-dependent fan-out beyond the token/dim count; q99's only shuffle is
  * the shard window (shard count is a free parameter — thousands at 100 TB);
  * q101 is an equi-join on (user, time-bucket), never a BNLJ/cartesian.
  *
  * Determinism: chunk boundaries, shard assignment, packing offsets and
  * band membership are pure integer functions of (doc_id, token index) or
  * epoch micros — no RNG, no floats in any grouping/ordering key.
  */
object AssemblyQueries {

  /** Chunk geometry: 64-token windows every 48 tokens (16-token overlap). */
  private val ChunkLen = 64
  private val ChunkStride = 48

  /** Packing geometry: 256-token sequences, 32 independent shards. */
  private val SeqBudget = 256L
  private val Shards = 32L

  val all: Seq[Q] = Seq(
    Q(
      "q98_docs_chunking",
      (s, d) => {
        // Sliding token windows: starts 1, 49, 97, … ≤ n_tok, each chunk
        // the next 64 tokens (final chunks run short instead of padding —
        // the downstream packer/loader owns padding policy). Position
        // explode over the START OFFSETS only — the token array itself is
        // projected once per row, never re-evaluated per output row (the
        // Generate-over-computed-array pitfall q83 documents). chunk_md5
        // gives downstream exact-dedup/caching a content address; both
        // engines emit lowercase-hex md5 of the identical joined string.
        val base = documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        base
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(1), size(col("t")), lit(ChunkStride))).as("i"))
          .select(
            col("doc_id"),
            expr(s"(i - 1) DIV $ChunkStride").as("chunk_id"),
            size(slice(col("t"), col("i"), lit(ChunkLen))).cast("long").as("n_tok"),
            md5(concat_ws(" ", slice(col("t"), col("i"), lit(ChunkLen))))
              .as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |st AS (
             |  SELECT doc_id, t, unnest(range(1, len(t) + 1, $ChunkStride)) AS i
             |  FROM tok)
             |SELECT doc_id,
             |  (i - 1) // $ChunkStride AS chunk_id,
             |  len(t[i:i+${ChunkLen - 1}]) AS n_tok,
             |  md5(array_to_string(t[i:i+${ChunkLen - 1}], ' ')) AS chunk_md5
             |FROM st
             |ORDER BY doc_id, chunk_id""".stripMargin),
      "fixed-window token chunking with overlap (64/48): content-addressed chunks for RAG/embedding prep"),

    Q(
      "q99_docs_seq_packing",
      (s, d) => {
        // Concat-and-chunk packing (the GPT-style pretraining layout): docs
        // concatenate in doc_id order within a shard, the token stream is
        // cut every 256 tokens, and a doc may straddle a cut. Each doc's
        // stream interval is [cum - n_tok, cum), so its first/last sequence
        // ids are integer divisions of the interval ends — exact int64, no
        // floats. Sharding (doc_id mod 32) makes the running sum WINDOW-
        // local: at 100 TB the shard count scales to thousands and each
        // shard's cumsum is an independent task — there is no global-sort
        // bottleneck shape here, unlike a naive ORDER BY doc_id packing.
        val base = documents(s, d).select(
          col("doc_id"),
          pmod(col("doc_id"), lit(Shards)).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        base
          .select(col("doc_id"), col("shard"), col("n_tok"),
            sum(col("n_tok")).over(w).as("cum"))
          .select(col("doc_id"), col("shard"), col("n_tok"),
            expr(s"(cum - n_tok) DIV $SeqBudget").as("seq_first"),
            expr(s"(cum - 1) DIV $SeqBudget").as("seq_last"))
          .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, doc_id % $Shards AS shard,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, shard, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id)
             |      AS BIGINT) AS cum
             |  FROM t)
             |SELECT doc_id, shard, n_tok,
             |  (cum - n_tok) // $SeqBudget AS seq_first,
             |  (cum - 1) // $SeqBudget AS seq_last,
             |  (cum - 1) // $SeqBudget - (cum - n_tok) // $SeqBudget + 1 AS n_seqs
             |FROM c
             |ORDER BY doc_id""".stripMargin),
      "concat-and-chunk sequence packing (256-token budget, 32 shards): per-doc sequence span, shard-local cumsum"),

    Q(
      "q100_emb_dim_stats",
      (s, d) => {
        // Per-dimension corpus statistics (drift / dead-dim / scale
        // diagnostics before quantization or whitening). Values go through
        // the 2^20 fixed-point idiom (multiply by a power of two is exact
        // in IEEE, floor is exact → identical int64 on any engine, any
        // summation order — the Registry's stable alternative to rounded
        // double aggregates). One explode + one hash-agg keyed by dim:
        // partial aggregation makes the shuffle O(dims × partitions)
        // regardless of row count. sum(fx²) headroom: |fx| ≤ |x|·2^20, so
        // overflow needs Σx² > 2^23 billions — at genuinely 100 TB row
        // counts the same query runs per-shard or drops to 2^10 scaling.
        embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(
            (col("pos") + 1).cast("long").as("dim"),
            expr("CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT)").as("fx"))
          .groupBy(col("dim"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("fx")).as("sum_fx"),
            min(col("fx")).as("min_fx"),
            max(col("fx")).as("max_fx"),
            sum(col("fx") * col("fx")).as("sum_fx2"))
          .orderBy(col("dim"))
      },
      Some("""WITH v AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |e AS (
             |  SELECT unnest(list_transform(range(1, len(v) + 1),
             |    i -> struct_pack(dim := i,
             |           fx := CAST(floor(v[i] * 1048576) AS BIGINT)))) AS s
             |  FROM v),
             |f AS (
             |  SELECT struct_extract(s, 'dim') AS dim,
             |         struct_extract(s, 'fx') AS fx
             |  FROM e)
             |SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
             |  CAST(sum(fx) AS BIGINT) AS sum_fx,
             |  min(fx) AS min_fx, max(fx) AS max_fx,
             |  CAST(sum(fx * fx) AS BIGINT) AS sum_fx2
             |FROM f
             |GROUP BY dim
             |ORDER BY dim""".stripMargin),
      "per-dimension embedding stats in exact 2^20 fixed point (drift/dead-dim diagnostics; order-independent int64 sums)"),

    Q(
      "q101_events_error_context",
      (s, d) => {
        // Incident-context assembly: every event within ±1 h of an error by
        // the same user. A raw inequality join plans a BNLJ; RangeJoin
        // rewrites it as an equi-join on (user_id, hour-bucket) with a
        // constant 2× left fan-out — see the operator scaladoc for the
        // 100 TB argument. Epoch micros via the q60 idiom (TIMESTAMP_NTZ →
        // session-UTC timestamp → unix_micros == DuckDB's naive epoch_us).
        val ev = events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"),
            col("us").as("err_us"))
        val bandUs = 3600L * 1000000L
        graft.operators.RangeJoin
          .bandJoin(errs, ev.drop("event_type"), Seq("user_id"),
            "err_us", "us", -bandUs, bandUs)
          .filter(col("event_id") =!= col("error_id"))
          .select(col("error_id"), col("event_id"),
            (col("us") - col("err_us")).as("delta_us"))
          .orderBy(col("error_id"), col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events)
             |SELECT a.event_id AS error_id, b.event_id AS event_id,
             |  b.us - a.us AS delta_us
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id
             |  AND b.us BETWEEN a.us - 3600000000 AND a.us + 3600000000
             |  AND b.event_id != a.event_id
             |WHERE a.event_type = 'error'
             |ORDER BY error_id, event_id""".stripMargin),
      "banded range join (RangeJoin operator): events within ±1h of a same-user error, as an equi-join on (user, hour bucket)"),

    Q(
      "q102_docs_passage_dedup",
      (s, d) => {
        // Passage-level exact dedup (RefinedWeb/FineWeb practice): cut each
        // doc into NON-overlapping 64-token passages, dedup them corpus-wide
        // by content hash, keep the globally-first occurrence (lowest
        // (doc_id, passage_id)). The only shuffle is keyed by the passage
        // hash — exactly the q24/q56 exact-dedup shape, at sub-document
        // granularity, so boilerplate shared across different docs is
        // caught where whole-doc dedup (q24) sees distinct texts. The
        // (doc_id, p_id) winner order is encoded as one int64
        // (doc_id·2^20 + p_id) so both engines take min() over bare
        // integers: valid while p_id < 2^20 (a 67M-token doc) and
        // doc_id < 2^43 — same documented bound family as q73's hash.
        val base = documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val p = base
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(1), size(col("t")), lit(ChunkLen))).as("i"))
          .select(col("doc_id"),
            expr(s"(i - 1) DIV $ChunkLen").as("p_id"),
            md5(concat_ws(" ", slice(col("t"), col("i"), lit(ChunkLen)))).as("h"))
          .withColumn("ord", col("doc_id") * lit(1048576L) + col("p_id"))
        val winners = p.groupBy(col("h")).agg(min(col("ord")).as("w"))
        p.join(winners, "h")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_passages"),
            sum(when(col("ord") === col("w"), 1L).otherwise(0L)).as("n_kept"))
          .select(col("doc_id"), col("n_passages"), col("n_kept"),
            round(col("n_kept").cast("double") / col("n_passages").cast("double"), 4)
              .as("keep_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |p AS (
             |  SELECT doc_id,
             |    (i - 1) // $ChunkLen AS p_id,
             |    md5(array_to_string(t[i:i+${ChunkLen - 1}], ' ')) AS h
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1, $ChunkLen)) AS i
             |        FROM tok)),
             |o AS (
             |  SELECT doc_id, p_id, h, doc_id * 1048576 + p_id AS ord FROM p),
             |w AS (
             |  SELECT h, min(ord) AS w FROM o GROUP BY h)
             |SELECT o.doc_id,
             |  count(*) AS n_passages,
             |  CAST(sum(CASE WHEN o.ord = w.w THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  round(CAST(sum(CASE WHEN o.ord = w.w THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 4) AS keep_frac
             |FROM o JOIN w ON o.h = w.h
             |GROUP BY o.doc_id
             |ORDER BY doc_id""".stripMargin),
      "passage-level exact dedup (RefinedWeb-style): non-overlapping 64-token passages, corpus-wide first-occurrence wins by content hash"),

    Q(
      "q103_emb_centering",
      (s, d) => {
        // Mean-centering diagnostics: per-dim means from the q100 fixed-
        // point stats, broadcast back (64 rows — never a shuffle of the big
        // side, and never a window over the bounded dim key), per-vector
        // deviation summaries in exact int64. mean_fx is FLOOR division
        // spelled out on BOTH sides via a positive modulus: sum_fx is
        // negative on some dims, and how an engine divides negatives
        // (truncate vs floor) is exactly the implementation-detail class
        // the Registry parity rules pin — after subtracting the positive
        // remainder the quotient is an exact multiple, unambiguous anywhere.
        val fx = embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
            expr("CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT)").as("fx"))
        val means = fx.groupBy(col("dim"))
          .agg(sum(col("fx")).as("s"), count(lit(1)).as("n"))
          .select(col("dim"),
            expr("(s - pmod(s, n)) DIV n").as("mean_fx"))
        fx.join(broadcast(means), "dim")
          .select(col("vec_id"), (col("fx") - col("mean_fx")).as("dx"))
          .groupBy(col("vec_id"))
          .agg(
            sum(col("dx")).as("sum_dx"),
            sum(col("dx") * col("dx")).as("sum_dx2"),
            max(abs(col("dx"))).as("max_absdx"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |e AS (
             |  SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
             |    i -> struct_pack(dim := i,
             |           fx := CAST(floor(v[i] * 1048576) AS BIGINT)))) AS s
             |  FROM v),
             |f AS (
             |  SELECT vec_id, struct_extract(s, 'dim') AS dim,
             |         struct_extract(s, 'fx') AS fx
             |  FROM e),
             |ms AS (
             |  SELECT dim, CAST(sum(fx) AS BIGINT) AS s, count(*) AS n
             |  FROM f GROUP BY dim),
             |m AS (
             |  SELECT dim, (s - ((s % n + n) % n)) // n AS mean_fx FROM ms)
             |SELECT f.vec_id,
             |  CAST(sum(f.fx - m.mean_fx) AS BIGINT) AS sum_dx,
             |  CAST(sum((f.fx - m.mean_fx) * (f.fx - m.mean_fx)) AS BIGINT)
             |    AS sum_dx2,
             |  max(abs(f.fx - m.mean_fx)) AS max_absdx
             |FROM f JOIN m ON f.dim = m.dim
             |GROUP BY f.vec_id
             |ORDER BY vec_id""".stripMargin),
      "per-vector mean-centering diagnostics: 64-row dim-means broadcast back, exact fixed-point deviation sums (floor-division parity via pmod)"),

    Q(
      "q113_packing_waste",
      (s, d) => {
        // Padding-waste diagnostic for length-bucketed batching — the
        // standard report a training loader emits to choose bucket edges
        // (complements q99, which packs; this measures what padding-only
        // batching would cost). Buckets are a fixed power-of-two CASE
        // ladder (16/32/64/128) rather than ceil(log2(n)) — a float log2
        // at a power-of-two boundary is exactly the bit-portability trap
        // the Registry rules ban from grouping keys. All outputs are
        // integers; fill_permille is integer division in both engines.
        // SCALE: one scan, one map-side-combined agg on a bounded ladder
        // key — the ≤5-row result is a report row, not a data path, so
        // the bounded key is fine here (ScaleGuard's window rule targets
        // per-row windows, not aggregates).
        val capCol = when(col("n_tok") <= 16, 16L)
          .when(col("n_tok") <= 32, 32L)
          .when(col("n_tok") <= 64, 64L)
          .when(col("n_tok") <= 128, 128L)
          .otherwise(256L)
        documents(s, d)
          .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("cap", capCol)
          .groupBy(col("cap"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("sum_tok"),
            sum(col("cap") - col("n_tok")).as("pad_waste"))
          .withColumn("fill_permille",
            expr("(sum_tok * 1000) DIV (n_docs * cap)"))
          .orderBy(col("cap"))
      },
      Some("""WITH t AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |b AS (
             |  SELECT n_tok,
             |    CASE WHEN n_tok <= 16 THEN 16
             |         WHEN n_tok <= 32 THEN 32
             |         WHEN n_tok <= 64 THEN 64
             |         WHEN n_tok <= 128 THEN 128
             |         ELSE 256 END AS cap
             |  FROM t)
             |SELECT CAST(cap AS BIGINT) AS cap,
             |  count(*) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
             |  CAST(sum(cap - n_tok) AS BIGINT) AS pad_waste,
             |  (CAST(sum(n_tok) AS BIGINT) * 1000)
             |    // (count(*) * CAST(cap AS BIGINT)) AS fill_permille
             |FROM b
             |GROUP BY cap
             |ORDER BY cap""".stripMargin),
      "padding-waste diagnostic for length-bucketed batching: per power-of-two cap, docs/tokens/pad-waste/fill-permille (integer-exact)"),

    Q(
      "q127_span_dedup",
      (s, d) => {
        // Exact-substring dedup signal (Lee et al., "Deduplicating
        // Training Data Makes Language Models Better"): EVERY 48-token
        // window is hashed; a window whose (doc_id, offset) order key is
        // not the global first occurrence of that hash is a SHARED span.
        // Guarantee: any copied run of >= 48 consecutive tokens is
        // caught, at ANY alignment — the property q102's fixed 64-token
        // chunk grid loses for runs that straddle chunk boundaries.
        // (A strided-both-sides variant would only catch runs aligned
        // mod stride: two equal-stride grids over the same content
        // intersect only at matching residues — which is why the stride
        // stays 1 and sub-linear cost comes from winnowing instead: pick
        // q41's per-window minimum hash as the posting key to keep the
        // same guarantee probabilistically at |tokens|/window postings.)
        // SCALE: the only data shuffle is |tokens| slim (hash, ord)
        // postings — the same volume class as Dedup.shingleIndex's
        // inverted index; at 100 TB the md5 key becomes xxhash64. ord
        // packs (doc_id, offset) into one int64 (valid while
        // offset < 2^20 — q102's documented bound family).
        val W = 48
        val base = documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val p = base
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(1),
              greatest(size(col("t")) - lit(W - 1), lit(1)))).as("i"))
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(col("t"), col("i"), lit(W)))).as("h"),
            (col("doc_id") * lit(1048576L) + col("i")).as("ord"))
        val winners = p.groupBy(col("h")).agg(min(col("ord")).as("w"))
        p.join(winners, "h")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_spans"),
            sum(when(col("ord") > col("w"), 1L).otherwise(0L)).as("n_shared_spans"),
            min(when(col("ord") > col("w"),
              expr("CAST(w DIV 1048576 AS BIGINT)"))).as("earliest_src_doc"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |p AS (
             |  SELECT doc_id,
             |    md5(array_to_string(t[i:i+47], ' ')) AS h,
             |    doc_id * 1048576 + i AS ord
             |  FROM (SELECT doc_id, t,
             |          unnest(range(1, greatest(len(t) - 47, 1) + 1)) AS i
             |        FROM tok)),
             |w AS (SELECT h, min(ord) AS w FROM p GROUP BY h)
             |SELECT p.doc_id,
             |  count(*) AS n_spans,
             |  CAST(sum(CASE WHEN p.ord > w.w THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_shared_spans,
             |  min(CASE WHEN p.ord > w.w THEN w.w // 1048576 END)
             |    AS earliest_src_doc
             |FROM p JOIN w USING (h)
             |GROUP BY p.doc_id
             |ORDER BY p.doc_id""".stripMargin),
      "exact-substring dedup signal (Lee et al.): every 48-token window hashed, global first-occurrence winners — any copied run >=48 tokens is caught at any alignment, unlike fixed-chunk passage dedup (q102)"),

    Q(
      "q128_span_dedup_winnow",
      (s, d) => {
        // Winnowing (Schleimer/Wilkerson/Aiken) — q127's sub-linear
        // shuffle path: the per-doc stream of 48-gram xxhash64 values is
        // reduced to the MINIMUM of each 16-hash winnow window, distinct
        // per doc. Only these fingerprints shuffle (~|tokens|/16 expected
        // postings vs q127's |tokens|), and the winnowing theorem keeps a
        // real guarantee: ANY shared run of >= W + V - 1 = 63 tokens
        // contains one full winnow window common to both docs, whose min
        // is selected on both sides — so the pair still shares a posted
        // fingerprint. Runs in [48, 62] may be missed: that recall band
        // is the price of the 16x shuffle cut (q127 stays the exact
        // oracle). The per-doc hash stream and window minima are pure
        // projections (transform/array_min — no shuffle, no explode until
        // the distinct fingerprint list); cross-doc state is only the
        // slim (fp, doc_id) posting. AssemblySpec pins the subset
        // relation vs q127, the 63-token guarantee at an unaligned
        // offset, and the postings reduction.
        // Per-doc fingerprints come from the native WinnowFingerprints
        // expression: rolling-hash window hashes + monotonic-deque minima,
        // O(len) per doc. The original HOF chain (xxhash64 over
        // concat_ws(slice(t, i, W)) per position, array_min over slices)
        // copies O(len·W) bytes per doc — measured 2.2 s vs 0.6 s at
        // sf0.1. Fingerprint VALUES differ (different hash), but every
        // winnowing property is hash-agnostic and re-proven by
        // AssemblySpec on the new values.
        val W = 48
        val V = 16
        val base = documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val fps = base.select(col("doc_id"),
          explode(graft.operators.TextAnalysis.winnowFingerprints(col("t"), W, V))
            .as("fp"))
        val owners = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("first_doc"))
        fps.join(owners, "fp")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_fp"),
            sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
              .as("n_shared_fp"),
            min(when(col("first_doc") < col("doc_id"), col("first_doc")))
              .as("earliest_src_doc"))
          .orderBy(col("doc_id"))
      },
      None,
      "winnowing scale path for q127: native rolling-hash + deque-minima fingerprints (O(len)/doc), ~1/16 the shuffled postings; shared runs >= 63 tokens (W+V-1) still guarantee a shared fingerprint — subset/guarantee/reduction pinned in AssemblySpec"),

    Q(
      "q165_balanced_shards",
      (s, d) => {
        // Token-balanced SHARD ASSIGNMENT: place every source (domain) on
        // one of S output shards so shard token-totals stay close — the
        // step before writing training shards, where plain
        // hash-partitioning is wrecked by the heavy tail (one giant
        // domain lands wherever its hash says). Design: classify sources
        // into power-of-two SIZE CLASSES (the q113 ladder — bounded
        // count, no float log2), then round-robin each class across
        // shards in a deterministic hash order. Within a class sizes
        // vary < 2x, so round-robin bounds the per-class shard spread by
        // one max-class-member; summed over the bounded ladder that is a
        // constant — unlike hash placement, whose spread grows with the
        // largest member.
        //
        // SCALE: the per-source totals are one agg on a high-cardinality
        // key. The within-class rank NEVER sorts a whole class in one
        // task (millions of small sources share a class at 100 TB): rank
        // = per-(class, sub) window + sub-bucket offsets, the
        // tokenBudgetCut two-level decomposition, with sub = first md5
        // nibble (16-way, engine-portable). The offsets window runs over
        // the <= 16-row-per-class (class, sub) count aggregate. The
        // DuckDB twin is the naive single window per class — ordered by
        // (sub, ord, source), which the two-level form reproduces
        // exactly (exactness proof, hash-checked).
        val S = 8L
        val srcTok = documents(s, d)
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tok"))
        val sizeClass = when(col("n_tok") <= 1000, 1000L)
          .when(col("n_tok") <= 2000, 2000L)
          .when(col("n_tok") <= 4000, 4000L)
          .when(col("n_tok") <= 8000, 8000L)
          .otherwise(16000L)
        val base = srcTok
          .withColumn("size_class", sizeClass)
          .withColumn("ord", md5(col("source")))
          .withColumn("sub", substring(col("ord"), 1, 1))
        val wSub = Window.partitionBy(col("size_class"), col("sub"))
          .orderBy(col("ord"), col("source"))
        val ranked = base.withColumn("rn", row_number().over(wSub).cast("long"))
        // per-(class, sub) counts -> exclusive running offset within class
        val wOff = Window.partitionBy(col("size_class")).orderBy(col("sub"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = base.groupBy(col("size_class"), col("sub"))
          .agg(count(lit(1)).as("n"))
          .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
          .select(col("size_class"), col("sub"), col("off"))
        ranked.join(offsets, Seq("size_class", "sub"))
          .withColumn("shard", pmod(col("off") + col("rn") - 1, lit(S)))
          .select(col("source"), col("n_tok"), col("size_class"), col("shard"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source,
             |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
             |  FROM documents GROUP BY source),
             |c AS (
             |  SELECT source, n_tok,
             |    CASE WHEN n_tok <= 1000 THEN 1000
             |         WHEN n_tok <= 2000 THEN 2000
             |         WHEN n_tok <= 4000 THEN 4000
             |         WHEN n_tok <= 8000 THEN 8000
             |         ELSE 16000 END AS size_class,
             |    md5(source) AS ord
             |  FROM t),
             |r AS (
             |  SELECT source, n_tok, size_class,
             |    row_number() OVER (PARTITION BY size_class
             |      ORDER BY substr(ord, 1, 1), ord, source) AS rn
             |  FROM c)
             |SELECT source, n_tok, CAST(size_class AS BIGINT) AS size_class,
             |  (rn - 1) % 8 AS shard
             |FROM r
             |ORDER BY source""".stripMargin),
      "token-balanced shard assignment: size-class ladder + deterministic hash round-robin within class via two-level rank (per-(class,nibble) windows + bounded offset frame) — per-class shard spread bounded by one member, vs unbounded for hash placement; oracle is the naive single-window form"),

    Q(
      "q166_snapshot_diff",
      (s, d) => {
        // SNAPSHOT DIFF: the change report between a corpus generation
        // and its pipeline-processed successor — what a nightly run
        // publishes so downstream consumers (index maintenance, training
        // mixes) know exactly which documents to reprocess. Successor
        // here = this pipeline's own shape: a quality gate (n_chars >=
        // 100 — the DQ drop) plus a token normalization pass
        // ('spark' -> 'flink' vocabulary remap, the terminology-
        // normalization op), so the diff classes arise from REAL
        // operators, not synthetic mutations. Content addressing is
        // md5-of-text (the q98 chunk discipline), change classes:
        // 'removed' (gate-dropped) and 'modified' (hash moved);
        // unchanged rows are suppressed — a diff at 100 TB must be
        // O(changes), not O(corpus), on output. 'added' is structurally
        // empty for a filter+map successor and the op reports it when
        // the successor gains rows (full-outer shape, not left).
        //
        // SCALE: one scan each side, full outer join on the doc_id key —
        // co-partitioned shuffle join, no skew (keys unique per side).
        val a = documents(s, d).select(col("doc_id"), md5(col("text")).as("old_md5"))
        val b = documents(s, d)
          .filter(col("n_chars") >= 100)
          .select(col("doc_id"),
            md5(array_join(
              transform(split(col("text"), " "),
                t => when(t === "spark", "flink").otherwise(t)),
              " ")).as("new_md5"))
        a.join(b, Seq("doc_id"), "full_outer")
          .withColumn("change_type",
            when(col("new_md5").isNull, "removed")
              .when(col("old_md5").isNull, "added")
              .when(col("old_md5") =!= col("new_md5"), "modified"))
          .filter(col("change_type").isNotNull)
          .select(col("doc_id"), col("change_type"), col("old_md5"), col("new_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id, md5(text) AS old_md5 FROM documents),
             |b AS (
             |  SELECT doc_id,
             |    md5(array_to_string(
             |      list_transform(string_split(text, ' '),
             |        t -> CASE WHEN t = 'spark' THEN 'flink' ELSE t END),
             |      ' ')) AS new_md5
             |  FROM documents WHERE n_chars >= 100)
             |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             |  CASE WHEN b.new_md5 IS NULL THEN 'removed'
             |       WHEN a.old_md5 IS NULL THEN 'added'
             |       WHEN a.old_md5 != b.new_md5 THEN 'modified' END AS change_type,
             |  a.old_md5 AS old_md5, b.new_md5 AS new_md5
             |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
             |WHERE CASE WHEN b.new_md5 IS NULL THEN 'removed'
             |           WHEN a.old_md5 IS NULL THEN 'added'
             |           WHEN a.old_md5 != b.new_md5 THEN 'modified' END IS NOT NULL
             |ORDER BY doc_id""".stripMargin),
      "snapshot diff between a corpus generation and its processed successor (DQ gate + vocab remap): full-outer key join, change rows only (removed/modified/added), md5 content addressing — the nightly change report that scopes downstream reprocessing"))
}
