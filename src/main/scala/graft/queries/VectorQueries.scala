package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Brute-force cosine is the oracle-checkable baseline; the LSH-bucketed
  * scale path lives in `graft.operators.Similarity` (rows-only check — not
  * SQL-expressible in DuckDB).
  */
object VectorQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q28_embedding_norms",
      (s, d) =>
        embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            round(l2Norm(asDouble(col("embedding"))), 6).as("l2_norm"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id, len(embedding) AS dim,
             |  round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
             |                                CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
             |FROM embeddings
             |ORDER BY vec_id""".stripMargin),
      "per-vector L2 norm — validates the double-fold parity with DuckDB"),

    Q(
      "q65_array_ops",
      (s, d) =>
        embeddings(s, d)
          .select(
            col("vec_id"),
            element_at(slice(col("embedding"), 1, 3), 1).as("e1"),
            element_at(slice(col("embedding"), 1, 3), 3).as("e3"),
            array_max(col("embedding")).as("max_elem"),
            array_min(col("embedding")).as("min_elem"),
            size(filter(col("embedding"), x => x > 0)).cast("long").as("n_positive"),
            element_at(col("embedding"), -1).as("last_elem"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
             |  embedding[1:3][1] AS e1,
             |  embedding[1:3][3] AS e3,
             |  list_max(embedding) AS max_elem,
             |  list_min(embedding) AS min_elem,
             |  len(list_filter(embedding, x -> x > 0)) AS n_positive,
             |  embedding[-1] AS last_elem
             |FROM embeddings
             |ORDER BY vec_id""".stripMargin),
      "array function family: slice/element_at/min/max/filter/negative-index over float vectors " +
        "(no arithmetic → exact parity; scalar outputs so the hash compare never sees array cells)"),

    Q(
      "q29_cosine_topk",
      (s, d) => {
        val emb = embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val query = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(query))
          .withColumn("cos_raw", cosine(col("e"), col("qe")))
          .orderBy(col("cos_raw").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      },
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
             |scored AS (
             |  SELECT vec_id,
             |    list_inner_product(CAST(embedding AS DOUBLE[]), qe)
             |      / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
             |         * sqrt(list_inner_product(qe, qe))) AS cos_raw
             |  FROM embeddings, q
             |  WHERE vec_id <> 0)
             |SELECT vec_id, round(cos_raw, 6) AS cos_sim
             |FROM scored
             |ORDER BY cos_raw DESC, vec_id
             |LIMIT 10""".stripMargin),
      "brute-force cosine top-k vs query vector (broadcast of the 1-row query side)"),

    Q(
      "q167_sq8_topk",
      (s, d) => {
        // INT8 SCALAR QUANTIZATION (SQ8) similarity — the OTHER standard
        // embedding compression beside PQ (q121/q122): per-dimension
        // affine codes, 4x smaller than float32, scored by an exact
        // int64 dot product. Unlike PQ (float codebooks → rows-only
        // check), every step here is exact-replayable — min/max fit
        // (no summation), IEEE-deterministic affine map with the
        // floor(x*s + 0.5) idiom, integer clamp, integer dot — so SQ8
        // gets a FULL-PARITY oracle, the only quantized-scoring family
        // in the suite that does.
        //
        // SCALE: the fit is one posexplode + 64-row dim agg (the q100
        // shape, bounded `dim` key); encode is per-row zip_with map
        // work, no shuffle; the corpus sweep here is the fenced
        // brute-force baseline (q29's standing) — at 100 TB the same
        // int8 scoring runs over ANN candidates (q37/q153) instead of
        // the corpus, with 1/4 the scan bandwidth of float and the
        // integer ALU beating FMA on memory-bound scans.
        val emb = embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val stats = emb.select(posexplode(col("e")).as(Seq("pos", "x")))
          .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
          .groupBy()
          .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx"))))
            .as("st"))
          .select(transform(col("st"), t => t.getField("mn")).as("mins"),
            transform(col("st"), t => t.getField("mx")).as("maxs"))
        def codes(e: Column): Column =
          zip_with(
            zip_with(e, col("mins"), (x, mn) => x - mn),
            zip_with(col("maxs"), col("mins"), (mx, mn) => mx - mn),
            (dx, rg) => when(rg === 0d, lit(0L))
              .otherwise(greatest(lit(0L),
                least(lit(255L), floor(dx / rg * 255 + 0.5)))))
        val coded = emb.crossJoin(broadcast(stats))
          .select(col("vec_id"), codes(col("e")).as("c"))
        val qc = coded.filter(col("vec_id") === 0).select(col("c").as("qc"))
        coded.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qc))
          .withColumn("sq8_score",
            aggregate(zip_with(col("c"), col("qc"), (a, b) => a * b),
              lit(0L), (acc, v) => acc + v))
          .orderBy(col("sq8_score").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), col("sq8_score"))
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |e AS (
             |  SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
             |    i -> struct_pack(dim := i, x := v[i]))) AS s
             |  FROM v),
             |f AS (
             |  SELECT vec_id, struct_extract(s, 'dim') AS dim,
             |         struct_extract(s, 'x') AS x
             |  FROM e),
             |d AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM f GROUP BY dim),
             |c AS (
             |  SELECT f.vec_id, f.dim,
             |    CASE WHEN d.mx = d.mn THEN 0
             |         ELSE greatest(0, least(255,
             |           CAST(floor((f.x - d.mn) / (d.mx - d.mn) * 255 + 0.5)
             |             AS BIGINT)))
             |    END AS code
             |  FROM f JOIN d ON f.dim = d.dim),
             |q AS (SELECT dim, code AS qcode FROM c WHERE vec_id = 0)
             |SELECT c.vec_id, CAST(sum(c.code * q.qcode) AS BIGINT) AS sq8_score
             |FROM c JOIN q ON c.dim = q.dim
             |WHERE c.vec_id <> 0
             |GROUP BY c.vec_id
             |ORDER BY sq8_score DESC, vec_id
             |LIMIT 10""".stripMargin),
      "int8 scalar quantization (SQ8): per-dim affine codes + exact int64 dot-product top-k — 4x scan-bandwidth reduction vs float32; the only quantized-scoring family with a FULL-PARITY oracle (min/max fit and floor-affine encode are bit-replayable, PQ's float codebooks are not)"))
}
