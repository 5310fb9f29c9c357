package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: a multi-column generalization of
  * [[Compaction]]'s single-axis `clusterBy`.
  *
  * A single-column sort gives perfect footer-stats skipping on that column
  * and none on any other. Interleaving the bits of several columns' grid
  * ranks into one key makes rows that are close in EVERY dimension also
  * close in the key order — so after a range-partition + sort on the key,
  * each output file covers a small hyper-rectangle of the space and a
  * filter on ANY of the clustered columns prunes most files from their
  * parquet min/max footers alone. This is the standard layout technique
  * for multi-predicate scan-heavy tables (the same idea behind
  * DELTA/Iceberg Z-ORDER table maintenance), here as a plain DataFrame
  * transform so any parquet sink can use it.
  *
  * Grid ranks come from `width_bucket` over each column's (min, max) — a
  * linear grid, computed with ONE tiny all-column agg job (at production
  * scale those bounds come free from table-level metadata; a quantile grid
  * would equalize bucket populations for skewed columns at the cost of an
  * approxQuantile pass — the key builder below takes whatever rank columns
  * it is given, so both grids compose). Everything else is pure integer
  * bit-math inside whole-stage codegen: no UDF, no extra shuffle beyond
  * the one range exchange every clustered rewrite needs anyway.
  */
object Zorder {

  /** Interleave the low `bits` bits of `ranks` (non-negative ints/longs)
    * into one Morton key: rank i's bit b lands at key position b*n+i, so
    * high key bits alternate across dimensions and a contiguous key range
    * is a hyper-rectangle-ish region of the grid. n*bits must fit a long.
    */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.nonEmpty, "interleave needs at least one rank column")
    require(ranks.size * bits <= 63,
      s"${ranks.size} dims x $bits bits exceeds a long's 63 usable bits")
    val n = ranks.size
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      ranks.zipWithIndex.foldLeft(acc) { case (a, (r, i)) =>
        a.bitwiseOR(shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i))
      }
    }
  }

  /** Morton key over `cols`, each linearly gridded to 2^bits cells between
    * its observed min and max (one small agg job; NULL ranks NULL, sorting
    * those rows together first). `width_bucket` returns 1..2^bits with
    * 2^bits+1 for the max value itself — clamp then shift to 0-based.
    */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    val cells = 1L << bits
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      if (lo == hi) lit(0L) // constant column: every row in cell 0
      else
        (least(width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(cells)),
          lit(cells)) - lit(1L)).cast("long")
    }
    interleave(ranks, bits)
  }

  /** `df` laid out for writing: range-partitioned and sorted by the Morton
    * key over `cols`, key dropped (a projection after the sort keeps row
    * order). Write the result with any parquet sink; each of the
    * `numFiles` tasks covers one contiguous key slice = one small
    * hyper-rectangle of the clustered columns.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__zorder_key", zorderKey(df, cols, bits))
    keyed
      .repartitionByRange(numFiles, col("__zorder_key"))
      .sortWithinPartitions(col("__zorder_key"))
      .drop("__zorder_key")
  }
}
