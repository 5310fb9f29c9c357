package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.functions.VectorFunctions._

class VecDotSpec extends AnyFunSuite {

  test("native VecDot equals the HOF formulation bit-for-bit on real embeddings") {
    val e = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val hofDot = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val both = e.select(col("vec_id"),
      dot(col("v"), col("v")).as("native"), hofDot.as("hof")).collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec ${r.getLong(0)}")
    }
  }

  test("VecDot handles nulls and rejects ragged inputs") {
    import spark.implicits._
    val ok = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = ok.select(dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    // dimension mismatch must fail loudly (DuckDB list_inner_product
    // errors too), never silently truncate to min-length
    val ragged = Seq((Seq(1.0, 2.0, 99.0), Seq(5.0, 6.0))).toDF("a", "b")
    val e = intercept[Exception] {
      ragged.select(dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("vec_dot is callable from SQL after extension registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
    // and through the plugin path on a derived session
    val r2 = spark.sql("SELECT vec_dot(CAST(array(1.5) AS array<double>), array(2.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r2 == 3.0)
  }

  test("codegen path is exercised (no fallback errors on wide plans)") {
    val e = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val n = e.withColumn("d", dot(col("v"), col("v")))
      .filter(col("d") > 0).count()
    assert(n == 500)
  }
}
