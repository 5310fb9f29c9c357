package graft.tools
import org.apache.spark.sql.SparkSession
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (n <- Seq(30, 127, 200, 500)) {
      var rounds = 0
      val chain = (0L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val r = graft.operators.Dedup.connectedComponents(chain, roundProbe = x => rounds = x)
      val ok = r.collect().forall(_.getLong(1) == 0L)
      graft.operators.Dedup.release(r)
      println(s"CHAIN n=$n rounds=$rounds allZero=$ok")
    }
    spark.stop()
  }
}
