package graft
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.syntax._
    for (d <- Seq("/root/testdata/sf0.1"); mode <- Seq("off", "auto", "off", "auto")) {
      val li = Tables.lineitem(spark, d).select("l_orderkey","l_quantity")
      val b = Tables.supplier(spark, d).select(col("s_suppkey"), ((col("s_suppkey") % 10) * 5.0d).as("lo"), ((col("s_suppkey") % 10) * 5.0d + 7.0d).as("hi"))
      val t0 = System.nanoTime()
      val j = li.rangeJoin(b, "l_quantity", "lo", "hi", bandWidth = 5.0d, dedupIntervals = mode)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      val n = j.agg(sum("n")).collect()(0).getLong(0)
      val dt = (System.nanoTime()-t0)/1e9
      println(f"[probe] $d%-22s mode=$mode%-5s joinrows=$n%,d  ${dt}%.1f s")
    }
    spark.stop()
  }
}
