package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan for one or more SparkEntry queries —
  * the scale-review loop: check joins broadcast, filters push down, and
  * codegen spans stay wide before accepting an operator as done.
  *
  * Usage: runMain graft.PlanCheck <queryName> [queryName...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
