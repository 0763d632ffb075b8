package graft

import graft.sources.IoOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Co-located joins over bucketed tables: the write-once/join-many scale
  * pattern. The assertion that matters is on the PLAN — a bucketed⋈bucketed
  * equi-join must not shuffle either side.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean = {
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case other => other.children.exists(scan)
    }
    // materialize first so AQE settles on the final plan
    df.write.format("noop").mode("overwrite").save()
    scan(df.queryExecution.executedPlan)
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i", i * 1.5)).toDF("k", "tag", "x")
    val dims = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    IoOps.writeBucketed(facts, "b_facts", Seq("k"), 8)
    IoOps.writeBucketed(dims, "b_dims", Seq("k"), 8)
    try {
      val f = spark.table("b_facts")
      val d = spark.table("b_dims")
      val joined = f.join(d, Seq("k"))
      assert(joined.count() == 1000)
      assert(!hasShuffle(joined), "bucketed equi-join must not shuffle")
      // same-key aggregation rides the bucketing too
      val agg = f.groupBy("k").agg(sum(col("x")).as("sx"))
      assert(agg.count() == 50)
      assert(!hasShuffle(agg), "bucketed groupBy must not shuffle")
      // sanity: the identical join over raw (unbucketed) frames DOES shuffle
      // (disable auto-broadcast so the small side can't dodge the exchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assert(hasShuffle(facts.join(dims, Seq("k"))))
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
