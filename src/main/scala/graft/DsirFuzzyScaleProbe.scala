package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 sf1 probe for the two scale paths added this round:
  *
  *  1. dsirResample's threshold selection (VERDICT r17 #2): run the gate's
  *     selection on sf1 documents with k scaled 10× (1000), once through
  *     TakeOrderedAndProject (cutoff above k) and once through the
  *     approxQuantile threshold path (cutoff 0), assert the selected id
  *     sets are IDENTICAL, and record both wall-clocks.
  *
  *  2. fuzzySelfJoin's hot-bucket cap (VERDICT r17 #3): ScaleGen's per-copy
  *     suffix grows every customer into a ~10-member edit-distance-1
  *     clique, the exact family-growth shape the cap bounds. Run sf1
  *     customer names uncapped (the r17 lane's 126–145 s row) and under a
  *     biting cap (maxBucket=8), recording wall-clocks and pair counts —
  *     the delta IS the documented recall trade on data whose families
  *     were grown 10× by construction.
  *
  * One JSON line per measurement; results recorded in scripts/SF1_SMOKE.md.
  */
object DsirFuzzyScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val which = sys.env.getOrElse("SPARK_GRAFT_PROBE", "both")

    if (which == "both" || which == "dsir") {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val target = Tables.documents(spark, sfDir)
        .filter(col("lang") === "en").select("text")
      val k = sys.env.getOrElse("SPARK_GRAFT_PROBE_K", "1000").toInt
      val (takeIds, tTake) = timed {
        graft.llm.Sampling.dsirResample(docs, target, "doc_id", "text",
          k = k, buckets = 64, thresholdCutoff = Int.MaxValue)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      }
      val (thrIds, tThr) = timed {
        graft.llm.Sampling.dsirResample(docs, target, "doc_id", "text",
          k = k, buckets = 64, thresholdCutoff = 0)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      }
      val same = takeIds == thrIds
      println(s"""{"probe":"dsir_resample_sf1","k":$k,""" +
        s""""take_ordered_sec":${f"$tTake%.2f"},"threshold_sec":${f"$tThr%.2f"},""" +
        s""""take_n":${takeIds.size},"threshold_n":${thrIds.size},"identical":$same}""")
      require(same, "threshold path diverged from TakeOrdered top-k")
    }

    if (which == "both" || which == "fuzzy") {
      val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      val cap = sys.env.getOrElse("SPARK_GRAFT_PROBE_CAP", "8").toInt
      val (capped, tCap) = timed {
        graft.operators.JoinOps.fuzzySelfJoin(cust, "c_custkey", "c_name",
          maxDist = 1, maxBucket = cap).count()
      }
      println(s"""{"probe":"fuzzy_self_join_sf1_capped","max_bucket":$cap,""" +
        s""""sec":${f"$tCap%.2f"},"pairs":$capped}""")
      if (sys.env.get("SPARK_GRAFT_PROBE_UNCAPPED").contains("1")) {
        val (full, tFull) = timed {
          graft.operators.JoinOps.fuzzySelfJoin(cust, "c_custkey", "c_name",
            maxDist = 1).count()
        }
        println(s"""{"probe":"fuzzy_self_join_sf1_uncapped",""" +
          s""""sec":${f"$tFull%.2f"},"pairs":$full}""")
      }
    }

    // two-sided fuzzyJoin (VERDICT r18 #5): same cap code, separate
    // measurement — two clique-grown corpora of the adversarial sf1 shape
    // (the second = the first with offset ids, i.e. every family collides
    // cross-corpus the way the self-join's did intra-corpus)
    if (which == "both" || which == "fuzzy2") {
      val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      val rightC = cust.select((col("c_custkey") + 100000000L).as("r_id"),
        col("c_name").as("r_name"))
      val cap = sys.env.getOrElse("SPARK_GRAFT_PROBE_CAP", "8").toInt
      val (capped2, tCap2) = timed {
        graft.operators.JoinOps.fuzzyJoin(cust, rightC, "c_name", "r_name",
          maxDist = 1, maxBucket = cap).count()
      }
      println(s"""{"probe":"fuzzy_join_sf1_capped","max_bucket":$cap,""" +
        s""""sec":${f"$tCap2%.2f"},"pairs":$capped2}""")
      if (sys.env.get("SPARK_GRAFT_PROBE_UNCAPPED").contains("1")) {
        val (full2, tFull2) = timed {
          graft.operators.JoinOps.fuzzyJoin(cust, rightC, "c_name", "r_name",
            maxDist = 1).count()
        }
        println(s"""{"probe":"fuzzy_join_sf1_uncapped",""" +
          s""""sec":${f"$tFull2%.2f"},"pairs":$full2}""")
      }
    }

    spark.stop()
  }
}
