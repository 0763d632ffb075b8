package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Offline tuning probe for the PQ/IVF-PQ recall trade (same role as
  * RangeProbe for the band join): prints mean recall@10 vs the exact dot
  * ranking for a grid of (refine, nProbe) plus plain ADC, on the given
  * sf dir. Drives the floor chosen in the `pq_recall` gate.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.dotTopK(qs, emb, "vec_id", "embedding", 10).cache()
    exact.count()
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nCells = 16, kmeansIters = 3)
    val cbs = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 8, k = 16, kmeansIters = 3)
    for (refine <- Seq(4, 8, 16); nProbe <- Seq(8, 12)) {
      val approx = Similarity.ivfPqTopK(qs, emb, "vec_id", "embedding", 10,
        cents, cbs, nProbe = nProbe, refine = refine)
      val r = Similarity.recallAtK(approx, exact).agg(avg("recall")).head.getDouble(0)
      println(f"[pqprobe] ivfpq refine=$refine%-3d nProbe=$nProbe%-3d recall=$r%.3f")
    }
    for (refine <- Seq(4, 8)) {
      val adc = Similarity.pqAdcTopK(qs, emb, "vec_id", "embedding", 10, cbs,
        refine = refine)
      val r = Similarity.recallAtK(adc, exact).agg(avg("recall")).head.getDouble(0)
      println(f"[pqprobe] adc   refine=$refine%-3d              recall=$r%.3f")
    }
    // OPQ vs PQ at the same (m, k): refine=1 is the discriminating config
    // (pure compressed-domain ranking, no exact-rerank rescue)
    val opq = Similarity.opqTrain(emb, "vec_id", "embedding",
      m = 8, k = 16, kmeansIters = 3)
    for (refine <- Seq(1, 4, 16)) {
      val pqA = Similarity.pqAdcTopK(qs, emb, "vec_id", "embedding", 10, cbs,
        refine = refine)
      val opqA = Similarity.opqAdcTopK(qs, emb, "vec_id", "embedding", 10, opq,
        refine = refine)
      val rPq = Similarity.recallAtK(pqA, exact).agg(avg("recall")).head.getDouble(0)
      val rOpq = Similarity.recallAtK(opqA, exact).agg(avg("recall")).head.getDouble(0)
      println(f"[pqprobe] A/B   refine=$refine%-3d pq=$rPq%.3f opq=$rOpq%.3f")
    }
    spark.stop()
  }
}
