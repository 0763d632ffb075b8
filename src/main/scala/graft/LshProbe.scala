package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-bytes probe for the two LSH dup-pair staging strategies
  * (VERDICT r11 #6): full-vector staging rides each embedding ×numTables
  * through the (tbl,bucket) exchange; signature-only staging shuffles just
  * (id, tbl, bucket) and fetches vectors per deduped candidate pair. This
  * main runs both at a given sf dir and prints one JSON line per run with
  * wall seconds and total shuffle write bytes, so the trade is measured
  * rather than asserted (results recorded in scripts/SF1_SMOKE.md).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.LshProbe"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // warm up scans + kernel codegen so run 1 isn't charged for JIT
    emb.select(sum(element_at(col("embedding"), 1))).collect()

    def run(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      // settle the async listener queue so bytes attribute to the right run
      Thread.sleep(1500)
      shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val rows = f().count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"""{"probe":"$name","rows":$rows,"wall_sec":$wall%.3f,"shuffle_write_bytes":${shuffleWrite.get()}}""")
    }

    val probe = emb.filter(col("vec_id") < 200)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    for (iter <- 1 to 2; sig <- Seq(false, true)) {
      val tag = if (sig) "sig_only" else "full_vec"
      run(s"self_pairs_${tag}_$iter", () => llm.Similarity.lshCosineDupPairs(
        emb, "vec_id", "embedding", threshold = 0.99, shuffleVectors = !sig))
      run(s"cross_corpus_${tag}_$iter", () => llm.Similarity.crossCorpusCosineDupPairs(
        probe, emb, "vec_id", "embedding", threshold = 0.99, shuffleVectors = !sig))
    }
    spark.stop()
  }
}
