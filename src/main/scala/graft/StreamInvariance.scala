package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-invariance sweep for the STREAMING surface (VERDICT r19 #6):
  * every streaming gate's output SET must be byte-identical whether its
  * source arrives as the driver's single-file/one-micro-batch layout or as
  * a re-chunked multi-file source delivering one file per micro-batch
  * (plain sources: 7 files/batches; already-split sources: +7 files on top
  * of their designed split). A mismatch means some stateful operator's
  * VALUES depend on arrival chunking — a state-key assumption, a
  * non-keyed first()/last() inside a micro-batch, or complete-mode output
  * that isn't actually a pure function of the input set — the class of bug
  * the batch PartitionInvariance sweep structurally cannot see.
  *
  * Canonical form and gate semantics identical to [[PartitionInvariance]]:
  * order-independent per-row md5 summed as decimal(38,0) + row count.
  * Hard gate: exits 1 on any mismatch.
  *
  * Usage: runMain graft.StreamInvariance [sfDir]
  */
object StreamInvariance {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one canonical form for both invariance sweeps — shared, not copied
    val canon = PartitionInvariance.canon _

    val names = QueriesStreaming.entries.keys.toSeq.sorted

    def sweep(split: Option[Int]): Map[String, Either[String, (String, Long)]] = {
      QueriesStreaming.invarianceSplit = split
      try names.map { n =>
        n -> (try Right(canon(SparkEntry.queries(n)(spark, dir)))
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(80)}") })
      }.toMap
      finally QueriesStreaming.invarianceSplit = None
    }

    val a = sweep(None)
    val b = sweep(Some(7))
    var bad = 0
    names.foreach { n =>
      (a(n), b(n)) match {
        case (Right(x), Right(y)) if x == y => ()
        case (Right(x), Right(y)) =>
          bad += 1
          println(s"[streaminv] MISMATCH\t$n\tA=$x B=$y")
        case (l, r) =>
          bad += 1
          println(s"[streaminv] ERROR\t$n\tA=$l B=$r")
      }
    }
    println(s"[streaminv] done: ${names.size} streaming gates, $bad " +
      s"chunking-sensitive (one-batch vs one-file-per-micro-batch)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
