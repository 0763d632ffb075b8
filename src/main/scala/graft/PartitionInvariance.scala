package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-invariance sweep: every batch gate's output SET must be
  * byte-identical under different shuffle layouts — pass A runs with the
  * bench config (shuffle.partitions = cpus, AQE on), pass B with a prime
  * partition count and AQE OFF. A mismatch means some operator's values
  * depend on partition order or count (a `limit()` sample, a non-keyed
  * first(), a rand() that leaks into values) — the class of distributed
  * bug the fixed-config DuckDB gate cannot see, because it always runs one
  * layout.
  *
  * The canonical form is order-independent: per-row md5 over all columns
  * cast to string (nulls → ∅), summed as decimal(38,0) alongside the row
  * count. Row ORDER is allowed to differ (pandas row-position order is an
  * explicit ordering column everywhere in this engine, and the driver's
  * compare sorts rows).
  *
  * Hard gate: exits 1 on any mismatch. Usage: runMain graft.PartitionInvariance [sfDir]
  */
object PartitionInvariance {
  /** Order-independent canonical form shared by both invariance sweeps
    * (batch here, streaming in [[StreamInvariance]]): per-row md5 over all
    * columns cast to string (nulls → ∅), summed as decimal(38,0) alongside
    * the row count. U+0001 separator: an empty one would hash ('ab','c')
    * and ('a','bc') identically, hiding a column-boundary shift.
    */
  private[graft] def canon(df: DataFrame): (String, Long) = {
    val cols = df.columns.map(c =>
      coalesce(col(s"`$c`").cast("string"), lit("∅")))
    val h = conv(substring(md5(concat_ws("\u0001", cols.toIndexedSeq: _*)), 1, 12), 16, 10)
    val row = df.agg(
      sum(h.cast("decimal(38,0)")).cast("string"), count(lit(1))).collect()(0)
    (Option(row.getString(0)).getOrElse("0"), row.getLong(1))
  }

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
    val canon = PartitionInvariance.canon _

    val streaming = QueriesStreaming.entries.keySet
    val names = SparkEntry.queries.keys.toSeq.filterNot(streaming).sorted

    def sweep(shufflePartitions: String, aqe: String): Map[String, Either[String, (String, Long)]] = {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      names.map { n =>
        n -> (try Right(canon(SparkEntry.queries(n)(spark, dir)))
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(80)}") })
      }.toMap
    }

    val a = sweep("8", "true")
    val b = sweep("3", "false")
    var bad = 0
    names.foreach { n =>
      (a(n), b(n)) match {
        case (Right(x), Right(y)) if x == y => ()
        case (Right(x), Right(y)) =>
          bad += 1
          println(s"[partinv] MISMATCH\t$n\tA=$x B=$y")
        case (l, r) =>
          bad += 1
          println(s"[partinv] ERROR\t$n\tA=$l B=$r")
      }
    }
    println(s"[partinv] done: ${names.size} batch gates, $bad partition-" +
      s"sensitive (shuffle 8+AQE vs 3 no-AQE)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
