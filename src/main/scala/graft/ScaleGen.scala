package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inflate a driver testdata directory by an integer factor — the input to
  * the sf1 smoke lane (`scripts/sf1_smoke.sh`). Each table is cross-joined
  * with `range(factor)`; key/id columns are remapped (`old * factor + copy`)
  * so cardinalities scale instead of collapsing into `factor`-sized
  * duplicate families, and text columns get a per-copy suffix token so the
  * dedup operators see near-dups, not `factor`-way exact clones.
  *
  * This is a WORKLOAD-SHAPE generator, not a correctness fixture: the
  * oracle gate stays at sf0.01; this lane exists to surface O(n²)-shaped
  * operators (the round-7/8 HOF findings) before the committed bench does.
  */
object ScaleGen {

  private def isKeyCol(name: String): Boolean =
    name.endsWith("key") || name.endsWith("_id")

  def inflate(df: DataFrame, factor: Int): DataFrame = {
    val spark = df.sparkSession
    val copies = spark.range(factor).select(col("id").as("__copy"))
    val wide = df.crossJoin(copies)
    val remapped = df.schema.fields.foldLeft(wide) { (acc, f) =>
      f.dataType match {
        case t if isKeyCol(f.name) &&
            (t == org.apache.spark.sql.types.LongType ||
             t == org.apache.spark.sql.types.IntegerType) =>
          acc.withColumn(f.name,
            (col(s"`${f.name}`").cast("long") * factor + col("__copy"))
              .cast(t))
        case org.apache.spark.sql.types.StringType if f.name == "text" =>
          acc.withColumn(f.name,
            concat(col(s"`${f.name}`"), lit(" c"), col("__copy")))
        case _ => acc
      }
    }
    remapped.drop("__copy")
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    tables.foreach { t =>
      // events.parquet carries TIMESTAMP(NANOS): with nanosAsLong set (see
      // builder) ts reads AND rewrites as a plain long, so Tables.events'
      // `ts div 1000` works identically on the inflated directory
      val df = spark.read.parquet(s"$src/$t")
      inflate(df, factor).write.mode("overwrite").parquet(s"$dest/$t")
      println(s"[scalegen] $t x$factor -> $dest/$t")
    }
    spark.stop()
  }
}
