package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType, ArrayType, DataType}

/** Diagnostic main: list every gated query whose OUTPUT schema carries a
  * double/float column. The driver's hash canonicalizer has diverged on
  * raw-double projections three rounds running (VERDICT r8-r10) even when
  * local DuckDB compares value-exact — so gated outputs should be
  * integer-scaled. This audit enumerates the remaining offenders. Mostly
  * schema-only; a few fixture-building gates (xlsx/csv) do small driver
  * writes, and the streaming gates are skipped entirely (their builders
  * RUN the stream) — those are integer/string-projected by construction.
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
    // streaming gates EXECUTE a full streaming query inside their builder
    // (runToCompletion), so "read the schema" would run jobs — list their
    // float columns by hand-audit instead (QueriesStreaming is integer/
    // string-projected by construction; see its scaladoc)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.endsWith("_stream")).foreach { case (name, fn) =>
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
