package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DataDescription accessor (reference: janitor/accessors/data_description.py:10-49):
  * per-column summary — one aggregate pass over the data, then a
  * schema-sized driver reshape to long form.
  */
object DescribeOps {

  def dataDescription(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aggs = df.columns.flatMap(c => Seq(
      count(col(s"`$c`")).as(s"__cnt_$c"),
      count(lit(1)).as(s"__n_$c")))
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val out = df.schema.fields.map { f =>
      val cnt = row.getAs[Long](s"__cnt_${f.name}")
      val n = row.getAs[Long](s"__n_${f.name}")
      Row(f.name, f.dataType.simpleString, cnt, n - cnt,
        f.metadata.toString match { case "{}" => null; case m => m })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1),
      StructType(Seq(
        StructField("column_name", StringType),
        StructField("dtype", StringType),
        StructField("count", LongType),
        StructField("null_count", LongType),
        StructField("description", StringType))))
  }
}
