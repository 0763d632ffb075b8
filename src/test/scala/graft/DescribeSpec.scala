package graft

import graft.operators.DescribeOps
import org.apache.spark.sql.functions._

/** DataDescription description round-trip (reference:
  * janitor/accessors/data_description.py:10-77). The reference keeps user
  * descriptions in an in-memory dict that dies with the accessor; ours live
  * in column metadata — schema state — so they must survive a parquet
  * write/read (VERDICT r15 stretch #7).
  */
class DescribeSpec extends SparkSpec {
  import spark.implicits._

  test("setDescriptions surfaces in dataDescription and survives parquet") {
    val d = Seq((1, "a", Some(2.0)), (2, "b", None), (3, null, Some(4.0)))
      .toDF("id", "name", "score")
    val described = DescribeOps.setDescriptions(d,
      Map("id" -> "primary key", "score" -> "model score 0-1"))
    def descMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      DescribeOps.dataDescription(df).collect()
        .map(r => r.getString(0) -> r.getString(4)).toMap
    val before = descMap(described)
    assert(before("id") == "primary key")
    assert(before("score") == "model score 0-1")
    assert(before("name") == null) // undescribed column stays bare
    // null_count rides along
    val nulls = DescribeOps.dataDescription(described).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(nulls == Map("id" -> 0L, "name" -> 1L, "score" -> 1L))
    // the round-trip: parquet stores the spark schema (metadata included)
    // in the file footer, so a fresh read carries the descriptions
    val dir = java.nio.file.Files.createTempDirectory("graft-desc").toString
    described.write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    val after = descMap(back)
    assert(after("id") == "primary key")
    assert(after("score") == "model score 0-1")
    // unknown column raises like the reference's dict-key contract
    intercept[IllegalArgumentException](
      DescribeOps.setDescriptions(d, Map("nope" -> "x")))
  }
}
