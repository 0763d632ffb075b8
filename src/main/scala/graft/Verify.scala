package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_QUERIES=a,b,c restricts the run (preflight smoke);
    // oracle_sql.json is filtered to match so check.py compares only those.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Sorted order: a mid-run death truncates an *alphabetical* tail, which
    // is immediately recognizable in the record — the round-9 incident
    // (SparkContext died under machine contention, every later query in
    // HashMap iteration order failed in ~0s) silently dropped a scattered
    // 38-query subset instead.
    val selected = (only match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None    => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    writeOracle(outDir, only) // BEFORE the loop: never a casualty of a kill
    var spark = newSession(cpus)
    var failed = 0
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query wall time on stderr: a degraded run (env contention,
        // GC pressure) shows where the time went — same diagnosability
        // contract as Bench
        System.err.println(
          f"[verify] ${java.time.Instant.now()} $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // If the fatal error took the whole SparkContext down (executor
        // OOM under contention), every remaining query would fail in ~0s.
        // Rebuild the session so one casualty stays one casualty.
        if (spark.sparkContext.isStopped) {
          System.err.println(s"[verify] SparkContext died after $name — restarting session")
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
          spark = newSession(cpus)
        }
      }
    }
    System.err.println(s"[verify] done: ${selected.size - failed}/${selected.size} ok, $failed failed")
    spark.stop()
  }

  private def writeOracle(outDir: String, only: Option[Set[String]]): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
