package graft

/** VERDICT r21 #8: the streaming gate harness normally checkpoints its
  * ephemeral memory-sink state under /dev/shm; this spec forces the
  * DISK-backed override path (the behavior on hosts without a writable
  * /dev/shm) and re-runs the most state-heavy gates, so the RAM-checkpoint
  * optimization can never mask a recovery-path regression: the override
  * exercises exactly the fsync-heavy HDFSBackedStateStore layout the
  * default lane no longer touches, and results must be identical.
  */
class StreamCkptFallbackSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val gates =
    Seq("windowed_agg_stream", "session_window_stream", "dedup_lines_stream")

  test("stateful streaming gates are green and identical on a disk-backed checkpoint") {
    def runAll(): Map[String, Seq[Seq[Any]]] =
      gates.map(g => g -> sorted(QueriesStreaming.entries(g)(spark, sfDir))).toMap
    val default = runAll()
    val disk = java.nio.file.Files.createTempDirectory("graft-ckpt-disk")
    sys.props("spark.graft.streamCkpt") = disk.toString
    try {
      val viaDisk = runAll()
      gates.foreach { g =>
        assert(viaDisk(g) == default(g), s"$g diverged on the disk checkpoint path")
        assert(viaDisk(g).nonEmpty, s"$g produced no rows on the disk checkpoint path")
      }
    } finally {
      sys.props.remove("spark.graft.streamCkpt")
      import scala.jdk.CollectionConverters._
      try java.nio.file.Files.walk(disk).iterator().asScala.toSeq.reverseIterator
        .foreach(p => try java.nio.file.Files.delete(p) catch { case _: Throwable => () })
      catch { case _: Throwable => () }
    }
  }
}
