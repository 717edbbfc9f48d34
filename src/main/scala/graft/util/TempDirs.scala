package graft.util

import java.nio.file.{Files, Path}

/** Scratch directories for driver-contract surfaces that stage transient
  * feeds/sinks (q_stream_triples' page feed + streaming sink, Explain's
  * parquet-backed pages table): created under java.io.tmpdir and removed
  * recursively at JVM exit, so repeated Verify/Bench/Explain invocations
  * don't litter the host. Deletion is best-effort (a file vanishing
  * mid-walk must not fail the exiting JVM).
  */
object TempDirs {

  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
    p
  }

  def delete(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try Files.delete(f) catch { case _: Throwable => () })
    }
}
