package graft.util

import java.io.IOException
import java.nio.file.{Files, Path}

/** Scratch directories for driver-contract surfaces that stage transient
  * feeds/sinks (q_stream_triples' page feed + streaming sink, q_lineage's
  * sink, Explain's parquet-backed pages table): created under
  * java.io.tmpdir and removed recursively at JVM exit, so repeated
  * Verify/Bench/Explain invocations don't litter the host. ONE shutdown
  * hook drains the registered list (not one hook per scratch call), and
  * deletion is best-effort per file (a file vanishing mid-walk must not
  * fail the exiting JVM) but never swallows VM errors or interrupts.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = registered.poll()
      while (p != null) { delete(p); p = registered.poll() }
    }))

  def scratch(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  def delete(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => try Files.delete(f) catch { case _: IOException => () })
      finally walk.close()
    }
}
