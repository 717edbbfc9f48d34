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

  /** Base directory for scratch: `-Dgraft.scratch.dir` wins; otherwise
    * /dev/shm when it is a roomy tmpfs (same ≥12 GB usable gate as
    * build.sbt's spark.local.dir choice — scratch sinks/feeds/checkpoints
    * then avoid block-device latency and fsync jitter, which showed up as
    * per-micro-batch commit-log stalls in the streaming queries); else
    * java.io.tmpdir. Evaluated once per JVM.
    */
  private lazy val base: Option[Path] = {
    val configured = sys.props.get("graft.scratch.dir").map(java.nio.file.Paths.get(_))
    val shm = java.nio.file.Paths.get("/dev/shm")
    val pick = configured.orElse {
      if (Files.isDirectory(shm) && shm.toFile.getUsableSpace > 12L * 1024 * 1024 * 1024)
        Some(shm.resolve("graft-scratch"))
      else None
    }
    pick.flatMap { p =>
      try { Files.createDirectories(p); Some(p) }
      catch { case _: IOException => None } // unwritable: fall back to tmpdir
    }
  }

  def scratch(prefix: String): Path = {
    hookInstalled
    val p = base match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None => Files.createTempDirectory(prefix)
    }
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
