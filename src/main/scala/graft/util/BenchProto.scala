package graft.util

/** The repo's bench noise protocol in ONE place (BENCH/BASELINE.md): an
  * untimed warm-up evaluation, then `reps` timed evaluations; report the
  * MIN (stall-robust on this host), the raw rep timings verbatim, and the
  * computed result. Every scale-bench main times through this helper so a
  * protocol change (e.g. min → median) lands everywhere at once instead of
  * silently mixing protocols across BENCH JSONs.
  *
  * The returned `A` is the LAST timed rep's result (the helpers this
  * replaced returned the first rep's) — equivalent for the deterministic
  * checksums benched today; a future bench with rep-dependent results must
  * not rely on first-rep semantics.
  */
object BenchProto {
  def minOf[A](reps: Int)(f: => A): (Double, Seq[Double], A) = {
    var last: A = f // untimed warm-up
    val ts = (1 to math.max(1, reps)).map { _ =>
      val t0 = System.nanoTime()
      last = f
      (System.nanoTime() - t0) / 1e9
    }
    (ts.min, ts, last)
  }
}
