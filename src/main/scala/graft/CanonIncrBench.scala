package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.canon.Canon
import graft.model.{Gazetteer, Mention}

/** Dimension-scale evidence for the incremental canon refresh
  * (BENCH/BASELINE.md "incremental canonicalization"): times the FULL
  * [[Canon.canonicalState]] job against [[Canon.canonicalMapIncremental]]
  * folds of 1% and 10% deltas over the same surface dimension, with the
  * carried state staged through parquet (the production shape — between
  * refreshes the state lives as tables, not cached plans).
  *
  * Corpus: N synthetic two-token base surfaces (disjoint from the real
  * gazetteer, [[Gazetteer.syntheticSurfaces]]) plus one accent variant
  * each — 2N surfaces, N two-surface components whose edges verify by
  * sim_key equality through first-token blocking (block df ≈ 2N/8000,
  * far under the stop-token cap; second tokens are hot in BOTH the
  * initial and merged dimensions, so the cap-crossing gate never fires
  * and the refresh is provably on the incremental branch — `require`d).
  * Exactness is `require`d per point: the refreshed map's content
  * fingerprint must equal the full job's.
  *
  * One JSON line; min-of-reps after an untimed warm-up, per the repo's
  * noise protocol.
  */
object CanonIncrBench {

  /** First vowel accented: folds back to the base under simkey's
    * unaccent, so base↔variant is a guaranteed sim_key-equality edge. */
  private def accent(s: String): String = {
    val repl = Map('a' -> 'á', 'e' -> 'é', 'i' -> 'í', 'o' -> 'ó', 'u' -> 'ú')
    val i = s.indexWhere(repl.contains)
    require(i >= 0, s"no vowel in synthetic surface '$s'")
    s.updated(i, repl(s(i)))
  }

  private def mapChecksum(m: DataFrame): (Long, Long) = {
    val r = m.agg(
      count(lit(1)),
      sum(xxhash64(col("surface"), col("canonical"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getDecimal(1).toBigInteger.longValue())
  }

  def main(args: Array[String]): Unit = {
    val nBases = sys.env.getOrElse("SPARK_GRAFT_CANON_BASES", "100000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_CANON_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-canon-incr-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 2N-surface mention table, one mention per surface (canon cost is
    // dimension-driven; count merging is CanonSpec-covered). Driver-side
    // synthesis then repartition — same policy as GazetteerBench's dimension.
    val rows = Gazetteer.syntheticSurfaces(nBases).zipWithIndex.flatMap {
      case ((s, label), i) => Seq(
        Mention(s"u$i", 0, 0, s, label, 0, s.length, 1.0),
        Mention(s"v$i", 0, 0, accent(s), label, 0, s.length, 1.0))
    }
    def ds(pred: Int => Boolean) = spark.createDataset(
      rows.zipWithIndex.collect { case (m, j) if pred(j / 2) => m })
      .repartition(cpus.toInt).cache()

    val all = ds(_ => true)
    val nSurfaces = all.count()

    def timeJob(run: () => (Long, Long)): (Double, (Long, Long)) = {
      val (min, _, fp) = graft.util.BenchProto.minOf(reps)(run())
      (min, fp)
    }

    val (fullSec, fullFp) = timeJob { () =>
      mapChecksum(Canon.canonicalState(all).canonMap)
    }

    // One incremental point per delta fraction: initial = bases with
    // i % mod != 0, delta = the rest. Carried state staged through parquet.
    val tmp = graft.util.TempDirs.scratch("graft-canon-incr")
    def incrPoint(mod: Int): (Double, Long) = {
      val initial = ds(_ % mod != 0)
      val delta = ds(_ % mod == 0)
      val nDelta = delta.count()
      val st = Canon.canonicalState(initial)
      st.stats.write.mode("overwrite").parquet(s"$tmp/m$mod/stats")
      st.canonMap.write.mode("overwrite").parquet(s"$tmp/m$mod/alias")
      val carried = Canon.CanonState(
        spark.read.parquet(s"$tmp/m$mod/stats"),
        spark.read.parquet(s"$tmp/m$mod/alias"))
      val (sec, fp) = timeJob { () =>
        val r = Canon.canonicalMapIncremental(carried, delta)
        require(!r.fellBack, s"1/$mod delta unexpectedly crossed the token cap")
        mapChecksum(r.state.canonMap)
      }
      require(fp == fullFp,
        s"1/$mod incremental refresh diverged from the full job: $fp != $fullFp")
      initial.unpersist(); delta.unpersist()
      (sec, nDelta)
    }
    val (incr1Sec, nDelta1) = incrPoint(100) // 1% delta
    val (incr10Sec, nDelta10) = incrPoint(10) // 10% delta
    all.unpersist()

    val json =
      f"""{"metric":"canon_incremental","n_surfaces":$nSurfaces,"n_components":$nBases,"cpus":$cpus,"reps":$reps,"full_sec":$fullSec%.3f,"incr_1pct_sec":$incr1Sec%.3f,"incr_10pct_sec":$incr10Sec%.3f,"delta_1pct_mentions":$nDelta1,"delta_10pct_mentions":$nDelta10,"speedup_1pct":${fullSec / incr1Sec}%.2f,"speedup_10pct":${fullSec / incr10Sec}%.2f,"map_rows":${fullFp._1}}"""
    println(json)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH/canon_incr_scale.json"), json + "\n")
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
