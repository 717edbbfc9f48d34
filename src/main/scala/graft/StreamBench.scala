package graft

import org.apache.spark.sql.SparkSession

/** Streaming-flagship benchmark: drains the amplified pages corpus through
  * the incremental Structured Streaming pages→triples job and reports
  * sustained ingest throughput, for comparison against the batch flagship
  * record in BENCH/BASELINE.md. Two modes (SPARK_GRAFT_STREAM_MODE):
  *
  *  - `drain` (default): the whole feed is pre-staged and drained with
  *    Trigger.AvailableNow — peak drain throughput, min of
  *    SPARK_GRAFT_STREAM_REPS reps into fresh sink+checkpoint dirs.
  *  - `paced`: the feed dir starts EMPTY and a feeder thread lands files on
  *    a fixed cadence while the query runs on a ProcessingTime trigger —
  *    steady-state ingest. Reported: per-micro-batch wall-time percentiles
  *    (p50/p95 from the _metrics sidecar's INDEPENDENT wall_nanos
  *    measurements), end-to-end run seconds, and sustained triples/sec.
  *  - `recanon`: drain raw (no snapshot), then time the retroactive
  *    compaction of the whole materialized history under the fresh
  *    canonical map — worst-case (every batch stale) rewrite throughput
  *    plus the no-op fast-path detection time.
  *
  * Protocol (same noise discipline as graft.Bench):
  *  - the batch flagship runs ONCE untimed first, over the SAME staged feed
  *    the stream drains — it is simultaneously the JVM/codegen warm-up and
  *    the equivalence oracle (the streamed sink's content fingerprint —
  *    row count AND mod-2^64 xxhash64 sum — must equal the batch
  *    flagship's exactly, `require`d on every rep);
  *  - the canonical alias snapshot is built batch-side FROM THE SAME FEED
  *    and broadcast, and is NOT part of the timed drain — in the lambda
  *    split it is the periodic batch job's output, refreshed at a much
  *    coarser cadence than ingest. Its cost is reported separately as
  *    `canon_snapshot_sec`.
  *
  * Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_AMPLIFY (default
  * 40 — same corpus as the batch flagship record),
  * SPARK_GRAFT_FILES_PER_TRIGGER (default = cpus, so each micro-batch has
  * enough input splits to feed every core), SPARK_GRAFT_STREAM_FILES
  * (staged input files, default 8 triggers' worth → 8 micro-batches);
  * paced mode: SPARK_GRAFT_TICK_MS (feeder cadence, default 1000),
  * SPARK_GRAFT_FILES_PER_TICK (files landed per tick, default =
  * files-per-trigger), SPARK_GRAFT_TRIGGER_MS (ProcessingTime interval,
  * default 500).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "40").toInt
    // Micro-batch parallelism = files-per-trigger × splits-per-file: a
    // trigger smaller than the core count starves the fleet (measured:
    // local[8] BEAT local[32] at 4 files/trigger — BENCH/BASELINE.md), so
    // the default sizes each micro-batch to the session's parallelism and
    // stages 8 triggers' worth of files.
    val perTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", cpus).toInt
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", (perTrigger * 8).toString).toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "3").toInt)
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "drain")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gaz = graft.model.Gazetteer.all.toArray
    val tmp = graft.util.TempDirs.scratch("graft-stream-bench")
    val in = s"$tmp/pages"

    // Stage the amplified corpus as an nFiles-file parquet feed (untimed —
    // in production the feed already exists; staging is not ingest work).
    graft.sources.Pages.synthesizeAmplified(spark, sfDir, amplify)
      .repartition(nFiles).write.parquet(in)

    // Batch flagship over the STAGED feed itself: warm-up + the content
    // fingerprint (row count AND mod-2^64 sum of per-row xxhash64) the
    // stream must reproduce exactly — count equality alone masks
    // same-cardinality content drift at a scale where the grouped-multiset
    // spec compare is unaffordable. The alias snapshot comes from the same
    // feed too: amplified copies derive new doc ids, which shifts the plant
    // arithmetic, so per-surface mention counts (the canonical ranking's
    // tiebreaker) differ from the unamplified corpus — a snapshot built
    // elsewhere is a DIFFERENT periodic-batch output, and the round-4
    // fingerprint upgrade caught exactly that mismatch riding the old
    // count-only check.
    import spark.implicits._
    val pagesPq = spark.read.parquet(in).as[graft.model.Page]
    val ms = graft.mentions.Mentions
      .scanWithRecall(graft.extract.Extract.segments(pagesPq), gaz).cache()
    // Materialize the mention cache UNTIMED before the canon timer starts:
    // cache() is lazy, so without this the first action inside the timed
    // region would charge the whole amplified-corpus scan to the 'periodic
    // batch job' metric.
    ms.count()
    val t0c = System.nanoTime()
    val canonDf = graft.canon.Canon.canonicalMap(ms)
    val canon = graft.canon.Canon.snapshot(canonDf)
    val canonSec = (System.nanoTime() - t0c) / 1e9
    val (nTriples, batchSum) = graft.pipeline.Pipeline.tripleChecksum(
      graft.relations.Relations.cooccurrence(ms)
        .unionByName(graft.relations.Relations.mentionedIn(ms, canonDf)).toDF())
    // Recanon mode materializes the alias table WHILE the mention cache is
    // live (untimed — the production compact reads the periodic batch
    // job's written alias parquet); writing it after unpersist would
    // re-run the whole amplified-corpus scan + canonicalization.
    val aliasPath = s"$tmp/alias"
    if (mode == "recanon")
      canonDf.write.mode("overwrite").parquet(aliasPath)
    ms.unpersist()

    val json = mode match {
      case "paced" =>
        runPaced(spark, tmp.toString, in, gaz, canon, nTriples, batchSum,
          perTrigger, nFiles, amplify, cpus, canonSec, sfDir)
      case "recanon" =>
        runRecanon(spark, tmp.toString, in, gaz, aliasPath, nTriples, batchSum,
          perTrigger, nFiles, amplify, cpus, canonSec, sfDir)
      case _ =>
        runDrain(spark, tmp.toString, in, gaz, canon, nTriples, batchSum,
          perTrigger, nFiles, amplify, cpus, canonSec, sfDir, reps)
    }
    println(json)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"BENCH/stream_${mode}_last.json"), json + "\n")
    } catch { case _: java.io.IOException => () }
    graft.pipeline.Pipeline.evict(spark, sfDir)
    spark.stop()
  }

  private def runDrain(spark: SparkSession, tmp: String, in: String,
      gaz: Array[(String, String)], canon: Map[String, String],
      nTriples: Long, batchSum: Long, perTrigger: Int, nFiles: Int,
      amplify: Int, cpus: String, canonSec: Double, sfDir: String,
      reps: Int): String = {
    val repTimes = (1 to reps).map { r =>
      val out = s"$tmp/sink$r"; val ckpt = s"$tmp/ckpt$r"
      val t0 = System.nanoTime()
      graft.streaming.Streaming.runTriplesStreamOnce(
        spark, in, out, ckpt, gaz, canon, maxFilesPerTrigger = perTrigger)
      val sec = (System.nanoTime() - t0) / 1e9
      val (streamed, streamSum) =
        graft.pipeline.Pipeline.tripleChecksum(spark.read.parquet(out))
      require(streamed == nTriples && streamSum == batchSum,
        s"stream sink fingerprint ($streamed, $streamSum) != batch flagship " +
          s"($nTriples, $batchSum)")
      sec
    }
    val drainSec = repTimes.min
    val medianSec = repTimes.sorted.apply(repTimes.length / 2)
    val microBatches = math.ceil(nFiles.toDouble / perTrigger).toInt
    val repsJson = repTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    s"""{"metric":"stream_triples_per_sec","value":${(nTriples / drainSec).toLong},"unit":"triples/sec","drain_sec":${f"$drainSec%.3f"},"drain_median_sec":${f"$medianSec%.3f"},"drain_reps":$repsJson,"noise_check":${f"${drainSec / medianSec}%.3f"},"n_triples":$nTriples,"micro_batches":$microBatches,"files":$nFiles,"files_per_trigger":$perTrigger,"amplify":$amplify,"cpus":$cpus,"canon_snapshot_sec":${f"$canonSec%.3f"},"sf":"$sfDir"}"""
  }

  /** Compaction-at-scale run: drain the feed RAW (no alias snapshot — the
    * day-one shape before any periodic batch canon run exists, provenance
    * subjects still surface forms), then time [[graft.streaming.Recanon
    * .recanonicalize]] rewriting the whole materialized history under the
    * fresh map (worst case: every batch is stale), plus the no-op fast
    * path a second compaction must take. The compacted sink's content
    * fingerprint must equal the batch flagship's — the same lambda-cycle
    * equality q_stream_recanon gates at sf0.01.
    */
  private def runRecanon(spark: SparkSession, tmp: String, in: String,
      gaz: Array[(String, String)], aliasPath: String,
      nTriples: Long, batchSum: Long, perTrigger: Int, nFiles: Int,
      amplify: Int, cpus: String, canonSec: Double, sfDir: String): String = {
    val out = s"$tmp/sink_raw"; val ckpt = s"$tmp/ckpt_raw"
    // The alias table was materialized by main while the mention cache was
    // live: the production compact reads the periodic batch job's WRITTEN
    // alias parquet (Submit's --canon-out → compact --canon flow).
    val aliasTable = spark.read.parquet(aliasPath)
    val t0d = System.nanoTime()
    graft.streaming.Streaming.runTriplesStreamMaterialized(spark, in, out,
      ckpt, gaz, graft.canon.Canon.AliasNone, perTrigger, 16)
    val drainSec = (System.nanoTime() - t0d) / 1e9
    val t0 = System.nanoTime()
    val report = graft.streaming.Recanon.recanonicalize(spark, out, aliasTable)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val (n, sum) = graft.pipeline.Pipeline.tripleChecksum(
      spark.read.parquet(s"$out/triples")
        .select("subj", "pred", "obj", "url", "score"))
    require(n == nTriples && sum == batchSum,
      s"compacted sink fingerprint ($n, $sum) != batch flagship ($nTriples, $batchSum)")
    val t1 = System.nanoTime()
    val noop = graft.streaming.Recanon.recanonicalize(spark, out, aliasTable)
    val noopSec = (System.nanoTime() - t1) / 1e9
    require(noop.batchesRewritten.isEmpty,
      s"second compaction under the same map rewrote ${noop.batchesRewritten.size} batches")
    val microBatches = math.ceil(nFiles.toDouble / perTrigger).toInt
    s"""{"metric":"recanon_rows_per_sec","value":${(report.rowsAfter / compactSec).toLong},"unit":"rows/sec","compact_sec":${f"$compactSec%.3f"},"noop_detect_sec":${f"$noopSec%.3f"},"batches_rewritten":${report.batchesRewritten.size},"rows_before":${report.rowsBefore},"rows_after":${report.rowsAfter},"raw_drain_sec":${f"$drainSec%.3f"},"n_triples":$nTriples,"micro_batches":$microBatches,"files":$nFiles,"files_per_trigger":$perTrigger,"amplify":$amplify,"cpus":$cpus,"canon_snapshot_sec":${f"$canonSec%.3f"},"sf":"$sfDir"}"""
  }

  /** Feeder-paced steady-state run: files land in an initially-empty feed
    * dir on a fixed cadence while the query runs on a ProcessingTime
    * trigger; the run ends when every staged page has been committed
    * (tracked via StreamingQueryListener numInputRows — the source-side
    * count, independent of the sink's own metrics). Latency percentiles
    * come from the _metrics sidecar's per-batch wall_nanos.
    */
  private def runPaced(spark: SparkSession, tmp: String, staged: String,
      gaz: Array[(String, String)], canon: Map[String, String],
      nTriples: Long, batchSum: Long, perTrigger: Int, nFiles: Int,
      amplify: Int, cpus: String, canonSec: Double, sfDir: String): String = {
    import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
    val tickMs = sys.env.getOrElse("SPARK_GRAFT_TICK_MS", "1000").toLong
    val filesPerTick = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TICK",
      perTrigger.toString).toInt
    val triggerMs = sys.env.getOrElse("SPARK_GRAFT_TRIGGER_MS", "500").toLong
    val expectedPages = spark.read.parquet(staged).count()
    val parts = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val in = s"$tmp/pages_paced"; val out = s"$tmp/sink_paced"
    val ckpt = s"$tmp/ckpt_paced"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        inputRows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = graft.streaming.Streaming.startTriplesStreamMaterialized(
      spark, in, out, ckpt, gaz, canon, maxFilesPerTrigger = perTrigger,
      nBuckets = 16, trigger = Trigger.ProcessingTime(triggerMs))
    val feeder = new Thread(() => {
      parts.grouped(filesPerTick).foreach { g =>
        // Land each file ATOMICALLY (copy to a dot-prefixed temp name the
        // file source ignores, then rename): a ProcessingTime trigger can
        // list the dir mid-copy, and a plain copy would expose a truncated
        // parquet (missing footer) that kills the query.
        g.foreach { f =>
          val tmpName = java.nio.file.Paths.get(in, "." + f.getName + ".tmp")
          java.nio.file.Files.copy(f.toPath, tmpName)
          java.nio.file.Files.move(tmpName, java.nio.file.Paths.get(in, f.getName),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        Thread.sleep(tickMs)
      }
    }, "graft-feeder")
    feeder.start()
    // Drain wait: surface a dead query's exception instead of spinning on a
    // frozen counter, and bound the whole wait so a silent source stall
    // fails loudly rather than hanging the bench.
    val deadline = t0 + 600L * 1000 * 1000 * 1000
    while (inputRows.get() < expectedPages) {
      if (!q.isActive) q.awaitTermination() // rethrows the query's failure
      require(System.nanoTime() < deadline,
        s"paced drain timed out: ${inputRows.get()}/$expectedPages pages after 600s")
      Thread.sleep(50L)
    }
    val runSec = (System.nanoTime() - t0) / 1e9
    q.stop(); q.awaitTermination(); feeder.join()
    spark.streams.removeListener(listener)

    val (streamed, streamSum) = graft.pipeline.Pipeline.tripleChecksum(
      spark.read.parquet(s"$out/triples")
        .select("subj", "pred", "obj", "url", "score"))
    require(streamed == nTriples && streamSum == batchSum,
      s"paced sink fingerprint ($streamed, $streamSum) != batch flagship " +
        s"($nTriples, $batchSum)")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Percentiles over INGEST batches only: recanon/repair also write
    // _metrics rows, but theirs stamp nanos=0 (no per-batch wall time
    // exists for a one-job rewrite) and must not dilute the latency read.
    val wallMs = spark.read.parquet(s"$out/_metrics/*")
      .filter(col("rows_out") > 0L && col("stage") === "stream_ingest")
      .select((col("nanos") / 1e6).as("ms")).as[Double].collect().sorted
    def pct(p: Double): Double =
      if (wallMs.isEmpty) 0.0
      else wallMs(math.min(wallMs.length - 1, (p * wallMs.length).toInt))
    val ticks = math.ceil(parts.length.toDouble / filesPerTick).toInt
    s"""{"metric":"stream_paced_batch_latency","unit":"ms","batch_wall_p50_ms":${f"${pct(0.5)}%.1f"},"batch_wall_p95_ms":${f"${pct(0.95)}%.1f"},"n_batches":${wallMs.length},"run_sec":${f"$runSec%.3f"},"triples_per_sec":${(nTriples / runSec).toLong},"n_triples":$nTriples,"pages":$expectedPages,"files":${parts.length},"files_per_tick":$filesPerTick,"tick_ms":$tickMs,"ticks":$ticks,"trigger_ms":$triggerMs,"files_per_trigger":$perTrigger,"amplify":$amplify,"cpus":$cpus,"canon_snapshot_sec":${f"$canonSec%.3f"},"sf":"$sfDir"}"""
  }
}
