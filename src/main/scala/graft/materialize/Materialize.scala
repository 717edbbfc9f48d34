package graft.materialize

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator
import graft.model.{MetricRow, Triple}

/** Materialization + checkpoint/resume + per-partition lineage & metrics —
  * the engine's sink layer (north_rule: "materialized as partitioned tables
  * with per-partition lineage and metric rows for checkpoint resume").
  *
  * Mirrors the reference's only incremental behavior — the skip-if-cached
  * scan (src/cache_data.py:13-21) — at table granularity: work is split into
  * deterministic url-hash buckets; each completed bucket appends a lineage
  * row; a resumed run anti-joins pending buckets against the lineage table
  * and recomputes only the missing ones.
  *
  * Sandbox note (SURVEY §7.4): no Iceberg jar ships in this container, so the
  * "table" is bucket-partitioned Parquet + a lineage sidecar table giving the
  * snapshot-style semantics; the write path is narrow enough that real
  * Iceberg `append` drops in outside the sandbox.
  */
object Materialize {

  /** batch_id widened Int → Long in round 4 (streaming checkpoint batch ids
    * are Long): a lineage sidecar written by a pre-widening binary holds
    * INT32 batch_id files; [[migrateLineage]] performs the one-time rewrite,
    * and [[readLineage]] runs it automatically (once per JVM per sidecar)
    * before any read or append can hit the mixed-schema dir. */
  final case class LineageRow(table: String, bucket: Int, batch_id: Long, n_rows: Long)

  // Sidecar dirs already footer-checked (and migrated if needed) this JVM —
  // the check is driver-side parquet-footer reads, cheap for a
  // dimension-sized sidecar but pointless to repeat on every resume lookup.
  private val lineageVerified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def lineagePartFiles(outDir: String): Seq[java.nio.file.Path] = {
    val dir = java.nio.file.Paths.get(lineagePath(outDir))
    if (!java.nio.file.Files.exists(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(dir)
      try ls.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList
      finally ls.close()
    }
  }

  /** Flat-sidecar part files whose footer carries the pre-widening INT32
    * batch_id. Driver-side footer reads only — zero Spark jobs. (The
    * streaming sink's per-batch sidecar dirs postdate the widening and are
    * batch-scoped OVERWRITE, so only this flat append-mode layout can mix
    * schemas.) */
  private def int32LineageFiles(outDir: String): Seq[java.nio.file.Path] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val conf = new org.apache.hadoop.conf.Configuration()
    lineagePartFiles(outDir).filter { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        schema.containsField("batch_id") && {
          val t = schema.getType(schema.getFieldIndex("batch_id"))
          t.isPrimitive &&
            t.asPrimitiveType().getPrimitiveTypeName == PrimitiveTypeName.INT32
        }
      } finally r.close()
    }
  }

  /** One-time migration of a pre-round-4 lineage sidecar: rewrites every
    * part file with batch_id widened INT32 → INT64 so the dir reads under
    * one schema again. No-op (returns false) when the sidecar is absent or
    * already uniformly Long. Each part file is read under its OWN footer
    * schema (a dir-level read of the mixed dir is exactly what fails), so
    * old and new files coexist safely during the rewrite. The swap keeps a
    * full backup until the new dir is live: live → `_lineage.pre_migration`,
    * rewritten → live, backup deleted — a crash mid-swap leaves either the
    * original or the migrated dir complete, never a torn one.
    */
  def migrateLineage(spark: SparkSession, outDir: String): Boolean = {
    recoverLineageSwap(outDir)
    if (int32LineageFiles(outDir).isEmpty) return false
    val widened = lineagePartFiles(outDir)
      .map(p => spark.read.parquet(p.toString)
        .withColumn("batch_id", col("batch_id").cast("long"))
        .select(col("table"), col("bucket"), col("batch_id"), col("n_rows")))
      .reduce(_.unionByName(_))
    val live = java.nio.file.Paths.get(lineagePath(outDir))
    val staged = java.nio.file.Paths.get(lineagePath(outDir) + ".migrated")
    val backup = java.nio.file.Paths.get(lineagePath(outDir) + ".pre_migration")
    graft.util.TempDirs.delete(staged)
    widened.write.mode("overwrite").parquet(staged.toString)
    graft.util.TempDirs.delete(backup)
    java.nio.file.Files.move(live, backup)
    java.nio.file.Files.move(staged, live)
    graft.util.TempDirs.delete(backup)
    true
  }

  /** Heal an interrupted [[migrateLineage]] swap so no crash window leaves
    * the sink without a live `_lineage` dir (an absent sidecar reads as
    * "nothing done" and a resume would re-append every completed bucket).
    * The swap's invariant makes recovery unambiguous: `live` is only moved
    * aside AFTER `.migrated` is fully written, so live-absent ⇒ the staged
    * dir is complete — promote it; the `.pre_migration` backup is the
    * fallback if the staged dir is somehow gone too. With `live` present,
    * leftovers are just debris from a completed (or abandoned-before-move)
    * attempt and are deleted so the next attempt starts clean.
    */
  private def recoverLineageSwap(outDir: String): Unit = {
    val live = java.nio.file.Paths.get(lineagePath(outDir))
    val staged = java.nio.file.Paths.get(lineagePath(outDir) + ".migrated")
    val backup = java.nio.file.Paths.get(lineagePath(outDir) + ".pre_migration")
    if (!java.nio.file.Files.exists(live)) {
      if (java.nio.file.Files.exists(staged)) {
        java.nio.file.Files.move(staged, live)
        graft.util.TempDirs.delete(backup)
      } else if (java.nio.file.Files.exists(backup)) {
        java.nio.file.Files.move(backup, live)
      }
    } else {
      graft.util.TempDirs.delete(staged)
      graft.util.TempDirs.delete(backup)
    }
  }

  /** Deterministic bucket of a page url. In the sandbox corpus the doc id is
    * embedded in the url path, so bucketing is reproducible in the DuckDB
    * oracle; a production deployment swaps this for
    * `pmod(xxhash64(url), nBuckets)` — same plan shape, hash-only change.
    */
  def bucketCol(nBuckets: Int): org.apache.spark.sql.Column =
    pmod(regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"), lit(nBuckets)).cast("int")

  /** The production bucket scheme [[bucketCol]]'s doc promises: url-hash
    * buckets that hold for ARBITRARY urls (the doc-id regexp yields a null
    * bucket on any url without the sandbox's `/doc/N` suffix, which would
    * leak rows into a default partition the lineage sums never see).
    * xxhash64 is a Catalyst codegen'd expression and pmod handles its
    * negative half — same plan shape as [[bucketCol]], hash-only change.
    * [[graft.Submit]] defaults to this scheme; the oracle/driver surfaces
    * keep the doc-id scheme because the DuckDB twin must reproduce it.
    */
  def hashBucketCol(nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("url")), lit(nBuckets.toLong)).cast("int")

  def lineagePath(outDir: String) = s"$outDir/_lineage"

  def readLineage(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(lineagePath(outDir))
    // A missing dir may be an interrupted migration swap, not a fresh sink —
    // heal BEFORE the exists check, or a resume sees "nothing done" and
    // re-appends every completed bucket.
    if (!java.nio.file.Files.exists(p)) recoverLineageSwap(outDir)
    if (java.nio.file.Files.exists(p)) {
      // Resuming a pre-widening sink: widen any INT32 batch_id files ONCE
      // before this dir is read (or appended to) under the Long schema.
      // Marked verified only AFTER the migration succeeds: a transient
      // failure must be retried on the next read, not skipped for the
      // rest of the JVM with the dir still mixed-schema.
      if (!lineageVerified.contains(lineagePath(outDir))) {
        migrateLineage(spark, outDir)
        lineageVerified.add(lineagePath(outDir))
      }
      spark.read.parquet(lineagePath(outDir))
    } else spark.emptyDataset[LineageRow].toDF()
  }

  /** Buckets already completed for `table` (the checkpoint state). */
  def doneBuckets(spark: SparkSession, outDir: String, table: String): Set[Int] = {
    import spark.implicits._
    readLineage(spark, outDir).filter(col("table") === table)
      .select(col("bucket")).as[Int].collect().toSet
  }

  /** Materialize `triples` into `outDir/<table>` partitioned by bucket,
    * skipping buckets recorded in the lineage table (resume semantics).
    * Returns the per-bucket row counts written this invocation.
    *
    * Scale shape: ONE job writes all pending buckets (partitionBy on the
    * bucket column — no per-bucket driver loop, which at 10^12 docs would be
    * thousands of sequential jobs); the bucket column is derived, so the
    * write is narrow on top of the triple pipeline. Row counts per bucket
    * come from `observe`-style aggregation of the written data, one extra
    * columnar count over the (already shuffled) output.
    */
  /** The nBuckets conditional-sum aggregate columns that ride a write job
    * via observe() — shared by the batch and streaming sinks so the bucket
    * accounting cannot diverge between them. */
  def bucketAggs(nBuckets: Int): Seq[org.apache.spark.sql.Column] =
    (0 until nBuckets).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"b$b"))

  /** Non-zero (bucket, count) pairs from an Observation over [[bucketAggs]]
    * (null sums = empty write; zeros = nothing landed in that bucket). */
  def bucketCounts(observed: Map[String, Any], nBuckets: Int): Seq[(Int, Long)] =
    (0 until nBuckets).flatMap { b =>
      observed.get(s"b$b") match {
        case Some(n: Long) if n > 0 => Some(b -> n)
        case _ => None
      }
    }

  def writeTriples(triples: Dataset[Triple], outDir: String, table: String = "triples",
      nBuckets: Int = 16, batchId: Long = 0L,
      bucketOf: Int => org.apache.spark.sql.Column = bucketCol): Seq[LineageRow] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val done = doneBuckets(spark, outDir, table)
    val pending = triples.toDF()
      .withColumn("bucket", bucketOf(nBuckets))
      .filter(!col("bucket").isin(done.toSeq: _*))
    // ONE action: the per-bucket lineage counts ride the write job itself
    // via observe() (nBuckets conditional sums, map-side combinable), so the
    // pending pipeline never runs twice and the recorded counts can never
    // drift from the written rows.
    val obs = org.apache.spark.sql.Observation()
    val aggs = bucketAggs(nBuckets)
    // repartition by the partition column before the dynamic write: one file
    // per bucket instead of (tasks × buckets) small files — the standard
    // dynamic-partition-write shape (at real scale add a second key to fan
    // each bucket over several files)
    pending.observe(obs, aggs.head, aggs.tail: _*)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$outDir/$table")
    val rows = bucketCounts(obs.get, nBuckets)
      .map { case (b, n) => LineageRow(table, b, batchId, n) }
    if (rows.nonEmpty)
      // one task/file per append: a ≤nBuckets-row lineage batch otherwise
      // parallelizes one row per task (16 one-row part files per call)
      rows.toDS().toDF().coalesce(1).write.mode("append").parquet(lineagePath(outDir))
    rows
  }

  def readTriples(spark: SparkSession, outDir: String, table: String = "triples"): DataFrame =
    spark.read.parquet(s"$outDir/$table")

  /** S5 JSON entity sink — the reference's per-document entity JSON dumps
    * (src/ollama_entity_extraction/OllamaNERExtractor.py:27-37) as a
    * distributed JSON-lines table (one object per row, Spark's native json
    * sink — splittable, schema'd on read).
    */
  def writeJson(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").json(outDir)

  /** S6 sorted text sink — the reference's sorted name lists
    * (ollama_ner_extract_names.py sorted-output files). A GLOBAL sort
    * (range-partitioned exchange) then one text part per partition;
    * part files concatenate in order.
    */
  def writeSortedText(df: DataFrame, column: String, outDir: String): Unit =
    df.select(col(column).cast("string").as("value"))
      .orderBy(col("value"))
      .write.mode("overwrite").text(outDir)

  /** Per-partition metric instrumentation (SURVEY §2.5 A11): wraps a typed
    * stage boundary, counting rows and wall nanos per task into an
    * accumulator; metric rows are collected driver-side after the job and
    * appended to the metrics sidecar. Accumulators piggyback on task
    * completion — zero extra jobs, zero shuffle.
    */
  def instrumented[T](ds: Dataset[T], stage: String,
      acc: CollectionAccumulator[MetricRow]): Dataset[T] = {
    implicit val enc: org.apache.spark.sql.Encoder[T] = ds.encoder
    ds.mapPartitions { it =>
      val t0 = System.nanoTime()
      var n = 0L
      new Iterator[T] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && n >= 0) {
            acc.add(MetricRow(stage, TaskContext.getPartitionId(), n, n, System.nanoTime() - t0))
            n = -1 // emit once
          }
          h
        }
        def next(): T = { val v = it.next(); if (n >= 0) n += 1; v }
      }
    }
  }

  def newMetricsAcc(spark: SparkSession, name: String): CollectionAccumulator[MetricRow] =
    spark.sparkContext.collectionAccumulator[MetricRow](name)

  def writeMetrics(spark: SparkSession, acc: CollectionAccumulator[MetricRow],
      outDir: String): Unit = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows = acc.value.asScala.toSeq
    if (rows.nonEmpty)
      rows.toDS().toDF().coalesce(1).write.mode("append").parquet(s"$outDir/_metrics")
  }
}
