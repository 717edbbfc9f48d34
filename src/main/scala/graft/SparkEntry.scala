package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.canon.Canon
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.relations.Relations
import graft.similarity.Ann
import graft.streaming.Streaming
import graft.textstats.TextStats
import graft.verify.{Oracle, OracleOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a deterministic DataFrame over the sfDir parquet
  * tables; the paired `oracleSql` is DuckDB SQL over the same tables
  * (generated from shared constants in [[graft.verify.Oracle]]). Aggregate /
  * computed columns are aliased identically on both sides (driver compare
  * sorts columns by name).
  */
object SparkEntry {

  /** Flagship: full pages→triples pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001").toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- baseline relational ops over driver tables ---------------------
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // --- KG pipeline stages (pages synthesized from documents) ----------
    "q_pages" -> ((s, dir) => {
      Pipeline.pages(s, dir).toDF()
        .select(col("url"), col("lang"), length(col("text")).cast("long").as("text_len"))
    }),
    "q_mentions" -> ((s, dir) => {
      Pipeline.mentions(s, dir).toDF()
        .groupBy(col("url"), col("surface"), col("label"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_entity_rollup" -> ((s, dir) => {
      Pipeline.mentions(s, dir).toDF()
        .groupBy(col("surface"), col("label"))
        .agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("url")).as("n_urls"))
    }),
    "q_canon" -> ((s, dir) => {
      Canon.canonicalMap(Pipeline.mentions(s, dir))
    }),
    "q_triples" -> ((s, dir) => {
      Relations.cooccurrence(Pipeline.mentions(s, dir)).toDF()
        .groupBy(col("subj"), col("pred"), col("obj"), col("url"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_entity_prov" -> ((s, dir) => {
      val ms = Pipeline.mentions(s, dir)
      Relations.mentionedIn(ms, Canon.canonicalMap(ms)).toDF()
        .select(col("subj"), col("pred"), col("obj"), col("url"))
    }),

    // --- dedup suite (documents ∪ planted dups) --------------------------
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(Dedup.corpus(s, dir))),
    "q_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccard(Dedup.corpus(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(Dedup.corpus(s, dir))),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhash(Dedup.corpus(s, dir))),
    "q_dedup_embed" -> ((s, dir) => Dedup.embeddingNearDup(s, dir)),

    // --- similarity search ----------------------------------------------
    "q_ann_topk" -> ((s, dir) => Ann.bruteTopK(Ann.embeddings(s, dir))),

    // --- text analysis ---------------------------------------------------
    "q_langid" -> ((s, dir) => TextStats.langId(TextStats.documents(s, dir))),
    "q_quality" -> ((s, dir) => TextStats.quality(TextStats.documents(s, dir))),
    "q_token_count" -> ((s, dir) => TextStats.tokenCounts(TextStats.documents(s, dir))),
    "q_fingerprint" -> ((s, dir) => TextStats.fingerprints(TextStats.documents(s, dir))),

    // --- multimodal metadata (binary column + stub decode) ---------------
    "q_media_meta" -> ((s, dir) => Multimodal.decode(Multimodal.media(s, dir)).toDF()),

    // --- events: windowed agg + sessionization ---------------------------
    "q_events_window" -> ((s, dir) =>
      Streaming.windowedAggBatch(s.read.parquet(s"$dir/events.parquet"))),
    "q_sessions" -> ((s, dir) =>
      Streaming.sessionizeBatch(s.read.parquet(s"$dir/events.parquet")))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "count(*) AS n_rows FROM lineitem GROUP BY 1, 2"),
    "q_pages" -> Oracle.qPages,
    "q_mentions" -> Oracle.qMentions,
    "q_entity_rollup" -> Oracle.qEntityRollup,
    "q_canon" -> Oracle.qCanon,
    "q_triples" -> Oracle.qTriples,
    "q_entity_prov" -> Oracle.qEntityProv,
    "q_dedup_exact" -> OracleOps.qDedupExact,
    "q_dedup_ngram" -> OracleOps.qDedupNgram,
    "q_dedup_minhash" -> OracleOps.qDedupMinhash,
    "q_dedup_simhash" -> OracleOps.qDedupSimhash,
    "q_dedup_embed" -> OracleOps.qDedupEmbed,
    "q_ann_topk" -> OracleOps.qAnnTopk,
    "q_langid" -> OracleOps.qLangid,
    "q_quality" -> OracleOps.qQuality,
    "q_token_count" -> OracleOps.qTokenCount,
    "q_fingerprint" -> OracleOps.qFingerprint,
    "q_media_meta" -> OracleOps.qMediaMeta,
    "q_events_window" -> OracleOps.qEventsWindow,
    "q_sessions" -> OracleOps.qSessions
  )
}
