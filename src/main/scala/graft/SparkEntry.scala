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
      Pipeline.mentionsCached(s, dir).toDF()
        .groupBy(col("url"), col("surface"), col("label"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_entity_rollup" -> ((s, dir) => {
      Pipeline.mentionsCached(s, dir).toDF()
        .groupBy(col("surface"), col("label"))
        .agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("url")).as("n_urls"))
    }),
    "q_canon" -> ((s, dir) => {
      Pipeline.canonCached(s, dir)
    }),
    "q_triples" -> ((s, dir) => {
      Relations.cooccurrence(Pipeline.mentionsCached(s, dir)).toDF()
        .groupBy(col("subj"), col("pred"), col("obj"), col("url"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_pattern_triples" -> ((s, dir) => {
      Relations.patternTriples(
          Pipeline.segments(s, dir), Pipeline.mentionsCached(s, dir)).toDF()
        .groupBy(col("subj"), col("pred"), col("obj"), col("url"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_entity_prov" -> ((s, dir) => {
      val ms = Pipeline.mentionsCached(s, dir)
      Relations.mentionedIn(ms, Pipeline.canonCached(s, dir)).toDF()
        .select(col("subj"), col("pred"), col("obj"), col("url"))
    }),

    // --- canonicalization heuristics + evaluation -------------------------
    "q_canon_subset" -> ((s, dir) => {
      Canon.subsetEdges(Canon.surfaceStats(Pipeline.mentionsCached(s, dir)))
    }),
    "q_canon_minhash" -> ((s, dir) => {
      Canon.minhashEdges(Canon.surfaceStats(Pipeline.mentionsCached(s, dir)))
    }),
    "q_canon_abbrev" -> ((s, dir) => {
      import graft.model.Gazetteer
      Canon.abbrevEdges(
        Canon.surfaceDim(s, Gazetteer.persons ++ Gazetteer.abbrevPersons))
    }),
    "q_eval_pairs" -> ((s, dir) => {
      import graft.model.Gazetteer
      import s.implicits._
      val canon = Pipeline.canonCached(s, dir)
      val golden = Gazetteer.goldenAliasGroups.toDF("group_id", "surface")
      Canon.pairEval(canon, golden)
    }),
    "q_normalize" -> ((s, dir) => {
      Pipeline.mentionsCached(s, dir).toDF()
        .filter(col("label") === "PERSON").select(col("surface")).distinct()
        .select(col("surface"),
          expr("concat_ws(' ', transform(split(surface, ' '), w -> concat(upper(substring(w, 1, 1)), lower(substring(w, 2)))))").as("title_case"),
          graft.functions.expressions.simkey(col("surface")).as("folded"),
          regexp_replace(col("surface"), "[^a-zA-Z0-9 ]", "").as("depunct"),
          array_join(array_sort(split(lower(col("surface")), " ")), " ").as("word_bag"))
    }),

    // --- windows / sort / limit over driver tables ------------------------
    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, -1)).as("n_prior"))
    }),
    "q_topk_entities" -> ((s, dir) => {
      Pipeline.mentionsCached(s, dir).toDF()
        .groupBy(col("surface")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("surface"))
        .limit(10)
    }),
    "q_sentences" -> ((s, dir) => {
      Pipeline.pages(s, dir).toDF()
        .select(col("url"),
          size(split(col("text"), "(?<=[.!?])\\s+")).cast("long").as("n_sentences"))
    }),

    // --- skew: salted two-phase agg over the head-domain key --------------
    "q_domain_stats" -> ((s, dir) => {
      graft.skew.Skew.domainStats(Pipeline.pages(s, dir).toDF())
    }),

    // --- entity linking (prior + context cosine) --------------------------
    "q_linking" -> ((s, dir) => {
      graft.linking.Linking.link(Pipeline.mentionsCached(s, dir).toDF(), s, dir)
    }),

    // --- NL date parsing round-trip (P11) — all-codegen column grammar ----
    "q_dates" -> ((s, dir) => {
      import graft.functions.Dates
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          Dates.parseCol(Dates.renderCol(
            year(col("ts")), month(col("ts")), dayofmonth(col("ts")),
            pmod(col("event_id"), lit(4)).cast("int")))
            .cast("string").as("parsed_date"))
    }),

    // --- in-text date-mention scan with char offsets (search_dates form) --
    "q_date_mentions" -> ((s, dir) => {
      import graft.functions.Dates
      Dates.dateMentions(Dates.dateCorpus(s, dir))
    }),

    // --- materialize + lineage (checkpoint-resume surface) ----------------
    "q_lineage" -> ((s, dir) => {
      import graft.materialize.Materialize
      val out = java.nio.file.Files.createTempDirectory("graft-q-lineage").toString
      Materialize.writeTriples(Pipeline.triples(s, dir), out, nBuckets = 16)
      Materialize.readLineage(s, out)
        .groupBy(col("bucket")).agg(sum(col("n_rows")).as("n_rows"))
    }),

    // --- dedup suite (documents ∪ planted dups) --------------------------
    "q_dedup_exact" -> ((s, dir) => Dedup.exact(Dedup.corpus(s, dir))),
    "q_dedup_ngram" -> ((s, dir) => Dedup.ngramJaccard(Dedup.corpus(s, dir))),
    "q_dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(Dedup.corpus(s, dir))),
    "q_dedup_simhash" -> ((s, dir) => Dedup.simhash(Dedup.corpus(s, dir))),
    "q_dedup_embed" -> ((s, dir) => Dedup.embeddingNearDup(s, dir)),

    // --- similarity search ----------------------------------------------
    "q_ann_topk" -> ((s, dir) => Ann.bruteTopK(Ann.embeddings(s, dir))),
    // scale path driver-verified against the brute all-pairs DuckDB oracle:
    // banding must achieve total recall on this corpus for the hash to match
    "q_ann_lsh" -> ((s, dir) => Ann.lshPairs(Dedup.embCorpus(s, dir), minCos = 0.99)),

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
    "q_canon_subset" -> Oracle.qCanonSubset,
    "q_canon_minhash" -> Oracle.qCanonMinhash,
    "q_canon_abbrev" -> Oracle.qCanonAbbrev,
    "q_eval_pairs" -> Oracle.qEvalPairs,
    "q_normalize" -> Oracle.qNormalize,
    "q_window_running" -> Oracle.qWindowRunning,
    "q_topk_entities" -> Oracle.qTopkEntities,
    "q_sentences" -> Oracle.qSentences,
    "q_linking" -> Oracle.qLinking,
    "q_pattern_triples" -> Oracle.qPatternTriples,
    "q_dates" -> Oracle.qDates,
    "q_date_mentions" -> Oracle.qDateMentions,
    "q_domain_stats" -> Oracle.qDomainStats,
    "q_lineage" -> Oracle.qLineage,
    "q_dedup_exact" -> OracleOps.qDedupExact,
    "q_dedup_ngram" -> OracleOps.qDedupNgram,
    "q_dedup_minhash" -> OracleOps.qDedupMinhash,
    "q_dedup_simhash" -> OracleOps.qDedupSimhash,
    "q_dedup_embed" -> OracleOps.qDedupEmbed,
    "q_ann_topk" -> OracleOps.qAnnTopk,
    "q_ann_lsh" -> OracleOps.qDedupEmbed,
    "q_langid" -> OracleOps.qLangid,
    "q_quality" -> OracleOps.qQuality,
    "q_token_count" -> OracleOps.qTokenCount,
    "q_fingerprint" -> OracleOps.qFingerprint,
    "q_media_meta" -> OracleOps.qMediaMeta,
    "q_events_window" -> OracleOps.qEventsWindow,
    "q_sessions" -> OracleOps.qSessions
  )
}
