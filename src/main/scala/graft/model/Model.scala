package graft.model

/** Core row types of the KG-construction engine.
  *
  * Modeled on the reference's data shapes (see /root/reference):
  *  - Page    ← BASELINE.json input_hint table (url, warc_ts, html, text, lang)
  *  - Segment ← cached layout-segment dicts consumed at
  *              src/methods/NERTransformerModel.py:93-100
  *  - Mention ← ExtractedEntity, src/data_model/ExtractedEntity.py:4-11
  *  - Entity  ← EntitiesDict/EntityInfo rollup,
  *              src/ollama_entity_extraction/data_model/EntityInfo.py:4-10
  *              (parallel arrays re-modeled as array<struct> — SURVEY.md §1.4)
  *  - Triple  ← proto-triple {cardinals, laws, context},
  *              src/create_reference_data.py:31
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

final case class Segment(
    url: String,
    page: Int,
    seg_no: Int,
    seg_type: String,
    text: String
)

final case class Token(token: String, start: Int, end: Int)

final case class Mention(
    url: String,
    page: Int,
    seg_no: Int,
    surface: String,
    label: String,
    start: Int,
    end: Int,
    score: Double
)

final case class Occurrence(
    url: String,
    page: Int,
    seg_no: Int,
    mention: String,
    start: Int,
    end: Int
)

final case class Entity(
    canonical: String,
    label: String,
    n_mentions: Long,
    n_urls: Long,
    occurrences: Seq[Occurrence]
)

final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    url: String,
    score: Double
)

final case class MetricRow(
    stage: String,
    partition_id: Int,
    rows_in: Long,
    rows_out: Long,
    nanos: Long
)

/** Per-micro-batch metrics for the streaming materialized sink. `batch_id`
  * is Long because streaming checkpoint batch ids are (a production stream
  * outlives Int). The sink passes rows through, so rows_in == rows_out by
  * definition — both are recorded from the write job's own observe() count,
  * which is INDEPENDENT of the lineage sidecar's per-bucket conditional
  * sums (a row whose bucket expression evaluates null is counted here but
  * in no bucket, so lineage/metrics drift exposes a bucket-predicate bug).
  */
final case class StreamMetricRow(
    stage: String,
    batch_id: Long,
    rows_in: Long,
    rows_out: Long,
    nanos: Long
)

/** Tuning constants preserved from the reference for P/R parity
  * (SURVEY.md §4.1 "duplicate-code constant tuning").
  */
object Config {
  /** Levenshtein-ratio similarity threshold — OllamaNERExtractor.py:124. */
  val LevRatioThreshold = 0.79
  /** Word-intersection ratio threshold — OllamaNERExtractor.py:124. */
  val WordOverlapThreshold = 0.65
  /** Fuzzy window similarity — check_fuzzy_windows_match.py:32. */
  val FuzzyWindowThreshold = 0.85
  /** Token-sequence similarity — check_token_based_match.py:22. */
  val TokenFuzzyThreshold = 0.8
  /** Embedding cosine match threshold — TransformerReferenceExtractor.py:8. */
  val CosineThreshold = 0.5
  /** GLiNER sliding window: 20 words, slide 10 — GLiNERModel.py:56-57. */
  val SlideWindow = 20
  val SlideStep = 10
  /** Similarity group cap — ollama_ner_extract_names.py:294-326. */
  val GroupCap = 15
  /** Mention context chars — OllamaNERExtractor.py:53-87 (±50). */
  val ContextChars = 50

  /** MinHash configuration for banded similarity self-joins (SURVEY §2.4 J7). */
  val MinHashK = 12
  val MinHashBands = 4
  val MinHashRows: Int = MinHashK / MinHashBands

  /** Hash family for MinHash signatures: "md5" (hex VARCHAR — exactly
    * reproducible in the DuckDB oracle, the gate default) or "xxhash64"
    * (8-byte longs — the production shuffle payload: 12 longs/row instead
    * of 12×32-byte strings). The plan shape is identical; DedupSpec asserts
    * what is structural across families (precision, recall of equal-shingle
    * plants, a recall floor) and documents that band recall NEAR the
    * threshold is family-dependent. Overridable per-JVM via
    * -Dgraft.minhash.fn=xxhash64.
    */
  def MinHashFn: String = sys.props.getOrElse("graft.minhash.fn", "md5")

  /** IVF-flat ANN (the second scale path next to SRP-LSH): K deterministic
    * hash-sampled centroids, nProbe cells searched per query. nProbe/K is
    * the candidate fraction — and the recall floor on adversarially
    * uniform vectors (AnnSpec demonstrates clustered corpora recall ≈ 1 at
    * the same fraction). Shared by Ann.ivfTopK and the DuckDB oracle twin.
    */
  val AnnIvfCentroids = 16
  val AnnIvfProbes = 6

  /** Near-dup n-gram Jaccard threshold. */
  val JaccardThreshold = 0.8

  /** Document-frequency cap for inverted-index dedup candidates: shingles in
    * more than this many docs are dropped as candidate keys (stop-phrase
    * posting lists go quadratic at corpus scale). Mirrored in the oracle.
    */
  val MaxShingleDf = 1000L

  /** SimHash near-dup Hamming radius: pairs at distance ≤ k are near-dups.
    * Mirrored in the oracle. */
  val SimHashMaxHamming = 3

  /** SimHash candidate blocks b: the 64-bit fingerprint splits into b
    * contiguous blocks, and candidates match exactly on some (b−k)-block
    * combination (pigeonhole — Dedup.simhashPairs; Manku et al. WWW'07 §3).
    * b tunes key width against key count: 6 spends C(6,3)=20 match keys of
    * ~32 bits at k=3, keeping random key collisions ~n²/2³² per combination
    * where the minimal b=k+1 (16-bit keys) collides at n²/2¹⁷ per band —
    * measured at 2M docs: ~10⁴ candidates vs 1.2×10⁸
    * (BENCH/dedup_scale.json), a 10⁴× gap that widens linearly with n.
    */
  val SimHashBlocks = 6

  /** Stop-token cap for similarity blocking: tokens shared by more than
    * this many surfaces are dropped as BLOCKING keys (candidate generation
    * only — verification still scores full word arrays). Prevents the
    * per-token block from going quadratic on shared first/last names at
    * corpus scale. Mirrored in the DuckDB oracle (Oracle.canonCtes).
    */
  val MaxTokenBlock = 1000L
}
