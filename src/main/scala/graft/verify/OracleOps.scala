package graft.verify

import graft.model.Config
import graft.textstats.TextStats

/** DuckDB oracle SQL for the training-data-pipeline operators (dedup, ANN,
  * text stats, multimodal metadata, events windows/sessions). Same
  * single-source-of-truth rule as [[Oracle]]: thresholds, marker lists, and
  * planted-variant arithmetic come from the engine's own constants.
  */
object OracleOps {

  /** Normalized documents + dedup corpus (base ∪ near-dup truncations ∪
    * exact copies) — mirror of graft.dedup.Dedup.corpus.
    */
  val corpusCtes: String =
    """
    norm AS (SELECT doc_id, lang, source, regexp_replace(trim(text), '\s+', ' ', 'g') AS text FROM documents),
    corpus AS (
      SELECT doc_id, text FROM norm
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, (length(text)*9)//10) FROM norm WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000, text FROM norm WHERE doc_id % 7 = 0
    )"""

  val shingleCtes: String =
    s"""
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    idx AS (SELECT doc_id, w, unnest(range(1, len(w) - ${Dedup5 - 2})) AS i
            FROM words WHERE len(w) >= $Dedup5),
    sh AS (SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
           FROM idx),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (SELECT ta.doc_id AS a, tb.doc_id AS b, COUNT(*) AS inter
               FROM sh ta JOIN sh tb ON ta.s = tb.s AND ta.doc_id < tb.doc_id
               GROUP BY ta.doc_id, tb.doc_id)"""

  private def Dedup5 = graft.dedup.Dedup.ShingleN

  val qDedupExact: String =
    s"""WITH $corpusCtes
    SELECT md5(text) AS h, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
    FROM corpus GROUP BY md5(text)"""

  val qDedupNgram: String =
    s"""WITH $corpusCtes, $shingleCtes,
    -- informative-shingle universe (df <= Config.MaxShingleDf), mirroring
    -- graft.dedup.Dedup.informativeShingles
    sh2 AS (SELECT * FROM sh WHERE s IN
      (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= ${Config.MaxShingleDf})),
    sizes2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    shared2 AS (SELECT ta.doc_id AS a, tb.doc_id AS b, COUNT(*) AS inter
                FROM sh2 ta JOIN sh2 tb ON ta.s = tb.s AND ta.doc_id < tb.doc_id
                GROUP BY ta.doc_id, tb.doc_id)
    SELECT s.a, s.b, s.inter, sa.n AS na, sb.n AS nb
    FROM shared2 s JOIN sizes2 sa ON sa.doc_id = s.a JOIN sizes2 sb ON sb.doc_id = s.b
    WHERE CAST(s.inter AS DOUBLE) / (sa.n + sb.n - s.inter) >= ${Config.JaccardThreshold}"""

  val qDedupMinhash: String = {
    val k = Config.MinHashK
    val r = Config.MinHashRows
    val sigCols = (0 until k).map(i => s"MIN(CASE WHEN sd = $i THEN h END) AS h$i").mkString(", ")
    val bandSelects = (0 until Config.MinHashBands).map { b =>
      val key = (0 until r).map(i => s"h${b * r + i}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $corpusCtes, $shingleCtes,
    seeds AS (SELECT unnest([${(0 until k).mkString(",")}]) AS sd),
    mh AS (SELECT doc_id, sd, MIN(md5(CAST(sd AS VARCHAR) || ':' || s)) AS h
           FROM sh, seeds GROUP BY doc_id, sd),
    sig AS (SELECT doc_id, $sigCols FROM mh GROUP BY doc_id),
    bands AS ($bandSelects),
    cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
    SELECT s.a, s.b, s.inter, sa.n AS na, sb.n AS nb
    FROM shared s JOIN cand c ON c.a = s.a AND c.b = s.b
    JOIN sizes sa ON sa.doc_id = s.a JOIN sizes sb ON sb.doc_id = s.b
    WHERE CAST(s.inter AS DOUBLE) / (sa.n + sb.n - s.inter) >= ${Config.JaccardThreshold}"""
  }

  /** Mirror of graft.dedup.Dedup.simhash: ends in a `sim(doc_id, simhash)`
    * CTE (64-char bit string per doc).
    */
  val simhashCtes: String =
    """
    toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus),
    th AS (SELECT doc_id, md5(t) AS h FROM toks),
    bits AS (SELECT doc_id, g.b,
               CASE WHEN SUM(2 * (((strpos('0123456789abcdef', substr(h, (g.b // 4) + 1, 1)) - 1)
                                   >> (3 - g.b % 4)) & 1) - 1) > 0 THEN '1' ELSE '0' END AS ob
             FROM th, generate_series(0, 63) g(b) GROUP BY doc_id, g.b),
    sim AS (SELECT doc_id, string_agg(ob, '' ORDER BY b) AS simhash FROM bits GROUP BY doc_id)"""

  val qDedupSimhash: String =
    s"""WITH $corpusCtes, $simhashCtes
    SELECT doc_id, simhash FROM sim"""

  /** Brute-force Hamming ≤ k all-pairs — the exactness oracle for the
    * banded join (pigeonhole makes banded ≡ brute, see Dedup.simhashPairs).
    */
  val qDedupSimhashPairs: String =
    s"""WITH $corpusCtes, $simhashCtes
    SELECT a.doc_id AS a, b.doc_id AS b,
      CAST(bit_count(xor(CAST(a.simhash AS BIT), CAST(b.simhash AS BIT))) AS BIGINT) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(CAST(a.simhash AS BIT), CAST(b.simhash AS BIT))) <= ${Config.SimHashMaxHamming}"""

  val embCtes: String =
    """
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    emb AS (SELECT vec_id, v FROM base
            UNION ALL
            SELECT vec_id + 1000000, list_prepend(v[1] + 0.01, v[2:]) FROM base WHERE vec_id % 10 = 0)"""

  val qDedupEmbed: String =
    s"""WITH $embCtes
    SELECT a.vec_id AS a, b.vec_id AS b
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.v, b.v) /
          sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)) >= 0.99"""

  val qAnnTopk: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 10),
    scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                 list_inner_product(q.vq, e.v) /
                 sqrt(list_inner_product(q.vq, q.vq) * list_inner_product(e.v, e.v)) AS cos
               FROM q JOIN e ON e.vec_id <> q.query_id),
    ranked AS (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id FROM ranked WHERE rn <= 5"""

  /** IVF-flat ANN twin — replays Ann.ivfTopK exactly: unit vectors with the
    * identical normalization arithmetic, centroids = the K corpus vectors
    * with smallest md5(vec_id) indexed in hash order, nearest-cell
    * assignment (ties → lower cid), nProbe nearest cells per query, exact
    * cosine re-rank of the probed candidates.
    */
  val qAnnIvf: String = {
    val k = Config.AnnIvfCentroids
    val p = Config.AnnIvfProbes
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    u AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nv FROM e),
    ranked_c AS (SELECT vec_id, nv, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid FROM u),
    cents AS (SELECT cid, nv AS cv FROM ranked_c WHERE cid < $k),
    ac AS (SELECT u.vec_id, c.cid, list_inner_product(u.nv, c.cv) AS cos FROM u CROSS JOIN cents c),
    assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM ac) WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM ac WHERE vec_id < 10) WHERE rn <= $p),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id FROM probes p JOIN assign a USING (cid)
             WHERE a.vec_id <> p.query_id),
    scored AS (SELECT c.query_id, c.neighbor_id, list_inner_product(q.nv, n.nv) AS cos
               FROM cand c JOIN u q ON q.vec_id = c.query_id JOIN u n ON n.vec_id = c.neighbor_id),
    ranked AS (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
    SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id FROM ranked WHERE rn <= 5"""
  }

  val qLangid: String = {
    val markerValues = TextStats.markers
      .map { case (l, m) => s"('$l', '$m')" }.mkString(", ")
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS text FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM norm),
    m(mlang, marker) AS (VALUES $markerValues),
    hits AS (SELECT doc_id, mlang, COUNT(*) AS hits FROM toks JOIN m ON t = marker GROUP BY doc_id, mlang),
    best AS (SELECT doc_id, mlang, hits,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, mlang) AS rn FROM hits)
    SELECT n.doc_id, COALESCE(b.mlang, 'unknown') AS pred_lang, COALESCE(b.hits, 0) AS hits
    FROM norm n LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = n.doc_id"""
  }

  val qQuality: String = {
    val stopList = TextStats.stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS text FROM documents)
    SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_filter(string_split(lower(text), ' '), t -> list_contains([$stopList], t))) AS BIGINT) AS n_stop,
      CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS max_token_len
    FROM norm"""
  }

  val qTokenCount: String =
    """WITH norm AS (SELECT doc_id, source, regexp_replace(trim(text), '\s+', ' ', 'g') AS text FROM documents)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      CAST(SUM(len(regexp_extract_all(text, '\w+'))) AS BIGINT) AS re_tokens
    FROM norm GROUP BY source"""

  val qFingerprint: String =
    """WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS text FROM documents)
    SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM norm"""

  /** Mirror of the planted container-header arithmetic in
    * graft.multimodal.MediaCodec: the Spark side writes REAL PNG/WAV/GIF
    * bytes with these dimensions and re-reads them from the container
    * headers, so a hash match here verifies the encode→parse round trip.
    * For audio, width = sample rate (8000) and height = channels (1).
    */
  val qMediaMeta: String =
    """SELECT d.doc_id,
      CASE WHEN d.doc_id % 3 = 0 THEN 'image' WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      CAST(CASE WHEN d.doc_id % 3 = 1 THEN 8000 ELSE d.doc_id % 95 + 16 END AS BIGINT) AS width,
      CAST(CASE WHEN d.doc_id % 3 = 1 THEN 1 ELSE (d.doc_id * 7) % 61 + 16 END AS BIGINT) AS height,
      CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1
                WHEN d.doc_id % 3 = 1 THEN d.doc_id % 480 + 32
                ELSE d.doc_id % 12 + 2 END AS BIGINT) AS frames
    FROM documents d"""

  /** Every-7th-frame sample over video rows only. The Spark side reads the
    * frame count from the parsed GIF header; the oracle regenerates it from
    * the planted arithmetic (frames = doc_id % 12 + 2, so the inclusive
    * stop is doc_id % 12 + 1 on both sides).
    */
  val qMediaFrames: String =
    """SELECT d.doc_id,
      unnest(generate_series(0, CAST(d.doc_id % 12 + 1 AS BIGINT), 7)) AS frame_no
    FROM documents d WHERE d.doc_id % 3 = 2"""

  val qEventsWindow: String =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_ts, event_type,
      COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2"""

  val qSessions: String =
    s"""WITH x AS (SELECT user_id, event_id, epoch_ms(ts) AS t,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events)
    SELECT user_id, COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN prev IS NULL OR t - prev > ${graft.streaming.Streaming.SessionGapMs} THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM x GROUP BY user_id"""
}
