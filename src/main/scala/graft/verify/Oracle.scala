package graft.verify

import graft.model.{Config, Gazetteer}

/** DuckDB oracle SQL, generated from the same [[Gazetteer]] constants the
  * engine uses — a single source of truth so surfaces / thresholds / planting
  * arithmetic can never drift between the Spark queries and the oracle.
  *
  * The synthetic `pages` derivation (graft.sources.Pages) is pure integer &
  * string arithmetic, so the oracle re-derives expected results directly
  * from `documents` — an independent computation path (SQL over plants vs.
  * engine over generated HTML), which is what makes the comparison a real
  * end-to-end detection check.
  */
object Oracle {

  private def valuesList(xs: Seq[String]): String =
    xs.zipWithIndex.map { case (s, i) => s"($i, '${s.replace("'", "''")}')" }.mkString(", ")

  /** CASE bucketing mirroring Pages.domainOf. */
  val domainCase: String =
    "CASE WHEN (d.doc_id*48271)%1000 < 500 THEN 0 WHEN (d.doc_id*48271)%1000 < 750 THEN 1 " +
    "WHEN (d.doc_id*48271)%1000 < 875 THEN 2 WHEN (d.doc_id*48271)%1000 < 930 THEN 3 " +
    "WHEN (d.doc_id*48271)%1000 < 960 THEN 4 WHEN (d.doc_id*48271)%1000 < 975 THEN 5 " +
    "WHEN (d.doc_id*48271)%1000 < 985 THEN 6 WHEN (d.doc_id*48271)%1000 < 991 THEN 7 " +
    "WHEN (d.doc_id*48271)%1000 < 996 THEN 8 ELSE 9 END"

  val urlExpr: String =
    s"'https://site' || CAST($domainCase AS VARCHAR) || '.example.org/doc/' || CAST(d.doc_id AS VARCHAR)"

  /** Shared CTE block: plants + surface dimension tables + planted mentions
    * (pm) + per-doc url. Resolved mentions == planted mentions by corpus
    * construction (nested surfaces resolve to the longest plant — see
    * Gazetteer scaladoc).
    */
  val baseCtes: String = {
    val nP = Gazetteer.persons.length
    val nO = Gazetteer.orgs.length
    val nG = Gazetteer.gpes.length
    val nPr = Gazetteer.provisions.length
    val nL = Gazetteer.laws.length
    s"""
    docs AS (SELECT d.doc_id, $urlExpr AS url FROM documents d),
    plants AS (SELECT d.doc_id, t.j FROM documents d
               CROSS JOIN (SELECT unnest([0,1,2]) AS j) t
               WHERE t.j <= d.doc_id % 3),
    persons(idx, surface) AS (VALUES ${valuesList(Gazetteer.persons)}),
    orgs(idx, surface) AS (VALUES ${valuesList(Gazetteer.orgs)}),
    gpes(idx, surface) AS (VALUES ${valuesList(Gazetteer.gpes)}),
    provisions(idx, surface) AS (VALUES ${valuesList(Gazetteer.provisions)}),
    laws(idx, surface) AS (VALUES ${valuesList(Gazetteer.laws)}),
    pm AS (
      SELECT pl.doc_id, pl.j, p.surface, 'PERSON' AS label
        FROM plants pl JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % $nP
      UNION ALL
      SELECT pl.doc_id, pl.j, o.surface, 'ORG'
        FROM plants pl JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % $nO
      UNION ALL
      SELECT pl.doc_id, pl.j, g.surface, 'GPE'
        FROM plants pl JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % $nG
      UNION ALL
      SELECT pl.doc_id, pl.j, pr.surface, 'PROVISION'
        FROM plants pl JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % $nPr
      UNION ALL
      SELECT pl.doc_id, pl.j, l.surface, 'LAW'
        FROM plants pl JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % $nL
    )"""
  }

  /** pages projection: url, lang, text length. Text = normalized doc text +
    * planted sentences; length derivable without string search.
    */
  val qPages: String =
    s"""WITH $baseCtes,
    sent AS (
      SELECT pl.doc_id,
             length(p.surface || ' representing ' || o.surface || ' of ' || g.surface ||
                    ' cited ' || pr.surface || ' of ' || l.surface || '.') AS slen
      FROM plants pl
      JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % ${Gazetteer.persons.length}
      JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % ${Gazetteer.orgs.length}
      JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % ${Gazetteer.gpes.length}
      JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % ${Gazetteer.provisions.length}
      JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % ${Gazetteer.laws.length}
      GROUP BY pl.doc_id, pl.j, slen
    )
    SELECT dd.url, d.lang,
           CAST(length(regexp_replace(trim(d.text), '\\s+', ' ', 'g')) + s.total + s.nsent AS BIGINT) AS text_len
    FROM documents d
    JOIN docs dd ON dd.doc_id = d.doc_id
    JOIN (SELECT doc_id, SUM(slen) AS total, COUNT(*) AS nsent FROM sent GROUP BY doc_id) s
      ON s.doc_id = d.doc_id"""

  /** Skewed-key salted aggregation: per-domain page count + total text
    * length (engine side computes via two-phase salting; result must equal
    * the plain GROUP BY).
    */
  val qDomainStats: String =
    s"""WITH $baseCtes,
    sent AS (
      SELECT pl.doc_id,
             length(p.surface || ' representing ' || o.surface || ' of ' || g.surface ||
                    ' cited ' || pr.surface || ' of ' || l.surface || '.') AS slen
      FROM plants pl
      JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % ${Gazetteer.persons.length}
      JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % ${Gazetteer.orgs.length}
      JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % ${Gazetteer.gpes.length}
      JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % ${Gazetteer.provisions.length}
      JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % ${Gazetteer.laws.length}
      GROUP BY pl.doc_id, pl.j, slen
    ),
    tl AS (
      SELECT d.doc_id, CAST($domainCase AS INT) AS domain,
             length(regexp_replace(trim(d.text), '\\s+', ' ', 'g')) + s.total + s.nsent AS text_len
      FROM documents d
      JOIN (SELECT doc_id, SUM(slen) AS total, COUNT(*) AS nsent FROM sent GROUP BY doc_id) s
        ON s.doc_id = d.doc_id
    )
    SELECT domain, COUNT(*) AS n_pages, CAST(SUM(text_len) AS BIGINT) AS total_text_len
    FROM tl GROUP BY domain"""

  /** Expected resolved mentions per (url, surface, label) with counts. */
  val qMentions: String =
    s"""WITH $baseCtes
    SELECT dd.url, pm.surface, pm.label, COUNT(*) AS n
    FROM pm JOIN docs dd ON dd.doc_id = pm.doc_id
    GROUP BY dd.url, pm.surface, pm.label"""

  /** Entity rollup (A1): mention + distinct-url counts per surface. */
  val qEntityRollup: String =
    s"""WITH $baseCtes
    SELECT pm.surface, pm.label, COUNT(*) AS n_mentions,
           COUNT(DISTINCT dd.url) AS n_urls
    FROM pm JOIN docs dd ON dd.doc_id = pm.doc_id
    GROUP BY pm.surface, pm.label"""

  /** Similarity edges + recursive connected components + canonical pick —
    * the SQL mirror of graft.canon.Canon (token-block candidates, reference
    * thresholds, min-label components, row_number canonical).
    */
  val canonCtes: String =
    s"""
    stats AS (SELECT surface, COUNT(*) AS n_mentions FROM pm WHERE label='PERSON' GROUP BY surface),
    keyed AS (SELECT surface, n_mentions, lower(strip_accents(surface)) AS sim_key FROM stats),
    toks AS (SELECT DISTINCT surface, sim_key, unnest(string_split(sim_key, ' ')) AS tok FROM keyed),
    wsize AS (SELECT surface, COUNT(DISTINCT tok) AS nw FROM toks GROUP BY surface),
    -- stop-token cap (Config.MaxTokenBlock), candidate generation only —
    -- mirrors graft.canon.Canon.similarityEdges
    blocktoks AS (SELECT * FROM toks WHERE tok IN
      (SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) <= ${Config.MaxTokenBlock})),
    cand AS (SELECT DISTINCT ta.surface AS a, tb.surface AS b
             FROM blocktoks ta JOIN blocktoks tb ON ta.tok = tb.tok AND ta.surface < tb.surface),
    shared AS (SELECT ta.surface AS a, tb.surface AS b, COUNT(DISTINCT ta.tok) AS ns
               FROM toks ta JOIN toks tb ON ta.tok = tb.tok AND ta.surface < tb.surface
               GROUP BY ta.surface, tb.surface),
    edges AS (
      SELECT s.a, s.b FROM shared s
      JOIN cand c ON c.a = s.a AND c.b = s.b
      JOIN keyed ka ON ka.surface = s.a JOIN keyed kb ON kb.surface = s.b
      JOIN wsize wa ON wa.surface = s.a JOIN wsize wb ON wb.surface = s.b
      WHERE ka.sim_key = kb.sim_key
         OR 1.0 - CAST(levenshtein(ka.sim_key, kb.sim_key) AS DOUBLE) /
                  greatest(length(ka.sim_key), length(kb.sim_key)) > ${Config.LevRatioThreshold}
         OR CAST(s.ns AS DOUBLE) / greatest(wa.nw, wb.nw) >= ${Config.WordOverlapThreshold}
    ),
    sym AS (SELECT a AS src, b AS dst FROM edges UNION SELECT b, a FROM edges
            UNION SELECT surface, surface FROM keyed),
    reach(src, dst) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    comp AS (SELECT src AS surface, MIN(dst) AS component FROM reach GROUP BY src),
    ranked AS (
      SELECT k.surface, c.component,
             ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY
               length(k.surface) - length(replace(k.surface, ' ', '')) DESC,
               length(k.surface) DESC, k.n_mentions DESC, k.surface DESC) AS rn
      FROM keyed k JOIN comp c ON c.surface = k.surface
    ),
    canonmap AS (
      SELECT c.surface, r.surface AS canonical
      FROM comp c JOIN ranked r ON r.component = c.component AND r.rn = 1
    )"""

  val qCanon: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes
    SELECT surface, canonical FROM canonmap"""

  /** Co-occurrence triples from the plant arithmetic (PERSON cites LAW,
    * PERSON member_of ORG, PROVISION part_of LAW — one of each per planted
    * sentence = per segment).
    */
  val qTriples: String =
    s"""WITH $baseCtes,
    bySeg AS (SELECT pm.doc_id, pm.j, pm.label, pm.surface FROM pm)
    SELECT s.surface AS subj, r.pred, o.surface AS obj, dd.url, COUNT(*) AS n
    FROM (VALUES ('PERSON','cites','LAW'), ('PERSON','member_of','ORG'),
                 ('PROVISION','part_of','LAW')) r(sl, pred, ol)
    JOIN bySeg s ON s.label = r.sl
    JOIN bySeg o ON o.label = r.ol AND o.doc_id = s.doc_id AND o.j = s.j
    JOIN docs dd ON dd.doc_id = s.doc_id
    GROUP BY s.surface, r.pred, o.surface, dd.url"""

  /** C4 word-bag-subset edges over live PERSON surfaces. */
  val qCanonSubset: String =
    s"""WITH $baseCtes,
    keyed AS (SELECT DISTINCT surface, lower(strip_accents(surface)) AS sim_key FROM pm WHERE label='PERSON'),
    words AS (SELECT surface, list_distinct(string_split(sim_key, ' ')) AS w FROM keyed),
    toks AS (SELECT surface, unnest(w) AS tok FROM words),
    cand AS (SELECT DISTINCT ta.surface AS a, tb.surface AS b
             FROM toks ta JOIN toks tb ON ta.tok = tb.tok AND ta.surface <> tb.surface)
    SELECT DISTINCT c.a, c.b FROM cand c
    JOIN words wa ON wa.surface = c.a JOIN words wb ON wb.surface = c.b
    WHERE len(wa.w) >= 2 AND len(wb.w) > len(wa.w)
      AND len(list_filter(wa.w, x -> NOT list_contains(wb.w, x))) = 0"""

  /** C5 abbreviation edges over the static persons ∪ abbrevPersons dim. */
  val qCanonAbbrev: String = {
    val dim = (Gazetteer.persons ++ Gazetteer.abbrevPersons)
      .map(s => s"('${s.replace("'", "''")}')").mkString(", ")
    s"""WITH dim(surface) AS (VALUES $dim),
    keyed AS (SELECT surface, lower(strip_accents(surface)) AS sim_key FROM dim),
    words AS (SELECT surface, list_distinct(string_split(sim_key, ' ')) AS w FROM keyed),
    parts AS (SELECT surface, list_transform(w, x -> regexp_replace(x, '[^a-z0-9]', '', 'g')) AS cw FROM words),
    split3 AS (SELECT surface, cw,
                 list_filter(cw, x -> length(x) = 1) AS initials,
                 list_filter(cw, x -> length(x) > 1) AS fulls FROM parts),
    l AS (SELECT surface AS a, initials, fulls FROM split3 WHERE len(initials) >= 1 AND len(fulls) >= 1),
    r AS (SELECT surface AS b, cw AS wb FROM split3 WHERE len(initials) = 0),
    lt AS (SELECT a, initials, fulls, unnest(fulls) AS tok FROM l),
    rt AS (SELECT b, wb, unnest(wb) AS tok FROM r),
    cand AS (SELECT DISTINCT lt.a, lt.initials, lt.fulls, rt.b, rt.wb FROM lt JOIN rt ON lt.tok = rt.tok)
    SELECT DISTINCT a, b FROM cand
    WHERE len(list_filter(fulls, x -> NOT list_contains(wb, x))) = 0
      AND len(list_filter(initials, i ->
            len(list_filter(list_filter(wb, x -> NOT list_contains(fulls, x)),
                            w -> starts_with(w, i))) > 0)) = len(initials)"""
  }

  /** MinHash-banded similarity edges over live PERSON surfaces — mirror of
    * Canon.minhashEdges (char-3-gram shingles, k=12 md5 min-hashes, 4 bands,
    * reference-threshold verification).
    */
  val qCanonMinhash: String = {
    val k = Config.MinHashK
    val r = Config.MinHashRows
    val sigCols = (0 until k).map(i => s"MIN(CASE WHEN sd = $i THEN h END) AS h$i").mkString(", ")
    val bandSelects = (0 until Config.MinHashBands).map { b =>
      val key = (0 until r).map(i => s"h${b * r + i}").mkString(" || ")
      s"SELECT surface, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $baseCtes,
    keyed AS (SELECT DISTINCT surface, lower(strip_accents(surface)) AS sim_key FROM pm WHERE label='PERSON'),
    words AS (SELECT surface, list_distinct(string_split(sim_key, ' ')) AS w FROM keyed),
    pos AS (SELECT surface, sim_key,
              unnest(range(1, greatest(length(sim_key) - 2, 1) + 1)) AS i FROM keyed),
    sh AS (SELECT DISTINCT surface, substr(sim_key, CAST(i AS INT), 3) AS s FROM pos),
    seeds AS (SELECT unnest([${(0 until k).mkString(",")}]) AS sd),
    mh AS (SELECT surface, sd, MIN(md5(CAST(sd AS VARCHAR) || ':' || s)) AS h
           FROM sh, seeds GROUP BY surface, sd),
    sig AS (SELECT surface, $sigCols FROM mh GROUP BY surface),
    bands AS ($bandSelects),
    cand AS (SELECT DISTINCT x.surface AS a, y.surface AS b
             FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.surface < y.surface)
    SELECT c.a, c.b FROM cand c
    JOIN keyed ka ON ka.surface = c.a JOIN keyed kb ON kb.surface = c.b
    JOIN words wa ON wa.surface = c.a JOIN words wb ON wb.surface = c.b
    WHERE ka.sim_key = kb.sim_key
       OR 1.0 - CAST(levenshtein(ka.sim_key, kb.sim_key) AS DOUBLE) /
                greatest(length(ka.sim_key), length(kb.sim_key)) > ${Config.LevRatioThreshold}
       OR CAST(len(list_filter(wa.w, x -> list_contains(wb.w, x))) AS DOUBLE) /
          greatest(len(wa.w), len(wb.w)) >= ${Config.WordOverlapThreshold}"""
  }

  /** Pair-level P/R evaluation vs golden alias groups (J10 + A8). */
  val qEvalPairs: String = {
    val golden = Gazetteer.goldenAliasGroups
      .map { case (g, s) => s"($g, '${s.replace("'", "''")}')" }.mkString(", ")
    s"""WITH RECURSIVE $baseCtes, $canonCtes,
    golden(group_id, surface) AS (VALUES $golden),
    pred AS (SELECT x.surface AS a, y.surface AS b FROM canonmap x
             JOIN canonmap y ON x.canonical = y.canonical AND x.surface < y.surface),
    g AS (SELECT go.group_id, go.surface FROM golden go JOIN canonmap p ON p.surface = go.surface),
    gold AS (SELECT x.surface AS a, y.surface AS b FROM g x
             JOIN g y ON x.group_id = y.group_id AND x.surface < y.surface),
    correct AS (SELECT DISTINCT p.a, p.b FROM pred p JOIN gold g ON g.a = p.a AND g.b = p.b)
    SELECT (SELECT COUNT(*) FROM pred) AS n_pred_pairs,
           (SELECT COUNT(*) FROM gold) AS n_gold_pairs,
           (SELECT COUNT(*) FROM correct) AS n_correct_pairs"""
  }

  /** Normalization projections (P2/P3/P4/P5) over live PERSON surfaces. */
  val qNormalize: String =
    s"""WITH $baseCtes,
    surf AS (SELECT DISTINCT surface FROM pm WHERE label='PERSON')
    SELECT surface,
      array_to_string(list_transform(string_split(surface, ' '),
        w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ') AS title_case,
      lower(strip_accents(surface)) AS folded,
      regexp_replace(surface, '[^a-zA-Z0-9 ]', '', 'g') AS depunct,
      array_to_string(list_sort(string_split(lower(surface), ' ')), ' ') AS word_bag
    FROM surf"""

  /** Ranking + frame-spec windows over orders (A4/A5). */
  val qWindowRunning: String =
    """SELECT o_orderkey, o_custkey,
      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prior
    FROM orders"""

  /** Top-k entities by mention count (O1 sort + O6 limit). */
  val qTopkEntities: String =
    s"""WITH $baseCtes
    SELECT pm.surface, COUNT(*) AS n FROM pm
    GROUP BY pm.surface ORDER BY n DESC, surface LIMIT 10"""

  /** Sentence count per page (P6): engine splits generated text by regex;
    * oracle re-derives from plant arithmetic (nPlanted sentences per page,
    * base text is punctuation-free word soup).
    */
  val qSentences: String =
    s"""WITH $baseCtes
    SELECT dd.url, CAST(d.doc_id % 3 + 1 AS BIGINT) AS n_sentences
    FROM documents d JOIN docs dd ON dd.doc_id = d.doc_id"""

  /** Tokenize-with-positions (P7/J2): the engine flatMaps
    * [[graft.functions.Text.tokensWithPos]] over the whitespace-normalized
    * document text; the oracle re-derives (token, pos, pos_end) from the
    * single-space-joined token list with a running-length window. The two
    * formulations agree exactly BECAUSE the base corpus is plant-safe
    * ([a-z ]-only after normalization — CorpusAsserts): on such text the
    * `\\w+` token runs are precisely the space-separated words, so the
    * engine query `require`s plant safety before returning.
    */
  val qTokens: String =
    s"""WITH d AS (
      SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ts
      FROM documents
    ), i AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM d
    ), t AS (
      SELECT doc_id, i, ts[i] AS token,
             CAST(COALESCE(sum(length(ts[i]) + 1) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pos
      FROM i
    )
    SELECT doc_id, token, pos, CAST(pos + length(token) AS BIGINT) AS pos_end
    FROM t WHERE length(token) > 0"""

  /** Lineage row counts per bucket after materializing the flagship triples:
    * cooccurrence contributes 3 rows per planted segment; provenance one row
    * per distinct (canonical person, url).
    */
  val qLineage: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes,
    prov AS (SELECT DISTINCT m.doc_id, cm.canonical
             FROM (SELECT DISTINCT doc_id, surface FROM pm WHERE label = 'PERSON') m
             JOIN canonmap cm ON cm.surface = m.surface),
    np AS (SELECT doc_id, COUNT(*) AS n FROM prov GROUP BY doc_id),
    tot AS (SELECT d.doc_id, 3 * (d.doc_id % 3 + 1) + COALESCE(np.n, 0) AS n
            FROM documents d LEFT JOIN np ON np.doc_id = d.doc_id)
    SELECT CAST(doc_id % 16 AS INT) AS bucket, CAST(SUM(n) AS BIGINT) AS n_rows FROM tot GROUP BY 1"""

  /** Pattern triples: each planted sentence
    * "P representing O of G cited PR of L." yields adjacent-pair connector
    * triples P-represents-O, O-of-G, G-cites-PR, PR-of-L.
    */
  val qPatternTriples: String = {
    val nP = Gazetteer.persons.length
    val nO = Gazetteer.orgs.length
    val nG = Gazetteer.gpes.length
    val nPr = Gazetteer.provisions.length
    val nL = Gazetteer.laws.length
    s"""WITH $baseCtes,
    sent AS (
      SELECT pl.doc_id, pl.j, p.surface AS ps, o.surface AS os, g.surface AS gs,
             pr.surface AS prs, l.surface AS ls
      FROM plants pl
      JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % $nP
      JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % $nO
      JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % $nG
      JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % $nPr
      JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % $nL
    ),
    t AS (
      SELECT doc_id, ps AS subj, 'represents' AS pred, os AS obj FROM sent
      UNION ALL SELECT doc_id, os, 'of', gs FROM sent
      UNION ALL SELECT doc_id, gs, 'cites', prs FROM sent
      UNION ALL SELECT doc_id, prs, 'of', ls FROM sent
    )
    SELECT t.subj, t.pred, t.obj, dd.url, COUNT(*) AS n
    FROM t JOIN docs dd ON dd.doc_id = t.doc_id
    GROUP BY t.subj, t.pred, t.obj, dd.url"""
  }

  /** Entity linking: mention × broadcast alias dict with prior + context
    * cosine (J8/M6). Dict VALUES generated from Linking.aliasRows — single
    * source of truth.
    */
  val qLinking: String = {
    val dict = graft.linking.Linking.aliasRows
      .map { case (s, l, id, p) => s"('${s.replace("'", "''")}', '$l', $id, $p)" }
      .mkString(", ")
    s"""WITH $baseCtes,
    dict(surface, label, entity_id, prior_milli) AS (VALUES $dict),
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT DISTINCT dd.url, pm.surface, pm.label, pm.doc_id
          FROM pm JOIN docs dd ON dd.doc_id = pm.doc_id),
    j AS (SELECT m.url, m.surface, m.label, d.entity_id, d.prior_milli,
            m.doc_id % (SELECT COUNT(*) FROM embeddings) AS mvec_id,
            d.entity_id % (SELECT COUNT(*) FROM embeddings) AS evec_id
          FROM m JOIN dict d ON d.surface = m.surface AND d.label = m.label)
    SELECT j.url, j.surface, j.label, j.entity_id, j.prior_milli,
      CAST(round(j.prior_milli * 0.5 + 500.0 *
        list_inner_product(a.v, b.v) /
        sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v))) AS BIGINT) AS score_milli
    FROM j JOIN emb a ON a.vec_id = j.mvec_id JOIN emb b ON b.vec_id = j.evec_id"""
  }

  /** Best-candidate linking with the 0.5 one-hot acceptance
    * (TransformerReferenceExtractor.py:20-22): per mention, argmax cosine
    * over all label-mate entities, ties to the lower entity_id.
    */
  val qLinkingBest: String = {
    val dict = graft.linking.Linking.aliasRows
      .map { case (s, l, id, p) => s"('${s.replace("'", "''")}', '$l', $id, $p)" }
      .mkString(", ")
    val thr = Config.CosineThreshold
    s"""WITH $baseCtes,
    dict(surface, label, entity_id, prior_milli) AS (VALUES $dict),
    ents AS (SELECT DISTINCT label, entity_id, prior_milli FROM dict),
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT DISTINCT dd.url, pm.surface, pm.label, pm.doc_id
          FROM pm JOIN docs dd ON dd.doc_id = pm.doc_id),
    j AS (SELECT m.url, m.surface, m.label, e.entity_id, e.prior_milli,
            m.doc_id % (SELECT COUNT(*) FROM embeddings) AS mvec_id,
            e.entity_id % (SELECT COUNT(*) FROM embeddings) AS evec_id
          FROM m JOIN ents e ON e.label = m.label),
    s AS (SELECT j.*,
            list_inner_product(a.v, b.v) /
              sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)) AS cos
          FROM j JOIN emb a ON a.vec_id = j.mvec_id JOIN emb b ON b.vec_id = j.evec_id),
    r AS (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY url, surface, label
            ORDER BY cos DESC, entity_id) AS rn FROM s)
    SELECT url, surface, label, entity_id AS best_entity, prior_milli,
      CAST(round(prior_milli * 0.5 + cos * 500.0) AS BIGINT) AS score_milli,
      CAST(cos >= $thr AS BIGINT) AS accepted
    FROM r WHERE rn = 1"""
  }

  /** NL-date round trip (P11): engine renders each event date in a cycled
    * NL style and parses it back; oracle is the plain calendar date.
    */
  val qDates: String =
    """SELECT event_id, CAST(ts AS DATE) AS parsed_date FROM events"""

  /** In-text date mentions: re-derives the planted date surfaces + char
    * offsets of graft.functions.Dates.dateCorpus (positions are pure
    * arithmetic: the base corpus has no digits, so the only grammar matches
    * are the plants; the every-9th-doc invalid "30 February" plant is
    * correctly ABSENT — F4 drops it).
    */
  val qDateMentions: String = {
    val monthValues = graft.functions.Dates.monthsEn.zip(graft.functions.Dates.monthsEs)
      .zipWithIndex.map { case ((en, es), i) => s"(${i + 1}, '$en', '$es')" }.mkString(", ")
    def renderSql(p: String): String =
      s"""CASE $p.st WHEN 0 THEN printf('%04d-%02d-%02d', $p.y, $p.mo, $p.dy)
           WHEN 1 THEN $p.dy || ' ' || me.en || ' ' || $p.y
           WHEN 2 THEN me.en || ' ' || $p.dy || ', ' || $p.y
           ELSE $p.dy || ' de ' || me.es || ' de ' || $p.y END"""
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS text FROM documents),
    months(mo, en, es) AS (VALUES $monthValues),
    p1 AS (SELECT doc_id, length(text) AS base_len,
             2000 + doc_id % 26 AS y, 1 + doc_id % 12 AS mo, 1 + doc_id % 28 AS dy, doc_id % 4 AS st
           FROM norm),
    p2 AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 2000 + doc_id % 26 ELSE 2000 + (doc_id + 7) % 26 END AS y,
             CASE WHEN doc_id % 5 = 0 THEN 1 + doc_id % 12 ELSE 1 + (doc_id + 5) % 12 END AS mo,
             CASE WHEN doc_id % 5 = 0 THEN 1 + doc_id % 28 ELSE 1 + (doc_id + 11) % 28 END AS dy,
             CASE WHEN doc_id % 5 = 0 THEN doc_id % 4 ELSE (doc_id + 1) % 4 END AS st
           FROM norm),
    r1 AS (SELECT p.doc_id, p.base_len, ${renderSql("p")} AS surface,
             printf('%04d-%02d-%02d', p.y, p.mo, p.dy) AS parsed_date
           FROM p1 p JOIN months me ON me.mo = p.mo),
    r2 AS (SELECT p.doc_id, ${renderSql("p")} AS surface,
             printf('%04d-%02d-%02d', p.y, p.mo, p.dy) AS parsed_date
           FROM p2 p JOIN months me ON me.mo = p.mo)
    SELECT r1.doc_id, r1.surface, CAST(r1.base_len + 11 AS BIGINT) AS pos,
           CAST(r1.base_len + 11 + length(r1.surface) AS BIGINT) AS pos_end, r1.parsed_date
    FROM r1
    UNION ALL
    SELECT r2.doc_id, r2.surface,
           CAST(r1.base_len + 23 + length(r1.surface) AS BIGINT) AS pos,
           CAST(r1.base_len + 23 + length(r1.surface) + length(r2.surface) AS BIGINT) AS pos_end,
           r2.parsed_date
    FROM r2 JOIN r1 ON r1.doc_id = r2.doc_id"""
  }

  /** Mention context snippets (S9): the reference's ±ContextChars console
    * report (OllamaNERExtractor.py:53-87) as data — rebuilt from the plant
    * arithmetic (each planted sentence is one segment; label offsets as in
    * qEntityOcc).
    */
  val qMentionContext: String = {
    val nP = Gazetteer.persons.length; val nO = Gazetteer.orgs.length
    val nG = Gazetteer.gpes.length; val nPr = Gazetteer.provisions.length
    val nL = Gazetteer.laws.length
    val c = Config.ContextChars
    val sOrg = "length(ps) + 14"
    val sGpe = s"$sOrg + length(os) + 4"
    val sPr = s"$sGpe + length(gs) + 7"
    val sLaw = s"$sPr + length(prs) + 4"
    s"""WITH $baseCtes,
    s AS (SELECT pl.doc_id, pl.j, p.surface AS ps, o.surface AS os, g.surface AS gs,
                 pr.surface AS prs, l.surface AS ls,
                 p.surface || ' representing ' || o.surface || ' of ' || g.surface ||
                   ' cited ' || pr.surface || ' of ' || l.surface || '.' AS sent
          FROM plants pl
          JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % $nP
          JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % $nO
          JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % $nG
          JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % $nPr
          JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % $nL),
    occ AS (
      SELECT doc_id, sent, ps AS surface, 'PERSON' AS label, 0 AS pos, length(ps) AS pos_end FROM s
      UNION ALL SELECT doc_id, sent, os, 'ORG', $sOrg, $sOrg + length(os) FROM s
      UNION ALL SELECT doc_id, sent, gs, 'GPE', $sGpe, $sGpe + length(gs) FROM s
      UNION ALL SELECT doc_id, sent, prs, 'PROVISION', $sPr, $sPr + length(prs) FROM s
      UNION ALL SELECT doc_id, sent, ls, 'LAW', $sLaw, $sLaw + length(ls) FROM s)
    SELECT dd.url, o.surface, o.label, CAST(o.pos AS BIGINT) AS pos,
      substr(o.sent, greatest(1, o.pos + 1 - $c),
        least(o.pos_end + $c, length(o.sent)) - greatest(0, o.pos - $c)) AS context
    FROM occ o JOIN docs dd ON dd.doc_id = o.doc_id"""
  }

  /** Char-window fuzzy (J5) over the one-sentence corpus
    * (Fuzzy.fuzzyCharSegments): sentence length ≪ the 50-char window
    * minimum, so every step window spans the whole sentence and the
    * reference semantics collapse to a per-entity strict-best candidate
    * enumeration, which this builder performs directly (same candidate
    * order: exact length first, then ±tol skipping 0, positions ascending;
    * overlap suppression is vacuous — all windows return the same best).
    * Candidate scoring shares Fuzzy.ratio, which FuzzySpec pins to difflib
    * goldens; spans and acceptance are enumerated here, independent of the
    * engine's window/suppression machinery.
    */
  val qFuzzyChar: String = {
    import graft.fuzzy.Fuzzy
    import graft.functions.Text
    val nP = Gazetteer.persons.length
    val thr = Config.FuzzyWindowThreshold
    // This oracle enumerates candidates over the WHOLE sentence, which is
    // the engine's J5 semantics only while (a) every (entity, variant) pair
    // admits exactly one step position (text − entity < step) and (b) that
    // step-0 window spans the whole sentence (entity + win/2 ≥ text). Both
    // hold with ~2 chars of margin on the current gazetteer; a new longer
    // or shorter person surface would silently restore multi-window /
    // suppression semantics and diverge — fail the build instead (mirrors
    // qFuzzy's ≤4-token guard).
    for {
      st <- 0 to 2
      p <- Gazetteer.persons
      v = st match {
        case 0 => p.toLowerCase(java.util.Locale.ROOT)
        case 1 => p.replaceFirst(" ", ", ")
        case _ => p.toUpperCase(java.util.Locale.ROOT)
      }
      text = s"Witness: $v."
      e <- Gazetteer.persons
      entLen = Text.normWs(e).length
      if entLen <= text.length
    } {
      val win = math.max(50, math.min(500, (entLen * 2.5).toInt))
      val step = math.max(1, win / 2)
      require(text.length - entLen < step,
        s"qFuzzyChar single-window precondition broken: '$e' in '$text' has >1 step position")
      require(entLen + win / 2 >= text.length,
        s"qFuzzyChar coverage precondition broken: window for '$e' does not span '$text'")
    }
    val rows = for {
      pi <- Gazetteer.persons.indices
      st <- 0 to 2
      p = Gazetteer.persons(pi)
      v = st match {
        case 0 => p.toLowerCase(java.util.Locale.ROOT)
        case 1 => p.replaceFirst(" ", ", ")
        case _ => p.toUpperCase(java.util.Locale.ROOT)
      }
      text = s"Witness: $v."
      e <- Gazetteer.persons
      best <- {
        val ne = Text.normWs(e)
        val entLower = ne.toLowerCase(java.util.Locale.ROOT)
        val L = ne.length
        val tol = math.min(20, L / 4)
        var bestScore = 0.0; var bestS = -1; var bestE = -1
        def scanLen(len: Int): Unit = {
          var j = 0
          while (j + len <= text.length) {
            val cand = text.substring(j, j + len)
            val r = Fuzzy.ratio(entLower,
              Text.normWs(cand).toLowerCase(java.util.Locale.ROOT))
            if (r > bestScore) { bestScore = r; bestS = j; bestE = j + len }
            j += 1
          }
        }
        if (L <= text.length) {
          scanLen(L)
          (-tol to tol).foreach(d =>
            if (d != 0 && L + d >= 3 && L + d <= text.length) scanLen(L + d))
        }
        if (bestScore >= thr) Some((bestS, bestE, math.round(bestScore * 1000)))
        else None
      }
    } yield (pi, st, e, best._1, best._2, best._3)
    val values = rows.map { case (pi, st, e, s, en, sc) =>
      s"($pi, $st, '${e.replace("'", "''")}', $s, $en, $sc)"
    }.mkString(", ")
    s"""WITH m(pidx, style, surface, off_s, off_e, score_milli) AS (VALUES $values),
    d AS (SELECT doc_id, (doc_id * 7) % $nP AS pidx, doc_id % 3 AS style FROM documents)
    SELECT d.doc_id, m.surface,
      CAST(m.off_s AS BIGINT) AS pos, CAST(m.off_e AS BIGINT) AS pos_end,
      CAST(m.score_milli AS BIGINT) AS score_milli
    FROM d JOIN m ON m.pidx = d.pidx AND m.style = d.style"""
  }

  /** Canonical-keyed rollup (C8/A3/A10): mentions rewritten through the
    * alias map, re-aggregated per (canonical, label) with sorted alias sets.
    */
  val qEntityAliases: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes,
    j AS (SELECT pm.doc_id, pm.label, pm.surface,
            COALESCE(cm.canonical, pm.surface) AS canonical
          FROM pm LEFT JOIN canonmap cm ON cm.surface = pm.surface),
    dist AS (SELECT DISTINCT canonical, label, surface FROM j),
    al AS (SELECT canonical, label, string_agg(surface, '|' ORDER BY surface) AS aliases
           FROM dist GROUP BY canonical, label),
    st AS (SELECT j.canonical, j.label, COUNT(*) AS n_mentions,
             COUNT(DISTINCT dd.url) AS n_urls
           FROM j JOIN docs dd ON dd.doc_id = j.doc_id
           GROUP BY j.canonical, j.label)
    SELECT st.canonical, st.label, st.n_mentions, st.n_urls, al.aliases
    FROM st JOIN al ON al.canonical = st.canonical AND al.label = st.label"""

  /** Linked/isolated partition (C7): degree ≥ 1 under the similarity edges. */
  val qLinkedPartition: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes
    SELECT k.surface,
      CAST(k.surface IN (SELECT a FROM edges UNION SELECT b FROM edges) AS BIGINT) AS linked
    FROM keyed k"""

  /** Distributed-CC twin: a synthesized graph over documents (5-blocks of
    * consecutive ids chained, every 35th id bridging to the previous block)
    * run through the DISTRIBUTED min-label path (localThreshold = 0 in the
    * wired query), verified against a recursive-closure derivation.
    */
  val qCcDist: String =
    """WITH RECURSIVE
    v AS (SELECT printf('v%07d', doc_id) AS surface FROM documents),
    e AS (SELECT printf('v%07d', doc_id) AS a, printf('v%07d', doc_id - 1) AS b
          FROM documents WHERE doc_id % 5 <> 0
          UNION ALL
          SELECT printf('v%07d', doc_id), printf('v%07d', doc_id - 5)
          FROM documents WHERE doc_id % 35 = 0 AND doc_id > 0),
    sym AS (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e
            UNION SELECT surface, surface FROM v),
    reach(src, dst) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
    comp AS (SELECT src AS surface, MIN(dst) AS component FROM reach GROUP BY src)
    SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component"""

  /** Exploded entity-occurrence provenance (A1's array<struct> payload, not
    * just its counts): every planted mention with its within-segment char
    * offsets, from the plant arithmetic — each planted sentence is one
    * segment, "(P) representing (O) of (G) cited (PR) of (L)." with the
    * connector lengths 14/4/7/4.
    */
  val qEntityOcc: String = {
    val nP = Gazetteer.persons.length; val nO = Gazetteer.orgs.length
    val nG = Gazetteer.gpes.length; val nPr = Gazetteer.provisions.length
    val nL = Gazetteer.laws.length
    // cumulative start offsets inside the planted sentence
    val sOrg = "length(ps) + 14"
    val sGpe = s"$sOrg + length(os) + 4"
    val sPr = s"$sGpe + length(gs) + 7"
    val sLaw = s"$sPr + length(prs) + 4"
    s"""WITH $baseCtes,
    s AS (SELECT pl.doc_id, pl.j, p.surface AS ps, o.surface AS os, g.surface AS gs,
                 pr.surface AS prs, l.surface AS ls
          FROM plants pl
          JOIN persons p ON p.idx = (pl.doc_id*7 + pl.j*13) % $nP
          JOIN orgs o ON o.idx = (pl.doc_id*13 + pl.j*29) % $nO
          JOIN gpes g ON g.idx = (pl.doc_id*11 + pl.j*17) % $nG
          JOIN provisions pr ON pr.idx = (pl.doc_id*3 + pl.j*23) % $nPr
          JOIN laws l ON l.idx = (pl.doc_id*5 + pl.j*19) % $nL),
    occ AS (
      SELECT doc_id, ps AS surface, 'PERSON' AS label, 0 AS pos, length(ps) AS pos_end FROM s
      UNION ALL SELECT doc_id, os, 'ORG', $sOrg, $sOrg + length(os) FROM s
      UNION ALL SELECT doc_id, gs, 'GPE', $sGpe, $sGpe + length(gs) FROM s
      UNION ALL SELECT doc_id, prs, 'PROVISION', $sPr, $sPr + length(prs) FROM s
      UNION ALL SELECT doc_id, ls, 'LAW', $sLaw, $sLaw + length(ls) FROM s)
    SELECT o.surface, o.label, dd.url,
      CAST(o.pos AS BIGINT) AS pos, CAST(o.pos_end AS BIGINT) AS pos_end
    FROM occ o JOIN docs dd ON dd.doc_id = o.doc_id"""
  }

  /** Fuzzy token-recall mentions over the planted-variant corpus
    * (graft.fuzzy.Fuzzy.fuzzySegments): expected matches are derived with an
    * INDEPENDENT exact-token matcher here (contiguous token-sequence
    * equality), valid because every gazetteer person has ≤ 4 tokens — a
    * non-identical n≤4 window tops out at difflib list-ratio
    * 2(n−1)/2n ≤ 0.75 < 0.8, so ratio ≥ 0.8 ⟺ token equality. The builder
    * enforces the precondition with a require.
    */
  val qFuzzy: String = {
    val nP = Gazetteer.persons.length
    def toksOf(s: String): Vector[(String, Int, Int)] = {
      val m = java.util.regex.Pattern.compile("(?U)\\w+").matcher(s)
      val b = Vector.newBuilder[(String, Int, Int)]
      while (m.find()) b += ((m.group().toLowerCase(java.util.Locale.ROOT), m.start(), m.end()))
      b.result()
    }
    require(Gazetteer.persons.forall(p => toksOf(p).length <= 4),
      "qFuzzy's exact-token oracle requires <=4-token person surfaces " +
        "(a 5-token window can reach list-ratio 0.8 without being identical)")
    val rows = for {
      pi <- Gazetteer.persons.indices
      st <- 0 to 3
      p = Gazetteer.persons(pi)
      // Style 3 is the P8 promotion: hyphenated first gap + possessive
      // suffix — the tokenizer splits the hyphen and strands the "'s" as a
      // trailing "s" token outside any entity window, so the enumeration
      // below (shared tokenizer, slice equality) stays exact.
      v = st match {
        case 0 => p.toLowerCase(java.util.Locale.ROOT)
        case 1 => p.replaceFirst(" ", ", ")
        case 2 => p.toUpperCase(java.util.Locale.ROOT)
        case _ => p.replaceFirst(" ", "-") + "'s"
      }
      vToks = toksOf(v)
      e <- Gazetteer.persons
      eT = toksOf(e).map(_._1)
      w <- 0 to vToks.length - eT.length
      if vToks.slice(w, w + eT.length).map(_._1) == eT
    } yield (pi, st, e, vToks(w)._2, vToks(w + eT.length - 1)._3)
    val values = rows.map { case (pi, st, e, s, en) =>
      s"($pi, $st, '${e.replace("'", "''")}', $s, $en)"
    }.mkString(", ")
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS text FROM documents),
    m(pidx, style, surface, off_s, off_e) AS (VALUES $values),
    d AS (SELECT doc_id, length(text) AS base_len,
            (doc_id * 7) % $nP AS pidx, doc_id % 4 AS style FROM norm)
    SELECT d.doc_id, m.surface,
      CAST(d.base_len + 10 + m.off_s AS BIGINT) AS pos,
      CAST(d.base_len + 10 + m.off_e AS BIGINT) AS pos_end,
      CAST(1000 AS BIGINT) AS score_milli
    FROM d JOIN m ON m.pidx = d.pidx AND m.style = d.style"""
  }

  /** O7 ensemble union + cross-extractor overlap resolution: the exact
    * automaton's mentions ∪ the token-fuzzy person pass, resolved per
    * segment with the totalized leftmost-longest rule
    * (Mentions.resolveAcrossExtractors). On the planted corpus the union
    * differs from the exact scan in exactly one way: the fuzzy pass also
    * emits every person whose lowercase token sequence equals the planted
    * person's (the g5 case pair), creating a same-span tie that resolution
    * breaks to the lexicographically smallest surface — so the expected
    * output is qMentions with surfaces rewritten through that
    * case-canonical map, computed here independently at SQL-build time.
    * (Prefix-subset fuzzy matches — "Carlos Mendez" inside "Carlos Mendez
    * Rivera" — lose on length, changing nothing.) Precondition (base corpus
    * carries no person bigrams) is asserted by CorpusAsserts at run time.
    */
  val qEnsemble: String = {
    def toks(s: String): Vector[String] =
      graft.functions.Text.tokensWithPos(s).map(_._1)
    val caseMap = Gazetteer.persons.groupBy(toks).values
      .filter(_.size > 1)
      .flatMap { grp => val m = grp.min; grp.filter(_ != m).map(_ -> m) }
      .toSeq.sortBy(_._1)
    require(caseMap.nonEmpty,
      "qEnsemble expects ≥1 case-twin person pair (g5) — gazetteer changed?")
    val values = caseMap
      .map { case (v, m) => s"('${v.replace("'", "''")}', '${m.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH $baseCtes,
    ensmap(surface, resolved) AS (VALUES $values)
    SELECT dd.url, COALESCE(em.resolved, pm.surface) AS surface, pm.label, COUNT(*) AS n
    FROM pm JOIN docs dd ON dd.doc_id = pm.doc_id
    LEFT JOIN ensmap em ON em.surface = pm.surface AND pm.label = 'PERSON'
    GROUP BY 1, 2, 3"""
  }

  /** M4 GLiNER sliding windows (20/10, last_slide_end_index rebase) over the
    * planted-variant corpus: expected matches derived with the same
    * independent exact-token matcher as qFuzzy (valid by the ≤4-token ⟺
    * ratio-0.8 lemma), but positioned in JOINED-TOKEN coordinates — the
    * coordinate system the reference rebases window-local offsets into.
    * The base corpus is [a-z ] word soup (CorpusAsserts), so its joined
    * length equals its char length; the plant " Witness: v." contributes
    * " witness " = 9 chars before the variant's token stream, whose token
    * sequence (hence match offsets) is style-independent.
    */
  val qGlinerWindows: String = {
    val nP = Gazetteer.persons.length
    def toks(s: String): Vector[String] =
      graft.functions.Text.tokensWithPos(s).map(_._1)
    require(Gazetteer.persons.forall(p => toks(p).length <= 4),
      "qGlinerWindows' exact-token oracle requires <=4-token person surfaces")
    val rows = for {
      pi <- Gazetteer.persons.indices
      st <- 0 to 3
      p = Gazetteer.persons(pi)
      // Token STRINGS are case-insensitive, so styles 0-2 share one token
      // list; style 3 (the P8 hyphen/possessive plant) appends an "s"
      // token, which no entity list contains — slice equality below is
      // unaffected, but the enumeration is now per style to keep the
      // joined-token offsets honest if a future style reorders tokens.
      v = st match {
        case 0 => p.toLowerCase(java.util.Locale.ROOT)
        case 1 => p.replaceFirst(" ", ", ")
        case 2 => p.toUpperCase(java.util.Locale.ROOT)
        case _ => p.replaceFirst(" ", "-") + "'s"
      }
      vToks = toks(v)
      e <- Gazetteer.persons
      eToks = toks(e)
      w <- 0 to vToks.length - eToks.length
      if vToks.slice(w, w + eToks.length) == eToks
    } yield {
      val offS = vToks.take(w).map(_.length + 1).sum // +1 joining space each
      val offE = offS + eToks.map(_.length).sum + (eToks.length - 1)
      (pi, st, e, offS, offE)
    }
    val values = rows.map { case (pi, st, e, s, en) =>
      s"($pi, $st, '${e.replace("'", "''")}', $s, $en)"
    }.mkString(", ")
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS text FROM documents),
    m(pidx, style, surface, off_s, off_e) AS (VALUES $values),
    d AS (SELECT doc_id, length(text) AS base_len, (doc_id * 7) % $nP AS pidx,
            doc_id % 4 AS style FROM norm)
    SELECT d.doc_id, m.surface,
      CAST(d.base_len + 9 + m.off_s AS BIGINT) AS pos,
      CAST(d.base_len + 9 + m.off_e AS BIGINT) AS pos_end,
      CAST(1000 AS BIGINT) AS score_milli
    FROM d JOIN m ON m.pidx = d.pidx AND m.style = d.style"""
  }

  /** Provenance triples with canonical subjects. */
  val qEntityProv: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes
    SELECT cm.canonical AS subj, 'mentioned_in' AS pred, dd.url AS obj, dd.url
    FROM (SELECT DISTINCT doc_id, surface FROM pm WHERE label = 'PERSON') m
    JOIN canonmap cm ON cm.surface = m.surface
    JOIN docs dd ON dd.doc_id = m.doc_id
    GROUP BY cm.canonical, dd.url"""

  /** Streaming-flagship oracle: the full cooccurrence ∪ provenance triple
    * set the batch flagship emits, grouped — the stream must reproduce it
    * exactly (pred 'mentioned_in' never occurs in the cooccurrence rules,
    * so the UNION ALL cannot merge counts across the two families).
    */
  val qStreamTriples: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes,
    bySeg AS (SELECT pm.doc_id, pm.j, pm.label, pm.surface FROM pm),
    cooc AS (
      SELECT s.surface AS subj, r.pred, o.surface AS obj, dd.url AS url
      FROM (VALUES ('PERSON','cites','LAW'), ('PERSON','member_of','ORG'),
                   ('PROVISION','part_of','LAW')) r(sl, pred, ol)
      JOIN bySeg s ON s.label = r.sl
      JOIN bySeg o ON o.label = r.ol AND o.doc_id = s.doc_id AND o.j = s.j
      JOIN docs dd ON dd.doc_id = s.doc_id),
    prov AS (
      SELECT DISTINCT cm.canonical AS subj, 'mentioned_in' AS pred,
             dd.url AS obj, dd.url AS url
      FROM (SELECT DISTINCT doc_id, surface FROM pm WHERE label = 'PERSON') m
      JOIN canonmap cm ON cm.surface = m.surface
      JOIN docs dd ON dd.doc_id = m.doc_id)
    SELECT subj, pred, obj, url, COUNT(*) AS n
    FROM (SELECT * FROM cooc UNION ALL SELECT * FROM prov)
    GROUP BY subj, pred, obj, url"""
}
