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
           length(regexp_replace(trim(d.text), '\\s+', ' ', 'g')) + s.total + s.nsent AS text_len
    FROM documents d
    JOIN docs dd ON dd.doc_id = d.doc_id
    JOIN (SELECT doc_id, SUM(slen) AS total, COUNT(*) AS nsent FROM sent GROUP BY doc_id) s
      ON s.doc_id = d.doc_id"""

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
    shared AS (SELECT ta.surface AS a, tb.surface AS b, COUNT(DISTINCT ta.tok) AS ns
               FROM toks ta JOIN toks tb ON ta.tok = tb.tok AND ta.surface < tb.surface
               GROUP BY ta.surface, tb.surface),
    edges AS (
      SELECT s.a, s.b FROM shared s
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

  /** Provenance triples with canonical subjects. */
  val qEntityProv: String =
    s"""WITH RECURSIVE $baseCtes, $canonCtes
    SELECT cm.canonical AS subj, 'mentioned_in' AS pred, dd.url AS obj, dd.url
    FROM (SELECT DISTINCT doc_id, surface FROM pm WHERE label = 'PERSON') m
    JOIN canonmap cm ON cm.surface = m.surface
    JOIN docs dd ON dd.doc_id = m.doc_id
    GROUP BY cm.canonical, dd.url"""
}
