package graft.mentions

import org.apache.spark.sql.Dataset
import graft.model.{Mention, Segment}

/** Gazetteer mention detection + overlap resolution.
  *
  * Replaces the reference's per-segment NER backends (SURVEY §2.8 M1-M5)
  * with a deterministic broadcast-automaton scan: one narrow `mapPartitions`
  * stage, no shuffle, whole pipeline scales with input splits. The automaton
  * is built from the broadcast surface list once per executor
  * ([[AhoCorasick.cached]]), mirroring "broadcast model + batched
  * mapPartitions" (SURVEY §2.8).
  */
object Mentions {

  /** Scan segments for gazetteer surfaces; spans resolved per segment with
    * the reference's leftmost-longest rule before emission.
    *
    * @param gazetteer (surface, label) dimension rows; broadcast implicitly
    *                  via task closure (small) — swap for an explicit
    *                  `SparkContext.broadcast` when the dimension grows.
    */
  def scan(segments: Dataset[Segment], gazetteer: Array[(String, String)]): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    segments.mapPartitions { it =>
      val gaz = bc.value
      val ac = AhoCorasick.cached(gaz.map(_._1))
      it.flatMap { seg =>
        val raw = ac.scan(seg.text).map { case (p, s, e) =>
          Mention(seg.url, seg.page, seg.seg_no, gaz(p)._1, gaz(p)._2, s, e, 1.0)
        }
        resolveOverlaps(raw)
      }
    }
  }

  /** Greedy non-overlap selection — the reference's
    * `remove_overlapping_entities` (OllamaNERExtractor.py:101-112, 6 dupes):
    * sort by (start asc, length desc), keep a span iff it starts at/after
    * the last kept end. Pure list-local: applied inside the scan stage (no
    * shuffle) or per-group via [[resolveAcrossExtractors]].
    */
  def resolveOverlaps(ms: List[Mention]): List[Mention] = {
    val sorted = ms.sortBy(m => (m.start, -(m.end - m.start)))
    var lastEnd = -1
    sorted.filter { m =>
      if (m.start >= lastEnd) { lastEnd = m.end; true } else false
    }
  }

  /** Resolution across already-materialized mention sets (ensemble union,
    * SURVEY §2.6 O7+O3): group by segment, resolve within group. Needs a
    * shuffle on (url, page, seg_no) — used only when mentions come from
    * independent extractor outputs.
    */
  def resolveAcrossExtractors(mentions: Dataset[Mention]): Dataset[Mention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions
      .groupByKey(m => (m.url, m.page, m.seg_no))
      .flatMapGroups((_, it) => resolveOverlaps(it.toList))
  }
}
