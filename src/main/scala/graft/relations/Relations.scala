package graft.relations

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Mention, Segment, Triple}

/** Relation extraction: per-segment label co-occurrence pairing — the Spark
  * form of the reference's proto-triple emission (cardinal × law per segment,
  * src/create_reference_data.py:16-32) generalized to the label pairs this
  * corpus plants.
  */
object Relations {

  /** (subject label, predicate, object label) co-occurrence rules. */
  val rules: Seq[(String, String, String)] = Seq(
    ("PERSON", "cites", "LAW"),
    ("PERSON", "member_of", "ORG"),
    ("PROVISION", "part_of", "LAW")
  )

  /** Segment-level co-occurrence triples. Mentions arrive grouped per
    * segment from the scan stage; the grouping shuffle keys on
    * (url, page, seg_no) — high-cardinality keys, so no hot partitions even
    * with head-domain skew (a domain's pages split across many segments).
    * Pairing is list-local inside each group (SURVEY §2.4 J11: intra-row
    * cross product).
    */
  def cooccurrence(mentions: Dataset[Mention]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val ruleList = rules
    mentions
      .groupByKey(m => (m.url, m.page, m.seg_no))
      .flatMapGroups[Triple] { (key: (String, Int, Int), it: Iterator[Mention]) =>
        val url = key._1
        val ms = it.toList
        val byLabel = ms.groupBy(_.label)
        ruleList.iterator.flatMap { case (sl, pred, ol) =>
          for {
            s <- byLabel.getOrElse(sl, Nil).map(_.surface).distinct
            o <- byLabel.getOrElse(ol, Nil).map(_.surface).distinct
          } yield Triple(s, pred, o, url, 1.0)
        }
      }
  }

  /** Connector-word → predicate table for pattern extraction. */
  val patternPreds: Map[String, String] = Map(
    "representing" -> "represents",
    "cited" -> "cites",
    "of" -> "of")

  /** OpenIE-style pattern triples (north_star "dependency-pattern triple
    * extraction", deterministic form): for ADJACENT mention pairs within a
    * segment (sorted by start), the connector text between the spans is
    * looked up in [[patternPreds]]; a hit emits (a.surface, pred, b.surface).
    * The reference's analog is the per-segment provision↔law pairing with
    * query matching (src/create_reference_data.py:16-32,
    * src/methods/TransformerReferenceExtractor.py:72-88).
    *
    * Plan: typed cogroup of mentions and segments on the (url, page, seg_no)
    * key — ONE shuffle on a high-cardinality key, pairing is group-local.
    */
  def patternTriples(segments: Dataset[Segment], mentions: Dataset[Mention]): Dataset[Triple] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val preds = patternPreds
    val segByKey = segments.groupByKey(s => (s.url, s.page, s.seg_no))
    val menByKey = mentions.groupByKey(m => (m.url, m.page, m.seg_no))
    menByKey.cogroup(segByKey) { (key, ms, ss) =>
      val text = if (ss.hasNext) Some(ss.next().text) else None
      text match {
        case None => Iterator.empty
        case Some(t) =>
          val sorted = ms.toArray.sortBy(_.start)
          sorted.iterator.zip(sorted.iterator.drop(1)).flatMap { case (a, b) =>
            if (a.end <= b.start && b.start <= t.length) {
              val between = t.substring(a.end, b.start).trim
              preds.get(between).map(p => Triple(a.surface, p, b.surface, key._1, 1.0))
            } else None
          }
      }
    }
  }

  /** Provenance triples (canonical_entity, mentioned_in, url) — subjects
    * rewritten through the canonicalization alias map (broadcast: the map is
    * dimension-sized) then deduplicated per url.
    */
  def mentionedIn(mentions: Dataset[Mention], canonicalMap: DataFrame): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.toDF()
      .filter(col("label") === "PERSON")
      .join(broadcast(canonicalMap), "surface")
      .select(col("canonical").as("subj"), lit("mentioned_in").as("pred"),
        col("url").as("obj"), col("url"), lit(1.0).as("score"))
      .distinct()
      .as[Triple]
  }
}
