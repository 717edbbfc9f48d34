package graft.relations

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Mention, Triple}

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
