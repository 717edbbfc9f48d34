package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Gazetteer, Mention, Page, Segment, Triple}
import graft.sources.Pages
import graft.extract.Extract
import graft.mentions.Mentions
import graft.canon.Canon
import graft.relations.Relations

/** The flagship Dataset[Page] → Dataset[Triple] flow (SURVEY §7.1):
  *
  *   pages → segments → mentions (broadcast automaton, narrow)
  *         → co-occurrence triples (shuffle on segment keys)
  *         → canonicalization (dimension-sized self-join + CC)
  *         → provenance triples (broadcast alias map)
  *
  * Shuffle frontiers: mention groupBy, ER band join, CC iterations — the
  * big-data path (pages → segments → mentions) is narrow end to end.
  */
object Pipeline {

  def pages(spark: SparkSession, sfDir: String): Dataset[Page] =
    Pages.synthesize(spark, sfDir)

  def segments(spark: SparkSession, sfDir: String): Dataset[Segment] =
    Extract.segments(pages(spark, sfDir))

  def mentions(spark: SparkSession, sfDir: String): Dataset[Mention] =
    Mentions.scan(segments(spark, sfDir), Gazetteer.all.toArray)

  /** All triples: segment co-occurrence + canonical provenance. */
  def triples(spark: SparkSession, sfDir: String): Dataset[Triple] = {
    import spark.implicits._
    val ms = mentions(spark, sfDir).cache()
    val cooc = Relations.cooccurrence(ms)
    val canonMap = Canon.canonicalMap(ms)
    val prov = Relations.mentionedIn(ms, canonMap)
    cooc.unionByName(prov)
  }
}
