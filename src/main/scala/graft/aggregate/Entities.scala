package graft.aggregate

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Mention

/** Entity rollup with provenance (SURVEY §2.5 A1/A2): the reference's
  * EntitiesDict parallel arrays (EntityInfo.py:4-10) re-modeled as
  * array<struct> so occurrence fields can never drift positionally
  * (SURVEY §1.4). One shuffle on the entity key; `collect_list` of structs
  * is map-side combinable and the per-entity payload is bounded by mention
  * counts (mega-entities are the C1 skew case, handled upstream).
  */
object Entities {

  /** (surface, label) → n_mentions, n_urls, occurrences sorted by
    * (url, seg_no, start) for deterministic output.
    */
  def rollup(mentions: Dataset[Mention]): DataFrame =
    mentions.toDF()
      .groupBy(col("surface"), col("label"))
      .agg(
        count(lit(1)).as("n_mentions"),
        countDistinct(col("url")).as("n_urls"),
        array_sort(collect_list(struct(
          col("url"), col("page"), col("seg_no"),
          col("start"), col("end")))).as("occurrences"))

  /** Rollup keyed by canonical entity: mentions are first rewritten through
    * the alias map (A3/C8 alias-merge at scale), then re-aggregated.
    */
  def canonicalRollup(mentions: Dataset[Mention], canonicalMap: DataFrame): DataFrame =
    mentions.toDF()
      .join(broadcast(canonicalMap), Seq("surface"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("surface")))
      .groupBy(col("canonical"), col("label"))
      .agg(
        count(lit(1)).as("n_mentions"),
        countDistinct(col("url")).as("n_urls"),
        array_sort(collect_set(col("surface"))).as("aliases"))
}
