package graft.skew

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north_rule: "skew from head domains is handled
  * with explicit salting + range repartition"). The synthetic corpus plants
  * real head-domain skew — site0 owns ~50% of pages (graft.sources.Pages
  * domainOf) — mirroring Common-Crawl domain distributions.
  *
  * Two complementary tools:
  *  - [[saltedAgg]]: two-phase aggregation — phase 1 groups on (key, salt)
  *    so a hot key spreads over `nSalts` reducers, phase 2 merges partials.
  *    Use for algebraic aggregates over keys with power-law frequency.
  *  - [[rangeRepartitionBy]]: range repartition on a (key, tiebreak) pair so
  *    a downstream per-key sort never lands one giant key on one task.
  *
  * AQE skew-join splitting (enabled in the session config) complements these
  * at join time; salting covers the aggregation paths AQE does not rewrite.
  */
object Skew {

  /** Deterministic salt derived from a high-cardinality column (url): hot
    * GROUP keys spread, same row always salts identically (resumable).
    */
  def saltCol(highCardCol: Column, nSalts: Int): Column =
    pmod(xxhash64(highCardCol), lit(nSalts)).cast("int")

  /** Two-phase salted aggregation: sums/counts per (key, salt) then merges.
    * `aggs` maps output column name → (phase1 aggregate over input, phase2
    * merge over the phase-1 column).
    */
  def saltedAgg(df: DataFrame, key: Column, salt: Column,
      aggs: Seq[(String, Column, String => Column)]): DataFrame = {
    val phase1 = df.groupBy(key.as("k"), salt.as("s"))
      .agg(aggs.head._2.as(s"p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"p_${a._1}")): _*)
    val merged = phase1.groupBy(col("k"))
      .agg(aggs.head._3(s"p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map(a => a._3(s"p_${a._1}").as(a._1)): _*)
    merged
  }

  /** Salted per-domain page stats over the skewed pages table:
    * (domain, n_pages, total_text_len). Phase-1 keys (domain, salt-of-url)
    * are balanced even though site0 holds half the corpus.
    */
  def domainStats(pages: DataFrame, nSalts: Int = 16): DataFrame =
    saltedAgg(
      pages.select(
        regexp_extract(col("url"), "https://site(\\d+)\\.", 1).cast("int").as("domain"),
        col("url"), length(col("text")).cast("long").as("tl")),
      col("domain"), saltCol(col("url"), nSalts),
      Seq(
        ("n_pages", count(lit(1)), (c: String) => sum(col(c))),
        ("total_text_len", sum(col("tl")), (c: String) => sum(col(c)))))
      .withColumnRenamed("k", "domain")

  /** Range repartition by (key, tiebreak): sorts work for heavy keys across
    * many tasks instead of hashing one key to one task.
    */
  def rangeRepartitionBy(df: DataFrame, n: Int, key: Column, tiebreak: Column): DataFrame =
    df.repartitionByRange(n, key, tiebreak)
}
