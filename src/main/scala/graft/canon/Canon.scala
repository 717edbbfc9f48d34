package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{Config, Mention}
import graft.functions.expressions.unaccent

/** Entity canonicalization: similarity self-join → connected components →
  * deterministic canonical pick. Replaces the reference's order-dependent
  * greedy transitive grouping + LLM representative
  * (OllamaNERExtractor.py:122-184) with an order-independent parallel
  * formulation (SURVEY §2.7 C1/C2, §7.6 risk 1).
  */
object Canon {

  /** Per-surface stats over PERSON mentions: the vertex table of the
    * similarity graph. Small relative to the corpus (distinct surfaces ≪
    * mentions) — one shuffle, then everything downstream is dimension-sized.
    */
  def surfaceStats(mentions: Dataset[Mention]): DataFrame =
    mentions.toDF()
      .filter(col("label") === "PERSON")
      .groupBy(col("surface"))
      .agg(count(lit(1)).as("n_mentions"))
      .withColumn("sim_key", lower(unaccent(col("surface"))))
      .withColumn("words", array_distinct(split(col("sim_key"), " ")))

  /** Similarity edges (J7): candidates = pairs sharing ≥1 normalized token
    * (blocking — at corpus scale the all-pairs product is impossible; token
    * blocking + verification is the standard similarity-join shape), verified
    * with the reference thresholds: Levenshtein ratio > 0.79 OR word-overlap
    * ≥ 0.65 (OllamaNERExtractor.py:124) OR equal normalized keys.
    * Output: (a, b) surface pairs with a < b.
    */
  def similarityEdges(stats: DataFrame): DataFrame = {
    val toks = stats.select(col("surface"), col("sim_key"), col("words"))
      .withColumn("tok", explode(col("words")))
    val l = toks.select(col("surface").as("a"), col("sim_key").as("ka"),
      col("words").as("wa"), col("tok").as("tok_a"))
    val r = toks.select(col("surface").as("b"), col("sim_key").as("kb"),
      col("words").as("wb"), col("tok").as("tok_b"))
    val overlap = size(array_intersect(col("wa"), col("wb"))).cast("double") /
      greatest(size(col("wa")), size(col("wb"))).cast("double")
    val levRatio = lit(1.0) - levenshtein(col("ka"), col("kb")).cast("double") /
      greatest(length(col("ka")), length(col("kb"))).cast("double")
    l.join(r, col("tok_a") === col("tok_b") && col("a") < col("b"))
      .filter(col("ka") === col("kb") ||
        levRatio > Config.LevRatioThreshold ||
        overlap >= Config.WordOverlapThreshold)
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Connected components over an undirected string-keyed edge list, pure
    * DataFrame iteration (no GraphX — north_rule): iterative min-label
    * propagation, `localCheckpoint` per round to cut lineage, converges in
    * O(diameter) rounds. `vertices` must include isolated nodes.
    * Returns (surface, component) with component = lexicographic min member.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("surface"), col("surface").as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val propagated = sym
        .join(labels, sym("src") === labels("surface"))
        .select(col("dst").as("surface"), col("component"))
      val next = labels.unionByName(propagated)
        .groupBy(col("surface"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      // One driver action per round (count of changed labels) — batched,
      // not per-row chatter (SURVEY §7.6 risk 5).
      val changed = next.join(labels.withColumnRenamed("component", "old"), "surface")
        .filter(col("component") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Deterministic canonical representative per component: most words, then
    * longest, then most mentions, then lexicographically last — the
    * deterministic stand-in for the reference's temperature-0 LLM pick
    * (SURVEY §2.7 C2). Mirrored by a row_number window in the DuckDB oracle.
    */
  def canonicalMap(mentions: Dataset[Mention]): DataFrame = {
    val stats = surfaceStats(mentions)
    val comps = connectedComponents(stats.select("surface"), similarityEdges(stats))
    val ranked = stats.join(comps, "surface")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("component")).orderBy(
          size(split(col("surface"), " ")).desc,
          length(col("surface")).desc,
          col("n_mentions").desc,
          col("surface").desc)))
    val canon = ranked.filter(col("rn") === 1)
      .select(col("component"), col("surface").as("canonical"))
    comps.join(canon, "component").select(col("surface"), col("canonical"))
  }
}
