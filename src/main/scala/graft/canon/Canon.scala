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
      .withColumn("sim_key", graft.functions.expressions.simkey(col("surface")))
      .withColumn("words", array_distinct(split(col("sim_key"), " ")))

  /** Similarity edges (J7): candidates = pairs sharing ≥1 normalized token
    * (blocking — at corpus scale the all-pairs product is impossible; token
    * blocking + verification is the standard similarity-join shape), verified
    * with the reference thresholds: Levenshtein ratio > 0.79 OR word-overlap
    * ≥ 0.65 (OllamaNERExtractor.py:124) OR equal normalized keys.
    * Output: (a, b) surface pairs with a < b.
    *
    * Tokens whose block exceeds `maxBlock` surfaces are DROPPED as blocking
    * keys (the standard stop-token cap: a shared first name held by millions
    * of surfaces makes the per-token block quadratic at 100× scale; pairs
    * similar only through a hot token are below the overlap threshold anyway
    * once names are long). The cap is mirrored in the DuckDB oracle
    * (Oracle.canonCtes) so engine and oracle move together at every SF;
    * verification still scores FULL word arrays — only candidate generation
    * is capped.
    */
  def similarityEdges(stats: DataFrame, maxBlock: Long = Config.MaxTokenBlock): DataFrame = {
    val toks = stats.select(col("surface"), col("sim_key"), col("words"))
      .withColumn("tok", explode(col("words")))
    val coldToks = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxBlock).select(col("tok"))
    val blockToks = toks.join(coldToks, Seq("tok"), "left_semi")
    val l = blockToks.select(col("surface").as("a"), col("sim_key").as("ka"),
      col("words").as("wa"), col("tok").as("tok_a"))
    val r = blockToks.select(col("surface").as("b"), col("sim_key").as("kb"),
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

  /** MinHash-banded similarity edges (the north-star scale path for
    * surface-form clustering): char-3-gram shingles of the normalized key →
    * k=12 min-hashes → 4 bands of 3 → equi-self-join on (band, key) →
    * verification with the same reference thresholds as [[similarityEdges]].
    * At corpus scale this bounds candidate pairs by band-bucket sizes where
    * token blocking would hot-spot on stop-word-ish tokens; md5 is used for
    * hashing so the DuckDB oracle reproduces signatures exactly (swap for
    * xxhash64 outside the sandbox — plan shape unchanged).
    */
  def minhashEdges(stats: DataFrame): DataFrame = {
    import graft.model.Config.{MinHashBands, MinHashK, MinHashRows}
    val sh = stats.select(col("surface"), col("sim_key"))
      .withColumn("s", explode(expr(
        "array_distinct(transform(sequence(1, greatest(length(sim_key) - 2, 1)), i -> substring(sim_key, i, 3)))")))
    val seeds = (0 until MinHashK).map(lit(_))
    val sigCols = (0 until MinHashK).map(i =>
      min(when(col("sd") === i, col("h"))).as(s"h$i"))
    val sig = sh.select(col("surface"), explode(array(seeds: _*)).as("sd"), col("s"))
      .groupBy(col("surface"), col("sd"))
      .agg(min(md5(concat(col("sd").cast("string"), lit(":"), col("s")))).as("h"))
      .groupBy(col("surface"))
      .agg(sigCols.head, sigCols.tail: _*)
    val bands = sig.select(col("surface"), explode(array(
      (0 until MinHashBands).map(b =>
        struct(lit(b).as("band"),
          concat((0 until MinHashRows).map(i => col(s"h${b * MinHashRows + i}")): _*).as("key"))): _*
    )).as("bk"))
      .select(col("surface"), col("bk.band"), col("bk.key"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.surface") < col("y.surface"))
      .select(col("x.surface").as("a"), col("y.surface").as("b"))
      .distinct()
    val dims = stats.select(col("surface"), col("sim_key"), col("words"))
    val overlap = size(array_intersect(col("wa"), col("wb"))).cast("double") /
      greatest(size(col("wa")), size(col("wb"))).cast("double")
    val levRatio = lit(1.0) - levenshtein(col("ka"), col("kb")).cast("double") /
      greatest(length(col("ka")), length(col("kb"))).cast("double")
    cand
      .join(dims.select(col("surface").as("a"), col("sim_key").as("ka"), col("words").as("wa")), "a")
      .join(dims.select(col("surface").as("b"), col("sim_key").as("kb"), col("words").as("wb")), "b")
      .filter(col("ka") === col("kb") ||
        levRatio > Config.LevRatioThreshold ||
        overlap >= Config.WordOverlapThreshold)
      .select(col("a"), col("b"))
  }

  /** Connected components over an undirected string-keyed edge list, pure
    * DataFrame iteration (no GraphX — north_rule): iterative min-label
    * propagation, `localCheckpoint` per round to cut lineage, converges in
    * O(diameter) rounds. `vertices` must include isolated nodes.
    * Returns (surface, component) with component = lexicographic min member.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = 100000L, hubDegree: Long = 1024L): DataFrame = {
    // Adaptive fast path (same spirit as Spark's broadcast-join threshold):
    // a dimension-sized graph is solved with driver-local union-find — the
    // iterative rounds below cost several scheduler round-trips that dwarf
    // the work when |V| is tiny. Identical output (component = min member).
    // Gated on BOTH vertex and edge count — a 100k-vertex similarity graph
    // can carry O(V²) edges, which must never be collect()ed.
    if (vertices.count() <= localThreshold && edges.count() <= localThreshold)
      return ccLocal(vertices, edges)
    // Edges referencing endpoints absent from `vertices` are ignored — the
    // exact semantics of ccLocal's parent.contains guard, enforced here so
    // the two paths can never diverge.
    val vs = vertices.select(col("surface"))
    val known = edges
      .join(vs.withColumnRenamed("surface", "a"), Seq("a"), "left_semi")
      .join(vs.withColumnRenamed("surface", "b"), Seq("b"), "left_semi")
    val sym = known.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(known.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // Hub split (north_star "salted, AQE-rebalanced" CC): a mega-component
    // hub vertex would land its entire adjacency on one reducer in the
    // src-keyed label join. High-out-degree sources instead take a
    // BROADCAST label join — their edges never shuffle on src; the hub
    // label set is tiny by construction (degree > hubDegree).
    val hubs = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") > hubDegree).select(col("src"))
      .localCheckpoint(true)
    val symHub = sym.join(hubs, Seq("src"), "left_semi").localCheckpoint(true)
    val symCold = sym.join(hubs, Seq("src"), "left_anti").localCheckpoint(true)
    var labels = vertices.select(col("surface"), col("surface").as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val hubLabels = labels
        .join(hubs.withColumnRenamed("src", "surface"), Seq("surface"), "left_semi")
      val propagated = symCold
        .join(labels, symCold("src") === labels("surface"))
        .select(col("dst").as("surface"), col("component"))
        .unionByName(symHub
          .join(broadcast(hubLabels), symHub("src") === hubLabels("surface"))
          .select(col("dst").as("surface"), col("component")))
      // min is map-side combinable, so a hub as DST partial-aggregates
      // before the shuffle — no reducer hot-spot on the receive side either.
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

  /** Pair-level evaluation of a canonicalization vs golden alias groups —
    * the deterministic form of the reference's label-group matching + metric
    * print (check_performance.py:63-89, SURVEY §2.4 J10 + §2.5 A8). Standard
    * ER pair metric: within-cluster pairs predicted vs golden (restricted to
    * surfaces present in the prediction), all counts integer.
    */
  def pairEval(canonMap: DataFrame, golden: DataFrame): DataFrame = {
    val cm = canonMap.select(col("surface"), col("canonical"))
    val pred = cm.as("x").join(cm.as("y"),
        col("x.canonical") === col("y.canonical") && col("x.surface") < col("y.surface"))
      .select(col("x.surface").as("a"), col("y.surface").as("b"))
    val g = golden.join(cm.select(col("surface")), "surface")
    val gold = g.as("x").join(g.as("y"),
        col("x.group_id") === col("y.group_id") && col("x.surface") < col("y.surface"))
      .select(col("x.surface").as("a"), col("y.surface").as("b"))
    val correct = pred.intersect(gold)
    pred.agg(count(lit(1)).as("n_pred_pairs"))
      .crossJoin(gold.agg(count(lit(1)).as("n_gold_pairs")))
      .crossJoin(correct.agg(count(lit(1)).as("n_correct_pairs")))
  }

  /** Surface dimension (surface, sim_key, words) from a static list — used
    * by the heuristic edge queries over gazetteer dimensions.
    */
  def surfaceDim(spark: org.apache.spark.sql.SparkSession, surfaces: Seq[String]): DataFrame = {
    import spark.implicits._
    surfaces.toDF("surface")
      .withColumn("sim_key", graft.functions.expressions.simkey(col("surface")))
      .withColumn("words", array_distinct(split(col("sim_key"), " ")))
  }

  /** C4 word-bag-subset edges (check_heuristics.use_part_of_the_name:63-97):
    * (a, b) where a's ≥2 normalized words are all contained in b's and b has
    * strictly more words. Blocked on a shared token — never all-pairs.
    */
  def subsetEdges(dim: DataFrame): DataFrame = {
    val toks = dim.select(col("surface"), col("words"))
      .withColumn("tok", explode(col("words")))
    val l = toks.select(col("surface").as("a"), col("words").as("wa"), col("tok").as("tok_a"))
    val r = toks.select(col("surface").as("b"), col("words").as("wb"), col("tok").as("tok_b"))
    l.join(r, col("tok_a") === col("tok_b") && col("a") =!= col("b"))
      .filter(size(col("wa")) >= 2 &&
        size(col("wb")) > size(col("wa")) &&
        size(array_except(col("wa"), col("wb"))) === 0)
      .select(col("a"), col("b"))
      .distinct()
  }

  /** C5 abbreviation edges (check_heuristics.fix_abbreviations:191-226):
    * a has ≥1 single-letter initial (after punctuation strip); b contains all
    * of a's full words; every initial of a prefixes some extra word of b.
    * Blocked on a shared full word.
    */
  def abbrevEdges(dim: DataFrame): DataFrame = {
    val cleaned = dim
      .withColumn("cw", expr("transform(words, w -> regexp_replace(w, '[^a-z0-9]', ''))"))
      .withColumn("initials", expr("filter(cw, w -> length(w) = 1)"))
      .withColumn("fulls", expr("filter(cw, w -> length(w) > 1)"))
    val l = cleaned.filter(size(col("initials")) >= 1 && size(col("fulls")) >= 1)
      .select(col("surface").as("a"), col("initials"), col("fulls").as("fa"),
        explode(col("fulls")).as("tok_a"))
    val r = cleaned.filter(size(col("initials")) === 0)
      .select(col("surface").as("b"), col("cw").as("wb"), explode(col("cw")).as("tok_b"))
    l.join(r, col("tok_a") === col("tok_b"))
      .filter(size(array_except(col("fa"), col("wb"))) === 0)
      .withColumn("extra", expr("array_except(wb, fa)"))
      .filter(expr("forall(initials, i -> exists(extra, w -> startswith(w, i)))"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** C7 non-unique partitioning: split surfaces into (has a similar partner)
    * vs isolated — degree ≥ 1 endpoints vs the anti-join complement
    * (OllamaEntityCleaner.find_unique_entities:400-421 at scale). Returns
    * (surface, linked: boolean).
    */
  def linkedPartition(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val endpoints = edges.select(col("a").as("surface"))
      .unionByName(edges.select(col("b").as("surface"))).distinct()
    vertices.select(col("surface"))
      .join(endpoints.withColumn("linked", lit(true)), Seq("surface"), "left")
      .withColumn("linked", coalesce(col("linked"), lit(false)))
  }

  /** Driver-local union-find for dimension-sized similarity graphs; labels
    * each vertex with the lexicographic minimum of its component — exactly
    * the fixpoint of the distributed min-label loop.
    */
  private def ccLocal(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val vs = vertices.select(col("surface")).as[String].collect()
    val es = edges.select(col("a"), col("b")).as[(String, String)].collect()
    val parent = scala.collection.mutable.HashMap(vs.map(v => v -> v): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      if (parent.contains(a) && parent.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(rb) = ra
      }
    }
    val minOf = scala.collection.mutable.HashMap.empty[String, String]
    vs.foreach { v =>
      val r = find(v)
      val cur = minOf.get(r)
      if (cur.isEmpty || v < cur.get) minOf(r) = v
    }
    vs.toSeq.map(v => (v, minOf(find(v)))).toDF("surface", "component")
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
