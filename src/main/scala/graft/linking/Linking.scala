package graft.linking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.cosineExpr
import graft.model.{Config, Gazetteer}

/** Alias-dictionary entity linking (SURVEY §7.1 Linking.candidates): mention
  * surface → candidate entities scored with per-entity prior + context
  * cosine — the deterministic Spark form of the reference's embedding
  * query↔context matcher (TransformerReferenceExtractor.py:12-22, J8/M6).
  *
  * The alias dictionary is a broadcast dimension (FIXTURES.md §3): persons
  * share an entity id per golden alias group, so linking resolves alias
  * surfaces to one entity. Context vectors come deterministically from the
  * embeddings table (entity side: vec_id = entity_id mod corpus; mention
  * side: vec_id = doc_id mod corpus), standing in for real encoder output.
  *
  * Plan shape at scale: mentions (big) ⋈ broadcast(alias dict) — narrow;
  * then an equi-join against the embeddings dimension; the only shuffle is
  * the final per-mention ranking, keyed by high-cardinality (url, surface).
  */
object Linking {

  /** (surface, label, entity_id, prior_milli): persons share their golden
    * group's id; other labels get singleton ids. prior is a deterministic
    * per-entity integer in [0, 1000) — kept integral so oracle compares are
    * float-free on the dictionary side.
    */
  def aliasDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    aliasRows.toDF("surface", "label", "entity_id", "prior_milli")
  }

  val aliasRows: Seq[(String, String, Long, Long)] = {
    val personRows = Gazetteer.goldenAliasGroups.map { case (gid, s) =>
      (s, "PERSON", gid.toLong, priorOf(gid.toLong))
    }
    val others = (Gazetteer.orgs.map(_ -> "ORG") ++ Gazetteer.gpes.map(_ -> "GPE") ++
      Gazetteer.laws.map(_ -> "LAW") ++ Gazetteer.provisions.map(_ -> "PROVISION"))
      .zipWithIndex.map { case ((s, l), i) =>
        val id = 100L + i
        (s, l, id, priorOf(id))
      }
    personRows ++ others
  }

  def priorOf(entityId: Long): Long = (entityId * 31L) % 100L * 10L

  /** Per-mention best-candidate pick with the acceptance threshold — the
    * missing half of the reference's matcher: it scores the mention context
    * against EVERY reference vector and one-hots cosine ≥ 0.5
    * (TransformerReferenceExtractor.py:20-22, Config.CosineThreshold).
    * Candidates = all dictionary entities sharing the mention's label;
    * best = argmax cosine (ties → lower entity_id); accepted = 1 iff the
    * best cosine clears the threshold. Plan: mentions ⋈ broadcast(entity
    * dim) fan-out, then a max_by AGGREGATE on the mention key — partial-
    * aggregable (map-side combine eats the candidate fan-out before the
    * shuffle), unlike a sort+window argmax. (cos, -entity_id) has no true
    * ties (entity ids are distinct), so the pick is deterministic.
    */
  def linkBest(mentions: DataFrame, spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nEmb = emb.count()
    val entities = aliasDict(spark)
      .select(col("label"), col("entity_id"), col("prior_milli"))
      .distinct()
      .withColumn("evec_id", pmod(col("entity_id"), lit(nEmb)))
    val m = mentions
      .select(col("url"), col("surface"), col("label"))
      .distinct()
      .withColumn("doc_id", regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .withColumn("mvec_id", pmod(col("doc_id"), lit(nEmb)))
    val scored = m.join(broadcast(entities), Seq("label"))
      .join(emb.select(col("vec_id").as("mvec_id"), col("v").as("mv")), "mvec_id")
      .join(emb.select(col("vec_id").as("evec_id"), col("v").as("ev")), "evec_id")
      .withColumn("cos", cosineExpr("mv", "ev"))
    scored
      .groupBy(col("url"), col("surface"), col("label"))
      .agg(max_by(
        struct(col("entity_id"), col("prior_milli"), col("cos")),
        struct(col("cos"), (-col("entity_id")).as("neg_id"))).as("best"))
      .select(col("url"), col("surface"), col("label"),
        col("best.entity_id").as("best_entity"), col("best.prior_milli").as("prior_milli"),
        round(col("best.prior_milli") * 0.5 + col("best.cos") * 500.0).cast("long").as("score_milli"),
        (col("best.cos") >= Config.CosineThreshold).cast("long").as("accepted"))
  }

  /** Link mentions: broadcast-join the alias dict on surface+label, attach
    * entity context vector (vec_id = entity_id mod |embeddings|) and mention
    * context vector (vec_id = doc_id mod |embeddings|), score =
    * prior/1000 * 0.5 + cosine * 0.5, emitted in integer milli-units.
    * Output: (url, surface, label, entity_id, prior_milli, score_milli).
    */
  def link(mentions: DataFrame, spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nEmb = emb.count()
    val dict = aliasDict(spark)
      .withColumn("evec_id", pmod(col("entity_id"), lit(nEmb)))
    val m = mentions
      .select(col("url"), col("surface"), col("label"))
      .distinct()
      .withColumn("doc_id", regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .withColumn("mvec_id", pmod(col("doc_id"), lit(nEmb)))
    m.join(broadcast(dict), Seq("surface", "label"))
      .join(emb.select(col("vec_id").as("mvec_id"), col("v").as("mv")), "mvec_id")
      .join(emb.select(col("vec_id").as("evec_id"), col("v").as("ev")), "evec_id")
      .withColumn("score_milli",
        round(col("prior_milli") * 0.5 + cosineExpr("mv", "ev") * 500.0).cast("long"))
      .select(col("url"), col("surface"), col("label"), col("entity_id"),
        col("prior_milli"), col("score_milli"))
  }
}
