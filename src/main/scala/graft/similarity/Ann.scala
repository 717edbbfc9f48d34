package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.cosineExpr

/** Similarity search over an embedding column.
  *
  * Brute-force cosine top-k is the correctness baseline (broadcast the query
  * set — small — against the full corpus: one narrow pass + a per-query
  * top-k). The scale path is sign-random-projection (SRP) LSH: B independent
  * bands of P deterministic hyperplanes each; only vectors sharing a bucket
  * in at least one band are compared, so the candidate join is equi on
  * (band, key) instead of all-pairs. Cosine ≥ 0.99 ⇒ angle ≤ 8.1°, so a
  * near-dup pair splits on one random plane with prob θ/π ≈ 0.045; with
  * P=8 planes a band keeps the pair with prob ≈ 0.69, and the miss
  * probability across B=4 independent bands is (1−0.69)⁴ ≈ 0.9 % worst-case
  * (planted near-identical pairs are orders of magnitude safer). Verification
  * keeps precision exact, so LSH output ⊆ brute output always.
  *
  * Hyperplane components are ±1 derived from md5 parity computed once on the
  * driver and carried into the plan as a codegen reference object — the
  * per-row work is a native codegen'd dot-product loop ([[SrpKeys]]), no
  * per-element hashing and no literal-array expression tree.
  */
object Ann {

  /** Driver testdata embedding dimensionality (embeddings.parquet). */
  val Dim = 64

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    // NOT spread (graft.util.Reads.spread): the per-vector native passes
    // are light at this dimension and the ANN queries are join/window
    // bound — the rebalance exchange measured as a wash-to-loss in full
    // sweeps, so the conservative no-plan-change form stays
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Deterministic ±1 hyperplane: component i of plane (band, p) is +1 iff
    * the last hex digit of md5("band:p:i") is even. Driver-side; the result
    * is embedded in the plan as a literal.
    */
  private[similarity] def planeSigns(band: Int, p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val h = md.digest(s"$band:$p:$i".getBytes("UTF-8"))
      if ((h(15) & 1) == 0) 1.0 else -1.0
    }
  }

  /** All B band keys as ONE codegen'd expression node — the ±1 plane matrix
    * rides in as a codegen reference object (see [[SrpKeys]] for why this is
    * a native expression and not B×P zip_with dots over literal arrays).
    */
  private[similarity] def srpKeysCol(vecCol: Column, bands: Int, nPlanes: Int,
                                     dim: Int): Column = {
    val planes = Array.tabulate(bands, nPlanes)((b, p) => planeSigns(b, p, dim))
    org.apache.spark.sql.graft.Bridge.column(
      SrpKeys(org.apache.spark.sql.graft.Bridge.expression(vecCol), planes))
  }

  /** Single-band SRP bucketing (kept as the simple API; band 0). */
  def srpBuckets(emb: DataFrame, nPlanes: Int = 8, dim: Int = Dim): DataFrame =
    emb.withColumn("bucket", srpKeysCol(col("v"), 1, nPlanes, dim).getItem(0))

  /** Per-vector L2 norm + precomputed unit vector — computed once, before
    * any pair join, so pair verification is a single dot product (the
    * brute/cartesian path used to re-aggregate both norms per pair).
    * `nv` is the native [[UnitVec]] expression (one codegen'd loop; the
    * HOF form dominated the million-vector index build — BENCH/
    * ann_scale.json); `nrm` is kept for API compatibility and pruned by
    * Catalyst when unselected.
    */
  def withUnit(emb: DataFrame): DataFrame =
    emb
      .withColumn("nrm", sqrt(expr("aggregate(v, 0d, (s, x) -> s + x * x)")))
      .withColumn("nv", org.apache.spark.sql.graft.Bridge.column(
        UnitVec(org.apache.spark.sql.graft.Bridge.expression(col("v")))))

  /** Dot product of two precomputed unit-vector columns (= cosine) — the
    * native [[DotD]] expression (per-candidate verification hot path).
    */
  def unitDot(a: String, b: String): Column = dotCols(col(a), col(b))

  /** Candidate pairs from B bands of P planes: one scan computes every
    * band key, an explode emits B (band, key) rows per vector, and a banded
    * equi self-join yields distinct id pairs. Same plan shape as MinHash-LSH
    * banding — bounded by bucket sizes, never all-pairs.
    */
  def bandedCandidates(emb: DataFrame, bands: Int = 4, nPlanes: Int = 8,
                       dim: Int = Dim): DataFrame = {
    val keys = emb.select(col("vec_id"),
        posexplode(srpKeysCol(col("v"), bands, nPlanes, dim)).as(Seq("band", "key")))
    keys.as("x").join(keys.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
  }

  /** LSH near-neighbor pairs: banded candidates verified with an exact
    * cosine on precomputed unit vectors. At 100 TB this replaces the
    * all-pairs product with per-bucket products (buckets are balanced by
    * construction: random hyperplanes split the sphere evenly).
    */
  def lshPairs(emb: DataFrame, minCos: Double = 0.99, bands: Int = 4,
               nPlanes: Int = 8, dim: Int = Dim): DataFrame = {
    val u = withUnit(emb).select(col("vec_id"), col("nv"))
    bandedCandidates(emb, bands, nPlanes, dim)
      .join(u.select(col("vec_id").as("a"), col("nv").as("na")), "a")
      .join(u.select(col("vec_id").as("b"), col("nv").as("nb")), "b")
      .filter(unitDot("na", "nb") >= minCos)
      .select(col("a"), col("b"))
  }

  /** Column-API dot product — the native [[DotD]] expression. */
  private def dotCols(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(DotD(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** IVF-flat centroids: the `nCentroids` corpus vectors with the smallest
    * `md5(vec_id)` (a deterministic hash-ordered pseudo-random sample),
    * returned as UNIT vectors in hash order (index = centroid id). A
    * driver collect by design — K×Dim doubles broadcast into the plan as
    * literals, the same dimension-sized-closure policy as [[planeSigns]].
    * At scale the selection is a TopK (sort+limit ⇒ takeOrdered), never a
    * full sort of the corpus.
    */
  def ivfCentroids(emb: DataFrame, nCentroids: Int): Array[Array[Double]] =
    withUnit(emb)
      .select(col("vec_id"), col("nv"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCentroids)
      .select(col("nv"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Per-row cosines against every centroid (index = centroid id), as ONE
    * codegen'd expression node — see [[CentroidCos]] for why this is a
    * native expression and not a zip_with over literal arrays.
    */
  private def centroidCosCol(nvCol: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CentroidCos(org.apache.spark.sql.graft.Bridge.expression(nvCol), cents))

  /** Nearest-centroid id as ONE codegen'd map expression — no join, no
    * shuffle; ties → lower cid (see [[CentroidArgmax]]).
    */
  private[graft] def ivfAssignCol(nvCol: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CentroidArgmax(org.apache.spark.sql.graft.Bridge.expression(nvCol), cents))

  /** IVF-flat approximate top-k: the second scale path next to SRP-LSH.
    *
    * Build: every corpus vector is assigned to its nearest of K
    * deterministic centroids by a narrow map expression (zero shuffle of
    * the corpus — the inverted file IS the assignment column, and a
    * production table would partition/bucket by it). Probe: each query
    * scores all K centroids and searches only its `nProbe` nearest cells —
    * candidates are ~nProbe/K of the corpus instead of all of it — via a
    * broadcast join on the cell id. Exact cosine re-ranks candidates, so
    * precision is exact; recall is the probed-cell mass (high when the
    * corpus clusters, ≈ nProbe/K on adversarially uniform vectors — see
    * AnnSpec, which demonstrates both regimes).
    */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
              nCentroids: Int = graft.model.Config.AnnIvfCentroids,
              nProbe: Int = graft.model.Config.AnnIvfProbes): DataFrame = {
    val cents = ivfCentroids(emb, nCentroids)
    val u = withUnit(emb).select(col("vec_id"), col("nv"))
    val corpus = u.withColumn("cid", ivfAssignCol(col("nv"), cents))
    val probes = u.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("nv").as("qnv"),
        posexplode(centroidCosCol(col("nv"), cents)).as(Seq("cid", "ccos")))
      .withColumn("prn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("cid"))))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qnv"), col("cid"))
    corpus.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dotCols(col("qnv"), col("nv")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"))
  }

  /** Exact top-k neighbors by cosine for each query vector (vec_id < nQueries).
    * The query side is broadcast — the big side streams once, no shuffle of
    * the corpus; per-query ranking shuffles only (nQueries × corpus) score
    * rows bounded by the queries' selectivity.
    */
  def bruteTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("v").as("vn"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineExpr("vq", "vn"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }
}
