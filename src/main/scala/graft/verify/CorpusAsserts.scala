package graft.verify

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Gazetteer

/** Fail-fast guards for the plant-arithmetic oracles (ADVICE r2): the
  * qFuzzy / qFuzzyChar / qDateMentions / qEnsemble / qGlinerWindows oracles
  * derive expected rows purely from doc_id arithmetic, which is only valid
  * while the BASE document corpus (a) contains no characters outside
  * `[a-z ]` — no digits that could collide with the date grammar, and
  * single-space word soup so joined-token coordinates equal char
  * coordinates — and (b) contains no gazetteer person-token bigram that the
  * fuzzy matchers could hit outside a plant. True of the driver-generated
  * testdata; asserted here so regenerated or larger corpora fail loudly
  * instead of producing a confusing hash mismatch.
  *
  * Memoized per (session, sfDir): one corpus scan per Verify/Bench process,
  * not one per query.
  */
object CorpusAsserts {

  private val checked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** All adjacent lowercase token bigrams of gazetteer person surfaces. */
  private lazy val personBigrams: Seq[String] =
    Gazetteer.persons
      .flatMap(p => graft.functions.Text.tokensWithPos(p).map(_._1).sliding(2))
      .collect { case Seq(a, b) => s"$a $b" }
      .distinct

  def assertPlantSafe(spark: SparkSession, sfDir: String): Unit =
    if (!checked.contains((spark, sfDir))) {
      val bigramAlt = personBigrams
        .map(java.util.regex.Pattern.quote).mkString("(?:", "|", ")")
      val bad = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(regexp_replace(trim(col("text")), "\\s+", " ").as("t"))
        .filter(!col("t").rlike("^[a-z ]*$") || col("t").rlike(bigramAlt))
        .count()
      require(bad == 0,
        s"$bad documents in $sfDir violate the plant-oracle precondition " +
          "(base text must be [a-z ]-only word soup with no person-token " +
          "bigram) — the fuzzy/date plant-arithmetic oracles are invalid " +
          "on this corpus; see graft.verify.CorpusAsserts scaladoc")
      // Memoize only AFTER the require passes: recording first would make
      // every later call in the JVM silently skip the failed check (a
      // caught first failure would leave the plant oracles unguarded).
      // Under concurrency this can rarely scan twice — harmless.
      checked.add((spark, sfDir))
    }
}
