package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.GraftSqlShims

/** Pipeline memo lifecycle: the session-scoped mention/canon caches must be
  * releasable — a long-lived embedding (service, notebook) iterating over
  * corpora would otherwise accumulate cached Datasets for the session's
  * life. Verify/Bench call [[Pipeline.evict]] at teardown.
  */
class PipelineSpec extends SparkSpec {

  test("evict unpersists and drops both memo entries (cache manager empty)") {
    // Baseline: this suite shares the JVM-wide session, so start from
    // whatever is cached and assert the DELTA is fully released.
    Pipeline.evict(spark, sfTiny)
    val cleanBefore = GraftSqlShims.cacheIsEmpty(spark)

    val m1 = Pipeline.mentionsCached(spark, sfTiny)
    assert(m1.count() > 0)
    val c1 = Pipeline.canonCached(spark, sfTiny)
    assert(c1.count() > 0)
    assert(!GraftSqlShims.cacheIsEmpty(spark), "memos should be cached")

    Pipeline.evict(spark, sfTiny)
    if (cleanBefore)
      assert(GraftSqlShims.cacheIsEmpty(spark),
        "evict must leave no cached plans behind")

    // Memo is really gone: the next call rebuilds (fresh instance), and
    // repeated evict is a no-op rather than an error.
    Pipeline.evict(spark, sfTiny)
    val m2 = Pipeline.mentionsCached(spark, sfTiny)
    assert(!(m2 eq m1), "evicted memo must not return the old instance")
    assert(m2.count() == m1.count())
    Pipeline.evict(spark, sfTiny)
  }
}
