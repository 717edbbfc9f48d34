package graft.relations

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Mention, Segment, Triple}

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
    // Pure DataFrame formulation — one hash-agg shuffle of UnsafeRows plus
    // ONE native pairing expression ([[CoocPairs]]). (A typed
    // groupByKey/flatMapGroups version was measurably allocation-bound at
    // 32 cores: every row deserialized to a Mention object. The prior
    // explode(rules) + filter/transform/flatten HOF chain evaluated
    // interpreted — higher-order functions are CodegenFallback — and
    // tripled the post-aggregate rows before filtering.)
    val perSeg = mentions.toDF()
      .groupBy(col("url"), col("page"), col("seg_no"))
      .agg(collect_set(struct(col("label"), col("surface"))).as("ms"))
    val ruleArr: Array[Array[String]] =
      rules.map { case (sl, p, ol) => Array(sl, p, ol) }.toArray
    val pairs = org.apache.spark.sql.graft.Bridge.column(
      CoocPairs(org.apache.spark.sql.graft.Bridge.expression(col("ms")), ruleArr))
    perSeg
      .select(col("url"), explode(pairs).as("t"))
      .select(col("t.subj").as("subj"), col("t.pred").as("pred"),
        col("t.obj").as("obj"), col("url"), lit(1.0).as("score"))
      .as[Triple]
  }

  /** [[cooccurrence]] WITHOUT the per-segment shuffle, for mention datasets
    * whose rows are segment-contiguous within partitions — the scan stages'
    * natural output shape (each segment's mentions are emitted by one
    * flatMap element, so they stay consecutive in one partition; cache()
    * and deterministic recompute preserve that). Guide §2.4 "remove
    * shuffles outright": the grouping the exchange existed to establish is
    * already present in the data, the optimizer just cannot see it. Each
    * consecutive same-key run pairs list-locally via [[coocLocal]] — the
    * streaming flagship's pairing, spec-pinned equal to the grouped form —
    * so the big-data path stays narrow end to end and the only remaining
    * wide op in the flagship is the final aggregate.
    *
    * Safety: a per-partition set of closed segment keys turns an
    * intra-partition contiguity violation (e.g. a shuffled or re-sorted
    * mention table) into a LOUD error, never silently wrong triples. A
    * pathological repartition that splits one segment's rows ACROSS
    * partitions without intra-partition repeats is not detectable here and
    * remains the caller's contract — callers in this repo all consume the
    * scan output directly, and RelationsSpec pins equality with
    * [[cooccurrence]] on the live corpus.
    */
  def cooccurrenceContiguous(mentions: Dataset[Mention]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.mapPartitions { it =>
      val buf = it.buffered
      val closed = new java.util.HashSet[(String, Int, Int)]()
      new Iterator[Triple] {
        private var out: Iterator[Triple] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && buf.hasNext) {
            val key = { val m = buf.head; (m.url, m.page, m.seg_no) }
            if (!closed.add(key))
              throw new IllegalStateException(
                s"cooccurrenceContiguous: segment $key reappeared after its " +
                  "group closed — input is not segment-contiguous; use cooccurrence")
            val group = scala.collection.mutable.ListBuffer.empty[Mention]
            while (buf.hasNext && {
              val m = buf.head
              m.url == key._1 && m.page == key._2 && m.seg_no == key._3
            }) group += buf.next()
            out = coocLocal(group.toList, key._1).iterator
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Triple = { advance(); out.next() }
      }
    }
  }

  /** List-local form of [[cooccurrence]] for ONE segment's mentions: the
    * same distinct-(label, surface) → per-rule subjects × objects pairing,
    * but computed group-locally with no shuffle. Used by the streaming
    * flagship (graft.streaming.Streaming.pageTriples), where a segment's
    * mentions are already in hand inside the per-page stage; StreamingSpec
    * asserts grouped-count equality with the DataFrame form on a real
    * corpus.
    */
  def coocLocal(ms: Seq[Mention], url: String): List[Triple] = {
    val pairs = ms.iterator.map(m => (m.label, m.surface)).toList.distinct
    rules.iterator.flatMap { case (sl, pred, ol) =>
      val subjs = pairs.collect { case (l, s) if l == sl => s }
      val objs = pairs.collect { case (l, s) if l == ol => s }
      for (s <- subjs; o <- objs) yield Triple(s, pred, o, url, 1.0)
    }.toList
  }

  /** The provenance predicate — never appears in [[rules]], so provenance
    * and co-occurrence triples are distinguishable by pred alone (the
    * streaming sink's deferred rewrite depends on this). */
  val ProvPred = "mentioned_in"

  /** List-local form of [[mentionedIn]] for ONE page's mentions: canonical
    * rewrite through a broadcast alias snapshot + per-url dedup. Exact
    * because urls are unique per page, so page-local distinct == the batch
    * form's global distinct. Surfaces absent from the snapshot are dropped,
    * matching the batch inner join.
    */
  def provLocal(ms: Seq[Mention], url: String, canon: Map[String, String]): List[Triple] =
    ms.iterator.filter(_.label == "PERSON")
      .flatMap(m => canon.get(m.surface)).toList.distinct
      .map(c => Triple(c, ProvPred, url, url, 1.0))

  /** [[provLocal]] without the canonical rewrite: page-local distinct RAW
    * person surfaces as provenance subjects. The alias-dimension form of
    * the streaming flagship ([[graft.canon.Canon.AliasFrame]]) emits these
    * from the fused stage and joins subj → canonical at the sink
    * ([[graft.streaming.Streaming.rewriteProv]]), so the fused stage never
    * needs the alias map in its closure.
    */
  def provLocalRaw(ms: Seq[Mention], url: String): List[Triple] =
    ms.iterator.filter(_.label == "PERSON").map(_.surface).toList.distinct
      .map(s => Triple(s, ProvPred, url, url, 1.0))

  /** Connector-word → predicate table for pattern extraction. */
  val patternPreds: Map[String, String] = Map(
    "representing" -> "represents",
    "cited" -> "cites",
    "of" -> "of")

  /** OpenIE-style pattern triples (north_star "dependency-pattern triple
    * extraction", deterministic form): for ADJACENT mention pairs within a
    * segment (sorted by start), the connector text between the spans is
    * looked up in [[patternPreds]]; a hit emits (a.surface, pred, b.surface).
    * The reference's analog is the per-segment provision↔law pairing with
    * query matching (src/create_reference_data.py:16-32,
    * src/methods/TransformerReferenceExtractor.py:72-88).
    *
    * Plan: typed cogroup of mentions and segments on the (url, page, seg_no)
    * key — ONE shuffle on a high-cardinality key, pairing is group-local.
    */
  def patternTriples(segments: Dataset[Segment], mentions: Dataset[Mention]): Dataset[Triple] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val preds = patternPreds
    val segByKey = segments.groupByKey(s => (s.url, s.page, s.seg_no))
    val menByKey = mentions.groupByKey(m => (m.url, m.page, m.seg_no))
    menByKey.cogroup(segByKey) { (key, ms, ss) =>
      val text = if (ss.hasNext) Some(ss.next().text) else None
      text match {
        case None => Iterator.empty
        case Some(t) =>
          val sorted = ms.toArray.sortBy(_.start)
          sorted.iterator.zip(sorted.iterator.drop(1)).flatMap { case (a, b) =>
            if (a.end <= b.start && b.start <= t.length) {
              val between = t.substring(a.end, b.start).trim
              preds.get(between).map(p => Triple(a.surface, p, b.surface, key._1, 1.0))
            } else None
          }
      }
    }
  }

  /** [[mentionedIn]] WITHOUT the distinct shuffle, for mention datasets
    * whose rows are url-contiguous within partitions (the scan stages'
    * natural output: all of a page's segments — hence all its mentions —
    * come from one flatMap element) and an alias map that fits the driver
    * (the [[graft.canon.Canon.AliasMap]] shape). Per consecutive same-url
    * run the rewrite + dedup is [[provLocal]] — the streaming flagship's
    * exact provenance op, valid because urls are unique per feed/corpus so
    * page-local distinct equals the global distinct. Same loud-guard
    * discipline as [[cooccurrenceContiguous]]: a url reappearing after its
    * run closed throws, never silently duplicates provenance.
    */
  def mentionedInContiguous(mentions: Dataset[Mention],
      canon: Map[String, String]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(canon)
    mentions.mapPartitions { it =>
      val cm = bc.value
      val buf = it.buffered
      val closed = new java.util.HashSet[String]()
      new Iterator[Triple] {
        private var out: Iterator[Triple] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && buf.hasNext) {
            val url = buf.head.url
            if (!closed.add(url))
              throw new IllegalStateException(
                s"mentionedInContiguous: url $url reappeared after its run " +
                  "closed — input is not url-contiguous; use mentionedIn")
            val group = scala.collection.mutable.ListBuffer.empty[Mention]
            while (buf.hasNext && buf.head.url == url) group += buf.next()
            out = provLocal(group.toList, url, cm).iterator
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Triple = { advance(); out.next() }
      }
    }
  }

  /** ONE fused pass over url-contiguous mentions producing BOTH triple
    * legs: per-segment co-occurrence pairing ([[coocLocal]]) and page-local
    * canonical provenance ([[provLocal]]) — the batch twin of the streaming
    * fused stage, over the mention table instead of raw pages. Equals
    * [[cooccurrenceContiguous]] ∪ [[mentionedInContiguous]] as a multiset
    * while reading the (cached) mention table ONCE instead of twice — in
    * the flagship that halves the post-scan passes. Same loud contiguity
    * guards: a url OR a segment key reappearing after its run closed
    * throws, never silently duplicates triples.
    */
  def triplesContiguous(mentions: Dataset[Mention],
      canon: Map[String, String]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(canon)
    mentions.mapPartitions { it =>
      val cm = bc.value
      val buf = it.buffered
      val closedUrls = new java.util.HashSet[String]()
      new Iterator[Triple] {
        private var out: Iterator[Triple] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && buf.hasNext) {
            val url = buf.head.url
            if (!closedUrls.add(url))
              throw new IllegalStateException(
                s"triplesContiguous: url $url reappeared after its run " +
                  "closed — input is not url-contiguous")
            val page = scala.collection.mutable.ListBuffer.empty[Mention]
            val cooc = List.newBuilder[Triple]
            val closedSegs = new java.util.HashSet[(Int, Int)]()
            while (buf.hasNext && buf.head.url == url) {
              val segKey = { val m = buf.head; (m.page, m.seg_no) }
              if (!closedSegs.add(segKey))
                throw new IllegalStateException(
                  s"triplesContiguous: segment $url/$segKey reappeared after " +
                    "its run closed — input is not segment-contiguous")
              val seg = scala.collection.mutable.ListBuffer.empty[Mention]
              while (buf.hasNext && {
                val m = buf.head
                m.url == url && m.page == segKey._1 && m.seg_no == segKey._2
              }) seg += buf.next()
              page ++= seg
              cooc ++= coocLocal(seg.toList, url)
            }
            out = (cooc.result() ++ provLocal(page.toList, url, cm)).iterator
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Triple = { advance(); out.next() }
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
      .select(col("canonical").as("subj"), lit(ProvPred).as("pred"),
        col("url").as("obj"), col("url"), lit(1.0).as("score"))
      .distinct()
      .as[Triple]
  }
}
