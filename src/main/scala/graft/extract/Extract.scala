package graft.extract

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Page, Segment}
import graft.functions.Text

/** Deterministic HTML→text/segment extraction — the Spark-first replacement
  * of the reference's pdftotext+lxml word scan (src/data_model/PdfWords.py:18-40)
  * and the cached layout-segment scan (src/cache_data.py:13-21).
  *
  * Contract (input_hint): the extracted, whitespace-normalized page text is
  * byte-identical to the `text` column per url. Runs as a typed
  * `mapPartitions` so the (stateless but allocation-heavy) parser amortizes
  * per partition; the stage is narrow — no shuffle, scales linearly with
  * input splits.
  */
object Extract {

  /** Minimal deterministic HTML parser: <p>…</p> contents inside <body>,
    * inner tags stripped, standard entities decoded, each paragraph
    * whitespace-collapsed. No external parser library (zero-egress sandbox);
    * the subset handled matches the deterministic synthesis template and
    * common-crawl-style paragraph markup.
    */
  def paragraphs(html: String): Vector[String] = {
    val bodyStart = html.indexOf("<body")
    val from = if (bodyStart >= 0) html.indexOf('>', bodyStart) + 1 else 0
    val bodyEnd = html.lastIndexOf("</body>")
    val to = if (bodyEnd >= from) bodyEnd else html.length
    val body = html.substring(from, to)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < body.length) {
      val open = body.indexOf("<p", i)
      if (open < 0) { i = body.length }
      else {
        val openEnd = body.indexOf('>', open)
        if (openEnd < 0) { i = body.length }
        else {
          val close = body.indexOf("</p>", openEnd)
          val contentEnd = if (close < 0) body.length else close
          val raw = body.substring(openEnd + 1, contentEnd)
          val text = Text.normWs(decodeEntities(stripTags(raw)))
          if (text.nonEmpty) out += text
          i = if (close < 0) body.length else close + 4
        }
      }
    }
    out.result()
  }

  def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) sb.append(c)
      i += 1
    }
    sb.toString
  }

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
  }

  /** Dataset[Page] → Dataset[Segment]. seg_no restarts at 1 per page like
    * the reference's per-page renumbering (OllamaNERExtractor.py:192-198);
    * web pages are single-page so page=1 throughout.
    */
  def segments(pages: Dataset[Page]): Dataset[Segment] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // Project to (url, html) BEFORE the typed map: when pages come from a
    // parquet/Iceberg scan this lets Catalyst prune the fat `text` column
    // out of the read (ReadSchema carries only url+html).
    pages.select(org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (url, htmlBytes) =>
          val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
          paragraphs(html).zipWithIndex.map { case (t, i) =>
            Segment(url, page = 1, seg_no = i + 1, seg_type = "Text", text = t)
          }
        }
      }
  }

  /** Reconstructed page text = segment texts joined with one space — the
    * byte-identity invariant surface.
    */
  def extractedText(html: Array[Byte]): String =
    paragraphs(new String(html, java.nio.charset.StandardCharsets.UTF_8)).mkString(" ")

  /** pages → (url, extracted, expected) for invariant checking at scale. */
  def invariantViolations(spark: SparkSession, pages: Dataset[Page]): Dataset[String] = {
    import spark.implicits._
    pages.mapPartitions(_.collect {
      case p if extractedText(p.html) != p.text => p.url
    })
  }
}
