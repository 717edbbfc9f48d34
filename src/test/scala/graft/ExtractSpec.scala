package graft

import graft.extract.Extract
import graft.sources.Pages

class ExtractSpec extends SparkSpec {

  test("HTML→text extraction is byte-identical to the text column per url (input_hint invariant)") {
    val pages = Pages.synthesize(spark, sfTiny)
    val violations = Extract.invariantViolations(spark, pages).collect()
    assert(violations.isEmpty, s"byte-identity violated for: ${violations.take(5).mkString(", ")}")
  }

  test("paragraph parser handles entities, nested tags, missing body") {
    assert(Extract.paragraphs("<html><body><p>a  b</p><p>c</p></body></html>") == Vector("a b", "c"))
    assert(Extract.paragraphs("<p>x &amp; y</p>") == Vector("x & y"))
    assert(Extract.paragraphs("<body><p>a <b>bold</b> c</p></body>") == Vector("a bold c"))
    assert(Extract.paragraphs("<body class=\"x\"><p id=\"1\">t</p></body>") == Vector("t"))
    assert(Extract.paragraphs("<html><body></body></html>") == Vector())
    assert(Extract.paragraphs("<p></p><p>  </p><p>k</p>") == Vector("k"))
  }

  test("segments restart seg_no at 1 per page and preserve order") {
    val segs = Extract.segments(Pages.synthesize(spark, sfTiny))
    val one = segs.filter(_.url == Pages.urlOf(0)).collect().sortBy(_.seg_no)
    assert(one.nonEmpty)
    assert(one.head.seg_no == 1)
    assert(one.map(_.seg_no).toSeq == (1 to one.length))
    // reconstructed text == page text
    val expected = Pages.pageText(0, rawText(0))
    assert(one.map(_.text).mkString(" ") == expected)
  }

  private def rawText(docId: Long): String = {
    import spark.implicits._
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter($"doc_id" === docId).select("text").as[String].head()
  }
}
