package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("binary media column decodes to deterministic metadata per kind") {
    val meta = Multimodal.decode(Multimodal.media(spark, sfTiny)).cache()
    val rows = meta.collect()
    assert(rows.length == 500)
    rows.foreach { m =>
      assert(Set("image", "audio", "video").contains(m.kind))
      assert(m.width == m.n_bytes % 509 + 16)
      assert(m.height == (m.n_bytes * 7) % 389 + 16)
      assert(m.frames == m.n_bytes % 30 + 1)
    }
    // kinds cycle by doc_id
    rows.foreach { m =>
      val expected = (m.doc_id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(m.kind == expected)
    }
  }

  test("frame sampling explodes video rows only, stride 7") {
    val meta = Multimodal.decode(Multimodal.media(spark, sfTiny))
    val frames = Multimodal.sampleFrames(meta).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.getLong(1) % 7 == 0))
    val vids = meta.filter(col("kind") === "video").count()
    assert(frames.map(_.getLong(0)).distinct.length == vids)
  }
}
