package graft.pipeline

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("decode pipeline emits one feature row per media item, deterministic") {
    val df = Multimodal.decodeFeatures.run(spark, sf0001)
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "checksum", "brightness"))
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getInt(1) > 0))
    assert(rows.forall { r =>
      val bright = r.getDouble(5)
      bright >= 0.0 && bright < 1.0
    })
    val again = Multimodal.decodeFeatures.run(spark, sf0001).collect()
    assert(rows.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq ==
      again.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq)
  }
}
