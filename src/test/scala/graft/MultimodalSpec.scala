package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode harness: schema, partition-wise codec
  * amortization, deterministic stub decode, frame sampling.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media records carry opaque bytes + typed metadata") {
    val m = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001)
    val schema = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("bytes") === "binary")
    assert(schema("kind") === "string")
    assert(schema("width") === "int" && schema("height") === "int")
    assert(m.count() === 500L)
  }

  test("decode runs once per partition, not per row") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001).repartition(3)
    Multimodal.StubCodec.inits.set(0)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 500)
    val inits = Multimodal.StubCodec.inits.get()
    assert(inits >= 3 && inits <= 6, // one per partition (± speculative retries)
      s"expected ~3 codec inits for 3 partitions, got $inits")
  }

  test("stub decode is deterministic and features are consistent") {
    val f1 = Multimodal.features(spark, TestSpark.sf0001)
      .orderBy("media_id").collect()
    val f2 = Multimodal.features(spark, TestSpark.sf0001)
      .orderBy("media_id").collect()
    assert(f1.map(_.getDouble(f1.head.fieldIndex("mean_byte"))).toSeq ===
      f2.map(_.getDouble(f2.head.fieldIndex("mean_byte"))).toSeq)
    // byte_len equals the documents' n_chars (utf8 ascii corpus)
    val r0 = f1.head
    assert(r0.getLong(r0.fieldIndex("media_id")) === 0L)
    assert(r0.getInt(r0.fieldIndex("byte_len")) > 0)
  }

  test("resize scales metadata exactly and resamples bytes deterministically") {
    val m = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001)
    val resized = Multimodal.resize(m, maxDim = 64).collect().toSeq
    val orig = m.collect().toSeq.sortBy(_.media_id)
    val rs = resized.sortBy(_.media_id)
    orig.zip(rs).foreach { case (o, r) =>
      val scale = math.max(1, math.max(o.width, o.height) / 64)
      assert(r.width === math.max(1, o.width / scale))
      assert(r.bytes.length === (o.bytes.length + scale - 1) / scale)
    }
    // deterministic
    val again = Multimodal.resize(m, maxDim = 64).collect().toSeq.sortBy(_.media_id)
    assert(again.map(_.bytes.toSeq) === rs.map(_.bytes.toSeq))
  }

  test("frame sampling: stride covers the clip, includes frame 0, caps at 4") {
    assert(Multimodal.sampleFrames(1) === Seq(0))
    assert(Multimodal.sampleFrames(4) === Seq(0, 1, 2, 3))
    assert(Multimodal.sampleFrames(10) === Seq(0, 2, 4, 6))
    assert(Multimodal.sampleFrames(0) === Seq.empty)
    assert(Multimodal.sampleFrames(100).length === 4)
  }
}
