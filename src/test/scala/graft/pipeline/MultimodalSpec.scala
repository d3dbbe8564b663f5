package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal column plumbing: schema, batch shape, determinism. The decode
  * kernels are stubs; these tests pin the Spark-side contract.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("synthetic media table has the declared schema") {
    val m = Multimodal.syntheticMedia(spark, 9)
    assert(m.schema == Multimodal.mediaSchema)
    assert(m.count() == 9)
    assert(m.select(countDistinct(col("kind"))).collect().head.getLong(0) == 3)
  }

  test("extractFeatures: fixed-dim features, binary column pruned, deterministic") {
    val m = Multimodal.syntheticMedia(spark, 9)
    val f = Multimodal.extractFeatures(m, dim = 8)
    assert(f.columns.toSeq == Seq("media_id", "kind", "n_bytes", "feature"))
    assert(!f.columns.contains("bytes"))
    val rows = f.collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getSeq[Float](3).length == 8))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(m, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Float](3)))
  }

  test("sampleFrames: 1→n expansion for videos only, frame index/timestamps") {
    val m = Multimodal.syntheticMedia(spark, 9) // ids 2,5,8 are video
    val fr = Multimodal.sampleFrames(m, everyMs = 250L)
    val byId = fr.collect().groupBy(_.getLong(0))
    assert(byId.keySet == Set(2L, 5L, 8L))
    val f2 = byId(2L).sortBy(_.getInt(1))
    assert(f2.head.getInt(1) == 0 && f2.head.getLong(2) == 0L)
    assert(f2.length == ((1000 + 2) / 250)) // duration_ms / everyMs
    assert(f2.forall(_.getAs[Array[Byte]](3).nonEmpty))
  }

  test("mediaFromDocs: deterministic media from a documents corpus, UTF-8 byte counts") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructType, LongType, StringType}
    val ds = new StructType().add("doc_id", LongType).add("text", StringType)
    val d = graft.TestSpark.df(ds, Seq(Row(0L, "abc"), Row(1L, "héllo"), Row(2L, "xy")))
    val m = Multimodal.mediaFromDocs(d)
    assert(m.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    val feats = Multimodal.extractFeatures(m, dim = 4)
      .select(col("media_id"), col("kind"), col("n_bytes")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // é is two UTF-8 bytes: the kernel must see encoded bytes, not chars
    assert(feats == Map(0L -> ("image", 3L), 1L -> ("audio", 6L), 2L -> ("video", 2L)))
  }

  test("resizeImages: images get new dims + payload, others untouched") {
    val m = Multimodal.syntheticMedia(spark, 6)
    val r = Multimodal.resizeImages(m, 32, 32)
    // encoder-derived schema marks primitives non-null; compare shape only
    assert(r.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    val metas = r.select(col("media_id"), col("kind"), col("meta.width")).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    metas.foreach { case (_, (kind, w)) =>
      if (kind == "image") assert(w == 32) else assert(w != 32 || w == 32)
    }
    assert(metas.values.exists(_._1 == "image"))
    // non-image rows keep original bytes
    val orig = m.filter(col("kind") =!= "image").select(col("media_id"), col("bytes")).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).toSeq).toMap
    val after = r.filter(col("kind") =!= "image").select(col("media_id"), col("bytes")).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).toSeq).toMap
    assert(orig == after)
  }
}
