package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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

  test("imageInfo parses REAL png/jpeg/gif/bmp headers; garbage unrecognized") {
    import org.apache.spark.sql.Row
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](24)
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte).copyToArray(b, 0)
      // 4-byte IHDR length (13) + "IHDR"
      b(11) = 13; b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
      def be32(v: Int, off: Int): Unit = (0 until 4).foreach(i => b(off + i) = (v >>> (24 - 8 * i)).toByte)
      be32(w, 16); be32(h, 20); b
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      // SOI, APP0 (len 4, empty), SOF0 (len 11)
      val b = scala.collection.mutable.ArrayBuffer[Byte]()
      b ++= Seq(0xFF, 0xD8).map(_.toByte)
      b ++= Seq(0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00).map(_.toByte) // APP0 segment
      b ++= Seq(0xFF, 0xC0, 0x00, 0x0B, 0x08).map(_.toByte)       // SOF0, precision
      b ++= Seq((h >>> 8), h & 0xFF, (w >>> 8), w & 0xFF, 0x01).map(_.toByte)
      b ++= Seq(0x01, 0x11, 0x00).map(_.toByte)
      b.toArray
    }
    def gif(w: Int, h: Int): Array[Byte] =
      ("GIF89a".getBytes ++ Array((w & 0xFF).toByte, (w >>> 8).toByte,
        (h & 0xFF).toByte, (h >>> 8).toByte, 0.toByte, 0.toByte, 0.toByte))
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](26)
      b(0) = 'B'; b(1) = 'M'
      def le32(v: Int, off: Int): Unit = (0 until 4).foreach(i => b(off + i) = (v >>> (8 * i)).toByte)
      le32(w, 18); le32(-h, 22); b // negative height = top-down BMP; parsed as |h|
    }
    val st = new StructType().add("media_id", LongType).add("kind", StringType).add("bytes", BinaryType)
    val d = df(st, Seq(
      Row(1L, "image", png(640, 480)), Row(2L, "image", jpeg(1920, 1080)),
      Row(3L, "image", gif(320, 200)), Row(4L, "image", bmp(100, 50)),
      Row(5L, "image", Array.tabulate[Byte](40)(_.toByte))))
    val got = Multimodal.imageInfo(d).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(2)), Option(r.get(3)), Option(r.get(4)), r.getBoolean(5))).toMap
    assert(got(1L) == ((Some("png"), Some(640), Some(480), true)))
    assert(got(2L) == ((Some("jpeg"), Some(1920), Some(1080), true)))
    assert(got(3L) == ((Some("gif"), Some(320), Some(200), true)))
    assert(got(4L) == ((Some("bmp"), Some(100), Some(50), true)))
    assert(got(5L) == ((None, None, None, false)))
  }
}
