package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms.
  *
  * The *decode kernels are STUBS* — this container has no image/audio
  * codecs, so `decodeStub` derives a deterministic fake feature/pixel
  * payload from the bytes. Everything around the kernel is the real Spark
  * shape and is what matters at scale:
  *  - schema: `media_id BIGINT, kind STRING, bytes BINARY,
  *    meta STRUCT<width INT, height INT, sample_rate INT, duration_ms BIGINT>`
  *  - `mapPartitions` over a typed Dataset (the Scala analog of
  *    `mapInPandas`): one JVM-side batch per partition, no per-row UDF
  *    dispatch, output schema declared up front;
  *  - partition-local work ⇒ no shuffle; decode parallelism = partitions;
  *  - binary payloads are never shuffled by these transforms — only the
  *    extracted (small) features move downstream.
  */
object Multimodal {

  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("kind", StringType) // image | audio | video
    .add("bytes", BinaryType)
    .add("meta", new StructType()
      .add("width", IntegerType).add("height", IntegerType)
      .add("sample_rate", IntegerType).add("duration_ms", LongType))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, sample_rate: Int, duration_ms: Long)
  final case class FeatureRow(media_id: Long, kind: String, n_bytes: Long,
                              feature: Array[Float])

  /** Deterministic synthetic media table (for tests/demos): payload bytes
    * are a seeded function of media_id, metadata plausible per kind.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = spark.sparkContext.parallelize(0 until n, math.min(4, n)).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + (i % 17) * 8)(j => ((i * 31 + j * 7) % 251).toByte)
      Row(i.toLong, kind, bytes, Row(64 + i % 3, 48, 16000, 1000L + i))
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic media table derived from a documents corpus: the binary
    * payload is the UTF-8 encoding of the text (a stand-in for real codec
    * bytes), kind cycles by doc_id, metadata is a pure function of doc_id.
    * Because every column is a deterministic function of the source table,
    * pipelines built on it (e.g. the media_features contract query) are
    * checkable by the DuckDB oracle — `octet_length(encode(text))` must
    * equal the byte count the partition-local kernel observes.
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast(IntegerType) + 1).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (lit(64) + (col("doc_id") % 3)).cast(IntegerType).as("width"),
        lit(48).cast(IntegerType).as("height"),
        lit(16000).cast(IntegerType).as("sample_rate"),
        (lit(1000L) + col("doc_id")).as("duration_ms"))
        .cast(mediaSchema("meta").dataType).as("meta"))

  /** REAL header inspection (not a stub — pure byte parsing, see
    * `graft.functions.MediaKernels`): container format + pixel dimensions
    * from PNG/JPEG/GIF/BMP headers, null for unrecognized payloads. The
    * triage/validation projection a multimodal ingest runs in the scan
    * stage — reject or route blobs before any expensive decode.
    * Output: (media_id, kind, format, width, height, recognized).
    */
  def imageInfo(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val hdr = bridge.column(graft.functions.ImageHeader(bridge.expression(col("bytes"))))
    media.select(col("media_id"), col("kind"), hdr.as("h"))
      .select(col("media_id"), col("kind"),
        col("h.format").as("format"), col("h.width").as("width"),
        col("h.height").as("height"), col("h").isNotNull.as("recognized"))
  }

  /** STUB decode kernel: a real implementation would hand `bytes` to an
    * image/audio codec here. The fake is deterministic in the payload so
    * tests can assert on it: feature[j] = normalized byte statistics of
    * stripe j.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var j = 0
    while (j < bytes.length) { out(j % dim) += (bytes(j) & 0xFF) / 255.0f; j += 1 }
    val norm = math.max(1, bytes.length / dim)
    (0 until dim).foreach(i => out(i) /= norm)
    out
  }

  /** Decode + feature-extract: binary column → fixed-dim float feature.
    * Partition-local batches via `mapPartitions` (the Pandas-UDF shape);
    * the binary column is pruned away after this operator.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.select(
      col("media_id"), col("kind"), col("bytes"),
      col("meta.width"), col("meta.height"), col("meta.sample_rate"), col("meta.duration_ms"))
      .as[MediaRow]
    ds.mapPartitions { it =>
      // one batch per partition: amortized setup (a real codec would open
      // its context once here), streaming through rows
      it.map(m => FeatureRow(m.media_id, m.kind, m.bytes.length.toLong,
        decodeStub(m.bytes, dim)))
    }.toDF()
  }

  /** Frame-sample a video payload every `everyMs` ms: 1→n rows per input —
    * the Lara Ext shape, expressed through the DSL's typed escape hatch
    * (`LaraTable.extF`, the reference `ExtFun` in full generality,
    * `api/Schema.kt:229-250`): a real codec's frame extraction is arbitrary
    * imperative logic no generator expression can state. Frame payload is
    * STUB-sliced from the source bytes.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 250L): DataFrame = {
    import graft.lara.{LaraTable, LaraSchema, ValSpec}
    val videos = media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"), col("meta.duration_ms").as("duration_ms"))
    val t = LaraTable(videos, LaraSchema(Seq("media_id"),
      Seq(ValSpec("bytes", BinaryType, null), ValSpec("duration_ms", LongType, null))))
    t.extF(Seq("frame_idx" -> IntegerType),
      Seq(ValSpec("frame_ms", LongType, null), ValSpec("frame_bytes", BinaryType, null))) { row =>
      val bytes = row.getAs[Array[Byte]]("bytes")
      val durationMs = row.getAs[Long]("duration_ms")
      val nFrames = math.max(1, (durationMs / everyMs).toInt)
      (0 until nFrames).iterator.map { f =>
        val start = (f * bytes.length / nFrames) min (bytes.length - 1)
        val end = ((f + 1) * bytes.length / nFrames) min bytes.length
        Row(f, f * everyMs, bytes.slice(start, end)) // STUB frame decode
      }
    }.df
  }

  /** "Resize" images: STUB re-encode to a payload whose metadata reflects
    * the new dimensions — exercises the binary-in/binary-out column shape.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media.select(
      col("media_id"), col("kind"), col("bytes"),
      col("meta.width"), col("meta.height"), col("meta.sample_rate"), col("meta.duration_ms"))
      .as[MediaRow]
    ds.map { m =>
      if (m.kind != "image") m
      else {
        val scaled = decodeStub(m.bytes, math.max(1, w * h / 64)).map(f => (f * 255).toByte) // STUB resample
        m.copy(bytes = scaled, width = w, height = h)
      }
    }.toDF()
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("width"), col("height"), col("sample_rate"), col("duration_ms"))
          .cast(mediaSchema("meta").dataType).as("meta")) // canonical (nullable) meta type
  }
}
