package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL (non-stub) image header inspection: container format and pixel
  * dimensions parsed directly from the payload's header bytes — PNG IHDR,
  * JPEG SOFn marker scan, GIF logical screen descriptor, BMP info header.
  * Pure byte arithmetic, no codec library, so it runs in this container
  * against genuine image bytes; unrecognized/truncated payloads yield
  * null (the row survives, the caller filters or routes on it).
  *
  * This is the validation/triage half of a multimodal pipeline — "is this
  * blob a plausible image and what size" — which at 100 TB runs as a
  * codegen'd projection in the scan stage, long before any expensive
  * decode (image decode proper is `Multimodal.decodeImage`, real via the
  * JDK's ImageIO; audio/video kernels remain stubbed).
  */
object MediaKernels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  /** (format, width, height) or null if not a recognized image header. */
  def imageHeader(b: Array[Byte]): InternalRow = {
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      // scan marker segments for a start-of-frame (C0–CF minus C4/C8/CC)
      var i = 2
      while (i + 1 < b.length && u8(b, i) == 0xFF) {
        // the spec allows any number of 0xFF fill/padding bytes before a
        // marker — skip them, else a padded FF would be misread as a
        // segment whose "length" is the next marker byte
        while (i + 1 < b.length && u8(b, i + 1) == 0xFF) i += 1
        if (i + 1 >= b.length) return null
        val m = u8(b, i + 1)
        val sof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (sof) return if (i + 9 <= b.length) row("jpeg", be16(b, i + 7), be16(b, i + 5)) else null
        if (m >= 0xD0 && m <= 0xD9) i += 2 // standalone markers (RSTn/SOI/EOI)
        else {
          if (i + 4 > b.length) return null
          val len = be16(b, i + 2)
          if (len < 2) return null // malformed: segment length includes itself
          i += 2 + len
        }
      }
      return null
    }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      // height is SIGNED 32-bit and negative for top-down rows
      return row("bmp", le32(b, 18), math.abs(le32(b, 22).toInt).toLong)
    null
  }

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))
}

/** binary → struct<format string, width int, height int>, null when the
  * payload is not a recognized image.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = new StructType()
    .add("format", StringType).add("width", IntegerType).add("height", IntegerType)
  override def nullable: Boolean = true
  override def prettyName: String = "image_header"

  override def nullSafeEval(input: Any): Any =
    MediaKernels.imageHeader(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MediaKernels.imageHeader($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
