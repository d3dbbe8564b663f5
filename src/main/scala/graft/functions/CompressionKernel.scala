package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text-quality signal (the Gopher/FineWeb-style filter:
  * machine-generated or boilerplate text deflates far better than natural
  * prose). Implemented as a native codegen'd expression over the JDK's
  * zlib Deflater — per-row, zero shuffle, runs at scan speed.
  *
  * Deliberately NOT a driver contract query: the DuckDB oracle has no
  * deflate, and a rows-only check would reintroduce the weaker gate the
  * round-6 state eliminated. The behavior contract lives in
  * `CompressionSignalSpec` (determinism, ordering on crafted corpora,
  * edge cases) instead.
  */
object CompressionKernel {

  /** Deflated byte length of `s`'s UTF-8 bytes (zlib level 6, raw deflate).
    * Thread-local Deflater: one native object per executor thread, reset per
    * row — no per-row allocation, no finalizer storm.
    */
  def deflatedLen(s: UTF8String): Long = {
    val d = localDeflater.get()
    d.reset()
    val bytes = s.getBytes
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  private val localDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val localBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflated length of the UTF-8 text as a column (long). */
  def deflatedLength(text: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(DeflatedLength(bridge.expression(text.cast("string"))))
  }

  /** Compression ratio in (0, ~1.1]: deflated bytes / original bytes.
    * Lower = more redundant. Empty text maps to 1.0 (uncompressible by
    * convention) so downstream threshold filters never divide by zero.
    */
  def compressionRatio(text: Column): Column = {
    val blen = octet_length(text).cast("double")
    when(blen === 0d, lit(1.0d))
      .otherwise(deflatedLength(text).cast("double") / blen)
  }
}

/** Native fused expression: UTF-8 string → deflated byte count. Stays in
  * whole-stage codegen via `defineCodeGen` (same shape as
  * [[PortableHash60]]).
  */
case class DeflatedLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflated_length"

  override def nullSafeEval(input: Any): Any =
    CompressionKernel.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionKernel.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
