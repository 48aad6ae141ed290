package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header parse of a pure-JVM-decodable uncompressed image payload —
  * REAL decode for the formats a JVM can read without codecs
  * (uncompressed BMP, binary netpbm P5/P6), as a native codegen'd
  * expression so metadata extraction over a 100 TB payload column runs
  * inside the scan's whole-stage-codegen, touching only the first bytes
  * of each payload. Returns `struct(format, width, height, channels)`,
  * or NULL when the payload is not one of the recognized formats
  * (callers fall back to the md5 stub — MultimodalOps scaladoc).
  *
  * Format notes (public file-format specs, not codec work):
  *  - BMP: little-endian BITMAPINFOHEADER — pixel offset at byte 10,
  *    width/height at 18/22 (height sign = row order), bpp at 28,
  *    compression field at 30 must be 0 (BI_RGB), rows 4-byte aligned.
  *  - netpbm: `P6` (RGB) / `P5` (gray) magic, ASCII ints for width,
  *    height, maxval (≤255 = single-byte samples), `#` comments allowed
  *    in the header, one whitespace byte before the raster.
  * Both parsers validate that the declared raster actually fits in the
  * payload — truncated files are unrecognized, not garbage rows.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got $t")
    }

  override def dataType: DataType = ImageHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_header"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeader.parseToRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageHeader.parseToRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Parsed geometry of a recognized payload. `dataOffset`/`rowStride`/
    * `bottomUp` locate raw pixels for [[luminance]]; `bgr` marks BMP's
    * blue-first sample order.
    */
  final class Info(val format: String, val width: Int, val height: Int,
      val channels: Int, val dataOffset: Int, val rowStride: Int,
      val bottomUp: Boolean, val bgr: Boolean)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val MaxDim = 1 << 16

  /** Parse a payload's image header; null when not a recognized
    * uncompressed format (the stub-fallback signal). Shared by the
    * interpreted eval, the generated code, and the pixel-feature
    * extractor's mapPartitions loop.
    */
  def parse(b: Array[Byte]): Info = {
    val bmp = parseBmp(b)
    if (bmp != null) bmp else parseNetpbm(b)
  }

  private def parseBmp(b: Array[Byte]): Info = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le32(b, 10)
    val headerSize = le32(b, 14)
    if (headerSize < 40) return null // BITMAPCOREHEADER etc. — out of scope
    val width = le32(b, 18)
    val heightRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0) return null // only BI_RGB (uncompressed)
    val channels = bpp match {
      case 8 => 1; case 24 => 3; case 32 => 4; case _ => return null
    }
    val height = math.abs(heightRaw)
    if (width <= 0 || height <= 0 || width > MaxDim || height > MaxDim) return null
    val rowStride = ((width * channels) + 3) / 4 * 4
    if (dataOffset < 54 || dataOffset.toLong + rowStride.toLong * height > b.length)
      return null // truncated raster → unrecognized, not garbage
    new Info("bmp", width, height, channels, dataOffset, rowStride,
      bottomUp = heightRaw > 0, bgr = true)
  }

  private def parseNetpbm(b: Array[Byte]): Info = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return null
    val channels = if (b(1) == '6') 3 else 1
    var i = 2
    // read 3 ASCII ints, skipping whitespace and '#' comment lines
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < b.length &&
          (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r' || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      if (i >= b.length || b(i) < '0' || b(i) > '9') return null
      var n = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        n = n * 10 + (b(i) - '0'); if (n > Int.MaxValue) return null
        i += 1
      }
      vals(v) = n.toInt; v += 1
    }
    val Array(width, height, maxval) = vals
    if (i >= b.length) return null
    i += 1 // exactly ONE whitespace byte separates header and raster
    if (width <= 0 || height <= 0 || width > MaxDim || height > MaxDim) return null
    if (maxval <= 0 || maxval > 255) return null // 2-byte samples: out of scope
    val rowStride = width * channels
    if (i.toLong + rowStride.toLong * height > b.length) return null
    new Info(if (channels == 3) "ppm" else "pgm", width, height, channels,
      i, rowStride, bottomUp = false, bgr = false)
  }

  /** Luminance (0-255, BT.601 integer weights) of pixel (x, y) from the
    * raw payload — the decode primitive the grid featurizer samples.
    */
  def luminance(b: Array[Byte], info: Info, x: Int, y: Int): Int = {
    val row = if (info.bottomUp) info.height - 1 - y else y
    val p = info.dataOffset + row * info.rowStride + x * info.channels
    if (info.channels == 1) b(p) & 0xff
    else {
      val (r, g, bl) =
        if (info.bgr) ((b(p + 2) & 0xff), (b(p + 1) & 0xff), (b(p) & 0xff))
        else ((b(p) & 0xff), (b(p + 1) & 0xff), (b(p + 2) & 0xff))
      (r * 299 + g * 587 + bl * 114) / 1000
    }
  }

  /** `dim`-length feature vector from REAL pixel bytes: the image
    * downsampled to a ⌈√dim⌉² luminance grid (nearest-pixel sampling),
    * flattened row-major, each value scaled to [-1, 1] — the classic
    * pixel-intensity embedding, shaped exactly like the md5 stub so the
    * ANN/dedup operators downstream are oblivious to which path ran.
    */
  def gridFeatures(b: Array[Byte], info: Info, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    Array.tabulate(dim) { k =>
      val gx = k % g; val gy = k / g
      val x = math.min(info.width - 1, (gx * info.width + info.width / 2) / g)
      val y = math.min(info.height - 1, (gy * info.height + info.height / 2) / g)
      (luminance(b, info, x, y) / 255.0f) * 2.0f - 1.0f
    }
  }

  /** Shared by interpreted eval and generated code. */
  def parseToRow(bytes: Array[Byte]): InternalRow = {
    val info = parse(bytes)
    if (info == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(info.format),
        info.width, info.height, info.channels))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(ImageHeader(GraftColumnBridge.expression(c)))
}
