package graft.ext

/** A REAL image codec in pure JVM: binary PPM (P6), the netpbm raw RGB
  * format — `"P6\n<w> <h>\n<maxval>\n"` header followed by w·h·3 raw
  * bytes. No native libraries needed, so this container can exercise a
  * genuine decode → pixel-math → re-encode path (the other formats stay
  * behind the documented stub until a codec lib exists).
  */
object Ppm {

  /** Decoded RGB image; `pixels` is row-major interleaved RGB. */
  case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    require(pixels.length.toLong == width.toLong * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
    def at(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * 3
      ((pixels(i) & 0xFF), (pixels(i + 1) & 0xFF), (pixels(i + 2) & 0xFF))
    }
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Strict P6 decode: magic, dimensions, maxval 255, exact payload
    * length. Whitespace per the netpbm spec (incl. `#` comments). */
  def decode(payload: Array[Byte]): Image = {
    var pos = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"not a P6 ppm: $msg (at byte $pos)")
    def skipSpace(): Unit = {
      var in = true
      while (in && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      val start = pos
      while (pos < payload.length && payload(pos).toChar.isDigit) pos += 1
      if (pos == start) fail("expected integer")
      new String(payload, start, pos - start, "US-ASCII").toInt
    }
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') fail("bad magic")
    pos = 2
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    // bound dims BEFORE multiplying: crafted headers like "1431655766 1"
    // would overflow w*h*3 back into a small positive int and defeat the
    // raster-length check below (empty images are rejected too — feature
    // math divides by the pixel count)
    if (w < 1 || h < 1 || w > 65535 || h > 65535) fail(s"bad dimensions ${w}x$h")
    if (pos >= payload.length || !payload(pos).toChar.isWhitespace)
      fail("missing whitespace after maxval")
    pos += 1 // exactly ONE whitespace byte separates header from raster
    val need = w.toLong * h * 3
    if ((payload.length - pos).toLong != need)
      fail(s"raster is ${payload.length - pos} bytes, need $need for ${w}x$h")
    val px = new Array[Byte](need.toInt)
    System.arraycopy(payload, pos, px, 0, need.toInt)
    Image(w, h, px)
  }

  /** Nearest-neighbor resample — real pixel-grid arithmetic, the shape a
    * production bilinear kernel drops into. */
  def resizeNearest(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW >= 1 && targetH >= 1, "target dims must be >= 1")
    val out = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val sy = math.min(img.height - 1, (y.toLong * img.height / targetH).toInt)
      var x = 0
      while (x < targetW) {
        val sx = math.min(img.width - 1, (x.toLong * img.width / targetW).toInt)
        val si = (sy * img.width + sx) * 3
        val di = (y * targetW + x) * 3
        out(di) = img.pixels(si); out(di + 1) = img.pixels(si + 1); out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, out)
  }

  /** Real pixel statistics: per-channel mean and stddev (6), an 8-bin
    * luminance histogram (8, normalized), width and height (2) = 16
    * floats. Deterministic, resolution-independent ordering. */
  def features(img: Image): Array[Float] = {
    val n = img.width * img.height
    val sums = new Array[Double](3); val sqs = new Array[Double](3)
    val hist = new Array[Double](8)
    var i = 0
    while (i < n) {
      val r = img.pixels(i * 3) & 0xFF
      val g = img.pixels(i * 3 + 1) & 0xFF
      val b = img.pixels(i * 3 + 2) & 0xFF
      sums(0) += r; sums(1) += g; sums(2) += b
      sqs(0) += r * r; sqs(1) += g * g; sqs(2) += b * b
      val lum = (0.299 * r + 0.587 * g + 0.114 * b).toInt
      hist(math.min(7, lum / 32)) += 1
      i += 1
    }
    val out = new Array[Float](16)
    var c = 0
    while (c < 3) {
      val mean = sums(c) / n
      out(c) = mean.toFloat
      out(3 + c) = math.sqrt(math.max(0.0, sqs(c) / n - mean * mean)).toFloat
      c += 1
    }
    var k = 0
    while (k < 8) { out(6 + k) = (hist(k) / n).toFloat; k += 1 }
    out(14) = img.width.toFloat; out(15) = img.height.toFloat
    out
  }
}
