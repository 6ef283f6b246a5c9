package graft.llm

/** Pure-JVM codec for binary PGM (P5) — the uncompressed grayscale
  * format shaped like the reference's MNIST pixel data
  * (`/root/reference/README.md:2`; reference lines carry 0-255
  * grayscale ints, `rbmmapper.java:86-92`). No codec libraries exist
  * in this environment, but P5 is just an ASCII header + raw bytes, so
  * a real parser is ~40 lines: this replaces the round-2 stub decoder
  * and makes the multimodal feature-extraction path (q45) genuinely
  * decode images end-to-end.
  *
  * Format: `P5 <ws> width <ws> height <ws> maxval <single-ws> pixels`,
  * where `<ws>` is any whitespace run and `#` starts a to-end-of-line
  * comment (per the netpbm spec). Only maxval ≤ 255 (1 byte/pixel) is
  * supported — MNIST-shaped data never needs 16-bit.
  */
object PgmCodec {

  final case class Pgm(width: Int, height: Int, maxVal: Int,
      pixels: Array[Int])

  /** Encode grayscale pixels (0-255, row-major) as a P5 image. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"expected ${width * height} pixels, got ${pixels.length}")
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      require(p >= 0 && p <= 255, s"pixel $p out of range at $i")
      out(header.length + i) = p.toByte
      i += 1
    }
    out
  }

  /** Decode a P5 image; throws IllegalArgumentException on anything
    * malformed (bad magic, truncated payload, maxval > 255).
    */
  def decode(bytes: Array[Byte]): Pgm = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PGM: $msg (at byte $pos)")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def token(): Int = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (pos == start) fail("missing header token")
      var v = 0
      var i = start
      while (i < pos) {
        val c = bytes(i)
        if (c < '0' || c > '9') fail(s"non-digit '${c.toChar}' in header")
        v = v * 10 + (c - '0')
        if (v > (1 << 24)) fail("header value overflow")
        i += 1
      }
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5')
      fail("not a P5 PGM (bad magic)")
    pos = 2
    val width = token()
    val height = token()
    val maxVal = token()
    if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
    if (maxVal <= 0 || maxVal > 255) fail(s"unsupported maxval $maxVal")
    // exactly ONE whitespace byte separates maxval from the payload
    // (any more would be pixel data)
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing payload separator")
    pos += 1
    val n = width * height
    if (bytes.length - pos < n)
      fail(s"truncated payload: need $n bytes, have ${bytes.length - pos}")
    val px = new Array[Int](n)
    var i = 0
    while (i < n) { px(i) = bytes(pos + i) & 0xff; i += 1 }
    Pgm(width, height, maxVal, px)
  }
}
