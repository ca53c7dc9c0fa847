package graft.multimodal

/**
 * Pure-JVM baseline JPEG decoder (ITU-T T.81 baseline sequential DCT,
 * Huffman entropy coding) — the last image format that rode the
 * `javax.imageio` fallback. Covers the overwhelming majority of real
 * corpora: SOF0/SOF1 frames, 8-bit samples, 1 (grayscale) or 3 (YCbCr)
 * components at any of the standard sampling factors (4:4:4, 4:2:2,
 * 4:2:0, 4:1:1), restart markers, 8- and 16-bit quantization tables.
 * Anything else — progressive (SOF2), arithmetic coding, 12-bit,
 * CMYK/4-component — returns null and [[PixelDecoder.decode]] falls back
 * to ImageIO, exactly like the other decoders' unsupported corners.
 *
 * Decode pipeline per the public spec: marker walk → per-MCU Huffman
 * block decode (DECODE/RECEIVE/EXTEND of T.81 F.2.2) → dequantize in
 * zigzag order → separable 8x8 float IDCT → +128 level shift → nearest-
 * neighbor chroma upsample → JFIF YCbCr→RGB. Hot loops are allocation-
 * free per block; like the PNG/GIF/BMP decoders this runs batched inside
 * `mapPartitions`, a narrow map at any scale.
 *
 * Note JPEG decoding is not bit-exact across implementations (the spec
 * bounds IDCT error, it does not fix it): outputs may differ from
 * ImageIO by a couple of code values per sample, which is why the spec
 * pins agreement within a tolerance, not equality.
 */
object Jpeg {
  import PixelDecoder.Pixels

  def decode(bytes: Array[Byte]): Pixels =
    try decode0(bytes)
    catch { case _: Exception => null }

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // 8x8 DCT basis: C(u) * cos((2x+1) u pi / 16) / 2, so an 8x1 IDCT is a
  // plain matrix product with this
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table, decoded with T.81 F.16's
   * mincode/maxcode/valptr walk. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var code = br.bit()
      while (maxCode(len) < 0 || code > maxCode(len)) {
        code = (code << 1) | br.bit()
        len += 1
        if (len > 16) throw new IllegalStateException("bad huffman code")
      }
      vals(valPtr(len) + code - minCode(len)) & 0xFF
    }
  }

  /** Entropy-segment bit reader: handles 0xFF00 stuffing; stops at any
   * real marker (the MCU loop consumes RSTn explicitly via reset()). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) throw new IllegalStateException("eof in entropy data")
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          val m = if (pos < b.length) b(pos) & 0xFF else 0xD9
          if (m == 0x00) pos += 1 // stuffed byte
          else {
            // real marker inside entropy data: missing-sample territory —
            // feed zero bits so truncated streams decode what they have
            pos -= 1
            v = 0
          }
        }
        acc = v
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** T.81 EXTEND: map a RECEIVEd magnitude to its signed value. */
    def extend(v: Int, n: Int): Int =
      if (n == 0) 0
      else if (v < (1 << (n - 1))) v - (1 << n) + 1
      else v
    /** Byte-align and consume an expected RSTn marker. The modulo-8
     * sequence number is CHECKED (E.1.4 cycles D0..D7): a dropped or
     * duplicated restart marker would otherwise resync to the wrong
     * interval and decode misaligned MCUs as plausible-looking garbage —
     * throwing instead routes the stream to the ImageIO fallback. */
    def restart(expected: Int): Unit = {
      cnt = 0
      // skip any fill bytes up to the marker
      while (pos + 1 < b.length && !((b(pos) & 0xFF) == 0xFF &&
        ((b(pos + 1) & 0xFF) >= 0xD0 && (b(pos + 1) & 0xFF) <= 0xD7))) pos += 1
      if (pos + 1 < b.length) {
        val n = (b(pos + 1) & 0xFF) - 0xD0
        if (n != expected) throw new IllegalStateException(
          s"restart marker out of sequence: expected RST$expected, got RST$n")
        pos += 2
      }
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0
    var acTab = 0
    var pred = 0 // DC predictor
    var plane: Array[Byte] = _
    var planeW = 0
    var planeH = 0
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def decode0(b: Array[Byte]): Pixels = {
    if (b == null || b.length < 4 ||
      b(0) != 0xFF.toByte || b(1) != 0xD8.toByte) return null
    val quant = new Array[Array[Int]](4)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var adobeTransform = -1
    var pos = 2
    while (pos + 3 < b.length) {
      if (b(pos) != 0xFF.toByte) return null
      // fill bytes: any number of 0xFF may pad before a marker (B.1.1.2)
      while (pos + 2 < b.length && b(pos + 1) == 0xFF.toByte) pos += 1
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { pos += 2 }
      else if (marker == 0xD9) return null // EOI before any scan
      else {
        val len = u16(b, pos + 2)
        val seg = pos + 4
        marker match {
          case 0xC0 | 0xC1 => // baseline / extended sequential (huffman)
            if ((b(seg) & 0xFF) != 8) return null // 12-bit not supported
            height = u16(b, seg + 1)
            width = u16(b, seg + 3)
            val n = b(seg + 5) & 0xFF
            if (n != 1 && n != 3) return null // CMYK etc -> ImageIO
            comps = Array.tabulate(n) { i =>
              val o = seg + 6 + 3 * i
              Component(b(o) & 0xFF, (b(o + 1) & 0xFF) >> 4,
                b(o + 1) & 0x0F, b(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
              return null
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null // progressive/lossless/arithmetic -> ImageIO
          case 0xC4 => // DHT — possibly several tables in one segment
            var o = seg
            while (o < seg + len - 2) {
              val tc = (b(o) & 0xFF) >> 4
              val th = b(o) & 0x0F
              val counts = Array.tabulate(16)(i => b(o + 1 + i) & 0xFF)
              val total = counts.sum
              val vals = java.util.Arrays.copyOfRange(b, o + 17, o + 17 + total)
              if (tc == 0) dcHuff(th) = new Huff(counts, vals)
              else acHuff(th) = new Huff(counts, vals)
              o += 17 + total
            }
          case 0xDB => // DQT — possibly several tables in one segment
            var o = seg
            while (o < seg + len - 2) {
              val pq = (b(o) & 0xFF) >> 4
              val tq = b(o) & 0x0F
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(i) = if (pq == 0) b(o + 1 + i) & 0xFF
                  else u16(b, o + 1 + 2 * i)
                i += 1
              }
              quant(tq) = t
              o += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xDD =>
            restartInterval = u16(b, seg)
          case 0xEE => // APP14 (Adobe): transform 0 = components are RGB
            if (len >= 14 && b(seg) == 'A' && b(seg + 1) == 'd' &&
              b(seg + 2) == 'o' && b(seg + 3) == 'b' && b(seg + 4) == 'e')
              adobeTransform = b(seg + 11) & 0xFF
          case 0xDA => // SOS — start the one (sequential) scan
            if (comps == null || width <= 0 || height <= 0) return null
            // Adobe transform=0 stores raw RGB — our YCbCr matrix would
            // scramble it; let ImageIO (which honors APP14) handle it
            if (comps.length == 3 && adobeTransform == 0) return null
            val ns = b(seg) & 0xFF
            if (ns != comps.length) return null
            // MCU interleave follows the SCAN's component order; color
            // conversion below uses the FRAME order (Y first)
            val scanOrder = new Array[Component](ns)
            var i = 0
            while (i < ns) {
              val cid = b(seg + 1 + 2 * i) & 0xFF
              val c = comps.find(_.id == cid).getOrElse(return null)
              c.dcTab = (b(seg + 2 + 2 * i) & 0xFF) >> 4
              c.acTab = b(seg + 2 + 2 * i) & 0x0F
              scanOrder(i) = c
              i += 1
            }
            return decodeScan(b, pos + 4 + len - 2, comps, scanOrder, quant,
              dcHuff, acHuff, width, height, restartInterval)
          case _ => // APPn / COM / others: skip
        }
        pos += 4 + len - 2
      }
    }
    null
  }

  private def decodeScan(b: Array[Byte], scanStart: Int,
      comps: Array[Component], scanOrder: Array[Component],
      quant: Array[Array[Int]],
      dcHuff: Array[Huff], acHuff: Array[Huff],
      width: Int, height: Int, restartInterval: Int): Pixels = {
    // a ONE-component scan is non-interleaved per T.81 A.2: one data unit
    // per MCU on a ceil(w/8) x ceil(h/8) grid, whatever sampling factors
    // the frame header declares (they only govern multi-component
    // interleave) — honoring the declared 2x2 here would decode 4x the
    // blocks the stream holds and return silent garbage
    val single = comps.length == 1
    def hOf(c: Component): Int = if (single) 1 else c.h
    def vOf(c: Component): Int = if (single) 1 else c.v
    val hMax = comps.map(hOf).max
    val vMax = comps.map(vOf).max
    // the color conversion below samples Y at full resolution: a legal-
    // but-exotic stream with chroma sampled ABOVE luma goes to ImageIO
    if (!single && (hOf(comps(0)) != hMax || vOf(comps(0)) != vMax)) return null
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // validate BEFORE allocating, and bound the total allocation: a
    // handful of crafted header bytes must not drive multi-GB plane
    // allocations (an OutOfMemoryError would kill the task instead of
    // falling back)
    var totalBytes = width.toLong * height * 3
    comps.foreach { c =>
      if (quant(c.tq) == null || dcHuff(c.dcTab) == null ||
        acHuff(c.acTab) == null) return null
      totalBytes += mcusX.toLong * hOf(c) * 8 * mcusY * vOf(c) * 8
    }
    if (totalBytes > (1L << 30)) return null
    comps.foreach { c =>
      c.planeW = mcusX * hOf(c) * 8
      c.planeH = mcusY * vOf(c) * 8
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }
    val br = new BitReader(b, scanStart)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val block = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart((mcu / restartInterval - 1) & 7)
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < scanOrder.length) {
        val c = scanOrder(ci)
        val qt = quant(c.tq)
        val dh = dcHuff(c.dcTab)
        val ah = acHuff(c.acTab)
        var by = 0
        while (by < vOf(c)) {
          var bx = 0
          while (bx < hOf(c)) {
            // ---- Huffman block decode (T.81 F.2.2) ----
            java.util.Arrays.fill(coef, 0)
            val t = dh.decode(br)
            val diff = br.extend(br.receive(t), t)
            c.pred += diff
            coef(0) = c.pred * qt(0)
            var k = 1
            while (k < 64) {
              val rs = ah.decode(br)
              val r = rs >> 4
              val s = rs & 0x0F
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) throw new IllegalStateException("AC overrun")
                coef(Zigzag(k)) = br.extend(br.receive(s), s) * qt(k)
                k += 1
              }
            }
            // ---- separable IDCT: tmp = Cos * F, block = tmp * Cos^T ----
            var x = 0
            while (x < 8) {
              var v = 0
              while (v < 8) {
                var s2 = 0.0
                var u = 0
                while (u < 8) { s2 += Cos(x)(u) * coef(u * 8 + v); u += 1 }
                tmp(x * 8 + v) = s2
                v += 1
              }
              x += 1
            }
            x = 0
            while (x < 8) {
              var y = 0
              while (y < 8) {
                var s2 = 0.0
                var v = 0
                while (v < 8) { s2 += tmp(x * 8 + v) * Cos(y)(v); v += 1 }
                block(x * 8 + y) = s2
                y += 1
              }
              x += 1
            }
            // ---- level shift + clamp into the component plane ----
            val ox = (mx * hOf(c) + bx) * 8
            val oy = (my * vOf(c) + by) * 8
            var yy = 0
            while (yy < 8) {
              val rowBase = (oy + yy) * c.planeW + ox
              var xx = 0
              while (xx < 8) {
                val v2 = math.rint(block(yy * 8 + xx) + 128.0).toInt
                c.plane(rowBase + xx) =
                  (if (v2 < 0) 0 else if (v2 > 255) 255 else v2).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- upsample + color convert ----
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, out, y * width, width)
        y += 1
      }
      Pixels(width, height, 1, out)
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val ybRow = y * cy.planeW
        val cbRow = (y * cb.v / vMax) * cb.planeW
        val crRow = (y * cr.v / vMax) * cr.planeW
        var x = 0
        while (x < width) {
          val yy = cy.plane(ybRow + x) & 0xFF
          val cbv = (cb.plane(cbRow + x * cb.h / hMax) & 0xFF) - 128
          val crv = (cr.plane(crRow + x * cr.h / hMax) & 0xFF) - 128
          val r = math.rint(yy + 1.402 * crv).toInt
          val g = math.rint(yy - 0.344136 * cbv - 0.714136 * crv).toInt
          val bl = math.rint(yy + 1.772 * cbv).toInt
          val d = (y * width + x) * 3
          out(d) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(d + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(d + 2) = (if (bl < 0) 0 else if (bl > 255) 255 else bl).toByte
          x += 1
        }
        y += 1
      }
      Pixels(width, height, 3, out)
    }
  }
}
