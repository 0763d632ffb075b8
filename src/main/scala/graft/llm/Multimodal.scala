package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Multimodal column plumbing: opaque binary payloads + typed metadata
  * structs. The decode step is REAL for 24-bit BI_RGB BMP, 16-bit PCM WAV
  * AND zlib-compressed 8-bit RGB PNG (all JDK-only codegen kernels below —
  * PNG entropy coding rides on java.util.zip, with all five scanline
  * filter types implemented on both encode and decode), so the binary →
  * features path is an actual format decode, exactly oracle-gated via
  * synthesized payloads whose pixel / sample values are analytic, and
  * cross-validated against the JDK's own ImageIO reader in LlmSpec. Lossy
  * codecs (JPEG/MP3/H.264) remain STUBBED (decoder-implementation-defined
  * output can't be exactly oracle-gated; no codec libs in this container —
  * see builder brief); their Spark-side mechanics — schema, batching,
  * deterministic features — are the same contract the real kernels
  * demonstrate.
  */
object Multimodal {

  // ------------------------------------------------------- real codecs ---

  /** Build a real 24-bpp bottom-up BI_RGB BMP file whose logical pixel
    * (x, y) has channel c ∈ {B=0, G=1, R=2} value
    * (seed·31 + x·7 + y·13 + c·85) mod 256 — analytic, so an external
    * oracle can compute any decoded feature without parsing anything.
    */
  def synthBmpKernel(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(0).putInt(0).putInt(0).putInt(0)
    var row = 0
    while (row < h) { // storage order: bottom-up
      val y = h - 1 - row
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out.put((((seed * 31 + x * 7L + y * 13L + c * 85L) % 256 + 256) % 256).toByte)
          c += 1
        }
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { out.put(0.toByte); pad += 1 }
      row += 1
    }
    out.array()
  }

  /** REAL BMP decode: parse the 54-byte header pair, honor bottom-up row
    * order and 4-byte row padding, and emit
    * [width, height, meanB, meanG, meanR, b00] — b00 is the blue channel
    * of LOGICAL pixel (0,0), which only comes out right if the bottom-up
    * navigation and padding arithmetic are correct (a byte-soup "decoder"
    * fails it). Unsupported payloads (not BM / not 24 bpp / compressed)
    * return null.
    */
  def bmpFeaturesKernel(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return null
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (bytes.length < dataOffset + rowSize * h) return null
    val sums = new Array[Long](3)
    var y = 0
    while (y < h) {
      val base = dataOffset + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          sums(c) += bytes(base + x * 3 + c) & 0xff
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val b00 = bytes(dataOffset + (h - 1) * rowSize) & 0xff
    new GenericArrayData(Array[Any](w.toDouble, h.toDouble,
      sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n,
      b00.toDouble))
  }

  /** REAL BMP nearest-neighbor resize: decode, sample the source grid at
    * tw×th, re-encode as a well-formed BMP (same 24-bpp layout). Null for
    * unsupported payloads — same contract as [[bmpFeaturesKernel]].
    */
  def bmpResizeKernel(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    if (bb.getShort(28) != 24 || bb.getInt(30) != 0 || w <= 0 || h <= 0) return null
    val srcRow = ((w * 3 + 3) / 4) * 4
    if (bytes.length < dataOffset + srcRow * h) return null
    val dstRow = ((tw * 3 + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + dstRow * th)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dstRow * th)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(tw).putInt(th).putShort(1).putShort(24)
      .putInt(0).putInt(dstRow * th).putInt(0).putInt(0).putInt(0).putInt(0)
    var row = 0
    while (row < th) {
      val y = th - 1 - row            // logical y of this storage row
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * w / tw).toInt
        val src = dataOffset + (h - 1 - sy) * srcRow + sx * 3
        out.put(bytes(src)).put(bytes(src + 1)).put(bytes(src + 2))
        x += 1
      }
      var pad = tw * 3
      while (pad < dstRow) { out.put(0.toByte); pad += 1 }
      row += 1
    }
    out.array()
  }

  /** Build a real RIFF/WAVE file (16-bit mono PCM) whose sample i is
    * ((seed·7 + i·11) mod 4096) − 2048 — analytic for the oracle.
    */
  def synthWavKernel(seed: Long, n: Int, sampleRate: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes).putInt(n * 2)
    var i = 0
    while (i < n) {
      out.putShort(((((seed * 7 + i * 11L) % 4096) + 4096) % 4096 - 2048).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL WAV decode (16-bit PCM, chunk-walked — fmt and data chunks may
    * be preceded by others): [sample_rate, channels, n_samples, mean, rms].
    * Null for non-RIFF/WAVE or non-PCM-16 payloads.
    */
  def wavStatsKernel(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null || bytes.length < 44) return null
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      if (id == "fmt ") {
        if (bb.getShort(off + 8) != 1) return null // PCM only
        channels = bb.getShort(off + 10)
        rate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    if (rate < 0 || dataOff < 0 || bits != 16 ||
      dataOff + dataLen > bytes.length) return null
    val n = dataLen / 2
    var sum = 0L; var sq = 0L
    var i = 0
    while (i < n) {
      val s = bb.getShort(dataOff + i * 2).toLong
      sum += s; sq += s * s
      i += 1
    }
    val nn = math.max(n, 1).toDouble
    new GenericArrayData(Array[Any](rate.toDouble, channels.toDouble,
      n.toDouble, sum / nn, math.sqrt(sq / nn)))
  }

  // REAL compressed codec: PNG (zlib via the JDK's Deflater/Inflater).
  // Unlike BMP/WAV this exercises an actual entropy-coded container: the
  // encoder cycles through ALL FIVE scanline filter types (None/Sub/Up/
  // Average/Paeth, row y uses filter y mod 5) before deflating, so the
  // decoder only recovers the analytic pixel values if its inflate AND
  // per-type unfiltering are correct — a byte-soup "decoder" cannot pass
  // the oracle. Pixel (x, y) channel c ∈ {R=0, G=1, B=2} value is the
  // same analytic (seed·31 + x·7 + y·13 + c·85) mod 256 formula as the
  // BMP kernels, so the DuckDB oracle computes every decoded feature
  // without any PNG code. Compressed SIZE is zlib-implementation-defined
  // and is never pinned — only decoded content is.

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = data.length
    out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    out.write(tb)
    out.write(data)
    val v = crc.getValue
    out.write((v >>> 24).toInt); out.write((v >>> 16).toInt)
    out.write((v >>> 8).toInt); out.write(v.toInt)
  }

  /** Encode an 8-bit RGB pixel array (row-major, 3 ints per pixel) as a
    * real PNG, filtering row y with type y mod 5 — every filter type is
    * exercised on any image ≥ 5 rows.
    */
  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var pos = 0
    var y = 0
    while (y < h) {
      val base = y * stride
      val ft = y % 5
      raw(pos) = ft.toByte; pos += 1
      var i = 0
      while (i < stride) {
        val cur = px(base + i)
        val a = if (i >= 3) px(base + i - 3) else 0
        val b = if (y > 0) px(base - stride + i) else 0
        val cc = if (y > 0 && i >= 3) px(base - stride + i - 3) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case _ => cur - paeth(a, b, cc)
        }
        raw(pos) = (f & 0xff).toByte; pos += 1
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10), 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    pngChunk(out, "IHDR", ihdr.array())
    pngChunk(out, "IDAT", zbuf.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Build a real 8-bit RGB PNG (color type 2, no interlace) of the
    * analytic pixel pattern, filtering row y with type y mod 5.
    */
  def synthPngKernel(seed: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) =
            (((seed * 31 + x * 7L + y * 13L + c * 85L) % 256 + 256) % 256).toInt
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(px, w, h)
  }

  /** Decode a supported PNG to (w, h, row-major RGB ints); null when
    * unsupported or structurally broken — shared by the feature and
    * resize kernels.
    */
  private def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (bytes == null || bytes.length < 45) return null
    if ((bytes(0) & 0xff) != 0x89 || bytes(1) != 'P' || bytes(2) != 'N' ||
        bytes(3) != 'G') return null
    try {
      def be32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      var off = 8
      var w = 0; var h = 0; var ok = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && off + 8 <= bytes.length) {
        val len = be32(off)
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        val dataOff = off + 8
        // len is attacker-controlled: negative or huge values must bail, in
        // long arithmetic so dataOff + len + 4 cannot wrap positive
        if (len < 0 || dataOff.toLong + len + 4 > bytes.length) return null
        typ match {
          case "IHDR" =>
            w = be32(dataOff); h = be32(dataOff + 4)
            val depth = bytes(dataOff + 8); val color = bytes(dataOff + 9)
            val compression = bytes(dataOff + 10); val filter = bytes(dataOff + 11)
            val interlace = bytes(dataOff + 12)
            ok = depth == 8 && color == 2 && compression == 0 && filter == 0 &&
              interlace == 0 && w > 0 && h > 0 &&
              // h*(1+3w) and w*h*3 must fit an Int with headroom (64 MPx cap)
              w.toLong * h <= (1L << 26)
          case "IDAT" => idat.write(bytes, dataOff, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        off = dataOff + len + 4
      }
      if (!ok || idat.size() == 0) return null
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var filled = 0
      // end() in finally: this is a per-row kernel, and every early return
      // (malformed stream) would otherwise leak the native zlib buffers
      // until finalization — real memory pressure on a hostile corpus scan
      try {
        while (filled < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, filled, raw.length - filled)
          // truncated stream, OR a zlib header demanding a preset dictionary
          // (FDICT) we'll never supply — inflate() then returns 0 forever
          // without throwing, so bailing here is what prevents a task hang
          if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
            return null
          filled += n
        }
      } finally inflater.end()
      if (filled < raw.length) return null
      val px = new Array[Int](h * stride)
      var y = 0
      while (y < h) {
        val base = y * (1 + stride)
        val ft = raw(base) & 0xff
        if (ft > 4) return null
        var i = 0
        while (i < stride) {
          val x = raw(base + 1 + i) & 0xff
          val a = if (i >= 3) px(y * stride + i - 3) else 0
          val b = if (y > 0) px((y - 1) * stride + i) else 0
          val cc = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) else 0
          px(y * stride + i) = (ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case _ => x + paeth(a, b, cc)
          }) & 0xff
          i += 1
        }
        y += 1
      }
      (w, h, px)
      // only the failures a malformed chunk layout can actually produce —
      // a blanket RuntimeException catch would mask real decoder defects
      // as "structurally broken input"
    } catch {
      case _: java.util.zip.DataFormatException => null
      case _: IndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
      case _: IllegalArgumentException => null
    }
  }

  /** REAL PNG nearest-neighbor resize: decode, sample the source grid at
    * tw×th, re-encode through [[encodePng]] — the compressed-codec twin of
    * [[bmpResizeKernel]]. Null for unsupported payloads.
    */
  def pngResizeKernel(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val dec = decodePng(bytes)
    if (dec == null || tw <= 0 || th <= 0) return null
    val (w, h, px) = dec
    val out = new Array[Int](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        var c = 0
        while (c < 3) {
          out((y * tw + x) * 3 + c) = px((sy * w + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePng(out, tw, th)
  }

  /** REAL PNG decode: signature + chunk walk, IDAT concat, zlib inflate,
    * and all five filter-type reversals, emitting
    * [width, height, meanR, meanG, meanB, r00] — r00 (red of pixel (0,0))
    * plus the three exact channel means only come out right if inflation
    * and unfiltering are correct. Null for anything but 8-bit
    * non-interlaced RGB (type 2) or on any structural error.
    */
  def pngFeaturesKernel(bytes: Array[Byte]): GenericArrayData = {
    val dec = decodePng(bytes)
    if (dec == null) return null
    val (w, h, px) = dec
    val sums = new Array[Long](3)
    var i = 0
    while (i < px.length) { sums(i % 3) += px(i); i += 1 }
    val n = w.toLong * h
    new GenericArrayData(Array[Any](w.toDouble, h.toDouble,
      sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n,
      px(0).toDouble))
  }

  case class SynthPng(child: Expression, w: Int, h: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any =
      synthPngKernel(a.asInstanceOf[Long], w, h)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.synthPngKernel($a, $w, $h)")
    override protected def withNewChildInternal(c: Expression): SynthPng = copy(child = c)
  }
  case class PngResize(child: Expression, tw: Int, th: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      pngResizeKernel(a.asInstanceOf[Array[Byte]], tw, th)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.pngResizeKernel($a, $tw, $th)")
    override protected def withNewChildInternal(c: Expression): PngResize = copy(child = c)
  }
  case class PngFeatures(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      pngFeaturesKernel(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.pngFeaturesKernel($a)")
    override protected def withNewChildInternal(c: Expression): PngFeatures = copy(child = c)
  }

  case class SynthBmp(child: Expression, w: Int, h: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any =
      synthBmpKernel(a.asInstanceOf[Long], w, h)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.synthBmpKernel($a, $w, $h)")
    override protected def withNewChildInternal(c: Expression): SynthBmp = copy(child = c)
  }
  case class BmpFeatures(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      bmpFeaturesKernel(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.bmpFeaturesKernel($a)")
    override protected def withNewChildInternal(c: Expression): BmpFeatures = copy(child = c)
  }
  case class BmpResize(child: Expression, tw: Int, th: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      bmpResizeKernel(a.asInstanceOf[Array[Byte]], tw, th)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.bmpResizeKernel($a, $tw, $th)")
    override protected def withNewChildInternal(c: Expression): BmpResize = copy(child = c)
  }
  case class SynthWav(child: Expression, n: Int, rate: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any =
      synthWavKernel(a.asInstanceOf[Long], n, rate)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.synthWavKernel($a, $n, $rate)")
    override protected def withNewChildInternal(c: Expression): SynthWav = copy(child = c)
  }
  case class WavStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      wavStatsKernel(a.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.wavStatsKernel($a)")
    override protected def withNewChildInternal(c: Expression): WavStats = copy(child = c)
  }

  /** REAL WAV decimation: keep every `factor`-th sample of a 16-bit PCM
    * payload and re-encode a well-formed WAV at sampleRate/factor — the
    * audio twin of [[bmpResizeKernel]] (decode → downsample → re-encode as
    * a narrow projection). Null for unsupported payloads.
    */
  def wavResampleKernel(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (bytes == null || bytes.length < 44) return null
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1; var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      if (id == "fmt ") {
        if (bb.getShort(off + 8) != 1 || bb.getShort(off + 22) != 16) return null
        rate = bb.getInt(off + 12)
      } else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    if (rate < 0 || dataOff < 0 || dataOff + dataLen > bytes.length) return null
    val n = dataLen / 2
    val m = (n + factor - 1) / factor
    val out = java.nio.ByteBuffer.allocate(44 + m * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + m * 2).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate / factor).putInt(rate / factor * 2).putShort(2).putShort(16)
    out.put("data".getBytes).putInt(m * 2)
    var i = 0
    while (i < n) { out.putShort(bb.getShort(dataOff + i * 2)); i += factor }
    out.array()
  }

  case class WavResample(child: Expression, factor: Int) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      wavResampleKernel(a.asInstanceOf[Array[Byte]], factor)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.wavResampleKernel($a, $factor)")
    override protected def withNewChildInternal(c: Expression): WavResample = copy(child = c)
  }

  /** Build a real multi-frame container ("GFV1": frame count + per-frame
    * length-prefixed BMP payloads) — the uncompressed stand-in for a video
    * file. Frame f's pixels use per-frame seed = seed·1000 + f, so every
    * sampled frame's features stay analytic for the oracle.
    */
  def synthFrameStackKernel(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val frames = Array.tabulate(nFrames)(f => synthBmpKernel(seed * 1000 + f, w, h))
    val total = 8 + frames.map(_.length + 4).sum
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GFV1".getBytes).putInt(nFrames)
    frames.foreach { fr => out.putInt(fr.length); out.put(fr) }
    out.array()
  }

  /** REAL frame sampling: walk the container's length-prefixed frame table
    * and return every `stride`-th frame payload (frames 0, stride, …) —
    * the explode-ready fan-out a video pipeline runs before per-frame
    * decode. Null for non-GFV1 payloads.
    */
  def sampleFramesKernel(bytes: Array[Byte], stride: Int): GenericArrayData = {
    if (bytes == null || bytes.length < 8 ||
      new String(bytes, 0, 4, "US-ASCII") != "GFV1") return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 8
    var f = 0
    while (f < n && off + 4 <= bytes.length) {
      val len = bb.getInt(off)
      if (off + 4 + len > bytes.length) return null
      if (f % stride == 0)
        out += java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
      off += 4 + len
      f += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  case class SynthFrames(child: Expression, nFrames: Int, w: Int, h: Int)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(a: Any): Any =
      synthFrameStackKernel(a.asInstanceOf[Long], nFrames, w, h)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.llm.Multimodal.synthFrameStackKernel($a, $nFrames, $w, $h)")
    override protected def withNewChildInternal(c: Expression): SynthFrames = copy(child = c)
  }
  case class SampleFrames(child: Expression, stride: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      sampleFramesKernel(a.asInstanceOf[Array[Byte]], stride)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.llm.Multimodal.sampleFramesKernel($a, $stride)")
    override protected def withNewChildInternal(c: Expression): SampleFrames = copy(child = c)
  }

  import org.apache.spark.sql.graftx.Bridge
  /** Column wrappers for the real codec kernels. */
  def synth_bmp(seed: Column, w: Int, h: Int): Column =
    Bridge.column(SynthBmp(Bridge.expression(seed.cast("long")), w, h))
  def bmp_features(payload: Column): Column =
    Bridge.column(BmpFeatures(Bridge.expression(payload)))
  def bmp_resize(payload: Column, tw: Int, th: Int): Column =
    Bridge.column(BmpResize(Bridge.expression(payload), tw, th))
  def synth_png(seed: Column, w: Int, h: Int): Column =
    Bridge.column(SynthPng(Bridge.expression(seed.cast("long")), w, h))
  def png_features(payload: Column): Column =
    Bridge.column(PngFeatures(Bridge.expression(payload)))
  def png_resize(payload: Column, tw: Int, th: Int): Column =
    Bridge.column(PngResize(Bridge.expression(payload), tw, th))
  def synth_wav(seed: Column, n: Int, rate: Int): Column =
    Bridge.column(SynthWav(Bridge.expression(seed.cast("long")), n, rate))
  def wav_stats(payload: Column): Column =
    Bridge.column(WavStats(Bridge.expression(payload)))
  def wav_resample(payload: Column, factor: Int): Column =
    Bridge.column(WavResample(Bridge.expression(payload), factor))
  def synth_frames(seed: Column, nFrames: Int, w: Int, h: Int): Column =
    Bridge.column(SynthFrames(Bridge.expression(seed.cast("long")), nFrames, w, h))
  def sample_frames(payload: Column, stride: Int): Column =
    Bridge.column(SampleFrames(Bridge.expression(payload), stride))

  /** Wrap a source column as a multimodal asset: binary payload + metadata
    * struct (mime, byte length, checksum). With real assets the payload
    * column comes from `spark.read.format("binaryFile")` — same schema.
    */
  def asAsset(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  /** STUB decode: a real pipeline would decode image/audio bytes here
    * (Pandas UDF / mapInPandas in PySpark, or a JNI codec in Scala) and
    * emit fixed-size feature vectors. The container has no codec libs, so
    * this emits a deterministic fake feature vector derived from the bytes
    * — the schema, batching, and partitioning are the real contract.
    * Derived from md5 (not xxhash64) so an external oracle can reproduce
    * the exact values.
    */
  def decodeStub(payload: Column, dims: Int = 4): Column =
    array((0 until dims).map(i => stubFeature(payload, i)): _*)

  /** One deterministic pseudo-feature in [0, 1): lane `i` salts the payload,
    * md5, take 6 hex digits, scale. Pure codegen'd expressions.
    */
  def stubFeature(payload: Column, i: Int): Column =
    (conv(substring(md5(concat(payload, lit(i.toString).cast("binary"))), 1, 6), 16, 10)
      .cast("long") % 1000L).cast("double") / 1000.0d

  /** Frame-sample stub: pick every `stride`-th byte as a "frame" marker —
    * stands in for video frame sampling; shows the explode-based fan-out a
    * real sampler uses.
    */
  def frameSample(payload: Column, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(octet_length(payload), lit(1)), lit(stride)),
      i => payload.substr(i, lit(8)))

  /** Resize stub: deterministic byte-stride downsample of the payload to
    * ≈ `targetBytes` (stride = ceil(n / target); every stride-th byte kept).
    * A real pipeline decodes, rescales, and re-encodes here — the Spark
    * contract this stands in for is binary → smaller binary as a narrow
    * projection, metadata recomputed downstream. The strided fold is
    * interpreted (aggregate over a sequence): payloads are stub-sized; a
    * production resize is a codec call per row, not byte surgery.
    */
  def resizeStub(payload: Column, targetBytes: Int): Column = {
    val n = octet_length(payload)
    val stride = greatest(ceil(n.cast("double") / targetBytes).cast("int"), lit(1))
    aggregate(
      sequence(lit(1), greatest(n, lit(1)), stride),
      lit(Array.empty[Byte]),
      (acc, i) => concat(acc, payload.substr(i, lit(1))))
  }

  /** Featurize assets: metadata + stub features. Runs as a narrow projection
    * over whatever partitioning the payloads arrived with; repartition by
    * size upstream when payload skew matters.
    */
  def featurize(df: DataFrame, dims: Int = 4): DataFrame =
    df.withColumn("features", decodeStub(col("payload"), dims))
}
