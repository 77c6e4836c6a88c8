package graft.multimodal

/** Pure-JVM media codecs for the multimodal column path.
  *
  * Two real decode families, zero external libraries:
  *   - hand-parsed containers — Netpbm (PGM/PPM) raster arithmetic and
  *     RIFF/WAV PCM16 chunk walking;
  *   - the JDK's own `javax.imageio` readers (every standard JDK ships
  *     PNG/JPEG/BMP/GIF/TIFF decoders) via [[decodeImageIO]] —
  *     PNG/BMP/GIF are LOSSLESS, so their decoded rasters are
  *     pixel-exact and oracle-replayable (q137); JPEG decoding is
  *     deterministic for a given JDK but not bit-specified across
  *     decoders, so JPEG features stay spec-tested, never hash-oracled.
  * Only audio-codec/video formats (MP3/AAC/H.264) remain behind the
  * clearly-marked stub in [[Multimodal.stubDecode]] — the JDK has no
  * decoder for those.
  *
  * Reference analogue: trx reads detector images through fabio's EDF codec
  * (trx/azav.py:25, fabio.open) — same role: container header + raw raster.
  */
object Codecs {

  /** Decoded raster image. `pixels` is row-major, channel-interleaved
    * (length = width × height × channels), values in 0..maxVal.
    */
  final case class ImageData(width: Int, height: Int, channels: Int,
                             maxVal: Int, pixels: Array[Int])

  /** Decoded PCM audio. `samples` are signed 16-bit values, channel-
    * interleaved.
    */
  final case class AudioData(sampleRate: Int, nChannels: Int,
                             samples: Array[Int])

  /** Container sniff from magic bytes — drives decode dispatch. */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') "ppm"
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '5') "pgm"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      "wav"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') "gif"
    else if (b.length >= 4 && ((b(0) == 'I' && b(1) == 'I' &&
      b(2) == 0x2a && b(3) == 0) || (b(0) == 'M' && b(1) == 'M' &&
      b(2) == 0 && b(3) == 0x2a))) "tiff"
    else "unknown"

  /** The formats [[decodeImageIO]] handles. */
  val ImageIoFormats: Set[String] = Set("png", "jpeg", "bmp", "gif", "tiff")

  // --------------------------------------------------------- JDK ImageIO --

  /** Decode PNG/JPEG/BMP/GIF through the JDK's own `javax.imageio`
    * readers to the same [[ImageData]] shape as the Netpbm path: 3-channel
    * row-major RGB, 0..255. PNG/BMP/GIF round-trip losslessly.
    */
  def decodeImageIO(b: Array[Byte]): ImageData = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val pixels = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        pixels(o) = (rgb >> 16) & 0xff
        pixels(o + 1) = (rgb >> 8) & 0xff
        pixels(o + 2) = rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageData(w, h, 3, 255, pixels)
  }

  /** Header-only (width, height) via the matching ImageIO reader — no
    * raster decode; None when no reader claims the payload.
    */
  private[multimodal] def imageIoDims(b: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode EVERY page/frame of a multi-image container (multi-page TIFF
    * — lossless, the real "video-like" frame store the JDK can read —
    * or animated GIF; single-frame containers yield one frame). Raw
    * per-page rasters; GIF disposal compositing is NOT applied.
    */
  def decodeFrames(b: Array[Byte]): Seq[ImageData] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "undecodable image payload")
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        (0 until n).map { f =>
          val img = r.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          val pixels = new Array[Int](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val o = (y * w + x) * 3
              pixels(o) = (rgb >> 16) & 0xff
              pixels(o + 1) = (rgb >> 8) & 0xff
              pixels(o + 2) = rgb & 0xff
              x += 1
            }
            y += 1
          }
          ImageData(w, h, 3, 255, pixels)
        }
      } finally r.dispose()
    } finally iis.close()
  }

  /** Encode RGB frames as a multi-page TIFF (lossless — the test/oracle
    * twin of [[decodeFrames]]). Each frame is row-major interleaved RGB
    * of length width × height × 3.
    */
  def encodeTiff(width: Int, height: Int,
                 frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(frames.forall(_.length == width * height * 3), "raster size")
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val o = (y * width + x) * 3
            img.setRGB(x, y,
              (px(o) << 16) | (px(o + 1) << 8) | px(o + 2))
            x += 1
          }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      w.endWriteSequence()
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** Unified raster decode across every container this file handles:
    * Netpbm by hand-parse, PNG/JPEG/BMP/GIF via [[decodeImageIO]]. None
    * for non-raster containers — shared dispatch for resize/perceptual
    * hashing so raster operators automatically cover all real formats.
    */
  def decodeRaster(b: Array[Byte]): Option[(String, ImageData)] =
    sniff(b) match {
      case c @ ("ppm" | "pgm") => Some((c, decodeNetpbm(b)))
      case c if ImageIoFormats(c) => Some((c, decodeImageIO(b)))
      case _ => None
    }

  /** Encode a 1- or 3-channel raster as PNG (lossless — the test/oracle
    * twin of [[decodeImageIO]], like [[encodeNetpbm]]/[[encodeWav]]).
    */
  def encodePng(width: Int, height: Int, channels: Int,
                pixels: Array[Int]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels must be 1|3: $channels")
    require(pixels.length == width * height * channels, "raster size")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * channels
        val (r, g, bl) =
          if (channels == 3) (pixels(o), pixels(o + 1), pixels(o + 2))
          else (pixels(o), pixels(o), pixels(o))
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------- Netpbm --

  /** Decode binary PGM (P5, 1 channel) / PPM (P6, 3 channels).
    *
    * Header: magic, then whitespace-separated width/height/maxval with
    * `#`-comment support, then EXACTLY ONE whitespace byte before the
    * raster (the Netpbm spec's classic trap — the raster may begin with a
    * byte that is itself whitespace-valued).
    */
  /** Netpbm header parse only — no raster read: (width, height, channels,
    * maxVal, rasterOffset). Shared by [[decodeNetpbm]] and the header-only
    * metadata sniff [[sniffDims]].
    */
  private[multimodal] def netpbmHeader(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
    require(b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6'),
      "not a binary PGM/PPM payload")
    val channels = if (b(1) == '6') 3 else 1
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextInt(): Int = {
      // skip whitespace and #-to-EOL comments
      var done = false
      while (!done) {
        while (i < b.length && isWs(b(i))) i += 1
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else done = true
      }
      var v = 0
      require(i < b.length && b(i) >= '0' && b(i) <= '9', "bad Netpbm header")
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
    require(maxVal > 0 && maxVal < 65536, s"bad maxval $maxVal")
    i += 1 // the single post-maxval whitespace byte
    (w, h, channels, maxVal, i)
  }

  def decodeNetpbm(b: Array[Byte]): ImageData = {
    val (w, h, channels, maxVal, off) = netpbmHeader(b)
    var i = off
    val bytesPerSample = if (maxVal < 256) 1 else 2
    val n = w * h * channels
    require(b.length - i >= n * bytesPerSample,
      s"truncated raster: need ${n * bytesPerSample}, have ${b.length - i}")
    val px = new Array[Int](n)
    var j = 0
    if (bytesPerSample == 1) {
      while (j < n) { px(j) = b(i + j) & 0xff; j += 1 }
    } else { // 16-bit samples are big-endian per the Netpbm spec
      while (j < n) {
        px(j) = ((b(i + 2 * j) & 0xff) << 8) | (b(i + 2 * j + 1) & 0xff)
        j += 1
      }
    }
    ImageData(w, h, channels, maxVal, px)
  }

  /** Encode binary PGM/PPM (the test/oracle twin of [[decodeNetpbm]]). */
  def encodeNetpbm(width: Int, height: Int, channels: Int,
                   pixels: Array[Int], maxVal: Int = 255): Array[Byte] = {
    require(channels == 1 || channels == 3, "PGM=1 or PPM=3 channels")
    require(pixels.length == width * height * channels, "raster size mismatch")
    require(maxVal > 0 && maxVal < 256, "1-byte samples only")
    val magic = if (channels == 3) "P6" else "P5"
    val header = s"$magic\n$width $height\n$maxVal\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    while (j < pixels.length) {
      out(header.length + j) = (pixels(j) & 0xff).toByte; j += 1
    }
    out
  }

  // --------------------------------------------------------------- WAV ---

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decode RIFF/WAVE with 16-bit PCM samples: a proper chunk walk (fmt
    * and data may be separated by LIST/fact/other chunks; chunk sizes pad
    * to even offsets per the RIFF spec).
    */
  /** RIFF/WAVE chunk walk, headers only — no sample read: (sampleRate,
    * nChannels, bits, dataOffset, dataLen). Shared by [[decodeWav]] and
    * [[sniffDims]].
    */
  private[multimodal] def wavHeader(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
    require(sniff(b) == "wav", "not a RIFF/WAVE payload")
    var i = 12
    var sampleRate = 0; var nCh = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = le32(b, i + 4)
      // RIFF sizes are unsigned 32-bit; read as signed Int a corrupt size
      // goes negative — without this guard the walk stops advancing
      // (infinite loop) or data sizing underflows
      require(sz >= 0, s"negative chunk size $sz in '$id' chunk")
      val body = i + 8
      id match {
        case "fmt " =>
          require(sz >= 16 && body + 16 <= b.length, "truncated fmt chunk")
          val fmt = le16(b, body)
          require(fmt == 1, s"only PCM (format 1) supported, got $fmt")
          nCh = le16(b, body + 2)
          sampleRate = le32(b, body + 4)
          bits = le16(b, body + 14)
        case "data" => dataOff = body; dataLen = sz
        case _ => ()
      }
      i = body + sz + (sz & 1) // RIFF chunks pad to even length
    }
    require(dataOff >= 0, "no data chunk")
    (sampleRate, nCh, bits, dataOff, dataLen)
  }

  /** Header-only dimension/shape sniff for [[Multimodal.withMeta]]:
    * (width, height, channels, sampleRate) — images carry sampleRate 0,
    * audio carries width/height 0. None for unknown containers or
    * malformed headers (callers fall back to their stub shape).
    */
  def sniffDims(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
    try sniff(b) match {
      case "ppm" | "pgm" =>
        val (w, h, ch, _, _) = netpbmHeader(b)
        Some((w, h, ch, 0))
      case "wav" =>
        val (rate, nCh, _, _, _) = wavHeader(b)
        Some((0, 0, nCh, rate))
      case f if ImageIoFormats(f) =>
        imageIoDims(b).map { case (w, h) => (w, h, 3, 0) }
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  def decodeWav(b: Array[Byte]): AudioData = {
    val (sampleRate, nCh, bits, dataOff, dataLen) = wavHeader(b)
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    require(dataOff + dataLen <= b.length, "truncated data chunk")
    val n = dataLen / 2
    val samples = new Array[Int](n)
    var j = 0
    while (j < n) {
      samples(j) = le16(b, dataOff + 2 * j).toShort.toInt // sign-extend
      j += 1
    }
    AudioData(sampleRate, nCh, samples)
  }

  /** Encode 16-bit PCM RIFF/WAVE (the test/oracle twin of [[decodeWav]]). */
  def encodeWav(sampleRate: Int, nChannels: Int,
                samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit = {
      val a = s.getBytes("US-ASCII"); System.arraycopy(a, 0, out, i, a.length)
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(i: Int, v: Int): Unit = { put16(i, v); put16(i + 2, v >> 16) }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, nChannels)
    put32(24, sampleRate); put32(28, sampleRate * nChannels * 2)
    put16(32, nChannels * 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen)
    var j = 0
    while (j < samples.length) { put16(44 + 2 * j, samples(j)); j += 1 }
    out
  }
}
