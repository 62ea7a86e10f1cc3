package graft.operators

/** Header-sniffing media metadata decoders — pure byte inspection, zero
  * external dependencies (r12 verdict #3: the one stubbed component in
  * the multimodal set). Formats covered are the ones whose headers are
  * fully specified in public container docs and parse in a few dozen
  * lines each:
  *
  *  - PNG: 8-byte signature + IHDR chunk (width/height BE32, bit depth,
  *    color type → channel count)
  *  - JPEG: marker walk to the first SOFn frame header (height/width
  *    BE16, component count)
  *  - GIF: 87a/89a signature + logical screen descriptor (LE16 dims)
  *  - BMP: BITMAPINFOHEADER (LE32 dims — height may be negative for
  *    top-down rows — LE16 bit count)
  *  - WAV: RIFF/WAVE chunk walk to `fmt ` (channels, sample rate, bits)
  *    and `data` (byte length → sample count)
  *
  * Every reader bounds-checks before touching a byte: truncated or
  * foreign payloads return None, never throw — at 100 TB a corrupt blob
  * is a row-level outcome, not a task failure.
  */
object MediaCodec {

  final case class ImageInfo(format: String, width: Int, height: Int,
                             channels: Int)
  final case class AudioInfo(format: String, channels: Int, sampleRate: Int,
                             bitsPerSample: Int, nSamples: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** Sniff image dimensions/channels from the container header. */
  def sniffImage(b: Array[Byte]): Option[ImageInfo] =
    if (b == null) None
    else sniffPng(b).orElse(sniffJpeg(b)).orElse(sniffGif(b))
      .orElse(sniffBmp(b))

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def sniffPng(b: Array[Byte]): Option[ImageInfo] = {
    // signature, IHDR length+type at 8, IHDR payload through byte 25
    if (b.length < 26 || !PngSig.indices.forall(i => b(i) == PngSig(i)))
      return None
    if (ascii(b, 12, 4) != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    // color type → samples per pixel (PNG spec 11.2.2)
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolour
      case 3 => 1 // indexed (palette lookup happens downstream)
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolour + alpha
      case _ => return None
    }
    Some(ImageInfo("png", w.toInt, h.toInt, channels))
  }

  private def sniffJpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None // marker misalignment: not JPEG
      // fill bytes: consecutive 0xFF collapse to one marker prefix
      while (i + 1 < b.length && u8(b, i + 1) == 0xFF) i += 1
      if (i + 3 >= b.length) return None
      val marker = u8(b, i + 1)
      if (marker == 0xD9 || marker == 0xDA) return None // EOI/SOS: no SOF seen
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 >= b.length || segLen < 8) return None
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          val nComp = u8(b, i + 9)
          if (w <= 0 || h <= 0 || nComp <= 0) return None
          return Some(ImageInfo("jpeg", w, h, nComp))
        }
        i += 2 + segLen
      }
    }
    None
  }

  private def sniffGif(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 10) return None
    val sig = ascii(b, 0, 6)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    // palette entries are RGB triples — decoded pixels carry 3 channels
    Some(ImageInfo("gif", w, h, 3))
  }

  private def sniffBmp(b: Array[Byte]): Option[ImageInfo] = {
    // 14-byte file header + at least a BITMAPINFOHEADER (40 bytes)
    if (b.length < 54 || ascii(b, 0, 2) != "BM") return None
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(b, 18).toInt
    val h = le32(b, 22).toInt // negative = top-down row order
    val bitCount = le16(b, 28)
    // h == Int.MinValue: abs() returns it unchanged (still negative) —
    // a crafted 0x80000000 height must land on None, not a negative
    // ImageInfo the downstream dimension algebra chokes on
    if (w <= 0 || h == 0 || h == Int.MinValue) return None
    val channels = bitCount match {
      case 1 | 4 | 8 => 1 // palette
      case 16 => 2
      case 24 => 3
      case 32 => 4
      case _ => return None
    }
    Some(ImageInfo("bmp", w, math.abs(h), channels))
  }

  /** Sniff a RIFF/WAVE payload: walks chunks to `fmt ` and `data`.
    * Sample count = data bytes / block align (frames, i.e. per-channel
    * sample groups — the number a duration computes from).
    */
  def sniffWav(b: Array[Byte]): Option[AudioInfo] = sniffWavPcm(b).map(_._1)

  /** [[sniffWav]] plus the data chunk's byte offset — the entry point
    * for operators that read the PCM payload itself (windowed energy),
    * not just the header.
    */
  def sniffWavPcm(b: Array[Byte]): Option[(AudioInfo, Int)] = {
    if (b == null || b.length < 12 || ascii(b, 0, 4) != "RIFF" ||
        ascii(b, 8, 4) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataBytes = -1L
    var dataOff = -1
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        val audioFormat = le16(b, i + 8)
        // PCM or IEEE float or the extensible wrapper
        if (audioFormat != 1 && audioFormat != 3 && audioFormat != 0xFFFE)
          return None
        fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt,
          le16(b, i + 22), le16(b, i + 20)))
      } else if (id == "data") {
        // a streaming writer may declare more than is present; the
        // truth is the bytes on hand
        dataBytes = math.min(size, (b.length - i - 8).toLong)
        dataOff = i + 8
      }
      // chunks are word-aligned: odd sizes carry a pad byte. The
      // advance computes in LONG: a hostile u32 size truncated to Int
      // went negative and either looped forever (i += 0) or drove the
      // index out of bounds — and a declared size past the buffer
      // means no further chunk can start in-bounds anyway, so the
      // walk just ends (whatever fmt/data this chunk contributed,
      // bounded above, still counts)
      val next = i.toLong + 8L + size + (size % 2)
      if (next <= i || next > b.length.toLong) i = b.length
      else i = next.toInt
    }
    fmt.flatMap { case (ch, rate, bits, block) =>
      if (ch <= 0 || rate <= 0 || bits <= 0 || block <= 0 || dataBytes < 0)
        None
      else Some((AudioInfo("wav", ch, rate, bits, dataBytes / block),
        dataOff))
    }
  }
}
