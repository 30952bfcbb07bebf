package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec on the JDK's `javax.sound.sampled` — WAV (PCM)
  * header decode and encode with zero external dependencies. Together
  * with [[ImageCodec]] this removes the decode stub from every media
  * type the JDK can parse natively; only compressed video/audio
  * containers (mp4/mp3/…) remain on the documented
  * [[MultimodalStages.StubDecoder]] seam.
  */
object AudioCodec {

  /** Typed metadata for a decoded audio payload. */
  final case class AudioMeta(media_id: Long, byte_len: Long,
                             sample_rate: Int, channels: Int, n_samples: Long)

  /** Decode WAV header metadata: real sample rate, channel count, and
    * frame (sample) count from the bytes. Typed error naming the row
    * for an unparsable payload. */
  def decode(id: Long, payload: Array[Byte]): AudioMeta = {
    if (payload == null || payload.isEmpty)
      sys.error(s"mm_audio: media_id=$id: empty payload")
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          sys.error(s"mm_audio: media_id=$id: not a parsable audio " +
            s"payload (JDK-supported: WAV/AIFF/AU PCM): ${e.getMessage}")
      }
    try {
      val fmt = in.getFormat
      AudioMeta(
        media_id = id,
        byte_len = payload.length.toLong,
        sample_rate = fmt.getSampleRate.toInt,
        channels = fmt.getChannels,
        n_samples = in.getFrameLength)
    } finally in.close()
  }

  /** ID3v2 text-frame metadata of one MP3 payload. */
  final case class Id3Meta(media_id: Long, title: Option[String],
                           artist: Option[String], album: Option[String])

  /** Parse the leading ID3v2 tag's TEXT frames (the crawl-metadata trio
    * TIT2/TPE1/TALB and any other `T…` frame) to a frameId → text map —
    * empty when the payload carries no tag. Versions 2.3 (plain u32
    * frame sizes) and 2.4 (syncsafe) supported; v2.2 (3-byte ids),
    * extended headers, unsynchronisation, and compressed/encrypted
    * frames are typed errors naming the row (never a silent mis-walk).
    * Text decodes per the encoding byte: 0 latin-1, 1 UTF-16 (BOM),
    * 2 UTF-16BE, 3 UTF-8; trailing NULs stripped. Padding (a zero
    * where a frame id should start) ends the walk. */
  def id3Text(id: Long, payload: Array[Byte]): Map[String, String] = {
    if (payload == null || payload.length < 10 ||
        payload(0) != 'I' || payload(1) != 'D' || payload(2) != '3')
      return Map.empty
    val ver = payload(3) & 0xFF
    if (ver != 3 && ver != 4)
      sys.error(s"mm_id3: media_id=$id: ID3v2.$ver is outside the parsed " +
        "subset (v2.3/v2.4)")
    val flags = payload(5) & 0xFF
    if (flags != 0)
      sys.error(s"mm_id3: media_id=$id: ID3v2 header flags 0x" +
        f"$flags%02X (unsynchronisation/extended header) not supported")
    val size = (u8(payload, 6) << 21) | (u8(payload, 7) << 14) |
      (u8(payload, 8) << 7) | u8(payload, 9)
    val end = math.min(10 + size, payload.length)
    var pos = 10
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (pos + 10 <= end && payload(pos) != 0) {
      val fid = new String(payload, pos, 4, "ISO-8859-1")
      if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        sys.error(s"mm_id3: media_id=$id: malformed frame id '$fid' at byte $pos")
      val n =
        if (ver == 4) (u8(payload, pos + 4) << 21) | (u8(payload, pos + 5) << 14) |
          (u8(payload, pos + 6) << 7) | u8(payload, pos + 7)
        else (u8(payload, pos + 4) << 24) | (u8(payload, pos + 5) << 16) |
          (u8(payload, pos + 6) << 8) | u8(payload, pos + 7)
      // a v2.3 size byte with the top bit set would go NEGATIVE and walk
      // pos backwards into an unnamed ArrayIndexOutOfBounds — typed fail
      if (n < 0)
        sys.error(s"mm_id3: media_id=$id: frame $fid declares a negative " +
          s"size ($n) at byte $pos — corrupt tag")
      val fflags = (u8(payload, pos + 8) << 8) | u8(payload, pos + 9)
      if ((fflags & 0x00FF) != 0) // v2.3 low byte / v2.4 format flags:
        sys.error(s"mm_id3: media_id=$id: frame $fid carries format flags 0x" +
          f"$fflags%04X (compression/encryption) — not supported")
      if (pos + 10 + n > end)
        sys.error(s"mm_id3: media_id=$id: frame $fid spans past the tag " +
          s"(${pos + 10 + n} > $end)")
      if (fid.startsWith("T") && n >= 1 && !out.contains(fid)) {
        val enc = u8(payload, pos + 10)
        val cs = enc match {
          case 0 => "ISO-8859-1"
          case 1 => "UTF-16"
          case 2 => "UTF-16BE"
          case 3 => "UTF-8"
          case other => sys.error(
            s"mm_id3: media_id=$id: frame $fid text encoding $other unknown")
        }
        val txt = new String(payload, pos + 11, n - 1, cs)
        out += fid -> txt.replaceAll("\\u0000+$", "")
      }
      pos += 10 + n
    }
    out.toMap
  }

  /** Per-sample PCM statistics for a decoded payload. */
  final case class AudioStats(media_id: Long, n_values: Long, peak_abs: Long,
                              rms: Double, zero_ratio: Double)

  /** Decode the PCM SAMPLES (not just the header) of a 16-bit WAV/AIFF
    * payload and aggregate: `n_values` (samples × channels), `peak_abs`
    * (max |value|), `rms` = sqrt(Σv²/n), `zero_ratio` = zeros/n. The
    * accumulation is pure 64-bit integer (Σv² of 16-bit samples
    * overflows a long only past 2^33 values — far beyond a row-sized
    * payload); the two closing ops (one division, one sqrt) are both
    * IEEE-correctly-rounded, so results hash-match across engines. */
  def stats(id: Long, payload: Array[Byte]): AudioStats = {
    if (payload == null || payload.isEmpty)
      sys.error(s"mm_audio_stats: media_id=$id: empty payload")
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          sys.error(s"mm_audio_stats: media_id=$id: not a parsable audio " +
            s"payload (JDK-supported: WAV/AIFF/AU PCM): ${e.getMessage}")
      }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED)
        sys.error(s"mm_audio_stats: media_id=$id: needs 16-bit signed " +
          s"PCM, got ${fmt.getSampleSizeInBits}-bit ${fmt.getEncoding}")
      val bytes = in.readAllBytes()
      val big = fmt.isBigEndian
      var i = 0; var n = 0L; var peak = 0L; var sumSq = 0L; var zeros = 0L
      while (i + 1 < bytes.length) {
        val v: Int =
          if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort.toInt
          else ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort.toInt
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        sumSq += v.toLong * v
        if (v == 0) zeros += 1
        n += 1; i += 2
      }
      AudioStats(id, n, peak,
        if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
        if (n == 0) 0.0 else zeros.toDouble / n)
    } finally in.close()
  }

  // ------------------------------------------------ compressed formats
  // Pure-byte frame-header walks, the same pattern as [[VideoCodec]]'s
  // MP4 box parse: the payload's own framing carries sample rate,
  // channel count, and frame count — no codec library needed for
  // metadata extraction. Reference intent: per-record field extraction
  // from opaque payloads (orientdb-etl OCSVTransformer.java:96-140's
  // typed-cell contract, applied to media bytes).

  /** MPEG-1/2/2.5 audio (MP3) bitrate table, Layer III, kbps.
    * Index 0 = free, 15 = reserved — both rejected. */
  private val Mp3BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160, -1)
  private val Mp3RateV1 = Array(44100, 48000, 32000, -1)
  private val Mp3RateV2 = Array(22050, 24000, 16000, -1)
  private val Mp3RateV25 = Array(11025, 12000, 8000, -1)
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350, -1, -1, -1)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Decode an MP3 stream's metadata by walking its frame headers:
    * skips a leading ID3v2 tag (syncsafe size) and a trailing ID3v1
    * block, then counts frames via each header's computed length.
    * `n_samples` = frames × samples-per-frame (1152 for MPEG-1
    * Layer III, 576 for MPEG-2/2.5); rate/channels from the first
    * frame. Truncated or desynced bytes are a typed error naming the
    * row and offset — at crawl scale a corrupt payload must say WHERE. */
  def decodeMp3(id: Long, payload: Array[Byte]): AudioMeta = {
    var pos = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4), then body
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val size = (u8(payload, 6) << 21) | (u8(payload, 7) << 14) |
        (u8(payload, 8) << 7) | u8(payload, 9)
      pos = 10 + size
    }
    val end = // ID3v1: fixed 128-byte "TAG" block at the very end
      if (payload.length >= 128 &&
          payload(payload.length - 128) == 'T' &&
          payload(payload.length - 127) == 'A' &&
          payload(payload.length - 126) == 'G') payload.length - 128
      else payload.length
    var frames = 0L; var samples = 0L; var rate = 0; var channels = 0
    while (pos < end) {
      if (pos + 4 > end || u8(payload, pos) != 0xFF ||
          (u8(payload, pos + 1) & 0xE0) != 0xE0)
        sys.error(s"mm_audio: media_id=$id: lost MP3 frame sync at byte " +
          s"$pos of ${payload.length}")
      val b1 = u8(payload, pos + 1); val b2 = u8(payload, pos + 2)
      val version = (b1 >> 3) & 3   // 0=2.5, 2=MPEG2, 3=MPEG1
      val layer = (b1 >> 1) & 3     // 1=III, 2=II, 3=I
      if (version == 1 || layer != 1)
        sys.error(s"mm_audio: media_id=$id: unsupported MPEG " +
          s"version/layer bits ($version/$layer) at byte $pos — only " +
          "Layer III (MP3) framing is parsed")
      val brIdx = (b2 >> 4) & 0xF
      val srIdx = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      val v1 = version == 3
      val bitrate = (if (v1) Mp3BitrateV1 else Mp3BitrateV2)(brIdx) * 1000
      val sr = (version match {
        case 3 => Mp3RateV1
        case 2 => Mp3RateV2
        case _ => Mp3RateV25
      })(srIdx)
      if (bitrate <= 0 || sr <= 0)
        sys.error(s"mm_audio: media_id=$id: reserved bitrate/samplerate " +
          s"index at byte $pos")
      val spf = if (v1) 1152 else 576
      val frameLen = spf / 8 * bitrate / sr + padding
      if (pos + frameLen > end)
        sys.error(s"mm_audio: media_id=$id: truncated MP3 frame at byte " +
          s"$pos (needs $frameLen bytes, ${end - pos} remain) — lost sync " +
          "or cut-off payload")
      if (rate == 0) {
        rate = sr
        channels = if (((u8(payload, pos + 3) >> 6) & 3) == 3) 1 else 2
      }
      frames += 1; samples += spf; pos += frameLen
    }
    if (frames == 0)
      sys.error(s"mm_audio: media_id=$id: no MP3 frames in payload")
    AudioMeta(id, payload.length.toLong, rate, channels, samples)
  }

  /** Decode an ADTS (AAC transport) stream's metadata by walking its
    * 7/9-byte frame headers: 13-bit frame length, sampling-frequency
    * index, channel configuration; 1024 samples per raw data block. */
  def decodeAdts(id: Long, payload: Array[Byte]): AudioMeta = {
    var pos = 0; var frames = 0L; var samples = 0L
    var rate = 0; var channels = 0
    while (pos < payload.length) {
      if (pos + 7 > payload.length || u8(payload, pos) != 0xFF ||
          (u8(payload, pos + 1) & 0xF6) != 0xF0)
        sys.error(s"mm_audio: media_id=$id: lost ADTS frame sync at byte " +
          s"$pos of ${payload.length}")
      val b2 = u8(payload, pos + 2); val b3 = u8(payload, pos + 3)
      val srIdx = (b2 >> 2) & 0xF
      val sr = AdtsRates(srIdx)
      if (sr <= 0)
        sys.error(s"mm_audio: media_id=$id: reserved ADTS sampling index " +
          s"$srIdx at byte $pos")
      val ch = ((b2 & 1) << 2) | ((b3 >> 6) & 3)
      val frameLen = ((b3 & 3) << 11) | (u8(payload, pos + 4) << 3) |
        ((u8(payload, pos + 5) >> 5) & 7)
      if (frameLen < 7)
        sys.error(s"mm_audio: media_id=$id: ADTS frame length $frameLen " +
          s"< header size at byte $pos")
      val blocks = (u8(payload, pos + 6) & 3) + 1
      if (pos + frameLen > payload.length)
        sys.error(s"mm_audio: media_id=$id: truncated ADTS frame at byte " +
          s"$pos (needs $frameLen bytes, ${payload.length - pos} remain)")
      if (rate == 0) { rate = sr; channels = ch }
      frames += 1; samples += 1024L * blocks; pos += frameLen
    }
    if (frames == 0)
      sys.error(s"mm_audio: media_id=$id: no ADTS frames in payload")
    AudioMeta(id, payload.length.toLong, rate, channels, samples)
  }

  /** Sniff-and-decode: WAV/AIFF/AU via the JDK, MP3 (ID3 tag or MPEG
    * sync with a real layer) and ADTS AAC (sync with layer bits 00) via
    * the frame-header walks. One entry point for the `mm_audio` stage —
    * the container tells us which parser applies. */
  def decodeAny(id: Long, payload: Array[Byte]): AudioMeta = {
    if (payload == null || payload.length < 4)
      sys.error(s"mm_audio: media_id=$id: empty or truncated payload")
    val b0 = u8(payload, 0); val b1 = u8(payload, 1)
    if (payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3')
      decodeMp3(id, payload)
    else if (b0 == 0xFF && (b1 & 0xE0) == 0xE0) {
      if (((b1 >> 1) & 3) == 0) decodeAdts(id, payload) // layer 00 = ADTS
      else decodeMp3(id, payload)
    } else decode(id, payload) // RIFF/FORM/.snd → javax.sound
  }

  /** Encode raw 16-bit little-endian PCM as a WAV container. */
  def encodeWav(pcm: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val frames = pcm.length / fmt.getFrameSize
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }
}
