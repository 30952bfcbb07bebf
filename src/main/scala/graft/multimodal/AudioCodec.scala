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
