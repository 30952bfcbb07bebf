package graft.multimodal

import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic real-image fixture generation for the multimodal
  * stages: one media row per `documents.doc_id`, with a REAL encoded
  * image payload whose dimensions / channels / frame count are pure
  * arithmetic in `doc_id` — so a SQL oracle can recompute the expected
  * metadata without any decoder, while the engine must actually decode
  * the bytes to produce it.
  *
  * Format plan (`doc_id % 5`): 0 → PNG RGB (3 ch), 1 → JPEG (3 ch),
  * 2 → BMP (3 ch), 3 → PNG grayscale (1 ch), 4 → animated GIF with
  * `1 + doc_id % 6` frames. Dimensions: `w = 16 + (doc_id*7) % 97`,
  * `h = 16 + (doc_id*11) % 83`. Pixels: solid fill derived from doc_id
  * (irrelevant to the metadata oracle; stable across encoders).
  *
  * Generation is DISTRIBUTED (mapPartitions over the doc_id column) —
  * the same path a real corpus's media ingest would take; nothing
  * funnels through the driver.
  */
object MediaFixtures {

  def width(id: Long): Int = (16 + (id * 7) % 97).toInt
  def height(id: Long): Int = (16 + (id * 11) % 83).toInt
  def gifFrames(id: Long): Int = (1 + id % 6).toInt

  def mediaType(id: Long): String = (id % 5) match {
    case 0 => "image/png"
    case 1 => "image/jpeg"
    case 2 => "image/bmp"
    case 3 => "image/png" // grayscale png
    case _ => "image/gif"
  }

  def channels(id: Long): Int = if (id % 5 == 3) 1 else 3

  private def frame(id: Long): BufferedImage = {
    val t = if (id % 5 == 3) BufferedImage.TYPE_BYTE_GRAY
            else BufferedImage.TYPE_INT_RGB
    val img = new BufferedImage(width(id), height(id), t)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(((id * 37) % 256).toInt,
        ((id * 59) % 256).toInt, ((id * 83) % 256).toInt))
      g.fillRect(0, 0, width(id), height(id))
    } finally g.dispose()
    img
  }

  /** Encode the payload for one doc_id. */
  def payload(id: Long): Array[Byte] = (id % 5) match {
    case 0 | 3 => ImageCodec.encode(frame(id), "png")
    case 1 => ImageCodec.encode(frame(id), "jpg")
    case 2 => ImageCodec.encode(frame(id), "bmp")
    case _ => ImageCodec.encodeGif(Seq.fill(gifFrames(id))(frame(id)))
  }

  /** The fixture frame: (media_id, media_type, payload), one row per
    * document id, encoded executor-side. */
  def frame(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
      .as(Encoders.scalaLong)
      .mapPartitions(it => it.map(id => (id, mediaType(id), payload(id))))(enc)
      .toDF("media_id", "media_type", "payload")
  }

  // ---- audio fixture: real WAV payloads, metadata = doc_id arithmetic

  def audioRate(id: Long): Int = (id % 3) match {
    case 0 => 8000; case 1 => 16000; case _ => 32000
  }
  def audioChannels(id: Long): Int = (1 + id % 2).toInt
  def audioSamples(id: Long): Long = 500 + (id * 13) % 1000

  /** Real PCM-16 WAV bytes for one doc_id (deterministic sine-ish fill;
    * content is irrelevant to the metadata oracle). */
  def audioPayload(id: Long): Array[Byte] = {
    val n = audioSamples(id).toInt
    val ch = audioChannels(id)
    val pcm = new Array[Byte](n * ch * 2)
    var i = 0
    while (i < n * ch) {
      val v = ((id * 31 + i * 7) % 8192).toShort
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    AudioCodec.encodeWav(pcm, audioRate(id), ch)
  }

  /** The audio fixture frame: (media_id, payload), one WAV per doc. */
  def audioFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
      .as(Encoders.scalaLong)
      .mapPartitions(it => it.map(id => (id, audioPayload(id))))(enc)
      .toDF("media_id", "payload")
  }

  def ensureAudio(spark: SparkSession, sfDir: String, outPath: String): String = {
    val marker = new java.io.File(outPath, s"_graft_v$Version")
    if (!marker.exists()) {
      audioFrame(spark, sfDir).write.mode("overwrite").parquet(outPath)
      marker.createNewFile()
    }
    outPath
  }

  // ---- video fixture: real MP4 container bytes, metadata = doc_id
  // arithmetic (the FIXTURES.md protocol: the oracle recomputes the
  // arithmetic, the engine must recover it by parsing the boxes)

  /** fps values that divide the 600-unit timescale exactly, so sample
    * deltas and durations stay integral end-to-end. */
  val VideoFps: Array[Int] = Array(10, 12, 15, 20, 24, 25, 30)
  val VideoTimescale = 600L
  def videoWidth(id: Long): Int = (32 + (id * 7) % 289).toInt
  def videoHeight(id: Long): Int = (32 + (id * 11) % 241).toInt
  def videoFrames(id: Long): Int = (10 + (id * 13) % 90).toInt
  def videoFps(id: Long): Int = VideoFps((id % 7).toInt)
  def videoDuration(id: Long): Long =
    videoFrames(id).toLong * (VideoTimescale / videoFps(id))

  /** Real MP4 bytes for one doc_id; every 4th file uses version-1
    * (64-bit time) headers so the fixture corpus exercises both box
    * layouts the parser handles. */
  def videoPayload(id: Long): Array[Byte] =
    VideoCodec.encodeMp4(videoWidth(id), videoHeight(id), videoFrames(id),
      VideoTimescale, videoDuration(id), seed = id, v1Headers = id % 4 == 3)

  /** The video fixture frame: (media_id, payload), one MP4 per doc. */
  def videoFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
      .as(Encoders.scalaLong)
      .mapPartitions(it => it.map(id => (id, videoPayload(id))))(enc)
      .toDF("media_id", "payload")
  }

  def ensureVideo(spark: SparkSession, sfDir: String, outPath: String): String = {
    val marker = new java.io.File(outPath, s"_graft_v$Version")
    if (!marker.exists()) {
      videoFrame(spark, sfDir).write.mode("overwrite").parquet(outPath)
      marker.createNewFile()
    }
    outPath
  }

  // ---- perceptual-hash fixture: 64×64 grayscale PNGs whose 8×8 block
  // pattern IS a planted 64-bit hash — each cell pure black/white, so
  // the engine's average-hash (cell vs global mean) recovers exactly
  // the planted bits from REAL pixels. 1% planted near-dup partners
  // (doc_id % 100 == 1) copy the previous id's pattern with two bit
  // flips (Hamming 2); everything else is splitmix64-random (expected
  // pairwise distance ~32, so no false pairs at any fixture scale).

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** All-black / all-white grids have no mean threshold — keep at least
    * one bit of each polarity. */
  private def clampPattern(p: Long): Long =
    if (p == 0L) 1L else if (p == -1L) p & ~1L else p

  def phashPattern(id: Long): Long =
    if (id % 100 == 1 && id > 0) {
      val base = clampPattern(splitmix64(id - 1))
      val f1 = ((id * 7) % 64).toInt
      val f2t = ((id * 13) % 64).toInt
      val f2 = if (f2t == f1) (f1 + 1) % 64 else f2t
      clampPattern(base ^ (1L << f1) ^ (1L << f2))
    } else clampPattern(splitmix64(id))

  /** Real 64×64 grayscale PNG whose 8×8 blocks render [[phashPattern]]:
    * block (cx, cy) = bit `cy*8 + cx` (white = 1). */
  def phashPayload(id: Long): Array[Byte] = {
    val bits = phashPattern(id)
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_BYTE_GRAY)
    val g = img.createGraphics()
    try {
      var c = 0
      while (c < 64) {
        g.setColor(if (((bits >>> c) & 1L) == 1L) java.awt.Color.WHITE
                   else java.awt.Color.BLACK)
        g.fillRect((c % 8) * 8, (c / 8) * 8, 8, 8)
        c += 1
      }
    } finally g.dispose()
    ImageCodec.encode(img, "png")
  }

  /** The phash fixture frame: (media_id, payload), one PNG per doc. */
  def phashFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"))
      .as(Encoders.scalaLong)
      .mapPartitions(it => it.map(id => (id, phashPayload(id))))(enc)
      .toDF("media_id", "payload")
  }

  def ensurePhash(spark: SparkSession, sfDir: String, outPath: String): String = {
    val marker = new java.io.File(outPath, s"_graft_v$Version")
    if (!marker.exists()) {
      phashFrame(spark, sfDir).write.mode("overwrite").parquet(outPath)
      marker.createNewFile()
    }
    outPath
  }

  /** Bump when the format plan / dimension arithmetic above changes —
    * the on-disk cache marker is keyed on it, so an edit here can never
    * leave a stale /tmp fixture disagreeing with the oracle. */
  val Version = 2

  /** Write the fixture parquet once per (sfDir, outPath, Version);
    * idempotent. */
  def ensure(spark: SparkSession, sfDir: String, outPath: String): String = {
    val marker = new java.io.File(outPath, s"_graft_v$Version")
    if (!marker.exists()) {
      frame(spark, sfDir).write.mode("overwrite").parquet(outPath)
      marker.createNewFile()
    }
    outPath
  }
}
