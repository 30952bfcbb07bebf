package graft.multimodal

import graft.engine.EtlContext
import graft.spec.ComponentSpec
import graft.stages.Stages
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support — builder brief: opaque
  * `binary` payload columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment — see [[StubDecoder.decode]], clearly marked): it derives
  * deterministic fake dimensions from the payload bytes. Everything
  * Spark-side is REAL and is what matters at 100 TB: the binary column
  * schema, the typed-metadata struct contract, partition-parallel
  * `mapPartitions` batch decode (the exact seam where a JNI/Pandas-style
  * decoder plugs in), and plan-level frame expansion.
  */
object MultimodalStages {

  /** Typed metadata contract for a decoded media payload. */
  final case class MediaMeta(media_id: Long, byte_len: Long, width: Int,
                             height: Int, channels: Int, n_frames: Int)

  /** STUB decoder — deterministic fake in lieu of a real codec library.
    * A production build replaces this body with the real decode (e.g.
    * javacv / a JNI codec) without touching the Spark plumbing around it. */
  object StubDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val len = if (payload == null) 0L else payload.length.toLong
      // ??? real decode goes here — deterministic fake derived from length
      MediaMeta(
        media_id = id,
        byte_len = len,
        width = (64 + len % 640).toInt,
        height = (64 + len % 480).toInt,
        channels = 3,
        n_frames = (1 + len % 16).toInt)
    }
  }

  /** `mm_attach`: turn a column into an opaque binary payload column
    * (`payload`) + `media_type` tag — the ingest contract for media.
    * Options: `field` (source column, cast to binary), `mediaType`. */
  def attach(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val f = spec.strOr("field", "text")
      df.withColumn("payload", col(f).cast("binary"))
        .withColumn("media_type", lit(spec.strOr("mediaType", "image/unknown")))
    }

  /** `mm_decode`: partition-parallel batch decode of the binary payload
    * into the [[MediaMeta]] struct columns. Runs through `mapPartitions`
    * on a typed Dataset — the decoder sees an iterator per partition
    * (batch shape), exactly how a real vectorized decoder integrates.
    * Options: `idField` (default doc_id), `payloadField` (default
    * payload), `keepInput` (default false). */
  def decode(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val id = spec.strOr("idField", "doc_id")
      val payload = spec.strOr("payloadField", "payload")
      val metaEnc = Encoders.product[MediaMeta]
      val pairs = df.select(col(id).cast("long"), col(payload).cast("binary"))
        .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      val meta = pairs.mapPartitions(
        iter => iter.map { case (i, bytes) => StubDecoder.decode(i, bytes) })(metaEnc)
        .toDF()
      if (spec.bool("keepInput", dflt = false)) {
        df.join(meta.withColumnRenamed("media_id", id), Seq(id))
      } else meta
    }

  /** `mm_resize`: metadata-level resize to fit a bounding box, preserving
    * aspect ratio (integer floor) — the real pixel resample is part of
    * the stubbed decode layer. Options: `maxWidth`/`maxHeight`. */
  def resize(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val mw = spec.int("maxWidth", 224)
      val mh = spec.int("maxHeight", 224)
      val scale = least(lit(mw.toDouble) / col("width"),
        lit(mh.toDouble) / col("height"), lit(1.0))
      df.withColumn("out_width", floor(col("width") * scale).cast("int"))
        .withColumn("out_height", floor(col("height") * scale).cast("int"))
    }

  /** `mm_frames`: frame sampling — one output row per sampled frame index
    * (`0, step, 2*step, … < n_frames`), plan-level `posexplode` of a
    * `sequence`. Options: `step` (default 1), `nFramesField`. */
  def frames(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val step = spec.int("step", 1)
      val nf = col(spec.strOr("nFramesField", "n_frames"))
      df.withColumn("frame_idx",
          explode(sequence(lit(0), nf - 1, lit(step))))
    }
}
