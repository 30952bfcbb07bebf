package graft.multimodal

/** Real MP4 (ISO base media file format) container metadata decode —
  * pure byte arithmetic on the public box grammar, zero codec
  * libraries. A box is `[u32 size]["4cc" type][payload]`; `size == 1`
  * means a u64 largesize follows the type; `size == 0` means the box
  * runs to end-of-file. Containers (`moov`/`trak`/`mdia`/`minf`/
  * `stbl`) nest child boxes directly in their payload.
  *
  * What the decode recovers, and from where:
  *  - `width`/`height`: the first video track's `tkhd` (track header)
  *    — stored as 16.16 fixed-point, version 0 and 1 layouts both
  *    handled;
  *  - `timescale`/`duration`: `mvhd` (movie header) — units of the
  *    movie timescale, v0 (u32) and v1 (u64 duration) layouts;
  *  - `n_frames`: the video track's `stsz` sample-count (the real
  *    per-sample table size, not an fps estimate).
  *
  * `moov` after `mdat` (the common "non-faststart" layout) parses the
  * same way — the walker scans top-level boxes without reading `mdat`
  * payloads. Undecodable bytes raise a typed error naming the row;
  * `mm_video` offers the same `onUndecodable: skip` crawl posture as
  * the image path.
  *
  * Reference intent: builder brief multimodal columns (the reference
  * engine has no media code); this replaces the deterministic-fake
  * [[MultimodalStages.StubDecoder]] for MP4 video, which previously
  * was the last place the engine reported fake numbers.
  */
object VideoCodec {

  /** Typed metadata contract for a decoded MP4 container. `duration`
    * is in `timescale` units (exact integers off the wire — callers
    * derive seconds as `duration.toDouble / timescale`). */
  final case class VideoMeta(media_id: Long, width: Int, height: Int,
                             n_frames: Int, timescale: Long, duration: Long)

  // ---- big-endian readers -------------------------------------------------
  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** One parsed box: type + payload span `[start, end)`. */
  private final case class Box(typ: String, start: Int, end: Int)

  /** Walk the child boxes of `[from, until)`; malformed sizes raise. */
  private def boxes(b: Array[Byte], from: Int, until: Int): List[Box] = {
    var o = from
    val out = List.newBuilder[Box]
    while (o < until) {
      if (o + 8 > until) sys.error(s"truncated box header at offset $o")
      val size32 = u32(b, o)
      val typ = fourcc(b, o + 4)
      val (payloadStart, size) =
        if (size32 == 1L) {
          if (o + 16 > until) sys.error(s"truncated largesize box at offset $o")
          (o + 16, u64(b, o + 8))
        } else if (size32 == 0L) (o + 8, (until - o).toLong) // to end of file
        else (o + 8, size32)
      if (size < (payloadStart - o) || o + size > until)
        sys.error(s"box '$typ' at offset $o: bad size $size")
      out += Box(typ, payloadStart, o + size.toInt)
      o += size.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.start, parent.end).find(_.typ == typ)

  /** A box payload must be large enough for the reads about to happen —
    * a short box must be a typed error, never an out-of-bounds read (or
    * worse, a silent read of the NEXT box's bytes). */
  private def need(b: Box, bytes: Int, what: String): Unit =
    if (b.end - b.start < bytes)
      sys.error(s"'${b.typ}' box too short for $what (${b.end - b.start} < $bytes bytes)")

  /** Decode MP4 container metadata. Throws a typed error NAMING THE ROW
    * for anything that is not a parseable ISO BMFF file — the whole
    * parse (including nested box walks and fixed-offset reads) is
    * inside the wrapper, so `onUndecodable: error` always reports the
    * media_id and `skip` mode can drop any malformed container. */
  def decode(id: Long, payload: Array[Byte]): VideoMeta = {
    if (payload == null || payload.length < 8) fail(id, "empty/short payload")
    try decodeUnsafe(id, payload)
    catch {
      case e: RuntimeException if e.getMessage != null &&
        e.getMessage.contains("media_id=") => throw e
      case e: ArrayIndexOutOfBoundsException => // before its parent class
        fail(id, s"truncated box content (index ${e.getMessage})")
      case e: RuntimeException => fail(id, e.getMessage)
    }
  }

  private def decodeUnsafe(id: Long, payload: Array[Byte]): VideoMeta = {
    val top = boxes(payload, 0, payload.length)
    if (!top.exists(b => b.typ == "ftyp" || b.typ == "moov"))
      fail(id, "no ftyp/moov box — not an ISO BMFF container")
    val moov = top.find(_.typ == "moov").getOrElse(fail(id, "no moov box"))

    // movie header: timescale + duration (v0: u32s; v1: u64 times)
    val mvhd = child(payload, moov, "mvhd").getOrElse(fail(id, "no mvhd box"))
    need(mvhd, 4, "version/flags")
    val mv = payload(mvhd.start) & 0xFF // version
    val (timescale, duration) =
      if (mv == 1) { need(mvhd, 32, "v1 timescale/duration")
        (u32(payload, mvhd.start + 20), u64(payload, mvhd.start + 24)) }
      else { need(mvhd, 20, "v0 timescale/duration")
        (u32(payload, mvhd.start + 12), u32(payload, mvhd.start + 16)) }

    // first track with a nonzero tkhd width = the video track (audio
    // tracks carry 0×0); fall back to the first track at all
    val traks = boxes(payload, moov.start, moov.end).filter(_.typ == "trak")
    if (traks.isEmpty) fail(id, "no trak box")
    def dims(trak: Box): Option[(Int, Int)] =
      child(payload, trak, "tkhd").map { tk =>
        need(tk, 4, "version/flags")
        val v = payload(tk.start) & 0xFF
        val wOff = if (v == 1) { need(tk, 96, "v1 width/height"); tk.start + 88 }
                   else { need(tk, 84, "v0 width/height"); tk.start + 76 }
        // 16.16 fixed-point: integer part is the high u16
        (u16(payload, wOff), u16(payload, wOff + 4))
      }
    val video = traks.find(t => dims(t).exists(_._1 > 0)).getOrElse(traks.head)
    val (w, h) = dims(video).getOrElse(fail(id, "no tkhd box in trak"))

    // sample count straight from the video track's stsz table header
    // (present in every well-formed track; 0 frames only if declared so)
    val nFrames = (for {
      mdia <- child(payload, video, "mdia")
      minf <- child(payload, mdia, "minf")
      stbl <- child(payload, minf, "stbl")
      stsz <- child(payload, stbl, "stsz")
    } yield { need(stsz, 12, "sample count"); u32(payload, stsz.start + 8).toInt })
      .getOrElse(fail(id, "no stsz box in video trak"))

    VideoMeta(id, w, h, nFrames, timescale, duration)
  }

  /** One sampled frame: index in the track, its byte length, the first
    * byte (unsigned; -1 for an empty sample), the raw bytes, and the
    * track's sample-entry fourcc (`stsd` — 'jpeg'/'mp4v'/'avc1'/…),
    * which is what tells a downstream decode step whether each frame
    * is a self-contained image. */
  final case class FrameSample(media_id: Long, frame_idx: Int,
                               n_bytes: Int, first_byte: Int,
                               frame: Array[Byte], codec: String)

  /** REAL container-level frame sampling: every `step`-th sample's
    * BYTES sliced out of `mdat` by walking the sample tables — `stsz`
    * (constant or per-sample sizes) for lengths, `stsc` for the
    * sample-to-chunk runs, `stco`/`co64` for the per-chunk byte bases —
    * no codec, pure byte arithmetic. The full ISO 14496-12 §8.7.4 walk
    * (r18): chunks may hold different sample counts and sit at
    * arbitrary (even gapped or reordered) mdat positions, the layout
    * real crawl MP4s routinely have; a missing `stsc` on a single-chunk
    * track falls back to everything-in-chunk-1 (some writers omit it).
    * Malformed tables (non-monotone first_chunk, zero samples_per_chunk,
    * samples overrunning the chunk table) raise a typed error naming
    * the box. Same error wrapper contract as [[decode]]. */
  def sampleFrames(id: Long, payload: Array[Byte], step: Int,
                   maxFrames: Int): Seq[FrameSample] = {
    if (payload == null || payload.length < 8) fail(id, "empty/short payload")
    try sampleFramesUnsafe(id, payload, math.max(1, step), maxFrames)
    catch {
      case e: RuntimeException if e.getMessage != null &&
        e.getMessage.contains("media_id=") => throw e
      case e: ArrayIndexOutOfBoundsException =>
        fail(id, s"truncated box content (index ${e.getMessage})")
      case e: RuntimeException => fail(id, e.getMessage)
    }
  }

  private def sampleFramesUnsafe(id: Long, payload: Array[Byte], step: Int,
                                 maxFrames: Int): Seq[FrameSample] = {
    val top = boxes(payload, 0, payload.length)
    val moov = top.find(_.typ == "moov").getOrElse(fail(id, "no moov box"))
    val traks = boxes(payload, moov.start, moov.end).filter(_.typ == "trak")
    if (traks.isEmpty) fail(id, "no trak box")
    def isVideo(trak: Box): Boolean =
      child(payload, trak, "tkhd").exists { tk =>
        need(tk, 4, "version/flags")
        val v = payload(tk.start) & 0xFF
        val wOff = if (v == 1) { need(tk, 96, "v1 width/height"); tk.start + 88 }
                   else { need(tk, 84, "v0 width/height"); tk.start + 76 }
        u16(payload, wOff) > 0
      }
    val video = traks.find(isVideo).getOrElse(traks.head)
    val stbl = (for {
      mdia <- child(payload, video, "mdia")
      minf <- child(payload, mdia, "minf")
      stbl <- child(payload, minf, "stbl")
    } yield stbl).getOrElse(fail(id, "no stbl box in video trak"))
    // sample-entry fourcc: stsd payload = version/flags(4) + count(4) +
    // entry boxes; the first entry's type names the codec
    val codec = child(payload, stbl, "stsd")
      .flatMap(sd => boxes(payload, sd.start + 8, sd.end).headOption.map(_.typ))
      .getOrElse("unkn")
    val stsz = child(payload, stbl, "stsz").getOrElse(fail(id, "no stsz box"))
    need(stsz, 12, "sample size/count")
    val constSize = u32(payload, stsz.start + 4)
    val count = u32(payload, stsz.start + 8).toInt
    def sizeOf(i: Int): Long =
      if (constSize != 0L) constSize
      else { need(stsz, 12 + 4 * (i + 1), "per-sample size table")
             u32(payload, stsz.start + 12 + 4 * i) }
    // chunk byte bases: stco (u32) or co64 (u64), one offset per chunk
    val (chunkCount, chunkOffsetOf): (Int, Int => Long) =
      child(payload, stbl, "stco") match {
        case Some(stco) =>
          need(stco, 8, "chunk offsets")
          val n = u32(payload, stco.start + 4).toInt
          need(stco, 8 + 4 * n, "chunk offset table")
          (n, (c: Int) => u32(payload, stco.start + 8 + 4 * c))
        case None => child(payload, stbl, "co64") match {
          case Some(co64) =>
            need(co64, 8, "chunk offsets")
            val n = u32(payload, co64.start + 4).toInt
            need(co64, 8 + 8 * n, "chunk offset table")
            (n, (c: Int) => u64(payload, co64.start + 8 + 8 * c))
          case None => fail(id, "no stco/co64 box")
        }
      }
    if (chunkCount < 1 && count > 0) fail(id, "empty chunk offset table")
    // sample-to-chunk runs (ISO 14496-12 §8.7.4): entry e covers chunks
    // [first_chunk(e), first_chunk(e+1)) at samples_per_chunk(e) each
    val runs: Array[(Int, Int)] = child(payload, stbl, "stsc") match {
      case Some(stsc) =>
        need(stsc, 8, "sample-to-chunk")
        val n = u32(payload, stsc.start + 4).toInt
        need(stsc, 8 + 12 * n, "sample-to-chunk table")
        Array.tabulate(n)(e => (
          u32(payload, stsc.start + 8 + 12 * e).toInt,   // first_chunk, 1-based
          u32(payload, stsc.start + 12 + 12 * e).toInt)) // samples_per_chunk
      case None if chunkCount == 1 => Array((1, Int.MaxValue))
      case None => fail(id, "no stsc box on a multi-chunk track")
    }
    if (count > 0) {
      if (runs.isEmpty || runs.head._1 != 1)
        fail(id, "stsc table must start at chunk 1")
      var e = 1
      while (e < runs.length) {
        if (runs(e)._1 <= runs(e - 1)._1)
          fail(id, "stsc first_chunk not strictly increasing")
        e += 1
      }
      if (runs.exists(_._2 <= 0))
        fail(id, "stsc samples_per_chunk must be positive")
    }
    // walk samples in order, advancing chunks per the stsc runs; each
    // chunk restarts the byte offset at its stco/co64 base. Slices
    // bounds-check against the payload so a lying offset is a typed
    // error, not an out-of-bounds read.
    val out = Seq.newBuilder[FrameSample]
    var taken = 0
    var i = 0
    var chunk = 0   // 0-based chunk index
    var runIdx = 0
    var inChunk = 0 // samples consumed in the current chunk
    var off = if (count > 0) chunkOffsetOf(0) else 0L
    def spcAt(chunk0: Int): Int = {
      while (runIdx + 1 < runs.length && runs(runIdx + 1)._1 <= chunk0 + 1)
        runIdx += 1
      runs(runIdx)._2
    }
    while (i < count && taken < maxFrames) {
      if (inChunk == spcAt(chunk)) {
        chunk += 1
        if (chunk >= chunkCount)
          fail(id, s"sample $i overruns the chunk table ($chunkCount chunks)")
        inChunk = 0
        off = chunkOffsetOf(chunk)
      }
      val sz = sizeOf(i).toInt
      if (i % step == 0) {
        if (off < 0 || off + sz > payload.length)
          fail(id, s"sample $i spans [$off, ${off + sz}) beyond payload ${payload.length}")
        val bytes = java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + sz)
        out += FrameSample(id, i, sz,
          if (sz > 0) bytes(0) & 0xFF else -1, bytes, codec)
        taken += 1
      }
      off += sz
      inChunk += 1
      i += 1
    }
    out.result()
  }

  private def fail(id: Long, why: String): Nothing =
    sys.error(s"mm_video: media_id=$id: $why")

  // ------------------------------------------------------------------------
  // Writer — used by the fixture generator (and usable by pipelines that
  // need to emit container stubs). Produces a minimal VALID box tree:
  //   ftyp | mdat (nFrames 1-byte samples) | moov{mvhd, trak{tkhd,
  //   mdia{mdhd, hdlr, minf{vmhd, dinf{dref{url }}, stbl{stsd, stts,
  //   stsc, stsz, stco}}}}}
  // mdat PRECEDES moov so the chunk offset in stco is a constant
  // (ftyp.size + 8) and — deliberately — so every fixture exercises the
  // parser's moov-after-mdat path.
  // ------------------------------------------------------------------------

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    concat(be32(payload.length + 8L), typ.getBytes("ISO-8859-1"), payload)
  private def full(typ: String, version: Int, payload: Array[Byte]): Array[Byte] =
    box(typ, concat(Array(version.toByte, 0, 0, 0), payload))

  private val UnityMatrix: Array[Byte] = concat(
    be32(0x00010000L), be32(0), be32(0),
    be32(0), be32(0x00010000L), be32(0),
    be32(0), be32(0), be32(0x40000000L))

  /** Encode a minimal valid MP4 whose metadata is exactly
    * (`width`,`height`,`nFrames`,`timescale`,`duration`); the mdat
    * carries one deterministic byte per sample. `v1Headers` writes
    * version-1 mvhd/tkhd (64-bit times) — the parser handles both. */
  def encodeMp4(width: Int, height: Int, nFrames: Int, timescale: Long,
                duration: Long, seed: Long = 0L,
                v1Headers: Boolean = false,
                chunkSizes: Seq[Int] = Nil,
                interChunkGap: Int = 0): Array[Byte] =
    buildMp4(width, height, nFrames, timescale, duration, v1Headers,
      samples = Seq.tabulate(nFrames)(i =>
        Array(((seed * 31 + i * 7) % 251).toByte)),
      stszPayload = concat(be32(1), be32(nFrames.toLong)), // constant 1-byte samples
      fourcc = "mp4v", chunkSizes = chunkSizes, interChunkGap = interChunkGap)

  /** Encode a minimal valid MP4 whose single video track carries REAL
    * self-contained image frames (the MJPEG layout: each sample is one
    * complete encoded image, e.g. a JPEG) — per-sample `stsz` size
    * table, `jpeg` sample entry, same single-chunk mdat-before-moov
    * box tree as [[encodeMp4]].
    *
    * `chunkSizes` (r18): when non-empty, must partition the frames —
    * the mdat splits into that many chunks separated by `interChunkGap`
    * filler bytes (bytes belonging to NO sample, the way real muxers
    * interleave audio chunks between video ones), with a run-length
    * `stsc` + per-chunk `stco`. Single-base offset arithmetic produces
    * garbage on such a file; only the full §8.7.4 walk recovers the
    * frames — the fixture shape for the multi-entry-stsc contract. */
  def encodeMjpeg(width: Int, height: Int, frames: Seq[Array[Byte]],
                  timescale: Long, duration: Long,
                  v1Headers: Boolean = false,
                  chunkSizes: Seq[Int] = Nil,
                  interChunkGap: Int = 0): Array[Byte] =
    buildMp4(width, height, frames.length, timescale, duration, v1Headers,
      samples = frames,
      stszPayload = concat(be32(0) +: be32(frames.length.toLong) +:
        frames.map(f => be32(f.length.toLong)): _*),
      fourcc = "jpeg", chunkSizes = chunkSizes, interChunkGap = interChunkGap)

  private def buildMp4(width: Int, height: Int, nFrames: Int, timescale: Long,
                       duration: Long, v1Headers: Boolean,
                       samples: Seq[Array[Byte]], stszPayload: Array[Byte],
                       fourcc: String, chunkSizes: Seq[Int] = Nil,
                       interChunkGap: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp", concat("isom".getBytes("ISO-8859-1"), be32(0x200),
      "isom".getBytes("ISO-8859-1"), "mp41".getBytes("ISO-8859-1")))
    // chunk layout: partition the samples, join chunks with gap filler
    // bytes (part of NO sample), record each chunk's absolute offset
    val spcs = if (chunkSizes.isEmpty) Seq(samples.length) else chunkSizes
    require(chunkSizes.isEmpty ||
      (chunkSizes.forall(_ > 0) && chunkSizes.sum == samples.length),
      s"chunkSizes must partition the ${samples.length} samples, got $chunkSizes")
    val chunks: Seq[Array[Byte]] = {
      val it = samples.iterator
      spcs.map(n => concat(Seq.fill(n)(it.next()): _*))
    }
    val gap = Array.fill(interChunkGap)(0x5A.toByte)
    val mdatPayload = concat(chunks.zipWithIndex.flatMap { case (c, i) =>
      if (i == 0) Seq(c) else Seq(gap, c) }: _*)
    val mdatBase = ftyp.length + 8L
    val chunkOffsets = chunks.scanLeft(mdatBase) {
      (o, c) => o + c.length + interChunkGap }.init
    val mdat = box("mdat", mdatPayload)

    def times(n: Int) = // creation/modification zeros: v1 = u64, v0 = u32
      new Array[Byte]((if (v1Headers) 8 else 4) * n)
    def dur(d: Long) = if (v1Headers) concat(be32(d >> 32), be32(d)) else be32(d)
    val ver = if (v1Headers) 1 else 0

    val mvhd = full("mvhd", ver, concat(times(2), be32(timescale), dur(duration),
      be32(0x00010000L), be16(0x0100), new Array[Byte](2 + 8), UnityMatrix,
      new Array[Byte](24), be32(2))) // pre_defined ×6, next_track_ID
    val tkhd = full("tkhd", ver, concat(times(2).take(if (v1Headers) 16 else 8),
      be32(1), be32(0), dur(duration), // track_ID, reserved, duration
      new Array[Byte](8), be16(0), be16(0), be16(0), be16(0), UnityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16)))
    val mdhd = full("mdhd", 0, concat(new Array[Byte](8), be32(timescale),
      be32(duration), be16(0x55C4), be16(0))) // language 'und'
    val hdlr = full("hdlr", 0, concat(be32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12), Array(0.toByte))) // empty name
    val vmhd = box("vmhd", concat(Array[Byte](0, 0, 0, 1), new Array[Byte](8)))
    val dref = full("dref", 0, concat(be32(1),
      box("url ", Array[Byte](0, 0, 0, 1)))) // flag 1: self-contained
    val dinf = box("dinf", dref)
    // minimal visual sample entry (86 bytes): the decoder config a real
    // codec would read; dimensions duplicated per the spec
    val sampleEntry = box(fourcc, concat(new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      new Array[Byte](32), be16(24), be16(0xFFFF)))
    val stsd = full("stsd", 0, concat(be32(1), sampleEntry))
    val stts = full("stts", 0, concat(be32(1), be32(nFrames.toLong),
      be32(if (nFrames == 0) 0L else duration / math.max(nFrames, 1))))
    // stsc: run-length entries over the per-chunk sample counts
    val scRuns = spcs.zipWithIndex
      .filter { case (s, i) => i == 0 || spcs(i - 1) != s }
      .map { case (s, i) => (i + 1, s) } // (first_chunk 1-based, spc)
    val stsc = full("stsc", 0, concat(be32(scRuns.length.toLong) +:
      scRuns.flatMap { case (fc, s) =>
        Seq(be32(fc.toLong), be32(s.toLong), be32(1)) }: _*))
    val stsz = full("stsz", 0, stszPayload)
    val stco = full("stco", 0,
      concat(be32(chunkOffsets.length.toLong) +: chunkOffsets.map(be32): _*))
    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stco))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhd, trak))
    concat(ftyp, mdat, moov)
  }
}
