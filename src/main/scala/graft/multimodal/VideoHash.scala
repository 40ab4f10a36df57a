package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video near-duplicate fingerprinting — the video end of the dedup
  * brief (reference analog: the movie products of
  * `make_stokes_movie.py`; meerpipe only WRITES movies, so this closes
  * the loop by reading them back). The JDK has no H.264 decoder, but it
  * HAS a JPEG decoder, and [[graft.operators.Raster.aviMjpegBytes]]
  * produces Motion-JPEG AVI — so the container walk here plus
  * `ImageIO` gives a REAL decode → per-frame [[ImageHash.pHash]] →
  * clip fingerprint path with no external codecs. For H.264/mp4
  * corpora the container walk ([[Multimodal.VideoHeader]]) still
  * works; only the frame decode needs an external codec (disclosed
  * stub, same contract as before).
  *
  * Scale shape: decode + hash is a pure flatMap over the binary
  * payload column (the mapPartitions-class exception, like the other
  * codecs — no SQL expression can decode JPEG); everything downstream
  * is the SAME banded Hamming machinery as image/text fingerprints
  * (`Dedup.hammingPairs` on (clip, frame)-keyed rows), so candidate
  * generation stays bucket-local at any corpus size. Corrupt or
  * non-AVI payloads yield zero rows instead of failing the stage.
  */
object VideoHash {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** JPEG frame payloads of an MJPEG-AVI (RIFF) container: walks the
    * chunk tree, collects `##dc`/`##db` stream-data chunks inside
    * `movi` (recursing into `rec ` groups). Nil for anything that is
    * not a well-formed RIFF/AVI — malformed sizes stop the walk rather
    * than throwing. */
  def mjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Nil
    if (fcc(bytes, 0) != "RIFF" || fcc(bytes, 8) != "AVI ") return Nil
    val out = Seq.newBuilder[Array[Byte]]
    def scan(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fcc(bytes, off)
        val size = le32(bytes, off + 4)
        // bounds in Long: a corrupt declared size near Int.MaxValue wraps
        // `off + 8 + size` negative in Int, sneaking past the guard and
        // crashing the walk — violating the zero-rows-never-a-failed-stage
        // contract of frameHashes/dedupClips
        val next = off.toLong + 8L + size
        if (size < 0 || next > end) return
        if (id == "LIST" && size >= 4) {
          val typ = fcc(bytes, off + 8)
          if (typ == "movi" || typ == "rec ")
            scan(off + 12, next.toInt, inMovi = true)
        } else if (inMovi && size > 0 && id(2) == 'd' &&
            (id(3) == 'c' || id(3) == 'b')) {
          out += java.util.Arrays.copyOfRange(bytes, off + 8, next.toInt)
        }
        off = (next + (size & 1)).toInt
      }
    }
    val riffEnd = math.min(bytes.length.toLong, 8L + (le32(bytes, 4) & 0xffffffffL)).toInt
    scan(12, riffEnd, inMovi = false)
    out.result()
  }

  /** Clip fingerprint: per-frame pHash in frame order. Frames that fail
    * to decode or are below the 32×32 pHash grid are skipped
    * ([[ImageHash.tryPHash]]), so the fingerprint of a damaged clip is
    * shorter, never an exception. */
  def fingerprint(avi: Array[Byte]): Seq[Long] =
    mjpegFrames(avi).flatMap(j =>
      Multimodal.ImageCodec.decode(j).flatMap(ImageHash.tryPHash))

  /** Corpus stage: explode (id, aviBytes) into (clip_id, frame_idx,
    * phash) rows — the decode map stage; `frame_idx` numbers DECODED
    * frames. Null/corrupt payloads contribute zero rows. */
  def frameHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol).copy(name = "clip_id"),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    df.select(col(idCol), col(binCol))
      .flatMap { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty
        else fingerprint(payload).iterator.zipWithIndex
          .map { case (h, i) => Row(r.get(0), i, h) }
      }(Encoders.row(outSchema))
  }

  /** Clip-level near-duplicate pairs from a frame-hash table: frame
    * pairs within `maxDist` Hamming via the banded-LSH join
    * (pigeonhole-exact recall for maxDist < bands), aggregated to clip
    * pairs scored by CONTAINMENT of the smaller-id clip —
    * `match_frac` = (its distinct frames with a near-dup frame in the
    * other clip) / (its frame count). Output: (a_clip, b_clip,
    * matched_frames, n_frames, match_frac ≥ minFrac), a_clip < b_clip.
    * Feed the pairs to `Dedup.dropLosers` to drop the duplicates. */
  def nearDupClips(frames: DataFrame, clipCol: String, frameCol: String,
                   hashCol: String, maxDist: Int, minFrac: Double,
                   bands: Int = 4): DataFrame = {
    import graft.operators.Dedup
    val withId = frames.select(
      struct(col(clipCol).as("clip"), col(frameCol).as("frame")).as("fid"),
      col(hashCol).as("h"))
    // hammingPairs orients a_id < b_id on the (clip, frame) struct, so
    // after dropping same-clip pairs a_id.clip < b_id.clip always holds
    val pairs = Dedup.hammingPairs(withId, "h", "fid", maxDist, bands)
      .filter(col("a_id.clip") =!= col("b_id.clip"))
      .select(col("a_id.clip").as("a_clip"), col("b_id.clip").as("b_clip"),
        col("a_id.frame").as("a_frame"))
    val counts = frames.groupBy(col(clipCol).as("a_clip"))
      .agg(countDistinct(col(frameCol)).as("n_frames"))
    pairs.groupBy("a_clip", "b_clip")
      .agg(countDistinct(col("a_frame")).as("matched_frames"))
      .join(counts, Seq("a_clip"))
      .withColumn("match_frac",
        col("matched_frames").cast("double") / col("n_frames"))
      .filter(col("match_frac") >= lit(minFrac))
  }

  /** One-call video dedup: decode → per-frame pHash → clip near-dup
    * pairs → connected components → min-id survivor per cluster — the
    * clip table with near-duplicate videos dropped (the
    * `dedupCorpusByHammingHash` semantics, lifted to multi-frame
    * clips). */
  def dedupClips(clips: DataFrame, idCol: String, binCol: String,
                 maxDist: Int, minFrac: Double, bands: Int = 4): DataFrame = {
    val frames = frameHashes(clips, idCol, binCol)
    val pairs = nearDupClips(frames, "clip_id", "frame_idx", "phash",
        maxDist, minFrac, bands)
      .select(col("a_clip").as("a_id"), col("b_clip").as("b_id"))
    graft.operators.Dedup.dropLosers(clips, pairs, idCol)
  }
}
