package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per partition in bounded batches.
  *
  * The Spark side is real — schema, partition sizing, per-partition batch
  * iteration, metadata propagation. The codec itself is a pluggable
  * [[MediaDecoder]]; this container has no image/audio libraries, so the
  * default is [[FakeDecoder]], a clearly-marked deterministic stand-in that
  * parses our synthetic header format. Swap in a JNI/javacv decoder by
  * implementing the trait — no pipeline change.
  *
  * Scale notes: media bytes dominate row size, so the pipeline (a) never
  * shuffles raw bytes after decode (metadata is extracted first, bytes
  * dropped or passed through by need), (b) repartitions by target partition
  * BYTES not row count before heavy decode, (c) processes rows iterator-
  * style inside partitions — no per-partition materialization.
  */
object Media {

  final case class MediaMeta(
      format: String, width: Int, height: Int, nFrames: Int, durationMs: Long)

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
    /** Deterministic per-frame sampling positions for video/audio. */
    def sampleFrames(meta: MediaMeta, every: Int): Seq[Int] =
      (0 until meta.nFrames by math.max(1, every)).toSeq
  }

  /** STUB — deterministic fake codec for the zero-dependency container.
    * Reads our synthetic 16-byte header: [fmt:1][w:2][h:2][frames:2][...].
    * A real deployment implements MediaDecoder over javacv/ffmpeg.
    */
  object FakeDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.length < 8)
        return MediaMeta("unknown", 0, 0, 0, 0L)
      def u16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      val fmt = (bytes(0) & 0x03) match {
        case 0 => "jpeg"; case 1 => "png"; case 2 => "wav"; case _ => "mp4"
      }
      MediaMeta(fmt, u16(1) % 4096, u16(3) % 4096, u16(5) % 1024, (u16(5) % 1024) * 40L)
    }
  }

  /** Synthesizes a deterministic binary media column from any seed column —
    * testdata has no real media, so the pipeline is driven by fake bytes
    * derived from md5 (stable across engines and runs).
    */
  def syntheticMediaBytes(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(md5(seed.cast("string")))

  /** Size-aware repartition shared by every heavy pass: estimate total
    * payload bytes (coalesced — sum() over zero rows or all-null bytes is
    * NULL) and aim each partition at targetPartitionBytes.
    */
  private def sizedPartitions(
      df: DataFrame, idCol: String, bytesCol: String,
      targetPartitionBytes: Long): DataFrame = {
    val sized = df.select(col(idCol).cast("long").as("media_id"), col(bytesCol).as("bytes"))
    val totalBytes = sized.agg(coalesce(sum(length(col("bytes"))), lit(0L)))
      .collect()(0).getLong(0) max 1L
    val parts = math.max(1, math.min(2048, (totalBytes / targetPartitionBytes).toInt + 1))
    sized.repartition(parts)
  }

  /** Decode pass: binary column → typed metadata struct, iterator-style per
    * partition, bytes not retained in the output.
    */
  def extractMetadata(
      df: DataFrame, idCol: String, bytesCol: String,
      decoder: MediaDecoder = FakeDecoder,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val decoded: Dataset[(Long, String, Int, Int, Int, Long)] =
      sizedPartitions(df, idCol, bytesCol, targetPartitionBytes)
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val m = decoder.decode(bytes)
            (id, m.format, m.width, m.height, m.nFrames, m.durationMs)
          }
        }
    decoded.toDF("media_id", "format", "width", "height", "n_frames", "duration_ms")
  }

  /** Frame-sample pass: explode the decoder's sampling positions per video
    * row. The per-frame decode is the stub boundary (??? in a real codec's
    * place would go the pixel work); the decoder's sampleFrames IS the
    * extension point — a codec-aware override (keyframe-aligned sampling)
    * must actually be consulted, not re-derived with a SQL sequence().
    */
  def sampleFrames(meta: DataFrame, every: Int,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.where(col("n_frames") > 0)
      .select(col("media_id").cast("long"), col("format"), col("width"),
        col("height"), col("n_frames"), col("duration_ms"))
      .as[(Long, String, Int, Int, Int, Long)]
      .flatMap { case (id, fmt, w, h, nf, dur) =>
        decoder.sampleFrames(MediaMeta(fmt, w, h, nf, dur), every)
          .map(idx => (id, fmt, idx))
      }
      .toDF("media_id", "format", "frame_idx")
  }

  /** Resize pass: binary → binary at target dimensions. The pixel resample
    * is the stub boundary (a real codec would decode, scale, re-encode);
    * the Spark-side shape is production-real: size-aware partitioning,
    * iterator processing, the output carries the new bytes + new dims and
    * drops the originals so a 100 TB re-encode never doubles its footprint
    * in a shuffle.
    */
  def resize(df: DataFrame, idCol: String, bytesCol: String,
      targetW: Int, targetH: Int,
      decoder: MediaDecoder = FakeDecoder,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    sizedPartitions(df, idCol, bytesCol, targetPartitionBytes)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decoder.decode(bytes)
          // STUB resample: deterministic bytes derived from (input, target)
          // via md5 over "hex(input):WxH" — a text-domain derivation so an
          // external oracle (q_media_resize) can recompute the output bytes
          // without binary md5 support
          val hex = bytes.map(b => f"$b%02x").mkString
          val seed = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$hex:${targetW}x$targetH".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, m.format, targetW, targetH, seed)
        }
      }
      .toDF("media_id", "format", "width", "height", "bytes")
  }

  /** Feature-extract pass: binary → fixed-dim float vector, the embedding-
    * extraction shape that feeds the ANN operators. Deterministic stub
    * features (hash-seeded) in place of a real vision/audio model; the
    * Spark side — size-aware partitioning, iterator processing, vectors
    * (not bytes) in the output — is the production shape.
    */
  def extractFeatures(
      df: DataFrame, idCol: String, bytesCol: String, dim: Int = 64,
      targetPartitionBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    sizedPartitions(df, idCol, bytesCol, targetPartitionBytes)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: hash-seeded unit-norm vector stands in for model inference
          val h = graft.sketch.Hashing.murmur128(if (bytes == null) Array.empty else bytes)
          val v = new Array[Float](dim)
          var s = h.h1
          var i = 0
          var norm = 0.0
          while (i < dim) {
            s = graft.sketch.Hashing.fmix64(s + i * h.h2)
            v(i) = (s.toDouble / Long.MaxValue).toFloat
            norm += v(i) * v(i)
            i += 1
          }
          val inv = (1.0 / math.sqrt(norm max 1e-12)).toFloat
          i = 0
          while (i < dim) { v(i) *= inv; i += 1 }
          (id, v.toSeq)
        }
      }
      .toDF("media_id", "feature")
  }
}
