package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque binary payload + structured metadata —
  * the multimodal-column data model (image/audio/video as `binary`
  * with typed sidecar metadata).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    mime: String,
    width: Int,
    height: Int,
    duration_ms: Long,
    content: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal-column plumbing for training-data pipelines: schema,
  * size-aware partitioning, and batched per-partition decode /
  * feature-extract / resize / frame-sample.
  *
  * ==STUB DECODE==
  * This container ships no image/audio codecs, so `decodeBytes` is a
  * DETERMINISTIC FAKE (byte-histogram features). The Spark-side
  * contract — binary column in, fixed-dim float vector out, batched
  * per-partition processing, size-aware partitioning — is real and
  * tested; swapping in a JNI/codec decoder changes only the body of
  * [[Multimodal.decodeBytes]].
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB: deterministic byte-histogram "features" standing in for a
    * real codec+model decode. Replace with the actual decoder.
    */
  def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Batched decode: one partition = one sequential batch through the
    * (stub) codec — the mapInPandas batch shape. Binary payloads never
    * hit the driver; feature rows are narrow.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length, decodeBytes(m.content))
      }
    }
  }

  /** STUB resize: deterministic byte decimation to ≤ maxBytes (a real
    * implementation re-encodes at lower resolution).
    */
  def resizeStub(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.content.length <= maxBytes) m
      else {
        val stride = math.ceil(m.content.length.toDouble / maxBytes).toInt
        m.copy(content = m.content.indices.collect {
          case i if i % stride == 0 => m.content(i)
        }.toArray.take(maxBytes))
      }
    }
  }

  /** STUB frame sampling: every `everyMs` milliseconds of a "video"
    * payload yields one fixed-size byte window (a real implementation
    * seeks keyframes). Output: (media_id, frame_idx, frame_bytes).
    */
  def frameSampleStub(
      media: Dataset[MediaRecord], everyMs: Long, frameBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = math.max(1, (m.duration_ms / math.max(1, everyMs)).toInt)
      (0 until frames).map { f =>
        val start = if (frames == 1) 0
          else ((m.content.length - frameBytes).max(0).toLong * f / frames).toInt
        (m.media_id, f, m.content.slice(start, start + frameBytes))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Size-aware repartition before decode: binary payloads skew task
    * runtimes badly if partitioned by row count; aim for ~targetBytes
    * of payload per task instead. One lightweight stats job, then a
    * round-robin shuffle.
    */
  def repartitionForDecode(media: Dataset[MediaRecord], targetBytes: Long): Dataset[MediaRecord] = {
    val row = media.toDF().agg(sum(length(col("content")))).head()
    if (row.isNullAt(0)) media // empty input: sum() is null, nothing to spread
    else {
      val parts = math.max(1, math.ceil(row.getLong(0).toDouble / targetBytes).toInt)
      media.repartition(parts)
    }
  }

  /** Deterministic synthetic media corpus for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val size = 64 + (id * 37 % 4096).toInt
      val bytes = Array.tabulate(size)(j => ((id * 31 + j * 7) % 251).toByte)
      MediaRecord(id, kind,
        kind match {
          case "image" => "image/png"
          case "audio" => "audio/wav"
          case _ => "video/mp4"
        },
        width = 16 + (id % 64).toInt, height = 16 + (id % 48).toInt,
        duration_ms = if (kind == "video") 1000 + id * 100 else 0L,
        content = bytes)
    }
  }
}
