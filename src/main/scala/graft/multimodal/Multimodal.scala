package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride along as opaque
  * binary columns with typed metadata. The decode step is a clearly
  * marked STUB (no media libraries in this environment) — everything
  * around it (schema, batch shape, partition-local execution) is the
  * real Spark plumbing a decode UDF would plug into.
  */
object Multimodal {

  /** Attach a binary payload (UTF-8 bytes of the text stand in for
    * image bytes) and extract typed metadata SQL-side: modality from
    * id, byte length, leading magic bytes, deterministic fake
    * dimensions. */
  def metadata(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", expr("encode(text, 'UTF-8')"))
      .select(col("doc_id"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("modality"),
        expr("length(payload)").as("n_bytes"),
        expr("hex(encode(substring(text, 1, 4), 'UTF-8'))").as("magic"),
        expr("CASE WHEN doc_id % 3 = 0 THEN (doc_id * 37) % 1280 + 64 END").as("width"),
        expr("CASE WHEN doc_id % 3 = 0 THEN (doc_id * 53) % 720 + 64 END").as("height"),
        expr("CASE WHEN doc_id % 3 != 0 THEN round(((doc_id * 7) % 300 + 1) / 10.0D + 1e-9, 1) END").as("duration_s"))

  case class MediaFeature(doc_id: Long, modality: String, n_bytes: Int,
      feature: Array[Float])

  case class Thumb(doc_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** Image resize seam: for image-modality rows, produce a fixed
    * `w × h` thumbnail payload partition-locally. The byte content is
    * a STUB (deterministic stride-sampling of the source payload —
    * a real impl decodes + resamples pixels here); the Spark plumbing
    * is real: modality filter pushed to the scan, binary column
    * batched per partition, fixed-size binary output schema. */
  def resize(spark: SparkSession, documents: DataFrame, w: Int = 32, h: Int = 32): Dataset[Thumb] = {
    import spark.implicits._
    metadata(documents)
      .filter(col("modality") === "image") // single source of the modality rule
      .join(documents.select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload")), Seq("doc_id"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          // --- decode/resample STUB: real impl decodes pixels here ---
          val out = Array.tabulate(w * h) { i =>
            if (payload.isEmpty) 0.toByte
            else payload((i.toLong * 2654435761L % payload.length).toInt)
          }
          Thumb(id, w, h, out)
        }
      }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_ts_s: Double, frame: Array[Byte])

  /** Video frame-sampling seam: one row per sampled frame at
    * `everyS`-second stride across the clip duration (from the typed
    * metadata), payload sliced deterministically per frame (STUB for
    * the real demuxer). The explode happens in the plan (posexplode
    * over a computed frame count), so a 10-hour clip fans out across
    * the cluster instead of materializing on one task. */
  def frameSample(spark: SparkSession, documents: DataFrame, everyS: Double = 5.0): Dataset[Frame] = {
    import spark.implicits._
    metadata(documents)
      .filter(col("modality") === "video")
      .join(documents.select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload")), Seq("doc_id"))
      .select(col("doc_id"), col("duration_s"), col("payload"),
        posexplode(expr(s"sequence(0, cast(floor(duration_s / ${everyS}D) AS int))")))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        round(col("col") * everyS + lit(1e-9), 3).as("frame_ts_s"), col("payload"))
      .as[(Long, Int, Double, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, idx, ts, payload) =>
          // --- demux STUB: real impl seeks + decodes the frame here ---
          val sliceLen = math.max(1, payload.length / 8)
          val start = if (payload.length == 0) 0 else (idx * sliceLen) % payload.length
          Frame(id, idx, ts, payload.slice(start, math.min(start + sliceLen, payload.length)))
        }
      }
  }

  /** Partition-local decode + feature extraction over the binary
    * column — the seam where a real image/audio decoder would run
    * (reference architecture: mapInPandas batches; here
    * `mapPartitions` with an `Encoder`, identical partitioning/batch
    * shape).
    *
    * STUB: the "decoder" derives a deterministic 8-dim feature from
    * the payload bytes instead of decoding pixels. */
  def featureExtract(spark: SparkSession, documents: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    val withPayload = metadata(documents.select(col("doc_id"), col("text")))
      .join(documents.select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload")), Seq("doc_id"))
    withPayload.select("doc_id", "modality", "n_bytes", "payload").as[(Long, String, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, nBytes, payload) =>
          // --- decode STUB: real impl would decode payload here ---
          val feat = Array.tabulate(8) { i =>
            val slice = payload.iterator.zipWithIndex
              .filter(_._2 % 8 == i).map(_._1.toInt & 0xff).sum
            (slice % 997) / 997.0f
          }
          MediaFeature(id, modality, nBytes, feat)
        }
      }
  }
}
