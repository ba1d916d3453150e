package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride along as opaque
  * binary columns with typed metadata. Decode is REAL for binary PPM
  * ([[decodePpm]] — a dependency-free P6 header+pixel parser; see
  * [[imageDecode]] and the PPM branch of [[featureExtract]]); every
  * other format's decode step is a clearly marked STUB (no media
  * libraries in this environment) — everything around it (schema,
  * batch shape, partition-local execution) is the real Spark plumbing
  * a decode UDF would plug into.
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

  /** Dependency-free binary-PPM (P6) decoder — the ONE real decode
    * path behind the multimodal seams (no media libraries in this
    * environment; PPM is a pure header + raw-RGB format, so the full
    * decode is ~30 lines of stdlib Scala). Parses the `P6`, width,
    * height, maxval header (whitespace- and #-comment-tolerant, like
    * netpbm), requires maxval 255, and returns (width, height,
    * rgb-interleaved pixel bytes). Fails loudly on anything
    * malformed — a silent fallback would hide corrupt payloads. */
  private[graft] def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def token(): String = {
      while (pos < bytes.length && (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val b = new StringBuilder
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) {
        b.append(bytes(pos).toChar); pos += 1
      }
      b.toString
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM (magic '$magic')")
    val w = token().toInt; val h = token().toInt; val maxv = token().toInt
    require(w > 0 && h > 0, s"bad PPM dimensions ${w}x$h")
    require(maxv == 255, s"unsupported PPM maxval $maxv")
    pos += 1 // exactly one whitespace byte separates header and pixels
    val px = bytes.slice(pos, pos + w * h * 3)
    require(px.length == w * h * 3,
      s"truncated PPM pixel data: got ${px.length} of ${w * h * 3} bytes")
    (w, h, px)
  }

  /** Deterministic PPM synthesizer for the test corpus (the driver
    * tables carry no real image bytes): pixel byte i of doc `id` is
    * `(id·31 + i·7) mod 256` — closed form, so the DuckDB oracle can
    * mirror the DECODED statistics without parsing bytes. */
  private[graft] def synthesizePpm(docId: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(i => ((docId * 31 + i * 7) % 256).toByte)
    header ++ px
  }

  case class DecodedImage(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode over the synthesized PPM payloads: each
    * image-modality doc gets a small deterministic P6 image
    * (width = id%13+4, height = id%7+4), the engine round-trips it
    * through [[synthesizePpm]] → bytes → [[decodePpm]] → channel
    * sums, and the frame reports per-image mean R/G/B + Rec.601 luma.
    * The DuckDB oracle computes the same statistics from the
    * generator's closed form — a bug in either the encoder or the
    * parser breaks the hash match.
    *
    * Plan: stateless partition-local decode (mapPartitions with a
    * case-class Encoder — the mapInPandas batch shape), integer
    * channel sums out, means/luma as plan projections. */
  def imageDecode(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val decoded = metadata(documents)
      .filter(col("modality") === "image")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (id % 13 + 4).toInt; val h = (id % 7 + 4).toInt
          val (dw, dh, px) = decodePpm(synthesizePpm(id, w, h))
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val v = px(i).toInt & 0xff
            (i % 3: @unchecked) match {
              case 0 => sr += v
              case 1 => sg += v
              case 2 => sb += v
            }
            i += 1
          }
          DecodedImage(id, dw, dh, dw.toLong * dh, sr, sg, sb)
        }
      }.toDF()
    def mean(c: String) =
      round(col(c) / col("n_pixels").cast("double") + lit(1e-9), 6)
    decoded
      .withColumn("mean_r", mean("sum_r"))
      .withColumn("mean_g", mean("sum_g"))
      .withColumn("mean_b", mean("sum_b"))
      .withColumn("luma", round(lit(0.299) * col("mean_r")
        + lit(0.587) * col("mean_g") + lit(0.114) * col("mean_b")
        + lit(1e-9), 6))
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        col("mean_r"), col("mean_g"), col("mean_b"), col("luma"))
  }

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
    * REAL for binary PPM: a payload that parses as P6 yields genuine
    * pixel features (normalized dims + channel means + luma via
    * [[decodePpm]]). Every other format stays a STUB (deterministic
    * byte-slice feature — no media libraries in this environment). */
  def featureExtract(spark: SparkSession, documents: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    val withPayload = metadata(documents.select(col("doc_id"), col("text")))
      .join(documents.select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload")), Seq("doc_id"))
    withPayload.select("doc_id", "modality", "n_bytes", "payload").as[(Long, String, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, nBytes, payload) =>
          val ppm = scala.util.Try(decodePpm(payload)).toOption
          val feat = ppm match {
            case Some((w, h, px)) =>
              // --- REAL decode: per-channel means + Rec.601 luma ---
              val sums = new Array[Long](3)
              var i = 0
              while (i < px.length) { sums(i % 3) += px(i).toInt & 0xff; i += 1 }
              val n = (w.toLong * h).toFloat
              val (mr, mg, mb) =
                (sums(0) / n / 255f, sums(1) / n / 255f, sums(2) / n / 255f)
              Array(w / 4096f, h / 4096f, mr, mg, mb,
                0.299f * mr + 0.587f * mg + 0.114f * mb, 1f, 0f)
            case None =>
              // --- decode STUB for non-PPM payloads ---
              Array.tabulate(8) { i =>
                val slice = payload.iterator.zipWithIndex
                  .filter(_._2 % 8 == i).map(_._1.toInt & 0xff).sum
                (slice % 997) / 997.0f
              }
          }
          MediaFeature(id, modality, nBytes, feat)
        }
      }
  }
}
