package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top-level and public: Janino can't resolve accessors of a private
  * object-nested case class, so the encoder's generated serializer failed to
  * compile and every stage touching it silently fell back to interpreted
  * mode (~10× slower in round 1's bench). */
case class DecodedMedia(media_id: Long, width: Int, height: Int,
    histogram: Seq[Double], decode_error: Boolean)

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns plus typed metadata, with
  * decode/feature steps shaped for batch execution.
  *
  * The container ships no image/audio codecs, so the *decode kernels are
  * deterministic stubs* (clearly marked) — but the Spark-side contract is
  * real and tested: schema, per-partition batch iteration, null/corrupt
  * isolation, and pure-column fast paths. Swapping a stub for a real codec
  * (JNI or vectorized UDF) changes one function, not the pipeline.
  *
  * Scale notes: media payloads dominate row size. Keep them in their own
  * table keyed by content hash (dedup joins stay narrow), filter/join on
  * metadata columns FIRST, and only then touch bytes — every helper here
  * takes and returns DataFrames so Catalyst can prune the binary column
  * until the decode stage actually needs it.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("mime", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Content-hash fingerprint over raw bytes — pure column expression, so
    * exact media dedup is a plain hash-shuffle groupBy like text dedup. */
  def contentFingerprint(content: Column): Column = md5(content)

  def payloadSize(content: Column): Column = length(content)

  /** ==== STUB ==== deterministic fake "decode": derives pseudo
    * width/height/channel stats from the payload bytes. A real build links
    * an image codec here; everything downstream is codec-agnostic. */
  def decodeImageStub(content: Array[Byte]): (Int, Int, Array[Double]) = {
    if (content == null || content.length < 4)
      throw new IllegalArgumentException("corrupt media payload")
    val w = 1 + (math.abs(content(0).toInt * 256 + content(1)) % 4096)
    val h = 1 + (math.abs(content(2).toInt * 256 + content(3)) % 4096)
    val histogram = Array.tabulate(8)(b =>
      content.count(x => ((x & 0xff) >> 5) == b).toDouble / content.length)
    (w, h, histogram)
  }

  /** ==== STUB ==== deterministic fake frame sampler: cuts the payload into
    * `n` evenly spaced "frames" (byte slices). Real impl: keyframe decode. */
  def sampleFramesStub(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val step = math.max(1, content.length / n)
    (0 until math.min(n, content.length)).map { i =>
      content.slice(i * step, math.min(i * step + step, content.length))
    }
  }


  /** Decode/feature-extract stage: per-partition batch iteration (one codec
    * instance per partition, corrupt rows isolated to a flag column instead
    * of failing the stage — R4 semantics for media).
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codecs initialize here, once per partition
        rows.map { case (id, bytes) =>
          try {
            val (w, h, hist) = decodeImageStub(bytes)
            DecodedMedia(id, w, h, hist.toSeq, decode_error = false)
          } catch {
            case _: Exception =>
              DecodedMedia(id, -1, -1, Seq.empty, decode_error = true)
          }
        }
      }
      .toDF()
  }

  /** Video path: explode sampled frames into one row per frame, preserving
    * pruning (only media_id + content are read). */
  def explodeFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // null/empty payloads yield no frames (R4: isolate, don't abort)
        Option(bytes).filter(_.nonEmpty).toSeq.flatMap { b =>
          sampleFramesStub(b, framesPerVideo).zipWithIndex.map {
            case (frame, i) => (id, i, frame)
          }
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Deterministic synthetic media table for tests/bench (no codecs in the
    * container → payloads are seeded pseudo-random bytes). */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val bytes = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      (i.toLong, if (i % 3 == 0) "video" else "image", "application/x-fake", bytes)
    }.toDF("media_id", "kind", "mime", "content")
  }
}
