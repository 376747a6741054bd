package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.9 X5): image/audio/video travel
  * as opaque `binary` payloads with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample are per-partition batch
  * transformations over those payloads.
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake ([[stubDecode]]); the Spark-side
  * plumbing is real: schema (`payload: binary, meta: struct`), partition-wise
  * batch execution via `mapPartitions` (the Scala analog of `mapInPandas`
  * batches), and pure-column metadata ops that stay in codegen.
  *
  * Scale notes: payloads never pass through the driver; `mapPartitions`
  * processes one task's worth of media at a time, so executor memory bounds
  * batch size via `spark.sql.files.maxPartitionBytes`. For real codecs the
  * decoder handle is created once per partition (not per row) — the iterator
  * structure below already has that shape.
  */
object Multimodal {

  /** Media metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary column into graft's media struct with byte-level metadata
    * (decode-independent: size + declared format). Pure column expression. */
  def media(payload: org.apache.spark.sql.Column, format: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    struct(
      payload.as("payload"),
      struct(
        format.as("format"),
        length(payload).cast(LongType).as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height")).as("meta"))

  /** STUB decoder — deterministic fake standing in for a real image decode
    * (??? in spirit: no codec exists in this environment). Derives stable
    * pseudo-dimensions from payload bytes so tests are reproducible. A real
    * deployment replaces only this function with e.g. a JNI codec call. */
  def stubDecode(payload: Array[Byte]): (Int, Int) = {
    // derived from the byte COUNT only: a content-derived term (e.g. the
    // first byte) is not reproducible by a SQL oracle, whose string
    // functions see characters/codepoints, not UTF-8 bytes
    val n = payload.length
    (n % 640 + 16, (n * 7 + n % 251) % 480 + 16)
  }

  /** Partition-batched decode: (id, payload) → (id, width, height). The
    * decoder is invoked once per row but initialized once per partition —
    * the real-codec shape. A null payload (routine for opaque media columns)
    * yields null dimensions rather than killing the task. Returns columns
    * (id, width, height). */
  def decodePartitions(df: DataFrame, id: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast(LongType), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init goes here (JNI handle, model load, ...)
        it.map { case (rowId, bytes) =>
          if (bytes == null) (rowId, None: Option[Int], None: Option[Int])
          else {
            val (w, h) = stubDecode(bytes)
            (rowId, Some(w), Some(h))
          }
        }
      }
      .toDF(id, "width", "height")
  }

  /** Resize stub: recomputes the metadata dimensions to the target box
    * preserving aspect ratio (real pixel resampling would replace the
    * payload via [[decodePartitions]]-style batching; the metadata algebra
    * and column plumbing are the real part). */
  def resizeMeta(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      maxW: Int, maxH: Int): org.apache.spark.sql.Column = {
    val scale = least(lit(maxW) / width.cast("double"), lit(maxH) / height.cast("double"), lit(1.0))
    struct(
      floor(width * scale).cast(IntegerType).as("width"),
      floor(height * scale).cast(IntegerType).as("height"))
  }

  /** Frame sampling stub: n evenly-spaced fixed-size byte windows from the
    * payload (a video decoder would emit decoded frames; the slicing/batching
    * shape is identical). Pure column expression over binary. */
  def sampleFrames(payload: org.apache.spark.sql.Column, n: Int, frameBytes: Int)
      : org.apache.spark.sql.Column = {
    // n = 0 would make sequence(0, -1) a DESCENDING [0, -1] (the same trap
    // TextStats.chunk guards), silently emitting two garbage frames
    require(n >= 1, "need at least one frame")
    require(frameBytes > 0, "frameBytes must be positive")
    transform(sequence(lit(0), lit(n - 1)), i => {
      val len = length(payload)
      val start = (i * greatest(len - frameBytes, lit(0)) / lit(math.max(n - 1, 1))) + 1
      payload.substr(start.cast(IntegerType), lit(frameBytes))
    })
  }
}
