package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded in batches.
  *
  * The actual codec layer is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] parses a deterministic fake header instead of
  * calling a real decoder — but the Spark-side plumbing is real and what a
  * production decode would use: a binary column flowing through
  * `mapPartitions` (the Scala analog of `mapInPandas` batch decode), a
  * typed output schema, and partition-sized batches. Swap `parseHeader`
  * with a real JNI/library call and nothing else changes.
  */
object Multimodal {

  /** Fake media payload: 2-byte header (w, h in 32..126, single-byte UTF-8)
    * followed by the document text bytes. Built as expressions so the
    * construction is portable to the oracle.
    */
  def fakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = (col(idCol) % 95 + 32).cast("int")
    val h = ((col(idCol) * 7) % 95 + 32).cast("int")
    df.select(
      col(idCol),
      encode(concat(expr(s"char($idCol % 95 + 32)"), expr(s"char(($idCol * 7) % 95 + 32)"),
        col(textCol)), "UTF-8").as("payload"))
  }

  /** The output schema of the stub decoder. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("img_w", IntegerType, nullable = false),
    StructField("img_h", IntegerType, nullable = false),
    StructField("blob_len", IntegerType, nullable = false),
    StructField("brightness", IntegerType, nullable = false)))

  /** Batch "decode": reads real bytes from the binary column per partition.
    * brightness = sum of the first 16 payload bytes mod 256 — the stand-in
    * for a real feature extraction.
    */
  def decodeStub(payloads: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val idIdx = payloads.schema.fieldIndex(idCol)
    val pIdx = payloads.schema.fieldIndex("payload")
    payloads.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val w = bytes(0) & 0xFF
        val h = bytes(1) & 0xFF
        var s = 0
        var i = 0
        while (i < math.min(16, bytes.length)) { s += bytes(i) & 0xFF; i += 1 }
        Row(id, w, h, bytes.length, s % 256)
      }
    }(Encoders.row(DecodedSchema))
  }

  /** Cheap expression-level "thumbnail": first n payload bytes (what a real
    * resize would replace); stays in codegen.
    */
  def thumbnail(payload: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    payload.substr(lit(1), lit(n))

  /** Frame sampling for a (stub) video payload: split the payload into
    * fixed-size frames and keep every k-th — exercises the
    * array-of-binary shape a video pipeline produces.
    */
  def sampleFrames(payloads: DataFrame, idCol: String, frameSize: Int, every: Int): DataFrame = {
    val payload = col("payload")
    val frameIdx = filter(
      sequence(lit(0L), ((length(payload) - 1) / frameSize).cast("long")),
      i => i % every === 0)
    payloads.select(
      col(idCol),
      transform(frameIdx, i => payload.substr(i * frameSize + 1, lit(frameSize)))
        .as("frames"))
  }
}
