package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (builder-prompt north star): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as a typed
  * `mapPartitions` stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE standing in for a real decoder
  * (e.g. JPEG → pixel tensor). Everything around it — binary column
  * construction, metadata schema, per-partition batch shape,
  * partitioning — is real and is what a production decode pipeline
  * would reuse unchanged: swap `decodeStub` for a JNI/codec call and
  * the plan is identical. Per-partition iterator processing (not
  * per-row UDF) is the shape that amortizes decoder init at scale.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  case class Asset(doc_id: Long, fmt: String, width: Int, height: Int,
      data: Array[Byte])

  /** Decoded features per asset, including sampled "frames" and the
    * resized payload's size/checksum. */
  case class AssetFeatures(doc_id: Long, n_frames: Int, mean_byte: Double,
      checksum: Long, frame_samples: Array[Int], resized_n_bytes: Int,
      resized_checksum: Long)

  /** STUB decoder — deterministic fake. A real implementation would
    * decode `a.data` with an image/audio codec; this one derives
    * stand-in features from the raw bytes so the pipeline shape (and
    * its tests) are real while the codec is not present:
    *  - n_frames: 256-byte blocks ≈ "frames" sampled from a video
    *  - mean_byte: stand-in for mean pixel intensity
    *  - checksum: FNV-1a over the payload (decode integrity check)
    *  - frame_samples: first byte of every "frame" — the frame-sampling
    *    shape (every Nth unit of an opaque payload → a typed array) */
  private def decodeStub(a: Asset): AssetFeatures = {
    val bytes = a.data
    var acc = 0L
    var sum = 0.0
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L // FNV-1a
      sum += (bytes(i) & 0xff)
      i += 1
    }
    val nFrames = (bytes.length + 255) / 256
    val frames = Array.tabulate(nFrames)(f => bytes(f * 256) & 0xff)
    // "resize": nearest-neighbor down-sample of the payload to ≤128
    // units — the stub for image/audio resampling; a real resize swaps
    // the byte picker for a pixel interpolator, the shape is identical.
    val step = math.max(1, bytes.length / 128)
    val resized = Array.range(0, bytes.length, step).map(bytes(_))
    var racc = 0L
    resized.foreach(b => racc = (racc ^ (b & 0xffL)) * 1099511628211L)
    AssetFeatures(a.doc_id, nFrames,
      if (bytes.length == 0) 0.0 else sum / bytes.length, acc, frames,
      resized.length, racc)
  }

  /** documents → assets: text bytes stand in for the media payload;
    * fmt/width/height are deterministic metadata. */
  private def assets(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("wav").as("fmt"),
      ((col("doc_id") % 16 + 1) * 64).cast(IntegerType).as("width"),
      ((col("doc_id") % 9 + 1) * 64).cast(IntegerType).as("height"),
      encode(col("text"), "UTF-8").as("data"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── m01: multimodal ingest — binary payload column + typed
    // metadata; the byte-level facts are oracle-checked.
    "m01_multimodal_meta" -> ((s, d) => {
      assets(s, d)
        .select(col("doc_id"), col("fmt"), col("width"), col("height"),
          octet_length(col("data")).cast(IntegerType).as("n_bytes"),
          (col("width").cast(LongType) * col("height")).as("n_pixels"))
        .orderBy(col("doc_id"))
    }),

    // ── m02: decode + feature extraction via typed mapPartitions
    // (decoder is a marked stub; plumbing is real). No oracle —
    // rows-only check.
    "m02_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      val ds: Dataset[Asset] = assets(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .as[Asset]
      ds.mapPartitions(it => it.map(decodeStub))
        .toDF()
        .select(col("doc_id"), col("n_frames"),
          round(col("mean_byte"), 6).as("mean_byte"), col("checksum"),
          col("frame_samples"), col("resized_n_bytes"), col("resized_checksum"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "m01_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
        |  CAST((doc_id % 16 + 1) * 64 AS INTEGER) AS width,
        |  CAST((doc_id % 9 + 1) * 64 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST((doc_id % 16 + 1) * 64 * ((doc_id % 9 + 1) * 64) AS BIGINT) AS n_pixels
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
