package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Decoded media features — output row of the stub decoder. */
case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
  first_byte: Long, byte_sum: Long)

/** Media payload row fed to the per-partition decoder. */
case class MediaPayload(doc_id: Long, fmt: String, payload: Array[Byte])

/** Stub "image resize" output: fixed 8×8 thumbnail checksum. */
case class ThumbFeatures(doc_id: Long, n_bytes: Long, out_w: Long,
  out_h: Long, thumb_sum: Long)

/** Stub "video frame sample" output: one row per sampled frame. */
case class FrameSample(doc_id: Long, frame_idx: Long, frame_sum: Long)

/** SURVEY.md §2.9 — multimodal columns.
  *
  * Media (image/audio/video) is modeled as an opaque `binary` payload
  * column plus a typed metadata struct, joined/aggregated like any other
  * column. The decode step is the Scala analogue of a `mapInPandas`
  * batch UDF: a typed `mapPartitions` where a real decoder (libjpeg,
  * ffmpeg, …) would be loaded ONCE per partition and applied per batch.
  * No media codec ships in this container, so the decoder body is a
  * deterministic STUB (byte stats over the payload); the Spark-side
  * plumbing — binary schema, partition-level batching, typed encoders —
  * is real and oracle-verified.
  */
object Multimodal {

  /** documents ⋈ embeddings on doc_id=vec_id: text + vector columns
    * carried through one join and aggregated per label. The embeddings
    * side is the smaller table — broadcast it.
    */
  def multimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val e = Tables(spark, dir, "embeddings")
    d.join(broadcast(e), d("doc_id") === e("vec_id"), "inner")
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        (sum("n_chars").cast("double") / count(lit(1)).cast("double"))
          .as("avg_chars"),
        max(element_at(col("embedding"), 1)).as("max_first_dim"))
      .orderBy("label")
  }

  /** Binary payload pipeline: encode → mapPartitions stub decode →
    * feature columns.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables(spark, dir, "documents")
      .select(col("doc_id"), lit("txt").as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
    payloads.mapPartitions { iter =>
      // A real decoder would be initialized here, once per partition
      // (model load / codec init), then applied to each payload batch.
      iter.map { p =>
        val bytes = p.payload
        MediaFeatures(
          doc_id = p.doc_id,
          fmt = p.fmt,
          n_bytes = bytes.length.toLong,
          first_byte = if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong,
          byte_sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }.toDF().orderBy("doc_id")
  }

  private def payloads(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), lit("txt").as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaPayload]
  }

  /** Stub "image resize": the payload is treated as a w=16 byte raster,
    * stride-sampled to a fixed 8×8 thumbnail (a real implementation
    * swaps the arithmetic for libvips/PIL inside the same
    * mapPartitions; the partition-batch shape, binary schema and typed
    * encoders are the real plumbing under test). Pure integer index
    * arithmetic → reproduced exactly by the DuckDB oracle.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).mapPartitions { iter =>
      iter.map { p =>
        val n = p.payload.length
        val w = 16L
        val h = (n + 15) / 16L
        var sum = 0L
        var i = 0
        // n = 0 ⇒ the clamp below would index -1; an empty raster's
        // thumbnail sum is 0 by definition (oracle CASEs the same)
        while (n > 0 && i < 8) {
          var j = 0
          while (j < 8) {
            val idx = math.min(i * h / 8 * w + j * w / 8, n - 1L).toInt
            sum += (p.payload(idx) & 0xff)
            j += 1
          }
          i += 1
        }
        ThumbFeatures(p.doc_id, n.toLong, 8L, 8L, sum)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Stub "video frame sampling": the payload is cut into 64-byte
    * frames and every 4th full frame is emitted with a checksum — the
    * one-payload-to-many-frames decode shape (ffmpeg frame extraction
    * would replace the checksum loop; the flatMap batch contract is the
    * operator under test).
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).mapPartitions { iter =>
      iter.flatMap { p =>
        val n = p.payload.length
        val nFrames = n / 64
        (0 until nFrames by 4).map { f =>
          var sum = 0L
          var k = f * 64
          while (k < f * 64 + 64) { sum += (p.payload(k) & 0xff); k += 1 }
          FrameSample(p.doc_id, f.toLong, sum)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  /** Content-type sniffing by magic bytes — the ingest-side gate that
    * catches mislabeled media before a decoder segfaults on it. Each
    * doc gets a synthetic binary payload with a REAL format header
    * (JPEG/PNG/PDF magic, chosen by doc_id so the oracle can restate
    * it), and detection reads the first four bytes via hex prefix
    * match — pure codegen'd column ops, no UDF.
    */
  def mimeDetect(spark: SparkSession, dir: String): DataFrame = {
    val magic = when(col("doc_id") % 4 === 0, unhex(lit("FFD8FFE0")))
      .when(col("doc_id") % 4 === 1, unhex(lit("89504E47")))
      .when(col("doc_id") % 4 === 2, unhex(lit("25504446")))
      .otherwise(unhex(lit("20202020")))
    val d = Tables(spark, dir, "documents")
      .withColumn("payload", concat(magic, encode(col("text"), "UTF-8")))
    val prefix = lower(hex(substring(col("payload"), 1, 4)))
    d.select(col("doc_id"),
      when(prefix.startsWith("ffd8ff"), "image/jpeg")
        .when(prefix.startsWith("89504e47"), "image/png")
        .when(prefix.startsWith("25504446"), "application/pdf")
        .otherwise("text/plain").as("mime"),
      length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mime_detect" -> mimeDetect,
    "llm_multimodal_join" -> multimodalJoin,
    "llm_multimodal_decode" -> multimodalDecode,
    "llm_multimodal_resize" -> multimodalResize,
    "llm_multimodal_frames" -> multimodalFrames
  )

  def oracle: Map[String, String] = Map(
    "llm_mime_detect" ->
      ("SELECT doc_id, CASE doc_id % 4 " +
        "WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png' " +
        "WHEN 2 THEN 'application/pdf' ELSE 'text/plain' END AS mime, " +
        "CAST(octet_length(encode(text)) + 4 AS BIGINT) AS n_bytes " +
        "FROM documents ORDER BY doc_id"),
    "llm_multimodal_join" ->
      ("SELECT label, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars, " +
        "max(embedding[1]) AS max_first_dim " +
        "FROM documents JOIN embeddings ON doc_id = vec_id " +
        "GROUP BY label ORDER BY label"),
    // edge contract (regen-proof): an EMPTY text must not crash or
    // diverge — thumb_sum 0, first_byte -1, byte_sum 0, no frames
    "llm_multimodal_resize" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, " +
        "CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h, " +
        "CAST(CASE WHEN length(text) = 0 THEN 0 ELSE " +
        "list_sum(flatten(list_transform(range(0, 8), i -> " +
        "list_transform(range(0, 8), j -> ascii(substring(text, " +
        "CAST(least(((i * ((length(text) + 15) // 16)) // 8) * 16 + " +
        "(j * 16) // 8, length(text) - 1) AS INTEGER) + 1, 1)))))) END " +
        "AS BIGINT) AS thumb_sum " +
        "FROM documents ORDER BY doc_id"),
    // frame indexes are LATERAL per-document (length(text)//64 frames),
    // not a fixed constant range — a regenerated fixture with longer
    // documents verifies every frame the operator emits
    "llm_multimodal_frames" ->
      ("SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, " +
        "CAST(list_sum(list_transform(range(f * 64 + 1, f * 64 + 65), " +
        "k -> ascii(substring(text, CAST(k AS INTEGER), 1)))) AS BIGINT) " +
        "AS frame_sum " +
        "FROM documents, LATERAL (SELECT unnest(range(0, " +
        "length(text) // 64, 4)) AS f) r " +
        "WHERE (f + 1) * 64 <= length(text) " +
        "ORDER BY doc_id, frame_idx"),
    "llm_multimodal_decode" ->
      ("SELECT doc_id, 'txt' AS fmt, " +
        "CAST(length(text) AS BIGINT) AS n_bytes, " +
        "CAST(CASE WHEN length(text) = 0 THEN -1 ELSE " +
        "ascii(substring(text, 1, 1)) END AS BIGINT) AS first_byte, " +
        "CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1), " +
        "i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS byte_sum " +
        "FROM documents ORDER BY doc_id")
  )
}
