package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Decoded media features — output row of the stub decoder. */
case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
  first_byte: Long, byte_sum: Long)

/** Media payload row fed to the per-partition decoder. */
case class MediaPayload(doc_id: Long, fmt: String, payload: Array[Byte])

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_multimodal_join" -> multimodalJoin,
    "llm_multimodal_decode" -> multimodalDecode
  )

  def oracle: Map[String, String] = Map(
    "llm_multimodal_join" ->
      ("SELECT label, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars, " +
        "max(embedding[1]) AS max_first_dim " +
        "FROM documents JOIN embeddings ON doc_id = vec_id " +
        "GROUP BY label ORDER BY label"),
    "llm_multimodal_decode" ->
      ("SELECT doc_id, 'txt' AS fmt, " +
        "CAST(length(text) AS BIGINT) AS n_bytes, " +
        "CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte, " +
        "CAST(list_sum(list_transform(range(1, length(text) + 1), " +
        "i -> ascii(substring(text, i, 1)))) AS BIGINT) AS byte_sum " +
        "FROM documents ORDER BY doc_id")
  )
}
