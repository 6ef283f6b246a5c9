package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Multimodal-column plumbing: media (image/audio/video) live as
  * opaque `binary` columns with typed metadata alongside. This module
  * makes the Spark-side plumbing real — binary casting, metadata
  * extraction, and a partition-batched feature extractor — while the
  * actual media *decode* is a clearly-marked deterministic STUB (no
  * image/audio codecs exist in this environment; a production build
  * swaps `stubDecodeFeatures` for a real decoder with the same
  * signature and batch shape).
  */
object Multimodal extends QueryModule {

  /** STUB decoder: stands in for image/audio decode. Consumes raw
    * bytes, emits a fixed-length feature vector (byte-value quartile
    * histogram). Deterministic, codec-free; same `Array[Byte] →
    * Array[Int]` contract a real decoder would satisfy.
    */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Int] = {
    val hist = new Array[Int](4)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 6) += 1
      i += 1
    }
    hist
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata: cast text payload to binary (standing in
    // for a media blob), extract typed metadata. Fully oracle-checked.
    "q44_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("blob"),
          col("lang"))
        .select(col("doc_id"),
          octet_length(col("blob")).as("n_bytes"),
          ascii(col("blob").cast("string")).as("first_code"),
          md5(col("blob")).as("blob_md5"),
          col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Partition-batched feature extraction over the binary column via
    // mapPartitions — the iterator is the batch; a real decoder would
    // amortize codec init across it exactly like this. Deterministic
    // but not SQL-expressible → rows-only gate + LlmOpsSpec's
    // byte-partition invariant test.
    "q45_multimodal_features" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          // codec init would happen once per partition, here:
          batch.map { case (id, blob) =>
            val f = stubDecodeFeatures(blob)
            (id, blob.length, f(0), f(1), f(2), f(3))
          }
        }
        .toDF("doc_id", "n_bytes", "f0", "f1", "f2", "f3")
        .orderBy(col("doc_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q44_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(ascii(text) AS INT) AS first_code,
        |  md5(text) AS blob_md5,
        |  lang
        |FROM documents ORDER BY doc_id""".stripMargin
    // q45 intentionally absent (stub decoder not SQL-expressible).
  )
}
