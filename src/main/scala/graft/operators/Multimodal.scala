package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Query
import graft.sources.Tables

/** Opaque media record: blob payload + typed metadata — the column model
  * for image/audio/video at 100 TB (binary column, never parsed by
  * Catalyst; metadata columns carry everything the planner needs to prune).
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Per-record features produced by the (stubbed) decoder. */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    n_frames: Int,
    mean_byte: Double,
    feat_norm: Double)

/** Multimodal-column plumbing: binary payloads with typed metadata, frame
  * sampling, and batch feature extraction through a typed Dataset.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — those libraries
  * aren't in this container — with a deterministic fake: per-64-byte-"frame"
  * byte statistics. Everything Spark-side is real and tested: the schema
  * (binary + metadata), the `Dataset[MediaRecord] → Dataset[MediaFeatures]`
  * mapPartitions batch shape (the Scala analog of mapInPandas: one decoder
  * instantiation per partition, streamed batches, no per-row setup), and
  * the partitioning story — payloads stay columnar/compressed in parquet,
  * the decode stage is embarrassingly parallel, and feature rows are tiny
  * relative to payloads so the post-decode shuffle is cheap.
  */
object Multimodal {

  private val FrameBytes = 64
  private[operators] val EmbedDim = 8
  private[operators] val EmbedBatch = 32

  /** Whole-file binary ingestion — how image/audio/video actually ENTER the
    * lake: `binaryFile` reads each object as one (path, length, content)
    * row. Identity comes from the key (filename), not the payload —
    * regexp_extract on `path`, exactly like S1/S2's key-space discipline.
    * Staged fixture: one .bin file per document (doc_id < 100), payload =
    * the UTF-8 text bytes, so DuckDB re-derives fingerprints from the
    * string column. At 100 TB this layer is where small-file compaction
    * happens: binaryFile rows land in parquet (the `mm_binary_meta` model)
    * and downstream reads never touch the object store again.
    */
  def binaryFileSource(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Staging.stagedDir("graft_media", sfDir) { d =>
      // ≤100 tiny files: fixture prep, not a data path
      Tables(spark, sfDir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          java.nio.file.Files.write(
            new java.io.File(d, f"doc_${r.getLong(0)}%05d.bin").toPath,
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir.getAbsolutePath)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
          .cast(LongType).as("doc_id"),
        col("length").cast(LongType).as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  private val binaryFileSourceOracle =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | md5(text) AS content_md5
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** Payload + metadata projection: byte length, frame count, content
    * fingerprint. Oracle-checked (DuckDB sees the same text→blob encoding).
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"),
        col("lang").as("meta_lang"))
      .select(
        col("doc_id"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        ((length(col("payload")) + FrameBytes - 1) / FrameBytes)
          .cast(LongType).as("n_frames"),
        md5(col("payload")).as("content_md5"),
        col("meta_lang"))
      .orderBy("doc_id")

  private val binaryMetaOracle =
    s"""SELECT doc_id,
       | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       | CAST((octet_length(encode(text)) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT)
       |   AS n_frames,
       | md5(text) AS content_md5,
       | lang AS meta_lang
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: split the payload into fixed-size frames, keep every
    * 4th (declaratively — slice/transform over the binary, no UDF), and
    * fingerprint each sampled frame.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""filter(transform(sequence(0, (length(payload) - 1) div $FrameBytes),
             |                 i -> substring(payload, i * $FrameBytes + 1, $FrameBytes)),
             |       (f, i) -> i % 4 = 0)""".stripMargin)))
      .select(
        col("doc_id"),
        col("pos").cast(LongType).as("sample_idx"),
        length(col("col")).cast(LongType).as("frame_bytes"),
        md5(col("col")).as("frame_md5"))
      .orderBy("doc_id", "sample_idx")

  /** Batch feature extraction through the typed-Dataset boundary. The
    * decoder stub is deterministic (per-frame mean byte value; L2 norm of
    * the frame-mean vector). No oracle — DuckDB has no frame model; checked
    * value-exactly in MultimodalSpec.
    */
  def featureExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val records: Dataset[MediaRecord] =
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[MediaRecord]
    records
      .mapPartitions { iter =>
        // one "decoder" per partition — the stub for codec init cost
        val decoder = new StubDecoder(FrameBytes)
        iter.map(decoder.decode)
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        round(col("mean_byte"), 6).as("mean_byte"),
        round(col("feat_norm"), 6).as("feat_norm"))
      .orderBy("doc_id")
  }

  // The payload is the UTF-8 encoding of ASCII text, so DuckDB can re-derive
  // frames and byte statistics from the string column — an independent check
  // of both the declarative frame split and the typed mapPartitions decode.

  private val frameSampleOracle =
    s"""SELECT doc_id, CAST(i // 4 AS BIGINT) AS sample_idx,
       | CAST(length(substr(text, CAST(i AS INTEGER) * $FrameBytes + 1,
       |                    $FrameBytes)) AS BIGINT) AS frame_bytes,
       | md5(substr(text, CAST(i AS INTEGER) * $FrameBytes + 1, $FrameBytes))
       |   AS frame_md5
       |FROM (SELECT doc_id, text,
       |        unnest(range(0, (length(text) - 1) // $FrameBytes + 1)) AS i
       |      FROM documents)
       |WHERE i % 4 = 0
       |ORDER BY doc_id, sample_idx""".stripMargin

  private val featureExtractOracle =
    s"""WITH f AS (
       |  SELECT doc_id, i,
       |    substr(text, CAST(i AS INTEGER) * $FrameBytes + 1, $FrameBytes) AS fr
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, (length(text) - 1) // $FrameBytes + 1)) AS i
       |        FROM documents)),
       |fm AS (
       |  SELECT doc_id, i,
       |    list_reduce(list_transform(string_split(fr, ''),
       |        c -> CAST(unicode(c) AS BIGINT)), (a, b) -> a + b) * 1.0
       |      / length(fr) AS m
       |  FROM f),
       |norms AS (
       |  SELECT doc_id,
       |    sqrt(list_reduce(list_transform(list(m ORDER BY i), x -> x * x),
       |                     (a, b) -> a + b)) AS feat_norm,
       |    CAST(count(*) AS INTEGER) AS n_frames
       |  FROM fm GROUP BY doc_id)
       |SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n_bytes,
       |  n.n_frames,
       |  round(list_reduce(list_transform(string_split(d.text, ''),
       |      c -> CAST(unicode(c) AS BIGINT)), (a, b) -> a + b) * 1.0
       |    / length(d.text), 6) AS mean_byte,
       |  round(n.feat_norm, 6) AS feat_norm
       |FROM documents d JOIN norms n ON d.doc_id = n.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Batched model inference through the typed-Dataset boundary — the
    * embed-everything pattern (CLIP/audio embeddings over a 100 TB lake).
    * [[featureExtract]] pins per-partition MODEL INIT; this pins the
    * second half of the GPU-inference shape: rows grouped into fixed-size
    * BATCHES before each model call (`iter.grouped(batch)` →
    * `embedBatch`), because per-row invocation leaves accelerator
    * throughput on the floor. The embedder stub is deterministic
    * (byte-stripe sums mod [[EmbedDim]] — integer, so exact), and results
    * are provably batch-size-invariant (spec-checked at 32 vs 7): the
    * contract real inference must also hold for results to be
    * reproducible under repartitioning.
    *
    * Output is fingerprint + integer norm² rather than the raw vector so
    * the cross-engine compare stays scalar; the DuckDB oracle re-derives
    * the stripe sums from the text column.
    *
    * ASCII assumption (load-bearing for the oracle gate): the Spark side
    * stripes over UTF-8 BYTES (`text` cast to binary) while the oracle
    * stripes over per-character CODEPOINTS — equivalent iff every char is
    * single-byte ASCII, which the `documents` fixture guarantees. If the
    * fixture ever grows multi-byte text, re-derive the oracle over
    * `encode(text)` octets instead of characters.
    */
  def batchEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val records: Dataset[MediaRecord] =
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[MediaRecord]
    records
      .mapPartitions { iter =>
        val model = new StubBatchEmbedder(Multimodal.EmbedDim)
        iter.grouped(Multimodal.EmbedBatch).flatMap(model.embedBatch)
      }
      .toDF("doc_id", "emb")
      .select(
        col("doc_id"),
        md5(array_join(transform(col("emb"), _.cast(StringType)), ","))
          .as("emb_md5"),
        expr("aggregate(transform(emb, x -> x * x), 0L, (a, b) -> a + b)")
          .as("norm_sq"))
      .orderBy("doc_id")
  }

  private val batchEmbedOracle =
    s"""WITH b AS (
       |  SELECT doc_id, unnest(string_split(text, '')) AS c,
       |    generate_subscripts(string_split(text, ''), 1) AS i
       |  FROM documents),
       |e AS (
       |  SELECT doc_id, (i - 1) % $EmbedDim AS j,
       |    CAST(sum(CAST(unicode(c) AS BIGINT)) AS BIGINT) AS ej
       |  FROM b GROUP BY doc_id, j),
       |emb AS (SELECT doc_id, list(ej ORDER BY j) AS emb FROM e GROUP BY doc_id)
       |SELECT doc_id,
       |  md5(array_to_string(emb, ',')) AS emb_md5,
       |  CAST(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b)
       |    AS BIGINT) AS norm_sq
       |FROM emb ORDER BY doc_id""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("mm_binary_file_source",
      "whole-file binaryFile ingestion with key-derived identity",
      binaryFileSource, Some(binaryFileSourceOracle)),
    Query("mm_binary_meta",
      "binary payload + typed metadata projection with fingerprints",
      binaryMeta, Some(binaryMetaOracle)),
    Query("mm_frame_sample",
      "declarative fixed-size frame split + every-4th sampling",
      frameSample, Some(frameSampleOracle)),
    Query("mm_feature_extract",
      "typed-Dataset mapPartitions batch feature extraction (stub decoder)",
      featureExtract, Some(featureExtractOracle)),
    Query("mm_batch_embed",
      "batched model inference: grouped(32) embedBatch calls, stub embedder",
      batchEmbed, Some(batchEmbedOracle)),
  )
}

/** Deterministic stand-in for a media codec: "decodes" a payload into
  * per-frame byte means. Real codecs slot in here without touching the
  * Spark plumbing.
  */
/** Deterministic stand-in for a batched embedding model (the GPU-inference
  * shape: one call per BATCH, not per row). Embedding j = sum of payload
  * bytes at positions ≡ j (mod dim) — integer, order-deterministic, and
  * independent of how rows were batched, which is the reproducibility
  * contract real inference must also satisfy.
  */
final class StubBatchEmbedder(dim: Int) extends Serializable {
  def embedBatch(rs: Seq[MediaRecord]): Seq[(Long, Array[Long])] =
    rs.map { r =>
      val v = new Array[Long](dim)
      var i = 0
      while (i < r.payload.length) {
        v(i % dim) += (r.payload(i) & 0xff); i += 1
      }
      (r.doc_id, v)
    }
}

final class StubDecoder(frameBytes: Int) extends Serializable {
  def decode(r: MediaRecord): MediaFeatures = {
    val frames = r.payload.grouped(frameBytes).toArray
    val means = frames.map(f => f.map(_ & 0xff).sum.toDouble / f.length)
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.payload.length,
      n_frames = frames.length,
      mean_byte = if (r.payload.isEmpty) 0.0
        else r.payload.map(_ & 0xff).sum.toDouble / r.payload.length,
      feat_norm = math.sqrt(means.map(m => m * m).sum))
  }
}
