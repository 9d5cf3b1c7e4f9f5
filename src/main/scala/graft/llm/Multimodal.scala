package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.12): media travel as opaque
  * `binary` columns + typed metadata structs through every relational
  * operator; decode / feature-extraction runs partition-wise so a real
  * implementation can batch into a native decoder or accelerator.
  *
  * The decode step itself is a clearly-marked DETERMINISTIC STUB (this
  * container ships no image/audio codecs): it derives fake features from
  * the payload's md5. Everything around it — schema, encoders, batch
  * iteration shape, partitioning — is the real production plumbing.
  *
  * Scale notes: payload bytes never pass through a shuffle here — the
  * feature extractor is a narrow `mapPartitions` (no exchange), and
  * downstream aggregations ship only the small feature vectors. That is
  * the property that matters when payloads are MBs each at 100 TB total.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

  /** View the documents fixture as a binary media table (text bytes stand
    * in for image/audio payloads; mime tagged by source).
    */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("application/x-demo;source="), col("source")).as("mime"))
      .as[MediaRecord]
  }

  /** Partition-wise batched "decode + featurize".
    *
    * STUB: a real deployment replaces `decodeBatch` with an image/audio
    * codec + model call (the batching shape below is what feeds a GPU
    * efficiently); this container has no codec libs, so features are a
    * deterministic function of the payload hash.
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        decodeBatch(batch)
      }
    }
  }

  /** === STUB decode (see above) — deterministic fake features. === */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
      val feats = Array.tabulate(8)(i => (md(i & 15) & 0xff).toFloat / 255f)
      MediaFeatures(r.doc_id, r.payload.length.toLong, feats)
    }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      out_w: Int, out_h: Int, frame_sig: String)

  /** Frame sampling + resize planning through the same partition-wise
    * batched shape as [[extractFeatures]] — the video path of the
    * pipeline: per media record, a uniform k-frame schedule over the
    * container duration plus the aspect-preserving resize target each
    * decoded frame would be scaled to (max side 224, floor — never
    * round: Spark rounds half-up, DuckDB half-even).
    *
    * STUB boundary (no codecs in this container): duration and source
    * dimensions are deterministic functions of the payload (length×10 ms;
    * dims from the payload md5), and the per-frame "content" is an md5
    * fingerprint of payload+index — so the ENTIRE schedule/resize math is
    * mirrored by a DuckDB oracle while the decode call site stays exactly
    * where a real demuxer would run.
    */
  def sampleFrames(media: Dataset[MediaRecord], k: Int = 4, batchSize: Int = 64): Dataset[FrameSample] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => frameBatch(b, k))
    }
  }

  /** === STUB demux/probe (see sampleFrames) — deterministic. === */
  private def frameBatch(batch: Seq[MediaRecord], k: Int): Seq[FrameSample] =
    batch.flatMap { r =>
      // hash the payload ONCE and clone the digest state per frame: the
      // payloads are the multi-MB objects of this pipeline, and the naive
      // `md5(payload ++ suffix)` form would copy + re-hash all of them
      // k+1 times per record
      val base = java.security.MessageDigest.getInstance("MD5")
      base.update(r.payload)
      def cloned() = base.clone().asInstanceOf[java.security.MessageDigest]
      val md = cloned().digest()
      val durMs = r.payload.length.toLong * 10
      val w = 16 + (md(0) & 0xff)
      val h = 16 + (md(1) & 0xff)
      val maxSide = math.max(w, h)
      val outW = math.floor(w * 224.0 / maxSide).toInt
      val outH = math.floor(h * 224.0 / maxSide).toInt
      (0 until k).map { i =>
        val d = cloned()
        d.update(s"#$i".getBytes("UTF-8"))
        val sig = d.digest().map("%02x".format(_)).mkString.substring(0, 12)
        FrameSample(r.doc_id, i, durMs * i / k, outW, outH, sig)
      }
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // oracle-checked: the binary-column plumbing itself (byte length +
    // content hash survive the cast + dump round trip).
    "mm_meta" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("payload_sha")
      ).orderBy("doc_id")),

    // Stubbed feature extraction through the real plumbing. The stub is
    // deterministic (features[i] = md5_byte[i]/255f), so the query projects
    // the floats back to their md5-hex prefix at the boundary — both a
    // driver-sortable canonical string (no list column) and a FULL DuckDB
    // oracle: the float→byte roundtrip + batching plumbing are hash-checked.
    "mm_features" -> ((s, dir) => {
      val feats = extractFeatures(asMedia(Tables(s, dir).documents))
      feats.toDF().select(
        col("doc_id"), col("n_bytes"),
        lower(concat_ws("",
          transform(col("features"),
            f => lpad(hex(round(f * 255).cast("int")), 2, "0")))).as("features_hex"))
        .orderBy("doc_id")
    }),

    // video-path plumbing: uniform frame schedule + resize targets,
    // hash-checked end to end (see sampleFrames for the stub boundary)
    "mm_frames" -> ((s, dir) =>
      sampleFrames(asMedia(Tables(s, dir).documents))
        .toDF().orderBy("doc_id", "frame_idx"))
  )

  def oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  sha256(text) AS payload_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  substring(md5(text), 1, 16) AS features_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH dims AS (
        |  SELECT doc_id, text,
        |    octet_length(CAST(text AS BLOB)) * 10 AS dur_ms,
        |    16 + CAST('0x' || substring(md5(text), 1, 2) AS INTEGER) AS w,
        |    16 + CAST('0x' || substring(md5(text), 3, 2) AS INTEGER) AS h
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, text, dur_ms, w, h, unnest(range(4)) AS i FROM dims)
        |SELECT doc_id,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST(dur_ms * i // 4 AS BIGINT) AS frame_ts_ms,
        |  CAST(floor(w * 224.0 / greatest(w, h)) AS INTEGER) AS out_w,
        |  CAST(floor(h * 224.0 / greatest(w, h)) AS INTEGER) AS out_h,
        |  substring(md5(text || '#' || CAST(i AS VARCHAR)), 1, 12) AS frame_sig
        |FROM frames ORDER BY doc_id, frame_idx""".stripMargin
  )
}
