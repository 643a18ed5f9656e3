package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** [EXT] Multimodal-column plumbing (SURVEY.md §2.10 E5): media
  * payloads as opaque `binary` columns with typed metadata, plus the
  * feature-extraction pass shapes (decode → features → sample). The
  * container has no image/audio codecs, so the *decode* step is a
  * deterministic stub (`decodeStub` below, clearly marked); everything
  * Spark-side — schema, binary handling, batched per-partition
  * processing, column pruning — is real and oracle-checked.
  *
  * The media "table" is derived deterministically from `documents`
  * (payload = UTF-8 bytes of text) so the oracle can rebuild the same
  * bytes with DuckDB's encode().
  *
  * 100 TB notes: payloads dominate storage, so every query here prunes
  * to the payload column + keys only (ReadSchema assertion in
  * MultimodalSpec); per-row work is narrow codegen'd byte ops — the
  * decode stub shows the mapPartitions batch shape a real codec would
  * use (one library init per partition, not per row).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** documents → media: binary payload + metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          concat(lit("text/plain;src="), col("source")).as("mime"),
          col("n_chars").as("declared_size"),
          col("lang").as("lang")).as(("meta")))

  /** q70 — per-item feature extraction over binary payloads: size,
    * content hash, header bytes (the "magic number" sniff), all via
    * codegen'd built-ins — no UDF.
    *
    * Deliberately built flat from the source rather than through
    * [[mediaTable]]: `payload` is referenced 3× so CollapseProject
    * won't inline the (non-cheap) cast through a second projection —
    * the intermediate metadata struct would survive optimization and
    * drag its unused source columns (n_chars, lang) into the scan.
    * Projecting flat keeps the ReadSchema at exactly
    * {doc_id, text, source} (asserted in MultimodalSpec). */
  val q70MediaFeatures: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        concat(lit("text/plain;src="), col("source")).as("mime"),
        col("text").cast("binary").as("payload"))
      .select(
        col("media_id"), col("mime"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"))
      .orderBy("media_id")

  // DuckDB note: sha256/substring accept VARCHAR only (no BLOB
  // overloads) — hash the text directly (same UTF-8 bytes) and slice
  // the hex string (byte k = hex chars 2k+1..2k+2).
  val q70Oracle: String =
    """SELECT doc_id AS media_id, 'text/plain;src=' || source AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS content_sha,
      |  lower(substring(hex(encode(text)), 1, 16)) AS header_hex
      |FROM documents ORDER BY media_id""".stripMargin

  /** q71 — frame/sample extraction shape: take 4 evenly-spaced
    * single-byte "frames" from each payload (stride = size/4) — the
    * exact access pattern of video frame-sampling, expressed as pure
    * byte slicing so the oracle can replay it. */
  val q71FrameSample: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
      .select(col("media_id"), col("payload"),
        octet_length(col("payload")).as("n"))
      .select(
        col("media_id"), col("n").as("n_bytes"),
        concat_ws(",", expr(
          """transform(sequence(0, 3),
            |  k -> lower(hex(substring(payload, k * (n div 4) + 1, 1))))"""
            .stripMargin)).as("frames_hex"))
      .orderBy("media_id")

  val q71Oracle: String =
    """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
      |                  octet_length(encode(text)) AS n FROM documents)
      |SELECT media_id, n AS n_bytes,
      |  concat_ws(',',
      |    lower(substring(h, 2 * (0 * (n // 4)) + 1, 2)),
      |    lower(substring(h, 2 * (1 * (n // 4)) + 1, 2)),
      |    lower(substring(h, 2 * (2 * (n // 4)) + 1, 2)),
      |    lower(substring(h, 2 * (3 * (n // 4)) + 1, 2))) AS frames_hex
      |FROM m ORDER BY media_id""".stripMargin

  /** q72 — corpus rollup by modality metadata: group on the metadata
    * struct fields with payload-size stats — the "how much of each
    * media type do we have" inventory query. */
  val q72MediaInventory: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .select(col("lang"), octet_length(col("text").cast("binary")).as("nb"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("nb").cast("long")).as("total_bytes"),
        max(col("nb")).as("max_bytes"))
      .orderBy("lang")

  val q72Oracle: String =
    """SELECT lang, COUNT(*) AS n_items,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  MAX(octet_length(encode(text))) AS max_bytes
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** q74 — media payload EXACT DEDUP: the binary twin of q30 — a crawl
    * lake stores the same image/video bytes under many keys, and the
    * cheapest shrink is content-hash dedup BEFORE any decode spend.
    * Input amplified like q30 (every media_id % 3 == 0 payload
    * duplicated under a shifted id); dedup key = sha256 of the BYTES
    * (not text — the hash runs on the binary column), keeper = lowest
    * media_id, per-hash byte totals = what the dedup saves. One
    * skew-free shuffle on the 32-byte digest. */
  val q74MediaDedup: Q = (spark, dir) => {
    val media = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
    val withDups = media.unionByName(
      media.filter(col("media_id") % 3 === 0)
        .select((col("media_id") + 1000000L).as("media_id"), col("payload")))
    withDups
      .groupBy(sha2(col("payload"), 256).as("content_sha"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        sum(octet_length(col("payload")).cast("long")).as("total_bytes"))
      .orderBy("keeper_id")
  }

  // sha256/octet_length over the same UTF-8 bytes (see q70's note on
  // DuckDB's VARCHAR-only sha256)
  val q74Oracle: String =
    """SELECT sha256(text) AS content_sha,
      |  MIN(media_id) AS keeper_id, COUNT(*) AS n_copies,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM (SELECT doc_id AS media_id, text FROM documents
      |      UNION ALL
      |      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0)
      |GROUP BY 1 ORDER BY keeper_id""".stripMargin

  // ------------------------------------------------------------------
  // Decode stub — the seam where a real codec would plug in.
  // ------------------------------------------------------------------

  /** Decoded-media record a real pipeline would produce per item. */
  case class DecodedMedia(media_id: Long, width: Int, height: Int,
      n_pixels: Long)

  /** STUB: deterministic fake "image decode" — derives fake dimensions
    * from payload bytes instead of invoking a codec (none exists in
    * this container). The *shape* is the production one: typed
    * `mapPartitions` so a real decoder initializes once per partition
    * and streams items — swap the body for ImageIO/ffmpeg and nothing
    * else changes. */
  def decodeStub(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { items =>
        // real codec: init decoder context here, once per partition
        items.map { case (id, bytes) =>
          val w = 16 + (math.abs(bytes.foldLeft(17)(31 * _ + _)) % 64)
          val h = 16 + (bytes.length % 64)
          DecodedMedia(id, w, h, w.toLong * h)
        }
      }
  }

  /** q73 — the decode seam exercised end-to-end: binary payloads
    * through the typed mapPartitions codec stub, then a rollup over
    * the decoded dimensions. Rows-only for the driver (the stub's
    * byte-fold is engine-internal); determinism + cardinality are
    * asserted in MultimodalSpec. */
  val q73MediaDecode: Q = (spark, dir) =>
    decodeStub(mediaTable(spark, dir))
      .groupBy((col("n_pixels") / 1000).cast("int").as("kpixel_band"))
      .agg(count(lit(1)).as("n_items"),
        min(col("width")).as("min_w"), max(col("height")).as("max_h"))
      .orderBy("kpixel_band")

  val queries: Map[String, Q] = Map(
    "q70_media_features" -> q70MediaFeatures,
    "q71_frame_sample" -> q71FrameSample,
    "q72_media_inventory" -> q72MediaInventory,
    "q73_media_decode" -> q73MediaDecode,
    "q74_media_dedup" -> q74MediaDedup)

  val oracles: Map[String, String] = Map(
    "q70_media_features" -> q70Oracle,
    "q71_frame_sample" -> q71Oracle,
    "q72_media_inventory" -> q72Oracle,
    "q74_media_dedup" -> q74Oracle)
}
