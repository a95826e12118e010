package graft.core

import java.sql.Timestamp

/** Typed row models for the engine's durable tables (SURVEY.md §1.1,
  * FIXTURES.md §A). These replace the reference's dynamic HBase column-name
  * conventions (`extractor/generic_extractor.py:17-24`) with explicit
  * schemas; bounding boxes become real struct columns instead of
  * column-name suffixes (`detector/utils.py:114-124`). */
object Schemas {
  /** One row per unique image, keyed by 40-hex uppercase SHA1
    * (ref HBase `table_sha1infos`, `indexer/hbase_indexer_minimal.py:218-221`). */
  case class ImageRecord(
      sha1: String,
      s3_url: Option[String],
      location: Option[String],
      img_path: Option[String],
      format: Option[String],
      width: Option[Int],
      height: Option[Int],
      img_buffer: Option[Array[Byte]])

  /** Face/full-image bounding box (ref `detector/dlib_detector.py:33-35`). */
  case class BBox(left: Int, top: Int, right: Int, bottom: Int, score: Double)

  /** One extraction (feature vector, optionally per-face) per image
    * (ref `ext:` column family). */
  case class Extraction(
      sha1: String,
      extr_type: String,
      bbox: Option[BBox],
      feature: Array[Float],
      processed: Boolean,
      failed: Boolean,
      update_id: String)

  /** Ingestion micro-batch manifest (ref HBase `table_updateinfos`,
    * update-id format `common/__init__.py:2` +
    * `updater/extraction_checker.py:199-203`). */
  case class UpdateManifest(
      update_id: String,
      sha1s: Seq[String],
      created: Timestamp,
      started: Option[Timestamp],
      processed: Option[Timestamp],
      completed: Boolean)

  /** LOPQ code row (ref LMDB layout `lopq/lopq/search.py:425-470`);
    * `cell_id` is the partition column for index pruning. */
  case class CodeRow(id: String, coarse0: Int, coarse1: Int, fine: Array[Short], cell_id: Int)

  /** In-flight image message (ref Kafka JSON,
    * `pusher/local_images_pusher.py:85-94`). */
  case class ImageMessage(
      sha1: String,
      s3_url: Option[String],
      img_path: Option[String],
      format: Option[String],
      width: Option[Int],
      height: Option[Int])
}
