package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.core.Schemas.BBox

/** The reference's pluggable detection/featurization surface (SURVEY §2.10):
  * `GenericDetector` (image → N bboxes, `detector/generic_detector.py:10-183`)
  * and `GenericFeaturizer` (image+bbox → vector,
  * `featurizer/generic_featurizer.py:58-71`), re-expressed as Spark-side
  * traits applied with the UDTF pattern — one input row explodes into N
  * detection rows via `Dataset.flatMap`, with the detector/featurizer
  * initialized once per partition (the heavy-ML-UDF shape; a real CNN would
  * be loaded in `mapPartitions` setup and shared across the partition's
  * rows).
  *
  * The container ships no image codecs or CNNs, so the bundled
  * implementations are HONEST STUBS: deterministic md5-derived math,
  * mirrored exactly by the DuckDB oracle of `q40_detect` (same trick as
  * [[MultimodalOps.decodeStub]]). The traits, registry, explode plumbing,
  * and output schema are the real extension surface.
  */
trait Detector extends Serializable {
  def name: String
  /** All detections in one image payload, highest-level UDTF semantics:
    * 0..N output rows per input row (ref `dlib_detector.py:22-35`). */
  def detect(payload: Array[Byte]): Seq[BBox]
}

trait Featurizer extends Serializable {
  def name: String
  def dim: Int
  /** Feature vector for one detection region
    * (ref `generic_featurizer.py:58-71`). */
  def featurize(payload: Array[Byte], bbox: BBox): Array[Float]
}

object Extract {
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  private def hx(hex: String, from0: Int, len: Int): Long =
    java.lang.Long.parseLong(hex.substring(from0, from0 + len), 16)

  /** Deterministic stub: 1–3 detections per payload, bbox fields carved out
    * of `md5(md5(payload) ++ ":" ++ i)` — every field reproducible in SQL. */
  object StubDetector extends Detector {
    val name = "stub"
    def detect(payload: Array[Byte]): Seq[BBox] = {
      val h0 = md5Hex(payload)
      val n = 1 + (hx(h0, 0, 2) % 3).toInt
      (0 until n).map { i =>
        val hi = md5Hex(s"$h0:$i".getBytes("UTF-8"))
        val left = (hx(hi, 0, 4) % 256).toInt
        val top = (hx(hi, 4, 4) % 256).toInt
        val w = 1 + (hx(hi, 8, 4) % 128).toInt
        val h = 1 + (hx(hi, 12, 4) % 128).toInt
        val score = (hx(hi, 16, 4) % 1001) / 1000.0
        BBox(left, top, left + w, top + h, score)
      }
    }
  }

  /** Deterministic stub featurizer: 3-d feature from the same per-detection
    * hash (components in [-1, 1], thousandths — exact in double). */
  object StubFeaturizer extends Featurizer {
    val name = "stub"
    val dim = 3
    def featurize(payload: Array[Byte], bbox: BBox): Array[Float] = {
      val h0 = md5Hex(payload)
      // re-derive the per-detection hash from the bbox's own fields so the
      // featurizer needs no side-channel from the detector (stateless, like
      // the reference passing (img, bbox) pairs)
      val hi = md5Hex(s"$h0:${bbox.left},${bbox.top},${bbox.right},${bbox.bottom}".getBytes("UTF-8"))
      Array.tabulate(dim)(k => (((hx(hi, 20 + 4 * k, 4) % 2001) - 1000) / 1000.0).toFloat)
    }
  }

  /** Plugin registries (ref `detector/utils.py:100-112`,
    * `featurizer/generic_featurizer.py:5-41`). */
  val detectors: Map[String, Detector] = Map(StubDetector.name -> StubDetector)
  val featurizers: Map[String, Featurizer] = Map(StubFeaturizer.name -> StubFeaturizer)

  /** The extractor transformer (ref `generic_extractor.py:221-255`): payload
    * rows → detection rows with bbox struct + feature vector. UDTF pattern:
    * `flatMap` explodes each image into its detections; both plugins ride
    * the closure (tiny objects — a real model would be a broadcast handle
    * initialized per partition). */
  def extract(ds: Dataset[(Long, Array[Byte])], detector: Detector,
      featurizer: Featurizer): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { case (id, payload) =>
      detector.detect(payload).zipWithIndex.map { case (b, i) =>
        (id, i.toLong, b.left.toLong, b.top.toLong, b.right.toLong, b.bottom.toLong,
          b.score, featurizer.featurize(payload, b).map(_.toDouble))
      }
    }.toDF("doc_id", "det_idx", "left", "top", "right", "bottom", "score", "feature")
  }
}
