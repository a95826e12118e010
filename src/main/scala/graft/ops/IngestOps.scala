package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.engine.LopqIndexStore

/** The nightly-ingest CYCLE against a persisted index dir — the
  * reference's check → skip → store loop as one operation (ref
  * `updater/extraction_checker.py:225-258` checks each new extraction
  * against what is indexed and marks it processed;
  * `searcher_lopqhbase.py:600-617` skips already-indexed updates): screen
  * a new batch against the index's own cells
  * ([[VectorQueries.semDedupPairsIncremental]]), drop flagged rows by the
  * conservative-prefix rule ([[VectorQueries.screenSurvivors]]), append
  * the survivors ([[LopqIndexStore.appendUpdate]]).
  *
  * Everything here is O(batch), never O(index): the screen's corpus scans
  * are pruned map-side behind broadcasts of batch-derived sides, the
  * append encodes only the batch and anti-joins only its touched cells,
  * and the replay check is the O(1) watermark tip.
  */
object IngestOps {

  /** What one ingest cycle did. `applied=false` means the update id was at
    * or below the watermark — an at-least-once replay, nothing recomputed.
    * `appended` counts survivor rows handed to the append (its own
    * touched-cell anti-join may drop replayed ids on top). */
  final case class IngestReport(applied: Boolean, batchRows: Long,
      flaggedPairs: Long, appended: Long)

  /** One screened ingest cycle. `corpusVectors` must carry `(idCol,
    * vecCol)` for every id the index holds codes for (the feature store
    * the reference keeps in HBase; [[vectorStore]] reads the side-store
    * the streaming twin maintains). Batch ids must be disjoint from
    * indexed ids; `updateId`s must be lexicographically monotone
    * ([[LopqIndexStore.appendUpdate]]'s contract). */
  def screenAndAppend(spark: SparkSession, dir: String,
      corpusVectors: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, updateId: String,
      simThreshold: Double = VectorQueries.NearDupSimThreshold): IngestReport = {
    if (LopqIndexStore.isApplied(spark, dir, updateId))
      return IngestReport(applied = false, 0L, 0L, 0L)
    val b = batch.select(col(idCol), col(vecCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val corpusCells = LopqIndexStore.readCodes(spark, dir)
        .select(col("id"), col("cell_id").cast("long").as("cell_id"))
      val batchCells = LopqIndexStore.assignCells(spark, dir, b, idCol, vecCol)
      val pairs = VectorQueries.semDedupPairsIncremental(
          corpusCells, batchCells, corpusVectors, b, idCol, vecCol, simThreshold)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val flagged = pairs.count()
        val survivors = VectorQueries.screenSurvivors(b, idCol, pairs)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val nKept = survivors.count()
          val applied = LopqIndexStore.appendUpdate(spark, dir, survivors,
            idCol, vecCol, updateId)
          IngestReport(applied, b.count(), flagged, nKept)
        } finally { survivors.unpersist(); () }
      } finally { pairs.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  // ------------------------------------------------- vector side-store

  /** The raw-vector side-store a SCREENED stream maintains alongside the
    * codes — the reference's feature cache (HBase column of features per
    * indexed sha1), needed because the codes table alone can't verify a
    * cosine. One parquet directory PER UPDATE ID, written with overwrite,
    * so a replayed micro-batch rewrites its own directory instead of
    * duplicating rows (idempotent at-least-once, like the manifest). */
  def vectorsDir(dir: String): String = s"$dir/vectors"

  /** Idempotent per-update write: `(id, vec)` rows into
    * `vectors/<updateId>/`, replacing any partial previous attempt. */
  def writeVectors(spark: SparkSession, dir: String, df: DataFrame,
      idCol: String, vecCol: String, updateId: String): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .write.mode(SaveMode.Overwrite).parquet(s"${vectorsDir(dir)}/$updateId")

  /** Every stored vector, shaped `(idCol, vecCol)` for the screen. Rows
    * whose update never committed its codes append are harmless: the
    * screen attaches vectors through the CELLS the codes table knows, so
    * an orphaned vector row simply never joins. */
  def vectorStore(spark: SparkSession, dir: String,
      idCol: String, vecCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(vectorsDir(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit per-update paths, not a "/*" glob: Spark's FileStreamSink
    // probe stat()s the literal glob string and logs a spurious
    // FileNotFoundException trace on every resolution
    val parts =
      if (fs.exists(p)) fs.listStatus(p).filter(_.isDirectory).map(_.getPath.toString)
      else Array.empty[String]
    val raw =
      if (parts.nonEmpty) spark.read.parquet(parts.toIndexedSeq: _*)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType),
          StructField("vec", ArrayType(FloatType)))))
    raw.select(col("id").as(idCol), col("vec").as(vecCol))
  }
}
