package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{AnnIndex, AnnIndexes}
import graft.ops.{EngineOps, Tables}

/** The reference's REST facade as a library API (ref `api/api.py:145-189`
  * Search endpoints, `:307-384` refresh): `searchByIds` / `searchByVectors`
  * against a pluggable [[graft.engine.AnnIndex]], responses shaped to one
  * camelCase JSON document per query (ref `searcher/output_mapping.py`),
  * `refresh` reloading the persisted index.
  *
  * A user of the reference's `/byIds?data=...&options={}` round-trip gets
  * the same information here as DataFrame rows `(q_id, response)` — the
  * HTTP layer is deliberately out of scope (SURVEY descopes the request
  * layer), but every piece of query semantics behind it is present.
  */
final class GraftApi(spark: SparkSession, sfDir: String,
    searcherName: String = "lopq") {

  private def vectors: DataFrame = Tables(spark, sfDir, "embeddings")

  /** Conf-driven searcher selection, like the reference's `get_searcher`
    * registry dispatch. `lopq_slim` serves the SAME persisted index through
    * the release-magnitude path (rotation tensor never driver-resident). */
  private def searcher: AnnIndex = searcherName match {
    case "lopq" =>
      AnnIndexes.lopq(EngineOps.index(spark, sfDir), vectors, "vec_id", "embedding")
    case "lopq_slim" =>
      EngineOps.index(spark, sfDir) // ensure built + persisted
      AnnIndexes.lopqSlim(
        graft.engine.LopqIndexStore.loadSlim(spark, EngineOps.indexDir(sfDir)).get,
        vectors, "vec_id", "embedding")
    case "brute" => AnnIndexes.brute(vectors, "vec_id", "embedding")
    case other => throw new IllegalArgumentException(s"unknown searcher: $other")
  }

  /** Top-k per query vector, shaped: one row `(q_id, response)` with
    * `response` = `{"queryId":…,"similarIds":[…],"distancesMicro":[…]}`
    * (distances in integer micro-units so the text is engine-portable). */
  def searchByVectors(queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    val idx = searcher
    val ranked = queries.map { case (qid, v) =>
      idx.search(v, k).select(lit(qid).as("q_id"), col("id").as("n_id"),
        floor(col("dist") * 1e6 + lit(0.5)).cast("long").as("micro"))
    }.reduce(_.unionAll(_))
    ranked
      .groupBy("q_id")
      .agg(sort_array(collect_list(struct(col("micro"), col("n_id")))).as("arr"))
      .select(col("q_id"), to_json(struct(
        col("q_id").as("queryId"),
        transform(col("arr"), x => x.getField("n_id")).as("similarIds"),
        transform(col("arr"), x => x.getField("micro")).as("distancesMicro"))).as("response"))
      .orderBy("q_id")
  }

  /** Set-oriented BULK twin of [[searchByVectors]] (the reference can only
    * loop its REST endpoint client-side — its own bulk evaluator is a
    * Python loop, `lopq/lopq/eval.py:7-38`): the probe set arrives as a
    * DataFrame `(q_id, vector)` and the whole batch is answered through ONE
    * [[graft.engine.LopqSearcher.annJoin]] plan against the slim index
    * handle — per-query results bit-identical to the per-query path
    * (AnnJoinSpec), responses shaped exactly like [[searchByVectors]].
    * Amortized cost is the point: ~3 ms/query at the 1000-probe release
    * shape vs ~0.35 s/query looped (`annjoin_release_v2` bench row). */
  def searchBulk(queries: DataFrame, qIdCol: String, vecCol: String, k: Int,
      quota: Int = 200, rerankK: Int = 50): DataFrame = {
    EngineOps.index(spark, sfDir) // ensure built + persisted
    val slim = graft.engine.LopqIndexStore
      .loadSlim(spark, EngineOps.indexDir(sfDir)).get
    graft.engine.LopqSearcher.annJoin(slim, queries, qIdCol, vecCol,
        vectors, "vec_id", "embedding", quota, k, rerankK)
      .select(col("q_id"), col("rank"), col("id").as("n_id"),
        floor(col("exact_dist") * 1e6 + lit(0.5)).cast("long").as("micro"))
      .groupBy("q_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("n_id"), col("micro")))).as("arr"))
      .select(col("q_id"), to_json(struct(
        col("q_id").as("queryId"),
        transform(col("arr"), x => x.getField("n_id")).as("similarIds"),
        transform(col("arr"), x => x.getField("micro")).as("distancesMicro"))).as("response"))
      .orderBy("q_id")
  }

  /** Ids → vectors lookup join, then vector search (the `/byIds` path:
    * ref `api/api.py:273-282` + `get_columns_from_sha1_rows`). Unknown ids
    * are silently absent from the result, like the reference's positional
    * repair tolerating missing rows. */
  def searchByIds(ids: Seq[Long], k: Int): DataFrame = {
    val found = vectors.where(col("vec_id").isin(ids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    searchByVectors(found, k)
  }

  /** Reload the persisted index (codes appended since the manifest
    * high-watermark become visible). Ref `api/api.py:307-384`. */
  def refresh(): Unit = EngineOps.refreshIndex(spark, sfDir)
}
