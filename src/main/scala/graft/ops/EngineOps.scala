package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{LopqModel, LopqParams, LopqSearcher, LopqTrainer}
import graft.functions.VectorFunctions._

/** The LOPQ ANN engine surface as catalog queries: train → encode → search
  * end-to-end (SURVEY §3.3 + §3.1), and the retrieval-quality eval of the
  * reference's harness (`lopq/lopq/eval.py:92-142`). Not ANSI-SQL-
  * expressible (KMeans + multisequence), so these omit `oracle` — the
  * driver records rows-only; quality is asserted by `LopqSpec` (recall vs
  * the brute-force oracle) instead.
  */
object EngineOps {
  import Tables.{apply => t}

  /** Small-but-real model shape for the test corpus (64-d, 500–2000 rows):
    * V=8 coarse cells per split, M=4 subquantizers, 16 clusters each
    * (ref library defaults V=8 M=4, `lopq/lopq/model.py:448`, with S
    * scaled to the corpus instead of 256). */
  private val P = LopqParams(v = 8, m = 4, subClusters = 16, seed = 42L, kmeansMaxIter = 10)
  private val Quota = 200
  private val TopK = 10
  private val RerankK = 50
  private val NumQueries = 5

  /** One train+encode per (session, sfDir) — the model is an index artifact
    * shared by every query against it, exactly like the reference's pickled
    * model + LMDB index. */
  private val indexCache =
    TrieMap.empty[(SparkSession, String), (LopqModel, DataFrame, Map[Int, Long])]

  /** Public so Bench can prewarm the (offline) index build. */
  def index(s: SparkSession, d: String): (LopqModel, DataFrame, Map[Int, Long]) =
    indexCache.getOrElseUpdate((s, d), {
      val e = t(s, d, "embeddings")
      val model = LopqTrainer.train(e, "embedding", P)
      val codes = LopqSearcher.encode(e, "vec_id", "embedding", model).cache()
      val counts = codes.groupBy("cell_id").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (model, codes, counts)
    })

  private def queryVectors(s: SparkSession, d: String): Array[(Long, Array[Float])] =
    t(s, d, "embeddings").where(col("vec_id") < NumQueries)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  val defs: Seq[QueryDef] = Seq(
    // §3.3/§3.1 full ANN path: train (cached per sfDir) → encode → per-query
    // multisequence cell selection → pruned ADC scan → exact rerank.
    QueryDef(
      "q34_lopq_ann",
      (s, d) => {
        val (model, codes, counts) = index(s, d)
        val e = t(s, d, "embeddings")
        val perQuery = queryVectors(s, d).map { case (qid, vec) =>
          LopqSearcher.search(codes, e, "vec_id", "embedding", model, vec,
            Quota, TopK, RerankK, counts)
            .withColumn("q_id", lit(qid))
        }
        val w = Window.partitionBy("q_id").orderBy(col("exact_dist"), col("id"))
        perQuery.reduce(_.unionAll(_))
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(col("q_id"), col("rank"), col("id").as("n_id"),
            round(col("adc_dist"), 6).as("adc_dist"),
            round(col("exact_dist"), 6).as("exact_dist"))
          .orderBy("q_id", "rank")
      },
      None,
      bench = true),

    // §2.4 recall@k eval vs the in-plan brute-force oracle
    // (ref get_recall, lopq/lopq/eval.py:92-142): exact NN via cross join +
    // ranking window, intersected with the ANN result per query.
    QueryDef(
      "q35_lopq_recall",
      (s, d) => {
        val (model, codes, counts) = index(s, d)
        val e = t(s, d, "embeddings")
        val ann = queryVectors(s, d).map { case (qid, vec) =>
          LopqSearcher.search(codes, e, "vec_id", "embedding", model, vec,
            Quota, TopK, RerankK, counts)
            .select(lit(qid).as("q_id"), col("id").as("n_id"))
        }.reduce(_.unionAll(_))
        val q = e.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val w = Window.partitionBy("q_id").orderBy(col("exact_dist"), col("vec_id"))
        val brute = e.join(broadcast(q), lit(true))
          .withColumn("exact_dist", sqrt(l2DistanceSq(col("q_vec"), col("embedding"))))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= TopK)
          .select(col("q_id"), col("vec_id").as("n_id"))
        brute.join(ann.withColumn("hit", lit(1)), Seq("q_id", "n_id"), "left_outer")
          .groupBy("q_id")
          .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / TopK).as("recall"))
          .orderBy("q_id")
      },
      None)
  )
}
