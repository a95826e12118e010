package graft

import org.apache.spark.sql.functions._

import graft.core.AllPairsGuard
import graft.engine.AnnIndexes
import graft.ops.Tables

/** The O(n²) baselines must refuse oversized inputs (VERDICT r5 "Next
  * round #5"): q32 and the brute AnnIndex are labeled ground-truth
  * generators, not production plans. */
class AllPairsGuardSpec extends SparkSpec {

  private def withMax(rows: Long)(body: => Unit): Unit = {
    spark.conf.set(AllPairsGuard.MaxRowsConf, rows.toString)
    try body finally spark.conf.unset(AllPairsGuard.MaxRowsConf)
  }

  test("q32 exact near-dup refuses above the configured row bound") {
    val run = SparkEntry.queries("q32_embed_neardup")
    withMax(10) { // sf0.001 embeddings has 500 rows
      val e = intercept[IllegalArgumentException](run(spark, sf))
      assert(e.getMessage.contains("q33_lsh_neardup"),
        "the refusal must point at the scale twin")
    }
    // under the bound the baseline still runs (and Verify oracle-gates it)
    assert(run(spark, sf).limit(1).count() >= 0)
  }

  test("brute-force AnnIndex refuses above the bound; lopq twin is exempt") {
    val e = Tables(spark, sf, "embeddings")
    withMax(10) {
      val brute = AnnIndexes.brute(e, "vec_id", "embedding")
      val err = intercept[IllegalArgumentException](
        brute.search(Array.fill(64)(0f), 5))
      assert(err.getMessage.contains("lopq"))
    }
    // default bound (1M) admits the 500-row test corpus
    assert(AnnIndexes.brute(e, "vec_id", "embedding").count === 500L)
  }
}
