package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r19, VERDICT r18 next-round #7): the text rows' interesting
  * expressions (`graft_shingle_hashes`, `graft_quality_score`,
  * `graft_minhash`) sit UPSTREAM of `localCheckpoint` pins, so the
  * catalog queries' own plan dumps show `Scan ExistingRDD` where the
  * fused work happens — this prints the PRE-CHECKPOINT fragment plans so
  * the record can witness the fusions directly:
  *   - `minhash_sigs`: the one-pass text → distinct-shingle-hash →
  *     MinHash signature fragment (the chain q24/q25/q105/q79 and every
  *     screened batch hash through);
  *   - `simhash_sigs`: q64/q107's signature fragment;
  *   - `band_rows`: the LSH band explode over the signature frame (shown
  *     over the un-checkpointed sigs, i.e. the fused end-to-end fragment).
  *
  * Usage: runMain graft.ProbeFragments <sfDir>
  */
object ProbeFragments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .repartition(col("doc_id")) // the catalog queries' docs() shape
    val p = graft.ops.TextOps.lshParams(spark)
    val sigs = graft.ops.TextOps.minhashSigsOf(docs, p)
    println("== fragment: minhash_sigs (pre-checkpoint) ==")
    sigs.explain("formatted")
    println("== fragment: band_rows over un-checkpointed sigs ==")
    graft.ops.TextOps.bandRowsOf(sigs, p).explain("formatted")
    println("== fragment: simhash_sigs (pre-checkpoint) ==")
    graft.ops.TextOps.simhashSigsOf(docs, 32).explain("formatted")
    spark.stop()
  }
}
