package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Release-magnitude probe of the TEXT dedup chain (VERDICT r13
  * next-round #1): MinHash signatures → LSH band pairs → connected
  * components → corpus materialization, end to end over a synthetic
  * corpus of millions of documents with PLANTED duplicates, per-stage
  * wall-clock / machine read-bytes / scratch like `curatepipe`. The
  * vector-side magnitude probes each exposed defects invisible at gate
  * scale; this is the same treatment for the text chain (the other
  * consumer of the r13 contracted CC), the bread-and-butter dedup pass of
  * a 100 TB text pipeline (ref `updater/extraction_checker.py:225-258` is
  * the reference's dedup-vs-DB loop at content granularity).
  *
  * Corpus (deterministic, seeded by doc id — regenerating any row needs
  * no state):
  *   - ORGANIC docs: 120–280 tokens from a 50k-word vocabulary;
  *   - NEAR-DUP clusters: ids ≡ 1,2,3 (mod 50) are ~3 %-token-substituted
  *     copies of their base (id − id%50) — 3-shingle jaccard ≈ 0.8,
  *     comfortably past the 0.5 verification threshold, with the LSH
  *     banding's own candidate recall (~0.93/pair at 16 hashes, 4×4)
  *     measured by the audit, not assumed;
  *   - one BOILERPLATE CLIQUE: the last `clique` ids share one
  *     byte-identical text — the C4-style pathological shape (a footer/
  *     template repeated across the corpus) whose band buckets make the
  *     raw pair listing quadratic.
  *
  * Routes:
  *   - `collapsed` (default) = the production chain q63/q72 run
  *     ([[graft.ops.TextOps.dedupEdgesOf]]: exact-content collapse, star
  *     edges, representative-level LSH);
  *   - `naive` = the raw [[graft.ops.TextOps.lshPairsOf]] edge listing —
  *     kept as the A/B witness for the clique quadratics (Bands·K²/2
  *     candidate rows for a K-clique; run it at a K the machine survives
  *     and scale the arithmetic, not the box).
  *
  * Usage: runMain graft.ProbeTextDedup [nDocs] [clique:K] [naive] [keep]
  * (SPARK_DRIVER_MEM≥32g recommended at 4M docs — the shingle-table
  * checkpoint spills through the unified region.)
  */
object ProbeTextDedup {

  private val Vocab = 50000
  private val SubRate = 0.03
  private val ClusterMod = 50

  private def tokenOf(r: java.util.Random): String = f"w${r.nextInt(Vocab)}%05d"

  /** Organic text for `id` — also the base text near-dup members mutate. */
  private def organic(id: Long): Array[String] = {
    val r = new java.util.Random(0x5eed7ea1L + id * 2654435761L)
    Array.fill(120 + r.nextInt(161))(tokenOf(r))
  }

  /** Deterministic per-row text: boilerplate clique / mutated near-dup /
    * organic (see object doc). */
  private def textFor(id: Long, nDocs: Long, clique: Int): String = {
    val tokens =
      if (id >= nDocs - clique) organic(-1L) // the shared boilerplate
      else if (id % ClusterMod >= 1 && id % ClusterMod <= 3 &&
          id - id % ClusterMod < nDocs - clique) {
        val base = organic(id - id % ClusterMod)
        val r = new java.util.Random(0xd00d1e5L + id)
        base.map(t => if (r.nextDouble() < SubRate) tokenOf(r) else t)
      } else organic(id)
    tokens.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit)).map(_.toLong)
    val nDocs = nums.headOption.getOrElse(4000000L)
    val clique = args.find(_.startsWith("clique:"))
      .map(_.stripPrefix("clique:").toInt).getOrElse(5000)
    val naive = args.contains("naive")
    val keep = args.contains("keep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val route = if (naive) "naive" else "collapsed"
    val root = s"/root/repo/target/graft-text/n${nDocs}_c$clique"
    val staged = s"$root/docs"
    val edgesDir = s"$root/edges_$route"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    println(s"[probe-text] nDocs=$nDocs clique=$clique route=$route")

    def stage[A](label: String)(body: => A): A = {
      val b0 = graft.core.DiskStats.readBytes()
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = (graft.core.DiskStats.readBytes() - b0) / 1e9
      println(f"[probe-text] stage $label%-12s $sec%9.2f s  read=$gb%7.2f GB  " +
        f"scratch=${graft.core.DiskStats.scratchBytes() / 1e9}%6.2f GB")
      r
    }
    def dropCaches(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc() // release finished stages' shuffle files (chunk-driver discipline)
    }
    val t0 = System.nanoTime()

    // ---- corpus (reused across routes: the dir encodes nDocs + clique) ----
    val marker = new org.apache.hadoop.fs.Path(s"$staged/_SUCCESS")
    if (fs.exists(marker)) println(s"[probe-text] corpus reused: $staged")
    else stage("corpus") {
      val n = nDocs; val c = clique
      spark.range(0L, n, 1L, 256)
        .map(id => (id, textFor(id, n, c)))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(staged)
    }
    val docsDf = spark.read.parquet(staged)

    // ---- edges: the chain's candidate generation + verification ----
    stage("edges") {
      val edges =
        if (naive) graft.ops.TextOps.lshPairsOf(docsDf).select("id_a", "id_b")
        else graft.ops.TextOps.dedupEdgesOf(docsDf)
      edges.write.mode("overwrite").parquet(edgesDir)
      println(s"[probe-text]   edges=${spark.read.parquet(edgesDir).count()}")
    }
    dropCaches()

    // ---- components ----
    val labels = stage("components") {
      val l = graft.ops.TextOps
        .minLabelComponents(spark.read.parquet(edgesDir))
        .localCheckpoint()
      println(s"[probe-text]   labeled=${l.count()}")
      l
    }

    // ---- corpus materialization: survivors = corpus minus losers ----
    stage("materialize") {
      val losers = labels.where(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      val surv = graft.ops.TextOps.antiJoinIds(docsDf, "doc_id", losers)
      surv.write.format("noop").mode("overwrite").save()
      println(s"[probe-text]   survivors=${surv.count()} of $nDocs")
    }

    // ---- audit vs the planted structure ----
    stage("audit") {
      // boilerplate clique: one component rooted at its min id, K−1 losers
      val cliqueMin = nDocs - clique
      val cl = labels.where(col("id") >= cliqueMin)
        .agg(count(lit(1)), countDistinct(col("comp")), min(col("comp"))).head()
      println(s"[probe-text]   clique labeled=${cl.getLong(0)}/$clique " +
        s"components=${cl.getLong(1)} (expect 1) root=${cl.getLong(2)} (expect $cliqueMin)")
      // near-dup clusters: fraction fully merged (all 4 members one comp)
      val planted = docsDf.select(col("doc_id"))
        .where(col("doc_id") < cliqueMin &&
          (col("doc_id") % ClusterMod) <= 3 &&
          (col("doc_id") - col("doc_id") % ClusterMod) < cliqueMin)
      val byCluster = planted
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .groupBy((col("doc_id") - col("doc_id") % ClusterMod).as("cl"))
        .agg(count(lit(1)).as("n"), countDistinct(col("comp")).as("nc"),
          count(col("comp")).as("labeled"))
      val r = byCluster.agg(
        count(lit(1)),
        sum(when(col("nc") === 1 && col("labeled") === col("n"), 1L).otherwise(0L)),
        sum(when(col("labeled") < col("n"), 1L).otherwise(0L))).head()
      val (total, full, partial) = (r.getLong(0), r.getLong(1), r.getLong(2))
      println(f"[probe-text]   clusters=$total fullyMerged=$full " +
        f"(${100.0 * full / total}%.2f%%) withUnpairedMember=$partial")
    }
    println(f"[probe-text] TOTAL ${(System.nanoTime() - t0) / 1e9}%9.2f s  " +
      f"scratch=${graft.core.DiskStats.scratchBytes() / 1e9}%6.2f GB")
    if (!keep) fs.delete(new org.apache.hadoop.fs.Path(edgesDir), true)
    spark.stop()
  }
}
