package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.CellMath
import graft.engine.{LopqIndexStore, ReleaseShape}

/** Dev probe (r18): is the batch ANN join's many-thousand-literal cell
  * INSET filter on the codes scan worth its per-row cost when it prunes
  * almost nothing? Times three shapes of the same scan: unfiltered,
  * INSET-filtered, and bucket-INSET-only.
  *
  * Plan parity with production: annJoin's `ensureInPushdown` caps the
  * parquet IN-pushdown threshold at [[LopqSearcher.MaxStackSafeInPushdown]]
  * (512), and every union measured here is far past it — so in BOTH the
  * probe and the production plan the IN-list stays Catalyst-side (InSet,
  * no parquet row-group pruning); the probe times the same physical shape
  * the batch join runs. Usage: runMain graft.ProbeCellFilterCost [v2|v3|v4] [n] */
object ProbeCellFilterCost {
  def main(args: Array[String]): Unit = {
    val s = args.headOption match {
      case Some("v2") => ReleaseShape.V2
      case Some("v4") => ReleaseShape.V4
      case _ => ReleaseShape.V3
    }
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val idx = LopqIndexStore.loadSlim(spark, s.dir).get
    // the batch's visited-cell union, exactly as annJoin computes it
    val slim = idx.slim
    val hist = idx.cellCounts
    val pca = idx.pca
    val union = (0 until n).iterator.flatMap { q =>
      val raw = ReleaseShape.rowVecFor(s, q.toLong)
      val aq = pca.map(_.apply(raw)).getOrElse(raw)
      val (d0, d1) = slim.coarseDistances(aq)
      hist.selectCells(slim.v, d0, d1, ReleaseShape.Quota)
    }.toArray.distinct.sorted
    val rowsInUnion = union.iterator.map(c => hist.countOf(c)).sum
    println(s"[cellfilter] unionCells=${union.length} rowsInUnion=$rowsInUnion")

    def time(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[cellfilter] $label pass=$p ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    val cells = scala.collection.immutable.ArraySeq.unsafeWrapArray(union)
    time("unfiltered ", idx.codes)
    time("bucketOnly ", idx.codes.where(
      col("cell_bucket").isin(cells.map(_ % idx.cellBuckets).distinct: _*)))
    time("full INSET ", idx.codes.where(
      LopqIndexStore.cellFilter(cells, idx.cellBuckets)))
    spark.stop()
  }
}
