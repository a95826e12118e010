package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.CellMath
import graft.engine.{LopqIndexStore, LopqSearcher, ReleaseShape, RerankShape}

/** Dev probe (r18): per-PHASE wall-clock breakdown of the per-query release
  * serve path (`searchSlim`) — the six `release_*` bench rows are 5 serial
  * searches each, and the round-18 question is how much of each ~0.5 s
  * query is driver-side plan/collect latency vs cluster work. Phases are
  * timed by running the same public pieces `searchSlim` composes, in the
  * same order, on the same handle; the final phase materializes through the
  * noop sink exactly like Bench.
  *
  * Usage: runMain graft.ProbeServeBreakdown [v1|v2|v3|v4] [passes]
  */
object ProbeServeBreakdown {
  def main(args0: Array[String]): Unit = {
    val (confArgs, args) = args0.partition(_.startsWith("conf:"))
    val shapeName = args.headOption.getOrElse("v3")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    confArgs.foreach { a =>
      a.stripPrefix("conf:").split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v); println(s"[serve-breakdown] conf $k=$v")
        case _ => sys.error(s"bad conf arg: $a")
      }
    }
    import spark.implicits._

    val s = shapeName match {
      case "v1" => ReleaseShape.V1
      case "v2" => ReleaseShape.V2
      case "v4" => ReleaseShape.V4
      case _ => ReleaseShape.V3
    }
    val idx = LopqIndexStore.loadSlim(spark, s.dir).get
    val vectors = ReleaseShape.vectors(spark, idx.dir)
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    (1 to passes).foreach { pass =>
      var tWalk, tSlices, tTables, tApprox, tCollect, tRerank = 0.0
      val t0p = System.nanoTime()
      (0 until 5).foreach { q =>
        val query = ReleaseShape.rowVecFor(s, q.toLong * 997L)
        val slim = idx.slim
        var t0 = System.nanoTime()
        val aq = idx.pca.map(_.apply(query)).getOrElse(query)
        val (d0, d1) = slim.coarseDistances(aq)
        val cells = idx.cellCounts.selectCells(slim.v, d0, d1, ReleaseShape.Quota)
        tWalk += ms(t0)

        t0 = System.nanoTime()
        val keys = cells.flatMap { cell =>
          val (c0, c1) = CellMath.unpackCell(cell, slim.v)
          Seq((0, c0), (1, c1))
        }.distinct
        val rot = LopqIndexStore.rotationSlices(spark, idx.dir, keys)
        tSlices += ms(t0)

        // r19: searchSlim's ADC tables now ride a broadcast VARIABLE read
        // by a codegen'd lookup expression (VERDICT r18 #3) — no per-query
        // LocalRelation encode, no BroadcastExchange. The probe composes
        // the same pieces so its phase split measures the shipped path.
        t0 = System.nanoTime()
        val tables = cells.map { cell =>
          val cc = CellMath.unpackCell(cell, slim.v)
          cell -> slim.adcTables(aq, cc, (sp, c) => rot((sp, c)))
        }
        val (bcTables, m) = LopqSearcher.broadcastFlatTables(spark, tables)
        tTables += ms(t0)

        // approx stage plan + execution via the same shape searchSlim uses
        t0 = System.nanoTime()
        LopqSearcher.ensureInPushdown(spark, cells.size)
        import org.apache.spark.sql.graft.GraftBridge
        val approx = idx.codes
          .where(LopqIndexStore.cellFilter(cells, idx.cellBuckets))
          .withColumn("adc_dist", GraftBridge.column(
            graft.functions.BroadcastAdcTablesDistExpr(
              GraftBridge.expression(col("cell_id")),
              GraftBridge.expression(col("fine")), bcTables, m)))
          .orderBy(col("adc_dist"), col("id"))
          .limit(ReleaseShape.RerankK)
          .select("id", "cell_id", "adc_dist")
        tApprox += ms(t0) // plan build only; execution lands in collect below

        t0 = System.nanoTime()
        val prefix = approx.select("id", "adc_dist").collect()
        tCollect += ms(t0)

        t0 = System.nanoTime()
        LopqSearcher.ensureInPushdown(spark, prefix.length)
        val prefixDf = spark.createDataFrame(
          java.util.Arrays.asList(prefix.map(r =>
            org.apache.spark.sql.Row(r.get(0), r.getDouble(1))): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("adc_dist",
              org.apache.spark.sql.types.DoubleType))))
        val qLit = array(query.map(lit): _*)
        val reranked = vectors
          .where(col("vec_id").isin(prefix.map(_.get(0)).toSeq: _*))
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
          .join(broadcast(prefixDf), "id")
          .withColumn("exact_dist",
            sqrt(graft.functions.VectorFunctions.l2DistanceSq(qLit, col("vec"))))
          .orderBy(col("exact_dist"), col("id"))
          .limit(ReleaseShape.TopK)
          .select(col("id"), col("adc_dist"), col("exact_dist"))
        reranked.write.format("noop").mode("overwrite").save()
        tRerank += ms(t0)
      }
      println(f"[serve-breakdown] $shapeName pass=$pass total=${ms(t0p) / 1e3}%.3fs " +
        f"walk=${tWalk}%.0fms slices=${tSlices}%.0fms tables=${tTables}%.0fms " +
        f"approxPlan=${tApprox}%.0fms approxExec+collect=${tCollect}%.0fms " +
        f"rerank=${tRerank}%.0fms")
    }
    // reference row for comparison: the real searchSlim, same 5 queries
    (1 to passes).foreach { pass =>
      val t0 = System.nanoTime()
      (0 until 5).foreach { q =>
        ReleaseShape.searchSlim(spark, s, idx, q.toLong * 997L)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[serve-breakdown] $shapeName searchSlim pass=$pass " +
        f"total=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
