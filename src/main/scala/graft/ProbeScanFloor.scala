package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r19, VERDICT r18 next-round #6): the pure parquet decode
  * floor of a staged table — a noop materialization of every column,
  * with wall + this-JVM CPU per pass. Used to test the r18 claim that
  * annjoin_release_v4's rerank stage (which STREAMS the whole 32 GB
  * lookup store because 100k uniform candidate ids touch ~96 % of its
  * 1 MB row groups) sits at the float-decode floor: if a bare scan of
  * the same table costs the same CPU, no layout change can help at that
  * id density.
  *
  * Usage: runMain graft.ProbeScanFloor <parquetDir> [passes]
  */
object ProbeScanFloor {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.SessionDefaults(spark) // the engine's scan splits, like every consumer
    val df = spark.read.parquet(dir)
    (1 to passes).foreach { pass =>
      val c0 = graft.core.DiskStats.selfCpuJiffies()
      val b0 = graft.core.DiskStats.readBytes()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (graft.core.DiskStats.selfCpuJiffies() - c0) / 100.0
      val rb = graft.core.DiskStats.readBytes() - b0
      println(f"[scan-floor] $dir pass=$pass wall=$wall%.2f s selfCpu=$cpu%.1f s readBytes=${rb / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
