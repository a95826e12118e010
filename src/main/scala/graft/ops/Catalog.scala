package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry = one operator from SURVEY.md §2, expressed as a
  * Spark query over `/root/testdata` plus (when SQL-expressible) an
  * equivalent DuckDB oracle query. The driver hash-compares the two at
  * sf0.01 (`CORRECTNESS_r{N}.json`).
  *
  * Parity rules (both sides, always):
  *   - identical output column names (driver sorts columns by name);
  *   - deterministic row set: every LIMIT/top-k is tie-broken by a unique
  *     key, and both sides end in the same ORDER BY;
  *   - computed doubles are `round(...)`ed identically to absorb
  *     summation-order ulps; timestamps are formatted to strings;
  *   - integer-typed outputs cast to BIGINT on both sides.
  */
case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    /** Query serves against the prebuilt LOPQ index: Bench must gate it on
      * the prewarm having succeeded (an explicit flag — r5 string-matched
      * query names, VERDICT r5 hygiene #7). */
    dependsOnIndex: Boolean = false)

object Tables {
  /** Session config required to read the test tables: `events.ts` has been
    * generated both as TIMESTAMP(NANOS) parquet (older drops, which Spark 4
    * only reads as a long) and as plain TIMESTAMP_NTZ(MICROS) (current
    * drops). The conf keeps the legacy layout readable; [[normalizeTs]]
    * adapts to whichever shape is on disk. */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Override for where catalog queries put their gate-local scratch
    * artifacts (stores, stream checkpoints, staged sources, sink
    * fixtures). */
  val ScratchDirConf = "spark.graft.scratchDir"

  /** Root for gate-local scratch artifacts: `<working dir>/target` by
    * default (the sbt/driver launch directory), overridable via
    * [[ScratchDirConf]]. Derived, never hardcoded to a checkout path —
    * r15 shipped q106/q108 writing under a literal `/root/repo/target`,
    * which broke gate runs from any other location (ADVICE r15). */
  private[graft] def scratch(spark: SparkSession, sub: String): String = {
    val root = spark.conf.get(ScratchDirConf,
      System.getProperty("user.dir",
        System.getProperty("java.io.tmpdir", "/tmp")) + "/target")
    s"$root/$sub"
  }

  /** Normalize an events-shaped frame so `ts` is always a session-zoned
    * TIMESTAMP (µs instants, UTC session): the three on-disk shapes are
    *   - LONG ns-since-epoch (TIMESTAMP(NANOS) under nanosAsLong),
    *   - TIMESTAMP_NTZ µs (the current generator; DuckDB reads the same
    *     file as a naive TIMESTAMP, so a UTC-session cast keeps both
    *     engines on identical wall-clock AND epoch values),
    *   - TIMESTAMP, already normalized.
    * Works on batch and streaming frames alike. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      // ns-since-epoch long → µs timestamp; integer `div` keeps full
      // precision (a double division would lose it at ~1.7e18)
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Idempotent; makes graft_* native expressions resolvable on ANY session
    // the driver hands us (not just ones built with GraftExtensions).
    graft.functions.GraftFunctions.register(spark)
    // engine-level scan defaults on ANY session that reads through the
    // library (r19 — VERDICT r18 #2: moved out of the Bench harness so
    // Verify/Api/production scans run the plan the bench times)
    graft.core.SessionDefaults(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }
}
