package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The native one-pass [[graft.functions.SimhashExpr]] must be bit-identical
  * to the per-bit HOF formulation it replaced (which the DuckDB oracle still
  * mirrors): same majority rule, same tie handling (votes = 0 → bit clear),
  * empty array → 0, null element → a −1 vote on every bit (the HOF's
  * `otherwise(-1)` fall-through — ADVICE r5: returning NULL here diverged
  * from the formula the expression claims to equal). */
class SimhashExprSpec extends SparkSpec {

  /** The replaced 32-pass HOF formula, kept here as the executable
    * definition the native expression is checked against. */
  private def hofSimhash(hashes: org.apache.spark.sql.Column, bits: Int) =
    TextFunctions.bindOnce(hashes, hs => {
      (0 until bits).map { b =>
        val votes = aggregate(hs, lit(0L),
          (acc, h) => acc +
            when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, lit(1L)).otherwise(lit(-1L)))
        when(votes > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    })

  test("native simhash equals the HOF definition on real text") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val hashes = TextFunctions.shingleHashes(TextFunctions.tokens(col("text")))
    val both = docs.select(
      call_function("graft_simhash", hashes, lit(32)).as("native"),
      hofSimhash(hashes, 32).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() === 0)
  }

  test("edge cases: empty array, ties, null element, codegen/interpreted parity") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[Long]),            // no tokens → 0
      (2L, Seq(1L, 2L)),                // bit0: +1-1=0 → clear (tie); bit1: -1+1=0 → clear
      (3L, Seq(3L, 3L, 4L))             // bit0: +1+1-1>0 set; bit1: same; bit2: -1-1+1<0 clear
    ).toDF("id", "h")
    val got = df.select(col("id"), call_function("graft_simhash", col("h"), lit(4)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 3L))
    // a null element votes −1 on every bit, exactly like the HOF formula:
    // [1, null] → bit0: +1−1=0 clear; all other bits: −2 < 0 clear
    val withNull = Seq(
      (4L, Seq[java.lang.Long](1L, null)),
      (5L, Seq[java.lang.Long](1L, 1L, null))) // bit0: +2−1>0 set
      .toDF("id", "h")
      .select(col("id"), call_function("graft_simhash", col("h"), lit(4)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withNull === Map(4L -> 0L, 5L -> 1L))
    // and the HOF itself agrees on the null-bearing input
    val hof = Seq((5L, Seq[java.lang.Long](1L, 1L, null))).toDF("id", "h")
      .select(hofSimhash(col("h"), 4).as("s")).head().getLong(0)
    assert(hof === 1L)
  }
}
