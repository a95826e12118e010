package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The native one-pass [[graft.functions.MinhashExpr]] must be bit-identical
  * to the per-permutation HOF formulation it replaced (which the DuckDB
  * oracle still mirrors): same affine rehash, same min, null elements
  * skipped per permutation, empty/all-null input → all-null signature. */
class MinhashExprSpec extends SparkSpec {

  private val NumHashes = 16

  /** The replaced per-permutation HOF formula, kept here as the executable
    * definition the native expression is checked against. */
  private def hofMinhash(hashes: org.apache.spark.sql.Column) =
    TextFunctions.bindOnce(hashes, hs =>
      array(TextFunctions.minhashCoeffs(NumHashes).map { case (a, b) =>
        array_min(transform(hs, h => (h * a + b) % TextFunctions.MinhashPrime))
      }: _*))

  test("native minhash equals the HOF definition on real text") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val hashes = TextFunctions.shingleHashes(
      TextFunctions.shingles(col("text"), 3))
    val both = docs.select(
      call_function("graft_minhash", hashes, lit(NumHashes)).as("native"),
      hofMinhash(hashes).as("hof"))
    assert(both.where(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("edge cases: empty array, null elements, codegen/interpreted parity") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[java.lang.Long]),          // → all-null signature
      (2L, Seq[java.lang.Long](42L, null, 7L)), // null skipped by every perm
      (3L, Seq[java.lang.Long](null))           // all-null → all-null sig
    ).toDF("id", "h")
    val both = df.select(col("id"),
      call_function("graft_minhash", col("h"), lit(NumHashes)).as("native"),
      hofMinhash(col("h")).as("hof"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) === r.getSeq[Any](2),
        s"row ${r.getLong(0)}: native ${r.getSeq[Any](1)} != hof ${r.getSeq[Any](2)}")
    }
    // empty and all-null inputs yield 16 nulls
    val sig1 = rows.find(_.getLong(0) == 1L).get.getSeq[Any](1)
    assert(sig1.length === NumHashes && sig1.forall(_ == null))
  }

  test("NULL input array yields the all-null signature, not SQL NULL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // array(array_min(transform(NULL, …)), …) = [NULL, …], never NULL — the
    // DuckDB oracle mirrors the HOF, so the native expression must too
    val df = Seq(Tuple1(null: Seq[java.lang.Long])).toDF("h")
    val both = df.select(
      call_function("graft_minhash", col("h"), lit(NumHashes)).as("native"),
      hofMinhash(col("h")).as("hof"))
    // force BOTH paths: codegen (default) and interpreted (collect on a
    // locally-evaluated projection)
    val r = both.head()
    assert(!r.isNullAt(0), "native minhash of NULL must not be SQL NULL")
    assert(r.getSeq[Any](0).length === NumHashes && r.getSeq[Any](0).forall(_ == null))
    assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    val interp = graft.functions.MinhashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), NumHashes)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    val arr = interp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() === NumHashes && (0 until NumHashes).forall(arr.isNullAt))
  }
}
