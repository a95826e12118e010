package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge

import graft.functions.{BroadcastAdcTablesDistExpr, VectorFunctions}

/** r19 (VERDICT r18 #3): the serve path's ADC lookup-sum moved from a
  * per-query LocalRelation broadcast-JOIN + interpreted HOF fold to a
  * broadcast-variable map + [[BroadcastAdcTablesDistExpr]]. The expression
  * must be bit-identical to the join form it replaced — same doubles,
  * summed from 0.0 in the same `mi` order — including the null semantics
  * on inputs the old form could produce (fine count ≠ m → zip_with pads →
  * null; NULL fine → null; a cell MISSING from the tables corresponds to a
  * row the old inner join dropped, so the caller's cell filter guarantees
  * it never surfaces — here it must read as null, never a wrong sum). */
class BroadcastAdcExprSpec extends SparkSpec {

  private val M = 4
  private val S = 16

  private def tablesFor(cell: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(977L + cell)
    Array.fill(M)(Array.fill(S)(rnd.nextDouble() * 10.0 - 5.0))
  }

  test("broadcast-map ADC distance ≡ the broadcast-join HOF form, bit-identical") {
    import spark.implicits._
    val cells = Seq(3, 7, 11)
    val rnd = new java.util.Random(42L)
    val rows = (0 until 400).map { i =>
      (i.toLong, cells(rnd.nextInt(cells.size)),
        Seq.fill(M)(rnd.nextInt(S).toShort))
    }
    val df = rows.toDF("id", "cell_id", "fine").localCheckpoint()

    // old form: per-cell ARRAY<ARRAY<DOUBLE>> rides a broadcast join
    val tablesDf = cells.map(c => (c, tablesFor(c).map(_.toSeq).toSeq))
      .toDF("cell_id", "adc_tables")
    val old = df.join(broadcast(tablesDf), "cell_id")
      .select(col("id"),
        VectorFunctions.adcDistance(col("fine"), col("adc_tables")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // new form: flattened tables on a broadcast variable, codegen'd fold
    val flat = new java.util.HashMap[Integer, Array[Double]]()
    cells.foreach { c =>
      val t = tablesFor(c)
      val f = new Array[Double](M * S)
      (0 until M).foreach(mi => System.arraycopy(t(mi), 0, f, mi * S, S))
      flat.put(c, f)
    }
    val bc = spark.sparkContext.broadcast(flat)
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false") // compile must succeed
    try {
      val got = df.select(col("id"), GraftBridge.column(
          BroadcastAdcTablesDistExpr(GraftBridge.expression(col("cell_id")),
            GraftBridge.expression(col("fine")), bc, M)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size === old.size)
      // bit-identity, not approximate equality: same fold, same doubles
      old.foreach { case (id, d) =>
        assert(java.lang.Double.doubleToRawLongBits(got(id)) ===
          java.lang.Double.doubleToRawLongBits(d), s"id=$id: ${got(id)} != $d")
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("null semantics: missing cell, wrong fine arity, NULL fine → null") {
    import spark.implicits._
    val flat = new java.util.HashMap[Integer, Array[Double]]()
    flat.put(3, Array.fill(M * S)(1.5))
    val bc = spark.sparkContext.broadcast(flat)
    val df = Seq(
      (1L, 3, Option(Seq.fill(M)(0.toShort))),      // ok
      (2L, 4, Option(Seq.fill(M)(0.toShort))),      // cell absent → null
      (3L, 3, Option(Seq.fill(M + 1)(0.toShort))),  // arity → null
      (4L, 3, Option.empty[Seq[Short]]),            // NULL fine → null
      (5L, 3, Option(Seq.fill(M)(S.toShort)))       // out-of-range code → null
    ).toDF("id", "cell_id", "fine")
    val rows = df.select(col("id"), GraftBridge.column(
        BroadcastAdcTablesDistExpr(GraftBridge.expression(col("cell_id")),
          GraftBridge.expression(col("fine")), bc, M)).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1L) === M * 1.5)
    assert(rows(2L) === null)
    assert(rows(3L) === null)
    assert(rows(4L) === null)
    assert(rows(5L) === null)
  }
}
