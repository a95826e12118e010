package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions, with whole-stage codegen, for the vector
  * hot path (SURVEY.md §4: "custom Expression with codegen in v1").
  *
  * These replace the higher-order-function forms in [[VectorFunctions]] on
  * the per-pair inner loops (near-dup cross joins, kNN, ADC): a single
  * fused primitive loop over the two arrays instead of an interpreted
  * lambda per element, which is the difference between O(n²·d) interpreted
  * calls and one tight codegen'd loop per pair.
  *
  * Numeric contract (oracle parity): sequential left-to-right fold in
  * double precision — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => f(x,y)), 0.0, _+_)` and to DuckDB's
  * `list_dot_product` fold, so swapping implementations never changes a
  * query's hash.
  *
  * Reference semantics implemented: exact L2 rerank distance
  * (`cufacesearch/searcher/searcher_lopqhbase.py:887,998`), dot product for
  * cosine similarity (`lopq/lopq/eval.py:20-25` uses scipy cdist over the
  * same math).
  */
abstract class VectorFoldExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Scala fold step: contribution of one element pair (interpreted path). */
  protected def step(x: Double, y: Double): Double

  /** Java source of the fold step over double vars `x`/`y` (codegen path).
    * Must compute exactly [[step]]. */
  protected def stepCode(x: String, y: String): String

  /** Mismatched lengths → null (zip_with pads with null, and a null element
    * nulls the whole fold — same end result, kept explicit here). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    val fA = isFloat(left)
    val fB = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = if (fA) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (fB) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      s += step(x, y)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getA($i);
         |    final double $y = (double) $b.$getB($i);
         |    $s += ${stepCode(x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }
}

/** Σᵢ aᵢ·bᵢ in double precision. */
case class DotProductExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "graft_dot"
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σᵢ (aᵢ−bᵢ)² in double precision — exact squared L2 distance. */
case class L2DistSqExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "graft_l2sq"
  override protected def step(x: Double, y: Double): Double = { val d = x - y; d * d }
  override protected def stepCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SimHash over pre-hashed tokens in ONE fused pass — bit b of the result
  * is set iff Σ_tokens (bit_b(hash) ? +1 : −1) > 0, identical to the
  * 32-HOF-pass formulation in [[TextFunctions.simhash]] it replaces: that
  * shape re-traverses the hash array once per bit through an interpreted
  * lambda, this one walks it once with all `bits` counters in registers/
  * one small array (measured as the dominant cost of the simhash pipeline).
  * Same ref intent as the banded near-dup family (SURVEY LLM-pipeline
  * surface); DuckDB oracle unchanged — the algorithm is bit-identical,
  * INCLUDING on null elements: a null hash votes −1 on every bit, exactly
  * like the HOF's `when(bit).otherwise(-1)` and the oracle's `CASE … ELSE
  * -1` fall-through (unreachable from md5-hashed tokens, but ADVICE r5
  * flagged the former return-NULL divergence as a latent oracle mismatch). */
case class SimhashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> and 1 ≤ bits ≤ 60, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 } // null token: −1 every bit
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $b = 0; $b < $bits; $b++) { $votes[$b] -= 1; }
         |  } else {
         |    final long $h = $a.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature over pre-hashed shingles in ONE fused pass — element j
  * is min over shingles of `(a_j·h + b_j) mod P`, identical to the
  * per-permutation HOF formulation [[TextFunctions.minhashFromHashes]]
  * replaced (the same move r5 made for simhash): that shape re-traverses
  * the hash array once per permutation through interpreted lambdas; this
  * walks it once with all minima in one local array. Coefficients are the
  * deterministic [[TextFunctions.minhashCoeffs]]; all inputs live in
  * [0, P) with P = 2³¹−1, so `h·a + b < 2⁶²` never wraps (same contract as
  * the DuckDB oracle). Null elements are skipped by every permutation
  * (array_min semantics); an empty/all-null input yields an all-null
  * signature — exactly the HOF/oracle behavior. A NULL input array ALSO
  * yields the all-null signature, not SQL NULL: the HOF formulation is
  * `array(array_min(transform(NULL, …)), …)` = `[NULL, …]`, and the DuckDB
  * oracle mirrors that, so short-circuiting to NULL here would be an
  * oracle divergence on any NULL text column. */
case class MinhashExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  private lazy val as: Array[Long] =
    TextFunctions.minhashCoeffs(numHashes).map(_._1).toArray
  private lazy val bs: Array[Long] =
    TextFunctions.minhashCoeffs(numHashes).map(_._2).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes >= 1 && numHashes <= 1024 =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> and 1 ≤ numHashes ≤ 1024, got ${dt.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    // NULL array → all-null signature (never SQL NULL): the HOF/oracle shape
    if (value == null)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](numHashes))
    else nullSafeEval(value)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < numHashes) {
          val v = (h * as(j) + bs(j)) % TextFunctions.MinhashPrime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    if (seen) { var j = 0; while (j < numHashes) { out(j) = mins(j); j += 1 } }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val mins = ctx.freshName("mins")
    val seen = ctx.freshName("seen")
    val out = ctx.freshName("out")
    val javaType = CodeGenerator.javaType(dataType)
    val body =
      s"""
         |${childGen.code}
         |final Object[] $out = new Object[$numHashes];
         |if (!${childGen.isNull}) {
         |  final int $n = $a.numElements();
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  boolean $seen = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $seen = true;
         |      final long $h = $a.getLong($i);
         |      for (int $j = 0; $j < $numHashes; $j++) {
         |        final long $v = ($h * $aRef[$j] + $bRef[$j]) % ${TextFunctions.MinhashPrime}L;
         |        if ($v < $mins[$j]) $mins[$j] = $v;
         |      }
         |    }
         |  }
         |  if ($seen) {
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      $out[$j] = java.lang.Long.valueOf($mins[$j]);
         |    }
         |  }
         |}
         |final $javaType ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC distance of one code row from the cell-local query PROJECTION —
  * `Σ_m ‖px[m·subDim,(m+1)·subDim) − cb(m, fine(m))‖²` with the flattened
  * subquantizer codebook `cb` held as a reference object (M·S·subDim floats,
  * ~128 KB at the release constants — shared across all rows of the stage,
  * NOT shipped per row).
  *
  * This is the batch ANN join's projection-mode inner loop
  * ([[graft.engine.SlimLopqModel.adcDistanceFromProjection]]): the r8 Scala
  * UDF form re-boxed both arrays (`Seq[Short]`/`Seq[Float]`) on every
  * candidate row — at a 1000-probe release-shape batch that is ~10M rows ×
  * ~270 boxed element reads, measured as the dominant cost of the whole
  * join (7–14 s of a ~14 s pass). This codegen form reads the `ArrayData`
  * primitives in place.
  *
  * Numeric contract (bit-parity, spec-pinned): per sub-vector `m`, a
  * sequential double-precision fold `t = (double)px[i] − (double)cb[i];
  * d += t·t` accumulated into the total in `m` order — EXACTLY
  * `adcDistanceFromProjection`, which is itself pinned bit-identical to
  * summing the materialized ADC table entries in `m` order. */
case class AdcProjectionExpr(left: Expression, right: Expression,
    codebook: Array[Float], m: Int, subDim: Int) extends BinaryExpression {
  // left = px ARRAY<FLOAT> (cell-local projection), right = fine ARRAY<SHORT>
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_proj"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ShortType, _))
        if m >= 1 && subDim >= 1 && codebook.length % (m * subDim) == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, ARRAY<SMALLINT>) and a codebook of " +
        s"m·s·subDim floats, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val px = a.asInstanceOf[ArrayData]
    val fine = b.asInstanceOf[ArrayData]
    if (px.numElements() != m * subDim || fine.numElements() != m) return null
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val base = ((mi * (codebook.length / (m * subDim))) + fine.getShort(mi).toInt) * subDim
      val pbase = mi * subDim
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val t = px.getFloat(pbase + i).toDouble - codebook(base + i).toDouble
        d += t * t
        i += 1
      }
      acc += d
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcProjCb", codebook, "float[]")
    val sClusters = codebook.length / (m * subDim)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mi = ctx.freshName("mi")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val pbase = ctx.freshName("pbase")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != ${m * subDim} || $b.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    final int $base = (($mi * $sClusters) + (int) $b.getShort($mi)) * $subDim;
         |    final int $pbase = $mi * $subDim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $t = (double) $a.getFloat($pbase + $i) - (double) $cbRef[$base + $i];
         |      $d += $t * $t;
         |    }
         |    $acc += $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact squared L2 between a BROADCAST probe vector — looked up map-side
  * by the row's probe id — and the row's own vector. The batch ANN join's
  * exact rerank needs (probe vector, candidate vector) together per pair;
  * joining the probe vectors in by `q_id` re-shuffles the candidate rows
  * AFTER they picked up the D-dim candidate vector — a second O(pairs·D)
  * network pass (~300 GB at a 600k-probe × 256-prefix self-dedup). While
  * the probe MATRIX is broadcastable (O(probes·D), independent of the
  * pair count), this lookup keeps the exact stage shuffle-free: candidate
  * rows stay where the id-join put them and the probe vector comes off
  * the broadcast. The map is fetched once per partition into a mutable
  * member (no per-row `Broadcast.value` hop).
  *
  * Numeric contract (spec-pinned): the same sequential left-to-right
  * double-precision fold as `graft_l2sq` — distances are bit-identical to
  * the join form, so the regime switch never changes a result hash.
  * Nullable: a probe id absent from the map yields null (cannot happen
  * when the map is built from the same batch's rows). */
case class BroadcastL2DistSqExpr(left: Expression, right: Expression,
    qvecs: org.apache.spark.broadcast.Broadcast[java.util.HashMap[java.lang.Long, Array[Float]]])
  extends BinaryExpression {
  // left = probe id (integral), right = candidate vector ARRAY<FLOAT|DOUBLE>
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bcast_l2sq"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType, ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT|INT probe id, ARRAY<FLOAT|DOUBLE>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  private def isFloatVec: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = qvecs.value.get(a.asInstanceOf[Number].longValue())
    if (q == null) return null
    val v = b.asInstanceOf[ArrayData]
    if (v.numElements() != q.length) return null
    val f = isFloatVec
    var s = 0.0
    var i = 0
    while (i < q.length) {
      if (v.isNullAt(i)) return null
      val y = if (f) v.getFloat(i).toDouble else v.getDouble(i)
      val d = q(i).toDouble - y
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("qvecBroadcast", qvecs,
      "org.apache.spark.broadcast.Broadcast")
    // one map fetch per partition, not per row
    val mapVar = ctx.addMutableState("java.util.HashMap", "qvecMap",
      v => s"$v = (java.util.HashMap) $bRef.value();")
    val getY = if (isFloatVec) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (qid, vec) => {
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final float[] $q = (float[]) $mapVar.get(java.lang.Long.valueOf((long) $qid));
         |if ($q == null || $vec.numElements() != $q.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $q.length; $i++) {
         |    if ($vec.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = (double) $q[$i] - (double) $vec.$getY($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One query's half-projection dictionary: sorted packed keys
  * (`split · V + cluster`) with the matching [[graft.engine.SlimLopqModel
  * .projectHalfWith]] halves (halfDim floats each). Keys are the DISTINCT
  * (split, cluster) pairs among the query's visited cells — a query
  * visiting hundreds of cells holds a few dozen halves, which is the whole
  * point of the r19 batch-join dictionary mode. Lookup is a binary search
  * over the (tiny) key array. */
final class QueryHalves(val keys: Array[Int], val halves: Array[Array[Float]])
    extends Serializable {
  def get(key: Int): Array[Float] = {
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i < 0) null else halves(i)
  }
}

/** Projection-mode ADC distance read through a BROADCAST per-query
  * half-projection dictionary (r19, VERDICT r18 next-round #1 — the
  * builder's own top lever). The batch ANN join's projection mode shipped
  * a D-float `px` per (query, visited cell) through the fan-out join's
  * broadcast — 243 MB/pass at the v3 release shape (232k pairs × 1 KB),
  * ~1.4 s of broadcast build plus a 232k-pair projection stage — while
  * `px` is the CONCATENATION of two per-(query, split, cluster) halves
  * and a query's ~232 visited cells share ~2×30 distinct halves. This
  * expression reconstructs the per-row distance from the two halves
  * looked up map-side (q_id → [[QueryHalves]], key = split·V + cluster),
  * so the join side carries only `(q_id, cell_id)`.
  *
  * Numeric contract (bit-parity, spec-pinned): EXACTLY
  * [[AdcProjectionExpr]] over `px = half0 ++ half1` — the same per-`mi`
  * two-level fold (`t = px[i] − cb[i]; d += t·t` per sub-vector, `acc += d`
  * in `mi` order) with `px[mi·subDim + i]` read from `half0[mi·subDim + i]`
  * for `mi < m/2` and `half1[(mi − m/2)·subDim + i]` past it — and
  * [[graft.engine.SlimLopqModel.projectWith]] IS that concatenation of
  * [[graft.engine.SlimLopqModel.projectHalfWith]] halves, so the floats
  * are identical, not just close. Nullable: a probe id or cluster absent
  * from the dictionary yields null (cannot happen when the dictionary is
  * built from the same batch's visited cells). */
case class BroadcastAdcHalvesExpr(first: Expression, second: Expression,
    third: Expression,
    dict: org.apache.spark.broadcast.Broadcast[java.util.HashMap[java.lang.Long, QueryHalves]],
    codebook: Array[Float], m: Int, subDim: Int, v: Int)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  // first = q_id (integral), second = cell_id INT, third = fine ARRAY<SHORT>
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bcast_adc_halves"

  private val numFineSplits = m / 2 // two coarse splits, always
  private val halfLen = numFineSplits * subDim

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType | IntegerType, IntegerType, ArrayType(ShortType, _))
          if m >= 2 && m % 2 == 0 && subDim >= 1 && v >= 1 &&
            codebook.length % (m * subDim) == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT|INT q_id, INT cell_id, ARRAY<SMALLINT> fine), " +
          s"even m ≥ 2 and a codebook of m·s·subDim floats; " +
          s"got ${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val qh = dict.value.get(a.asInstanceOf[Number].longValue())
    if (qh == null) return null
    val cell = b.asInstanceOf[Int]
    val h0 = qh.get(cell / v)
    val h1 = qh.get(v + cell % v)
    if (h0 == null || h1 == null || h0.length != halfLen || h1.length != halfLen)
      return null
    val fine = c.asInstanceOf[ArrayData]
    if (fine.numElements() != m) return null
    val sClusters = codebook.length / (m * subDim)
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val h = if (mi < numFineSplits) h0 else h1
      val pbase = (if (mi < numFineSplits) mi else mi - numFineSplits) * subDim
      val base = ((mi * sClusters) + fine.getShort(mi).toInt) * subDim
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val t = h(pbase + i).toDouble - codebook(base + i).toDouble
        d += t * t
        i += 1
      }
      acc += d
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("adcHalvesDict", dict,
      "org.apache.spark.broadcast.Broadcast")
    val mapVar = ctx.addMutableState("java.util.HashMap", "adcHalvesMap",
      vn => s"$vn = (java.util.HashMap) $bRef.value();")
    val cbRef = ctx.addReferenceObj("adcHalvesCb", codebook, "float[]")
    val sClusters = codebook.length / (m * subDim)
    nullSafeCodeGen(ctx, ev, (qid, cell, fine) => {
      val qh = ctx.freshName("qh")
      val h0 = ctx.freshName("h0")
      val h1 = ctx.freshName("h1")
      val h = ctx.freshName("h")
      val mi = ctx.freshName("mi")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val pbase = ctx.freshName("pbase")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      val cls = classOf[QueryHalves].getName
      s"""
         |final $cls $qh = ($cls) $mapVar.get(java.lang.Long.valueOf((long) $qid));
         |final float[] $h0 = $qh == null ? null : $qh.get($cell / $v);
         |final float[] $h1 = $qh == null ? null : $qh.get($v + $cell % $v);
         |if ($h0 == null || $h1 == null || $h0.length != $halfLen ||
         |    $h1.length != $halfLen || $fine.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    final float[] $h = $mi < $numFineSplits ? $h0 : $h1;
         |    final int $pbase = ($mi < $numFineSplits ? $mi : $mi - $numFineSplits) * $subDim;
         |    final int $base = (($mi * $sClusters) + (int) $fine.getShort($mi)) * $subDim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      final double $t = (double) $h[$pbase + $i] - (double) $cbRef[$base + $i];
         |      $d += $t * $t;
         |    }
         |    $acc += $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** ADC distance of one code row from BROADCAST per-cell distance tables —
  * the per-query serve path's inner loop (r19, VERDICT r18 #3/builder's
  * lever #2). `searchSlim`/`search` previously shipped the visited cells'
  * ADC tables as a per-query LocalRelation (a ~3.7 MB `(cell, M×S
  * doubles)` DataFrame built through the Seq row encoder, ~60 ms/query at
  * the v3 release shape) broadcast-JOINED on `cell_id`, plus the per-query
  * `BroadcastExchange` and the interpreted `aggregate`/`zip_with` HOF
  * lookup-sum per row. This expression reads the same doubles from a
  * plain broadcast variable (cell_id → flattened M·S table, mi-major) and
  * does the lookup-sum in one codegen'd loop — no row encode, no exchange,
  * no join, no HOF.
  *
  * Numeric contract (spec-pinned): Σ_mi tables[mi·S + fine[mi]] summed
  * from 0.0 in `mi` order — bit-identical to
  * `aggregate(zip_with(tables, fine, (t, c) => element_at(t, c + 1)),
  * 0.0, _+_)` over the per-cell ARRAY<ARRAY<DOUBLE>> column, which sums
  * the SAME doubles in the SAME order. Null semantics mirror the join
  * form on every reachable input: a cell absent from the map → null
  * (the inner join DROPPED such rows; callers filter the scan to exactly
  * the map's cells, so none exist), `fine` null → null, a fine count ≠ m
  * or an out-of-range code → null (zip_with pads with null → the
  * aggregate folds to null). */
case class BroadcastAdcTablesDistExpr(left: Expression, right: Expression,
    tables: org.apache.spark.broadcast.Broadcast[java.util.HashMap[Integer, Array[Double]]],
    m: Int) extends BinaryExpression {
  // left = cell_id INT, right = fine ARRAY<SHORT>
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bcast_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(ShortType, _)) if m >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (INT cell_id, ARRAY<SMALLINT> fine) and m ≥ 1, " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val t = tables.value.get(a.asInstanceOf[Integer])
    if (t == null) return null
    val fine = b.asInstanceOf[ArrayData]
    if (fine.numElements() != m) return null
    val s = t.length / m
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      if (fine.isNullAt(mi)) return null
      val code = fine.getShort(mi).toInt
      if (code < 0 || code >= s) return null
      acc += t(mi * s + code)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("adcTablesBroadcast", tables,
      "org.apache.spark.broadcast.Broadcast")
    // one map fetch per partition, not per row
    val mapVar = ctx.addMutableState("java.util.HashMap", "adcTablesMap",
      v => s"$v = (java.util.HashMap) $bRef.value();")
    nullSafeCodeGen(ctx, ev, (cell, fine) => {
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val code = ctx.freshName("code")
      val acc = ctx.freshName("acc")
      s"""
         |final double[] $t = (double[]) $mapVar.get(java.lang.Integer.valueOf($cell));
         |if ($t == null || $fine.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $s = $t.length / $m;
         |  double $acc = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    if ($fine.isNullAt($mi)) { ${ev.isNull} = true; break; }
         |    final int $code = (int) $fine.getShort($mi);
         |    if ($code < 0 || $code >= $s) { ${ev.isNull} = true; break; }
         |    $acc += $t[$mi * $s + $code];
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct word-shingle hashes of a text in ONE fused pass (r18):
  * tokenize on single spaces (empties dropped), form the contiguous
  * `n`-gram shingles (or ONE whole-text shingle when the text has fewer
  * than `n` tokens), keep the first occurrence of each distinct shingle,
  * and hash it — md5, first 15 hex chars as a 60-bit BIGINT, mod P — in
  * first-occurrence order.
  *
  * Bit-identical replacement for the composition it fuses
  * (`shingleHashes(array_distinct(shingles(text, n)))` in
  * [[TextFunctions]]), which was the dominant per-document cost of the
  * MinHash family (q24/q25/q105 and every screened-ingest batch): that
  * chain materializes the token array, a string per shingle through
  * interpreted HOF lambdas, a 32-char hex string per shingle, and parses
  * it back with `conv` — measured ~300 µs/doc at sf0.1. This walks the
  * UTF-8 bytes once; the md5 is computed directly over each shingle's
  * bytes and folded to the same `('0x' || substr(md5(x),1,15))::BIGINT % P`
  * value (the first 8 digest bytes, big-endian, `>>> 4`). Distinctness is
  * byte-equality on the shingle content — exactly `array_distinct`'s
  * string equality, never hash equality. DuckDB oracles are unchanged:
  * same values, same order.
  *
  * NULL text yields NULL, matching the HOF chain (split → NULL propagates
  * through every step). Empty/whitespace-only text yields the single
  * empty-string shingle's hash, matching `concat_ws` over an empty token
  * array. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // n validated separately so a bad n is reported as such, not as a
    // (valid) input-type failure (ADVICE r18 #2)
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n ≥ 1, got n = $n")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    ShingleHashesExpr.distinctShingleHashes(bytes, n)
  }

  /** r19 (VERDICT r18 #3/#4): a call into the same fused pass the
    * interpreted path runs — identical results by construction — so the
    * projection stays inside one WholeStageCodegen span instead of the
    * r18 CodegenFallback punching a hole (per-row boxing at the expression
    * boundary) into every plan that hashes text. The companion MODULE
    * rides a codegen reference object: a Scala object whose companion
    * class exists gets no Java static forwarders, so Janino cannot
    * resolve `ShingleHashesExpr.distinctShingleHashes` as a static call
    * (and a failed codegen compile would silently fall the whole stage
    * back to the interpreted path — the spec pins fallback=off). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("shingleHashesModule", ShingleHashesExpr,
      "graft.functions.ShingleHashesExpr$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $mod.distinctShingleHashes($c.getBytes(), $n);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashesExpr {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5(bytes) → first 15 hex chars as BIGINT → mod P. The first 15 hex
    * chars are the first 8 digest bytes read big-endian, unsigned-shifted
    * right by 4 (drops the 16th hex char) — identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` and the oracle's
    * `('0x' || substr(md5(x),1,15))::BIGINT`. */
  private def md5Mod(md: java.security.MessageDigest, b: Array[Byte],
      off: Int, len: Int): Long = {
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) % TextFunctions.MinhashPrime
  }

  private[functions] def distinctShingleHashes(bytes: Array[Byte], n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // token boundaries: maximal runs of non-space bytes (0x20 never occurs
    // inside a multi-byte UTF-8 sequence, so byte-splitting == the HOF
    // chain's split-on-" "-then-drop-empties). Primitive growable arrays
    // throughout — this is the fused hot path, boxed collections would
    // reintroduce per-token allocation.
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (bytes(i) != 0x20) {
        val s = i
        while (i < len && bytes(i) != 0x20) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s; ends(nTok) = i; nTok += 1
      } else i += 1
    }
    val md = md5Local.get()
    var out = new Array[Long](math.max(8, math.min(nTok, 1 << 12)))
    var nOut = 0
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var buf = new Array[Byte](64)
    def addShingle(fromTok: Int, toTok: Int): Unit = { // tokens [fromTok, toTok)
      var sLen = 0
      var t = fromTok
      while (t < toTok) {
        val tl = ends(t) - starts(t)
        val need = sLen + tl + (if (t > fromTok) 1 else 0)
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (t > fromTok) { buf(sLen) = 0x20; sLen += 1 }
        System.arraycopy(bytes, starts(t), buf, sLen, tl)
        sLen += tl
        t += 1
      }
      val sb = java.util.Arrays.copyOfRange(buf, 0, sLen)
      if (seen.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(sb))) {
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
        out(nOut) = md5Mod(md, sb, 0, sLen)
        nOut += 1
      }
    }
    if (nTok < n) addShingle(0, nTok) // the whole-text single shingle
    else {
      var s = 0
      while (s + n <= nTok) { addShingle(s, s + n); s += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, nOut))
  }
}

/** Heuristic quality score in ONE fused pass (r18) — bit-identical to
  * [[TextFunctions.qualityScore]]'s HOF formulation (which the DuckDB
  * oracles mirror): length-band score + mean-token-length band score +
  * alpha ratio, averaged and HALF_UP-rounded to 6 dp. The HOF chain paid
  * an interpreted `aggregate` lambda per token plus a full
  * `regexp_replace` (new string) per document — measured ~170 µs/doc at
  * sf0.1, the whole cost of q22 and the first filter of the q78/q79/q89
  * curation family.
  *
  * Exact-parity notes: tokens are maximal runs of non-space bytes
  * (== split-on-" "-drop-empties); token/text lengths count CODEPOINTS
  * (non-continuation UTF-8 bytes), matching `length()`; the alpha count
  * is the codepoints kept by `regexp_replace(text, "[^a-zA-Z ]", "")` —
  * all ASCII, so byte counting is exact; the final round replicates
  * Spark's `Round` (BigDecimal HALF_UP at scale 6); the double
  * arithmetic folds in the same order. NULL text → NULL. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quality_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    QualityScoreExpr.score(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  /** r19 (VERDICT r18 #3/#4): a call into the same fused pass the
    * interpreted path runs — the projection stays inside one
    * WholeStageCodegen span (the r18 CodegenFallback broke the span and
    * boxed per row at the expression boundary). Module reference object,
    * not a static call — see [[ShingleHashesExpr.doGenCode]]. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("qualityScoreModule", QualityScoreExpr,
      "graft.functions.QualityScoreExpr$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $mod.score($c.getBytes());")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QualityScoreExpr {
  /** The fused pass itself — shared verbatim by the interpreted eval and
    * the generated code (one implementation, zero parity surface). */
  def score(bytes: Array[Byte]): Double = {
    var nTok = 0L
    var sumTokChars = 0L
    var alphaChars = 0L
    var textChars = 0L
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      // codepoint start = any byte that is not a UTF-8 continuation byte
      val isCont = (b & 0xc0) == 0x80
      if (!isCont) {
        textChars += 1
        if (b == 0x20 || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
          alphaChars += 1
      }
      if (b != 0x20) {
        if (i == 0 || bytes(i - 1) == 0x20) nTok += 1
        if (!isCont) sumTokChars += 1
      }
      i += 1
    }
    val nTokD = nTok.toDouble
    val lenScore = if (nTokD >= 5 && nTokD <= 1000) 1.0 else 0.0
    val meanTokLen = if (nTokD == 0) 0.0 else sumTokChars.toDouble / nTokD
    val tokLenScore = if (meanTokLen >= 2 && meanTokLen <= 12) 1.0 else 0.0
    val alphaRatio = if (textChars == 0) 0.0
      else alphaChars.toDouble / textChars.toDouble
    val q = (lenScore + tokLenScore + alphaRatio) / 3.0
    // Spark Round(…, 6) on DOUBLE: BigDecimal HALF_UP at scale 6
    java.math.BigDecimal.valueOf(q)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Registration of the graft expressions, two ways:
  *   - [[GraftFunctions.register]]: imperative, idempotent, works on any
  *     existing session (every catalog query calls it via `Tables.apply`);
  *   - [[GraftExtensions]]: `spark.sql.extensions`-style injection for
  *     sessions built with the library on the classpath.
  */
object GraftFunctions {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorFoldExpr].getName, name)

  val all: Seq[(String, FunctionBuilder)] = Seq(
    "graft_dot" -> ((c: Seq[Expression]) => DotProductExpr(c(0), c(1))),
    "graft_l2sq" -> ((c: Seq[Expression]) => L2DistSqExpr(c(0), c(1))),
    "graft_simhash" -> ((c: Seq[Expression]) => {
      require(c.size == 2 && c(1).foldable, "graft_simhash(hashes, bits-literal)")
      SimhashExpr(c(0), c(1).eval().asInstanceOf[Number].intValue())
    }),
    "graft_minhash" -> ((c: Seq[Expression]) => {
      require(c.size == 2 && c(1).foldable, "graft_minhash(hashes, numHashes-literal)")
      MinhashExpr(c(0), c(1).eval().asInstanceOf[Number].intValue())
    }),
    "graft_quality_score" -> ((c: Seq[Expression]) => {
      require(c.size == 1, "graft_quality_score(text)")
      QualityScoreExpr(c(0))
    }),
    "graft_shingle_hashes" -> ((c: Seq[Expression]) => {
      require(c.size == 2 && c(1).foldable, "graft_shingle_hashes(text, n-literal)")
      ShingleHashesExpr(c(0), c(1).eval().asInstanceOf[Number].intValue())
    }),
    "graft_adc_proj" -> ((c: Seq[Expression]) => {
      require(c.size == 5 && c(2).foldable && c(3).foldable && c(4).foldable,
        "graft_adc_proj(px, fine, codebook-literal, m-literal, subDim-literal)")
      AdcProjectionExpr(c(0), c(1),
        c(2).eval().asInstanceOf[ArrayData].toFloatArray(),
        c(3).eval().asInstanceOf[Number].intValue(),
        c(4).eval().asInstanceOf[Number].intValue())
    }),
    // Spark's own runtime-filter bloom expressions (used internally by
    // InjectRuntimeFilter), surfaced as callable functions so a pipeline
    // can build the bloom ONCE over a dimension key set and prune a fact
    // scan before the join shuffle (ScaleOps q82). Both are codegen'd
    // builtins; values are pre-hashed with xxhash64 on both sides.
    "graft_bloom_agg" -> ((c: Seq[Expression]) => {
      require(c.size == 3, "graft_bloom_agg(xxhash64-value, estItems, numBits)")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        c(0), c(1), c(2))
    }),
    "graft_bloom_contains" -> ((c: Seq[Expression]) => {
      require(c.size == 2, "graft_bloom_contains(bloom-binary, xxhash64-value)")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1))
    }))

  def register(spark: SparkSession): Unit = all.foreach { case (n, b) =>
    if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)))
      spark.sessionState.functionRegistry.registerFunction(FunctionIdentifier(n), info(n), b)
  }

  private[functions] def description(name: String): ExpressionInfo = info(name)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (n, b) =>
      ext.injectFunction((FunctionIdentifier(n), GraftFunctions.description(n), b))
    }
}
