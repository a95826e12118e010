package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{LopqParams, LopqTrainer}
import graft.functions.TextFunctions.md5Long
import graft.ops.{Tables, VectorQueries}

/** Embedding-curation sampling operators (q100/q101):
  * [[VectorQueries.clusterBalancedSample]] — per-cell quota in md5-hash
  * order through the verified-cutoff pre-filter — and
  * [[VectorQueries.protoPrune]] — SSL-prototypes keep-hardest pruning by
  * residual norm in the model's locally-projected space. */
class CurationSampleSpec extends SparkSpec {

  private val p = LopqParams(v = 8, m = 4, subClusters = 16, seed = 42L, kmeansMaxIter = 10)

  /** Skewed synthetic assignment: one 2000-member mega cell, a mid cell,
    * several small cells, and a singleton — the shape where an unbounded
    * per-cell window would drag the mega cell's full membership through
    * one task while the cutoff keeps it O(quota · overshoot). */
  private def skewedCells = {
    val s = spark
    import s.implicits._
    (0L until 3000L).map { id =>
      val cell = if (id < 2000) 0L
        else if (id < 2600) 1L
        else if (id == 2999) 9L
        else 2L + id % 4
      (id, cell)
    }.toDF("id", "cell_id")
  }

  test("clusterBalancedSample equals the unbounded per-cell hash window") {
    graft.functions.GraftFunctions.register(spark)
    val cells = skewedCells
    val quota = 5
    val got = VectorQueries.clusterBalancedSample(cells, quota)
      .orderBy("cell_id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = Window.partitionBy("cell_id")
      .orderBy(col("hv"), col("id"))
    val want = cells
      .withColumn("hv", md5Long(col("id").cast("string")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= quota)
      .select("cell_id", "id", "rk")
      .orderBy("cell_id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("clusterBalancedSample quota semantics: min(quota, |cell|) per cell, take-all on small cells") {
    graft.functions.GraftFunctions.register(spark)
    val cells = skewedCells
    val quota = 5
    val perCell = VectorQueries.clusterBalancedSample(cells, quota)
      .groupBy("cell_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val cnt = cells.groupBy("cell_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perCell.map(_._1).sorted == cnt.keys.toSeq.sorted) // every cell represented
    perCell.foreach { case (cell, n, maxrk) =>
      assert(n == math.min(quota.toLong, cnt(cell)), s"cell $cell")
      assert(maxrk == n, s"cell $cell ranks must be 1..n")
    }
    // the singleton cell survives the cutoff (take-all branch)
    assert(cnt(9L) == 1L && perCell.find(_._1 == 9L).get._2 == 1L)
  }

  private lazy val model =
    LopqTrainer.train(Tables(spark, sf, "embeddings"), "embedding", p)

  test("clusterTemperedSample draws max(1, floor(sqrt(cnt))) per cell in hash order") {
    graft.functions.GraftFunctions.register(spark)
    val cells = skewedCells
    val got = VectorQueries.clusterTemperedSample(cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cnt = cells.groupBy("cell_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // per-cell draw size = min(cnt, max(1, floor(sqrt(cnt))))
    val perCell = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    cnt.foreach { case (cell, n) =>
      val q = math.max(1L, math.sqrt(n.toDouble).toLong)
      assert(perCell.getOrElse(cell, 0L) == math.min(q, n), s"cell $cell")
    }
    // the draw is the PREFIX of the balanced draw's hash order: every
    // tempered pick at rank r is the balanced pick at rank r
    val balanced = VectorQueries.clusterBalancedSample(cells, 2000)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    got.foreach { case (cell, id, rk) =>
      assert(balanced((cell, rk)) == id, s"cell $cell rank $rk")
    }
  }

  test("protoPrune: keep-hardest ceil(frac·n) per cell, ranked by residual norm desc") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings")
    val keepFrac = 0.7
    val got = VectorQueries.protoPrune(e, "vec_id", "embedding", model, keepFrac)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))

    // independent expectation: score every row on the driver — residual
    // vs the assigned cell's refined mean C + mu in double — and rank
    // within cell by (round-6 distance desc, id)
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val scored = rows.map { case (id, x) =>
      val cc = model.predictCoarse(x)
      val halves = graft.core.VectorOps.splits(x, model.numCoarseSplits)
      var sq = 0.0
      Seq(cc._1, cc._2).zipWithIndex.foreach { case (ci, split) =>
        val c = model.coarse(split)(ci)
        val mu = model.mus(split)(ci)
        var d = 0.0
        var j = 0
        while (j < c.length) {
          val r = halves(split)(j).toDouble - c(j).toDouble - mu(j).toDouble
          d += r * r
          j += 1
        }
        sq += d
      }
      val dist = BigDecimal(math.sqrt(sq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cc._1.toLong * model.v + cc._2, dist)
    }
    val want = scored.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
      val ranked = members.sortBy { case (id, _, dist) => (-dist, id) }
      val keepN = math.ceil(ranked.length * keepFrac).toLong
      ranked.zipWithIndex.map { case ((id, _, dist), i) =>
        (id, cell, dist, (i + 1).toLong, (i + 1).toLong <= keepN)
      }
    }.sortBy(r => (r._2, r._4))

    assert(got.length == rows.length) // every row emitted, flagged not filtered
    assert(got.sortBy(r => (r._2, r._4)).toSeq == want)
    // the kept fraction is real: strictly between 0 and all, per multi-member cell
    val multi = got.groupBy(_._2).filter(_._2.length >= 4)
    assert(multi.nonEmpty)
    multi.foreach { case (cell, ms) =>
      val k = ms.count(_._5)
      assert(k == math.ceil(ms.length * keepFrac).toInt, s"cell $cell")
      assert(k < ms.length, s"cell $cell must prune something")
    }
  }

  test("protoPrune keep boundary: keepFrac = 1.0 keeps everything") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings").where(col("vec_id") < 100)
    val all = VectorQueries.protoPrune(e, "vec_id", "embedding", model, 1.0)
    assert(all.where(!col("keep")).isEmpty)
  }

  /** Randomized brute-force model check for the curation trio (the
    * CatalogSpec semdedup pattern): random skinny assignments for the two
    * samplers (ranked vs a driver model over the same md5 hash), and
    * HAND-BUILT random models for the prune (no training — protoPrune
    * reads only coarse/mus, so a LopqModel with placeholder rotations and
    * a minimal subquantizer block exercises the full scoring path).
    * Deterministic seed, so a rounding-boundary tie cannot flake. */
  test("curation trio matches brute-force models on random inputs") {
    graft.functions.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7777L)
    (1 to 5).foreach { trial =>
      val n = if (trial == 1) 1 else 30 + rnd.nextInt(200)
      val nCells = 1 + rnd.nextInt(12)
      val quota = 1 + rnd.nextInt(12)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(nCells).toLong))
      val cells = rows.toDF("id", "cell_id")
      val hv = rows.map { case (id, _) =>
        id -> graft.functions.TextFunctions.md5Long60(id.toString)
      }.toMap
      def drawOf(q: Long => Long) = rows.groupBy(_._2).toSeq.flatMap {
        case (c, ms) =>
          ms.sortBy(m => (hv(m._1), m._1)).take(q(ms.length.toLong).toInt)
            .zipWithIndex.map { case ((id, _), i) => (c, id, (i + 1).toLong) }
      }.toSet
      def got(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got(VectorQueries.clusterBalancedSample(cells, quota)) ===
        drawOf(_ => quota.toLong), s"balanced, trial $trial")
      assert(got(VectorQueries.clusterTemperedSample(cells)) ===
        drawOf(cnt => math.max(1L, math.sqrt(cnt.toDouble).toLong)),
        s"tempered, trial $trial")

      // protoPrune vs a driver model on a hand-built random LopqModel
      val v = 2 + rnd.nextInt(3)
      val halfDim = 2 + rnd.nextInt(4)
      val keepFrac = 0.3 + rnd.nextDouble() * 0.7
      def block() = Array.fill(v)(Array.fill(halfDim)(rnd.nextGaussian().toFloat))
      val m = graft.engine.LopqModel(
        coarse = Array(block(), block()),
        rotations = Array(Array.empty[Array[Array[Float]]],
          Array.empty[Array[Array[Float]]]), // unused by the score
        mus = Array(block(), block()),
        subquantizers = Array( // minimal well-formed block, unused too
          Array(Array(Array(0f))), Array(Array(Array(0f)))))
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(2 * halfDim)(rnd.nextGaussian().toFloat).toSeq))
      val scored = vecs.map { case (id, emb) =>
        val halves = graft.core.VectorOps.splits(emb.toArray, 2)
        var sq = 0.0
        var cell = 0L
        (0 until 2).foreach { split =>
          val ci = graft.core.VectorOps.argminL2(halves(split), m.coarse(split))
          var d = 0.0
          var j = 0
          while (j < halfDim) {
            val r = halves(split)(j).toDouble - m.coarse(split)(ci)(j).toDouble -
              m.mus(split)(ci)(j).toDouble
            d += r * r
            j += 1
          }
          sq += d
          cell = cell * v + ci
        }
        (id, cell, BigDecimal(math.sqrt(sq))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val want = scored.groupBy(_._2).toSeq.flatMap { case (cell, ms) =>
        val ranked = ms.sortBy { case (id, _, dist) => (-dist, id) }
        val keepN = math.ceil(ranked.length * keepFrac).toLong
        ranked.zipWithIndex.map { case ((id, _, dist), i) =>
          (id, cell, dist, (i + 1).toLong, (i + 1).toLong <= keepN)
        }
      }.toSet
      val gotP = VectorQueries.protoPrune(
          vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", m, keepFrac)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getBoolean(4))).toSet
      assert(gotP === want, s"protoPrune, trial $trial")
    }
  }

  test("protoPrune carries sha1-string ids through untouched") {
    // the reference keys EVERYTHING by sha1 strings (imgio/imgio.py:23-39);
    // r12's impl cast ids to long, silently nulling a string-keyed corpus
    // (ADVICE r12) — pin that string ids now ride the typed map unchanged
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings")
    val viaLong = VectorQueries.protoPrune(e, "vec_id", "embedding", model, 0.7)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val stringIds = e.select(sha1(col("vec_id").cast("string")).as("vec_id"),
      col("embedding"))
    val got = VectorQueries.protoPrune(stringIds, "vec_id", "embedding", model, 0.7)
    assert(got.schema("id").dataType ===
      org.apache.spark.sql.types.StringType, "string ids must stay strings")
    val viaString = got.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val mapping = e.select(col("vec_id"),
        sha1(col("vec_id").cast("string")).as("sid"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaString.size == viaLong.size)
    viaLong.foreach { case (id, scored) =>
      assert(viaString(mapping(id)) === scored, s"id $id")
    }
  }

  test("protoPrune fails fast on an unsupported id type") {
    val s = spark
    import s.implicits._
    val bad = Seq((1.5, Seq(0.1f, 0.2f, 0.3f, 0.4f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      VectorQueries.protoPrune(bad, "vec_id", "embedding", model, 0.7)
    }
    assert(ex.getMessage.contains("unsupported type"))
  }

  test("curateCorpus chunked-composed ≡ one-shot-composed") {
    // VERDICT r12 "What's wrong #1": the composed facade embedded the
    // one-shot sweep (a measured scratch-killer at deployment width) —
    // pin that the outDir route through the chunked pair sweep composes
    // to the identical curated manifest
    graft.functions.GraftFunctions.register(spark)
    val api = new GraftApi(spark, sf)
    val outDir = "/tmp/graft-test-curate-chunked"
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("cell_id", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val oneShot = rows(api.curateCorpus())
    val chunked = rows(api.curateCorpus(outDir = Some(outDir), nChunks = 3))
    assert(oneShot.nonEmpty && chunked == oneShot)
    if (fs.exists(p)) fs.delete(p, true)
    // the multiProbe route must also compose identically across the two
    // drivers (the dedup stage sees the top-2 assignment; downstream
    // prune + draw are unchanged)
    val mpOneShot = rows(api.curateCorpus(multiProbe = true))
    val mpChunked = rows(api.curateCorpus(outDir = Some(outDir),
      nChunks = 3, multiProbe = true))
    assert(mpOneShot.nonEmpty && mpChunked == mpOneShot)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  test("protoPruneSlim ≡ protoPrune: the slim handle scores bit-identically") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, sf, "embeddings")
    val slim = graft.engine.SlimLopqModel(
      model.coarse, model.mus, model.subquantizers)
    val full = VectorQueries.protoPrune(e, "vec_id", "embedding", model, 0.7)
      .orderBy("cell_id", "rk").collect()
    val viaSlim = VectorQueries
      .protoPruneSlim(e, "vec_id", "embedding", slim, 0.7)
      .orderBy("cell_id", "rk").collect()
    assert(full.length == viaSlim.length && full.sameElements(viaSlim))
  }
}
