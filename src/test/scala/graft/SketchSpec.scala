package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, KmvDistinct}
import graft.operators.Sampling

/** The mergeable sketches: KMV distinct-count (exact below k, estimator
  * at k, partitioning-invariant) and Misra–Gries heavy hitters (exact
  * at capacity, guaranteed bounds below it). */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def kmvOf(df: org.apache.spark.sql.DataFrame, keyCol: String,
                    k: Int): Double =
    df.agg(KmvDistinct.kmv(Sampling.keyHash(col(keyCol)), k).as("est"))
      .head().getDouble(0)

  test("kmv: exact count while fewer than k distinct keys") {
    // 100 distinct keys, each seen 5 times — duplicates must not count
    val df = (0 until 500).map(i => s"key${i % 100}").toDF("k").repartition(7)
    kmvOf(df, "k", 256) shouldBe 100.0
  }

  test("kmv: estimator matches the (k-1)*range/kthMin replay and is calibrated") {
    val n = 5000
    val df = (0 until n).map(i => s"user$i").toDF("k").repartition(13)
    val k = 64
    // independent replay: k-th smallest distinct hash, same arithmetic
    val kth = df.select(Sampling.keyHash(col("k")).as("h")).distinct()
      .orderBy("h").limit(k).orderBy(col("h").desc).head().getLong(0)
    val expected = (k - 1).toDouble * KmvDistinct.KeyHashRange / kth.toDouble
    val est = kmvOf(df, "k", k)
    est shouldBe expected
    // KMV relative error concentrates around 1/sqrt(k-2) ≈ 12.7%
    math.abs(est - n) / n should be < 0.5
  }

  test("kmv: merge is partitioning-invariant") {
    val rows = (0 until 3000).map(i => s"id${i % 700}")
    val one = kmvOf(rows.toDF("k").coalesce(1), "k", 32)
    val many = kmvOf(rows.toDF("k").repartition(17), "k", 32)
    one shouldBe many
  }

  test("kmv: null keys hash as the empty key (kept or dropped together)") {
    // keyHash maps NULL and "" to the same bucket — the sketch sees ONE
    // distinct hash for them, matching the sampling layer's convention
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    kmvOf(df, "k", 16) shouldBe 3.0
  }

  test("heavy hitters: exact group-by counts when capacity covers the keys") {
    val rows = (0 until 2000).map(i => s"tok${i % 23}")
    val out = rows.toDF("k").repartition(9)
      .agg(HeavyHitters.hitters(col("k"), 64).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 23
    out.foreach { case (_, c, err) =>
      err shouldBe 0L
      c should (be(86L) or be(87L)) // 2000/23 rounds to 86 or 87 per key
    }
    out.map(_._2).sum shouldBe 2000L
  }

  test("heavy hitters: Misra–Gries bounds hold below capacity") {
    // one dominant key (40%) over a long tail of 400 distinct keys
    val rows = (0 until 4000).map(i =>
      if (i % 5 < 2) "dominant" else s"tail${i % 400}")
    val n = rows.size.toLong
    val m = 20
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = rows.toDF("k").repartition(11)
      .agg(HeavyHitters.hitters(col("k"), m).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.length should be <= m
    // any key with true frequency > N/(m+1) is guaranteed to survive
    out.map(_._1) should contain("dominant")
    out.foreach { case (key, est, err) =>
      est should be <= truth(key)          // counter is a lower bound
      (est + err) should be >= truth(key)  // offset restores an upper bound
      err should be <= n / (m + 1)         // decrement depth bound
    }
  }

  test("property: KMV buffer merge is order-insensitive and ≡ bulk build") {
    // pure-buffer property (no Spark): any grouping/ordering of the
    // same hash multiset must produce the same k-min set — this is
    // exactly what makes the aggregate's partial/merge path safe
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { trial =>
      val hashes = Seq.fill(200 + rnd.nextInt(300))(rnd.nextInt(5000).toLong)
      val k = 1 + rnd.nextInt(40) + 1
      val bulk = new graft.functions.KmvBuffer(k)
      hashes.foreach(bulk.add)
      val nChunks = 1 + rnd.nextInt(6)
      val merged = rnd.shuffle(hashes).grouped(
          math.max(1, hashes.size / nChunks)).map { chunk =>
        val b = new graft.functions.KmvBuffer(k)
        chunk.foreach(b.add)
        b
      }.reduce((a, b) => a.mergeFrom(b))
      withClue(s"trial $trial (k=$k): ") {
        merged.mins shouldBe bulk.mins
        merged.estimate(5000.0) shouldBe bulk.estimate(5000.0)
      }
    }
  }

  test("MG buffer: m-bound holds on a SINGLE unmerged buffer (add-path decrements)") {
    // regression: with a primitive-Long value map, get() unboxes the
    // null miss to 0L and add() inserts every unseen key — state grew
    // to O(distinct) per partition and only merge-time reduction hid it
    val b = new graft.functions.MGBuffer(8)
    (0 until 500).foreach(i => b.add(s"k${i % 100}")) // 100 distinct ≫ m=8
    b.counts.size should be <= 8
    b.err should be > 0L // the classic MG decrement step actually ran
    b.err should be <= 500L / 9
  }

  test("property: MG bounds hold for arbitrary streams, splits, and capacities") {
    val rnd = new scala.util.Random(11)
    (1 to 25).foreach { trial =>
      // zipf-ish keys so some are heavy
      val n = 300 + rnd.nextInt(700)
      val keys = Seq.fill(n)(s"k${(math.pow(rnd.nextDouble(), 2.5) * 60).toInt}")
      val m = 1 + rnd.nextInt(12)
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random split into buffers, random merge order — the guarantee
      // must survive ANY partitioning the cluster could produce
      val bufs = rnd.shuffle(keys).grouped(math.max(1, n / (1 + rnd.nextInt(8))))
        .map { chunk =>
          val b = new graft.functions.MGBuffer(m)
          chunk.foreach(b.add)
          b
        }.toList
      val merged = rnd.shuffle(bufs).reduce((a, b) => a.mergeFrom(b))
      withClue(s"trial $trial (m=$m, n=$n): ") {
        merged.counts.size should be <= m
        merged.err should be <= n.toLong / (m + 1)
        merged.sorted.foreach { case (key, est) =>
          est should be <= truth(key)
          (est + merged.err) should be >= truth(key)
        }
        // every guaranteed-frequent key (freq > N/(m+1)) must survive
        truth.filter(_._2 > n.toLong / (m + 1)).keys.foreach { hot =>
          withClue(s"lost hot key $hot: ") {
            merged.counts.containsKey(hot) shouldBe true
          }
        }
      }
    }
  }

  test("theta sketch: exact set algebra below k, calibrated estimates above") {
    import graft.functions.{KmvMins, ThetaSketch}
    def minsOf(keys: Seq[String], k: Int): Array[Long] =
      keys.toDF("k").repartition(5)
        .agg(KmvMins.mins(Sampling.keyHash(col("k")), k).as("m"))
        .head().getSeq[Long](0).toArray

    // exact path: both sides under k — union/intersection are exact
    val a = (0 until 30).map(i => s"u$i")
    val b = (20 until 50).map(i => s"u$i") // overlap = 10, union = 50
    val (eu, ei) = ThetaSketch.unionIntersect(
      minsOf(a, 64), minsOf(b, 64), 64, graft.functions.KmvDistinct.KeyHashRange)
    eu shouldBe 50.0
    ei shouldBe 10.0

    // estimator path: 2000-user sides, 500 shared — estimates within
    // the sketch's expected error band, deterministic across runs
    val big1 = (0 until 2000).map(i => s"x$i")
    val big2 = (1500 until 3500).map(i => s"x$i") // ∩=500, ∪=3500
    val k = 128
    val (eu2, ei2) = ThetaSketch.unionIntersect(
      minsOf(big1, k), minsOf(big2, k), k, graft.functions.KmvDistinct.KeyHashRange)
    math.abs(eu2 - 3500) / 3500.0 should be < 0.35
    math.abs(ei2 - 500) / 500.0 should be < 0.6 // J/k has higher variance
    // determinism: same inputs, same estimates
    ThetaSketch.unionIntersect(minsOf(big1, k), minsOf(big2, k), k,
      graft.functions.KmvDistinct.KeyHashRange) shouldBe ((eu2, ei2))
  }

  test("audienceOverlap: sketch-only mode skips the exact pair join entirely") {
    val ev = Seq(
      ("click", "u1"), ("click", "u2"), ("click", "u3"),
      ("view", "u2"), ("view", "u3"), ("view", "u4"),
      ("buy", "u3")).toDF("t", "u")
    // exact mode: calibration column present and correct
    val withExact = graft.operators.Sketches
      .audienceOverlap(ev, "t", "u", k = 64, exact = true)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    withExact(("click", "view")) shouldBe 2L
    withExact(("buy", "click")) shouldBe 1L
    // library default: no n_exact column, and the PLAN carries no join
    // at all — below k both estimates are exact, so the sketch column
    // alone is the product at scale
    val sketchOnly = graft.operators.Sketches.audienceOverlap(ev, "t", "u", k = 64)
    sketchOnly.columns.toSeq shouldBe
      Seq("type_a", "type_b", "est_union", "est_intersect")
    sketchOnly.queryExecution.executedPlan.toString should not include "Join"
    val est = sketchOnly.collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    est(("click", "view")) shouldBe ((4.0, 2.0)) // |∪|=4, |∩|=2, exact below k
    // a NUMERIC group column works too (normalized to string, not a
    // ClassCastException at collect)
    val numeric = Seq((1, "u1"), (1, "u2"), (2, "u2"), (2, "u3"))
      .toDF("t", "u")
    val byNum = graft.operators.Sketches.audienceOverlap(numeric, "t", "u", k = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    byNum(("1", "2")) shouldBe 1.0 // u2 shared
  }

  test("sketches are callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    (0 until 300).map(i => s"k${i % 50}").toDF("k")
      .createOrReplaceTempView("sketch_in")
    val kmv = spark.sql(
      """SELECT kmv_distinct(
        |  pmod((aggregate(split(k, ''), 7L, (h, c) -> (h * 131 + ascii(c)) % 1000000007)
        |        * 2654435761), 1000000007), 128) AS est
        |FROM sketch_in""".stripMargin).head().getDouble(0)
    kmv shouldBe 50.0
    val hh = spark.sql(
      "SELECT heavy_hitters(k, 64) AS hh FROM sketch_in")
      .select(org.apache.spark.sql.functions.size(col("hh"))).head().getInt(0)
    hh shouldBe 50

    (0 until 300).map(i => (s"id$i", i.toDouble)).toDF("id", "v")
      .createOrReplaceTempView("bk_in")
    val smp = spark.sql(
      """SELECT bottomk_sample(
        |  pmod((aggregate(split(id, ''), 7L, (h, c) -> (h * 131 + ascii(c)) % 1000000007)
        |        * 2654435761), 1000000007), v, 32) AS s
        |FROM bk_in""".stripMargin)
      .select(org.apache.spark.sql.functions.size(col("s"))).head().getInt(0)
    smp shouldBe 32
  }

  // ---- bottom-k sample quantiles ----

  private def bkSample(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Double] =
    df.agg(graft.functions.BottomKSample.sample(
        Sampling.keyHash(col("id")), col("v"), k).as("s"))
      .head().getSeq[Double](0)

  test("bottom-k sample: below k the sample IS the group — quantiles exact") {
    val vs = Seq(9.0, 1.0, 5.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0)
    val df = vs.zipWithIndex.map { case (v, i) => (s"row$i", v) }
      .toDF("id", "v").repartition(5)
    bkSample(df, 64) shouldBe vs.sorted
    // type-1 median of 9 values = 5th smallest
    df.agg(graft.functions.BottomKSample.sample(
        Sampling.keyHash(col("id")), col("v"), 64).as("s"))
      .select(graft.functions.BottomKSample.quantileAt(col("s"), 0.5))
      .head().getDouble(0) shouldBe 5.0
  }

  test("bottom-k sample: membership is a pure function of the keys — partitioning-invariant") {
    val df = (0 until 2000).map(i => (s"row$i", i.toDouble)).toDF("id", "v")
    val a = bkSample(df.repartition(1), 64)
    val b = bkSample(df.repartition(17), 64)
    val c = bkSample(df.orderBy(col("v").desc).repartition(3), 64)
    a shouldBe b
    a shouldBe c
    a.length shouldBe 64
  }

  test("bottom-k sample: equal-hash collision keeps the min value, any order") {
    // same id twice → same hash; the kept value must be the smaller one
    // regardless of which arrives first
    val df = Seq(("dup", 9.0), ("dup", 2.0), ("x", 5.0)).toDF("id", "v")
    bkSample(df.repartition(3), 8) should contain theSameElementsAs Seq(2.0, 5.0)
  }

  test("bottom-k sample: rank error of the estimated median is O(1/sqrt(k))") {
    val n = 4000
    val df = (0 until n).map(i => (s"row$i", i.toDouble)).toDF("id", "v")
    val k = 64
    val s = bkSample(df.repartition(11), k)
    s.length shouldBe k
    val p50 = s(math.ceil(0.5 * k).toInt - 1)
    // v == its own rank here; 4σ bound with σ = n·sqrt(p(1-p)/k)
    val sigma = n * math.sqrt(0.25 / k)
    math.abs(p50 - 0.5 * n) should be < 4.0 * sigma
  }

  test("property: bottom-k buffer merge is order-insensitive and ≡ bulk build") {
    // narrow hash range (0..50) forces frequent collisions, exercising
    // the min-value tie rule under every split/order
    val rnd = new scala.util.Random(11)
    (1 to 25).foreach { trial =>
      val pairs = Seq.fill(50 + rnd.nextInt(200))(
        (rnd.nextInt(50).toLong, (rnd.nextInt(400) - 200) / 10.0))
      val k = 2 + rnd.nextInt(15)
      val bulk = new graft.functions.BkBuffer(k)
      pairs.foreach { case (h, v) => bulk.add(h, v) }
      val nChunks = 1 + rnd.nextInt(6)
      val merged = rnd.shuffle(pairs).grouped(
          math.max(1, pairs.size / nChunks)).map { chunk =>
        val b = new graft.functions.BkBuffer(k)
        chunk.foreach { case (h, v) => b.add(h, v) }
        b
      }.reduce((a, b) => a.mergeFrom(b))
      withClue(s"trial $trial (k=$k): ") {
        merged.m shouldBe bulk.m
      }
    }
  }
}
