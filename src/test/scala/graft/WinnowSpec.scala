package graft

import org.apache.spark.sql.functions._

import graft.functions.WinnowExpr
import graft.operators.Winnow

/** Winnowing fingerprints: kernel vs a naive reference implementation,
  * the detection guarantee, density, insertion robustness, and the
  * overlap-pair operator. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference winnow: materialize every window, take its min by
    * (hash, pos), distinct — the O(n·w) spec the deque kernel must
    * match exactly. */
  private def naiveWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val P = 1000000007L
    val cps = text.codePoints().toArray
    val g = cps.length - k + 1
    if (g <= 0) return Seq.empty
    val packed = (0 until g).map { p =>
      var h = 7L
      (p until p + k).foreach(j => h = (h * 131L + cps(j)) % P)
      h * WinnowExpr.PosBase + p
    }
    val lastStart = math.max(g - w, 0)
    (0 to lastStart).map(j => packed.slice(j, math.min(j + w, g)).min)
      .distinct
  }

  private def kernelWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val df = Seq(text).toDF("t")
      .select(graft.functions.WinnowFingerprints(col("t"), k, w).as("fps"))
    df.collect().head.getSeq[Long](0)
  }

  test("kernel matches the naive reference across shapes and ties") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // all grams identical: max ties
      "abababababababababab", // period-2 ties
      "short", // < k
      "exactly8", // == k: one gram
      "ninechars", // k < len < k+w: single window
      "z" * 100 + "q" + "z" * 100, // one distinguishing gram mid-run
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString
    )
    for (t <- texts; (k, w) <- Seq((8, 15), (4, 4), (5, 1), (3, 50))) {
      kernelWinnow(t, k, w) shouldBe naiveWinnow(t, k, w)
    }
  }

  test("winnowing guarantee: a shared run of w+k-1 chars shares a fingerprint") {
    val k = 8; val w = 15
    val passage = "the shared passage!" + "x" * (w + k - 1) // > w+k-1 chars
    val a = "left context entirely unlike " + passage
    val b = passage + " followed by other right-side words"
    val ha = kernelWinnow(a, k, w).map(_ >>> 33).toSet
    val hb = kernelWinnow(b, k, w).map(_ >>> 33).toSet
    (ha intersect hb) should not be empty
  }

  test("density: selected count is near 2/(w+1) of grams, never above 1 per window") {
    val t = new scala.util.Random(7).alphanumeric.take(2000).mkString
    val k = 8; val w = 15
    val fps = kernelWinnow(t, k, w)
    val g = t.length - k + 1
    val windows = g - w + 1
    fps.length should be <= windows
    // random text: density concentrates near 2/(w+1) ≈ 0.125
    fps.length.toDouble / g should be > 0.05
    fps.length.toDouble / g should be < 0.25
    // positions strictly increase (winnowing selects left-to-right)
    val pos = fps.map(_ & (WinnowExpr.PosBase - 1))
    pos shouldBe pos.sorted
    pos.distinct.length shouldBe pos.length
  }

  test("head insertion preserves downstream fingerprint hashes") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val ha = kernelWinnow(base, 8, 15).map(_ >>> 33).toSet
    val hb = kernelWinnow("INSERTED PREFIX " + base, 8, 15).map(_ >>> 33).toSet
    // all-but-boundary hashes survive the shift (content-defined, not
    // offset-defined)
    (ha intersect hb).size.toDouble / ha.size should be > 0.6
  }

  test("profile counts grams, fingerprints, distinct hashes; empty-safe") {
    val fox = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((1L, fox),
      (2L, "tiny"), (3L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa")).toDF("doc_id", "text")
    val rows = Winnow.profile(docs, "text", "doc_id").orderBy("id").collect()
    rows.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
    val r1 = rows(0)
    r1.getLong(1) shouldBe (fox.length - 7).toLong // n_grams
    r1.getLong(2) shouldBe naiveWinnow(fox, 8, 15).length.toLong
    rows(1).getLong(1) shouldBe 0L // < k chars: no grams
    rows(1).getLong(2) shouldBe 0L
    rows(2).getLong(3) shouldBe 1L // uniform text: one distinct hash
  }

  test("overlapPairs finds the planted local copy with high containment") {
    val passage = "a sufficiently long copied passage that winnowing must " +
      "flag across documents because the shared run far exceeds the " +
      "guarantee threshold of twenty two characters"
    val docs = Seq(
      (1L, "intro words before " + passage),
      (2L, passage + " and a different tail after the copied span"),
      (3L, "entirely unrelated text about distributed query processing " +
        "engines and columnar storage formats at petabyte scale")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, "text", "doc_id", minShared = 2)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    p12.getDouble(3) should be > 0.5 // containment
  }

  test("overlapPairs mega-bucket cap drops boilerplate buckets") {
    // 12 docs sharing one boilerplate string: uncapped -> C(12,2)=66 pairs
    val docs = (1L to 12L).map(i =>
      (i, "identical boilerplate fingerprint content shared by every doc"))
      .toDF("doc_id", "text")
    Winnow.overlapPairs(docs, "text", "doc_id", minShared = 1)
      .count() shouldBe 66L
    Winnow.overlapPairs(docs, "text", "doc_id", minShared = 1, maxBucket = 8)
      .count() shouldBe 0L
  }

  test("overlapPairs caches the hash relation once and releases it") {
    val passage = "a sufficiently long copied passage that winnowing must " +
      "flag across documents in the cache release test"
    val docs = Seq(
      (1L, "intro words before " + passage),
      (2L, passage + " and a different tail after the copied span")
    ).toDF("doc_id", "text")
    // pre-checkpoint plan: the hash relation must be persisted (it feeds
    // counts + both self-join sides — uncached, the rolling-hash kernel
    // would re-execute 3× per query)
    val (pairs, rel) = Winnow.overlapPlan(docs, "text", "doc_id",
      k = 8, w = 15, minShared = 2, maxBucket = Int.MaxValue)
    rel.storageLevel.useMemory shouldBe true
    pairs.queryExecution.executedPlan.toString should include("InMemoryTableScan")
    rel.unpersist()

    // public entry point: cache released by the call itself; only the
    // localCheckpoint of the pair-scale result may linger
    val sc = docs.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Winnow.overlapPairs(docs, "text", "doc_id", minShared = 2)
    out.count() should be > 0L
    (sc.getPersistentRDDs.keySet -- before).size should be <= 1
  }
}
