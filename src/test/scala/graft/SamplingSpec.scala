package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** Deterministic-sampling + repetition-signal semantics: the round-7
  * ADVICE edge cases (raw vs normalized key hashing, null keys, fraction
  * extremes, reserved column names, duplicate/null id spines). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("keyHash: keys differing only in case/whitespace hash independently") {
    val r = Seq(("A b", "a  B"), ("Hello", "hello"), ("x y", "x  y"))
      .toDF("k1", "k2")
      .select(Sampling.keyHash(col("k1")).as("h1"), Sampling.keyHash(col("k2")).as("h2"))
      .collect()
    r.foreach { row => row.getLong(0) should not be row.getLong(1) }
  }

  test("keyHash: null key hashes like the empty string, not null") {
    val r = Seq[(Option[String], String)]((None, ""), (Some(""), ""))
      .toDF("k", "pad")
      .select(Sampling.keyHash(col("k")).as("h")).collect()
    // finalized seed: 7 * 2654435761 mod 1e9+7
    r.foreach(_.getLong(0) shouldBe (7L * 2654435761L) % 1000000007L)
  }

  test("keyHash matches the portable formula (manual replay)") {
    // raw = ((7*131 + 'A')*131 + ' ')*131 + 'b' mod p; final = raw * 2654435761 mod p
    val raw = (((7L * 131 + 'A') * 131 + ' ') * 131 + 'b') % 1000000007L
    val expect = (raw * 2654435761L) % 1000000007L
    val h = Seq("A b").toDF("k").select(Sampling.keyHash(col("k"))).head().getLong(0)
    h shouldBe expect
  }

  test("keyHash2/keyHash62: independent portable pair, packed ordering and replay") {
    // keyHash2 manual replay: raw2 = ((11*137 + 'A')*137 + ' ')*137 + 'b'
    // mod 998244353; final = raw2 * 3266489917 mod 998244353
    val raw2 = (((11L * 137 + 'A') * 137 + ' ') * 137 + 'b') % 998244353L
    val expect2 = (raw2 * 3266489917L) % 998244353L
    val row = Seq("A b").toDF("k")
      .select(Sampling.keyHash(col("k")).as("h1"),
        Sampling.keyHash2(col("k")).as("h2"),
        Sampling.keyHash62(col("k")).as("h62")).head()
    row.getLong(1) shouldBe expect2
    // the packed id IS h1·2³¹ + h2 — bijective in the pair, 64-bit safe
    row.getLong(2) shouldBe row.getLong(0) * 2147483648L + row.getLong(1)
    row.getLong(2) should be < (1L << 61)
    // independence smoke: trailing-neighbor keys whose keyHash residues
    // run consecutively must not correlate between the two hashes
    val hs = (1 to 200).map(i => s"doc $i").toDF("k")
      .select(Sampling.keyHash(col("k")).as("h1"),
        Sampling.keyHash2(col("k")).as("h2"))
      .as[(Long, Long)].collect()
    hs.map(_._1).distinct.length shouldBe 200
    hs.map(_._2).distinct.length shouldBe 200
    // parity of (h1 mod 2, h2 mod 2) spreads over all four cells
    hs.map { case (a, b) => (a % 2, b % 2) }.distinct.length shouldBe 4
    // null key: both hashes collapse to their finalized seeds
    val n = Seq[Option[String]](None).toDF("k")
      .select(Sampling.keyHash2(col("k"))).head().getLong(0)
    n shouldBe (11L * 3266489917L) % 998244353L
  }

  test("keyHash decorrelates trailing-character neighbors (sampling uniformity)") {
    // raw rolling hashes of "doc 201".."doc 300" come in runs of
    // consecutive values; the avalanche step must break that up
    val df = (201 to 300).map(i => s"doc $i").toDF("k")
    val kept = Sampling.bernoulliSample(df, "k", 0.3).count()
    kept.toDouble should (be > 10.0 and be < 60.0)
  }

  test("bernoulliSample: fraction 0 keeps nothing, fraction 1 keeps everything; null keys kept together") {
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    Sampling.bernoulliSample(df, "k", 0.0).count() shouldBe 0L
    Sampling.bernoulliSample(df, "k", 1.0).count() shouldBe 4L
    // null keys share hash 7 -> all-or-nothing at any cut
    val nullKept = Sampling.bernoulliSample(df, "k", 0.5)
      .filter(col("k").isNull).count()
    nullKept should (be(0L) or be(2L))
    // (7*2654435761 mod p) % 10000 = 201 < 5000 -> nulls land in the keep half
    nullKept shouldBe 2L
  }

  test("bernoulliSample is deterministic and key-stable under corpus growth") {
    val small = (1 to 50).map(i => s"doc $i").toDF("k")
    val big = (1 to 200).map(i => s"doc $i").toDF("k")
    val keptSmall = Sampling.bernoulliSample(small, "k", 0.3).as[String].collect().toSet
    val keptBig = Sampling.bernoulliSample(big, "k", 0.3).as[String].collect().toSet
    // previously selected rows stay selected when data grows
    keptSmall.foreach(k => keptBig should contain(k))
    keptSmall shouldBe Sampling.bernoulliSample(small, "k", 0.3).as[String].collect().toSet
  }

  test("deterministicShuffle: reproducible permutation, seed-sensitive, growth-stable keys") {
    val df = (1L to 100L).toDF("id")
    val order = Sampling.deterministicShuffle(df, "id", 42)
      .select("id").as[Long].collect().toSeq
    order.toSet shouldBe (1L to 100L).toSet // a permutation, nothing lost
    order should not be (1L to 100L)        // ...and not ingest order
    // reproducible across runs; different seed -> different order
    Sampling.deterministicShuffle(df, "id", 42)
      .select("id").as[Long].collect().toSeq shouldBe order
    Sampling.deterministicShuffle(df, "id", 7)
      .select("id").as[Long].collect().toSeq should not be order
    // per-row keys are growth-stable: the same id keeps its key when
    // the corpus doubles (appends interleave, existing rows don't move)
    val k100 = Sampling.deterministicShuffle(df, "id", 42)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k200 = Sampling.deterministicShuffle((1L to 200L).toDF("id"), "id", 42)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    k100.foreach { case (id, k) => k200(id) shouldBe k }
  }

  test("weightedMix: per-domain rates; full/zero weights are exact; default applies") {
    val df = (1 to 300).map(i =>
      (s"doc $i", if (i <= 100) "web" else if (i <= 200) "books" else "code"))
      .toDF("k", "dom")
    val kept = Sampling.weightedMix(df, "dom", "k",
      Map("web" -> 0.0, "books" -> 1.0), defaultWeight = 0.3)
    val byDom = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    byDom.get("web") shouldBe None        // weight 0: nothing
    byDom("books") shouldBe 100L          // weight 1: everything
    byDom("code") should (be > 10L and be < 60L) // ~30 of 100 at 0.3
    // subset property: weightedMix at rate w on a domain == bernoulliSample(w)
    val bern = Sampling.bernoulliSample(df.filter(col("dom") === "code"), "k", 0.3)
      .select("k").as[String].collect().toSet
    kept.filter(col("dom") === "code").select("k").as[String].collect().toSet shouldBe bern
  }

  test("exactSample: exact n, deterministic, order-insensitive, TakeOrdered plan") {
    val df = (1L to 500L).toDF("id")
    val a = Sampling.exactSample(df, "id", 50).as[Long].collect().toSet
    a.size shouldBe 50
    // same selection regardless of input order
    val b = Sampling.exactSample(df.orderBy(col("id").desc), "id", 50)
      .as[Long].collect().toSet
    b shouldBe a
    // plans as per-partition top-n, not a global sort
    Sampling.exactSample(df, "id", 50).queryExecution.executedPlan.toString should
      include("TakeOrderedAndProject")
  }

  test("stratifiedSample: exact ceil(fraction*n) per stratum, single-row strata keep 1") {
    val df = (1 to 100).map(i => (if (i <= 90) "big" else if (i <= 99) "mid" else "solo", i))
      .toDF("strat", "key")
    val out = Sampling.stratifiedSample(df, "strat", "key", 0.2)
      .groupBy("strat").count().as[(String, Long)].collect().toMap
    out("big") shouldBe 18L  // ceil(0.2*90)
    out("mid") shouldBe 2L   // ceil(0.2*9)
    out("solo") shouldBe 1L  // ceil(0.2*1)
  }

  test("stratifiedSample: user columns named rn/quota survive intact") {
    val df = (1 to 20).map(i => ("s", i, s"rn$i", i * 10)).toDF("strat", "key", "rn", "quota")
    val out = Sampling.stratifiedSample(df, "strat", "key", 0.5)
    out.columns.toSeq shouldBe Seq("strat", "key", "rn", "quota")
    out.count() shouldBe 10L
    // values untouched: rn column still matches its key row
    out.select("key", "rn", "quota").as[(Int, String, Int)].collect().foreach {
      case (k, rn, q) => rn shouldBe s"rn$k"; q shouldBe k * 10
    }
  }

  test("chunkAssignments: contiguous offsets per shard, spans cross budget boundaries") {
    import graft.operators.Packing
    val df = Seq((1L, 100L), (2L, 500L), (3L, 30L), (4L, 0L), (5L, 1200L))
      .toDF("id", "tok")
    val out = Packing.chunkAssignments(df, "id", "tok", budget = 512L, nShards = 1)
      .orderBy("id").collect()
    // single shard: offsets are the running concatenation in id order
    val expected = Seq(
      // (start, first_chunk, n_chunks)
      (0L, 0L, 1L),     // 1: [0, 100)        -> chunk 0
      (100L, 0L, 2L),   // 2: [100, 600)      -> chunks 0-1
      (600L, 1L, 1L),   // 3: [600, 630)      -> chunk 1
      (630L, 1L, 0L),   // 4: empty doc, no chunk
      (630L, 1L, 3L))   // 5: [630, 1830)     -> chunks 1-3
    out.map(r => (r.getAs[Long]("start_off"), r.getAs[Long]("first_chunk"),
      r.getAs[Long]("n_chunks"))).toSeq shouldBe expected
  }

  test("weightedBernoulli: per-row keep probability, clamped, null drops") {
    val df = (1 to 400).map(i => (i, s"k$i",
      if (i % 4 == 0) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(i / 400.0))).toDF("id", "key", "w")
    // weight 1 keeps everything with a non-null weight >= 1; weight 0 / null keep nothing
    Sampling.weightedBernoulli(df, "key", lit(1.0)).count() shouldBe 400
    Sampling.weightedBernoulli(df, "key", lit(0.0)).count() shouldBe 0
    Sampling.weightedBernoulli(df, "key", col("w") * 0.0).count() shouldBe 0
    Sampling.weightedBernoulli(df, "key", lit(5.0)).count() shouldBe 400 // clamped to 1
    // null weights opt out even when others keep
    val kept = Sampling.weightedBernoulli(df, "key", col("w"))
      .select("id").as[Int].collect()
    kept.foreach(_ % 4 should not be 0)
    // a constant weight equals the plain Bernoulli sample
    Sampling.weightedBernoulli(df, "key", lit(0.3)).select("id").as[Int].collect().toSet shouldBe
      Sampling.bernoulliSample(df, "key", 0.3).select("id").as[Int].collect().toSet
  }

  test("chunkRows: per-doc chunk rows reconcile with assignments; interior chunks are full") {
    import graft.operators.Packing
    val df = Seq((1L, 100L), (2L, 500L), (3L, 30L), (4L, 0L), (5L, 1200L))
      .toDF("id", "tok")
    val rows = Packing.chunkRows(df, "id", "tok", budget = 512L, nShards = 1)
    val asg = Packing.chunkAssignments(df, "id", "tok", budget = 512L, nShards = 1)
    // zero-token docs emit nothing; per-doc row count equals n_chunks
    val perDoc = rows.groupBy("id")
      .agg(count(lit(1)).as("n"), sum("tok_in_chunk").as("toks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    perDoc.get(4L) shouldBe None
    val byId = asg.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("n_chunks")).toMap
    perDoc.foreach { case (id, (n, _)) => n shouldBe byId(id) }
    // per-doc token share sums back to the doc's token count
    perDoc(1L)._2 shouldBe 100L
    perDoc(2L)._2 shouldBe 500L
    perDoc(5L)._2 shouldBe 1200L
    // every interior chunk of the shard stream is exactly full
    val byChunk = rows.groupBy("shard", "chunk_idx")
      .agg(sum("tok_in_chunk").as("toks"))
      .orderBy("chunk_idx").collect()
      .map(r => r.getAs[Long]("chunk_idx") -> r.getAs[Long]("toks"))
    // total stream = 1830 tokens -> chunks 0..2 full (512), chunk 3 partial
    byChunk.toSeq shouldBe Seq((0L, 512L), (1L, 512L), (2L, 512L), (3L, 294L))
  }

  test("chunkAssignments: duplicate ids get disjoint consecutive offsets (ROWS frame)") {
    import graft.operators.Packing
    // three rows share id=7 in one shard; the default RANGE frame would
    // hand all three the same cumulative end offset (overlapping starts)
    val df = Seq((7L, 10L), (7L, 20L), (7L, 10L), (9L, 5L)).toDF("id", "tok")
    val out = Packing.chunkAssignments(df, "id", "tok", budget = 16L, nShards = 1)
      .orderBy("start_off").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("start_off"), r.getAs[Long]("n_chunks")))
    // ordered by (id, tok): 10, 10, 20, then id=9's 5 — each slot disjoint
    out.toSeq shouldBe Seq((7L, 0L, 1L), (7L, 10L, 2L), (7L, 20L, 2L), (9L, 40L, 1L))
  }

  test("chunkAssignments: shards partition the stream; per-shard totals add up") {
    import graft.operators.Packing
    val df = (1L to 200L).map(i => (i, i % 7)).toDF("id", "tok")
    val out = Packing.chunkAssignments(df, "id", "tok", budget = 64L, nShards = 4)
    out.count() shouldBe 200
    out.select("shard").distinct().count() shouldBe 4
    // within every shard the max end offset equals the shard's token sum
    val sums = out.groupBy("shard")
      .agg(max(col("start_off")).as("m"), count(lit(1)).as("n")).collect()
    sums.foreach(_.getAs[Long]("n") should be > 0L)
  }

  test("stratifiedSampleBy: per-stratum quotas; zero drops, default applies") {
    val df = (1 to 300).map(i =>
      (i, if (i <= 100) "web" else if (i <= 200) "books" else "code"))
      .toDF("key", "dom")
    val out = Sampling.stratifiedSampleBy(df, "dom", "key",
        Map("web" -> 0.25, "books" -> 0.0), defaultFraction = 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    out("web") shouldBe 25L      // ceil(0.25*100)
    out.get("books") shouldBe None // fraction 0: stratum dropped
    out("code") shouldBe 50L     // default 0.5
    // uniform map equals plain stratifiedSample
    val a = Sampling.stratifiedSampleBy(df, "dom", "key", Map.empty, 0.2)
      .select("key").as[Int].collect().toSet
    val b = Sampling.stratifiedSample(df, "dom", "key", 0.2)
      .select("key").as[Int].collect().toSet
    a shouldBe b
  }

  test("repetitionSignals: one row per distinct id; duplicate-id rows merge") {
    val df = Seq((1L, "a b c"), (1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id")
    out.count() shouldBe 2L
    // id 1 merged: tokens a b c a b c -> 6 tokens, 3 distinct, dup frac 0.5
    val r1 = out.filter(col("id") === 1L).head()
    r1.getAs[Long]("token_cnt") shouldBe 6L
    r1.getAs[Double]("dup_token_frac") shouldBe 0.5 +- Epsilon
  }

  test("repetitionSignals: null id keeps its real stats (null-safe join)") {
    val df = Seq((Some(1L), "a a a a"), (None, "b b b b")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id")
    out.count() shouldBe 2L
    val rNull = out.filter(col("id").isNull).head()
    rNull.getAs[Long]("token_cnt") shouldBe 4L
    rNull.getAs[Double]("dup_token_frac") shouldBe 0.75 +- Epsilon
    rNull.getAs[Double]("top_token_frac") shouldBe 1.0 +- Epsilon
  }

  test("repetitionSignalsPerRow equals the aggregation form on unique-id input") {
    val df = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "a a a a a a"),
      (3L, "every token here is fully distinct right now"),
      (4L, ""), (5L, "   "), (6L, "solo"), (7L, null))
      .toDF("doc_id", "text")
    val agg = TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .orderBy("id").collect().map(_.toSeq)
    val perRow = TextAnalysis.repetitionSignalsPerRow(df, "text", "doc_id")
      .orderBy("id").collect().map(_.toSeq)
    perRow shouldBe agg
  }

  test("repetitionSignalsPerRow passes duplicate ids through unmerged") {
    val df = Seq((1L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    TextAnalysis.repetitionSignalsPerRow(df, "text", "doc_id").count() shouldBe 2L
  }

  test("repetitionSignals: null/empty/single-token edge docs") {
    val df = Seq((1L, null), (2L, ""), (3L, "   "), (4L, "solo"), (5L, "x y x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .orderBy("id").collect()
    out.length shouldBe 5
    // null, empty, whitespace-only: token_cnt 0, all fractions 0
    out.take(3).foreach { r =>
      r.getAs[Long]("token_cnt") shouldBe 0L
      r.getAs[Double]("dup_token_frac") shouldBe 0.0
      r.getAs[Double]("top_token_frac") shouldBe 0.0
      r.getAs[Double]("dup_bigram_frac") shouldBe 0.0
    }
    // single token: 1 token, no dup, top frac 1, bigram frac 0
    out(3).getAs[Long]("token_cnt") shouldBe 1L
    out(3).getAs[Double]("top_token_frac") shouldBe 1.0 +- Epsilon
    out(3).getAs[Double]("dup_bigram_frac") shouldBe 0.0
    // dup-heavy: x y x y -> 4 tokens 2 distinct; bigrams (x y, y x, x y) -> dup 1/3
    out(4).getAs[Long]("token_cnt") shouldBe 4L
    out(4).getAs[Double]("dup_token_frac") shouldBe 0.5 +- Epsilon
    out(4).getAs[Double]("dup_bigram_frac") shouldBe 0.3333 +- Epsilon
  }

  test("epochMix: whole copies + hash-gated fractional copy; 0 drops; <1 = bernoulli") {
    val df = (0 until 200).map(i => (s"doc $i", if (i < 100) "a" else "b"))
      .toDF("key", "dom")
    // dom a: exactly 2 epochs -> every row exactly twice, indices 1,2
    val a2 = Sampling.epochMix(df, "dom", "key", Map("a" -> 2.0, "b" -> 0.0))
    a2.filter(col("dom") === "b").count() shouldBe 0L
    val aRows = a2.filter(col("dom") === "a")
    aRows.count() shouldBe 200L
    aRows.groupBy("key").count().filter(col("count") =!= 2).count() shouldBe 0L
    aRows.select("ap_epoch").distinct().collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    // fractional epochs < 1 equal the plain Bernoulli keep-set
    val frac = Sampling.epochMix(df, "dom", "key", Map.empty, defaultEpochs = 0.3)
      .select("key").collect().map(_.getString(0)).toSet
    val bern = Sampling.bernoulliSample(df, "key", 0.3)
      .select("key").collect().map(_.getString(0)).toSet
    frac shouldBe bern
    // 2.3 epochs: every row at least twice, extras = the 0.3 keep-set
    val mixed = Sampling.epochMix(df, "dom", "key", Map.empty, defaultEpochs = 2.3)
    val counts = mixed.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.toSet shouldBe Set(2L, 3L)
    counts.filter(_._2 == 3L).keySet shouldBe bern
  }

  test("sqrtTemperatureMix: integer factors flatten shares toward sqrt(n)") {
    // domains sized 1 / 4 / 16 -> milli-isqrt 1000 / 2000 / 4000,
    // ssum 7000, ntot 21; per-10000 factors are EXACT integers:
    //   a: 1000*21*10000/(7000*1)  = 30000 -> exactly 3 copies
    //   b: 2000*21*10000/(7000*4)  = 15000 -> 1 copy + hash-gated half
    //   c: 4000*21*10000/(7000*16) =  7500 -> hash-gated 3/4 copy
    val df = ((1 to 1).map(i => ("a", s"da$i")) ++
      (1 to 4).map(i => ("b", s"db$i")) ++
      (1 to 16).map(i => ("c", s"dc$i"))).toDF("dom", "text")
    val out = Sampling.sqrtTemperatureMix(df, "dom", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the n=1 domain repeats exactly 3x with 1-based epoch indexes
    out.filter(_._1 == "a").map(_._3).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
    // every b doc appears at least once (whole copy), at most twice
    val bCounts = out.filter(_._1 == "b").groupBy(_._2).map(_._2.length).toSet
    bCounts.subsetOf(Set(1, 2)) shouldBe true
    // c docs appear 0 or 1 times (fractional-only factor), and the
    // hash gate keeps roughly 3/4 of 16
    val cCount = out.count(_._1 == "c")
    cCount should be <= 16
    out.filter(_._1 == "c").map(_._3).toSet.subsetOf(Set(1L)) shouldBe true
    // expectation preserves corpus size: whole-copy floor alone gives
    // 3 + 4 = 7; gated extras bounded by 4 + 16
    out.length should be >= 7
    out.length should be <= 27
  }

  test("sqrtTemperatureMix refusals") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.sqrtTemperatureMix(
        Seq(("a", "t")).toDF("dom", "text").withColumn("ap_epoch", lit(1)),
        "dom", "text")
    an[IllegalArgumentException] should be thrownBy
      Sampling.sqrtTemperatureMix(
        Seq(("a", "t")).toDF("dom", "text").limit(0), "dom", "text")
  }

  test("epochMix refuses out-of-range epochs and reserved columns") {
    val df = Seq(("k", "a")).toDF("key", "dom")
    an[IllegalArgumentException] should be thrownBy
      Sampling.epochMix(df, "dom", "key", Map("a" -> -0.1))
    an[IllegalArgumentException] should be thrownBy
      Sampling.epochMix(df.withColumn("ap_epoch", lit(1)), "dom", "key", Map.empty)
  }

  test("tokenBudgetSample: priority order, budget-crossing doc admitted, overrides") {
    val df = Seq(
      ("a", 1L, 100L, 3.0), ("a", 2L, 100L, 2.0), ("a", 3L, 100L, 1.0),
      ("b", 4L, 50L, 9.0),
      ("c", 5L, 10L, 1.0), ("c", 6L, 10L, 2.0)
    ).toDF("dom", "id", "tok", "prio")
    // dom a, budget 150: prio order 1,2,3 → doc 1 (cum_before 0 < 150)
    // admitted, doc 2 (cum_before 100 < 150) admitted CROSSING the
    // budget, doc 3 (cum_before 200) dropped
    val out = Sampling.tokenBudgetSample(df, "dom", "id", col("tok"),
        budgets = Map("b" -> 0L, "c" -> 10L), defaultBudget = 150L,
        priority = Some(col("prio")))
      .select("id").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L, 6L) // b dropped; c admits only top-prio doc 6
  }

  test("tokenBudgetSample: no priority → id order; huge doc still admits first") {
    val df = Seq(("a", 1L, 1000L), ("a", 2L, 5L)).toDF("dom", "id", "tok")
    val out = Sampling.tokenBudgetSample(df, "dom", "id", col("tok"),
        Map.empty, defaultBudget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    // doc 1 (1000 tokens > budget) is still admitted — first in order,
    // cum_before = 0; doc 2 then sits past the exhausted budget
    out shouldBe Set(1L)
  }

  test("tokenBudgetSample: user columns survive and negative budgets refused") {
    val df = Seq(("a", 1L, 5L, "keep")).toDF("dom", "id", "tok", "extra")
    val row = Sampling.tokenBudgetSample(df, "dom", "id", col("tok"),
      Map.empty, 10L).head()
    row.schema.fieldNames.toSet shouldBe Set("dom", "id", "tok", "extra")
    an[IllegalArgumentException] should be thrownBy
      Sampling.tokenBudgetSample(df, "dom", "id", col("tok"), Map.empty, -1L)
  }

  test("tokenBudgetSample: NULL token count fails loudly, never silently drops") {
    val df = Seq(("a", 1L, Some(5L)), ("a", 2L, Option.empty[Long]))
      .toDF("dom", "id", "tok")
    val ex = intercept[Exception] {
      Sampling.tokenBudgetSample(df, "dom", "id", col("tok"), Map.empty, 100L)
        .collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    msgs should include("tokenBudgetSample")
    msgs should include("id=2")
  }

  test("mixture factor tables scale to 10^5 domains (broadcast, not literals)") {
    // one row per domain: the factor/budget tables are 10^5 rows —
    // a when-literal plan would not even analyze at this width; the
    // broadcast-join formulation must run (and stay exact)
    val n = 100000
    val df = spark.range(n).selectExpr("concat('d', id) AS dom", "id AS key",
      "10 AS tok")
    // uniform counts → every temperature factor is exactly 1.0 epoch
    val mix = Sampling.sqrtTemperatureMix(df, "dom", "key")
    mix.count() shouldBe n.toLong
    mix.agg(max("ap_epoch"), min("ap_epoch")).head() shouldBe Row(1L, 1L)
    // 10^5-entry budget map: even domains budget 0 (dropped), odd keep
    val budgets = (0 until n)
      .map(i => s"d$i" -> (if (i % 2 == 0) 0L else 100L)).toMap
    Sampling.tokenBudgetSample(df, "dom", "key", col("tok"), budgets, 100L)
      .count() shouldBe (n / 2).toLong
    // 10^5-entry epoch map: every row doubled
    val epochs = (0 until n).map(i => s"d$i" -> 2.0).toMap
    Sampling.epochMix(df, "dom", "key", epochs).count() shouldBe 2L * n
  }

  test("splitAssign: every row labeled, proportions near fractions") {
    val df = (1 to 2000).map(i => s"doc $i").toDF("k")
    val out = Sampling.splitAssign(df, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 2000L
    counts("train").toDouble should (be > 1500.0 and be < 1750.0)
    counts("val").toDouble should (be > 120.0 and be < 280.0)
    counts("test").toDouble should (be > 120.0 and be < 280.0)
  }

  test("splitAssign: key-stable — appending rows never moves existing rows") {
    val small = (1 to 200).map(i => s"doc $i").toDF("k")
    val big = (1 to 400).map(i => s"doc $i").toDF("k")
    val fr = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Sampling.splitAssign(small, "k", fr)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Sampling.splitAssign(big, "k", fr)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 200).foreach(i => b(s"doc $i") shouldBe a(s"doc $i"))
  }

  test("epochMix/sqrtTemperatureMix: caller __graft_* columns survive intact") {
    // a frame already carrying the operators' old hardcoded working
    // names must round-trip unchanged (fresh() skips taken names)
    val df = Seq(("web", 1L, "s1"), ("web", 2L, "s2"), ("books", 3L, "s3"))
      .toDF("domain", "id", "__graft_epochs_0")
      .withColumn("__graft_mix_dom_0", col("__graft_epochs_0"))
    val em = Sampling.epochMix(df, "domain", "id", Map("web" -> 2.0))
    em.columns should contain allOf ("__graft_epochs_0", "__graft_mix_dom_0")
    em.filter($"id" === 1L).select("__graft_epochs_0").head().getString(0) shouldBe "s1"
    em.filter($"id" === 1L).count() shouldBe 2L // epochs honored, not the sentinel
    val tm = Sampling.sqrtTemperatureMix(df, "domain", "id")
    tm.columns should contain allOf ("__graft_epochs_0", "__graft_mix_dom_0")
    tm.filter($"id" === 3L).select("__graft_mix_dom_0").head().getString(0) shouldBe "s3"
  }

  test("splitAssign: rows sharing a key share a split; bad fractions rejected") {
    val df = Seq(("k1", 1), ("k1", 2), ("k2", 3), ("k2", 4)).toDF("k", "v")
    val out = Sampling.splitAssign(df, "k", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(0), r.getString(2))).distinct
    out.groupBy(_._1).values.foreach(_.size shouldBe 1)
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitAssign(df, "k", Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitAssign(df, "k", Seq("a" -> 0.5, "a" -> 0.5))
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitAssign(df, "k", Seq.empty)
  }
}
