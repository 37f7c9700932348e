package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Sampling, TextAnalysis}

/** Property-based cross-checks: the custom codegen kernels must agree
  * with naive Scala reference implementations on arbitrary inputs —
  * the per-row analogue of the DuckDB oracle, for the pieces a SQL
  * engine can't replay directly. Raw ScalaCheck generators with fixed
  * seeds (the scalatestplus bridge isn't in the offline cache), so every
  * run checks the same 25 generated corpora reproducibly. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val token: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap { n =>
    // small alphabet of tokens so duplicates actually occur
    Gen.listOfN(n, Gen.oneOf(Gen.const("a"), Gen.const("bb"), Gen.const("ccc"), token))
  }
  private val corpus: Gen[List[List[String]]] = Gen.listOfN(12, doc)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Naive reference for the five repetition counters. */
  private def naiveStats(toks: List[String]): (Long, Long, Long, Long, Long) = {
    val tokCounts = toks.groupBy(identity).view.mapValues(_.size)
    val bigrams = if (toks.size < 2) Nil else toks.sliding(2).map(_.mkString(" ")).toList
    val biCounts = bigrams.groupBy(identity).view.mapValues(_.size)
    (toks.size.toLong, tokCounts.size.toLong,
      if (toks.isEmpty) 0L else tokCounts.values.max.toLong,
      bigrams.size.toLong, biCounts.size.toLong)
  }

  test("RepetitionStatsExpr matches the naive counters on arbitrary token lists") {
    (1L to 25L).foreach { seed =>
      val docs = sample(corpus, seed)
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "toks")
      val got = df.select(col("id"),
          graft.functions.TextStats.repetitionStats(col("toks")).as("st"))
        .orderBy("id").collect()
        .map { r => val st = r.getStruct(1)
          (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3), st.getLong(4)) }
      withClue(s"seed $seed: ") { got.toList shouldBe docs.map(naiveStats) }
    }
  }

  test("TaggedGramsExpr emits exactly the tokens and adjacent bigrams, in order") {
    (1L to 25L).foreach { seed =>
      val docs = sample(corpus, seed + 1000)
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "toks")
      val got = df.select(col("id"),
          graft.functions.TextStats.taggedGrams(col("toks")).as("g"))
        .orderBy("id").collect()
        .map(_.getSeq[org.apache.spark.sql.Row](1)
          .map(r => (r.getInt(0), r.getString(1))).toList)
      val expected = docs.map { d =>
        // kernel order: token, then the bigram ENDING at that token
        d.zipWithIndex.flatMap { case (t, i) =>
          if (i == 0) List((0, t)) else List((0, t), (1, s"${d(i - 1)} $t"))
        }
      }
      withClue(s"seed $seed: ") { got.toList shouldBe expected }
    }
  }

  test("assignClusters matches a naive argmax-cosine assignment on random vectors") {
    val vec: Gen[List[Double]] =
      Gen.listOfN(6, Gen.chooseNum(-5, 5).map(_.toDouble))
    val body: Gen[(List[List[Double]], List[List[Double]])] = for {
      cents <- Gen.listOfN(4, vec)
      rows <- Gen.listOfN(20, vec)
    } yield (cents, rows)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na < 1e-5 || nb < 1e-5) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    (1L to 25L).foreach { seed =>
      val (cents, rows) = sample(body, seed + 3000)
      val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("id", "v")
      val got = graft.operators.Ann.assignClusters(df, "v", cents)
        .select("id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expected = rows.zipWithIndex.map { case (v, i) =>
        // naive rule: max cosine, ties to the LOWEST centroid index
        val sims = cents.map(c => cos(v.map(_.toFloat.toDouble), c))
        i.toLong -> sims.zipWithIndex.maxBy { case (s, ci) => (s, -ci) }._2
      }.toMap
      withClue(s"seed $seed: ") { got shouldBe expected }
    }
  }

  test("connectedComponents matches a driver-side union-find on random graphs") {
    val graph: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges
    (1L to 15L).foreach { seed =>
      val edges = sample(graph, seed + 6000)
      val df = edges.toDF("id_a", "id_b")
      val got = graft.operators.Dedup.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-by-min reference: each set's root converges to its min id,
      // so the expected label per node is find(node)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(x => x -> find(x)).toMap
      withClue(s"seed $seed: ") { got shouldBe expected }
    }
  }

  test("sequence packing: conservation, reconciliation, full interior chunks") {
    val corpusGen: Gen[List[Long]] =
      Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 50).map(_.toLong)))
    val (budget, nShards) = (16L, 4)
    (1L to 15L).foreach { seed =>
      val toks = sample(corpusGen, seed + 7000)
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "n_tok")
      val asg = graft.operators.Packing
        .chunkAssignments(df, "id", "n_tok", budget, nShards).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      // every document assigned exactly once; zero-token docs span 0 chunks
      asg.keySet shouldBe toks.indices.map(_.toLong).toSet
      toks.zipWithIndex.foreach { case (t, i) =>
        withClue(s"seed $seed doc $i: ") {
          if (t == 0) asg(i.toLong)._4 shouldBe 0L else asg(i.toLong)._4 should be >= 1L
        }
      }
      val rows = graft.operators.Packing
        .chunkRows(df, "id", "n_tok", budget, nShards).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // conservation: each doc's per-chunk tokens sum back to its count
      val byDoc = rows.groupBy(_._1)
      toks.zipWithIndex.filter(_._1 > 0).foreach { case (t, i) =>
        val mine = byDoc.getOrElse(i.toLong, Array.empty)
        withClue(s"seed $seed doc $i: ") {
          mine.map(_._4).sum shouldBe t
          // reconciliation with the assignment form
          mine.length.toLong shouldBe asg(i.toLong)._4
          mine.map(_._3).min shouldBe asg(i.toLong)._3
          all(mine.map(_._4)) should (be >= 1L and be <= budget)
        }
      }
      // every interior chunk of every shard is packed to EXACTLY budget
      rows.groupBy(r => (r._2, r._3)).foreach { case ((shard, chunk), hits) =>
        val lastChunk = rows.filter(_._2 == shard).map(_._3).max
        if (chunk < lastChunk)
          withClue(s"seed $seed shard $shard chunk $chunk: ") {
            hits.map(_._4).sum shouldBe budget
          }
      }
    }
  }

  test("repeatedChunks matches a naive sliding-window count on random corpora") {
    (1L to 25L).foreach { seed =>
      val docs = sample(corpus, seed + 4000)
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d.mkString(" ")) }
        .toDF("doc_id", "text")
      val (w, s) = (5, 2)
      val got = graft.operators.Dedup.repeatedChunks(df, "doc_id", "text", w, s)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val windows = docs.zipWithIndex.flatMap { case (d, i) =>
        if (d.size < w) Nil
        else (0 to (d.size - w) by s).map(st =>
          (i.toLong, d.slice(st, st + w).mkString(" ")))
      }
      val expected = windows.groupBy(_._2).collect {
        case (chunk, hits) if hits.map(_._1).distinct.size >= 2 =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
          md -> ((hits.map(_._1).distinct.size.toLong, hits.size.toLong,
            hits.map(_._1).min))
      }
      withClue(s"seed $seed: ") { got shouldBe expected }
    }
  }

  test("RollingHashExpr/KeyHash62Expr match the interpreted HOF fold exactly") {
    // the r21 codegen kernels replaced the interpreted
    // aggregate(split(s,""),…) folds — the oracle hashes must not move by
    // one bit. Twin formulas below ARE the replaced implementations.
    import org.apache.spark.sql.{functions => F}
    def hofRaw(s: org.apache.spark.sql.Column, mult: Long, seedv: Long, mod: Long) =
      F.when(F.length(s) === 0, lit(seedv)).otherwise(
        aggregate(split(s, ""), lit(seedv), (h, c) => pmod(h * mult + ascii(c), lit(mod))))
    def hof62(key: org.apache.spark.sql.Column) = {
      val s = coalesce(key.cast("string"), lit(""))
      val zero = struct(lit(7L).as("h1"), lit(11L).as("h2"))
      val raw = F.when(F.length(s) === 0, zero).otherwise(
        aggregate(split(s, ""), zero, (h, c) => struct(
          pmod(h.getField("h1") * 131L + ascii(c), lit(1000000007L)).as("h1"),
          pmod(h.getField("h2") * 137L + ascii(c), lit(998244353L)).as("h2"))))
      pmod(raw.getField("h1") * lit(2654435761L), lit(1000000007L)) *
        lit(2147483648L) + pmod(raw.getField("h2") * lit(3266489917L), lit(998244353L))
    }
    // adversarial fixed cases: empty, whitespace, non-ASCII Latin/CJK,
    // combining marks, supplementary-plane (surrogate pairs), long runs
    val tricky = Seq("", " ", "  a  B ", "héllo wörld", "ナイーブ", "मानक",
      "éclair", "😀 emoji 🎉", "𝄞 clef",
      "a" * 500, "Ab" * 64 + "\n\tmixed  ws", "null", "ASCII only 0123456789")
    val gen = Gen.listOfN(40, Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', 'é', 'ß', '中', ' '),
        1 -> Gen.oneOf("😀", "𝄞").map(_.charAt(0)))).map(_.mkString)))
    (1L to 5L).foreach { seed =>
      // scrub unpaired surrogates the char-level generator can produce —
      // they are not valid UTF-8 scalar values (Spark would replace them
      // on ingest anyway), the kernel contract is over real strings.
      // codePoints() passes LONE surrogates through as their own code
      // points, so they must be filtered explicitly — a surrogate char
      // only survives when paired (then it arrives as one cp > 0xFFFF).
      val rand = sample(gen, seed + 3000).map { s =>
        val cps = s.codePoints().toArray
          .filterNot(cp => cp >= Character.MIN_SURROGATE.toInt &&
            cp <= Character.MAX_SURROGATE.toInt)
        new String(cps, 0, cps.length)
      }
      val keys = (tricky ++ rand).distinct
      val rows = keys.toDF("k").select(
          graft.functions.RollingHash(col("k"), 131, 7L, 1000000007L).as("cg1"),
          hofRaw(col("k"), 131L, 7L, 1000000007L).as("ho1"),
          graft.functions.RollingHash(col("k"), 137, 11L, 998244353L).as("cg2"),
          hofRaw(col("k"), 137L, 11L, 998244353L).as("ho2"),
          Sampling.keyHash62(col("k")).as("cg62"),
          hof62(col("k")).as("ho62"))
        .collect()
      rows.foreach { r =>
        withClue(s"seed $seed: ") {
          r.getLong(0) shouldBe r.getLong(1)
          r.getLong(2) shouldBe r.getLong(3)
          r.getLong(4) shouldBe r.getLong(5)
        }
      }
    }
  }

  test("keyHash stays in [0, 1e9+7) and distinct raw hashes stay distinct") {
    val keyGen = Gen.listOfN(30, Gen.identifier.map(_.take(20)))
    (1L to 25L).foreach { seed =>
      val keys = sample(keyGen, seed + 2000).distinct
      val hs = keys.toDF("k")
        .select(Sampling.keyHash(col("k")).as("h"),
          TextAnalysis.rawRollingFingerprint(coalesce(col("k"), lit(""))).as("raw"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      hs.foreach { case (h, _) => h should (be >= 0L and be < 1000000007L) }
      // the avalanche multiply is a bijection mod the prime: distinct raw
      // values must map to distinct finalized values (and vice versa)
      withClue(s"seed $seed: ") {
        hs.map(_._1).distinct.length shouldBe hs.map(_._2).distinct.length
      }
    }
  }
}
