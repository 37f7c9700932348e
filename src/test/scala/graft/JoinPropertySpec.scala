package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsOfJoin, RangeJoin}

/** Property-based cross-checks for the join operators: the scalable
  * plans (tagged-union window as-of, binned range join) must agree with
  * naive per-row reference implementations on arbitrary generated
  * inputs. Raw ScalaCheck generators with fixed seeds (same pattern as
  * KernelPropertySpec — the scalatestplus bridge isn't cached). */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // small key/time domains so collisions, equal timestamps, and
  // unmatched keys all actually occur
  private val leftGen: Gen[List[(Long, Long)]] = // (key, tsSeconds)
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 50L))))
  private val rightGen: Gen[List[(Long, Long, Long)]] = // (key, tsSeconds, rid)
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 999L))))

  private def naiveAsOf(left: List[(Long, Long)], right: List[(Long, Long, Long)],
                        backward: Boolean, strict: Boolean,
                        tolSec: Option[Long]): List[Option[Long]] =
    left.map { case (k, t) =>
      val cands = right.filter(_._1 == k).filter { case (_, rt, _) =>
        val cmp = if (backward) (if (strict) rt < t else rt <= t)
                  else (if (strict) rt > t else rt >= t)
        cmp && tolSec.forall(tol => math.abs(t - rt) <= tol)
      }
      if (cands.isEmpty) None
      else Some {
        // backward: ORDER BY ts DESC, rid DESC LIMIT 1; forward: ASC, ASC
        val best =
          if (backward) cands.maxBy { case (_, rt, rid) => (rt, rid) }
          else cands.minBy { case (_, rt, rid) => (rt, rid) }
        best._3
      }
    }

  test("asOf matches the naive per-row top-1 on arbitrary inputs, all modes") {
    for {
      seed <- 1L to 12L
      backward <- Seq(true, false)
      strict <- Seq(true, false)
      tol <- Seq(None, Some(10L))
    } {
      val ls = sample(leftGen, seed).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val rs0 = sample(rightGen, seed + 1000)
      // de-dup (key, ts, rid) triples: two right rows identical in all
      // three are indistinguishable to the deterministic tie-break
      val rs = rs0.distinct
      val l = ls.toDF("lid", "k", "ts")
      val r = rs.toDF("k", "ts", "rid")
      val got = AsOfJoin.asOf(l, r, Seq("k"), "ts", "rid", Seq("rid"),
          direction = if (backward) "backward" else "forward",
          strict = strict, toleranceMicros = tol.map(_ * 1000000L))
        .orderBy("lid").collect()
        .map(row => if (row.isNullAt(row.fieldIndex("rid"))) None
          else Some(row.getAs[Long]("rid"))).toList
      val want = naiveAsOf(ls.map(x => (x._2, x._3)), rs, backward, strict, tol)
      withClue(s"seed=$seed backward=$backward strict=$strict tol=$tol: ") {
        got shouldBe want
      }
    }
  }

  private val ptsGen: Gen[List[(Long, Double)]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 999L), Gen.chooseNum(-100, 100).map(_ / 3.0))))
  private val ivGen: Gen[List[(Long, Double, Double)]] =
    Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 999L),
        Gen.chooseNum(-100, 100).map(_ / 3.0),
        Gen.chooseNum(-100, 100).map(_ / 3.0))))

  test("interval-overlap join matches the cross-filter reference on arbitrary inputs") {
    for (seed <- 1L to 12L; w <- Seq(0.7, 5.0, 100.0)) {
      val ls = sample(ivGen, seed).zipWithIndex
        .map { case ((id, lo, hi), i) => (i.toLong * 1000 + id, lo, hi) }.distinct
      val rs = sample(ivGen, seed + 700).zipWithIndex
        .map { case ((id, lo, hi), i) => (i.toLong * 1000 + id, lo, hi) }.distinct
      val l = ls.toDF("lid", "l_lo", "l_hi")
      val r = rs.toDF("rid", "r_lo", "r_hi")
      val got = RangeJoin.intervalsOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toList
      val want = for {
        (lid, llo, lhi) <- ls; if llo <= lhi
        (rid, rlo, rhi) <- rs; if rlo <= rhi
        if llo <= rhi && rlo <= lhi
      } yield (lid, rid)
      withClue(s"seed=$seed w=$w: ") {
        got.length shouldBe got.toSet.size
        got.toSet shouldBe want.toSet
      }
    }
  }

  test("binned range join matches the cross-filter reference on arbitrary inputs") {
    for (seed <- 1L to 12L; w <- Seq(0.7, 5.0, 100.0)) {
      val ps = sample(ptsGen, seed).zipWithIndex
        .map { case ((id, v), i) => (i.toLong * 1000 + id, v) }.distinct
      val is = sample(ivGen, seed + 500).zipWithIndex
        .map { case ((id, lo, hi), i) => (i.toLong * 1000 + id, lo, hi) }.distinct
      val p = ps.toDF("pid", "v")
      val iv = is.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointsInIntervals(p, "v", iv, "lo", "hi", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val want = for {
        (pid, v) <- ps; (iid, lo, hi) <- is
        if v >= lo && v <= hi
      } yield (pid, iid)
      withClue(s"seed=$seed w=$w: ") {
        got.length shouldBe got.toSet.size // exactly-once
        got.toSet shouldBe want.toSet
      }
    }
  }
}
