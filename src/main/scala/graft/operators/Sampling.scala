package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: hash-Bernoulli
  * row sampling and exact per-stratum subsampling.
  *
  * Both are driven by a PORTABLE key hash (the char-level rolling hash of
  * [[TextAnalysis.rawRollingFingerprint]], `h = (h·131 + codepoint) mod
  * 1e9+7` over the RAW stringified key) rather than `xxhash64`/`rand()`:
  * the sample is reproducible across engines and across runs, re-runs on
  * grown data keep previously selected rows selected (the keep decision
  * depends only on the key), and an external SQL engine can replay the
  * exact row set. The raw hash means keys differing only in case or
  * whitespace ("A b" vs "a  B") hash — and sample — independently.
  *
  * Scale shape: Bernoulli sampling is a pure per-row filter — no shuffle,
  * fully codegen'd, prunes at the scan when combined with column
  * pruning. Stratified sampling is one window shuffle keyed by the
  * stratum (the unavoidable cost of an EXACT per-stratum count); for
  * approximate-at-scale use the Bernoulli form per stratum instead.
  */
object Sampling {

  /** The portable per-key hash in [0, 1e9+7), uniform enough for sampling
    * at per-mill granularity. Key is stringified first; a NULL key hashes
    * like the empty string — null-keyed rows participate in sampling (all
    * kept or all dropped together) rather than being silently filtered
    * out. The raw rolling hash is finalized with `h · 2654435761 mod p`:
    * keys differing only in a trailing character yield CONSECUTIVE raw
    * hashes (same prefix state, ±1 in the last step), which would
    * correlate their `mod 10000` sampling residues; the multiplicative
    * step scatters them while staying a BIJECTION mod the prime (distinct
    * keys stay distinct) and replayable in 63-bit SQL arithmetic
    * (p · 2654435761 < 2^62). */
  def keyHash(key: Column): Column =
    pmod(TextAnalysis.rawRollingFingerprint(coalesce(key.cast("string"), lit("")))
      * lit(2654435761L), lit(1000000007L))

  /** Independent second key hash in [0, 998244353): different rolling
    * multiplier/modulus/seed ([[TextAnalysis.rawRollingFingerprint2]])
    * and a different avalanche constant (0xC2B2AE3D, the second
    * xxHash-family prime — 998244352 · 3266489917 < 2⁶² keeps the
    * finalizer replayable in 63-bit SQL arithmetic). A [[keyHash]]
    * collision and a keyHash2 collision are uncorrelated — the
    * widening pair for identity-grade keys. */
  def keyHash2(key: Column): Column =
    pmod(TextAnalysis.rawRollingFingerprint2(coalesce(key.cast("string"), lit("")))
      * lit(3266489917L), lit(998244353L))

  /** IDENTITY-grade portable key hash: [[keyHash]] and [[keyHash2]]
    * packed into one BIGINT (`h1 · 2³¹ + h2` < 2⁶¹ — replayable in any
    * 64-bit SQL engine; ordering = lexicographic on (h1, h2)).
    * Collision space ≈ 10¹⁸ (the primes' product): two distinct keys
    * silently collide with p ≈ 10⁻¹⁸, a birthday horizon of ~10⁹
    * distinct keys (expected colliding pairs n²/2 · 10⁻¹⁸ — at n = 10⁹
    * that is 0.5; [[keyHash]] alone saturates at ~4·10⁴). Use for keys
    * whose collision MERGES identities (dedup component node ids,
    * cluster keys); plain [[keyHash]] remains right for sampling
    * residues and sketch inputs, where a collision only adds estimator
    * noise bounded by the sketch's own guarantees. Corpora beyond 10⁹
    * distinct identity keys should carry a true content hash (md5/
    * sha2) instead — cross-engine replay is what this hash buys. */
  def keyHash62(key: Column): Column =
    // FUSED single pass: both rolling recurrences ride one codepoint walk
    // in the [[graft.functions.KeyHash62Expr]] codegen kernel —
    // bit-identical to keyHash·2³¹ + keyHash2 (the same integer
    // arithmetic per step). The r20 interpreted struct-fold twin
    // (aggregate(split(s,""), …) over a (h1, h2) struct) cost the CDC
    // family +19–42 % wall; the kernel stays inside whole-stage codegen
    // and allocates nothing (KernelPropertySpec pins the equivalence).
    graft.functions.RollingHash.keyHash62(coalesce(key.cast("string"), lit("")))

  /** Collision-free working-column namer: `__graft_<base>_<i>` with the
    * smallest `i` absent from `df` — a caller frame that already carries
    * a `__graft_*` column must never be silently replaced by a
    * withColumn or made ambiguous by a join. */
  private def freshNamer(df: DataFrame): String => String = {
    val taken = df.columns.toSet
    base => Iterator.from(0).map(i => s"__graft_${base}_$i").filterNot(taken).next()
  }

  /** Deterministic Bernoulli sample: keep rows whose key hashes into the
    * first `fraction` of the hash space. `fraction` is quantized to
    * 1/10000 so the predicate is exact integer arithmetic. Rows sharing a
    * key (including all NULL-keyed rows) are kept or dropped together. */
  def bernoulliSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val cut = math.round(fraction * 10000).toInt
    df.filter(pmod(keyHash(col(keyCol)), lit(10000)) < cut)
  }

  /** Deterministic train/val/test split assignment: every row gets a
    * `split` label by where its key hashes among cumulative per-10000
    * cuts (e.g. `train→0.8, val→0.1, test→0.1` ⇒ residue <8000 → train,
    * <9000 → val, else test). The same properties as [[bernoulliSample]]
    * hold because it IS the same hash: key-stable under corpus growth
    * (appended rows never move existing rows between splits — no
    * train/test leakage on re-runs), engine-replayable integer
    * arithmetic, and rows sharing a key land in the same split (dedup
    * groups can't straddle the boundary). Fractions are quantized to
    * 1/10000 and must sum to 1 after quantization so every residue maps
    * to exactly one split. Zero shuffle — a pure codegen projection. */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "splitAssign needs at least one split")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be distinct")
    val cuts = fractions.map { case (_, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction out of range: $f")
      math.round(f * 10000).toInt
    }
    require(cuts.sum == 10000,
      s"fractions must sum to 1 after 1/10000 quantization, got ${cuts.sum}/10000")
    val bounds = cuts.scanLeft(0)(_ + _).tail // cumulative upper bounds
    val residue = pmod(keyHash(col(keyCol)), lit(10000))
    val label = fractions.init.zip(bounds.init)
      .foldRight(lit(fractions.last._1)) { case (((name, _), hi), acc) =>
        when(residue < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Domain-mix sampling: per-domain Bernoulli rates in one pass — the
    * standard way training mixtures are rebalanced ("keep 50% of web,
    * 100% of books, 10% of the rest"). Domains absent from `weights` use
    * `defaultWeight`. Same portable hash and quantization as
    * [[bernoulliSample]], so the kept set is deterministic, key-stable
    * under corpus growth, and externally replayable; still a pure
    * codegen'd per-row filter with zero shuffle. */
  /** Deterministic training-order shuffle: the avalanche hash of
    * (id, seed) becomes a `shuffle_key` sort column, so the training
    * order is reproducible across runs and engines, uncorrelated with
    * ingest order, and per-row stable as the corpus grows (appended
    * rows interleave without moving existing ones — resumable epochs).
    * The sort is a distributed range-partition sort: no global window,
    * no driver funnel, unlike a row_number position assignment. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key",
      keyHash(concat(col(idCol).cast("string"), lit(s":$seed"))))
      .orderBy(col("shuffle_key"), col(idCol))

  def weightedMix(df: DataFrame, domainCol: String, keyCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 0.0): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"weight out of range: $w"))
    val cut = weights.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultWeight * 10000).toInt)) { case (acc, (dom, w)) =>
      when(col(domainCol) === dom, lit(math.round(w * 10000).toInt)).otherwise(acc)
    }
    df.filter(pmod(keyHash(col(keyCol)), lit(10000)) < cut)
  }

  /** Per-ROW weighted Bernoulli sample: keep probability =
    * `clamp(weight, 0, 1)` evaluated per row — the continuous
    * generalization of [[weightedMix]]'s per-domain rates (e.g. keep
    * probability proportional to a quality or length score, the
    * standard soft quality filter over raw crawl). Same portable hash
    * and 1/10000 quantization (`floor` on both engines — DuckDB's
    * double→int CAST rounds, Spark's truncates, so the shared replay
    * uses an explicit floor); still a pure codegen per-row filter with
    * zero shuffle. A NULL weight keeps nothing — rows opt in. */
  def weightedBernoulli(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    val cut = floor(least(greatest(coalesce(weight.cast("double"), lit(0.0)),
      lit(0.0)), lit(1.0)) * 10000)
    df.filter(pmod(keyHash(col(keyCol)), lit(10000)) < cut)
  }

  /** Deterministic exact-n sample: the n rows whose keys hash smallest
    * (ties broken by the key itself). Plans as `TakeOrderedAndProject` —
    * per-partition top-n then a k-row merge on the driver, no full sort,
    * no shuffle of the relation. Unlike [[bernoulliSample]] the output
    * size is EXACT; like it, the selection depends only on the keys, so
    * it is stable under reordering and externally replayable. */
  def exactSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    df.orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc).limit(n)
  }

  /** Exact stratified sample: per stratum keep `ceil(fraction · |stratum|)`
    * rows, chosen deterministically by (hash, key) order. One shuffle on
    * the stratum key; count and rank share the same window frame.
    * Intermediate rank/quota columns use generated names, so user columns
    * named `rn`/`quota` pass through untouched.
    *
    * Determinism caveat: the SELECTED KEY multiset is fully deterministic,
    * but among rows with IDENTICAL (stratum, key) the rank assignment at
    * the quota boundary is arbitrary — if such rows differ in other
    * columns, which physical row survives can vary between runs. Use a
    * unique key column when full row-level determinism is required. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    stratifiedSampleBy(df, strataCol, keyCol, Map.empty, fraction)
  }

  /** [[stratifiedSample]] with PER-STRATUM fractions — exact weighted
    * quotas (`ceil(f_s · |stratum s|)`), the exact-count twin of
    * [[weightedMix]]. Strata absent from `fractions` use
    * `defaultFraction`; a fraction of 0 drops the stratum entirely. */
  /** Epoch-mix OVERSAMPLING: emit each row `epochs(domain)` times,
    * where fractional epochs become a deterministic Bernoulli extra
    * copy — "train 2.5 epochs of books, 0.3 of web" — the upsampling
    * half of mixture construction ([[weightedMix]] and
    * [[tokenBudgetSample]] only downsample). A row with epochs e emits
    * `floor(e)` copies plus one more iff its key hashes into the first
    * `frac(e)` of the hash space (same portable hash + 1/10000
    * quantization as [[bernoulliSample]], so e < 1 degenerates to
    * exactly the Bernoulli keep-set and the output is key-stable under
    * corpus growth). Output rows carry `ap_epoch` (1-based copy index)
    * so downstream shuffles/packing can interleave copies.
    *
    * Pure codegen explode, zero shuffle; output volume is the mixture
    * size by construction. */
  def epochMix(df: DataFrame, domainCol: String, keyCol: String,
               epochs: Map[String, Double], defaultEpochs: Double = 1.0): DataFrame = {
    (epochs.values.toSeq :+ defaultEpochs).foreach(e =>
      require(e >= 0.0 && e <= 1000.0, s"epochs out of range: $e"))
    require(!df.columns.contains("ap_epoch"), "ap_epoch is reserved")
    // per-domain epochs ride as a BROADCAST-JOINED table, not a
    // when-literal chain: a web-scale mixture has 10^7–10^8 domains,
    // which no literal fold fits in a plan; the joined table is
    // #configured-domains rows shipped once per executor. Equality
    // join (not null-safe) keeps the old fold's semantics: a null
    // domain takes defaultEpochs.
    val spark = df.sparkSession
    import spark.implicits._
    // working columns take collision-free names (same pattern as
    // tokenBudgetSample): a caller frame already holding "__graft_epochs"
    // would otherwise be silently replaced by withColumn
    val fresh = freshNamer(df)
    val eDom = fresh("epoch_dom")
    val eT = fresh("epochs_t")
    val eName = fresh("epochs")
    val withE =
      if (epochs.isEmpty) df.withColumn(eName, lit(defaultEpochs))
      else df.join(
          broadcast(epochs.toSeq.toDF(eDom, eT)),
          col(domainCol) === col(eDom), "left")
        .withColumn(eName, coalesce(col(eT), lit(defaultEpochs)))
    val e = col(eName)
    val cut = round((e - floor(e)) * 10000).cast("int")
    val extra = when(pmod(keyHash(col(keyCol)), lit(10000)) < cut, 1L).otherwise(0L)
    val copies = floor(e).cast("long") + extra
    // sequence(1, 0) would infer a NEGATIVE step — guard to an empty
    // array so zero-copy rows drop out through the explode
    withE.withColumn("ap_epoch",
        explode(when(copies >= 1L, sequence(lit(1L), copies))
          .otherwise(array().cast("array<bigint>"))))
      .select(df.columns.map(col).toSeq :+ col("ap_epoch"): _*)
  }

  /** Square-root temperature resampling (the α = 0.5 point of the
    * multilingual-LM "temperature" rebalance): domain d's target share
    * becomes `√n_d / Σ√n` — large domains are down-weighted, small ones
    * repeated — via a per-domain repetition factor
    * `f_d = √n_d · N / (Σ√n · n_d)` applied exactly like [[epochMix]]
    * (whole copies + one hash-gated fractional copy, `ap_epoch` index,
    * zero-copy rows drop out).
    *
    * Factor arithmetic is INTEGER end to end — milli-precision integer
    * sqrt (`⌊√(n·10⁶)⌋`, exact: the argument stays under 2⁵³ and sqrt
    * is correctly rounded) and a per-10000 fractional cut — so the kept
    * multiset is bit-replayable by any engine with 64-bit integers; a
    * float `pow(n, α)` would differ across libm implementations in the
    * last ulp and flip hash-gate comparisons.
    *
    * Scale shape: the per-domain factor table never leaves the
    * cluster — one groupBy-count (#domains rows, a DataFrame), factor
    * arithmetic in exact DECIMAL(38,0) on those rows, then a
    * null-safe BROADCAST join back onto the corpus and a pure codegen
    * per-row explode. Only the 1-row (Σ√n, N) total ever reaches the
    * driver, so 10⁷–10⁸ registrable domains cost a small broadcast,
    * not a plan-sized literal map. The decimal floor-division
    * `(a − a mod b)/b` reproduces the BigInt math bit-for-bit
    * (a ≤ √n·N·10⁴ < 10³⁸ for any per-call corpus under the
    * documented ~10⁹-row bound). */
  def sqrtTemperatureMix(df: DataFrame, domainCol: String,
                         keyCol: String): DataFrame = {
    require(!df.columns.contains("ap_epoch"), "ap_epoch is reserved")
    val dec = "decimal(38,0)"
    // collision-free working names (see epochMix)
    val fresh = freshNamer(df)
    val mixDom = fresh("mix_dom")
    val mixN = fresh("mix_n")
    val mixSd = fresh("mix_sd")
    val mixF = fresh("mix_f")
    val counts = df.groupBy(col(domainCol).as(mixDom))
      .agg(count(lit(1)).as(mixN))
      .withColumn(mixSd,
        // milli-precision integer sqrt: exact while n·10⁶ < 2⁵³ and
        // sqrt is correctly rounded — same as the driver-side
        // math.sqrt this replaces, and as the oracle's SQL replay
        floor(sqrt((col(mixN) * lit(1000000L)).cast("double")))
          .cast(dec))
    val tot = counts.agg(
      sum(col(mixSd)).cast(dec).as("ssum"),
      sum(col(mixN)).cast(dec).as("ntot")).head()
    require(!tot.isNullAt(0), "temperature mix over an empty frame")
    val (ssum, ntot) = (tot.getDecimal(0), tot.getDecimal(1))
    val num = col(mixSd) * lit(ntot) * lit(10000L)
    val den = lit(ssum) * col(mixN).cast(dec)
    // exact floor division: subtract the remainder first; the decimal
    // quotient is then an exact integer and the long cast is lossless
    val f = ((num - num % den) / den).cast("long")
    // sqrt-temperature factors are unbounded under extreme skew (a
    // 1-doc domain in an N-doc corpus repeats ~sqrt(N)/sqrt-share
    // times); 100 000 copies covers any sane mixture — past it the
    // caller should shard or floor tiny domains, not explode rows
    val factors = counts.select(col(mixDom),
      when(f < 10000L * 100001L, f).otherwise(raise_error(concat(
        lit("temperature factor for domain '"),
        coalesce(col(mixDom).cast("string"), lit("NULL")),
        lit("' exceeds 100000 copies — extreme domain skew; "),
        lit("pre-filter or shard tiny domains")))).as(mixF))
    // null-safe equality: the old literal fold matched a NULL domain
    // explicitly, and every domain (incl. NULL) exists in the factor
    // table by construction, so the join is effectively inner
    val fCol = col(mixF)
    val extra = when(pmod(keyHash(col(keyCol)), lit(10000)) < fCol % 10000L, 1L)
      .otherwise(0L)
    val copies = (fCol / 10000L).cast("long") + extra
    df.join(broadcast(factors), col(domainCol) <=> col(mixDom))
      .withColumn("ap_epoch",
        explode(when(copies >= 1L, sequence(lit(1L), copies))
          .otherwise(array().cast("array<bigint>"))))
      .select(df.columns.map(col).toSeq :+ col("ap_epoch"): _*)
  }

  /** Token-budget sampling: keep the highest-priority documents of each
    * domain until that domain's TOKEN budget is exhausted — the
    * data-mixing primitive for assembling a training corpus under a
    * per-source token cap (rather than a per-source row count). Docs
    * are admitted in (priority DESC, id ASC) order; the first doc to
    * cross the budget is the last admitted (budgets are a target, and
    * truncating mid-document is the packer's job, not the sampler's),
    * so every non-empty budget admits at least one doc.
    *
    * One window shuffle keyed by the domain — the same shape (and the
    * same per-domain-sort cost floor) as exact stratified sampling;
    * the running token cumsum is a rows-frame `sum` evaluated in a
    * single pass per partition. SQL-replayable: the admission rule is
    * `cumsum - tokens < budget` over the deterministic order.
    *
    * @param budgets per-domain token budgets; domains absent from the
    *                map use `defaultBudget`; a budget of 0 drops the
    *                domain
    */
  def tokenBudgetSample(df: DataFrame, domainCol: String, idCol: String,
                        tokens: Column, budgets: Map[String, Long],
                        defaultBudget: Long,
                        priority: Option[Column] = None): DataFrame = {
    (budgets.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0L, s"budget out of range: $b"))
    val fresh = freshNamer(df)
    val tok = fresh("tok")
    val cum = fresh("cum")
    // budgets ride as a broadcast-joined table (same reasoning as
    // epochMix/sqrtTemperatureMix): a per-domain literal chain caps
    // out long before the 10^7-domain corpora this targets. Equality
    // join keeps the old fold's semantics (null domain → default).
    val bdom = fresh("bdom")
    val bvalT = fresh("bvalt")
    val bval = fresh("bval")
    val spark = df.sparkSession
    import spark.implicits._
    val withBudget =
      if (budgets.isEmpty) df.withColumn(bval, lit(defaultBudget))
      else df.join(broadcast(budgets.toSeq.toDF(bdom, bvalT)),
          col(domainCol) === col(bdom), "left")
        .withColumn(bval, coalesce(col(bvalT), lit(defaultBudget)))
    val budget = col(bval)
    val order = priority match {
      case Some(p) => Window.partitionBy(col(domainCol))
        .orderBy(p.desc, col(idCol).asc)
      case None => Window.partitionBy(col(domainCol)).orderBy(col(idCol).asc)
    }
    // A NULL token count would make `cum - tok` NULL and silently drop
    // the row from the corpus; fail loudly instead (mirrors longIdOrFail)
    // so a bad token column is an operator-level error, not data loss.
    val casted = tokens.cast("long")
    withBudget.withColumn(tok, when(casted.isNull,
        raise_error(concat(
          lit("tokenBudgetSample: token count is NULL or not castable to long for "),
          lit(s"$idCol="), col(idCol).cast("string"),
          lit(" — coalesce or fix the token column upstream"))))
        .otherwise(casted))
      .withColumn(cum, sum(col(tok)).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col(cum) - col(tok) < budget)
      .select(df.columns.map(col).toSeq: _*)
  }

  def stratifiedSampleBy(df: DataFrame, strataCol: String, keyCol: String,
                         fractions: Map[String, Double],
                         defaultFraction: Double): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f"))
    val taken = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i").filterNot(taken).next()
    val rn = fresh("rn")
    val quota = fresh("quota")
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
    val order = Window.partitionBy(col(strataCol))
      .orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn(rn, row_number().over(order))
      .withColumn(quota, ceil(frac * count(lit(1)).over(w)))
      .filter(col(rn) <= col(quota))
      .drop(rn, quota)
  }
}
