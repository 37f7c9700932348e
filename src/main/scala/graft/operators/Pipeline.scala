package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative training-data pipeline runner: an ordered list of named
  * stages compiled into ONE DataFrame plan over the corpus — the
  * composition seam that lets a user (or the HTTP front door) assemble
  * quality floor → dedup → boilerplate removal → sampling → shuffle →
  * packing without writing Scala, while Catalyst still sees a single
  * declarative query (filters merge, projections prune, stage
  * boundaries add no materialization unless a stage itself checkpoints).
  *
  * Stages operate on (and return) the full-row frame, so later stages
  * keep access to every corpus column; id-emitting operators are folded
  * back via semi-joins. `pack` emits the loader-facing assignment
  * relation and is therefore terminal-by-convention (anything after it
  * would see assignment rows, not documents).
  *
  * At 100 TB the runner adds nothing to the operators' own scale
  * stories — it is pure composition: no driver-side loops, no
  * per-stage collect, no caching beyond what `dedupPipeline`-style
  * stages do internally.
  */
object Pipeline {

  /** One named stage with string-typed parameters (wire-friendly:
    * the HTTP front door passes JSON values through verbatim). */
  final case class Stage(op: String, params: Map[String, String])

  def run(df: DataFrame, textCol: String, idCol: String,
          stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "pipeline needs at least one stage")
    stages.foldLeft(df)((cur, st) => applyStage(cur, textCol, idCol, st))
  }

  private def applyStage(df: DataFrame, textCol: String, idCol: String,
                         st: Stage): DataFrame = {
    def str(k: String): String = st.params.getOrElse(k,
      throw new IllegalArgumentException(s"stage '${st.op}' requires param '$k'"))
    def d(k: String, dflt: Double): Double = st.params.get(k).map(_.toDouble).getOrElse(dflt)
    def l(k: String, dflt: Long): Long = st.params.get(k).map(_.toLong).getOrElse(dflt)
    def i(k: String, dflt: Int): Int = st.params.get(k).map(_.toInt).getOrElse(dflt)

    st.op match {
      case "quality_floor" =>
        df.filter(TextAnalysis.qualityScore(col(textCol)) >= d("minQuality", 0.5))

      case "verdicts_filter" => // quality + repetition + PII gates per row
        val keep = TextAnalysis.qualityVerdictsPerRow(df, textCol, idCol,
            minQuality = d("minQuality", 0.5),
            maxDupTokenFrac = d("maxDupTokenFrac", 0.6),
            maxTopTokenFrac = d("maxTopTokenFrac", 0.15),
            maxDupBigramFrac = d("maxDupBigramFrac", 0.08),
            maxPii = i("maxPii", 0))
          .filter(col("keep")).select(col("id").as(idCol))
        df.join(keep, Seq(idCol), "left_semi")

      case "exact_dedup" =>
        st.params.get("priorityCol") match {
          case Some(p) => Dedup.dropExactDupsBy(df, textCol, idCol, col(p))
          case None => Dedup.dropExactDups(df, textCol, idCol)
        }

      case "neardup_keep_best" =>
        val pri = st.params.get("priorityCol").map(col)
          .getOrElse(length(col(textCol)))
        Dedup.nearDupKeepBest(df, textCol, idCol, d("threshold", 0.8), pri)

      // NOTE stage contract: `strip_chunks` rewrites textCol to the
      // Dedup-NORMALIZED form (lowercased, whitespace-collapsed,
      // space-joined tokens) with duplicated windows erased — chunk
      // identity is defined on normalized token windows, so the rewrite
      // is expressed in that space. `strip_lines` by contrast preserves
      // the original lines verbatim (line identity is normalized, the
      // KEPT text is not). Downstream stages (quality_floor, pack token
      // counts) therefore see normalized text after strip_chunks but
      // original text after strip_lines. Pick the stage accordingly.
      case "strip_chunks" => // rewrite textCol with duplicated windows erased
        val cleaned = Dedup.stripRepeatedChunks(df, idCol, textCol,
          i("window", 20), i("stride", 10), i("minDocs", 2))
        df.drop(textCol).join(
          cleaned.select(col(idCol), col("cleaned_text").as(textCol)), Seq(idCol))

      case "strip_lines" => // C4-style line-level boilerplate removal
        val cleaned = Dedup.stripRepeatedLines(df, idCol, textCol, i("minDocs", 2))
        df.drop(textCol).join(
          cleaned.select(col(idCol), col("cleaned_text").as(textCol)), Seq(idCol))

      case "sample_bernoulli" =>
        Sampling.bernoulliSample(df, st.params.getOrElse("keyCol", textCol),
          d("fraction", 0.1))

      case "sample_epoch_mix" =>
        // per-domain overrides spell as epochs:<domain> -> factor
        val epochs = st.params.collect {
          case (k, v) if k.startsWith("epochs:") => k.stripPrefix("epochs:") -> v.toDouble
        }
        Sampling.epochMix(df, str("domainCol"),
          st.params.getOrElse("keyCol", textCol), epochs,
          d("defaultEpochs", 1.0))

      case "sample_temperature_mix" => // sqrt-share rebalance across domains
        Sampling.sqrtTemperatureMix(df, str("domainCol"),
          st.params.getOrElse("keyCol", textCol))

      case "sample_token_budget" =>
        // per-domain overrides spell as budget:<domain> -> tokens
        val budgets = st.params.collect {
          case (k, v) if k.startsWith("budget:") => k.stripPrefix("budget:") -> v.toLong
        }
        val tokens = st.params.get("tokenCol").map(col)
          .getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        Sampling.tokenBudgetSample(df, str("domainCol"), idCol, tokens,
          budgets, l("defaultBudget", Long.MaxValue),
          st.params.get("priorityCol").map(col))

      case "url_blocklist" => // crawl kill-list (comma-separated domains)
        Url.domainBlocklistFilter(df, str("urlCol"),
          str("blocked").split(",").toSeq.map(_.trim).filter(_.nonEmpty))

      case "url_dedup" => // keep the min-id row per canonical URL
        val survivors = Url.dedupByCanonicalUrl(df, str("urlCol"), idCol)
          .select(col("survivor_id").as(idCol))
        df.join(survivors, Seq(idCol), "left_semi")

      case "domain_cap" => // FineWeb-style per-registrable-domain cap
        val kept = Url.domainCap(df, str("urlCol"), idCol, i("cap", 1000))
          .select(col("id").as(idCol))
        df.join(kept, Seq(idCol), "left_semi")

      case "quality_band" => // per-language top-X% quality percentile gate
        val kept = TextAnalysis.qualityPercentileBand(df, textCol, idCol,
            str("langCol"), d("keep", 0.3))
          .select(col(idCol))
        df.join(kept, Seq(idCol), "left_semi")

      case "adaptive_length" => // per-group [lo,hi] quantile length band
        st.params.get("lenCol") match {
          case Some(lc) => TextAnalysis.adaptiveLengthFilter(df, lc,
            str("groupCol"), d("lo", 0.1), d("hi", 0.9))
          case None => TextAnalysis.adaptiveLengthFilter(
            df.withColumn("ap_len", length(col(textCol)).cast("long")),
            "ap_len", str("groupCol"), d("lo", 0.1), d("hi", 0.9)).drop("ap_len")
        }

      case "novelty_floor" => // drop docs assembled from shared fragments
        val keep = TextAnalysis.ngramNovelty(df, textCol, idCol, i("n", 3))
          .filter(col("novelty") >= d("minNovelty", 0.1))
          .select(col("id").as(idCol))
        df.join(keep, Seq(idCol), "left_semi")

      case "split_assign" => // ordered "train=0.8,val=0.1,test=0.1" labels
        val fr = str("fractions").split(",").toSeq.map { kv =>
          val parts = kv.split("=")
          require(parts.length == 2, s"bad fraction spec: '$kv'")
          parts(0).trim -> parts(1).trim.toDouble
        }
        Sampling.splitAssign(df, st.params.getOrElse("keyCol", textCol), fr)

      case "shuffle" =>
        Sampling.deterministicShuffle(df, idCol, l("seed", 42L))

      case "pack" => // terminal: documents -> (doc, shard, chunk) assignments
        st.params.get("tokenCol") match {
          case Some(t) =>
            Packing.chunkAssignments(df, idCol, t, l("budget", 2048L), i("shards", 32))
          case None =>
            Packing.chunkAssignments(
              df.withColumn("ap_tok", TextAnalysis.tokenCount(col(textCol)).cast("long")),
              idCol, "ap_tok", l("budget", 2048L), i("shards", 32))
        }

      case other =>
        throw new IllegalArgumentException(s"unknown pipeline stage: $other")
    }
  }
}
