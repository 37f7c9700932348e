package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape diagnostic: prints the formatted physical plan of headline
  * queries and asserts the scale-critical shapes (pushed filters,
  * TakeOrderedAndProject for top-k, broadcast for small dims). Run:
  * `sbt "runMain graft.Plans /root/testdata/sf0.001"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val checks: Seq[(String, String, Seq[String])] = Seq(
      ("knn_manhattan", "TakeOrderedAndProject", Seq("TakeOrderedAndProject")),
      ("projection_filter", "PushedFilters reach parquet", Seq("PushedFilters: [", "GreaterThan(l_quantity")),
      ("q1_agg", "partial aggregation before shuffle", Seq("partial_sum", "HashAggregate")),
      ("set_intersect", "semi join (broadcast-able)", Seq("LeftSemi")),
      ("compound_setalgebra", "recursive tree plans as chained semi/anti joins",
        Seq("LeftSemi", "LeftAnti")),
      ("knn_rerank_half", "rerank candidates via semi join", Seq("LeftSemi")),
      ("predicate_in_lt", "IN-filter pushed", Seq("PushedFilters: [", "In(l_returnflag")),
      ("q3_shipping", "small dimension broadcast into fact join", Seq("BroadcastHashJoin")),
      ("ann_batch_topk", "map-side partial bounded top-k, no qid window funnel",
        Seq("ObjectHashAggregate", "partial_bounded_topk")),
      ("ann_ivf_topk", "IVF candidates aggregated map-side",
        Seq("ObjectHashAggregate", "partial_bounded_topk")),
      ("text_bm25", "posting partial aggregation + broadcast term stats",
        Seq("partial_count", "BroadcastHashJoin")),
      ("knn_sparse", "sparse kernel scans the struct directly (no densify)",
        Seq("sparse_euclidean", "TakeOrderedAndProject")),
      // the filter must appear INSIDE the brackets — an empty
      // "PartitionFilters: []" plus a post-scan filter would otherwise
      // match both markers and hide a pruning regression
      ("partition_pruned_scan", "entity key-skip reaches the scan as partition pruning",
        Seq("PartitionFilters: [ap_partition")),
      ("repetition_signals_perrow", "per-row kernel stays in the scan stage",
        Seq("repetition_stats")),
      ("kv_point_lookup", "KV lookup prunes to bucket dirs + pushes the key filter",
        Seq("PartitionFilters: [__kv_bucket", "PushedFilters: [", "In(p_partkey")),
      ("corpus_contamination", "benchmark postings broadcast; corpus side never shuffles",
        Seq("BroadcastHashJoin")),
      ("pack_chunk_rows", "chunk rows stay on the one shard-keyed window shuffle",
        Seq("Window", "Generate explode")),
      ("repeated_chunks", "start offsets explode before window hashing; one groupBy",
        Seq("Generate explode", "md5", "HashAggregate")),
      // the assignment (sort_array centroid kernel) is materialized ONCE
      // via localCheckpoint — both self-join sides must read the
      // checkpointed RDD, never recompute the k-kernel projection
      ("semantic_dedup", "checkpointed assignment feeds both pair-join sides (no recompute)",
        Seq("Scan ExistingRDD")),
      ("corpus_mix_report", "map-side partial aggregation on (source, lang)",
        Seq("partial_count", "HashAggregate")),
      ("unigram_logppl", "token-keyed partial counts; scalar total broadcast",
        Seq("partial_count", "BroadcastNestedLoopJoin")),
      ("knn_doc_lookup", "top-k bounds BEFORE the metadata join; doc side broadcast",
        Seq("TakeOrderedAndProject", "BroadcastHashJoin")),
      ("hash_features", "bucket counts partial-aggregate before the id shuffle",
        Seq("partial_count", "HashAggregate")),
      ("zorder_pruned_scan", "partkey range filter pushed to the z-ordered scan",
        Seq("PushedFilters: [", "GreaterThanOrEqual(l_partkey", "LessThanOrEqual(l_partkey")),
      ("neardup_keep_best", "per-component priority window + anti-join of pairs-scale losers",
        Seq("Window", "LeftAnti")),
      // the vector leg's RANKING must scan the SQ8 byte-codes relation
      // (pq_adc kernel), with the raw embedding table only reached
      // through the candidate-bounded semi-join rerank
      ("hybrid_search_rrf", "TakeOrdered-bounded fusion; vector leg ranks over index codes",
        Seq("TakeOrderedAndProject", "FullOuter", "pq_adc", "LeftSemi")),
      ("event_funnel", "funnel folds per-user sorted collect in one aggregation; " +
        "non-step events nulled out map-side, below the exchange",
        Seq("collect_list", "ObjectHashAggregate", "IN (click,view,purchase)")),
      ("text_index_bm25", "index-served BM25: postings read is bucket-PARTITION-pruned",
        Seq("PartitionFilters: [", "ap_bucket")),
      ("strip_repeated_chunks", "dup-hash relation joins back; rewrite is an array filter",
        Seq("Generate explode", "md5", "filter")),
      // --- round-16 shapes ---
      ("text_nfc_normalize", "NFC kernel stays in the scan stage",
        Seq("nfc_normalize")),
      ("url_blocklist_filter", "blocklist is a broadcast anti-join",
        Seq("BroadcastHashJoin", "LeftAnti")),
      ("ann_binary_topk", "Hamming phase is a map-side bounded top-k over popcount",
        Seq("ObjectHashAggregate", "partial_bounded_topk", "bit_count")),
      ("cdc_chunks", "CDC bounds kernel in the scan; chunks explode in-row",
        Seq("cdc_bounds", "Generate explode")),
      ("event_funnel_cycles", "packed fold in one aggregation; step pre-filter below the exchange",
        Seq("collect_list", "ObjectHashAggregate", "IN (click,view,purchase)")),
      ("quality_adaptive_length", "quantile bands broadcast back onto the scan",
        Seq("BroadcastHashJoin", "percentile")),
      ("url_domain_cap", "per-domain cap is one keyed window",
        Seq("Window")),
      ("bigram_logppl", "multiplicities aggregate map-side; scalar total broadcast",
        Seq("partial_count", "partial_sum", "BroadcastNestedLoopJoin")),
      ("index_bsq_knn", "sign-code scan bounds candidates before the rerank semi-join",
        Seq("TakeOrderedAndProject", "LeftSemi", "bit_count")),
      ("contamination_rate_report", "benchmark postings broadcast; rollup partial-aggregates",
        Seq("BroadcastHashJoin", "partial_count")))

    // the as-of join must plan as ONE keyed shuffle + running window —
    // no join operator at all; the range join must be a hash equi-join,
    // never a nested loop over the range predicate
    {
      val asofPlan = SparkEntry.queries("event_asof_attribution")(spark, sfDir)
        .queryExecution.executedPlan.toString
      val asofJoins = "Join".r.findAllIn(asofPlan).length
      if (asofJoins == 0 && asofPlan.contains("Window"))
        println("[plan-ok] event_asof_attribution: tagged-union window, zero joins")
      else {
        println(s"[plan-MISS] event_asof_attribution: expected join-free window plan\n$asofPlan")
        sys.exit(1)
      }
      // every binned join in the family must be a hash equi-join —
      // a Catalyst upgrade silently re-planning any of them into
      // BroadcastNestedLoopJoin/CartesianProduct is a scale regression
      Seq(("range_join_price_bands", "binned hash equi-join"),
          ("session_overlap_join", "interval-overlap binned equi-join"),
          ("geo_radius_join", "lat/lng grid equi-join")).foreach {
        case (name, what) =>
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.executedPlan.toString
          if (!plan.contains("NestedLoop") && !plan.contains("CartesianProduct")
              && plan.contains("Join"))
            println(s"[plan-ok] $name: $what, no nested loop")
          else {
            println(s"[plan-MISS] $name: expected hash join without NLJ\n$plan")
            sys.exit(1)
          }
      }
    }

    // negative shape: these must not shuffle before their
    // (presentation-only) global sort — strip the final Sort's own range
    // exchange, then expect zero remaining exchanges
    Seq(("repetition_signals_perrow", "zero non-sort exchanges"),
        ("sample_weighted_len", "weighted sample is a pure codegen filter"),
        ("distance_dispatch", "alias dispatch is a pure projection over the scan"),
        ("url_canonicalize", "canonicalization is a pure projection over the scan"),
        ("sample_split_assign", "split labels are a pure codegen projection"),
        ("text_script_profile", "script counting is a pure projection over the scan"))
      .foreach { case (name, what) =>
      val perRowPlan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      // BroadcastExchange ships a tiny build side (the 1-row query
      // vector), not the data — only shuffle exchanges count
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(perRowPlan).length
      val rangeExchanges = "rangepartitioning".r.findAllIn(perRowPlan).length
      if (exchanges > rangeExchanges) {
        println(s"[plan-MISS] $name: unexpected shuffle\n$perRowPlan")
        sys.exit(1)
      } else println(s"[plan-ok] $name: $what")
    }

    // z-order layout: per-file min/max of the NON-leading column must be
    // tight enough that the BETWEEN [100,120] filter's row groups prune —
    // i.e. most files' [min,max] ranges do not overlap the filter. A
    // single-column sort on l_orderkey would leave l_partkey spanning its
    // full domain in EVERY file (zero files prunable).
    {
      import org.apache.spark.sql.functions._
      val perFile = spark.read.parquet(SparkEntry.zorderLayout(spark, sfDir))
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
        .collect()
      val overlapping = perFile.count(r => r.getLong(1) <= 120 && r.getLong(2) >= 100)
      if (perFile.length >= 4 && overlapping * 2 < perFile.length)
        println(s"[plan-ok] zorder_pruned_scan: $overlapping/${perFile.length} " +
          "files overlap the partkey filter — min/max stats prune the rest")
      else {
        println(s"[plan-MISS] zorder_pruned_scan: $overlapping/${perFile.length} " +
          "files overlap [100,120] — layout does not cluster the non-leading column")
        sys.exit(1)
      }
    }

    var failed = 0
    checks.foreach { case (name, what, markers) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val missing = markers.filterNot(plan.contains)
      if (missing.isEmpty) println(s"[plan-ok] $name: $what")
      else {
        failed += 1
        println(s"[plan-MISS] $name: expected $missing\n$plan")
      }
    }
    println(if (failed == 0) "[plans] all shapes OK" else s"[plans] $failed MISSING")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
