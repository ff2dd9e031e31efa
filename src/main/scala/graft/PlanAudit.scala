package graft

import org.apache.spark.sql.SparkSession

/** Dev forensics: sweep every graded query's physical plan for the
  * join shapes that do not scale (BroadcastNestedLoopJoin, cartesian)
  * and for missing partial aggregation. Prints one line per finding —
  * an empty sweep is the goal. The brute-force vector queries carry a
  * DOCUMENTED BNLJ (their oracles demand exactness; the ANN twins are
  * the scale path) and are listed as `allowed`.
  */
object PlanAudit {
  val AllowedBnlj: Set[String] = Set(
    "q_vector_knn", "q_dedup_embed", // documented exact brute force
    "q_decontaminate_embed", // broadcast eval side, documented baseline
    "q_vector_search", // 1-row broadcast query side
    // constant-side cross joins (the r6-verdict-audited sites): the
    // broadcast side is a 1-row scalar aggregate or a plan-constant
    // dimension, so the "nested loop" is a single pass over the big side
    "q_gapfill", // hours grid × distinct-types (both plan-constant)
    "q_mix_sources", // per-source counts × 1-row totals
    "q_tfidf", // (doc,term,tf) rows × 1-row n_docs count
    "q_rfm_segments", // per-customer rows × 1-row date anchor
    "q_bm25", // matching docs × 1-row corpus-stats aggregate (N/avgdl/df)
    "q_doc_perplexity", // eval bigrams × 1-row vocabulary-size aggregate
    "q_curriculum_buckets", // ranked docs × 1-row corpus-count aggregate
    "q_hard_negatives", // broadcast anchor batch, documented baseline
    "q_source_temperature", // per-source rows × 1-row normalizer
    "q_token_budget", // ranked docs × 1-row budget aggregate
    "q_quality_perplexity", // CE rows × 1-row count (the perplexity
                            // vocab 1-row V cross join rides along)
    "q_epoch_plan", // per-source rows × 1-row normalizer (the
                    // q_source_temperature shape)
    "q_minhash_recall", // ≤ band-count curve rows × 1-row truth total
    "q_srp_recall", // its TRUTH side is the q_dedup_embed exact
                    // brute-force pair join (the calibration's
                    // documented cost — sampled at scale) + the
                    // minhash_recall 1-row truth-total cross
    "q_psi_drift", // (type,day,bucket) group rows × 1-row min/max anchor
                   // and × the 10-row bucket spine (both plan-constant)
    "q_source_kl", // vocab-grid rows × |sources|-row totals and × the
                   // 1-row (N, V) corpus aggregate
    "q_cust_balance", // customer rows × the 1-row positive-balance
                      // average (the Q22 scalar bar)
    "q_top_value_parts", // per-part group rows × 1-row (total, n_parts)
    "q_semantic_clusters", // the q_dedup_embed brute-force pair baseline
                           // feeding the CC loop (banded/IVF twins are
                           // the scale path, VectorOps Scaladoc)
    "q_top_supplier", // per-supplier group rows × 1-row exact max
    "q_source_containment", // |sources|-row output spine crossed with
                            // itself under a ≠ predicate (the gapfill
                            // plan-constant grid class)
    "q_recall_audit", // corpus scan × the auditN-row broadcast slice —
                      // the documented bounded-side brute-force truth
    "q_quantize_recall", // corpus sim scan × the bounded broadcast
                         // anchor slice (the hard_negatives /
                         // recall_audit class) — at true scale the IVF
                         // index serves; this exact form is the
                         // calibration (operator Scaladoc)
    "q_quantize_recall_clip", // same machinery as q_quantize_recall
                              // (shared quantizeRecallScaled body) —
                              // only the d-row scale rule differs
    "q_pca_quantize_recall", // the shared topkOverlapReport tail:
                             // corpus sim scan × the bounded broadcast
                             // anchor slice (the quantize_recall class)
    "q_ivf_balance", // nlist-row cell spine × the 1-row
                     // (n_total, pair_cost) aggregate
    "q_epoch_plan_dedup", // per-label rows × 1-row normalizer (the
                          // q_epoch_plan shape over post-dedup masses)
    "q_ivf_served_recall", // truth side = the quantize_recall
                           // broadcast-anchor sim scan (bounded side);
                           // the audit's REPORT materializes eagerly
                           // (localCheckpoint before the temp index is
                           // deleted), so the graded plan the sweep sees
                           // is the checkpoint scan — this entry
                           // documents the interior join it rode
    "q_ivf_served_recall_clip" // the same ivfServedRecallScaled body as
                               // q_ivf_served_recall — only the d-row
                               // scale rule differs (clipScalesOf); the
                               // interior joins and eager checkpoint
                               // are documented one entry up
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var findings = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val plan = exec.toString
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val cart = plan.contains("CartesianProduct")
        if (cart) { println(s"CARTESIAN  $name"); findings += 1 }
        if (bnlj && !AllowedBnlj(name)) {
          println(s"BNLJ       $name"); findings += 1
        }
        if (bnlj && AllowedBnlj(name)) println(s"bnlj-ok    $name")
        // repeated scans of one table: each is a full pass over that
        // table at scale — flag for review (self-joins and decorrelated
        // aggregates legitimately pay 2; anything higher usually wants
        // the localCheckpoint cut)
        val perTable = exec.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.headOption
              .map(_.getName).getOrElse("?")
        }.groupBy(identity).view.mapValues(_.size)
        perTable.filter(_._2 >= 2).foreach { case (t, n) =>
          println(s"rescan     $name: $t x$n")
        }
      } catch {
        case e: Exception =>
          println(s"ERROR      $name: ${e.getMessage.linesIterator.next()}")
          findings += 1
      }
    }
    println(s"AUDIT_FINDINGS=$findings")
    spark.stop()
  }
}
