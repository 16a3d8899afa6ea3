package graft

import org.apache.spark.sql.functions._

/** Behavioral checks for the round-8 operators beyond the oracle
  * gate's value equality: the Bloom filter's no-false-negative
  * guarantee, RRF fusion arithmetic, MRR bounds, interpolation
  * betweenness, and per-language reconciliation of the fertility and
  * perplexity-bucket reports. */
class Round8OpsSpec extends SparkSpecBase {

  test("bloom prefilter: no false negatives, tallies reconcile per doc") {
    val rows = Catalog.byName("q_dedup_bloom_prefilter").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (w, h, t, fp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(h <= w, s"doc ${r.getLong(0)}: more hits than windows")
      // the Bloom guarantee: every true member hits the filter
      assert(t <= h, s"doc ${r.getLong(0)}: false negative (true=$t > hits=$h)")
      assert(fp == h - t, s"doc ${r.getLong(0)}: fp tally does not reconcile")
    }
    // the filter must actually prune at this load: corpus-wide, bloom
    // hits stay well below the probed window count
    val (sumW, sumH) = rows.foldLeft((0L, 0L)) { case ((w, h), r) =>
      (w + r.getLong(1), h + r.getLong(2)) }
    assert(sumH < sumW / 2,
      s"filter prunes nothing: $sumH hits of $sumW windows")
  }

  test("bloom prefilter agrees with decontamination: exact membership identical") {
    // both operators hash the SAME per-doc distinct 5-gram windows
    // against the SAME bucket>=95 eval split — decontaminate's
    // n_contam and the bloom probe's exact-path n_true must be the
    // same number for every doc, and the window totals must match
    val bloom = Catalog.byName("q_dedup_bloom_prefilter").fn(spark, sfDir)
      .select(col("doc_id"), col("n_windows").as("bw"), col("n_true"))
    val deco = Catalog.byName("q_dedup_decontaminate").fn(spark, sfDir)
      .select(col("doc_id"), col("n_windows").as("dw"), col("n_contam"))
    val j = bloom.join(deco, Seq("doc_id"), "full_outer").collect()
    assert(j.nonEmpty)
    for (r <- j) {
      assert(!r.isNullAt(1) && !r.isNullAt(3),
        s"doc ${r.getLong(0)} present in only one operator")
      assert(r.getLong(1) == r.getLong(3),
        s"doc ${r.getLong(0)}: window counts diverge")
      assert(r.getLong(2) == r.getLong(4),
        s"doc ${r.getLong(0)}: exact membership diverges (bloom n_true=" +
          s"${r.getLong(2)}, decontaminate n_contam=${r.getLong(4)})")
    }
  }

  test("rrf fusion: scores recompute from the ranks, fused order is dense") {
    val rows = Catalog.byName("q_eval_rrf").fn(spark, sfDir)
      .orderBy(col("fused_rank")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Double.MaxValue
    for ((r, i) <- rows.zipWithIndex) {
      val rs = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rs.nonEmpty || rd.nonEmpty,
        s"doc ${r.getLong(0)} fused without appearing in either leg")
      val expected = rs.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rd.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(r.getDouble(3) == expected,
        s"doc ${r.getLong(0)}: rrf_score ${r.getDouble(3)} != $expected")
      assert(r.getLong(4) == i + 1, "fused_rank must be dense 1..n")
      assert(r.getDouble(3) <= prev, "fused order must be non-increasing")
      prev = r.getDouble(3)
    }
  }

  test("mrr: bounded by n_found/n_queries and scaled sum consistent") {
    val r = Catalog.byName("q_eval_mrr").fn(spark, sfDir).head()
    val (nq, nf, scaled, mrr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nq > 0 && nf <= nq)
    assert(mrr >= 0.0 && mrr <= 1.0)
    // each found query contributes at most 1e9 (rank 1)
    assert(scaled <= nf * 1000000000L)
    assert(mrr == scaled.toDouble / 1e9 / nq)
  }

  test("interpolation: exact on filled bins, between its neighbors in gaps") {
    val rows = Catalog.byName("q_events_interpolate").fn(spark, sfDir)
      .orderBy(col("event_type"), col("bin_start")).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    for ((_, series) <- byType) {
      val raw = series.map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      for (i <- series.indices) {
        val interp =
          if (series(i).isNullAt(4)) None else Some(series(i).getDouble(4))
        raw(i) match {
          case Some(v) => assert(interp.contains(v),
            "a bin with data must pass through unchanged")
          case None =>
            val pv = raw.slice(0, i).flatten.lastOption
            val nv = raw.slice(i + 1, series.length).flatten.headOption
            (pv, nv) match {
              case (Some(p), Some(n)) =>
                val (lo, hi) = (math.min(p, n), math.max(p, n))
                assert(interp.exists(v => v >= lo && v <= hi),
                  s"interpolated value $interp outside [$lo, $hi]")
              case _ => assert(interp.isEmpty,
                "leading/trailing gaps must not extrapolate")
            }
        }
      }
    }
  }

  test("fertility: language partition covers the corpus, ratios sane") {
    val rows = Catalog.byName("q_text_fertility").fn(spark, sfDir).collect()
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    for (r <- rows) {
      // every whitespace word is at least one subword run
      assert(r.getDouble(5) >= 1.0, s"${r.getString(0)}: fertility < 1")
      assert(r.getDouble(6) > 0.0)
    }
  }

  test("ccnet buckets: per-language terciles partition and order by score") {
    val rows = Catalog.byName("q_text_ccnet_buckets").fn(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getString(0))
    for ((lang, bs) <- byLang) {
      assert(bs.map(_.getString(1)).toSet == Set("head", "middle", "tail"),
        s"$lang: missing bucket")
      def b(name: String) = bs.find(_.getString(1) == name).get
      // score ordering is (desc): head floor >= middle ceiling >= ...
      assert(b("head").getLong(3) >= b("middle").getLong(4),
        s"$lang: head/middle overlap")
      assert(b("middle").getLong(3) >= b("tail").getLong(4),
        s"$lang: middle/tail overlap")
      // ntile balance: bucket sizes differ by at most one
      val sizes = bs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang: unbalanced terciles")
    }
  }

  test("label model: votes partition the corpus, overlap/conflict bounded") {
    val r = Catalog.byName("q_label_model_stats").fn(spark, sfDir).head()
    val n = r.getLong(0)
    val (covLen, covSym, covStop) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val (oLS, oLT, oST) = (r.getLong(4), r.getLong(5), r.getLong(6))
    val (cLS, cLT, cST) = (r.getLong(7), r.getLong(8), r.getLong(9))
    val (nKeep, nDrop, nAbstain) = (r.getLong(10), r.getLong(11), r.getLong(12))
    assert(nKeep + nDrop + nAbstain == n,
      "majority labels must partition the corpus")
    assert(covLen <= n && covSym <= n && covStop <= n)
    assert(oLS <= math.min(covLen, covSym), "overlap exceeds a coverage")
    assert(oLT <= math.min(covLen, covStop))
    assert(oST <= math.min(covSym, covStop))
    assert(cLS <= oLS && cLT <= oLT && cST <= oST,
      "conflicts only exist where LFs overlap")
  }

  test("seasonal naive: errors reconcile, mae is the single division") {
    val rows = Catalog.byName("q_events_seasonal_naive").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, sae, worst, mae) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n > 0 && worst <= sae, s"${r.getString(0)}: worst > total")
      assert(mae == sae.toDouble / n / 100.0,
        s"${r.getString(0)}: mae does not reconcile")
    }
  }

  test("forecast metrics: rmse dominates mae, r2 bounded above by one") {
    val rows = Catalog.byName("q_eval_forecast_metrics").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mae, rmse, r2) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(n > 0 && mae >= 0.0)
      // quadratic mean >= arithmetic mean of |errors|, always
      assert(rmse >= mae - 1e-12, s"${r.getString(0)}: rmse $rmse < mae $mae")
      assert(r2 <= 1.0, s"${r.getString(0)}: r2 above 1")
    }
  }

  test("dlq routing: partition of the fact table, routes match reasons") {
    val rows = Catalog.byName("q_migrate_dlq_routing").fn(spark, sfDir)
      .collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables(spark, sfDir, "lineitem").count(),
      "every fact row must route exactly once")
    for (r <- rows) {
      val (route, reason) = (r.getString(0), r.getString(1))
      assert(if (reason == "pass") route == "main" else route == "dlq",
        s"route/reason mismatch: $route/$reason")
      assert(r.getLong(3) <= r.getLong(2), "more orders than rows")
    }
    assert(rows.exists(_.getString(0) == "dlq"),
      "policy gates should quarantine something on this fixture")
  }

  test("edge support: jaccard bounded, ranks dense, order consistent") {
    val rows = Catalog.byName("q_graph_edge_support").fn(spark, sfDir)
      .orderBy(col("rnk")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = (Long.MaxValue, Long.MaxValue)
    for ((r, i) <- rows.zipWithIndex) {
      val (sup, jac) = (r.getLong(2), r.getLong(3))
      assert(jac >= 0 && jac <= 1000000L, "jaccard_e6 out of range")
      assert(r.getLong(4) == i + 1, "rnk must be dense 1..n")
      assert(sup < prev._1 || (sup == prev._1 && jac <= prev._2),
        "order must be non-increasing on (support, jaccard)")
      prev = (sup, jac)
    }
  }

  test("importance scoring: top-25 ranked by score with dense ranks") {
    val rows = Catalog.byName("q_sample_importance").fn(spark, sfDir)
      .orderBy(col("rnk")).collect()
    assert(rows.length == 25)
    var prev = Long.MaxValue
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getLong(3) == i + 1)
      assert(r.getLong(1) <= prev, "scores must be non-increasing by rank")
      prev = r.getLong(1)
    }
  }
}
