package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 operators that the DuckDB
  * differential gate cannot express (the oracle proves Spark == SQL
  * twin; these pin properties of the ALGORITHMS themselves, so a
  * future edit that breaks both sides identically still fails). */
class Round9OpsSpec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("CM join-size estimate upper-bounds the exact join size on every hash row") {
    val rows = Catalog.byName("q_sketch_join_size").fn(spark, sfDir).collect()
    assert(rows.length === 4, "one estimate per hash row")
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_r"), r.getAs[Long]("exact"))
      assert(est >= exact,
        s"row ${r.getAs[Long]("r")}: est $est < exact $exact — the CM " +
          "inner product is one-sided by construction")
    }
  }

  test("epoch shuffle emits a bijection onto 1..N per epoch, and epochs differ") {
    val out = Catalog.byName("q_corpus_epoch_shuffle").fn(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("epoch"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    val n = out.count(_._1 == 0L)
    for (e <- Seq(0L, 1L)) {
      val pos = out.filter(_._1 == e).map(_._3).sorted
      assert(pos.length === n)
      assert(pos.head === 1L && pos.last === n.toLong &&
        pos.distinct.length === n, s"epoch $e positions are 1..$n exactly")
    }
    val perm0 = out.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val perm1 = out.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(perm0.exists { case (d, p) => perm1(d) != p },
      "the two epochs must be DIFFERENT permutations")
  }

  test("skew-salted join routes the sentinel hot key and only it (sf0.01)") {
    val rows = Catalog.byName("q_join_skew_salted").fn(spark, sf01)
      .collect().map(r => r.getAs[Long]("is_hot") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_pairs"))).toMap
    assert(rows.contains(1L), "the sentinel key must be detected as hot")
    assert(rows(1L)._1 === 1L, "exactly one hot key (the -1 sentinel)")
    assert(rows(0L)._2 > 0L && rows(1L)._2 > 0L, "both lanes carry pairs")
  }

  test("blocking quality: covered pairs bounded by both truth and candidates") {
    val r = Catalog.byName("q_link_blocking_quality").fn(spark, sf01).head()
    val (nTrue, nCand, nCov) = (r.getAs[Long]("n_true_pairs"),
      r.getAs[Long]("n_cand_pairs"), r.getAs[Long]("n_covered_pairs"))
    assert(nCov <= nTrue && nCov <= nCand)
    assert(r.getAs[Long]("rr_ppm") >= 0L && r.getAs[Long]("rr_ppm") <= 1000000L)
    assert(r.getAs[Long]("pc_ppm") >= 0L && r.getAs[Long]("pc_ppm") <= 1000000L)
    assert(nTrue > 0L, "fixture has near-dup clusters — truth must be non-empty")
  }

  test("IVM join delta equals the direct join (merge == recompute)") {
    import graft.{Tables => T}
    val direct = T(spark, sfDir, "orders")
      .join(T(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("bigint"))
          .as("rev_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val maintained = Catalog.byName("q_ivm_join_delta").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(maintained === direct)
  }

  test("markov stationary mass is conserved within integer-truncation loss") {
    val pis = Catalog.byName("q_events_markov_stationary").fn(spark, sfDir)
      .collect().map(_.getAs[Long]("pi3_scaled"))
    val total = pis.sum
    val start = 1000000L * pis.length
    // each of 3 iterations truncates once per (state, incoming edge):
    // loss is bounded by states² per step, far under 1% of the mass
    assert(total <= start && total >= start - 3L * pis.length * pis.length * 1000L,
      s"mass $total vs start $start")
  }
}
