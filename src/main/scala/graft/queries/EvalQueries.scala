package graft.queries

import graft.QueryDef
import graft.functions.GraftFunctions
import graft.ops.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-quality evaluation: measure an approximate operator
  * against its exact baseline INSIDE the engine, the way a training
  *-data pipeline audits its own recall before shipping a corpus. The
  * first entry scores the PQ/ADC path against brute-force cosine
  * top-k. Both sides are deterministic (sorted folds, integer-scaled
  * distances, fixed tiebreaks), so even this meta-query has an exact
  * DuckDB twin — the recall numbers themselves are oracled.
  *
  * Scale: the eval runs on the sampled query set only (fixed fraction
  * of the corpus); both legs are the same broadcast-and-scan shapes as
  * the operators they audit.
  */
object EvalQueries {

  private val k = 5

  val defs: Seq[QueryDef] = Seq(

    // ---- recall@5 of PQ ADC ranking vs exact cosine top-5 ----
    QueryDef("q_eval_pq_recall", Some {
      import SimilarityQueries.{pqBaseSql, querySetPred}
      s"""WITH $pqBaseSql,
         |nv AS (SELECT vec_id, v, ${normDSql("v")} AS nrm FROM n),
         |brute AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${dotDSql("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
         |    FROM (SELECT * FROM nv WHERE $querySetPred) q
         |    JOIN nv c ON c.vec_id <> q.vec_id)
         |  WHERE rnk <= $k),
         |dtable AS (
         |  SELECT vec_id AS query_id, subspace, code,
         |    CAST(floor(dist * 1000000000) AS BIGINT) AS d_scaled
         |  FROM dists WHERE $querySetPred),
         |adc AS (
         |  SELECT dtable.query_id, codes.vec_id AS candidate_id,
         |    CAST(sum(dtable.d_scaled) AS BIGINT) AS adc_scaled
         |  FROM codes JOIN dtable
         |    ON codes.subspace = dtable.subspace AND codes.code = dtable.code
         |  WHERE codes.vec_id <> dtable.query_id
         |  GROUP BY dtable.query_id, codes.vec_id),
         |adc_top AS (
         |  SELECT query_id, candidate_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc_scaled, candidate_id) AS rnk FROM adc)
         |  WHERE rnk <= $k)
         |SELECT b.query_id, count(a.candidate_id) AS n_hits,
         |  count(a.candidate_id) / ${k}.0 AS recall_at_$k
         |FROM brute b LEFT JOIN adc_top a
         |  ON a.query_id = b.query_id AND a.candidate_id = b.neighbor_id
         |GROUP BY b.query_id""".stripMargin
    })(
      (s, d) => {
        import SimilarityQueries.{pqBase, querySetPred, vecs}
        // exact leg: brute-force cosine top-k (same shape as q_ann_brute_topk)
        val n = vecs(s, d)
        val q = n.where(expr(querySetPred))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        val c = n.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn"))
        val wB = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
        val brute = broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
          .withColumn("cos_sim",
            GraftFunctions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .withColumn("rnk", row_number().over(wB))
          .where(col("rnk") <= k)
          .select(col("query_id"), col("neighbor_id"))
        // approximate leg: ADC over PQ codes (same shape as q_ann_pq_search)
        val (dists, codes) = pqBase(s, d)
        val dtable = dists.where(expr(querySetPred))
          .select(col("vec_id").as("query_id"), col("subspace"), col("code"),
            floor(col("dist") * 1000000000L).cast("bigint").as("d_scaled"))
        val adc = codes.select(col("vec_id").as("candidate_id"),
            col("subspace"), col("code"))
          .join(broadcast(dtable), Seq("subspace", "code"))
          .where(col("candidate_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("candidate_id"))
          .agg(sum(col("d_scaled")).as("adc_scaled"))
        val wA = Window.partitionBy(col("query_id"))
          .orderBy(col("adc_scaled").asc, col("candidate_id").asc)
        val adcTop = adc.withColumn("rnk", row_number().over(wA))
          .where(col("rnk") <= k)
          .select(col("query_id"), col("candidate_id"))
        brute.alias("b")
          .join(adcTop.alias("a"),
            col("a.query_id") === col("b.query_id") &&
              col("a.candidate_id") === col("b.neighbor_id"), "left")
          .groupBy(col("b.query_id").as("query_id"))
          .agg(count(col("a.candidate_id")).as("n_hits"),
            (count(col("a.candidate_id")) / lit(k.toDouble)).as(s"recall_at_$k"))
      }),

    // ---- language-ID confusion matrix + per-class recall: the
    // classifier-audit twin of q_text_langid, built by COMPOSING the
    // catalog — both the Spark plan and the oracle wrap the langid
    // entry itself, so the eval can never drift from the operator it
    // audits. Per-class recall is one exact-integer division; the
    // matrix is a |langs|² aggregate. ----
    QueryDef("q_eval_langid_confusion", Some {
      // composes TextQueries directly (not via Catalog — Catalog.all
      // evaluates THIS defs val, so a byName call here would re-enter
      // the object initializer)
      val inner = TextQueries.defs.find(_.name == "q_text_langid").get.oracle.get
      s"""WITH l AS ($inner)
         |SELECT declared, guess,
         |  count(*) AS n,
         |  CAST(count(CASE WHEN is_match THEN 1 END) AS DOUBLE)
         |    / count(*) AS cell_recall
         |FROM l GROUP BY declared, guess""".stripMargin
    })(
      (s, d) =>
        TextQueries.defs.find(_.name == "q_text_langid").get.fn(s, d)
          .groupBy(col("declared"), col("guess"))
          .agg(count(lit(1)).as("n"),
            (count(when(col("is_match"), 1)).cast("double")
              / count(lit(1))).as("cell_recall"))),

    // ---- near-dup cluster statistics: the dedup RELEASE summary —
    // cluster-size histogram plus the removal rate — composed from
    // the connected-components catalog entry itself (plan and oracle
    // both wrap q_dedup_clusters, so the report can never drift from
    // the clustering it describes). Two tiny aggregates over the
    // |docs|-row label frame. ----
    QueryDef("q_eval_cluster_stats", Some {
      val inner = DedupQueries.defs.find(_.name == "q_dedup_clusters").get.oracle.get
      s"""WITH sizes AS (
         |  SELECT cluster_id, count(*) AS sz
         |  FROM ($inner) l GROUP BY cluster_id)
         |SELECT sz AS cluster_size,
         |  count(*) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM sizes GROUP BY sz""".stripMargin
    })(
      (s, d) =>
        DedupQueries.defs.find(_.name == "q_dedup_clusters").get.fn(s, d)
          .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz")).as("n_docs"),
            sum(col("sz") - 1).as("n_removable"))),

    // ---- pass@k (k=5): the standard unbiased estimator
    // 1 − C(n−c, k)/C(n, k) over per-task samples (n attempts, c
    // passes), here tasks = parts and an attempt passes when its
    // lineitem quantity ≥ 25. The binomial ratio is computed as a
    // quotient of EXACT integer falling-factorial products (k=5 →
    // five BIGINT factors per side, far below 2^63 for fixture n),
    // so the only FP op is one IEEE division — oracle-exact. The
    // corpus mean goes through the established scaled-integer-sum
    // pattern (floor(x·10^9 + 0.5) per task, BIGINT sum, one final
    // divide) because a raw avg() of doubles is partition-order-
    // dependent. One shuffle for the per-task agg, a single-row
    // reduce for the mean — the eval costs one pass at any corpus
    // size. ----
    QueryDef("q_eval_pass_at_k", Some(
      """WITH o AS (
        |  SELECT l_partkey AS task, count(*) AS n,
        |    count(CASE WHEN l_quantity >= 25 THEN 1 END) AS c
        |  FROM lineitem GROUP BY 1 HAVING count(*) >= 5),
        |e AS (
        |  SELECT task, n, c,
        |    CASE WHEN n - c < 5 THEN CAST(1.0 AS DOUBLE)
        |         ELSE 1.0 - CAST((n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4) AS DOUBLE)
        |                  / CAST(n*(n-1)*(n-2)*(n-3)*(n-4) AS DOUBLE)
        |    END AS pass_at_5
        |  FROM o)
        |SELECT count(*) AS n_tasks, CAST(sum(n) AS BIGINT) AS n_samples,
        |  CAST(sum(c) AS BIGINT) AS n_passes,
        |  CAST(sum(CAST(floor(pass_at_5 * 1000000000 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS pass_at_5_e9_sum
        |FROM e""".stripMargin))(
      (s, d) => {
        val o = graft.Tables(s, d, "lineitem")
          .groupBy(col("l_partkey").as("task"))
          .agg(count(lit(1)).as("n"),
            count(when(col("l_quantity") >= 25, 1)).as("c"))
          .where(col("n") >= 5)
        val f = col("n") - col("c")
        val failAll = (f * (f - 1) * (f - 2) * (f - 3) * (f - 4)).cast("double") /
          (col("n") * (col("n") - 1) * (col("n") - 2) * (col("n") - 3) *
            (col("n") - 4)).cast("double")
        o.withColumn("pass_at_5",
            when(f < 5, lit(1.0)).otherwise(lit(1.0) - failAll))
          .agg(count(lit(1)).as("n_tasks"), sum(col("n")).as("n_samples"),
            sum(col("c")).as("n_passes"),
            sum(floor(col("pass_at_5") * 1000000000 + 0.5).cast("bigint"))
              .as("pass_at_5_e9_sum"))
      })
  )
}
