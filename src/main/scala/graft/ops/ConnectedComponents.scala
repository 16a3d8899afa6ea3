package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by label propagation with pointer
  * doubling — the clustering step behind near-dup dedup (group all
  * transitively-linked near-duplicate docs under one cluster id).
  *
  * Scale design:
  *  - operates on EDGE-TOUCHED nodes only. A node with no near-dup pair
  *    keeps label = self forever, so at corpus scale the loop runs on
  *    the (small) near-dup subgraph, not the whole corpus; singletons
  *    rejoin afterwards (the caller does the final left join).
  *  - label := min(label, min over neighbours) each round, then one
  *    pointer-doubling hop (label := label(label)) — halves the
  *    remaining diameter per pass, so convergence is O(log diameter)
  *    rounds instead of O(diameter): a diameter-30 chain converges in
  *    ~5 rounds, not 30.
  *  - every round ends in a RELIABLE `Dataset.checkpoint()` (files in
  *    the checkpoint dir), not `localCheckpoint` (executor-local
  *    blocks). Both truncate the per-iteration lineage — without that,
  *    each round embeds the previous round's plan twice and analysis
  *    cost grows geometrically — but executor-local blocks are lost on
  *    executor death, which on a real cluster mid-loop is fatal: the
  *    lineage needed to recompute them is exactly what was truncated.
  *    Checkpoint files live on the workspace-grade filesystem and
  *    survive any executor loss ([[ChaosSpec]] simulates the loss by
  *    dropping every persisted RDD block mid-loop).
  */
object ConnectedComponents {

  /** Ensure the session has a reliable checkpoint dir. Precedence:
    * an already-set `sc.setCheckpointDir`, then the
    * `spark.graft.checkpoint.dir` conf (a pipeline workspace sets this
    * to its own checkpoint area), then a per-app temp dir. */
  def ensureCheckpointDir(spark: SparkSession): Unit = synchronized {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = spark.conf.getOption("spark.graft.checkpoint.dir")
        .getOrElse(s"${sys.props("java.io.tmpdir")}/graft-ckpt-" +
          spark.sparkContext.applicationId)
      spark.sparkContext.setCheckpointDir(dir)
    }
  }

  /** Labels every node that appears in `edges` (columns `a`, `b`; must
    * contain both orientations of each undirected edge) with the
    * minimum node id of its component. Returns (`node`, `label`).
    *
    * @param chaos test hook, called once per iteration with the
    *              iteration number — production callers leave the
    *              default no-op; [[ChaosSpec]] uses it to destroy
    *              cached blocks mid-loop.
    */
  def labels(spark: SparkSession, edges: DataFrame, maxIters: Int = 25,
             chaos: Int => Unit = _ => ()): DataFrame = {
    ensureCheckpointDir(spark)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).collect().head.getLong(0)

    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .checkpoint()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    while (!converged && iter < maxIters) {
      chaos(iter)
      val prop = edges.join(labels, edges("b") === labels("node"))
        .groupBy(col("a").as("node")).agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(prop, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      val parents = stepped.select(col("node").as("pnode"), col("label").as("plabel"))
      val next = stepped.join(parents, stepped("label") === parents("pnode"), "left")
        .select(stepped("node"),
          least(stepped("label"), coalesce(col("plabel"), stepped("label"))).as("label"))
        .checkpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    // a silent cap would emit wrong cluster_ids for any component
    // whose diameter outruns the iteration budget
    require(converged,
      s"connected-components did not converge within $maxIters iterations")
    labels
  }
}
