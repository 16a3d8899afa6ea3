package graft

import org.apache.spark.sql.functions._

/** Structural checks for the iterative link-analysis operator beyond
  * the oracle's value equality. */
class GraphSpec extends SparkSpecBase {

  test("pagerank: node set matches the bipartite graph and ranks are sane") {
    val li = Tables(spark, sfDir, "lineitem")
    val nParts = li.select(col("l_partkey")).distinct().count()
    val nSupps = li.select(col("l_suppkey")).distinct().count()
    val pr = Catalog.byName("q_graph_pagerank").fn(spark, sfDir)
    val rows = pr.collect()
    assert(rows.length == nParts + nSupps, "one rank per node")
    assert(rows.count(_.getBoolean(1)) == nParts, "even ids are parts")
    // damping guarantees every node keeps at least the teleport mass,
    // and no node can exceed the total initial mass
    val total = (nParts + nSupps) * 1000000000L
    rows.foreach { r =>
      val v = r.getLong(2)
      assert(v >= 150000000L, s"node ${r.getLong(0)} below teleport floor: $v")
      assert(v < total, s"node ${r.getLong(0)} above total mass: $v")
    }
    // integer flooring only ever loses mass: the grand total after 3
    // damped iterations stays below the initial mass and above the
    // teleport-only floor
    val sum = rows.map(_.getLong(2)).sum
    assert(sum <= total && sum > (nParts + nSupps) * 150000000L)
  }

  test("triangles: oriented count matches a brute-force model") {
    val r = Catalog.byName("q_graph_triangles").fn(spark, sfDir).head()
    val (nEdges, nTri) = (r.getLong(0), r.getLong(1))
    assert(nEdges > 0)
    // brute force on the collected edge set (small at spec scale)
    val items = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = items.alias("a").join(items.alias("b"),
        org.apache.spark.sql.functions.expr("a.o = b.o AND a.p < b.p"))
      .groupBy(col("a.p"), col("b.p")).count()
      .where(col("count") >= 2)
      .select(col("a.p"), col("b.p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length.toLong == nEdges)
    val eSet = edges.toSet
    val byNode = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var tri = 0L
    for ((a, bs) <- byNode; b <- bs; c <- byNode.getOrElse(b, Array.empty[Long]))
      if (eSet.contains((a, c))) tri += 1
    assert(tri == nTri, s"model counted $tri, query $nTri")
  }

  test("pagerank plan: equi-joins only, no cartesian/nested-loop round") {
    val plan = Catalog.byName("q_graph_pagerank").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"iteration should be equi-join + aggregate:\n$plan")
  }
}
