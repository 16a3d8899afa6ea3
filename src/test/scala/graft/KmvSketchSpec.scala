package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** KMV (theta) sketch aggregate: k smallest distinct hashes, invariant
  * under partitioning/merge order, with calibrated estimates. */
class KmvSketchSpec extends SparkSpecBase {

  import spark.implicits._

  test("sketch is the k smallest distinct values, ascending") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 6L)
    val got = vals.toDF("h")
      .agg(GraftFunctions.kmv(col("h"), 64).as("sk"))
      .head().getSeq[Long](0)
    assert(got === vals.distinct.sorted)
  }

  test("full sketch caps at k and keeps the minima across partitions") {
    val n = 10000
    // deterministic pseudo-random longs in [0, 2^32)
    val vals = (0 until n).map(i => (i * 2654435761L + 12345L) % 4294967296L)
    val expected = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(GraftFunctions.kmv(col("h"), 64).as("sk"))
        .head().getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    val got = Seq[Option[Long]](None, Some(4L), None, Some(2L))
      .toDF("h")
      .agg(GraftFunctions.kmv(col("h"), 64).as("sk"))
      .head().getSeq[Long](0)
    assert(got === Seq(2L, 4L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(GraftFunctions.kmv(col("h"), 64).as("sk"))
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("distinct estimate lands within 3 standard errors of exact") {
    val n = 20000
    val k = 256
    val hashed = (0 until n).map(i => s"v$i").toDF("s")
      .select(graft.ops.TextOps.h32(col("s")).as("h"))
    val exact = hashed.distinct().count()
    val sk = hashed.agg(GraftFunctions.kmv(col("h"), k).as("sk"))
      .head().getSeq[Long](0)
    assert(sk.size === k)
    val est = (k - 1) * 4294967296.0 / sk.last
    // KMV relative standard error ~ 1/sqrt(k-2)
    val tol = 3.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - exact) / exact < tol,
      s"est=$est exact=$exact tol=$tol")
  }

  test("oracled queries run and are sane on the sf0.001 fixture") {
    val theta = Catalog.byName("q_sketch_theta").fn(spark, sfDir)
    val rows = theta.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val est = r.getAs[Double]("est_distinct")
      assert(est > 0 && math.abs(est - exact) / exact < 0.5,
        s"implausible estimate: $r")
    }
    val setops = Catalog.byName("q_sketch_theta_setops").fn(spark, sfDir)
      .collect()
    assert(setops.length === 1)
    val so = setops.head
    assert(so.getAs[Double]("est_union") > 0)
    assert(so.getAs[Double]("est_inter") >= 0)
    assert(so.getAs[Double]("est_union") >= so.getAs[Double]("est_inter"))
  }
}
