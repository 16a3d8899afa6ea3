package graft

import graft.functions.VectorMeanAggregator
import org.apache.spark.sql.functions._

/** The typed Aggregator (production centroid path) agrees with the
  * deterministic sort-fold centroid query to FP-reassociation
  * tolerance, and its state machinery (zero/reduce/merge/finish)
  * behaves across partitions. */
class VectorMeanSpec extends SparkSpecBase {

  test("udaf centroids ≈ sort-fold centroids (reassociation tolerance)") {
    val mean64 = udaf(new VectorMeanAggregator(64))
    val agg = Tables(spark, sfDir, "embeddings")
      .repartition(7) // force multi-partition merge path
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .groupBy("label").agg(mean64(col("v")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // q_vector_centroids emits exploded (label, n, dim, val) rows —
    // reassemble per-label vectors
    val exact = Catalog.byName("q_vector_centroids").fn(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(agg.keySet === exact.keySet)
    for (k <- agg.keySet; i <- 0 until 64)
      assert(math.abs(agg(k)(i) - exact(k)(i)) < 1e-9,
        s"label $k dim $i: ${agg(k)(i)} vs ${exact(k)(i)}")
  }

  test("LongVecSumAgg: bit-exact and invariant to partition layout") {
    import graft.functions.GraftFunctions
    val base = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1e9))).as("sv"))
    def sums(parts: Int): Map[Int, Seq[Long]] =
      base.repartition(parts).groupBy("label")
        .agg(GraftFunctions.longVecSum(col("sv"), 64).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val one = sums(1)
    val many = sums(13) // different partitioning → different merge order
    assert(one === many, "integer sums must not depend on partitioning")
    // exact agreement with a driver-side reference computation
    val local = Tables(spark, sfDir, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).map(x => math.floor(x * 1e9).toLong))
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> vs.map(_._2).reduce((a, b) => a.zip(b).map { case (p, q) => p + q })
      }
    assert(one === local)
  }

  test("empty group yields zero vector") {
    val a = new VectorMeanAggregator(3)
    assert(a.finish(a.zero) === Seq(0.0, 0.0, 0.0))
    val b = a.reduce(a.zero, Seq(3.0, 6.0, 9.0))
    assert(a.finish(b) === Seq(3.0, 6.0, 9.0))
    val m = a.merge(a.reduce(a.zero, Seq(1.0, 1.0, 1.0)), b)
    assert(a.finish(m) === Seq(2.0, 3.5, 5.0))
  }
}
