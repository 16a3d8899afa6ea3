package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The KLL sketch powering a write-path decision: equi-depth range
  * boundaries from one sketch pass (mergeable partials — no global
  * sort), then a range bucketing whose balance is bounded by the
  * sketch's rank-error contract. This is how a 100 TB writer picks
  * repartitionByRange boundaries without sampling the corpus twice:
  * sketch once, cut at estimated octiles, and the worst bucket is off
  * by at most twice the rank error.
  */
class KllLayoutSpec extends SparkSpecBase {

  test("octile boundaries from the sketch yield balanced range buckets") {
    val li = Tables(spark, sfDir, "lineitem").select(col("l_extendedprice"))
    val n = li.count()

    // one sketch pass; the (value, weight) pairs are tiny — safe to
    // bring to the driver for boundary extraction
    val pairs = li.agg(GraftFunctions.kll(col("l_extendedprice"), 400).as("sk"))
      .select(explode(arrays_zip(col("sk.v"), col("sk.w"))).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val tot = pairs.map(_._2).sum
    assert(tot === n, "sketch weights must conserve total count")

    // estimated octile boundaries: first value whose cumulative
    // weight reaches i/8 of the total
    val cum = pairs.scanLeft(0L)(_ + _._2).tail
    val bounds = (1 to 7).map { i =>
      val target = (tot * i) / 8.0
      pairs(cum.indexWhere(_ >= target))._1
    }
    assert(bounds == bounds.sorted, s"boundaries must ascend: $bounds")

    // bucket by the estimated boundaries and measure balance: each
    // boundary's exact rank is within 5% of target (the catalog
    // entry's contract), so each bucket holds n/8 +- 2*5% of n
    val bucket = bounds.zipWithIndex.drop(1)
      .foldLeft(when(col("l_extendedprice") < bounds.head, 0)) {
        case (acc, (b, i)) => acc.when(col("l_extendedprice") < b, i)
      }.otherwise(7)
    val sizes = li.groupBy(bucket.as("bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (0 to 7).toSet, s"empty bucket: $sizes")
    val slack = (0.10 * n).toLong
    sizes.foreach { case (b, c) =>
      assert(math.abs(c - n / 8) <= slack,
        s"bucket $b holds $c rows, expected ${n / 8} +- $slack")
    }
  }
}
