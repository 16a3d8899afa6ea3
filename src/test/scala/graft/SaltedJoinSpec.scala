package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Salted-join correctness: result multiset equals the plain join, and
  * a hot key's rows really fan out across salt buckets. */
class SaltedJoinSpec extends SparkSpecBase {

  test("salted join == plain join (deterministic salt)") {
    val o = Tables(spark, sfDir, "orders")
    val c = Tables(spark, sfDir, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    val salted = Relational.saltedJoin(
      o, c, "o_custkey", "c_custkey", buckets = 8,
      saltExpr = pmod(col("o_orderkey"), lit(8)))
      .select(col("o_orderkey"), col("c_custkey"))
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.length > 0 && a.toSeq === b.toSeq)
  }

  test("hot key fans out across salt buckets") {
    import spark.implicits._
    // one pathological key with 1000 rows vs a 3-row dim
    val big = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val dim = Seq((42L, "x")).toDF("dk", "name")
    val joined = Relational.saltedJoin(big, dim, "k", "dk", buckets = 4,
      saltExpr = pmod(col("payload"), lit(4)))
    assert(joined.count() === 1000)
    // the exploded dim meets each salt bucket exactly once
    val buckets = big.withColumn("__salt", pmod(col("payload"), lit(4)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length === 4 && buckets.sum === 1000)
  }

  test("skewBuckets: measured fan-out — wide for hot keys, 1 for uniform") {
    import spark.implicits._
    // one key holds ~all rows → fan-out ≈ numShufflePartitions (capped)
    val hot = ((1 to 990).map(_ => 42L) ++ (1 to 10).map(_.toLong))
      .toDF("k")
    val hotBuckets = Relational.skewBuckets(hot, "k", sampleFraction = 1.0)
    assert(hotBuckets > 1, s"hot key should fan out, got $hotBuckets")

    // uniform keys → no salting overhead
    val uniform = (1 to 1000).map(_.toLong).toDF("k")
    assert(Relational.skewBuckets(uniform, "k", sampleFraction = 1.0) === 1)

    // empty input → degenerate 1
    assert(Relational.skewBuckets(uniform.where(lit(false)), "k") === 1)

    // the auto variant still produces exactly the plain-join rows
    val dim = Seq((42L, "x")).toDF("dk", "name")
    val auto = Relational.saltedJoinAuto(hot, dim, "k", "dk")
    assert(auto.count() === 990)
  }
}
