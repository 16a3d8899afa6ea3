package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Co-occurrence / association mining (north-star extension): the
  * market-basket primitive behind recommendation and affinity
  * analysis, expressed as a bounded self-join — pair enumeration
  * fans out only within a basket (lineitems per order are bounded),
  * never across the corpus.
  */
object AffinityQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- top co-occurring part pairs with support / confidence /
    // lift. Baskets are orders; items the DISTINCT parts in each.
    // The pair join is an equi-join on the basket key with p1 < p2,
    // so fanout is (items-per-basket choose 2) — bounded by the
    // basket size, not the catalog. Supports are exact integers;
    // confidence and lift are each ONE correctly-rounded double
    // division of exact-integer products (lift's cross-multiplied
    // form keeps the numerator/denominator < 2^63 far beyond this
    // scale), so both engines agree bitwise. Top-20 is
    // TakeOrderedAndProject — no global sort of the pair space. ----
    QueryDef("q_basket_pairs", Some(
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |supp AS (SELECT p, count(*) AS s FROM items GROUP BY p),
        |n AS (SELECT count(DISTINCT o) AS n_baskets FROM items),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, count(*) AS sp
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p)
        |SELECT p1, p2, sp AS support,
        |  CAST(sp AS DOUBLE) / CAST(s1.s AS DOUBLE) AS confidence,
        |  CAST(sp * n.n_baskets AS DOUBLE)
        |    / CAST(s1.s * s2.s AS DOUBLE) AS lift
        |FROM pairs
        |  JOIN supp s1 ON s1.p = pairs.p1
        |  JOIN supp s2 ON s2.p = pairs.p2
        |  CROSS JOIN n
        |ORDER BY support DESC, p1, p2 LIMIT 20""".stripMargin))(
      (s, d) => {
        // ONE shuffle on the basket key does double duty: partitioning
        // by o satisfies the (o, p) dedup's clustering requirement (o
        // is a subset of the grouping keys), so the distinct runs
        // in-place on the re-keyed partitions with no second exchange,
        // and the pair self-join then reads BOTH sides from the same
        // persisted o-partitioning (no exchange at the join either)
        val items = Tables(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .repartition(col("o")).dropDuplicates("o", "p")
          .persist() // pair self-join + supports + basket count
        val supp = items.groupBy(col("p")).agg(count(lit(1)).as("s"))
        val nBaskets = items.select(col("o")).distinct().count()
        val a = items.select(col("o"), col("p").as("p1"))
        val b = items.select(col("o"), col("p").as("p2"))
        val pairs = a.join(b, Seq("o")).where(col("p1") < col("p2"))
          .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("sp"))
        pairs
          .join(supp.select(col("p").as("p1"), col("s").as("s1")), "p1")
          .join(supp.select(col("p").as("p2"), col("s").as("s2")), "p2")
          .select(col("p1"), col("p2"), col("sp").as("support"),
            (col("sp").cast("double") / col("s1").cast("double"))
              .as("confidence"),
            ((col("sp") * nBaskets).cast("double")
              / (col("s1") * col("s2")).cast("double")).as("lift"))
          .orderBy(col("support").desc, col("p1"), col("p2"))
          .limit(20)
      })
  )
}
