package graft

import graft.ops.ConnectedComponents
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property test: the distributed pointer-doubling labeler agrees with
  * an in-memory union-find on seeded random graphs — sparse, dense,
  * chain-heavy, and empty shapes. ChaosSpec proves fault tolerance;
  * this pins CORRECTNESS over graph structure. */
class ConnectedComponentsPropSpec extends SparkSpecBase {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val both = df.union(df.select(col("b"), col("a"))).toDF("a", "b")
    ConnectedComponents.labels(spark, both)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs: distributed labels equal union-find roots") {
    for (trial <- 0 until 8) {
      val rnd = new Random(4242L + trial)
      val n = 20 + rnd.nextInt(60)
      val m = rnd.nextInt(3 * n)
      val edges = (0 until m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = run(edges)
        val want = unionFind(n, edges)
        assert(got === want, s"trial $trial (n=$n, m=${edges.size})")
      }
    }
  }

  test("adversarial shapes: long chain, star, two cliques bridged") {
    val chain = (0L until 60L).map(i => (i, i + 1))
    assert(run(chain).values.toSet === Set(0L))
    val star = (1L to 40L).map(i => (0L, i))
    assert(run(star).values.toSet === Set(0L))
    val cliques = (for {
      base <- Seq(100L, 200L); i <- 0 until 5; j <- (i + 1) until 5
    } yield (base + i, base + j)) :+ (104L, 200L) // bridge
    assert(run(cliques).values.toSet === Set(100L))
  }

  test("empty edge set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.labels(spark, empty).isEmpty)
  }
}
