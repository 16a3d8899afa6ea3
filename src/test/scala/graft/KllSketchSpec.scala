package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** KLL quantile sketch aggregate: bounded mergeable state whose
  * rank-error contract holds under any partitioning/merge order (the
  * property q_sketch_kll_quantile's driver oracle rests on). */
class KllSketchSpec extends SparkSpecBase {

  import spark.implicits._

  /** Exact rank of the sketch's q-quantile estimate, as a fraction. */
  private def rankErr(vals: Seq[Double], sketch: Seq[(Double, Long)],
      q: Double): Double = {
    val tot = sketch.map(_._2).sum
    var cum = 0L
    val est = sketch.sortBy(_._1).collectFirst {
      case (v, w) if { cum += w; cum >= q * tot } => v
    }.get
    val exactRank = vals.count(_ <= est).toDouble / vals.size
    math.abs(exactRank - q)
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame,
      k: Int): Seq[(Double, Long)] = {
    val r = df.agg(GraftFunctions.kll(col("x"), k).as("sk")).head()
      .getStruct(0)
    val vs = r.getSeq[Double](0)
    val ws = r.getSeq[Long](1)
    vs.zip(ws)
  }

  test("small input is retained exactly (weight 1 each, sorted)") {
    val vals = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val sk = sketchOf(vals.toDF("x"), 128)
    assert(sk === vals.sorted.map((_, 1L)))
  }

  test("total weight equals input count at every partitioning") {
    val n = 50000
    val vals = (0 until n).map(i => ((i * 2654435761L) % 100000).toDouble)
    for (parts <- Seq(1, 8, 32)) {
      val sk = sketchOf(vals.toDF("x").repartition(parts), 128)
      assert(sk.map(_._2).sum === n.toLong, s"parts=$parts")
      // state is bounded: levels * k, far below n
      assert(sk.size < 128 * 16, s"parts=$parts size=${sk.size}")
    }
  }

  test("rank error within 5% on uniform + skewed data, any merge order") {
    val n = 60000
    val uniform = (0 until n).map(i => ((i * 2654435761L) % 1000000).toDouble)
    val skewed = (0 until n).map { i =>
      val u = ((i * 1103515245L + 12345L) % 1048576).toDouble / 1048576.0
      math.pow(u, 8) * 1e6 // heavy head at 0
    }
    for (data <- Seq(uniform, skewed); parts <- Seq(1, 8, 32);
         q <- Seq(0.25, 0.5, 0.75, 0.95)) {
      val sk = sketchOf(data.toDF("x").repartition(parts), 400)
      val err = rankErr(data, sk, q)
      assert(err <= 0.05, s"parts=$parts q=$q err=$err")
    }
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    val sk = sketchOf(
      Seq[Option[Double]](None, Some(2.0), None, Some(1.0)).toDF("x"), 128)
    assert(sk === Seq((1.0, 1L), (2.0, 1L)))
    val empty = sketchOf(Seq.empty[Double].toDF("x"), 128)
    assert(empty.isEmpty)
  }

  test("grouped sketches stay per-group (no cross-group bleed)") {
    val df = (0 until 10000)
      .map(i => (if (i % 2 == 0) "a" else "b",
        (if (i % 2 == 0) i else i + 1000000).toDouble))
      .toDF("g", "x")
    val rows = df.groupBy("g")
      .agg(GraftFunctions.kll(col("x"), 128).as("sk"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    val aMax = rows("a").getSeq[Double](0).max
    val bMin = rows("b").getSeq[Double](0).min
    assert(aMax < 1000000 && bMin >= 1000000)
  }
}
