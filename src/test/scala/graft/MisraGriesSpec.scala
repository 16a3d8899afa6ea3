package graft

import graft.functions.{GraftFunctions, MgState}
import org.apache.spark.sql.functions._

/** Pins the Misra-Gries frequent-items sketch (MisraGries.scala):
  * exactness below capacity, the est<=true / err<=n/(k+1) contract
  * under adversarial merge trees, and heavy-hitter completeness on a
  * skewed stream (the fixture corpus is near-uniform, so the catalog
  * entry q_sketch_heavy_hitters can only oracle the contract — the
  * completeness behavior lives here).
  */
class MisraGriesSpec extends SparkSpecBase {

  private def stream(seed: Int, n: Int): Seq[String] = {
    // deterministic skew: key "hot" ~ half the stream, 97 cold keys
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      if (rnd.nextInt(2) == 0) "hot" else s"c${rnd.nextInt(97)}"
    }
  }

  private def trueCounts(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def contractHolds(st: MgState, truth: Map[String, Long], n: Long,
      k: Int): Unit = {
    assert(st.counts.size <= k, s"retained ${st.counts.size} > k=$k")
    truth.foreach { case (key, t) =>
      val est = st.counts.getOrElse(key, 0L)
      assert(est <= t, s"$key overestimated: $est > $t")
      assert((t - est) * (k + 1) <= n,
        s"$key error ${t - est} above n/(k+1) = ${n / (k + 1)}")
    }
    // no phantom keys
    st.counts.keys.foreach(key => assert(truth.contains(key)))
  }

  test("exact below capacity") {
    val st = new MgState(16)
    val s = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ Seq.fill(1)("c")
    new scala.util.Random(1).shuffle(s).foreach(st.insert(_))
    assert(st.counts.toMap === Map("a" -> 40L, "b" -> 7L, "c" -> 1L))
  }

  test("contract holds under adversarial merge trees") {
    val k = 16
    val s = stream(42, 20000)
    val truth = trueCounts(s)
    // linear merge, balanced merge, and skew-first merge of 8 chunks
    val chunks = s.grouped(2500).toSeq
    def build(c: Seq[String]): MgState = {
      val st = new MgState(k); c.foreach(st.insert); st
    }
    val linear = chunks.map(build).reduceLeft { (a, b) => a.mergeIn(b); a }
    contractHolds(linear, truth, s.length.toLong, k)
    val balanced = chunks.map(build).grouped(2)
      .map(_.reduceLeft { (a, b) => a.mergeIn(b); a }).toSeq
      .reduceLeft { (a, b) => a.mergeIn(b); a }
    contractHolds(balanced, truth, s.length.toLong, k)
    val reversed = chunks.reverse.map(build)
      .reduceLeft { (a, b) => a.mergeIn(b); a }
    contractHolds(reversed, truth, s.length.toLong, k)
  }

  test("heavy hitter survives a distributed aggregate with its bound") {
    import spark.implicits._
    val n = 100000L
    val df = spark.range(0, n, 1, 8).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("c"), (col("id") % 211).cast("string")))
        .as("key"))
    val sk = df.agg(GraftFunctions.misraGries(col("key"), 16).as("sk"))
      .select(explode(arrays_zip(col("sk.key"), col("sk.cnt"))).as("p"))
      .select(col("p.key").as("key"), col("p.cnt").as("est"))
      .as[(String, Long)].collect().toMap
    assert(sk.size <= 16)
    // "hot" holds 50% of the stream; every cold key holds < n/422 —
    // far below the n/17 bound, so hot MUST be present with est
    // within n/17 of its true count
    val hotTrue = n / 2
    assert(sk.contains("hot"), s"hot key evicted; kept ${sk.keys}")
    assert(sk("hot") <= hotTrue)
    assert((hotTrue - sk("hot")) * 17 <= n)
  }
}
