package graft

import graft.ops.Relational
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Differential fuzzing of COMPOSED pipelines (ROADMAP "oracle
  * fuzzing"): ScalaCheck-generated filter → join → aggregate pipelines
  * run as Spark plans and replayed against a naive in-memory model.
  * DuckDB is not linkable in this JVM, so the model plays the oracle —
  * the driver's DuckDB gate pins the fixed catalog; this spec sweeps
  * the combinatorial space around it (predicate bounds × IN-sets ×
  * join types × aggregate mix). Seeds are fixed, so any failure
  * reproduces from its seed number alone. */
final case class FactRow(k: Long, v: Long, s: String)
final case class DimRow(k: Long, w: Long)

class RandomPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val genFacts: Gen[List[FactRow]] = Gen.listOfN(80, for {
    k <- Gen.chooseNum(0L, 15L)
    v <- Gen.chooseNum(-50L, 50L)
    s <- Gen.oneOf("red", "green", "blue")
  } yield FactRow(k, v, s))

  // small key domain → some fact keys matched, some not, per seed
  private val genDims: Gen[List[DimRow]] = Gen.listOfN(8, for {
    k <- Gen.chooseNum(0L, 15L)
    w <- Gen.chooseNum(0L, 9L)
  } yield DimRow(k, w))

  private case class Shape(lo: Long, hi: Long, colors: Set[String], joinType: String)

  private val genShape: Gen[Shape] = for {
    lo <- Gen.chooseNum(-50L, 20L)
    span <- Gen.chooseNum(0L, 60L)
    colors <- Gen.someOf("red", "green", "blue").map(_.toSet)
    jt <- Gen.oneOf("inner", "left_semi", "left_anti")
  } yield Shape(lo, lo + span, colors, jt)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("120 random filter→join→agg pipelines match the in-memory model") {
    for (seed <- 1L to 120L) {
      val facts = sample(genFacts, seed)
      val dims = sample(genDims, seed + 10000)
      val shape = sample(genShape, seed + 20000)
      val colorsSql =
        if (shape.colors.isEmpty) "1 = 0"
        else s"s IN (${shape.colors.map(c => s"'$c'").mkString(", ")})"
      val pred = s"v >= ${shape.lo} AND v <= ${shape.hi} AND ($colorsSql)"

      // dim key made unique like a real dimension; w is never
      // projected, so WHICH duplicate survives cannot matter
      val got = Relational.filterSql(facts.toDF(), pred)
        .join(dims.toDF("k", "w").dropDuplicates("k"), Seq("k"), shape.joinType)
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sortBy(_._1)

      val dimKeys = dims.map(_.k).toSet
      val filtered = facts.filter(r =>
        r.v >= shape.lo && r.v <= shape.hi && shape.colors(r.s))
      val joined = shape.joinType match {
        case "inner" | "left_semi" => filtered.filter(r => dimKeys(r.k))
        case "left_anti" => filtered.filter(r => !dimKeys(r.k))
      }
      val want = joined.groupBy(_.s).map { case (s, rs) =>
        (s, rs.size.toLong, rs.map(_.v).sum, rs.map(_.v).min, rs.map(_.v).max)
      }.toSeq.sortBy(_._1)
      assert(got === want, s"seed=$seed shape=$shape pred=$pred")
    }
  }

  test("60 random left-outer join + null-aware agg pipelines match the model") {
    for (seed <- 1L to 60L) {
      val facts = sample(genFacts, seed)
      val dims = sample(genDims, seed + 30000)
      // dim deduped by LOWEST w per key so the surviving row is
      // deterministic (left-outer projects w, unlike the inner fuzz)
      val dimBest: Map[Long, Long] =
        dims.groupBy(_.k).map { case (k, rs) => k -> rs.map(_.w).min }
      val ddf = dimBest.toSeq.toDF("k", "w")
      val got = facts.toDF()
        .join(ddf, Seq("k"), "left_outer")
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n"), count(col("w")).as("n_matched"),
          sum(col("w")).as("sw"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSeq.sortBy(_._1)
      val want = facts.groupBy(_.s).map { case (s, rs) =>
        val ws = rs.flatMap(r => dimBest.get(r.k))
        (s, rs.size.toLong, ws.size.toLong,
          if (ws.isEmpty) None else Some(ws.sum))
      }.toSeq.sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }

  test("60 random window pipelines (running sum / rank) match the model") {
    for (seed <- 1L to 60L) {
      val facts = sample(genFacts, seed + 50000)
        // make the order key unique per partition so rank/running
        // results are total-order deterministic in both formulations
        .zipWithIndex.map { case (r, i) => FactRow(r.k, i.toLong, r.s) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s")).orderBy(col("v").asc)
      val got = facts.toDF()
        .select(col("k"), col("v"), col("s"),
          sum(col("v")).over(w).as("run"),
          row_number().over(w).as("rn"))
        .collect()
        .map(r => (r.getString(2), r.getLong(1), r.getLong(3), r.getInt(4)))
        .toSeq.sorted
      val want = facts.groupBy(_.s).toSeq.flatMap { case (s, rs) =>
        val sorted = rs.sortBy(_.v)
        sorted.zipWithIndex.map { case (r, i) =>
          (s, r.v, sorted.take(i + 1).map(_.v).sum, i + 1)
        }
      }.sorted
      assert(got === want, s"seed=$seed")
    }
  }
}
