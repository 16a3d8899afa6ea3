package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based differential tests (SURVEY.md §5.4): the engine's
  * filter/join/project/dedup semantics vs a naive in-memory model over
  * ScalaCheck-generated rows. Seeds are fixed — failures reproduce. */
final case class Row3(k: Long, v: Long, s: String)

class ModelCheckSpec extends SparkSpecBase {
  import spark.implicits._

  private val genRows: Gen[List[Row3]] = Gen.listOfN(60, for {
    k <- Gen.chooseNum(0L, 20L)
    v <- Gen.chooseNum(-100L, 100L)
    s <- Gen.oneOf("red", "green", "blue", "cyan")
  } yield Row3(k, v, s))

  private def sample(seed: Long): List[Row3] =
    genRows.pureApply(Gen.Parameters.default, Seed(seed))

  test("filterSql == model filter (range / IN / equality shapes)") {
    for (seed <- 1L to 10L) {
      val rows = sample(seed)
      val df = rows.toDF()
      val cases: Seq[(String, Row3 => Boolean)] = Seq(
        ("v >= -20 AND v <= 35", r => r.v >= -20 && r.v <= 35),
        ("s IN ('red', 'cyan')", r => r.s == "red" || r.s == "cyan"),
        ("s = 'green'", r => r.s == "green"),
        ("v >= 0 AND s IN ('blue', 'green') AND k <= 15",
          r => r.v >= 0 && (r.s == "blue" || r.s == "green") && r.k <= 15))
      for ((pred, model) <- cases) {
        val got = Relational.filterSql(df, pred).as[Row3].collect().sortBy(r => (r.k, r.v, r.s))
        val want = rows.filter(model).sortBy(r => (r.k, r.v, r.s))
        assert(got.toList === want, s"seed=$seed pred=$pred")
      }
    }
  }

  test("randomly generated predicate trees == model evaluation") {
    sealed trait Pred { def sql: String; def eval(r: Row3): Boolean }
    case class VGe(c: Long) extends Pred {
      def sql = s"v >= $c"; def eval(r: Row3) = r.v >= c
    }
    case class VLe(c: Long) extends Pred {
      def sql = s"v <= $c"; def eval(r: Row3) = r.v <= c
    }
    case class KEq(c: Long) extends Pred {
      def sql = s"k = $c"; def eval(r: Row3) = r.k == c
    }
    case class SIn(xs: List[String]) extends Pred {
      def sql = s"s IN (${xs.map(x => s"'$x'").mkString(", ")})"
      def eval(r: Row3) = xs.contains(r.s)
    }
    case class AndP(a: Pred, b: Pred) extends Pred {
      def sql = s"(${a.sql}) AND (${b.sql})"
      def eval(r: Row3) = a.eval(r) && b.eval(r)
    }
    case class OrP(a: Pred, b: Pred) extends Pred {
      def sql = s"(${a.sql}) OR (${b.sql})"
      def eval(r: Row3) = a.eval(r) || b.eval(r)
    }
    val leaf: Gen[Pred] = Gen.oneOf(
      Gen.chooseNum(-100L, 100L).map(VGe),
      Gen.chooseNum(-100L, 100L).map(VLe),
      Gen.chooseNum(0L, 20L).map(KEq),
      Gen.someOf("red", "green", "blue", "cyan")
        .suchThat(_.nonEmpty).map(xs => SIn(xs.toList)))
    val tree: Gen[Pred] = for {
      a <- leaf; b <- leaf; c <- leaf
      op1 <- Gen.oneOf[(Pred, Pred) => Pred](AndP.apply _, OrP.apply _)
      op2 <- Gen.oneOf[(Pred, Pred) => Pred](AndP.apply _, OrP.apply _)
    } yield op2(op1(a, b), c)
    for (seed <- 1L to 25L) {
      val rows = sample(seed)
      val pred = tree.pureApply(Gen.Parameters.default, Seed(seed * 7 + 1))
      val got = Relational.filterSql(rows.toDF(), pred.sql)
        .as[Row3].collect().sortBy(r => (r.k, r.v, r.s)).toList
      val want = rows.filter(pred.eval).sortBy(r => (r.k, r.v, r.s))
      assert(got === want, s"seed=$seed pred=${pred.sql}")
    }
  }

  test("joinGraph inner equi-join == model nested loop (multiset)") {
    for (seed <- 1L to 10L) {
      val left = sample(seed)
      val right = sample(seed + 1000)
      val tables = Map(
        "l" -> left.toDF("lk", "lv", "ls"),
        "r" -> right.toDF("rk", "rv", "rs"))
      val got = Relational.joinGraph(tables, "l",
        Seq(Relational.JoinEdge("r", "lk", "rk")))
        .select("lk", "lv", "rv").as[(Long, Long, Long)]
        .collect().sorted.toList
      val want = (for {
        a <- left; b <- right if a.k == b.k
      } yield (a.k, a.v, b.v)).sorted
      assert(got === want, s"seed=$seed")
    }
  }

  test("project selectExpr == model mapping") {
    for (seed <- 1L to 5L) {
      val rows = sample(seed)
      val got = Relational.project(rows.toDF(),
        Seq("k AS key", "v * 2 AS dbl", "upper(s) AS color"))
        .as[(Long, Long, String)].collect().sorted.toList
      val want = rows.map(r => (r.k, r.v * 2, r.s.toUpperCase)).sorted
      assert(got === want, s"seed=$seed")
    }
  }

  test("random aggregation plans == model groupBy fold") {
    // random (grouping key, aggregate set) against a Scala fold; sums
    // on longs are exact so multiset order cannot leak in
    sealed trait AggPick { def name: String }
    case object SumV extends AggPick { val name = "sum_v" }
    case object MinV extends AggPick { val name = "min_v" }
    case object MaxV extends AggPick { val name = "max_v" }
    case object CntAll extends AggPick { val name = "n" }
    case object CntDistS extends AggPick { val name = "n_s" }
    val genAggs: Gen[List[AggPick]] =
      Gen.someOf[AggPick](SumV, MinV, MaxV, CntAll, CntDistS)
        .suchThat(_.nonEmpty).map(_.toList)
    for (seed <- 1L to 15L) {
      val rows = sample(seed)
      val byS = seed % 2 == 0 // alternate grouping column
      val picks = genAggs.pureApply(Gen.Parameters.default, Seed(seed * 13 + 5))
      val aggCols = picks.map {
        case SumV => sum(col("v")).as("sum_v")
        case MinV => min(col("v")).as("min_v")
        case MaxV => max(col("v")).as("max_v")
        case CntAll => count(lit(1)).as("n")
        case CntDistS => countDistinct(col("s")).as("n_s")
      }
      val keyCol = if (byS) "s" else "k"
      val got = rows.toDF().groupBy(col(keyCol))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
        .map(r => r.get(0).toString ->
          picks.indices.map(i => r.getLong(i + 1)).toList)
        .toMap
      val want = rows.groupBy(r => if (byS) r.s else r.k.toString)
        .map { case (key, g) =>
          key.toString -> picks.map {
            case SumV => g.map(_.v).sum
            case MinV => g.map(_.v).min
            case MaxV => g.map(_.v).max
            case CntAll => g.size.toLong
            case CntDistS => g.map(_.s).distinct.size.toLong
          }
        }
      assert(got === want, s"seed=$seed key=$keyCol aggs=${picks.map(_.name)}")
    }
  }

  test("window rank/running == model sort-scan") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1L to 8L) {
      val rows = sample(seed)
      val w = Window.partitionBy(col("k")).orderBy(col("v").asc, col("s").asc)
      val got = rows.toDF()
        .select(col("k"), col("v"), col("s"),
          row_number().over(w).as("rn"),
          sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("run"))
        .as[(Long, Long, String, Int, Long)]
        .collect().sorted.toList
      val want = rows.groupBy(_.k).toList.flatMap { case (k, g) =>
        val sorted = g.map(r => (r.v, r.s)).sorted
        sorted.zipWithIndex.map { case ((v, s), i) =>
          (k, v, s, i + 1, sorted.take(i + 1).map(_._1).sum)
        }
      }.sorted
      assert(got === want, s"seed=$seed")
    }
  }

  test("exact dedup keeper == model min-by-key") {
    for (seed <- 1L to 5L) {
      val rows = sample(seed).zipWithIndex.map { case (r, i) => (i.toLong, r.s) }
      val got = rows.toDF("id", "payload")
        .groupBy(col("payload"))
        .agg(min(col("id")).as("keeper"), count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect().sorted.toList
      val want = rows.groupBy(_._2).map { case (p, g) =>
        (p, g.map(_._1).min, g.size.toLong)
      }.toList.sorted
      assert(got === want, s"seed=$seed")
    }
  }
}
