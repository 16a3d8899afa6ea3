package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Unit tests for the text/hash/vector primitives (cross-engine parity
  * of these is covered by the driver's DuckDB gate; these specs cover
  * edge cases the fixtures don't hit). */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("shingles: short docs yield empty, not descending-sequence junk") {
    val df = Seq("a b", "a", "", "a b c", "a b c d").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(Nil, Nil, Nil, List("a b c"), List("a b c", "b c d")))
  }

  test("shingles are distinct") {
    val got = Seq("x y x y x y x y")
      .toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 2).as("sh"))
      .collect().head.getSeq[String](0).toList
    assert(got === List("x y", "y x"))
  }

  test("h32 matches a locally computed md5 prefix") {
    val got = Seq("hello").toDF("s").select(TextOps.h32(col("s"))).collect().head.getLong(0)
    // first 8 hex chars of md5('hello') = 5d414014 = 1564557332... use java
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello".getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
    assert(got === java.lang.Long.parseLong(hex, 16))
  }

  test("minhash signature: length k, all values in [0, P)") {
    val sig = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
      .select(TextOps.minhashSig(
        TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(sig.length === TextOps.numHashes)
    assert(sig.forall(v => v >= 0 && v < TextOps.P))
  }

  test("identical docs have identical minhash; near-identical share most") {
    val df = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "a b c d e f g h i j k l m n o q")).toDF("id", "text")
      .select(col("id"), TextOps.minhashSig(
        TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === rows(2L))
    val shared = rows(1L).zip(rows(3L)).count { case (a, b) => a == b }
    assert(shared > TextOps.numHashes / 2)
  }

  test("simhash: deterministic, and permutation-invariant (bag of words)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "epsilon delta gamma beta alpha"),
      (3L, "zeta eta theta iota kappa")).toDF("id", "text")
      .select(col("id"), TextOps.simhash32(TextOps.tokens(col("text"))).as("fp"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
    assert(rows.values.forall(v => v >= 0 && v <= 0xffffffffL))
  }

  test("cosineD: orthogonal → 0, identical → 1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(TextOps.cosineD(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0)).toList
    assert(got(0) === 0.0 && got(1) === 1.0 && math.abs(got(2) - 1.0) < 1e-15)
  }
}
