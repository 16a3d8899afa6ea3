package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text / hashing / vector primitives for the dedup, similarity
  * and text-analysis operators (extensions beyond the reference —
  * SURVEY.md §2.4), built exclusively from codegen'd Spark builtins
  * (no UDFs: transform/aggregate/zip_with lambdas stay inside
  * whole-stage codegen).
  *
  * Every primitive here has a DuckDB-SQL twin generated from the SAME
  * constants (the `*Sql` methods), so the driver's oracle compare is
  * bit-exact:
  *  - h32: first 8 hex chars of md5 → BIGINT. md5 is identical across
  *    engines, so the value is identical.
  *  - minhash: (a*h+b) mod P with P=2^31-1; pure int64 arithmetic, no
  *    overflow (a < 2^31, h < 2^32 ⇒ a*h < 2^63).
  *  - dot products: double-precision sequential left fold seeded with
  *    0.0 on BOTH engines ⇒ bit-identical IEEE results.
  */
object TextOps {

  /** Modulus for minhash permutations: 2^31-1 (Mersenne prime). */
  val P: Long = 2147483647L

  /** Fixed minhash permutation constants (k=16). */
  val minhashA: Seq[Long] = Seq(
    1103515245L, 1299709L, 15485863L, 32452843L,
    49979687L, 67867967L, 86028121L, 104395301L,
    122949823L, 141650939L, 160481183L, 179424673L,
    198491317L, 217645177L, 236887691L, 256203161L)
  val minhashB: Seq[Long] = Seq(
    12345L, 2L, 3L, 5L, 7L, 11L, 13L, 17L,
    19L, 23L, 29L, 31L, 37L, 41L, 43L, 47L)
  val numHashes: Int = minhashA.length
  /** LSH banding: 4 bands × 4 rows (k=16). */
  val bandRows = 4
  val numBands: Int = numHashes / bandRows

  // ---------- portable 32-bit hash ----------

  /** Spark: first 8 hex chars of md5 as unsigned 32-bit value in a long. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** DuckDB twin of [[h32]] over SQL fragment `e`. */
  def h32Sql(e: String): String =
    s"CAST(('0x'||substr(md5($e),1,8)) AS BIGINT)"

  // ---------- tokens & shingles ----------

  /** Whitespace tokens (trimmed first; single-space synthetic corpus). */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokensSql(e: String): String = s"string_split(trim($e), ' ')"

  /** Distinct word n-gram shingles from a token array column.
    * Guarded: Spark's sequence(1, 0) would generate a DESCENDING [1,0],
    * so docs shorter than n map to an empty array explicitly. */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1)) // inclusive ends
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    array_distinct(
      when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** DuckDB twin: range() is end-exclusive ⇒ range(1, len-n+2). */
  def shinglesSql(toksE: String, n: Int): String = {
    val parts = (0 until n).map(o => s"$toksE[i+$o]").mkString(", ")
    s"list_distinct(list_transform(range(1, greatest(len($toksE)-${n - 2}, 1)), i -> concat_ws(' ', $parts)))"
  }

  // ---------- minhash ----------

  /** Shingle array → hash array. IMPORTANT (performance): materialize
    * the result as a real column (its own select) before feeding it to
    * [[minhashSigFromHashes]] — Spark inlines column expressions into
    * higher-order lambdas, so a composite expression would re-hash the
    * whole array once per downstream reference (16× for the
    * signature). Same rule applies to the token split itself. */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => pmod(h32(s), lit(P)))

  /** k=16 minhash signature (array<bigint>) from a MATERIALIZED hash
    * array column. */
  def minhashSigFromHashes(hashes: Column): Column =
    array(minhashA.zip(minhashB).map { case (a, b) =>
      array_min(transform(hashes, h => (lit(a) * h + lit(b)) % lit(P)))
    }: _*)

  /** Convenience composition — only safe on small inputs (see
    * [[shingleHashes]] performance note). */
  def minhashSig(shingleArr: Column): Column =
    minhashSigFromHashes(shingleHashes(shingleArr))

  /** DuckDB twin, two steps for CTE composition (avoids correlated
    * subqueries): first reduce shingles to hashes, then the signature. */
  def shingleHashesSql(shinglesE: String): String =
    s"list_transform($shinglesE, s -> ${h32Sql("s")} % $P)"

  /** Signature from a hash-list fragment (column of the previous CTE). */
  def minhashSigFromHashesSql(hE: String): String = {
    val mins = minhashA.zip(minhashB).map { case (a, b) =>
      s"list_min(list_transform($hE, x -> ($a*x+$b) % $P))"
    }.mkString(", ")
    s"[$mins]"
  }

  // ---------- simhash (32-bit) ----------

  /** Token array → hash array (materialize before [[simhash32FromHashes]]
    * — see the [[shingleHashes]] performance note). */
  def tokenHashes(toks: Column): Column = transform(toks, t => h32(t))

  /** 32-bit simhash from a MATERIALIZED token-hash array: per bit, sum
    * +1/-1 of each token-hash bit; bit set where the sum is >= 0. Pure
    * int64 arithmetic ⇒ exact cross-engine parity. */
  def simhash32FromHashes(hashes: Column): Column = {
    val bitCols = (0 until 32).map { b =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(s >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Convenience composition — only safe on small inputs. */
  def simhash32(toks: Column): Column =
    simhash32FromHashes(tokenHashes(toks))

  /** DuckDB twin of the token→hash-list step. */
  def tokenHashesSql(toksE: String): String =
    s"list_transform($toksE, t -> ${h32Sql("t")})"

  /** DuckDB twin of [[simhash32]] over a hash-list fragment. */
  def simhash32FromHashesSql(hE: String): String = {
    val bits = (0 until 32).map { b =>
      s"(CASE WHEN list_sum(list_transform($hE, x -> CASE WHEN (x >> $b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"($bits)"
  }

  // ---------- vectors (array<float> embeddings) ----------

  /** Double-precision dot product: sequential left fold seeded 0.0 —
    * same order as the DuckDB twin ⇒ bit-identical. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def normD(a: Column): Column =
    sqrt(aggregate(transform(a.cast("array<double>"), x => x * x),
      lit(0.0), (acc, v) => acc + v))

  def cosineD(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** DuckDB twins (fragments take DOUBLE[] expressions). */
  def dotDSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), z -> z[1]*z[2])), (x,y) -> x+y)"

  def normDSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform($a, x -> x*x)), (x,y) -> x+y))"

  def cosineDSql(a: String, b: String): String =
    s"(${dotDSql(a, b)} / (${normDSql(a)} * ${normDSql(b)}))"
}
