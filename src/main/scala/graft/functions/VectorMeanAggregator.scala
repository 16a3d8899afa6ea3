package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §7.3: `Aggregator[IN,BUF,OUT]`
  * registered via `udaf`): running element-wise vector sum + count →
  * mean vector. This is the scalable way to train IVF centroids —
  * constant-size state per group, map-side partials, no collect.
  *
  * NOTE: float addition order follows Spark's partial-aggregation
  * schedule, so results are deterministic only to ~1e-12 — use the
  * sort-fold formulation (q_vector_centroids) when bit-exactness
  * against another engine is required.
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    var i = 0
    while (i < dim && i < v.length) { sum(i) += v(i); i += 1 }
    (sum, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0) else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
