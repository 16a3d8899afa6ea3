package graft

import graft.queries.LayoutQueries
import org.apache.spark.sql.functions._

/** Pins the Hilbert xy→d mapping used by `q_layout_hilbert`: over the
  * FULL 256×256 grid, the unrolled rotate/reflect chain must be a
  * bijection onto 0..65535 whose walk visits grid-adjacent cells at
  * every step — the defining property of the Hilbert curve (and the
  * one Z-order lacks: Morton has diagonal jumps). A wrong rotation or
  * reflection anywhere in the 8 levels breaks adjacency at thousands
  * of positions, so this is a complete functional check, not a spot
  * sample. */
class HilbertSpec extends SparkSpecBase {

  test("hilbert d is a bijective unit-step walk over the 256x256 grid") {
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val d = LayoutQueries.hilbertD(
      grid.select(col("x").as("ox"), col("y").as("oy"),
        col("x"), col("y")))
      .select(col("ox"), col("oy"), col("d"))
      .collect()
      .map(r => (r.getLong(2), (r.getInt(0), r.getInt(1))))
      .sortBy(_._1)
    assert(d.length === 65536)
    assert(d.head._1 === 0L && d.last._1 === 65535L)
    assert(d.map(_._1).distinct.length === 65536, "d is a bijection")
    val broken = d.sliding(2).count { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(broken === 0, s"$broken non-adjacent consecutive steps")
  }

  test("hilbert buckets never scan more rows than z-order on the audit box") {
    val out = Catalog.byName("q_layout_hilbert").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out.keySet === Set("hilbert", "zorder"))
    assert(out("hilbert") <= out("zorder"),
      s"hilbert scanned ${out("hilbert")} vs zorder ${out("zorder")}")
  }
}
