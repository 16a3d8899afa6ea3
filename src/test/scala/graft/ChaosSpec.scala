package graft.queries

import graft.SparkSpecBase
import graft.ops.ConnectedComponents
import org.apache.spark.sql.functions._

/** Executor-loss safety of the iterative clustering loop, plus the
  * scale-aware defaults the 100 TB design relies on.
  *
  * Local mode cannot kill an executor, but the failure mode that
  * matters is precise: blocks held in executor storage vanish, files
  * don't. Dropping every persisted RDD block mid-loop reproduces
  * exactly what an executor death does to `localCheckpoint` state —
  * data gone AND the lineage to recompute it truncated — while a
  * reliable `checkpoint()` (files) shrugs it off. */
class ChaosSpec extends SparkSpecBase {

  /** What an executor death does to executor-local state. */
  private def dropAllPersistedBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

  private def pathEdges(ids: Seq[(Long, Long)]) = {
    import spark.implicits._
    val pairs = ids.toDF("a", "b")
    pairs.union(pairs.select(col("b"), col("a"))).toDF("a", "b")
  }

  test("the simulated loss is real: localCheckpoint state does not survive it") {
    val df = spark.range(1000).toDF("x").localCheckpoint(true)
    dropAllPersistedBlocks()
    intercept[Exception](df.count())
  }

  test("connected components converge through block loss every iteration") {
    // a diameter-31 chain (forces several pointer-doubling rounds) plus
    // a disjoint triangle and a singleton pair
    val chain = (0L until 31L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val edges = pathEdges(chain ++ extra)
    val labels = ConnectedComponents
      .labels(spark, edges, chaos = _ => dropAllPersistedBlocks())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 31L).foreach(n => assert(labels(n) == 0L, s"node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(labels(n) == 100L, s"node $n"))
    Seq(200L, 201L).foreach(n => assert(labels(n) == 200L, s"node $n"))
  }

  test("band join survives an injected task failure in both stages (forked JVM)") {
    // local[4,3]: a task failure must be retried, not kill the job —
    // the shared spec session is local[4] (maxFailures=1), hence the
    // fork. ChaosBandMain fails one map-stage task (shuffle write)
    // and one reduce-stage task (BandJoinExec itself) and compares
    // against the plain-Spark join result.
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(java, "-cp", cp, "-Xmx2g",
      "graft.ChaosBandMain", sfDir)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val rc = proc.waitFor()
    assert(rc === 0, s"chaos run failed rc=$rc:\n$out")
    assert(out.contains("[chaos-band] OK"), s"missing success marker:\n$out")
  }

  test("memoized graph frames rebuild after block loss (no session poisoning)") {
    // warm the whole memoized family (co-purchase, bipartite, edges,
    // label vector), snapshot a result...
    val before = graft.Catalog.byName("q_graph_triangles")
      .fn(spark, sfDir).collect().toSet
    assert(graft.Catalog.byName("q_graph_pagerank")
      .fn(spark, sfDir).count() > 0)
    // ...kill every executor-held block (localCheckpoint lineage is
    // truncated, so without rebuild-on-loss these frames are dead)...
    dropAllPersistedBlocks()
    // ...and the family must still serve, bit-identically: FrameCache
    // detects the dead entries at serve time and rebuilds from source.
    val after = graft.Catalog.byName("q_graph_triangles")
      .fn(spark, sfDir).collect().toSet
    assert(after == before)
    assert(graft.Catalog.byName("q_graph_pagerank")
      .fn(spark, sfDir).count() > 0)
  }

  test("FrameCache bounds its entries and frees evicted blocks") {
    import graft.ops.FrameCache
    FrameCache.clear(spark)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    // overflow the LRU with distinct keys: live entries must stay
    // bounded and the evicted frames' checkpoint blocks must be freed
    // (not retained for the JVM's lifetime, the round-11 leak)
    (1 to FrameCache.maxEntries + 8).foreach { i =>
      FrameCache.memo(spark, s"chaos_evict_$i") {
        spark.range(10).toDF("x").localCheckpoint(true)
      }
    }
    assert(FrameCache.size <= FrameCache.maxEntries)
    assert(spark.sparkContext.getPersistentRDDs.size <=
      persistedBefore + FrameCache.maxEntries)
    // clear() releases everything for the session
    FrameCache.clear(spark)
    assert(FrameCache.size == 0)
    // a hit serves the SAME frame (no rebuild) while blocks are intact
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("x").localCheckpoint(true) }
    val a = FrameCache.memo(spark, "chaos_hit")(build())
    val b = FrameCache.memo(spark, "chaos_hit")(build())
    assert(builds == 1 && (a eq b))
    FrameCache.clear(spark)
  }

  test("FrameCache count() fallback: a non-LogicalRDD frame is probed by counting, dead sources rebuild") {
    import graft.ops.FrameCache
    import java.nio.file.{Files, Paths}
    FrameCache.clear(spark)
    val base = Files.createTempDirectory("graft_fc_fallback_")
    val dirA = s"$base/a"
    val dirB = s"$base/b"
    val src = spark.range(100).toDF("x")
    src.write.parquet(dirA)
    src.write.parquet(dirB)
    val expected = src.collect().toSet
    // a plain parquet read has NO LogicalRDD backing — alive() must
    // take the `case Seq() => df.count()` fallback on EVERY serve
    val first = FrameCache.memo(spark, "chaos_fallback") {
      spark.read.parquet(dirA)
    }
    assert(first.collect().toSet == expected)
    // intact source: the fallback count succeeds and the SAME frame is
    // served (a rebuild here would mean the fallback always fails)
    var rebuilt = false
    val again = FrameCache.memo(spark, "chaos_fallback") {
      rebuilt = true; spark.read.parquet(dirB)
    }
    assert((again eq first) && !rebuilt,
      "fallback probe rebuilt a healthy frame")
    // kill the files behind the cached frame: the fallback count must
    // FAIL at serve time and the by-name thunk must rebuild — a probe
    // that swallowed the error would serve a frame whose every action
    // throws
    StreamingQueries.deleteRecursively(dirA)
    val recovered = FrameCache.memo(spark, "chaos_fallback") {
      rebuilt = true; spark.read.parquet(dirB)
    }
    assert(rebuilt, "dead source not detected by the count() fallback")
    assert(recovered.collect().toSet == expected,
      "rebuilt frame is not bit-identical to the original")
    FrameCache.clear(spark)
    StreamingQueries.deleteRecursively(base.toString)
  }

  test("FrameCache strictProbe: the verifying count catches loss the block metadata cannot see") {
    import graft.ops.FrameCache
    import java.nio.file.Files
    FrameCache.clear(spark)
    val base = Files.createTempDirectory("graft_fc_strict_")
    val dirA = s"$base/a"
    val dirB = s"$base/b"
    spark.range(50, 100).toDF("x").write.parquet(dirA)
    spark.range(50, 100).toDF("x").write.parquet(dirB)
    // the cluster blind spot, reproduced locally: the frame's plan
    // HAS a live LogicalRDD (so the O(1) metadata probe passes) but
    // ALSO depends on state the block inventory knows nothing about
    // (a parquet side). Killing the files leaves metadata green while
    // the frame is actually dead — exactly the lagging-heartbeat
    // window strictProbe exists for.
    def build(dir: String) =
      spark.range(0, 50).toDF("x").localCheckpoint(true)
        .union(spark.read.parquet(dir))
    val expected = (0L until 100L).toSet
    val first = FrameCache.memo(spark, "chaos_strict")(build(dirA))
    assert(first.collect().map(_.getLong(0)).toSet == expected)
    StreamingQueries.deleteRecursively(dirA)
    // default probe: metadata-only, serves the half-dead frame — the
    // documented stale-positive (local block inventory is green, the
    // parquet side is gone, the action fails downstream)
    val stale = FrameCache.memo(spark, "chaos_strict") {
      fail("default probe must not rebuild: its metadata view is green")
    }
    intercept[Exception](stale.count())
    // strict probe: the verifying count() runs at serve time, fails,
    // and the entry rebuilds from the thunk instead of being served
    spark.conf.set(FrameCache.strictProbeKey, "true")
    try {
      var rebuilt = false
      val recovered = FrameCache.memo(spark, "chaos_strict") {
        rebuilt = true; build(dirB)
      }
      assert(rebuilt, "strictProbe did not detect the dead parquet side")
      assert(recovered.collect().map(_.getLong(0)).toSet == expected,
        "rebuilt frame is not bit-identical to the original")
      // and a healthy frame under strictProbe is served, not rebuilt
      val served = FrameCache.memo(spark, "chaos_strict") {
        fail("strictProbe rebuilt a healthy frame: the verifying count " +
          "should have passed")
      }
      assert(served eq recovered)
    } finally spark.conf.unset(FrameCache.strictProbeKey)
    FrameCache.clear(spark)
    StreamingQueries.deleteRecursively(base.toString)
  }

  test("embedding block count scales with shuffle parallelism") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      assert(DedupQueries.embeddingBlocks(spark) == 8) // 8*9/2 = 36 >= 32
      spark.conf.set("spark.sql.shuffle.partitions", "2000")
      assert(DedupQueries.embeddingBlocks(spark) == 63) // 63*64/2 = 2016
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(DedupQueries.embeddingBlocks(spark) == 2) // floor of 2
      // explicit override wins regardless of parallelism
      spark.conf.set("spark.graft.dedup.embedding.blocks", "5")
      assert(DedupQueries.embeddingBlocks(spark) == 5)
    } finally {
      spark.conf.unset("spark.graft.dedup.embedding.blocks")
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }
}
