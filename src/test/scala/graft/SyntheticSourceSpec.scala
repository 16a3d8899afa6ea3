package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 synthetic source's scale contracts, asserted on the
  * EXECUTED plan: column pruning reaches the reader (a projection
  * pays only for the fields it names) and the partition plan is the
  * requested parallel stripe set — the properties that make "generate
  * 100 TB" a number instead of a staging job. */
class SyntheticSourceSpec extends SparkSpecBase {

  private def load(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.size == 1, s"expected one v2 scan, got ${scans.size}")
    scans.head
  }

  test("generates the deterministic corpus") {
    val df = load(1000, 4)
    assert(df.count() === 1000L)
    val r = df.where(col("doc_id") === 42L).head
    assert(r.getLong(1) === 42L % 9973L)
    assert(r.getLong(2) === 1704067200000000L + 42L * 1000000L)
    assert(r.getLong(3) === (42L * 31L) % 100000L)
    assert(r.getString(4) === "fr") // 42 % 4 = 2 -> langs(2)
    // disjoint stripes cover exactly [0, rows)
    assert(df.agg(min(col("doc_id")), max(col("doc_id")),
      countDistinct(col("doc_id"))).head.toSeq === Seq(0L, 999L, 1000L))
  }

  test("column pruning reaches the v2 reader") {
    val pruned = scanOf(load(1000, 4).select(col("user_id")))
    assert(pruned.scan.readSchema().fieldNames.toSeq === Seq("user_id"),
      s"projection did not prune the scan: ${pruned.scan.readSchema()}")
  }

  test("doc_id bounds push into the v2 scan: stripes pruned, no residual filter") {
    import org.apache.spark.sql.execution.FilterExec
    val df = load(1000, 4)
      .where(col("doc_id") >= 900L && col("doc_id") < 980L)
      .select(col("doc_id"))
    assert(df.count() === 80L)
    // FULLY pushed: the executed plan must carry no re-filter on the
    // generator's output, and the scan's planned range is the bounds
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case f: FilterExec => f }.isEmpty,
      s"doc_id bounds left a residual FilterExec:\n$plan")
    val scan = scanOf(df)
    assert(scan.scan.description().contains("range=[900,980)"),
      s"scan did not prune to the pushed range: ${scan.scan.description()}")
    // non-doc_id predicates stay residual (correctness over heroics)
    val mixed = load(1000, 4).where(col("user_id") === 7L)
    assert(mixed.queryExecution.executedPlan
      .collect { case f: FilterExec => f }.nonEmpty,
      "a non-pushable predicate lost its Filter node")
    assert(mixed.count() === load(1000, 4).collect()
      .count(_.getLong(1) == 7L).toLong)
  }

  test("micro-batch path: admission control paces the corpus, union equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_synstream_")
    val q = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("rows", "1000").option("partitions", "4")
      .option("rowsPerTrigger", "300").load()
      .writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "synthetic stream did not finish")
    // 1000 rows at 300/trigger = 4 real micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) === 4)
    val got = spark.read.parquet(s"$tmp/out")
    assert(got.count() === 1000L)
    // bit-identical to the batch path — offsets lost or double-planned
    // deltas would break the exceptAll both ways
    val batch = load(1000, 4)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("micro-batch restart: the checkpointed offset resumes mid-corpus, no re-generation") {
    import org.apache.spark.sql.streaming.Trigger
    // NOTE: Trigger.Once is useless here — MicroBatchExecution passes
    // ReadLimit.allAvailable under Once, so a single "restart run"
    // would consume the whole corpus and later starts would process
    // nothing (offset recovery never exercised). Instead: start an
    // admission-controlled AvailableNow run and STOP it after its
    // first committed batch, mid-corpus by construction (20 batches of
    // 50 rows; the poll catches the stop long before 19 more commit).
    // The second start must resume from the committed doc_id offset —
    // a reset offset re-generates stripe 0 and doubles those rows, an
    // over-advanced one skips rows; either breaks the exceptAll.
    val tmp = java.nio.file.Files.createTempDirectory("graft_synrestart_")
    def start() = spark.readStream.format("graft.sources.SyntheticDocs")
      .option("rows", "1000").option("partitions", "4")
      .option("rowsPerTrigger", "50").load()
      .writeStream
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    // run 1: stop after the first committed batch (progress events are
    // emitted post-commit, so lastProgress != null means batch 0 is
    // durable in the checkpoint)
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while ((q1.lastProgress == null || q1.lastProgress.numInputRows == 0L)
        && q1.isActive && System.currentTimeMillis() < deadline)
      Thread.sleep(5)
    q1.stop()
    q1.awaitTermination()
    // the sink's _spark_metadata log hides uncommitted files, so this
    // count is exactly the committed prefix
    val n1 = spark.read.parquet(s"$tmp/out").count()
    assert(n1 >= 50L && n1 % 50L == 0L,
      s"run 1 committed $n1 rows — not a whole number of 50-row batches")
    assert(n1 < 1000L,
      s"run 1 consumed the whole corpus ($n1 rows) — restart not mid-corpus; " +
        "admission control was ignored or the stop lost the race")
    // run 2: resume from the checkpointed offset and finish the corpus
    val q2 = start()
    assert(q2.awaitTermination(120000), "synthetic restart run 2 hung")
    // pacing held on the resumed run too: every batch is the 50-row cap
    val run2 = q2.recentProgress.filter(_.numInputRows > 0)
    assert(run2.nonEmpty && run2.forall(_.numInputRows == 50L),
      s"resumed run not paced at 50: ${run2.map(_.numInputRows).toSeq}")
    assert(run2.map(_.numInputRows).sum === 1000L - n1,
      "resumed run did not process exactly the remaining corpus")
    val got = spark.read.parquet(s"$tmp/out")
    assert(got.count() === 1000L)
    val batch = load(1000, 4)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  // the V2 scan actually chosen after pushdown, independent of AQE
  // wrapping (read from the optimized logical plan, not the physical)
  private def pushedScan(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.size == 1, s"expected one v2 scan, got ${scans.size}")
    scans.head
  }

  test("aggregate pushdown: global count/min/max answered from bounds, no aggregate exec") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, SortAggregateExec}
    val df = load(1000, 4)
      .where(col("doc_id") >= 200L && col("doc_id") < 900L)
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
        min(col("ts_us")).as("ts_lo"), max(col("ts_us")).as("ts_hi"))
    assert(pushedScan(df).description().contains("pushedAggregates="),
      s"aggregation did not push: ${pushedScan(df).description()}")
    // COMPLETE pushdown: Spark plans NO aggregate node over the scan
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case h: HashAggregateExec => h
      case s: SortAggregateExec => s
    }.isEmpty, s"complete pushdown still planned an aggregate:\n$plan")
    assert(df.head.toSeq === Seq(700L, 200L, 899L,
      1704067200000000L + 200L * 1000000L,
      1704067200000000L + 899L * 1000000L))
  }

  test("aggregate pushdown scales: a 10^12-row corpus aggregates without generating rows") {
    val trillion = 1000000000000L
    val df = load(trillion, 4)
      .agg(count(lit(1)).as("n"), max(col("doc_id")).as("hi"),
        countDistinct(col("doc_id")).as("nd"))
    // fail FAST if the push regressed — collecting an unpushed
    // trillion-row aggregate would hang the suite, not fail it
    assert(pushedScan(df).description().contains("pushedAggregates="),
      s"aggregation did not push: ${pushedScan(df).description()}")
    assert(df.head.toSeq === Seq(trillion, trillion - 1L, trillion))
  }

  test("aggregate pushdown refuses what the bounds cannot answer exactly") {
    // min over a MODULAR column is not derivable from the range ends;
    // the source must refuse and Spark's own aggregate must answer
    val modular = load(1000, 4).agg(min(col("cents")).as("m"),
      count(lit(1)).as("n"))
    assert(!pushedScan(modular).description().contains("pushedAggregates="),
      "pushed an aggregate the bounds cannot answer (min of a modular column)")
    assert(modular.head.toSeq === Seq(0L, 1000L))
    // GROUP BY keys other than lang are refused (only the mod-4
    // residue classes have closed-form group stats)
    val grouped = load(1000, 4).groupBy(col("user_id")).count()
    assert(!pushedScan(grouped).description().contains("pushedAggregates="),
      "pushed a grouped aggregate on an unsupported key")
    assert(grouped.collect().map(_.getLong(1)).sum === 1000L)
    // count(DISTINCT) only pushes for the PK column
    val dd = load(1000, 4).agg(countDistinct(col("lang")).as("n"))
    assert(!pushedScan(dd).description().contains("pushedAggregates="),
      "pushed count(DISTINCT) on a non-unique column")
    assert(dd.head.getLong(0) === 4L)
  }

  test("aggregate pushdown: empty pushed range yields count 0 and null extremes") {
    val df = load(1000, 4).where(col("doc_id") >= 5000L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("ts_us")).as("hi"))
    assert(pushedScan(df).description().contains("pushedAggregates="),
      s"aggregation did not push: ${pushedScan(df).description()}")
    val r = df.head
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2),
      "empty-range extremes must be NULL, the global-aggregate contract")
  }

  test("grouped aggregate pushdown: GROUP BY lang is answered closed-form per residue class") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, SortAggregateExec}
    val trillion = 1000000000000L
    val df = load(trillion, 8)
      .where(col("doc_id") >= 10L && col("doc_id") < trillion - 3L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
    assert(pushedScan(df).description().contains("groupBy=lang"),
      s"grouped aggregation did not push: ${pushedScan(df).description()}")
    assert(df.queryExecution.executedPlan.collect {
      case h: HashAggregateExec => h
      case s: SortAggregateExec => s
    }.isEmpty, "grouped complete pushdown still planned an aggregate")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // range [10, 10^12 - 3): residues 0..3 map to en/de/fr/ja; check
    // against independently derived closed forms
    def brute(r: Int) = {
      val lo = 10L; val hi = trillion - 3L
      def upTo(x: Long) = if (x <= r) 0L else (x - r + 3) / 4
      val n = upTo(hi) - upTo(lo)
      val mn = lo + (((r - lo % 4) % 4) + 4) % 4
      val mx = (hi - 1) - ((((hi - 1) % 4 - r) % 4) + 4) % 4
      (Seq("en", "de", "fr", "ja")(r), n, mn, mx)
    }
    assert(got === (0 to 3).map(brute).sortBy(_._1))
    // cross-check the closed forms against REAL generated rows at a
    // size Spark can brute-force (pushdown disabled by an unsupported
    // aggregate in the same query forces the fallback)
    val small = load(1000, 4).where(col("doc_id") >= 10L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"), min(col("cents")).as("force_fallback"))
    assert(!pushedScan(small).description().contains("pushedAggregates"),
      "fallback query unexpectedly pushed")
    val fallback = small.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val pushedSmall = load(1000, 4).where(col("doc_id") >= 10L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
    assert(pushedScan(pushedSmall).description().contains("groupBy=lang"))
    assert(pushedSmall.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq === fallback,
      "pushed grouped answers disagree with Spark aggregating real rows")
    // an empty range yields ZERO group rows (grouped-agg contract,
    // unlike the global one-row case)
    val empty = load(1000, 4).where(col("doc_id") >= 5000L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(pushedScan(empty).description().contains("groupBy=lang"))
    assert(empty.collect().isEmpty)
  }

  test("limit over a pushed aggregate is refused: Spark keeps its own Limit") {
    // Spark pushes aggregates BEFORE limits. A completely-pushed
    // aggregate scan answers from closed form and cannot also narrow
    // to "first n" — if pushLimit accepted here, Spark would drop its
    // own Limit (isPartiallyPushed=false) and limit(n) over agg output
    // silently returned all rows. Regression for the round-15 bug.
    val df = load(1000, 4).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"))
      .limit(2)
    val desc = pushedScan(df).description()
    assert(desc.contains("groupBy=lang"),
      s"grouped aggregation did not push: $desc")
    assert(!desc.contains("pushedLimit") && !desc.contains("pushedTopN"),
      s"limit/topN pushed over a complete aggregate: $desc")
    assert(df.collect().length === 2,
      "limit(2) over a pushed grouped aggregate returned a wrong row count")
    // ordered variant: ORDER BY + LIMIT over the pushed agg must also
    // stay Spark's (pushTopN refused), and still answer correctly
    val ordered = load(1000, 4).groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).orderBy(col("lang")).limit(2)
    assert(!pushedScan(ordered).description().contains("pushedTopN"),
      "topN pushed over a complete aggregate")
    assert(ordered.collect().map(_.getString(0)).toSeq === Seq("de", "en"))
    // global agg + limit(1): the degenerate but legal shape
    val global = load(1000, 4).agg(count(lit(1)).as("n")).limit(1)
    assert(global.collect().map(_.getLong(0)).toSeq === Seq(1000L))
  }

  test("limit pushdown: LIMIT n narrows generation to n rows, even at 10^12") {
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec}
    val trillion = 1000000000000L
    val df = load(trillion, 8).limit(7)
    assert(pushedScan(df).description().contains("pushedLimit=7"),
      s"limit did not push: ${pushedScan(df).description()}")
    // fully pushed: one stripe of exactly n rows; the collect below
    // would generate a trillion rows if the push regressed
    val got = df.collect()
    assert(got.length === 7)
    assert(got.map(_.getLong(0)).toSet === (0L until 7L).toSet)
    // the pushed bounds compose: filter first, then limit within them
    val bounded = load(1000, 4)
      .where(col("doc_id") >= 500L).limit(5).select(col("doc_id"))
    assert(pushedScan(bounded).description().contains("range=[500,505)"),
      s"limit did not compose with pushed bounds: ${pushedScan(bounded).description()}")
    assert(bounded.collect().map(_.getLong(0)).toSet ===
      (500L until 505L).toSet)
  }

  test("topN pushdown: ORDER BY doc_id LIMIT n is a closed-form sub-range in order") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val trillion = 1000000000000L
    val desc = load(trillion, 8).orderBy(col("doc_id").desc).limit(5)
    assert(pushedScan(desc).description().contains("pushedTopN=doc_id DESC n=5"),
      s"topN DESC did not push: ${pushedScan(desc).description()}")
    assert(desc.collect().map(_.getLong(0)).toSeq ===
      (0 until 5).map(trillion - 1L - _))
    val asc = load(trillion, 8).orderBy(col("doc_id")).limit(3)
    assert(pushedScan(asc).description().contains("pushedTopN=doc_id ASC n=3"),
      s"topN ASC did not push: ${pushedScan(asc).description()}")
    assert(asc.collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    // a non-generation-order sort column is refused: Spark must keep
    // its own TakeOrdered over the full scan
    val other = load(1000, 4).orderBy(col("cents")).limit(3)
    assert(!pushedScan(other).description().contains("pushedTopN"),
      "pushed a topN the generation order cannot answer")
    assert(other.queryExecution.executedPlan.collect {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, "refused topN lost Spark's own TakeOrdered")
    assert(other.collect().map(_.getLong(3)).toSeq ===
      load(1000, 4).collect().map(_.getLong(3)).sorted.take(3).toSeq)
  }

  test("reported ordering elides Spark's per-partition sort on doc_id") {
    import org.apache.spark.sql.execution.SortExec
    // stripes are born doc_id-sorted and the scan REPORTS it, so a
    // per-partition sort on doc_id must plan NO SortExec — at scale a
    // redundant sort is a full extra pass over generated data
    val sorted = load(100000, 8).select(col("doc_id"), col("cents"))
      .sortWithinPartitions(col("doc_id"))
    assert(sorted.queryExecution.executedPlan.collect {
      case s: SortExec => s
    }.isEmpty,
      s"born-sorted scan re-sorted:\n${sorted.queryExecution.executedPlan}")
    assert(sorted.count() === 100000L)
    // a sort the generator does NOT provide keeps its SortExec
    val other = load(1000, 4).sortWithinPartitions(col("cents"))
    assert(other.queryExecution.executedPlan.collect {
      case s: SortExec => s
    }.nonEmpty, "non-doc_id sort lost its SortExec")
    // and pruning doc_id away drops the (now unresolvable) claim
    // without breaking the plan
    val pruned = load(1000, 4).select(col("cents"))
      .sortWithinPartitions(col("cents"))
    assert(pruned.count() === 1000L)
  }

  test("partition plan is the requested stripe set") {
    val scan = scanOf(load(1000, 8).select(col("doc_id")))
    assert(scan.inputRDD.getNumPartitions === 8)
    // short final stripe: 10 rows / 4 partitions = ceil 3-per -> 4 stripes
    val scan2 = scanOf(load(10, 4).select(col("doc_id")))
    assert(scan2.inputRDD.getNumPartitions === 4)
    // more partitions than rows: empty stripes are dropped, not planned
    val scan3 = scanOf(load(3, 8).select(col("doc_id")))
    assert(scan3.inputRDD.getNumPartitions === 3)
  }
}
