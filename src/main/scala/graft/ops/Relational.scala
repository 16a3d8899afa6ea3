package graft.ops

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}

/** The reference's relational operator surface (SURVEY.md §2.1) as
  * composable `DataFrame => DataFrame` functions. Everything is declared
  * through the DataFrame API so Catalyst performs predicate pushdown,
  * column pruning and join-strategy selection (SURVEY.md §4.1) — the
  * engine adds no hand scheduling.
  */
object Relational {

  /** S3a — parquet source (ref py:229,321,341). */
  def scanParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Options for S1/S2 — JDBC scan, plain or range-partitioned parallel
    * (ref py:101-116). `partition` adds the four options that make Spark
    * generate one stripe query per `[lower,upper)` range
    * (partitionColumn/lowerBound/upperBound/numPartitions, ref py:109-114).
    *
    * Numeric-type fidelity (SURVEY.md §1.4): Oracle `NUMBER` columns
    * arrive as `DecimalType(38,10)` over JDBC — 10 forced fraction
    * digits even on integral keys like the reference's `objid`
    * (json:35-52 bounds it well inside int64). Two deliberate knobs:
    *  - `customSchema`: Spark's `customSchema` JDBC option — pins the
    *    Spark-side type per column (e.g. `"objid DECIMAL(38,0)"`),
    *    overriding the driver's default mapping at READ time, so the
    *    staged parquet carries exactly the declared type.
    *  - `decimalNormalize`: `""` keeps decimals exact as mapped;
    *    `"bigint"`/`"double"` casts DecimalType columns after the
    *    load — the normalize-deliberately path for integral keys (the
    *    reference compares them against numeric literal bounds, so
    *    int64 is the faithful staging type).
    *  - `decimalNormalizeCols`: which decimal columns to normalize
    *    (empty = all of them). A `"bigint"` normalize is GUARDED: any
    *    row whose value does not round-trip (fractional part, or
    *    > int64) raises at read time instead of silently truncating /
    *    nulling — a migration must never quietly corrupt a key.
    */
  final case class JdbcScan(
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      driver: String = "",
      fetchSize: Int = 10000,
      partition: Option[JdbcPartition] = None,
      customSchema: String = "",
      decimalNormalize: String = "",
      decimalNormalizeCols: Seq[String] = Nil)

  final case class JdbcPartition(
      column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

  def scanJdbc(spark: SparkSession, s: JdbcScan): DataFrame = {
    var r: DataFrameReader = spark.read
      .format("jdbc")
      .option("url", s.url)
      .option("dbtable", s.table)
      .option("fetchsize", s.fetchSize.toString)
    if (s.user.nonEmpty) r = r.option("user", s.user)
    if (s.password.nonEmpty) r = r.option("password", s.password)
    if (s.driver.nonEmpty) r = r.option("driver", s.driver)
    s.partition.foreach { p =>
      r = r.option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound.toString)
        .option("upperBound", p.upperBound.toString)
        .option("numPartitions", p.numPartitions.toString)
    }
    if (s.customSchema.nonEmpty) r = r.option("customSchema", s.customSchema)
    val df = r.load()
    if (s.decimalNormalize.isEmpty) {
      // a col list without a target type is a config contradiction —
      // silently ignoring it would discard the user's stated intent
      require(s.decimalNormalizeCols.isEmpty,
        "decimalNormalizeCols requires decimalNormalize ('bigint' or " +
          s"'double'); got cols ${s.decimalNormalizeCols.mkString(", ")} " +
          "with no target type")
      df
    } else {
      require(Set("bigint", "double").contains(s.decimalNormalize),
        s"decimalNormalize must be '', 'bigint' or 'double': ${s.decimalNormalize}")
      import org.apache.spark.sql.functions.{col, concat_ws, lit, raise_error, when}
      val wanted = s.decimalNormalizeCols.map(_.toLowerCase).toSet
      val byName = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
      val unknown = wanted -- byName.keySet
      require(unknown.isEmpty,
        s"decimalNormalizeCols not in the scan: ${unknown.mkString(", ")}")
      // a named column that is not DecimalType would normalize nothing
      // — the user asked for it explicitly (e.g. customSchema already
      // mapped it to DOUBLE), so refuse instead of silently no-opping
      val notDecimal = wanted.filterNot(n => byName(n).dataType
        .isInstanceOf[org.apache.spark.sql.types.DecimalType])
      require(notDecimal.isEmpty,
        "decimalNormalizeCols must name DECIMAL columns as scanned " +
          s"(already non-decimal: ${notDecimal.toSeq.sorted.mkString(", ")})")
      df.select(df.schema.fields.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.DecimalType
              if wanted.isEmpty || wanted.contains(f.name.toLowerCase) =>
            val c = col(f.name)
            val casted = c.cast(s.decimalNormalize)
            if (s.decimalNormalize == "bigint")
              // loud on lossy: a fractional value truncates and a
              // >int64 value nulls under non-ANSI cast — both corrupt
              // a supposedly-integral key, so raise with the value
              // instead of staging garbage (one codegen'd compare per
              // row, noise next to the JDBC fetch itself)
              when(c.isNull, casted)
                .when(c === casted.cast(f.dataType), casted)
                .otherwise(raise_error(concat_ws("",
                  lit(s"decimalNormalize=bigint is lossy for ${f.name}="),
                  c.cast("string")))
                  .cast("bigint"))
                .as(f.name)
            else casted.as(f.name)
          case _ => col(f.name)
        }
      }: _*)
    }
  }

  /** F1 — config-supplied SQL predicate string (ref py:118-120). Parsed by
    * Spark's SQL expression parser; Catalyst pushes it into the source
    * scan (JDBC WHERE clause / parquet row-group filters). */
  def filterSql(df: DataFrame, predicate: String): DataFrame =
    if (predicate == null || predicate.trim.isEmpty) df else df.where(predicate)

  /** One edge of the star-join graph (ref py:140-142). */
  final case class JoinEdge(
      rightTable: String, leftCol: String, rightCol: String,
      joinType: String = "inner")

  /** R1+J1 — fold a named-table registry through a list of equi-join
    * edges, starting from `root`. Columns may be plain names (resolved
    * against the accumulated/right DataFrame) or `alias.col` qualified
    * refs (resolved against the table aliases, like the reference's
    * config join conditions over aliased sources, py:135-142) — needed
    * whenever sources share column names (e.g. every table has
    * `objid`). Catalyst/AQE picks broadcast-hash vs sort-merge per
    * edge. */
  def joinGraph(
      tables: Map[String, DataFrame],
      root: String,
      edges: Seq[JoinEdge]): DataFrame = {
    import org.apache.spark.sql.functions.col
    edges.foldLeft(tables(root)) { (acc, e) =>
      val right = tables(e.rightTable)
      val l = if (e.leftCol.contains(".")) col(e.leftCol) else acc(e.leftCol)
      val r = if (e.rightCol.contains(".")) col(e.rightCol) else right(e.rightCol)
      acc.join(right, l === r, e.joinType)
    }
  }

  /** P1 — config-supplied projection expressions (`qualifier.col AS name`
    * or any scalar SQL expression — ref py:146, json:59-82). */
  def project(df: DataFrame, exprs: Seq[String]): DataFrame =
    df.selectExpr(exprs: _*)

  /** W1 — round-robin rebalance before a sink (ref py:196,216,345). */
  def rebalance(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartition(numPartitions)

  /** K1 — parquet sink, overwrite staging semantics (ref py:197,217). */
  def sinkParquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  // ---- additional file formats (free on the DataFrameReader/Writer,
  // SURVEY.md §2.4 "file formats" row; the reference stages parquet
  // only) ----

  def scanCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def scanJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def sinkCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", true).csv(path)

  /** JDBC sink — the write-back twin of [[scanJdbc]] (the reference
    * only reads over JDBC; a migrator that can also LOAD a relational
    * target closes the loop). `batchSize` mirrors the read-side
    * `fetchSize` (reference default 10k, json:31); `numPartitions`
    * caps concurrent connections the way the reference caps Cassandra
    * write parallelism (py:306-307). */
  def sinkJdbc(df: DataFrame, url: String, table: String,
      mode: String = "append", driver: String = "",
      batchSize: Int = 10000, numPartitions: Int = 8): Unit = {
    var w = df.coalesce(numPartitions).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode(mode)
    if (driver.nonEmpty) w = w.option("driver", driver)
    w.save()
  }

  def sinkJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC — the other columnar format Spark ships natively; same
    * vectorized reader / predicate-pushdown / stats-pruning profile
    * as parquet, so a staged dataset can target either. */
  def scanOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def sinkOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Whole-file binary ingest (`binaryFile` source): one row per file
    * with (path, modificationTime, length, content) — the ingestion
    * edge of the multimodal lane (graft.multimodal.Media consumes the
    * `content` bytes). Reads are split per file, never within one, so
    * partition sizing follows file sizes; cap per-task bytes with
    * `spark.sql.files.maxPartitionBytes` as usual. */
  def scanBinaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Skew-mitigated equi-join: salt the big (skewed) side into
    * `buckets` sub-keys and explode the small side across all salts, so
    * one hot key fans out over `buckets` tasks instead of one straggler.
    * Exact — every (bigRow, smallRow) key match meets on exactly one
    * salt value. `saltExpr` defaults to a row-id hash; pass a
    * deterministic column for reproducible tests. AQE's skew-join
    * handles the sort-merge case at runtime; salting is the explicit
    * plan-level tool when AQE can't see the skew (e.g. pre-aggregation
    * fan-ups or broadcast-ineligible dims). */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      buckets: Int,
      saltExpr: Column = null,
      joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    // The small side is replicated once per salt, so join types that
    // emit UNMATCHED small-side rows (right/full outer) would emit each
    // of them `buckets` times. Only types keyed off the big side are exact.
    val okTypes = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(okTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin is exact only for big-side-driven join types ($okTypes); got '$joinType'")
    val salt = Option(saltExpr)
      .getOrElse(pmod(monotonically_increasing_id(), lit(buckets)))
    val b = big.withColumn("__salt", salt.cast("int"))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(sm, b(bigKey) === sm(smallKey) && b("__salt") === sm("__salt"), joinType)
      .drop("__salt")
  }

  /** Observed-skew bucket sizing for [[saltedJoin]]: sample the big
    * side's key histogram and size the salt fan-out so the heaviest
    * key spreads to roughly one uniform task's share of rows. A
    * uniform distribution yields 1 (no salting overhead); a key
    * holding the whole table yields ~numShufflePartitions (capped at
    * `maxBuckets`). Costs one sampling job over (key) — metadata-light
    * next to the join it protects; at 100 TB this is the difference
    * between a measured fan-out and a guessed constant. */
  def skewBuckets(
      big: DataFrame, key: String,
      sampleFraction: Double = 0.1,
      maxBuckets: Int = 64): Int = {
    import org.apache.spark.sql.functions._
    val sampled = (if (sampleFraction >= 1.0) big else big.sample(sampleFraction))
      .groupBy(col(key)).count()
      .agg(max(col("count")).as("mx"), sum(col("count")).as("tot"))
      .collect().headOption
    sampled match {
      case Some(r) if !r.isNullAt(0) && r.getLong(1) > 0 =>
        val parts = big.sparkSession.sessionState.conf.numShufflePartitions
        val ideal = math.ceil(r.getLong(0).toDouble * parts / r.getLong(1)).toInt
        math.min(maxBuckets, math.max(1, ideal))
      case _ => 1
    }
  }

  /** [[saltedJoin]] with the fan-out measured by [[skewBuckets]]. */
  def saltedJoinAuto(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      joinType: String = "inner"): DataFrame =
    saltedJoin(big, small, bigKey, smallKey,
      skewBuckets(big, bigKey), joinType = joinType)

  /** Bucketed table sink: pre-shuffles once on the bucket key so
    * subsequent equi-joins/aggs on that key are CO-LOCATED — Spark
    * reads bucket n of both sides into the same task and the join
    * plans with NO Exchange. This is the 100 TB answer to repeated
    * joins on the same key (pay the shuffle once at write time).
    * Requires a table name (bucket metadata lives in the catalog). */
  def sinkBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
