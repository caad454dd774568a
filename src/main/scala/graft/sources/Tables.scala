package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, shiftright}
import org.apache.spark.sql.types._

/** Catalog of the engine's input tables.
  *
  * The reference reads schema-declared TSV snapshots into named catalog
  * views (reference: `src/scala/model/MAG.scala:14-36`,
  * `src/notebooks/scala/SetUpEnv.scala:119-125`). Our engine's native
  * format is columnar parquet (reference writes/reads parquet too:
  * `src/notebooks/scala/StaticNet.scala:428-429`); TSV/CSV remain ingest
  * formats (see [[Ingest]]).
  *
  * At 100 TB each table is a partitioned parquet dataset; a single
  * `.parquet` file per table here is just the local fixture layout —
  * `spark.read.parquet` takes directories the same way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The events fixture's `ts` physical type has varied across driver
    * testdata generations: TIMESTAMP(NANOS) (Spark 4 refuses it by
    * default — read nanos as long, truncate to micros with integer
    * `div`, matching how DuckDB/pyarrow downcast ns→us) and plain
    * TIMESTAMP[us] (reads as NTZ — cast to session-local TimestampType;
    * the UTC session timezone makes the wall-clock values identical to
    * what DuckDB reads). Branch on the READ schema so both vintages
    * load to the same TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    val f = org.apache.spark.sql.functions
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", f.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", f.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register every table of a scale-factor dir as a temp view so the
    * whole surface is reachable from `spark.sql(...)` (reference keeps
    * its tables in the global-temp catalog the same way). Goes through
    * the per-table loaders so `events` gets its nanos handling. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else t(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}

/** Ingest formats beyond parquet, mirroring the reference's readers.
  *
  * Reference: TSV with an explicit case-class-derived schema
  * (`src/scala/utils/SparkUtils.scala:10-15`), raw-text tokenize
  * (`src/notebooks/scala/StaticNet.scala:51-55`), JDBC
  * (`src/python/personal_network.py:18-23`).
  */
object Ingest {
  /** Schema-declared delimited text scan (S1/S2). PERMISSIVE mode keeps
    * malformed rows as nulls, matching the reference's safe-coercion
    * convention (`StaticNet.scala:83-102`). */
  def delimited(spark: SparkSession, path: String, schema: StructType,
                sep: String = "\t", header: Boolean = false,
                quote: String = "\""): DataFrame =
    spark.read
      // text sources always yield nullables
      .schema(StructType(schema.fields.map(_.copy(nullable = true))))
      .option("sep", sep)
      .option("header", header.toString)
      // empty string disables quote handling entirely (raw TSVs — the
      // MAG abstracts file embeds unquoted JSON `"` characters)
      .option("quote", quote)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines scan with an EXPLICIT schema (never inferred — schema
    * inference is a full extra pass over the data and nondeterministic
    * under drift) in PERMISSIVE mode with a dead-letter column: a line
    * that fails to parse yields nulls for every data field and the raw
    * line in `corruptCol`, so ingestion can census and route dead
    * letters instead of silently dropping them (the q186 accounting
    * extended to the file-source path — q190). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
                corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(StructType(schema.fields.map(_.copy(nullable = true)) :+
        org.apache.spark.sql.types.StructField(corruptCol,
          org.apache.spark.sql.types.StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** CSV sink (S6) — single logical dataset, writer-parallel. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Partitioned parquet sink (S8) — the scale path: partition by the
    * dominant join/filter key so downstream scans prune. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Z-ORDERED layout sink — the multi-dimensional clustering move
    * q116 verifies arithmetically, wired into the write path so scans
    * actually SKIP data: rows land in partitions keyed by the top
    * `bucketShift` bits of their Morton key
    * ([[graft.operators.Relational.zorderKey]]), so each partition is
    * a (2^(bucketShift/2))² rectangle of the (x, y) plane. A
    * 2-D range query then reads ONLY the partitions whose rectangles
    * intersect it ([[readZRect]] — partition pruning visible in the
    * plan), where a layout sorted/partitioned by x alone prunes
    * nothing for a y-selective query. `bucketShift` must be even and
    * sized so partitions hold whole row groups at the target scale
    * (18 → 512×512 cells; the fixture specs use smaller cells). */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
                    bucketShift: Int = 18): Unit = {
    require(bucketShift > 0 && bucketShift % 2 == 0, "bucketShift must be even")
    df.withColumn("zbucket",
        shiftright(graft.operators.Relational.zorderKey(col(x), col(y)),
          bucketShift))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
  }

  /** Scalar Morton interleave of two cell coordinates — the driver-side
    * twin of `Relational.zorderKey` shifted down: `zorderKey(x, y) >>
    * s  ==  mortonCell(x >> s/2, y >> s/2)`. */
  private def mortonCell(cx: Long, cy: Long): Long =
    (0 until 16).map { i =>
      ((cx & (1L << i)) << i) | ((cy & (1L << i)) << (i + 1))
    }.reduce(_ | _)

  /** The z-buckets whose cells intersect the rectangle
    * [xLo, xHi] × [yLo, yHi] — a driver-side enumeration over CELL
    * coordinates (bounded: (xRange/cell)·(yRange/cell) ids, never rows),
    * exactly the partition list a lakehouse's file-skipping index would
    * hand back. */
  def zRectBuckets(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
                   bucketShift: Int = 18): Seq[Long] = {
    val cell = 1L << (bucketShift / 2)
    (xLo / cell to xHi / cell).flatMap { cx =>
      (yLo / cell to yHi / cell).map(cy => mortonCell(cx, cy))
    }.distinct.sorted
  }

  /** 2-D range scan over a [[writeZOrdered]] layout: the rectangle's
    * covering buckets become a partition-pruning `IN` predicate, the
    * exact x/y bounds re-filter inside the surviving partitions. */
  def readZRect(spark: SparkSession, path: String, x: String, y: String,
                xLo: Long, xHi: Long, yLo: Long, yHi: Long,
                bucketShift: Int = 18): DataFrame = {
    val buckets = zRectBuckets(xLo, xHi, yLo, yHi, bucketShift)
    spark.read.parquet(path)
      .filter(col("zbucket").isin(buckets: _*) &&
        col(x).between(xLo, xHi) && col(y).between(yLo, yHi))
  }

  /** Single-file text sink (S7 — the reference's
    * `coalesce(1).saveAsTextFile` for GEXF/D3 exports,
    * `jsNets.scala:106`). Only for driver-bounded outputs. */
  def writeSingleText(spark: SparkSession, content: String, path: String): Unit = {
    import spark.implicits._
    Seq(content).toDF("value").coalesce(1).write.mode("overwrite").text(path)
  }

  /** Bucketed-table write path (SURVEY.md §4 physical design): persist
    * a fact table pre-hash-partitioned (and optionally sorted) on its
    * join key, so every downstream join/aggregation keyed on a subset
    * of the bucket key reads it JOIN-READY — Catalyst's
    * EnsureRequirements sees the bucketing as a satisfied
    * HashPartitioning and inserts no shuffle exchange. At 100 TB this
    * converts the co-membership self-join (the engine's hottest
    * pattern) from "re-shuffle the largest table per query" to a
    * scan. Demonstrated end-to-end by q71_bucketed_spine and
    * BucketingSpec. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKey: String, buckets: Int = 32,
                    sortKey: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, bucketKey)
    sortKey.fold(w)(w.sortBy(_)).saveAsTable(table)
  }

  /** JDBC source (S12 — the reference's Postgres `author_network`
    * relation, `src/python/personal_network.py:18-23`). Partitioned
    * read when bounds are given: each of `numPartitions` executors
    * pulls its own key range, the 100 TB-era alternative to a
    * single-connection scan. Passthrough to Spark's built-in JDBC
    * provider; integration-tested in-process against embedded Apache
    * Derby (JdbcIngestSpec) — no network database exists in this
    * sandbox. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties(),
           partitionColumn: Option[String] = None,
           bounds: Option[(Long, Long)] = None,
           numPartitions: Int = 8): DataFrame = {
    require(partitionColumn.isDefined == bounds.isDefined,
      "partitionColumn and bounds must be supplied together — a partial " +
        "spec would silently degrade to a single-connection scan")
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        spark.read.jdbc(url, table, c, lo, hi, numPartitions, props)
      case _ => spark.read.jdbc(url, table, props)
    }
  }

  /** JDBC sink — the write half of S12. Controls the two knobs that
    * matter at scale: writer parallelism (each task opens ONE
    * connection, so a many-partition dataset is repartitioned to
    * `numConnections` instead of opening thousands) and the JDBC batch
    * size. `repartition`, not `coalesce`: coalesce propagates UP the
    * plan without a shuffle boundary, collapsing the whole upstream
    * stage to writer parallelism — one extra shuffle of the output
    * rows keeps the expensive computation at full width.
    * `truncate = true` asks Spark's overwrite to TRUNCATE rather
    * than DROP+CREATE, preserving the target's indexes and grants where
    * the dialect supports it. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties(),
                numConnections: Int = 8, batchSize: Int = 1000,
                append: Boolean = false, truncate: Boolean = false): Unit =
    df.repartition(numConnections).write
      .mode(if (append) "append" else "overwrite")
      .option("batchsize", batchSize.toString)
      .option("truncate", truncate.toString)
      .jdbc(url, table, props)
}
