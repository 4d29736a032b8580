package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File source/sink surface (SURVEY.md §2 rows 2-3 extension): the
  * reference reads exactly one CSV (/root/reference/src/table.rs:87-109)
  * and its only sink is stdout pretty-print (main.rs:46-51); a 100 TB
  * pipeline instead terminates in partitioned columnar writes and reads
  * whatever formats upstream systems emit — each format here is gated by
  * a full write -> read round trip against the DuckDB oracle.
  * The entry writes per-document features partitioned by language —
  * `partitionBy` on a LOW-cardinality column, one directory per value,
  * which at scale gives partition-pruned reads for per-language
  * consumers — then reads the directory back, so the oracle hash gates
  * the full write -> read round trip (schema reassembly of the partition
  * column included), not just the transform.
  */
object Sinks {

  /** Fixed per-session output dir, overwritten in place on every call —
    * repeated Verify/Bench invocations must not leak temp directories
    * (a deleteOnExit hook covers JVM exit).
    */
  private def scratch(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), name)
    val f = p.toFile
    f.mkdirs()
    f.deleteOnExit()
    p.toString
  }

  private lazy val roundTripDir: String = scratch("graft-write-roundtrip")
  private lazy val jsonDir: String = scratch("graft-write-json")
  private lazy val orcDir: String = scratch("graft-write-orc")
  private lazy val textDir: String = scratch("graft-write-text")
  private lazy val sortedDir: String = scratch("graft-write-sorted")
  private lazy val smallFilesDir: String = scratch("graft-write-smallfiles")
  private lazy val compactedDir: String = scratch("graft-write-compacted")
  private lazy val evolutionDir: String = scratch("graft-write-evolution")
  private lazy val bucketLiDir: String = scratch("graft-bucketed-lineitem")
  private lazy val bucketOrdDir: String = scratch("graft-bucketed-orders")
  private lazy val rollupStateDir: String = scratch("graft-rollup-state")
  private lazy val binpackDir: String = scratch("graft-snapshot-binpack")
  private lazy val retentionDir: String = scratch("graft-snapshot-retention")
  private lazy val historyDir: String = scratch("graft-snapshot-history")
  private lazy val sketchDir: String = scratch("graft-sketch-state")
  private lazy val snapshotDir: String = scratch("graft-snapshots")
  private lazy val snapshotPrunedDir: String = scratch("graft-snapshot-pruned")
  private lazy val snapshotRaceDir: String = scratch("graft-snapshot-race")
  private lazy val snapshotMergeDir: String = scratch("graft-snapshot-merge")
  private lazy val snapshotCdfDir: String = scratch("graft-snapshot-cdf")
  private lazy val snapshotFeedDir: String = scratch("graft-snapshot-feed")
  private lazy val snapshotEvoDir: String = scratch("graft-snapshot-evo")
  private lazy val snapshotExpectDir: String = scratch("graft-snapshot-expect")
  private lazy val snapshotStreamDir: String = scratch("graft-snapshot-stream")
  private lazy val snapshotStreamCkpt: String = scratch("graft-snapshot-stream-ckpt")
  private lazy val snapshotStreamOut: String = scratch("graft-snapshot-stream-out")
  private lazy val snapshotZorderDir: String = scratch("graft-snapshot-zorder")
  private lazy val snapshotZorder3Dir: String = scratch("graft-snapshot-zorder3")
  private lazy val snapshotRangeAndDir: String = scratch("graft-snapshot-rangeand")
  private lazy val snapshotStatsDir: String = scratch("graft-snapshot-statsmeta")
  private lazy val snapshotAsOfDir: String = scratch("graft-snapshot-asof")
  private lazy val snapshotHiddenDir: String = scratch("graft-snapshot-hidden")
  private lazy val snapshotIncrSrcDir: String = scratch("graft-snapshot-incr-src")
  private lazy val snapshotIncrDerDir: String = scratch("graft-snapshot-incr-der")
  private lazy val snapshotCompactDir: String = scratch("graft-snapshot-compact")
  private lazy val snapshotScopedDir: String = scratch("graft-snapshot-scoped")
  private lazy val snapshotScoped2Dir: String = scratch("graft-snapshot-scoped2")
  private lazy val snapshotBloomDir: String = scratch("graft-snapshot-bloom")
  private lazy val snapshotInReadDir: String = scratch("graft-snapshot-inread")
  private lazy val snapshotMorDir: String = scratch("graft-snapshot-mor")
  private lazy val snapshotMorUpsertDir: String = scratch("graft-snapshot-mor-upsert")
  private lazy val snapshotRestoreDir: String = scratch("graft-snapshot-restore")
  private lazy val snapshotSpecEvoDir: String = scratch("graft-snapshot-specevo")
  private lazy val snapshotBranchDir: String = scratch("graft-snapshot-branch")
  private lazy val snapshotRenameDir: String = scratch("graft-snapshot-rename")
  private lazy val snapshotDropDir: String = scratch("graft-snapshot-dropcol")
  private lazy val snapshotWidenDir: String = scratch("graft-snapshot-widen")
  private lazy val snapshotSqlDir: String = scratch("graft-snapshot-sql")
  private lazy val cloneSrcDir: String = scratch("graft-snapshot-clone-src")
  private lazy val cloneDstDir: String = scratch("graft-snapshot-clone-dst")
  private lazy val mvSrcDir: String = scratch("graft-mv-src")
  private lazy val mvViewDir: String = scratch("graft-mv-view")
  private lazy val mvMmSrcDir: String = scratch("graft-mv-mm-src")
  private lazy val mvMmViewDir: String = scratch("graft-mv-mm-view")
  private lazy val mvStSrcDir: String = scratch("graft-mv-stream-src")
  private lazy val mvStViewDir: String = scratch("graft-mv-stream-view")
  private lazy val mvStCkptDir: String = scratch("graft-mv-stream-ckpt")
  private lazy val mvJoinOrdDir: String = scratch("graft-mv-join-ord")
  private lazy val mvJoinLiDir: String = scratch("graft-mv-join-li")
  private lazy val mvJoinViewDir: String = scratch("graft-mv-join-view")
  private lazy val mvJsOrdDir: String = scratch("graft-mv-js-ord")
  private lazy val mvJsLiDir: String = scratch("graft-mv-js-li")
  private lazy val mvJsViewDir: String = scratch("graft-mv-js-view")
  private lazy val mvJsCkptDir: String = scratch("graft-mv-js-ckpt")
  private lazy val mvJmOrdDir: String = scratch("graft-mv-jm-ord")
  private lazy val mvJmLiDir: String = scratch("graft-mv-jm-li")
  private lazy val mvJmViewDir: String = scratch("graft-mv-jm-view")
  private lazy val mvJrOrdDir: String = scratch("graft-mv-jr-ord")
  private lazy val mvJrLiDir: String = scratch("graft-mv-jr-li")
  private lazy val mvJrViewDir: String = scratch("graft-mv-jr-view")
  private lazy val mvDcSrcDir: String = scratch("graft-mv-dc-src")
  private lazy val mvDcViewDir: String = scratch("graft-mv-dc-view")
  private lazy val mvQhSrcDir: String = scratch("graft-mv-qh-src")
  private lazy val mvQhViewDir: String = scratch("graft-mv-qh-view")
  private lazy val mvVrSrcDir: String = scratch("graft-mv-vr-src")
  private lazy val mvVrViewDir: String = scratch("graft-mv-vr-view")
  private lazy val mvTkSrcDir: String = scratch("graft-mv-tk-src")
  private lazy val mvTkViewDir: String = scratch("graft-mv-tk-view")
  private lazy val mvJdOrdDir: String = scratch("graft-mv-jd-ord")
  private lazy val mvJdLiDir: String = scratch("graft-mv-jd-li")
  private lazy val mvJdViewDir: String = scratch("graft-mv-jd-view")
  private lazy val mvJaOrdDir: String = scratch("graft-mv-ja-ord")
  private lazy val mvJaLiDir: String = scratch("graft-mv-ja-li")
  private lazy val mvJaViewDir: String = scratch("graft-mv-ja-view")
  private lazy val mvUpSrcDir: String = scratch("graft-mv-up-src")
  private lazy val mvUpViewDir: String = scratch("graft-mv-up-view")
  private lazy val appendSrcDir: String = scratch("graft-append-src")
  private lazy val appendViewDir: String = scratch("graft-append-view")

  private def clearDir(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Compact a directory of small parquet files into ~`targetFileBytes`
    * outputs: size the file count from the ACTUAL on-disk bytes, not a
    * row-count guess, and rewrite to a NEW directory (in-place overwrite
    * of a live dataset is a correctness bug at scale — the swap belongs
    * to a catalog/manifest layer, not the engine). The rewrite is one
    * round-robin shuffle; with AQE coalescing alone (no repartition) the
    * read-side partitioning would leak through and keep the small-file
    * layout. Small files are a 100 TB killer: every file costs a
    * footer read + task schedule + (on object stores) a request round
    * trip, and 10^7 undersized files can make listing alone the
    * bottleneck.
    */
  def compact(
      s: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L << 20): DataFrame = {
    // size via the Hadoop FileSystem API, NOT java.io.File — an
    // hdfs:///s3a:// path is not a local directory and a local-FS probe
    // would read 0 bytes and silently compact 100 TB into one task.
    // Sum DATA files only: _SUCCESS/.crc and other side files would
    // inflate the size-derived count.
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    var bytes = 0L
    val files = fs.listFiles(path, true) // recursive: partitioned layouts
    while (files.hasNext) {
      val st = files.next()
      if (st.getPath.getName.endsWith(".parquet")) bytes += st.getLen
    }
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    s.read.parquet(inDir).repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    s.read.parquet(outDir)
  }

  private def writeRoundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    docs
      .select(
        col("doc_id"),
        col("lang"),
        graft.operators.TextAnalysis.wordCount(col("text")).as("n_words"),
        col("n_chars"))
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(roundTripDir)
    // read the committed files back; `lang` returns as a partition column
    s.read.parquet(roundTripDir)
      .select("doc_id", "lang", "n_words", "n_chars")
      .orderBy("doc_id")
  }

  /** JSON-lines round trip: schema survives via explicit read schema
    * (JSON has no embedded types; inferring would widen longs/doubles
    * differently than the writer).
    */
  private def jsonRoundTrip(s: SparkSession, d: String): DataFrame = {
    val out = Tables(s, d, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    out.write.mode("overwrite").json(jsonDir)
    s.read.schema(out.schema).json(jsonDir).orderBy("n_nationkey")
  }

  /** Raw text-shard round trip — the ingest format pretraining corpora
    * actually arrive in (one document per line, no schema, no ids):
    * write the corpus as text shards, read it back with the core `text`
    * source, and reduce to an ORDER-INDEPENDENT content certificate
    * (line count, distinct count, and a modular sum of per-line
    * md5-prefix draws) — text shards carry no row identity or order, so
    * the gate must hash CONTENT, not position. The mod keeps the sum
    * far from BIGINT overflow at any gate scale. The oracle recomputes
    * the same certificate from the documents table the shards were cut
    * from: a match proves byte-exact line round-trip through the text
    * sink and source.
    */
  private def textRoundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select(col("text"))
    // one-document-per-line is only a round trip when no document
    // CONTAINS a newline — an embedded \n reads back as two lines and
    // the certificate diverges from the oracle as an opaque hash
    // mismatch. Assert the invariant here (ADVICE r8) so a testdata
    // regeneration with multi-line docs fails LOUDLY at the entry; the
    // multi-line ingest shape is the multimodal text-shard path's
    // concern, not this source's contract.
    val embedded = docs.filter(col("text").contains("\n")).count()
    require(embedded == 0L,
      s"q_source_text needs newline-free documents ($embedded docs embed " +
        "\\n; one-doc-per-line text shards cannot round-trip them)")
    docs.write.mode("overwrite").text(textDir)
    s.read.text(textDir)
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("value")).as("n_distinct"),
        sum(pmod(conv(substring(md5(col("value")), 1, 15), 16, 10)
          .cast("long"), lit(1000000007L))).cast("long").as("content_sum"))
  }

  /** Range-clustered layout for scan pruning: repartitionByRange +
    * sortWithinPartitions clusters rows by key, so every output file (and
    * every parquet row group inside it) covers a narrow disjoint key
    * range. A later key-range read then prunes at THREE levels — files by
    * footer min/max, row groups by statistics, pages by column index —
    * turning a full-table scan into an O(selectivity) read. This layout
    * pass is the batch cousin of partitionBy: partitionBy suits
    * low-cardinality columns (one dir per value); range-clustering suits
    * high-cardinality keys where per-value dirs would be a small-files
    * disaster. The oracle gates the round trip: range-read of the
    * clustered copy == plain filter on the original.
    */
  private def sortedRoundTrip(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(sortedDir)
    s.read.parquet(sortedDir)
      .filter(col("l_orderkey").between(10000, 12000))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Small-files compaction round trip: scatter the table into one file
    * per shuffle partition (the pathological layout every long-running
    * ingest converges to), compact by on-disk size, read back. The
    * oracle hash gates data fidelity; CompactionSpec gates the file
    * count actually shrinking.
    */
  private def compactRoundTrip(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "documents")
      .select("doc_id", "lang", "source", "n_chars")
      .repartition(32) // simulate an ingest's accumulated small files
      .write.mode("overwrite").parquet(smallFilesDir)
    compact(s, smallFilesDir, compactedDir)
      .orderBy("doc_id")
  }

  /** ORC round trip — columnar like parquet, types self-describing. */
  private def orcRoundTrip(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "region")
      .select("r_regionkey", "r_name")
      .write.mode("overwrite").orc(orcDir)
    s.read.orc(orcDir).orderBy("r_regionkey")
  }

  /** Schema-evolution round trip: a long-lived dataset accretes columns
    * over time, so new batches carry a WIDER schema than old files.
    * Batch 1 (even ids) writes (doc_id, lang); batch 2 (odd ids) appends
    * (doc_id, lang, n_chars) into the same directory; a `mergeSchema`
    * read reassembles the union schema with nulls for the missing
    * column in old files — the evolution contract every lakehouse
    * formalizes, demonstrated at the raw-parquet layer the formats sit
    * on. The aggregate separates per-batch behavior (count vs
    * count(n_chars)) so the oracle catches a wrong null-fill.
    */
  private def evolutionRoundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang")
      .write.mode("overwrite").parquet(evolutionDir)
    docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "lang", "n_chars")
      .write.mode("append").parquet(evolutionDir)
    s.read.option("mergeSchema", "true").parquet(evolutionDir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  /** Write `lineitem` and `orders` as BUCKETED tables on their join key
    * and return the two catalog frames. Bucketing pre-shuffles ONCE at
    * write time: both tables land in `nBuckets` files hash-partitioned by
    * key (Murmur3 — the same hash a join exchange would use), so every
    * subsequent join/aggregation on that key reads co-located buckets and
    * plans ZERO exchanges. At 100 TB this is the difference between
    * re-shuffling the fact table on every query and paying the shuffle
    * once at ingest — the batch analogue of a co-partitioned MPP layout.
    * The `repartition(nBuckets, key)` before each write matters: it
    * aligns writer tasks with buckets, so each bucket is ONE file and the
    * `sortBy` metadata stays usable (many files per bucket would force a
    * re-sort on read).
    */
  def bucketedTables(s: SparkSession, d: String, nBuckets: Int = 8): (DataFrame, DataFrame) = {
    s.sql("DROP TABLE IF EXISTS graft_lineitem_bucketed")
    s.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
    Tables(s, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .repartition(nBuckets, col("l_orderkey"))
      .write.mode("overwrite").format("parquet")
      .option("path", bucketLiDir)
      .bucketBy(nBuckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_bucketed")
    Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .repartition(nBuckets, col("o_orderkey"))
      .write.mode("overwrite").format("parquet")
      .option("path", bucketOrdDir)
      .bucketBy(nBuckets, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("graft_orders_bucketed")
    (s.table("graft_lineitem_bucketed"), s.table("graft_orders_bucketed"))
  }

  /** Co-located join over the bucketed layout: both sides `hint("merge")`
    * (a broadcast would hide the point — the demo IS the shuffle-free
    * sort-merge join), then a per-priority aggregate. PlanSpec asserts
    * the join subtree has no Exchange; the oracle gates the values
    * through the full bucketed-write -> co-located-read -> join path.
    */
  private def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = bucketedTables(s, d)
    li.hint("merge")
      .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Incremental rollup maintenance: a 100 TB pipeline never re-scans
    * history to refresh an aggregate — it stores DECOMPOSABLE partial
    * state (count, decimal sum) and folds each new batch in. Day 1's
    * aggregate is written to parquet; day 2 arrives, aggregates alone,
    * and merges with the STORED state by re-aggregation — the derived
    * average exists only in the final projection (an avg column in the
    * state would not merge). The oracle recomputes from the full table:
    * a hash match proves state + delta = full-history truth.
    */
  private def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    val orders = Tables(s, d, "orders")
    def dailyAgg(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("sum_price"))
    dailyAgg(orders.filter(col("o_orderkey") % 3 =!= 0))
      .write.mode("overwrite").parquet(rollupStateDir)
    val state = s.read.parquet(rollupStateDir)
    val delta = dailyAgg(orders.filter(col("o_orderkey") % 3 === 0))
    state.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(
        sum(col("n_orders")).as("n_orders"),
        sum(col("sum_price")).as("merged_price"))
      .select(
        col("o_orderpriority"),
        col("n_orders"),
        col("merged_price").cast("double").as("sum_price"),
        round(col("merged_price").cast("double") / col("n_orders"), 6)
          .as("avg_price"))
      .orderBy("o_orderpriority")
  }

  /** Mergeable-sketch state: HLL sketches are the distinct-count
    * analogue of [[incrementalRollup]]'s sum/count — per-batch sketches
    * persist as BYTES and union later without rescanning history (exact
    * distinct state would be the full value set). Fine-grained
    * (l_returnflag, l_linestatus) sketches round-trip through parquet,
    * then merge up to per-returnflag estimates; the gate bit asserts
    * every merged estimate landed within HLL's documented ±5% of the
    * exact distinct the oracle recomputes.
    */
  private def sketchUnionRoundTrip(s: SparkSession, d: String): DataFrame = {
    val li = Tables(s, d, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .write.mode("overwrite").parquet(sketchDir)
    val merged = s.read.parquet(sketchDir)
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
    merged.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_exact"),
        when(
          abs(col("approx") - col("n_exact")).cast("double")
            / col("n_exact") <= 0.05, lit(1L))
          .otherwise(lit(0L)).as("ok"))
      .orderBy("l_returnflag")
  }

  /** Snapshot commits + time travel over [[Snapshots]]: v1 publishes the
    * even-id half, v2 publishes everything; the entry reads BOTH
    * versions back (v1 via time travel, v2 via the pointer) and emits
    * per-version per-language counts. The oracle recomputes both
    * versions from the source table — a hash match proves the pointer
    * flip published v2 without disturbing v1's immutable files.
    */
  private def snapshotTimeTravel(s: SparkSession, d: String): DataFrame = {
    // fresh table per call: scratch() reuses the directory across
    // Verify/Bench runs, so clear any previous pointer + snapshots
    val dir = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    val docs = Tables(s, d, "documents").select("doc_id", "lang")
    Snapshots.commit(s, docs.filter(col("doc_id") % 2 === 0), snapshotDir)
    Snapshots.commit(s, docs, snapshotDir)
    val v1 = Snapshots.readVersion(s, snapshotDir, 1L)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("version", lit(1L))
    val latest = Snapshots.read(s, snapshotDir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("version", lit(2L))
    v1.unionByName(latest)
      .select("version", "lang", "n_docs")
      .orderBy("version", "lang")
  }

  /** Statistics-manifest data skipping (SURVEY §8.5's missing half,
    * closed in round 6): commit lineitem range-clustered on l_orderkey
    * with per-file min/max stats in the snapshot manifest, then answer
    * a selective range query through [[Snapshots.readRange]] — the
    * manifest prunes non-intersecting files BEFORE the scan (the
    * mechanism behind Iceberg/Delta data skipping; SnapshotsSpec
    * asserts the file-count reduction, this entry gates the results).
    * The residual filter keeps row-level exactness, so the oracle is
    * the plain predicate over the source table.
    */
  private def snapshotPrunedRead(s: SparkSession, d: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(snapshotPrunedDir)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
    Snapshots.commit(s, li, snapshotPrunedDir,
      statsColumns = Seq("l_orderkey"))
    Snapshots.readRange(s, snapshotPrunedDir, "l_orderkey", 5000L, 7000L)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Concurrent-writer arbitration end-to-end (the optimistic-
    * concurrency half of the snapshot layer): four writers race to
    * commit disjoint quarters of `documents` at the SAME time, each
    * landing on its own version through the atomic no-overwrite claim
    * rename. Which writer wins which version is nondeterministic, so
    * the entry aggregates over the UNION of all four claimed versions
    * — every document must appear exactly once, whatever the claim
    * order — and the oracle recomputes the per-writer counts straight
    * from the source table. A hash match certifies no commit was lost,
    * duplicated, or half-published under contention; SnapshotsSpec
    * separately pins the version-uniqueness and isolation invariants.
    */
  private def snapshotConcurrent(s: SparkSession, d: String): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = new org.apache.hadoop.fs.Path(snapshotRaceDir)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), col("lang"), (col("doc_id") % 4).as("writer"))
    val races = (0L until 4L).map { w =>
      Future(Snapshots.commit(s, docs.filter(col("writer") === w), snapshotRaceDir))
    }
    val versions = Await.result(Future.sequence(races), 10.minutes)
    require(versions.sorted == (1L to 4L) &&
      Snapshots.version(s, snapshotRaceDir) == 4L,
      s"claim arbitration failed: versions $versions")
    versions
      .map(v => Snapshots.readVersion(s, snapshotRaceDir, v))
      .reduce(_ unionByName _)
      .groupBy("writer")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("writer")
  }

  /** Copy-on-write MERGE INTO over the snapshot layer: v1 holds the
    * first 400 documents, then one [[Snapshots.merge]] replaces docs
    * 200–399 (matched → updated n_chars) and inserts docs 400–599
    * (unmatched → appended), committing v2. The entry reads the merged
    * snapshot back; the oracle replays the same upsert arithmetic
    * straight from the source table, so a hash match certifies both
    * MERGE arms — replace and insert — landed exactly once.
    */
  private def snapshotMerge(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotMergeDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotMergeDir)
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotMergeDir, updates, Seq("doc_id"))
    Snapshots.read(s, snapshotMergeDir).orderBy("doc_id")
  }

  /** Change data feed across the full write path: v1 = docs < 400,
    * v2 = MERGE (update 200–399, insert 400–599), v3 = DELETE of every
    * doc_id ≡ 7 (mod 10). [[Snapshots.changes]] diffs v1 → v3 and must
    * emit exactly the inserts that survived the delete, the updates
    * that survived, and a delete row (pre-image) for every v1 doc the
    * predicate removed — rows both inserted and deleted inside the
    * window correctly vanish. The oracle rebuilds both endpoint states
    * from the source table and takes the same keyed diff.
    */
  private def snapshotCdf(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotCdfDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotCdfDir)
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotCdfDir, updates, Seq("doc_id"))
    Snapshots.delete(s, snapshotCdfDir, col("doc_id") % 10 === 7)
    Snapshots.changes(s, snapshotCdfDir, 1L, 3L, Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** Write-time CDF (the Delta-CDF trade, vs q_snapshot_cdf's read-side
    * net diff): the same commit → MERGE → DELETE walk, but with
    * `recordChanges = true` so each transaction publishes its own
    * change rows inside its snapshot by the same atomic claim, and the
    * feed read back over (v1, v3] costs O(|changes|) with no diff
    * computation. Unlike the net diff, intermediate writes survive:
    * docs both inserted at v2 AND deleted at v3 appear twice here. The
    * oracle rebuilds both per-version feeds from the source table.
    */
  private def snapshotCdfFeed(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotFeedDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotFeedDir)
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotFeedDir, updates, Seq("doc_id"),
      recordChanges = true)
    Snapshots.delete(s, snapshotFeedDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    Snapshots.changesFeed(s, snapshotFeedDir, 1L, 3L)
      .select("version", "doc_id", "change_type", "lang", "n_chars")
      .orderBy("version", "doc_id")
  }

  /** Transactional compaction: v1 commits lineitem deliberately
    * scattered (64 undersized files), [[Snapshots.compact]] rewrites it
    * range-clustered on l_orderkey as v2 with a refreshed stats
    * manifest, and the entry answers a selective range query through
    * the COMPACTED layout's manifest pruning. The oracle is the plain
    * range predicate — a hash match certifies the rewrite changed the
    * physical layout without touching a row; SnapshotsSpec asserts the
    * file-count collapse, the post-compaction pruning, and that time
    * travel still reads the scattered v1.
    */
  private def snapshotCompact(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotCompactDir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    Snapshots.commit(s, li.repartition(64), snapshotCompactDir)
    Snapshots.compact(s, snapshotCompactDir, sortCols = Seq("l_orderkey"),
      targetFileBytes = 4L * 1024 * 1024, statsColumns = Seq("l_orderkey"))
    Snapshots.readRange(s, snapshotCompactDir, "l_orderkey", 5000L, 7000L)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** File-scoped MERGE (the O(touched files) cost model): the base
    * commits range-clustered on doc_id with manifest stats, so the
    * update envelope [200, 599] bounds which files the merge can touch
    * — those are rewritten, every lower band is carried into v2 by
    * REFERENCE with its manifest row intact. Same logical semantics as
    * q_snapshot_merge (identical oracle), different physical cost; the
    * SnapshotsSpec sibling asserts the reuse/rewrite split and that
    * pruning still works across carried manifest rows.
    */
  /** BIN-PACK compaction (the steady-state maintenance pass): the base
    * commits a mixed layout — ~90% of the rows range-clustered into 2
    * healthy files, a 10% modulo slice fragmented across 48 small ones
    * (what a day of little streaming commits leaves behind). The
    * bin-pack rewrites ONLY the sub-64KB tail, coalesced without a
    * shuffle, and carries the healthy files by reference with their
    * manifest rows intact — O(small files) write cost where compact()
    * would pay O(table). The oracle is the plain source predicate: a
    * hash match certifies the carried + repacked union is row-exact.
    * SnapshotsSpec pins the file-level contract (big paths shared,
    * small paths gone, no-op short-circuit, delete-sidecar refusal).
    */
  private def snapshotCompactBinpack(s: SparkSession, d: String): DataFrame = {
    clearDir(s, binpackDir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val healthy = li.filter(col("l_orderkey") % 10 =!= 0)
      .repartitionByRange(2, col("l_orderkey"))
    val fragmented = li.filter(col("l_orderkey") % 10 === 0).repartition(48)
    Snapshots.commit(s, healthy.unionByName(fragmented), binpackDir,
      statsColumns = Seq("l_orderkey"))
    Snapshots.compactBinPack(s, binpackDir, minFileBytes = 64L * 1024,
      targetFileBytes = 4L * 1024 * 1024, statsColumns = Seq("l_orderkey"))
    Snapshots.read(s, binpackDir)
      .filter(col("l_orderkey").between(400, 1200))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private def snapshotMergeScoped(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotScopedDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s,
      docs.filter(col("doc_id") < 400)
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"),
      snapshotScopedDir, statsColumns = Seq("doc_id"))
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotScopedDir, updates, Seq("doc_id"),
      statsColumns = Seq("doc_id"), scoped = true)
    Snapshots.read(s, snapshotScopedDir).orderBy("doc_id")
  }

  /** File-scoped MERGE on a COMPOSITE key: the base commits clustered
    * by (lang, doc_id) with per-file stats on both, and the update
    * batch is confined on both dimensions (one lang AND a doc_id
    * band). The file partition intersects the update envelope on EVERY
    * key column, so only files matching BOTH bounds are rewritten — a
    * lang-only envelope would rewrite the whole 'en' band, a
    * doc_id-only envelope one band per lang; the intersection touches
    * their overlap. Logical semantics stay exactly the unscoped
    * two-column MERGE (the oracle replays it); the SnapshotsSpec
    * sibling asserts the reuse/rewrite split on a composite key.
    */
  private def snapshotMergeScopedComposite(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotScoped2Dir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s,
      docs.repartitionByRange(8, col("lang"), col("doc_id"))
        .sortWithinPartitions("lang", "doc_id"),
      snapshotScoped2Dir, statsColumns = Seq("lang", "doc_id"))
    val updates = docs
      .filter(col("lang") === "en" && col("doc_id").between(100, 299))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotScoped2Dir, updates, Seq("lang", "doc_id"),
      statsColumns = Seq("lang", "doc_id"), scoped = true)
    Snapshots.read(s, snapshotScoped2Dir).orderBy("doc_id")
  }

  /** Schema evolution through MERGE (the Delta `mergeSchema` trade):
    * v1 commits documents WITHOUT n_chars, then a merge whose source
    * carries the new column evolves the table — the committed schema
    * becomes the union, pre-evolution rows read NULL for the new
    * column, and the merge's update/insert arms still apply by key.
    * The oracle rebuilds the evolved state from the source table with
    * the same NULL-fill rule, so a hash match certifies both the
    * evolution and that no pre-existing row was disturbed by it.
    * Default stays strict (SnapshotsSpec proves column drift throws
    * without the opt-in — a typo'd producer cannot fork the schema).
    */
  private def snapshotSchemaEvo(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotEvoDir)
    val docs = Tables(s, d, "documents")
    Snapshots.commit(s,
      docs.select("doc_id", "lang").filter(col("doc_id") < 300), snapshotEvoDir)
    val updates = docs.select("doc_id", "lang", "n_chars")
      .filter(col("doc_id").between(200, 499))
    Snapshots.merge(s, snapshotEvoDir, updates, Seq("doc_id"),
      evolveSchema = true)
    Snapshots.read(s, snapshotEvoDir).orderBy("doc_id")
  }

  /** Commit-time expectations (the Delta CHECK-constraint analog): v1
    * declares two invariants which then live INSIDE the snapshot chain
    * and are enforced by every subsequent write path. A valid merge
    * passes (v2); a merge that would null out `lang` is REJECTED
    * atomically — the exception carries per-expectation violation
    * counts, the table tip stays at v2, and no staging residue
    * survives. The entry pins the rejection outcome (`rejected_held`)
    * alongside the surviving state; the oracle rebuilds that state from
    * the source, so a hash match certifies the bad write left no trace.
    */
  private def snapshotExpectations(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotExpectDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotExpectDir,
      addExpectations = Seq(
        "doc_id_nonneg" -> "doc_id >= 0",
        "lang_present" -> "lang IS NOT NULL"))
    Snapshots.merge(s, snapshotExpectDir,
      docs.filter(col("doc_id").between(400, 499)), Seq("doc_id"))
    val rejected =
      try {
        Snapshots.merge(s, snapshotExpectDir,
          docs.filter(col("doc_id") < 50)
            .withColumn("lang", lit(null).cast("string")),
          Seq("doc_id"))
        0L
      } catch {
        case e: Snapshots.CommitRejectedException =>
          // exactly the 50 nulled rows violate, and only lang_present
          if (e.violations == Seq("lang_present" -> 50L)) 1L else 0L
      }
    val held =
      if (rejected == 1L && Snapshots.version(s, snapshotExpectDir) == 2L) 1L
      else 0L
    Snapshots.read(s, snapshotExpectDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .withColumn("rejected_held", lit(held))
      .orderBy("lang")
  }

  /** Streaming consumption of the write-time change feed: the same
    * commit → MERGE → DELETE walk as q_snapshot_cdf_feed, but the feed
    * is drained through [[Snapshots.changesStream]] — a checkpointed
    * file-source stream globbing every version's `_changes` directory
    * whose discovery unit is
    * the atomic claim — under `Trigger.AvailableNow`. Same oracle as
    * the batch feed read: a hash match certifies the streaming path
    * delivers exactly the recorded changes, no loss, no duplication.
    * SnapshotsSpec additionally proves the INCREMENTAL contract (a
    * second drain on the same checkpoint sees only commits made after
    * the first).
    */
  private def snapshotCdfStream(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotStreamDir)
    clearDir(s, snapshotStreamCkpt)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotStreamDir)
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotStreamDir, updates, Seq("doc_id"),
      recordChanges = true)
    Snapshots.delete(s, snapshotStreamDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    // fault-tolerant file sink (exactly-once with the checkpoint, and
    // unlike the memory sink it supports resuming — the contract the
    // incremental spec exercises)
    clearDir(s, snapshotStreamOut)
    val q = Snapshots.changesStream(s, snapshotStreamDir)
      .writeStream.format("parquet")
      .option("path", snapshotStreamOut)
      .option("checkpointLocation", snapshotStreamCkpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(snapshotStreamOut)
      .select("version", "doc_id", "change_type", "lang", "n_chars")
      .orderBy("version", "doc_id")
  }

  /** Z-order-clustered transactional compaction (the OPTIMIZE ZORDER
    * BY of the real formats): lineitem commits scattered, then one
    * [[Snapshots.compact]] rewrite clusters the layout on the Morton
    * interleave of (l_orderkey, l_partkey) — each file now covers a
    * compact rectangle in that 2-D space, so the SAME min/max manifest
    * prunes range reads on EITHER column (a 1-D sort would prune only
    * its leading column; at 100 TB the second dimension's full scan is
    * what this buys back). The entry answers one range per dimension
    * through the pruned path; the oracle is the plain pair of range
    * predicates, so a hash match certifies the multi-dim rewrite moved
    * files, not rows. SnapshotsSpec asserts both dimensions actually
    * prune below the total file count.
    */
  private def snapshotZorder(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotZorderDir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    Snapshots.commit(s, li.repartition(64), snapshotZorderDir)
    Snapshots.compact(s, snapshotZorderDir,
      zorderCols = Seq("l_orderkey", "l_partkey"),
      targetFileBytes = 512L * 1024,
      statsColumns = Seq("l_orderkey", "l_partkey"))
    val byOrder = Snapshots
      .readRange(s, snapshotZorderDir, "l_orderkey", 5000L, 7000L)
      .withColumn("dim", lit("orderkey"))
    val byPart = Snapshots
      .readRange(s, snapshotZorderDir, "l_partkey", 100L, 300L)
      .withColumn("dim", lit("partkey"))
    byOrder.unionByName(byPart)
      .orderBy("dim", "l_orderkey", "l_linenumber")
  }

  /** THREE-dimensional Z-order (VERDICT r8 #5): same transactional
    * rewrite as q_snapshot_zorder, clustering on the k-dim Morton
    * interleave ([[graft.functions.ZOrderK]], 21 bits per dimension at
    * k=3) of (l_orderkey, l_partkey, l_suppkey) — and the proof burden
    * is the THIRD dimension: a 1-D sort prunes its leading column, a
    * 2-D interleave covers two, but a range read on l_suppkey would
    * full-scan both of those layouts. The entry answers one range per
    * dimension through the pruned path; the oracle is the plain range
    * predicates (layout-independent), so a hash match certifies the
    * 3-D rewrite moved files, not rows. SnapshotsSpec asserts all
    * three dimensions prune below the total file count.
    */
  private def snapshotZorder3(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotZorder3Dir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity")
    Snapshots.commit(s, li.repartition(64), snapshotZorder3Dir)
    Snapshots.compact(s, snapshotZorder3Dir,
      zorderCols = Seq("l_orderkey", "l_partkey", "l_suppkey"),
      targetFileBytes = 512L * 1024,
      statsColumns = Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val byOrder = Snapshots
      .readRange(s, snapshotZorder3Dir, "l_orderkey", 5000L, 7000L)
      .withColumn("dim", lit("orderkey"))
    val byPart = Snapshots
      .readRange(s, snapshotZorder3Dir, "l_partkey", 100L, 300L)
      .withColumn("dim", lit("partkey"))
    val bySupp = Snapshots
      .readRange(s, snapshotZorder3Dir, "l_suppkey", 10L, 40L)
      .withColumn("dim", lit("suppkey"))
    byOrder.unionByName(byPart).unionByName(bySupp)
      .orderBy("dim", "l_orderkey", "l_linenumber")
  }

  /** Compound AND-of-ranges read through the manifest: one pass prunes
    * on BOTH columns' envelopes simultaneously ([[Snapshots.readRanges]])
    * — the multi-predicate serving shape a clustered 100 TB table
    * answers with the intersection rectangle, not the union of two
    * single-column selections. The oracle is the conjunction of the
    * plain range predicates; SnapshotsSpec asserts the intersection
    * selects no more files than either single-column probe.
    */
  private def snapshotRangeAnd(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotRangeAndDir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
    Snapshots.commit(s, li, snapshotRangeAndDir,
      statsColumns = Seq("l_orderkey", "l_partkey"))
    Snapshots.readRanges(s, snapshotRangeAndDir,
      Seq(("l_orderkey", 5000L, 7000L), ("l_partkey", 100L, 300L)))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Metadata-only statistics ([[Snapshots.tableStats]]): COUNT(*) and
    * per-column MIN/MAX answered from the manifest — O(root list) reads
    * where a scan would be O(table), the `SELECT COUNT(*)` every real
    * format serves from its log. The oracle recomputes the same
    * aggregates over the source table, so a hash match certifies the
    * committed per-file counts and envelopes are EXACT, not estimates;
    * SnapshotsSpec pins the merge-on-read fallback (pending deletes →
    * scan-side answer, still exact).
    */
  private def snapshotStatsMeta(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotStatsDir)
    val li = Tables(s, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .repartitionByRange(8, col("l_orderkey"))
    Snapshots.commit(s, li, snapshotStatsDir,
      statsColumns = Seq("l_orderkey", "l_extendedprice"))
    Snapshots.tableStats(s, snapshotStatsDir,
      Seq("l_orderkey", "l_extendedprice"))
  }

  /** Timestamp time travel, oracle-gated end-to-end: three commits at
    * INJECTED timestamps (the determinism seam [[Snapshots.commit]]
    * exposes for exactly this; production stamps the wall clock), then
    * two `readAsOf` reads at instants BETWEEN commits — each must
    * resolve to the version that was current then, inclusive at the
    * boundary. The oracle rebuilds both expected states from the
    * source table, so a hash match certifies the resolution rule, not
    * just "some snapshot was read".
    */
  private def snapshotAsOf(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotAsOfDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 100), snapshotAsOfDir,
      commitMillis = Some(1000L))
    Snapshots.commit(s, docs.filter(col("doc_id") < 200), snapshotAsOfDir,
      commitMillis = Some(2000L))
    Snapshots.commit(s, docs.filter(col("doc_id") < 300), snapshotAsOfDir,
      commitMillis = Some(3000L))
    val atV1 = Snapshots.readAsOf(s, snapshotAsOfDir, 1500L)
      .withColumn("as_of", lit(1500L))
    val atV2 = Snapshots.readAsOf(s, snapshotAsOfDir, 2000L) // inclusive
      .withColumn("as_of", lit(2000L))
    atV1.unionByName(atV2).orderBy("as_of", "doc_id")
  }

  /** Incremental derived table maintained from the change feed — the
    * composition the CDF machinery exists FOR: a derived (featurized)
    * snapshot table is bootstrapped from the source's v1, the source
    * then takes a MERGE with `recordChanges = true`, and the derived
    * table is brought current by processing ONLY the 250 recorded
    * change rows and upserting them — never re-reading the other 350
    * source docs. At 100 TB this O(|changes|) maintenance loop is the
    * difference between an affordable hourly refresh and a full
    * recompute; the oracle rebuilds the final derived state from
    * scratch, so a hash match certifies the incremental path converged
    * to exactly the full-recompute answer.
    */
  private def snapshotIncrPipeline(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotIncrSrcDir)
    clearDir(s, snapshotIncrDerDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    def featurize(df: DataFrame): DataFrame =
      df.withColumn("quality_bucket",
        when(col("n_chars") >= 1000, lit("long")).otherwise(lit("short")))
    // source v1 and the derived bootstrap from it
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotIncrSrcDir)
    Snapshots.commit(s, featurize(Snapshots.read(s, snapshotIncrSrcDir)),
      snapshotIncrDerDir)
    // source moves: 50 updates + 200 inserts, changes recorded
    val updates = docs.filter(col("doc_id").between(350, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.merge(s, snapshotIncrSrcDir, updates, Seq("doc_id"),
      recordChanges = true)
    // derived catches up from the feed alone
    val changed = Snapshots.changesFeed(s, snapshotIncrSrcDir, 1L, 2L)
      .filter(col("change_type") =!= "delete")
      .select("doc_id", "lang", "n_chars")
    Snapshots.merge(s, snapshotIncrDerDir, featurize(changed), Seq("doc_id"))
    Snapshots.read(s, snapshotIncrDerDir).orderBy("doc_id")
  }

  /** Hidden partitioning end-to-end: events commit through a partition
    * spec — `day(ts)` and `bucket(8, user_id)` — so the write clusters
    * by the transform tuple and the manifest records each file's
    * transform envelope; NO partition column exists in the data and
    * the probes below name only raw columns. Two reads exercise both
    * transform families: a day+user point probe (both transforms
    * prune, then exact residuals keep rows precise) and a day-level
    * probe through [[Snapshots.scanPartitioned]] (the caller's
    * predicate lives at the transform level). At 100 TB this is the
    * difference between scanning ~1/(30·8) of the table and scanning
    * all of it — and because pruning happens on manifest rows (one per
    * file) the planning cost is coordinator-sized, not data-sized.
    * The oracle recomputes both probes as plain filters over the
    * source table; SnapshotsSpec asserts the file-count reduction and
    * the subset/superset contracts on the same layout.
    */
  private def snapshotHiddenPartition(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotHiddenDir)
    val ev = Tables(s, d, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    Snapshots.commit(s, ev, snapshotHiddenDir,
      partitionSpec = Seq(
        Snapshots.Transform.Day("ts"),
        Snapshots.Transform.Bucket("user_id", 8)))
    val day = java.sql.Date.valueOf("2024-01-05")
    val witness = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    // point probe: user 7 on Jan 5 — day prunes via the witness
    // instant, bucket prunes via the raw user id, residuals keep exact
    val point = Snapshots
      .scanPartitioned(s, snapshotHiddenDir,
        Seq("ts" -> witness, "user_id" -> 7L))
      .filter(to_date(col("ts")) === day && col("user_id") === 7L)
      .withColumn("probe", lit("point"))
    // day probe: everything on Jan 12 regardless of user
    val witness12 = java.sql.Timestamp.valueOf("2024-01-12 00:30:00")
    val dayScan = Snapshots
      .scanPartitioned(s, snapshotHiddenDir, Seq("ts" -> witness12))
      .filter(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-01-12")))
      .withColumn("probe", lit("day"))
    point.unionByName(dayScan).orderBy("probe", "event_id")
  }

  /** Merge-on-read delete end-to-end: two MoR deletes commit only
    * delete-KEY sidecars (every data file rides by reference — the
    * deletion-vector trade: O(matched keys) write, one anti-join read),
    * then the live view is served through the reader that applies the
    * accumulated set. The oracle is the plain complement filter, so a
    * hash match certifies no deleted row survives and no kept row is
    * lost across sidecar accumulation. SnapshotsSpec additionally
    * asserts zero data-file rewrites, pruned-reader correctness,
    * time-travel to the pre-delete state, and compaction folding.
    */
  private def snapshotMorDelete(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotMorDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs, snapshotMorDir, statsColumns = Seq("doc_id"))
    Snapshots.deleteMergeOnRead(s, snapshotMorDir,
      col("lang") === "de", key = Seq("doc_id"),
      statsColumns = Seq("doc_id"))
    Snapshots.deleteMergeOnRead(s, snapshotMorDir,
      col("doc_id") < 50, key = Seq("doc_id"),
      statsColumns = Seq("doc_id"))
    Snapshots.read(s, snapshotMorDir).orderBy("doc_id")
  }

  /** Merge-on-read MERGE (positional deletion vectors): the same upsert
    * as q_snapshot_merge — update docs 200-399, insert 400-599 — but
    * committed via [[Snapshots.mergeOnRead]]: update rows land as the
    * commit's own files, matched base rows are superseded by
    * (file, row_index) coordinates, and every base file rides by
    * reference. IDENTICAL oracle to q_snapshot_merge: both MERGE
    * physical strategies must produce the same logical table, which is
    * exactly the copy-on-write / merge-on-read equivalence contract
    * real formats promise. SnapshotsSpec pins the physical claims
    * (zero base rewrites, accumulation across generations, folding).
    */
  private def snapshotMorUpsert(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotMorUpsertDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotMorUpsertDir,
      statsColumns = Seq("doc_id"))
    val updates = docs.filter(col("doc_id").between(200, 599))
      .withColumn("n_chars", col("n_chars") + 1000)
    Snapshots.mergeOnRead(s, snapshotMorUpsertDir, updates, Seq("doc_id"),
      statsColumns = Seq("doc_id"))
    Snapshots.read(s, snapshotMorUpsertDir).orderBy("doc_id")
  }

  /** RESTORE TO VERSION end-to-end: v1 holds docs < 300, a merge
    * "damages" the table (v2), and [[Snapshots.restore]] publishes v1's
    * state back as v3 — a metadata-only commit whose files are v1's by
    * reference. The oracle is v1's defining filter straight from the
    * source table, so a hash match certifies the rollback restored the
    * EXACT pre-damage state; SnapshotsSpec pins the physical claims
    * (file sharing, history forensics, carried manifest/sidecars).
    */
  private def snapshotRestore(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotRestoreDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 300), snapshotRestoreDir,
      statsColumns = Seq("doc_id"))
    Snapshots.merge(s, snapshotRestoreDir,
      docs.filter(col("doc_id").between(100, 499))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), statsColumns = Seq("doc_id"))
    Snapshots.restore(s, snapshotRestoreDir, 1L)
    Snapshots.read(s, snapshotRestoreDir).orderBy("doc_id")
  }

  /** BRANCHES end-to-end: main commits docs < 400, `dev` branches at v1
    * (O(metadata) — pure references, no file copied), branch work
    * updates docs 200-399 and inserts 400-599 through TWO branch
    * commits while main stays untouched, then the branch tip merges
    * back as a standard snapshot MERGE. The output unions main's final
    * state with the PRE-merge main state (read via time travel), so a
    * hash match certifies BOTH that the merge landed the branch's rows
    * exactly and that branch commits never leaked into main's history.
    * SnapshotsSpec pins the claim-isolation physics (8 writers racing
    * across two branches, per-branch namespaces, GC roots).
    */
  private def snapshotBranch(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotBranchDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), snapshotBranchDir,
      statsColumns = Seq("doc_id"))
    Snapshots.createBranch(s, snapshotBranchDir, "dev")
    // branch commit 1: update docs 200-399
    Snapshots.commitToBranch(s,
      Snapshots.readBranch(s, snapshotBranchDir, "dev")
        .withColumn("n_chars",
          when(col("doc_id") >= 200, col("n_chars") + 1000)
            .otherwise(col("n_chars"))),
      snapshotBranchDir, "dev")
    // branch commit 2: insert docs 400-599 (also +1000, matching the
    // oracle's uniform rule for the updated range)
    Snapshots.commitToBranch(s,
      Snapshots.readBranch(s, snapshotBranchDir, "dev").unionByName(
        docs.filter(col("doc_id").between(400, 599))
          .withColumn("n_chars", col("n_chars") + 1000)),
      snapshotBranchDir, "dev")
    Snapshots.mergeBranch(s, snapshotBranchDir, "dev", key = Seq("doc_id"),
      statsColumns = Seq("doc_id"))
    val after = Snapshots.read(s, snapshotBranchDir)
      .withColumn("state", lit("merged"))
    val mainBefore = Snapshots.readVersion(s, snapshotBranchDir, 1L)
      .withColumn("state", lit("pre_merge"))
    after.unionByName(mainBefore).orderBy("state", "doc_id")
  }

  /** RENAME WITHOUT REWRITE end-to-end: docs < 300 commit range-
    * clustered with doc_id stats, then TWO metadata-only renames
    * (doc_id→doc, n_chars→char_count — zero data files rewritten, the
    * Iceberg field-id contract [[Snapshots.renameColumn]] reproduces
    * with a name map), then a SCOPED merge keyed by the NEW name
    * upserts 200-449 (+1000) — the write path accepts logical names
    * and normalizes the staged files back to the immutable physical
    * schema. The output is a manifest-PRUNED range read probed by the
    * renamed column, so a hash match certifies the whole loop: rename
    * is invisible to values, pruning translates logical→physical, and
    * post-rename writes land consistently. RenameCloneSpec pins the
    * physical claims (no rewrite, physical footers, pruning file
    * counts, restore/time-travel name semantics).
    */
  private def snapshotRename(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotRenameDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s,
      docs.filter(col("doc_id") < 300)
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"),
      snapshotRenameDir, statsColumns = Seq("doc_id"))
    Snapshots.renameColumn(s, snapshotRenameDir, "doc_id", "doc")
    Snapshots.renameColumn(s, snapshotRenameDir, "n_chars", "char_count")
    Snapshots.merge(s, snapshotRenameDir,
      docs.filter(col("doc_id").between(200, 449))
        .select(col("doc_id").as("doc"), col("lang"),
          (col("n_chars") + 1000).as("char_count")),
      Seq("doc"), statsColumns = Seq("doc"), scoped = true)
    Snapshots.readRange(s, snapshotRenameDir, "doc", 100L, 400L)
      .orderBy("doc")
  }

  /** SQL TIME TRAVEL end-to-end: the snapshot layer consumed ENTIRELY
    * through plain SQL via the injected table functions —
    * `snapshot(dir)` (current), `snapshot(dir, v)` (VERSION AS OF),
    * and `snapshot_changes(dir, from, to)` (the write-time CDF) — the
    * surface a thriftserver/SQL-only client gets with
    * `spark.sql.extensions=graft.GraftExtensions`. Setup: docs < 300
    * commit, then a recorded merge updates 150-299 (+1000) and inserts
    * 300-449. The output unions all three SQL reads, so a hash match
    * certifies current state, version pinning, and the change feed
    * agree with the oracle through the SQL path alone.
    */
  private def snapshotSql(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotSqlDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 300), snapshotSqlDir,
      statsColumns = Seq("doc_id"))
    Snapshots.merge(s, snapshotSqlDir,
      docs.filter(col("doc_id").between(150, 449))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), statsColumns = Seq("doc_id"), recordChanges = true)
    s.sql(
      s"""SELECT doc_id, lang, n_chars, 'current' AS at
         |FROM snapshot('$snapshotSqlDir')
         |UNION ALL
         |SELECT doc_id, lang, n_chars, 'v1' AS at
         |FROM snapshot('$snapshotSqlDir', 1)
         |UNION ALL
         |SELECT doc_id, lang, n_chars, concat('chg_', change_type) AS at
         |FROM snapshot_changes('$snapshotSqlDir', 1, 2)
         |ORDER BY at, doc_id""".stripMargin)
  }

  /** DROP COLUMN WITHOUT REWRITE end-to-end: docs < 300 commit with a
    * `source` column, [[Snapshots.dropColumn]] tombstones it in the
    * column map (metadata-only — old files keep the bytes, readers
    * hide them), then a SCOPED merge upserts 150-399 (+1000) in the
    * post-drop three-column schema — rewritten files physically shed
    * the column while carried files keep their hidden bytes, and both
    * read identically. Output = a manifest-pruned range read; a hash
    * match certifies the drop is invisible to surviving values across
    * the mixed physical layouts. RenameCloneSpec pins the physics
    * (zero rewrites at drop time, shed footers, reuse refusal,
    * dependency guards).
    */
  private def snapshotDropColumn(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotDropDir)
    val docs = Tables(s, d, "documents")
      .select("doc_id", "lang", "n_chars", "source")
    Snapshots.commit(s,
      docs.filter(col("doc_id") < 300)
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"),
      snapshotDropDir, statsColumns = Seq("doc_id"))
    Snapshots.dropColumn(s, snapshotDropDir, "source")
    Snapshots.merge(s, snapshotDropDir,
      docs.filter(col("doc_id").between(150, 399))
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 1000).as("n_chars")),
      Seq("doc_id"), statsColumns = Seq("doc_id"), scoped = true)
    Snapshots.readRange(s, snapshotDropDir, "doc_id", 100L, 350L)
      .orderBy("doc_id")
  }

  /** TYPE WIDENING WITHOUT REWRITE end-to-end: docs < 300 commit with
    * `n_chars` deliberately stored as INT, [[Snapshots.widenColumn]]
    * promotes it to BIGINT by a metadata-only commit, then a SCOPED
    * merge writes values ABOVE Int.MaxValue (+3e9 — the overflow that
    * motivates the widening) into files that sit NEXT TO the narrow
    * originals; every reader pins the wide schema so the mixed layout
    * upcasts transparently. Output = a manifest-pruned range read over
    * the mixed generations; a hash match certifies narrow values
    * survived bit-exact and wide values landed. WidenFeasibilitySpec
    * pins the physics (upcast contract, zero rewrites, mixed-manifest
    * pruning, bloom/bucket refusals).
    */
  private def snapshotWiden(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotWidenDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s,
      docs.filter(col("doc_id") < 300)
        .withColumn("n_chars", col("n_chars").cast("int"))
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"),
      snapshotWidenDir, statsColumns = Seq("doc_id", "n_chars"))
    Snapshots.widenColumn(s, snapshotWidenDir, "n_chars", "bigint")
    Snapshots.merge(s, snapshotWidenDir,
      docs.filter(col("doc_id").between(200, 449))
        .withColumn("n_chars", col("n_chars") + lit(3000000000L)),
      Seq("doc_id"), statsColumns = Seq("doc_id", "n_chars"), scoped = true)
    Snapshots.readRange(s, snapshotWidenDir, "doc_id", 100L, 400L)
      .orderBy("doc_id")
  }

  /** SHALLOW CLONE end-to-end: docs < 400 commit range-clustered in the
    * SOURCE table, [[Snapshots.cloneTable]] publishes the clone as a
    * zero-copy absolute-reference commit (O(manifest), no data bytes
    * moved), then the clone DIVERGES via a scoped merge (+1000 on
    * 250-499) that rewrites only the touched shared files — untouched
    * source files keep backing the clone by reference. The output
    * unions a manifest-pruned range read of the DIVERGED clone with the
    * source's (unchanged) full state, so a hash match certifies clone
    * reads, carried-manifest pruning through absolute references,
    * divergence, and source isolation at once. RenameCloneSpec pins the
    * physics (zero copied files, pruning counts, GC isolation).
    */
  private def snapshotClone(s: SparkSession, d: String): DataFrame = {
    clearDir(s, cloneSrcDir)
    clearDir(s, cloneDstDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s,
      docs.filter(col("doc_id") < 400)
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"),
      cloneSrcDir, statsColumns = Seq("doc_id"))
    Snapshots.cloneTable(s, cloneSrcDir, cloneDstDir)
    Snapshots.merge(s, cloneDstDir,
      docs.filter(col("doc_id").between(250, 499))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), statsColumns = Seq("doc_id"), scoped = true)
    val clone = Snapshots.readRange(s, cloneDstDir, "doc_id", 200L, 460L)
      .withColumn("side", lit("clone"))
    val source = Snapshots.read(s, cloneSrcDir)
      .withColumn("side", lit("source"))
    clone.unionByName(source).orderBy("side", "doc_id")
  }

  /** DESCRIBE HISTORY: three commits with injected commit timestamps,
    * then the metadata-only audit view — version, commit instant, file
    * count (own + referenced), and the manifest's row count, none of
    * it from a data scan. The oracle rebuilds each row from the
    * source predicates, so a hash match certifies the history surface
    * reports true counts, not directory guesses.
    */
  private def snapshotHistory(s: SparkSession, d: String): DataFrame = {
    clearDir(s, historyDir)
    val li = Tables(s, d, "lineitem").select("l_orderkey", "l_quantity")
    Snapshots.commit(s, li.filter(col("l_quantity") > 45).repartition(2),
      historyDir, statsColumns = Seq("l_orderkey"),
      commitMillis = Some(1700000000000L))
    Snapshots.commit(s, li.filter(col("l_quantity") > 30).repartition(2),
      historyDir, statsColumns = Seq("l_orderkey"),
      commitMillis = Some(1700000001000L))
    Snapshots.commit(s, li.repartition(2), historyDir,
      statsColumns = Seq("l_orderkey"),
      commitMillis = Some(1700000002000L))
    Snapshots.history(s, historyDir).orderBy("version")
  }

  /** Manifest-pruned RETENTION delete: events commit day-clustered (30
    * range partitions over January, per-file ts envelopes + null
    * counts in the manifest), then `DELETE WHERE ts <= Jan 10` decides
    * every file from its manifest row — files wholly inside the
    * expired band DROP from the manifest unread, files past the cutoff
    * carry by reference, and only the boundary straddler is rewritten
    * with the row filter. Evicting a time band from a 100 TB table
    * costs O(straddling files) this way; delete() would rewrite the
    * table. Oracle = the surviving-range select; SnapshotsSpec pins
    * the drop/carry/rewrite trichotomy and NULL-keeping semantics.
    */
  private def snapshotDeleteRetention(s: SparkSession, d: String): DataFrame = {
    clearDir(s, retentionDir)
    val ev = Tables(s, d, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    Snapshots.commit(s,
      ev.repartitionByRange(30, col("ts")).sortWithinPartitions("ts"),
      retentionDir, statsColumns = Seq("ts"))
    val cutoff = java.sql.Timestamp.valueOf("2024-01-10 23:59:59.999999")
    Snapshots.deleteRange(s, retentionDir, "ts", lo = null, hi = cutoff,
      statsColumns = Seq("ts"))
    Snapshots.read(s, retentionDir)
      .select(col("event_id"),
        col("ts").cast("long").as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** PARTITION-SPEC EVOLUTION end-to-end (Iceberg's spec-id-per-file
    * model): events before Jan 8 commit under spec A (day(ts)); the
    * rest APPEND through [[Snapshots.evolvePartitionSpec]] under spec B
    * (bucket(user_id, 8)) without rewriting a single spec-A file — the
    * layout change costs O(new rows), the whole point at 100 TB. The
    * entry then reads through BOTH layouts: a day probe (covered only
    * by spec A) prunes A's files by their day envelope and keeps every
    * B file; a user probe (covered only by spec B) prunes B's files by
    * bucket and keeps every A file — per-spec pruned selections
    * unioned, residual filters keeping rows exact. Oracle = the plain
    * filters over the source; SnapshotsSpec pins the physical claims
    * (zero spec-A rewrites, per-spec file-count reductions under each
    * probe).
    */
  private def snapshotSpecEvolution(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotSpecEvoDir)
    val ev = Tables(s, d, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val cut = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    Snapshots.commit(s, ev.filter(col("ts") < cut), snapshotSpecEvoDir,
      partitionSpec = Seq(Snapshots.Transform.Day("ts")))
    Snapshots.evolvePartitionSpec(s, snapshotSpecEvoDir,
      ev.filter(col("ts") >= cut),
      newSpec = Seq(Snapshots.Transform.Bucket("user_id", 8)))
    val witness = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val day = Snapshots
      .scanPartitioned(s, snapshotSpecEvoDir, Seq("ts" -> witness))
      .filter(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-01-05")))
      .withColumn("probe", lit("day"))
    val user = Snapshots
      .readPartitioned(s, snapshotSpecEvoDir, Seq("user_id" -> 7L))
      .withColumn("probe", lit("user"))
    day.unionByName(user).orderBy("probe", "event_id")
  }

  /** IN-list read through hidden partitioning: the multi-point serving
    * shape (fetch THESE keys) over the same bucket-transformed layout
    * as q_snapshot_hidden_partition — one manifest pass prunes to the
    * files whose bucket envelope admits ANY of the probed users, the
    * exact IN residual keeps rows precise. At 100 TB an n-key fetch
    * costs one coordinator-sized manifest scan + ~n buckets of data,
    * not n separate plans or a full scan. The oracle is the plain IN
    * filter; SimilaritySpec/SnapshotsSpec assert the file-count
    * reduction on this API's other users (the IVF probe path).
    */
  private def snapshotInRead(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotInReadDir)
    val ev = Tables(s, d, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    Snapshots.commit(s, ev, snapshotInReadDir,
      partitionSpec = Seq(Snapshots.Transform.Bucket("user_id", 16)))
    Snapshots
      .readPartitionedIn(s, snapshotInReadDir, "user_id",
        Seq(3L, 17L, 42L, 99L))
      .orderBy("event_id")
  }

  /** Bloom-manifest point lookup (the skipping complement to range
    * stats): documents commit in a deliberately RANDOM 16-file layout —
    * every file's doc_id min/max spans the whole table, so range stats
    * prune nothing — with a per-file bloom sketch on doc_id. The entry
    * answers equality lookups through [[Snapshots.readPoint]], which
    * prunes files whose sketch rules the value out before scanning;
    * the oracle is the plain equality predicate (bloom false positives
    * only cost a read, the residual filter keeps rows exact, false
    * negatives are impossible by the bloom contract). SnapshotsSpec
    * asserts the file-count reduction on the same layout shape.
    */
  private def snapshotBloomRead(s: SparkSession, d: String): DataFrame = {
    clearDir(s, snapshotBloomDir)
    val docs = Tables(s, d, "documents")
      .select("doc_id", "lang", "n_chars").repartition(16)
    Snapshots.commit(s, docs, snapshotBloomDir, bloomColumns = Seq("doc_id"))
    Seq(37L, 137L, 420L)
      .map(id => Snapshots.readPoint(s, snapshotBloomDir, "doc_id", id))
      .reduce(_ unionByName _)
      .orderBy("doc_id")
  }

  /** Incremental materialized view, pure-delta path ([[Views]]): a
    * per-language rollup materializes at v1 of a snapshotted source,
    * the source then takes a MERGE (updates + inserts, feed recorded
    * with pre-images) and a DELETE, and ONE [[Views.refreshView]]
    * brings the rollup current by applying the recorded feed — no
    * source data file is read (ViewsSpec proves that by deleting
    * them). `incremental_ok` pins that the refresh was exactly one
    * view commit and left staleness 0; the oracle recomputes the
    * rollup from the replayed final state, so a hash match certifies
    * delta maintenance equals full recomputation — exactly (integer
    * sums; no tolerance).
    */
  private def snapshotMvRefresh(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvSrcDir); clearDir(s, mvViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvSrcDir)
    Views.createView(s, mvSrcDir, mvViewDir, Seq("lang"),
      sumCols = Seq("n_chars"))
    Snapshots.merge(s, mvSrcDir,
      docs.filter(col("doc_id").between(200, 599))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), recordChanges = true, preImages = true)
    Snapshots.delete(s, mvSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    val v = Views.refreshView(s, mvSrcDir, mvViewDir)
    val ok =
      if (v == 2L && Views.staleness(s, mvSrcDir, mvViewDir) == 0L) 1L
      else 0L
    Views.readView(s, mvViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"))
      .withColumn("incremental_ok", lit(ok))
      .orderBy("lang")
  }

  /** The UPSERT CONTRACT on a single-table view (r16): a post-only
    * merge — `recordChanges = true` WITHOUT pre-images, the compact
    * feed every CDC producer emits by default — lands a wave of bare
    * `update` rows that pre-r16 refused outright. Declaring the merge
    * key the upserts used (`upsertKey = (doc_id, lang)`) lets the
    * refresh PROVE the post-image determines the hidden pre-image's
    * group (lang is part of the key, so pre and post agree on it
    * bitwise) and digest the wave through the same touched-group
    * rescan deletes take; the window here mixes the upsert wave with
    * a delete wave, so one refresh exercises rescan-under-both. The
    * view carries a MAX column deliberately: the upsert wave RAISES
    * some group maxima and the delete wave can SHRINK them — states
    * only a recompute route can reach. The oracle replays the final
    * state in SQL (band %10=3 bumped, %10=7 deleted) and recomputes
    * count/sum/max from scratch; `incremental_ok` pins that the whole
    * lifecycle cost exactly one refresh commit and left zero
    * staleness. ViewsSpec pins the refusals (undeclared and
    * underdetermined keys) this entry's green path must not weaken.
    */
  private def snapshotMvUpsert(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvUpSrcDir); clearDir(s, mvUpViewDir)
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .filter(col("doc_id") < 900)
    Snapshots.commit(s, docs, mvUpSrcDir)
    Views.createView(s, mvUpSrcDir, mvUpViewDir, Seq("lang"),
      sumCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    // the upsert wave: %10=3 band re-merged with +500 chars, POST-ONLY
    Snapshots.merge(s, mvUpSrcDir,
      docs.filter(col("doc_id") % 10 === 3)
        .withColumn("n_chars", col("n_chars") + 500),
      Seq("doc_id", "lang"), recordChanges = true)
    // the delete wave in the SAME stale window
    Snapshots.delete(s, mvUpSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    val v = Views.refreshView(s, mvUpSrcDir, mvUpViewDir,
      upsertKey = Seq("doc_id", "lang"))
    val ok =
      if (v == 2L && Views.staleness(s, mvUpSrcDir, mvUpViewDir) == 0L) 1L
      else 0L
    Views.readView(s, mvUpViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"),
        col("max_n_chars").as("max_chars"))
      .withColumn("incremental_ok", lit(ok))
      .orderBy("lang")
  }

  /** Approximate COUNT DISTINCT as a maintained view column: the view
    * row carries per-group HLL register maps (the repo's md5-60/1024-
    * register arithmetic), merged as register-max deltas through an
    * insert-only append window (idempotent — replay-safe) and
    * recomputed through the touched-group rescan when a delete wave
    * lands (registers cannot forget a value). The oracle replays the
    * estimator EXACTLY (integer harmonic sum, one IEEE division,
    * linear-counting correction, round 4) and recomputes the exact
    * distincts; `ok` gates the m=1024 error envelope (±15%, the
    * family's standard gate — sketch_hll_tokens; 1σ ≈ 3.2%, and the
    * 100–300-distinct boundary region between linear counting and the
    * raw estimator routinely lands near 5%, which an sf0.1 sweep
    * caught when this gated tighter).
    */
  private def snapshotMvDistinct(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvDcSrcDir); clearDir(s, mvDcViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvDcSrcDir,
      statsColumns = Seq("doc_id"))
    Views.createView(s, mvDcSrcDir, mvDcViewDir, Seq("lang"),
      sumCols = Seq("n_chars"), distinctCols = Seq("doc_id"))
    Snapshots.append(s, mvDcSrcDir,
      docs.filter(col("doc_id").between(400, 899)), Seq("doc_id"),
      recordChanges = true)
    Views.refreshView(s, mvDcSrcDir, mvDcViewDir) // insert-only: delta
    Snapshots.delete(s, mvDcSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    Views.refreshView(s, mvDcSrcDir, mvDcViewDir) // retraction: rescan
    val exact = Snapshots.read(s, mvDcSrcDir).groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_exact"))
    Views.readView(s, mvDcViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"), col("distinct_doc_id"))
      .join(exact, Seq("lang"))
      .withColumn("ok",
        when(abs(col("distinct_doc_id") - col("n_exact")) <=
          lit(0.15) * col("n_exact"), lit(1L)).otherwise(lit(0L)))
      .orderBy("lang")
  }

  /** Incremental view with MIN/MAX — the aggregates a delta can't
    * invert (deleting the current max needs the runner-up): the same
    * mutation walk as the delta entry, refreshed by [[Views]]'
    * touched-group RESCAN strategy — feed keys select which groups to
    * re-aggregate from the source tip, untouched groups carry over
    * unread. The oracle recomputes count/sum/min/max from the replayed
    * final state; the deliberate deletion of bumped rows means maxima
    * must SHRINK through the refresh, the exact case pure deltas get
    * wrong.
    */
  private def snapshotMvMinmax(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvMmSrcDir); clearDir(s, mvMmViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvMmSrcDir)
    Views.createView(s, mvMmSrcDir, mvMmViewDir, Seq("lang"),
      sumCols = Seq("n_chars"),
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    Snapshots.merge(s, mvMmSrcDir,
      docs.filter(col("doc_id").between(200, 599))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), recordChanges = true, preImages = true)
    // delete the TOP of every bumped group's range: per-group maxima
    // move down, which only a recompute (not a delta) can serve
    Snapshots.delete(s, mvMmSrcDir, col("n_chars") > 1400,
      recordChanges = true)
    Views.refreshView(s, mvMmSrcDir, mvMmViewDir)
    Views.readView(s, mvMmViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"),
        col("min_n_chars").as("min_chars"),
        col("max_n_chars").as("max_chars"))
      .orderBy("lang")
  }

  /** Continuous view maintenance: the source starts EMPTY and every
    * row arrives through feed-recorded merges/deletes, while
    * [[Views.streamRefreshView]] drains the write-time change feed
    * under `Trigger.AvailableNow` and folds each micro-batch into the
    * standing rollup — the streaming sibling of
    * `q_snapshot_mv_refresh`, certifying batch-split invariance (the
    * oracle is the whole-history recompute) and the replay guard
    * (`_mv_batch_id`). This is the 100 TB shape: the rollup is never
    * recomputed, only adjusted by what each commit wrote.
    */
  private def snapshotMvStream(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvStSrcDir); clearDir(s, mvStViewDir)
    clearDir(s, mvStCkptDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.limit(0), mvStSrcDir)
    // r16: the view carries MIN/MAX — the aggregates a delta cannot
    // invert. The drain's retraction-bearing micro-batch routes
    // through the maintainer's IN-STREAM touched-group rescan (the
    // same algebra as batch refreshView, tip pinned at the batch's
    // window end) instead of the pre-r16 loud refusal; the update
    // wave's +1000 bumps and the delete wave mean per-group extrema
    // must MOVE through the drain, which only a recompute can serve.
    Views.createView(s, mvStSrcDir, mvStViewDir, Seq("lang"),
      sumCols = Seq("n_chars"),
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    Snapshots.merge(s, mvStSrcDir, docs.filter(col("doc_id") < 300),
      Seq("doc_id"), recordChanges = true, preImages = true)
    Snapshots.merge(s, mvStSrcDir,
      docs.filter(col("doc_id").between(200, 499))
        .withColumn("n_chars", col("n_chars") + 1000),
      Seq("doc_id"), recordChanges = true, preImages = true)
    Snapshots.delete(s, mvStSrcDir, col("doc_id") % 10 === 3,
      recordChanges = true)
    // the UPSERT wave (r16): the %10=6 band re-merged with +77 chars,
    // POST-ONLY (no pre-images — the compact CDC feed); digestible
    // in-stream because the declared merge key (doc_id, lang) pins
    // the group column, so the post-image names the hidden
    // pre-image's group and the same rescan the delete wave takes
    // covers it — the single-table streaming sibling of the join
    // maintainer's upsert wave
    Snapshots.merge(s, mvStSrcDir,
      docs.filter(col("doc_id") < 500 && col("doc_id") % 10 === 6)
        .withColumn("n_chars", col("n_chars") +
          when(col("doc_id") >= 200, 1077L).otherwise(77L)),
      Seq("doc_id", "lang"), recordChanges = true)
    Views.streamRefreshView(s, mvStSrcDir, mvStViewDir, mvStCkptDir,
      upsertKey = Seq("doc_id", "lang"))
      .awaitTermination()
    val ok = if (Views.staleness(s, mvStSrcDir, mvStViewDir) == 0L) 1L else 0L
    Views.readView(s, mvStViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"),
        col("min_n_chars").as("min_chars"),
        col("max_n_chars").as("max_chars"))
      .withColumn("stream_ok", lit(ok))
      .orderBy("lang")
  }

  /** Incremental view OVER A JOIN (orders ⋈ lineitem rolled up by
    * priority), maintained by the bilinear delta rule — ΔL ⋈ R_new
    * plus L_old ⋈ ΔR, with snapshot time travel supplying L_old
    * exactly. Both inputs append twice (thirds of the key space), the
    * second wave on BOTH sides before one refresh — the multi-version,
    * both-sides-moved window. The oracle is the whole-table join
    * aggregate, so a hash match certifies the two small delta joins
    * reconstructed exactly what a full 2-table join recompute
    * produces.
    */
  private def snapshotMvJoin(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJoinOrdDir); clearDir(s, mvJoinLiDir)
    clearDir(s, mvJoinViewDir)
    // bounded key range: the entry's value is the delta algebra, not
    // table volume — six copy-on-write commits of the full sf0.1
    // tables cost ~6 s/run for no extra coverage
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJoinOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJoinLiDir)
    Views.createJoinView(s, mvJoinOrdDir, mvJoinLiDir, mvJoinViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"))
    Snapshots.merge(s, mvJoinOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Views.refreshJoinView(s, mvJoinViewDir) // left-only window
    Snapshots.merge(s, mvJoinLiDir,
      li.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJoinOrdDir,
      ord.filter(col("o_orderkey") % 3 === 2), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJoinLiDir,
      li.filter(col("o_orderkey") % 3 === 2), Seq("o_orderkey"),
      recordChanges = true)
    Views.refreshJoinView(s, mvJoinViewDir) // both sides moved
    Views.readJoinView(s, mvJoinViewDir)
      .select(col("o_orderpriority"), col("n_rows").as("n_lines"),
        col("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** CONTINUOUS join-view maintenance: one maintainer drains BOTH
    * sources' write-time change feeds (side-tagged union, one
    * checkpoint) and folds each micro-batch with the bilinear rule,
    * the other-side reads pinned by time travel and manifest-pruned
    * to the batch's key envelope. Two insert waves land on both sides
    * before one AvailableNow drain (multi-version windows per side);
    * `stream_ok` pins that the maintainer left nothing for the batch
    * refresh to do (refresh is a no-op at the same version). A DELETE
    * wave lands on the orders side before the drain (r15): the
    * retraction-bearing window routes through the maintainer's
    * touched-group rescan — the same algebra as the batch refresh,
    * inside foreachBatch, both side reads pruned — instead of the
    * pre-r15 loud refusal. An UPSERT wave (r16) lands on the lineitem
    * side as a post-only merge (no pre-images): digestible through
    * the same rescan because the declared merge key is the join key
    * and no group column is resident on that side, so the post-image
    * provably determines the touched groups — the documented upsert
    * contract, with the refusal preserved for undeclared or
    * underdetermined feeds (ViewsSpec pins both refusals). The oracle
    * is the whole-table join recompute over the final state (deletes
    * and upserts applied), so a hash match certifies general-feed
    * streaming maintenance equals the full join — the streaming
    * sibling of `q_snapshot_mv_join` + `q_snapshot_mv_join_rescan`
    * in one drain. (Checkpoint RESUME —
    * a second drain folding only unseen versions — is ViewsSpec's
    * pin; paying a second streaming-query startup in-entry added
    * ~3 s of pure fixed cost for no extra oracle coverage.)
    */
  private def snapshotMvJoinStream(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJsOrdDir); clearDir(s, mvJsLiDir)
    clearDir(s, mvJsViewDir); clearDir(s, mvJsCkptDir)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJsOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJsLiDir)
    Views.createJoinView(s, mvJsOrdDir, mvJsLiDir, mvJsViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"))
    Snapshots.merge(s, mvJsOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJsLiDir,
      li.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJsOrdDir,
      ord.filter(col("o_orderkey") % 3 === 2), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJsLiDir,
      li.filter(col("o_orderkey") % 3 === 2), Seq("o_orderkey"),
      recordChanges = true)
    // the retraction wave: the SAME drain must digest it through the
    // in-stream touched-group rescan (pre-r15 this refused loudly)
    Snapshots.delete(s, mvJsOrdDir, col("o_orderkey") % 10 === 7,
      recordChanges = true)
    // the UPSERT wave (r16): a post-only merge on the lineitem side —
    // the %10=3 band's quantities bumped by +50, recorded WITHOUT
    // pre-images (the compact feed). Digestible because the declared
    // merge key IS the join key and no group column lives on the
    // right: the post-image provably determines the touched groups
    // ([[graft.sources.Views]] upsert contract); without the declared
    // key the maintainer still refuses loudly
    Snapshots.merge(s, mvJsLiDir,
      li.filter(col("o_orderkey") % 10 === 3)
        .withColumn("qty", col("qty") + 50),
      Seq("o_orderkey"), recordChanges = true)
    Views.streamRefreshJoinView(s, mvJsViewDir, mvJsCkptDir,
      upsertKeyRight = Seq("o_orderkey"))
      .awaitTermination()
    val ver = Snapshots.version(s, s"$mvJsViewDir/rows")
    val ok =
      if (Views.refreshJoinView(s, mvJsViewDir) == ver) 1L else 0L
    Views.readJoinView(s, mvJsViewDir)
      .select(col("o_orderpriority"), col("n_rows").as("n_lines"),
        col("sum_qty"))
      .withColumn("stream_ok", lit(ok))
      .orderBy("o_orderpriority")
  }

  /** The join view with MIN/MAX columns (and AVG derived at read):
    * an all-insert wave refreshes min/max on the bilinear DELTA path
    * (inserts only extend extrema — least/greatest against the delta's
    * own extrema, zero recompute), then a delete wave forces the
    * touched-group RESCAN, the one route that can SHRINK a maximum.
    * The oracle recomputes count/sum/min/max/avg from the replayed
    * final state — avg is sum/count at read time (exact integer
    * operands, deterministic IEEE division), never materialized state.
    */
  private def snapshotMvJoinMinmax(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJmOrdDir); clearDir(s, mvJmLiDir)
    clearDir(s, mvJmViewDir)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJmOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJmLiDir)
    Views.createJoinView(s, mvJmOrdDir, mvJmLiDir, mvJmViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"),
      minCols = Seq("qty"), maxCols = Seq("qty"))
    // insert wave on both sides -> one refresh on the delta path
    Snapshots.merge(s, mvJmOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJmLiDir,
      li.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Views.refreshJoinView(s, mvJmViewDir)
    // delete wave on the left -> rescan; per-group maxima may shrink
    Snapshots.delete(s, mvJmOrdDir, col("o_orderkey") % 10 === 7,
      recordChanges = true)
    Views.refreshJoinView(s, mvJmViewDir)
    Views.readJoinView(s, mvJmViewDir, withAvg = true)
      .select(col("o_orderpriority"), col("n_rows").as("n_lines"),
        col("sum_qty"), col("min_qty"), col("max_qty"), col("avg_qty"))
      .orderBy("o_orderpriority")
  }

  /** The join view under GENERAL changes — inserts, a pre-imaged
    * UPDATE wave on the lineitem side, and a DELETE wave on the orders
    * side, all in one refresh window: the refresh classifies the feeds
    * and takes the touched-group rescan route (the bilinear delta
    * cannot retract pairs), re-joining only the touched groups' rows
    * at the two tips. The oracle replays the final join aggregate, so
    * a hash match certifies retraction-through-rescan equals the full
    * recompute.
    */
  private def snapshotMvJoinRescan(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJrOrdDir); clearDir(s, mvJrLiDir)
    clearDir(s, mvJrViewDir)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJrOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJrLiDir)
    Views.createJoinView(s, mvJrOrdDir, mvJrLiDir, mvJrViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"))
    // inserts on the left…
    Snapshots.merge(s, mvJrOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    // …an update wave on the right (replaces each touched key's line
    // set with bumped quantities; pre-images make it invertible)…
    Snapshots.merge(s, mvJrLiDir,
      li.filter(col("o_orderkey") % 3 === 0 && col("o_orderkey") < 20000)
        .withColumn("qty", col("qty") + 5),
      Seq("o_orderkey"), recordChanges = true, preImages = true)
    // …and a delete wave back on the left
    Snapshots.delete(s, mvJrOrdDir, col("o_orderkey") % 10 === 7,
      recordChanges = true)
    Views.refreshJoinView(s, mvJrViewDir)
    Views.readJoinView(s, mvJrViewDir)
      .select(col("o_orderpriority"), col("n_rows").as("n_lines"),
        col("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Approximate-percentile view columns — the DELTA-INVERTIBLE
    * sketch: the view row carries per-group log-bucket count maps
    * (the QH family's bucket law — ONE arithmetic definition), and
    * signed deltas add AND subtract counts exactly, so unlike min/max
    * (runner-up unknowable) and HLL (registers can't forget) the
    * DELETE wave here refreshes on the ZERO-SOURCE-READ delta path —
    * no rescan route exists for this view at all (ViewsSpec pins it
    * by deleting the source files). Served as p50/p95 via the
    * all-integer rank fold; the oracle replays buckets, cumulative
    * ranks, and representatives over the final state, so the
    * estimates hash-match bit-for-bit. `delta_ok` pins that both
    * refreshes landed and the view is fresh.
    */
  private def snapshotMvQuantile(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvQhSrcDir); clearDir(s, mvQhViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvQhSrcDir,
      statsColumns = Seq("doc_id"))
    Views.createView(s, mvQhSrcDir, mvQhViewDir, Seq("lang"),
      sumCols = Seq("n_chars"), quantileCols = Seq("n_chars"))
    Snapshots.append(s, mvQhSrcDir,
      docs.filter(col("doc_id").between(400, 899)), Seq("doc_id"),
      recordChanges = true)
    Views.refreshView(s, mvQhSrcDir, mvQhViewDir) // inserts: +counts
    Snapshots.delete(s, mvQhSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    val v = Views.refreshView(s, mvQhSrcDir, mvQhViewDir) // deletes: −counts
    val ok =
      if (v == 3L && Views.staleness(s, mvQhSrcDir, mvQhViewDir) == 0L) 1L
      else 0L
    // r16: quantiles are a READ parameter — the maintained histogram
    // serves ANY q in (0,1); p99 rides the same one-sort-one-total
    // fold as the p50/p95 defaults
    Views.readView(s, mvQhViewDir, quantiles = Seq(0.5, 0.95, 0.99))
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"),
        col("p50_n_chars"), col("p95_n_chars"), col("p99_n_chars"))
      .withColumn("delta_ok", lit(ok))
      .orderBy("lang")
  }

  /** Exact VARIANCE/STDDEV view columns — the other delta-invertible
    * family (besides the quantile histogram): the view row carries
    * per-group (Σx as LONG, Σx² as DECIMAL(38,0), and r16's
    * per-measure NON-NULL count `cnt_<c>`) and signed deltas subtract
    * ALL THREE exactly, so like `q_snapshot_mv_quantile` the DELETE
    * wave refreshes on the zero-source-read delta path (pinned in
    * ViewsSpec by deleting the source files; min/max/HLL would
    * rescan). The measure is deliberately NULL-BEARING (every
    * doc_id % 7 == 3 row), and the oracle is DuckDB's NATIVE
    * AVG/VAR_POP/STDDEV_POP — SQL excludes NULL rows from the
    * denominator, which the pre-r16 n_rows division got wrong; the
    * served avg/var/std now divide by cnt and must hash-match the
    * native aggregates bit-for-bit (exact integer sums, one IEEE
    * division each, round 4 on var/std).
    */
  private def snapshotMvVar(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvVrSrcDir); clearDir(s, mvVrViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
      .withColumn("n_chars",
        when(col("doc_id") % 7 === 3, lit(null).cast("long"))
          .otherwise(col("n_chars").cast("long")))
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvVrSrcDir,
      statsColumns = Seq("doc_id"))
    Views.createView(s, mvVrSrcDir, mvVrViewDir, Seq("lang"),
      sumCols = Seq("n_chars"), varCols = Seq("n_chars"))
    Snapshots.append(s, mvVrSrcDir,
      docs.filter(col("doc_id").between(400, 899)), Seq("doc_id"),
      recordChanges = true)
    Views.refreshView(s, mvVrSrcDir, mvVrViewDir) // inserts: +sums
    Snapshots.delete(s, mvVrSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    val v = Views.refreshView(s, mvVrSrcDir, mvVrViewDir) // deletes: −sums
    val ok =
      if (v == 3L && Views.staleness(s, mvVrSrcDir, mvVrViewDir) == 0L) 1L
      else 0L
    Views.readView(s, mvVrViewDir, withAvg = true)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("cnt_n_chars"), col("sum_n_chars").as("sum_chars"),
        col("avg_n_chars"), col("var_n_chars"), col("std_n_chars"))
      .withColumn("delta_ok", lit(ok))
      .orderBy("lang")
  }

  /** HEAVY-HITTER view columns — the THIRD delta-invertible family:
    * the view row carries per-group count-min cell maps (`cm_<c>`,
    * the sketch family's md5-60/4×1024 law — ONE arithmetic
    * definition via Sketches.cmCellKeys) plus the candidate union
    * (`cmc_<c>`, each window's per-group top-16 values by exact
    * count). Signed deltas add AND subtract cell counts exactly, so
    * the DELETE wave stays on the ZERO-SOURCE-READ delta path
    * (ViewsSpec pins it by deleting the source files) — candidates
    * stay put and the retracted value's estimate shrinks until the
    * read-time re-ranking drops it. Served via [[Views.topkValues]]:
    * candidates re-ranked by the count-min estimate (min over the
    * value's 4 cells). The value domain (`n_chars % 16`) keeps every
    * window's distinct set within the candidate cap, so the oracle
    * replays candidates as plain DISTINCT and the estimates
    * all-integer — hash-compared exactly; `ok` pins the count-min law
    * (estimate ≥ true count, always).
    */
  private def snapshotMvTopk(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvTkSrcDir); clearDir(s, mvTkViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
      .withColumn("len_bucket", (col("n_chars") % 16).cast("long"))
    Snapshots.commit(s, docs.filter(col("doc_id") < 400), mvTkSrcDir,
      statsColumns = Seq("doc_id"))
    Views.createView(s, mvTkSrcDir, mvTkViewDir, Seq("lang"),
      topkCols = Seq("len_bucket"))
    Snapshots.append(s, mvTkSrcDir,
      docs.filter(col("doc_id").between(400, 899)), Seq("doc_id"),
      recordChanges = true)
    Views.refreshView(s, mvTkSrcDir, mvTkViewDir) // inserts: +cells
    Snapshots.delete(s, mvTkSrcDir, col("doc_id") % 10 === 7,
      recordChanges = true)
    val v = Views.refreshView(s, mvTkSrcDir, mvTkViewDir) // deletes: −cells
    val fresh =
      if (v == 3L && Views.staleness(s, mvTkSrcDir, mvTkViewDir) == 0L) 1L
      else 0L
    val exact = Snapshots.read(s, mvTkSrcDir)
      .groupBy(col("lang"), col("len_bucket").cast("string").as("v"))
      .agg(count(lit(1)).as("n_exact"))
      .withColumnRenamed("v", "top_len_bucket")
    Views.topkValues(s, mvTkViewDir, "len_bucket", k = 3)
      .join(exact, Seq("lang", "top_len_bucket"), "left")
      .select(col("lang"), col("rk"), col("top_len_bucket"),
        col("n_est"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        ((col("n_est") >= coalesce(col("n_exact"), lit(0L)))
          .cast("long") * lit(fresh)).as("ok"))
      .orderBy("lang", "rk")
  }

  /** HLL COUNT DISTINCT on the JOIN view ("distinct orders per
    * priority" without recounting the join): register maps max-merge
    * through the all-insert bilinear window and recompute through the
    * delete wave's touched-group rescan — the same routing as min/max,
    * now for sketch state. The oracle replays the estimator exactly
    * (register arithmetic over the joined keys' strings) and `ok`
    * gates the m=1024 family envelope (±15%) against the exact
    * distinct count.
    */
  private def snapshotMvJoinDistinct(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJdOrdDir); clearDir(s, mvJdLiDir)
    clearDir(s, mvJdViewDir)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJdOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJdLiDir)
    Views.createJoinView(s, mvJdOrdDir, mvJdLiDir, mvJdViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"),
      distinctCols = Seq("o_orderkey"))
    // insert wave on both sides -> bilinear delta, registers max-merge
    Snapshots.merge(s, mvJdOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJdLiDir,
      li.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Views.refreshJoinView(s, mvJdViewDir)
    // delete wave on the left -> touched-group rescan recomputes the
    // registers (they cannot forget the deleted keys on their own)
    Snapshots.delete(s, mvJdOrdDir, col("o_orderkey") % 10 === 7,
      recordChanges = true)
    Views.refreshJoinView(s, mvJdViewDir)
    val exact = Snapshots.read(s, mvJdOrdDir)
      .join(Snapshots.read(s, mvJdLiDir), Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_orderkey")).as("n_exact"))
    Views.readJoinView(s, mvJdViewDir)
      .select(col("o_orderpriority"), col("n_rows").as("n_lines"),
        col("sum_qty"), col("distinct_o_orderkey"))
      .join(exact, Seq("o_orderpriority"))
      .withColumn("ok",
        when(abs(col("distinct_o_orderkey") - col("n_exact")) <=
          lit(0.15) * col("n_exact"), lit(1L)).otherwise(lit(0L)))
      .orderBy("o_orderpriority")
  }

  /** Time travel on the JOIN view through the SQL surface:
    * `mv_read('<dir>/rows', v)` pins the rollup BEFORE the second
    * wave landed — each refresh is one commit of the rows table, so
    * version 1 names exactly "the join aggregate at creation". The
    * entry refreshes past the pin first, proving later maintenance
    * does not disturb a held version.
    */
  private def mvJoinAsofSql(s: SparkSession, d: String): DataFrame = {
    clearDir(s, mvJaOrdDir); clearDir(s, mvJaLiDir)
    clearDir(s, mvJaViewDir)
    val ord = Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderkey") < 60000)
    val li = Tables(s, d, "lineitem").select(
      col("l_orderkey").as("o_orderkey"),
      col("l_quantity").cast("long").as("qty"))
      .filter(col("o_orderkey") < 60000)
    Snapshots.commit(s, ord.filter(col("o_orderkey") % 3 === 0), mvJaOrdDir)
    Snapshots.commit(s, li.filter(col("o_orderkey") % 3 === 0), mvJaLiDir)
    Views.createJoinView(s, mvJaOrdDir, mvJaLiDir, mvJaViewDir,
      Seq("o_orderkey"), Seq("o_orderpriority"), sumCols = Seq("qty"))
    Snapshots.merge(s, mvJaOrdDir,
      ord.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Snapshots.merge(s, mvJaLiDir,
      li.filter(col("o_orderkey") % 3 === 1), Seq("o_orderkey"),
      recordChanges = true)
    Views.refreshJoinView(s, mvJaViewDir)
    s.sql(s"SELECT o_orderpriority, n_rows AS n_lines, sum_qty " +
      s"FROM mv_read('$mvJaViewDir/rows', 1) ORDER BY o_orderpriority")
  }

  /** The O(batch) INGEST PATH end to end: two [[Snapshots.append]]
    * batches land as their own files with every base file carried by
    * reference (zero rewrites — SnapshotsSpec pins the file sets), the
    * recorded insert feed drives ONE [[Views.refreshView]], and the
    * standing rollup comes out equal to the full recompute. No step
    * anywhere in the walk carries a table-size term: append is
    * O(batch), the view delta is O(changes) — the shape a 100 TB
    * continuous-ingest pipeline actually runs. `append_ok` pins the
    * zero-rewrite property in-entry (v1's data files all survive into
    * v3's scan set).
    */
  private def snapshotAppend(s: SparkSession, d: String): DataFrame = {
    clearDir(s, appendSrcDir); clearDir(s, appendViewDir)
    val docs = Tables(s, d, "documents").select("doc_id", "lang", "n_chars")
    Snapshots.commit(s, docs.filter(col("doc_id") < 300), appendSrcDir,
      statsColumns = Seq("doc_id"))
    Views.createView(s, appendSrcDir, appendViewDir, Seq("lang"),
      sumCols = Seq("n_chars"))
    Snapshots.append(s, appendSrcDir,
      docs.filter(col("doc_id").between(300, 599)), Seq("doc_id"),
      recordChanges = true)
    Snapshots.append(s, appendSrcDir,
      docs.filter(col("doc_id").between(600, 899)), Seq("doc_id"),
      recordChanges = true)
    Views.refreshView(s, appendSrcDir, appendViewDir)
    val f1 = Snapshots.readVersion(s, appendSrcDir, 1L).inputFiles.toSet
    val f3 = Snapshots.readVersion(s, appendSrcDir, 3L).inputFiles.toSet
    val ok = if (f1.subsetOf(f3)) 1L else 0L
    Views.readView(s, appendViewDir)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_n_chars").as("sum_chars"))
      .withColumn("append_ok", lit(ok))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_snapshot_append" -> (snapshotAppend _),
    "q_snapshot_mv_join" -> (snapshotMvJoin _),
    "q_snapshot_mv_join_minmax" -> (snapshotMvJoinMinmax _),
    "q_snapshot_mv_join_stream" -> (snapshotMvJoinStream _),
    "q_snapshot_mv_join_rescan" -> (snapshotMvJoinRescan _),
    "q_snapshot_mv_refresh" -> (snapshotMvRefresh _),
    "q_snapshot_mv_upsert" -> (snapshotMvUpsert _),
    "q_snapshot_mv_distinct" -> (snapshotMvDistinct _),
    "q_snapshot_mv_quantile" -> (snapshotMvQuantile _),
    "q_snapshot_mv_var" -> (snapshotMvVar _),
    "q_snapshot_mv_topk" -> (snapshotMvTopk _),
    "q_snapshot_mv_join_distinct" -> (snapshotMvJoinDistinct _),
    "q_mv_join_asof_sql" -> (mvJoinAsofSql _),
    "q_snapshot_mv_minmax" -> (snapshotMvMinmax _),
    "q_snapshot_mv_stream" -> (snapshotMvStream _),
    "q_join_bucketed" -> (bucketedJoin _),
    "q_snapshot_concurrent" -> (snapshotConcurrent _),
    "q_snapshot_merge" -> (snapshotMerge _),
    "q_snapshot_cdf" -> (snapshotCdf _),
    "q_snapshot_cdf_feed" -> (snapshotCdfFeed _),
    "q_snapshot_compact" -> (snapshotCompact _),
    "q_snapshot_compact_binpack" -> (snapshotCompactBinpack _),
    "q_snapshot_delete_retention" -> (snapshotDeleteRetention _),
    "q_snapshot_history" -> (snapshotHistory _),
    "q_snapshot_merge_scoped" -> (snapshotMergeScoped _),
    "q_snapshot_merge_scoped_composite" -> (snapshotMergeScopedComposite _),
    "q_snapshot_bloom_read" -> (snapshotBloomRead _),
    "q_snapshot_schema_evo" -> (snapshotSchemaEvo _),
    "q_snapshot_expectations" -> (snapshotExpectations _),
    "q_snapshot_cdf_stream" -> (snapshotCdfStream _),
    "q_snapshot_zorder" -> (snapshotZorder _),
    "q_snapshot_zorder3" -> (snapshotZorder3 _),
    "q_snapshot_range_and" -> (snapshotRangeAnd _),
    "q_snapshot_stats_meta" -> (snapshotStatsMeta _),
    "q_snapshot_asof" -> (snapshotAsOf _),
    "q_snapshot_incr_pipeline" -> (snapshotIncrPipeline _),
    "q_snapshot_hidden_partition" -> (snapshotHiddenPartition _),
    "q_snapshot_in_read" -> (snapshotInRead _),
    "q_snapshot_spec_evolution" -> (snapshotSpecEvolution _),
    "q_snapshot_branch" -> (snapshotBranch _),
    "q_snapshot_mor_delete" -> (snapshotMorDelete _),
    "q_snapshot_mor_upsert" -> (snapshotMorUpsert _),
    "q_snapshot_restore" -> (snapshotRestore _),
    "q_snapshot_rename" -> (snapshotRename _),
    "q_snapshot_drop_column" -> (snapshotDropColumn _),
    "q_snapshot_widen" -> (snapshotWiden _),
    "q_snapshot_sql" -> (snapshotSql _),
    "q_snapshot_clone" -> (snapshotClone _),
    "q_incremental_rollup" -> (incrementalRollup _),
    "q_sketch_union_gate" -> (sketchUnionRoundTrip _),
    "q_snapshot_timetravel" -> (snapshotTimeTravel _),
    "q_snapshot_pruned_read" -> (snapshotPrunedRead _),
    "q_write_partitioned" -> (writeRoundTrip _),
    "q_write_sorted" -> (sortedRoundTrip _),
    "q_write_compacted" -> (compactRoundTrip _),
    "q_source_json" -> (jsonRoundTrip _),
    "q_source_orc" -> (orcRoundTrip _),
    "q_source_text" -> (textRoundTrip _),
    "q_schema_evolution" -> (evolutionRoundTrip _)
  )

  val oracles: Map[String, String] = Map(
    // the join view's two delta joins must reconstruct the whole-table
    // join aggregate exactly (every key-third of both inputs lands)
    "q_snapshot_mv_join" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 60000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the O(batch) ingest path: appended rows land beside the base,
    // the rollup refreshes from the insert feed — final state is the
    // plain union, and append_ok pins the zero-rewrite property
    "q_snapshot_append" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(1 AS BIGINT) AS append_ok
        |FROM documents WHERE doc_id < 900
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // streaming maintenance equals the full join recompute over the
    // final state: every key-third of both inputs lands through the
    // maintainer, the %10=7 delete wave retracts through the in-stream
    // touched-group rescan, AND the %10=3 post-only upsert wave
    // (lineitem quantities +50, no pre-images) digests under the
    // declared merge-key contract
    "q_snapshot_mv_join_stream" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT) +
        |    CASE WHEN l_orderkey % 10 = 3 THEN 50 ELSE 0 END)
        |    AS BIGINT) AS sum_qty,
        |  CAST(1 AS BIGINT) AS stream_ok
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 60000 AND o_orderkey % 10 <> 7
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // min/max join maintenance + read-time AVG: orders = thirds 0∪1
    // minus the %10=7 deletes; lineitem = thirds 0∪1; min/max rode the
    // delta path through the insert wave and the rescan through the
    // delete wave — both must equal the full recompute, and avg is
    // exact-integer sum/count divided at read (bit-deterministic)
    "q_snapshot_mv_join_minmax" ->
      """WITH ords AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  WHERE o_orderkey < 60000 AND o_orderkey % 3 IN (0, 1)
        |    AND o_orderkey % 10 <> 7),
        |li AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_orderkey < 60000 AND l_orderkey % 3 IN (0, 1))
        |SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |  CAST(MIN(qty) AS BIGINT) AS min_qty,
        |  CAST(MAX(qty) AS BIGINT) AS max_qty,
        |  CAST(SUM(qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |FROM ords JOIN li USING (o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // general-change join maintenance: orders = thirds 0∪1 minus the
    // %10=7 deletes; lineitem = third 0 with the <20000 band's
    // quantities bumped by the update wave
    "q_snapshot_mv_join_rescan" ->
      """WITH ords AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  WHERE o_orderkey < 60000 AND o_orderkey % 3 IN (0, 1)
        |    AND o_orderkey % 10 <> 7),
        |li AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    CAST(l_quantity AS BIGINT) +
        |      CASE WHEN l_orderkey < 20000 THEN 5 ELSE 0 END AS qty
        |  FROM lineitem
        |  WHERE l_orderkey < 60000 AND l_orderkey % 3 = 0)
        |SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(qty) AS BIGINT) AS sum_qty
        |FROM ords JOIN li USING (o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the incrementally-maintained rollup must equal the full recompute
    // over the replayed final state — exactly (integer sums, no
    // tolerance): base <400, merge bumps [200,599] by +1000 (inserting
    // 400-599), delete drops doc_id%10=7
    "q_snapshot_mv_refresh" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id >= 200 THEN n_chars + 1000
        |    ELSE n_chars END) AS BIGINT) AS sum_chars,
        |  CAST(1 AS BIGINT) AS incremental_ok
        |FROM documents WHERE doc_id < 600 AND doc_id % 10 <> 7
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the upsert contract end-to-end: a POST-ONLY merge (no
    // pre-images) bumps the %10=3 band by +500 and a delete drops
    // %10=7 in the same window; the declared merge key (doc_id, lang)
    // lets the refresh digest both through the touched-group rescan —
    // the oracle recomputes count/sum/MAX from the replayed final
    // state (max pins the recompute route: deltas cannot shrink it)
    "q_snapshot_mv_upsert" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars + CASE WHEN doc_id % 10 = 3 THEN 500
        |    ELSE 0 END) AS BIGINT) AS sum_chars,
        |  CAST(MAX(n_chars + CASE WHEN doc_id % 10 = 3 THEN 500
        |    ELSE 0 END) AS BIGINT) AS max_chars,
        |  CAST(1 AS BIGINT) AS incremental_ok
        |FROM documents WHERE doc_id < 900 AND doc_id % 10 <> 7
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // HLL distinct columns on the view: the estimator is replayed
    // EXACTLY (same integer register arithmetic as the sketch family,
    // value hashed as VARCHAR), the exact distincts gate the ±5% law
    "q_snapshot_mv_distinct" ->
      """WITH src AS (
        |  SELECT lang, doc_id, n_chars FROM documents
        |  WHERE doc_id < 900 AND doc_id % 10 <> 7),
        |base AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_exact
        |  FROM src GROUP BY lang),
        |h AS (
        |  SELECT lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM src),
        |regs AS (
        |  SELECT lang, h & 1023 AS j,
        |    MAX(CASE WHEN (h >> 10) = 0 THEN 51
        |             ELSE 51 - length(bin(h >> 10)) END) AS r
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, COUNT(*) AS n_filled,
        |    SUM(1::BIGINT << (51 - r)) AS s_filled
        |  FROM regs GROUP BY 1),
        |fin AS (
        |  SELECT lang, (1024 - n_filled) AS zeros,
        |    (1024 - n_filled) * (1::BIGINT << 51) + s_filled AS total
        |  FROM agg),
        |est AS (
        |  SELECT lang,
        |    CASE WHEN zeros > 0 AND
        |      (0.7213::DOUBLE/(1 + 1.079::DOUBLE/1024.0) * 1024 * 1024
        |        * (1::BIGINT << 51)) / total <= 2560.0
        |    THEN round(1024.0 * ln(1024.0 / zeros), 4)
        |    ELSE round((0.7213::DOUBLE/(1 + 1.079::DOUBLE/1024.0) * 1024
        |      * 1024 * (1::BIGINT << 51)) / total, 4)
        |    END AS distinct_doc_id
        |  FROM fin)
        |SELECT lang, n_docs, sum_chars, distinct_doc_id, n_exact,
        |  CAST(1 AS BIGINT) AS ok
        |FROM base JOIN est USING (lang) ORDER BY lang""".stripMargin,
    // quantile view columns: the final state's count/sum plus the QH
    // bucket law replayed end to end (bucket ids via bin() length,
    // cumulative ranks, ceil(q·n) targets, bucket representatives) —
    // p50/p95 hash-compare bit-for-bit because every step is integer
    "q_snapshot_mv_quantile" ->
      """WITH src AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE doc_id < 900 AND doc_id % 10 <> 7),
        |base AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(v) AS BIGINT) AS sum_chars
        |  FROM src GROUP BY lang),
        |bk AS (
        |  SELECT lang, CASE WHEN v < 16 THEN v
        |    ELSE (length(bin(v)) - 5) * 16 + 16
        |      + (v >> (length(bin(v)) - 5)) - 16 END AS b
        |  FROM src),
        |bc AS (SELECT lang, b, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(cnt) AS n FROM bc GROUP BY 1),
        |cum AS (
        |  SELECT lang, b,
        |    SUM(cnt) OVER (PARTITION BY lang ORDER BY b) AS c
        |  FROM bc),
        |qq AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE,
        |  0.99::DOUBLE]) AS q),
        |tgt AS (
        |  SELECT lang, q, CAST(ceil(q * n) AS BIGINT) AS t
        |  FROM tot, qq),
        |pick AS (
        |  SELECT tgt.lang, q, MIN(b) AS b
        |  FROM tgt JOIN cum ON tgt.lang = cum.lang AND cum.c >= tgt.t
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT lang, q, CASE WHEN b < 16 THEN b
        |    ELSE (1::BIGINT << (CAST((b - 16) // 16 AS INT) + 4))
        |      + ((b - 16) % 16)
        |        * (1::BIGINT << CAST((b - 16) // 16 AS INT))
        |    END AS n_est
        |  FROM pick),
        |pv AS (
        |  SELECT lang,
        |    MAX(CASE WHEN q = 0.5 THEN n_est END) AS p50_n_chars,
        |    MAX(CASE WHEN q = 0.95 THEN n_est END) AS p95_n_chars,
        |    MAX(CASE WHEN q = 0.99 THEN n_est END) AS p99_n_chars
        |  FROM est GROUP BY lang)
        |SELECT base.lang, n_docs, sum_chars, p50_n_chars, p95_n_chars,
        |  p99_n_chars,
        |  CAST(1 AS BIGINT) AS delta_ok
        |FROM base JOIN pv USING (lang) ORDER BY lang""".stripMargin,
    // variance view columns over a NULL-BEARING measure: the oracle
    // is DuckDB's NATIVE AVG/VAR_POP/STDDEV_POP — SQL excludes NULL
    // rows from the denominator, and the served avg/var/std divide by
    // the maintained non-null count cnt_<c>, so the numbers must
    // hash-match the native aggregates (round 4 on var/std)
    "q_snapshot_mv_var" ->
      """WITH src AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 7 = 3 THEN NULL
        |      ELSE CAST(n_chars AS BIGINT) END AS v
        |  FROM documents WHERE doc_id < 900 AND doc_id % 10 <> 7)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(v) AS BIGINT) AS cnt_n_chars,
        |  CAST(SUM(v) AS BIGINT) AS sum_chars,
        |  AVG(v) AS avg_n_chars,
        |  round(VAR_POP(v), 4) AS var_n_chars,
        |  round(STDDEV_POP(v), 4) AS std_n_chars,
        |  CAST(1 AS BIGINT) AS delta_ok
        |FROM src GROUP BY lang ORDER BY lang""".stripMargin,
    // heavy-hitter view columns: candidates replay as plain DISTINCT
    // (the %16 domain keeps every window inside the candidate cap),
    // estimates replay the all-integer count-min arithmetic over the
    // FINAL state's cells, ranked (estimate desc, value asc); ok pins
    // the count-min law (never under the true count)
    "q_snapshot_mv_topk" ->
      """WITH src AS (
        |  SELECT lang, CAST(n_chars % 16 AS VARCHAR) AS v, doc_id
        |  FROM documents WHERE doc_id < 900),
        |fin AS (SELECT lang, v FROM src WHERE doc_id % 10 <> 7),
        |h AS (
        |  SELECT lang, v,
        |    ('0x' || substring(md5(v), 1, 15))::BIGINT AS h
        |  FROM fin),
        |cells AS (
        |  SELECT lang, i, (h >> (10*i)) & 1023 AS j, COUNT(*) AS cnt
        |  FROM h, (SELECT unnest([0,1,2,3]) AS i) GROUP BY 1, 2, 3),
        |cand AS (SELECT DISTINCT lang, v FROM src),
        |pc AS (
        |  SELECT lang, v,
        |    ('0x' || substring(md5(v), 1, 15))::BIGINT AS h
        |  FROM cand),
        |pcells AS (
        |  SELECT lang, v, i, (h >> (10*i)) & 1023 AS j
        |  FROM pc, (SELECT unnest([0,1,2,3]) AS i)),
        |est AS (
        |  SELECT pcells.lang, pcells.v,
        |    MIN(COALESCE(cells.cnt, 0)) AS n_est
        |  FROM pcells LEFT JOIN cells USING (lang, i, j)
        |  GROUP BY 1, 2),
        |ex AS (SELECT lang, v, COUNT(*) AS n_exact FROM fin GROUP BY 1, 2),
        |rk AS (
        |  SELECT est.lang, est.v, est.n_est,
        |    COALESCE(ex.n_exact, 0) AS n_exact,
        |    row_number() OVER (
        |      PARTITION BY est.lang ORDER BY est.n_est DESC, est.v) AS rk
        |  FROM est LEFT JOIN ex USING (lang, v))
        |SELECT lang, CAST(rk AS BIGINT) AS rk, v AS top_len_bucket,
        |  CAST(n_est AS BIGINT) AS n_est,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  CASE WHEN n_est >= n_exact THEN 1 ELSE 0 END::BIGINT AS ok
        |FROM rk WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,
    // HLL distinct on the JOIN view: orders = thirds 0∪1 minus the
    // %10=7 deletes, lineitem = thirds 0∪1; the estimator is replayed
    // exactly over the joined keys (hashed as VARCHAR), the exact
    // distincts gate the ±15% family envelope
    "q_snapshot_mv_join_distinct" ->
      """WITH ords AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  WHERE o_orderkey < 60000 AND o_orderkey % 3 IN (0, 1)
        |    AND o_orderkey % 10 <> 7),
        |li AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_orderkey < 60000 AND l_orderkey % 3 IN (0, 1)),
        |j AS (
        |  SELECT o_orderpriority, o_orderkey, qty
        |  FROM ords JOIN li USING (o_orderkey)),
        |base AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_exact
        |  FROM j GROUP BY 1),
        |h AS (
        |  SELECT o_orderpriority,
        |    ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM (SELECT DISTINCT o_orderpriority, o_orderkey FROM j)),
        |regs AS (
        |  SELECT o_orderpriority, h & 1023 AS j,
        |    MAX(CASE WHEN (h >> 10) = 0 THEN 51
        |             ELSE 51 - length(bin(h >> 10)) END) AS r
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT o_orderpriority, COUNT(*) AS n_filled,
        |    SUM(1::BIGINT << (51 - r)) AS s_filled
        |  FROM regs GROUP BY 1),
        |fin AS (
        |  SELECT o_orderpriority, (1024 - n_filled) AS zeros,
        |    (1024 - n_filled) * (1::BIGINT << 51) + s_filled AS total
        |  FROM agg),
        |est AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN zeros > 0 AND
        |      (0.7213::DOUBLE/(1 + 1.079::DOUBLE/1024.0) * 1024 * 1024
        |        * (1::BIGINT << 51)) / total <= 2560.0
        |    THEN round(1024.0 * ln(1024.0 / zeros), 4)
        |    ELSE round((0.7213::DOUBLE/(1 + 1.079::DOUBLE/1024.0) * 1024
        |      * 1024 * (1::BIGINT << 51)) / total, 4)
        |    END AS distinct_o_orderkey
        |  FROM fin)
        |SELECT o_orderpriority, n_lines, sum_qty, distinct_o_orderkey,
        |  n_exact, CAST(1 AS BIGINT) AS ok
        |FROM base JOIN est USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    // the pinned join-view read: version 1 = the rollup at creation
    // (thirds 0 of both sides), held intact through the later refresh
    "q_mv_join_asof_sql" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 60000 AND o_orderkey % 3 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // min/max via touched-group rescan: the delete removes every row
    // above 1400 from the post-merge state, so bumped groups' maxima
    // SHRINK — replayed exactly by the oracle
    "q_snapshot_mv_minmax" ->
      """WITH final AS (
        |  SELECT lang,
        |    CASE WHEN doc_id BETWEEN 200 AND 599 THEN n_chars + 1000
        |      ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM final WHERE n_chars <= 1400
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // streamed maintenance equals the whole-history recompute: inserts
    // <300, bump [200,499] (inserting 300-499), delete doc_id%10=3,
    // then a POST-ONLY upsert of the %10=6 band (+77, declared-key
    // contract) — MIN/MAX ride the drain (r16): retraction AND upsert
    // waves digest through the maintainer's in-stream touched-group
    // rescan, so per-group extrema must equal the final-state recompute
    "q_snapshot_mv_stream" ->
      """WITH fin AS (
        |  SELECT lang, CASE WHEN doc_id >= 200 THEN n_chars + 1000
        |    ELSE n_chars END +
        |    CASE WHEN doc_id % 10 = 6 THEN 77 ELSE 0 END AS n_chars
        |  FROM documents WHERE doc_id < 500 AND doc_id % 10 <> 3)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(1 AS BIGINT) AS stream_ok
        |FROM fin GROUP BY lang ORDER BY lang""".stripMargin,
    "q_incremental_rollup" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the oracle recomputes the exact distincts and pins ok=1: a hash
    // match certifies every parquet-round-tripped, union-merged sketch
    // estimate stayed within ±5% of truth
    "q_sketch_union_gate" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // both committed versions replayed from the source table
    "q_snapshot_timetravel" ->
      """WITH v1 AS (
        |  SELECT CAST(1 AS BIGINT) AS version, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
        |v2 AS (
        |  SELECT CAST(2 AS BIGINT) AS version, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang)
        |SELECT version, lang, n_docs FROM v1
        |UNION ALL
        |SELECT version, lang, n_docs FROM v2
        |ORDER BY version, lang""".stripMargin,
    // the union of all four racing writers' snapshots must equal the
    // source table exactly — per-writer counts replayed from source
    "q_snapshot_concurrent" ->
      """SELECT doc_id % 4 AS writer,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // the upsert replayed from source: docs <400 kept, 200-599 carry the
    // updated n_chars (matched rows replaced, unmatched inserted)
    "q_snapshot_merge" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 600 ORDER BY doc_id""".stripMargin,
    // both endpoint states rebuilt from source, then the same keyed diff:
    // pre = v1 (docs < 400), post = v3 (merged minus doc_id % 10 = 7)
    "q_snapshot_cdf" ->
      """WITH pre AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 400),
        |post AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600 AND doc_id % 10 <> 7)
        |SELECT COALESCE(post.doc_id, pre.doc_id) AS doc_id,
        |  CASE WHEN pre.doc_id IS NULL THEN 'insert'
        |       WHEN post.doc_id IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  COALESCE(post.lang, pre.lang) AS lang,
        |  COALESCE(post.n_chars, pre.n_chars) AS n_chars
        |FROM pre FULL OUTER JOIN post ON pre.doc_id = post.doc_id
        |WHERE pre.doc_id IS NULL OR post.doc_id IS NULL
        |   OR pre.n_chars <> post.n_chars OR pre.lang <> post.lang
        |ORDER BY doc_id""".stripMargin,
    // both per-version feeds rebuilt from source: v2 = the MERGE's
    // writes (update if the key predated, else insert), v3 = the
    // DELETE's pre-images from the post-merge state
    "q_snapshot_cdf_feed" ->
      """WITH v2feed AS (
        |  SELECT CAST(2 AS BIGINT) AS version, doc_id,
        |    CASE WHEN doc_id < 400 THEN 'update' ELSE 'insert' END AS change_type,
        |    lang, n_chars + 1000 AS n_chars
        |  FROM documents WHERE doc_id BETWEEN 200 AND 599),
        |v3feed AS (
        |  SELECT CAST(3 AS BIGINT) AS version, doc_id, 'delete' AS change_type,
        |    lang,
        |    CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600 AND doc_id % 10 = 7)
        |SELECT version, doc_id, change_type, lang, n_chars FROM v2feed
        |UNION ALL
        |SELECT version, doc_id, change_type, lang, n_chars FROM v3feed
        |ORDER BY version, doc_id""".stripMargin,
    // physically scoped, logically identical: same oracle as the full
    // copy-on-write merge
    "q_snapshot_merge_scoped" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 600 ORDER BY doc_id""".stripMargin,
    // composite key, same logical semantics as an unscoped two-column
    // MERGE: only (lang='en', doc_id in [100,299]) rows change
    "q_snapshot_merge_scoped_composite" ->
      """SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' AND doc_id BETWEEN 100 AND 299
        |    THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the evolved state replayed from source: docs < 300 kept (NULL
    // n_chars unless the merge updated them), 300-499 inserted with the
    // new column populated
    "q_snapshot_schema_evo" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id >= 200 THEN n_chars ELSE NULL END AS n_chars
        |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin,
    // the surviving state is exactly docs < 500 (the rejected write
    // left no trace); rejected_held pins that the violating merge threw
    // with the exact violation count and the version did not advance
    "q_snapshot_expectations" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(1 AS BIGINT) AS rejected_held
        |FROM documents WHERE doc_id < 500 GROUP BY lang ORDER BY lang""".stripMargin,
    // the streamed drain must equal the recorded write-time feed — the
    // same oracle as q_snapshot_cdf_feed
    "q_snapshot_cdf_stream" ->
      """WITH v2feed AS (
        |  SELECT CAST(2 AS BIGINT) AS version, doc_id,
        |    CASE WHEN doc_id < 400 THEN 'update' ELSE 'insert' END AS change_type,
        |    lang, n_chars + 1000 AS n_chars
        |  FROM documents WHERE doc_id BETWEEN 200 AND 599),
        |v3feed AS (
        |  SELECT CAST(3 AS BIGINT) AS version, doc_id, 'delete' AS change_type,
        |    lang,
        |    CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600 AND doc_id % 10 = 7)
        |SELECT version, doc_id, change_type, lang, n_chars FROM v2feed
        |UNION ALL
        |SELECT version, doc_id, change_type, lang, n_chars FROM v3feed
        |ORDER BY version, doc_id""".stripMargin,
    // the incrementally maintained derived table must equal the full
    // recompute: docs < 600, updated n_chars for 350+, re-bucketed
    "q_snapshot_incr_pipeline" ->
      """WITH cur AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id >= 350 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id < 600)
        |SELECT doc_id, lang, n_chars,
        |  CASE WHEN n_chars >= 1000 THEN 'long' ELSE 'short' END AS quality_bucket
        |FROM cur ORDER BY doc_id""".stripMargin,
    // both hidden-partition probes replayed as plain filters on the
    // raw columns — the probes' transform pruning must be invisible
    // in the result
    "q_snapshot_restore" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,
    // the renamed columns replayed as aliases over the source: rename
    // must be invisible to values, visible only in names
    "q_snapshot_rename" ->
      """SELECT doc_id AS doc, lang,
        |  CASE WHEN doc_id BETWEEN 200 AND 449 THEN n_chars + 1000
        |       ELSE n_chars END AS char_count
        |FROM documents WHERE doc_id BETWEEN 100 AND 400
        |ORDER BY doc""".stripMargin,
    // three SQL reads replayed: current (merged), v1 (original),
    // change feed (updates on 150-299, inserts 300-449, at version 2)
    "q_snapshot_sql" ->
      """WITH cur AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id BETWEEN 150 AND 449 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars, 'current' AS at
        |  FROM documents WHERE doc_id < 450),
        |v1 AS (
        |  SELECT doc_id, lang, n_chars, 'v1' AS at
        |  FROM documents WHERE doc_id < 300),
        |chg AS (
        |  SELECT doc_id, lang, n_chars + 1000 AS n_chars,
        |    CASE WHEN doc_id < 300 THEN 'chg_update'
        |         ELSE 'chg_insert' END AS at
        |  FROM documents WHERE doc_id BETWEEN 150 AND 449)
        |SELECT doc_id, lang, n_chars, at FROM cur
        |UNION ALL SELECT doc_id, lang, n_chars, at FROM v1
        |UNION ALL SELECT doc_id, lang, n_chars, at FROM chg
        |ORDER BY at, doc_id""".stripMargin,
    // BIGINT arithmetic throughout: the +3e9 updates overflow INT,
    // which is exactly why the column was widened
    "q_snapshot_widen" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id BETWEEN 200 AND 449 THEN n_chars + 3000000000
        |       ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 400
        |ORDER BY doc_id""".stripMargin,
    // the dropped column simply vanishes from the projection; surviving
    // values must be untouched across carried and rewritten files
    "q_snapshot_drop_column" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id BETWEEN 150 AND 399 THEN n_chars + 1000
        |       ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 350
        |ORDER BY doc_id""".stripMargin,
    // clone side = source rows with the clone's divergent upsert
    // applied; source side = the original commit untouched
    "q_snapshot_clone" ->
      """WITH clone AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id BETWEEN 250 AND 499 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars,
        |    'clone' AS side
        |  FROM documents WHERE doc_id BETWEEN 200 AND 460),
        |src AS (
        |  SELECT doc_id, lang, n_chars, 'source' AS side
        |  FROM documents WHERE doc_id < 400)
        |SELECT doc_id, lang, n_chars, side FROM clone
        |UNION ALL
        |SELECT doc_id, lang, n_chars, side FROM src
        |ORDER BY side, doc_id""".stripMargin,
    // same oracle as q_snapshot_merge: copy-on-write and merge-on-read
    // MERGE must be logically indistinguishable
    "q_snapshot_mor_upsert" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 600 ORDER BY doc_id""".stripMargin,
    "q_snapshot_mor_delete" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang <> 'de' AND doc_id >= 50
        |ORDER BY doc_id""".stripMargin,
    "q_snapshot_in_read" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events WHERE user_id IN (3, 17, 42, 99)
        |ORDER BY event_id""".stripMargin,
    "q_snapshot_hidden_partition" ->
      """SELECT event_id, ts, user_id, event_type, value, 'point' AS probe
        |FROM events
        |WHERE user_id = 7 AND CAST(ts AS DATE) = DATE '2024-01-05'
        |UNION ALL
        |SELECT event_id, ts, user_id, event_type, value, 'day' AS probe
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-12'
        |ORDER BY probe, event_id""".stripMargin,
    // merged = docs < 600 with +1000 on 200-599; pre_merge = v1's plain
    // docs < 400 — replayed straight from the source table
    "q_snapshot_branch" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id >= 200 THEN n_chars + 1000 ELSE n_chars END
        |    AS n_chars,
        |  'merged' AS state
        |FROM documents WHERE doc_id < 600
        |UNION ALL
        |SELECT doc_id, lang, n_chars, 'pre_merge' AS state
        |FROM documents WHERE doc_id < 400
        |ORDER BY state, doc_id""".stripMargin,
    // per-spec pruning keeps both reads row-exact via the residuals, so
    // the oracle is the pair of plain filters over the source table
    "q_snapshot_spec_evolution" ->
      """SELECT event_id, ts, user_id, event_type, value, 'day' AS probe
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        |UNION ALL
        |SELECT event_id, ts, user_id, event_type, value, 'user' AS probe
        |FROM events WHERE user_id = 7
        |ORDER BY probe, event_id""".stripMargin,
    // both as-of states replayed from source: t=1500 resolves v1
    // (docs < 100), t=2000 resolves v2 inclusively (docs < 200)
    "q_snapshot_asof" ->
      """SELECT doc_id, lang, n_chars, CAST(1500 AS BIGINT) AS as_of
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT doc_id, lang, n_chars, CAST(2000 AS BIGINT) AS as_of
        |FROM documents WHERE doc_id < 200
        |ORDER BY as_of, doc_id""".stripMargin,
    // one range per z-ordered dimension, both row-exact via the
    // residual filter — the plain pair of range predicates
    "q_snapshot_zorder" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |  'orderkey' AS dim
        |FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 7000
        |UNION ALL
        |SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |  'partkey' AS dim
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 300
        |ORDER BY dim, l_orderkey, l_linenumber""".stripMargin,
    // one range per 3-D z-ordered dimension, all row-exact via the
    // residual filter — the plain range predicates, layout-independent
    "q_snapshot_zorder3" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity, 'orderkey' AS dim
        |FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 7000
        |UNION ALL
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity, 'partkey' AS dim
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 300
        |UNION ALL
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity, 'suppkey' AS dim
        |FROM lineitem WHERE l_suppkey BETWEEN 10 AND 40
        |ORDER BY dim, l_orderkey, l_linenumber""".stripMargin,
    // conjunction of plain range predicates, layout-independent
    "q_snapshot_range_and" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 5000 AND 7000
        |  AND l_partkey BETWEEN 100 AND 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // the manifest-served aggregates must equal the scan-side truth
    "q_snapshot_stats_meta" ->
      """SELECT COUNT(*) AS n_rows,
        |  MIN(l_orderkey) AS min_l_orderkey,
        |  MAX(l_orderkey) AS max_l_orderkey,
        |  MIN(l_extendedprice) AS min_l_extendedprice,
        |  MAX(l_extendedprice) AS max_l_extendedprice
        |FROM lineitem""".stripMargin,
    // three point lookups through the bloom manifest = the plain
    // equality predicate over the source
    "q_snapshot_bloom_read" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (37, 137, 420) ORDER BY doc_id""".stripMargin,
    // the compacted layout must answer the range exactly like the source
    "q_snapshot_compact" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 7000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // each history row rebuilt from the source predicate it committed
    "q_snapshot_history" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS version,
        |    CAST(1700000000000 AS BIGINT) AS commit_ms,
        |    CAST(2 AS BIGINT) AS n_files,
        |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 45) AS n_rows
        |  UNION ALL SELECT 2, 1700000001000, 2,
        |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 30)
        |  UNION ALL SELECT 3, 1700000002000, 2,
        |    (SELECT COUNT(*) FROM lineitem))
        |ORDER BY version""".stripMargin,
    // survivors of the retention delete = the plain surviving-range
    // select (NULL ts would survive too; the corpus has none)
    "q_snapshot_delete_retention" ->
      """SELECT event_id,
        |  CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s,
        |  user_id, event_type, value
        |FROM events
        |WHERE ts > TIMESTAMP '2024-01-10 23:59:59.999999'
        |ORDER BY event_id""".stripMargin,
    // bin-pack is logically a no-op: carried + repacked must equal the
    // plain source predicate row for row
    "q_snapshot_compact_binpack" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey BETWEEN 400 AND 1200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // residual filter keeps the pruned read row-exact, so the oracle is
    // the plain range predicate over the source table
    "q_snapshot_pruned_read" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey BETWEEN 5000 AND 7000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_write_partitioned" ->
      """SELECT doc_id, lang,
        |  LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_words,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_write_sorted" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey BETWEEN 10000 AND 12000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_write_compacted" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_source_json" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_source_orc" ->
      """SELECT r_regionkey, r_name FROM region
        |ORDER BY r_regionkey""".stripMargin,
    "q_source_text" ->
      """SELECT COUNT(*) AS n_lines,
        |  COUNT(DISTINCT text) AS n_distinct,
        |  CAST(SUM(('0x' || substring(md5(text), 1, 15))::BIGINT % 1000000007)
        |    AS BIGINT) AS content_sum
        |FROM documents""".stripMargin,
    // replay the two-batch history: even ids predate the n_chars column
    "q_schema_evolution" ->
      """WITH merged AS (
        |  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM merged GROUP BY lang ORDER BY lang""".stripMargin
  )
}
