package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.Snapshots

/** Maintenance for persisted index directories (text/minhash/span/IVF).
  *
  * Incremental ingestion is deliberately O(new): every
  * `addTo*Index` call commits the arrival batch as NEW files and
  * carries the base by reference. The price is fragmentation — after a
  * day of small adds a posting bucket is hundreds of sliver files, and
  * at 100 TB the serve path's pruned read pays per-file costs (footer
  * fetch, task schedule, object-store round trip) that dwarf the bytes.
  * Compaction is the standing repair, and it must run as a snapshot
  * TRANSACTION (readers race it) and must NOT destroy the properties
  * the serve path depends on: the bucket transform spec (pruned
  * IN-reads), the stats manifest (envelope pruning), and time travel.
  *
  * [[compactIndex]] bin-packs every snapshot table under the index dir
  * via [[Snapshots.compactBinPack]] — O(small files) selected from the
  * committed manifest, healthy files carried by reference, rewrite
  * re-clustered by the table's own inherited partition spec so bucket
  * pruning survives verbatim. Stats/bloom column sets are derived from
  * the tip manifest itself (`min_<c>`/`bloom_<c>` rows), so the
  * rewritten files' manifest rows line up with the carried ones without
  * the caller restating each index family's build parameters.
  */
object IndexMaintenance {

  /** Bin-pack the fragmented tables of a persisted index directory.
    *
    * Walks the immediate children of `indexDir` and, for every
    * committed snapshot table, repacks files smaller than
    * `minFileBytes` into ~`targetFileBytes` outputs. Tables that
    * cannot be bin-packed are left untouched by design:
    *
    *  - tables with no stats manifest (the one-row `params` / `stats` /
    *    `centroids` sidecars — nothing to repack, and bin-pack selects
    *    from the manifest).
    *
    * Tables with a pending merge-on-read delete set (a retraction not
    * yet folded) are FOLDED first — [[Snapshots.foldDeletes]] rewrites
    * the base applying the sidecars under the inherited bucket spec,
    * with stats/bloom columns restated from the tip manifest — and
    * then bin-packed like any other table, so a retract-then-compact
    * index ends sliver-free AND sidecar-free (bin-pack alone must
    * refuse pending sets: carrying a base file raw would resurrect
    * deleted rows).
    *
    * Returns `table name -> committed version` for every table visited
    * (unchanged tip when skipped or when fewer than two files
    * qualified). Serving results are invariant under compaction — the
    * rewrite is logically a no-op — which is exactly what the entry
    * oracles certify by reusing the uncompacted entries' SQL verbatim.
    */
  def compactIndex(
      spark: SparkSession,
      indexDir: String,
      minFileBytes: Long = 4L * 1024 * 1024,
      targetFileBytes: Long = 128L * 1024 * 1024): Map[String, Long] = {
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(new Path(indexDir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => Snapshots.version(spark, p.toString) >= 1L)
      .sortBy(_.getName)
    val tips = tables
      .map(t => t.getName -> Snapshots.version(spark, t.toString)).toMap
    val results = tables.map { table =>
      val dir = table.toString
      val tip = tips(table.getName)
      val snapDir = s"$dir/snap-$tip"
      val manifest = new Path(s"$snapDir/_manifest")
      val v =
        if (!fs.exists(manifest)) tip
        else {
          val mCols = spark.read.parquet(manifest.toString).columns
          // transform envelopes (`min_pt_*`) regenerate from the
          // inherited partition spec at commit; only data-column stats
          // are restated so rewritten rows line up with carried ones
          val statsCols = mCols.toSeq
            .filter(c => c.startsWith("min_") && !c.startsWith("min_pt_"))
            .map(_.stripPrefix("min_"))
          val dataCols = Snapshots.read(spark, dir).columns.toSet
          val bloomCols = mCols.toSeq
            .filter(_.startsWith("bloom_"))
            .map(_.stripPrefix("bloom_"))
            .filter(dataCols.contains)
          // a pending retraction folds first (no-op when none pending)
          // so the bin-pack below never sees a delete sidecar
          Snapshots.foldDeletes(spark, dir,
            statsColumns = statsCols.filter(dataCols),
            bloomColumns = bloomCols)
          Snapshots.compactBinPack(spark, dir, minFileBytes,
            targetFileBytes, statsColumns = statsCols.filter(dataCols),
            bloomColumns = bloomCols)
        }
      table.getName -> v
    }.toMap
    // an index-level `versions` MANIFEST (the HNSW graph/pending and
    // CM counters/candidates pattern) names coherent table-version
    // PAIRS. Compaction just moved those tables' tips (logically a
    // no-op per table), so append ONE fresh stamp pairing the
    // compacted tips: pins taken before compaction keep resolving
    // (history rows stay; the old table versions remain readable until
    // expire), and the tip pin serves the repacked layout. Column
    // convention: `index_version` + `<table>_v` per paired table.
    val out0 = results
    val vDir = s"$indexDir/versions"
    // restamp only when compaction actually MOVED a table (every tip
    // unchanged = nothing to re-pair; a redundant stamp would grow the
    // manifest on every no-op maintenance pass)
    val moved = out0.exists { case (t, v) => tips.get(t).exists(_ != v) }
    val out =
      if (!moved || Snapshots.version(spark, vDir) < 1) out0
      else {
        var attempt = 0
        var stamped = out0
        var done = false
        while (!done && attempt < 10) {
          val base = Snapshots.version(spark, vDir)
          val cur = Snapshots.readVersion(spark, vDir, base)
          val rows = cur.collect().toSeq
          val next = rows.map(_.getAs[Long]("index_version")).max + 1
          val fresh = org.apache.spark.sql.Row.fromSeq(
            cur.schema.fieldNames.toSeq.map {
              case "index_version" => next
              case c => math.max(0L, Snapshots.version(spark,
                s"$indexDir/${c.stripSuffix("_v")}"))
            })
          val df = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              scala.jdk.CollectionConverters.SeqHasAsJava(
                rows :+ fresh).asJava),
            cur.schema)
          Snapshots.commitIfVersion(spark, df, vDir, base) match {
            case Some(v) =>
              stamped = out0.updated("versions", v); done = true
            case None => attempt += 1
          }
        }
        if (!done) throw new IllegalStateException(
          s"post-compaction version stamp on $indexDir lost 10 races")
        stamped
      }
    if (out.get("postings").exists(v => v > tips("postings")) &&
        out.contains("stats")) {
      val statsDir = s"$indexDir/stats"
      val st = Snapshots.read(spark, statsDir)
      if (st.columns.contains("postings_version")) {
        Snapshots.commit(spark,
          st.withColumn("postings_version",
            org.apache.spark.sql.functions.lit(out("postings"))),
          statsDir)
        return out.updated("stats", Snapshots.version(spark, statsDir))
      }
    }
    out
  }

  /** Storage reclaim for a persisted index: [[compactIndex]] rewrites
    * the layout but — like every snapshot commit — keeps the old
    * versions readable, so the sliver files it replaced still occupy
    * storage until their versions age out. This pass expires every
    * table under `indexDir` down to its last `keepLast` versions
    * (tagged versions and dirs still REFERENCED by retained versions
    * survive — a bin-pack that carried healthy files by reference does
    * not orphan them) and sweeps staging leftovers. Run it after
    * compaction once no reader needs time travel past the window:
    * that pair — compact, then expire — is the complete small-file
    * repair, the rewrite AND the reclaim. Returns
    * `table name -> expired versions`.
    */
  def expireIndex(
      spark: SparkSession,
      indexDir: String,
      keepLast: Int = 1): Map[String, Seq[Long]] = {
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(indexDir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => Snapshots.version(spark, p.toString) >= 1L)
      .sortBy(_.getName)
      .map { table =>
        val expired = Snapshots.expire(spark, table.toString, keepLast)
        Snapshots.vacuum(spark, table.toString)
        table.getName -> expired
      }.toMap
  }
}
