package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.functions._

/** The two-level manifest layout and the [[ManifestFileIndex]] scan
  * path: a snapshot's manifest splits into range-clustered leaf files
  * with a `_root` manifest list, range reads prune whole LEAVES against
  * the root before any leaf row is read, and the planned scan holds
  * exactly the surviving data files — O(selected) driver state, with
  * file sizes served from the manifest instead of per-file filesystem
  * calls. Exercised on a synthetic many-file layout (64 data files, 8
  * manifest rows per leaf) standing in for the 10⁶-file case.
  */
class ManifestFileIndexSpec extends SparkSpec {

  test("root manifest list prunes whole leaves; scan plans only survivors") {
    val dir = Files.createTempDirectory("graft-mfi").toString
    spark.conf.set(Snapshots.ManifestRowsPerLeafConf, "8")
    try {
      // 64 range-clustered files over id 0..6399 — each covers a ~100-id band
      val data = spark.range(0, 6400).toDF("id")
        .withColumn("v", col("id") * 2)
        .repartitionByRange(64, col("id"))
        .sortWithinPartitions("id")
      val v = Snapshots.commit(spark, data, dir, statsColumns = Seq("id"))
      val snapDir = s"$dir/snap-$v"

      // two-level layout on disk: 8 leaf manifest files + a root list
      // whose per-leaf envelopes tile the id domain and whose n_files
      // sum to the data file count
      val leafFiles = new java.io.File(s"$snapDir/_manifest").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(leafFiles.length == 8, s"${leafFiles.length} leaf manifests")
      val root = spark.read.parquet(s"$snapDir/_manifest/_root")
      assert(root.count() == 8L)
      assert(root.agg(sum("n_files")).head().getLong(0) == 64L)

      // manifest-granularity pruning: a ~100-id range survives at most
      // 2 of the 8 leaves (it can straddle one leaf boundary)
      val survivingLeaves = Snapshots
        .manifestLeaves(spark, snapDir,
          _ => Some(col("hi_id") >= lit(700L) && col("lo_id") <= lit(800L)))
        .select(input_file_name()).distinct().count()
      assert(survivingLeaves >= 1 && survivingLeaves <= 2,
        s"$survivingLeaves of 8 leaves read for a one-band range")

      // the planned scan holds ONLY the surviving data files, through a
      // ManifestFileIndex (no InMemoryFileIndex re-listing), with sizes
      // taken from the manifest's committed size_bytes
      val pruned = Snapshots.readRange(spark, dir, "id", 700L, 800L)
      val location = pruned.queryExecution.optimizedPlan.collectFirst {
        case LogicalRelation(HadoopFsRelation(loc: ManifestFileIndex, _, _, _, _, _), _, _, _, _) => loc
      }
      assert(location.isDefined, "pruned read did not plan a ManifestFileIndex")
      assert(location.get.inputFiles.length == 2,
        s"${location.get.inputFiles.length} files planned for a 2-file range")
      val manifest = spark.read.parquet(s"$snapDir/_manifest")
      assert(manifest.columns.contains("size_bytes"))
      val bySize = manifest.select("file", "size_bytes").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      location.get.inputFiles.foreach { f =>
        val name = f.split('/').last
        val actual = new java.io.File(new java.net.URI(f)).length()
        assert(bySize(name) == actual,
          s"manifest size_bytes ${bySize(name)} != on-disk $actual for $name")
      }
      assert(location.get.sizeInBytes == location.get.inputFiles
        .map(f => new java.io.File(new java.net.URI(f)).length()).sum)

      // results stay exact vs the full filtered scan
      val got = pruned.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = Snapshots.read(spark, dir)
        .filter(col("id").between(700L, 800L))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == want.toSeq && got.length == 101)

      // a range beyond every envelope selects zero leaves and zero files
      assert(Snapshots.readRange(spark, dir, "id", 100000L, 200000L).count() == 0L)
      assert(Snapshots.selectFiles(spark, dir, v, "id", 100000L, 200000L)
        ._1.isEmpty)
    } finally spark.conf.unset(Snapshots.ManifestRowsPerLeafConf)
  }

  test("root pruning covers single-spec transform probes (the IVF probe shape)") {
    val dir = Files.createTempDirectory("graft-mfi-part").toString
    spark.conf.set(Snapshots.ManifestRowsPerLeafConf, "8")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      // 64 bucket-clustered files over 64 cells — a cell-partitioned
      // posting layout; 8 manifest rows per leaf → 8 leaves, each
      // leaf's pt-envelope covering a band of bucket values
      val data = spark.range(0, 12800).toDF("i")
        .select((col("i") % 64L).as("cell"), col("i").as("payload"))
      val v = Snapshots.commit(spark, data, dir,
        partitionSpec = Seq(Snapshots.Transform.Identity("cell")))
      val snapDir = s"$dir/snap-$v"
      // empty hash partitions write no file, so the data file count is
      // the NONEMPTY bucket count (< 64); leaves follow from it
      val nFiles = spark.read.parquet(s"$snapDir/_manifest").count()
      val leafFiles = new java.io.File(s"$snapDir/_manifest").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(leafFiles == ((nFiles + 7) / 8).toInt && leafFiles >= 4,
        s"$leafFiles leaf manifests for $nFiles files")

      // a 2-cell IN probe reads a strict SUBSET of the leaves: the
      // spec-clustering write hashes cells across files, so file
      // envelopes are value-bands with overlap — root pruning is the
      // correct-superset kind here (tight banding is the range path's
      // property, proven above), but whole leaves whose envelope band
      // misses both cells must be skipped
      val (specs, _) = Snapshots.partitionSpecs(spark, dir, v)
      val schema = Snapshots.read(spark, dir).schema
      val surviving = Snapshots.manifestLeaves(spark, snapDir,
          Snapshots.partitionedRootKeep(spark, specs, schema,
            Seq("cell" -> Seq(3L, 17L))))
        .select(input_file_name()).distinct().count()
      assert(surviving >= 1 && surviving < leafFiles,
        s"$surviving of $leafFiles leaves read for a 2-cell probe — no root pruning")

      // end-to-end: the pruned IN read matches the plain filter and
      // plans well under the full file count
      val pruned = Snapshots.readPartitionedIn(spark, dir, "cell", Seq(3L, 17L))
      val planned = pruned.queryExecution.optimizedPlan.collectFirst {
        case LogicalRelation(HadoopFsRelation(loc: ManifestFileIndex, _, _, _, _, _), _, _, _, _) => loc
      }
      assert(planned.isDefined && planned.get.inputFiles.length < nFiles / 2,
        s"${planned.map(_.inputFiles.length)} of $nFiles files planned for 2 cells")
      val got = pruned.orderBy("payload").collect().map(_.getLong(1))
      val want = Snapshots.read(spark, dir)
        .filter(col("cell").isin(3L, 17L))
        .orderBy("payload").collect().map(_.getLong(1))
      assert(got.toSeq == want.toSeq && got.nonEmpty)
    } finally {
      spark.conf.unset(Snapshots.ManifestRowsPerLeafConf)
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("root bloom union prunes whole manifest leaves for point probes") {
    val dir = Files.createTempDirectory("graft-mfi-bloom").toString
    spark.conf.set(Snapshots.ManifestRowsPerLeafConf, "8")
    try {
      // 64 id-clustered files, bloom on the UNclustered v column whose
      // values correlate with the clustering (v = id * 2) — each leaf's
      // union bloom holds ~800 distinct v values of the 12800 domain
      val data = spark.range(0, 6400).toDF("id")
        .withColumn("v", col("id") * 2)
        .repartitionByRange(64, col("id"))
        .sortWithinPartitions("id")
      val ver = Snapshots.commit(spark, data, dir,
        statsColumns = Seq("id"), bloomColumns = Seq("v"))
      val snapDir = s"$dir/snap-$ver"
      val root = spark.read.parquet(s"$snapDir/_manifest/_root")
      assert(root.columns.contains("bloom_v"), root.columns.mkString(","))
      assert(root.count() == 8L)

      // driver-side replay of the root probe: exactly the leaves whose
      // union MAY contain the value survive — far fewer than all 8
      val hashed = spark.range(1)
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit(700L))).head().getLong(0)
      val surviving = root.collect().count { r =>
        val b = r.getAs[Array[Byte]]("bloom_v")
        b != null && graft.functions.BloomFunctions
          .mightContainSerialized(b, hashed)
      }
      assert(surviving >= 1 && surviving < 8,
        s"$surviving of 8 leaves survive the root bloom probe")

      // the full probe stays exact and selects few data files
      val (files, total) = Snapshots.selectFilesPoint(spark, dir, ver, "v", 700L)
      assert(files.nonEmpty && files.length < total,
        s"${files.length} of $total")
      val got = Snapshots.readPoint(spark, dir, "v", 700L).collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((350L, 700L)))
      // absent value: zero files selected (modulo bloom false positives
      // at this density: none for this domain), zero rows read
      assert(Snapshots.readPoint(spark, dir, "v", 701L).count() == 0L)
    } finally spark.conf.unset(Snapshots.ManifestRowsPerLeafConf)
  }

  test("inputFiles render URI-escapable paths like Spark's own listing") {
    // a table directory with a space: the manifest-backed index must
    // render its files in the ESCAPED listing form ("%20", parseable
    // as a URI), byte-equal to what a plain listing-based scan reports
    // — the file-identity equality the file-sharing specs rely on
    val dir = new java.io.File(
      Files.createTempDirectory("graft-mfi-esc").toFile, "with space").toString
    val data = spark.range(0, 400).toDF("id")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    val v = Snapshots.commit(spark, data, dir, statsColumns = Seq("id"))
    val pruned = Snapshots.readRange(spark, dir, "id", 0L, 399L)
    val loc = pruned.queryExecution.optimizedPlan.collectFirst {
      case LogicalRelation(HadoopFsRelation(l: ManifestFileIndex, _, _, _, _, _), _, _, _, _) => l
    }
    assert(loc.isDefined, "range read did not plan a ManifestFileIndex")
    val listed = spark.read.parquet(s"$dir/snap-$v").inputFiles.sorted.toSeq
    assert(loc.get.inputFiles.sorted.toSeq == listed,
      s"manifest rendering diverged from listing:\n  ${loc.get.inputFiles.head}\n  ${listed.head}")
    loc.get.inputFiles.foreach { f =>
      assert(f.contains("%20") && !f.contains(" "), s"unescaped space in $f")
      new java.net.URI(f) // must stay URI-parseable
    }
    assert(pruned.count() == 400L)
  }

  test("single-leaf tables keep the flat layout and skip the root list") {
    val dir = Files.createTempDirectory("graft-mfi-flat").toString
    val data = spark.range(0, 800).toDF("id")
      .withColumn("v", col("id") * 2)
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    val v = Snapshots.commit(spark, data, dir,
      statsColumns = Seq("id"), bloomColumns = Seq("v"))
    val snapDir = s"$dir/snap-$v"
    val leafFiles = new java.io.File(s"$snapDir/_manifest").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(leafFiles.length == 1, s"${leafFiles.length} leaves for 8 files")
    // a one-leaf root prunes nothing and is NOT written — the commit
    // skips the read-back/union/write job chain, and every root
    // consumer falls back to reading the single leaf directly
    assert(!new java.io.File(s"$snapDir/_manifest/_root").exists(),
      "single-leaf manifest wrote a _root list")
    // range, bloom, and stats reads all serve off the leaf alone
    assert(Snapshots.readRange(spark, dir, "id", 150L, 250L).count() == 101L)
    val hit = Snapshots.readPoint(spark, dir, "v", 700L)
    assert(hit.filter(col("v") === 700L).count() == 1L)
    val (sel, tot) = Snapshots.selectFiles(spark, dir, v, "id", 150L, 250L)
    assert(tot == 8L && sel.length <= 3 && sel.nonEmpty, s"$tot/${sel.length}")
  }
}
