package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over an already-pruned snapshot file selection: the
  * manifest filter (min/max range, bloom probe, or transform-envelope
  * keep condition) ran IN SPARK, and only the survivors — path plus the
  * manifest's committed `size_bytes` — reach the driver, as the
  * `FileStatus` list Spark's scan planner needs anyway. This replaces
  * `spark.read.parquet(paths: _*)` on the pruned read paths, which at
  * 10⁶⁺ files pays twice: the path Seq itself, then `InMemoryFileIndex`
  * re-listing every path against the filesystem (one RPC per file) and
  * re-inferring what the manifest already committed. Here `listFiles`
  * hands the planner the pruned [[PartitionDirectory]] directly:
  * O(selected) driver bytes, zero per-file filesystem calls.
  *
  * Partitioning stays flat (`partitionSchema` empty) by design — the
  * snapshot layer's hidden partitioning prunes via the manifest BEFORE
  * this index exists, so Spark-side partition values would be dead
  * weight. Filters passed to `listFiles` are ignored for the same
  * reason: the selection is the pruning.
  */
final class ManifestFileIndex(
    statuses: Seq[FileStatus],
    val partitionSchema: StructType = new StructType())
  extends FileIndex {

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))

  // render the EMPTY-authority URI form Spark's own listing produces
  // ("file:///x", not Hadoop Path's "file:/x") so inputFiles of
  // manifest-backed and listing-backed scans compare EQUAL — the
  // file-identity contract the file-sharing specs assert on. Hadoop
  // Path cannot carry an empty authority, so this is string-level.
  // getRawPath, not getPath: the DECODED path would render an escaped
  // character (space, '%', '#') differently from Spark's listing and
  // break that same equality for such file names.
  override def inputFiles: Array[String] =
    statuses.map { st =>
      val u = st.getPath.toUri
      if (u.getScheme == null) st.getPath.toString
      else u.getScheme + "://" + Option(u.getAuthority).getOrElse("") +
        u.getRawPath
    }.toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_.getLen).sum
}

object ManifestFileIndex {

  /** Plan a parquet scan over pre-selected files. The data schema is
    * the COMMITTED one when the snapshot recorded it (`_schema`
    * sidecar — zero planning jobs, no dependence on any particular
    * file); pre-sidecar snapshots fall back to reading the FIRST
    * file's footer, the same single-footer inference
    * `spark.read.parquet` does with schema merging off. Files of a
    * version may legitimately differ from that schema in two bounded
    * ways, both upcast-safe in Spark's parquet reader: a column
    * DROPPED via the column map may be absent from post-drop files
    * (reads as null, and the logical view hides it anyway), and a
    * column WIDENED via the map may be physically narrow in
    * pre-widening files — `widen` pins the declared wide type over
    * whatever the base schema said.
    */
  def scan(
      spark: SparkSession,
      statuses: Seq[FileStatus],
      widen: Seq[(String, String)] = Nil,
      committed: Option[StructType] = None): DataFrame = {
    require(statuses.nonEmpty, "empty file selection has no schema to scan")
    val base = committed.getOrElse(
      spark.read.parquet(statuses.head.getPath.toString).schema)
    val dataSchema = Snapshots.applyWiden(base, widen)
    val relation = HadoopFsRelation(
      location = new ManifestFileIndex(statuses),
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty[String, String])(spark)
    GraftShims.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
