package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Snapshots

/** Exactly-once streaming sink over [[Snapshots]]: a `foreachBatch`
  * target that publishes each micro-batch as a table snapshot and skips
  * REPLAYED batches — the restart contract every idempotent sink needs.
  *
  * Protocol: Structured Streaming guarantees a replayed micro-batch
  * carries the SAME `batchId` with the SAME data (that is what the
  * checkpoint is for), so idempotence reduces to batch-id dedup: a
  * `_batch-<id>` marker, written with the same atomic-rename protocol
  * as the snapshot pointer, records completion. A crash between the
  * snapshot commit and the marker write makes the replay commit the
  * identical content again under a new version — at-least-once in the
  * version HISTORY, exactly-once in the visible CONTENT, which is the
  * strongest guarantee a two-object commit can give without a
  * transactional catalog (and exactly where the lakehouse formats put
  * their transaction log instead).
  */
object SnapshotSink {

  /** Commit `df` as the next snapshot unless `batchId` already
    * committed. Returns true when a commit happened.
    */
  def commitBatch(
      spark: SparkSession,
      df: DataFrame,
      tableDir: String,
      batchId: Long): Boolean = {
    val ctx = FileContext.getFileContext(
      spark.sparkContext.hadoopConfiguration)
    val marker = new Path(tableDir, s"_batch-$batchId")
    if (ctx.util().exists(marker)) false
    else {
      Snapshots.commit(spark, df, tableDir)
      val tmp = new Path(tableDir, s"_batch-$batchId.tmp")
      val out = ctx.create(tmp,
        java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
      try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      ctx.rename(tmp, marker, Options.Rename.OVERWRITE)
      true
    }
  }

  /** Wire a streaming frame to snapshot commits:
    * `stream.writeStream.foreachBatch(SnapshotSink.into(tableDir))`.
    */
  def into(tableDir: String): (DataFrame, Long) => Unit =
    (batch, id) => { commitBatch(batch.sparkSession, batch, tableDir, id); () }
}
