package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** The two batch-scheduling entries: the sharded deterministic epoch
  * shuffle (reproducible pretraining data order) and length-bucketed
  * batching stats. Pins the properties the oracle hash can't see in
  * isolation: the shuffle is a layout-independent PERMUTATION (every doc
  * exactly once, per-shard positions contiguous from 1), and the bucket
  * stats are internally consistent (docs partition across buckets,
  * efficiency is a (0, 1] fraction, max never exceeds its bucket).
  */
class CorpusSchedulingSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-sched")
    dir.toFile.deleteOnExit() // reap suite scratch on JVM exit (ADVICE r8)
    texts.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("corpus_epoch_shuffle: permutation, contiguous shard positions, layout-independent") {
    val dir = docsDir((0L until 200L).map(i => (i, s"doc $i text")))
    val rows = SparkEntry.queries("corpus_epoch_shuffle")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

    // every document appears exactly once
    assert(rows.map(_._3).toSet == (0L until 200L).toSet)
    assert(rows.length == 200)
    // positions within each shard are 1..n with no gaps
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val ps = rs.map(_._2).sorted
      assert(ps.toSeq == (1 to rs.length).toSeq,
        s"shard $shard positions not contiguous: ${ps.take(5).toSeq}...")
    }
    // the order is a function of ids only — rewriting the table with a
    // different physical layout must reproduce the identical schedule
    val dir2 = Files.createTempDirectory("graft-sched2").toString
    new java.io.File(dir2).deleteOnExit()
    spark.read.parquet(s"$dir/documents.parquet").repartition(7)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = SparkEntry.queries("corpus_epoch_shuffle")(spark, dir2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }

  test("tokenBudgetMix: greedy-maximal prefix per source, budget never exceeded, unlisted excluded") {
    // 8 docs of 10 tokens each across two sources + one unlisted
    val docs = (0L until 8L).map { i =>
      val src = if (i < 4) "a" else if (i < 7) "b" else "other"
      (i, Seq.fill(10)("w").mkString(" "), "en", src, 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // budgets: a → floor(0.5·50)=25 tokens (2 docs), b → floor(0.5·50)=25 (2 docs)
    val got = Corpus.tokenBudgetMix(docs,
      weights = Seq("a" -> 0.5, "b" -> 0.5), totalTokens = 50L)
      .collect()
    val bySrc = got.groupBy(_.getAs[String]("source"))
    assert(bySrc.keySet == Set("a", "b"), "unlisted source must be excluded")
    bySrc.foreach { case (s, rs) =>
      assert(rs.length == 2, s"$s: 2 docs of 10 tokens fit a 25-token budget")
      assert(rs.map(_.getAs[Long]("cum_tokens")).max <= 25L)
    }
    // greedy-maximal: the selection is the PREFIX of the md5 draw order
    // (recomputed independently), and one more doc would overflow
    def draw(id: Long): java.math.BigInteger = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      new java.math.BigInteger(md.take(15), 16)
    }
    Seq("a" -> (0L until 4L), "b" -> (4L until 7L)).foreach { case (s, ids) =>
      val order = ids.sortBy(draw)
      val want = order.take(2).toSet
      assert(bySrc(s).map(_.getAs[Long]("doc_id")).toSet == want,
        s"$s: selection must be the draw-order prefix")
    }
  }

  test("corpus_cdc_chunk: boundaries re-align after an insertion (the CDC property)") {
    // the same 120-word body, once bare and once with a 5-word prefix
    // insertion: fixed windows would shift every chunk, but CDC
    // boundaries depend only on local 4-gram content, so the two
    // versions must share their post-first-boundary chunk hashes
    val body = (1 to 120).map(i => s"tok${i * 7 % 31}x$i").mkString(" ")
    val dir = docsDir(Seq(1L -> body, 2L -> s"aa bb cc dd ee $body"))
    val chunks = SparkEntry.queries("corpus_cdc_chunk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(4)))
    val bare = chunks.filter(_._1 == 1L).map(_._2)
    val shifted = chunks.filter(_._1 == 2L).map(_._2)
    val shared = bare.toSet.intersect(shifted.toSet)
    // everything after the first re-aligned boundary is identical; only
    // the head chunk(s) absorbing the insertion may differ
    assert(shared.size >= bare.length - 2,
      s"only ${shared.size} of ${bare.length} chunks re-aligned")
    // chunks tile each document exactly: contiguous, gap-free ranges
    val ranges = SparkEntry.queries("corpus_cdc_chunk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    ranges.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4 + 1, s"gap between $a and $b")
        case _ =>
      }
    }
  }

  test("corpus_length_buckets: boundary assignment and consistent stats") {
    // one doc per boundary edge: 64 words, 65, 128, 512, 513
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> words(64), 2L -> words(65), 3L -> words(128),
      4L -> words(512), 5L -> words(513)))
    val rows = SparkEntry.queries("corpus_length_buckets")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

    val byBucket = rows.map(r => r._1 -> r).toMap
    // 64 stays in the 64 bucket; 65 spills to 128 alongside the 128-doc
    assert(byBucket(64)._2 == 1L)
    assert(byBucket(128)._2 == 2L)
    assert(byBucket(512)._2 == 1L)
    assert(byBucket(1024)._2 == 1L)
    // counts partition the corpus; max fits its bucket; efficiency (0,1]
    assert(rows.map(_._2).sum == 5L)
    rows.foreach { case (bucket, n, total, max, eff) =>
      if (bucket < 1024) assert(max <= bucket)
      assert(eff > 0.0 && eff <= 1.0, s"bucket $bucket efficiency $eff")
      assert(total <= n * bucket || bucket == 1024)
    }
  }
}
