package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.countDistinct

/** Edge semantics the driver fixtures cannot exercise: corpus_pack on
  * zero-token documents (empty / whitespace-only text), which the gate
  * corpus happens not to contain. Pins the defined behavior: an empty
  * range start_seq == end_seq at the document's position, never the
  * nonsensical end = start - 1.
  */
class PipelineEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("corpus_pack: zero-token docs get an empty range, ranges stay ordered") {
    val dir = Files.createTempDirectory("graft-pack-edge").toString
    Seq(
      (1L, "alpha beta gamma " * 200, "en", "s0", 0L),
      (2L, "", "en", "s0", 0L),          // empty text -> 0 tokens
      (3L, "     ", "en", "s0", 0L),     // whitespace-only -> 0 tokens
      (4L, "delta epsilon " * 300, "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("corpus_pack")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // id, start, end
    assert(rows.length == 4)
    rows.foreach { case (id, start, end) =>
      assert(start <= end, s"doc $id: start $start > end $end")
    }
    val zeroTok = rows.filter(r => Set(2L, 3L)(r._1))
    assert(zeroTok.length == 2)
    zeroTok.foreach { case (id, start, end) =>
      assert(start == end, s"zero-token doc $id should have empty range, got [$start,$end]")
    }
  }

  test("stratifiedSample: exact per-stratum n, small strata whole, layout-independent") {
    val docs = (0L until 40L).map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val sample = Corpus.stratifiedSample(docs, "lang", n = 5)
    val byLang = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("de" -> 5L, "en" -> 5L))
    // a stratum smaller than n is returned whole
    val tiny = Corpus.stratifiedSample(docs.filter($"lang" === "de"), "lang", n = 100)
    assert(tiny.count() == 10)
    // the draw is a function of ids only, not the physical layout
    val a = Corpus.stratifiedSample(docs.repartition(7), "lang", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.stratifiedSample(docs.coalesce(1), "lang", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("corpus_cluster_sample: per-cluster cap, contiguous ranks, membership-consistent") {
    val d = "/root/testdata/sf0.001"
    val sample = PipelineQueries.queries("corpus_cluster_sample")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Int]("sample_rank"),
        r.getAs[Long]("doc_id")))
    assert(sample.nonEmpty)
    sample.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.length <= 30, s"cluster $c over cap: ${rows.length}")
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"cluster $c ranks not contiguous")
    }
    // every sampled doc sits in the cluster embedding_kmeans assigns it
    val membership = PipelineQueries.queries("embedding_kmeans")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    sample.foreach { case (c, _, doc) =>
      assert(membership(doc) == c, s"doc $doc sampled into $c, assigned ${membership(doc)}")
    }
  }

  test("leakFreeSplit: clusters never straddle the split, singletons draw alone") {
    val docs = (0L until 100L).map(i => Tuple1(i)).toDF("doc_id")
    // clusters: {0,1,2} share cluster 0; {10,11} share cluster 10
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val split = Corpus.leakFreeSplit(docs, clusters)
    assert(split.count() == 100)
    // invariant: one distinct split value per group key
    val straddlers = split.groupBy("group_key")
      .agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count()
    assert(straddlers == 0)
    // the clustered docs co-travel
    val byId = split.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(0L) == byId(1L) && byId(1L) == byId(2L))
    assert(byId(10L) == byId(11L))
    // both sides are populated at 80/20 over 100 draws
    val train = byId.values.count(_ == "train")
    assert(train > 60 && train < 95, s"train=$train")
  }

  test("chunk: overlapping windows cover the document, tail clamps, case kept") {
    // 5 words, window 3, stride 2 -> chunks at 0 and 2: full coverage
    // with 1-word overlap; 2-word doc -> one whole chunk; casing kept
    val docs = Seq(
      (1L, "One two three four five"),
      (2L, "short Doc")
    ).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, window = 3, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 0, "One two three"),
      (1L, 1, "three four five"),
      (2L, 0, "short Doc")))
    // every word occurs in at least one chunk (coverage law)
    val words = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(words == Set("One", "two", "three", "four", "five"))
  }

  test("dsirSample: target-like docs outscore off-target docs, draw is layout-independent") {
    // two disjoint vocabularies: target docs speak "aa..ah", off-target
    // docs speak "ba..bh". The smoothed log-ratio is strongly positive
    // for target-vocabulary buckets and negative for the rest, so
    // every target-speaking doc must outscore every off-target doc by
    // a margin the bounded Gumbel noise cannot bridge.
    val tgtWords = (0 until 8).map(i => s"a$i").mkString(" ")
    val offWords = (0 until 8).map(i => s"b$i").mkString(" ")
    val rows = (0L until 30L).map { i =>
      val target = i < 10
      // repeat the vocabulary so |log w| >> max Gumbel spread
      val text = Seq.fill(40)(if (target) tgtWords else offWords).mkString(" ")
      (i, if (target) "en" else "xx", text)
    }
    val docs = rows.toDF("doc_id", "lang", "text")
    val sample = Corpus.dsirSample(docs, $"lang" === "en",
      buckets = 64, n = 10)
    val got = sample.orderBy("sample_rank").collect()
    assert(got.length == 10)
    // all ten winners are the target-speaking docs
    assert(got.map(_.getAs[Long]("doc_id")).forall(_ < 10L),
      got.map(_.getAs[Long]("doc_id")).mkString(","))
    // log weights: positive for the winners, and strictly above every
    // off-target doc's (check via a full scoring pass at n = 30)
    val all = Corpus.dsirSample(docs, $"lang" === "en", 64, 30)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    val minTgt = (0L until 10L).map(all).min
    val maxOff = (10L until 30L).map(all).max
    assert(minTgt > maxOff, s"target min $minTgt vs off max $maxOff")

    // layout independence: identical draw on any partitioning
    val a = Corpus.dsirSample(docs.repartition(7), $"lang" === "en", 64, 10)
      .select("doc_id", "es_key").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = sample.select("doc_id", "es_key").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("weightedSample: weight-proportional, deterministic, excludes nonpositive") {
    // 200 light rows (w=1) + one overwhelming row (w=1e9): the heavy
    // row's race key is ~1e9 times smaller than any light key, so it
    // must win a 10-row draw (deterministic: keys are md5-derived)
    val rows = (0L until 200L).map(i => (i, 1L)) :+ (999L, 1000000000L)
    val docs = rows.toDF("doc_id", "w")
    val sample = Corpus.weightedSample(docs, "w", n = 10)
    val ids = sample.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 10)
    assert(ids.contains(999L))

    // layout independence: the same rows win on any partitioning
    val a = Corpus.weightedSample(docs.repartition(7), "w", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == ids)

    // null / zero / negative weights never race
    val dirty = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)))
      .toDF("doc_id", "w")
    val clean = Corpus.weightedSample(dirty, "w", n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L))

    // inclusion frequency tracks weight: over a 1:10 weight split, the
    // heavy half must dominate a half-size draw (A-ES property; exact
    // counts are hash-determined, the margin is wide)
    val mixed = (0L until 100L).map(i => (i, if (i < 50) 1L else 10L))
      .toDF("doc_id", "w")
    val draw = Corpus.weightedSample(mixed, "w", n = 50)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = draw.count(_ >= 50L)
    assert(heavy > 30, s"heavy-weight rows won only $heavy of 50")
  }
}
