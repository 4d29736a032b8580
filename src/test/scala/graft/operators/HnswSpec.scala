package graft.operators

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

class HnswSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet

  private def ranked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"),
      r.getAs[Int]("rank"))).toSet

  private def nodesOf(n: Int): Seq[(Long, Array[Float])] =
    emb.limit(n).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
      .sortBy(_._1).toSeq

  test("level assignment is deterministic and geometric") {
    val levels = (0L until 1000L).map(Hnsw.levelFor(_, 8))
    assert(levels == (0L until 1000L).map(Hnsw.levelFor(_, 8)))
    // geometric with ratio 1/M: ~7/8 of nodes at level 0, a thin tower above
    val l0 = levels.count(_ == 0)
    assert(l0 > 750 && l0 < 950, s"level-0 fraction off: $l0/1000")
    assert(levels.max >= 1 && levels.max <= 24)
  }

  test("shard graph build is deterministic and search is exact-ish with wide ef") {
    val nodes = nodesOf(40)
    val g1 = Hnsw.buildGraph(m = 8, efC = 40, nodes)
    val g2 = Hnsw.buildGraph(m = 8, efC = 40, nodes)
    val q = nodes(7)._2
    // a rebuilt graph is the same graph: identical adjacency, identical search
    assert(g1.links.map(_.map(_.toList).toList) ==
      g2.links.map(_.map(_.toList).toList))
    assert(g1.searchTopK(q, 10, 40) == g2.searchTopK(q, 10, 40))
    // with ef = N the layer-0 sweep visits every reachable node: top-1
    // must be the query's own vector (sim 1.0 to itself)
    val top = g1.searchTopK(q, 1, nodes.length).head
    assert(top._1 == nodes(7)._1 && top._2 > 0.999999)
  }

  test("sharded top-k matches brute force closely on the small corpus") {
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val hnsw = pairs(Hnsw.shardedTopK(emb, queries, k = 10, numShards = 2,
      m = 8, efConstruction = 40, efSearch = 40))
    val recall = (brute & hnsw).size.toDouble / brute.size
    info(s"sharded hnsw recall@10 on sf0.001 = $recall")
    assert(recall >= 0.9, s"recall=$recall")
    // and it never returns a self-match or a wrong per-query count
    val got = Hnsw.shardedTopK(emb, queries, k = 10, numShards = 2,
      m = 8, efConstruction = 40, efSearch = 40).collect()
    assert(got.length == 50)
    assert(!got.exists(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
  }

  test("persisted serve returns bit-identical results to the in-memory path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-rt").toString
    Hnsw.buildHnswIndex(spark, emb, dir, numShards = 2, m = 8,
      efConstruction = 40)
    // params table travels with the index
    val p = Snapshots.read(spark, s"$dir/params").collect().head
    assert(p.getAs[Int]("m") == 8 && p.getAs[Int]("num_shards") == 2)
    val mem = ranked(Hnsw.shardedTopK(emb, queries, k = 10, numShards = 2,
      m = 8, efConstruction = 40, efSearch = 40, roundDecimals = 6))
    val disk = ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6))
    assert(disk == mem)
  }

  test("pending adds are O(new), immediately visible, and exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-pd").toString
    val head = emb.filter(col("vec_id") < 30)
    val tail = emb.filter(col("vec_id") >= 30)
    Hnsw.buildHnswIndex(spark, head, dir, numShards = 2, m = 8,
      efConstruction = 40)
    val baseFiles = Snapshots.read(spark, s"$dir/graph").inputFiles.toSet
    Hnsw.addToHnswIndex(spark, tail, dir,
      foldAt = Double.PositiveInfinity) // the pending STATE is the test
    // the graph table is untouched by an add — pending is a side table
    assert(Snapshots.read(spark, s"$dir/graph").inputFiles.toSet == baseFiles)
    assert(Snapshots.version(spark, s"$dir/graph") == 1L)
    // added vectors serve: each added id's own vector is its query's
    // exact nearest in the pending tier, so results MUST include
    // pending ids for queries whose true neighbors were added
    val served = Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40)
    val servedPairs = pairs(served)
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val addedRefs = brute.filter(_._2 >= 30L)
    assert(addedRefs.nonEmpty)
    val addedRecall =
      (addedRefs & servedPairs).size.toDouble / addedRefs.size
    info(s"recall on pending-resident exact neighbors = $addedRecall")
    // the pending tier is brute-force EXACT — every exact neighbor
    // living in pending must be found
    assert(addedRecall == 1.0)
  }

  test("fold equals a fresh build and truncates pending") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-fd").toString
    val ref = java.nio.file.Files.createTempDirectory("graft-hnsw-fr").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 30), dir,
      numShards = 2, m = 8, efConstruction = 40)
    Hnsw.addToHnswIndex(spark, emb.filter(col("vec_id") >= 30), dir,
      foldAt = Double.PositiveInfinity)
    Hnsw.foldHnswIndex(spark, dir)
    Hnsw.buildHnswIndex(spark, emb, ref, numShards = 2, m = 8,
      efConstruction = 40)
    // a shard graph is a pure function of its node set: folded == fresh
    def rows(d: String) = Snapshots.read(spark, s"$d/graph")
      .select(col("shard"), col("id"), col("vec"), col("nbrs"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toList,
        r.getSeq[scala.collection.Seq[Long]](3).map(_.toList).toList))
      .toSet
    assert(rows(dir) == rows(ref))
    // pending is truncated, not deleted — the table stays readable
    assert(Snapshots.read(spark, s"$dir/pending").count() == 0L)
    // and the folded index serves exactly like the fresh one
    val a = ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6))
    val b = ranked(Hnsw.hnswTopKPersisted(spark, ref, queries, k = 10,
      efSearch = 40, roundDecimals = 6))
    assert(a == b)
  }

  test("retraction is an O(keys) sidecar and retracted ids vanish immediately") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-rm").toString
    Hnsw.buildHnswIndex(spark, emb, dir, numShards = 2, m = 8,
      efConstruction = 40)
    val baseFiles = Snapshots.read(spark, s"$dir/graph").inputFiles.toSet
    // retract ids that the full-corpus exact top-10 provably contains
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val victims = brute.map(_._2).toSeq.sorted.take(5)
    Hnsw.removeFromHnswIndex(spark, dir, victims)
    // merge-on-read: the only NEW files the read plans are the delete
    // sidecar's — no data file was rewritten (the build's zero-row
    // empty-partition outputs are legitimately dropped by the
    // pure-reference commit, so subset-of-v1 is the wrong direction)
    val afterFiles = Snapshots.read(spark, s"$dir/graph").inputFiles.toSet
    assert((afterFiles -- baseFiles).forall(_.contains("_mor_deletes")),
      s"unexpected new data files: ${(afterFiles -- baseFiles).mkString(", ")}")
    val served = pairs(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 60))
    assert(!served.exists(p => victims.contains(p._2)))
    // the thinned graph still finds the surviving neighbors
    val survRef = pairs(Similarity.bruteForceTopK(
      emb.filter(!col("vec_id").isin(victims: _*)), queries, k = 10))
    val recall = (survRef & served).size.toDouble / survRef.size
    info(s"post-retraction recall@10 = $recall")
    assert(recall >= 0.85, s"recall=$recall")
  }

  test("as-of pins the (graph, pending) pair through the version manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-ao").toString
    val sub = java.nio.file.Files.createTempDirectory("graft-hnsw-as").toString
    val head = emb.filter(col("vec_id") < 30)
    val v1 = Hnsw.buildHnswIndex(spark, head, dir, numShards = 2, m = 8,
      efConstruction = 40)
    val v2 = Hnsw.addToHnswIndex(spark,
      emb.filter(col("vec_id") >= 30), dir,
      foldAt = Double.PositiveInfinity)
    assert(v1 == 1L && v2 == 2L)
    // pinned to v1 == a fresh build over what v1 held, bit-identical
    Hnsw.buildHnswIndex(spark, head, sub, numShards = 2, m = 8,
      efConstruction = 40)
    val pinned = ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6, asOf = Some(v1)))
    assert(pinned == ranked(Hnsw.hnswTopKPersisted(spark, sub, queries,
      k = 10, efSearch = 40, roundDecimals = 6)))
    // the tip sees the pending tier; a v2 pin survives a later fold
    // (time travel through both tables' snapshots)
    val atV2 = ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6, asOf = Some(v2)))
    assert(atV2 == ranked(Hnsw.hnswTopKPersisted(spark, dir, queries,
      k = 10, efSearch = 40, roundDecimals = 6)))
    val v3 = Hnsw.foldHnswIndex(spark, dir)
    assert(v3 == 3L)
    assert(atV2 == ranked(Hnsw.hnswTopKPersisted(spark, dir, queries,
      k = 10, efSearch = 40, roundDecimals = 6, asOf = Some(v2))))
  }

  test("fold applies pending-wins on a re-added id (no stale duplicate)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-re").toString
    val ref = java.nio.file.Files.createTempDirectory("graft-hnsw-rr").toString
    val base = emb.filter(col("vec_id") < 40)
    Hnsw.buildHnswIndex(spark, base, dir, numShards = 2, m = 8,
      efConstruction = 40)
    // RE-ADD id 5 with a different vector (vec_id 45's embedding) plus
    // genuinely new ids — the re-added id now has a stale graph row
    // and a fresh pending row
    val readd = emb.filter(col("vec_id") === 45)
      .select(lit(5L).as("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") >= 40 && col("vec_id") < 45)
        .select("vec_id", "embedding"))
    Hnsw.addToHnswIndex(spark, readd, dir)
    Hnsw.foldHnswIndex(spark, dir)
    // one row per id — a fold that unioned both versions would hold two
    val dup = Snapshots.read(spark, s"$dir/graph")
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dup == 0, s"$dup ids duplicated in the folded graph")
    // and the folded table equals a fresh build over the EFFECTIVE
    // corpus (pending version of id 5, not the original)
    val effective = base.filter(col("vec_id") =!= 5)
      .select("vec_id", "embedding").unionByName(readd)
    Hnsw.buildHnswIndex(spark, effective, ref, numShards = 2, m = 8,
      efConstruction = 40)
    def rows(d: String) = Snapshots.read(spark, s"$d/graph")
      .select(col("id"), col("vec"), col("nbrs")).collect()
      .map(r => (r.getAs[Long]("id"), r.getSeq[Float](1).toList,
        r.getSeq[scala.collection.Seq[Long]](2).map(_.toList).toList))
      .toSet
    assert(rows(dir) == rows(ref))
  }

  test("rebuild into an existing dir resets the pending tier") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-rb").toString
    val ref = java.nio.file.Files.createTempDirectory("graft-hnsw-rf").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 30), dir,
      numShards = 2, m = 8, efConstruction = 40)
    // pending holds WRONG vectors for ids 30-39 (each id gets id+10's
    // embedding) — a rebuild that kept them would serve these stale
    // rows over the fresh graph via the pending-wins anti-join
    val stale = emb.filter(col("vec_id") >= 40 && col("vec_id") < 50)
      .select((col("vec_id") - 10).as("vec_id"), col("embedding"))
    Hnsw.addToHnswIndex(spark, stale, dir)
    val full = emb.filter(col("vec_id") < 40)
    Hnsw.buildHnswIndex(spark, full, dir, numShards = 2, m = 8,
      efConstruction = 40)
    assert(Snapshots.read(spark, s"$dir/pending").count() == 0)
    Hnsw.buildHnswIndex(spark, full, ref, numShards = 2, m = 8,
      efConstruction = 40)
    assert(ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6)) ==
      ranked(Hnsw.hnswTopKPersisted(spark, ref, queries, k = 10,
        efSearch = 40, roundDecimals = 6)))
  }

  test("pending-tier serve accepts non-float query vector columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-dq").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 30), dir,
      numShards = 2, m = 8, efConstruction = 40)
    Hnsw.addToHnswIndex(spark, emb.filter(col("vec_id") >= 30), dir,
      foldAt = Double.PositiveInfinity)
    // array<double> queries: every path (graph AND the exact pending
    // tier) must normalize to array<float> — this failed analysis on
    // the pending tier before the qvec cast
    val dq = queries.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    assert(ranked(Hnsw.hnswTopKPersisted(spark, dir, dq, k = 10,
      efSearch = 40, roundDecimals = 6)) ==
      ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
        efSearch = 40, roundDecimals = 6)))
  }

  test("fold policy bounds the pending tier at add time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-fp").toString
    val head = emb.filter(col("vec_id") < 100)
    Hnsw.buildHnswIndex(spark, head, dir, numShards = 2, m = 8,
      efConstruction = 40)
    // a small batch stays pending under the default policy (1.0):
    // 20 pending vs 100 graph rows — below break-even, no fold
    Hnsw.addToHnswIndex(spark,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 120), dir)
    assert(Snapshots.read(spark, s"$dir/pending").count() == 20L)
    assert(Snapshots.version(spark, s"$dir/graph") == 1L)
    // a tight policy folds the add through: the tier self-bounds
    // without any caller calling foldHnswIndex
    Hnsw.addToHnswIndex(spark,
      emb.filter(col("vec_id") >= 120 && col("vec_id") < 140), dir,
      foldAt = 0.1)
    assert(Snapshots.read(spark, s"$dir/pending").count() == 0L)
    // the policy-folded index equals a fresh build over the union —
    // the same purity invariant the explicit fold pins
    val ref = java.nio.file.Files.createTempDirectory("graft-hnsw-fq").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 140), ref,
      numShards = 2, m = 8, efConstruction = 40)
    assert(ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6)) ==
      ranked(Hnsw.hnswTopKPersisted(spark, ref, queries, k = 10,
        efSearch = 40, roundDecimals = 6)))
  }

  test("racing adds never lose a version-manifest row") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-rc").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 200), dir,
      numShards = 2, m = 8, efConstruction = 40)
    // two concurrent adds on disjoint id ranges: the CAS stamp means
    // BOTH manifest rows land with distinct index_versions (the old
    // read-modify-write silently replaced the loser's row, so its
    // returned handle resolved to the winner's pair)
    val vs = Await.result(Future.sequence(Seq(
      Future(Hnsw.addToHnswIndex(spark,
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 230), dir,
        foldAt = Double.PositiveInfinity)),
      Future(Hnsw.addToHnswIndex(spark,
        emb.filter(col("vec_id") >= 230 && col("vec_id") < 260), dir,
        foldAt = Double.PositiveInfinity)))), 10.minutes)
    assert(vs.toSet.size == 2, s"duplicate index versions returned: $vs")
    val manifest = Snapshots.read(spark, s"$dir/versions")
      .select("index_version").collect().map(_.getLong(0)).toSeq
    assert(manifest.size == manifest.distinct.size)
    assert(vs.toSet.subsetOf(manifest.toSet),
      s"returned handles $vs missing from manifest $manifest")
    // every returned handle pins a servable coherent pair
    vs.foreach { v =>
      assert(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 5,
        efSearch = 40, asOf = Some(v)).count() > 0)
    }
    // and the tip serves both batches' vectors (neither add was lost)
    val served = pairs(Hnsw.hnswTopKPersisted(spark, dir,
      emb.filter(col("vec_id") === 210 || col("vec_id") === 240)
        .select(col("vec_id"), col("embedding")), k = 3, efSearch = 40))
    assert(Snapshots.read(spark, s"$dir/pending").count() == 60L)
    assert(served.nonEmpty)
  }

  test("racing adds under the DEFAULT fold policy lose no vectors") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // a 40-vector graph and two concurrent 60-vector adds: each add
    // crosses the default foldAt = 1.0 break-even, so folds race adds
    // and each other. Every interleaving must end with BOTH batches
    // servable — the fold's truncation is CAS'd on the version it
    // read, so a mid-fold add can never be silently truncated — and
    // neither add may throw after its merge landed (the fold loser
    // returns its stamp).
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-dp").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 40), dir,
      numShards = 2, m = 8, efConstruction = 40)
    Await.result(Future.sequence(Seq(
      Future(Hnsw.addToHnswIndex(spark,
        emb.filter(col("vec_id") >= 40 && col("vec_id") < 100), dir)),
      Future(Hnsw.addToHnswIndex(spark,
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 160), dir)))),
      10.minutes)
    // every vector of both batches is either in the graph or pending
    val graphIds = Snapshots.read(spark, s"$dir/graph")
      .select("id").collect().map(_.getLong(0)).toSet
    val pendIds = Snapshots.read(spark, s"$dir/pending")
      .select("id").collect().map(_.getLong(0)).toSet
    assert((graphIds ++ pendIds) == (0L until 160L).toSet,
      s"missing: ${(0L until 160L).toSet -- graphIds -- pendIds}")
    // fold any survivor tier to completion, then the state must equal
    // a fresh build over the union — the fold purity invariant holds
    // across every racing interleaving
    if (Snapshots.read(spark, s"$dir/pending").count() > 0)
      Hnsw.foldHnswIndex(spark, dir)
    val ref = java.nio.file.Files.createTempDirectory("graft-hnsw-dq2").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 160), ref,
      numShards = 2, m = 8, efConstruction = 40)
    assert(ranked(Hnsw.hnswTopKPersisted(spark, dir, queries, k = 10,
      efSearch = 40, roundDecimals = 6)) ==
      ranked(Hnsw.hnswTopKPersisted(spark, ref, queries, k = 10,
        efSearch = 40, roundDecimals = 6)))
  }

  test("fold rebuilds only the touched shards' files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-fs").toString
    Hnsw.buildHnswIndex(spark, emb.filter(col("vec_id") < 40), dir,
      numShards = 4, m = 8, efConstruction = 40)
    val before = Snapshots.read(spark, s"$dir/graph").inputFiles.toSet
    // adds land only in shard 0 (ids ≡ 0 mod 4)
    Hnsw.addToHnswIndex(spark,
      emb.filter(col("vec_id") >= 40 && col("vec_id") % 4 === 0), dir,
      foldAt = Double.PositiveInfinity)
    Hnsw.foldHnswIndex(spark, dir)
    val after = Snapshots.read(spark, s"$dir/graph").inputFiles.toSet
    // untouched shards' files carry by reference; shard 0's are rewritten
    val carried = before & after
    assert(carried.nonEmpty, "no base file survived a single-shard fold")
    assert(before != after, "fold rewrote nothing")
    // correctness across the fold: shard-0 additions are served
    val q = emb.filter(col("vec_id") < 3)
    val brute = pairs(Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 40 ||
        (col("vec_id") >= 40 && col("vec_id") % 4 === 0)), q, k = 5))
    val served = pairs(Hnsw.hnswTopKPersisted(spark, dir, q, k = 5,
      efSearch = 60))
    val recall = (brute & served).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }
}
