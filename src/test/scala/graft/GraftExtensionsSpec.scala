package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Drives the cluster-wide SQL registration path: a session built with
  * `withExtensions(new GraftExtensions)` (sharing the suite's
  * SparkContext) must resolve every injected function from plain SQL —
  * the exact surface a thriftserver/SQL-only client sees with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("all injected functions resolve and evaluate via SQL") {
    // touch the shared session first so the SparkContext exists
    spark.sparkContext
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // getOrCreate reuses the JVM's SparkContext but builds a NEW session
    // with the extensions applied (do NOT stop it — shared context)
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT
          |  cosine_sim(cast(array(1.0, 0.0) as array<float>),
          |             cast(array(1.0, 0.0) as array<float>)) AS cs,
          |  simhash64(array('a', 'b')) AS sh,
          |  size(char_ngrams('hello', 3)) AS ng,
          |  size(minhash_signature(array('x'), 4)) AS mh,
          |  simhash_from_hashes(array(5L), 3) AS sfh,
          |  bitset_from_positions(array(1, 65), 128) AS bm,
          |  bitset_intersect_count(bitset_from_positions(array(1, 65), 128),
          |                         bitset_from_positions(array(1, 7), 128)) AS bic,
          |  zorder2(3L, 5L) AS zk,
          |  word_ngrams('A a b', 2) AS wn,
          |  word_ngrams_all('A a b', 2) AS wna,
          |  repetition_stats('a a b') AS rs
          |""".stripMargin).head()
      assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-9)
      assert(row.getAs[Int]("ng") == 3) // hel, ell, llo
      assert(row.getAs[Int]("mh") == 4)
      // one hash 5 = 0b101: bits 0 and 2 vote +1, bit 1 votes -1 -> fp 0b101
      assert(row.getAs[Long]("sfh") == 5L)
      assert(row.getSeq[Long](row.fieldIndex("bm")).toSeq == Seq(2L, 2L)) // bits 1 and 65
      assert(row.getAs[Long]("bic") == 1L) // only bit 1 shared
      // 3=0b11 -> even bits 0b101; 5=0b101 -> odd bits 0b100010; or = 39
      assert(row.getAs[Long]("zk") == 39L)
      // 'A a b' lowercases to tokens [a,a,b] -> bigrams {a a, a b}
      assert(row.getSeq[String](row.fieldIndex("wn")).toSeq == Seq("a a", "a b"))
      assert(row.getSeq[String](row.fieldIndex("wna")).toSeq == Seq("a a", "a b"))
      val rs = row.getStruct(row.fieldIndex("rs"))
      assert((rs.getLong(0), rs.getLong(1), rs.getLong(2), rs.getLong(3),
        rs.getLong(4)) == ((3L, 2L, 2L, 2L, 2L)))
      // literal-parameter misuse fails analysis, not execution
      val err = intercept[Exception] {
        s.sql("SELECT char_ngrams('x', id) FROM range(1)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("literal"))

      // table functions: the SQL time-travel surface
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ext-tvf").toString
      import s.implicits._
      graft.sources.Snapshots.commit(s,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
      graft.sources.Snapshots.merge(s, dir,
        Seq((2L, "B"), (3L, "c")).toDF("id", "v"), Seq("id"),
        recordChanges = true)
      assert(s.sql(s"SELECT * FROM snapshot('$dir')").count() == 3L)
      assert(s.sql(s"SELECT * FROM snapshot('$dir', 1)").count() == 2L)
      assert(s.sql(
        s"SELECT * FROM snapshot_changes('$dir', 1, 2) " +
          "WHERE change_type = 'update'").count() == 1L)
      assert(s.sql(
        s"SELECT v FROM snapshot('$dir') WHERE id = 2").head().getString(0)
        == "B")
      // TIMESTAMP AS OF through SQL: deterministic injected commit
      // instants — an instant between the commits resolves v1
      val dir2 = java.nio.file.Files
        .createTempDirectory("graft-ext-tvf-asof").toString
      graft.sources.Snapshots.commit(s, Seq((1L, "x")).toDF("id", "v"),
        dir2, commitMillis = Some(1700000000000L))
      graft.sources.Snapshots.commit(s,
        Seq((1L, "x"), (2L, "y")).toDF("id", "v"),
        dir2, commitMillis = Some(1700000002000L))
      assert(s.sql(
        s"SELECT * FROM snapshot_asof('$dir2', 1700000001000)").count() == 1L)
      assert(s.sql(
        s"SELECT * FROM snapshot_asof('$dir2', 1700000002000)").count() == 2L)

      // retrieval TVFs: SQL serve must equal the programmatic serve
      // over the same persisted indexes, row for row
      val docs = Seq(
        (1L, "data table query data"), (2L, "data engine"),
        (3L, "table scan"), (4L, "nothing here"))
        .toDF("doc_id", "text")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-ext-bm25").toString + "/idx"
      graft.operators.TextAnalysis.buildTextIndex(s, docs, idxDir,
        nBuckets = 4)
      val viaSql = s.sql(
        s"SELECT * FROM bm25('$idxDir', 'data,table', 2) " +
          "ORDER BY term, rank").collect()
      val viaApi = graft.operators.TextAnalysis
        .bm25TopKPersisted(s, idxDir, Seq("data", "table"), k = 2)
        .orderBy("term", "rank")
        .select("term", "rank", "doc_id", "bm25").collect()
      assert(viaSql.map(r => (r.getAs[String]("term"), r.getAs[Int]("rank"),
          r.getAs[Long]("doc_id"))).toSeq ==
        viaApi.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq)
      assert(viaSql.nonEmpty)
      assert(s.sql(
        s"SELECT * FROM contaminated('$idxDir', 'engine,zzz_absent')")
        .collect().map(r => (r.getAs[String]("needle"),
          r.getAs[Long]("doc_id"))).toSeq == Seq(("engine", 2L)))
      val emb = (0L until 20L).map(i =>
        (i, Array.tabulate(4)(j => (1.0f + i * j) / (i + 1))))
        .toDF("vec_id", "embedding")
      val qDir = java.nio.file.Files
        .createTempDirectory("graft-ext-ann").toString
      emb.write.mode("overwrite").parquet(s"$qDir/queries.parquet")
      val annDir = s"$qDir/idx"
      graft.operators.Similarity.buildIvfIndex(s, emb, annDir, k = 4,
        iterations = 2, roundDecimals = 6)
      val annSql = s.sql(
        s"SELECT * FROM ann_search('$annDir', '$qDir/queries.parquet', " +
          "'vec_id < 3', 5, 2) ORDER BY query_id, rank").collect()
      val annApi = graft.operators.Similarity
        .ivfTopKPersisted(s, annDir,
          s.read.parquet(s"$qDir/queries.parquet").filter(col("vec_id") < 3),
          k = 5, nProbe = 2, roundDecimals = 6)
        .orderBy("query_id", "rank")
        .select("query_id", "neighbor_id", "cosine", "rank").collect()
      assert(annSql.map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSeq ==
        annApi.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq)
      assert(annSql.nonEmpty)
      // near_dups TVF: SQL serve equals the programmatic probe over
      // the same persisted MinHash index (three docs near-dup across
      // the index/probe split, one unrelated)
      val mhDocs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely different text about cooking pasta tonight"),
        (3L, "the quick brown fox jumps over the lazy dog at dawn"),
        (4L, "observability dashboards aggregate metrics from services"))
        .toDF("doc_id", "text")
      val mhRoot = java.nio.file.Files
        .createTempDirectory("graft-ext-mh").toString
      mhDocs.write.mode("overwrite").parquet(s"$mhRoot/docs.parquet")
      val mhIdx = s"$mhRoot/idx"
      graft.operators.Dedup.buildMinhashIndex(s,
        mhDocs.filter(col("doc_id") <= 2), mhIdx, nBuckets = 4)
      val mhSql = s.sql(
        s"SELECT * FROM near_dups('$mhIdx', '$mhRoot/docs.parquet', " +
          "'doc_id >= 3') ORDER BY id_a, id_b").collect()
      val mhApi = graft.operators.Dedup.minhashProbe(s,
        s.read.parquet(s"$mhRoot/docs.parquet").filter(col("doc_id") >= 3),
        mhIdx).orderBy("id_a", "id_b").collect()
      assert(mhSql.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard_sim"))).toSeq ==
        mhApi.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard_sim"))).toSeq)
      assert(mhSql.map(r => (r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"))).toSeq == Seq((1L, 3L)))

      // as_of TVF arguments pin the serve to a recorded index version:
      // after an add, the pinned spelling must reproduce the pre-add
      // answers while the unpinned one reflects the full index
      graft.operators.Dedup.addToMinhashIndex(s, Seq(
        (5L, "observability dashboards aggregate metrics from services daily"))
        .toDF("doc_id", "text"), mhIdx)
      def mhPairs(asOf: String) = s.sql(
        s"SELECT * FROM near_dups('$mhIdx', '$mhRoot/docs.parquet', " +
          s"'doc_id >= 3'$asOf) ORDER BY id_a, id_b").collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
      assert(mhPairs(", 1") == Seq((1L, 3L)))
      assert(mhPairs("") == Seq((1L, 3L), (4L, 5L)))
      graft.operators.Similarity.addToIvfIndex(s,
        (20L until 25L).map(i =>
          (i, Array.tabulate(4)(j => (1.0f + i * j) / (i + 1))))
          .toDF("vec_id", "embedding"), annDir, roundDecimals = 6)
      val annPinned = s.sql(
        s"SELECT * FROM ann_search('$annDir', '$qDir/queries.parquet', " +
          "'vec_id < 3', 5, 2, 1) ORDER BY query_id, rank").collect()
      assert(annPinned.map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSeq ==
        annApi.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq)
      assert(annPinned.forall(_.getAs[Long]("neighbor_id") < 20L))

      // dup_spans TVF: SQL serve equals the programmatic span probe,
      // with the gram width resolved from the index's OWN params table
      // (built with non-default n=4 and never restated in the SQL — a
      // hardcoded default would miss every span here)
      val spIdx = s"$mhRoot/span-idx"
      graft.operators.TextAnalysis.buildSpanIndex(s,
        mhDocs.filter(col("doc_id") <= 2), spIdx, n = 4, nBuckets = 4)
      val spSql = s.sql(
        s"SELECT * FROM dup_spans('$spIdx', '$mhRoot/docs.parquet', " +
          "'doc_id >= 3') ORDER BY doc_id, span_start").collect()
      val spApi = graft.operators.TextAnalysis.dupSpansAgainstIndex(s,
        spIdx, s.read.parquet(s"$mhRoot/docs.parquet")
          .filter(col("doc_id") >= 3), n = 4)
        .orderBy("doc_id", "span_start").collect()
      assert(spSql.map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_start"), r.getAs[Long]("span_len"),
          r.getAs[String]("span_text"))).toSeq ==
        spApi.map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_start"), r.getAs[Long]("span_len"),
          r.getAs[String]("span_text"))).toSeq)
      assert(spSql.nonEmpty && spSql.forall(_.getAs[Long]("doc_id") == 3L))
      // dup_spans as_of: after an add, the pinned spelling reproduces
      // the pre-add spans while the unpinned one sees the new material
      graft.operators.TextAnalysis.addToSpanIndex(s, Seq(
        (6L, "observability dashboards aggregate metrics from services"))
        .toDF("doc_id", "text"), spIdx, n = 4)
      def spDocs(asOf: String) = s.sql(
        s"SELECT * FROM dup_spans('$spIdx', '$mhRoot/docs.parquet', " +
          s"'doc_id >= 3'$asOf) ORDER BY doc_id, span_start").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(spDocs(", 1") == Set(3L))
      assert(spDocs("") == Set(3L, 4L))

      // non-literal TVF args fail analysis loudly
      val tvfErr = intercept[Exception] {
        s.sql(s"SELECT * FROM bm25('$idxDir', concat('d', rand()), 2)")
          .collect()
      }
      assert(tvfErr.getMessage.toLowerCase.contains("literal"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
