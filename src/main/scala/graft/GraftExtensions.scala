package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitsetFromPositions, BitsetIntersectCount, CharNgrams, CosineSimilarity, MinHashSignature, RepetitionStats, SimHash64, SimHashFromHashes, WordNgrams, WordNgramsAll, ZOrder2, ZOrderK}

/** Cluster-wide registration of the library's Catalyst expressions via
  * `SparkSessionExtensions` — the deployment path for SQL users:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * makes `cosine_sim`, `simhash64`, `char_ngrams`, `minhash_signature`
  * resolve in every session (including thriftserver/SQL-only clients)
  * without per-session `functionRegistry` calls. The per-session
  * `register(spark)` helpers on the companion objects remain for
  * programmatic use.
  *
  * Literal-int parameters (`n`, `k`) are required to be foldable — they
  * parameterize generated code, so a per-row value cannot work.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def litInt(e: Expression, fn: String, param: String): Int = {
    require(e.foldable, s"$fn: $param must be a literal integer")
    e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $param must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // windowed row_number top-k -> two-phase bounded-heap aggregation
    // (opt out: spark.graft.topkRewrite.enabled=false)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRule)

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(text, n) - distinct character n-grams"),
      (exprs: Seq[Expression]) =>
        CharNgrams(exprs(0), litInt(exprs(1), "char_ngrams", "n"))))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingles, k) - k-permutation MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs(0), litInt(exprs(1), "minhash_signature", "k"))))

    ext.injectFunction((
      FunctionIdentifier("simhash_from_hashes"),
      info("simhash_from_hashes",
        "simhash_from_hashes(hashes, bits) - SimHash sign-vote over precomputed token hashes"),
      (exprs: Seq[Expression]) =>
        SimHashFromHashes(exprs(0), litInt(exprs(1), "simhash_from_hashes", "bits"))))

    ext.injectFunction((
      FunctionIdentifier("bitset_from_positions"),
      info("bitset_from_positions",
        "bitset_from_positions(positions, numBits) - fixed-width bitset from int positions"),
      (exprs: Seq[Expression]) =>
        BitsetFromPositions(exprs(0), litInt(exprs(1), "bitset_from_positions", "numBits"))))

    ext.injectFunction((
      FunctionIdentifier("bitset_intersect_count"),
      info("bitset_intersect_count",
        "bitset_intersect_count(a, b) - popcount of the word-wise AND of two bitsets"),
      (exprs: Seq[Expression]) => BitsetIntersectCount(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      info("zorder2",
        "zorder2(a, b) - Morton interleave of two bigints (Z-order clustering key)"),
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("zorderk"),
      info("zorderk",
        "zorderk(a, b, ...) - Morton interleave of 2-8 bigints, 64/k bits " +
          "each (k-dimensional Z-order clustering key)"),
      (exprs: Seq[Expression]) => ZOrderK(exprs)))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams",
        "word_ngrams(text, n) - distinct word n-gram shingles (tokenized, lowercased)"),
      (exprs: Seq[Expression]) =>
        WordNgrams(exprs(0), litInt(exprs(1), "word_ngrams", "n"))))

    ext.injectFunction((
      FunctionIdentifier("word_ngrams_all"),
      info("word_ngrams_all",
        "word_ngrams_all(text, n) - every word n-gram occurrence in order " +
          "(non-distinct; empty for texts shorter than n words)"),
      (exprs: Seq[Expression]) =>
        WordNgramsAll(exprs(0), litInt(exprs(1), "word_ngrams_all", "n"))))

    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - word/bigram repetition counts " +
          "(n_words, n_distinct_words, top_count, n_bigrams, n_distinct_bigrams)"),
      (exprs: Seq[Expression]) => RepetitionStats(exprs.head)))

    // ---- table functions: SQL time travel over the snapshot layer ----
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {

  private def tinfo(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def litStr(e: Expression, fn: String, param: String): String = {
    require(e.foldable, s"$fn: $param must be a literal string")
    val v = e.eval()
    require(v != null, s"$fn: $param must not be null")
    v.toString
  }

  private def litLong(e: Expression, fn: String, param: String): Long = {
    require(e.foldable, s"$fn: $param must be a literal integer")
    e.eval() match {
      case i: Int  => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be an integer literal, got $other")
    }
  }

  private def active = org.apache.spark.sql.SparkSession.active

  /** The FROM-clause surface a SQL-only client gets for the library's
    * lakehouse tables — the `VERSION AS OF` / `TIMESTAMP AS OF` /
    * change-feed reads of the real formats, spelled as TVFs because
    * this layer lives beside (not inside) the session catalog.
    * Arguments must be literals: the builder runs at analysis time and
    * resolves the snapshot then, so the query plans against an
    * immutable version exactly like the programmatic readers.
    */
  private[graft] val tableFunctions: Seq[(FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq(
      (FunctionIdentifier("snapshot"),
        tinfo("snapshot",
          "snapshot(dir[, version]) - read a snapshot table: current " +
            "state, or VERSION AS OF when a version literal is given"),
        (exprs: Seq[Expression]) => {
          val dir = litStr(exprs(0), "snapshot", "dir")
          val df = exprs.size match {
            case 1 => graft.sources.Snapshots.read(active, dir)
            case 2 => graft.sources.Snapshots.readVersion(active, dir,
              litLong(exprs(1), "snapshot", "version"))
            case n => throw new IllegalArgumentException(
              s"snapshot(dir[, version]) takes 1 or 2 arguments, got $n")
          }
          df.queryExecution.logical
        }),
      (FunctionIdentifier("snapshot_asof"),
        tinfo("snapshot_asof",
          "snapshot_asof(dir, epoch_millis) - TIMESTAMP AS OF read: the " +
            "latest version committed at or before the instant"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 2,
            s"snapshot_asof(dir, epoch_millis) takes 2 arguments, got ${exprs.size}")
          graft.sources.Snapshots.readAsOf(active,
            litStr(exprs(0), "snapshot_asof", "dir"),
            litLong(exprs(1), "snapshot_asof", "epoch_millis"))
            .queryExecution.logical
        }),
      (FunctionIdentifier("snapshot_changes"),
        tinfo("snapshot_changes",
          "snapshot_changes(dir, fromV, toV) - the write-time change feed " +
            "over (fromV, toV]: change_type, value columns, version"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 3,
            s"snapshot_changes(dir, fromV, toV) takes 3 arguments, got ${exprs.size}")
          graft.sources.Snapshots.changesFeed(active,
            litStr(exprs(0), "snapshot_changes", "dir"),
            litLong(exprs(1), "snapshot_changes", "fromV"),
            litLong(exprs(2), "snapshot_changes", "toV"))
            .queryExecution.logical
        }),

      // ---- retrieval TVFs over the persisted indexes: the SQL-only
      // surface of the build/serve split (VERDICT r9 #6). Serving reads
      // ONLY the probed posting buckets through the snapshot layer's
      // manifest pruning — identical plans to the programmatic entries,
      // so the entries' oracles gate these verbatim. ----
      (FunctionIdentifier("bm25"),
        tinfo("bm25",
          "bm25(index_dir, terms_csv, k[, as_of]) - BM25 top-k per " +
            "query term served from a persisted inverted index " +
            "(buildTextIndex); reads only the query terms' posting " +
            "buckets. The optional 4th argument pins retrieval to a " +
            "postings version (reproducible serving - the ranking an " +
            "experiment logged replays bit-for-bit after later adds)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 3 || exprs.size == 4,
            s"bm25(index_dir, terms_csv, k[, as_of]) takes 3 or 4 " +
              s"arguments, got ${exprs.size}")
          val terms = litStr(exprs(1), "bm25", "terms_csv")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          graft.operators.TextAnalysis.bm25TopKPersisted(active,
            litStr(exprs(0), "bm25", "index_dir"), terms,
            litLong(exprs(2), "bm25", "k").toInt,
            asOf = exprs.lift(3).map(litLong(_, "bm25", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("bm25_query"),
        tinfo("bm25_query",
          "bm25_query(index_dir, query, k) - additive multi-term BM25: " +
            "one ranked list, score = sum of the query terms' Okapi " +
            "term scores, served from the persisted inverted index " +
            "with one pruned read of the query terms' posting buckets"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 3,
            s"bm25_query(index_dir, query, k) takes 3 arguments, got ${exprs.size}")
          graft.operators.TextAnalysis.bm25QueryTopKPersisted(active,
            litStr(exprs(0), "bm25_query", "index_dir"),
            litStr(exprs(1), "bm25_query", "query"),
            litLong(exprs(2), "bm25_query", "k").toInt)
            .queryExecution.logical
        }),
      (FunctionIdentifier("contaminated"),
        tinfo("contaminated",
          "contaminated(index_dir, needles_csv) - documents containing " +
            "each needle, answered from the needles' posting buckets " +
            "with no corpus scan (decontamination probe)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 2,
            s"contaminated(index_dir, needles_csv) takes 2 arguments, got ${exprs.size}")
          val needles = litStr(exprs(1), "contaminated", "needles_csv")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          graft.operators.TextAnalysis.contaminatedDocs(active,
            litStr(exprs(0), "contaminated", "index_dir"), needles)
            .queryExecution.logical
        }),
      (FunctionIdentifier("ann_search"),
        tinfo("ann_search",
          "ann_search(index_dir, queries_path, queries_where, k, n_probe" +
            "[, as_of]) - IVF top-k cosine neighbors from a persisted " +
            "index (buildIvfIndex) for the query vectors selected from " +
            "a parquet table; reads only the probed cells' posting " +
            "files. Scores round to 6 decimals (the index family's " +
            "determinism contract). The optional 6th argument pins the " +
            "probe to a postings version (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 5 || exprs.size == 6,
            "ann_search(index_dir, queries_path, queries_where, k, " +
              s"n_probe[, as_of]) takes 5 or 6 arguments, got ${exprs.size}")
          // queries come from a TABLE, not a literal vector: ANN query
          // batches are data (the entries' own shape), and the pruned
          // posting read amortizes over the whole batch
          val queries = active.read
            .parquet(litStr(exprs(1), "ann_search", "queries_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "ann_search", "queries_where")))
          graft.operators.Similarity.ivfTopKPersisted(active,
            litStr(exprs(0), "ann_search", "index_dir"), queries,
            k = litLong(exprs(3), "ann_search", "k").toInt,
            nProbe = litLong(exprs(4), "ann_search", "n_probe").toInt,
            roundDecimals = 6,
            asOf = exprs.lift(5).map(litLong(_, "ann_search", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("near_dups"),
        tinfo("near_dups",
          "near_dups(index_dir, probe_path, probe_where[, as_of]) - " +
            "near-duplicate (id_a, id_b, jaccard_sim) pairs of the " +
            "selected probe documents against a persisted MinHash index " +
            "(buildMinhashIndex); band-key lookups read only the probed " +
            "buckets, candidates verify with exact hashed-shingle " +
            "Jaccard. The optional 4th argument pins both index tables " +
            "to a version (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 3 || exprs.size == 4,
            "near_dups(index_dir, probe_path, probe_where[, as_of]) " +
              s"takes 3 or 4 arguments, got ${exprs.size}")
          // probe batches are data, same shape as ann_search: a table
          // plus a selection predicate, so the bucket-pruned band read
          // amortizes over the whole arriving shard
          val probes = active.read
            .parquet(litStr(exprs(1), "near_dups", "probe_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "near_dups", "probe_where")))
          val idxDir = litStr(exprs(0), "near_dups", "index_dir")
          // probe with the BUILD's hyperparameters (the index's params
          // table), never hardcoded defaults — a SQL client has no
          // way to pass them, and a mismatch silently misses pairs.
          // Every buildMinhashIndex dir has a params table, so absence
          // means a foreign/malformed dir: fail loudly rather than
          // guess a width and silently report "no duplicates"
          val (b, r, w) = graft.operators.Dedup
            .minhashIndexParams(active, idxDir).getOrElse(
              throw new IllegalArgumentException(
                s"near_dups: $idxDir has no minhash params table — " +
                  "not a buildMinhashIndex directory"))
          graft.operators.Dedup.minhashProbe(active, probes, idxDir,
            bands = b, rowsPerBand = r, shingleWords = w,
            asOf = exprs.lift(3).map(litLong(_, "near_dups", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("dup_spans"),
        tinfo("dup_spans",
          "dup_spans(index_dir, arrivals_path, arrivals_where[, as_of])" +
            " - maximal spans of the selected arrival documents whose " +
            "every n-gram window already occurs in a persisted span " +
            "index (buildSpanIndex); the arrivals' grams drive one " +
            "bucket-pruned read of their posting buckets, never a " +
            "corpus rescan. The gram width comes from the index's own " +
            "params table. The optional 4th argument pins the probe to " +
            "a postings version (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 3 || exprs.size == 4,
            "dup_spans(index_dir, arrivals_path, arrivals_where" +
              s"[, as_of]) takes 3 or 4 arguments, got ${exprs.size}")
          // arrival batches are data, same shape as near_dups: a table
          // plus a selection predicate, so the pruned posting read
          // amortizes over the whole arriving shard
          val arrivals = active.read
            .parquet(litStr(exprs(1), "dup_spans", "arrivals_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "dup_spans", "arrivals_where")))
          val idxDir = litStr(exprs(0), "dup_spans", "index_dir")
          // probe with the BUILD's gram width (the index's params
          // table) — a mismatch silently misses every span, so a dir
          // with no params table (not a buildSpanIndex layout) is a
          // loud error, never a guessed default
          val n = graft.operators.TextAnalysis
            .spanIndexParams(active, idxDir).getOrElse(
              throw new IllegalArgumentException(
                s"dup_spans: $idxDir has no span params table — " +
                  "not a buildSpanIndex directory"))
          graft.operators.TextAnalysis.dupSpansAgainstIndex(active,
            idxDir, arrivals, n = n,
            asOf = exprs.lift(3).map(litLong(_, "dup_spans", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("graph_search"),
        tinfo("graph_search",
          "graph_search(index_dir, queries_path, queries_where, k, " +
            "ef_search[, as_of]) - HNSW top-k cosine neighbors from a " +
            "persisted shard-and-merge graph index (buildHnswIndex): " +
            "per-shard greedy graph search over the committed adjacency " +
            "plus the exact pending freshness tier, merged globally. M " +
            "and the shard count come from the index's own params " +
            "table. Scores round to 6 decimals (the index family's " +
            "determinism contract). The optional 6th argument pins the " +
            "serve to an INDEX version from the index's version " +
            "manifest — one handle naming the (graph, pending) table " +
            "pair coherently (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 5 || exprs.size == 6,
            "graph_search(index_dir, queries_path, queries_where, k, " +
              s"ef_search[, as_of]) takes 5 or 6 arguments, got ${exprs.size}")
          // query batches are data, same shape as ann_search: a table
          // plus a selection predicate, so the per-shard graph load
          // amortizes over the whole batch
          val queries = active.read
            .parquet(litStr(exprs(1), "graph_search", "queries_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "graph_search", "queries_where")))
          graft.operators.Hnsw.hnswTopKPersisted(active,
            litStr(exprs(0), "graph_search", "index_dir"), queries,
            k = litLong(exprs(3), "graph_search", "k").toInt,
            efSearch = litLong(exprs(4), "graph_search", "ef_search").toInt,
            roundDecimals = 6,
            asOf = exprs.lift(5).map(litLong(_, "graph_search", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("hll_count"),
        tinfo("hll_count",
          "hll_count(index_dir[, as_of]) - per-group distinct-count " +
            "estimates served from a persisted mergeable HLL register " +
            "sketch (buildHllIndex): the estimate is a pure function of " +
            "the tiny register table (groups x 1024 rows), never a " +
            "corpus rescan; registers max-collapse across the family's " +
            "append-only ingest generations, so batch split and arrival " +
            "order are invisible. The group columns come from the " +
            "index's own params table. The optional 2nd argument pins " +
            "the registers snapshot (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 1 || exprs.size == 2,
            "hll_count(index_dir[, as_of]) takes 1 or 2 arguments, " +
              s"got ${exprs.size}")
          graft.operators.Sketches.hllServe(active,
            litStr(exprs(0), "hll_count", "index_dir"),
            asOf = exprs.lift(1).map(litLong(_, "hll_count", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("cm_freq"),
        tinfo("cm_freq",
          "cm_freq(index_dir, probes_path, probes_where, value_expr" +
            "[, as_of]) - per-group occurrence-frequency estimates for " +
            "a probe batch, served from a persisted count-min sketch " +
            "(buildCmIndex): min over the four counter cells each " +
            "probed value hashes to, a pure function of the counters " +
            "table — never a corpus rescan. Probes are data (a table + " +
            "a predicate), and value_expr is a SQL expression over the " +
            "probe table's columns, evaluated identically to the " +
            "build's value derivation. The group columns come from the " +
            "index's own params table. The optional 5th argument pins " +
            "the counters snapshot (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 4 || exprs.size == 5,
            "cm_freq(index_dir, probes_path, probes_where, value_expr" +
              s"[, as_of]) takes 4 or 5 arguments, got ${exprs.size}")
          val probes = active.read
            .parquet(litStr(exprs(1), "cm_freq", "probes_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "cm_freq", "probes_where")))
          graft.operators.Sketches.cmServe(active,
            litStr(exprs(0), "cm_freq", "index_dir"), probes,
            org.apache.spark.sql.functions.expr(
              litStr(exprs(3), "cm_freq", "value_expr")),
            asOf = exprs.lift(4).map(litLong(_, "cm_freq", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("mv_read"),
        tinfo("mv_read",
          "mv_read(view_dir[, as_of]) - the group rows of an " +
            "incrementally-maintained materialized view " +
            "(Views.createView/refreshView): groupCols + n_rows + " +
            "sum_/min_/max_ aggregate columns, sentinel and " +
            "bookkeeping filtered out. The view is itself a snapshot " +
            "table kept current in O(changes) by applying the " +
            "source's recorded change feed; the optional 2nd argument " +
            "pins a committed view version — each refresh is one " +
            "commit, so a pin names the rollup as of the source " +
            "version that refresh applied (reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 1 || exprs.size == 2,
            "mv_read(view_dir[, as_of]) takes 1 or 2 arguments, " +
              s"got ${exprs.size}")
          graft.sources.Views.readView(active,
            litStr(exprs(0), "mv_read", "view_dir"),
            asOf = exprs.lift(1).map(litLong(_, "mv_read", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("mv_read_avg"),
        tinfo("mv_read_avg",
          "mv_read_avg(view_dir[, as_of]) - mv_read plus a derived " +
            "avg_<c> (double) for every maintained sum column: AVG is " +
            "not view state, it is sum/count evaluated AT READ TIME — " +
            "exact, free, and immune to the drift a materialized " +
            "average would accumulate under incremental maintenance"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 1 || exprs.size == 2,
            "mv_read_avg(view_dir[, as_of]) takes 1 or 2 arguments, " +
              s"got ${exprs.size}")
          graft.sources.Views.readView(active,
            litStr(exprs(0), "mv_read_avg", "view_dir"),
            asOf = exprs.lift(1).map(litLong(_, "mv_read_avg", "as_of")),
            withAvg = true)
            .queryExecution.logical
        }),
      (FunctionIdentifier("bloom_has"),
        tinfo("bloom_has",
          "bloom_has(index_dir, probes_path, probes_where, value_expr" +
            "[, as_of]) - per-group MEMBERSHIP bits for a probe batch, " +
            "served from a persisted bloom filter sketch " +
            "(buildBloomIndex): each probed value is checked against " +
            "EVERY group's filter (the decontamination shape — which " +
            "shards contain this string), a pure function of the " +
            "groups x <=8192-row word table — never a corpus rescan. " +
            "One-sided by the bloom contract: hit=1 for every present " +
            "value, always; an absent value reads 1 only with the " +
            "filter's false-positive probability. Probes are data (a " +
            "table + a predicate), value_expr evaluates over the probe " +
            "table's columns identically to the build's derivation. " +
            "The optional 5th argument pins the words snapshot " +
            "(reproducible serving)"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 4 || exprs.size == 5,
            "bloom_has(index_dir, probes_path, probes_where, value_expr" +
              s"[, as_of]) takes 4 or 5 arguments, got ${exprs.size}")
          val probes = active.read
            .parquet(litStr(exprs(1), "bloom_has", "probes_path"))
            .filter(org.apache.spark.sql.functions.expr(
              litStr(exprs(2), "bloom_has", "probes_where")))
          graft.operators.Sketches.bloomServe(active,
            litStr(exprs(0), "bloom_has", "index_dir"), probes,
            org.apache.spark.sql.functions.expr(
              litStr(exprs(3), "bloom_has", "value_expr")),
            asOf = exprs.lift(4).map(litLong(_, "bloom_has", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("quantile_est"),
        tinfo("quantile_est",
          "quantile_est(index_dir, quantiles_csv[, as_of]) - per-group " +
            "quantile estimates from a persisted log-bucketed histogram " +
            "sketch (buildQhIndex): for each quantile q in the " +
            "comma-separated list, the representative of the first " +
            "bucket whose cumulative count reaches ceil(q*n) — " +
            "relative error <= 1/16 above 16, exact below, never a " +
            "corpus rescan. The optional 3rd argument pins the buckets " +
            "snapshot"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 2 || exprs.size == 3,
            "quantile_est(index_dir, quantiles_csv[, as_of]) takes 2 " +
              s"or 3 arguments, got ${exprs.size}")
          val qs = litStr(exprs(1), "quantile_est", "quantiles_csv")
            .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
          graft.operators.Sketches.qhServe(active,
            litStr(exprs(0), "quantile_est", "index_dir"),
            qs.toIndexedSeq,
            asOf = exprs.lift(2).map(litLong(_, "quantile_est", "as_of")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("cm_topk"),
        tinfo("cm_topk",
          "cm_topk(index_dir, k[, as_of]) - per-group heavy hitters " +
            "served from a persisted count-min sketch built with " +
            "candK > 0: the index's batch-exact candidate rows are " +
            "point-queried against the counters and re-ranked by " +
            "global estimate — top k per group, never a corpus " +
            "rescan. The optional 3rd argument pins the counters " +
            "snapshot"),
        (exprs: Seq[Expression]) => {
          require(exprs.size == 2 || exprs.size == 3,
            "cm_topk(index_dir, k[, as_of]) takes 2 or 3 arguments, " +
              s"got ${exprs.size}")
          graft.operators.Sketches.cmTopK(active,
            litStr(exprs(0), "cm_topk", "index_dir"),
            litLong(exprs(1), "cm_topk", "k").toInt,
            asOf = exprs.lift(2).map(litLong(_, "cm_topk", "as_of")))
            .queryExecution.logical
        }))

  /** Per-session registration of the table functions, for sessions
    * built WITHOUT `spark.sql.extensions` (the programmatic analog of
    * the scalar functions' per-session `register(spark)` helpers).
    */
  def registerTableFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    tableFunctions.foreach { case (id, inf, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(
        id, inf, builder(_))
    }
}
