package graft.queries

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.{TextFunctions, VectorFunctions}
import graft.multimodal.Multimodal
import graft.similarity.KNN
import QueryDsl._

/** LLM-training-data pipeline operators (SURVEY §2 "LLM-pipeline"):
  * dedup, similarity search, text analysis, multimodal plumbing, over
  * the `documents` and `embeddings` tables. All oracle-checked except
  * the three xxhash64/hyperplane-valued outputs (minhash/simhash
  * clusters, IVF ANN), whose semantics are asserted in
  * DedupSpec/SimilaritySpec instead.
  */
object TextVectorQueries extends QueryPack {

  /** Train-once-per-corpus IVF quantizer, persisted through the
    * KNN.saveCentroids artifact (exercised on every cold path) and
    * memoized per JVM. Training is deterministic (seeded init, fixed
    * iters), so a cached artifact is always identical to a retrain.
    */
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()

  /** Build-once-per-corpus persisted MinHash index (same offline-
    * artifact shape as [[ivfCentroidsFor]]; the index build is
    * deterministic, so a cached artifact equals a rebuild).
    */
  private val minhashIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Train-once persisted unigram-LM artifact (same shape). */
  private val lmModelCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q_quality_score's persisted coefficient artifact — run-scoped and
    * dir-INDEPENDENT because the STATIC oracle SQL must embed the
    * same path the query writes (the q_io_dynamic_manifest precedent:
    * one sf dir per Verify JVM, concurrent runs separated by the
    * token). Trained once per (JVM, corpus): the memo holds the CORPUS
    * FINGERPRINT the artifact was trained on, so a JVM that scores a
    * second sf dir RETRAINS over it instead of silently scoring the
    * new corpus with the first corpus's weights (the lmModelCache
    * contract — a stale model would still pass the oracle, which reads
    * the same artifact, while being wrong as a model).
    */
  private val qualityWeightsPath: String =
    s"/tmp/graft_io/${QueryDsl.runToken}/quality_weights"
  private val qualityWeightsCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Corpus fingerprint (size+mtime folded over every leaf file, via
    * the Hadoop FileSystem API so HDFS/object-store paths fingerprint
    * too — java.io.File silently yields 0 for those); keys BOTH the
    * artifact name and the in-JVM memo: regenerated test data can
    * never resurrect a stale quantizer, on disk or in memory.
    */
  private def corpusFingerprint(s: org.apache.spark.sql.SparkSession, dir: String,
                                table: String = "embeddings.parquet"): String = {
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = srcPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val leaves: Seq[org.apache.hadoop.fs.FileStatus] = {
      val st = fs.getFileStatus(srcPath)
      if (st.isFile) Seq(st)
      else {
        val it = fs.listFiles(srcPath, true)
        val b = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) b += it.next()
        b.result().sortBy(_.getPath.toString)
      }
    }
    java.lang.Long.toHexString(leaves.foldLeft(0x9E3779B97F4A7C15L) { (h, st) =>
      val x = h ^ (st.getPath.getName.hashCode.toLong << 32) ^
        st.getLen ^ java.lang.Long.rotateLeft(st.getModificationTime, 21)
      x * 0xBF58476D1CE4E5B9L
    })
  }

  private def ivfCentroidsFor(s: org.apache.spark.sql.SparkSession, dir: String,
                              emb: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] = {
    val fp = corpusFingerprint(s, dir)
    ivfCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val path = new java.io.File(
        s"/tmp/graft_io/ivf_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$fp.givf")
      path.getParentFile.mkdirs()
      if (path.isFile) KNN.loadCentroids(s, path.getAbsolutePath)
      else {
        val cents = KNN.trainIvfCentroids(emb, "vec_id", "embedding", k = 16, dim = 64, iters = 3)
        KNN.saveCentroids(s, cents, path.getAbsolutePath)
        cents
      }
    })
  }

  /** Train-once-per-corpus PQ codebooks, persisted through the
    * KNN.savePqCodebooks artifact and memoized per JVM — the same
    * offline-artifact shape as [[ivfCentroidsFor]].
    */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Double]]]]()
  private def pqCodebooksFor(s: org.apache.spark.sql.SparkSession, dir: String,
                             emb: org.apache.spark.sql.DataFrame): Seq[Seq[Seq[Double]]] = {
    val fp = corpusFingerprint(s, dir)
    pqCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val path = new java.io.File(
        s"/tmp/graft_io/pq_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$fp.gpq")
      path.getParentFile.mkdirs()
      if (path.isFile) KNN.loadPqCodebooks(s, path.getAbsolutePath)
      else {
        val books = KNN.trainPqCodebooks(emb, "vec_id", "embedding",
          m = 8, k = 16, dim = 64, iters = 3)
        KNN.savePqCodebooks(s, books, path.getAbsolutePath)
        books
      }
    })
  }

  /** Train-once-per-corpus BPE merges, persisted through the
    * Bpe.save artifact (exercised on every cold path: train → save →
    * LOAD → use the loaded model) and memoized per JVM, keyed by the
    * documents-table fingerprint — the same offline-artifact shape as
    * [[ivfCentroidsFor]].
    */
  /** One merge count shared by the gate query AND its unrolled oracle
    * ([[bpeMergesOracle]]) — they must never drift.
    */
  private val BpeNumMerges = 40

  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Bpe.Model]()
  private def bpeModelFor(s: org.apache.spark.sql.SparkSession, dir: String): graft.pipeline.Bpe.Model = {
    val fp = corpusFingerprint(s, dir, "documents.parquet")
    bpeCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val path = new java.io.File(
        s"/tmp/graft_io/bpe_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$fp.gbpe")
      path.getParentFile.mkdirs()
      if (!path.isFile) {
        val m = graft.pipeline.Bpe.train(tables(s, dir).documents, "text",
          numMerges = BpeNumMerges)
        graft.pipeline.Bpe.save(s, m, path.getAbsolutePath)
      }
      graft.pipeline.Bpe.load(s, path.getAbsolutePath)
    })
  }

  /** q_bpe_merges oracle: BPE training is deterministic given the
    * corpus, so the oracle RECOMPUTES the merge sequence — the
    * unrolled-rounds technique the graph oracles use. One materialized
    * CTE trio per merge: (1) pair census over the current word
    * segmentations, weighted by word frequency; (2) argmax with the
    * trainer's exact (-count, left, right) tie-break and the ≥2
    * min-pair-frequency stop (an empty best passes segmentations
    * through unchanged, so early stop degrades gracefully); (3) exact
    * left-to-right resegmentation as a `list_reduce` fold over a
    * space-joined accumulator — symbols are \S+ tokens so the
    * separator can never collide, and a just-merged token equals
    * left||right ≠ left so it can never immediately re-merge, which is
    * precisely the trainer's skip-after-merge scan. trainLocal's
    * maxWords cap (1e6) is not modeled: every gate corpus vocabulary
    * sits orders of magnitude below it. Character splitting is per
    * codepoint (the corpus is ASCII; the JVM side splits UTF-16
    * chars — equivalent below the astral plane).
    */
  private val bpeMergesOracle: String = {
    val stages = (1 to BpeNumMerges).map { m =>
      s"""p$m AS MATERIALIZED (
         |  SELECT s1, s2, sum(n) AS cnt FROM (
         |    SELECT w.n, w.syms[i] AS s1, w.syms[i + 1] AS s2
         |    FROM w${m - 1} w, unnest(range(1, len(w.syms))) AS t(i))
         |  GROUP BY s1, s2),
         |b$m AS MATERIALIZED (
         |  SELECT s1, s2 FROM p$m WHERE cnt >= 2 ORDER BY cnt DESC, s1, s2 LIMIT 1),
         |w$m AS MATERIALIZED (
         |  SELECT w.w, w.n,
         |    CASE WHEN b.s1 IS NULL THEN w.syms ELSE
         |      string_split(list_reduce(w.syms, (acc, x) ->
         |        CASE WHEN x = b.s2 AND (acc = b.s1 OR ends_with(acc, ' ' || b.s1))
         |             THEN acc || b.s2 ELSE acc || ' ' || x END), ' ')
         |    END AS syms
         |  FROM w${m - 1} w LEFT JOIN b$m b ON TRUE)""".stripMargin
    }
    val mergeRows = (1 to BpeNumMerges)
      .map(m => s"""SELECT ${m - 1} AS rank, s1 AS "left", s2 AS "right" FROM b$m""")
      .mkString("\nUNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, count(*)::BIGINT AS n FROM (
       |    SELECT unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS w
       |    FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |w0 AS MATERIALIZED (
       |  SELECT w, n,
       |    list_append([substr(w, i, 1) FOR i IN range(1, len(w) + 1)], '</w>') AS syms
       |  FROM words),
       |${stages.mkString(",\n")}
       |SELECT CAST(rank AS BIGINT) AS rank, "left", "right"
       |FROM ($mergeRows) ORDER BY rank""".stripMargin
  }

  /** Bench-only hook (NOT a registered gate query): the
    * REALISTIC-knob IVF search — nprobe = 4 of 16 cells — whose
    * pruned-scan shape the gate query no longer exercises since its
    * r12 promotion to the exhaustive nprobe (hash-exact vs brute
    * force). Bench times this as an auxiliary entry so a regression
    * in the cell-ranking/pruning path stays visible round over round;
    * recall at this knob is pinned in SimilaritySpec.
    */
  def knnIvfProbeBench(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame = {
    val emb = tables(s, dir).embeddings
    val cents = ivfCentroidsFor(s, dir, emb)
    KNN.ivfKMeansTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
        k = 5, centroids = cents, nprobe = 4)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"))
      .orderBy(col("probe_id"), col("rank"))
  }

  override val queries: Map[String, Q] = Map(

    // end-to-end curation pipeline (quality gate → exact dedup →
    // token accounting). nearDup=false here: the MinHash stage has
    // engine-specific cluster values and is gated by
    // TrainingPipelineSpec instead; every oracle-checked stage is
    // composed from the same arithmetic the per-stage oracles verify.
    "q_pipeline_curate" -> { (s, dir) =>
      graft.pipeline.Curate.curate(tables(s, dir).documents, "doc_id", "text",
          minTokens = 10L, minAlpha = 0.5, nearDup = false)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_bpe_est")).as("total_bpe"))
    },

    // exact dedup via content hash (md5 exists in both engines).
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(tables(s, dir).documents, "doc_id", "text")
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_docs"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
          min(col("keeper")).as("first_keeper"))
    },

    // exact dedup with a KEEP-BEST policy: each content duplicated
    // under a shifted id; the keeper is the max-score copy (tie: min
    // id), checked per content group against a window-ranked oracle.
    "q_dedup_best" -> { (s, dir) =>
      val d = tables(s, dir).documents.select(col("doc_id"), col("text"))
      val corpus = d.union(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactKeepBest(corpus, "doc_id", "text", (col("doc_id") * 37) % 101)
        .orderBy(col("content_hash"))
    },

    // SemDeDup semantic dedup — ORACLE-EXACT (r12, formerly rows-only):
    // the gate clusters over FIXED reference directions (compile-time
    // float-rounded literals, the q_embed_outlier technique), so the
    // oracle recomputes the argmax assignment from the same embedded
    // centroid literals and the within-cluster ≥-threshold drop rule
    // from the same pairwise cosine, at every sf. The trained-quantizer
    // path stays exercised by q_knn_ivf's artifact, and semanticDedup's
    // drop rule / hot-cluster cap are additionally pinned in
    // SimilaritySpec. Threshold 0.35 so the gate actually drops docs.
    "q_semantic_dedup" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      KNN.semanticDedup(emb, "vec_id", "embedding",
          semanticDedupCentroids, threshold = 0.35)
        .orderBy(col("id"))
    },

    // CCNet-style unigram-LM quality score: corpus-trained smoothed
    // word probabilities → per-doc mean negative log-likelihood.
    "q_lm_score" -> { (s, dir) =>
      graft.functions.LmScore.unigram(tables(s, dir).documents, "doc_id", "text")
        .filter(col("id") <= 300)
        .orderBy(col("id"))
    },

    // TF-IDF term weighting: corpus-wide doc frequencies, smoothed
    // idf, output restricted to a doc window after the global pass.
    "q_tfidf" -> { (s, dir) =>
      graft.functions.Tfidf.termDoc(tables(s, dir).documents, "doc_id", "text")
        .filter(col("id") <= 30)
        .select(col("id"), col("term"), col("tf"), col("doc_freq"),
          r6(col("tfidf")).as("tfidf"))
        .orderBy(col("id"), col("term"))
    },

    // chat/SFT rendering: synthesized 4-turn conversations flattened
    // to one training string + assistant loss-mask spans; the oracle
    // recomputes every span offset AND the masked substring, so a
    // 1-char drift anywhere fails the gate.
    "q_chat_render" -> { (s, dir) =>
      val t = coalesce(col("text"), lit(""))
      val conv = array(
        struct(lit("user").as("role"), substring(t, 1, 40).as("content")),
        struct(lit("assistant").as("role"), substring(t, 41, 60).as("content")),
        struct(lit("user").as("role"), lit("continue").as("content")),
        struct(lit("assistant").as("role"),
          concat(lit("summary of doc "), col("doc_id").cast("string")).as("content")))
      val r = graft.functions.Chat.render(conv)
      tables(s, dir).documents.filter(col("doc_id") <= 200)
        .select(col("doc_id"), r.getField("text").as("rendered"),
          posexplode(r.getField("spans")).as(Seq("turn", "span")))
        .select(col("doc_id"), col("turn"),
          col("span.lo").as("lo"), col("span.hi").as("hi"),
          length(col("rendered")).cast("long").as("text_len"),
          col("rendered").substr(col("span.lo").cast("int") + 1,
            (col("span.hi") - col("span.lo")).cast("int")).as("masked"))
        .orderBy(col("doc_id"), col("turn"))
    },

    // interpolated bigram-LM score: word-ORDER quality signal on top
    // of the unigram bag (garbled order scores high).
    "q_lm_bigram" -> { (s, dir) =>
      graft.functions.LmScore.bigram(tables(s, dir).documents, "doc_id", "text")
        .filter(col("id") <= 300)
        .orderBy(col("id"))
    },

    // CCNet head/middle/tail corpus split: unigram-LM scores bucketed
    // at exact score-percentile thirds; per-bucket census.
    "q_ccnet_buckets" -> { (s, dir) =>
      graft.functions.LmScore.perplexityBuckets(
          tables(s, dir).documents, "doc_id", "text")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          r6(min(col("avg_nll"))).as("min_nll"),
          r6(max(col("avg_nll"))).as("max_nll"))
        .orderBy(col("bucket"))
    },

    // greedy token-budget selection: longest-docs-first priority key,
    // keep the contiguous prefix whose token total fits the budget
    // (the balanced prefix-sum path, never a single-partition window).
    "q_token_budget" -> { (s, dir) =>
      val docs = tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          size(TextFunctions.tokens(coalesce(col("text"), lit(""))))
            .cast("long").as("n_toks"))
        .withColumn("prio", -(col("n_chars") * 10000000L + col("doc_id")))
      graft.operators.GlobalOrder.takePrefixByWeight(
          docs, "prio", col("n_toks"), budget = 20000L)
        .select(col("doc_id"), col("n_chars"), col("n_toks"))
        .orderBy(col("doc_id"))
    },

    // fastText-style quality classifier (rows-only: LBFGS coefficients
    // carry fp-summation noise; semantics pinned in
    // QualityClassifierSpec): en-language docs as the reference class,
    // scored over the whole corpus.
    "q_quality_classifier" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      val model = graft.pipeline.QualityClassifier.train(
        docs.filter(col("lang") === "en"), docs.filter(col("lang") =!= "en"),
        "doc_id", "text", numBuckets = 1024, maxIter = 20)
      graft.pipeline.QualityClassifier.score(docs, model, "doc_id", "text", 1024)
        .filter(col("id") <= 300)
        .select(col("id"), round(col("quality"), 3).as("quality"))
        .orderBy(col("id"))
    },

    // r15: the classifier SPLIT — training stays rows-only
    // (q_quality_classifier: LBFGS coefficients carry engine-internal
    // fp-summation state), but SCORING against the PERSISTED
    // coefficient artifact is pure arithmetic the oracle replays from
    // the same parquet: per doc, sigmoid(intercept + Σw·cnt / Σcnt)
    // over the md5-hashed n-gram buckets. The artifact LOAD is on the
    // critical path (scoreWithWeights reads the parquet the train leg
    // froze) — the train-once / score-every-crawl pipeline shape.
    "q_quality_score" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      // memo value = the corpus fingerprint the artifact on disk was
      // trained over; a different corpus (second sf dir in this JVM,
      // regenerated test data) retrains and overwrites the artifact
      val fp = corpusFingerprint(s, dir, "documents.parquet")
      qualityWeightsCache.compute(qualityWeightsPath, { (p, prevFp) =>
        if (prevFp == fp) prevFp
        else {
          val model = graft.pipeline.QualityClassifier.train(
            docs.filter(col("lang") === "en"), docs.filter(col("lang") =!= "en"),
            "doc_id", "text", numBuckets = 1024, maxIter = 20)
          graft.pipeline.QualityClassifier.saveWeights(model, p, s)
          fp
        }
      })
      graft.pipeline.QualityClassifier.scoreWithWeights(
          docs.filter(col("doc_id") <= 300), "doc_id", "text", 1024,
          qualityWeightsPath)
        .select(col("id"), r6(col("quality")).as("quality"))
        .orderBy(col("id"))
    },

    // DSIR importance weights: hashed unigram+bigram bag models of
    // the en-language target vs the whole raw corpus; per-doc log
    // importance ratio (md5-derived buckets — engine-reproducible).
    "q_dsir" -> { (s, dir) =>
      graft.pipeline.Dsir.logWeightsWithin(tables(s, dir).documents,
          col("lang") === "en", "doc_id", "text", numBuckets = 1024)
        .filter(col("id") <= 300)
        .select(col("id"), col("n_feats"), r6(col("logw")).as("logw"))
        .orderBy(col("id"))
    },

    // Okapi BM25 weights: corpus doc frequencies + length-normalized
    // term saturation, output restricted after the global pass.
    "q_bm25" -> { (s, dir) =>
      graft.functions.Tfidf.bm25(tables(s, dir).documents, "doc_id", "text")
        .filter(col("id") <= 30)
        .select(col("id"), col("term"), col("tf"), col("doc_freq"), col("dl"),
          r6(col("bm25")).as("bm25"))
        .orderBy(col("id"), col("term"))
    },

    // top-k TF-IDF terms per doc (keyword extraction): smoothed-idf
    // weights ranked per doc with a deterministic (weight desc, term)
    // tie-break; WindowGroupLimit caps the per-doc sort.
    "q_tfidf_top" -> { (s, dir) =>
      graft.functions.Tfidf.topTerms(tables(s, dir).documents,
          "doc_id", "text", k = 5, minDocFreq = 2L)
        .filter(col("id") <= 50)
        .select(col("id"), col("term"), col("tf"), col("doc_freq"),
          col("rank"), r6(col("tfidf")).as("tfidf"))
        .orderBy(col("id"), col("rank"))
    },

    // exact-quota stratified sample: 20 docs per source stratum by
    // smallest md5 coordinate — reproducible quotas, WindowGroupLimit.
    "q_quota_sample" -> { (s, dir) =>
      graft.operators.Splits.sampleQuota(
          tables(s, dir).documents.select(col("doc_id"), col("source")),
          "source", "doc_id", n = 20, seed = "quota")
        .orderBy(col("source"), col("rank"))
    },

    // partitioning-independent weighted sample (A-Res over md5
    // coordinates): 100 orders weighted by price, reproducible on any
    // layout and in the oracle.
    "q_weighted_sample" -> { (s, dir) =>
      graft.operators.Splits.sampleWeightedStable(
          tables(s, dir).orders.select(col("o_orderkey"), col("o_totalprice")),
          "o_orderkey", "o_totalprice", n = 100, seed = "ws")
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderkey"))
    },

    // temperature-weighted domain mixture: per-domain keep rates from
    // q_d ∝ p_d^0.5, row fate by integer md5-threshold compare.
    "q_domain_mix" -> { (s, dir) =>
      graft.operators.Splits.mixtureSample(
          tables(s, dir).documents.select(col("doc_id"), col("source")),
          "source", "doc_id", targetRows = 300L, alpha = 0.5, seed = "mix")
        .select(col("doc_id"), col("source"), col("rate"), col("epochs"))
        .orderBy(col("doc_id"))
    },

    // cross-corpus LM scoring against a PERSISTED unigram model:
    // train on the even-id half (artifact on disk, built once), score
    // the odd-id half against it — OOV words take the smoothed OOV
    // mass. Oracle retrains and rescores entirely in SQL.
    "q_lm_artifact" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      val fp = corpusFingerprint(s, dir, "documents.parquet")
      val path = s"/tmp/graft_io/unilm_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$fp"
      lmModelCache.computeIfAbsent(path, { _ =>
        graft.functions.LmScore.saveUnigramModel(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
        path
      })
      graft.functions.LmScore.scoreWithUnigramModel(
          docs.filter(col("doc_id") % 2 === 1 && col("doc_id") <= 301),
          "doc_id", "text", path)
        .orderBy(col("id"))
    },

    // masked-LM corruption: per-token md5 selection, runs collapse to
    // one sentinel; every byte of the rendering + targets recomputed
    // in SQL.
    "q_mask_corrupt" -> { (s, dir) =>
      graft.pipeline.Pack.maskCorrupt(
          tables(s, dir).documents.filter(col("doc_id") <= 200)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", maskRate = 0.15, seed = "mlm")
        .select(col("doc_id"), col("masked_text"),
          concat_ws(" ", col("targets")).as("targets_str"), col("n_masked"))
        .orderBy(col("doc_id"))
    },

    // fill-in-the-middle rewriting: a deterministic half of the corpus
    // renders as <pre>prefix<suf>suffix<mid>middle with md5-decided
    // selection and character cut points — every byte oracle-checked.
    "q_fim" -> { (s, dir) =>
      graft.pipeline.Pack.fimTransform(
          tables(s, dir).documents.filter(col("doc_id") <= 400)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", fimRate = 0.5, seed = "fim")
        .select(col("doc_id"), col("fim"), col("fim_text"))
        .orderBy(col("doc_id"))
    },

    // seeded deterministic global training-order shuffle: dense 0..n-1
    // position under the md5 permutation, balanced bucketed machinery
    // (never a single-partition global window).
    "q_epoch_shuffle" -> { (s, dir) =>
      graft.operators.Splits.epochOrder(
          tables(s, dir).documents.select(col("doc_id")), "doc_id", seed = "ep0")
        .orderBy(col("doc_id"))
    },

    // deterministic md5-threshold split assignment — reshuffle-stable
    // train/valid/test labels, integer thresholds, no fp boundaries.
    "q_split_assign" -> { (s, dir) =>
      graft.operators.Splits.assignSplit(
          tables(s, dir).documents.select(col("doc_id")), "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = "graft")
        .orderBy(col("doc_id"))
    },

    // trained-BPE merge table — ORACLE-EXACT (r12, formerly rows-only):
    // training is deterministic given the corpus, so the oracle
    // recomputes the full merge sequence via unrolled materialized
    // CTEs ([[bpeMergesOracle]]); the classic-corpus merge sequence
    // stays additionally pinned in BpeSpec.
    "q_bpe_merges" -> { (s, dir) =>
      import s.implicits._
      bpeModelFor(s, dir).merges.zipWithIndex
        .map { case ((l, r), rank) => (rank.toLong, l, r) }
        .toDF("rank", "left", "right")
        .orderBy(col("rank"))
    },

    // distributed BPE encode, gated by its exact detokenization
    // invariant: concatenating every doc's pieces and turning each
    // end-of-word marker back into a space must reproduce the
    // whitespace-normalized text, and the number of marker-closed
    // pieces must equal the doc's token count — both of which DuckDB
    // states independently of the learned merges.
    "q_bpe_roundtrip" -> { (s, dir) =>
      val enc = graft.pipeline.Bpe.encode(
        tables(s, dir).documents, "doc_id", "text", bpeModelFor(s, dir))
      val detok = rtrim(regexp_replace(concat_ws("", col("pieces")),
        graft.pipeline.Bpe.EndOfWord, " "))
      enc.join(tables(s, dir).documents.select(col("doc_id").as("id"), col("text")), Seq("id"))
        .select(col("id"),
          size(filter(col("pieces"), p => p.endsWith(graft.pipeline.Bpe.EndOfWord)))
            .cast("long").as("n_words"),
          (detok === concat_ws(" ",
            TextFunctions.tokens(coalesce(col("text"), lit(""))))).as("detok_ok"))
        .orderBy(col("id"))
    },

    // concat-then-chunk sequence packing: each doc's global token
    // offset and context-window span. Oracle-checked: the balanced
    // bucketed prefix sum must equal DuckDB's naive global cumsum.
    "q_pack_sequences" -> { (s, dir) =>
      graft.pipeline.Pack.sequenceSpans(tables(s, dir).documents, "doc_id", "text",
          window = 256)
        .orderBy(col("id"))
    },

    // the packed sequences themselves: every corpus token at its
    // global position, grouped into 512-token training rows.
    "q_pack_export" -> { (s, dir) =>
      graft.pipeline.Pack.packedSequences(tables(s, dir).documents, "doc_id", "text",
          window = 512)
        .orderBy(col("seq_id"))
    },

    // repeated-substring (k-gram) coverage per doc — suffix-array-
    // style substring dedup re-expressed distributed; oracle-checked
    // (dup identity is hash-independent: a gram is duplicated iff its
    // token tuple occurs twice, which DuckDB recomputes from strings).
    "q_substr_dup" -> { (s, dir) =>
      Dedup.substringStats(tables(s, dir).documents, "doc_id", "text", k = 8)
        .orderBy(col("id"))
    },

    // whole-doc bin packing (docs never straddle bins): length-
    // bucketed deterministic placement with overflow flagging.
    "q_bin_pack" -> { (s, dir) =>
      graft.pipeline.Pack.binPack(tables(s, dir).documents, "doc_id", "text",
          capacity = 192)
        .orderBy(col("id"))
    },

    // substring-dedup TRANSFORM: excise every non-first occurrence of
    // a corpus-duplicated 8-gram, keep the global first; clean text
    // hash-exact vs the oracle's window-ranked recomputation.
    "q_substr_remove" -> { (s, dir) =>
      Dedup.removeDuplicateSpans(tables(s, dir).documents, "doc_id", "text", k = 8)
        .orderBy(col("id"))
    },

    // C4-style three-SENTENCE-span dedup: sentence boundaries derived
    // deterministically (corpus text carries no punctuation, so a
    // fixed token→boundary rewrite creates them identically in both
    // engines), then every non-first duplicated 3-sentence span is
    // excised; clean text hash-exact vs the oracle.
    "q_sentence_dedup" -> { (s, dir) =>
      val sentenced = tables(s, dir).documents
        .select(col("doc_id"),
          regexp_replace(col("text"), " (table|value) ", ". ").as("text"))
      Dedup.removeDuplicateSentenceSpans(sentenced, "doc_id", "text", k = 3)
        .orderBy(col("id"))
    },

    // MinHash+LSH near-dup clustering: every doc → cluster + keep flag.
    // ORACLE-EXACT (r12, formerly rows-only): XxhashOracle recomputes
    // Spark's xxhash64 bit-for-bit in DuckDB (pure-UBIGINT wrapping
    // arithmetic) and replays shingle -> signature -> band -> bucket
    // -> min-cluster in SQL.
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashClusters(tables(s, dir).documents, "doc_id", "text")
        .select(col("id"), col("cluster"), col("keep"))
        .orderBy(col("id"))
    },

    // incremental near-dup against a PERSISTED MinHash index (the
    // 100 TB shape: the historical corpus shingles once into an
    // artifact; each new crawl probes it without re-reading old
    // text). Index = docs with doc_id % 3 != 0; "new crawl" = the
    // remaining docs plus exact re-crawls of index docs (doc_id % 9
    // == 1) under shifted ids, which must match their originals at
    // est ≈ 1.
    // ORACLE-EXACT (r12, formerly rows-only): the index artifact is a
    // deterministic function of the index slice, so the oracle
    // rebuilds BOTH sides' signatures from documents via the
    // XxhashOracle machinery and replays candidates + est_jaccard in
    // SQL; the artifact save/load/extend IO path stays pinned in
    // DedupSpec (estimate ≈ exact Jaccard, roundtrip, param guard).
    "q_dedup_incremental" -> { (s, dir) =>
      val docs = tables(s, dir).documents.select(col("doc_id"), col("text"))
      val fp = corpusFingerprint(s, dir, "documents.parquet")
      val path = s"/tmp/graft_io/mhidx_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$fp"
      minhashIdxCache.computeIfAbsent(path, { _ =>
        Dedup.saveMinhashIndex(docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", path)
        path
      })
      val newCrawl = docs.filter(col("doc_id") % 3 === 0)
        .union(docs.filter(col("doc_id") % 9 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.minhashNewVsIndex(newCrawl, "doc_id", "text", path,
          minEstJaccard = 0.5)
        .orderBy(col("id"), col("index_id"))
    },

    // transitive near-dup chains (connected components over the
    // doc–bucket graph) — ORACLE-EXACT (r12): the label-propagation
    // rounds unroll as materialized CTEs over XxhashOracle's
    // recomputed buckets; chain-merge semantics stay in DedupSpec.
    "q_dedup_transitive" -> { (s, dir) =>
      Dedup.minhashClustersTransitive(tables(s, dir).documents, "doc_id", "text",
          maxIters = 3)
        .select(col("id"), col("cluster"), col("keep"))
        .orderBy(col("id"))
    },

    // SimHash structural near-dup clustering — ORACLE-EXACT (r12):
    // 64 bit-votes over recomputed xxhash64 token hashes in SQL.
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashClusters(tables(s, dir).documents, "doc_id", "text")
        .select(col("id"), col("cluster"), col("keep"))
        .orderBy(col("id"))
    },

    // benchmark decontamination: corpus docs sharing a 4-word shingle
    // with the held-out "benchmark" slice (doc_id % 37 == 0). Oracle-
    // checked: contamination is a set-membership fact on shingle
    // STRINGS, which DuckDB recomputes hash-free.
    "q_decontaminate" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      val bench = docs.filter(col("doc_id") % 37 === 0).select(col("text").as("bench_text"))
      Dedup.decontaminate(docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
          bench, "bench_text", k = 4)
        .filter(col("contaminated"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // decontamination by EXCISION: every corpus 4-gram that also
    // occurs in the held-out bench split is removed from the training
    // text (all occurrences — an eval span has no legitimate first);
    // clean text hash-exact vs the oracle.
    "q_decontam_spans" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      val bench = docs.filter(col("doc_id") % 37 === 0).select(col("text").as("bench_text"))
      Dedup.decontaminateSpans(docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
          bench, "bench_text", k = 4)
        .orderBy(col("id"))
    },

    // windowed PMI collocations: ordered token pairs within a 3-token
    // window, slot-consistent marginals, hapax pairs pruned.
    "q_collocations" -> { (s, dir) =>
      graft.functions.TextMetrics.collocations(tables(s, dir).documents,
          "doc_id", "text", window = 3, minCount = 50L)
        .select(col("t1"), col("t2"), col("n_pairs"), r6(col("pmi")).as("pmi"))
        .orderBy(col("t1"), col("t2"))
    },

    // Gopher-style within-doc repetition metrics over word 2-grams.
    "q_repetition" -> { (s, dir) =>
      graft.functions.TextMetrics.repetition(tables(s, dir).documents, "doc_id", "text", n = 2)
        .select(col("doc_id"), col("n_grams"), col("distinct_grams"),
          r6(col("dup_gram_frac")).as("dup_gram_frac"),
          r6(col("top_gram_frac")).as("top_gram_frac"))
        .orderBy(col("doc_id"))
    },

    // blocked exact n-gram Jaccard: top pairs per corpus by shingle
    // similarity, blocked by source (never all-pairs on the corpus).
    "q_ngram_jaccard" -> { (s, dir) =>
      Dedup.blockedJaccardPairs(tables(s, dir).documents, "doc_id", "text", "source")
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
        .limit(25)
    },

    // asymmetric containment over the same blocked candidates:
    // |A∩B|/|A| flags subset/quote duplication Jaccard misses.
    "q_containment" -> { (s, dir) =>
      Dedup.blockedContainmentPairs(tables(s, dir).documents, "doc_id", "text", "source")
        .orderBy(col("containment_a").desc, col("id_a"), col("id_b"))
        .limit(25)
    },

    // corpus-scale all-pairs embedding near-dup: LSH-bucketed
    // self-join (Hamming-1 cells) + exact cosine verification — the
    // whole-corpus path (no probe set, never n²).
    "q_embed_dedup_pairs" -> { (s, dir) =>
      KNN.nearDupPairs(tables(s, dir).embeddings, "vec_id", "embedding",
          threshold = 0.3, dim = 64, cellBits = 4)
        .select(col("id_a"), col("id_b"), r6(col("cos_sim")).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // embedding-cosine near-dup: nearest neighbor + dup flag for a
    // deterministic probe subset.
    "q_embed_dedup" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      KNN.nearDupByEmbedding(emb, emb.filter(col("vec_id") <= 50), "vec_id", "embedding", 0.9)
        .select(col("probe_id"), col("nn_id"), col("is_dup"))
        .orderBy(col("probe_id"))
    },

    // brute-force cosine top-k — the ANN baseline. Fully
    // oracle-checked: output is ids and ranks only, and both engines
    // compute the same sequential float→double cosine, so neighbor
    // order hash-matches exactly.
    "q_knn_brute" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      KNN.bruteForceTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding", k = 5)
        .select(col("probe_id"), col("rank").cast("long").as("rank"), col("id").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // Annoy index interop (scio-extra annoy): build the .ann file,
    // WRITE and RE-READ it through the public angular format (the
    // artifact roundtrip is on the critical path, like
    // q_bloom_persist), then search. With searchK = corpus size the
    // tree walk degenerates to exhaustive scoring, so the result is
    // oracle-EXACT against the same brute-force SQL as q_knn_brute;
    // recall at realistic searchK is pinned in AnnoySpec.
    "q_knn_annoy" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = tables(s, dir).embeddings
      val built = graft.similarity.Annoy.buildFrom(emb, "vec_id", "embedding",
        dim = 64, nTrees = 8)
      val path = s"/tmp/graft_io/annoy_${dir.replaceAll("[^a-zA-Z0-9]", "_")}.ann"
      graft.similarity.Annoy.write(s, built, path)
      val idx = graft.similarity.Annoy.read(s, path, dim = 64)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("item_id"))
      graft.similarity.Annoy.searchTopK(idx,
          emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 6, searchK = idx.nItems)
        .filter(col("item_id").cast("long") =!= col("probe_id"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("rank"), col("item_id").cast("long").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // Voyager index interop (scio-extra voyager): build the HNSW
    // index, WRITE and RE-READ the index.hnsw + names.json pair
    // through the public format (the artifact roundtrip is on the
    // critical path, like q_knn_annoy), then search. With ef = corpus
    // size the graph search degenerates to exhaustive scoring, so the
    // result is oracle-EXACT against brute-force SQL; recall at
    // realistic ef is pinned in VoyagerSpec. Euclidean space keeps
    // stored vectors un-normalized (voyager normalizes on add only
    // for cosine), so both engines rank the same raw floats.
    "q_knn_voyager" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = tables(s, dir).embeddings
      val (built, bytes) = graft.similarity.Voyager.buildFrom(
        emb, "vec_id", "embedding", dim = 64,
        space = graft.similarity.Voyager.SpaceEuclidean, m = 8, efConstruction = 60)
      val path = s"/tmp/graft_io/voyager_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.similarity.Voyager.write(s, built, bytes, path)
      val idx = graft.similarity.Voyager.read(s, path)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("distance"), col("neighbor_id"))
      graft.similarity.Voyager.searchTopK(idx,
          emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 6, ef = idx.nItems)
        .withColumn("neighbor_id", col("name").cast("long"))
        .filter(col("neighbor_id") =!= col("probe_id"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // IVF-cell ANN — the scale path (per-probe work / 2^cellBits).
    "q_knn_lsh" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      KNN.ivfTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 5, dim = 64, cellBits = 4)
        .select(col("probe_id"), col("rank"), col("id").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // embedding OOD flags against a FIXED reference centroid set
    // (deterministic literals, so the oracle recomputes assignment,
    // similarity, and flag exactly — the trained-centroid form is the
    // same code path with loadCentroids artifacts).
    "q_embed_outlier" -> { (s, dir) =>
      KNN.embeddingOutliers(tables(s, dir).embeddings, "vec_id", "embedding",
          outlierCentroids, minSim = 0.05)
        .orderBy(col("id"))
    },

    // IVF with a TRAINED k-means quantizer (vs q_knn_lsh's static
    // hyperplane cells). Centroids are data-dependent (trained inside
    // the query, deterministic seed), so there is no closed-form SQL
    // oracle — rows-only gate; exactness of emitted scores and recall
    // vs brute force are pinned in SimilaritySpec.
    // quantizer is trained ONCE per corpus and persisted (the
    // production shape: training is an offline artifact build, search
    // jobs load centroids) — repeated invocations, including the
    // bench's median-of-N passes, measure SEARCH throughput against
    // the loaded artifact, not Lloyd's re-runs. Deterministic
    // training (seeded, fixed iters) means the cache can never go
    // stale for a given corpus dir.
    // nprobe = ALL cells for the gate (r12, formerly rows-only at
    // nprobe=4): every corpus vector is then scored with the exact
    // fused cosine, so the result is hash-exact against the same
    // brute-force SQL as q_knn_brute — while the trained-artifact
    // load, cell assignment, and per-probe cell ranking stay on the
    // critical path (the established q_knn_ivfpq/q_knn_annoy
    // exhaustive-knob pattern). Recall at realistic nprobe is pinned
    // in SimilaritySpec.
    "q_knn_ivf" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      val cents = ivfCentroidsFor(s, dir, emb)
      KNN.ivfKMeansTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 5, centroids = cents, nprobe = cents.size)
        .select(col("probe_id"), col("rank").cast("long").as("rank"),
          col("id").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // PQ-compressed ANN (Jégou et al. product quantization): corpus
    // encoded to M-byte codes, candidates ranked by per-probe ADC
    // lookup tables, survivors re-ranked by exact cosine. Codebooks
    // are trained ONCE per corpus and persisted (savePqCodebooks /
    // loadPqCodebooks on the cold path, like q_knn_ivf's quantizer).
    // With refine ≥ corpus size every candidate survives to the exact
    // re-rank, so the result is oracle-EXACT against the same
    // brute-force SQL as q_knn_brute — the encode/LUT/ADC kernels
    // stay on the critical path (they produce the candidate ranking
    // being refined); recall at realistic refine is pinned in
    // SimilaritySpec.
    "q_knn_pq" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      val books = pqCodebooksFor(s, dir, emb)
      KNN.pqTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 5, codebooks = books, refine = 1000000)
        .select(col("probe_id"), col("rank").cast("long").as("rank"),
          col("id").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // IVF-PQ (the FAISS IndexIVFPQ composition): trained coarse
    // quantizer prunes cells, PQ codes give compressed in-cell ADC
    // scoring, exact-cosine refine on survivors — both persisted
    // artifacts (GIVF centroids + GPQ1 codebooks) on the cold path.
    // nprobe = all 16 cells + refine ≥ corpus ⇒ exhaustive exact
    // ranking ⇒ hash-exact vs the brute-force oracle (the established
    // ef=corpus pattern); realistic-knob recall pinned in
    // SimilaritySpec.
    "q_knn_ivfpq" -> { (s, dir) =>
      val emb = tables(s, dir).embeddings
      val cents = ivfCentroidsFor(s, dir, emb)
      val books = pqCodebooksFor(s, dir, emb)
      KNN.ivfPqTopK(emb, emb.filter(col("vec_id") <= 10), "vec_id", "embedding",
          k = 5, centroids = cents, codebooks = books,
          nprobe = cents.size, refine = 1000000)
        .select(col("probe_id"), col("rank").cast("long").as("rank"),
          col("id").as("neighbor_id"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // vector norms — oracle-checked (exact arithmetic both sides).
    "q_embed_norm" -> { (s, dir) =>
      tables(s, dir).embeddings
        .filter(col("vec_id") <= 100)
        .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
          r6(VectorFunctions.l2Norm(col("embedding"))).as("l2_norm"))
        .orderBy(col("vec_id"))
    },

    // Breeze-parity vector algebra (scio-extra Breeze): axpy and the
    // Hadamard-product dot over consecutive embedding pairs — the
    // elementwise verbs stay inside one codegen'd projection, the join
    // is a plain equi-join on vec_id. Value-exact vs the DuckDB
    // list-comprehension oracle.
    // Johnson–Lindenstrauss random projection 64→16: md5-sign matrix
    // built once driver-side, one native codegen dot per output dim;
    // every projected coordinate oracle-exact. Output is flattened to
    // one (vec_id, j, coord) row per projected dimension — the gate's
    // checker sorts column values, so array columns must never reach it.
    "q_random_projection" -> { (s, dir) =>
      tables(s, dir).embeddings
        .select(col("vec_id"),
          posexplode(graft.functions.VectorFunctions.randomProject(
            col("embedding"), 64, 16, "jl")))
        .select(col("vec_id"), col("pos").cast("long").as("j"),
          round(col("col"), 6).as("coord"))
        .orderBy(col("vec_id"), col("j"))
    },

    "q_embed_algebra" -> { (s, dir) =>
      val e = tables(s, dir).embeddings.filter(col("vec_id") <= 101)
      val pairs = e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          col("a.embedding").as("x"), col("b.embedding").as("y"))
      pairs.select(col("vec_id"),
          r6(VectorFunctions.l2Norm(
            VectorFunctions.axpy(lit(2.0), col("x"), col("y")))).as("axpy_norm"),
          r6(VectorFunctions.vecSum(
            VectorFunctions.vecHadamard(col("x"), col("y")))).as("dot_xy"))
        .orderBy(col("vec_id"))
    },

    // language ID. Oracle-checked: the heuristic is deterministic
    // arithmetic (stopword ratios + CJK ratio, argmax with
    // first-tie-wins), reproduced in SQL from the same LangProfiles
    // lists. Accuracy on real multilingual text is asserted in
    // TextSpec (the synthetic corpus collapses to en/und).
    "q_lang_id" -> { (s, dir) =>
      tables(s, dir).documents
        .select(TextFunctions.langId(col("text")).as("pred_lang"))
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("pred_lang"))
    },

    // quality scoring — oracle-checked arithmetic.
    "q_text_quality" -> { (s, dir) =>
      val q = TextFunctions.qualityStruct(col("text"))
      tables(s, dir).documents
        .filter(col("doc_id") <= 100)
        .select(col("doc_id"), q.getField("n_tokens").as("n_tokens"),
          r6(q.getField("distinct_ratio")).as("distinct_ratio"),
          r6(q.getField("mean_tok_len")).as("mean_tok_len"),
          r6(q.getField("alpha_ratio")).as("alpha_ratio"))
        .orderBy(col("doc_id"))
    },

    // Flesch readability: word/sentence/syllable counts + both
    // published scores, every regexp in the shared java∩RE2 dialect.
    "q_readability" -> { (s, dir) =>
      val r = TextFunctions.readability(col("text"))
      tables(s, dir).documents
        .filter(col("doc_id") <= 300)
        .select(col("doc_id"), r.getField("n_words").as("n_words"),
          r.getField("n_sentences").as("n_sentences"),
          r.getField("n_syllables").as("n_syllables"),
          r.getField("flesch").as("flesch"),
          r.getField("fk_grade").as("fk_grade"))
        .orderBy(col("doc_id"))
    },

    // Gopher rule battery over text with synthesized bullet/ellipsis
    // lines (so every rule has signal): per-doc signals + keep flag.
    "q_gopher_quality" -> { (s, dir) =>
      val synth = concat(coalesce(col("text"), lit("")),
        lit("\n- bullet item "), col("doc_id").cast("string"),
        lit("\nplain closing line"),
        when(col("doc_id") % 3 === 0, lit("...")).otherwise(lit("")))
      val g = graft.functions.QualityRules.gopherStruct(synth)
      tables(s, dir).documents
        .filter(col("doc_id") <= 150)
        .select(col("doc_id"),
          g.getField("n_words").as("n_words"),
          r6(g.getField("mean_word_len")).as("mean_word_len"),
          r6(g.getField("symbol_ratio")).as("symbol_ratio"),
          r6(g.getField("bullet_ratio")).as("bullet_ratio"),
          r6(g.getField("ellipsis_ratio")).as("ellipsis_ratio"),
          r6(g.getField("alpha_ratio")).as("alpha_ratio"),
          g.getField("stop_hits").as("stop_hits"),
          g.getField("keep").cast("int").as("keep"))
        .orderBy(col("doc_id"))
    },

    // token counting — whitespace + BPE-ish estimate, oracle-checked.
    "q_token_count" -> { (s, dir) =>
      val tc = TextFunctions.tokenCounts(col("text"))
      tables(s, dir).documents
        .select(col("doc_id"), tc.getField("n_ws_tokens").as("n_ws_tokens"),
          tc.getField("n_bpe_est").as("n_bpe_est"))
        .orderBy(col("doc_id"))
    },

    // sentence segmentation over synthesized punctuated text.
    "q_sentences" -> { (s, dir) =>
      val punctuated = concat(coalesce(col("text"), lit("")),
        lit(". Extra one for doc "), col("doc_id").cast("string"),
        lit("! And a question? Trailing tail"))
      tables(s, dir).documents
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          posexplode(TextFunctions.sentences(punctuated)).as(Seq("idx", "sentence")))
        .orderBy(col("doc_id"), col("idx"))
    },

    // overlapping character chunks — context-window prep, oracle-checked.
    "q_chunk_chars" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          posexplode(TextFunctions.chunkChars(col("text"), 64, 16)).as(Seq("chunk_idx", "chunk")))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // overlapping word chunks (the tokenizer-facing form), oracle-checked.
    "q_chunk_words" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          posexplode(TextFunctions.chunkWords(col("text"), 40, 8)).as(Seq("chunk_idx", "chunk")))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // order-sensitive document fingerprint (chained rolling hash).
    // Oracle-checkable indirectly: with a collision-free 64-bit hash
    // on this corpus, distinct fingerprints == distinct normalized
    // (whitespace-collapsed) texts, which DuckDB can count exactly.
    "q_fingerprint" -> { (s, dir) =>
      tables(s, dir).documents
        .select(col("doc_id"),
          TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("fp"))
        .groupBy().agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct_fp"))
    },

    // multimodal plumbing: binary payload + stubbed decode → metadata.
    // Oracle-checked: the fake decode derives metadata from payload
    // BYTE LENGTH, which DuckDB recomputes via octet_length(encode()).
    "q_multimodal_meta" -> { (s, dir) =>
      val media = Multimodal.asMediaTable(tables(s, dir).documents, "doc_id", "text", "text_as_bytes")
      Multimodal.decodeStub(media).toDF()
        .filter(col("id") <= 100)
        .select(col("id"), col("nBytes").as("n_bytes"), col("width"), col("height"), col("nFrames").as("n_frames"))
        .orderBy(col("id"))
    },

    // REAL image decode: generate a real PNG per doc (dims/color are
    // deterministic functions of doc_id), then read the dimensions
    // back out of the encoded bytes with the JDK codec. The oracle
    // recomputes the formulas — a decoder that doesn't actually parse
    // the PNG cannot match.
    "q_multimodal_decode" -> { (s, dir) =>
      val media = Multimodal.syntheticImages(
        tables(s, dir).documents.filter(col("doc_id") <= 100), "doc_id")
      Multimodal.decodeImageMeta(media).toDF()
        .select(col("id"), col("width"), col("height"), col("nFrames").as("n_frames"))
        .orderBy(col("id"))
    },

    // REAL frame sampling: framed container of real PNG frames,
    // every 2nd frame decoded — true dims + exact mean pixel value
    // (PNG is lossless, so the solid gray level survives bit-exact).
    "q_multimodal_frames" -> { (s, dir) =>
      val media = Multimodal.syntheticVideos(
        tables(s, dir).documents.filter(col("doc_id") <= 50), "doc_id")
      Multimodal.sampleFrames(media, stride = 2).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"), col("width"), col("height"),
          round(col("meanGray")).cast("int").as("gray"))
        .orderBy(col("id"), col("frame_idx"))
    },

    // bulk codec throughput: encode+decode a real PNG for EVERY doc
    // (no id cap) — the bench-scale entry for the multimodal path;
    // the aggregate shape keeps the oracle cheap at any SF.
    "q_multimodal_bulk" -> { (s, dir) =>
      val media = Multimodal.syntheticImages(tables(s, dir).documents, "doc_id")
      Multimodal.decodeImageMeta(media).toDF()
        .agg(count(lit(1)).as("n_decoded"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"),
          sum(when(col("width") === 0, 1L).otherwise(0L)).as("n_failed"))
    },

    // REAL animated-GIF decode: multi-frame motion media through the
    // JDK's native multi-image reader — every sampled frame's pixel
    // value recomputed by the oracle from doc_id (GIF palettes are
    // lossless for solid frames).
    "q_multimodal_gif" -> { (s, dir) =>
      val gifs = Multimodal.syntheticGifs(
        tables(s, dir).documents.filter(col("doc_id") <= 50), "doc_id")
      Multimodal.sampleFrames(gifs, stride = 2).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"), col("width"), col("height"),
          round(col("meanGray")).cast("int").as("gray"))
        .orderBy(col("id"), col("frame_idx"))
    },

    // REAL audio decode: generate a real WAV per doc (constant-
    // amplitude PCM, params deterministic in doc_id), decode it with
    // the JDK codec and read rate/length/peak/RMS back out of actual
    // samples — for a constant signal RMS equals the amplitude
    // exactly, so the oracle recomputes everything from doc_id.
    "q_multimodal_audio" -> { (s, dir) =>
      val audio = Multimodal.syntheticAudio(
        tables(s, dir).documents.filter(col("doc_id") <= 100), "doc_id")
      Multimodal.decodeAudioMeta(audio).toDF()
        .select(col("id"), col("sampleRate").as("sample_rate"), col("channels"),
          col("nSamples").as("n_samples"), col("peak"),
          round(col("rms")).cast("int").as("rms_i"))
        .orderBy(col("id"))
    },

    // REAL audio-quality screen: saturating tones (every sample an
    // explicit least/greatest clamp of trunc(amp·sin)) decoded back;
    // clipping/silence fractions, DC offset, and peak all recompute
    // from doc_id in SQL.
    "q_audio_quality" -> { (s, dir) =>
      val tones = Multimodal.syntheticClipped(
        tables(s, dir).documents.filter(col("doc_id") <= 150), "doc_id")
      Multimodal.audioQuality(tones).toDF()
        .select(col("id"), col("nSamples").as("n_samples"),
          round(col("clipFrac"), 6).as("clip_frac"),
          round(col("silenceFrac"), 6).as("silence_frac"),
          round(col("dcOffset"), 6).as("dc_offset"), col("peak"))
        .orderBy(col("id"))
    },

    // REAL motion analysis: synthetic solid-frame videos through the
    // PNG codec; per-transition gray delta follows the frame formula
    // (consecutive grays differ by 1 except the 256-wrap's 255), so
    // the oracle recomputes every stat from doc_id alone.
    "q_video_motion" -> { (s, dir) =>
      val vids = Multimodal.syntheticVideos(
        tables(s, dir).documents.filter(col("doc_id") <= 200), "doc_id")
      Multimodal.frameDiffStats(vids).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"),
          col("meanAbsDiff").as("mean_abs_diff"),
          col("maxAbsDiff").as("max_abs_diff"),
          col("changedFrac").as("changed_frac"))
        .orderBy(col("id"), col("frame_idx"))
    },

    // REAL spectral analysis: a real WAV pure tone EXACTLY on DFT bin
    // k per doc, decoded and DFT'd on executors; the dominant bin must
    // recover k. Oracle recomputes the same trunc(a·sin) samples and
    // the full 16-bin DFT argmax in SQL — float ulp noise cannot move
    // an on-bin tone's argmax.
    "q_audio_spectrum" -> { (s, dir) =>
      val tones = Multimodal.syntheticTones(
        tables(s, dir).documents.filter(col("doc_id") <= 100), "doc_id")
      Multimodal.audioSpectrum(tones).toDF()
        .select(col("id"), col("sampleRate").as("sample_rate"),
          col("nSamples").as("n_samples"), col("domBin").as("dom_bin"))
        .orderBy(col("id"))
    },

    // REAL feature extraction: decode + Graphics2D resize to a 2×2
    // pixel grid; on a solid image every cell equals gray/255, so
    // round(cell*255) recovers the exact source gray level.
    "q_multimodal_features" -> { (s, dir) =>
      val media = Multimodal.syntheticImages(
        tables(s, dir).documents.filter(col("doc_id") <= 100), "doc_id")
      Multimodal.imageFeatures(media, grid = 2).toDF()
        .select(col("id"), size(col("features")).as("dim"),
          round(element_at(col("features"), 1) * 255).cast("int").as("gray"))
        .orderBy(col("id"))
    }
  )

  /** SQL IN-list from a LangProfiles stopword list (single source of
    * truth with the Spark-side heuristic).
    */
  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** q_lang_id oracle: same scores, same argmax-with-first-tie-wins
    * (a later language needs a STRICTLY greater score to win).
    */
  private val langIdOracle: String = {
    import graft.functions.LangProfiles._
    s"""WITH t AS (
       |  SELECT text, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents
       |), c AS (
       |  SELECT text, greatest(len(toks), 1)::DOUBLE AS n,
       |    len(list_filter(toks, x -> x IN (${inList(en)})))::DOUBLE AS c_en,
       |    len(list_filter(toks, x -> x IN (${inList(es)})))::DOUBLE AS c_es,
       |    len(list_filter(toks, x -> x IN (${inList(de)})))::DOUBLE AS c_de,
       |    len(list_filter(toks, x -> x IN (${inList(fr)})))::DOUBLE AS c_fr,
       |    (length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))::DOUBLE
       |      / greatest(length(text), 1) * 2.0 AS s_zh
       |  FROM t
       |), s AS (
       |  SELECT c_en/n AS s_en, c_es/n AS s_es, c_de/n AS s_de, c_fr/n AS s_fr, s_zh FROM c
       |), p AS (
       |  SELECT CASE
       |    WHEN s_en > 0.005 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |    WHEN s_es > 0.005 AND s_es >  s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |    WHEN s_de > 0.005 AND s_de >  s_en AND s_de >  s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |    WHEN s_fr > 0.005 AND s_fr >  s_en AND s_fr >  s_es AND s_fr >  s_de AND s_fr >= s_zh THEN 'fr'
       |    WHEN s_zh > 0.005 AND s_zh >  s_en AND s_zh >  s_es AND s_zh >  s_de AND s_zh >  s_fr THEN 'zh'
       |    ELSE 'und' END AS pred_lang
       |  FROM s)
       |SELECT pred_lang, count(*) AS n FROM p GROUP BY pred_lang ORDER BY pred_lang""".stripMargin
  }

  /** q_embed_dedup_pairs oracle: same embedded plane literals; the
    * Hamming-1 candidate set is expressed directly as
    * bit_count(xor(cell_a, cell_b)) <= 1 — identical to the Spark
    * side's ball-explode join — then the same cosine threshold.
    */
  private val embedDedupPairsOracle: String = {
    val planes = graft.functions.VectorFunctions.hyperplanes(dim = 64, nBits = 4, seed = 42L)
    def planeList(b: Int) = planes(b).map(_.toString).mkString("[", ", ", "]")
    val cellExpr = (0 until 4).map(b =>
      s"CASE WHEN list_dot_product(embedding, ${planeList(b)}) > 0 THEN ${1 << b} ELSE 0 END")
      .mkString("\n      + ")
    s"""WITH cells AS (
       |  SELECT vec_id, embedding,
       |    $cellExpr AS cell
       |  FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
       |FROM cells a JOIN cells b
       |  ON a.vec_id < b.vec_id AND bit_count(xor(a.cell, b.cell)) <= 1
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) >= 0.3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q_knn_lsh oracle: the hyperplane coefficients are plan-time
    * constants, so the SQL embeds the SAME literals (round-trip-safe
    * Double.toString), computes the same cells and Hamming-1
    * multi-probe, and ranks by the same cosine.
    */
  /** Fixed reference centroids for q_embed_outlier: hyperplane
    * directions rounded THROUGH float (the kernel compares float-cast
    * centroid literals, and Double.toString of the widened float
    * round-trips exactly in the oracle's SQL parser).
    */
  private val outlierCentroids: Seq[Seq[Double]] =
    graft.functions.VectorFunctions.hyperplanes(dim = 64, nBits = 4, seed = 7L)
      .map(_.map(_.toFloat.toDouble).toSeq).toSeq

  /** Fixed reference centroids for q_semantic_dedup's gate clustering
    * (same float-rounded-literal contract as [[outlierCentroids]]):
    * 8 hyperplane directions, a distinct seed from every other
    * reference set in the suite.
    */
  private[queries] val semanticDedupCentroids: Seq[Seq[Double]] =
    graft.functions.VectorFunctions.hyperplanes(dim = 64, nBits = 8, seed = 13L)
      .map(_.map(_.toFloat.toDouble).toSeq).toSeq

  /** q_semantic_dedup oracle: cluster = first-wins argmax cosine over
    * the embedded centroid literals (the q_embed_outlier dialect);
    * drop rule = within-cluster lower-id point at cosine ≥ threshold
    * (the same unrounded DOUBLE[] pairwise compare q_embed_dedup_pairs
    * already gates hash-exact).
    */
  private val semanticDedupOracle: String = {
    def centList(c: Int) = semanticDedupCentroids(c).map(_.toString).mkString("[", ", ", "]")
    def simExpr(c: Int) =
      s"""(CASE WHEN list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]) = 0
         |      THEN 0.0 ELSE
         |  list_sum([CAST(p[1] AS DOUBLE) * p[2] FOR p IN list_zip(embedding, ${centList(c)})])
         |  / (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]))
         |     * sqrt(list_sum([CAST(y AS DOUBLE) * y FOR y IN ${centList(c)}]))) END)""".stripMargin
    // `cool` mirrors semanticDedup's DefaultMaxCluster hot-cluster
    // exemption (hot-cluster members are excluded from pair generation
    // and KEPT) — with 8 fixed clusters a cluster passes 100k members
    // around sf ≳ 40, where an uncapped oracle would false-fail. The
    // bound interpolates from the SHARED constant so operator and
    // oracle cannot drift (SimilaritySpec pins this).
    s"""WITH sims AS (
       |  SELECT vec_id AS id, embedding,
       |    [${(0 until 8).map(simExpr).mkString(",\n")}] AS arr
       |  FROM embeddings),
       |a AS (
       |  SELECT id, embedding,
       |    CAST(list_position(arr, list_max(arr)) - 1 AS INT) AS cluster
       |  FROM sims),
       |cool AS (
       |  SELECT id, embedding, cluster FROM a
       |  QUALIFY count(*) OVER (PARTITION BY cluster)
    <= ${graft.similarity.KNN.DefaultMaxCluster}),
       |dup AS (
       |  SELECT DISTINCT b.id AS id
       |  FROM cool x JOIN cool b ON x.cluster = b.cluster AND x.id < b.id
       |  WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])) >= 0.35)
       |SELECT a.id, a.cluster, (dup.id IS NULL) AS keep
       |FROM a LEFT JOIN dup ON a.id = dup.id
       |ORDER BY a.id""".stripMargin
  }

  private val embedOutlierOracle: String = {
    def centList(c: Int) = outlierCentroids(c).map(_.toString).mkString("[", ", ", "]")
    def simExpr(c: Int) =
      s"""(CASE WHEN list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]) = 0
         |      THEN 0.0 ELSE
         |  list_sum([CAST(p[1] AS DOUBLE) * p[2] FOR p IN list_zip(embedding, ${centList(c)})])
         |  / (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]))
         |     * sqrt(list_sum([CAST(y AS DOUBLE) * y FOR y IN ${centList(c)}]))) END)""".stripMargin
    s"""WITH sims AS (
       |  SELECT vec_id AS id,
       |    [${(0 until 4).map(simExpr).mkString(",\n")}] AS arr
       |  FROM embeddings)
       |SELECT id,
       |  CAST(list_position(arr, list_max(arr)) - 1 AS INT) AS cluster,
       |  round(list_max(arr), 6) AS centroid_sim,
       |  round(list_max(arr), 6) < 0.05 AS is_outlier
       |FROM sims ORDER BY id""".stripMargin
  }

  private val knnLshOracle: String = {
    val planes = graft.functions.VectorFunctions.hyperplanes(dim = 64, nBits = 4, seed = 42L)
    def planeList(b: Int) = planes(b).map(_.toString).mkString("[", ", ", "]")
    val cellExpr = (0 until 4).map(b =>
      s"CASE WHEN list_dot_product(embedding, ${planeList(b)}) > 0 THEN ${1 << b} ELSE 0 END")
      .mkString("\n      + ")
    s"""WITH cells AS (
       |  SELECT vec_id, embedding,
       |    $cellExpr AS cell
       |  FROM embeddings),
       |pcells AS (
       |  SELECT pid, pe, unnest([pcell, xor(pcell, 1), xor(pcell, 2), xor(pcell, 4), xor(pcell, 8)]) AS cell
       |  FROM (SELECT vec_id AS pid, embedding AS pe, cell AS pcell FROM cells WHERE vec_id <= 10)),
       |scored AS (
       |  SELECT pid AS probe_id, c.vec_id AS neighbor_id,
       |         list_cosine_similarity(c.embedding, pe) AS sim
       |  FROM cells c JOIN pcells p ON c.cell = p.cell AND c.vec_id != p.pid),
       |ranked AS (
       |  SELECT probe_id, neighbor_id,
       |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
       |ORDER BY probe_id, rank""".stripMargin
  }

  override val oracles: Map[String, String] = Map(
    "q_lang_id" -> langIdOracle,
    "q_knn_lsh" -> knnLshOracle,
    "q_embed_outlier" -> embedOutlierOracle,
    "q_embed_dedup_pairs" -> embedDedupPairsOracle,
    "q_weighted_sample" ->
      """SELECT o_orderkey, total FROM (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS total,
        |    pow((CAST(concat('0x', substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)),
        |        1, 8)) AS UBIGINT) + 0.5) / 4294967296.0,
        |      1.0 / o_totalprice) AS k
        |  FROM orders WHERE o_totalprice > 0
        |  ORDER BY k DESC, o_orderkey LIMIT 100)
        |ORDER BY o_orderkey""".stripMargin,
    "q_dedup_best" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |ranked AS (
        |  SELECT md5(coalesce(text, '')) AS content_hash, doc_id,
        |    (doc_id * 37) % 101 AS s,
        |    row_number() OVER (PARTITION BY md5(coalesce(text, ''))
        |      ORDER BY (doc_id * 37) % 101 DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY md5(coalesce(text, ''))) AS n_copies
        |  FROM corpus)
        |SELECT content_hash, doc_id AS keeper, CAST(s AS BIGINT) AS keeper_score,
        |  CAST(n_copies AS BIGINT) AS n_copies
        |FROM ranked WHERE rn = 1 ORDER BY content_hash""".stripMargin,
    "q_dedup_exact" ->
      """SELECT count(*) AS n_unique, CAST(sum(n_copies) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
        |  min(keeper) AS first_keeper
        |FROM (SELECT md5(coalesce(text, '')) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |      FROM documents GROUP BY md5(coalesce(text, '')))""".stripMargin,
    "q_embed_norm" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding])), 6) AS l2_norm
        |FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id""".stripMargin,
    "q_random_projection" ->
      """SELECT vec_id, CAST(t.j AS BIGINT) AS j,
        |  round(list_sum(list_transform(range(64), i ->
        |     CAST(embedding[i + 1] AS DOUBLE) *
        |     (CASE WHEN CAST(concat('0x', substr(md5(
        |         'rp:jl:' || CAST(i AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)),
        |         1, 8)) AS UBIGINT) % 2 = 0
        |       THEN 0.25 ELSE -0.25 END))), 6) AS coord
        |FROM embeddings CROSS JOIN range(16) AS t(j)
        |ORDER BY vec_id, j""".stripMargin,
    "q_embed_algebra" ->
      """SELECT a.vec_id AS vec_id,
        |  round(sqrt(list_sum([
        |    (2.0 * CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE))
        |      * (2.0 * CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE))
        |    FOR p IN list_zip(a.embedding, b.embedding)])), 6) AS axpy_norm,
        |  round(list_sum([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
        |    FOR p IN list_zip(a.embedding, b.embedding)]), 6) AS dot_xy
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id <= 101 AND b.vec_id <= 101 ORDER BY a.vec_id""".stripMargin,
    "q_pipeline_curate" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    len(string_split(trim(text), ' ')) AS n_tokens,
        |    len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |      / greatest(len(text), 1) AS alpha_ratio
        |  FROM documents),
        |q AS (SELECT * FROM scored WHERE n_tokens >= 10 AND alpha_ratio >= 0.5),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(coalesce(text, ''))),
        |kept AS (SELECT q.* FROM q JOIN keepers USING (doc_id))
        |SELECT count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(list_sum([CAST(ceil(len(x) / 4.0) AS BIGINT)
        |                     FOR x IN string_split(trim(text), ' ')])) AS BIGINT) AS total_bpe
        |FROM kept""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  len(string_split(trim(text), ' ')) AS n_tokens,
        |  round(len(list_distinct(string_split(trim(text), ' ')))::DOUBLE
        |        / greatest(len(string_split(trim(text), ' ')), 1), 6) AS distinct_ratio,
        |  round(list_sum([len(x)::DOUBLE FOR x IN string_split(trim(text), ' ')])
        |        / greatest(len(string_split(trim(text), ' ')), 1), 6) AS mean_tok_len,
        |  round(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |        / greatest(len(text), 1), 6) AS alpha_ratio
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin,
    "q_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len([x FOR x IN regexp_split_to_array(trim(coalesce(text, '')), '\s+')
        |              IF len(x) > 0]) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')), 1)
        |         AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+'))
        |         AS BIGINT) AS n_syll0
        |  FROM documents WHERE doc_id <= 300),
        |k AS (SELECT doc_id, n_words, n_sentences,
        |        greatest(n_syll0, n_words) AS n_syllables FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words = 0 THEN NULL ELSE
        |    round(206.835 - (1.015 * n_words) / n_sentences
        |                  - (84.6 * n_syllables) / n_words, 4) END AS flesch,
        |  CASE WHEN n_words = 0 THEN NULL ELSE
        |    round((0.39 * n_words) / n_sentences
        |          + (11.8 * n_syllables) / n_words - 15.59, 4) END AS fk_grade
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_gopher_quality" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || '- bullet item ' || CAST(doc_id AS VARCHAR)
        |      || chr(10) || 'plain closing line'
        |      || CASE WHEN doc_id % 3 = 0 THEN '...' ELSE '' END AS t
        |  FROM documents WHERE doc_id <= 150),
        |w AS (
        |  SELECT doc_id, t,
        |    list_filter(regexp_split_to_array(trim(t), '\s+'), x -> len(x) > 0) AS words,
        |    list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
        |                l -> len(l) > 0) AS lines
        |  FROM d),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS DOUBLE) AS nw,
        |    CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
        |      / greatest(CAST(len(words) AS DOUBLE), 1.0) AS mean_len,
        |    (CAST(len(t) - len(replace(t, '#', '')) AS DOUBLE)
        |     + CAST((len(t) - len(replace(t, '...', ''))) // 3 AS DOUBLE)
        |     + CAST(len(t) - len(replace(t, '…', '')) AS DOUBLE))
        |      / greatest(CAST(len(words) AS DOUBLE), 1.0) AS sym_r,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '•')
        |      OR starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE)
        |      / greatest(CAST(len(lines) AS DOUBLE), 1.0) AS bul_r,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...')
        |      OR ends_with(l, '…'))) AS DOUBLE)
        |      / greatest(CAST(len(lines) AS DOUBLE), 1.0) AS ell_r,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |      / greatest(CAST(len(words) AS DOUBLE), 1.0) AS alp_r,
        |    len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS hits
        |  FROM w)
        |SELECT doc_id,
        |  CAST(nw AS BIGINT) AS n_words,
        |  round(mean_len, 6) AS mean_word_len,
        |  round(sym_r, 6) AS symbol_ratio,
        |  round(bul_r, 6) AS bullet_ratio,
        |  round(ell_r, 6) AS ellipsis_ratio,
        |  round(alp_r, 6) AS alpha_ratio,
        |  CAST(hits AS BIGINT) AS stop_hits,
        |  CAST(nw >= 50 AND nw <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
        |    AND sym_r < 0.1 AND bul_r <= 0.9 AND ell_r <= 0.3 AND alp_r >= 0.8
        |    AND hits >= 2 AS INT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(trim(text), ' ')) AS n_ws_tokens,
        |  CAST(list_sum([CAST(ceil(len(x) / 4.0) AS BIGINT) FOR x IN string_split(trim(text), ' ')]) AS BIGINT) AS n_bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sentences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || '. Extra one for doc ' || CAST(doc_id AS VARCHAR)
        |      || '! And a question? Trailing tail' AS t
        |  FROM documents WHERE doc_id <= 200),
        |sl AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_extract_all(t, '[^.!?]+[.!?]*'),
        |      s -> trim(s)), s -> s <> '') AS ss
        |  FROM d)
        |SELECT doc_id, CAST(unnest(range(0, len(ss))) AS INT) AS idx, unnest(ss) AS sentence
        |FROM sl ORDER BY doc_id, idx""".stripMargin,
    // chunk starts are 1 + k*step, so chunk_idx = (start-1)/step
    // reproduces posexplode's 0-based index exactly.
    "q_chunk_chars" ->
      """WITH t AS (SELECT doc_id, coalesce(text, '') AS txt FROM documents WHERE doc_id <= 200),
        |st AS (SELECT doc_id, txt, unnest(range(1, greatest(len(txt), 1) + 1, 48)) AS s FROM t)
        |SELECT doc_id, CAST((s - 1) // 48 AS INT) AS chunk_idx, substr(txt, s, 64) AS chunk
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_chunk_words" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks
        |  FROM documents WHERE doc_id <= 200),
        |st AS (SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1) + 1, 32)) AS s FROM t)
        |SELECT doc_id, CAST((s - 1) // 32 AS INT) AS chunk_idx,
        |  array_to_string(toks[s:s + 39], ' ') AS chunk
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_fingerprint" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) AS n_distinct_fp
        |FROM documents""".stripMargin,
    // decontamination on shingle strings (hash-independent fact).
    "q_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 3, 1) + 1),
        |         i -> array_to_string(t[i:i+3], ' '))) AS s
        |  FROM tok)
        |SELECT DISTINCT doc_id FROM sh
        |WHERE doc_id % 37 <> 0
        |  AND s IN (SELECT s FROM sh WHERE doc_id % 37 = 0)
        |ORDER BY doc_id""".stripMargin,
    "q_lm_score" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT id, term FROM terms WHERE len(term) > 0),
        |vocab AS (SELECT term, count(*) AS n FROM t2 GROUP BY term),
        |c AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |scored AS (
        |  SELECT id, count(*) AS n_tokens,
        |    round(-avg(ln((n + 1.0) / (t + 1.0 * (v + 1)))), 6) AS avg_nll
        |  FROM t2 JOIN vocab USING (term) CROSS JOIN c GROUP BY id)
        |SELECT d.doc_id AS id, coalesce(s.n_tokens, 0) AS n_tokens, s.avg_nll
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.id
        |WHERE d.doc_id <= 300 ORDER BY id""".stripMargin,
    "q_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT id, term FROM terms WHERE len(term) > 0),
        |tf AS (SELECT id, term, count(*) AS tf FROM t2 GROUP BY id, term),
        |dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.id, tf.term, tf.tf, dfreq.doc_freq,
        |  round(tf.tf * (ln((n.n + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |WHERE tf.id <= 30 ORDER BY id, term""".stripMargin,
    "q_chat_render" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(coalesce(text, ''), 1, 40) AS t1,
        |    substr(coalesce(text, ''), 41, 60) AS a1,
        |    'summary of doc ' || CAST(doc_id AS VARCHAR) AS a2
        |  FROM documents WHERE doc_id <= 200),
        |r AS (
        |  SELECT doc_id, t1, a1, a2,
        |    '<|user|>' || chr(10) || t1 || chr(10)
        |      || '<|assistant|>' || chr(10) || a1 || chr(10)
        |      || '<|user|>' || chr(10) || 'continue' || chr(10)
        |      || '<|assistant|>' || chr(10) || a2 || chr(10) AS rendered,
        |    9 + len(t1) + 1 + 14 AS lo0
        |  FROM d),
        |s AS (
        |  SELECT doc_id, rendered, lo0, lo0 + len(a1) AS hi0,
        |    lo0 + len(a1) + 1 + 9 + 8 + 1 + 14 AS lo1,
        |    lo0 + len(a1) + 1 + 9 + 8 + 1 + 14 + len(a2) AS hi1
        |  FROM r)
        |SELECT doc_id, CAST(turn AS INT) AS turn,
        |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
        |  CAST(len(rendered) AS BIGINT) AS text_len,
        |  substr(rendered, CAST(lo AS INT) + 1, CAST(hi - lo AS INT)) AS masked
        |FROM (
        |  SELECT doc_id, rendered, 0 AS turn, lo0 AS lo, hi0 AS hi FROM s
        |  UNION ALL
        |  SELECT doc_id, rendered, 1 AS turn, lo1 AS lo, hi1 AS hi FROM s)
        |ORDER BY doc_id, turn""".stripMargin,
    "q_lm_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'),
        |                w -> len(w) > 0) AS t
        |  FROM documents),
        |tr2 AS (
        |  SELECT id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |uni AS (SELECT id, unnest(t) AS term FROM toks),
        |vocab AS (SELECT term, count(*) AS n FROM uni GROUP BY term),
        |c AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |bi AS (SELECT w1, w2, count(*) AS nb FROM tr2 GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS nc FROM tr2 GROUP BY 1),
        |scored AS (
        |  SELECT id, count(*) AS n_transitions,
        |    round(-avg(ln(0.7 * ((nb + 1.0) / (nc + 1.0 * (c.v + 1)))
        |      + (1.0 - 0.7) * ((vocab.n + 1.0) / (c.t + 1.0 * (c.v + 1))))), 6) AS avg_nll
        |  FROM tr2 JOIN bi USING (w1, w2) JOIN ctx USING (w1)
        |  JOIN vocab ON tr2.w2 = vocab.term CROSS JOIN c
        |  GROUP BY id)
        |SELECT d.doc_id AS id,
        |  CAST(coalesce(s.n_transitions, 0) AS BIGINT) AS n_transitions, s.avg_nll
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.id
        |WHERE d.doc_id <= 300 ORDER BY id""".stripMargin,
    "q_ccnet_buckets" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT id, term FROM terms WHERE len(term) > 0),
        |vocab AS (SELECT term, count(*) AS n FROM t2 GROUP BY term),
        |c AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |scored AS (
        |  SELECT id, round(-avg(ln((n + 1.0) / (t + 1.0 * (v + 1)))), 6) AS avg_nll
        |  FROM t2 JOIN vocab USING (term) CROSS JOIN c GROUP BY id),
        |alldocs AS (
        |  SELECT d.doc_id AS id, s.avg_nll
        |  FROM documents d LEFT JOIN scored s ON d.doc_id = s.id),
        |th AS (SELECT quantile_cont(avg_nll, 1.0/3) AS t1,
        |              quantile_cont(avg_nll, 2.0/3) AS t2
        |       FROM alldocs WHERE avg_nll IS NOT NULL),
        |b AS (
        |  SELECT id, avg_nll,
        |    CASE WHEN avg_nll IS NULL THEN NULL
        |         WHEN avg_nll <= th.t1 THEN 'head'
        |         WHEN avg_nll <= th.t2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM alldocs CROSS JOIN th)
        |SELECT bucket, count(*) AS n_docs,
        |  round(min(avg_nll), 6) AS min_nll, round(max(avg_nll), 6) AS max_nll
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+'))
        |         AS BIGINT) AS n_toks,
        |    -(CAST(n_chars AS BIGINT) * 10000000 + doc_id) AS prio
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_chars, n_toks,
        |    sum(n_toks) OVER (ORDER BY prio
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT doc_id, n_chars, n_toks FROM c WHERE cum <= 20000
        |ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      (s"""WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
        |                w -> len(w) > 0) AS t
        |  FROM documents WHERE doc_id <= 300),
        |terms AS (
        |  SELECT id, unnest(t || CASE WHEN len(t) >= 2
        |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS term
        |  FROM toks),
        |feats AS (
        |  SELECT id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 1024
        |         AS BIGINT) AS bucket,
        |    count(*) AS cnt
        |  FROM terms GROUP BY id, bucket),
        |w AS (SELECT bucket, weight
        |      FROM read_parquet('$qualityWeightsPath/*.parquet') WHERE bucket >= 0),
        |i AS (SELECT weight AS b0
        |      FROM read_parquet('$qualityWeightsPath/*.parquet') WHERE bucket = -1),
        |dots AS (
        |  SELECT f.id, sum(coalesce(w.weight, 0.0) * f.cnt) / sum(f.cnt) AS dot
        |  FROM feats f LEFT JOIN w USING (bucket) GROUP BY f.id)
        |SELECT d.doc_id AS id,
        |  round(1.0 / (1.0 + exp(-(i.b0 + coalesce(dots.dot, 0.0)))), 6) AS quality
        |FROM documents d LEFT JOIN dots ON d.doc_id = dots.id CROSS JOIN i
        |WHERE d.doc_id <= 300 ORDER BY id""").stripMargin,
    "q_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\s+'),
        |                w -> len(w) > 0) AS t
        |  FROM documents),
        |terms AS (
        |  SELECT id, unnest(t || CASE WHEN len(t) >= 2
        |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS term
        |  FROM toks),
        |feats AS (
        |  SELECT id,
        |    CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS UBIGINT) % 1024
        |         AS BIGINT) AS bucket,
        |    count(*) AS cnt
        |  FROM terms GROUP BY id, bucket),
        |rawn AS (SELECT bucket, sum(cnt) AS n FROM feats GROUP BY bucket),
        |rawt AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS tot FROM rawn),
        |tfeats AS (SELECT f.* FROM feats f JOIN documents d ON f.id = d.doc_id
        |           WHERE d.lang = 'en'),
        |tn AS (SELECT bucket, sum(cnt) AS n FROM tfeats GROUP BY bucket),
        |tt AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS tot FROM tn),
        |allb AS (SELECT range AS bucket FROM range(1024)),
        |ratio AS (
        |  SELECT allb.bucket,
        |    ln((coalesce(tn.n, 0) + 1.0) / (tt.tot + 1024.0))
        |      - ln((coalesce(rawn.n, 0) + 1.0) / (rawt.tot + 1024.0)) AS lr
        |  FROM allb LEFT JOIN tn USING (bucket) LEFT JOIN rawn USING (bucket)
        |  CROSS JOIN tt CROSS JOIN rawt),
        |w AS (
        |  SELECT f.id, sum(f.cnt) AS n_feats, sum(f.cnt * r.lr) AS logw
        |  FROM feats f JOIN ratio r USING (bucket) GROUP BY f.id)
        |SELECT d.doc_id AS id, CAST(coalesce(w.n_feats, 0) AS BIGINT) AS n_feats,
        |  round(coalesce(w.logw, 0.0), 6) AS logw
        |FROM documents d LEFT JOIN w ON d.doc_id = w.id
        |WHERE d.doc_id <= 300 ORDER BY id""".stripMargin,
    "q_tfidf_top" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT id, term FROM terms WHERE len(term) > 0),
        |tf AS (SELECT id, term, count(*) AS tf FROM t2 GROUP BY id, term),
        |dfreq AS (
        |  SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
        |  HAVING count(*) >= 2),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.id, tf.term, tf.tf, dfreq.doc_freq,
        |    tf.tf * (ln((n.n + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0) AS tfidf
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
        |ranked AS (
        |  SELECT id, term, tf, doc_freq, tfidf,
        |    CAST(row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term)
        |      AS INT) AS rank
        |  FROM scored)
        |SELECT id, term, tf, doc_freq, rank, round(tfidf, 6) AS tfidf
        |FROM ranked WHERE rank <= 5 AND id <= 50
        |ORDER BY id, rank""".stripMargin,
    "q_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT id, term FROM terms WHERE len(term) > 0),
        |tf AS (SELECT id, term, count(*) AS tf FROM t2 GROUP BY id, term),
        |dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY id),
        |ad AS (SELECT avg(dl) AS avgdl FROM dl),
        |dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.id, tf.term, tf.tf, dfreq.doc_freq, dl.dl,
        |  round(ln(1.0 + (n.n - dfreq.doc_freq + 0.5) / (dfreq.doc_freq + 0.5))
        |    * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / ad.avgdl)), 6)
        |    AS bm25
        |FROM tf JOIN dfreq USING (term) JOIN dl USING (id)
        |CROSS JOIN ad CROSS JOIN n
        |WHERE tf.id <= 30 ORDER BY id, term""".stripMargin,
    "q_quota_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS INT) AS rank
        |  FROM h)
        |SELECT doc_id, source, rank FROM r WHERE rank <= 20
        |ORDER BY source, rank""".stripMargin,
    "q_domain_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY source),
        |w AS (SELECT source, c, sqrt(c / (SELECT sum(c) FROM c)) AS w FROM c),
        |q AS (SELECT source, c, w / (SELECT sum(w) FROM w) AS q FROM w),
        |r AS (SELECT source, least(1.0, q * 300 / c) AS rate_x, q * 300 / c AS epochs_x FROM q)
        |SELECT d.doc_id, d.source, round(r.rate_x, 6) AS rate, round(r.epochs_x, 6) AS epochs
        |FROM documents d JOIN r USING (source)
        |WHERE CAST(concat('0x', substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT) * 1000000
        |      < CAST(floor(r.rate_x * 1000000) AS UBIGINT) * 4294967296
        |ORDER BY d.doc_id""".stripMargin,
    "q_lm_artifact" ->
      """WITH tr AS (
        |  SELECT unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM documents WHERE doc_id % 2 = 0),
        |vocab AS (SELECT term, count(*) AS n FROM tr WHERE len(term) > 0 GROUP BY term),
        |c AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |probe AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1 AND doc_id <= 301),
        |pt AS (
        |  SELECT doc_id AS id,
        |    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS term
        |  FROM probe),
        |pt2 AS (SELECT id, term FROM pt WHERE len(term) > 0),
        |scored AS (
        |  SELECT id, count(*) AS n_tokens,
        |    round(-avg(ln((coalesce(n, 0) + 1.0) / (t + 1.0 * (v + 1)))), 6) AS avg_nll
        |  FROM pt2 LEFT JOIN vocab USING (term) CROSS JOIN c GROUP BY id)
        |SELECT p.doc_id AS id, coalesce(s.n_tokens, 0) AS n_tokens, s.avg_nll
        |FROM probe p LEFT JOIN scored s ON p.doc_id = s.id
        |ORDER BY id""".stripMargin,
    "q_mask_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS tk
        |  FROM documents WHERE doc_id <= 200),
        |m AS (
        |  SELECT doc_id, tk,
        |    [CAST(concat('0x', substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':'
        |                                  || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)
        |       * 1000000 < 150000 * 4294967296
        |     FOR i IN range(1, len(tk) + 1)] AS msk
        |  FROM t),
        |r AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(
        |      [CASE WHEN NOT msk[i] THEN tk[i]
        |            WHEN i = 1 OR NOT msk[i - 1] THEN '<mask>'
        |            ELSE '' END FOR i IN range(1, len(tk) + 1)],
        |      p -> p != ''), ' ') AS masked_text,
        |    list_filter([CASE WHEN msk[i] THEN tk[i] ELSE '' END
        |                 FOR i IN range(1, len(tk) + 1)], p -> p != '') AS tgt
        |  FROM m)
        |SELECT doc_id, masked_text,
        |  coalesce(array_to_string(tgt, ' '), '') AS targets_str,
        |  CAST(len(tgt) AS BIGINT) AS n_masked
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_fim" ->
      """WITH t AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    CAST(concat('0x', substr(md5('fim:pick:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS hp,
        |    CAST(concat('0x', substr(md5('fim:cutA:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS ha,
        |    CAST(concat('0x', substr(md5('fim:cutB:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS hb
        |  FROM documents WHERE doc_id <= 400),
        |c AS (
        |  SELECT doc_id, text, hp * 1000000 < 500000 * 4294967296 AS fim,
        |    length(text) AS len,
        |    ha % (length(text) + 1) AS ca, hb % (length(text) + 1) AS cb
        |  FROM t),
        |d AS (SELECT doc_id, text, fim, len,
        |        least(ca, cb) AS lo, greatest(ca, cb) AS hi FROM c)
        |SELECT doc_id, fim,
        |  CASE WHEN fim THEN
        |    '<|fim_pre|>' || substr(text, 1, CAST(lo AS INT))
        |      || '<|fim_suf|>' || substr(text, CAST(hi + 1 AS INT), CAST(len - hi AS INT))
        |      || '<|fim_mid|>' || substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))
        |  ELSE text END AS fim_text
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5('ep0:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS UBIGINT) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS ord
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_split_assign" -> {
      val t = graft.operators.Splits.thresholds(
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8))
         |         AS UBIGINT) AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN h < ${t(0)} THEN 'train'
         |       WHEN h < ${t(1)} THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "q_bpe_roundtrip" ->
      """SELECT doc_id AS id,
        |  CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS n_words,
        |  true AS detok_ok
        |FROM documents ORDER BY id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER
        |      (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_offset
        |  FROM t)
        |SELECT id, n_tokens, start_offset,
        |  start_offset // 256 AS first_seq,
        |  (start_offset + n_tokens - 1) // 256 AS last_seq,
        |  (start_offset + n_tokens - 1) // 256 - start_offset // 256 + 1 AS n_seqs
        |FROM o ORDER BY id""".stripMargin,
    "q_pack_export" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks
        |  FROM documents),
        |o AS (
        |  SELECT id, toks,
        |    CAST(coalesce(sum(len(toks)) OVER
        |      (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS off
        |  FROM t),
        |tok AS (
        |  SELECT id, off + unnest(range(0, len(toks))) AS pos, unnest(toks) AS tk
        |  FROM o)
        |SELECT pos // 512 AS seq_id, count(*) AS n_tokens,
        |  array_to_string(list(tk ORDER BY pos), ' ') AS text
        |FROM tok GROUP BY 1 ORDER BY seq_id""".stripMargin,
    "q_substr_dup" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(range(0, len(t) - 8 + 1)) AS pos, t
        |  FROM tok WHERE len(t) >= 8),
        |g2 AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 8], ' ') AS s FROM grams),
        |dup AS (SELECT s FROM g2 GROUP BY s HAVING count(*) > 1),
        |dpos AS (SELECT doc_id, pos FROM g2 JOIN dup USING (s)),
        |cov AS (
        |  SELECT doc_id, count(DISTINCT pos) AS n_dup_grams,
        |         count(DISTINCT idx) AS covered_tokens
        |  FROM (SELECT doc_id, pos, unnest(range(pos, pos + 8)) AS idx FROM dpos)
        |  GROUP BY doc_id)
        |SELECT tok.doc_id AS id, len(tok.t) AS n_tokens,
        |  coalesce(cov.n_dup_grams, 0) AS n_dup_grams,
        |  coalesce(cov.covered_tokens, 0) AS covered_tokens,
        |  round(coalesce(cov.covered_tokens, 0)::DOUBLE / greatest(len(tok.t), 1), 6) AS dup_fraction
        |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id
        |ORDER BY id""".stripMargin,
    "q_bin_pack" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS n,
        |    CAST(CAST(concat('0x', substr(md5('binpack:' || CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS UBIGINT) % 16 AS BIGINT) AS salt
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n, salt,
        |    row_number() OVER (PARTITION BY n, salt ORDER BY doc_id) AS rk,
        |    192 // n AS pb
        |  FROM tok)
        |SELECT doc_id AS id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(n AS BIGINT) AS bin_len,
        |  CAST(CASE WHEN n > 192 THEN -1
        |       ELSE ((rk - 1) // pb) * 16 + salt END AS BIGINT) AS bin_seq,
        |  CASE WHEN n > 192 THEN 0.0 ELSE round(pb * n / 192.0, 6) END AS fill_frac
        |FROM r ORDER BY id""".stripMargin,
    "q_substr_remove" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(range(0, len(t) - 8 + 1)) AS pos, t
        |  FROM tok WHERE len(t) >= 8),
        |g2 AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 8], ' ') AS s FROM grams),
        |dup AS (SELECT s FROM g2 GROUP BY s HAVING count(*) > 1),
        |ranked AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn
        |  FROM g2 JOIN dup USING (s)),
        |cover AS (SELECT DISTINCT doc_id, idx FROM (
        |  SELECT doc_id, unnest(range(pos, pos + 8)) AS idx
        |  FROM ranked WHERE rn > 1)),
        |tokix AS (SELECT doc_id, unnest(range(0, len(t))) AS idx, t FROM tok),
        |kept AS (
        |  SELECT k.doc_id, k.idx, k.t[k.idx + 1] AS tokv
        |  FROM tokix k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.idx = c.idx
        |  WHERE c.doc_id IS NULL),
        |outq AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tokv, ' ' ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT tok.doc_id AS id, len(tok.t) AS n_tokens,
        |  CAST(len(tok.t) - coalesce(outq.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(outq.clean_text, '') AS clean_text
        |FROM tok LEFT JOIN outq ON tok.doc_id = outq.doc_id
        |ORDER BY id""".stripMargin,
    "q_decontam_spans" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents WHERE doc_id % 37 <> 0),
        |btok AS (
        |  SELECT regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents WHERE doc_id % 37 = 0),
        |bg AS (SELECT DISTINCT s FROM (
        |  SELECT array_to_string(t[pos + 1:pos + 4], chr(2)) AS s
        |  FROM (SELECT unnest(range(0, len(t) - 4 + 1)) AS pos, t
        |        FROM btok WHERE len(t) >= 4))),
        |g2 AS (
        |  SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 4], chr(2)) AS s
        |  FROM (SELECT doc_id, unnest(range(0, len(t) - 4 + 1)) AS pos, t
        |        FROM tok WHERE len(t) >= 4)),
        |hits AS (SELECT doc_id, pos FROM g2 JOIN bg USING (s)),
        |cover AS (SELECT DISTINCT doc_id, idx FROM (
        |  SELECT doc_id, unnest(range(pos, pos + 4)) AS idx FROM hits)),
        |tokix AS (SELECT doc_id, unnest(range(0, len(t))) AS idx, t FROM tok),
        |kept AS (
        |  SELECT k.doc_id, k.idx, k.t[k.idx + 1] AS tokv
        |  FROM tokix k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.idx = c.idx
        |  WHERE c.doc_id IS NULL),
        |outq AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tokv, ' ' ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT tok.doc_id AS id, len(tok.t) AS n_tokens,
        |  CAST(len(tok.t) - coalesce(outq.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(outq.clean_text, '') AS clean_text
        |FROM tok LEFT JOIN outq ON tok.doc_id = outq.doc_id
        |ORDER BY id""".stripMargin,
    "q_sentence_dedup" ->
      """WITH sents AS (
        |  SELECT doc_id, string_split(regexp_replace(coalesce(text, ''),
        |    '([.!?]) ', '\1' || chr(1), 'g'), chr(1)) AS t
        |  FROM (SELECT doc_id,
        |    regexp_replace(text, ' (table|value) ', '. ', 'g') AS text
        |    FROM documents)),
        |grams AS (
        |  SELECT doc_id, unnest(range(0, len(t) - 3 + 1)) AS pos, t
        |  FROM sents WHERE len(t) >= 3),
        |g2 AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 3], chr(2)) AS s FROM grams),
        |dup AS (SELECT s FROM g2 GROUP BY s HAVING count(*) > 1),
        |ranked AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn
        |  FROM g2 JOIN dup USING (s)),
        |cover AS (SELECT DISTINCT doc_id, idx FROM (
        |  SELECT doc_id, unnest(range(pos, pos + 3)) AS idx
        |  FROM ranked WHERE rn > 1)),
        |sentix AS (SELECT doc_id, unnest(range(0, len(t))) AS idx, t FROM sents),
        |kept AS (
        |  SELECT k.doc_id, k.idx, k.t[k.idx + 1] AS sv
        |  FROM sentix k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.idx = c.idx
        |  WHERE c.doc_id IS NULL),
        |outq AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(sv, ' ' ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT sents.doc_id AS id, len(sents.t) AS n_sentences,
        |  CAST(len(sents.t) - coalesce(outq.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(outq.clean_text, '') AS clean_text
        |FROM sents LEFT JOIN outq ON sents.doc_id = outq.doc_id
        |ORDER BY id""".stripMargin,
    "q_collocations" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |tp AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM tok),
        |tr AS (SELECT doc_id, pos, t[pos + 1] AS tok FROM tp WHERE len(t[pos + 1]) > 0),
        |pairs AS (
        |  SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_pairs
        |  FROM tr a JOIN tr b
        |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3
        |  GROUP BY 1, 2),
        |c1 AS (SELECT t1, sum(n_pairs) AS c1 FROM pairs GROUP BY 1),
        |c2 AS (SELECT t2, sum(n_pairs) AS c2 FROM pairs GROUP BY 1),
        |tot AS (SELECT sum(n_pairs) AS n FROM pairs)
        |SELECT p.t1, p.t2, p.n_pairs,
        |  round(ln(CAST(p.n_pairs AS DOUBLE) * CAST(n AS DOUBLE) /
        |    (CAST(c1.c1 AS DOUBLE) * CAST(c2.c2 AS DOUBLE))), 6) AS pmi
        |FROM pairs p JOIN c1 USING (t1) JOIN c2 USING (t2) CROSS JOIN tot
        |WHERE p.n_pairs >= 50
        |ORDER BY t1, t2""".stripMargin,
    "q_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
        |         i -> array_to_string(t[i:i+1], ' '))) AS s
        |  FROM tok),
        |c AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, count(*) AS distinct_grams,
        |  round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 6) AS dup_gram_frac,
        |  round(max(c)::DOUBLE / sum(c), 6) AS top_gram_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Jaccard is a ratio of set cardinalities — hash-independent — so
    // DuckDB reproduces it exactly from string shingle sets even
    // though Spark works on shingle hashes.
    "q_ngram_jaccard" ->
      """WITH sampled AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM sampled WHERE rk <= 1000),
        |sh AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])
        |    END AS s
        |  FROM toks)
        |SELECT a.source AS block, a.doc_id AS id_a, b.doc_id AS id_b,
        |  CASE WHEN len(list_distinct(a.s || b.s)) = 0 THEN 0.0
        |       ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) END AS jaccard
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |ORDER BY jaccard DESC, id_a, id_b
        |LIMIT 25""".stripMargin,
    "q_containment" ->
      """WITH sampled AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
        |  FROM sampled WHERE rk <= 1000),
        |sh AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |         ELSE list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])
        |    END AS s
        |  FROM toks)
        |SELECT a.source AS block, a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / greatest(len(a.s), 1) AS containment_a,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / greatest(len(b.s), 1) AS containment_b
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |ORDER BY containment_a DESC, id_a, id_b
        |LIMIT 25""".stripMargin,
    "q_knn_brute" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_semantic_dedup" -> semanticDedupOracle,
    "q_bpe_merges" -> bpeMergesOracle,
    // r12: the MinHash/SimHash family, formerly rows-only ("xxhash64
    // values are engine-specific") — DuckDB has exact unsigned 64-bit
    // arithmetic, so the oracle now RECOMPUTES Spark's xxhash64
    // bit-for-bit (XxhashOracle) and replays the full signature ->
    // band -> bucket -> cluster pipeline in SQL.
    "q_dedup_minhash" -> XxhashOracle.minhashClusters(),
    "q_dedup_transitive" -> XxhashOracle.transitiveClusters(maxIters = 3),
    "q_dedup_simhash" -> XxhashOracle.simhashClusters(),
    "q_dedup_incremental" -> XxhashOracle.newVsIndex(),
    "q_knn_ivf" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_knn_ivfpq" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_knn_pq" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_knn_annoy" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_knn_voyager" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 10),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS neighbor_id,
        |         list_distance(embedding, pe) AS dist
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dist ASC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_embed_dedup" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id <= 50),
        |scored AS (
        |  SELECT pid AS probe_id, vec_id AS nn_id,
        |         list_cosine_similarity(embedding, pe) AS sim
        |  FROM embeddings, probes WHERE vec_id != pid),
        |ranked AS (
        |  SELECT probe_id, nn_id, sim,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, nn_id) AS rn
        |  FROM scored)
        |SELECT probe_id, nn_id, sim >= 0.9 AS is_dup FROM ranked WHERE rn = 1
        |ORDER BY probe_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(16 + octet_length(encode(text)) % 1920 AS INT) AS width,
        |  CAST(16 + (octet_length(encode(text)) * 7) % 1080 AS INT) AS height,
        |  CAST(1 + octet_length(encode(text)) % 32 AS INT) AS n_frames
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin,
    // real-codec round trips: the oracle recomputes the deterministic
    // synthetic-media formulas (Multimodal.synthWidth/Height/Gray);
    // the Spark side must pull the same numbers out of actual encoded
    // PNG headers and pixels.
    "q_multimodal_decode" ->
      """SELECT doc_id AS id, CAST(8 + doc_id % 64 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 48 AS INT) AS height, CAST(1 AS INT) AS n_frames
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(range(0, doc_id % 5 + 1, 2)) AS i
        |  FROM documents WHERE doc_id <= 50)
        |SELECT doc_id AS id, CAST(i AS INT) AS frame_idx,
        |  CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST((doc_id * 37 + i) % 256 AS INT) AS gray
        |FROM f ORDER BY id, frame_idx""".stripMargin,
    "q_multimodal_features" ->
      """SELECT doc_id AS id, CAST(4 AS INT) AS dim,
        |  CAST((doc_id * 37) % 256 AS INT) AS gray
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin,
    "q_multimodal_bulk" ->
      """SELECT count(*) AS n_decoded,
        |  CAST(sum(8 + doc_id % 64) AS BIGINT) AS sum_w,
        |  CAST(sum(8 + (doc_id * 3) % 48) AS BIGINT) AS sum_h,
        |  CAST(0 AS BIGINT) AS n_failed
        |FROM documents""".stripMargin,
    "q_multimodal_gif" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(range(0, doc_id % 4 + 1, 2)) AS i
        |  FROM documents WHERE doc_id <= 50)
        |SELECT doc_id AS id, CAST(i AS INT) AS frame_idx,
        |  CAST(10 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST((doc_id * 37 + i) % 256 AS INT) AS gray
        |FROM f ORDER BY id, frame_idx""".stripMargin,
    "q_audio_quality" ->
      """WITH p AS (
        |  SELECT doc_id AS id, 20000 + (doc_id % 3) * 8000 AS amp, 1 + doc_id % 7 AS k
        |  FROM documents WHERE doc_id <= 150),
        |s AS (
        |  SELECT id,
        |    greatest(-32768, least(32767, trunc(amp * sin(2*pi()*k*n.n/256)))) AS v
        |  FROM p, generate_series(0,255) n(n))
        |SELECT id, CAST(count(*) AS BIGINT) AS n_samples,
        |  round(CAST(count(*) FILTER (WHERE abs(v) >= 32767) AS DOUBLE) / count(*), 6)
        |    AS clip_frac,
        |  round(CAST(count(*) FILTER (WHERE abs(v) <= 3) AS DOUBLE) / count(*), 6)
        |    AS silence_frac,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS dc_offset,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM s GROUP BY id ORDER BY id""".stripMargin,
    "q_video_motion" ->
      """WITH f AS (
        |  SELECT doc_id AS id, unnest(range(0, doc_id % 5)) AS i
        |  FROM documents WHERE doc_id <= 200),
        |d AS (
        |  SELECT id, CAST(i AS INT) AS frame_idx,
        |    abs(CAST((id*37 + i + 1) % 256 AS INT)
        |        - CAST((id*37 + i) % 256 AS INT)) AS diff
        |  FROM f)
        |SELECT id, frame_idx, CAST(diff AS DOUBLE) AS mean_abs_diff,
        |  CAST(diff AS INT) AS max_abs_diff,
        |  CASE WHEN diff > 8 THEN 1.0 ELSE 0.0 END AS changed_frac
        |FROM d ORDER BY id, frame_idx""".stripMargin,
    "q_audio_spectrum" ->
      """WITH p AS (
        |  SELECT doc_id AS id, 1 + (doc_id*11) % 15 AS k, 8000 + (doc_id % 7)*1000 AS a
        |  FROM documents WHERE doc_id <= 100),
        |s AS (
        |  SELECT id, n.n AS n, trunc(a * sin(2*pi()*k*n.n/256)) AS v
        |  FROM p, generate_series(0,255) n(n)),
        |t AS (
        |  SELECT id, b.b AS bin,
        |    sum(v * cos(2*pi()*b.b*n/256)) AS re,
        |    sum(v * sin(2*pi()*b.b*n/256)) AS im
        |  FROM s, generate_series(0,15) b(b)
        |  GROUP BY id, b.b),
        |pw AS (
        |  SELECT id, bin,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY CASE WHEN bin = 0 THEN -1 ELSE re*re+im*im END DESC, bin) AS rn
        |  FROM t)
        |SELECT id, CAST(8000 AS INT) AS sample_rate, CAST(256 AS BIGINT) AS n_samples,
        |  CAST(bin AS INT) AS dom_bin
        |FROM pw WHERE rn = 1 ORDER BY id""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT doc_id AS id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(800 + (doc_id % 5) * 160 AS BIGINT) AS n_samples,
        |  CAST((doc_id * 37) % 16384 AS INT) AS peak,
        |  CAST((doc_id * 37) % 16384 AS INT) AS rms_i
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin
    // q_dedup_minhash / q_dedup_simhash: rows-only (xxhash64 cluster
    // values are engine-specific); semantics asserted in DedupSpec.
  )
}
