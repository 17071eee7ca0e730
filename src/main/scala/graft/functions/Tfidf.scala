package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextFunctions.tokens

/** TF-IDF term weighting over a document table — the retrieval/
  * quality-scoring primitive (idf follows the smoothed convention:
  * idf = ln((N+1)/(df+1)) + 1, never zero or negative, defined even
  * for terms in every doc).
  *
  * Scale shape: one narrow explode to (doc, term) rows; term
  * frequencies by (doc, term) with map-side partial counts (the only
  * full-width shuffle); document frequencies fold the SAME tf rows by
  * term (vocabulary-sized — millions of rows against a 100 TB corpus)
  * and join back by term, where AQE broadcasts the vocabulary side.
  * Corpus size N is one scalar `count()` to the driver (disclosed;
  * the same one-number probe ScaleUp's dim check uses).
  */
object Tfidf {

  /** One row per (doc, term): (id, term, tf, doc_freq, tfidf).
    * `minDocFreq` prunes hapax noise before the join-back.
    */
  def termDoc(df: DataFrame, idCol: String, textCol: String,
              minDocFreq: Long = 1L): DataFrame = {
    require(minDocFreq >= 1, s"minDocFreq must be >= 1, got $minDocFreq")
    val n = df.count() // corpus size: one scalar to the driver
    val terms = df
      .select(col(idCol).as("id"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf // tf rows are distinct (id, term): count by term IS doc freq
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
    tf.join(dfreq, Seq("term"))
      .withColumn("idf", log((lit(n.toDouble) + 1.0) / (col("doc_freq") + lit(1.0))) + 1.0)
      .withColumn("tfidf", col("tf") * col("idf"))
      .select(col("id"), col("term"), col("tf"), col("doc_freq"), col("idf"), col("tfidf"))
  }

  /** Okapi BM25 term weights — the ranking function behind keyword
    * retrieval over a corpus (Robertson et al.; the Lucene-style
    * non-negative idf variant: ln(1 + (N − df + 0.5)/(df + 0.5))).
    * One row per (doc, term): (id, term, tf, doc_freq, dl, bm25),
    * where dl is the doc's token count and the length normalization
    * uses the corpus mean avgdl.
    *
    * Scale shape: the same single (doc, term) shuffle as [[termDoc]];
    * per-doc lengths fold the SAME tf rows by id (corpus-sized but
    * narrow — two longs per doc) and join back by id; avgdl rides in
    * as a broadcast 1-row frame, never a driver scalar of the data.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75,
           minDocFreq: Long = 1L): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0 and b in [0,1], got k1=$k1 b=$b")
    require(minDocFreq >= 1, s"minDocFreq must be >= 1, got $minDocFreq")
    val n = df.count() // corpus size: one scalar to the driver
    val terms = df
      .select(col(idCol).as("id"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val avgdl = broadcast(dl.agg(avg(col("dl")).as("avgdl")))
    val dfreq = tf
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("doc_freq") + 0.5) / (col("doc_freq") + 0.5))
    tf.join(dfreq, Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(avgdl)
      .withColumn("bm25", idf * (col("tf") * (lit(k1) + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("id"), col("term"), col("tf"), col("doc_freq"), col("dl"), col("bm25"))
  }

  /** Top `k` terms per doc by tfidf (ties broken by term), the form a
    * keyword-extraction pass consumes; WindowGroupLimit prunes
    * per-partition before the rank shuffle.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int,
               minDocFreq: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    termDoc(df, idCol, textCol, minDocFreq)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
