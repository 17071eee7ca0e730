package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich et al. worked example
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainLocal reproduces the classic merge sequence with deterministic ties") {
    val merges = Bpe.trainLocal(sennrich, numMerges = 6, minPairFreq = 2)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encodeWord segments an unseen word with learned subwords") {
    val model = Bpe.Model(Bpe.trainLocal(sennrich, 6, 2), truncated = false)
    assert(Bpe.encodeWord("lowest", model.rank) == Seq("low", "est" + Bpe.EndOfWord))
    assert(Bpe.encodeWord("newest", model.rank) == Seq("n", "ew", "est" + Bpe.EndOfWord))
    // fully out-of-vocabulary word falls back to characters
    assert(Bpe.encodeWord("zzz", model.rank) == Seq("z", "z", "z", Bpe.EndOfWord))
    assert(Bpe.encodeWord("", model.rank) == Seq(Bpe.EndOfWord))
  }

  test("training stops early when no pair reaches minPairFreq") {
    val merges = Bpe.trainLocal(Seq(("ab", 1L), ("cd", 1L)), numMerges = 10, minPairFreq = 2)
    assert(merges.isEmpty)
    // with minPairFreq=1 it keeps merging until each word is one symbol
    val all = Bpe.trainLocal(Seq(("ab", 1L)), numMerges = 10, minPairFreq = 1)
    assert(all == Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
  }

  test("distributed train matches local train on the same counts") {
    val corpus = sennrich.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = Bpe.train(df, "text", numMerges = 6)
    assert(!model.truncated)
    assert(model.merges == Bpe.trainLocal(sennrich, 6, 2))
  }

  test("maxWords cap is disclosed via the truncated flag") {
    val df = (1 to 10).map(i => (i.toLong, s"w$i")).toDF("id", "text")
    assert(Bpe.train(df, "text", 2, maxWords = 3).truncated)
    assert(!Bpe.train(df, "text", 2, maxWords = 10).truncated)
  }

  test("encode is distributed, memoized, and detokenizes exactly") {
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "widest lowest  low"), // double space: normalized away
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val model = Bpe.Model(Bpe.trainLocal(sennrich, 6, 2), truncated = false)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
    val byId = enc.select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    // low -> [low, </w>] ((low,</w>) is merge #7, beyond the 6 trained);
    // lower -> [low, e, r, </w>]; newest -> [n, ew, est</w>]
    assert(byId(1L) == Seq("low", Bpe.EndOfWord,
      "low", "e", "r", Bpe.EndOfWord, "n", "ew", "est" + Bpe.EndOfWord))
    assert(byId(2L).mkString("").replace(Bpe.EndOfWord, " ").trim == "widest lowest low")
    assert(byId(3L) == Seq(Bpe.EndOfWord))
    assert(byId(4L) == Seq(Bpe.EndOfWord))
    // piece streams agree with a driver-side re-encode
    val local = "widest lowest  low".trim.split("\\s+").toSeq
      .flatMap(w => Bpe.encodeWord(w, model.rank))
    assert(byId(2L) == local)
  }

  test("encode tokenization matches the SQL tokens() contract on whitespace edges") {
    val model = Bpe.Model(Bpe.trainLocal(sennrich, 6, 2), truncated = false)
    // SQL trim strips SPACES only: a leading tab keeps its empty token
    val docs = Seq((1L, "\tlow"), (2L, "low\t"), (3L, "  low  "), (4L, "low\nnewest"))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", model)
      .select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    assert(enc(1L) == Seq(Bpe.EndOfWord, "low", Bpe.EndOfWord)) // ["", "low"]
    assert(enc(2L) == Seq("low", Bpe.EndOfWord, Bpe.EndOfWord)) // ["low", ""]
    assert(enc(3L) == Seq("low", Bpe.EndOfWord))                // spaces trimmed
    assert(enc(4L).count(_.endsWith(Bpe.EndOfWord)) == 2)       // \n splits words
    // parity with the column-side tokens() on the same strings
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val sqlSide = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(coalesce(col("text"), lit(""))).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    sqlSide.foreach { case (id, toks) =>
      assert(enc(id) == toks.flatMap(w => Bpe.encodeWord(w, model.rank)), s"id=$id")
    }
  }

  test("encode rejects fractional id columns (silent truncation would collide ids)") {
    val model = Bpe.Model(Nil, truncated = false)
    val df = Seq((3.2, "a"), (3.9, "b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](Bpe.encode(df, "doc_id", "text", model))
    assert(e.getMessage.contains("integral"))
  }

  test("save/load roundtrip is byte-stable and malformed files fail loudly") {
    val model = Bpe.Model(Bpe.trainLocal(sennrich, 6, 2), truncated = true)
    val path = s"/tmp/graft_io/bpe_spec_${java.util.UUID.randomUUID()}.gbpe"
    Bpe.save(spark, model, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded == model)
    // second save overwrites atomically
    Bpe.save(spark, model.copy(truncated = false), path)
    assert(!Bpe.load(spark, path).truncated)
    val bad = s"/tmp/graft_io/bpe_spec_bad_${java.util.UUID.randomUUID()}.gbpe"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "not a model\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Bpe.load(spark, bad))
  }
}
