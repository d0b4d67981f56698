package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge loop and tokenizer (Sennrich ACL'16) on
  * hand-computed merges — the parts the DuckDB gate (round-0 pair
  * counts, text_bpe_pairs) cannot express. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bpe-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the classic corpus from the BPE paper, sans end-of-word marker
  private val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop: hand-computed merges on the Sennrich corpus") {
    // round 1: es=9 ties st=9 → lexicographic (e,s) wins
    // round 2: (es,t)=9 beats everything
    // round 3: (l,o)=7 ties (o,w)=7 → (l,o) wins
    assert(Bpe.trainOnHistogram(hist, 3) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("merge loop stops early when no pair repeats") {
    val merges = Bpe.trainOnHistogram(Seq(("ab", 1L)), 10)
    assert(merges.isEmpty) // (a,b) occurs once — below the count-2 floor
  }

  test("encode applies merges lowest-rank-first") {
    val ranks = Bpe.trainOnHistogram(hist, 3).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) == Vector("lo", "w", "est"))
    assert(Bpe.encodeWord("newest", ranks) == Vector("n", "e", "w", "est"))
    assert(Bpe.encodeWord("x", ranks) == Vector("x"))
  }

  test("symbols are code points: supplementary chars never split into surrogates") {
    // an emoji is ONE symbol; UTF-16 code-unit splitting would produce
    // two lone surrogates that (a) disagree with the code-point-based
    // pair statistics and (b) turn into U+FFFD through UTF8String
    val emoji = new String(Character.toChars(0x1F600)) // 😀
    assert(Bpe.encodeWord(emoji + "x", Map.empty) == Vector(emoji, "x"))
    val merges = Bpe.trainOnHistogram(Seq((emoji + "x", 5L)), rounds = 1)
    assert(merges == Seq((emoji, "x"))) // the pair is (😀, x), not (surrogate, surrogate)
    assert(Bpe.encodeWord(emoji + "x", merges.zipWithIndex.toMap) == Vector(emoji + "x"))
  }

  test("distributed train matches the local loop; tokenizer runs as a narrow map") {
    val sp = spark
    import sp.implicits._
    // corpus whose word histogram IS `hist`
    val words = hist.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val df = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.trainBpe(df, "text", rounds = 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val toks = Seq("the lowest low").toDF("text")
      .select(Bpe.bpeTokens(merges)(org.apache.spark.sql.functions.col("text")))
      .as[Seq[String]].head()
    assert(toks == Seq("t", "h", "e", "lo", "w", "est", "lo", "w"))
  }

  test("greedy encode == applying merges in training order (oracle-replay contract)") {
    // the text_bpe_tokens oracle replays training-order mergeOnce sweeps;
    // encodeWord is greedy lowest-rank. They coincide because merge r's
    // components only arise from merges of rank < r — pin it on real data
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(r => Option(r.getString(0)).getOrElse("")).toSeq
    val norm = docs.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
    val hist2 = norm.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val merges = Bpe.trainOnHistogram(hist2, rounds = 8)
    assert(merges.length == 8)
    val ranks = merges.zipWithIndex.toMap
    def sequential(w: String): Vector[String] = {
      var syms = w.toCharArray.map(_.toString).toVector // ASCII corpus
      merges.foreach { pair =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    hist2.foreach { case (w, _) =>
      assert(Bpe.encodeWord(w, ranks) == sequential(w), s"word '$w' diverged")
    }
  }

  test("histogram cap keeps training bounded and deterministic") {
    val sp = spark
    import sp.implicits._
    // 'aa' is the heaviest word; with maxWords=1 only it trains → merge (a,a)
    val df = Seq("aa aa aa bb cc dd ee ff").toDF("text")
    assert(Bpe.trainBpe(df, "text", rounds = 2, maxWords = 1) == Seq(("a", "a")))
  }
}
