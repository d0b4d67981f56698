package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich/Haddow/Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) in the shape that survives corpus scale: BPE statistics
  * depend only on the WORD HISTOGRAM, not on the corpus, so the engine
  * makes exactly one distributed pass (groupBy word with map-side
  * partial aggregation), bounds the histogram to its heaviest
  * `maxWords` entries with one TakeOrdered job, and runs the merge
  * rounds locally over that bounded table — the same
  * sample-the-model/never-shuffle-the-corpus trade as
  * [[Similarity.trainCentroids]]. Tokenization with a trained merge
  * list is a narrow per-row map (broadcast merge ranks), so encoding
  * the corpus never shuffles at all.
  */
object Bpe {

  /** One corpus pass: normalized whitespace words with their counts.
    * One shuffle, partial-agg'd map-side; output is vocabulary-sized. */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Histogram-weighted counts of adjacent character pairs — the merge
    * statistic BPE round 0 ranks on. Runs entirely on the (tiny)
    * histogram: the character slide is a Catalyst expression, no UDF. */
  def pairCounts(hist: DataFrame): DataFrame =
    hist.filter(length(col("word")) >= 2)
      .select(
        col("cnt"),
        explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `rounds` BPE merges over the corpus. The distributed part is
    * the single histogram pass + one TakeOrdered (top `maxWords` by
    * count, ties by word, so training is deterministic at any
    * parallelism); the merge loop itself runs on the driver over the
    * bounded histogram — O(maxWords · avgWordLen) per round, independent
    * of corpus size. Returns merges in training order. */
  def trainBpe(
      df: DataFrame, textCol: String,
      rounds: Int, maxWords: Int = 65536): Seq[(String, String)] = {
    import org.apache.spark.sql.Row
    val hist: Array[(String, Long)] = wordHistogram(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords) // TakeOrdered — bounded driver collect
      .collect()
      .map { case Row(w: String, c: Long) => (w, c) }
    trainOnHistogram(hist, rounds)
  }

  /** The merge loop proper, exposed for spec-level pinning: repeatedly
    * merge the highest-count adjacent symbol pair (ties broken by the
    * pair's lexicographic order, so the result is deterministic). Stops
    * early when no pair occurs at least twice. */
  def trainOnHistogram(
      hist: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      hist.map { case (w, c) => (codePointSymbols(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        val (pair, _) = best.minBy { case ((a, b), n) => (-n, a, b) }
        merges += pair
        words = words.map { case (syms, c) => (mergeOnce(syms, pair), c) }
        r += 1
      }
    }
    merges.result()
  }

  private def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word with a trained merge list: greedy lowest-rank-first
    * application, the standard BPE inference order. */
  /** Initial symbols = CODE POINTS, not UTF-16 code units: splitting a
    * supplementary character (emoji) into its surrogate halves would
    * disagree with the code-point-based pair statistics (Spark substr /
    * DuckDB) and emit lone-surrogate tokens that UTF8String turns into
    * U+FFFD replacement chars. */
  private def codePointSymbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = codePointSymbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms = syms.patch(bestAt, Vector(syms(bestAt) + syms(bestAt + 1)), 2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Tokenize a text column with trained merges: a deterministic scalar
    * UDF over the broadcast merge ranks (bounded by `rounds`), applied
    * word-by-word — a narrow map, no shuffle at any corpus size. */
  def bpeTokens(merges: Seq[(String, String)]): Column => Column = {
    val ranks = merges.zipWithIndex.toMap
    val enc = udf { (toks: Seq[String]) =>
      if (toks == null) Seq.empty[String]
      else toks.filter(_.nonEmpty).flatMap(w => encodeWord(w, ranks))
    }
    c => enc(TextOps.tokens(c))
  }
}
