package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-table TRAINING — the corpus side of the tokenizer loop that
  * [[graft.functions.BpeEncode]] closes: learn the merges here, encode and
  * budget with them everywhere else ([[TextStats.bpeTokenCount]] →
  * `selectUnderTokenBudgetByCount`).
  *
  * Scale shape (the standard Sennrich formulation): ONE distributed corpus
  * scan builds the word-frequency table — vocabulary-sized, shuffled once
  * with map-side partial aggregation — and every training iteration then
  * runs on that compressed table driver-side, weighting each word's pairs
  * by its count. A 100 TB corpus has a bounded distinct-word vocabulary
  * (tens of millions), and `minCount`/`maxWords` bound the collected state
  * explicitly: rare-word pruning is also what real tokenizer training does
  * (singleton junk words would otherwise dominate the tail). The drop is
  * LOGGED, never silent — the repo-wide no-silent-caps rule.
  *
  * The learned table is monotone by construction (a merge's operands are
  * single characters or earlier outputs — they exist as symbols when the
  * pair is counted), so it always passes [[graft.functions.BpeTable]]
  * validation and inherits the replace-pass ⇔ priority-encode equivalence
  * that makes encodes oracle-verifiable.
  */
object BpeTrain {

  /** The one-scan word-frequency table: (word, n). Splits on EXACTLY the
    * encoder's separator set ([[graft.functions.BpeUtil.isSpace]], the RE2
    * `\s` chars) — `TextStats.tokens`' Java `\s+` additionally splits on
    * \x0B, which would make training and encoding segment the same text
    * differently (and diverge from the RE2-based q126 oracle). */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(bpeWords(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Encoder-aligned word split (the [[TextStats.tokens]] shape over the
    * encoder's separator class; null ⇒ empty, no empty edge tokens). */
  private def bpeWords(text: Column): Column = {
    val cls = graft.functions.BpeUtil.spaceClass
    val tr = regexp_replace(coalesce(text, lit("")), s"^$cls+|$cls+$$", "")
    when(length(tr) === 0, array().cast("array<string>"))
      .otherwise(split(tr, s"$cls+"))
  }

  /** Corpus-wide adjacent-character-pair counts at merge iteration 0 — the
    * training primitive, exposed as a plan so an external engine can verify
    * it (q126). Derived from [[wordCounts]], so the pair explode runs over
    * the compressed vocabulary, not the corpus; `pair` is the two symbols
    * space-joined (symbols are whitespace-free, so the joiner is
    * collision-proof). Output: (pair, cnt) — occurrence-weighted, adjacent
    * positions counted with overlap (the Sennrich counting rule). */
  def pairCounts(docs: DataFrame, text: Column): DataFrame = {
    val wc = wordCounts(docs, text)
    val chars = split(col("word"), "")
    // zip_with pads the 1-shifted slice with null; concat propagates it and
    // the filter drops the incomplete tail pair — the shingles(n=2) shape
    val pairs = zip_with(chars,
      slice(chars, lit(2), greatest(length(col("word")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    wc.select(explode(pairs).as("pair"), col("n"))
      .filter(col("pair").isNotNull)
      .groupBy("pair").agg(sum(col("n")).as("cnt"))
  }

  /** Learn `numMerges` merges. Each iteration counts adjacent symbol pairs
    * over the word table (weighted by word frequency), takes the most
    * frequent — ties broken lexicographically on (left, right) so training
    * is deterministic at any parallelism — applies it left-to-right
    * non-overlapping (exactly [[graft.functions.BpeUtil]]'s sweep), and
    * records it. Stops early when no pair occurs at least twice (merging a
    * count-1 pair only memorizes one word). */
  /** Hard ceiling on `numMerges` — above the largest production tokenizer
    * vocabularies (cl100k-scale is ~100k merges), far below anything that
    * could stall the driver now that per-iteration cost is proportional to
    * the words the last merge touched. The guard exists for the same
    * reason pageRank/pqTrain cap iterations: an unbounded driver loop is a
    * denial-of-service on the whole application. */
  val MaxMerges: Int = 1 << 17

  def train(docs: DataFrame, text: Column, numMerges: Int,
      minCount: Long = 1L, maxWords: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(numMerges <= MaxMerges,
      s"numMerges must be <= $MaxMerges (cl100k-scale is ~100k merges; " +
        s"an unbounded driver loop would stall the application), got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val wcDf = wordCounts(docs, text).filter(col("n") >= minCount)
    // deterministic cap: keep the most frequent words, logged never silent.
    // fetch cap+1 to detect overflow without a count job; guard the +1
    // against Int overflow when the caller spells "no cap" as MaxValue
    val fetch = if (maxWords == Int.MaxValue) maxWords else maxWords + 1
    val kept = wcDf.orderBy(col("n").desc, col("word")).limit(fetch)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val capped = kept.length > maxWords
    if (capped) org.slf4j.LoggerFactory.getLogger("graft.text.BpeTrain").warn(
      s"BpeTrain.train: vocabulary exceeds maxWords=$maxWords; " +
        "training on the most frequent words only (deterministic cap)")
    // CODEPOINT split, exactly like the encoder and pairCounts: a per-code-
    // unit split would count surrogate-half pairs the oracle-pinned q126
    // primitive never shows, and could learn lone-surrogate merges the
    // encoder can't apply
    val words: Array[(Array[String], Long)] = kept.take(maxWords)
      .map { case (w, n) => (codepoints(w), n) }

    // Incremental pair-count maintenance (the Sennrich reference trick):
    // `counts` is the exact corpus-wide weighted pair table at all times;
    // `where` maps a pair to the indices of words that contained it when
    // the pair was last (re)counted. Indices go STALE as words evolve past
    // a pair — merge application re-checks membership, so staleness only
    // costs a skipped lookup, never a wrong count. Per-iteration work is
    // proportional to the words the chosen pair touches, not the whole
    // vocabulary — what makes a 100k-merge run driver-feasible.
    val counts = mutable.HashMap[(String, String), Long]()
    val where = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def addPairs(syms: Array[String], n: Long, idx: Int): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + n)
        where.getOrElseUpdate(k, mutable.Set[Int]()) += idx
        i += 1
      }
    }
    def subPairs(syms: Array[String], n: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val c = counts.getOrElse(k, 0L) - n
        if (c == 0L) counts.remove(k) else counts.update(k, c)
        i += 1
      }
    }
    words.zipWithIndex.foreach { case ((syms, n), idx) => addPairs(syms, n, idx) }

    val merges = mutable.ArrayBuffer[(String, String)]()
    var continue = numMerges > 0
    while (continue) {
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (pair, c)) => acc match {
          case Some((bp, bc)) if bc > c || (bc == c &&
            (bp._1 < pair._1 || (bp._1 == pair._1 && bp._2 <= pair._2))) => acc
          case _ => Some((pair, c))
        }
      }
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          where.remove(pair).foreach(_.foreach { idx =>
            val (syms, n) = words(idx)
            var touched = false
            var i = 0
            while (!touched && i < syms.length - 1) {
              touched = syms(i) == pair._1 && syms(i + 1) == pair._2
              i += 1
            }
            if (touched) { // stale index ⇒ word already merged past the pair
              subPairs(syms, n)
              val next = applyMerge(syms, pair)
              words(idx) = (next, n)
              addPairs(next, n, idx)
            }
          })
          continue = merges.length < numMerges
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** Codepoint-wise split (surrogate pairs stay whole). */
  private def codepoints(w: String): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** One left-to-right non-overlapping merge sweep — the exact counterpart
    * of the encoder's per-rank pass, so trained tables replay identically
    * at encode time. */
  private def applyMerge(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += pair._1 + pair._2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }
}
