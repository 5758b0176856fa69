package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Token vocabulary building + sequence encoding — the tokenizer-prep
  * face of the pipeline (vocab from corpus frequencies, then encode
  * documents as id sequences against it).
  *
  * Scale shapes:
  *  - [[build]]: explode → count is ONE shuffle with map-side partial
  *    aggregation; the top-k cut is a TakeOrdered (per-partition heap,
  *    driver merge of k×tasks rows). The id-assigning window then runs
  *    over ≤ k rows — bounded by construction, so the single-partition
  *    window that is fatal on corpus-sized data is fine here (a vocab
  *    is driver-sized by definition).
  *  - [[encodeExploded]]: the vocab BROADCASTS; each (doc, pos, token)
  *    row resolves its id map-side, out-of-vocabulary tokens encode as
  *    -1. The corpus is never shuffled to encode.
  */
object Vocabulary {

  /** Top-k vocabulary: (token_id, token, cnt), ids dense from 0 in
    * (count desc, token) order — deterministic under ties.
    */
  def build(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "vocabulary size must be positive")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select(col("token_id"), col("token"), col("cnt").cast("long").as("cnt"))
  }

  /** Encode every document as (idCol, pos, token_id) rows, one per
    * token in order (pos is 0-based); unknown tokens get id -1.
    */
  def encodeExploded(docs: DataFrame, idCol: String, textCol: String,
                     vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select("token", "token_id")), Seq("token"),
        "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))

  /** Array-form encoding: (idCol, token_ids array<long>), token order
    * preserved. One groupBy shuffle on the id; the sort-by-position
    * happens inside the collected array, not as a global sort.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame =
    encodeExploded(docs, idCol, textCol, vocab)
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("token_ids"))

  // ----------------------------------------------------------------
  // BPE subword training + encoding (Sennrich et al. ACL'16 — the
  // byte-pair-encoding recipe behind GPT-2/LLaMA-style tokenizers,
  // minus the byte fallback: symbols start as characters).
  //
  // Scale shape: the ONLY corpus-scale work is the word-frequency
  // count (one shuffle with map-side partial aggregation, result
  // bounded by `maxWords` via TakeOrdered — Zipf puts essentially all
  // token mass in the head). The merge loop then runs DRIVER-SIDE
  // over that bounded dictionary — the same discipline as the IVF
  // quantizer (`Similarity.trainIvfCentroids`): train small on the
  // driver, apply distributed. This is also how reference tokenizer
  // trainers work (HF tokenizers / SentencePiece train over a counted
  // word dict, never the raw corpus).
  //
  // Determinism contract (what the DuckDB oracle replays literally):
  //  - words are `TextAnalysis.tokens` output (lowercased, \s+ split);
  //  - a word's symbol state is a string: one leading + trailing
  //    space, symbols joined by TWO spaces ("hug" -> " h  u  g ");
  //  - pair counts sum word freq over every adjacent symbol position
  //    (overlapping positions all count: " a  a  a " contributes 2);
  //  - best pair = max count, ties broken by (left, right) ascending;
  //  - a merge applies as plain string replace of " l  r " with
  //    " lr " — sequential left-to-right non-overlapping, which IS
  //    the classic left-to-right BPE merge order (" a  a  a  a "
  //    -> " aa  aa "), and Java's String.replace, Spark's codegen
  //    `replace` and DuckDB's replace() all share it. The two-space
  //    separator is what makes it correct: adjacent pairs do not
  //    share boundary characters, so one replace pass cannot starve
  //    its right neighbor.
  // ----------------------------------------------------------------

  /** Learned merge table. `merges` is rank-ordered (rank 0 first). */
  final case class BpeModel(merges: Seq[(String, String)]) {
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "lft", "rgt")
    }
  }

  /** Persist a trained model under `path`: the rank-ordered merge
    * table lands as ONE parquet write (`path/merges`) whose `_SUCCESS`
    * is the commit marker — the [[VectorIndex]] quantizer/PQ layout
    * discipline: a crashed save is invisible to [[loadBpeModel]], and
    * re-saving over it is an atomic-enough overwrite (marker deleted
    * first by the overwrite, recreated last). Train once, encode
    * forever — the reference round-trips its trained models the same
    * way (eland/ml/ml_model.py:249-550 serializes model artifacts to
    * the cluster; here the artifact is a parquet table any engine can
    * read).
    */
  def saveBpeModel(spark: org.apache.spark.sql.SparkSession,
                   model: BpeModel, path: String): Unit = {
    require(model.merges.nonEmpty, "refusing to save an empty merge table")
    // one driver-sized table, one file: the model is the artifact, not
    // a distributed dataset
    model.toDF(spark).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges")
  }

  /** Load a committed model saved by [[saveBpeModel]]. Loud on a
    * missing or uncommitted save (no silent empty model).
    */
  def loadBpeModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): BpeModel = {
    val p = new org.apache.hadoop.fs.Path(s"$path/merges/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path holds no committed BPE model — saveBpeModel() first " +
        "(a crashed save leaves no _SUCCESS marker and does not load)")
    val rows = spark.read.parquet(s"$path/merges").orderBy("rank").collect()
    require(rows.nonEmpty, s"$path/merges is committed but empty")
    BpeModel(rows.toSeq.map(r =>
      (r.getAs[String]("lft"), r.getAs[String]("rgt"))))
  }

  /** Export the merge table in the Hugging Face BPE `merges.txt`
    * spelling — a `#version: 0.2` header, then one "left right" pair
    * per line in rank order — the interop format HF `tokenizers`
    * (and everything that reads its BPE models) consumes, so a
    * corpus-trained merge walk can feed a production tokenizer stack
    * directly. One driver-side file write: the model is driver-sized
    * by definition. Symbols cannot contain whitespace (they come from
    * whitespace-split tokens), which is exactly why the format's
    * space-separated lines are unambiguous; guarded anyway.
    */
  def exportBpeMergesTxt(spark: org.apache.spark.sql.SparkSession,
                         model: BpeModel, file: String): Unit = {
    require(model.merges.nonEmpty, "refusing to export an empty merge table")
    model.merges.foreach { case (l, r) =>
      require(!l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
        s"merge symbols must be whitespace-free, got ('$l', '$r')")
    }
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(("#version: 0.2\n" +
      model.merges.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a `merges.txt` (HF BPE) into a [[BpeModel]]: ONLY the
    * leading `#version` header line is skipped (plus blank lines) —
    * the HF format has no general comment syntax, and BPE symbols are
    * corpus characters, so a merge like `# t` (from `#tag` tokens) is
    * data, not a comment. Each remaining line is exactly "left right",
    * rank = line order — the inverse of [[exportBpeMergesTxt]], and
    * the path for encoding a corpus under a PRODUCTION tokenizer's
    * merges.
    */
  def importBpeMergesTxt(spark: org.apache.spark.sql.SparkSession,
                         file: String): BpeModel = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no merges file at $file")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val body = lines match {
      // exact HF header prefix ("#version:"): a data line whose left
      // symbol merely begins with '#version' must NOT be dropped — '#'-
      // prefixed symbols are legitimate merge data
      case h :: t if h.startsWith("#version:") => t
      case other => other
    }
    val merges = body.filterNot(_.trim.isEmpty)
      .map { l =>
        l.split(" ", -1) match {
          case Array(lft, rgt) if lft.nonEmpty && rgt.nonEmpty => (lft, rgt)
          case _ => throw new IllegalArgumentException(
            s"malformed merges.txt line (want 'left right'): '$l'")
        }
      }
    require(merges.nonEmpty, s"$file holds no merges")
    BpeModel(merges)
  }

  /** Initial symbols are Unicode CODE POINTS, not UTF-16 units —
    * Spark's `split(word, "")`, DuckDB's `word[i]`, and this driver
    * form must all see the same symbol sequence, and the column/SQL
    * forms are code-point aware (a surrogate pair is ONE symbol).
    */
  private def paddedSymbols(word: String): String =
    " " + word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).mkString("  ") + " "

  /** Driver-side reference segmentation (used by specs and by the
    * trainer itself); identical by construction to [[bpeSegment]].
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val folded = merges.foldLeft(paddedSymbols(word)) { case (s, (l, r)) =>
      s.replace(s" $l  $r ", s" $l$r ")
    }
    folded.trim.split("  ").toSeq
  }

  /** Train `numMerges` BPE merges over the corpus. One corpus-scale
    * shuffle (word count, capped at `maxWords` by frequency with a
    * deterministic (cnt desc, word) cut); the merge loop is
    * driver-side over the capped dict, with INCREMENTAL pair-count
    * maintenance — each merge touches only the words that contain the
    * merged pair, so total loop work is O(initial pairs + rewritten
    * words × word length), not O(numMerges × dict). Stops early if
    * no pair remains. Bit-identical to the full-recount reference
    * loop ([[trainMergesNaive]], differential-pinned in `BpeSpec`).
    */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 1000000, minFreq: Long = 1L): BpeModel = {
    require(numMerges > 0, "numMerges must be positive")
    require(maxWords > 0, "maxWords must be positive")
    val dict = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    BpeModel(trainMerges(dict, numMerges))
  }

  private def pairsOf(s: String): Array[(String, String)] = {
    val syms = s.trim.split("  ")
    if (syms.length < 2) Array.empty
    else Array.tabulate(syms.length - 1)(j => (syms(j), syms(j + 1)))
  }

  /** The incremental merge loop over a counted dict (word, freq).
    * Argmax selection rides a lazily-invalidated priority queue: every
    * count update pushes a fresh (count, pair) entry, and stale
    * entries (whose stored count no longer matches the live map) are
    * discarded on pop — O(log P) per update instead of an O(P) map
    * scan per merge. Tie order (count desc, then (l, r) asc) is the
    * queue comparator, identical to the reference loop's argmax.
    */
  private[operators] def trainMerges(dict: Array[(String, Long)],
                                     numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words = dict.map { case (w, _) => paddedSymbols(w) }
    val freqs = dict.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val queue = new java.util.PriorityQueue[(Long, String, String)](11,
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(b._1, a._1) // count desc
        if (c != 0) c
        else {
          val lc = a._2.compareTo(b._2)
          if (lc != 0) lc else a._3.compareTo(b._3)
        }
      })
    def bump(p: (String, String), delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c == 0L) counts.remove(p)
      else {
        counts.update(p, c)
        queue.add((c, p._1, p._2))
        ()
      }
    }
    var i = 0
    while (i < words.length) {
      pairsOf(words(i)).foreach { p =>
        bump(p, freqs(i))
        occ.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
      i += 1
    }
    def popBest(): Option[(String, String)] = {
      while (!queue.isEmpty) {
        val (c, l, r) = queue.poll()
        if (counts.get((l, r)).contains(c)) return Some((l, r))
      }
      None
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      popBest() match {
        case None => done = true
        case Some((l, r)) =>
          merges += ((l, r))
          val pat = s" $l  $r "
          val rep = s" $l$r "
          // only the words holding this pair change; rewrite each and
          // diff its whole pair multiset — O(word length), and
          // trivially identical to the full recount
          val affected =
            occ.getOrElse((l, r), mutable.HashSet.empty).toArray
          affected.foreach { w =>
            val oldS = words(w)
            val newS = oldS.replace(pat, rep)
            if (newS != oldS) {
              val f = freqs(w)
              val oldPairs = pairsOf(oldS)
              val newPairs = pairsOf(newS)
              oldPairs.foreach(bump(_, -f))
              newPairs.foreach(bump(_, f))
              val oldSet = oldPairs.toSet
              val newSet = newPairs.toSet
              (oldSet diff newSet).foreach { p =>
                occ.get(p).foreach { s =>
                  s -= w; if (s.isEmpty) occ.remove(p)
                }
              }
              (newSet diff oldSet).foreach { p =>
                occ.getOrElseUpdate(p, mutable.HashSet.empty) += w
              }
              words(w) = newS
            }
          }
          // belt and braces: if the merged pair somehow survives with
          // a live count, restore a matching queue entry (its valid
          // entry was consumed by popBest)
          counts.get((l, r)).foreach(c => queue.add((c, l, r)))
      }
    }
    merges.toSeq
  }

  /** Full-recount reference loop — kept solely as the differential
    * pin for [[trainMerges]] (BpeSpec asserts identical merge walks).
    */
  private[operators] def trainMergesNaive(dict: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(String, Long)] =
      dict.map { case (w, f) => (paddedSymbols(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (s, f) =>
        pairsOf(s).foreach { key =>
          counts.update(key, counts.getOrElse(key, 0L) + f)
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), _) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r))
        val pat = s" $l  $r "
        val rep = s" $l$r "
        words = words.map { case (s, f) => (s.replace(pat, rep), f) }
      }
    }
    merges.toSeq
  }

  /** Column form of [[segmentWord]]: word string -> array of subword
    * pieces. A fold of codegen `replace` calls over the padded symbol
    * string — no UDF; Spark's codegen splits oversized expression
    * trees into helper methods automatically. Practical merge-count
    * bound for the column form is a few thousand (expression-tree
    * depth); past that, segment the DISTINCT word table (bounded
    * rows) and broadcast-join, which [[bpeEncodeExploded]] does
    * anyway.
    */
  def bpeSegment(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = array_remove(split(word, ""), "")
    val padded = concat(lit(" "), array_join(chars, "  "), lit(" "))
    val folded = merges.foldLeft(padded) { case (c, (l, r)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    split(trim(folded), "  ")
  }

  /** Encode every document as (idCol, pos, piece_pos, piece) — one
    * row per subword piece, both positions 0-based. The corpus-scale
    * shape: segmentation runs once per DISTINCT word (Zipf-bounded
    * shuffle), then broadcasts back onto the exploded corpus — the
    * corpus itself is never shuffled to encode, exactly like
    * [[encodeExploded]]'s vocab broadcast.
    */
  def bpeEncodeExploded(docs: DataFrame, idCol: String, textCol: String,
                        model: BpeModel): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
    val seg = toks.select("token").distinct()
      .withColumn("pieces", bpeSegment(col("token"), model.merges))
    // posexplode_OUTER: avoids the inferred size(pieces) > 0 filter
    // that would inline the merge folds below the distinct (the
    // WordPiece.wordPieceEncodeExploded finding; cheaper here but the
    // same per-occurrence shape). A BPE segmentation is never empty.
    toks.join(broadcast(seg), Seq("token"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        posexplode_outer(col("pieces")).as(Seq("piece_pos", "piece")))
      .withColumn("piece_pos", col("piece_pos").cast("long"))
  }

  /** Per-document BPE piece count (idCol, n_pieces) — the
    * context-window budgeting unit (whitespace token counts
    * over-estimate what a subword tokenizer produces). Same
    * distinct-word broadcast shape as [[bpeEncodeExploded]], but only
    * piece COUNTS travel, never the pieces. A document whose text has
    * no tokens yields no row.
    */
  def bpeTokenCount(docs: DataFrame, idCol: String, textCol: String,
                    model: BpeModel): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val seg = toks.select("token").distinct()
      .withColumn("_np",
        size(bpeSegment(col("token"), model.merges)).cast("long"))
    toks.join(broadcast(seg), Seq("token"))
      .groupBy(idCol).agg(sum(col("_np")).as("n_pieces"))
  }
}
