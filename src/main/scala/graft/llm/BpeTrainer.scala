package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a distributed corpus — the
  * tokenizer-fitting step of an LLM data pipeline (reference scope: the
  * reference tokenizes nothing; this is part of the 100 TB extension
  * surface next to token counting and chunking).
  *
  * Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units") fits on a WORD-FREQUENCY table, not
  * on raw text: the corpus collapses to (word, freq) once, and every
  * merge round then runs on that vocabulary-sized relation. That is
  * also exactly the right distributed shape — one corpus-sized
  * explode+count shuffle up front, after which each round is a
  * vocabulary-sized aggregate plus a broadcast of the ONE winning pair.
  * Nothing corpus-sized is ever touched again, and no driver-side
  * collect exists anywhere (the winner stays a 1-row relation that
  * broadcast-joins back onto the vocabulary).
  *
  * Symbol sequences are carried as bracket-delimited strings
  * (`"abc"` → `"[a][b][c]"`) so that a merge is ONE codegen'd
  * `replace(seq, "[l][r]", "[lr]")`:
  *  - adjacent matches share no characters, so left-to-right
  *    non-overlapping `replace` implements BPE's greedy leftmost merge
  *    exactly (`[a][a][a]` → `[aa][a]`, never `[a][aa]`);
  *  - a pair pattern can never match inside a longer symbol
  *    (`"[a][ab]"` does not contain `"[a][a]"`), which a bare
  *    space-delimited encoding gets wrong.
  *
  * Determinism: the winning pair each round is (count DESC, left ASC,
  * right ASC) — a pure function of the corpus, reproducible under any
  * partitioning. Ties in real corpora are common at the tail; the
  * lexicographic tiebreak pins them.
  */
object BpeTrainer {

  /** Corpus → (word, freq): the one corpus-sized shuffle (map-side
    * combined). Empty tokens from repeated separators are dropped.
    */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence: every character its own bracketed symbol. */
  private def initialSeq(word: Column): Column =
    regexp_replace(word, "(.)", "[$1]")

  /** Adjacent symbol pairs of one sequence, weighted by word frequency.
    * `zip_with` over two shifted slices keeps the whole extraction
    * inside whole-stage codegen — no join, no window, no UDF; the
    * `greatest(..., 0)` guards single-symbol words (Spark's
    * `sequence(1, 0)` is DESCENDING, not empty, so slice arithmetic is
    * the safe idiom — same guard as PassageDedup).
    */
  private val pairExpr =
    """explode(zip_with(
      |  slice(syms, 1, greatest(size(syms) - 1, 0)),
      |  slice(syms, 2, greatest(size(syms) - 1, 0)),
      |  (x, y) -> struct(x AS l, y AS r)))""".stripMargin

  /** One round's pair counts: (l, r, cnt) over the vocabulary. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        split(expr("substring(seq, 2, length(seq) - 2)"), "\\]\\[").as("syms"))
      .select(col("freq"), expr(pairExpr).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** The training loop: returns (merge table, final vocabulary state).
    * Merge table = the artifact a tokenizer ships: (round, l, r, cnt,
    * token) ordered by round. If the vocabulary runs out of pairs early
    * (every word fused to one symbol), later rounds contribute no rows
    * and the table is short.
    */
  def fit(docs: DataFrame, text: Column, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of (0, 64]")
    // The ONE corpus-sized computation. Every round's pair count AND
    // the returned rules/words all sit above it, so persist the
    // vocabulary-sized result — without this the corpus explode+count
    // re-executes once per round per consumer (at cluster scale:
    // checkpoint it).
    var words = graft.CacheScope.persist(
      wordFreq(docs, text).withColumn("seq", initialSeq(col("word"))))
    var rules: DataFrame = null
    for (r <- 1 to rounds) {
      // Vocabulary-sized total order; limit(1) plans as TakeOrdered —
      // never a full sort of anything corpus-sized.
      val top = pairCounts(words)
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1)
      val rule = top.select(
        lit(r).cast("int").as("round"),
        col("l"), col("r"),
        col("cnt").cast("long").as("cnt"),
        concat(col("l"), col("r")).as("token"))
      rules = if (rules == null) rule else rules.unionByName(rule)
      // Apply the merge everywhere: the 1-row winner broadcast-joins
      // onto the vocabulary; replace() is exact greedy-leftmost (see
      // the header note on the bracket encoding). Persist each round's
      // vocabulary state: the next round's pair count AND winner both
      // consume it, and without the cut a deep fit re-executes every
      // earlier round per consumer (the label-propagation lineage
      // lesson, at vocabulary size).
      words = graft.CacheScope.persist(words
        .crossJoin(broadcast(top.select(col("l").as("ml"), col("r").as("mr"))))
        .withColumn("seq",
          expr("replace(seq, '[' || ml || '][' || mr || ']', '[' || ml || mr || ']')"))
        .select("word", "freq", "seq"))
    }
    (rules, words)
  }

  /** The merge table alone — see [[fit]]. */
  def train(docs: DataFrame, text: Column, rounds: Int): DataFrame =
    fit(docs, text, rounds)._1
}
