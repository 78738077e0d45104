package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VocabularySpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "new york new york city"),
      (4L, "the cat and the dog")
    ).toDF("doc_id", "text")
  }

  test("zipf coverage is monotone and ends at total coverage for full k") {
    val rows = Vocabulary.zipfCoverage(docs, col("text"), 1000)
      .orderBy("rank").collect()
    val total = rows.map(_.getLong(2)).sum
    assert(rows.last.getLong(3) === total)
    assert(rows.head.getString(1) === "the") // most frequent token first
    val coverages = rows.map(_.getLong(4))
    assert(coverages.zip(coverages.tail).forall { case (a, b) => a <= b })
    assert(coverages.last === 1000000L * total / total)
  }

  test("pmi ranks the always-together pair above the common-word pair") {
    val rows = Vocabulary.pmiBigrams(docs, col("text"), minCount = 2L, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "new york" co-occurs exclusively; "the cat" shares 'the' with many
    val newYorkRank = rows.indexWhere(t => t._1 == "new" && t._2 == "york")
    val theCatRank = rows.indexWhere(t => t._1 == "the" && t._2 == "cat")
    assert(newYorkRank >= 0 && theCatRank >= 0 && newYorkRank < theCatRank)
  }

  test("inverted index truncates posting heads and keeps true doc_freq") {
    val rows = Vocabulary.invertedIndex(docs, col("doc_id"), col("text"),
      minDf = 2L, headN = 2).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val the = rows.find(_._1 == "the").get
    assert(the._2 === 3L) // docs 1, 2, 4
    assert(the._3 === "1,2") // head truncated to the 2 smallest ids
    val sat = rows.find(_._1 == "sat").get
    assert(sat._2 === 2L && sat._3 === "1,2")
    assert(!rows.exists(_._1 == "city")) // df=1 < minDf
  }

  test("rerank with coarseK covering all candidates equals brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(16)(rng.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val c = vecs.filter(col("vec_id") >= 3)
    val brute = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", k = 5)
      .select("query_id", "candidate_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val rerank = Similarity.rerankTopK(q, c, "vec_id", "embedding",
      coarseK = 37, k = 5)
      .select("query_id", "candidate_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rerank === brute)
  }

  test("token budget sample stops each stratum just past its budget") {
    import spark.implicits._
    val df = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", 10L)).toDF("id", "lang", "n_tok")
    val kept = Curation.tokenBudgetSample(df, col("lang"), col("id"),
      col("n_tok"), Seq("en" -> 100L, "de" -> 55L))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = kept.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // budget 100 over 10-token docs: exactly 10 docs; 55 → 6 docs
    // (admitted while cum_before < budget, so one overshoot doc)
    assert(byLang("en") === 100L)
    assert(byLang("de") === 60L)
    // every admitted row's running total before it is under budget
    assert(kept.filter(_._1 == "en").forall(_._3 < 100L))
    assert(kept.filter(_._1 == "de").forall(_._3 < 55L))
  }
}
