package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Property check of the hot-band salted LSH join: for ANY corpus of
  * (id, band-set) rows and any salt factor, the salted candidate-pair
  * join must return EXACTLY the unsalted pair set — salting is a
  * physical redistribution (replicate one side across salts, route the
  * other by per-id salt), never a semantic change. The q129 gate pins
  * one factor against the DuckDB oracle; this pins the equivalence
  * across factors and random band-collision structures, including
  * degenerate all-one-band corpora.
  */
object DedupPropertySpec extends Properties("DedupProperties") {

  private lazy val spark = SparkTestSession.session

  // 4 Spark joins per case (unsalted + 3 factors): keep the case count low.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // small band alphabet so bucket collisions (incl. hot buckets) are common
  private val corpusGen: Gen[List[(Long, List[String])]] = for {
    n <- Gen.choose(2, 24)
    docs <- Gen.sequence[List[(Long, List[String])], (Long, List[String])](
      (1 to n).map { id =>
        for {
          k <- Gen.choose(0, 4)
          bands <- Gen.listOfN(k, Gen.oneOf("b0", "b1", "b2", "b3", "HOT"))
        } yield (id.toLong, bands.distinct)
      }.toList)
  } yield docs

  property("salted candidatePairs == unsalted for saltFactor in {2,4,8}") =
    forAll(corpusGen) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "bands")
      def pairs(sf: Int): Set[(Long, Long)] =
        Dedup.candidatePairs(df, "doc_id", "bands", saltFactor = sf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = pairs(1)
      Seq(2, 4, 8).forall(pairs(_) == plain)
    }
}
