package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.DistributedOrder
import graft.llm.{Dedup, PassageDedup}

/** Round-10 corpus-curation depth: the asymmetric-duplication detector
  * (containment, q227), curriculum phasing over a global difficulty
  * order (q228), and domain-conditional boilerplate discovery (q229) —
  * three operators a web-scale training-data pipeline runs between
  * dedup and packing.
  */
object CorpusOpsQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q227: shingle-containment join — the quote/superset detector.
    // Jaccard (q22) misses a short document wholly embedded in a long
    // one: the union drowns the overlap. Containment |S₁∩S₂|/|S₁| is
    // the asymmetric statistic that catches it, emitted for ORDERED
    // pairs in exact ppm. Same scale shape as the Jaccard index: one
    // posting-list self-join on the shingle (work ∝ posting sizes,
    // never the pair matrix), the absolute-intersection gate first so
    // the pair relation stays bounded by real co-occurrence, and the
    // posting relation persisted for its two join legs.
    "q227_containment_join" -> QuerySpec(
      (s, dir) =>
        Dedup.containmentIndex(
          Tables.documents(s, dir).filter(col("doc_id") < 120),
          col("doc_id"), col("text"), n = 3, minInter = 2L)
          .orderBy("id1", "id2"),
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       x -> x <> '') AS ws
                    FROM documents WHERE doc_id < 120),
         sh0 AS (SELECT doc_id,
                        unnest(CASE WHEN len(ws) >= 3
                               THEN list_transform(
                                      generate_series(1, len(ws) - 2),
                                      j -> ws[j] || ' ' || ws[j+1]
                                             || ' ' || ws[j+2])
                               ELSE [array_to_string(ws, ' ')] END) AS s
                 FROM w),
         sh AS (SELECT DISTINCT doc_id, s FROM sh0),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                          CAST(count(*) AS BIGINT) AS inter
                   FROM sh a JOIN sh b
                     ON a.s = b.s AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2)
         SELECT i.id1, i.id2, i.inter, sz.n AS n1,
                (i.inter * 1000000) // sz.n AS cont_ppm
         FROM inter i JOIN sz ON sz.doc_id = i.id1
         WHERE i.inter >= 2 ORDER BY id1, id2"""),

    // Q228: curriculum phasing — split the corpus into three training
    // phases by a global difficulty order (here: length, the classic
    // short-to-long curriculum), with EXACT tercile boundaries:
    // phase = ((rank−1)·3) div n over the total (n_chars, doc_id)
    // order. The rank comes from DistributedOrder's two-level
    // row_number, so no single-partition sort ever sees the corpus
    // (the q197/q198/q209 rule); the 1-row count broadcasts. Per-phase
    // token totals are what the training scheduler consumes.
    "q228_curriculum_phases" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.select(col("doc_id"), col("n_chars"),
          expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)")
            .as("toks"))
        DistributedOrder
          .withRowNumber(base, Seq(col("n_chars"), col("doc_id")), "i")
          .join(docs.agg(count(lit(1)).as("n")))
          .withColumn("phase", expr("((i - 1) * 3) div n"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum("toks").as("sum_tokens"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"))
          .select(col("phase").cast("long").as("phase"),
            col("n_docs").cast("long").as("n_docs"),
            col("sum_chars").cast("long").as("sum_chars"),
            col("sum_tokens").cast("long").as("sum_tokens"),
            col("min_chars").cast("long").as("min_chars"),
            col("max_chars").cast("long").as("max_chars"))
          .orderBy("phase")
      },
      """WITH base AS (SELECT doc_id, n_chars,
                              CAST(len(list_filter(string_split(text, ' '),
                                                   x -> x <> '')) AS BIGINT)
                                AS toks
                       FROM documents),
         r AS (SELECT *, row_number() OVER (ORDER BY n_chars, doc_id) AS i
               FROM base),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         SELECT ((i - 1) * 3) // n.n AS phase,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                CAST(sum(toks) AS BIGINT) AS sum_tokens,
                CAST(min(n_chars) AS BIGINT) AS min_chars,
                CAST(max(n_chars) AS BIGINT) AS max_chars
         FROM r CROSS JOIN n GROUP BY 1 ORDER BY 1"""),

    // Q229: domain-conditional boilerplate discovery — the passage
    // statistic that finds nav bars/footers/cookie banners: a passage
    // repeated across DISTINCT documents of the SAME source. Corpus-
    // global passage dedup (q101) can't see these (a phrase frequent
    // within one domain may be rare corpus-wide); conditioning the
    // count on the source is the C4-style refinement. One passage
    // explode (persisted for its two consumers), one
    // (source, passage) rollup carrying both the distinct-doc and
    // occurrence counts, and a semi-join back to count affected docs.
    // All 20 sources emit a row (zeros included) so the report shape
    // is stable as the corpus grows.
    "q229_domain_boilerplate" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pass = graft.CacheScope.persist(
          PassageDedup.passages(docs, col("doc_id"), col("text"), n = 4)
            .join(docs.select(col("doc_id"), col("source")), Seq("doc_id")))
        val boiler = pass.groupBy("source", "passage")
          .agg(countDistinct("doc_id").as("nd"), count(lit(1)).as("occ"))
          .filter(col("nd") > 1)
        val per = boiler.groupBy("source")
          .agg(count(lit(1)).as("n_boiler"), sum("occ").as("occ_total"))
        val hit = pass
          .join(boiler.select("source", "passage"), Seq("source", "passage"))
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs_hit"))
        docs.select("source").distinct()
          .join(per, Seq("source"), "left")
          .join(hit, Seq("source"), "left")
          .select(col("source"),
            coalesce(col("n_boiler"), lit(0L)).cast("long").as("n_boiler"),
            coalesce(col("occ_total"), lit(0L)).cast("long").as("occ_total"),
            coalesce(col("n_docs_hit"), lit(0L)).cast("long").as("n_docs_hit"))
          .orderBy("source")
      },
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                    FROM documents),
         g AS (SELECT doc_id, source,
                      array_to_string(list_slice(toks, 1 + (i-1)*4, i*4),
                                      ' ') AS passage
               FROM (SELECT doc_id, source, toks,
                            unnest(generate_series(1, len(toks) // 4)) AS i
                     FROM t)),
         b AS (SELECT source, passage,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS nd,
                      CAST(count(*) AS BIGINT) AS occ
               FROM g GROUP BY 1, 2
               HAVING count(DISTINCT doc_id) > 1),
         per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_boiler,
                        CAST(sum(occ) AS BIGINT) AS occ_total
                 FROM b GROUP BY 1),
         hit AS (SELECT g.source,
                        CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_docs_hit
                 FROM g JOIN b ON g.source = b.source
                             AND g.passage = b.passage
                 GROUP BY 1),
         srcs AS (SELECT DISTINCT source FROM documents)
         SELECT s.source, coalesce(per.n_boiler, 0) AS n_boiler,
                coalesce(per.occ_total, 0) AS occ_total,
                coalesce(hit.n_docs_hit, 0) AS n_docs_hit
         FROM srcs s
         LEFT JOIN per ON per.source = s.source
         LEFT JOIN hit ON hit.source = s.source
         ORDER BY s.source"""),

    // Q231: out-of-vocabulary rate per source — the tokenizer-health
    // monitor: what fraction of token OCCURRENCES falls outside the
    // global top-K vocabulary (K=20 here; the head that a fixed vocab
    // or cache would cover). A source whose OOV rate drifts up is
    // changing register/language — the signal that triggers re-fitting
    // q223's merges. Scale shape: one map-side-combined token count,
    // a TakeOrdered top-K (constant-sized, broadcast back as a hash
    // set via the anti-join), one per-source conditional rollup in
    // exact ppm. The corpus token stream is scanned once.
    "q231_oov_rate" -> QuerySpec(
      (s, dir) => {
        val occ = Tables.documents(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
        val topk = occ.groupBy("word").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), col("word")).limit(20)
          .select(col("word"), lit(1).as("in_vocab"))
        occ.join(broadcast(topk), Seq("word"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"),
            count(when(col("in_vocab").isNull, 1)).as("oov_cnt"))
          .select(col("source"), col("n_words").cast("long").as("n_words"),
            col("oov_cnt").cast("long").as("oov_cnt"),
            expr("(oov_cnt * 1000000) div n_words").as("oov_ppm"))
          .orderBy("source")
      },
      """WITH occ AS (SELECT source,
                             unnest(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS word
                      FROM documents),
         freq AS (SELECT word, CAST(count(*) AS BIGINT) AS c
                  FROM occ GROUP BY 1),
         topk AS (SELECT word FROM freq ORDER BY c DESC, word LIMIT 20)
         SELECT source, CAST(count(*) AS BIGINT) AS n_words,
                CAST(count(*) FILTER (WHERE word NOT IN
                                        (SELECT word FROM topk))
                     AS BIGINT) AS oov_cnt,
                (count(*) FILTER (WHERE word NOT IN (SELECT word FROM topk))
                 * 1000000) // count(*) AS oov_ppm
         FROM occ GROUP BY 1 ORDER BY 1"""),

    // Q236: entity-resolution capstone — the full record-linkage
    // pipeline composed from the library's pieces: multi-key blocking
    // (lang × size-bucket × 4-char prefix — the q86 scheme; candidate
    // pairs come from an equi-join, never all-pairs), edit-distance
    // verify inside blocks (exact unit-cost Levenshtein on 48-char
    // heads), transitive closure over the verified match edges
    // (min-label propagation — a matches b matches c must land in ONE
    // entity even if a≁c directly), and per-entity canonicalization:
    // cluster id = smallest member (the survivor), membership count +
    // id-sum fingerprint so the gate pins WHICH records merged, not
    // just how many. Oracle: the same edges through a recursive-CTE
    // reachability closure.
    "q236_entity_resolution" -> QuerySpec(
      (s, dir) => {
        val d = graft.CacheScope.persist(
          Tables.documents(s, dir).select(
            col("doc_id"), col("lang"), expr("n_chars div 50").as("szb"),
            substring(col("text"), 1, 4).as("pfx"),
            substring(col("text"), 1, 48).as("head")))
        val a = d.select(col("lang"), col("szb"), col("pfx"),
          col("doc_id").as("id1"), col("head").as("h1"))
        val b = d.select(col("lang"), col("szb"), col("pfx"),
          col("doc_id").as("id2"), col("head").as("h2"))
        val edges = graft.CacheScope.persist(
          a.join(b, Seq("lang", "szb", "pfx"))
            .filter(col("id1") < col("id2"))
            .filter(levenshtein(col("h1"), col("h2")) <= 5)
            .select("id1", "id2"))
        Dedup.connectedComponents(edges, "id1", "id2")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"), sum("id").as("id_sum"),
            max("id").as("max_id"))
          .select(col("cluster_id").cast("long").as("entity_id"),
            col("n_members").cast("long").as("n_members"),
            col("id_sum").cast("long").as("id_sum"),
            col("max_id").cast("long").as("max_id"))
          .orderBy("entity_id")
      },
      """WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars // 50 AS szb,
                                     substr(text, 1, 4) AS pfx,
                                     substr(text, 1, 48) AS head
                              FROM documents),
         vp AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                FROM d a JOIN d b
                  ON a.lang = b.lang AND a.szb = b.szb AND a.pfx = b.pfx
                     AND a.doc_id < b.doc_id
                WHERE levenshtein(a.head, b.head) <= 5),
         edges AS (SELECT id1 AS src, id2 AS dst FROM vp
                   UNION ALL SELECT id2, id1 FROM vp),
         reach(id, lab) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
         lbl AS (SELECT id, min(lab) AS entity_id FROM reach GROUP BY id)
         SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
                CAST(sum(id) AS BIGINT) AS id_sum,
                CAST(max(id) AS BIGINT) AS max_id
         FROM lbl GROUP BY 1 ORDER BY entity_id""")
  )
}
