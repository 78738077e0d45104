package graft.queries

import graft.Tables

/** Model-evaluation surface, part 2 — the confusion-matrix family next
  * to q197 (decile lift) and q198 (AUC): per-class precision/recall/F1
  * with macro/micro rollups (q224) and Cohen's kappa (q225). A training
  * pipeline runs these after every fine-tune/eval cycle; both are pure
  * integer rational arithmetic over ONE (truth, pred) rollup, so they
  * are bit-stable across engines and scale as a single map-side-
  * combined shuffle no matter the corpus size.
  *
  * The "predictions" are a deterministic synthetic rule over the
  * fixture (≈70% accurate with asymmetric confusion, derived from
  * doc_id arithmetic) — the gate checks the METRIC operators; a real
  * caller feeds its own (truth, pred) pairs into the same rollup.
  */
object EvalQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q224: classification report. One (truth, pred) aggregate; the
    // class axis (union of observed truth + pred labels — a class never
    // predicted still gets its row) joins the three marginals back on
    // the CLASS relation (≤ |classes| rows, broadcast-sized). Metrics
    // as exact ppm rationals: P = tp/(tp+fp), R = tp/(tp+fn),
    // F1 = 2·tp/(2·tp+fp+fn) — the single-division form, no float
    // compounding. MACRO = unweighted mean of per-class ppms; MICRO
    // collapses to accuracy (single-label task). tp·10⁶ stays in
    // BIGINT until |corpus| ≈ 9·10¹² — the ppm scale is the documented
    // bound here, unlike the q225 products which cross it and route
    // through DECIMAL(38,0).
    "q224_classification_report" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q224_documents")
        s.sql("""
          WITH d AS (SELECT doc_id,
                            (instr('de en es fr zh', lang) + 2) div 3 - 1 AS ti
                     FROM g_q224_documents),
          p AS (SELECT doc_id, ti,
                       CASE WHEN doc_id % 10 < 7 THEN ti
                            ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
                FROM d),
          lab AS (SELECT substr('de en es fr zh', ti * 3 + 1, 2) AS truth,
                         substr('de en es fr zh', pi * 3 + 1, 2) AS pred
                  FROM p),
          cm AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS c
                 FROM lab GROUP BY 1, 2),
          cls AS (SELECT truth AS cl FROM cm UNION SELECT pred FROM cm),
          per AS (SELECT cl, coalesce(t.n_true, 0) AS n_true,
                         coalesce(pd.n_pred, 0) AS n_pred,
                         coalesce(dg.tp, 0) AS tp
                  FROM cls
                  LEFT JOIN (SELECT truth, CAST(sum(c) AS BIGINT) AS n_true
                             FROM cm GROUP BY 1) t ON t.truth = cl
                  LEFT JOIN (SELECT pred, CAST(sum(c) AS BIGINT) AS n_pred
                             FROM cm GROUP BY 1) pd ON pd.pred = cl
                  LEFT JOIN (SELECT truth, CAST(sum(c) AS BIGINT) AS tp
                             FROM cm WHERE truth = pred GROUP BY 1) dg
                    ON dg.truth = cl),
          m AS (SELECT cl AS class, n_true AS support, tp,
                       n_pred - tp AS fp, n_true - tp AS fn,
                       CASE WHEN n_pred = 0 THEN 0
                            ELSE (tp * 1000000) div n_pred END AS precision_ppm,
                       CASE WHEN n_true = 0 THEN 0
                            ELSE (tp * 1000000) div n_true END AS recall_ppm,
                       CASE WHEN n_pred + n_true = 0 THEN 0
                            ELSE (2000000 * tp) div (n_pred + n_true)
                       END AS f1_ppm
                FROM per),
          mac AS (SELECT 'MACRO' AS class,
                         CAST(sum(support) AS BIGINT) AS support,
                         CAST(sum(tp) AS BIGINT) AS tp,
                         CAST(sum(fp) AS BIGINT) AS fp,
                         CAST(sum(fn) AS BIGINT) AS fn,
                         CAST(sum(precision_ppm) div count(*) AS BIGINT)
                           AS precision_ppm,
                         CAST(sum(recall_ppm) div count(*) AS BIGINT)
                           AS recall_ppm,
                         CAST(sum(f1_ppm) div count(*) AS BIGINT) AS f1_ppm
                  FROM m),
          mic AS (SELECT 'MICRO' AS class,
                         CAST(sum(support) AS BIGINT) AS support,
                         CAST(sum(tp) AS BIGINT) AS tp,
                         CAST(sum(support) - sum(tp) AS BIGINT) AS fp,
                         CAST(sum(support) - sum(tp) AS BIGINT) AS fn,
                         CAST((sum(tp) * 1000000) div sum(support) AS BIGINT)
                           AS precision_ppm,
                         CAST((sum(tp) * 1000000) div sum(support) AS BIGINT)
                           AS recall_ppm,
                         CAST((sum(tp) * 1000000) div sum(support) AS BIGINT)
                           AS f1_ppm
                  FROM m)
          SELECT * FROM m UNION ALL SELECT * FROM mac
          UNION ALL SELECT * FROM mic
          ORDER BY class""")
      },
      """WITH d AS (SELECT doc_id,
                           (strpos('de en es fr zh', lang) + 2) // 3 - 1 AS ti
                    FROM documents),
         p AS (SELECT doc_id, ti,
                      CASE WHEN doc_id % 10 < 7 THEN ti
                           ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
               FROM d),
         lab AS (SELECT substr('de en es fr zh', ti * 3 + 1, 2) AS truth,
                        substr('de en es fr zh', pi * 3 + 1, 2) AS pred
                 FROM p),
         cm AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS c
                FROM lab GROUP BY 1, 2),
         cls AS (SELECT truth AS cl FROM cm UNION SELECT pred FROM cm),
         per AS (SELECT cl, coalesce(t.n_true, 0) AS n_true,
                        coalesce(pd.n_pred, 0) AS n_pred,
                        coalesce(dg.tp, 0) AS tp
                 FROM cls
                 LEFT JOIN (SELECT truth, CAST(sum(c) AS BIGINT) AS n_true
                            FROM cm GROUP BY 1) t ON t.truth = cl
                 LEFT JOIN (SELECT pred, CAST(sum(c) AS BIGINT) AS n_pred
                            FROM cm GROUP BY 1) pd ON pd.pred = cl
                 LEFT JOIN (SELECT truth, CAST(sum(c) AS BIGINT) AS tp
                            FROM cm WHERE truth = pred GROUP BY 1) dg
                   ON dg.truth = cl),
         m AS (SELECT cl AS class, n_true AS support, tp,
                      n_pred - tp AS fp, n_true - tp AS fn,
                      CASE WHEN n_pred = 0 THEN 0
                           ELSE (tp * 1000000) // n_pred END AS precision_ppm,
                      CASE WHEN n_true = 0 THEN 0
                           ELSE (tp * 1000000) // n_true END AS recall_ppm,
                      CASE WHEN n_pred + n_true = 0 THEN 0
                           ELSE (2000000 * tp) // (n_pred + n_true)
                      END AS f1_ppm
               FROM per),
         mac AS (SELECT 'MACRO' AS class,
                        CAST(sum(support) AS BIGINT) AS support,
                        CAST(sum(tp) AS BIGINT) AS tp,
                        CAST(sum(fp) AS BIGINT) AS fp,
                        CAST(sum(fn) AS BIGINT) AS fn,
                        CAST(sum(precision_ppm) // count(*) AS BIGINT)
                          AS precision_ppm,
                        CAST(sum(recall_ppm) // count(*) AS BIGINT)
                          AS recall_ppm,
                        CAST(sum(f1_ppm) // count(*) AS BIGINT) AS f1_ppm
                 FROM m),
         mic AS (SELECT 'MICRO' AS class,
                        CAST(sum(support) AS BIGINT) AS support,
                        CAST(sum(tp) AS BIGINT) AS tp,
                        CAST(sum(support) - sum(tp) AS BIGINT) AS fp,
                        CAST(sum(support) - sum(tp) AS BIGINT) AS fn,
                        CAST((sum(tp) * 1000000) // sum(support) AS BIGINT)
                          AS precision_ppm,
                        CAST((sum(tp) * 1000000) // sum(support) AS BIGINT)
                          AS recall_ppm,
                        CAST((sum(tp) * 1000000) // sum(support) AS BIGINT)
                          AS f1_ppm
                 FROM m)
         SELECT * FROM m UNION ALL SELECT * FROM mac
         UNION ALL SELECT * FROM mic
         ORDER BY class"""),

    // Q225: Cohen's kappa — chance-corrected agreement between the
    // truth and prediction labelings: κ = (pₒ − pₑ)/(1 − pₑ) with
    // pₑ = Σ row_marginal·col_marginal / n². Cleared of denominators:
    // κ_ppm = (n·agree − Σrc)·10⁶ div (n² − Σrc) — n² and the marginal
    // products pass int64 at corpus scale, so every big product routes
    // through DECIMAL(38,0)/HUGEINT (the q180/q193 rule). Same single
    // (truth, pred) rollup as q224; marginals full-outer-join on the
    // class axis so a label only ever predicted (or only ever true)
    // still contributes rc·cc = 0 correctly rather than vanishing.
    "q225_cohens_kappa" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q225_documents")
        s.sql("""
          WITH d AS (SELECT doc_id,
                            (instr('de en es fr zh', lang) + 2) div 3 - 1 AS ti
                     FROM g_q225_documents),
          p AS (SELECT ti, CASE WHEN doc_id % 10 < 7 THEN ti
                                ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
                FROM d),
          cm AS (SELECT ti, pi, CAST(count(*) AS BIGINT) AS c
                 FROM p GROUP BY 1, 2),
          marg AS (SELECT coalesce(r.ti, co.pi) AS cl,
                          coalesce(r.rc, 0) AS rc, coalesce(co.cc, 0) AS cc
                   FROM (SELECT ti, sum(c) AS rc FROM cm GROUP BY 1) r
                   FULL OUTER JOIN
                        (SELECT pi, sum(c) AS cc FROM cm GROUP BY 1) co
                     ON r.ti = co.pi),
          agg AS (SELECT CAST((SELECT sum(c) FROM cm) AS BIGINT) AS n,
                         CAST((SELECT coalesce(sum(c), 0) FROM cm
                               WHERE ti = pi) AS BIGINT) AS agree,
                         CAST((SELECT sum(CAST(rc AS DECIMAL(38,0)) * cc)
                               FROM marg) AS DECIMAL(38,0)) AS pe_num)
          SELECT n, agree,
                 CAST(((CAST(n AS DECIMAL(38,0)) * agree - pe_num) * 1000000)
                      div (CAST(n AS DECIMAL(38,0)) * n - pe_num)
                      AS BIGINT) AS kappa_ppm
          FROM agg""")
      },
      """WITH d AS (SELECT doc_id,
                           (strpos('de en es fr zh', lang) + 2) // 3 - 1 AS ti
                    FROM documents),
         p AS (SELECT ti, CASE WHEN doc_id % 10 < 7 THEN ti
                               ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
               FROM d),
         cm AS (SELECT ti, pi, CAST(count(*) AS BIGINT) AS c
                FROM p GROUP BY 1, 2),
         marg AS (SELECT coalesce(r.ti, co.pi) AS cl,
                         coalesce(r.rc, 0) AS rc, coalesce(co.cc, 0) AS cc
                  FROM (SELECT ti, sum(c) AS rc FROM cm GROUP BY 1) r
                  FULL OUTER JOIN
                       (SELECT pi, sum(c) AS cc FROM cm GROUP BY 1) co
                    ON r.ti = co.pi),
         agg AS (SELECT CAST((SELECT sum(c) FROM cm) AS BIGINT) AS n,
                        CAST((SELECT coalesce(sum(c), 0) FROM cm
                              WHERE ti = pi) AS BIGINT) AS agree,
                        CAST((SELECT sum(CAST(rc AS HUGEINT) * cc)
                              FROM marg) AS HUGEINT) AS pe_num)
         SELECT n, agree,
                CAST(((CAST(n AS HUGEINT) * agree - pe_num) * 1000000)
                     // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT)
                  AS kappa_ppm
         FROM agg"""),

    // Q232: McNemar's paired test — comparing two model versions on
    // the SAME eval set, which is what a fine-tune loop actually does
    // (two marginal accuracies can be equal while the models disagree
    // on every example). Only the discordant cells matter:
    // b = A right ∧ B wrong, c = A wrong ∧ B right; the χ² statistic
    // (b−c)²/(b+c) is emitted in exact ppm — one conditional
    // aggregate over the corpus, one row out, no continuity-correction
    // floats. The two synthetic rules are non-nested by construction
    // (A correct on residues 0-6, B on 3-9) so both discordant cells
    // are exercised.
    "q232_mcnemar_paired" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q232_documents")
        s.sql("""
          WITH d AS (SELECT doc_id,
                            (instr('de en es fr zh', lang) + 2) div 3 - 1 AS ti
                     FROM g_q232_documents),
          p AS (SELECT ti,
                       CASE WHEN doc_id % 10 < 7 THEN ti
                            ELSE (ti + 1 + doc_id % 3) % 5 END AS pa,
                       CASE WHEN doc_id % 10 >= 3 THEN ti
                            ELSE (ti + 2 + doc_id % 3) % 5 END AS pb
                FROM d),
          c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(count(CASE WHEN pa = ti AND pb <> ti THEN 1 END)
                            AS BIGINT) AS b,
                       CAST(count(CASE WHEN pa <> ti AND pb = ti THEN 1 END)
                            AS BIGINT) AS c
                FROM p)
          SELECT n, b, c,
                 CASE WHEN b + c = 0 THEN 0
                      ELSE ((b - c) * (b - c) * 1000000) div (b + c)
                 END AS mcnemar_ppm
          FROM c""")
      },
      """WITH d AS (SELECT doc_id,
                           (strpos('de en es fr zh', lang) + 2) // 3 - 1 AS ti
                    FROM documents),
         p AS (SELECT ti,
                      CASE WHEN doc_id % 10 < 7 THEN ti
                           ELSE (ti + 1 + doc_id % 3) % 5 END AS pa,
                      CASE WHEN doc_id % 10 >= 3 THEN ti
                           ELSE (ti + 2 + doc_id % 3) % 5 END AS pb
               FROM d),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(count(*) FILTER (WHERE pa = ti AND pb <> ti)
                           AS BIGINT) AS b,
                      CAST(count(*) FILTER (WHERE pa <> ti AND pb = ti)
                           AS BIGINT) AS c
               FROM p)
         SELECT n, b, c,
                CASE WHEN b + c = 0 THEN 0
                     ELSE ((b - c) * (b - c) * 1000000) // (b + c)
                END AS mcnemar_ppm
         FROM c""")
  )
}
