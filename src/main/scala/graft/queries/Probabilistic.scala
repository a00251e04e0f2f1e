package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bloom, Dsir, NgramLm, Sketches}

/** Probabilistic / model-fitting pipeline operators under the value
  * gate. All three use the md5-slice hash family, so the DuckDB oracle
  * rebuilds the exact probabilistic structure — set bits, counter
  * collisions, smoothing floors — and the approximation itself is
  * hash-compared, not just spot-checked (the q56/q71 gating idea).
  *
  * q95: Bloom prefilter — membership superset vs the exact semi-join,
  *      false positives counted by the gate.
  * q96: Count-min frequency estimates over corpus bigrams — the
  *      min-of-d-counters arithmetic replayed from exact counts.
  * q97: Bigram-LM quality scores — the perplexity-filter stage on
  *      engine-portable integer scores.
  */
object Probabilistic {

  // deliberately undersized (256 bits for a ~70-key blocklist at
  // sf0.01) so the gate EXERCISES false positives: n_bloom_pass >
  // n_exact rows prove the oracle replays the bloom's actual FP set,
  // not just the happy path. Production sizing is Bloom.prefilter's
  // m = 1<<20 default (~1.2 bits... see Bloom scaladoc).
  private val BloomM = 256
  private val BloomK = 3
  private val BlockThreshold = 600L

  private val CmsD = 3
  private val CmsW = 256
  private val CmsMinCount = 40L

  private val LmMinCount = 2L
  private val PplBuckets = 3

  // deliberately coarse (4096 buckets for ~30k+ distinct bigrams at
  // sf0.01) so the gate EXERCISES hash collisions: the oracle must
  // rebuild the collided bucket-count tables, not the per-gram truth —
  // the q95/q96 undersizing idea applied to the DSIR hashing trick.
  private val DsirBuckets = 4096

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom-filter prefilter: big-side events tested against a bit
    // array built from the high-spend user blocklist. The gate counts,
    // per event type, total rows, bloom survivors, and exact members —
    // proving no false negative (n_bloom_pass >= n_exact) and charging
    // the bloom for every false positive it lets through.
    "q95_bloom_prefilter" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val bl = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(sum(floor($"value")).cast("long").as("sv"))
        .filter($"sv" > BlockThreshold)
        .select($"user_id")
      val words = Bloom.build(bl, $"user_id", BloomM, BloomK)
      ev.withColumn("bloom_pass",
          Bloom.mightContain($"user_id", words, BloomM, BloomK))
        .join(bl.withColumn("is_member", lit(1)), Seq("user_id"), "left")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"bloom_pass", 1L).otherwise(0L)).as("n_bloom_pass"),
          sum(when($"is_member".isNotNull, 1L).otherwise(0L)).as("n_exact"))
        .orderBy($"event_type")
    },

    // Count-min sketch: frequency estimates for the corpus's frequent
    // bigrams from a 3×256 counter matrix. n_est >= n_exact always;
    // the overestimate equals the colliding mass, which the oracle
    // recomputes counter-by-counter.
    "q96_cms_freq" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.loadParallel(s, dir, "documents")
      val bi = NgramLm.bigrams(docs, "doc_id", "text").select($"bg")
      val counts = Sketches.cmsBuild(bi, $"bg", CmsD, CmsW)
      bi.groupBy($"bg").agg(count(lit(1)).as("n_exact"))
        .filter($"n_exact" >= CmsMinCount)
        .withColumn("n_est", Sketches.cmsEstimate($"bg", counts, CmsD, CmsW))
        .orderBy($"bg")
    },

    // Bigram-LM scoring: per-document integer LM scores against the
    // corpus-fit add-one model with the count floor that keeps the
    // model broadcastable.
    "q97_lm_score" -> { (s, dir) =>
      NgramLm.scoreDocs(Tables.load(s, dir, "documents"),
          "doc_id", "text", LmMinCount)
        .orderBy(col("doc_id"))
    },

    // CCNet-style perplexity bucketing: every scored doc assigned to
    // head/middle/tail (0/1/2) by threshold-on-the-score over the
    // integer LM-mean distribution — the only global pass runs over
    // the distinct-score distribution, never a corpus-wide total order
    "q115_ppl_buckets" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      NgramLm.perplexityBuckets(docs, "doc_id", "text", LmMinCount, PplBuckets)
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
        .select($"doc_id", $"source", $"lm_mean", $"bucket")
        .orderBy($"doc_id")
    },

    // token-budget subset selection: fill 6/10 of the corpus tokens
    // with the best lm_mean-scored docs; the cutoff comes from the
    // score distribution (q115's no-global-sort trick) and only the
    // single boundary score group needs doc-granular packing
    "q120_token_budget" -> { (s, dir) =>
      import s.implicits._
      val scored = NgramLm.scoreDocs(Tables.load(s, dir, "documents"),
          "doc_id", "text", LmMinCount)
        .select($"doc_id", $"lm_mean", ($"n_bigrams" + 1L).as("n_tokens"))
      graft.operators.Sampling.tokenBudgetSelect(scored,
          "doc_id", "lm_mean", "n_tokens", budgetNum = 6L, budgetDen = 10L)
        .orderBy($"doc_id")
    },

    // DSIR importance weighting: src0 documents play the target
    // domain/eval set, the rest are the raw corpus; every raw doc gets
    // the integer hashed-bigram importance a DSIR selection run ranks
    // and samples by. Collision-heavy bucket count (see DsirBuckets)
    // puts the hashing trick itself under the hash gate.
    "q107_dsir_weights" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.loadParallel(s, dir, "documents")
      Dsir.importanceWeights(
          docs.filter($"source" =!= "src0"),
          docs.filter($"source" === "src0"),
          buckets = DsirBuckets)
        .orderBy($"doc_id")
    }
  )

  /** The three md5-slice probes of hex column `h`, as DuckDB SQL. */
  private def duckProbe(h: String, i: Int, m: Int): String =
    Bloom.positionDuck(h, i, m)

  /** The q97 bigram-LM per-(doc, bigram) integer score chain — the CTE
    * prefix shared by the q97 gate and the q115 bucketing gate. Ends
    * at the `q` CTE so callers append either a final SELECT or more
    * CTEs after a comma.
    */
  private val lmScoreCore: String =
    s"""WITH uni AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |u AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
       |v AS (SELECT CAST(count(*) AS BIGINT) AS vs FROM u),
       |wd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |       WHERE len(string_split(text, ' ')) >= 2),
       |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |         i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM wd),
       |m AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM bi
       |      GROUP BY 1 HAVING count(*) >= $LmMinCount),
       |q AS (SELECT bi.doc_id,
       |        CAST(floor(1000000 * (coalesce(m.c12, 0) + 1) /
       |                   (u.c1 + v.vs)) AS BIGINT) AS q
       |      FROM bi LEFT JOIN m ON bi.bg = m.bg
       |      JOIN u ON u.w = string_split(bi.bg, ' ')[1]
       |      CROSS JOIN v)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q95_bloom_prefilter" ->
      s"""WITH bl AS (SELECT user_id FROM events WHERE event_type = 'purchase'
         |            GROUP BY 1 HAVING sum(floor(value)) > $BlockThreshold),
         |blh AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM bl),
         |bits AS (SELECT DISTINCT
         |    (CAST(('0x' || substr(h, 1 + 8 * t.i, 8)) AS BIGINT) % $BloomM) AS pos
         |  FROM blh CROSS JOIN (VALUES (0), (1), (2)) t(i)),
         |c AS (SELECT event_type, user_id,
         |        md5(CAST(user_id AS VARCHAR)) AS h FROM events),
         |p AS (SELECT event_type, user_id,
         |        (${duckProbe("h", 0, BloomM)} IN (SELECT pos FROM bits)
         |     AND ${duckProbe("h", 1, BloomM)} IN (SELECT pos FROM bits)
         |     AND ${duckProbe("h", 2, BloomM)} IN (SELECT pos FROM bits)) AS pass
         |      FROM c)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
         |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM bl)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q96_cms_freq" ->
      s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
         |           WHERE len(string_split(text, ' ')) >= 2),
         |bi AS (SELECT unnest(list_transform(range(1, len(ws)),
         |         i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM w),
         |t AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
         |ph AS (SELECT bg, c, md5(bg) AS h FROM t),
         |probes AS (SELECT bg, c, t2.i,
         |    (CAST(('0x' || substr(h, 1 + 8 * t2.i, 8)) AS BIGINT) % $CmsW) AS pos
         |  FROM ph CROSS JOIN (VALUES (0), (1), (2)) t2(i)),
         |counters AS (SELECT i, pos, sum(c) AS tot FROM probes GROUP BY 1, 2),
         |est AS (SELECT p.bg, min(ct.tot) AS e
         |        FROM probes p JOIN counters ct ON p.i = ct.i AND p.pos = ct.pos
         |        GROUP BY 1)
         |SELECT t.bg AS bg, t.c AS n_exact, CAST(est.e AS BIGINT) AS n_est
         |FROM t JOIN est ON t.bg = est.bg
         |WHERE t.c >= $CmsMinCount ORDER BY 1""".stripMargin,

    "q97_lm_score" ->
      s"""$lmScoreCore
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(q) AS BIGINT) AS lm_sum,
         |  CAST(sum(q) // count(*) AS BIGINT) AS lm_mean
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q97 score chain, then the threshold-on-score bucket rule
    // replayed over the score distribution: bucket = min(nb-1,
    // floor(nb * n_strictly_better / n)) per distinct lm_mean
    "q115_ppl_buckets" ->
      s"""$lmScoreCore,
         |sc AS (SELECT doc_id, CAST(sum(q) // count(*) AS BIGINT) AS lm_mean
         |       FROM q GROUP BY 1),
         |d AS (SELECT lm_mean, CAST(count(*) AS BIGINT) AS cnt FROM sc GROUP BY 1),
         |nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM d),
         |b AS (SELECT lm_mean,
         |        CAST(least(${PplBuckets - 1},
         |          ($PplBuckets * coalesce(sum(cnt) OVER (ORDER BY lm_mean DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) // nt.n)
         |          AS INT) AS bucket
         |      FROM d CROSS JOIN nt)
         |SELECT sc.doc_id, doc.source, sc.lm_mean, b.bucket
         |FROM sc JOIN b USING (lm_mean)
         |JOIN documents doc ON doc.doc_id = sc.doc_id
         |ORDER BY sc.doc_id""".stripMargin,

    // budget replay: the same distribution windows, the same single
    // boundary-group doc packing, all integer
    "q120_token_budget" ->
      s"""$lmScoreCore,
         |sc AS (SELECT doc_id, CAST(count(*) + 1 AS BIGINT) AS n_tokens,
         |        CAST(sum(q) // count(*) AS BIGINT) AS lm_mean
         |       FROM q GROUP BY 1),
         |d AS (SELECT lm_mean AS s, CAST(sum(n_tokens) AS BIGINT) AS st
         |      FROM sc GROUP BY 1),
         |g AS (SELECT s, st,
         |        CAST(coalesce(sum(st) OVER (ORDER BY s DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS cum_before,
         |        CAST(sum(st) OVER () AS BIGINT) AS total
         |      FROM d),
         |g2 AS (SELECT s, cum_before, (6 * total) // 10 AS budget,
         |         (cum_before + st <= (6 * total) // 10) AS keep_all,
         |         (cum_before < (6 * total) // 10
         |          AND cum_before + st > (6 * total) // 10) AS boundary
         |       FROM g),
         |f AS (SELECT sc.doc_id, sc.lm_mean, sc.n_tokens,
         |        CASE WHEN g2.keep_all THEN TRUE
         |             WHEN g2.boundary THEN
         |               g2.cum_before
         |                 + coalesce(sum(sc.n_tokens) OVER (
         |                     PARTITION BY sc.lm_mean ORDER BY sc.doc_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                 + sc.n_tokens <= g2.budget
         |             ELSE FALSE END AS kept
         |      FROM sc JOIN g2 ON sc.lm_mean = g2.s)
         |SELECT doc_id, lm_mean, n_tokens, kept FROM f
         |ORDER BY doc_id""".stripMargin,

    "q107_dsir_weights" ->
      s"""WITH rawd AS (SELECT doc_id, string_split(text, ' ') AS ws
         |              FROM documents WHERE source <> 'src0'
         |                AND len(string_split(text, ' ')) >= 2),
         |tgtd AS (SELECT string_split(text, ' ') AS ws
         |         FROM documents WHERE source = 'src0'
         |           AND len(string_split(text, ' ')) >= 2),
         |rg AS (SELECT doc_id,
         |         (CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT)
         |          % $DsirBuckets) AS bucket
         |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |               i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM rawd)),
         |tg AS (SELECT
         |         (CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT)
         |          % $DsirBuckets) AS bucket
         |       FROM (SELECT unnest(list_transform(range(1, len(ws)),
         |               i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM tgtd)),
         |rb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM rg GROUP BY 1),
         |tb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tg GROUP BY 1),
         |model AS (SELECT rb.bucket, rb.cr, coalesce(tb.ct, 0) AS ct
         |          FROM rb LEFT JOIN tb USING (bucket)),
         |sc AS (SELECT rg.doc_id,
         |         ((1000000 * (model.ct + 1)) // (model.cr + 1)) AS q
         |       FROM rg JOIN model USING (bucket))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(q) AS BIGINT) AS importance,
         |  CAST(sum(q) // count(*) AS BIGINT) AS imp_mean
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
