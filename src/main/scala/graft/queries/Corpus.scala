package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Sampling, Sketches, TextAnalysis, TextDedup, Tokenizer}

/** Corpus-curation queries (round 4): repetition signals, PII-style
  * scrubbing, benchmark decontamination, boilerplate discovery, sketch
  * cardinalities, weighted sampling. Every query is backed by an
  * operator in `graft.operators` and replayed bit-for-bit by a DuckDB
  * oracle (hash-uniform draws via the shared md5-prefix u01, integer
  * sums instead of cross-engine float averages).
  */
object Corpus {

  private val u01 = Sampling.u01Duck("h")

  // shared by q101 (inline benchmark scan) and q139 (persisted window
  // index): both paths must hash-match the same definition
  private val substrDecontamSql: String =
    """WITH ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
      |    FROM (SELECT text,
      |            unnest(generate_series(1, length(text) - 39)) AS i
      |          FROM documents WHERE source = 'src0')),
      |tr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |         substr(text, CAST(i AS INT), 40) AS g
      |       FROM (SELECT doc_id, text,
      |               unnest(generate_series(1, length(text) - 39)) AS i
      |             FROM documents WHERE source <> 'src0'))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
      |       CAST(count(DISTINCT g) AS BIGINT) AS n_grams,
      |       CAST(min(pos) AS BIGINT) AS first_pos
      |FROM tr WHERE g IN (SELECT g FROM ev)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // DuckDB word-n-gram list of ws (1-indexed; range(a,b) excludes b)
  private def duckGramsN(n: Int): String = {
    val join = (0 until n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len(ws) - ${n - 2}), i -> $join))"
  }
  private val duckGrams3 = duckGramsN(3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_repetition" -> { (s, dir) =>
      TextAnalysis.repetitionStats(Tables.load(s, dir, "documents"))
    },

    // numeric-scrub flavor of PII redaction over the JSON props column
    // (the synthetic corpus carries no email/phone-shaped tokens; the
    // pattern machinery is identical — PiiPatterns are exercised in
    // TextAnalysisSpec on adversarial strings)
    "q69_scrub" -> { (s, dir) =>
      import s.implicits._
      TextAnalysis.redactPattern(
          Tables.load(s, dir, "events"), "props", "[0-9]+", "#")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"props_n_redactions").as("sum_redactions"),
          sum(length($"props_redacted")).as("sum_scrubbed_len"),
          min($"props_redacted").as("min_scrubbed"),
          max($"props_redacted").as("max_scrubbed"))
        .orderBy($"event_type")
    },

    // decontamination report: src0 plays the eval benchmark, every
    // other source is checked for 3-gram overlap against it
    "q70_contamination" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.contaminationStats(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), n = 3)
    },

    // Misra–Gries heavy hitters: bounded-memory frequent terms (the
    // 100 TB "top words" shape — capacity entries per partial state
    // over the wire instead of shuffling every distinct term). Gated
    // in the sub-capacity regime where MG is provably exact (the
    // corpus vocabulary < capacity, like KMV below saturation); the
    // SketchesSpec covers the decrement/lower-bound regime.
    "q81_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(split($"text", " ")).as("term"))
        .agg(Sketches.heavyHitters($"term", 64).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e._1".as("term"), $"e._2".as("n"))
        .orderBy($"n".desc, $"term")
        .limit(10)
    },

    // KMV sketch vs exact count-distinct, side by side: the oracle
    // recomputes the sketch estimate from the same hash prefix, so a
    // hash-match proves the mergeable aggregation path (partial state
    // per partition -> merge -> finish) computes the textbook estimator
    "q71_distinct_sketch" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .withColumn("h", md5($"o_custkey".cast("string").cast("binary")))
        .withColumn("u", expr(Sampling.u01Spark("h")))
        .groupBy($"o_orderstatus")
        .agg(Sketches.kmvDistinct($"u", 64).as("est_distinct"),
          countDistinct($"o_custkey").as("exact_distinct"),
          count(lit(1)).as("n_rows"))
        .orderBy($"o_orderstatus")
    },

    // KMV set operations across sources (Beyer et al. 2007): per-pair
    // union/intersection/Jaccard estimates from k=64 doubles per
    // source — the "how much does X overlap Y" corpus audit without a
    // distinct-key shuffle join. Exact truths ride along like q71's
    // exact_distinct; the oracle replays sketches, merge, every
    // estimate AND the exacts from the same md5 hex.
    "q126_kmv_setops" -> { (s, dir) =>
      import s.implicits._
      val d = Tables.load(s, dir, "orders")
        .select($"o_orderstatus".as("src"), $"o_custkey".as("key")).distinct()
      val withU = d
        .withColumn("h", md5($"key".cast("string").cast("binary")))
        .withColumn("u", expr(Sampling.u01Spark("h")))
      val est = Sketches.kmvSetOps(withU, "src", $"u", k = 64)
      val ex = d.as("x").join(d.as("y"),
          $"x.key" === $"y.key" && $"x.src" < $"y.src")
        .groupBy($"x.src".as("src_a"), $"y.src".as("src_b"))
        .agg(count(lit(1)).as("exact_inter"))
      val sizes = d.groupBy($"src").agg(count(lit(1)).as("n"))
      est.join(ex, Seq("src_a", "src_b"), "left")
        .join(sizes.select($"src".as("src_a"), $"n".as("na")), Seq("src_a"))
        .join(sizes.select($"src".as("src_b"), $"n".as("nb")), Seq("src_b"))
        .select($"src_a", $"src_b", $"k_used", $"union_est", $"overlap",
          $"jaccard_est", $"inter_est",
          coalesce($"exact_inter", lit(0L)).as("exact_inter"),
          ($"na" + $"nb" - coalesce($"exact_inter", lit(0L))).as("exact_union"))
        .orderBy($"src_a", $"src_b")
    },

    // HLL registers + integer-exact raw estimate vs exact distinct,
    // side by side with q71's KMV: every register derives from md5
    // bits and the estimator is pure integer division, so the oracle
    // rebuilds the full 64-register state AND the estimate — the
    // sketch structure itself sits under the hash gate. Registers are
    // comma-joined to a scalar string: the driver's pandas comparator
    // cannot hash array-typed cells (Verify asserts no gated query
    // emits array/struct/map output).
    "q119_hll_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .withColumn("h", md5($"o_custkey".cast("string").cast("binary")))
        .groupBy($"o_orderstatus")
        .agg(Sketches.hllSketch($"h").as("hll"),
          countDistinct($"o_custkey").as("exact_distinct"),
          count(lit(1)).as("n_rows"))
        .select($"o_orderstatus",
          array_join($"hll.registers".cast("array<string>"), ",")
            .as("registers"),
          $"hll.zint".as("zint"), $"hll.est".as("est_distinct"),
          $"exact_distinct", $"n_rows")
        .orderBy($"o_orderstatus")
    },

    // bottom-k-by-hash quantile sketch vs row count, side by side —
    // the one-pass mergeable scale path next to q64's exact two-pass
    // percentiles. The sample is the k rows with the smallest
    // (hash-uniform, value) keys — deterministic and
    // partitioning-invariant — so the oracle recomputes the identical
    // sample and the identical discrete-percentile picks, proving the
    // partial/merge/finish aggregation path end to end.
    "q89_quantile_sketch" -> { (s, dir) =>
      import s.implicits._
      Tables.loadParallel(s, dir, "lineitem")
        .withColumn("h", md5(concat($"l_orderkey".cast("string"), lit(":"),
          $"l_linenumber".cast("string")).cast("binary")))
        .withColumn("u", expr(Sampling.u01Spark("h")))
        .groupBy($"l_returnflag")
        .agg(Sketches.quantileSketch($"u", $"l_extendedprice",
            k = 100, ps = Seq(0.5, 0.95)).as("qs"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag", $"qs" (0).as("p50_est"),
          $"qs" (1).as("p95_est"), $"n_rows")
        .orderBy($"l_returnflag")
    },

    // tokenizer-training primitive: round-1 BPE pair statistics (the
    // vocab-sized aggregation that every merge round repeats) over the
    // corpus word-frequency table. Char-level round 1 is exactly
    // SQL-expressible — each adjacent pair is a 2-char substring — so
    // the oracle reproduces the identical counts and the identical
    // (count desc, pair asc) merge-priority order; the multi-round
    // loop (argmax → merge → recount) rides on the same pairCounts and
    // is fixture-tested in TokenizerSpec
    "q91_bpe_pairs" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wf = Tokenizer.wordFreqs(Tables.load(s, dir, "documents"))
      val pc = Tokenizer.pairCounts(
          wf.select($"freq", expr("split(word, '')").as("syms")))
        .select(concat($"left", $"right").as("pair"), $"pair_count")
      // round-1 symbols are single chars, so concat(left, right) is
      // injective and (count desc, pair asc) is a total order
      val w = Window.orderBy($"pair_count".desc, $"pair".asc)
      pc.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 20)
        .select($"rank", $"pair", $"pair_count")
        .orderBy($"rank")
    },

    // the FULL multi-round BPE training loop (50 merges), gated
    // end-to-end: the oracle unrolls all 50 rounds in SQL (each round
    // = pair-count aggregation + deterministic argmax + greedy merge
    // application on a sentinel-wrapped symbol string, where
    // left-to-right non-overlapping replace() IS greedy BPE merge), so
    // the hash gate proves every round's argmax, tie-break and merge
    // application — not just round 1 like q91. At test vocab size this
    // runs the driver-local merge loop; TokenizerSpec asserts local ≡
    // distributed on the same data.
    "q105_bpe_train" -> { (s, dir) =>
      import s.implicits._
      Tokenizer.bpeTrainMerges(Tables.load(s, dir, "documents"), nMerges = 50)
        .select($"rank".cast("int").as("rank"), $"left", $"right",
          $"merged", $"pair_count")
        .orderBy($"rank")
    },

    // the APPLY side of BPE at a four-digit merge count: train 1000
    // word-level merges (symbols = words, one sequence per document —
    // the pre-tokenized shape real trainers consume, and the only one
    // with ≥1000 trainable merges on this corpus), then segment every
    // sequence with the rank-map applier whose per-item cost is
    // independent of table size — the production shape for a 30k-merge
    // vocabulary. The recursive-CTE oracle independently re-derives
    // all 1000 training rounds AND their rank-order application, so
    // the hash gate proves fast-applier ≡ rank-order semantics.
    "q109_bpe_segment" -> { (s, dir) =>
      import s.implicits._
      val seqs = Tables.loadParallel(s, dir, "documents")
        .filter($"doc_id" % 10 === 0)
        .select($"doc_id",
          expr("filter(split(text, ' '), w -> length(w) > 0)").as("syms"))
      // merge table trained ONCE per process (SharedArtifacts) — the
      // timed query is the apply side, which is what q109 gates; the
      // training loop itself is q105/q91's gate
      val mt = s.read.parquet(
        SharedArtifacts.bpeMergeTablePath(s, dir, nMerges = 1000))
      val seg = Tokenizer.bpeApplierSymbols(mt)
      seqs.select($"doc_id", seg($"syms").as("toks"))
        .select($"doc_id", size($"toks").cast("long").as("n_tokens"),
          md5(concat_ws("\u0002", $"toks").cast("binary")).as("fp"))
        .orderBy($"doc_id")
    },

    "q72_weighted_sample" -> { (s, dir) =>
      import s.implicits._
      Sampling.weightedTopK(Tables.load(s, dir, "documents"),
          "source", "doc_id", "n_chars", k = 3)
        .select($"source", $"doc_id")
        .orderBy($"source", $"doc_id")
    },

    "q73_boilerplate" -> { (s, dir) =>
      TextAnalysis.hotNgrams(Tables.load(s, dir, "documents"), n = 3, topK = 10)
    },

    // near-dup-leakage-safe split: every member of a dup cluster bands
    // on the cluster representative instead of its own id, so
    // near-duplicates can never straddle train/test (the eval-leakage
    // channel a per-doc split leaves open). The oracle recomputes the
    // closure labels AND the re-keyed bands, so the gate proves the
    // clustered docs really did move to their representative's band;
    // SamplingSpec asserts the no-straddle property directly.
    "q108_leakage_safe_split" -> { (s, dir) =>
      import s.implicits._
      Sampling.leakageSafeSplit(Tables.load(s, dir, "documents"),
          SharedArtifacts.lshPairs(s, dir), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"),
          sum($"n_chars").as("sum_chars"))
        .orderBy($"split")
    },

    // deterministic train/val/test split: band membership is a pure
    // function of md5(doc_id), replayed exactly by the oracle
    "q52_split_assign" -> { (s, dir) =>
      import s.implicits._
      Sampling.assignSplit(Tables.load(s, dir, "documents"), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"),
          sum($"n_chars").as("sum_chars"))
        .orderBy($"split")
    },

    // deterministic shard layout: the oracle recomputes shard AND the
    // exact within-shard order (pos x id fingerprint pins permutations)
    "q54_shard_assign" -> { (s, dir) =>
      import s.implicits._
      Sampling.assignShards(Tables.load(s, dir, "documents"), "doc_id", nShards = 8)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"),
          max($"shard_pos").as("max_pos"),
          sum($"shard_pos" * $"doc_id").as("order_fingerprint"))
        .orderBy($"shard")
    },

    // context-length chunking: every chunk's exact text is pinned by
    // its md5, so the oracle checks content, boundaries and numbering
    "q74_chunking" -> { (s, dir) =>
      import s.implicits._
      TextAnalysis.chunkByTokens(Tables.load(s, dir, "documents"),
          chunkTokens = 32, overlap = 8)
        .select($"doc_id", $"chunk_no", $"n_chunk_tokens",
          md5($"chunk".cast("binary")).as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_no")
    },

    // dup-cluster resolution: connected components over the verified
    // MinHash near-dup pairs (same pair set the q21 oracle defines,
    // materialized once per process — see SharedArtifacts); the
    // recursive-CTE oracle proves the distributed label-propagation
    // fixpoint equals the true transitive closure
    "q75_dup_clusters" -> { (s, dir) =>
      graft.operators.Components.dupClusters(SharedArtifacts.lshPairs(s, dir))
    },

    // fixed-point integer PageRank over the verified near-dup graph:
    // the oracle unrolls all 5 damped iterations in SQL from the same
    // q21 pair definition, so the gate pins degree tables, every
    // iteration's truncating-division mass passing, and the final
    // centrality ranking
    "q118_pagerank" -> { (s, dir) =>
      graft.operators.Components.pageRank(
        SharedArtifacts.lshPairs(s, dir), iters = PageRankIters)
    },

    // temperature-scaled source mixture weights (sqrt curve, exact
    // cross-engine — see the operator's determinism note)
    "q53_mixture_weights" -> { (s, dir) =>
      Sampling.temperatureWeights(Tables.load(s, dir, "documents"),
        "source", "n_chars")
    },

    // corpus length profile in exact power-of-two buckets
    "q58_length_histogram" -> { (s, dir) =>
      TextAnalysis.lengthLogHistogram(Tables.load(s, dir, "documents"), "n_chars")
    },

    // inter-source duplication matrix: verified near-dup pairs counted
    // by unordered source pair — the cross-crawl-snapshot overlap audit
    "q59_cross_source_dup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pairs = SharedArtifacts.lshPairs(s, dir)
      val src = docs.select($"doc_id", $"source")
      pairs.join(src.as("sa"), $"doc_a" === $"sa.doc_id")
        .join(src.as("sb"), $"doc_b" === $"sb.doc_id")
        .select(least($"sa.source", $"sb.source").as("source_x"),
          greatest($"sa.source", $"sb.source").as("source_y"))
        .groupBy($"source_x", $"source_y").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"source_x", $"source_y")
    },

    // the full curation pipeline in one gated composition: quality gate
    // -> cluster-level near-dup removal -> eval-set decontamination ->
    // deterministic split assignment -> per-split stats. One oracle
    // over the whole chain proves the round-5 operators compose without
    // drift (the q36 principle, extended to the curation stages)
    "q76_curate_e2e" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.load(s, dir, "documents")
      // 5-gram decontamination: the synthetic corpus draws from a small
      // vocabulary, so 3-grams saturate (every doc shares one with a
      // 500-doc benchmark at sf0.1 — the empty-result degenerate);
      // 5-grams keep the overlap contamination-specific at every SF
      graft.operators.Curation.curate(
          all.filter($"source" =!= "src0"), all.filter($"source" === "src0"),
          contaminationNgram = 5)
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("sum_ids"),
          sum($"n_tokens").as("sum_tokens"))
        .orderBy($"split")
    },

    // cluster-level dedup APPLY: keep each near-dup cluster's minimum
    // doc_id (plus all unclustered docs). This is the keep policy q75's
    // components exist for — and it differs from q28's pairwise
    // drop-every-doc_b rule, which under-drops when a cluster's members
    // only touch through a third doc
    "q57_cluster_dedup_apply" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val pairs = SharedArtifacts.lshPairs(s, dir)
      val drop = graft.operators.Components.dupClusters(pairs)
        .filter($"doc_id" =!= $"component").select($"doc_id")
      docs.join(drop, Seq("doc_id"), "left_anti")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("sum_kept_ids"))
        .orderBy($"source")
    },

    // quality-aware keep policy over the SAME clusters: keep the dup
    // cluster's LONGEST document (score = n_chars, ties → smallest
    // id) with the winning doc as the per-row witness — the policy
    // production dedup actually wants (q57 keeps the smallest id).
    // Singletons are their own component and always kept.
    "q134_quality_keep" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Components.keepBestInCluster(
          SharedArtifacts.lshPairs(s, dir),
          Tables.load(s, dir, "documents").select($"doc_id", $"n_chars"),
          idCol = "doc_id", scoreCol = "n_chars")
        .orderBy($"doc_id")
    },

    // Gopher/C4-family rule-based quality gate: five integer-exact
    // rules (ratio thresholds cross-multiplied away) in one narrow
    // projection — the pure map stage that pipelines with the scan
    "q100_gopher_rules" -> { (s, dir) =>
      TextAnalysis.gopherRules(Tables.load(s, dir, "documents"))
    },

    // char-level exact-substring decontamination (Lee et al. 2021
    // discipline): src0 again plays the eval benchmark; any 40-char
    // window of a training doc found verbatim in src0 flags it. The
    // char windows catch what q70's word-3-gram overlap misses.
    "q101_substr_decontam" -> { (s, dir) =>
      val docs = Tables.loadParallel(s, dir, "documents")
      graft.operators.TextDedup.substringMatches(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), windowChars = 40)
    },

    // the APPLY side of q101 (decontamination's q131): instead of
    // dropping a contaminated doc, CUT the leaked windows — each match
    // position padded 20 chars both ways, clamped to the doc, and the
    // per-doc removal is the interval UNION (consecutive match
    // positions overlap by construction). The oracle replays every
    // window match, the clamping and the union arithmetic; zero-hit
    // docs appear with zeros (the manifest covers the corpus).
    "q168_decontam_apply" -> { (s, dir) =>
      val docs = Tables.loadParallel(s, dir, "documents")
      graft.operators.TextDedup.decontamSpanRemovalStats(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        windowChars = 40, padChars = 20)
    },

    // the REWRITE consuming q168's manifest: the cut corpus itself —
    // contaminated docs re-emitted with their removal intervals
    // excised (ordered concatenation of the kept complement),
    // untouched docs byte-identical. The oracle rebuilds every clean
    // text with string_agg over the same complement arithmetic, so
    // the hash match proves the rewrite character-for-character.
    "q170_decontam_rewrite" -> { (s, dir) =>
      val docs = Tables.loadParallel(s, dir, "documents")
      graft.operators.TextDedup.decontamRewrite(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        windowChars = 40, padChars = 20)
    },

    // index-backed decontamination: q101's exact semantics probed
    // against a PERSISTED benchmark window index (the q77/q84
    // maintenance pattern — eval sets change rarely, ingest batches
    // probe a standing index instead of rescanning the benchmark).
    // Gate = q101's oracle verbatim: the index path must be
    // result-identical to the inline scan.
    "q139_decontam_index" -> { (s, dir) =>
      val path = SharedArtifacts.substringIndexPath(s, dir, windowChars = 40)
      graft.operators.TextDedup.substringMatchesIndexed(
        Tables.loadParallel(s, dir, "documents")
          .filter(col("source") =!= "src0"),
        path, windowChars = 40)
    },

    // MULTI-eval-set decontamination against the VERSIONED index
    // lifecycle (r11 directive 9): src0 and src1 are two benchmark
    // suites in one standing index (built v0 → O(batch) append →
    // compact to v1 with the atomic pointer flip — see
    // SharedArtifacts.substringIndexSetsPath); one probe pass reports
    // per-(doc, suite) hit stats. The oracle recomputes both suites'
    // window sets inline, so the hash match proves the whole lifecycle
    // — append dedup, compaction, pointer — changed nothing semantic.
    "q142_decontam_index_sets" -> { (s, dir) =>
      val path = SharedArtifacts.substringIndexSetsPath(s, dir, windowChars = 40)
      graft.operators.TextDedup.substringMatchesIndexedSets(
        Tables.loadParallel(s, dir, "documents")
          .filter(!col("source").isin("src0", "src1")),
        path, windowChars = 40)
    },

    // record linkage: all customer-name pairs within edit distance 1,
    // mined by deletion-neighborhood blocking (equi-join candidates,
    // recall 1) + exact banded-levenshtein verify — gated against the
    // oracle's brute-force O(n²) levenshtein join, so the hash match
    // proves both recall and precision of the sub-quadratic plan
    "q102_fuzzy_pairs" -> { (s, dir) =>
      graft.operators.FuzzyMatch
        .editDistance1Pairs(Tables.loadParallel(s, dir, "customer"),
                            "c_custkey", "c_name")
        .orderBy(col("id_a"), col("id_b"))
    },

    // blocklist phrase scan: one Aho-Corasick pass per doc counts
    // every (possibly overlapping) char-level occurrence of every
    // pattern; the oracle replays it by brute-force position-by-
    // position substring comparison, so the hash match proves the
    // automaton's goto/fail/output construction end to end
    "q116_multi_pattern" -> { (s, dir) =>
      TextAnalysis.multiPatternCounts(
          Tables.load(s, dir, "documents"), AcPatterns)
        .orderBy(col("doc_id"), col("pattern"))
    },

    // token-exact concat-and-chunk training export: hash-sharded
    // stream order (the q54 assignment), then every document's exact
    // sequence span under seqLen=64 cutting. The per-shard
    // span_fingerprint sums first_seq*doc_id + last_seq, so the hash
    // match pins EVERY doc's boundary arithmetic, not just totals;
    // n_split_docs and tail_padding are the numbers a capacity plan
    // reads off (boundary-crossing rate, wasted tail tokens per shard)
    "q143_concat_chunk" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      val packed = Sampling.concatChunk(
        Sampling.assignShards(docs, "doc_id", nShards = 8),
        "n_tokens", seqLen = 64L, partitionCol = "shard", orderCol = "shard_pos")
      packed.groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          expr("(sum(n_tokens) + 63) div 64").as("n_seqs"),
          sum(when($"n_seqs_spanned" > 1L, 1L).otherwise(0L)).as("n_split_docs"),
          sum($"first_seq" * $"doc_id" + $"last_seq").as("span_fingerprint"))
        .withColumn("tail_padding", $"n_seqs" * 64L - $"n_tokens")
        .orderBy($"shard")
    },

    // q143 with ONE trailing EOS per document — what real packers
    // write. Every boundary after the first doc shifts; the rollup's
    // stream totals count the separators and the per-shard span
    // fingerprint pins the shifted arithmetic doc-for-doc
    "q156_concat_chunk_eos" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      val packed = Sampling.concatChunk(
        Sampling.assignShards(docs, "doc_id", nShards = 8),
        "n_tokens", seqLen = 64L, partitionCol = "shard",
        orderCol = "shard_pos", sepTokens = 1L)
      packed.groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          (sum($"n_tokens") + count(lit(1))).as("n_stream_tokens"),
          expr("(sum(n_tokens) + count(1) + 63) div 64").as("n_seqs"),
          sum(when($"n_seqs_spanned" > 1L, 1L).otherwise(0L)).as("n_split_docs"),
          sum($"first_seq" * $"doc_id" + $"last_seq").as("span_fingerprint"))
        .withColumn("tail_padding", $"n_seqs" * 64L - $"n_stream_tokens")
        .orderBy($"shard")
    },

    // snapshot diff for incremental ingestion: old = the documents
    // table, new = a deterministic rewrite (drop doc_id%7=0, edit
    // doc_id%5=0, re-add doc_id%11=0 under offset ids), both
    // fingerprinted scan-side by md5(text). fp_sum folds the md5
    // prefix of every surviving fingerprint into the gate, so the
    // hash match proves the full-outer classification AND the
    // fingerprints themselves, per status class. The fold is MODULAR
    // (sum of prefix % p, then % p): raw 52-bit prefixes overflow i64
    // past ~2 000 rows per status group — the sf1 smoke caught
    // exactly that — while the modular digest is safe to ~9e9 rows
    // per group and loses nothing as a change detector
    "q144_snapshot_diff" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val newSnap = docs.filter($"doc_id" % 7 =!= 0)
        .withColumn("text", when($"doc_id" % 5 === 0,
          concat($"text", lit(" v2"))).otherwise($"text"))
        .unionByName(docs.filter($"doc_id" % 11 === 0)
          .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
      def fp(df: DataFrame) = df.withColumn("fp", md5($"text".cast("binary")))
      graft.operators.SnapshotDiff.diff(fp(docs), fp(newSnap), "doc_id", "fp")
        .groupBy($"status")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_ids"),
          pmod(sum(expr(
            "pmod(cast(conv(substr(coalesce(new_fp, old_fp), 1, 13), 16, 10)" +
              " as bigint), 1000000007)")), lit(1000000007L))
            .as("fp_sum"))
        .orderBy($"status")
    },

    // the q144 diff MONETIZED: the snapshot delta (added + changed
    // new-side rows) probes the standing full-corpus MinHash index
    // (q77 machinery) — incremental ingestion dedup runs on the
    // delta, not the corpus. Re-added docs hit their originals at
    // jaccard 1.0, edited docs hit their own prior version just
    // below it; threshold 0.8 keeps every planted pair while staying
    // where 16x2 banding recall is ~1
    "q145_delta_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val newSnap = docs.filter($"doc_id" % 7 =!= 0)
        .withColumn("text", when($"doc_id" % 5 === 0,
          concat($"text", lit(" v2"))).otherwise($"text"))
        .unionByName(docs.filter($"doc_id" % 11 === 0)
          .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
      def fp(df: DataFrame) = df.withColumn("fp", md5($"text".cast("binary")))
      val delta = graft.operators.SnapshotDiff
        .delta(fp(docs), fp(newSnap), "doc_id", "fp")
        .select($"doc_id", $"text")
      val idxPath = SharedArtifacts.signatureIndexPath(s, dir,
        splitAt = 10000000L)
      TextDedup.nearDupsAgainstIndex(delta, idxPath, threshold = 0.8)
    },

    // q143's writer-side manifest: every (doc, sequence) SEGMENT with
    // its exact token intervals on both sides — the rows a sequence
    // writer and its provenance metadata consume. Output ∝ docs +
    // boundary crossings; the oracle replays the explode and the
    // interval arithmetic from the same cumsum
    "q146_chunk_manifest" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      val packed = Sampling.concatChunk(
        Sampling.assignShards(docs, "doc_id", nShards = 8),
        "n_tokens", seqLen = 64L, partitionCol = "shard", orderCol = "shard_pos")
      Sampling.chunkManifest(packed, "n_tokens", seqLen = 64L)
        .select($"shard", $"seq", $"doc_id", $"seg_doc_from", $"seg_doc_to",
          $"seg_seq_from", $"n_seg_tokens")
        .orderBy($"shard", $"seq", $"seg_seq_from")
    },

    // first-occurrence n-gram novelty: per doc, how many of its
    // distinct trigrams appear here FIRST in ingestion order — the
    // marginal-new-content signal for ranking sources / pruning crawl
    // dumps. Two gram-proportional aggregations, one doc-keyed join
    "q147_novelty" -> { (s, dir) =>
      import s.implicits._
      TextAnalysis.noveltyStats(Tables.loadParallel(s, dir, "documents"))
        .orderBy($"doc_id")
    },

    // q147 at INGEST TIME: the new batch (doc_id >= 250) probes the
    // standing distinct-gram index of the history — built on
    // doc_id < 200, extended to 250 via the O(batch) append, so the
    // gate covers build, append AND probe. Only the batch is ever
    // shingled; the oracle is full-corpus first-occurrence novelty
    // restricted to the batch, which the index path must equal exactly
    "q151_novelty_index" -> { (s, dir) =>
      import s.implicits._
      val path = SharedArtifacts.gramIndexPath(s, dir,
        buildAt = 200L, splitAt = 250L)
      TextAnalysis.noveltyAgainstIndex(
          Tables.loadParallel(s, dir, "documents").filter($"doc_id" >= 250),
          path)
        .orderBy($"doc_id")
    },

    // the INCREMENTAL ingest pipeline end-to-end: snapshot diff →
    // delta-only dedup against the standing MinHash index →
    // decontamination of the survivors against the src0 benchmark →
    // per-doc verdict (dup > contaminated > kept). The new snapshot
    // plants all three outcomes: %5 edits and %11 re-adds dedup
    // against their originals, 80-char src0 excerpts carry verbatim
    // benchmark windows but are NOT near-dups of the full docs, and
    // synthetic fresh docs (unique zz-words) survive both gates. Only
    // the delta is ever shingled — the corpus is reached through its
    // index; decontam probes only dedup survivors
    "q150_ingest_e2e" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", $"text")
      val base = all.select($"doc_id", $"text")
      val edits = base.filter($"doc_id" % 7 =!= 0)
        .withColumn("text", when($"doc_id" % 5 === 0,
          concat($"text", lit(" v2"))).otherwise($"text"))
      val readds = base.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      val contamAdds = all.filter($"source" === "src0" && $"doc_id" % 3 === 0)
        .select(($"doc_id" + 20000000L).as("doc_id"),
          substring($"text", 1, 80).as("text"))
      // two selects: in ONE select list the text expression's
      // $"doc_id" would lateral-alias-resolve to the renamed id
      // (Spark LCA prefers an earlier alias over the child column)
      val freshAdds = base.filter($"doc_id" % 17 === 0)
        .select($"doc_id",
          array_join(transform(sequence(lit(1), lit(25)),
            i => concat(lit("zz"), $"doc_id", lit("w"), i)), " ").as("text"))
        .select(($"doc_id" + 30000000L).as("doc_id"), $"text")
      val newSnap = edits.unionByName(readds)
        .unionByName(contamAdds).unionByName(freshAdds)
      def fp(df: DataFrame) = df.withColumn("fp", md5($"text".cast("binary")))
      // the delta is referenced through THREE lineages (dedup probe,
      // decontam, final verdict join) and its own lineage is the
      // full-outer snapshot diff over both fingerprinted snapshots —
      // cache it once, batch-sized rows (the
      // Curation.multimodalIngestVerdict discipline, which q166 already
      // applies; released via Tables.releaseOperatorCaches)
      val delta = graft.Tables.trackOperatorCache(graft.operators.SnapshotDiff
        .delta(fp(base), fp(newSnap), "doc_id", "fp")
        .select($"doc_id", $"text")
        .cache())
      val idxPath = SharedArtifacts.signatureIndexPath(s, dir,
        splitAt = 10000000L)
      val bench = all.filter($"source" === "src0").select($"doc_id", $"text")
      // The two probes are INDEPENDENT over the full delta: decontam
      // used to probe only dedup survivors, but the verdict's
      // precedence (dup > contaminated > kept) reports "dup" for a doc
      // both probes flag either way, so widening decontam's input to
      // all delta docs cannot change any status. Decoupling removes the
      // survivor anti-join barrier and lets both probes run as
      // CONCURRENT actions on the shared cached delta (guide §2.6 —
      // the q166 discipline; each probe's serial driver stages overlap
      // the other's). Materialize the delta first so the threads don't
      // race to build its cache.
      delta.count()
      val probes = graft.operators.Curation.buildConcurrently(s, Seq(
        ("ingest probe: text near-dups", () =>
          graft.Tables.trackOperatorCache(
            TextDedup.nearDupsAgainstIndex(delta, idxPath, threshold = 0.8)
              .select($"doc_id").distinct().cache())),
        ("ingest probe: decontam", () =>
          graft.Tables.trackOperatorCache(
            TextDedup.substringMatches(delta, bench, windowChars = 40)
              .select($"doc_id").distinct().cache()))))
      val (dups, contaminated) = (probes(0), probes(1))
      delta
        .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
        .join(contaminated.withColumn("is_cont", lit(true)),
          Seq("doc_id"), "left")
        .select($"doc_id",
          when($"is_dup", lit("dup"))
            .when($"is_cont", lit("contaminated"))
            .otherwise(lit("kept")).as("status"),
          length($"text").cast("long").as("n_chars"))
        .orderBy($"doc_id")
    },

    // the UNIFIED multimodal ingest verdict — q150 (text) and q161
    // (media) composed into ONE admission chain over docs carrying
    // BOTH columns: a multimodal fingerprint diff (md5(text) + the
    // 64-bit image aHash, so a media-only change re-ingests the doc —
    // the %19 blob swaps enter the delta on their aHash alone), then
    // text dedup against the standing MinHash index, media dedup of
    // text survivors against the standing aHash index, decontamination
    // of the rest, one verdict with a REASON column
    // (dup_text > dup_media > contaminated > kept). Planted outcomes:
    // %5 edits and %11 re-adds → dup_text; %19 blob swaps (unchanged
    // text) → delta via media fp, then dup_text; src0 %3 excerpts
    // (no media) → contaminated; %17 fresh docs (no media) → kept;
    // %13 fresh-text docs carrying an EXISTING doc's image → dup_media
    // — the case neither unimodal chain can catch.
    "q166_multimodal_ingest" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", $"text")
      val media = SharedArtifacts.mediaFixture(s, dir, "pgm")
      val base = all.select($"doc_id", $"text")
        .join(media, Seq("doc_id"), "left")
      val edits0 = base.filter($"doc_id" % 7 =!= 0)
        .withColumn("text", when($"doc_id" % 5 === 0,
          concat($"text", lit(" v2"))).otherwise($"text"))
      val swapped = media.select(($"doc_id" - 1).as("doc_id"),
        $"blob".as("swap_blob"))
      val edits = edits0.join(swapped, Seq("doc_id"), "left")
        .withColumn("blob",
          when($"doc_id" % 19 === 0 && $"doc_id" % 5 =!= 0, $"swap_blob")
            .otherwise($"blob"))
        .drop("swap_blob")
      val readds = base.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text", $"blob")
      val contamAdds = all.filter($"source" === "src0" && $"doc_id" % 3 === 0)
        .select(($"doc_id" + 20000000L).as("doc_id"),
          substring($"text", 1, 80).as("text"),
          lit(null).cast("binary").as("blob"))
      // two selects per q150's lateral-column-alias note
      val freshAdds = base.filter($"doc_id" % 17 === 0)
        .select($"doc_id",
          array_join(transform(sequence(lit(1), lit(25)),
            i => concat(lit("zz"), $"doc_id", lit("w"), i)), " ").as("text"))
        .select(($"doc_id" + 30000000L).as("doc_id"), $"text",
          lit(null).cast("binary").as("blob"))
      val mediaAdds = base.filter($"doc_id" % 13 === 0)
        .select($"doc_id", $"blob",
          array_join(transform(sequence(lit(1), lit(25)),
            i => concat(lit("mm"), $"doc_id", lit("w"), i)), " ").as("text"))
        .select(($"doc_id" + 40000000L).as("doc_id"), $"text", $"blob")
      val newSnap = edits.select($"doc_id", $"text", $"blob")
        .unionByName(readds).unionByName(contamAdds)
        .unionByName(freshAdds).unionByName(mediaAdds)
      def fp(df: DataFrame) = graft.operators.Multimodal
        .imageAHash(df, "blob", "ah")
        .withColumn("fp", concat(md5($"text".cast("binary")), lit(":"),
          coalesce($"ah".cast("string"), lit("none"))))
        .drop("ah")
      val delta = graft.operators.SnapshotDiff
        .delta(fp(base), fp(newSnap), "doc_id", "fp")
        .select($"doc_id", $"text", $"blob")
      val sigIdx = SharedArtifacts.signatureIndexPath(s, dir,
        splitAt = 10000000L)
      val hashIdx = SharedArtifacts.hashIndexPath(s, dir,
        buildAt = 200L, splitAt = Long.MaxValue)
      val bench = all.filter($"source" === "src0").select($"doc_id", $"text")
      graft.functions.MultimodalExpressions.register(s)
      graft.operators.Curation.multimodalIngestVerdict(delta,
          call_function("graft_ahash", $"blob"), sigIdx, hashIdx, bench,
          threshold = 0.8, windowChars = 40, maxHamming = 3)
        .orderBy($"doc_id")
    }
  )

  // overlap-heavy blocklist: "table" nests inside "value table", "an"
  // inside "scan", "a a" self-overlaps in "a a a" runs — the cases
  // where a naive non-overlapping `replace` count and AC disagree
  private val AcPatterns = Seq(
    "value table", "table", "a a", "scan scan", "fast",
    "stream stream", "key agg", "an")

  /** Round-unrolled DuckDB oracle for the full BPE training loop.
    *
    * Representation: each word's symbol sequence is a string with every
    * symbol wrapped in a chr(1) sentinel — "ab","c" ⇒ ␁ab␁␁c␁ — so a
    * merge of (l, r) is `replace(s, ␁l␁␁r␁, ␁lr␁)`: left-to-right
    * non-overlapping replacement is EXACTLY greedy BPE application
    * ("aaa" merges to ["aa","a"]), and the per-symbol sentinels make
    * cross-symbol false matches impossible (␁ab␁ never matches inside
    * ␁xab␁). Each of the `n` rounds is three CTEs — pair-count
    * aggregation over the re-split symbols, (count desc, left, right)
    * argmax, merge application — MATERIALIZED so the chain is linear,
    * not exponential. Generated programmatically; validated against an
    * independent naive-recount implementation.
    */
  private def bpeTrainOracleSql(n: Int): String = {
    val S = "chr(1)"
    val sb = new StringBuilder
    sb ++= s"""WITH s0 AS MATERIALIZED (
      |  SELECT $S || array_to_string(string_split(word, ''), $S||$S) || $S AS s, freq
      |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS freq
      |        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |        WHERE len(word) > 0 GROUP BY 1))""".stripMargin
    for (k <- 1 to n) {
      sb ++= s""",
      |pc$k AS MATERIALIZED (
      |  SELECT pr.p.l AS l, pr.p.r AS r, CAST(sum(pr.freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
      |                i -> {'l': sy[i], 'r': sy[i+1]})) AS p
      |        FROM (SELECT freq, string_split(trim(s, $S), $S||$S) AS sy
      |              FROM s${k - 1})) pr
      |  GROUP BY 1, 2),
      |mg$k AS MATERIALIZED (
      |  SELECT l, r, cnt FROM pc$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)""".stripMargin
      if (k < n) sb ++= s""",
      |s$k AS MATERIALIZED (
      |  SELECT replace(s, (SELECT $S||l||$S||$S||r||$S FROM mg$k),
      |                    (SELECT $S||l||r||$S FROM mg$k)) AS s, freq
      |  FROM s${k - 1})""".stripMargin
    }
    sb ++= "\n"
    sb ++= (1 to n).map(k =>
      s"""SELECT CAST($k AS INT) AS rank, l AS "left", r AS "right", """ +
        s"""l||r AS merged, cnt AS pair_count FROM mg$k""")
      .mkString("", "\nUNION ALL ", "\nORDER BY rank")
    sb.result()
  }

  /** Train-AND-apply replay for the q109 applier gate as ONE recursive
    * CTE — the round-unrolled q105 shape cannot reach four-digit merge
    * counts (DuckDB planning cost grows super-linearly past ~10² chained
    * CTEs), but the recursive form runs `n` rounds as n cheap
    * iterations. Symbols are WORDS (each document = one symbol
    * sequence), the pre-tokenized shape real BPE trainers consume —
    * and the only shape with ≥1000 trainable merges on this corpus
    * (the char-level word vocabulary is 31 types). Each iteration
    * recomputes pair counts over the working state, takes the
    * (count desc, l, r) argmax, and applies it via the q105 sentinel
    * trick (left-to-right non-overlapping `replace` on chr(1)-wrapped
    * symbols IS greedy BPE merge). The LEFT JOIN keeps identity rounds
    * once pairs are exhausted — matching the trainer, which just stops
    * emitting merges. The gate therefore independently re-derives
    * training AND rank-order application; the repo side answers with
    * the O(len·applied) rank-map applier, so a hash match proves the
    * fast applier ≡ rank-order semantics on a 1000-merge trained table.
    */
  private def bpeSegmentOracleSql(n: Int): String = {
    val S = "chr(1)"
    s"""WITH RECURSIVE ap AS (
       |  SELECT doc_id,
       |         $S || array_to_string(list_filter(string_split(text, ' '),
       |                                           w -> len(w) > 0), $S||$S) || $S AS s,
       |         0 AS r
       |  FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT d.doc_id,
       |         CASE WHEN b.l IS NULL THEN d.s
       |              ELSE replace(d.s, $S||b.l||$S||$S||b.rr||$S, $S||b.l||b.rr||$S) END,
       |         d.r + 1
       |  FROM ap d LEFT JOIN (
       |    SELECT l, rr FROM (
       |      SELECT pr.p.l AS l, pr.p.r AS rr, count(*) AS cnt
       |      FROM (SELECT unnest(list_transform(range(1, len(sy)),
       |                    i -> {'l': sy[i], 'r': sy[i+1]})) AS p
       |            FROM (SELECT string_split(trim(s, $S), $S||$S) AS sy FROM ap)) pr
       |      GROUP BY 1, 2)
       |    ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1
       |  ) b ON TRUE
       |  WHERE d.r < $n
       |)
       |SELECT doc_id,
       |       CAST(len(string_split(trim(s, $S), $S||$S)) AS BIGINT) AS n_tokens,
       |       md5(array_to_string(string_split(trim(s, $S), $S||$S), chr(2))) AS fp
       |FROM ap WHERE r = $n ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q105_bpe_train" -> bpeTrainOracleSql(50),
    "q109_bpe_segment" -> bpeSegmentOracleSql(1000),

    "q91_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |wf AS (SELECT word, count(*) AS freq FROM w
        |       WHERE len(word) >= 2 GROUP BY 1),
        |pr AS (SELECT unnest(list_transform(range(1, len(word)),
        |                i -> substr(word, CAST(i AS INT), 2))) AS pair,
        |              freq
        |       FROM wf),
        |pc AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM pr GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
        |            AS BIGINT) AS rank,
        |       pair, pair_count
        |FROM pc
        |QUALIFY rank <= 20
        |ORDER BY rank""".stripMargin,

    "q68_repetition" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS sum_words,
        |  CAST(sum(n - d) AS BIGINT) AS sum_dup_words,
        |  CAST(max(n - d) AS BIGINT) AS max_dup_words
        |FROM (SELECT source, len(string_split(text, ' ')) AS n,
        |             len(list_distinct(string_split(text, ' '))) AS d
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q69_scrub" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS sum_redactions,
        |  CAST(sum(len(scrubbed)) AS BIGINT) AS sum_scrubbed_len,
        |  min(scrubbed) AS min_scrubbed, max(scrubbed) AS max_scrubbed
        |FROM (SELECT event_type, props,
        |        regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q81_heavy_hitters" ->
      """SELECT term, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY n DESC, term LIMIT 10""".stripMargin,

    "q70_contamination" ->
      s"""WITH g AS (SELECT doc_id, source, $duckGrams3 AS gs
         |           FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
         |                 FROM documents)
         |           WHERE len(ws) >= 3),
         |bg AS (SELECT DISTINCT unnest(gs) AS sh FROM g WHERE source = 'src0'),
         |dg AS (SELECT doc_id, source, unnest(gs) AS sh FROM g WHERE source <> 'src0'),
         |cont AS (SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated
         |         FROM (SELECT DISTINCT doc_id, source FROM dg
         |               WHERE sh IN (SELECT sh FROM bg))
         |         GROUP BY 1),
         |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |        FROM documents WHERE source <> 'src0' GROUP BY 1)
         |SELECT tot.source, tot.n_docs,
         |  CAST(COALESCE(cont.n_contaminated, 0) AS BIGINT) AS n_contaminated
         |FROM tot LEFT JOIN cont USING (source) ORDER BY 1""".stripMargin,

    "q71_distinct_sketch" -> {
      val k = 64
      s"""WITH u AS (SELECT o_orderstatus, o_custkey,
         |    $u01 AS u
         |  FROM (SELECT o_orderstatus, o_custkey,
         |          md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders)),
         |d AS (SELECT DISTINCT o_orderstatus, u FROM u),
         |r AS (SELECT o_orderstatus, u,
         |        row_number() OVER (PARTITION BY o_orderstatus ORDER BY u) AS rn,
         |        count(*) OVER (PARTITION BY o_orderstatus) AS cnt FROM d),
         |est AS (SELECT o_orderstatus,
         |          CASE WHEN cnt < $k THEN CAST(cnt AS DOUBLE)
         |               ELSE ${k - 1}.0 / u END AS est_distinct
         |        FROM r WHERE rn = CASE WHEN cnt < $k THEN cnt ELSE $k END),
         |ex AS (SELECT o_orderstatus,
         |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
         |         CAST(count(*) AS BIGINT) AS n_rows
         |       FROM orders GROUP BY 1)
         |SELECT ex.o_orderstatus, est.est_distinct, ex.exact_distinct, ex.n_rows
         |FROM ex JOIN est USING (o_orderstatus) ORDER BY 1""".stripMargin
    },

    // KMV set-op replay: per-source bottom-64 of distinct u, merged
    // per pair (distinct-union then re-ranked), overlap = merged
    // members present in BOTH source sketches, the same saturation
    // cases as q71, plus the exact pair truths
    "q126_kmv_setops" -> {
      val k = 64
      s"""WITH d AS (SELECT DISTINCT o_orderstatus AS src, o_custkey AS key
         |           FROM orders),
         |uu AS (SELECT src, $u01 AS u FROM
         |       (SELECT src, md5(CAST(key AS VARCHAR)) AS h FROM d)),
         |r AS (SELECT src, u, row_number() OVER (PARTITION BY src ORDER BY u) AS rn
         |      FROM (SELECT DISTINCT src, u FROM uu)),
         |sk AS (SELECT src, u FROM r WHERE rn <= $k),
         |p AS (SELECT a.src AS src_a, b.src AS src_b
         |      FROM (SELECT DISTINCT src FROM d) a, (SELECT DISTINCT src FROM d) b
         |      WHERE a.src < b.src),
         |mu AS (SELECT p.src_a, p.src_b, sk.u
         |       FROM p JOIN sk ON sk.src = p.src_a OR sk.src = p.src_b
         |       GROUP BY 1, 2, 3),
         |m AS (SELECT src_a, src_b, u,
         |        row_number() OVER (PARTITION BY src_a, src_b ORDER BY u) AS rn,
         |        count(*) OVER (PARTITION BY src_a, src_b) AS cnt
         |      FROM mu),
         |uv AS (SELECT * FROM m WHERE rn <= $k),
         |ov AS (SELECT uv.src_a, uv.src_b, count(*) AS overlap
         |       FROM uv
         |       JOIN sk sa ON sa.src = uv.src_a AND sa.u = uv.u
         |       JOIN sk sb ON sb.src = uv.src_b AND sb.u = uv.u
         |       GROUP BY 1, 2),
         |ue AS (SELECT src_a, src_b,
         |         CASE WHEN max(cnt) < $k THEN CAST(max(cnt) AS DOUBLE)
         |              ELSE ${k - 1}.0 / max(CASE WHEN rn = $k THEN u END) END
         |           AS union_est,
         |         CAST(least($k, max(cnt)) AS BIGINT) AS k_used
         |       FROM uv GROUP BY 1, 2),
         |ex AS (SELECT x.src AS src_a, y.src AS src_b, count(*) AS exact_inter
         |       FROM d x JOIN d y ON x.key = y.key AND x.src < y.src
         |       GROUP BY 1, 2),
         |ns AS (SELECT src, count(*) AS n FROM d GROUP BY 1)
         |SELECT ue.src_a, ue.src_b, ue.k_used, ue.union_est,
         |  CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
         |  coalesce(ov.overlap, 0) / CAST(ue.k_used AS DOUBLE) AS jaccard_est,
         |  (coalesce(ov.overlap, 0) / CAST(ue.k_used AS DOUBLE)) * ue.union_est
         |    AS inter_est,
         |  CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter,
         |  CAST(na.n + nb.n - coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_union
         |FROM ue
         |LEFT JOIN ov USING (src_a, src_b)
         |LEFT JOIN ex USING (src_a, src_b)
         |JOIN ns na ON na.src = ue.src_a
         |JOIN ns nb ON nb.src = ue.src_b
         |ORDER BY src_a, src_b""".stripMargin
    },

    // HLL register replay: bucket = first md5 byte mod 64; rho = 1 +
    // leading-zero bits of the next 13 hex chars (string-derived, no
    // libm); Zint = Σ 2^(53-reg) via bit shifts; the raw-estimate
    // integer division runs in HUGEINT exactly like the JVM BigInt
    "q119_hll_distinct" -> {
      val num = graft.operators.Sketches.HllEstNumerator.toString
      s"""WITH c AS (SELECT o_orderstatus AS grp, o_custkey,
         |    md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
         |w0 AS (SELECT grp, h, substr(h, 3, 13) AS w,
         |    CAST(length(regexp_extract(substr(h, 3, 13), '^0*')) AS INT) AS lzc
         |  FROM c),
         |r AS (SELECT grp,
         |    CAST(('0x' || substr(h, 1, 2)) AS INT) % 64 AS bucket,
         |    CASE WHEN lzc = 13 THEN 53
         |         ELSE lzc * 4 +
         |           CASE WHEN substr(w, lzc + 1, 1) >= '8' THEN 0
         |                WHEN substr(w, lzc + 1, 1) >= '4' THEN 1
         |                WHEN substr(w, lzc + 1, 1) >= '2' THEN 2
         |                ELSE 3 END + 1 END AS rho
         |  FROM w0),
         |m AS (SELECT grp, bucket, max(rho) AS mr FROM r GROUP BY 1, 2),
         |g AS (SELECT DISTINCT grp FROM c),
         |bks AS (SELECT g.grp, b.b FROM g
         |        CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b),
         |f AS (SELECT bks.grp, bks.b AS bucket,
         |        CAST(coalesce(m.mr, 0) AS INT) AS mr
         |      FROM bks LEFT JOIN m ON bks.grp = m.grp AND bks.b = m.bucket),
         |a AS (SELECT grp,
         |        string_agg(CAST(mr AS VARCHAR), ',' ORDER BY bucket)
         |          AS registers,
         |        CAST(sum(CAST(1 AS BIGINT) << (53 - mr)) AS BIGINT) AS zint
         |      FROM f GROUP BY 1),
         |x AS (SELECT grp, registers, zint,
         |        CAST(CAST('$num' AS HUGEINT)
         |             // (1000 * CAST(zint AS HUGEINT)) AS BIGINT)
         |          AS est_distinct
         |      FROM a),
         |e AS (SELECT o_orderstatus AS grp,
         |        CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
         |        CAST(count(*) AS BIGINT) AS n_rows FROM orders GROUP BY 1)
         |SELECT x.grp AS o_orderstatus, x.registers, x.zint, x.est_distinct,
         |  e.exact_distinct, e.n_rows
         |FROM x JOIN e USING (grp) ORDER BY 1""".stripMargin
    },

    // same bottom-k sample: rank all rows by (u, value) per group,
    // keep the first k, then percentile_disc's rank pick over the
    // sample's sorted values — ceil(p·m) as the same double
    // arithmetic the Scala finish performs
    "q89_quantile_sketch" ->
      s"""WITH h AS (SELECT l_returnflag, l_extendedprice AS v,
         |    md5(CAST(l_orderkey AS VARCHAR) || ':' ||
         |        CAST(l_linenumber AS VARCHAR)) AS h
         |  FROM lineitem),
         |u AS (SELECT l_returnflag, v, $u01 AS u FROM h),
         |r AS (SELECT l_returnflag, v,
         |        row_number() OVER (PARTITION BY l_returnflag
         |                           ORDER BY u, v) AS rn
         |      FROM u),
         |s AS (SELECT l_returnflag, v FROM r WHERE rn <= 100),
         |o AS (SELECT l_returnflag, v,
         |        row_number() OVER (PARTITION BY l_returnflag
         |                           ORDER BY v) AS vr,
         |        count(*) OVER (PARTITION BY l_returnflag) AS m
         |      FROM s),
         |p50 AS (SELECT l_returnflag, v FROM (
         |        SELECT l_returnflag, v, vr, m,
         |          greatest(least(CAST(ceil(0.5 * m) AS BIGINT), m), 1) AS k0
         |        FROM o)
         |        WHERE vr = CASE WHEN k0 > 1 AND (k0 - 1) * 1.0 / m >= 0.5
         |                        THEN k0 - 1 ELSE k0 END),
         |p95 AS (SELECT l_returnflag, v FROM (
         |        SELECT l_returnflag, v, vr, m,
         |          greatest(least(CAST(ceil(0.95 * m) AS BIGINT), m), 1) AS k0
         |        FROM o)
         |        WHERE vr = CASE WHEN k0 > 1 AND (k0 - 1) * 1.0 / m >= 0.95
         |                        THEN k0 - 1 ELSE k0 END),
         |n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
         |      FROM lineitem GROUP BY 1)
         |SELECT n.l_returnflag, p50.v AS p50_est, p95.v AS p95_est, n.n_rows
         |FROM n JOIN p50 USING (l_returnflag) JOIN p95 USING (l_returnflag)
         |ORDER BY 1""".stripMargin,

    "q72_weighted_sample" ->
      s"""WITH h AS (SELECT source, doc_id, n_chars,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         |k AS (SELECT source, doc_id,
         |        ln(greatest($u01, power(2, -53))) / n_chars AS key FROM h),
         |r AS (SELECT source, doc_id,
         |        row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC) AS rn
         |      FROM k)
         |SELECT source, doc_id FROM r WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin,

    "q108_leakage_safe_split" ->
      s"""$dupClosureCte,
         |labels AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY 1),
         |k AS (SELECT d.doc_id, d.n_chars,
         |        md5(CAST(coalesce(l.component, d.doc_id) AS VARCHAR)) AS h
         |      FROM documents d LEFT JOIN labels l USING (doc_id)),
         |u AS (SELECT doc_id, n_chars, $u01 AS u FROM k),
         |s AS (SELECT doc_id, n_chars,
         |        CASE WHEN u < 0.8 THEN 'train'
         |             WHEN u < (0.8 + 0.1) THEN 'val'
         |             ELSE 'test' END AS split
         |      FROM u)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // split cut points spelled as the same float arithmetic the Scala
    // scanLeft performs (0.8 + 0.1 != 0.9 in IEEE; the literal matters)
    "q52_split_assign" ->
      s"""WITH h AS (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
         |          FROM documents),
         |u AS (SELECT doc_id, n_chars, $u01 AS u FROM h),
         |s AS (SELECT doc_id, n_chars,
         |        CASE WHEN u < 0.8 THEN 'train'
         |             WHEN u < (0.8 + 0.1) THEN 'val'
         |             ELSE 'test' END AS split
         |      FROM u)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_shard_assign" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |s AS (SELECT doc_id, h,
        |        CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8 AS shard FROM h),
        |r AS (SELECT doc_id, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS pos
        |      FROM s)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(max(pos) AS BIGINT) AS max_pos,
        |  CAST(sum(pos * doc_id) AS BIGINT) AS order_fingerprint
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q73_boilerplate" ->
      s"""WITH g AS (SELECT doc_id, $duckGrams3 AS gs
         |           FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |                 FROM documents)
         |           WHERE len(ws) >= 3)
         |SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
         |FROM (SELECT unnest(gs) AS gram FROM g)
         |GROUP BY 1 ORDER BY doc_freq DESC, gram ASC LIMIT 10""".stripMargin,

    // chunk starts 1, 1+stride, ... up to max(n-overlap, 1); inclusive
    // end-capped list_slice == Spark's length-capped slice
    "q74_chunking" -> {
      val (chunk, overlap) = (32, 8)
      val stride = chunk - overlap
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, w,
         |        range(1, greatest(len(w) - $overlap, 1) + 1, $stride) AS starts
         |      FROM w),
         |c AS (SELECT doc_id,
         |        CAST(generate_subscripts(starts, 1) - 1 AS BIGINT) AS chunk_no,
         |        array_to_string(list_slice(w, unnest(starts),
         |          unnest(starts) + ${chunk - 1}), ' ') AS chunk
         |      FROM s)
         |SELECT doc_id, chunk_no,
         |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens,
         |  md5(chunk) AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_no""".stripMargin
    },

    "q53_mixture_weights" ->
      """WITH t AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS total
        |           FROM documents GROUP BY 1),
        |m AS (SELECT max(total) AS max_total FROM t)
        |SELECT source, total, round(sqrt(total * 1.0 / max_total), 4) AS weight
        |FROM t, m ORDER BY source""".stripMargin,

    "q58_length_histogram" ->
      """SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_len,
        |  min(n_chars) AS min_len, max(n_chars) AS max_len
        |FROM documents WHERE n_chars > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q59_cross_source_dup" ->
      s"""$dupPairsCte
         |SELECT least(da2.source, db2.source) AS source_x,
         |  greatest(da2.source, db2.source) AS source_y,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM dup JOIN documents da2 ON da = da2.doc_id
         |         JOIN documents db2 ON db = db2.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q76_curate_e2e" ->
      s"""${dupPairsCteFor("source <> 'src0' AND len(string_split(text, ' ')) >= 20")},
         |$closureTail,
         |labels AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY 1),
         |q AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, text
         |      FROM documents
         |      WHERE source <> 'src0' AND len(string_split(text, ' ')) >= 20),
         |dd AS (SELECT * FROM q WHERE doc_id NOT IN
         |        (SELECT doc_id FROM labels WHERE doc_id <> component)),
         |bg AS (SELECT DISTINCT unnest(${duckGramsN(5)}) AS sh
         |       FROM (SELECT string_split(text, ' ') AS ws FROM documents
         |             WHERE source = 'src0')
         |       WHERE len(ws) >= 5),
         |cont AS (SELECT DISTINCT doc_id
         |         FROM (SELECT doc_id, unnest(${duckGramsN(5)}) AS sh
         |               FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM dd))
         |         WHERE sh IN (SELECT sh FROM bg)),
         |clean AS (SELECT doc_id, n_tokens FROM dd
         |          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
         |u AS (SELECT doc_id, n_tokens,
         |        ${Sampling.u01Duck("md5(CAST(doc_id AS VARCHAR))")} AS u
         |      FROM clean),
         |sp AS (SELECT doc_id, n_tokens,
         |         CASE WHEN u < 0.8 THEN 'train'
         |              WHEN u < (0.8 + 0.1) THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM u)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    // edges = the q21 oracle's verified Jaccard >= 0.5 pairs; the
    // recursive closure then labels every clustered doc with the min
    // reachable doc_id
    "q75_dup_clusters" ->
      s"""$dupClosureCte
         |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS component
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "q118_pagerank" -> pageRankSql,

    // keep = not (clustered with a smaller doc_id): anti-join against
    // the closure's non-representative members
    "q57_cluster_dedup_apply" ->
      s"""$dupClosureCte,
         |labels AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY 1)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
         |FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> component)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // quality-keep replay: the q75 closure labels, singleton fallback,
    // per-component (n_chars DESC, doc_id) rank and the first_value
    // witness
    "q134_quality_keep" ->
      s"""$dupClosureCte,
         |labels AS (SELECT a AS doc_id, min(b) AS component
         |           FROM reach GROUP BY 1),
         |j AS (SELECT d.doc_id, coalesce(l.component, d.doc_id) AS component,
         |        d.n_chars
         |      FROM documents d LEFT JOIN labels l USING (doc_id)),
         |r AS (SELECT doc_id, component, n_chars,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY n_chars DESC, doc_id) AS rk,
         |        first_value(doc_id) OVER (PARTITION BY component
         |          ORDER BY n_chars DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |          AS kept_by
         |      FROM j)
         |SELECT doc_id, CAST(component AS BIGINT) AS component,
         |  CAST(n_chars AS BIGINT) AS score, rk = 1 AS kept,
         |  CAST(kept_by AS BIGINT) AS kept_by
         |FROM r ORDER BY doc_id""".stripMargin,

    // every rule is an integer comparison, so the flags replay exactly;
    // n_word_chars = sum of word lengths = len(text) - (n_words - 1)
    // for the single-space-joined corpus
    "q100_gopher_rules" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(length(text) - len(ws) + 1 AS BIGINT) AS n_word_chars,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_intersect(list_distinct(ws),
        |      ['the', 'a', 'of', 'and', 'to', 'is'])) AS BIGINT) AS n_stop_kinds,
        |    CAST(list_max(list_transform(ws, x -> length(x))) AS BIGINT)
        |      AS max_word_len
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents))
        |SELECT doc_id, n_words, n_word_chars, n_distinct, n_stop_kinds,
        |  max_word_len,
        |  (n_words >= 10 AND n_words <= 100000) AS r_word_count,
        |  (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
        |    AS r_mean_len,
        |  (10 * (n_words - n_distinct) <= 3 * n_words) AS r_dup_frac,
        |  (n_stop_kinds >= 2) AS r_stopwords,
        |  (max_word_len <= 20) AS r_max_word,
        |  ((n_words >= 10 AND n_words <= 100000)
        |    AND (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
        |    AND (10 * (n_words - n_distinct) <= 3 * n_words)
        |    AND (n_stop_kinds >= 2) AND (max_word_len <= 20)) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

    "q101_substr_decontam" -> substrDecontamSql,

    // q168: q101's window matches → padded clamped intervals → the
    // q131 running-max interval union, counted as maximal contiguous
    // removed regions + removed-char union size
    "q168_decontam_apply" ->
      """WITH ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
        |    FROM (SELECT text,
        |            unnest(generate_series(1, length(text) - 39)) AS i
        |          FROM documents WHERE source = 'src0')),
        |tr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         substr(text, CAST(i AS INT), 40) AS g,
        |         CAST(length(text) AS BIGINT) AS n_chars
        |       FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text) - 39)) AS i
        |             FROM documents WHERE source <> 'src0')),
        |iv AS (SELECT doc_id, greatest(1, pos - 20) AS s,
        |         least(n_chars, pos + 59) AS e
        |       FROM tr WHERE g IN (SELECT g FROM ev)),
        |r2 AS (SELECT doc_id, s, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS prev_end
        |       FROM iv),
        |cut AS (SELECT doc_id, count(*) AS nh,
        |         sum(CASE WHEN s > coalesce(prev_end, -2) + 1
        |             THEN 1 ELSE 0 END) AS nsp,
        |         sum(greatest(0, e - greatest(s - 1,
        |           coalesce(prev_end, -1)))) AS nc
        |        FROM r2 GROUP BY 1),
        |al AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |       FROM documents WHERE source <> 'src0')
        |SELECT al.doc_id, al.n_chars,
        |  CAST(coalesce(cut.nh, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(cut.nsp, 0) AS BIGINT) AS n_spans_removed,
        |  CAST(coalesce(cut.nc, 0) AS BIGINT) AS n_chars_removed
        |FROM al LEFT JOIN cut USING (doc_id)
        |ORDER BY al.doc_id""".stripMargin,

    // q170: q168's intervals merged into maximal regions, the kept
    // complement (gaps + tail), and the clean text reassembled with
    // an ordered string_agg — character-for-character
    "q170_decontam_rewrite" ->
      """WITH ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
        |    FROM (SELECT text,
        |            unnest(generate_series(1, length(text) - 39)) AS i
        |          FROM documents WHERE source = 'src0')),
        |tr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         substr(text, CAST(i AS INT), 40) AS g,
        |         CAST(length(text) AS BIGINT) AS n_chars
        |       FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text) - 39)) AS i
        |             FROM documents WHERE source <> 'src0')),
        |iv AS (SELECT doc_id, greatest(1, pos - 20) AS s,
        |         least(n_chars, pos + 59) AS e
        |       FROM tr WHERE g IN (SELECT g FROM ev)),
        |r2 AS (SELECT doc_id, s, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS prev_end
        |       FROM iv),
        |r3 AS (SELECT doc_id, s, e,
        |        sum(CASE WHEN s > coalesce(prev_end, -2) + 1
        |            THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY s, e
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS rid
        |       FROM r2),
        |reg AS (SELECT doc_id, rid, min(s) AS rs, max(e) AS re
        |        FROM r3 GROUP BY 1, 2),
        |ln AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
        |       FROM documents WHERE source <> 'src0'),
        |gaps AS (SELECT doc_id,
        |          coalesce(lag(re) OVER (PARTITION BY doc_id ORDER BY rs),
        |            0) + 1 AS ks,
        |          rs - 1 AS ke
        |         FROM reg),
        |tails AS (SELECT r.doc_id, max(r.re) + 1 AS ks,
        |           min(l.n_chars) AS ke
        |          FROM reg r JOIN ln l USING (doc_id) GROUP BY 1),
        |kept AS (SELECT * FROM gaps WHERE ks <= ke
        |         UNION ALL SELECT * FROM tails WHERE ks <= ke),
        |asm AS (SELECT k.doc_id,
        |         string_agg(substr(l.text, CAST(k.ks AS INT),
        |           CAST(k.ke - k.ks + 1 AS INT)), '' ORDER BY k.ks)
        |           AS clean_text
        |        FROM kept k JOIN ln l USING (doc_id) GROUP BY 1),
        |cut AS (SELECT DISTINCT doc_id FROM reg)
        |SELECT ln.doc_id, ln.n_chars,
        |  CASE WHEN cut.doc_id IS NULL THEN ln.text
        |       ELSE coalesce(asm.clean_text, '') END AS clean_text,
        |  CAST(length(CASE WHEN cut.doc_id IS NULL THEN ln.text
        |       ELSE coalesce(asm.clean_text, '') END) AS BIGINT)
        |    AS n_chars_clean
        |FROM ln LEFT JOIN cut USING (doc_id) LEFT JOIN asm USING (doc_id)
        |ORDER BY ln.doc_id""".stripMargin,

    // q142: the q101 window aggregate per eval set — both suites'
    // window sets recomputed inline, independent of the index layout
    "q142_decontam_index_sets" -> {
      def ev(src: String) =
        s"""(SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
           |    FROM (SELECT text,
           |            unnest(generate_series(1, length(text) - 39)) AS i
           |          FROM documents WHERE source = '$src'))""".stripMargin
      s"""WITH ev0 AS ${ev("src0")},
         |ev1 AS ${ev("src1")},
         |tr AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         substr(text, CAST(i AS INT), 40) AS g
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, length(text) - 39)) AS i
         |             FROM documents
         |             WHERE source NOT IN ('src0', 'src1'))),
         |hit AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS eval_set_id, pos, g
         |  FROM tr WHERE g IN (SELECT g FROM ev0)
         |  UNION ALL
         |  SELECT doc_id, CAST(1 AS BIGINT) AS eval_set_id, pos, g
         |  FROM tr WHERE g IN (SELECT g FROM ev1))
         |SELECT doc_id, eval_set_id, CAST(count(*) AS BIGINT) AS n_hits,
         |       CAST(count(DISTINCT g) AS BIGINT) AS n_grams,
         |       CAST(min(pos) AS BIGINT) AS first_pos
         |FROM hit GROUP BY 1, 2 ORDER BY doc_id, eval_set_id""".stripMargin
    },

    // the index-backed q139 must be RESULT-IDENTICAL to the inline
    // q101 scan — one oracle serves both, which is the point
    "q139_decontam_index" -> substrDecontamSql,

    "q102_fuzzy_pairs" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY 1, 2""".stripMargin,

    // brute-force AC replay: every text position compared against
    // every pattern — overlapping occurrences counted, exactly the
    // automaton's output-link semantics (deliberately O(len·|P|), the
    // cost the one-pass automaton exists to avoid)
    "q116_multi_pattern" -> {
      val pats = AcPatterns.map(p => s"'${p.replace("'", "''")}'").mkString(", ")
      s"""WITH p AS (SELECT unnest([$pats]) AS pattern),
         |c AS (SELECT d.doc_id, p.pattern,
         |        CAST(len(list_filter(
         |          range(1, length(d.text) - length(p.pattern) + 2),
         |          i -> substr(d.text, i, length(p.pattern)) = p.pattern))
         |          AS BIGINT) AS n
         |      FROM documents d, p
         |      WHERE length(d.text) >= length(p.pattern))
         |SELECT doc_id, pattern, n FROM c WHERE n > 0
         |ORDER BY doc_id, pattern""".stripMargin
    },

    // q54's shard assignment replay + the concat-and-chunk boundary
    // arithmetic as one window cumsum — integer `//` division matches
    // Spark's `div` bit-for-bit
    "q143_concat_chunk" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |s AS (SELECT doc_id, n_tokens, h,
        |        CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8 AS shard FROM t),
        |r AS (SELECT doc_id, n_tokens, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS pos
        |      FROM s),
        |c AS (SELECT doc_id, shard, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start_off
        |      FROM r WHERE n_tokens > 0),
        |f AS (SELECT shard, doc_id, n_tokens,
        |        start_off // 64 AS first_seq,
        |        (start_off + n_tokens - 1) // 64 AS last_seq
        |      FROM c)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST((sum(n_tokens) + 63) // 64 AS BIGINT) AS n_seqs,
        |  CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_split_docs,
        |  CAST(sum(first_seq * doc_id + last_seq) AS BIGINT) AS span_fingerprint,
        |  CAST((sum(n_tokens) + 63) // 64 * 64 - sum(n_tokens) AS BIGINT)
        |    AS tail_padding
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q143 chain with (n_tokens + 1) in the cumsum and the span
    // boundaries — the separated stream — while n_tokens still reports
    // the docs' own tokens
    "q156_concat_chunk_eos" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |s AS (SELECT doc_id, n_tokens, h,
        |        CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8 AS shard FROM t),
        |r AS (SELECT doc_id, n_tokens, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS pos
        |      FROM s),
        |c AS (SELECT doc_id, shard, n_tokens,
        |        CAST(coalesce(sum(n_tokens + 1) OVER (PARTITION BY shard ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start_off
        |      FROM r WHERE n_tokens > 0),
        |f AS (SELECT shard, doc_id, n_tokens,
        |        start_off // 64 AS first_seq,
        |        (start_off + n_tokens + 1 - 1) // 64 AS last_seq
        |      FROM c)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_tokens) + count(*) AS BIGINT) AS n_stream_tokens,
        |  CAST((sum(n_tokens) + count(*) + 63) // 64 AS BIGINT) AS n_seqs,
        |  CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_split_docs,
        |  CAST(sum(first_seq * doc_id + last_seq) AS BIGINT) AS span_fingerprint,
        |  CAST((sum(n_tokens) + count(*) + 63) // 64 * 64
        |    - (sum(n_tokens) + count(*)) AS BIGINT) AS tail_padding
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // full-outer fingerprint diff, per-status rollup; fp_sum folds the
    // 13-hex md5 prefix of every key's surviving fingerprint
    "q144_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |new AS (SELECT doc_id,
        |          md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS fp
        |        FROM documents WHERE doc_id % 7 <> 0
        |        UNION ALL
        |        SELECT doc_id + 10000000, md5(text)
        |        FROM documents WHERE doc_id % 11 = 0),
        |d AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |        old.fp AS old_fp, new.fp AS new_fp
        |      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
        |SELECT CASE WHEN old_fp IS NULL THEN 'added'
        |            WHEN new_fp IS NULL THEN 'removed'
        |            WHEN old_fp = new_fp THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(CAST(('0x' || substr(coalesce(new_fp, old_fp), 1, 13))
        |    AS BIGINT) % 1000000007) % 1000000007 AS BIGINT) AS fp_sum
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // the delta replayed declaratively (changed = %5 edits surviving
    // the %7 removal, added = the offset re-adds), then the exact
    // trigram-Jaccard join of delta docs against the full corpus —
    // the q77 verification arithmetic with the delta as the new batch
    "q145_delta_dedup" ->
      """WITH delta AS (
        |  SELECT doc_id, text || ' v2' AS text FROM documents
        |  WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 11 = 0),
        |wn AS (SELECT doc_id, string_split(text, ' ') AS w FROM delta
        |       WHERE len(string_split(text, ' ')) >= 3),
        |shn AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wn),
        |wo AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |       WHERE len(string_split(text, ' ')) >= 3),
        |sho AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wo),
        |cand AS (SELECT a.doc_id da, b.doc_id db, count(*) common
        |         FROM shn a JOIN sho b ON a.sh = b.sh GROUP BY 1, 2),
        |sn AS (SELECT doc_id, count(*) n FROM shn GROUP BY 1),
        |so AS (SELECT doc_id, count(*) n FROM sho GROUP BY 1),
        |j AS (SELECT da, db, common * 1.0 / (sa.n + sb.n - common) AS jac
        |      FROM cand JOIN sn sa ON da = sa.doc_id
        |                JOIN so sb ON db = sb.doc_id)
        |SELECT da AS doc_id, db AS dup_of, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.8 ORDER BY 1, 2""".stripMargin,

    // q143's cumsum chain continued: one generate_series unnest per
    // doc over its spanned sequences, then the same integer interval
    // arithmetic — every segment's offsets on both sides, bit-exact
    "q146_chunk_manifest" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |s AS (SELECT doc_id, n_tokens, h,
        |        CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8 AS shard FROM t),
        |r AS (SELECT doc_id, n_tokens, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS pos
        |      FROM s),
        |c AS (SELECT doc_id, shard, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start_off
        |      FROM r WHERE n_tokens > 0),
        |f AS (SELECT shard, doc_id, n_tokens, start_off,
        |        start_off // 64 AS first_seq,
        |        (start_off + n_tokens - 1) // 64 AS last_seq
        |      FROM c),
        |g AS (SELECT shard, doc_id, n_tokens, start_off,
        |        unnest(generate_series(first_seq, last_seq)) AS seq
        |      FROM f),
        |m AS (SELECT shard, seq, doc_id,
        |        greatest(0, seq * 64 - start_off) AS seg_doc_from,
        |        least(n_tokens, (seq + 1) * 64 - start_off) AS seg_doc_to,
        |        start_off + greatest(0, seq * 64 - start_off) - seq * 64
        |          AS seg_seq_from
        |      FROM g)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(seq AS BIGINT) AS seq,
        |  doc_id, CAST(seg_doc_from AS BIGINT) AS seg_doc_from,
        |  CAST(seg_doc_to AS BIGINT) AS seg_doc_to,
        |  CAST(seg_seq_from AS BIGINT) AS seg_seq_from,
        |  CAST(seg_doc_to - seg_doc_from AS BIGINT) AS n_seg_tokens
        |FROM m ORDER BY shard, seq, seg_seq_from""".stripMargin,

    // the same two aggregations replayed: per-gram first owner by
    // min(doc_id), recounted per doc; all-integer so the hash gate is
    // exact
    "q147_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT DISTINCT doc_id,
        |        unnest(list_transform(range(1, len(w) - 1),
        |               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |      FROM w),
        |t AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
        |f AS (SELECT sh, min(doc_id) AS doc_id FROM g GROUP BY 1),
        |nv AS (SELECT doc_id, count(*) AS n_novel FROM f GROUP BY 1)
        |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel
        |FROM t LEFT JOIN nv USING (doc_id) ORDER BY doc_id""".stripMargin,

    // first-occurrence novelty over the FULL corpus, restricted to the
    // batch — a gram in the history can never be first-seen by a
    // batch doc (history ids are smaller), so the index path and this
    // restriction are value-identical
    "q151_novelty_index" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT DISTINCT doc_id,
        |        unnest(list_transform(range(1, len(w) - 1),
        |               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |      FROM w),
        |t AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
        |f AS (SELECT sh, min(doc_id) AS doc_id FROM g GROUP BY 1),
        |nv AS (SELECT doc_id, count(*) AS n_novel FROM f GROUP BY 1)
        |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel
        |FROM t LEFT JOIN nv USING (doc_id)
        |WHERE t.doc_id >= 250 ORDER BY doc_id""".stripMargin,

    // the whole incremental pipeline replayed: the four delta arms
    // declaratively, the exact trigram-Jaccard join for the dup set
    // (the q145 arithmetic), the q101 window semantics for the
    // contaminated set over dedup SURVIVORS only, then the verdict
    // with dup > contaminated > kept precedence
    "q150_ingest_e2e" ->
      """WITH delta AS (
        |  SELECT doc_id, text || ' v2' AS text FROM documents
        |  WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, substr(text, 1, 80) FROM documents
        |  WHERE source = 'src0' AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 30000000,
        |    list_aggregate(list_transform(range(1, 26),
        |      i -> 'zz' || doc_id || 'w' || i), 'string_agg', ' ')
        |  FROM documents WHERE doc_id % 17 = 0),
        |wn AS (SELECT doc_id, string_split(text, ' ') AS w FROM delta
        |       WHERE len(string_split(text, ' ')) >= 3),
        |shn AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wn),
        |wo AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |       WHERE len(string_split(text, ' ')) >= 3),
        |sho AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wo),
        |cand AS (SELECT a.doc_id da, b.doc_id db, count(*) common
        |         FROM shn a JOIN sho b ON a.sh = b.sh GROUP BY 1, 2),
        |sn AS (SELECT doc_id, count(*) n FROM shn GROUP BY 1),
        |so AS (SELECT doc_id, count(*) n FROM sho GROUP BY 1),
        |dup AS (SELECT DISTINCT da AS doc_id
        |        FROM cand JOIN sn sa ON da = sa.doc_id
        |                  JOIN so sb ON db = sb.doc_id
        |        WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
        |ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
        |    FROM (SELECT text,
        |            unnest(generate_series(1, length(text) - 39)) AS i
        |          FROM documents WHERE source = 'src0')),
        |sv AS (SELECT * FROM delta
        |       WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
        |tw AS (SELECT doc_id, substr(text, CAST(i AS INT), 40) AS g
        |       FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text) - 39)) AS i
        |             FROM sv)),
        |cont AS (SELECT DISTINCT doc_id FROM tw
        |         WHERE g IN (SELECT g FROM ev))
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id IN (SELECT doc_id FROM dup) THEN 'dup'
        |       WHEN d.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
        |       ELSE 'kept' END AS status,
        |  CAST(length(d.text) AS BIGINT) AS n_chars
        |FROM delta d ORDER BY d.doc_id""".stripMargin,

    // the q150 replay extended with the media dimension: the image
    // aHash of every decodable doc (the q161 derivation over the pgm
    // fixture), a delta that includes the %19 blob swaps IFF their
    // aHash actually changed (the multimodal fingerprint), the text
    // near-dup stage, the media stage over text survivors (hamming<=3
    // vs any indexed doc), decontamination of the rest, and the
    // reason-ranked verdict
    "q166_multimodal_ingest" ->
      """WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS w
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(0, 8), c ->
        |          CAST(ascii(substr(text, CAST((c * w) // 8 AS INT) + 1, 1))
        |            AS BIGINT)) AS cs
        |      FROM t WHERE doc_id % 97 <> 0 AND w >= 1),
        |h AS (SELECT doc_id,
        |        CAST(list_aggregate(list_transform(range(0, 64), j ->
        |          CASE WHEN 64 * cs[CAST(j % 8 AS INT) + 1]
        |                    > 8 * list_aggregate(cs, 'sum') THEN
        |            CASE WHEN j = 63 THEN CAST('-9223372036854775808' AS HUGEINT)
        |                 ELSE CAST(CAST(1 AS BIGINT) << CAST(j AS INT) AS HUGEINT)
        |            END
        |          ELSE CAST(0 AS HUGEINT) END), 'sum') AS BIGINT) AS ahash
        |      FROM g),
        |delta AS (
        |  SELECT d.doc_id, d.text || ' v2' AS text, h.ahash
        |  FROM documents d LEFT JOIN h USING (doc_id)
        |  WHERE d.doc_id % 5 = 0 AND d.doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT d.doc_id, d.text, h2.ahash
        |  FROM documents d
        |  LEFT JOIN h h1 ON h1.doc_id = d.doc_id
        |  LEFT JOIN h h2 ON h2.doc_id = d.doc_id + 1
        |  WHERE d.doc_id % 19 = 0 AND d.doc_id % 5 <> 0 AND d.doc_id % 7 <> 0
        |    AND h2.ahash IS DISTINCT FROM h1.ahash
        |  UNION ALL
        |  SELECT d.doc_id + 10000000, d.text, h.ahash
        |  FROM documents d LEFT JOIN h USING (doc_id)
        |  WHERE d.doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, substr(text, 1, 80),
        |    CAST(NULL AS BIGINT)
        |  FROM documents WHERE source = 'src0' AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 30000000,
        |    list_aggregate(list_transform(range(1, 26),
        |      i -> 'zz' || doc_id || 'w' || i), 'string_agg', ' '),
        |    CAST(NULL AS BIGINT)
        |  FROM documents WHERE doc_id % 17 = 0
        |  UNION ALL
        |  SELECT d.doc_id + 40000000,
        |    list_aggregate(list_transform(range(1, 26),
        |      i -> 'mm' || d.doc_id || 'w' || i), 'string_agg', ' '),
        |    h.ahash
        |  FROM documents d LEFT JOIN h USING (doc_id)
        |  WHERE d.doc_id % 13 = 0),
        |wn AS (SELECT doc_id, string_split(text, ' ') AS w FROM delta
        |       WHERE len(string_split(text, ' ')) >= 3),
        |shn AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wn),
        |wo AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |       WHERE len(string_split(text, ' ')) >= 3),
        |sho AS (SELECT DISTINCT doc_id,
        |          unnest(list_transform(range(1, len(w) - 1),
        |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |        FROM wo),
        |cand AS (SELECT a.doc_id da, b.doc_id db, count(*) common
        |         FROM shn a JOIN sho b ON a.sh = b.sh GROUP BY 1, 2),
        |sn AS (SELECT doc_id, count(*) n FROM shn GROUP BY 1),
        |so AS (SELECT doc_id, count(*) n FROM sho GROUP BY 1),
        |dup AS (SELECT DISTINCT da AS doc_id
        |        FROM cand JOIN sn sa ON da = sa.doc_id
        |                  JOIN so sb ON db = sb.doc_id
        |        WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.8),
        |mdup AS (SELECT DISTINCT d.doc_id FROM delta d
        |         WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
        |           AND d.ahash IS NOT NULL
        |           AND EXISTS (SELECT 1 FROM h i
        |                       WHERE bit_count(xor(i.ahash, d.ahash)) <= 3)),
        |ev AS (SELECT DISTINCT substr(text, CAST(i AS INT), 40) AS g
        |    FROM (SELECT text,
        |            unnest(generate_series(1, length(text) - 39)) AS i
        |          FROM documents WHERE source = 'src0')),
        |sv AS (SELECT * FROM delta
        |       WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        |         AND doc_id NOT IN (SELECT doc_id FROM mdup)),
        |tw AS (SELECT doc_id, substr(text, CAST(i AS INT), 40) AS g
        |       FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text) - 39)) AS i
        |             FROM sv)),
        |cont AS (SELECT DISTINCT doc_id FROM tw
        |         WHERE g IN (SELECT g FROM ev))
        |SELECT d.doc_id,
        |  CASE WHEN d.doc_id IN (SELECT doc_id FROM dup) THEN 'dup_text'
        |       WHEN d.doc_id IN (SELECT doc_id FROM mdup) THEN 'dup_media'
        |       WHEN d.doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
        |       ELSE 'kept' END AS status,
        |  CAST(length(d.text) AS BIGINT) AS n_chars
        |FROM delta d ORDER BY d.doc_id""".stripMargin
  )

  /** CTE prefix over a filtered document base: `dup(da, db)` = the
    * verified MinHash near-dup pairs (the q21 oracle's own pair
    * definition) restricted to rows matching `baseWhere`.
    * `WITH RECURSIVE` is harmless when nothing recursive follows.
    */
  private def dupPairsCteFor(baseWhere: String): String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |           WHERE ($baseWhere) AND len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(w) - 1),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |       FROM w),
       |cand AS (SELECT a.doc_id da, b.doc_id db, count(*) common
       |         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |         GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
       |dup AS (SELECT da, db
       |        FROM cand JOIN sizes sa ON da = sa.doc_id
       |                  JOIN sizes sb ON db = sb.doc_id
       |        WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5)""".stripMargin

  private lazy val dupPairsCte: String = dupPairsCteFor("TRUE")

  private def closureTail: String =
    """e AS (SELECT da AS a, db AS b FROM dup
      |      UNION SELECT db, da FROM dup),
      |reach(a, b) AS (SELECT a, a FROM e
      |                UNION
      |                SELECT e.a, r.b FROM e JOIN reach r ON e.b = r.a)""".stripMargin

  /** `reach(a, b)` = transitive closure of the near-dup pairs, used by
    * the q75 cluster labels and the q57/q76 keep policies.
    */
  private lazy val dupClosureCte: String = s"$dupPairsCte,\n$closureTail"

  // `final val` literal => compile-time constant, inlined at use
  // sites — this is REQUIRED, not style: oracleSql initializes before
  // this line runs (declaration order), and a plain val would read 0
  // inside the lazy SQL builder
  private final val PageRankIters = 5

  /** The q118 oracle: the q21 pair definition, then every PageRank
    * iteration unrolled — truncating integer division at the
    * per-vertex mass split AND the damped recombination, exactly the
    * operator's fixed-point arithmetic.
    */
  private lazy val pageRankSql: String = {
    val rounds = (1 to PageRankIters).map { i =>
      s"""p$i AS (SELECT dg.id, dg.deg,
         |    CAST(150000 + (850000 * s.s) // 1000000 AS BIGINT) AS pr
         |  FROM dg JOIN (SELECT e.dst AS id, sum(p.pr // p.deg) AS s
         |                FROM p${i - 1} p JOIN ed e ON p.id = e.src
         |                GROUP BY 1) s USING (id))""".stripMargin
    }.mkString(",\n")
    s"""$dupPairsCte,
       |ed AS (SELECT da AS src, db AS dst FROM dup
       |       UNION ALL SELECT db, da FROM dup),
       |dg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
       |       FROM ed GROUP BY 1),
       |p0 AS (SELECT id, deg, CAST(1000000 AS BIGINT) AS pr FROM dg),
       |$rounds
       |SELECT id, deg, pr FROM p$PageRankIters ORDER BY id""".stripMargin
  }
}
