#!/usr/bin/env python3
"""Scale-growth smoke, sf0.1 vs sf1 (10x rows): the pair-miner family
plus (r10) the compositions and newcomers — components, exact
percentiles, curate e2e, quantized IVF, semantic dedup, winnowing, PQ.

Every miner below is claimed to be "bucketed, output ∝ collisions" —
i.e. runtime should track input + output size, never all-pairs. This
script measures that claim instead of arguing it: it runs the gated
bench queries on sf0.1 and on the 10x testdata_sf1 tier
(tools/gen_sf1.py), counts each query's output rows at both tiers via
graft.Verify dumps, and grades time growth against a linearity budget.

Budget: with 10x input rows, a linear-in-(rows + work) plan may grow
time by up to 10 x max(1, work_ratio/10) x SLACK, where work = the
query's true output-proportional workload: its result rows, OR its
collision-pair count when the result is a thresholded view of a pair
mining (q48: the inverted-index join touches sum-over-shingles f*(f-1)/2
pairs; the containment>=0.8 filter then hides most of that work from
the row count, so rows alone would under-budget a legitimately
collision-linear plan). SLACK=2.0 absorbs scheduler noise and
log-factors; a truly super-collision-linear miner still fails by an
order of magnitude, which is the regression this smoke exists to catch.

Usage: python3 tools/scale_smoke.py          (writes tools/scale_smoke_report.md)
Bench/verify results are cached in /tmp/scale_smoke_cache.json so a
budget-formula change re-grades without re-running ~45 min of
measurement; delete the cache (or pass --fresh) to re-measure.
Needs: compiled classes in target/scala-2.13/classes (sbt compile).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "testdata_sf1")
QUERIES = ["q34", "q38", "q48", "q86", "q87", "q101", "q102",
           # r10: compositions + newcomers (VERDICT r9 directive 4):
           # components (q57/q75), exact percentiles (q64), curate e2e
           # (q76), quantized IVF (q110), semantic dedup (q112),
           # winnowing (q114), PQ codes (q121)
           "q57", "q64", "q75", "q76", "q110", "q112", "q114", "q121",
           "q122",
           # r10 session 2: residual IVFADC (q123), feature hashing
           # (q124), KMV set-ops (q126), maximal dup spans (q127)
           "q123", "q124", "q126", "q127",
           # r13 (r11 verdict directive 5): span-removal manifest with
           # the key_gh-windowed ownership pass (q131 — linear-with-skew
           # window, not a self-join), the media hash/miner family
           # (q136 uncapped aHash pairs, q137 audio fingerprints, q138
           # video hashes) and the capped 64-bit simhash miner (q140)
           "q131", "q136", "q137", "q138", "q140",
           # r13 session 2: the capped image miner (q141 — banded work
           # counted with the cap, like q140), the concat-and-chunk
           # export + its writer manifest (q143/q146 — linear window
           # cumsum + explode), snapshot diff + delta-driven
           # incremental dedup (q144/q145 — full-outer fingerprint
           # join; delta probe of the standing MinHash index), and
           # first-occurrence novelty (q147 — two gram-proportional
           # aggregations)
           "q141", "q143", "q144", "q145", "q146", "q147",
           # integer-exact Lloyd rounds (q148 — per-round narrow argmin
           # + (cluster, dim) hash agg, linear in vectors) and the
           # fractional-epoch schedule (q149 — one per-source agg + one
           # window cumsum, linear in docs), and the incremental-ingest
           # composition (q150 — delta-sized shingling + index probe +
           # survivor decontamination)
           # ingest-time novelty probe (q151 — batch grams anti-join
           # the standing index, two batch-sized aggregations)
           "q148", "q149", "q150", "q151", "q152", "q153", "q154",
           # media dedup apply (q155 — capped pairs + pointer-jumping
           # components, work ~ pairs)
           "q155", "q156",
           # r14: ADC + exact re-rank (q157 — pruned index probe + a
           # bounded broadcast semi-join), audio/video capped dedup
           # apply (q158/q159 — the q141/q155 chain, work ~ capped
           # pairs), FIM-applied packing (q160 — two windows + explode,
           # work ~ segments)
           "q157", "q158", "q159", "q160",
           # content-defined chunking (q162 — one narrow kernel pass +
           # generate; the share join is sized by chunks)
           "q162",
           # r15: CDC apply — ingest probe against the standing
           # chunk-hash index (q163 — batch-only kernel + per-hash
           # aggregate) and the keep-first manifest (q164 — one
           # ownership aggregate + doc-partitioned window); trained
           # PQ codebooks (q165 — m·rounds small aggregates + one
           # narrow emit); unified multimodal ingest (q166 — the
           # q150+q161 chains composed, delta-sized work); byte-gear
           # CDC (q167 — one narrow kernel pass + generate, rows ~
           # chunks ~ input bytes); decontam apply (q168 — q101's
           # broadcast-semi hits + a hit-sized union window) and
           # normalized dedup (q169 — one digest agg + manifest join);
           # the manifest-consuming rewrites (q170/q171/q172 — hit-/
           # duplication-/chunk-sized region work + narrow reassembly)
           # and the byte-CDC apply pair (q173/q174 — ownership
           # aggregate + narrow binary reassembly)
           # and the ingest-time normalized dedup probe (q175 — batch
           # projection + index-sized hash aggregate)
           # r16: the q165 discipline at the production codebook size
           # (q176 — kCode=32 integer Lloyd: m*rounds small aggregates
           # + one narrow emit, linear in vectors)
           "q163", "q164", "q165", "q166", "q167", "q168", "q169",
           "q170", "q171", "q172", "q173", "q174", "q175", "q176",
           # r17: semantic dedup with the degenerate-cluster cap
           # (q177 — clusters above total/4 members are excluded from
           # pair mining, so pair work is bounded by the cap; the
           # work counter below replays the cap from the dump) and
           # the SEMANTIC ingest probe (q178 — batch assigned by the
           # stored centroids, history read only from the batch's
           # lists; pair work is the same-cell batch x history
           # product, counted from the dump's per-list batch sizes)
           "q177", "q178",
           # r18: the semantic ingest probe with the hot-cell guard
           # (q179 — lists above history/4 are skipped after a
           # partition-column count, so pair work is the cold cells'
           # batch x history product only) and the versioned-index
           # retrain probe (q180 — the q178 shape at the retrained
           # v1 geometry; the work counter reuses the per-list sums)
           "q179", "q180"]
SLACK = 2.0

# Annotations shown under the table. The current report is ONE uncut
# full-suite run of every listed query (q155-q160 included) at both
# tiers — no standalone merges; the notes record what changed since
# the previous run.
REMEASURED_NOTES = [
    "r18: fresh full-suite run with the semantic ingest-probe family "
    "completed — q178 graded for the first time (it had joined the "
    "list after r17's run closed), plus the new capped probe (q179, "
    "hot lists excluded from pair mining per its work counter) and "
    "the versioned-retrain probe (q180).",
    "This report is a single full-suite run (no cache merges), "
    "re-measured in r16 with the trained-PQ production-codebook gate "
    "(q176, kCode=32) added and the standing-index families "
    "(q139/q150/q151/q161/q163/q175) re-graded through the round's "
    "BUCKETED index layout (IndexLayout: partitionBy bucket, probes "
    "prune to the batch's buckets/keys once the index crosses the "
    "spark.graft.indexPruneMinBytes engage threshold; the probe-vs-"
    "index-growth claim itself is graded separately by "
    "tools/probe_smoke_report.md, which holds probe time ~flat "
    "against a 10x history). Grading statistic remains MIN of the 3 "
    "timed reps (r14 directive 2) — the medians stay in the raw JSON "
    "for contention forensics.",
    "Historical context: q144's fp_sum overflowed i64 at sf1 (fixed "
    "with a modular digest); q148's interpreted HOF quantize chain "
    "cost 41 s at sf1 before the codegen'd graft_quantize8_arr "
    "kernel; q34 (155M-pair spill-heavy global sort, the suite's most "
    "disk-bound query) measured 96.6-320.8 s across one afternoon of "
    "r14's degraded-host standalone re-runs with identical code and "
    "row counts — a distinct-value-domain rewrite was prototyped and "
    "rejected (it concentrates pair generation into few partitions, "
    "measuring slower).",
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE = "/tmp/scale_smoke_cache_v2.json"

# True-workload counter for miners whose gated output is a thresholded
# view of the collision set: the pairs the inverted-index join actually
# touches (sum over distinct-shingle doc-frequencies of f*(f-1)/2 —
# q48 is uncapped 3-shingle containment). The banded miners (q34/q38)
# and the capped configs (q86/q87) already emit ~their collision set,
# so their row counts are their work.
# Work counters computed from the graft.Verify DUMP itself (the dump
# already carries the per-row assignment the quadratic term depends
# on): q112's within-cluster pair work is Σ|cell|² over its own
# cluster_id column — replicated embeddings put every clone in its
# original's cell, so cells grow 10x and pair work ~100x while output
# rows grow only 10x; grading on rows alone would flag a correctly
# cell-quadratic plan.
DUMP_WORK_SQL = {
    "q112": """
      SELECT CAST(sum(n * n) AS BIGINT) FROM (
        SELECT cluster_id, count(*) AS n
        FROM read_parquet('{dump}/*.parquet') GROUP BY 1)""",
    # q177 = q112 with the cap: clusters above total/4 are excluded
    # from pair mining (their members only pay the linear assignment
    # term), so the query's true work is linear + the SMALL cells'
    # pair term — the bound the cap exists to enforce
    "q177": """
      SELECT CAST(sum(CASE WHEN n <= t / 4 THEN n * n ELSE n END)
                  AS BIGINT) FROM (
        SELECT cluster_id, count(*) AS n, sum(count(*)) OVER () AS t
        FROM read_parquet('{dump}/*.parquet') GROUP BY 1)""",
    # q178's probe joins each batch cell against the SAME cell of the
    # history; the gate's batch is the jittered history, so both sides
    # of every cell have the dump's per-list count — pair work ~ sum n²
    "q178": """
      SELECT CAST(sum(n * n) AS BIGINT) FROM (
        SELECT list_id, count(*) AS n
        FROM read_parquet('{dump}/*.parquet') GROUP BY 1)""",
    # q179 = q178 with the hot-cell cap: lists whose HISTORY count
    # exceeds history/4 contribute no pairs (the batch is the jittered
    # history, so the dump's per-list batch count equals the history
    # count — n > t/4 replays the guard exactly); hot lists pay only
    # the linear assignment term
    "q179": """
      SELECT CAST(sum(CASE WHEN n <= t / 4 THEN n * n ELSE n END)
                  AS BIGINT) FROM (
        SELECT list_id, count(*) AS n, sum(count(*)) OVER () AS t
        FROM read_parquet('{dump}/*.parquet') GROUP BY 1)""",
    # q180 probes the RETRAINED v1 geometry uncapped — same per-list
    # pair product as q178, just over the new assignment
    "q180": """
      SELECT CAST(sum(n * n) AS BIGINT) FROM (
        SELECT list_id, count(*) AS n
        FROM read_parquet('{dump}/*.parquet') GROUP BY 1)""",
}

WORK_SQL = {
    "q48": """
      WITH w AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
                 FROM read_parquet('{dir}/documents.parquet')),
      sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
               i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS sh FROM w),
      f AS (SELECT sh, count(*) AS f FROM sh GROUP BY 1)
      SELECT CAST(sum(f * (f - 1) / 2) AS BIGINT) FROM f""",
}

# Banded-miner candidate work, computed from the engine's own generated
# oracle SQL (run_verify's dump dir carries oracle_sql.json): reuse the
# WITH-chain that derives the 64-bit signature table, then count the
# pairs the 4x16 banded join actually touches — sum over (band, key)
# groups of f*(f-1)/2. q140 counts only non-hot keys (cap = 2, the
# gated capped config — hot groups are excluded from their band's
# join); q136 counts every key (the uncapped aHash miner is
# Theta(band collisions) by design).
BANDED_WORK = {
    "q140": ("q38_simhash64_pairs", "s", "simhash", 2),
    "q136": ("q136_image_near_dup", "h", "ahash", None),
    # q141 = q136's signatures through the capped miner: same hash
    # CTE chain, non-hot keys only (cap = 2, the gated config)
    "q141": ("q136_image_near_dup", "h", "ahash", 2),
}


def banded_work(con, out_dir, qname):
    oracle_key, table, col, cap = BANDED_WORK[qname]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        sql = json.load(f)[oracle_key]
    core = sql[:sql.rindex("SELECT a.doc_id")].rstrip().rstrip(",")
    work = (f"CASE WHEN f > {cap} THEN 0 ELSE f*(f-1)/2 END"
            if cap is not None else "f*(f-1)/2")
    return con.execute(core + f""",
      bk AS (SELECT (({col} >> 0) & 65535) AS kv, 0 AS band FROM {table}
             UNION ALL SELECT (({col} >> 16) & 65535), 1 FROM {table}
             UNION ALL SELECT (({col} >> 32) & 65535), 2 FROM {table}
             UNION ALL SELECT (({col} >> 48) & 65535), 3 FROM {table}),
      bf AS (SELECT band, kv, count(*) AS f FROM bk GROUP BY 1, 2)
      SELECT CAST(sum({work}) AS BIGINT) FROM bf"""
    ).fetchone()[0]


CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
JAVA = [
    # match the sbt fork's GC (build.sbt javaOptions): ZGC is 10-15%
    # faster than default G1 across the suite and, more importantly,
    # keeps these measurements comparable with bench_out.json's
    "java", "-Xmx96g", "-XX:+UseZGC",
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
    "--add-opens=java.base/java.io=ALL-UNNAMED",
    "--add-opens=java.base/java.net=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
    "-Dio.netty.tryReflectiveSetAccessible=true",
    "-cp", CP,
]


def run_bench(sf_dir):
    # grade on MIN of the timed reps (r14 verdict directive 2): a
    # host-I/O spike inflates median and max but almost never all
    # three reps, so min is the contention-robust statistic for a
    # LINEARITY grade; medians stay in the report's raw JSON
    spread_path = f"/tmp/scale_smoke_spread_{os.path.basename(sf_dir)}.json"
    # Bench wraps the spread write in try/catch and still exits 0 on a
    # failed write; a stale file from a previous run would then grade
    # this round's linearity on last round's timings with no error.
    # Delete first so a missing write fails loudly at the open() below.
    if os.path.exists(spread_path):
        os.remove(spread_path)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=CPUS,
               SPARK_GRAFT_ONLY=",".join(QUERIES),
               SPARK_GRAFT_REPS="3",
               SPARK_GRAFT_SPREAD_OUT=spread_path)
    out = subprocess.run(JAVA + ["graft.Bench"], env=env, cwd=REPO,
                         capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')][-1]
    parsed = json.loads(line)
    with open(spread_path) as f:
        spread = json.load(f)["spread"]
    parsed["mins"] = {k: v["min"] for k, v in spread.items()}
    return parsed


def run_verify(sf_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS=CPUS)
    subprocess.run(JAVA + ["graft.Verify", sf_dir, out_dir,
                           ",".join(QUERIES)],
                   env=env, cwd=REPO, capture_output=True, text=True,
                   check=True)
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    rows = {}
    works = {}
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p):
            rows[d] = con.execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')"
            ).fetchone()[0]
            q = d.split("_")[0]
            if q in DUMP_WORK_SQL:
                works[q] = con.execute(
                    DUMP_WORK_SQL[q].format(dump=p)).fetchone()[0]
            if q in BANDED_WORK:
                works[q] = banded_work(con, out_dir, q)
    return rows, works


def collision_work(sf_dir):
    import duckdb
    con = duckdb.connect()
    return {q: con.execute(sql.format(dir=sf_dir)).fetchone()[0]
            for q, sql in WORK_SQL.items()}


def main():
    cached = None
    if "--fresh" not in sys.argv and os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        print(f"== reusing measurements from {CACHE} ==", flush=True)
    if cached is None:
        print("== bench sf0.1 ==", flush=True)
        b01 = run_bench(SF01)
        print("== bench sf1 ==", flush=True)
        b1 = run_bench(SF1)
        print("== output rows sf0.1 ==", flush=True)
        r01, dw01 = run_verify(SF01, "/tmp/scale_smoke_sf01")
        print("== output rows sf1 ==", flush=True)
        r1, dw1 = run_verify(SF1, "/tmp/scale_smoke_sf1")
        with open(CACHE, "w") as f:
            json.dump({"b01": b01, "b1": b1, "r01": r01, "r1": r1,
                       "dw01": dw01, "dw1": dw1}, f)
    else:
        b01, b1, r01, r1 = cached["b01"], cached["b1"], cached["r01"], cached["r1"]
        dw01, dw1 = cached.get("dw01", {}), cached.get("dw1", {})
    print("== collision work (DuckDB) ==", flush=True)
    w01 = collision_work(SF01)
    w1 = collision_work(SF1)
    # dump-derived work counters join the same (w01, w1) maps
    w01.update(dw01)
    w1.update(dw1)

    def find(m, q):
        for k, v in m.items():
            if k.startswith(q + "_") or k == q:
                return k, v
        return None, None

    lines = [
        "# Scale-growth smoke: sf0.1 -> sf1 (10x rows)",
        "",
        f"Input: documents 5,000 -> 50,000 rows; customer 15,000 -> 150,000;",
        f"lineitem 600,000 -> 6,000,000; embeddings 2,000 -> 20,000",
        f"rows (tools/gen_sf1.py, deterministic). Times graded on the MIN",
        f"of 3 timed passes after a cold pass (a shared-host I/O spike",
        f"inflates median/max but rarely all reps — min is the",
        f"contention-robust statistic for a linearity grade; medians in",
        f"the raw JSON below), local[{CPUS}]; output rows from",
        "graft.Verify dumps at each tier; collision-pair work for the",
        "thresholded miners from DuckDB over the same parquet.",
        "",
        f"Linearity budget per query: time_ratio <= 10 x max(1,",
        f"work_ratio/10) x {SLACK}, where work = max(output rows,",
        "collision pairs). The collision denominator matters for q48:",
        "its containment>=0.8 filter hides most of the inverted-index",
        "join's legitimate work from the row count (at sf1 the join",
        "touches 102x the pairs while emitting only 43x the rows —",
        "grading on rows alone would flag a collision-linear plan).",
        "The capped configs (q86/q87) are the 100 TB path precisely",
        "because they bound this term; the uncapped miners are",
        "Theta(collisions) by definition.",
        "",
        "| query | tmin(sf0.1) s | tmin(sf1) s | time ratio | out ratio | work ratio | budget | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    all_ok = True
    for q in QUERIES:
        k01, t01 = find(b01.get("mins", b01["queries"]), q)
        _, t1 = find(b1.get("mins", b1["queries"]), q)
        _, o01 = find(r01, q)
        _, o1 = find(r1, q)
        # a query whose verify dump is missing at either tier CRASHED
        # there (Verify records the error in verify_summary.json) —
        # that is a hard FAIL row, not a report crash
        if t01 is None or t1 is None or o01 is None or o1 is None:
            lines.append(f"| {k01 or q} | {t01 or 0:.2f} | {t1 or 0:.2f} "
                         f"| - | - | - | - | FAIL (missing dump/bench) |")
            all_ok = False
            continue
        tr = t1 / t01 if t01 else float("inf")
        orat = (o1 / o01) if o01 else float("inf") if o1 else 1.0
        wrat = orat
        # both tiers must have a counter: a stale/partial cache merge
        # can leave one side missing, which should degrade to the
        # row-ratio grade, not crash the whole report
        if w01.get(q) and w1.get(q) is not None:
            wrat = max(orat, w1[q] / w01[q])
        budget = 10 * max(1.0, (wrat if wrat != float("inf") else 1.0) / 10) * SLACK
        ok = tr <= budget
        all_ok &= ok
        def fx(r):
            return "inf" if r == float("inf") else f"{r:.1f}x"
        lines.append(
            f"| {k01} | {t01:.2f} | {t1:.2f} | {tr:.1f}x | {fx(orat)} "
            f"| {fx(wrat)} | <={budget:.0f}x | {'PASS' if ok else 'FAIL'} |")
    lines += [
        "",
        f"**Overall: {'PASS' if all_ok else 'FAIL'}** — "
        + ("every miner grew at or below its linear-in-work budget."
           if all_ok else "a miner exceeded the linear budget; see FAIL rows."),
        "",
        "Measurement notes:",
    ] + [f"- {n}" for n in REMEASURED_NOTES] + [
        "",
        "Raw measurements:",
        "```json",
        json.dumps({"sf0.1": b01["queries"], "sf1": b1["queries"],
                    "mins_sf0.1": b01.get("mins", {}),
                    "mins_sf1": b1.get("mins", {}),
                    "rows_sf0.1": r01, "rows_sf1": r1,
                    "collisions_sf0.1": w01, "collisions_sf1": w1}, indent=1),
        "```",
    ]
    report = os.path.join(REPO, "tools", "scale_smoke_report.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {report}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
