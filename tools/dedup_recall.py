#!/usr/bin/env python3
"""Measured banding recall of the MinHash+LSH near-dup miner.

Ground truth: the EXACT word-trigram Jaccard pair set at each
threshold (DuckDB over the same parquet — the q22/q145 verification
arithmetic). Engine: graft.tools.DedupRecall's verified pair dumps.
Precision is 1 by construction (every banded candidate is verified
with exact Jaccard from the stored sets before emission), so the
table reports the one open quantity — how much of the true pair set
the 16x2 banding surfaces — next to the analytic 1-(1-t^2)^16 curve.

Usage: python3 tools/dedup_recall.py [sfDir ...]  (default sf0.1, sf1)
Writes tools/dedup_recall_report.md. Needs compiled classes.
"""
import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]]
THRESHOLDS = [0.5, 0.6, 0.7, 0.8]

TRUTH_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM read_parquet('{dir}/documents.parquet')
           WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM w),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
cand AS (SELECT a.doc_id da, b.doc_id db, count(*) common
         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT da, db FROM cand
JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
WHERE common * 1.0 / (sa.n + sb.n - common) >= {t}
"""


def engine_pairs(sf_dir):
    out = subprocess.run(
        ["java", "-Xmx96g", "-XX:+UseZGC"] + OPENS +
        ["-Dio.netty.tryReflectiveSetAccessible=true", "-cp", CP,
         "graft.tools.DedupRecall", sf_dir,
         ",".join(str(t) for t in THRESHOLDS)],
        capture_output=True, text=True, check=True, cwd="/tmp")
    res = {}
    for line in out.stdout.splitlines():
        if line.startswith('{"t"'):
            d = json.loads(line)
            res[d["t"]] = {tuple(sorted(p)) for p in d["pairs"]}
    return res


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                            os.path.join(REPO, "testdata_sf1")]
    con = duckdb.connect()
    lines = [
        "# Measured MinHash+LSH banding recall vs exact-Jaccard truth",
        "",
        "Engine pairs from `graft.tools.DedupRecall` (verified output of",
        "`TextDedup.minhashLshPairs` — precision 1 by construction, every",
        "candidate exact-verified); truth = the exact word-trigram Jaccard",
        "pair set in DuckDB. Analytic recall of b=16, r=2 banding at the",
        "threshold boundary is 1-(1-t^2)^16; measured recall is over the",
        "WHOLE >= t truth set (pairs far above t collide with probability",
        "near 1, so measured >= analytic-at-boundary).",
        "",
        "| sf dir | t | truth pairs | engine pairs | recall | analytic @ t |",
        "|---|---|---|---|---|---|",
    ]
    for d in dirs:
        eng = engine_pairs(d)
        for t in THRESHOLDS:
            truth = {tuple(sorted(r)) for r in
                     con.execute(TRUTH_SQL.format(dir=d, t=t)).fetchall()}
            got = eng[t]
            extra = got - truth
            assert not extra, (
                f"{len(extra)} engine pairs below the exact threshold at "
                f"{d} t={t}: {sorted(extra)[:5]} — precision must be 1")
            rec = len(got & truth) / len(truth) if truth else 1.0
            analytic = 1 - (1 - t * t) ** 16
            lines.append(f"| {os.path.basename(d)} | {t} | {len(truth)} "
                         f"| {len(got)} | {rec:.4f} | {analytic:.4f} |")
            print(lines[-1], flush=True)
    out = os.path.join(REPO, "tools", "dedup_recall_report.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
