#!/usr/bin/env python3
"""Scale-growth smoke for the pair-miner family: sf0.1 vs sf1 (10x rows).

Every miner below is claimed to be "bucketed, output ∝ collisions" —
i.e. runtime should track input + output size, never all-pairs. This
script measures that claim instead of arguing it: it runs the gated
bench queries on sf0.1 and on the 10x testdata_sf1 tier
(tools/gen_sf1.py), counts each query's output rows at both tiers via
graft.Verify dumps, and grades time growth against a linearity budget.

Budget: with 10x input rows, a linear-in-(rows + output) plan may grow
time by up to 10 x max(1, output_ratio/10) x SLACK. SLACK=2.0 absorbs
scheduler noise and log-factors; a truly quadratic miner would show
~100x and fail by an order of magnitude, which is the regression this
smoke exists to catch.

Usage: python3 tools/scale_smoke.py          (writes tools/scale_smoke_report.md)
Needs: compiled classes in target/scala-2.13/classes (sbt compile).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "testdata_sf1")
QUERIES = ["q34", "q38", "q48", "q86", "q87", "q101", "q102"]
SLACK = 2.0
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
JAVA = [
    "java", "-Xmx96g",
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
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=CPUS,
               SPARK_GRAFT_ONLY=",".join(QUERIES),
               SPARK_GRAFT_REPS="3")
    out = subprocess.run(JAVA + ["graft.Bench"], env=env, cwd=REPO,
                         capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')][-1]
    return json.loads(line)


def run_verify(sf_dir, out_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS=CPUS)
    subprocess.run(JAVA + ["graft.Verify", sf_dir, out_dir,
                           ",".join(QUERIES)],
                   env=env, cwd=REPO, capture_output=True, text=True,
                   check=True)
    import duckdb
    con = duckdb.connect()
    rows = {}
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p):
            rows[d] = con.execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')"
            ).fetchone()[0]
    return rows


def main():
    print("== bench sf0.1 ==", flush=True)
    b01 = run_bench(SF01)
    print("== bench sf1 ==", flush=True)
    b1 = run_bench(SF1)
    print("== output rows sf0.1 ==", flush=True)
    r01 = run_verify(SF01, "/tmp/scale_smoke_sf01")
    print("== output rows sf1 ==", flush=True)
    r1 = run_verify(SF1, "/tmp/scale_smoke_sf1")

    def find(m, q):
        for k, v in m.items():
            if k.startswith(q + "_") or k == q:
                return k, v
        return None, None

    lines = [
        "# Scale-growth smoke: sf0.1 -> sf1 (10x rows)",
        "",
        f"Input: documents 5,000 -> 50,000 rows; customer 15,000 -> 150,000",
        f"rows (tools/gen_sf1.py, deterministic). Bench medians of 3 timed",
        f"passes after a cold pass, local[{CPUS}]; output rows from",
        "graft.Verify dumps at each tier.",
        "",
        f"Linearity budget per query: time_ratio <= 10 x max(1,",
        f"output_ratio/10) x {SLACK} (slack absorbs scheduler noise and",
        "log-factors; a quadratic miner would exceed the budget ~5x+).",
        "",
        "| query | t(sf0.1) s | t(sf1) s | time ratio | out(sf0.1) | out(sf1) | out ratio | budget | verdict |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    all_ok = True
    for q in QUERIES:
        k01, t01 = find(b01["queries"], q)
        _, t1 = find(b1["queries"], q)
        _, o01 = find(r01, q)
        _, o1 = find(r1, q)
        tr = t1 / t01 if t01 else float("inf")
        orat = (o1 / o01) if o01 else float("inf") if o1 else 1.0
        budget = 10 * max(1.0, (orat if orat != float("inf") else 1.0) / 10) * SLACK
        ok = tr <= budget
        all_ok &= ok
        lines.append(
            f"| {k01} | {t01:.2f} | {t1:.2f} | {tr:.1f}x | {o01} | {o1} "
            f"| {orat if orat != float('inf') else 'inf'}"
            f"{'x' if orat != float('inf') else ''} | <={budget:.0f}x "
            f"| {'PASS' if ok else 'FAIL'} |")
    lines += [
        "",
        f"**Overall: {'PASS' if all_ok else 'FAIL'}** — "
        + ("every miner grew at or below the linear budget."
           if all_ok else "a miner exceeded the linear budget; see FAIL rows."),
        "",
        "Raw bench lines:",
        "```json",
        json.dumps({"sf0.1": b01["queries"], "sf1": b1["queries"]}, indent=1),
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
