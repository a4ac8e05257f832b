"""Profile f1_extract_keywords — the VERDICT r9/r10 directive.

f1's driver-bench reading has sat in a 1.6-2.6 s band for three rounds
while its plan never changed (a zero-shuffle native explode). This tool
replaces "probably contention" prose with a committed measurement:

1. **Expression-prefix decomposition** — times each cumulative prefix of
   f1's expression chain (scan -> normalize -> tokenize -> keyword
   filter -> explode) with noop-write forcing, so the cost lands on a
   named sub-expression instead of "the query".
2. **Quiet 20-iteration run** — the steady-state distribution on an
   otherwise idle box (min is the contention-free floor).
3. **Loaded 20-iteration run** — the same query while N CPU-burner
   processes saturate the box, reproducing a loaded driver window.
4. **CPU-vs-wall attribution** — executorRunTime / executorCpuTime /
   jvmGcTime deltas from the Spark status REST API per phase: if the
   executor CPU time per iteration is flat across phases while wall
   inflates, the inflation is host contention by arithmetic, not
   attribution.
5. **Bench-replica first run** — a FRESH session that warms only the
   table scans (exactly bench.py's warm-up) and then times f1 once:
   the number the driver bench actually records, isolating one-time
   codegen/compile cost from the steady-state interior.

Writes PROFILE_f1.md next to the repo root and prints one JSON line.

Run ALONE (it is timing-sensitive, like bench.py):

    SPARK_GRAFT_UI=true python tools/profile_f1.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import functions as F  # noqa: E402

from a3_fp_bigdata_spark.data import table  # noqa: E402
from a3_fp_bigdata_spark.functions import text as TX  # noqa: E402
from a3_fp_bigdata_spark.metrics import _rest  # noqa: E402
from a3_fp_bigdata_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PROFILE_F1_ITERS", "20"))
PREFIX_ITERS = 5


def force(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def exec_time_totals(spark) -> dict[str, int]:
    """Cumulative executor run/cpu/gc milliseconds over completed stages."""
    stages = _rest(spark, "stages?status=complete")
    out = {"run_ms": 0, "cpu_ms": 0, "gc_ms": 0}
    for s in stages:
        out["run_ms"] += s.get("executorRunTime", 0)
        # REST reports cpu time in ns
        out["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        out["gc_ms"] += s.get("jvmGcTime", 0)
    return out


def _burn(stop_t: float) -> None:
    x = 1.0
    while time.time() < stop_t:
        x = x * 1.0000001 % 1e9


def run_phase(spark, df, iters: int) -> dict:
    t0_tot = exec_time_totals(spark)
    walls = [force(df) for _ in range(iters)]
    t1_tot = exec_time_totals(spark)
    return {
        "walls_s": [round(w, 3) for w in walls],
        "min_s": round(min(walls), 3),
        "median_s": round(statistics.median(walls), 3),
        "max_s": round(max(walls), 3),
        "exec_run_ms_per_iter": (t1_tot["run_ms"] - t0_tot["run_ms"]) // iters,
        "exec_cpu_ms_per_iter": (t1_tot["cpu_ms"] - t0_tot["cpu_ms"]) // iters,
        "exec_gc_ms_per_iter": (t1_tot["gc_ms"] - t0_tot["gc_ms"]) // iters,
    }


def main() -> None:
    spark = local_session(app_name="profile-f1")
    docs = table(spark, SF_DIR, "documents")
    text = F.col("text")

    # cumulative expression prefixes, cheapest to full f1
    norm = TX.normalize(text)
    toks = F.filter(F.split(norm, " "), lambda t: F.length(t) > 0)
    kws = TX.keywords(text)
    prefixes = {
        "scan_only": docs.select("doc_id", "text"),
        "plus_normalize": docs.select("doc_id", norm.alias("t")),
        "plus_tokenize": docs.select("doc_id", toks.alias("t")),
        "plus_keyword_filter": docs.select("doc_id", kws.alias("t")),
        "full_f1_explode": docs.select(
            "doc_id", F.explode(kws).alias("keyword")
        ),
    }

    # warm: scan path + codegen for every prefix shape
    for df in prefixes.values():
        force(df)

    decomposition = {
        name: round(
            statistics.median([force(df) for _ in range(PREFIX_ITERS)]), 3
        )
        for name, df in prefixes.items()
    }

    f1 = prefixes["full_f1_explode"]
    quiet = run_phase(spark, f1, ITERS)

    # loaded phase: saturate every core with burner processes
    n_burn = os.cpu_count() or 32
    stop_t = time.time() + 600  # hard ceiling; terminated explicitly below
    procs = [mp.Process(target=_burn, args=(stop_t,), daemon=True)
             for _ in range(n_burn)]
    for p in procs:
        p.start()
    time.sleep(1)  # let the burners reach steady state
    try:
        loaded = run_phase(spark, f1, ITERS)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()

    # bench-replica: a FRESH PROCESS (fresh JVM — a same-process session
    # restart keeps the warmed JVM and reads ~0.35 s, nothing like the
    # driver number) that warms only the table scans exactly like
    # bench.py, then times f1's first run and three follow-ups.
    # first - follow-up = one-time fresh-JVM cost (Janino codegen of the
    # stopword-heavy expression, catalyst/JIT warm-up), paid once per
    # session — NOT per-row work.
    spark.stop()
    import subprocess

    replica = json.loads(
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--replica"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip().splitlines()[-1]
    )
    replica_walls = replica["walls_s"]

    out = {
        "sf_dir": SF_DIR,
        "iters": ITERS,
        "decomposition_median_s": decomposition,
        "quiet": quiet,
        "loaded": {"n_burners": n_burn, **loaded},
        "bench_replica": {
            "first_run_s": replica_walls[0],
            "followups_s": replica_walls[1:],
        },
    }
    print(json.dumps(out))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PROFILE_f1.md"), "w") as fh:
        fh.write(render_md(out))


def render_md(out: dict) -> str:
    d = out["decomposition_median_s"]
    q, l = out["quiet"], out["loaded"]
    lines = [
        "# PROFILE: f1_extract_keywords",
        "",
        f"Captured by `tools/profile_f1.py` at `{out['sf_dir']}`, "
        f"{out['iters']} iterations per phase, noop-write forcing "
        "(bench.py's materialization). Run on an otherwise-idle box; "
        "the loaded phase adds "
        f"{l['n_burners']} CPU-burner processes.",
        "",
        "## Expression-prefix decomposition (median of 5, warm)",
        "",
        "| cumulative prefix | median s | marginal s |",
        "|---|---|---|",
    ]
    prev = 0.0
    for name, v in d.items():
        lines.append(f"| {name} | {v:.3f} | {v - prev:+.3f} |")
        prev = v
    lines += [
        "",
        "## Quiet vs loaded (full f1)",
        "",
        "| phase | min s | median s | max s | exec run ms/iter |"
        " exec cpu ms/iter | gc ms/iter |",
        "|---|---|---|---|---|---|---|",
        f"| quiet | {q['min_s']} | {q['median_s']} | {q['max_s']} |"
        f" {q['exec_run_ms_per_iter']} | {q['exec_cpu_ms_per_iter']} |"
        f" {q['exec_gc_ms_per_iter']} |",
        f"| loaded ({l['n_burners']} burners) | {l['min_s']} |"
        f" {l['median_s']} | {l['max_s']} | {l['exec_run_ms_per_iter']} |"
        f" {l['exec_cpu_ms_per_iter']} | {l['exec_gc_ms_per_iter']} |",
        "",
        "## Bench-replica (fresh PROCESS/JVM, bench.py's exact"
        " warm-up; first run = the driver-bench number)",
        "",
        f"- first run: **{out['bench_replica']['first_run_s']} s**;"
        f" follow-ups: {out['bench_replica']['followups_s']} s.",
        "- first - follow-up = one-time fresh-JVM cost (Janino codegen"
        " of the stopword-heavy expression, catalyst/JIT warm-up),"
        " paid once per session — NOT per-row work. A same-process"
        " session restart (warm JVM) reads ~0.35 s on its first run,"
        " confirming the gap is JVM warm-up, not the plan.",
        "",
        "## Reading",
        "",
        f"- The contention-free steady-state floor is the quiet-phase"
        f" min ({q['min_s']} s); the loaded-phase median"
        f" ({l['median_s']} s) shows what a busy window adds.",
        "- wall inflation under full CPU load: "
        f"{l['median_s'] / max(q['median_s'], 1e-9):.2f}x; executor CPU"
        " inflation: "
        f"{l['exec_cpu_ms_per_iter'] / max(q['exec_cpu_ms_per_iter'], 1):.2f}x"
        " (SMT/frequency sharing inflates measured CPU somewhat; the"
        " wall inflating faster than CPU is the contention signature).",
        "- Full per-iteration walls: quiet "
        f"{out['quiet']['walls_s']}, loaded {out['loaded']['walls_s']}.",
        "",
    ]
    return "\n".join(lines) + "\n"


def replica_main() -> None:
    """Fresh-JVM bench replica (run as a subprocess of main)."""
    spark = local_session(app_name="profile-f1-replica")
    from a3_fp_bigdata_spark.data import TABLES

    for name in TABLES:
        force(table(spark, SF_DIR, name))
    docs = table(spark, SF_DIR, "documents")
    f1 = docs.select(
        "doc_id", F.explode(TX.keywords(F.col("text"))).alias("keyword")
    )
    walls = [round(force(f1), 3) for _ in range(4)]
    print(json.dumps({"walls_s": walls}))


if __name__ == "__main__":
    if "--replica" in sys.argv:
        replica_main()
    else:
        main()
