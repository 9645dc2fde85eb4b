#!/usr/bin/env python
"""Machine-checkable coverage index (r11 verdict #6).

Emits ``COVERAGE_INDEX.md`` (one table row per registered query) and
``COVERAGE_INDEX.json`` (the same facts as data) GENERATED from the
registry itself plus the committed round records, so every claim in
COVERAGE.md's narrative is re-derivable by running one script:

- query -> implementing function file:line (via ``inspect`` on the
  registered ``spark_fn``),
- oracle kind (``sql`` / ``callable`` / ``rows-only``),
- graded status: in the CURATED 50 this round, plus the set of past
  rounds whose committed ``CORRECTNESS_r*.json`` carried the query
  (the driver's hard signal), with its latest result,
- mirror status: every registry entry is parametrized in
  ``tests/test_oracle.py`` — the full replica of the driver gate,
- scale-probe factors (10x and 30x proportional replicas) and any
  adjudication note attached to the probe record,
- latest bench wall (Spark min-of-N from BENCH_DETAIL.json, and the
  DuckDB oracle wall where the r12 bench recorded one).

Usage: ``python scripts/coverage_index.py`` from the repo root.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rel(path: str) -> str:
    return os.path.relpath(path, REPO)


def main() -> None:
    from bigdata_kafka_2_spark.plans import CURATED, load_extended

    registry = load_extended()

    graded_history: dict[str, list[str]] = {}
    latest: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1)
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        for name, row in rec.items():
            graded_history.setdefault(name, []).append(f"r{int(rnd)}")
            latest[name] = row

    def _load(path):
        try:
            return json.load(open(os.path.join(REPO, path)))
        except Exception:
            return {}

    probe10 = _load("SCALE_PROBE.json")
    probe30 = _load("SCALE_PROBE_30X.json")
    bench = _load("BENCH_DETAIL.json")
    bench_q = bench.get("queries", {})
    duck_q = bench.get("duckdb_sec", {}) or {}

    rows = []
    for name, q in registry.items():
        fn = inspect.unwrap(q.spark_fn)
        src = _rel(inspect.getsourcefile(fn))
        line = inspect.getsourcelines(fn)[1]
        if q.oracle is None:
            okind = "rows-only"
        elif callable(q.oracle):
            okind = "callable"
        else:
            okind = "sql"
        hist = graded_history.get(name, [])
        last = latest.get(name)
        if last is not None:
            ok = bool(
                last.get("hash_match")
                or (okind == "rows-only" and last.get("rows_match"))
            )
            last_result = ("pass" if ok else "FAIL") + f" ({hist[-1]})"
        else:
            last_result = ""
        p10 = (probe10.get("queries") or {}).get(name, {})
        p30 = (probe30.get("queries") or {}).get(name, {})
        note = (probe10.get("notes") or {}).get(name) or (
            probe30.get("notes") or {}
        ).get(name)
        rows.append(
            {
                "query": name,
                "impl": f"{src}:{line}",
                "oracle": okind,
                "tags": list(q.tags),
                "curated_now": name in CURATED,
                "graded_rounds": hist,
                "last_graded_result": last_result,
                "probe_10x_ratio": p10.get("ratio"),
                "probe_30x_ratio": p30.get("ratio"),
                "probe_adjudicated": bool(note),
                "bench_spark_sec": bench_q.get(name),
                "bench_duckdb_sec": duck_q.get(name)
                if isinstance(duck_q.get(name), (int, float))
                else None,
            }
        )

    summary = {
        "registry_size": len(registry),
        "curated": len(CURATED),
        "oracle_sql": sum(1 for r in rows if r["oracle"] == "sql"),
        "oracle_callable": sum(1 for r in rows if r["oracle"] == "callable"),
        "rows_only": sum(1 for r in rows if r["oracle"] == "rows-only"),
        "ever_graded": sum(1 for r in rows if r["graded_rounds"]),
        "never_graded": sum(1 for r in rows if not r["graded_rounds"]),
        "probe_10x_covered": sum(
            1 for r in rows if r["probe_10x_ratio"] is not None
        ),
        "probe_30x_covered": sum(
            1 for r in rows if r["probe_30x_ratio"] is not None
        ),
        "benched": sum(1 for r in rows if r["bench_spark_sec"] is not None),
    }

    with open(os.path.join(REPO, "COVERAGE_INDEX.json"), "w") as fh:
        json.dump({"summary": summary, "queries": rows}, fh, indent=1)

    def fmt(v, nd=2):
        if v is None:
            return ""
        if isinstance(v, bool):
            return "y" if v else ""
        if isinstance(v, float):
            return f"{v:.{nd}f}"
        return str(v)

    lines = [
        "# COVERAGE INDEX (generated — do not edit)",
        "",
        f"Regenerate with `python scripts/coverage_index.py`. "
        f"Registry {summary['registry_size']} queries / "
        f"{summary['curated']} curated (graded) this round / "
        f"{summary['ever_graded']} ever driver-graded / "
        f"{summary['oracle_sql']} plain-SQL oracles + "
        f"{summary['oracle_callable']} callable + "
        f"{summary['rows_only']} rows-only / "
        f"probe coverage {summary['probe_10x_covered']}@10x "
        f"{summary['probe_30x_covered']}@30x / "
        f"{summary['benched']} benched.",
        "",
        "'graded' lists every round whose committed CORRECTNESS_r*.json"
        " carried the query (the driver's hard signal); every row is"
        " additionally hash-checked per-round by the mirror suite"
        " (tests/test_oracle.py). Probe ratios are wall-clock factors"
        " on 10x/30x proportional replicas (adj = adjudication note in"
        " the probe record). Bench walls are min-of-N seconds at sf0.1"
        " (see BENCH_DETAIL.json's noise protocol); dk = the DuckDB"
        " wall for the same oracle where recorded.",
        "",
        "| query | impl | oracle | curated | graded | last | 10x | 30x"
        " | adj | spark s | dk s |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {query} | {impl} | {oracle} | {cur} | {hist} | {last} |"
            " {p10} | {p30} | {adj} | {sp} | {dk} |".format(
                query=r["query"],
                impl=r["impl"],
                oracle=r["oracle"],
                cur="y" if r["curated_now"] else "",
                hist=" ".join(r["graded_rounds"]),
                last=r["last_graded_result"],
                p10=fmt(r["probe_10x_ratio"]),
                p30=fmt(r["probe_30x_ratio"]),
                adj=fmt(r["probe_adjudicated"]),
                sp=fmt(r["bench_spark_sec"]),
                dk=fmt(r["bench_duckdb_sec"]),
            )
        )
    with open(os.path.join(REPO, "COVERAGE_INDEX.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
