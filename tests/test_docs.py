"""QUERIES.md stays in sync with the registry (and regenerates it)."""

from __future__ import annotations


def _render() -> str:
    from bigdata_kafka_2_spark.plans import load_extended

    reg = load_extended()
    lines = [
        "# QUERIES — the engine's named-query registry",
        "",
        "Auto-generated from `bigdata_kafka_2_spark/plans/` "
        "(regenerate: see tests/test_docs.py). Every entry is exposed via "
        "`__spark_entry__.queries()`; \"oracle\" marks entries the driver "
        "hash-compares against DuckDB (others get rows-only checks and "
        "invariant tests).",
        "",
        "| query | oracle | tags | description |",
        "|---|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        desc = " ".join(q.description.split())
        lines.append(
            f"| `{name}` | {'✓' if q.oracle else '—'} | "
            f"{', '.join(q.tags)} | {desc} |"
        )
    n_oracle = sum(1 for q in reg.values() if q.oracle)
    lines += ["", f"**{len(reg)} queries, {n_oracle} oracle-checked.**", ""]
    return "\n".join(lines)


def test_queries_md_in_sync():
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "QUERIES.md"
    expected = _render()
    if path.read_text() != expected:
        path.write_text(expected)  # self-heal, then fail so the diff is committed
        raise AssertionError("QUERIES.md was stale — regenerated; commit the diff")
