"""shingle_containment_pairs: the asymmetric case Jaccard misses,
directionality, and brute-force parity on the fixture."""

from __future__ import annotations

from bigdata_kafka_2_spark.operators import dedup as DD
from tests.conftest import SF_DIR


def test_containment_catches_embedded_quote(spark):
    """A short doc quoted wholesale inside a much longer one:
    containment(short→long) = 1.0 while Jaccard is below any useful
    threshold — the symmetric pass can't flag it."""
    quote = "the five boxing wizards jump quickly over the lazy dog"
    filler = " ".join(f"filler{i} words{i} extra{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        ["doc_id", "text"],
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in DD.shingle_containment_pairs(d, k=3, threshold=0.5).collect()
    }
    assert cont.get((1, 2)) == 1.0          # short fully inside long
    assert (2, 1) not in cont               # long not inside short
    jac = DD.ngram_jaccard_pairs(d, k=3, threshold=0.2).count()
    assert jac == 0                          # Jaccard misses the pair


def test_containment_bruteforce_parity(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in DD.shingle_containment_pairs(d, k=3, threshold=0.5).collect()
    }
    sets = {
        r["doc_id"]: set(r["shingle_set"])
        for r in DD.shingle_sets(d, "text", "doc_id", 3).collect()
    }
    brute = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            c = round(len(sa & sb) / len(sa), 4)
            if c >= 0.5:
                brute[(a, b)] = c
    assert got == brute
    assert brute, "fixture should contain containment pairs"
