"""Exactness proofs for curation_percentile_gate_twostage
(extensions/curation.py) — the rank-window playbook (family five)
transplanted to the curation surface, where the flat gate's
straggler is STRUCTURAL (a 5-value lang column ranks every document
of a language in one task).

Claim: hash-identical output to the flat gate for ANY input, on the
monotone-bucket invariant (n_chars div 10 — ties never straddle;
rn = strictly-longer-bucket count + local rank) with the keep flag's
pure-integer arithmetic replayed verbatim.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (doc_id, lang, n_chars)."""
    data = [(i, "x" * 5, lang, "web", int(n)) for i, lang, n in rows]
    d = str(tmp_path)
    spark.createDataFrame(data, DOCS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def _brute(rows):
    """{doc_id: (rn, n, keep)} under (n_chars DESC, doc_id)."""
    by_lang: dict = {}
    for did, lang, n in rows:
        by_lang.setdefault(lang, []).append((-n, did))
    out = {}
    for docs in by_lang.values():
        docs.sort()
        total = len(docs)
        for i, (_, did) in enumerate(docs):
            rn = i + 1
            out[did] = (rn, total, 1 if (rn - 1) * 100 <= (total - 1) * 60 else 0)
    return out


def _engine(spark, d, key):
    return {
        r["doc_id"]: (r["rn"], r["n"], r["keep"])
        for r in all_specs()[key].fn(spark, d).collect()
    }


def test_crafted_bucket_boundaries(spark, tmp_path):
    rows = [
        # lang a: ties inside one char-decade (doc_id tiebreak), a
        # value exactly ON a decade boundary (120 vs 119), and the
        # 60%-gate cut landing mid-bucket.
        (0, "a", 120),
        (1, "a", 120),
        (2, "a", 119),
        (3, "a", 111),
        (4, "a", 110),
        (5, "a", 55),
        # lang b: single document (rn=1, n=1, (0)*100 <= 0*60 -> keep).
        (10, "b", 300),
        # lang c: all docs share one bucket.
        (20, "c", 44),
        (21, "c", 45),
        (22, "c", 46),
    ]
    d = _mk(rows, tmp_path, spark)
    want = _brute(rows)
    assert _engine(spark, d, "curation_percentile_gate_twostage") == want
    assert _engine(spark, d, "curation_percentile_gate") == want


def test_oracle_is_shared_object():
    specs = all_specs()
    assert (
        specs["curation_percentile_gate"].oracle
        is specs["curation_percentile_gate_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            # tight n_chars domain: decade ties and boundary values
            # are the common case
            st.integers(min_value=95, max_value=125),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_flat_and_brute(spark, tmp_path_factory, raw):
    rows = [(i, lang, n) for i, (lang, n) in enumerate(raw)]
    d = _mk(rows, tmp_path_factory.mktemp("gatetwo"), spark)
    got = _engine(spark, d, "curation_percentile_gate_twostage")
    assert got == _brute(rows)
    assert got == _engine(spark, d, "curation_percentile_gate")
