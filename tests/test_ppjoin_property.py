"""Property-based exactness proof for the PPJoin prefix filter.

``dedup_ngram_jaccard`` (extensions/dedup.py) claims EXACT recall:
the rarity-ordered prefix index must surface every pair with bigram
Jaccard >= 0.8, for ANY corpus — the pigeonhole argument, not a
probabilistic sketch. The fixture and the zipf probe exercise two
corpus shapes; hypothesis closes the gap by generating adversarial
tiny corpora (shared vocab so near-dups are common, repeated words so
array_distinct matters, length mismatches so the size filter fires)
and comparing the FULL engine result against brute-force Python
Jaccard over all pairs.

Each example runs one Spark job, so the example budget is small; the
corpus space is tiny enough that 12 examples cover the interesting
boundary structure (ties, exact dups, subset docs, singletons).
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

pytestmark = pytest.mark.slow

VOCAB = ["a", "b", "c", "d", "e"]

#: documents: 2-8 docs, each 1-8 words from a 5-word vocab — small
#: enough that near-dup pairs, exact dups, and subset relations all
#: occur routinely.
corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


def _bigrams(text: str) -> frozenset:
    ws = text.split()
    if len(ws) == 1:
        # mirror the operator: sequence(1, greatest(n-1, 1)) emits ONE
        # slice for a single-word doc — the word itself
        return frozenset([ws[0]])
    return frozenset(
        " ".join(ws[i : i + 2]) for i in range(len(ws) - 1)
    )


def _brute_pairs(texts):
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = _bigrams(texts[i]), _bigrams(texts[j])
            jac = len(a & b) / len(a | b)
            if jac >= 0.8:
                out.add((i, j, round(jac, 9)))
    return out


@given(corpora)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ppjoin_finds_every_pair_brute_force_finds(spark, tmp_path_factory, texts):
    d = str(tmp_path_factory.mktemp("ppjoin"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 9))
        for r in all_specs()["dedup_ngram_jaccard"].fn(spark, d).collect()
    }
    assert got == _brute_pairs(texts)


def _brute_containment(texts):
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = _bigrams(texts[i]), _bigrams(texts[j])
            shared = len(a & b)
            msz = min(len(a), len(b))
            if 10 * shared >= 9 * msz:
                out.add((i, j, shared, msz, (shared * 100) // msz))
    return out


@given(corpora)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_containment_one_sided_prefix_is_exact(spark, tmp_path_factory, texts):
    """dedup_containment's one-sided prefix probe (smaller doc probes
    with its rarest grams) claims the same pigeonhole exactness —
    subset/quote relations are exactly the shapes this generator
    produces constantly."""
    d = str(tmp_path_factory.mktemp("contain"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["a_id"], r["b_id"], r["n_shared"], r["min_sz"], r["contain_pct"])
        for r in all_specs()["dedup_containment"].fn(spark, d).collect()
    }
    assert got == _brute_containment(texts)
