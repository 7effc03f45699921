"""Third-engine pins for the round-10 keys (house gate: every new
stat/measure is checked against an implementation that shares NO code
or SQL dialect with either engine — numpy/pandas/pure Python over the
same parquet bytes)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from clickhousebackup_spark.registry import all_specs

SPECS = all_specs()


def _pd(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_covariance_matches_numpy_on_the_grid(spark, sf_dir):
    got = {
        r["l_returnflag"]: r
        for r in SPECS["stats_covariance"].fn(spark, sf_dir).collect()
    }
    li = _pd(sf_dir, "lineitem")
    for flag, g in li.groupby("l_returnflag"):
        qg = np.floor(1000.0 * g["l_quantity"].to_numpy(np.float64)).astype(
            object
        )
        pg = np.floor(100.0 * g["l_extendedprice"].to_numpy(np.float64)).astype(
            object
        )
        n = len(g)
        sx, sy = int(sum(qg)), int(sum(pg))
        sxy = int(sum(a * b for a, b in zip(qg, pg)))
        r = got[flag]
        # sx/sy/sxy are VARCHAR (DECIMAL(38,0) escape hatch — all
        # three moments can pass int64 at cluster scale, ADVICE r10)
        assert (r["n"], int(r["sx"]), int(r["sy"])) == (n, sx, sy)
        assert int(r["sxy"]) == sxy
        # same expression tree over the same exact integers
        want = (float(sxy) - float(sx) * float(sy) / n) / n
        assert r["cov_pop_grid"] == want
        # and it is the population covariance numpy computes on the
        # gridded series (float tolerance only for numpy's own order)
        approx = np.cov(
            np.array(qg, dtype=np.float64),
            np.array(pg, dtype=np.float64),
            bias=True,
        )[0, 1]
        assert abs(r["cov_pop_grid"] - approx) <= max(1e-6 * abs(approx), 1e-6)


def test_argmax_matches_pandas_lexicographic(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in SPECS["agg_argmax_argmin"].fn(spark, sf_dir).collect()
    }
    ev = _pd(sf_dir, "events")
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["value", "user_id", "event_id"])
        lo, hi = g.iloc[0], g.iloc[-1]
        r = got[t]
        assert (r["argmax_user"], r["argmax_event"]) == (
            hi["user_id"],
            hi["event_id"],
        )
        assert (r["argmin_user"], r["argmin_event"]) == (
            lo["user_id"],
            lo["event_id"],
        )


def test_session_window_matches_pandas_sessionizer(spark, sf_dir):
    gap = 1_800_000_000
    got = sorted(
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in SPECS["win_session_window_builtin"].fn(spark, sf_dir).collect()
    )
    ev = _pd(sf_dir, "events")
    # normalize whatever datetime unit pandas chose to epoch-µs
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us).sort_values(["user_id", "us", "event_id"])
    want = []
    for uid, g in ev.groupby("user_id"):
        start = prev = None
        n = 0
        for t in g["us"]:
            if prev is None or t - prev > gap:
                if start is not None:
                    want.append((uid, start, prev + gap, n))
                start, n = t, 0
            prev = t
            n += 1
        want.append((uid, start, prev + gap, n))
    assert got == sorted(want)


_STOP = {"the", "be", "to", "of", "and", "that", "have", "with"}


def test_gopher_matches_pure_python(spark, sf_dir):
    got = {
        r["doc_id"]: r
        for r in SPECS["text_quality_gopher"].fn(spark, sf_dir).collect()
    }
    for _, row in _pd(sf_dir, "documents").iterrows():
        words = [w for w in re.split(r"\s+", row["text"].lower()) if w != ""]
        n = len(words)
        chars = sum(len(w) for w in words)
        alpha = sum(1 for w in words if re.search("[a-z]", w))
        stops = sum(1 for w in words if w in _STOP)
        r = got[row["doc_id"]]
        assert (r["n_words"], r["n_word_chars"]) == (n, chars)
        assert (r["n_alpha_words"], r["n_stopwords"]) == (alpha, stops)
        mean_len = 0 if n == 0 else (chars * 1000) // n
        alpha_f = 0 if n == 0 else (alpha * 1000) // n
        assert r["mean_word_len_permille"] == mean_len
        assert r["alpha_frac_permille"] == alpha_f
        want_pass = int(
            50 <= n <= 100000
            and 3000 <= mean_len <= 10000
            and alpha_f >= 800
            and stops >= 2
        )
        assert r["gopher_pass"] == want_pass


def test_url_canonical_matches_pure_python(spark, sf_dir):
    got = {
        r["canonical_url"]: (r["n_docs"], r["n_raw_variants"], r["keep_doc_id"])
        for r in SPECS["url_canonical_dedup"].fn(spark, sf_dir).collect()
    }
    groups: dict[str, dict] = {}
    for _, row in _pd(sf_dir, "documents").iterrows():
        d, src, lang = int(row["doc_id"]), row["source"], row["lang"]
        scheme = "HTTPS" if d % 2 == 0 else "https"
        host = (
            f"WWW.{src.upper()}.Example.COM" if d % 3 == 0
            else f"www.{src}.example.com"
        )
        port = ":443" if d % 4 == 0 else ""
        slash = "/" if d % 5 == 0 else ""
        q = "?b=2&utm_source=feed&a=1" if d % 2 == 0 else "?a=1&b=2"
        raw = f"{scheme}://{host}{port}/{lang}/doc-{d % 50}{slash}{q}"
        # independent canonicalizer
        sch, rest = raw.split("://", 1)
        hostport, pathq = rest.split("/", 1)
        h = hostport.split(":")[0].lower()
        h = h[4:] if h.startswith("www.") else h
        path, query = ("/" + pathq).split("?", 1)
        path = path.rstrip("/") if path != "/" else ""
        params = "&".join(
            sorted(p for p in query.split("&") if not p.startswith("utm_"))
        )
        canon = f"{sch.lower()}://{h}{path}" + (f"?{params}" if params else "")
        g = groups.setdefault(
            canon, {"n": 0, "raws": set(), "keep": d}
        )
        g["n"] += 1
        g["raws"].add(raw)
        g["keep"] = min(g["keep"], d)
    want = {
        k: (v["n"], len(v["raws"]), v["keep"]) for k, v in groups.items()
    }
    assert got == want


def test_round_families_match_pure_python(spark, sf_dir):
    from clickhousebackup_spark.functions.maths import (
        ROUND_AGE_BOUNDS,
        ROUND_DOWN_LADDER,
        ROUND_DURATION_LADDER,
    )

    # (l_orderkey, l_linenumber) is NOT unique in the fixture, so
    # compare full-row multisets rather than keying a dict on it
    got = sorted(
        tuple(r) for r in SPECS["math_round_families"].fn(spark, sf_dir).collect()
    )

    def ladder(x, lad):
        return max([v for v in lad if v <= x], default=min(lad))

    def age(x):
        for lo, val in ROUND_AGE_BOUNDS[:-1]:
            if x >= lo:
                return val
        return 0

    want = []
    for _, row in _pd(sf_dir, "lineitem").iterrows():
        xp = int(math.floor(row["l_extendedprice"]))
        dur = (row["l_orderkey"] * 7 + row["l_linenumber"]) % 40000
        q = int(row["l_quantity"])
        want.append(
            (
                int(row["l_orderkey"]),
                int(row["l_linenumber"]),
                0 if xp < 1 else 1 << (xp.bit_length() - 1),
                ladder(dur, ROUND_DURATION_LADDER),
                age(row["l_partkey"] % 100),
                ladder(row["l_suppkey"] % 1000, ROUND_DOWN_LADDER),
                q // 2 if q % 2 == 0 else q // 2 + ((q // 2) % 2),
            )
        )
    assert got == sorted(want)


def test_blocklist_matches_pure_python(spark, sf_dir):
    from clickhousebackup_spark.extensions.text import BLOCKLIST

    got = {
        r["doc_id"]: r
        for r in SPECS["text_blocklist_filter"].fn(spark, sf_dir).collect()
    }
    any_blocked = False
    for _, row in _pd(sf_dir, "documents").iterrows():
        words = [w for w in re.split(r"\s+", row["text"].lower()) if w != ""]
        hits = [w for w in words if w in BLOCKLIST]
        r = got[row["doc_id"]]
        assert r["n_blocked_hits"] == len(hits)
        assert r["n_blocked_terms"] == len(set(hits))
        assert r["first_blocked"] == (min(hits) if hits else "")
        assert r["blocked"] == int(bool(hits))
        any_blocked |= bool(hits)
    assert any_blocked  # the gate must be live on this fixture
