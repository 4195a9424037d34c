"""Bench regression guard (pure logic; unit-tested in tests/test_polish.py).

bench.py compares the current round's numbers against the most recent green
``BENCH_r*.json`` driver artifact in the repo root and appends a
``regressions`` list to ``extra`` for any throughput metric >10% below the
prior round.  The headline was flat r2→r3; a silent future regression would
cost a whole round (VERDICT r3, next-round item 6).
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Optional

# Throughput-style keys: higher is better; anything else in extra (batch
# sizes, optimizer names, error strings, baselines) is not comparable.
_THROUGHPUT_KEY = re.compile(r"(_samples_per_sec|_imgs_per_sec|_mfu_v5e)$")
_HEADLINE = "__headline__"


def load_prior_bench(root: str) -> Optional[dict]:
    """Latest BENCH_r*.json with a non-null parsed payload, or None."""
    best_n, best = -1, None
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = art.get("parsed")
        if parsed is None or not isinstance(art.get("n"), int):
            continue
        if art["n"] > best_n:
            best_n, best = art["n"], {"n": art["n"], "parsed": parsed}
    return best


def _flat_metrics(parsed: dict) -> dict:
    out = {}
    if isinstance(parsed.get("value"), (int, float)):
        out[_HEADLINE] = float(parsed["value"])
    for k, v in (parsed.get("extra") or {}).items():
        if _THROUGHPUT_KEY.search(k) and isinstance(v, (int, float)):
            out[k] = float(v)
    return out


def find_regressions(current: dict, prior: Optional[dict],
                     tol: float = 0.10) -> list:
    """List of "<key>: X -> Y (-Z% vs r<N>)" for metrics > tol below prior.

    ``current``/``prior["parsed"]`` are bench payload dicts ({value, extra}).
    Metrics absent on either side are skipped (a new bench is not a
    regression; a dropped one is visible as a missing key in the artifact).
    """
    if not prior:
        return []
    cur, old = _flat_metrics(current), _flat_metrics(prior["parsed"])
    out = []
    for key, prev in sorted(old.items()):
        now = cur.get(key)
        if now is None or prev <= 0:
            continue
        drop = 1.0 - now / prev
        if drop > tol:
            name = "headline" if key == _HEADLINE else key
            out.append(f"{name}: {prev:g} -> {now:g} "
                       f"(-{100 * drop:.1f}% vs r{prior['n']:02d})")
    return out
