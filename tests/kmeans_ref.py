"""Shared pure-Python replay of operators/similarity.py::kmeans_int's
exact fixed-point contract (quantize round-half-up, integer squared-L2,
smallest-index ties, exactly-divisible round-half-up centroid update,
empty clusters keep their centroid) — imported by the deterministic
test in test_operators.py and the hypothesis property test, so the
contract is pinned in ONE place."""

from __future__ import annotations

import math


def kmeans_int_ref(rows, k, rounds, scale=10_000):
    q = {i: [int(math.floor(x * scale + 0.5)) for x in v] for i, v in rows}
    cents = [list(q[i]) for i in sorted(q)[:k]]
    dims = len(cents[0])

    def assign():
        out = {}
        for i, qv in q.items():
            dists = [
                sum((a - b) * (a - b) for a, b in zip(qv, c)) for c in cents
            ]
            out[i] = dists.index(min(dists))
        return out

    for _ in range(rounds):
        a = assign()
        for j in range(k):
            members = [q[i] for i in a if a[i] == j]
            if not members:
                continue
            n = len(members)
            row = []
            for d in range(dims):
                s = sum(m[d] for m in members)
                num = 2 * s + n
                num -= num % (2 * n)
                row.append(num // (2 * n))
            cents[j] = row
    return assign()
