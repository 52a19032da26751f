#!/usr/bin/env python
"""Diagnostic: compute, per session-cached DataFrame artifact, the LAST
headline query that can (transitively) consume it — the release point
for bench.py's unpersist-after-last-consumer pass (guide §5: unpersist
when done; VERDICT r15 #7). Pure source analysis, no Spark session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, artifact_last_consumers  # noqa: E402

if __name__ == "__main__":
    last = artifact_last_consumers()
    order = {n: i for i, n in enumerate(HEADLINE)}
    for cache_name, qname in sorted(
        last.items(), key=lambda kv: order.get(kv[1], -1)
    ):
        print(f"{order.get(qname, -1):4d}  {qname:35s} releases {cache_name}")
