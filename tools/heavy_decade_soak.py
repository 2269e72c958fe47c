"""Second-decade scale probe for the round-8 heavy operators
(judge r8 item 4).

SCALING.md's sf0.1 -> sf1 tables measured ONE decade for
d_semantic_dedup_learned (the worst non-graph factor, 4.3x at 10x),
sim_pq_quantize_learned and ml_als_recommend. This probe measures the
NEXT decade: a full key-shifted x10 replica of .data/sf1 built by
tools/gen_scaled.py (consistent keys across tables, so ALS ratings,
embedding corpora and cluster structures scale the way real growth
would), then each op timed at sf1 and at the x10 dir in one session.

Pass criterion: factor <= 12x for 10x input (linear with headroom for
shuffle/fit constants; a quadratic within-cluster or per-codebook
blow-up would show 30-100x). Prints a markdown table for SCALING.md.

Usage: python tools/heavy_decade_soak.py [sf1_dir] [sf10_dir]
(defaults .data/sf1 and .data/sf10; the x10 build is delegated to
gen_scaled.py and skipped if sf10_dir already has embeddings.parquet)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mathorcup_spark import registry
from mathorcup_spark.session import get_spark

OPS = (
    "d_semantic_dedup_learned",
    "d_semantic_dedup_capped",
    "sim_pq_quantize_learned",
    "ml_als_recommend",
)
MAX_FACTOR = 12.0


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else ".data/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".data/sf10"
    if not Path(f"{out}/embeddings.parquet").exists():
        print(f"building x10 replica at {out} via gen_scaled.py ...", flush=True)
        rc = subprocess.run(
            [sys.executable, "tools/gen_scaled.py", src, out, "10"]
        ).returncode
        if rc != 0:
            return rc
    spark = get_spark("heavy_decade_soak")
    qs = registry.queries()
    print(f"| query | {src} s | {out} s | factor (10x input) |\n|---|---|---|---|")
    failures = []
    for name in OPS:
        t0 = time.perf_counter()
        qs[name](spark, src).count()
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        qs[name](spark, out).count()
        big = time.perf_counter() - t0
        factor = big / base
        flag = "" if factor <= MAX_FACTOR else " **SUPERLINEAR**"
        if factor > MAX_FACTOR:
            failures.append(f"{name}: {factor:.1f}x")
        print(
            f"| `{name}` | {base:.1f} | {big:.1f} | {factor:.1f}x{flag} |",
            flush=True,
        )
    if failures:
        print(f"\nFAIL superlinear second decade: {failures}")
        return 1
    print(f"\nall {len(OPS)} ops <= {MAX_FACTOR}x for 10x input")
    return 0


if __name__ == "__main__":
    sys.exit(main())
