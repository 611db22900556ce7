"""Round-3 C-side anchor runs (single core, sequential — the build dir's
obj/ is shared across variants, see c_baseline.measure NOTE).

1. Flagship 100-frame bubble-EMS run @1.8 dB (the bench.py baseline;
   /tmp cache was wiped, so pre-populating it here keeps bench.py's child
   under its timeout).
2. Flagship-scale syndrome_ems anchors @1.5/1.8 dB for the
   SYNDROME_GF256.md flagship table (NbMax=45 >= d_1+1, n_cv=45, trapeze
   (40,15,5) capped at 1000 — the NB_LDPC.c:188-200 recipe).
"""
import json
import sys

sys.path.insert(0, ".")

from benchmarks.c_baseline import measure  # noqa: E402

FLAGSHIP = "Declercq_64800_R12_GF256"

for desc, kw in [
    ("bubble-EMS @1.8 (bench baseline)",
     dict(ebn0=1.8, frames=100, iters=10, nm=32, offset=0.3, nboper=64,
          fmt="ubs", timeout=900)),
    ("syndrome @1.8",
     dict(ebn0=1.8, frames=150, iters=10, nm=45, offset=0.3, nboper=45,
          fmt="ubs", channel="syndrome", timeout=7200)),
    ("syndrome @1.5",
     dict(ebn0=1.5, frames=150, iters=10, nm=45, offset=0.3, nboper=45,
          fmt="ubs", channel="syndrome", timeout=7200)),
]:
    r = measure(FLAGSHIP, **kw)
    print(f"C {desc}: {json.dumps(r)}", flush=True)
