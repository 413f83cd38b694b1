"""Measurement-time host-contention stamping for performance artifacts.

Round-4 shipped two headline perf JSONs with contamination footnotes
(concurrent CPU suites on the 1-core host inflated chip-bench timings).
The protocol fix: every perf artifact carries a ``host_load`` block stamped
AT MEASUREMENT TIME, and bench entry points can refuse to run on a
contended host (``NNDET_BENCH_REQUIRE_EXCLUSIVE=1``).
"""
from __future__ import annotations

import os
import time
from typing import Dict


def _busy_others(sample_s: float = 0.6, busy_frac: float = 0.2) -> list:
    """PIDs (other than ours) consuming > ``busy_frac`` of a CPU over a short
    sample, with their comm names."""
    me = os.getpid()
    parent = os.getppid()

    def cpu_ticks() -> Dict[int, int]:
        out = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) in (me, parent):
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                # utime+stime are fields 14/15 (1-based) = parts[11]/[12]
                out[int(pid)] = int(parts[11]) + int(parts[12])
            except (OSError, IndexError, ValueError):
                continue
        return out

    t0 = cpu_ticks()
    time.sleep(sample_s)
    t1 = cpu_ticks()
    hz = os.sysconf("SC_CLK_TCK")
    busy = []
    for pid, ticks in t1.items():
        d = ticks - t0.get(pid, ticks)
        if d / hz / sample_s > busy_frac:
            try:
                with open(f"/proc/{pid}/comm") as f:
                    comm = f.read().strip()
            except OSError:
                comm = "?"
            busy.append({"pid": pid, "comm": comm, "cpu_frac": round(d / hz / sample_s, 2)})
    return busy


def host_load(sample_s: float = 0.6) -> Dict:
    """Contention snapshot to embed in every perf artifact."""
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    busy = _busy_others(sample_s)
    return {
        "loadavg_1m": load1,
        "busy_other_procs": busy,
        "exclusive": len(busy) == 0,
        "sampled_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def require_exclusive_or_tag(context: str = "bench") -> Dict:
    """Stamp contention; refuse to run when the host is contended and
    ``NNDET_BENCH_REQUIRE_EXCLUSIVE=1`` (the default is to tag loudly)."""
    snap = host_load()
    if not snap["exclusive"]:
        msg = (
            f"[{context}] host is CONTENDED at measurement time: "
            f"{snap['busy_other_procs']}"
        )
        if os.environ.get("NNDET_BENCH_REQUIRE_EXCLUSIVE") == "1":
            raise RuntimeError(msg + " (NNDET_BENCH_REQUIRE_EXCLUSIVE=1)")
        import sys

        print("# WARNING " + msg, file=sys.stderr)
    return snap
