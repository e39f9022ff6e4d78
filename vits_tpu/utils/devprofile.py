"""Device-lane timing from the XLA profiler trace.

Wall-clock timing through a tunneled TPU is unreliable — `block_until_ready`
returns at RPC ack, and a sick tunnel bills seconds of network stall to every
dispatch.  The profiler's "XLA Modules" device lane is ground truth: it records
what the chip itself executed, independent of the tunnel.  Round 3's headline
bench recorded a 430x wall-clock collapse (BENCH_r03.json, xRT 0.98) with
nothing machine-readable saying the chip was fine; this module exists so every
headline run can self-diagnose (bench.py emits `device_ms_per_dispatch` +
`onchip_xrt` and a `degraded` label when wall time is tunnel-pathological).

Used by bench.py and scripts/profile_device.py.  The reference's equivalent
"authoritative timer" is its in-process harness (/root/reference/test/
bench_e2e.cpp:79-89) — it never had a network between host and compute.
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import tempfile
from collections import defaultdict


def parse_trace(trace_dir: str):
    """Parse the newest trace under ``trace_dir``.

    Returns ``(module_ms, categories_ms, pallas_invocations)`` where
    ``module_ms`` sums every "XLA Modules" lane slice (total device time of
    everything executed inside the trace), ``categories_ms`` aggregates the
    "XLA Ops" lane by op-name stem, and ``pallas_invocations`` lists
    ``(name, ms)`` for custom-call/pallas ops.
    """
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    # lane discovery: (pid, tid) -> thread name, device pids only (a device
    # pid owns an "XLA Modules" lane; the host trace never does)
    names = {}
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e["tid"])] = e["args"].get("name")
    module_lanes = {k for k, v in names.items() if v == "XLA Modules"}
    ops_lanes = {k for k, v in names.items() if v == "XLA Ops"}
    module_ms = 0.0
    cat = defaultdict(float)
    pallas = []
    for e in t["traceEvents"]:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in module_lanes:
            module_ms += e["dur"] / 1e3
        elif key in ops_lanes:
            name = e["name"]
            cat[re.sub(r"[.\d]+$", "", name)] += e["dur"] / 1e3
            if "_lambda_" in name or "pallas" in name.lower():
                pallas.append((name, e["dur"] / 1e3))
    return module_ms, dict(cat), pallas


def device_ms(run, *, trace_dir: str | None = None) -> float:
    """Total device-lane ms for one call of ``run()``.

    ``run`` must host-sync its own output (fetch to numpy) so the device is
    quiescent when the trace closes.  Call once un-traced first to exclude
    compilation.
    """
    import jax

    tmp = trace_dir or tempfile.mkdtemp(prefix="devtrace_")
    with jax.profiler.trace(tmp):
        run()
    return parse_trace(tmp)[0]
