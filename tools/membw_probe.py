"""Quantify the single-host memory-bandwidth ceiling behind the 8v32
scaling criterion.

Runs a STREAM-triad-like kernel (a = b + s*c over arrays far larger
than LLC) in P pinned processes for P in (1, 8, 32) and reports
aggregate moved bytes/sec. On a real N-vs-4N-NODE cluster, DRAM
channels scale with cores; on this one host they do not, so
(BW_32/BW_8)/4 is the hard 8v32 efficiency ceiling for any
memory-bound stage — measured, not argued. A pure-ALU control
(cache-resident multiply-add) runs the same protocol to show the
ceiling is specific to memory traffic.

Usage: python tools/membw_probe.py  (prints one JSON line)
"""
import json
import multiprocessing as mp
import os
import time

import numpy as np

N = 8_000_000          # 64 MB per float64 array; 3 arrays = 192 MB/proc
MEASURE_S = 3.0
WARMUP_S = 1.0
BYTES_PER_ITER = 4 * N * 8   # read b, read c, write a + write-allocate a


def _triad(core, start_evt, out):
    os.sched_setaffinity(0, {core})
    b = np.random.rand(N)
    c = np.random.rand(N)
    a = np.empty_like(b)
    s = 1.000001
    start_evt.wait()
    t_end = time.perf_counter() + WARMUP_S
    while time.perf_counter() < t_end:
        np.add(b, s * c, out=a)
    iters = 0
    t0 = time.perf_counter()
    t_end = t0 + MEASURE_S
    while time.perf_counter() < t_end:
        np.add(b, s * c, out=a)
        iters += 1
    out.put(iters * BYTES_PER_ITER / (time.perf_counter() - t0))


def _alu(core, start_evt, out):
    os.sched_setaffinity(0, {core})
    x = np.random.rand(4096)   # L1/L2-resident: no DRAM traffic
    start_evt.wait()
    t_end = time.perf_counter() + WARMUP_S
    while time.perf_counter() < t_end:
        x = x * 1.000001 + 1e-9
    iters = 0
    t0 = time.perf_counter()
    t_end = t0 + MEASURE_S
    while time.perf_counter() < t_end:
        x = x * 1.000001 + 1e-9
        iters += 1
    out.put(iters * 2 * 4096 / (time.perf_counter() - t0))  # flops/s


def run_width(kernel, p):
    ctx = mp.get_context("spawn")
    start_evt = ctx.Event()
    out = ctx.Queue()
    procs = [ctx.Process(target=kernel, args=(i, start_evt, out))
             for i in range(p)]
    for pr in procs:
        pr.start()
    time.sleep(2.0 + 0.05 * p)   # let arrays allocate before the gun
    start_evt.set()
    vals = [out.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(vals)


def main():
    res = {"metric": "membw_ceiling", "unit": "GB/s",
           "array_mb_per_proc": round(3 * N * 8 / 2**20)}
    for p in (1, 8, 32):
        res[f"triad_gbps_{p}"] = round(run_width(_triad, p) / 1e9, 2)
    for p in (8, 32):
        res[f"alu_gflops_{p}"] = round(run_width(_alu, p) / 1e9, 2)
    res["triad_8v32_ceiling"] = round(
        (res["triad_gbps_32"] / res["triad_gbps_8"]) / 4, 3)
    res["alu_8v32_ceiling"] = round(
        (res["alu_gflops_32"] / res["alu_gflops_8"]) / 4, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
