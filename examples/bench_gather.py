"""Gather / HBM microbenchmark — the auditable basis for bench.py's roofline.

The packed-ELL SpMM (gcn_tpu/ops/ell_spmm.py) is bound by the XLA row
gather: every edge slot issues one `jnp.take` row read. This microbench
measures, on the current device:

  * ns/row of the chained row gather (x' = x[idx] feedback loop — the only
    harness that cannot be elided or algebraically simplified; scalar-carry
    and full-sum consumers both mislead, see gcn_tpu/tile/ell.py) as a
    function of table height n, for f32 and bf16 tables;
  * the same for the packed table layout (Q table rows per 128-lane row);
  * HBM stream bandwidth (big elementwise copy) for comparison — showing
    the gather is issue-rate-bound, not bandwidth-bound.

Output: a human table + JSON to results/gather_microbench.json. The
ns/row at the bench graph's table height × the kernel's slot count is the
roofline bench.py reports against (its `roofline` detail field).

Reference counterpart: the flexspmm kernels' B-row gather is the same
locality-critical primitive (flexspmm.cu:150-160, SURVEY.md §3.2).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync_overhead(x):
    nul = jax.jit(lambda xx: jnp.sum(xx[:8, :8]))
    float(nul(x))
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        float(nul(x * (1 + r * 1e-3)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_chained_gather(n, k, dtype, inner=30, rounds=3, seed=0,
                         idx_len=2_000_000):
    """Chained gather: idx_len rows gathered from an n-row table per
    iteration, folded back into the table (P-stride sum, the SpMM's own
    consumption pattern) so no row read can be elided and fixed dispatch
    costs are amortized over idx_len, not n. Returns ns per gathered row."""
    rng = np.random.default_rng(seed)
    stride = min(8, max(1, idx_len // n))   # capped: compile-time bound
    idx_len = stride * n
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.01,
                     dtype=dtype)
    idx = jnp.asarray(rng.integers(0, n, (stride, n), dtype=np.int32))
    overhead = sync_overhead(x0.astype(jnp.float32))

    def step(ii, acc):
        out = None
        for j in range(stride):
            t = jnp.take(acc, ii[j], axis=0)
            out = t if out is None else out + t
        return out

    run = jax.jit(lambda ii, xx: jnp.sum(jax.lax.fori_loop(
        0, inner,
        lambda i, acc: step(ii, acc) * 0.999 + xx * 1e-6,
        xx).astype(jnp.float32)))
    float(run(idx, x0 * 0.5))
    best = 1e9
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        float(run(idx, x0 * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best / idx_len * 1e9


def bench_packed_gather(n, k_pad, inner=30, rounds=3, seed=0):
    """Packed-table variant: Q=128//k_pad table rows per 128-lane row;
    gather row idx//Q then lane-group select (the _packed_gather_stride_sum
    layout). Chained like the plain version. Returns ns per logical row."""
    q = 128 // k_pad
    rng = np.random.default_rng(seed)
    npad = -(-n // q) * q
    x0 = jnp.asarray(
        rng.standard_normal((npad // q, 128)).astype(np.float32) * 0.01)
    idx = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    overhead = sync_overhead(x0)

    def step(ii, acc):
        g = jnp.take(acc.reshape(-1, 128), ii // q, axis=0)   # (n, 128)
        m = (ii % q)[:, None]
        parts = sum(
            jnp.where(m == mm, 1.0, 0.0) * g[:, mm * k_pad:(mm + 1) * k_pad]
            for mm in range(q))
        # back to the packed carry: (npad, k_pad) -> (npad//q, q*k_pad=128)
        return jnp.pad(parts, ((0, npad - n), (0, 0))).reshape(npad // q,
                                                               128)

    run = jax.jit(lambda ii, xx: jnp.sum(jax.lax.fori_loop(
        0, inner,
        lambda i, acc: step(ii, acc.reshape(-1, 128)).reshape(acc.shape)
        * 0.999 + xx * 1e-6,
        xx)))
    float(run(idx, x0 * 0.5))
    best = 1e9
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        float(run(idx, x0 * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best / n * 1e9


def bench_stream_bw(mb=512, inner=20, rounds=3):
    """HBM stream: chained y = y * c + d over an mb-MB f32 buffer.
    Reads + writes the buffer once per iteration -> 2*mb MB moved."""
    n = mb * 1024 * 1024 // 4
    x0 = jnp.ones((n,), jnp.float32)
    overhead = sync_overhead(x0.reshape(-1, 1024)[:8, :8].reshape(8, 8))
    run = jax.jit(lambda xx: jnp.sum(jax.lax.fori_loop(
        0, inner, lambda i, acc: acc * 0.9999 + 1e-7, xx)[:8]))
    float(run(x0 * 0.5))
    best = 1e9
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        float(run(x0 * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return 2 * mb / 1024 / best  # GB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[50_000, 169_343, 233_000, 466_000, 932_000])
    ap.add_argument("-k", type=int, default=32)
    ap.add_argument("-o", default="results/gather_microbench.json")
    args = ap.parse_args()

    rows = []
    print(f"{'n':>9} {'f32 ns/row':>11} {'bf16 ns/row':>12} "
          f"{'packed ns/row':>14}")
    for n in args.sizes:
        f32 = bench_chained_gather(n, args.k, jnp.float32)
        bf16 = bench_chained_gather(n, args.k, jnp.bfloat16)
        packed = bench_packed_gather(n, args.k)
        rows.append({"n": n, "k": args.k, "f32_ns_per_row": round(f32, 3),
                     "bf16_ns_per_row": round(bf16, 3),
                     "packed_ns_per_row": round(packed, 3)})
        print(f"{n:>9} {f32:>11.2f} {bf16:>12.2f} {packed:>14.2f}")

    bw = bench_stream_bw()
    # effective gather bandwidth at the arxiv-class point: each gathered
    # f32 row moves a full 128-lane (512 B) tile
    mid = rows[min(1, len(rows) - 1)]
    eff = 512 / mid["f32_ns_per_row"]
    print(f"\nHBM stream: {bw:.0f} GB/s; gather effective "
          f"{eff:.0f} GB/s at n={mid['n']} -> "
          f"{'issue-rate-bound' if eff < 0.5 * bw else 'bandwidth-bound'}")

    out = {"device": jax.devices()[0].platform,
           "gather": rows, "stream_gbps": round(bw, 1),
           "gather_effective_gbps_mid": round(eff, 1)}
    from gcn_tpu.utils.artifacts import write_artifact
    write_artifact(args.o, out, harness="examples/bench_gather.py",
                   schema="gather_microbench_v2")
    print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
