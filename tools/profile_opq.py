"""Phase-level profile of the OPQ trainer at the bench operating point
(90k x 64 sample, M=8, K=16, opq_iters=20) — VERDICT r11 #2 evidence.

Spark-free: times _train_opq end-to-end, then breaks one assign pass
into GEMM / add-norms / argmin and one Lloyd update into its bincounts,
under three BLAS/pool regimes, so the r12 kernel change is aimed at the
measured wall instead of the assumed one. Run on a quiet host; repeat
readings (best-of-N) absorb the fleet's >3x in-run swings.

Usage: python tools/profile_opq.py [n_rows] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def phase_profile(n=90_000, dims=64, M=8, K=16, reps=3):
    from fastpyvectordb_spark.ann import ivfpq as iq

    rng = np.random.RandomState(7)
    sample = rng.randn(n, dims).astype(np.float64)
    x3 = sample.reshape(n, M, dims // M)
    xT = iq._pq_prepare(x3)
    cbs = np.stack([
        iq._kmeanspp_init(
            np.ascontiguousarray(x3[:, m]), K, np.random.RandomState(m)
        )
        for m in range(M)
    ])

    sub = dims // M
    chunk = 8192

    def timed(fn, *a):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(*a)
            best = min(best, time.perf_counter() - t0)
        return best

    # one full assign via the production kernel (pooled path)
    t_assign = timed(iq._pq_assign_prepared, xT, cbs)

    # serial phase split of the same work
    res = {}

    def serial_phases():
        g = a = am = 0.0
        codes = np.empty((n, M), dtype=np.int64)
        for m in range(M):
            cb_t2 = cbs[m].T.astype(np.float32)
            cb_t2 *= np.float32(-2.0)
            cb_n2 = (cbs[m] ** 2).sum(1).astype(np.float32)
            xm = xT[m]
            buf = np.empty((min(chunk, n), K), dtype=np.float32)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                b = buf[: e - s]
                t0 = time.perf_counter()
                np.dot(xm[s:e], cb_t2, out=b)
                t1 = time.perf_counter()
                b += cb_n2[None, :]
                t2 = time.perf_counter()
                codes[s:e, m] = b.argmin(1)
                t3 = time.perf_counter()
                g += t1 - t0
                a += t2 - t1
                am += t3 - t2
        res["gemm"] = g
        res["add"] = a
        res["argmin"] = am
        return codes

    t_serial = timed(serial_phases)
    codes = serial_phases()

    # Lloyd update phase (bincounts), serial
    def upd():
        for m in range(M):
            cm = np.ascontiguousarray(codes[:, m])
            cnt = np.bincount(cm, minlength=K)
            xm64 = np.ascontiguousarray(x3[:, m])
            sums = np.stack(
                [
                    np.bincount(cm, weights=xm64[:, j], minlength=K)
                    for j in range(sub)
                ],
                axis=1,
            )
            nz = cnt > 0
            _ = sums[nz] / cnt[nz][:, None]

    t_upd = timed(upd)

    t_prep = timed(iq._pq_prepare, x3)

    print(f"assign pooled(best of {reps}):  {t_assign*1e3:8.1f} ms")
    print(f"assign serial(best of {reps}):  {t_serial*1e3:8.1f} ms "
          f"(gemm {res['gemm']*1e3:.1f}, add {res['add']*1e3:.1f}, "
          f"argmin {res['argmin']*1e3:.1f})")
    print(f"lloyd update serial:            {t_upd*1e3:8.1f} ms")
    print(f"_pq_prepare:                    {t_prep*1e3:8.1f} ms")
    return t_assign, t_serial


def full_trainer(n=90_000, dims=64, M=8, K=16, iters=20):
    from fastpyvectordb_spark.ann import ivfpq as iq

    rng = np.random.RandomState(7)
    sample = rng.randn(n, dims).astype(np.float64)
    t0 = time.perf_counter()
    rot, cbs = iq._train_opq(sample, M, K, seed=42, opq_iters=iters)
    t = time.perf_counter() - t0
    print(f"_train_opq({n}x{dims}, M={M}, K={K}, {iters} iters): {t:8.1f} s")
    return t, rot, cbs


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 90_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import threadpoolctl  # noqa: F401 — may not exist; fall back below

    print("== BLAS env:", {
        k: os.environ.get(k)
        for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")
    })
    phase_profile(n=n, reps=reps)
    full_trainer(n=n)
